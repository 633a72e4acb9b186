package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text scoring kernel: length, punctuation count, quality
  * score and language guess as a single struct — the per-document
  * numbers every corpus filter reads.
  *
  * Replaces a stack of interpreted HOF lambdas (`filter(toks, isin…)`
  * per language × per token) with one compiled pass, and is
  * common-subexpression-eliminated when several fields are projected
  * from the same input.
  *
  * Semantics are bit-for-bit the column-function formulas (and the
  * DuckDB oracles):
  *  - `len`      = number of codepoints (Spark `length`);
  *  - `n_punct`  = codepoints outside `[A-Za-z0-9]` and Java-regex
  *    `\s` = `[ \t\n\x0B\f\r]` (ASCII, exactly what both engines'
  *    regex classes match);
  *  - tokens     = `\s+`-split of the space-trimmed (0x20 only, like
  *    SQL TRIM), lowercased text; empty text → one empty token;
  *  - `quality`  = round(min(len/500,1)·0.4 + max(1−punct/max(len,1)·5,
  *    0)·0.3 + min(stopwordRatio·4, 1)·0.3, 6), stopwords = EN list;
  *  - `lang_guess` = argmax marker hits (tie → lang code DESC),
  *    `und` when nothing matches.
  */
case class TextStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val len = u.numChars().toLong
    val s = u.toString

    var punct = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isAlnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
      if (!isAlnum && !isWs) punct += 1
      i += Character.charCount(cp)
    }

    // SQL-trim (0x20 only) + Spark lower + \s+ split, as the column form
    val toks = TextStats.wsSplit.split(u.trim().toLowerCase.toString, -1)
    var sw = 0
    val langScores = new Array[Int](TextStats.langs.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (TextStats.stopwordsEn.contains(tok)) sw += 1
      var l = 0
      while (l < TextStats.langs.length) {
        if (TextStats.markerSets(l).contains(tok)) langScores(l) += 1
        l += 1
      }
      t += 1
    }

    val lenScore = math.min(len / 500.0, 1.0)
    val punctScore = math.max(1.0 - punct.toDouble / math.max(len.toDouble, 1.0) * 5, 0.0)
    val swRatio = if (u.trim().numChars() == 0) 0.0 else sw.toDouble / toks.length
    val swScore = math.min(swRatio * 4, 1.0)
    val quality = graft.operators.Micro.jvm6(lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3)

    // argmax score, tie → lang code DESC; all-zero → und
    var best = -1
    var l = 0
    while (l < TextStats.langs.length) {
      if (best < 0 || langScores(l) > langScores(best) ||
        (langScores(l) == langScores(best) && TextStats.langs(l) > TextStats.langs(best)))
        best = l
      l += 1
    }
    val lang = if (langScores(best) == 0) "und" else TextStats.langs(best)

    InternalRow(len, punct, quality, UTF8String.fromString(lang))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsExpr", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("len", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang_guess", StringType, nullable = false)))

  private val wsSplit = java.util.regex.Pattern.compile("\\s+")

  val stopwordsEn: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Language codes in declaration order; ties resolve by code DESC. */
  val langs: Array[String] = Array("en", "de", "es", "fr", "zh")

  val markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "es" -> Set("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "fr" -> Set("le", "la", "les", "des", "une", "est", "dans", "pour", "que", "avec"),
    "zh" -> Set("的", "是", "了", "在", "和", "有", "不", "我", "这", "他"))

  private val markerSets: Array[Set[String]] = langs.map(markers)
}
