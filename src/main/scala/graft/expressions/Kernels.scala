package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst kernel expressions for the similarity/dedup hot paths.
  *
  * Rationale (SURVEY.md §4): Spark's higher-order functions
  * (`transform`/`aggregate`/`zip_with`) evaluate their lambda per element
  * *interpreted* — measured 128 s for the all-pairs cosine at sf0.1.
  * These kernels run the same math as a tight compiled loop inside
  * whole-stage codegen (DotProduct emits Java directly; the hash kernels
  * are invoked via a reference call from generated code), preserving the
  * declarative plan around them: predicate pushdown, broadcast joins and
  * AQE are untouched.
  */
object Kernels {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(text), k, numHashes))

  def shingleHashSet(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashSet(ExpressionUtils.expression(text), k))

  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashFromHashes(ExpressionUtils.expression(hashes), numHashes))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  def charEntropyMicro(text: Column): Column =
    ExpressionUtils.column(CharEntropyMicro(ExpressionUtils.expression(text)))

  def lshBucket(vec: Column, planes: Int): Column =
    ExpressionUtils.column(LshBucket(ExpressionUtils.expression(vec), planes))

  def l2normalize(vec: Column): Column =
    ExpressionUtils.column(L2Normalize(ExpressionUtils.expression(vec)))

  def shingleSet(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleSet(ExpressionUtils.expression(text), k))

  /** Compiled sequential fold over array<double> — see [[SeqFold]]. */
  def seqFold(arr: Column, op: String, weight: Double = 0.0): Column =
    ExpressionUtils.column(SeqFold(ExpressionUtils.expression(arr), op, weight))

  /** Linear-time recursive-indicator scan over a date-sorted
    * array<struct> — see [[RecurrenceFold]].
    */
  def recurrence(arr: Column, op: String): Column =
    ExpressionUtils.column(RecurrenceFold(ExpressionUtils.expression(arr), op))

  /** Longest single-character run in a string — see [[MaxCharRun]]. */
  def maxCharRun(text: Column): Column =
    ExpressionUtils.column(MaxCharRun(ExpressionUtils.expression(text)))

  /** Compiled winnowing fingerprints — see [[WinnowFingerprints]]. */
  def winnow(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(text), k, w))

  /** Symmetric int8 quantization — see [[QuantizeInt8]]. */
  def quantizeInt8(vec: Column): Column =
    ExpressionUtils.column(QuantizeInt8(ExpressionUtils.expression(vec)))

  /** Integer dot product of two array<long> — see [[DotLong]]. */
  def dotLong(a: Column, b: Column): Column =
    ExpressionUtils.column(DotLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Engine-portable polynomial string hash — see [[PortableStrHash]]. */
  def strHash(s: Column): Column =
    ExpressionUtils.column(PortableStrHash(ExpressionUtils.expression(s)))
}

/** Dot product of two array<double> columns; full whole-stage codegen. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $x.getDouble($i) * $y.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an array<double> in one pass: norm computed once per ROW
  * (the HOF form `transform(v, x => x / sqrt(dot(v,v)))` embeds the dot
  * product inside the lambda, re-evaluating it per ELEMENT interpreted —
  * O(dim²) per row; this kernel is O(dim)). Zero vectors normalize to
  * NULL, so downstream cosines are NULL — same observable semantics as
  * the HOF form. Arrays containing a NULL element also normalize to
  * NULL (the HOF form's null propagates through the norm and poisons
  * every element; collapsing that to a NULL array keeps the output type
  * containsNull=false without silently treating null as 0).
  */
case class L2Normalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var s = 0.0
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) {
      if (v.isNullAt(i)) hasNull = true
      else { val x = v.getDouble(i); s += x * x; i += 1 }
    }
    if (hasNull || s == 0.0) null
    else {
      val norm = math.sqrt(s)
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2nExpr", this, classOf[L2Normalize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct k-char shingle set of a string, as array<string>. Same
  * semantics as `array_distinct(transform(sequence(1, greatest(len-k+1,
  * 1)), i => substr(text, i, k)))` — including the 1-shingle floor for
  * short/empty strings and codepoint-based `substringSQL` slicing — but
  * one compiled pass instead of an interpreted lambda per position.
  * First-seen order preserved (downstream is set-shaped: explode +
  * groupBy, so order is immaterial but determinism is free).
  */
case class ShingleSet(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = math.max(s.numChars() - (k - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1 // substringSQL is 1-based, matching Column.substr
    while (i <= n) { seen.add(s.substringSQL(i, k)); i += 1 }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleExpr", this, classOf[ShingleSet].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer et al., SIGMOD 2003) in one
  * compiled pass: k-gram rolling hashes `(acc·1000003 + codepoint) mod
  * 1e9+7` (integer-modular — the DuckDB oracle replays every hash
  * exactly via `list_reduce`), then the min hash of each window of `w`
  * consecutive k-gram hashes, deduplicated first-seen.
  *
  * Replaces the HOF composition (`transform(sequence, i ->
  * aggregate(sequence(0, k-1), …))`), whose per-position interpreted
  * fold cost ~15 s for 500 × 550-char docs — O(n·k) interpreted lambda
  * dispatches per document vs one compiled loop (measured 175× at
  * sf0.01).
  *
  * Degenerate inputs yield EMPTY (no k-gram → no fingerprint; fewer
  * than `w` hashes → no full window), matching DuckDB `range()`
  * emptiness — the HOF form's descending-`sequence(1,0)` artifact for
  * sub-k strings is deliberately NOT reproduced. Contract: BMP text
  * (charAt == codepoint), true for the ASCII corpus.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && w >= 1, "k and w must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length - (k - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 1000003L + s.charAt(i + j)) % 1000000007L; j += 1 }
      hs(i) = acc
      i += 1
    }
    val nWin = n - (w - 1)
    if (nWin < 1) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nWin) {
      var m = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[PortableHash.strHash]] of a whole string as a column expression:
  * h = fold (h·31 + codepoint) mod 2³¹−1 — the integer-portable hash
  * the signature kernels use internally, exposed for row-level hashing
  * (feature-hashed embeddings, bucketing) where the DuckDB oracle must
  * replay the value exactly (xxhash64 has no DuckDB counterpart).
  * Contract: BMP text (UTF-16 code unit == codepoint).
  */
case class PortableStrHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_str_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    PortableHash.strHash(s, 0, s.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("strHashExpr", this, classOf[PortableStrHash].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization of an array<double> in one compiled
  * pass: scale = max|xᵢ| (order-insensitive → engine-portable), then
  * qᵢ = floor(xᵢ·127.0/scale + 0.5) ∈ [−127, 127]. Every per-element
  * step is a plain IEEE double op with a fixed operation order —
  * `(x*127.0)/scale + 0.5` — so DuckDB replays the quantized codes
  * bit-exactly and downstream integer dot products are EXACT
  * cross-engine (no rounding tolerance anywhere). Zero/empty vectors
  * quantize to all-zero codes; a NULL element nullifies the row
  * (same contract as [[L2Normalize]]).
  */
case class QuantizeInt8(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val a = math.abs(v.getDouble(i))
      if (a > scale) scale = a
      i += 1
    }
    val out = new Array[Long](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getDouble(i) * 127.0 / scale + 0.5).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantExpr", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two array<long> columns; full whole-stage
  * codegen (the int8-ANN hot path: 64-dim codes bound |Σ| by
  * 127²·64 ≈ 2²⁰ — overflow-free in 64 bits to ~2⁴² dims).
  */
case class DotLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) { $s += $x.getLong($i) * $y.getLong($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Engine-portable integer hash family shared by the signature kernels.
  *
  * Everything is plain 64-bit integer arithmetic over the Mersenne
  * prime p = 2³¹−1 with operands bounded so no product exceeds 2⁶² —
  * identical (and overflow-free) in any engine with 64-bit ints, which
  * is what lets the DuckDB oracle REPLAY minhash/simhash/LSH outputs
  * exactly (xxhash64 has no DuckDB counterpart, so the previous kernels
  * were only rows-only checkable). Contract: characters are UTF-16 code
  * units == codepoints (BMP text; the corpus is ASCII/BMP).
  */
object PortableHash {
  val P: Long = 2147483647L // 2^31 − 1

  /** Polynomial rolling hash of s[from, until): h = (h·31 + c) mod p. */
  def strHash(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
    h
  }

  def a(j: Int): Long = ((j + 1).toLong * 2654435761L) % P
  def b(j: Int): Long = ((j + 1).toLong * 1013904223L) % P

  /** j-th affine remix: (h·a_j + b_j) mod p; h,a_j < 2³¹ → no overflow. */
  def mix(h: Long, j: Int): Long = (h * a(j) + b(j)) % P
}

/** MinHash signature straight from text: slides a k-char window, hashes
  * each shingle once (polynomial mod 2³¹−1), then derives the
  * `numHashes` permutation values by affine remix ([[PortableHash]] —
  * integer-portable, so the DuckDB oracle replays the signature
  * exactly). Duplicate shingles need no dedup (min is idempotent).
  * Output: array<long> of length `numHashes`.
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = math.max(s.length - (k - 1), 1)
    var i = 0
    while (i < n) {
      val base = PortableHash.strHash(s, i, math.min(i + k, s.length))
      var j = 0
      while (j < numHashes) {
        val h = PortableHash.mix(base, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The distinct SHINGLE-HASH set of a text: every k-char window's
  * polynomial hash ([[PortableHash.strHash]] — the same integer-
  * portable value the MinHash signatures derive from and the DuckDB
  * oracle replays as its `sh.h`), deduplicated, ascending. This is the
  * compact at-rest form of a doc's shingle profile: 8 bytes per
  * distinct shingle instead of a k-char string, intersectable with
  * plain long equality. Output: array<long>, sorted.
  *
  * Windowing unit contract: windows advance over UTF-16 CODE UNITS
  * (`s.length` / char-indexed strHash), deliberately matching
  * [[MinHashSig]] so `minhash_from_hashes(shingle_hash_set(t))` is
  * bit-identical to `minhash_sig(t)` — the shared-pass identity the
  * property spec asserts. The sibling string-shingle kernel
  * [[ShingleSet]] windows over CODEPOINTS (substring semantics); for
  * supplementary-plane characters the two families therefore shingle
  * at different boundaries. Both are internally consistent — never mix
  * hash-set and string-set shingles of the same doc in one comparison.
  */
case class ShingleHashSet(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = math.max(s.length - (k - 1), 1)
    val seen = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      seen.add(PortableHash.strHash(s, i, math.min(i + k, s.length)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashExpr", this, classOf[ShingleHashSet].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature from an ALREADY-MATERIALIZED distinct shingle-hash
  * set ([[ShingleHashSet]]'s output): identical values to [[MinHashSig]]
  * on the source text — same affine remixes over the same base hashes,
  * and min over the distinct set equals min over the sliding windows
  * because duplicates are idempotent under min. This is the shared-pass
  * form: one corpus text scan materializes the hash sets, then both the
  * LSH banding (via this expression) and the exact-jaccard verify read
  * the same blocks instead of re-running the text kernel.
  * Output: array<long> of length `numHashes`.
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = PortableHash.mix(base, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSetExpr", this, classOf[MinHashFromHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection COUNT of two sorted-ascending distinct long arrays
  * ([[ShingleHashSet]] output) by primitive two-pointer merge — no
  * boxing, no hash set, no materialized intersection array. This is
  * the verify-stage kernel: per candidate pair the work is
  * O(|a| + |b|) long comparisons inside codegen, an order of magnitude
  * cheaper than generic array_intersect + size. Inputs MUST be sorted
  * ascending and duplicate-free (ShingleHashSet guarantees both).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // containsNull = false documents the no-null-elements precondition in
  // the type; acceptsType ignores nullability, so eval ALSO guards —
  // a null element fails loudly instead of silently merging as garbage.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), ArrayType(LongType, containsNull = false))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null array element (inputs must be " +
            "sorted duplicate-free non-null longs, e.g. shingle_hash_set output)")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sicExpr", this, classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = (Long) $ref.nullSafeEval($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of the whitespace-token multiset of lowercased text.
  * Per token: one polynomial hash; bit j's vote is the sign of the j-th
  * affine remix relative to p/2 ([[PortableHash]] — integer-portable,
  * so the DuckDB oracle replays per-bit votes and pair hamming
  * exactly); the sign vector is the fingerprint (bit j set ⟺
  * votes[j] > 0). Output: long.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val half = PortableHash.P / 2

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val votes = new Array[Int](64)
    var start = -1
    var i = 0
    val len = s.length
    while (i <= len) {
      val isWs = i == len || Character.isWhitespace(s.charAt(i))
      if (!isWs && start < 0) start = i
      else if (isWs && start >= 0) {
        val h = PortableHash.strHash(s, start, i)
        var j = 0
        while (j < 64) {
          if (PortableHash.mix(h, j) > half) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        start = -1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character-level Shannon entropy of a string in MICRO-NATS:
  * H = ln n − (Σ c·ln c)/n over code-point counts c, the Σ accumulated
  * in ASCENDING code-point order so the DuckDB replay (binary-collated
  * char grouping, `list(… ORDER BY c)` + sequential fold) adds the
  * identical IEEE sequence; floor(H·10⁶ + 0.5) as long, NULL for the
  * empty string. This is the gibberish/compressibility quality signal:
  * natural English ≈ 2.8–4.2 nats, `aaaa…` → 0, base64 and
  * key-mash junk run far higher — one compiled map pass, zero
  * shuffles, the only shape that matters on the raw 100 TB corpus.
  */
case class CharEntropyMicro(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy_micro"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) null
    else {
      val counts = new java.util.TreeMap[Integer, Long]()
      var i = 0
      var n = 0L
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val prev = counts.get(cp)
        counts.put(cp, if (prev == null) 1L else prev + 1L)
        n += 1L
        i += Character.charCount(cp)
      }
      var sum = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        sum += c * math.log(c.toDouble)
      }
      val h = math.log(n.toDouble) - sum / n
      java.lang.Long.valueOf(math.floor(h * 1e6 + 0.5).toLong)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropyExpr", this, classOf[CharEntropyMicro].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("he")
      s"""
         |Object $tmp = $ref.nullSafeEval($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = (Long) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket of an array<double>: `planes` sign bits
  * packed into a long (bit j = sign of the projection onto plane j).
  * Plane components are ±1 from the parity of an integer-portable
  * linear hash of (plane, dim), and each projection is a SEQUENTIAL
  * fold in dimension order — the DuckDB oracle replays the identical
  * add sequence, so sign bits (and the packed bucket) match exactly.
  * No plane matrix to broadcast. Output: long.
  */
case class LshBucket(child: Expression, planes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val m = ((i + 1).toLong * 2654435761L + (j + 1).toLong * 1013904223L) % PortableHash.P
        val sign = if (m % 2 == 0) 1.0 else -1.0
        s += v.getDouble(i) * sign
        i += 1
      }
      if (s >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshBucket].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Longest run of one repeated character (UTF-16 code units — the
  * [[ShingleHashSet]] unit contract; identical to codepoint runs on
  * BMP text): the template/spam screen's cheapest signal ("aaaaaa",
  * "-------") in ONE compiled pass per document — no char explode, no
  * islands shuffle. Empty string → 0. Cost is per ROW, not per
  * element, so the reference-call codegen (the hash-kernel pattern)
  * keeps the surrounding projection in whole-stage codegen.
  */
case class MaxCharRun(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_char_run"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var max = 0
    var run = 0
    var prev = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      run = if (i > 0 && c == prev) run + 1 else 1
      if (run > max) max = run
      prev = c
      i += 1
    }
    max
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mcrExpr", this, classOf[MaxCharRun].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Integer) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
