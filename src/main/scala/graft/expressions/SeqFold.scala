package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled sequential left fold over an `array<double>` — the window
  * analytics' bit-exactness workhorse (Horner EW sums, Σx, Σx², NAV
  * compounding) without the interpreted-lambda tax.
  *
  * The HOF form (`aggregate(arr, 0.0, (a, x) => …)`) evaluates its
  * lambda per ELEMENT interpreted and, being CodegenFallback, knocks
  * the whole projection out of whole-stage codegen; measured ~1.7 ms
  * of pure lambda interpretation per 120-element frame row (macd at
  * sf0.1). This expression runs the IDENTICAL left fold — same element
  * order, same add/multiply sequence, no FMA fusion — as a tight
  * compiled loop, so results are bit-for-bit what the HOF produced and
  * every DuckDB `list_reduce` oracle replays unchanged.
  *
  * Op vocabulary (init 0.0 unless noted; `w` = [[weight]]):
  *   - `sum`           acc + x
  *   - `sumsq`         acc + x·x
  *   - `horner`        acc·w + x            (EW weighted sum)
  *   - `horner_count`  acc·w + 1            (EW weight total; ignores x)
  *   - `horner_pos`    acc·w + max(x, 0)    (Wilder RSI gains)
  *   - `horner_neg`    acc·w + max(−x, 0)   (Wilder RSI losses)
  *   - `prod1p`        acc·(1 + x), init 1  (NAV compounding)
  *   - `sum3`          acc + (x·x)·x        (third raw moment)
  *   - `sum4`          acc + ((x·x)·x)·x    (fourth raw moment)
  *
  * Null contract, matching the HOF lambdas exactly: a null element
  * poisons ops that read `x` (null propagates through `+`/`*` to the
  * final accumulator → result NULL from the first null on, which is
  * observationally the same as NULL at the first null); `horner_count`
  * never reads `x`, so nulls step the weight like any element.
  * `java.lang.Math.max` matches `greatest` on doubles (−0.0 < 0.0,
  * NaN greatest) per java.lang.Double.compare.
  */
case class SeqFold(child: Expression, op: String, weight: Double = 0.0)
  extends UnaryExpression with ExpectsInputTypes {

  require(SeqFold.Ops.contains(op), s"unknown seq_fold op: $op")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"seq_fold_$op"

  private def usesX: Boolean = op != "horner_count"
  private def init: Double = if (op == "prod1p") 1.0 else 0.0

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var acc = init
    var i = 0
    if (!usesX) {
      while (i < n) { acc = acc * weight + 1.0; i += 1 }
      acc
    } else {
      while (i < n) {
        if (v.isNullAt(i)) return null
        val x = v.getDouble(i)
        acc = op match {
          case "sum"        => acc + x
          case "sumsq"      => acc + x * x
          case "sum3"       => acc + x * x * x
          case "sum4"       => acc + x * x * x * x
          case "horner"     => acc * weight + x
          case "horner_pos" => acc * weight + math.max(x, 0.0)
          case "horner_neg" => acc * weight + math.max(-x, 0.0)
          case "prod1p"     => acc * (1.0 + x)
        }
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      // Double.toString round-trips exactly, so the literal re-parses to
      // the same bits the interpreted path multiplies by.
      val w = s"${weight}d"
      val step = op match {
        case "sum"          => s"$acc = $acc + $x;"
        case "sumsq"        => s"$acc = $acc + $x * $x;"
        case "sum3"         => s"$acc = $acc + $x * $x * $x;"
        case "sum4"         => s"$acc = $acc + $x * $x * $x * $x;"
        case "horner"       => s"$acc = $acc * $w + $x;"
        case "horner_count" => s"$acc = $acc * $w + 1.0d;"
        case "horner_pos"   => s"$acc = $acc * $w + java.lang.Math.max($x, 0.0d);"
        case "horner_neg"   => s"$acc = $acc * $w + java.lang.Math.max(-$x, 0.0d);"
        case "prod1p"       => s"$acc = $acc * (1.0d + $x);"
      }
      val body =
        if (!usesX) step
        else
          s"""
             |if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
             |double $x = $c.getDouble($i);
             |$step
           """.stripMargin
      s"""
         |int $n = $c.numElements();
         |double $acc = ${init}d;
         |for (int $i = 0; $i < $n; $i++) {
         |  $body
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeqFold {
  val Ops: Set[String] =
    Set("sum", "sumsq", "sum3", "sum4",
      "horner", "horner_count", "horner_pos", "horner_neg", "prod1p")
}
