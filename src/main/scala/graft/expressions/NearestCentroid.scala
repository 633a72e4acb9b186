package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** argmax-cosine centroid assignment: the IVF coarse quantizer.
  * Centroids ride inside the expression (k·dim doubles — serialized once
  * per task with the plan, no join needed); the scan assigns each vector
  * in a tight loop. Centroids are pre-normalized at construction so
  * assignment is a pure dot-product argmax.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private lazy val normed: Array[Array[Double]] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) c.clone() else c.map(_ / n)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var cIdx = 0
    while (cIdx < normed.length) {
      val c = normed(cIdx)
      var s = 0.0
      var i = 0
      val n = math.min(dim, c.length)
      while (i < n) { s += v.getDouble(i) * c(i); i += 1 }
      if (s > bestDot) { bestDot = s; best = cIdx }
      cIdx += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ncExpr", this, classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Integer) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))
}
