package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Generator emitting every unordered id pair (a < b) from a posting
  * list — the inner step of the inverted-index similarity join.
  *
  * Turning posting lists into pairs with a generator (instead of a
  * shingle⨝shingle self-join) halves the shuffles: one exchange builds
  * the posting lists, pair rows are generated in place and partially
  * aggregated map-side before the (doc_a, doc_b) exchange. The
  * `maxDf` posting-list cap bounds the quadratic blowup per list.
  */
case class SortedPairs(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val n = arr.numElements()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = arr.getLong(i); i += 1 }
      java.util.Arrays.sort(ids)
      new Iterator[InternalRow] {
        private var a = 0
        private var b = 1
        override def hasNext: Boolean = a < n - 1 && b < n
        override def next(): InternalRow = {
          val row = InternalRow(ids(a), ids(b))
          b += 1
          if (b >= n) { a += 1; b = a + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedPairs {
  def apply(ids: Column): Column =
    ColumnBridge.column(SortedPairs(ColumnBridge.expression(ids)))
}
