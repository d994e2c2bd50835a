package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Running elementwise sum + count for a vector mean. */
case class CentroidBuf(sums: Array[Double], n: Long)

/** Elementwise-mean UDAF over an embedding column — typed Aggregator
  * (UDAF surface, SURVEY.md §2.B q_centroid_per_label).
  *
  * Partial aggregation applies: each partition folds its vectors into
  * one (sums, n) buffer, so the shuffle moves one 64-double buffer per
  * (label × partition), not the vectors — at 100 TB the shuffle volume
  * is O(labels), independent of row count.
  */
object CentroidAgg extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)

  override def reduce(b: CentroidBuf, a: Seq[Float]): CentroidBuf = {
    if (a == null) b
    else if (b.n == 0L) CentroidBuf(a.map(_.toDouble).toArray, 1L)
    else {
      var i = 0
      while (i < b.sums.length) { b.sums(i) += a(i); i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    }
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      CentroidBuf(x.sums, x.n + y.n)
    }
  }

  override def finish(b: CentroidBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] =
    ExpressionEncoder[CentroidBuf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  /** Column-level entry point: centroid(embeddingCol). */
  def column: Column => Column = {
    val u = udaf(CentroidAgg, ExpressionEncoder[Seq[Float]]())
    (c: Column) => u(c)
  }
}
