package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Bounded buffer: the ≤ k smallest (rank, id) pairs, rank-ascending. */
case class BkBuf(items: Seq[(String, Long)])

/** Deterministic bottom-k-by-rank reservoir sample — a typed UDAF
  * keeping the k rows with the SMALLEST rank per group, where the rank
  * is a caller-supplied content-stable hash (md5 of the id in the
  * scored query). Hash-ranked bottom-k IS a uniform sample, but unlike
  * RNG reservoirs it is mergeable, rerun-stable, and exactly
  * oracle-checkable (the DuckDB twin replays the same md5 ordering).
  *
  * Scale: partial aggregation applies — each partition folds to one
  * ≤ k-pair buffer, the shuffle moves O(groups × k) pairs, never rows.
  * The insert fast-path rejects any row ranked ≥ the buffer's max once
  * the buffer is full, so expected insert work is the classic
  * O(k·log n) per partition; ties (a 128-bit md5 collision) break on
  * the id, keeping the result total-ordered and deterministic.
  */
case class BottomKAgg(k: Int)
    extends Aggregator[(String, Long), BkBuf, Seq[Long]] {
  require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

  override def zero: BkBuf = BkBuf(Vector.empty)

  override def reduce(b: BkBuf, a: (String, Long)): BkBuf =
    if (a == null || a._1 == null) b
    else if (b.items.size >= k &&
      implicitly[Ordering[(String, Long)]].gteq(a, b.items.last)) b
    else BkBuf((b.items :+ a).sorted.take(k))

  override def merge(x: BkBuf, y: BkBuf): BkBuf =
    if (x.items.isEmpty) y
    else if (y.items.isEmpty) x
    else BkBuf((x.items ++ y.items).sorted.take(k))

  override def finish(b: BkBuf): Seq[Long] = b.items.map(_._2)

  override def bufferEncoder: Encoder[BkBuf] = ExpressionEncoder[BkBuf]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object BottomKAgg {
  /** Column entry point: bottomK(k)(rankCol, idCol) → array<long> of
    * the k ids with the smallest (rank, id).
    */
  def bottomK(k: Int): (Column, Column) => Column = {
    val u = udaf(BottomKAgg(k), ExpressionEncoder[(String, Long)]())
    (rank: Column, id: Column) => u(rank, id)
  }
}
