package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** Bounded buffer of at most k (item, count) counters. Kept as two
  * parallel arrays so the buffer encoder is flat primitive arrays (no
  * per-entry object encoding through the shuffle).
  */
case class MgBuf(items: Array[Long], counts: Array[Long])

/** One-pass Misra–Gries φ-heavy-hitter summary over a Long column —
  * the bounded-memory scale path behind the exact two-pass
  * q_agg_heavy_hitters (which the DuckDB oracle verifies; this
  * aggregator is QualitySpec-gated instead, like the sketch family).
  *
  * Guarantees (Misra–Gries '82; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS '12): after summarizing n items with
  * k counters, every item with true frequency f > n/(k+1) is present,
  * and every reported estimate e satisfies f − n/(k+1) ≤ e ≤ f. The
  * merge subtracts the (k+1)-th largest combined count from every
  * counter and drops the non-positive ones, which preserves the error
  * bound under partial aggregation — so the shuffle moves one
  * ≤k-counter buffer per partition, O(k) regardless of row count:
  * exactly the property that makes frequency estimation feasible in
  * one scan at 100 TB, where the exact form needs a full vocab-sized
  * shuffle first.
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, MgBuf, Map[Long, Long]]
    with Serializable {
  require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")

  override def zero: MgBuf = MgBuf(Array.empty, Array.empty)

  override def reduce(b: MgBuf, x: Long): MgBuf = {
    val i = b.items.indexOf(x)
    if (i >= 0) { b.counts(i) += 1; b }
    else if (b.items.length < k)
      MgBuf(b.items :+ x, b.counts :+ 1L)
    else {
      // Decrement-all step: charge one occurrence of every tracked
      // item against the untracked arrival, drop exhausted counters.
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
      val keep = b.counts.indices.filter(b.counts(_) > 0)
      MgBuf(keep.map(b.items).toArray, keep.map(b.counts).toArray)
    }
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    if (x.items.isEmpty) y
    else if (y.items.isEmpty) x
    else {
      val m = collection.mutable.LongMap.empty[Long]
      var j = 0
      while (j < x.items.length) {
        m(x.items(j)) = m.getOrElse(x.items(j), 0L) + x.counts(j); j += 1
      }
      j = 0
      while (j < y.items.length) {
        m(y.items(j)) = m.getOrElse(y.items(j), 0L) + y.counts(j); j += 1
      }
      if (m.size <= k) {
        val arr = m.toArray
        MgBuf(arr.map(_._1), arr.map(_._2))
      } else {
        // Subtract the (k+1)-th largest count; ≤ k survive.
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(k)
        val kept = m.toArray.collect {
          case (item, c) if c - cut > 0 => (item, c - cut)
        }
        MgBuf(kept.map(_._1), kept.map(_._2))
      }
    }
  }

  override def finish(b: MgBuf): Map[Long, Long] =
    b.items.zip(b.counts).toMap

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

object MisraGriesAgg {
  /** Column-level entry point: mgSummary(k)(longCol). */
  def column(k: Int): Column => Column = {
    val u = udaf(new MisraGriesAgg(k), ExpressionEncoder[Long]())
    (c: Column) => u(c)
  }
}
