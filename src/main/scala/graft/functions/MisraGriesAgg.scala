package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** Bounded buffer of (item, count) counters, as flat primitive arrays
  * so the buffer encoder is primitive-array-shaped through the shuffle
  * (no per-entry object encoding). Only the first `used` slots are
  * meaningful (arrays carry growth capacity, ≤ 2× the live size);
  * `offset` is the lazily-applied decrement-all debt — an entry's LIVE
  * count is `counts(i) - offset`, and a slot whose stored count is
  * ≤ offset is logically evicted (it keeps its place until the next
  * compaction, or is re-used in place if its item re-arrives).
  *
  * The two `@transient` fields are per-partition working state, never
  * encoded: `idx` maps item → slot for O(1) lookup (rebuilt after
  * deserialization — `idx == null` is the rebuild signal), `liveMinLB`
  * is a lower bound on the minimum live count, so `offset ≥ liveMinLB`
  * is the only time a compaction scan can find dead slots.
  */
case class MgBuf(var items: Array[Long], var counts: Array[Long],
                 var used: Int, var offset: Long) {
  @transient private[functions] var idx: scala.collection.mutable.LongMap[Int] = _
  @transient private[functions] var liveMinLB: Long = Long.MaxValue
}

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
  *
  * Per-row cost is amortized O(1) at any k: lookups go through a
  * transient LongMap slot index (not a linear scan), the textbook
  * decrement-all step is a lazy `offset += 1`, and the O(k)
  * dead-slot compaction runs only when the offset crosses the
  * minimum live count — at most once per decrement-all, whose count
  * is itself bounded by n/(k+1), so total compaction work is O(n).
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, MgBuf, Map[Long, Long]]
    with Serializable {
  require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")

  override def zero: MgBuf = MgBuf(Array.empty, Array.empty, 0, 0L)

  /** Rebuild the transient slot index + live-min bound after
    * deserialization (or on a fresh zero buffer). O(used), once per
    * partition resume.
    */
  private def rebuild(b: MgBuf): Unit = {
    val m = new scala.collection.mutable.LongMap[Int](math.max(8, b.used * 2))
    var lm = Long.MaxValue
    var i = 0
    while (i < b.used) {
      m(b.items(i)) = i
      if (b.counts(i) > b.offset && b.counts(i) < lm) lm = b.counts(i)
      i += 1
    }
    b.idx = m
    b.liveMinLB = lm
  }

  /** Drop dead slots (count ≤ offset), rebase live counts to absolute
    * (offset := 0), recompute the exact live minimum. O(used); runs
    * at most once per decrement-all, so amortized O(1) per row.
    */
  private def compact(b: MgBuf): Unit = {
    var w = 0
    var lm = Long.MaxValue
    var i = 0
    while (i < b.used) {
      val live = b.counts(i) - b.offset
      if (live > 0) {
        b.items(w) = b.items(i)
        b.counts(w) = live
        if (live < lm) lm = live
        w += 1
      }
      i += 1
    }
    b.used = w
    b.offset = 0L
    b.liveMinLB = lm
    val m = new scala.collection.mutable.LongMap[Int](math.max(8, w * 2))
    i = 0
    while (i < w) { m(b.items(i)) = i; i += 1 }
    b.idx = m
  }

  /** Append x into a free slot (caller guarantees used < k), growing
    * capacity geometrically so per-insert array copying is amortized
    * O(1) instead of an O(k) copy per arrival.
    */
  private def insert(b: MgBuf, x: Long): Unit = {
    if (b.used == b.items.length) {
      val ncap = math.min(k, math.max(4, b.items.length * 2))
      b.items = java.util.Arrays.copyOf(b.items, ncap)
      b.counts = java.util.Arrays.copyOf(b.counts, ncap)
    }
    b.items(b.used) = x
    b.counts(b.used) = b.offset + 1
    b.idx(x) = b.used
    b.used += 1
    if (b.offset + 1 < b.liveMinLB) b.liveMinLB = b.offset + 1
  }

  override def reduce(b: MgBuf, x: Long): MgBuf = {
    if (b.idx == null) rebuild(b)
    b.idx.get(x) match {
      case Some(i) =>
        if (b.counts(i) > b.offset) b.counts(i) += 1 // live: increment
        else { // dead slot still holding x: re-insert in place
          b.counts(i) = b.offset + 1
          if (b.offset + 1 < b.liveMinLB) b.liveMinLB = b.offset + 1
        }
        b
      case None =>
        // Free a slot first if any entry has died since the last scan.
        if (b.used == k && b.offset >= b.liveMinLB) compact(b)
        if (b.used < k) insert(b, x)
        // Decrement-all step: charge one occurrence of every tracked
        // item against the untracked arrival (which is charged too,
        // hence not inserted). Lazy: one offset bump, dead slots are
        // reaped by the next compaction.
        else b.offset += 1
        b
    }
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    if (x.used == 0) y
    else if (y.used == 0) x
    else {
      val m = scala.collection.mutable.LongMap.empty[Long]
      var j = 0
      while (j < x.used) {
        val live = x.counts(j) - x.offset
        if (live > 0) m(x.items(j)) = m.getOrElse(x.items(j), 0L) + live
        j += 1
      }
      j = 0
      while (j < y.used) {
        val live = y.counts(j) - y.offset
        if (live > 0) m(y.items(j)) = m.getOrElse(y.items(j), 0L) + live
        j += 1
      }
      if (m.size <= k) {
        val arr = m.toArray
        MgBuf(arr.map(_._1), arr.map(_._2), arr.length, 0L)
      } else {
        // Subtract the (k+1)-th largest count; ≤ k survive.
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(k)
        val kept = m.toArray.collect {
          case (item, c) if c - cut > 0 => (item, c - cut)
        }
        MgBuf(kept.map(_._1), kept.map(_._2), kept.length, 0L)
      }
    }
  }

  override def finish(b: MgBuf): Map[Long, Long] =
    (0 until b.used).iterator
      .filter(i => b.counts(i) > b.offset)
      .map(i => b.items(i) -> (b.counts(i) - b.offset))
      .toMap

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
