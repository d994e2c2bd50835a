package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** String-keyed twin of [[MgBuf]]: bounded (term, count) counters as
  * parallel arrays (`items` is an object array, but still flat — no
  * per-entry struct encoding through the shuffle). Slots beyond `used`
  * are growth capacity; `offset` is the lazy decrement-all debt (live
  * count = `counts(i) - offset`). The transient fields are rebuilt
  * after deserialization, never encoded.
  */
case class MgSBuf(var items: Array[String], var counts: Array[Long],
                  var used: Int, var offset: Long) {
  @transient private[functions] var idx: scala.collection.mutable.AnyRefMap[String, Int] = _
  @transient private[functions] var liveMinLB: Long = Long.MaxValue
}

/** One-pass Misra–Gries φ-heavy-hitter summary over a STRING column —
  * the vocabulary form of [[MisraGriesAgg]]: top terms of a 100 TB
  * corpus in one scan with O(k) state per partition and one ≤k-entry
  * buffer through the shuffle, where the exact form
  * (`groupBy(term).count`) must shuffle the full vocabulary first.
  * Same guarantees (f − n/(k+1) ≤ estimate ≤ f; every item with
  * f > n/(k+1) present; mergeable per Agarwal et al. PODS '12) and
  * the same amortized-O(1)-per-row structure as the Long form: hash
  * slot index, lazy offset decrement-all, compaction gated on the
  * minimum live count.
  *
  * EXACTNESS property worth knowing: when k ≥ the true number of
  * distinct terms, no decrement ever fires and the summary IS the
  * exact frequency table — so a generously-sized sketch can be
  * oracle-checked exactly at test scale while remaining the
  * bounded-memory path in production. NULL inputs are ignored (SQL
  * aggregate convention).
  */
class MisraGriesStrAgg(k: Int)
    extends Aggregator[String, MgSBuf, Map[String, Long]]
    with Serializable {
  require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")

  override def zero: MgSBuf = MgSBuf(Array.empty, Array.empty, 0, 0L)

  private def rebuild(b: MgSBuf): Unit = {
    val m = new scala.collection.mutable.AnyRefMap[String, Int](
      math.max(8, b.used * 2))
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

  private def compact(b: MgSBuf): Unit = {
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
    // Clear dropped object slots so evicted terms don't pin memory.
    java.util.Arrays.fill(b.items.asInstanceOf[Array[AnyRef]], w,
      b.used, null)
    b.used = w
    b.offset = 0L
    b.liveMinLB = lm
    val m = new scala.collection.mutable.AnyRefMap[String, Int](
      math.max(8, w * 2))
    i = 0
    while (i < w) { m(b.items(i)) = i; i += 1 }
    b.idx = m
  }

  private def insert(b: MgSBuf, x: String): Unit = {
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

  override def reduce(b: MgSBuf, x: String): MgSBuf = {
    if (x == null) return b
    if (b.idx == null) rebuild(b)
    b.idx.get(x) match {
      case Some(i) =>
        if (b.counts(i) > b.offset) b.counts(i) += 1
        else { // dead slot still holding x: re-insert in place
          b.counts(i) = b.offset + 1
          if (b.offset + 1 < b.liveMinLB) b.liveMinLB = b.offset + 1
        }
        b
      case None =>
        if (b.used == k && b.offset >= b.liveMinLB) compact(b)
        if (b.used < k) insert(b, x)
        else b.offset += 1 // lazy decrement-all; newcomer charged too
        b
    }
  }

  override def merge(x: MgSBuf, y: MgSBuf): MgSBuf = {
    if (x.used == 0) y
    else if (y.used == 0) x
    else {
      val m = scala.collection.mutable.AnyRefMap.empty[String, Long]
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
        MgSBuf(arr.map(_._1), arr.map(_._2), arr.length, 0L)
      } else {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(k)
        val kept = m.toArray.collect {
          case (item, c) if c - cut > 0 => (item, c - cut)
        }
        MgSBuf(kept.map(_._1), kept.map(_._2), kept.length, 0L)
      }
    }
  }

  override def finish(b: MgSBuf): Map[String, Long] =
    (0 until b.used).iterator
      .filter(i => b.counts(i) > b.offset)
      .map(i => b.items(i) -> (b.counts(i) - b.offset))
      .toMap

  override def bufferEncoder: Encoder[MgSBuf] = ExpressionEncoder[MgSBuf]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesStrAgg {
  /** Column-level entry point: mgSummaryStr(k)(stringCol). */
  def column(k: Int): Column => Column = {
    val u = udaf(new MisraGriesStrAgg(k), ExpressionEncoder[String]())
    (c: Column) => u(c)
  }
}
