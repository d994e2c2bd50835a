package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** Count-Min sketch over a String column (Cormode & Muthukrishnan
  * 2005) — the third mergeable one-scan summary next to HLL
  * (distincts) and Misra–Gries (heavy hitters): CM answers POINT
  * FREQUENCY queries for ANY item after the fact, not just the
  * retained top-k.
  *
  * `depth` rows × `width` counters; item x increments one counter per
  * row at an independent hash. Estimate = min over rows, giving the
  * classic guarantee: est ≥ true always (one-sided — collisions only
  * inflate), and est ≤ true + (e/width)·n with probability
  * ≥ 1 − e^−depth. Merge is elementwise counter ADDITION (the sketch
  * is a linear projection of the frequency vector), so partial
  * aggregation is exact, not approximated-again: the shuffle moves one
  * depth×width Long grid per partition — O(1) in row count, the
  * property that makes per-term frequency lookup feasible in one scan
  * at 100 TB where an exact vocab count needs a vocab-sized shuffle.
  *
  * Hashing: MurmurHash3 of the term string, salted by the row index —
  * deterministic across JVMs (no seed-by-time anywhere), so results
  * are stable run-to-run; there is deliberately no DuckDB twin (no
  * portable murmur), the QualitySpec bounds gate covers it like the
  * rest of the sketch family.
  */
case class CmBuf(grid: Array[Long])

class CountMinAgg(width: Int, depth: Int)
    extends Aggregator[String, CmBuf, Array[Long]] with Serializable {
  require(width >= 8 && width <= (1 << 20),
    s"width must be in [8, 2^20], got $width")
  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")

  private def slot(row: Int, x: String): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(x, 0x9747b28c + row)
    val m = h & Int.MaxValue // non-negative
    row * width + (m % width)
  }

  override def zero: CmBuf = CmBuf(new Array[Long](width * depth))

  override def reduce(b: CmBuf, x: String): CmBuf = {
    if (x != null) {
      var r = 0
      while (r < depth) { b.grid(slot(r, x)) += 1; r += 1 }
    }
    b
  }

  override def merge(x: CmBuf, y: CmBuf): CmBuf = {
    var i = 0
    while (i < x.grid.length) { x.grid(i) += y.grid(i); i += 1 }
    x
  }

  override def finish(b: CmBuf): Array[Long] = b.grid

  override def bufferEncoder: Encoder[CmBuf] = ExpressionEncoder[CmBuf]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  /** Column-level entry point: cmSketch(width, depth)(strCol). */
  def column(width: Int, depth: Int): Column => Column = {
    val u = udaf(new CountMinAgg(width, depth), ExpressionEncoder[String]())
    (c: Column) => u(c)
  }

  /** Driver-side point query against a finished sketch grid. */
  def estimate(grid: Array[Long], width: Int, depth: Int,
               x: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val h = scala.util.hashing.MurmurHash3.stringHash(x, 0x9747b28c + r)
      val v = grid(r * width + ((h & Int.MaxValue) % width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
