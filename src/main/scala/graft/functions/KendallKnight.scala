package graft.functions

/** Knight's O(n log n) tie-aware Kendall pair-count algorithm (Knight
  * 1966, "A computer method for calculating Kendall's tau with
  * ungrouped data") — the long-span replacement for the hour-pair
  * join in `q_stats_kendall`, whose cost is quadratic in the CALENDAR
  * (hours² per type pair). Past a few thousand hours the join stops
  * paying for its codegen advantage; here each series is counted in
  * one task: sort by (x, y), read off tie-run pair counts, and count
  * y-inversions with a merge sort.
  *
  * Identity used: with pairs sorted by (x asc, y asc),
  *  - an x-tied pair is y-sorted → contributes 0 inversions;
  *  - a y-tied pair is never an inversion (strict comparison);
  *  - so inversions = exactly the DISCORDANT pairs, and
  *    C = n₀ − t_x − t_y + t_xy − D (untied pairs minus discordant).
  * All counts are exact Longs — bit-identical to the quadratic
  * sign-comparison form (PropertySpec fuzzes the equivalence).
  */
object KendallKnight {

  /** (n0, concordant, discordant, tie_x, tie_y) for one series of
    * (x, y) points — the same five counts the quadratic join form
    * aggregates. tie_x counts pairs with x₁ = x₂ (regardless of y),
    * tie_y likewise; both-tied pairs are in both counts.
    */
  def stats(pts: Array[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val n = pts.length.toLong
    val n0 = n * (n - 1) / 2
    if (n < 2) return (n0, 0L, 0L, 0L, 0L)
    val sorted = pts.sorted // (x asc, y asc)
    def runPairs[K](keys: Array[K]): Long = {
      var total = 0L
      var i = 0
      while (i < keys.length) {
        var j = i + 1
        while (j < keys.length && keys(j) == keys(i)) j += 1
        val g = (j - i).toLong
        total += g * (g - 1) / 2
        i = j
      }
      total
    }
    val tx = runPairs(sorted.map(_._1))
    val txy = runPairs(sorted)
    val ysSorted = sorted.map(_._2).sorted
    val ty = runPairs(ysSorted)
    val d = countInversions(sorted.map(_._2))
    val c = n0 - tx - ty + txy - d
    (n0, c, d, tx, ty)
  }

  /** Strict inversions (a[i] > a[j], i < j) by merge sort; equal
    * elements are taken from the left run first and never counted. */
  private[functions] def countInversions(a: Array[Long]): Long = {
    val buf = new Array[Long](a.length)
    def go(lo: Int, hi: Int): Long = { // [lo, hi)
      if (hi - lo < 2) 0L
      else {
        val mid = (lo + hi) >>> 1
        var inv = go(lo, mid) + go(mid, hi)
        var i = lo
        var j = mid
        var k = lo
        while (i < mid && j < hi) {
          if (a(j) < a(i)) { // strictly smaller from the right run
            inv += (mid - i).toLong
            buf(k) = a(j); j += 1
          } else {
            buf(k) = a(i); i += 1
          }
          k += 1
        }
        while (i < mid) { buf(k) = a(i); i += 1; k += 1 }
        while (j < hi) { buf(k) = a(j); j += 1; k += 1 }
        System.arraycopy(buf, lo, a, lo, hi - lo)
        inv
      }
    }
    go(0, a.length)
  }
}
