package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query must execute at sf0.001 and return rows —
  * a 0-row result is almost always a broken predicate, and queries
  * that throw never reach the driver's oracle gate.
  */
class QueriesSpec extends SparkSpec {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has oracle SQL or is explicitly oracle-less") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o.diff(q)}")
  }

  test("approx_count_distinct within 5% of exact on events.user_id") {
    val e = Tables(spark, sfDir, "events")
    val approx = e.agg(approx_count_distinct("user_id")).head.getLong(0)
    val exact = e.agg(countDistinct("user_id")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
