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

  test("GraphSpine-backed builds match the inline per-query edge builds") {
    import graft.api.ops._
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    val fact = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    // wedge op: shared distinct spine vs the op's own distinct+checkpoint
    val aaInline = fact
      .adamicAdar(col("o_custkey"), col("l_suppkey"), topK = 20,
        maxDeg = 1000)
      .collect().toSeq
    val aaSpine = operators.GraphSpine.coPurchase(spark, sfDir)
      .adamicAdar(col("cust"), col("supp"), topK = 20,
        maxDeg = 1000, assumeDistinct = true)
      .collect().toSeq
    assert(aaSpine === aaInline)
    // iterative op: preparedSym spine vs the op's internal symmetrize.
    // Ranks are float sums whose partial-agg order may differ between
    // the two (identically-partitioned but differently-ordered) edge
    // builds — compare at the 4dp the scored query emits.
    val half = fact.select(col("o_custkey").as("cust"),
      (-col("l_suppkey")).as("supp"))
    def r4(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), Norm.r4tie(col("rank")).as("rank"))
      .orderBy("id").collect().toSeq
    val prInline = r4(half.pageRank("cust", "supp", iters = 3))
    val prSpine = r4(operators.GraphSpine.symSigned(spark, sfDir)
      .pageRank("s", "t", iters = 3, preparedSym = true))
    assert(prSpine === prInline)
  }

  test("approx_count_distinct within 5% of exact on events.user_id") {
    val e = Tables(spark, sfDir, "events")
    val approx = e.agg(approx_count_distinct("user_id")).head.getLong(0)
    val exact = e.agg(countDistinct("user_id")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
