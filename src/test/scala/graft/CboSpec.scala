package graft

/** Cost-based-optimizer surface (round-1 verdict gap #4): `ANALYZE
  * TABLE` statistics flowing into Catalyst. At 100 TB the optimizer
  * cannot see data sizes from file listings alone — join strategy and
  * join order come from catalog statistics, so the engine must (a)
  * collect them and (b) actually plan with them. These tests pin both:
  * exact rowCount from ANALYZE, column-level NDV, and CBO cardinality
  * propagation through a join.
  */
class CboSpec extends SparkSpec {

  private lazy val setupOnce: Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    Seq("customer", "orders").foreach { t =>
      // The in-memory catalog forgets tables between JVMs but the
      // warehouse directory survives — clear both before recreating.
      spark.sql(s"DROP TABLE IF EXISTS graft_cbo.$t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "graft_cbo.db", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      Tables(spark, sfDir, t).write.saveAsTable(s"graft_cbo.$t")
      spark.sql(s"ANALYZE TABLE graft_cbo.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  private def setup(): Unit = setupOnce

  test("ANALYZE TABLE yields exact rowCount stats on the relation") {
    setup()
    val expected = Tables(spark, sfDir, "customer").count()
    // rowCount surfaces through the stats visitor only under CBO —
    // without it Catalyst plans on sizeInBytes alone.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("graft_cbo.customer")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)), stats.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("column statistics carry distinct counts for join estimation") {
    setup()
    val desc = spark
      .sql("DESCRIBE EXTENDED graft_cbo.orders o_custkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // distinct_count is what CostBasedJoinReorder uses for join
    // cardinality; NULL here would mean stats aren't really flowing.
    assert(desc.get("distinct_count").exists(v => v != null && v != "NULL"),
      desc.toString)
  }

  test("CBO propagates cardinality through a join plan") {
    setup()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      // Assert on the JOIN node itself — the aggregate above it
      // estimates ~NDV(c_mktsegment) rows, which would pass any bound
      // regardless of how wrong the join cardinality is.
      val joinStats = spark.sql("""
        SELECT c.c_mktsegment, count(*) AS n
        FROM graft_cbo.orders o
        JOIN graft_cbo.customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""")
        .queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.stats
        }
      assert(joinStats.nonEmpty)
      // FK join: true cardinality = |orders|; CBO's NDV-based estimate
      // must be defined and within 10x either way.
      val trueCard = Tables(spark, sfDir, "orders").count().toDouble
      val est = joinStats.head.rowCount
      assert(est.isDefined, joinStats.head.toString)
      assert(est.get.toDouble >= trueCard / 10.0 &&
        est.get.toDouble <= trueCard * 10.0,
        s"est=${est.get} true=$trueCard")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }
}
