package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Graph operators (SURVEY.md §2.B LLM-pipeline / graph surface).
  *
  * Connected components (near-dup clustering) lives with the dedup
  * family in [[Dedup]]; this module holds the rank-propagation side:
  * fixed-iteration PageRank over a bipartite business graph. Together
  * they cover the two iterative-graph shapes a data pipeline actually
  * runs (label propagation and rank/importance propagation) without a
  * graph framework dependency — both are loops of one shuffle-join +
  * one partial-agg'd aggregate over a checkpointed edge list, which is
  * exactly how GraphX/Pregel executes them anyway.
  */
object Graphs extends QueryModule {

  /** PageRank over the customer↔supplier transaction graph: an edge
    * means "this customer ordered a line item from this supplier"
    * (lineitem ⋈ orders, distinct pairs). Node ids are disjoint by
    * construction — customers keep their key, suppliers are negated.
    * 3 iterations, damping 0.85; final ranks tie-proof-rounded
    * ([[Norm.r4tie]], ranks are positive) for the cross-engine hash.
    *
    * Scale: the edge build is one fact-table join whose output
    * (distinct pairs) is ≪ the fact table; iterations touch only the
    * checkpointed edge list. See [[graft.api.ops.GraftDataFrameOps.pageRank]].
    */
  val graphPagerank: Q = (spark, dir) => {
    import graft.api.ops._
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    val edges = li
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("cust"),
        (-col("l_suppkey")).as("supp"))
    edges.pageRank("cust", "supp", iters = 3, damping = 0.85)
      .select(col("id"), Norm.r4tie(col("rank")).as("rank"))
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q_graph_pagerank" -> graphPagerank,
  )

  val oracle: Map[String, String] = Map(
    "q_graph_pagerank" -> """
      WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, -l_suppkey AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT s, t FROM e0 UNION SELECT t AS s, s AS t FROM e0),
      deg AS (SELECT s, count(*) AS deg FROM edges GROUP BY s),
      r0 AS (SELECT DISTINCT s AS id, CAST(1.0 AS DOUBLE) AS rank
             FROM edges),
      r1 AS (SELECT e.t AS id,
               CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                 * sum(r.rank / d.deg) AS rank
             FROM edges e JOIN deg d ON e.s = d.s
               JOIN r0 r ON e.s = r.id GROUP BY e.t),
      r2 AS (SELECT e.t AS id,
               CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                 * sum(r.rank / d.deg) AS rank
             FROM edges e JOIN deg d ON e.s = d.s
               JOIN r1 r ON e.s = r.id GROUP BY e.t),
      r3 AS (SELECT e.t AS id,
               CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                 * sum(r.rank / d.deg) AS rank
             FROM edges e JOIN deg d ON e.s = d.s
               JOIN r2 r ON e.s = r.id GROUP BY e.t)
      SELECT id, floor(rank * 10000 + 0.5) / 10000 AS rank
      FROM r3 ORDER BY id""",
  )
}
