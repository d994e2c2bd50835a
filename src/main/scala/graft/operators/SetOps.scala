package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.B "Set operations").
  *
  * UNION ALL is plan-level concat (no shuffle); INTERSECT/EXCEPT
  * compile to hash-aggregated left-semi/anti joins — one shuffle on
  * the compared columns, scale-safe.
  */
object SetOps extends QueryModule {

  /** Two disjoint date slices concatenated — slices are disjoint so
    * o_orderkey stays unique for the ORDER BY.
    */
  val unionAll: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), Norm.dstr(col("o_orderdate")).as("orderdate"),
        Norm.r4(col("o_totalprice")).as("totalprice"))
    val a = o.filter(col("orderdate") < "1995-01-01")
    val b = o.filter(col("orderdate") >= "2000-01-01")
    a.unionByName(b).orderBy("o_orderkey")
  }

  /** Custkeys appearing in both segments' order streams. */
  val intersectKeys: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
    val urgent = oc.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("c_custkey"))
    val building = oc.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    urgent.intersect(building).orderBy("c_custkey")
  }

  /** Custkeys with urgent orders but outside BUILDING segment. */
  val exceptKeys: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
    val urgent = oc.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("c_custkey"))
    val building = oc.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    urgent.except(building).orderBy("c_custkey")
  }

  /** Multiset (ALL) variants — EXCEPT ALL / INTERSECT ALL preserve
    * MULTIPLICITY (a custkey with 3 urgent orders and 1 building
    * order keeps 2 except-all copies), which the distinct variants
    * above erase; the output folds copies into an explicit
    * multiplicity count so the oracle compare is order-stable while
    * still proving the multiset arithmetic.
    */
  val setOpsAll: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
    val early = o.filter(col("o_orderdate") <
        lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val finished = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    early.exceptAll(finished).withColumn("op", lit("except_all"))
      .unionByName(
        early.intersectAll(finished).withColumn("op", lit("intersect_all")))
      .groupBy("op", "o_custkey")
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy("op", "o_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_union_all" -> unionAll,
    "q_intersect" -> intersectKeys,
    "q_except" -> exceptKeys,
    "q_set_ops_all" -> setOpsAll,
  )

  val oracle: Map[String, String] = Map(
    "q_set_ops_all" -> """
      WITH a AS (SELECT o_custkey FROM orders
                 WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      ea AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b),
      ia AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
      SELECT * FROM (
        SELECT 'except_all' AS op, o_custkey, count(*) AS multiplicity
        FROM ea GROUP BY o_custkey
        UNION ALL
        SELECT 'intersect_all', o_custkey, count(*) FROM ia GROUP BY o_custkey)
      ORDER BY op, o_custkey""",
    "q_union_all" -> """
      SELECT * FROM (
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 4) AS totalprice
        FROM orders WHERE strftime(o_orderdate, '%Y-%m-%d') < '1995-01-01'
        UNION ALL
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 4) AS totalprice
        FROM orders WHERE strftime(o_orderdate, '%Y-%m-%d') >= '2000-01-01')
      ORDER BY o_orderkey""",
    "q_intersect" -> """
      SELECT c_custkey FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT c_custkey FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_custkey""",
    "q_except" -> """
      SELECT c_custkey FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT c_custkey FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_custkey""",
  )
}
