package graft.operators

import graft.Tables
import graft.api.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared co-purchase graph-spine BUILDERS.
  *
  * Every query in the graph family starts from the SAME edge list —
  * distinct (o_custkey, l_suppkey) pairs of the lineitem ⋈ orders fact
  * join — then diverges (wedge joins, rank/label/core iteration,
  * degree rollups). This object is the single implementation of that
  * build: hash-partitioned on the wedge/join key and localCheckpointed
  * so that a query with several consumers of the spine (degree rollup
  * + wedge join + audit) computes it once WITHIN that query.
  *
  * Deliberately NOT memoized across queries: an earlier draft cached
  * the built spine in a module-level map keyed on the sf-dir, which
  * let a timed bench query skip the fact join entirely because a
  * previous (or warm-up) query had already built it. That moves real
  * per-query cost out of the timed region — the bench's per-query
  * numbers must each reflect a from-parquet computation — so every
  * call here builds fresh; reuse is scoped to one query plan via
  * `localCheckpoint`, the same lineage-pinning discipline as
  * [[graft.api.ops]]. Queries needing BOTH the raw and the symmetric
  * form derive the second from the first via the `*From` projections
  * (injective column maps commute with distinct, so results are
  * byte-identical to private builds).
  *
  * Scale notes (100 TB): the spine is O(distinct edges), not O(fact
  * rows) — the fact join partial-aggregates its duplicate pairs
  * map-side in the distinct. On a real cluster `localCheckpoint`
  * becomes `checkpoint()` to survive executor loss (same switch as
  * [[graft.api.ops]]' pinLineage `reliable` flag).
  */
object GraphSpine {

  /** Canonical distinct co-purchase edge list: (cust, supp), both keys
    * positive, hash-partitioned on `cust` (the wedge-apex/join key of
    * adamicAdar/neighborJaccard/profile) and localCheckpointed. */
  def coPurchase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    graft.api.ops.pinKeyed(
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct(),
      col("cust"))
  }

  /** The signed HALF edge list (cust, −supp) the iterative ops
    * historically consumed — customers positive, suppliers negated so
    * the two id spaces never collide. A projection of a built
    * co-purchase spine (injective, so distinctness is preserved), NOT
    * a second spine. */
  def signedHalfFrom(coPurchase: DataFrame): DataFrame =
    coPurchase.select(col("cust"), (-col("supp")).as("supp"))

  def signedHalf(spark: SparkSession, dir: String): DataFrame =
    signedHalfFrom(coPurchase(spark, dir))

  /** Symmetric signed adjacency (s, t) derived from an already-built
    * co-purchase spine: the half list plus its reverse, distinct,
    * hash-partitioned on `s`, localCheckpointed — the exact edge shape
    * pageRank/kCore/labelPropagation/bfsHops consume. Use this form
    * when the query also consumes the raw spine, so the fact join runs
    * once in that query. */
  def symSignedFrom(coPurchase: DataFrame): DataFrame = {
    val half = signedHalfFrom(coPurchase)
      .select(col("cust").as("s"), col("supp").as("t"))
    graft.api.ops.pinKeyed(half
      .unionByName(half.select(col("t").as("s"), col("s").as("t")))
      .distinct(),
      col("s"))
  }

  /** Symmetric signed adjacency built directly from the fact join —
    * the form for queries that need ONLY the symmetric shape
    * (pageRank/kCore/LPA/BFS/walks): one distinct, one repartition,
    * one checkpoint, no intermediate co-purchase materialization. The
    * union runs BEFORE the distinct, so the duplicate fact pairs
    * collapse map-side in the same exchange that dedups the reversed
    * copies — same result set as [[symSignedFrom]] ∘ [[coPurchase]]
    * (union and injective projections commute with distinct). */
  def symSigned(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    val half = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("s"), (-col("l_suppkey")).as("t"))
    graft.api.ops.pinKeyed(half
      .unionByName(half.select(col("t").as("s"), col("s").as("t")))
      .distinct(),
      col("s"))
  }
}
