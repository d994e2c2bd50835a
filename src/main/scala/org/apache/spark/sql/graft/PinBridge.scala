package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Expression, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Project, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, PartitioningCollection, SinglePartition, UnknownPartitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Layout-preserving checkpoint bridge for pinned frames.
  *
  * Two Spark gaps defeat the partition-once-iterate-free design this
  * engine's iterative operators rely on (verified against the shipped
  * Spark 4.1.2 bytecode and plans):
  *
  *  1. `Dataset.checkpoint` records the PHYSICAL plan's
  *     outputPartitioning into the LogicalRDD but keys the node's
  *     output on the ANALYZED attribute ids. The optimizer is free to
  *     rewrite ids inside the plan (RemoveRedundantAliases does, for
  *     any aliased join key), so the recorded partitioning can
  *     reference attributes that are not in the node's own output —
  *     EnsureRequirements then never matches it and every consumer
  *     re-exchanges the pinned frame. [[pin]] rebuilds the LogicalRDD
  *     with the physical→analyzed attribute map applied (positional:
  *     the optimizer preserves output arity and order), dropping any
  *     partitioning/ordering it cannot prove maps onto the output.
  *
  *  2. When one pinned frame is referenced more than once in a single
  *     query, DeduplicateRelations re-aliases later occurrences via
  *     `LogicalRDD.newInstance()`, which rewrites output, ordering,
  *     statistics and constraints — but NOT outputPartitioning (its
  *     bytecode has rewrite lambdas for SortOrder/Statistics/
  *     ExpressionSet only). [[refresh]] hands each consumer site its
  *     own scan with fresh ids and a correctly rewritten partitioning,
  *     so nothing is left for the dedup to break.
  *
  * Neither function moves data; both are metadata fixes.
  */
object PinBridge {

  /** Remap every attribute in `e` through `assoc`; None if the result
    * references anything outside the target output (an unprovable
    * layout must be dropped, never guessed — a wrong HashPartitioning
    * claim would let the planner skip a REQUIRED exchange and corrupt
    * results).
    */
  private def remap(e: Expression, assoc: Map[Attribute, Attribute],
                    outSet: AttributeSet): Option[Expression] = {
    val rewritten = e.transform {
      case a: Attribute => assoc.getOrElse(a, a)
    }
    if (rewritten.references.subsetOf(outSet)) Some(rewritten) else None
  }

  /** The ACTUAL byte size of a checkpointed RDD's blocks, from the
    * block manager. Logical size estimates are useless for pinned
    * frames (a stats-less join estimate multiplies its inputs), and
    * every downstream decision — broadcast choice, [[graft.api.ops]]'
    * size-adaptive pin layout — improves when the pin carries the
    * truth it just materialized.
    */
  private def trueStats(spark: SparkSession, rddId: Int): Option[Statistics] =
    spark.sparkContext.getRDDStorageInfo.find(_.id == rddId)
      .map(i => BigInt(i.memSize + i.diskSize))
      .filter(_ > 0)
      .map(sz => Statistics(sizeInBytes = sz))

  /** Only plain hash partitionings (or collections of them) are ever
    * claimed: an AQE-coalesced read (CoalescedHashPartitioning) or any
    * exotic layout is NOT reproducible by a fresh exchange on the
    * consumer side, so claiming it could co-locate a join wrongly.
    */
  private def remapPartitioning(p: Partitioning,
                                assoc: Map[Attribute, Attribute],
                                outSet: AttributeSet): Partitioning =
    p match {
      case pc: PartitioningCollection =>
        val kept = pc.partitionings
          .map(remapPartitioning(_, assoc, outSet))
          .filterNot(_.isInstanceOf[UnknownPartitioning])
        if (kept.nonEmpty) PartitioningCollection(kept)
        else UnknownPartitioning(p.numPartitions)
      case h: HashPartitioning =>
        remap(h, assoc, outSet)
          .map(_.asInstanceOf[Partitioning])
          .getOrElse(UnknownPartitioning(p.numPartitions))
      // A one-partition pin (the size-adaptive layout's small case) is
      // trivially claimable: SinglePartition references no attributes
      // and satisfies every clustered distribution, so consumers skip
      // their exchanges instead of re-shuffling a 1-partition frame.
      case SinglePartition => SinglePartition
      case other => UnknownPartitioning(other.numPartitions)
    }

  /** Checkpoint `d` (memory-backed or reliable) and return a scan that
    * carries the materialized layout keyed on ITS OWN output
    * attributes. Runs under AQE: the layout is read from the FINAL
    * adaptive physical plan after the checkpoint executed (the stock
    * capture reads the AdaptiveSparkPlanExec wrapper pre-finalization
    * and records UnknownPartitioning). Only a plain HashPartitioning
    * survives the claim — a frame whose last exchange was AQE-coalesced
    * deliberately claims nothing (see [[remapPartitioning]]); callers
    * that NEED the layout end the pin with
    * `repartition(numPartitions, key)`, whose explicit count AQE never
    * coalesces.
    */
  def pin(d: org.apache.spark.sql.DataFrame, reliable: Boolean): org.apache.spark.sql.DataFrame = {
    val ck = if (reliable) d.checkpoint() else d.localCheckpoint()
    ck.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val spark = d.sparkSession.asInstanceOf[SparkSession]
        // The checkpoint above already executed the plan, so the
        // adaptive wrapper holds its final physical plan and real
        // output layout.
        val phys = d.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        // The physical→analyzed map is positional; the optimizer must
        // preserve output arity, order, names and types (the final plan
        // produces the analyzed schema). If that invariant ever breaks,
        // a mis-zipped map could "prove" a HashPartitioning onto the
        // wrong attribute and let the planner SKIP a required exchange
        // — so verify it per pair and claim nothing on any mismatch.
        val aligned = phys.output.length == l.output.length &&
          phys.output.zip(l.output).forall { case (p, o) =>
            p.name == o.name && p.dataType == o.dataType
          }
        val (part, ord) =
          if (!aligned)
            (UnknownPartitioning(phys.outputPartitioning.numPartitions),
              Nil)
          else {
            val assoc: Map[Attribute, Attribute] =
              phys.output.zip(l.output).toMap
            val outSet = AttributeSet(l.output)
            (remapPartitioning(phys.outputPartitioning, assoc, outSet),
              phys.outputOrdering.flatMap(
                remap(_, assoc, outSet).map(_.asInstanceOf[SortOrder])))
          }
        Dataset.ofRows(spark,
          LogicalRDD(l.output, l.rdd, part, ord, l.isStreaming,
            l.stream)(spark, trueStats(spark, l.rdd.id)))
      case _ => ck
    }
  }

  /** newInstance gives fresh output attrs + rewritten
    * ordering/stats/constraints; patch in the one thing it forgets —
    * the partitioning — using the same old→new map.
    */
  private def freshScan(l: LogicalRDD, spark: SparkSession)
      : (LogicalRDD, Map[Attribute, Attribute]) = {
    val fresh = l.newInstance()
    val assoc: Map[Attribute, Attribute] = l.output.zip(fresh.output).toMap
    val outSet = AttributeSet(fresh.output)
    val part = remapPartitioning(l.outputPartitioning, assoc, outSet)
    // The original's origin stats sit in a private second parameter
    // list; re-derive the TRUE size from the block manager instead —
    // same source [[pin]] used.
    (LogicalRDD(fresh.output, fresh.rdd, part, fresh.outputOrdering,
      fresh.isStreaming, fresh.stream)(spark,
        trueStats(spark, fresh.rdd.id)), assoc)
  }

  /** Release a pin's materialized blocks (async). A localCheckpoint's
    * lineage is TRUNCATED, so a released pin can never be read again —
    * callers release only pins provably dead: an iterative loop's
    * round N−1 state once round N has materialized, or a staged pin
    * once its keyed re-layout is pinned. Pins that survive to the end
    * of a query are swept by the session owner (Bench/Verify unpersist
    * all persistent RDDs between queries) — without either release the
    * blocks live until driver GC, and a long session (the driver's
    * full bench; a real cluster's workload sequence) fills the block
    * store and degrades every query after the cliff (the r13 282 s →
    * 1004 s full-bench collapse). No-op for non-pinned frames and for
    * reliable checkpoints (whose data lives in files, not blocks).
    */
  def release(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case Project(_, l: LogicalRDD) => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def refresh(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        Dataset.ofRows(spark, freshScan(l, spark)._1)
      case p @ Project(projList, l: LogicalRDD) =>
        // A projection over a pinned scan (the `labels`/`half` shape of
        // the iterative loops): refresh the leaf and re-alias the
        // projection with fresh ids so two reference sites share no
        // expression ids at any level. Physical partitioning flows
        // through the projection alias-aware, so the layout survives.
        val (fresh, assoc) = freshScan(l, spark)
        val newProj = projList.map { ne =>
          val remapped = ne.transform {
            case a: Attribute => assoc.getOrElse(a, a)
          }
          remapped match {
            case al: Alias => Alias(al.child, al.name)()
            case a: Attribute => a
            case other => Alias(other, ne.name)()
          }
        }.map(_.asInstanceOf[NamedExpression])
        Dataset.ofRows(spark, Project(newProj, fresh))
      case _ => df // not a pinned scan: nothing to refresh
    }
  }
}
