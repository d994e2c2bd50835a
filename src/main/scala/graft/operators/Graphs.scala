package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
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
    // Shared-spine form: the symmetric signed adjacency builds via the
    // family-wide GraphSpine.symSigned builder — identical edge set to
    // the private fact-join build it replaced.
    GraphSpine.symSigned(spark, dir)
      .pageRank("s", "t", iters = 3, damping = 0.85,
        preparedSym = true)
      .select(col("id"), Norm.r4tie(col("rank")).as("rank"))
      .orderBy("id")
  }

  /** Triangle count over the supplier co-supply graph (suppliers are
    * adjacent when they serve the same order) by the degree-oriented
    * node-iterator — THE distributed triangle algorithm (Suri &
    * Vassilvitskii's MapReduce form): orient every undirected edge
    * from its (degree, id)-smaller endpoint, enumerate wedges at each
    * source, and close them against the oriented edge set. The
    * orientation is the scale property: every node's out-degree is
    * O(√m), so wedge counts are minimized exactly on the skewed
    * (power-law) graphs where the naive per-node enumeration
    * explodes; the two joins shuffle by wedge apex then by the
    * (v, w) closure pair — edge-bytes, never whole rows. The edge
    * build's per-order self-join is bounded by order width, not
    * corpus size. Comparisons use the (degree, id) composite on BOTH
    * sides, so ties in degree stay totally ordered and both engines
    * orient identically.
    *
    * The co-supply projection of a bipartite fact table saturates —
    * at sf0.1 the graph is ~91% dense, where exact counting is
    * Θ(n³) no matter how good the algorithm — so the count runs
    * COLORFULLY (Pagh & Tsourakakis, 2012): each NODE gets one of
    * N = 8 deterministic colors (md5 of the supplier key — the
    * engine-portable hash shared with withHashSplit; N nodes to
    * hash, not m edges), only monochromatic edges survive, and
    * mono-triangles × N² estimates the full-graph total (unbiased;
    * each triangle survives iff its two non-anchor nodes match the
    * anchor's color: 1/N²). N is the accuracy↔cost knob — kept work
    * scales with m/N edges. Edge enumeration never joins the fact
    * table to itself: ONE skinny (orderkey, suppkey) shuffle groups
    * each order's supplier set, and pairs expand inside a codegen'd
    * array lambda where the color filter is an int compare — the
    * measured alternative (self-join + per-pair hash) burns 2.7M md5s
    * and a 600k×600k sort-merge join to produce the same 57k edges.
    */
  val graphTriangles: Q = (spark, dir) => {
    val colors = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("sk"),
        graft.api.ops.md5Bucket(col("s_suppkey"), 8).as("c"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .join(broadcast(colors), "sk")
    // Group per (order, COLOR): only monochromatic pairs can survive
    // colorful sampling, so collecting same-color supplier sets makes
    // the lambda enumerate exactly the ~m/N kept pairs instead of
    // building all m candidates and filtering — same rows shuffled,
    // 8× fewer pairs materialized.
    val sets = li.groupBy("ok", "c")
      .agg(array_sort(collect_set(col("sk"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    val pairs = sets
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))), y =>
          struct(x.as("s1"), y.as("s2")))))).as("p"))
      .select(col("p.s1").as("s1"), col("p.s2").as("s2"))
    // Count via the shared degree-oriented wedge-closure core
    // (graft.api.ops.triangleCore — ApiSpec pins it exact on planted
    // graphs at nColors = 1); ×N² rescales the monochromatic count.
    graft.api.ops.triangleCore(pairs, multiplier = 64)
  }

  /** k-core of the customer↔supplier graph (same edge build as
    * PageRank), k = 8: peel sub-8-degree nodes to fixpoint and
    * report each survivor's within-core degree. The oracle unrolls
    * three peel rounds — past the measured fixpoint at every tested SF
    * (1 pruning round at sf0.001/sf0.01/sf0.1), and peeling is idempotent
    * at fixpoint, so extra unrolled rounds are provably no-ops. See
    * [[graft.api.ops.GraftDataFrameOps.kCore]] for the loop shape.
    */
  val graphKcore: Q = (spark, dir) => {
    import graft.api.ops._
    GraphSpine.symSigned(spark, dir)
      .kCore("s", "t", k = 8, preparedSym = true)
      .orderBy("id")
  }

  /** Deterministic synchronous LPA communities, 2 rounds, over the
    * customer↔supplier graph (same edge build as PageRank/k-core);
    * mode-of-neighbors with min-label tie-break replayed round-by-
    * round in the oracle. See
    * [[graft.api.ops.GraftDataFrameOps.labelPropagation]].
    */
  val graphLpa: Q = (spark, dir) => {
    import graft.api.ops._
    GraphSpine.symSigned(spark, dir)
      .labelPropagation("s", "t", iters = 2, preparedSym = true)
      .orderBy("id")
  }

  /** BFS hop distances from customer 1 over the same customer↔supplier
    * transaction graph as [[graphPagerank]], 3 hops. The fourth
    * iterative-graph shape (after rank, label and core propagation):
    * frontier expansion with an anti-join visited filter. See
    * [[graft.api.ops.GraftDataFrameOps.bfsHops]] for the scale notes
    * (edges checkpointed + partitioned once; only frontiers shuffle).
    */
  val graphBfs: Q = (spark, dir) => {
    import graft.api.ops._
    GraphSpine.symSigned(spark, dir)
      .bfsHops("s", "t", seed = 1L, maxHops = 3, preparedSym = true)
      .orderBy("id")
  }

  /** Adamic-Adar link prediction over the supplier co-purchase graph:
    * score(s1, s2) = Σ over shared customers c of 1/ln(deg(c)) — the
    * classic common-neighbor predictor where rare shared neighbors
    * count more. The per-customer weight is quantized to an exact
    * integer (⌊10⁶/ln(deg)⌋) BEFORE summation, so pair scores
    * accumulate as BIGINTs in any order — no float-sum order
    * dependence between engines — and the only doubles are the 9
    * constant weights and the final rescale. Top-20 pairs by score
    * (integer ties broken by the pair ids).
    *
    * Scale: pairs expand inside a whole-stage-codegen'd equi-join of
    * the checkpointed distinct edge list with itself on customer
    * (3× faster than the array-lambda expansion it replaced — see the
    * shuffle ledger on [[graft.api.ops.GraftDataFrameOps.adamicAdar]]);
    * the pair aggregate partial-aggs before its only shuffle, and the
    * top-20 compiles to TakeOrderedAndProject (per-partition heap
    * + driver merge of 20 rows). Skew guard: `maxDeg = 1000` is
    * ENFORCED inside [[graft.api.ops.GraftDataFrameOps.adamicAdar]]
    * (max customer degree at these SFs is ~100, so the guard is live
    * in the plan but value-neutral; a planted mega-hub is proven cut
    * in PropertySpec) — mega-degree customers cost O(deg²) pairs at an
    * asymptotically negligible 1/ln(deg) weight each.
    */
  val graphAdamicAdar: Q = (spark, dir) => {
    import graft.api.ops._
    GraphSpine.coPurchase(spark, dir)
      .adamicAdar(col("cust"), col("supp"), topK = 20,
        maxDeg = 1000, assumeDistinct = true)
      .select(col("d1").as("s1"), col("d2").as("s2"), col("n_common"),
        Norm.r4tie(col("score_int").cast("double") / lit(1000000.0))
          .as("aa_score"))
  }

  /** One-row graph profile of the bipartite customer↔supplier graph —
    * the summary every graph pipeline prints before choosing
    * algorithms (is this sparse or dense? skewed or flat? — the
    * numbers that decide broadcast vs shuffle, cap sizes, and whether
    * colorful sampling is needed): node counts per side, edge count,
    * bipartite density m/(n_c·n_s), mean degrees, max degrees (the
    * skew-cap input), and the exact lower-median supplier degree via
    * the degree HISTOGRAM (2·cum ≥ total — the q_stats_levene median,
    * never a raw sort).
    *
    * Scale: one fact join to the distinct edge list (checkpointed for
    * its three consumers), two degree rollups, then aggregates over
    * the bounded degree histogram.
    */
  val graphProfile: Q = (spark, dir) => {
    val edges = GraphSpine.coPurchase(spark, dir)
      .select(col("cust").as("cu"), col("supp").as("su"))
    val m = edges.agg(count(lit(1)).as("m"))
    val dc = edges.groupBy("cu").agg(count(lit(1)).as("d"))
    val ds = edges.groupBy("su").agg(count(lit(1)).as("d"))
    val cAgg = dc.agg(count(lit(1)).as("n_cust"),
      max(col("d")).as("max_cust_deg"))
    val sAgg = ds.agg(count(lit(1)).as("n_supp"),
      max(col("d")).as("max_supp_deg"))
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sMed = ds.groupBy("d").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy()))
      .filter(col("cum") * 2 >= col("tot"))
      .agg(min(col("d")).as("med_supp_deg"))
    def dd(c: Column) = c.cast("double")
    m.crossJoin(cAgg).crossJoin(sAgg).crossJoin(sMed)
      .select(col("n_cust"), col("n_supp"), col("m").as("n_edges"),
        Norm.r4tie(dd(col("m")) /
          (dd(col("n_cust")) * dd(col("n_supp")))).as("density"),
        Norm.r4tie(dd(col("m")) / dd(col("n_cust"))).as("avg_cust_deg"),
        Norm.r4tie(dd(col("m")) / dd(col("n_supp"))).as("avg_supp_deg"),
        col("max_cust_deg"), col("max_supp_deg"), col("med_supp_deg"))
  }

  /** Degree assortativity of the bipartite customer↔supplier graph —
    * do high-volume customers buy from high-volume suppliers (r > 0)
    * or from the periphery (r < 0)? Pearson correlation over each
    * edge's (customer-degree, supplier-degree), every sufficient
    * statistic an exact BIGINT; one float closed form at the end.
    * (The supplier co-supply PROJECTION is near-complete at these SFs
    * — zero degree variance, assortativity undefined — which is
    * itself why the bipartite form is the structurally honest one.)
    *
    * Scale: one fact join to the distinct edge list, two degree
    * rollups joined back (supplier side broadcast-sized), one global
    * moment aggregate.
    */
  val graphAssortativity: Q = (spark, dir) => {
    // edges feed THREE consumers (the join spine + both degree
    // rollups) — the shared checkpointed spine serves all three
    val edges = GraphSpine.coPurchase(spark, dir)
      .select(col("cust").as("cu"), col("supp").as("su"))
    val degc = edges.groupBy("cu").agg(count(lit(1)).as("dc"))
    val degs = edges.groupBy("su").agg(count(lit(1)).as("ds"))
    val e2 = edges.join(degc, "cu").join(broadcast(degs), "su")
    def dd(c: String) = col(c).cast("double")
    val agg = e2.agg(count(lit(1)).as("n"),
      sum(col("dc")).as("sx"), sum(col("ds")).as("sy"),
      sum(col("dc") * col("ds")).as("sxy"),
      sum(col("dc") * col("dc")).as("sxx"),
      sum(col("ds") * col("ds")).as("syy"))
    agg.select(col("n").as("n_edges"),
        Norm.r4dn((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
          sqrt((dd("n") * dd("sxx") - dd("sx") * dd("sx"))
            * (dd("n") * dd("syy") - dd("sy") * dd("sy"))))
          .as("assortativity"))
  }

  /** Newman modularity of the LPA communities — did label propagation
    * find real structure? Q = (4m·E_in − Σ_c d_c²)/(4m²) over the same
    * deterministic 2-round LPA labels `q_graph_lpa` scores: E_in
    * (intra-community edges), per-community degree mass, and m are all
    * exact BIGINTs; the single float division comes last, so no
    * ordered fold is even needed (the community sums are integer and
    * order-free). Q ≈ 0 says the bipartite business graph has no
    * modular structure beyond degree — itself an auditable finding.
    *
    * Scale: the edge list is checkpointed once for its three
    * consumers (LPA, the intra-edge join, degrees); everything else
    * is label-keyed rollups of bounded tables.
    */
  val graphModularity: Q = (spark, dir) => {
    import graft.api.ops._
    // One fact-join spine build for BOTH consumers: the raw half list
    // and the symmetric adjacency LPA iterates over derive from the
    // same checkpointed co-purchase edge list within this query.
    val co = GraphSpine.coPurchase(spark, dir)
    val edges0 = GraphSpine.signedHalfFrom(co)
    val labels = GraphSpine.symSignedFrom(co)
      .labelPropagation("s", "t", iters = 2, preparedSym = true)
    val sym = edges0.select(col("cust").as("u"))
      .unionByName(edges0.select(col("supp").as("u")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    val la = labels.select(col("id").as("cust"), col("label").as("la"))
    val lb = labels.select(col("id").as("supp"), col("label").as("lb"))
    val einM = edges0.join(la, "cust").join(lb, "supp")
      .agg(count(lit(1)).as("m"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("e_in"))
    val dc = labels.join(deg, labels("id") === deg("u"))
      .groupBy("label").agg(sum(col("d")).as("d_c"))
      .agg(count(lit(1)).as("n_communities"),
        sum(col("d_c") * col("d_c")).as("sum_dc2"))
    einM.crossJoin(dc).select(
      col("m").as("n_edges"), col("n_communities"),
      Norm.r4dn((lit(4.0) * col("m").cast("double")
        * col("e_in").cast("double") - col("sum_dc2").cast("double")) /
        (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
        .as("modularity"))
  }

  /** Neighbor-set Jaccard similarity between supplier pairs over the
    * customer–supplier bipartite graph — the size-normalized link
    * score [[graphAdamicAdar]]'s rarity weighting can't give you
    * (J(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)| treats a shared rare and a
    * shared common customer alike but normalizes by how much of both
    * neighborhoods overlaps). Intersections from a hub-capped wedge
    * join, unions from true degrees, ⌊J·10⁶⌋ BIGINT quantization
    * before the top-20 — see
    * [[graft.api.ops.GraftDataFrameOps.neighborJaccard]].
    */
  val graphJaccard: Q = (spark, dir) => {
    import graft.api.ops._
    GraphSpine.coPurchase(spark, dir)
      .neighborJaccard(col("cust"), col("supp"), topK = 20,
        maxDeg = 1000, assumeDistinct = true)
      .select(col("d1").as("s1"), col("d2").as("s2"), col("n_common"),
        Norm.r4tie(col("jacc_int").cast("double") / lit(1000000.0))
          .as("jaccard"),
        col("n_capped_hubs"))
  }

  /** Deterministic random-walk corpus over the customer↔supplier
    * graph — the node2vec/DeepWalk INPUT step: walks become the
    * "sentences" a graph-embedding trainer consumes, so this op is
    * graph → sequence-corpus generation, the LLM-pipeline shape. Ten
    * md5-top seeds (ABSOLUTE batch size, the auditBatch discipline)
    * each walk 4 steps; at each step the walker moves to the neighbor
    * minimizing md5(step:cur:neighbor) — a content-derived coin that
    * both engines replay exactly (the withHashSplit portability
    * argument), standing in for the RNG draw a production walker
    * would make.
    *
    * Scale: the adjacency (distinct edges, both directions) builds
    * once from one fact join; each step is one join of the
    * seed-count-sized frontier (broadcast side) against it, and the
    * per-seed argmin is min(struct(hash, dst)) — a partial-agg'd
    * aggregate (map-side combine), NOT a window sort. Steps are a
    * fixed small count, so the loop is O(steps) broadcast joins with
    * driver-held control only; 10⁶ seeds would shuffle the frontier
    * instead of broadcasting, same plan otherwise.
    */
  val graphRandomWalks: Q = (spark, dir) => {
    val adj = GraphSpine.symSigned(spark, dir)
      .select(col("s").as("src"), col("t").as("dst"))
    // seeds derive from the checkpointed adjacency (src > 0 ⇔
    // customer side) — no second fact join for the seed list
    val seeds = adj.filter(col("src") > 0).select(col("src").as("cu"))
      .distinct()
      .orderBy(md5(col("cu").cast("string")), col("cu"))
      .limit(10)
      .select(col("cu").as("seed"), col("cu").as("node"))
    var frontier = seeds
    var walk = seeds.withColumn("step", lit(0))
    for (s <- 1 to 4) {
      val h = md5(concat_ws(":", lit(s), col("src"), col("dst")))
      val nxt = frontier
        .join(adj, frontier("node") === adj("src"))
        .groupBy(col("seed"))
        .agg(min(struct(h.as("h"), col("dst").as("d"))).as("pick"))
        .select(col("seed"), col("pick.d").as("node"))
      walk = walk.unionByName(nxt.withColumn("step", lit(s)))
      frontier = nxt
    }
    walk.select(col("seed"), col("step"), col("node"))
      .orderBy("seed", "step")
  }

  /** Bipartite butterfly census over customer↔supplier — the 2×2
    * biclique count that measures co-purchase cohesion WITHOUT the
    * densifying co-supply projection (the q_graph_triangles lesson:
    * the projection is ~91% dense, the bipartite original is not).
    * Wedge apex = supplier; cap maxDeg = 1000 (non-binding at these
    * SFs — `n_capped_hubs` = 0 proves the count exact in-result).
    * See [[graft.api.ops.GraftDataFrameOps.butterflyCount]].
    */
  val graphButterflies: Q = (spark, dir) => {
    import graft.api.ops._
    GraphSpine.coPurchase(spark, dir)
      .butterflyCount(col("supp"), col("cust"), maxDeg = 1000,
        assumeDistinct = true)
  }

  val queries: Map[String, Q] = Map(
    "q_graph_butterflies" -> graphButterflies,
    "q_graph_random_walks" -> graphRandomWalks,
    "q_graph_jaccard" -> graphJaccard,
    "q_graph_profile" -> graphProfile,
    "q_graph_modularity" -> graphModularity,
    "q_graph_assortativity" -> graphAssortativity,
    "q_graph_adamic_adar" -> graphAdamicAdar,
    "q_graph_bfs" -> graphBfs,
    "q_graph_pagerank" -> graphPagerank,
    "q_graph_triangles" -> graphTriangles,
    "q_graph_kcore" -> graphKcore,
    "q_graph_lpa" -> graphLpa,
  )

  val oracle: Map[String, String] = Map(
    "q_graph_butterflies" -> """
      WITH edges AS (
        SELECT DISTINCT l_suppkey AS a, o_custkey AS l
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deg AS (SELECT a, count(*) AS d FROM edges GROUP BY a),
      capped AS (
        SELECT CAST(sum(CASE WHEN d > 1000 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_capped_hubs FROM deg),
      ok AS (SELECT a FROM deg WHERE d BETWEEN 2 AND 1000),
      pairs AS (
        SELECT e1.l AS l1, e2.l AS l2, CAST(count(*) AS BIGINT) AS k
        FROM edges e1 JOIN ok USING (a)
        JOIN edges e2 ON e1.a = e2.a AND e1.l < e2.l
        GROUP BY e1.l, e2.l)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum((k * (k - 1)) // 2) AS BIGINT) AS n_butterflies,
             CAST(max(k) AS BIGINT) AS max_shared,
             (SELECT n_capped_hubs FROM capped) AS n_capped_hubs
      FROM pairs""",
    "q_graph_random_walks" -> """
      WITH e AS (
        SELECT DISTINCT o_custkey AS cu, -l_suppkey AS su
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      adj AS (
        SELECT cu AS src, su AS dst FROM e
        UNION ALL
        SELECT su AS src, cu AS dst FROM e),
      w0 AS (
        SELECT cu AS seed, cu AS node FROM (SELECT DISTINCT cu FROM e)
        ORDER BY md5(CAST(cu AS VARCHAR)), cu LIMIT 10),
      c1 AS (
        SELECT f.seed, a.dst, row_number() OVER (PARTITION BY f.seed
          ORDER BY md5(concat(1, ':', a.src, ':', a.dst)), a.dst) AS rn
        FROM w0 f JOIN adj a ON a.src = f.node),
      w1 AS (SELECT seed, dst AS node FROM c1 WHERE rn = 1),
      c2 AS (
        SELECT f.seed, a.dst, row_number() OVER (PARTITION BY f.seed
          ORDER BY md5(concat(2, ':', a.src, ':', a.dst)), a.dst) AS rn
        FROM w1 f JOIN adj a ON a.src = f.node),
      w2 AS (SELECT seed, dst AS node FROM c2 WHERE rn = 1),
      c3 AS (
        SELECT f.seed, a.dst, row_number() OVER (PARTITION BY f.seed
          ORDER BY md5(concat(3, ':', a.src, ':', a.dst)), a.dst) AS rn
        FROM w2 f JOIN adj a ON a.src = f.node),
      w3 AS (SELECT seed, dst AS node FROM c3 WHERE rn = 1),
      c4 AS (
        SELECT f.seed, a.dst, row_number() OVER (PARTITION BY f.seed
          ORDER BY md5(concat(4, ':', a.src, ':', a.dst)), a.dst) AS rn
        FROM w3 f JOIN adj a ON a.src = f.node),
      w4 AS (SELECT seed, dst AS node FROM c4 WHERE rn = 1)
      SELECT seed, 0 AS step, node FROM w0
      UNION ALL SELECT seed, 1, node FROM w1
      UNION ALL SELECT seed, 2, node FROM w2
      UNION ALL SELECT seed, 3, node FROM w3
      UNION ALL SELECT seed, 4, node FROM w4
      ORDER BY seed, step""",
    "q_graph_profile" -> """
      WITH edges AS (
        SELECT DISTINCT o_custkey AS cu, l_suppkey AS su
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      m AS (SELECT count(*) AS m FROM edges),
      dc AS (SELECT cu, count(*) AS d FROM edges GROUP BY cu),
      ds AS (SELECT su, count(*) AS d FROM edges GROUP BY su),
      ca AS (SELECT count(*) AS n_cust,
                    CAST(max(d) AS BIGINT) AS max_cust_deg FROM dc),
      sa AS (SELECT count(*) AS n_supp,
                    CAST(max(d) AS BIGINT) AS max_supp_deg FROM ds),
      hist AS (SELECT d, count(*) AS cnt FROM ds GROUP BY d),
      cums AS (
        SELECT d,
               sum(cnt) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               sum(cnt) OVER () AS tot
        FROM hist),
      md AS (SELECT CAST(min(d) AS BIGINT) AS med_supp_deg
             FROM cums WHERE cum * 2 >= tot)
      SELECT n_cust, n_supp, m AS n_edges,
             floor(CAST(m AS DOUBLE)
                   / (CAST(n_cust AS DOUBLE) * CAST(n_supp AS DOUBLE))
                   * 10000 + 0.5) / 10000 AS density,
             floor(CAST(m AS DOUBLE) / CAST(n_cust AS DOUBLE)
                   * 10000 + 0.5) / 10000 AS avg_cust_deg,
             floor(CAST(m AS DOUBLE) / CAST(n_supp AS DOUBLE)
                   * 10000 + 0.5) / 10000 AS avg_supp_deg,
             max_cust_deg, max_supp_deg, med_supp_deg
      FROM m CROSS JOIN ca CROSS JOIN sa CROSS JOIN md""",
    "q_graph_jaccard" -> """
      WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deg AS (SELECT supp, count(*) AS d FROM edges GROUP BY supp),
      hub AS (SELECT cust FROM (
                SELECT cust, count(*) AS sd FROM edges GROUP BY cust)
              WHERE sd BETWEEN 2 AND 1000),
      ce AS (SELECT e.cust, e.supp FROM edges e JOIN hub USING (cust)),
      cm AS (SELECT e1.supp AS s1, e2.supp AS s2,
                    CAST(count(*) AS BIGINT) AS n_common
             FROM ce e1 JOIN ce e2
               ON e1.cust = e2.cust AND e1.supp < e2.supp
             GROUP BY 1, 2),
      j AS (SELECT s1, s2, n_common,
                   (n_common * 1000000) // (d1.d + d2.d - n_common)
                     AS ji
            FROM cm JOIN deg d1 ON d1.supp = cm.s1
                    JOIN deg d2 ON d2.supp = cm.s2),
      capped AS (SELECT CAST(count(*) AS BIGINT) AS n_capped_hubs
                 FROM (SELECT cust, count(*) AS sd
                       FROM edges GROUP BY cust)
                 WHERE sd > 1000)
      SELECT s1, s2, n_common,
             floor(CAST(ji AS DOUBLE) / 1000000.0 * 10000 + 0.5)
               / 10000 AS jaccard,
             n_capped_hubs
      FROM j CROSS JOIN capped
      ORDER BY ji DESC, s1, s2 LIMIT 20""",
    "q_graph_modularity" -> """
      WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, -l_suppkey AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT s, t FROM e0 UNION SELECT t AS s, s AS t FROM e0),
      l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
      c1 AS (SELECT e.s AS id, l.label, count(*) AS c
             FROM e JOIN l0 l ON e.t = l.id GROUP BY 1, 2),
      l1 AS (SELECT id, label FROM (
               SELECT id, label,
                      row_number() OVER (PARTITION BY id
                        ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT e.s AS id, l.label, count(*) AS c
             FROM e JOIN l1 l ON e.t = l.id GROUP BY 1, 2),
      l2 AS (SELECT id, label FROM (
               SELECT id, label,
                      row_number() OVER (PARTITION BY id
                        ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1),
      deg AS (SELECT s AS id, count(*) AS d FROM e GROUP BY s),
      em AS (
        SELECT count(*) AS m,
               CAST(sum(CASE WHEN a.label = b.label
                             THEN 1 ELSE 0 END) AS BIGINT) AS e_in
        FROM e0 JOIN l2 a ON e0.s = a.id JOIN l2 b ON e0.t = b.id),
      dc AS (
        SELECT l2.label, CAST(sum(d) AS BIGINT) AS d_c
        FROM l2 JOIN deg ON l2.id = deg.id GROUP BY l2.label),
      s2 AS (
        SELECT count(*) AS n_communities,
               CAST(sum(d_c * d_c) AS BIGINT) AS sum_dc2
        FROM dc)
      SELECT m AS n_edges, n_communities,
             floor((4.0 * CAST(m AS DOUBLE) * CAST(e_in AS DOUBLE)
                    - CAST(sum_dc2 AS DOUBLE))
                   / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
                   * 10000) / 10000 AS modularity
      FROM em, s2""",
    "q_graph_assortativity" -> """
      WITH edges AS (
        SELECT DISTINCT o_custkey AS cu, l_suppkey AS su2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      degc AS (SELECT cu, count(*) AS dc FROM edges GROUP BY cu),
      degs AS (SELECT su2, count(*) AS ds FROM edges GROUP BY su2),
      e2 AS (
        SELECT dc, ds FROM edges
        JOIN degc ON edges.cu = degc.cu
        JOIN degs ON edges.su2 = degs.su2),
      agg AS (
        SELECT count(*) AS n,
               CAST(sum(dc) AS BIGINT) AS sx,
               CAST(sum(ds) AS BIGINT) AS sy,
               CAST(sum(dc * ds) AS BIGINT) AS sxy,
               CAST(sum(dc * dc) AS BIGINT) AS sxx,
               CAST(sum(ds * ds) AS BIGINT) AS syy
        FROM e2)
      SELECT n AS n_edges,
             floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE)
                               * CAST(sy AS DOUBLE)))
                   * 10000) / 10000 AS assortativity
      FROM agg""",
    "q_graph_adamic_adar" -> """
      WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deg AS (
        SELECT cust, count(*) AS d FROM edges GROUP BY cust),
      w AS (
        SELECT cust,
               CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT)
                 AS w
        FROM deg WHERE d >= 2),
      pairs AS (
        SELECT e1.supp AS s1, e2.supp AS s2, w.w
        FROM edges e1
        JOIN edges e2 ON e1.cust = e2.cust AND e1.supp < e2.supp
        JOIN w ON w.cust = e1.cust),
      sc AS (
        SELECT s1, s2, count(*) AS n_common,
               CAST(sum(w) AS BIGINT) AS score_int
        FROM pairs GROUP BY s1, s2)
      SELECT s1, s2, n_common,
             floor(CAST(score_int AS DOUBLE) / 1000000.0
                   * 10000 + 0.5) / 10000 AS aa_score
      FROM sc ORDER BY score_int DESC, s1, s2 LIMIT 20""",
    "q_graph_bfs" -> """
      WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, -l_suppkey AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT s, t FROM e0 UNION SELECT t AS s, s AS t FROM e0),
      d0 AS (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist),
      n1 AS (SELECT DISTINCT t AS id FROM e WHERE s = 1),
      d1 AS (SELECT * FROM d0 UNION ALL
             SELECT id, CAST(1 AS BIGINT) FROM n1
             WHERE id NOT IN (SELECT id FROM d0)),
      n2 AS (SELECT DISTINCT e.t AS id
             FROM e JOIN d1 ON e.s = d1.id AND d1.dist = 1),
      d2 AS (SELECT * FROM d1 UNION ALL
             SELECT id, CAST(2 AS BIGINT) FROM n2
             WHERE id NOT IN (SELECT id FROM d1)),
      n3 AS (SELECT DISTINCT e.t AS id
             FROM e JOIN d2 ON e.s = d2.id AND d2.dist = 2),
      d3 AS (SELECT * FROM d2 UNION ALL
             SELECT id, CAST(3 AS BIGINT) FROM n3
             WHERE id NOT IN (SELECT id FROM d2))
      SELECT id, dist FROM d3 ORDER BY id""",
    "q_graph_lpa" -> """
      WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, -l_suppkey AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT s, t FROM e0 UNION SELECT t AS s, s AS t FROM e0),
      l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
      c1 AS (SELECT e.s AS id, l.label, count(*) AS c
             FROM e JOIN l0 l ON e.t = l.id GROUP BY 1, 2),
      l1 AS (SELECT id, label FROM (
               SELECT id, label,
                      row_number() OVER (PARTITION BY id
                        ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT e.s AS id, l.label, count(*) AS c
             FROM e JOIN l1 l ON e.t = l.id GROUP BY 1, 2),
      l2 AS (SELECT id, label FROM (
               SELECT id, label,
                      row_number() OVER (PARTITION BY id
                        ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1)
      SELECT id, label FROM l2 ORDER BY id""",
    "q_graph_kcore" -> """
      WITH e0 AS (
        SELECT DISTINCT o_custkey AS s, -l_suppkey AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e1 AS (SELECT s, t FROM e0 UNION SELECT t AS s, s AS t FROM e0),
      d1 AS (SELECT s, count(*) AS d FROM e1 GROUP BY s),
      b1 AS (SELECT s FROM d1 WHERE d < 8),
      e2 AS (SELECT s, t FROM e1
             WHERE s NOT IN (SELECT s FROM b1)
               AND t NOT IN (SELECT s FROM b1)),
      d2 AS (SELECT s, count(*) AS d FROM e2 GROUP BY s),
      b2 AS (SELECT s FROM d2 WHERE d < 8),
      e3 AS (SELECT s, t FROM e2
             WHERE s NOT IN (SELECT s FROM b2)
               AND t NOT IN (SELECT s FROM b2)),
      d3 AS (SELECT s, count(*) AS d FROM e3 GROUP BY s),
      b3 AS (SELECT s FROM d3 WHERE d < 8),
      e4 AS (SELECT s, t FROM e3
             WHERE s NOT IN (SELECT s FROM b3)
               AND t NOT IN (SELECT s FROM b3))
      SELECT s AS id, count(*) AS deg
      FROM e4 GROUP BY s ORDER BY id""",
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
    "q_graph_triangles" -> """
      WITH colors AS (
        SELECT sk, ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096 +
                    (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256 +
                    (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16 +
                    (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 8 AS c
        FROM (SELECT DISTINCT l_suppkey AS sk,
                     lower(substring(md5(CAST(l_suppkey AS VARCHAR)), 1, 4)) AS hx
              FROM lineitem)),
      pairs AS (
        SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        JOIN colors ca ON a.l_suppkey = ca.sk
        JOIN colors cb ON b.l_suppkey = cb.sk
        WHERE ca.c = cb.c),
      deg AS (
        SELECT s, count(*) AS d FROM (
          SELECT s1 AS s FROM pairs UNION ALL SELECT s2 AS s FROM pairs)
        GROUP BY s),
      o AS (
        SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND p.s1 < p.s2)
                    THEN p.s1 ELSE p.s2 END AS u,
               CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND p.s1 < p.s2)
                    THEN p.s2 ELSE p.s1 END AS v,
               CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND p.s1 < p.s2)
                    THEN d2.d ELSE d1.d END AS dv
        FROM pairs p
        JOIN deg d1 ON p.s1 = d1.s
        JOIN deg d2 ON p.s2 = d2.s),
      tri AS (
        SELECT count(*) AS n_triangles
        FROM o e1
        JOIN o e2 ON e1.u = e2.u
                 AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
        JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v)
      SELECT (SELECT count(*) FROM deg) AS n_nodes,
             (SELECT count(*) FROM pairs) AS n_edges,
             n_triangles,
             n_triangles * 64 AS est_total
      FROM tri""",
  )
}
