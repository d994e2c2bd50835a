package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.B "Joins").
  *
  * Scale strategy per join:
  *  - dims (region/nation/supplier, and customer vs a 100 TB fact) are
  *    `broadcast()` hinted — no shuffle of the big side;
  *  - fact⋈fact equi-joins are left to sort-merge + AQE (skew split);
  *  - the theta/band join keeps the small side broadcast so the
  *    nested-loop never materializes a cross product of two big sides;
  *  - the as-of join is a union + single shuffle-by-key + one window
  *    sort — O(n log n) per key partition, no range cross-join;
  *  - the interval self-join buckets time into 1 h cells so each pair
  *    is tested once (explode one side into 3 neighbor cells).
  */
object Joins extends QueryModule {

  /** Equi inner join, small dim broadcast (orders ⋈ customer). */
  val joinBroadcast: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), c("c_custkey"), c("c_name"),
        c("c_mktsegment"), Norm.r4(o("o_totalprice")).as("totalprice"))
      .orderBy("o_orderkey")
  }

  /** 5-way star join lineitem⋈orders⋈customer⋈nation⋈region, revenue
    * per region/nation. Dims broadcast; lineitem⋈orders sort-merge.
    */
  val joinMultiway: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"), n("n_name"))
      .agg(
        Norm.r4(sum(li("l_extendedprice") * (lit(1.0) - li("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Left outer with null-extension: every customer, their order count
    * and revenue (0 for customers with no orders).
    */
  val joinLeft: Q = (spark, dir) => {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_orders"),
        Norm.r4(coalesce(sum(o("o_totalprice")), lit(0.0))).as("revenue"))
      .orderBy("c_custkey")
  }

  /** Full outer: per-nation customer count vs supplier count; either
    * side may be missing a nation. Null keys coalesced pre-sort so the
    * ordering is engine-independent.
    */
  val joinFull: Q = (spark, dir) => {
    val c = Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val s = Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    c.join(s, c("nk") === s("nk"), "full")
      .select(
        coalesce(c("nk"), s("nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Left-semi (EXISTS): customers with at least one urgent order. */
  val joinSemi: Q = (spark, dir) => {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Left-anti (NOT EXISTS): customers with no in-progress orders. */
  val joinAnti: Q = (spark, dir) => {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Theta/band join: parts whose retail price falls within ±100 of a
    * supplier's account balance. Supplier side broadcast → the
    * BroadcastNestedLoopJoin streams `part` once; output aggregated
    * per supplier so the result stays small at any SF.
    */
  val joinThetaRange: Q = (spark, dir) => {
    val p = Tables(spark, dir, "part")
    val s = Tables(spark, dir, "supplier")
    p.join(broadcast(s),
        p("p_retailprice").between(s("s_acctbal") - 500, s("s_acctbal") + 500))
      .groupBy(s("s_suppkey"))
      .agg(count(lit(1)).as("n_parts"),
        Norm.r4(avg(p("p_retailprice"))).as("avg_price"))
      .orderBy("s_suppkey")
  }

  /** As-of join: for each event, the latest order date of the same key
    * (user_id = o_custkey) with o_orderdate <= ts.
    *
    * Spark has no native as-of join; rather than a range-condition
    * nested-loop (quadratic per key), union both sides tagged, sort
    * once per key by time, and carry the latest order date forward
    * with last(_, ignoreNulls) — one shuffle, one sort, linear scan.
    * Orders sort before events on ties (tag 0 < 1) to give >= semantics
    * like DuckDB ASOF JOIN.
    */
  val joinAsof: Q = (spark, dir) => {
    val e = Tables(spark, dir, "events")
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), lit(1).as("tag"), lit(null).cast("timestamp").as("odate"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        lit(null).cast("long").as("event_id"), lit(0).as("tag"),
        col("o_orderdate").as("odate"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("matched", last(col("odate"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        Norm.tstr(col("t")).as("ts"),
        coalesce(Norm.dstr(col("matched")), lit("none")).as("last_order_date"))
      .orderBy("event_id")
  }

  /** NEAREST as-of join — the sensor-alignment variant of
    * [[joinAsof]]: each event matches its temporally CLOSEST order
    * (backward or forward, ties to backward — the past is the safer
    * default when both are equidistant), not just the latest
    * preceding one. Same single union-sort shape: one window carries
    * the last preceding order date forward, a mirrored window
    * carries the first following one backward, and the pick is an
    * exact integer-µs gap comparison. Orders sort before events on
    * timestamp ties (tag 0 < 1), so a same-instant order is a
    * backward match at gap 0 — the ≥ semantics both engines share.
    *
    * Scale: identical to joinAsof — one shuffle by key, one sort,
    * two linear window scans; no range nested-loop anywhere.
    */
  val joinAsofNearest: Q = (spark, dir) => {
    val e = Tables(spark, dir, "events")
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp").as("odate"))
    nearestAsofCore(e, o)
      .select(col("event_id"), col("k").as("user_id"),
        Norm.tstr(col("t")).as("ts"),
        coalesce(Norm.dstr(when(col("dir") === "backward", col("prev"))
          .otherwise(col("nxt"))), lit("none")).as("nearest_order_date"),
        col("dir"), col("gap_us"))
      .orderBy("event_id")
  }

  /** Core of [[joinAsofNearest]], factored for planted-fixture specs:
    * probes (k, t, event_id) × points (k, odate) → one row per probe
    * with (prev, nxt, dir, gap_us) — backward wins exact gap ties,
    * same-instant points sort before probes so they are backward
    * matches at gap 0.
    */
  private[graft] def nearestAsofCore(
      probes: org.apache.spark.sql.DataFrame,
      points: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = probes.select(col("k"), col("t"), col("event_id"),
      lit(1).as("tag"), lit(null).cast("timestamp").as("odate"))
    val o = points.select(col("k"), col("odate").as("t"),
      lit(null).cast("long").as("event_id"), lit(0).as("tag"),
      col("odate"))
    val wOrd = Window.partitionBy("k").orderBy(col("t"), col("tag"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wNext = wOrd.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val gapB = expr("unix_micros(t) - unix_micros(prev)")
    val gapF = expr("unix_micros(nxt) - unix_micros(t)")
    e.unionByName(o)
      .withColumn("prev", last(col("odate"), ignoreNulls = true)
        .over(wPrev))
      .withColumn("nxt", first(col("odate"), ignoreNulls = true)
        .over(wNext))
      .filter(col("tag") === 1)
      .withColumn("dir",
        when(col("prev").isNull && col("nxt").isNull, "none")
          .when(col("nxt").isNull, "backward")
          .when(col("prev").isNull, "forward")
          .when(gapB <= gapF, "backward")
          .otherwise("forward"))
      .withColumn("gap_us",
        coalesce(when(col("dir") === "backward", gapB)
          .when(col("dir") === "forward", gapF), lit(-1L)))
  }

  /** Interval self-join: pairs of events within 1 hour of each other,
    * counted by (earlier event's type, later event's type), ties by
    * event_id. NO pair enumeration: the naive cell-bucketed self-join
    * is correct but does O(n_cell²) work inside each hour cell — cell
    * population grows linearly with data, per-cell work quadratically,
    * a guaranteed straggler at 100×. Instead each event is duplicated
    * into its own cell and the next (so every in-band earlier event of
    * a row lives in its partition — same-us rows always share a cell,
    * so nothing is double-counted), and per-type counts of strictly
    * earlier in-band neighbors come from three window frames over one
    * sort: count(band ∧ earlier) = RANGE[-1h, 0] − RANGE[0, 0] +
    * (same-us, earlier-id ROWS frame). Per-cell cost drops to
    * O(n_cell log n_cell); the 25-row result is the same aggregate the
    * enumerating join produced. The per-type count columns need the
    * type list at plan-build time, so it is a PARAMETER (`types`) —
    * plan width scales with the declared domain, so this shape fits
    * enum-like type columns (≲ a few hundred values; for a
    * high-cardinality type column, enumerate pairs instead — plan
    * width cannot be data-independent there). Unlike the dynamic
    * `pivot(col)`-style distinct+collect this replaces, no extra
    * full-table scan happens at plan-build time; and unlike a silent
    * hardcoded list, any event whose type is OUTSIDE the declared
    * domain fails the query loudly (`raise_error`) instead of being
    * dropped from the pair counts.
    */
  def joinIntervalTyped(types: Seq[String]): Q = (spark, dir) => {
    val bandUs = 3600L * 1000000L
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("cell", floor(col("us") / bandUs))
    // dup = 0 → home copy (emitted); dup = 1 → context copy shifted
    // into the next cell (counted by neighbors, never emitted).
    val parts = ev.select(col("event_id"), col("event_type"), col("us"),
      posexplode(array(col("cell"), col("cell") + lit(1L)))
        .as(Seq("dup", "part")))
    val wBand = Window.partitionBy("part").orderBy("us")
      .rangeBetween(-bandUs, 0)
    val wEq = Window.partitionBy("part").orderBy("us").rangeBetween(0, 0)
    val wTie = Window.partitionBy("part", "us").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nCols = types.map { t =>
      val is = when(col("event_type") === t, lit(1L)).otherwise(lit(0L))
      (sum(is).over(wBand) - sum(is).over(wEq) +
        coalesce(sum(is).over(wTie), lit(0L))).as(s"n_$t")
    }
    // Domain guard: a type outside `types` has no n_<type> column, so
    // its pairs-as-earlier-event would silently vanish — fail loudly.
    val checkedType = when(col("event_type").isInCollection(types),
      col("event_type")).otherwise(raise_error(concat(
        lit("joinInterval: event_type outside declared domain: "),
        col("event_type"))).cast("string"))
    parts.select(col("dup") +: col("event_type") +: nCols: _*)
      .filter(col("dup") === 0)
      .select(checkedType.as("event_type2"),
        explode(map(types.flatMap(t =>
          Seq(lit(t), col(s"n_$t"))): _*)).as(Seq("event_type", "n")))
      .groupBy("event_type", "event_type2")
      .agg(sum("n").as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy("event_type", "event_type2")
  }

  /** Scored instance of [[joinIntervalTyped]] bound to the testdata's
    * documented event-type domain (TESTDATA.md; identical at every SF —
    * the domain guard above would fail the run if that drifted).
    */
  val joinInterval: Q = joinIntervalTyped(
    Seq("click", "error", "purchase", "signup", "view"))

  /** Skew-robust salted join on a deliberately hot key: every 'click'
    * event (~1/5 of the table) maps to nation 7, the rest spread over
    * user_id % 25 — the classic one-reducer-stalls shape. The probe
    * goes through [[graft.api.ops.GraftDataFrameOps.saltedJoin]], so
    * the join key becomes (nk, _salt) and the hot key's rows land on
    * `salt` reducers instead of one (PlanSpec pins the composite key).
    * Salting is result-invisible: the oracle is the plain join.
    */
  val joinSalted: Q = (spark, dir) => {
    import graft.api.ops._
    val e = Tables(spark, dir, "events")
      .withColumn("nk",
        when(col("event_type") === "click", lit(7))
          .otherwise(pmod(col("user_id"), lit(25)).cast("int")))
    val n = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("nk"), col("n_name"))
    // Sum in integer cents: the hot group aggregates ~n/5 doubles, and
    // a double sum's unrounded value depends on summation order, which
    // differs between engines — an integer sum is order-independent,
    // so the oracle compare cannot hit a rounding tie at any SF.
    e.saltedJoin(n, "nk", salt = 16)
      .groupBy("nk", "n_name")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
      .orderBy("nk")
  }

  /** Bloom-filter semi-join reduction: lineitem probes only the
    * URGENT orders (1/5 of the key space). The probe side is
    * pre-filtered at its scan by
    * [[graft.api.ops.GraftDataFrameOps.bloomSemiJoin]]'s
    * `bloom_might_contain` (codegen'd, PlanSpec-pinned below the
    * join), so ~80% of lineitem rows never enter the join shuffle —
    * the cut that matters when lineitem is the 100 TB side. The sketch
    * is sized for the sf0.1 build cardinality (~30 k keys; ~36 KB at
    * 1%); production sizing = the dim filter's distinct-key estimate.
    * Results are exact — the join removes false positives — so the
    * oracle is the plain join.
    */
  /** LATERAL correlated derived-table join (SQL:1999, the "top-N per
    * outer row" SQL surface): each order pulls its 2 highest-priced
    * lineitems. Catalyst DECORRELATES the lateral subquery — the
    * ORDER BY/LIMIT inside becomes a per-l_orderkey ranked window and
    * the correlation becomes one equi-join, so execution is
    * window + join (WindowGroupLimit-eligible partial top-k), NOT a
    * per-outer-row nested loop: the plan scales like
    * `q_topk_per_group`, the DataFrame spelling of the same shape.
    */
  val joinLateral: Q = (spark, dir) => {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_lv")
    Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem_lv")
    spark.sql("""
      SELECT o.o_orderkey, t.l_linenumber,
             round(t.l_extendedprice, 4) AS price
      FROM orders_lv o,
      LATERAL (SELECT l_linenumber, l_extendedprice
               FROM lineitem_lv l
               WHERE l.l_orderkey = o.o_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber
               LIMIT 2) t
      ORDER BY o.o_orderkey, price DESC, t.l_linenumber""")
  }

  val joinBloom: Q = (spark, dir) => {
    import graft.api.ops._
    val li = Tables(spark, dir, "lineitem")
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    li.bloomSemiJoin(urgent, "l_orderkey", expectedItems = 1L << 16)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("sum_cents"))
      .orderBy("o_orderstatus")
  }

  /** Blocked fuzzy join (entity resolution): probe names with planted
    * typos — every 10th customer's name with 'Customer' corrupted at
    * edit distance 1, 2, or 3, derived from the table itself so the
    * oracle re-derives them — are matched back by levenshtein ≤ 2, so
    * the d3 probes prove the threshold rejects. The join is BLOCKED on
    * the '#'+digits suffix (untouched by the corruption): candidates
    * come from an exact equi-join on the block key, and the O(len²)
    * edit-distance only runs within blocks — the standard shape that
    * keeps fuzzy matching off the n² cliff at 100 TB (block key choice
    * = whatever survives the noise: phonetic code, sorted tokens,
    * zip+year, …).
    */
  val fuzzyMatch: Q = (spark, dir) => {
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 9, 10).as("block"))
    val probes = c.filter(col("c_custkey") % 10 === 0)
      .select(concat(
          when(col("c_custkey") % 30 === 0, lit("Kustoner"))
            .when(col("c_custkey") % 20 === 0, lit("Kastoner"))
            .otherwise(lit("Kustomer")),
          col("block")).as("probe_name"),
        col("block"))
    probes.join(c, "block")
      .withColumn("dist", levenshtein(col("c_name"), col("probe_name")))
      .filter(col("dist") <= 2)
      .select(col("c_custkey"), col("c_name"), col("probe_name"), col("dist"))
      .orderBy("c_custkey")
  }

  /** NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of vanishing — the semantics data
    * reconciliation needs when "unknown" is a join-able category.
    * Every 5th supplier's nationkey is NULLed and so is nation 7's
    * key, so NULL suppliers land on the NULL-keyed nation (a plain
    * `=` join silently drops all of them). EqualNullSafe is still an
    * equi-join key for Spark: this plans as a broadcast HASH join,
    * not a nested loop.
    */
  val joinNullSafe: Q = (spark, dir) => {
    val s = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"),
        when(col("s_suppkey") % 5 === 0, lit(null))
          .otherwise(col("s_nationkey")).as("s_nat"))
    val n = Tables(spark, dir, "nation")
      .select(when(col("n_nationkey") === 7, lit(null))
          .otherwise(col("n_nationkey")).as("n_key"),
        col("n_name"))
    s.join(broadcast(n), col("s_nat") <=> col("n_key"))
      .select(col("s_suppkey"), col("n_name"))
      .orderBy("s_suppkey", "n_name")
  }

  /** Grid-bucketed spatial distance join: every (customer, supplier)
    * pair within euclidean radius r of each other, on deterministic
    * synthetic coordinates derived from the keys (multiplicative-hash
    * into [0,1)² — exact integer mod, then one double division, so
    * both engines see bit-identical points).
    *
    * Scale: the classic O(n·m) distance join becomes an equi-join on
    * grid cells of side r — one side keeps its own cell, the other
    * explodes to the 3×3 neighborhood, so every qualifying pair meets
    * in exactly one cell and each candidate is distance-tested once.
    * Cost is O(n·9·density), shuffle is hash-by-cell (both sides can
    * be 100 TB — no broadcast needed; AQE will still broadcast a small
    * side). The oracle brute-forces the same predicate over the cross
    * product, proving the grid pruning loses no pair.
    */
  val geoGridJoin: Q = (spark, dir) => {
    import graft.api.ops._
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        ((col("c_custkey") * 2654435761L) % 1000003L).cast("double")
          ./(1000003d).as("x"),
        ((col("c_custkey") * 40503L + 12345L) % 999983L).cast("double")
          ./(999983d).as("y"))
    val s = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"),
        ((col("s_suppkey") * 1500450271L + 7919L) % 1000003L).cast("double")
          ./(1000003d).as("sx"),
        ((col("s_suppkey") * 96002369L + 271L) % 999983L).cast("double")
          ./(999983d).as("sy"))
    c.gridRadiusJoin(s, col("c_custkey"), col("x"), col("y"),
        col("s_suppkey"), col("sx"), col("sy"), r = 0.05)
      .select(col("left_id").as("c_custkey"),
        col("right_id").as("s_suppkey"),
        Norm.r4tie(col("dist")).as("dist"))
      .orderBy("c_custkey", "s_suppkey")
  }

  /** As-of join with a STALENESS BOUND — the feature-store freshness
    * contract: each event takes the user's most recent prior order
    * only if it is ≤ 7 days old, else reports 'stale' ('none' when no
    * prior order exists at all). Same union-window spine as
    * [[joinAsof]] (one shuffle, no join); the tolerance test is an
    * exact integer µs comparison, so freshness classification can't
    * drift.
    */
  val joinAsofTolerance: Q = (spark, dir) => {
    val e = Tables(spark, dir, "events")
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), lit(1).as("tag"),
        lit(null).cast("timestamp").as("odate"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        lit(null).cast("long").as("event_id"), lit(0).as("tag"),
        col("o_orderdate").as("odate"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("matched",
        last(col("odate"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("age_us",
        expr("unix_micros(t)") - expr("unix_micros(matched)"))
      .select(col("event_id"), col("k").as("user_id"),
        Norm.tstr(col("t")).as("ts"),
        when(col("matched").isNull, "none")
          .when(col("age_us") > 604800000000L, "stale")
          .otherwise(Norm.dstr(col("matched"))).as("fresh_order_date"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q_join_asof_tolerance" -> joinAsofTolerance,
    "q_geo_grid_join" -> geoGridJoin,
    "q_join_bloom" -> joinBloom,
    "q_join_lateral" -> joinLateral,
    "q_fuzzy_match" -> fuzzyMatch,
    "q_join_null_safe" -> joinNullSafe,
    "q_join_salted" -> joinSalted,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_multiway" -> joinMultiway,
    "q_join_left" -> joinLeft,
    "q_join_full" -> joinFull,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_theta_range" -> joinThetaRange,
    "q_join_asof" -> joinAsof,
    "q_join_asof_nearest" -> joinAsofNearest,
    "q_join_interval" -> joinInterval,
  )

  val oracle: Map[String, String] = Map(
    "q_geo_grid_join" -> """
      WITH c AS (
        SELECT c_custkey,
               ((c_custkey * 2654435761) % 1000003) / 1000003.0 AS x,
               ((c_custkey * 40503 + 12345) % 999983) / 999983.0 AS y
        FROM customer),
      s AS (
        SELECT s_suppkey,
               ((s_suppkey * 1500450271 + 7919) % 1000003) / 1000003.0 AS sx,
               ((s_suppkey * 96002369 + 271) % 999983) / 999983.0 AS sy
        FROM supplier)
      SELECT c_custkey, s_suppkey,
             floor(sqrt((x - sx) * (x - sx) + (y - sy) * (y - sy))
                   * 10000 + 0.5) / 10000 AS dist
      FROM c, s
      WHERE (x - sx) * (x - sx) + (y - sy) * (y - sy) <= 0.05 * 0.05
      ORDER BY c_custkey, s_suppkey""",
    "q_join_lateral" -> """
      SELECT o.o_orderkey, t.l_linenumber,
             round(t.l_extendedprice, 4) AS price
      FROM orders o,
      LATERAL (SELECT l_linenumber, l_extendedprice
               FROM lineitem l
               WHERE l.l_orderkey = o.o_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber
               LIMIT 2) t
      ORDER BY o.o_orderkey, price DESC, t.l_linenumber""",
    "q_join_bloom" -> """
      SELECT o_orderstatus, count(*) AS n_items,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS sum_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q_fuzzy_match" -> """
      WITH c AS (
        SELECT c_custkey, c_name, substr(c_name, 9, 10) AS block
        FROM customer),
      probes AS (
        SELECT CASE WHEN c_custkey % 30 = 0 THEN 'Kustoner'
                    WHEN c_custkey % 20 = 0 THEN 'Kastoner'
                    ELSE 'Kustomer' END || block AS probe_name,
               block
        FROM c WHERE c_custkey % 10 = 0)
      SELECT c_custkey, c_name, probe_name,
             levenshtein(c_name, probe_name) AS dist
      FROM probes JOIN c USING (block)
      WHERE levenshtein(c_name, probe_name) <= 2
      ORDER BY c_custkey""",
    "q_join_null_safe" -> """
      WITH s AS (SELECT s_suppkey,
                        CASE WHEN s_suppkey % 5 = 0 THEN NULL
                             ELSE s_nationkey END AS s_nat
                 FROM supplier),
      n AS (SELECT CASE WHEN n_nationkey = 7 THEN NULL
                        ELSE n_nationkey END AS n_key, n_name
            FROM nation)
      SELECT s_suppkey, n_name
      FROM s JOIN n ON s_nat IS NOT DISTINCT FROM n_key
      ORDER BY s_suppkey, n_name""",
    "q_join_salted" -> """
      WITH e AS (
        SELECT CASE WHEN event_type = 'click' THEN 7
                    ELSE CAST(user_id % 25 AS INT) END AS nk, value
        FROM events)
      SELECT e.nk, n_name, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM e JOIN nation ON e.nk = n_nationkey
      GROUP BY e.nk, n_name
      ORDER BY nk""",
    "q_join_broadcast" -> """
      SELECT o_orderkey, c_custkey, c_name, c_mktsegment,
             round(o_totalprice, 4) AS totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""",
    "q_join_multiway" -> """
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",
    "q_join_left" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             round(coalesce(sum(o_totalprice), 0), 4) AS revenue
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""",
    "q_join_full" -> """
      SELECT coalesce(c.nk, s.nk) AS nationkey,
             coalesce(n_cust, 0) AS n_cust,
             coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
            FROM customer GROUP BY c_nationkey) c
      FULL OUTER JOIN
           (SELECT s_nationkey AS nk, count(*) AS n_supp
            FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
      ORDER BY nationkey""",
    "q_join_semi" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",
    "q_join_anti" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey""",
    "q_join_theta_range" -> """
      SELECT s_suppkey, count(*) AS n_parts,
             round(avg(p_retailprice), 4) AS avg_price
      FROM part JOIN supplier
        ON p_retailprice BETWEEN s_acctbal - 500 AND s_acctbal + 500
      GROUP BY s_suppkey
      ORDER BY s_suppkey""",
    "q_join_asof_tolerance" -> """
      SELECT e.event_id, e.user_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             CASE WHEN o.o_orderdate IS NULL THEN 'none'
                  WHEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
                       > 604800000000 THEN 'stale'
                  ELSE strftime(o.o_orderdate, '%Y-%m-%d') END
               AS fresh_order_date
      FROM events e
      ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      ORDER BY e.event_id""",
    "q_join_asof_nearest" -> """
      WITH b AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS prev
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
      f AS (
        SELECT e.event_id, o.o_orderdate AS nxt
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate),
      j AS (
        SELECT b.event_id, b.user_id, b.ts, b.prev, f.nxt,
               CASE WHEN b.prev IS NULL AND f.nxt IS NULL THEN 'none'
                    WHEN f.nxt IS NULL THEN 'backward'
                    WHEN b.prev IS NULL THEN 'forward'
                    WHEN epoch_us(b.ts) - epoch_us(CAST(b.prev AS TIMESTAMP))
                         <= epoch_us(CAST(f.nxt AS TIMESTAMP)) - epoch_us(b.ts)
                    THEN 'backward' ELSE 'forward' END AS dir
        FROM b JOIN f ON b.event_id = f.event_id)
      SELECT event_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
             coalesce(strftime(
               CASE WHEN dir = 'backward' THEN prev ELSE nxt END,
               '%Y-%m-%d'), 'none') AS nearest_order_date,
             dir,
             coalesce(CASE WHEN dir = 'backward'
                           THEN epoch_us(ts) - epoch_us(CAST(prev AS TIMESTAMP))
                           WHEN dir = 'forward'
                           THEN epoch_us(CAST(nxt AS TIMESTAMP)) - epoch_us(ts)
                      END, -1) AS gap_us
      FROM j ORDER BY event_id""",
    "q_join_asof" -> """
      SELECT e.event_id, e.user_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             coalesce(strftime(o.o_orderdate, '%Y-%m-%d'), 'none')
               AS last_order_date
      FROM events e
      ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      ORDER BY e.event_id""",
    // Defining semantics (the enumerating theta join — kept for the
    // record, NOT shipped as the oracle):
    //   SELECT a.event_type, b.event_type AS event_type2, count(*)
    //   FROM events a JOIN events b
    //     ON us(b) - us(a) <= 3600000000
    //    AND (us(a) < us(b) OR (us(a) = us(b) AND a.event_id < b.event_id))
    //   GROUP BY 1, 2
    // That join materializes O(n · band_density) pairs — ~3e9 at sf1 —
    // and never finished the sf1 replay. The shipped oracle is the
    // classic sweep-line instead: merge each event's two probes
    // (its own lex key; its band start us−1h) into the per-type event
    // stream, one running-count window per pass, pairs(b, t) =
    // prefix_lex(b) − prefix_before_band(b). Probes sort BEFORE events
    // at an identical key (probe DESC) so b never counts itself and
    // events exactly at the band start stay in-band. Verified equal to
    // the enumerating form at sf0.001/0.01/0.1 (25/25 rows each) —
    // still algorithm-independent of the Spark plan (three RANGE/ROWS
    // frames over hour cells vs. a probe merge).
    "q_join_interval" -> """
      WITH ev AS (
        SELECT event_id, event_type, epoch_ns(ts) // 1000 AS us
        FROM events),
      ty AS (SELECT DISTINCT event_type AS t FROM ev),
      ua AS (
        SELECT event_type AS t, us, event_id AS id, 0 AS probe,
               CAST(NULL AS BIGINT) AS aid, CAST(NULL AS VARCHAR) AS atype
        FROM ev
        UNION ALL
        SELECT ty.t, b.us, b.event_id, 1, b.event_id, b.event_type
        FROM ev b CROSS JOIN ty),
      pa AS (
        SELECT t, probe, aid, atype,
               sum(CASE WHEN probe = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY t ORDER BY us, id, probe DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS c
        FROM ua),
      ub AS (
        SELECT event_type AS t, us, 0 AS probe,
               CAST(NULL AS BIGINT) AS aid, CAST(NULL AS VARCHAR) AS atype
        FROM ev
        UNION ALL
        SELECT ty.t, b.us - 3600000000, 1, b.event_id, b.event_type
        FROM ev b CROSS JOIN ty),
      pb AS (
        SELECT t, probe, aid, atype,
               sum(CASE WHEN probe = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY t ORDER BY us, probe DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS c
        FROM ub)
      SELECT a.t AS event_type, a.atype AS event_type2,
             CAST(sum(a.c - b.c) AS BIGINT) AS n_pairs
      FROM (SELECT t, aid, atype, c FROM pa WHERE probe = 1) a
      JOIN (SELECT t, aid, atype, c FROM pb WHERE probe = 1) b
        ON a.t = b.t AND a.aid = b.aid
      GROUP BY a.t, a.atype
      HAVING sum(a.c - b.c) > 0
      ORDER BY event_type, event_type2""",
  )
}
