package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function queries (SURVEY.md §2.B "Scalar functions").
  * All built-in codegen'd expressions — no UDFs — so every query here
  * stays inside one WholeStageCodegen span over the scan.
  */
object ScalarFuncs extends QueryModule {

  /** String functions: upper/substr/concat/length/like/regexp_extract. */
  val stringFuncs: Q = (spark, dir) => {
    val p = Tables(spark, dir, "part")
    p.select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        col("p_name").like("%widget%").as("is_widget"),
        regexp_extract(col("p_brand"), "#([0-9]+)$", 1).as("brand_num"))
      .orderBy("p_partkey")
  }

  /** Datetime functions: trunc/extract/diff/add_months. */
  val dateFuncs: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
    o.select(col("o_orderkey"),
        Norm.dstr(date_trunc("month", col("o_orderdate"))).as("order_month"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_2002"),
        Norm.dstr(add_months(col("o_orderdate"), 3)).as("plus3m"))
      .orderBy("o_orderkey")
  }

  /** Math functions: round/abs/pow/ln/ceil/floor/pmod. */
  val mathFuncs: Q = (spark, dir) => {
    val li = Tables(spark, dir, "lineitem")
    li.select(col("l_orderkey"), col("l_linenumber"),
        Norm.r4(col("l_extendedprice") * col("l_discount")).as("disc_amount"),
        Norm.r4(abs(col("l_discount") - 0.05)).as("disc_dev"),
        Norm.r4(pow(col("l_quantity"), 2)).as("qty_sq"),
        Norm.r4(log(col("l_extendedprice"))).as("ln_price"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_tax") * 100).as("tax_pct"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** JSON extraction from the events.props string column. */
  val jsonFuncs: Q = (spark, dir) => {
    val e = Tables(spark, dir, "events")
    e.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"), lit("k LONG")).getField("k").as("k_struct"))
      .orderBy("event_id")
  }

  /** Spark 4 VariantType (the semi-structured column type): JSON
    * parsed ONCE into the binary variant encoding, then typed path
    * extraction — at scale this replaces per-access string re-parsing
    * (`get_json_object` re-tokenizes the whole document every call)
    * with shredded binary reads; `try_variant_get` on a missing path
    * yields NULL instead of failing the row.
    */
  val jsonVariant: Q = (spark, dir) => {
    val e = Tables(spark, dir, "events")
    e.select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
        expr("variant_get(parse_json(props), '$.k', 'string')")
          .as("k_str"),
        expr("try_variant_get(parse_json(props), '$.missing', 'string')")
          .as("missing"))
      .orderBy("event_id")
  }

  /** Higher-order array functions over the 64-dim embeddings: size,
    * element access, slice-fold, transform+fold (L2 norm). Folds seed
    * with 0.0 and add left-to-right, matching DuckDB list_reduce order
    * so doubles agree bit-for-bit before rounding.
    */
  val arrayFuncs: Q = (spark, dir) => {
    val em = Tables(spark, dir, "embeddings")
      .withColumn("emb", transform(col("embedding"), _.cast("double")))
    em.select(col("vec_id"),
        size(col("embedding")).as("dim"),
        Norm.r4(element_at(col("emb"), 1)).as("first_elem"),
        Norm.r4(aggregate(slice(col("emb"), 1, 8), lit(0.0), _ + _))
          .as("head8_sum"),
        Norm.r4(sqrt(aggregate(transform(col("emb"), x => x * x),
          lit(0.0), _ + _))).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** Map functions: build event_type→count map per user, then look up
    * and size it. The map is built with map_from_entries over a
    * collected struct list; output is scalar lookups (never a raw map
    * column — map ordering is engine-specific).
    */
  val mapFuncs: Q = (spark, dir) => {
    val e = Tables(spark, dir, "events")
    e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
        .as("type_counts"))
      .select(col("user_id"),
        coalesce(element_at(col("type_counts"), "click"), lit(0L)).as("n_click"),
        coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("n_purchase"),
        size(col("type_counts")).as("n_types"))
      .orderBy("user_id")
  }

  /** ANSI-safe `try_*` arithmetic — Spark 4 runs ANSI mode by
    * default, where raw division/casts THROW on bad input, so the
    * `try_` family is how production pipelines express "NULL, don't
    * kill the job": try_divide against a denominator that hits zero
    * on every 10th row, try_add at overflow-prone magnitudes, and
    * try_cast of a non-numeric string. Planted failures are derived
    * from the key so the oracle reproduces them with CASE guards
    * (DuckDB divides-by-zero errors too — its twin IS the guard).
    */
  val tryFuncs: Q = (spark, dir) => {
    val o = Tables(spark, dir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5))
    // cents ≤ 5e7 in this data, so the ×1e11 product (≤ 5e18) never
    // overflows the MULTIPLY; the ADD overflows exactly when
    // cents ≥ 46116861 (price ≥ $461,168.61 — the top ~0.8% of
    // orders), giving a NULL-bearing but mostly-populated column.
    o.select(col("o_orderkey"),
        try_divide(col("cents"), col("o_orderkey") % 10).as("per_mod"),
        try_add(col("cents") * lit(100000000000L),
          lit(Long.MaxValue / 2)).as("overflowed"),
        try_to_number(when(col("o_orderkey") % 3 === 0, lit("oops"))
          .otherwise(col("cents").cast("string")), lit("999999999999"))
          .cast("long").as("parsed"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q_try_funcs" -> tryFuncs,
    "q_string_funcs" -> stringFuncs,
    "q_date_funcs" -> dateFuncs,
    "q_math_funcs" -> mathFuncs,
    "q_json_funcs" -> jsonFuncs,
    "q_json_variant" -> jsonVariant,
    "q_array_funcs" -> arrayFuncs,
    "q_map_funcs" -> mapFuncs,
  )

  val oracle: Map[String, String] = Map(
    "q_try_funcs" -> """
      WITH o AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE cents / (o_orderkey % 10) END AS per_mod,
             CASE WHEN cents >= 46116861 THEN NULL
                  ELSE cents * 100000000000 + 4611686018427387903
               END AS overflowed,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE cents END
               AS parsed
      FROM o
      ORDER BY o_orderkey""",
    "q_string_funcs" -> """
      SELECT p_partkey,
             upper(p_name) AS uname,
             substr(p_name, 1, 5) AS prefix5,
             concat_ws('/', p_brand, p_type) AS brand_type,
             length(p_name) AS name_len,
             p_name LIKE '%widget%' AS is_widget,
             coalesce(regexp_extract(p_brand, '#([0-9]+)$', 1), '') AS brand_num
      FROM part
      ORDER BY p_partkey""",
    "q_date_funcs" -> """
      SELECT o_orderkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
             CAST(extract(year FROM o_orderdate) AS INT) AS yr,
             CAST(extract(month FROM o_orderdate) AS INT) AS mo,
             CAST(extract(dow FROM o_orderdate) + 1 AS INT) AS dow,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
               AS days_to_2002,
             strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
      FROM orders
      ORDER BY o_orderkey""",
    "q_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * l_discount, 4) AS disc_amount,
             round(abs(l_discount - 0.05), 4) AS disc_dev,
             round(pow(l_quantity, 2), 4) AS qty_sq,
             round(ln(l_extendedprice), 4) AS ln_price,
             CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
             CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct,
             l_orderkey % 7 AS key_mod7
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""",
    "q_json_variant" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
             json_extract_string(props, '$.k') AS k_str,
             json_extract_string(props, '$.missing') AS missing
      FROM events
      ORDER BY event_id""",
    "q_json_funcs" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
      FROM events
      ORDER BY event_id""",
    "q_array_funcs" -> """
      SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
               (a, b) -> a + b), 4) AS head8_sum,
             round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b)), 4) AS l2_norm
      FROM embeddings
      ORDER BY vec_id""",
    "q_map_funcs" -> """
      SELECT user_id,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
             CAST(count(DISTINCT event_type) AS INT) AS n_types
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",
  )
}
