package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (builder-prompt
  * LLM surface): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes:
  *  - exact dedup is one hash-shuffle on sha2(text) — the canonical
  *    100 TB dedup plan (hash is 32 bytes regardless of doc size, so
  *    the shuffle never moves document text);
  *  - Jaccard runs inside (source, lang) blocks — within-block
  *    quadratic, so block size bounds cost; MinHash/LSH is the
  *    unblocked scale path: candidates meet only when a band bucket
  *    collides, turning all-pairs O(n²) into O(n·bands) shuffle +
  *    skew-bounded bucket joins;
  *  - signatures/buckets are computed with higher-order array
  *    functions over the token array — per-row, no UDF, codegen'd.
  */
object Dedup extends QueryModule {

  private def docsWithTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("tokset", array_distinct(col("tokens")))

  /** Exact duplicate groups by content hash; canonical = min doc_id. */
  val dedupExact: Q = (spark, dir) => {
    Tables(spark, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("n_dups"))
      .orderBy("doc_id")
  }

  /** Exact token-set Jaccard over pairs blocked by (source, lang).
    * The DuckDB twin verifies the set arithmetic; the MinHash query
    * approximates exactly this measure without the blocking.
    */
  val dedupNgramJaccard: Q = (spark, dir) => {
    val d = docsWithTokens(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("tokset"))
    val a = d.select(col("source"), col("lang"), col("doc_id").as("d1"),
      col("tokset").as("s1"))
    val b = d.select(col("source").as("source_b"), col("lang").as("lang_b"),
      col("doc_id").as("d2"), col("tokset").as("s2"))
    a.join(b, a("source") === b("source_b") && a("lang") === b("lang_b") &&
        a("d1") < b("d2"))
      .select(col("d1"), col("d2"),
        Norm.r4(size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("d1", "d2")
  }

  /** MinHash signature: 32 hash families over distinct 3-token
    * shingles; banded into 8 bands × 4 rows for LSH bucketing.
    */
  private def withMinhash(d: DataFrame): DataFrame = d
    .withColumn("shingles", array_distinct(expr(
      """transform(sequence(0, greatest(size(tokens) - 3, 0)),
        |  i -> concat_ws(' ', slice(tokens, i + 1, 3)))""".stripMargin)))
    .withColumn("sig", expr(
      """transform(sequence(0, 31), k ->
        |  array_min(transform(shingles, s -> xxhash64(s, k))))""".stripMargin))

  /** Near-dup candidate pairs via MinHash/LSH, verified with exact
    * Jaccard. No oracle (xxhash64 signatures aren't reproducible in
    * DuckDB); DedupSpec checks recall vs the brute-force pairs.
    */
  val dedupMinhash: Q = (spark, dir) => {
    val d = withMinhash(docsWithTokens(spark, dir))
      .select(col("doc_id"), col("tokset"), col("sig"))
    val banded = d.withColumn("band", explode(expr(
        """transform(sequence(0, 7), b ->
          |  struct(b AS band_id,
          |    xxhash64(slice(sig, b * 4 + 1, 4)) AS band_hash))""".stripMargin)))
      .select(col("doc_id"), col("tokset"),
        col("band.band_id"), col("band.band_hash"))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("d1"), col("tokset").as("s1"))
    val b = banded.select(col("band_id").as("band_id_b"),
      col("band_hash").as("band_hash_b"),
      col("doc_id").as("d2"), col("tokset").as("s2"))
    a.join(b, a("band_id") === b("band_id_b") &&
        a("band_hash") === b("band_hash_b") && a("d1") < b("d2"))
      .select(col("d1"), col("d2"), col("s1"), col("s2"))
      .dropDuplicates("d1", "d2")
      .select(col("d1"), col("d2"),
        Norm.r4(size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("d1", "d2")
  }

  /** 64-bit SimHash per document from token hashes (bit-majority
    * vote), plus near-dup pairs at Hamming distance ≤ 3 within a
    * 16-bit prefix block. No oracle (xxhash64); DedupSpec asserts
    * hamming(simhash(x), simhash(x)) = 0 and pair symmetry.
    */
  val dedupSimhash: Q = (spark, dir) => {
    val d = docsWithTokens(spark, dir)
      .withColumn("hashes", expr("transform(tokset, t -> xxhash64(t))"))
      .withColumn("votes", expr(
        """aggregate(hashes,
          |  transform(sequence(0, 63), b -> 0L),
          |  (acc, h) -> zip_with(acc,
          |    transform(sequence(0, 63), b ->
          |      CASE WHEN (h >> b) & 1 = 1 THEN 1L ELSE -1L END),
          |    (a, v) -> a + v))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) ->
          |  acc + CASE WHEN element_at(votes, b + 1) > 0
          |             THEN shiftleft(1L, b) ELSE 0L END)""".stripMargin))
      .select(col("doc_id"), col("simhash"),
        expr("shiftright(simhash, 48) & 65535").as("block"))
    val a = d.select(col("block"), col("doc_id").as("d1"),
      col("simhash").as("h1"))
    val b = d.select(col("block").as("block_b"), col("doc_id").as("d2"),
      col("simhash").as("h2"))
    a.join(b, a("block") === b("block_b") && a("d1") < b("d2"))
      .select(col("d1"), col("d2"),
        expr("bit_count(h1 ^ h2)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> dedupExact,
    "q_dedup_ngram_jaccard" -> dedupNgramJaccard,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_simhash" -> dedupSimhash,
  )

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" -> """
      SELECT min(doc_id) AS doc_id, count(*) AS n_dups
      FROM documents
      GROUP BY text
      ORDER BY doc_id""",
    "q_dedup_ngram_jaccard" -> """
      WITH d AS (SELECT doc_id, source, lang,
                        list_distinct(string_split(text, ' ')) AS tokset
                 FROM documents)
      SELECT d1, d2, jaccard FROM (
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.tokset, b.tokset))), 4)
                 AS jaccard
        FROM d a JOIN d b
          ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id)
      WHERE jaccard >= 0.8
      ORDER BY d1, d2""",
  )
}
