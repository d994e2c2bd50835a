package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loader + output-normalization helpers shared by every query.
  *
  * All driver testdata is one parquet file per table under an sf dir
  * (TESTDATA.md). Loading goes through here so partition/pushdown config
  * stays in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as parquet timestamp[ns] in some testdata
    * generations and timestamp[us] in others, so dispatch on the type
    * Spark actually reads rather than assuming either:
    *  - timestamp[ns]: Spark's vectorized reader rejects it
    *    (PARQUET_TYPE_ILLEGAL); with `nanosAsLong` it surfaces as
    *    LongType nanos, which we convert to microsecond TimestampType
    *    with exact integer arithmetic (`div`, not `/` — ns values
    *    exceed 2^53 so double division would corrupt). The DuckDB
    *    oracle keeps full ns precision; every query only outputs
    *    second-precision strings / hour-level buckets, where the
    *    truncation is invisible.
    *  - timestamp[us] (isAdjustedToUTC=false): surfaces as
    *    TimestampNTZType; cast to TimestampType — value-identical
    *    because every session runs with spark.sql.session.timeZone=UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    normalizeTs(raw)
  }

  /** Normalize an events frame's `ts` column to TimestampType (µs),
    * whatever physical type the parquet footer declared. Shared by the
    * batch loader and the streaming file source. */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
}

/** Normalization helpers that keep oracle hash-compares stable
  * (SURVEY.md §5.2: round doubles to 4dp, format timestamps as UTC
  * strings, deterministic ORDER BY in every oracle-checked query).
  */
object Norm {
  /** Round to 4 decimal places as double — matches `round(x, 4)` in the
    * DuckDB oracle SQL. Always cast to double first so float32 inputs
    * (e.g. embedding elements) don't round in float space.
    */
  def r4(c: Column): Column = round(c.cast("double"), 4)

  /** Tie-proof 4dp rounding for NON-NEGATIVE doubles:
    * floor(x*1e4 + 0.5)/1e4 on the same IEEE double in both engines.
    * Use instead of [[r4]] whenever the value is an average (or any
    * quotient) that could land exactly on a .00005 tie — Spark `round`
    * is HALF_UP, DuckDB half-even, so a tie at the 4th decimal would
    * hash-mismatch; floor of the identical double cannot. Rounds
    * half-toward-+inf, which differs from round() for NEGATIVE inputs —
    * callers must guarantee c >= 0. Oracle twin:
    * floor(x * 10000 + 0.5) / 10000.
    */
  def r4tie(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  /** Deterministic 4dp rounding for SIGNED rank keys and outputs:
    * the same floor(x*1e4 + 0.5)/1e4 expression as [[r4tie]], but
    * documented for inputs of either sign (cosines in [-1, 1]). For
    * negatives it rounds half-toward-+inf rather than HALF_UP — fine
    * wherever the requirement is that both engines emit the IDENTICAL
    * double (rank ordering keys, audit outputs), not a specific
    * half-tie convention. Oracle twin: floor(x * 10000 + 0.5) / 10000.
    */
  def r4s(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  /** Sign-safe deterministic 4dp truncation: floor(x*1e4)/1e4 — rounds
    * toward -inf, so unlike [[r4tie]] it needs no non-negativity
    * precondition and unlike [[r4]] it has no half-way tie (floor is a
    * step function whose only sensitivity is an argument landing
    * exactly on an integer, which identical IEEE doubles on both
    * engines either both do or both don't). Use for signed outputs
    * (skewness, trend slopes, Flesch scores). Oracle twin:
    * floor(x * 10000) / 10000.
    */
  def r4dn(c: Column): Column = floor(c * 10000) / 10000

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string; avoids engine-level
    * timestamp encoding differences in the compare. Oracle twin:
    * strftime(ts, '%Y-%m-%d %H:%M:%S').
    */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Date-only string. Oracle twin: strftime(ts, '%Y-%m-%d'). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
