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

  /** events.ts is parquet timestamp[ns], which Spark's vectorized reader
    * rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long and convert to a
    * microsecond TimestampType with exact integer arithmetic (`div`, not
    * `/` — the ns values exceed 2^53 so double division would corrupt).
    * The DuckDB oracle keeps full ns precision; every query therefore
    * only outputs second-precision strings / hour-level buckets, where
    * the truncation is invisible.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string; avoids engine-level
    * timestamp encoding differences in the compare. Oracle twin:
    * strftime(ts, '%Y-%m-%d %H:%M:%S').
    */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Date-only string. Oracle twin: strftime(ts, '%Y-%m-%d'). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
