package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One implemented operator family from SURVEY.md §2.B.
  *
  * `queries` keys become `SparkEntry.queries` entries; `oracle` holds the
  * DuckDB-equivalent SQL for every key that is SQL-expressible (driver
  * hash-compares result parquet vs the oracle result at sf0.01). Keys
  * without an oracle entry get a weaker rows-only check.
  *
  * Contract rules (SURVEY.md §5.2):
  *  - every oracle-checked query ends in an explicit ORDER BY over a
  *    unique key, in BOTH the Spark plan and the SQL;
  *  - doubles rounded via Norm.r4 / round(x, 4);
  *  - column names identical on both sides (driver sorts by name, then
  *    hashes values).
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
