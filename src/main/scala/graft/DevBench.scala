package graft
import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: time a comma-separated subset of
  * SparkEntry.queries (min of SPARK_GRAFT_BENCH_RUNS, default 3) at
  * SPARK_GRAFT_SF_DIR. Same session shape as Bench; not driver-run.
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[devbench] $n WARMUP FAILED: $e") }
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devbench] $n min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
