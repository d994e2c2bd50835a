package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only scratch probe for plan-shape experiments. Not driver-run. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    def base = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name min=${ts.map(_._1).min}%.3f rows=${ts.head._2}")
    }

    val edges = base.distinct()
    time("edges_distinct") { edges.count() }

    def sets = edges.groupBy("src")
      .agg(array_sort(collect_set(col("dst"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .withColumn("w",
        floor(lit(1000000.0) / log(size(col("ss")).cast("double")))
          .cast("long"))
    time("sets_collect") { sets.count() }

    // current shape: nested transform/slice/flatten HOF
    def cur = sets
      .select(col("w"),
        explode(flatten(transform(col("ss"), (x, i) =>
          transform(slice(col("ss"), i + lit(2), size(col("ss"))),
            y => struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("w"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_common"), sum("w").as("score_int"))
      .orderBy(col("score_int").desc, col("d1"), col("d2"))
      .limit(20)
    time("cur_hof") { cur.count() }

    // variant A: posexplode then explode(slice)
    def va = sets
      .select(col("w"), col("ss"),
        posexplode(col("ss")).as(Seq("i", "d1")))
      .select(col("w"), col("d1"),
        explode(slice(col("ss"), col("i") + lit(2),
          size(col("ss")))).as("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_common"), sum("w").as("score_int"))
      .orderBy(col("score_int").desc, col("d1"), col("d2"))
      .limit(20)
    time("va_posexplode") { va.count() }

    // variant C: self-join over a checkpointed edge list
    def vc = {
      val e0 = edges.localCheckpoint()
      val deg = e0.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2)
        .select(col("src"),
          floor(lit(1000000.0) / log(col("d").cast("double")))
            .cast("long").as("w"))
      val e1 = e0.select(col("src"), col("dst").as("d1"))
      val e2 = e0.select(col("src").as("src2"), col("dst").as("d2"))
      e1.join(e2, col("src") === col("src2") && col("d1") < col("d2"))
        .join(deg, "src")
        .groupBy("d1", "d2")
        .agg(count(lit(1)).as("n_common"), sum("w").as("score_int"))
        .orderBy(col("score_int").desc, col("d1"), col("d2"))
        .limit(20)
    }
    time("vc_checkpoint") { vc.count() }

    // variant B: codegen'd equi-self-join on src
    def vb = {
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2)
        .select(col("src"),
          floor(lit(1000000.0) / log(col("d").cast("double")))
            .cast("long").as("w"))
      val e1 = edges.select(col("src"), col("dst").as("d1"))
      val e2 = edges.select(col("src").as("src2"), col("dst").as("d2"))
      e1.join(e2, col("src") === col("src2") && col("d1") < col("d2"))
        .join(deg, "src")
        .groupBy("d1", "d2")
        .agg(count(lit(1)).as("n_common"), sum("w").as("score_int"))
        .orderBy(col("score_int").desc, col("d1"), col("d2"))
        .limit(20)
    }
    time("vb_selfjoin") { vb.count() }

    // cross-check results identical
    val a = cur.collect().map(_.toSeq).toSeq
    val b = va.collect().map(_.toSeq).toSeq
    val c = vb.collect().map(_.toSeq).toSeq
    println(s"[probe] va==cur: ${a == b}  vb==cur: ${a == c}")
    spark.stop()
  }
}
