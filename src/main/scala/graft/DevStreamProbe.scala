package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev-only probe: where does a streaming drain's fixed cost go? */
object DevStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(
      "spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")

    def drain(name: String, parts: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val q = mk.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation",
          s"/dev/shm/graft-drain-ckpt/$name-${java.util.UUID.randomUUID()}")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.sql(s"select count(*) from $name").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // 1. minimal stateless drain: readStream -> project -> memory
    for (i <- 1 to 3) {
      val t = drain(s"probe_min_$i", "8") {
        graft.streaming.Streams.eventsFileStream(spark, sfDir)
          .select("event_id", "event_type")
      }
      println(f"[sprobe] minimal_stateless run$i=$t%.3f")
    }

    // 1b. decrypt pipeline components
    val dek = "0123456789abcdef".getBytes("UTF-8")
    val kek = "kek-graft-000001".getBytes("UTF-8")
    def src0 = graft.streaming.Streams.eventsFileStream(spark, sfDir)
      .select(col("event_id").as("id"), col("ts"),
        col("event_type"), col("value"))
    for (i <- 1 to 2) {
      val t = drain(s"probe_enc_$i", "4") {
        graft.streaming.Streams.encryptMessages(src0, dek, kek)
      }
      println(f"[sprobe] encrypt_only run$i=$t%.3f")
    }
    for (i <- 1 to 2) {
      val t = drain(s"probe_encdec_$i", "4") {
        import graft.api.ops._
        graft.streaming.Streams.encryptMessages(src0, dek, kek)
          .openEnvelope(kek)
          .filter(col("verified"))
          .select(col("id"), col("ts"))
      }
      println(f"[sprobe] encrypt_decrypt_stateless run$i=$t%.3f")
    }
    for (i <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val t0 = System.nanoTime()
      val q = src0.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(s"probe_agg_$i")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation",
          s"/dev/shm/graft-drain-ckpt/pa$i-${java.util.UUID.randomUUID()}")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      println(f"[sprobe] windowed_agg_only run$i=${(System.nanoTime()-t0)/1e9}%.3f")
    }

    for (i <- 1 to 2) {
      val t = drain(s"probe_encdec_rep_$i", "8") {
        import graft.api.ops._
        graft.streaming.Streams.encryptMessages(
            src0.repartition(8, col("id")), dek, kek)
          .openEnvelope(kek)
          .filter(col("verified"))
          .select(col("id"), col("ts"))
      }
      println(f"[sprobe] encdec_repartition8 run$i=$t%.3f")
    }

    // batch twin of the encdec pipeline
    {
      import graft.api.ops._
      def bsrc = graft.Tables(spark, sfDir, "events")
        .select(col("event_id").as("id"), col("ts"),
          col("event_type"), col("value"))
      def bq = graft.streaming.Streams.encryptMessages(bsrc, dek, kek)
        .openEnvelope(kek)
        .filter(col("verified"))
        .select(col("id"), col("ts"))
      bq.count()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); bq.count()
        println(f"[sprobe] encdec_BATCH run$i=${(System.nanoTime()-t0)/1e9}%.3f")
      }
      // scaling probe: same pipeline at sf0.01 (10x fewer rows)
      def bsrc2 = graft.Tables(spark, "/root/testdata/sf0.01", "events")
        .select(col("event_id").as("id"), col("ts"),
          col("event_type"), col("value"))
      def bq2 = graft.streaming.Streams.encryptMessages(bsrc2, dek, kek)
        .openEnvelope(kek)
        .filter(col("verified"))
        .select(col("id"), col("ts"))
      bq2.count()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); bq2.count()
        println(f"[sprobe] encdec_BATCH_sf001 run$i=${(System.nanoTime()-t0)/1e9}%.3f")
      }
      // parallel scaling: repartition(16) before crypto at sf0.1
      def bq3 = graft.streaming.Streams.encryptMessages(
          bsrc.repartition(16), dek, kek)
        .openEnvelope(kek)
        .filter(col("verified"))
        .select(col("id"), col("ts"))
      bq3.count()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); bq3.count()
        println(f"[sprobe] encdec_BATCH_rep16 run$i=${(System.nanoTime()-t0)/1e9}%.3f")
      }
    }

    // 2. stream-stream join at varying partitions
    for (p <- Seq("8", "4", "2"); i <- 1 to 2) {
      val t = drain(s"probe_join_${p}_$i", p) {
        graft.streaming.Streams.clickPurchaseJoin(
          graft.streaming.Streams.eventsFileStream(spark, sfDir),
          graft.streaming.Streams.eventsFileStream(spark, sfDir))
          .select("click_id", "purchase_id", "c_user")
      }
      println(f"[sprobe] join parts=$p run$i=$t%.3f")
    }
    // no-data micro-batch cost on the floor + inner join
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    for (i <- 1 to 3) {
      val t = drain(s"probe_min_nd_$i", "8") {
        graft.streaming.Streams.eventsFileStream(spark, sfDir)
          .select("event_id", "event_type")
      }
      println(f"[sprobe] minimal_noNoData run$i=$t%.3f")
    }
    for (i <- 1 to 2) {
      val t = drain(s"probe_join_nd_$i", "4") {
        graft.streaming.Streams.clickPurchaseJoin(
          graft.streaming.Streams.eventsFileStream(spark, sfDir),
          graft.streaming.Streams.eventsFileStream(spark, sfDir))
          .select("click_id", "purchase_id", "c_user")
      }
      val n = spark.sql(s"select count(*) from probe_join_nd_$i").collect()(0).getLong(0)
      println(f"[sprobe] join_noNoData run$i=$t%.3f rows=$n")
    }
    {
      // progress breakdown of a minimal drain
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q = graft.streaming.Streams.eventsFileStream(spark, sfDir)
        .select("event_id", "event_type")
        .writeStream.format("memory").queryName("probe_prog")
        .outputMode(OutputMode.Append())
        .option("checkpointLocation",
          s"/dev/shm/graft-drain-ckpt/prog-${java.util.UUID.randomUUID()}")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.foreach { p =>
        println(s"[sprobe] progress batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    for (i <- 1 to 1) {
      val t = drain(s"probe_join_nd2_$i", "4") {
        graft.streaming.Streams.clickPurchaseJoin(
          graft.streaming.Streams.eventsFileStream(spark, sfDir),
          graft.streaming.Streams.eventsFileStream(spark, sfDir))
          .select("click_id", "purchase_id", "c_user")
      }
      val n = spark.sql(s"select count(*) from probe_join_nd2_$i").collect()(0).getLong(0)
      println(f"[sprobe] join_withNoData run$i=$t%.3f rows=$n")
    }
    spark.stop()
  }
}
