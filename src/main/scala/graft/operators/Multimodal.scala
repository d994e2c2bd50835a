package graft.operators

import graft.{Norm, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (builder-prompt LLM surface): media as
  * opaque BINARY columns with typed metadata, a decode/feature-extract
  * stage, and frame sampling.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (see [[MediaDecode.decodeStub]]);
  * the Spark-side plumbing — binary column synthesis, metadata struct,
  * typed mapPartitions with batch-at-a-time iteration, explode-based
  * frame sampling — is real and oracle-tested. Swapping the stub for a
  * JNI/codec call changes no plan shape.
  *
  * Scale notes: media bytes never shuffle — every query is a per-row
  * map over the scan (frame sampling explodes ≤4 rows before any agg).
  * mapPartitions iterates lazily, so one partition holds one batch of
  * decoded features, not the whole partition's media, in memory.
  */
object Multimodal extends QueryModule {

  /** Synthesized media table: documents.text bytes stand in for an
    * opaque media payload, with typed metadata derived per row.
    */
  private[operators] def media(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          ((col("n_chars") * 7) % 480).cast("int").as("height"),
          when(col("lang") === "en", "png").otherwise("jpeg").as("format"))
          .as("meta"))

  /** Metadata + cheap byte-level features, no decode. */
  val multimodalFeatures: Q = (spark, dir) => {
    media(spark, dir)
      .select(col("doc_id"),
        octet_length(col("media")).as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"),
        lower(hex(substring(col("media"), 1, 8))).as("head_hex"))
      .orderBy("doc_id")
  }

  /** Frame sampling: n_frames = n_bytes % 4 + 1 fixed-stride samples,
    * each an 8-byte slice of the payload — explode + per-row slicing,
    * the plan shape of real video frame extraction.
    */
  val multimodalFrames: Q = (spark, dir) => {
    media(spark, dir)
      .withColumn("frame_id",
        explode(sequence(lit(0), octet_length(col("media")) % 4)))
      .select(col("doc_id"), col("frame_id"),
        lower(hex(expr("substring(media, frame_id * 8 + 1, 8)")))
          .as("frame_hex"))
      .orderBy("doc_id", "frame_id")
  }

  /** Decode + feature extraction through typed mapPartitions — the
    * imperative per-partition escape hatch a real codec needs.
    * Features are deterministic byte statistics so the DuckDB oracle
    * can recompute them from the text.
    */
  val multimodalDecode: Q = (spark, dir) => {
    MediaDecode.decodeFeatures(media(spark, dir))
      .select(col("doc_id"), col("n_bytes_scanned"),
        Norm.r4(col("brightness")).as("brightness"),
        col("min_byte"), col("max_byte"))
      .orderBy("doc_id")
  }

  /** Resize through the same typed mapPartitions path as decode — the
    * STUB kernel stride-samples every 2nd payload byte (a real scaler
    * slots in unchanged); output is the new size + a checksum the
    * oracle can recompute.
    */
  val multimodalResize: Q = (spark, dir) => {
    MediaDecode.resizeHalf(media(spark, dir))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> multimodalFeatures,
    "q_multimodal_frames" -> multimodalFrames,
    "q_multimodal_decode" -> multimodalDecode,
    "q_multimodal_resize" -> multimodalResize,
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_features" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             CAST(n_chars % 640 AS INT) AS width,
             CAST((n_chars * 7) % 480 AS INT) AS height,
             CASE WHEN lang = 'en' THEN 'png' ELSE 'jpeg' END AS format,
             lower(substring(hex(encode(text)), 1, 16)) AS head_hex
      FROM documents
      ORDER BY doc_id""",
    "q_multimodal_frames" -> """
      SELECT doc_id, CAST(fid AS INT) AS frame_id,
             lower(substring(hex(encode(text)), CAST(fid AS INT) * 16 + 1, 16))
               AS frame_hex
      FROM (SELECT doc_id, text,
                   unnest(generate_series(0, octet_length(encode(text)) % 4))
                     AS fid
            FROM documents)
      ORDER BY doc_id, frame_id""",
    "q_multimodal_resize" -> """
      WITH b AS (
        SELECT doc_id, text,
               unnest(generate_series(1, length(text), 2)) AS pos
        FROM documents)
      SELECT doc_id,
             CAST(count(*) AS INT) AS n_bytes_out,
             CAST(sum(unicode(substring(text, CAST(pos AS INT), 1)))
               % 1000000007 AS BIGINT) AS checksum
      FROM b
      GROUP BY doc_id
      ORDER BY doc_id""",
    "q_multimodal_decode" -> """
      WITH b AS (
        SELECT doc_id, text,
               unnest(generate_series(1, least(32, length(text)))) AS pos
        FROM documents)
      SELECT doc_id,
             CAST(count(*) AS INT) AS n_bytes_scanned,
             round(avg(unicode(substring(text, CAST(pos AS INT), 1))), 4)
               AS brightness,
             CAST(min(unicode(substring(text, CAST(pos AS INT), 1))) AS INT)
               AS min_byte,
             CAST(max(unicode(substring(text, CAST(pos AS INT), 1))) AS INT)
               AS max_byte
      FROM b
      GROUP BY doc_id
      ORDER BY doc_id""",
  )
}

/** The decode stage. In production this would bind an image/audio
  * codec; here the kernel is a DETERMINISTIC STUB over the raw bytes
  * (byte statistics of the first 32 bytes), keeping the partition
  * iteration, row shape, and encoder plumbing identical to the real
  * thing.
  */
object MediaDecode {
  import org.apache.spark.sql.{Encoder, Encoders, Row}
  import org.apache.spark.sql.types._

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes_scanned", IntegerType, nullable = false),
    StructField("brightness", DoubleType, nullable = false),
    StructField("min_byte", IntegerType, nullable = false),
    StructField("max_byte", IntegerType, nullable = false)))

  /** STUB decode kernel: byte stats over the first 32 payload bytes.
    * A real decoder (JPEG/PNG/audio PCM) slots in here unchanged.
    * Returns the raw (unrounded) mean — rounding is applied engine-side
    * so its half-up semantics match the oracle's.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Double, Int, Int) = {
    val n = math.min(32, payload.length)
    var i = 0; var sum = 0L; var mn = 255; var mx = 0
    while (i < n) {
      val b = payload(i) & 0xff
      sum += b; if (b < mn) mn = b; if (b > mx) mx = b
      i += 1
    }
    (n, sum.toDouble / n, mn, mx)
  }

  def decodeFeatures(mediaDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val enc: Encoder[Row] = Encoders.row(outSchema)
    mediaDf.select("doc_id", "media").mapPartitions { it =>
      it.map { r =>
        val (n, bright, mn, mx) = decodeStub(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), n, bright, mn, mx)
      }
    }(enc)
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes_out", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB resize kernel: stride-sample every 2nd byte (a real bilinear
    * scaler replaces this body; partition iteration unchanged).
    */
  private def resizeStub(payload: Array[Byte]): (Int, Long) = {
    var i = 0; var n = 0; var sum = 0L
    while (i < payload.length) {
      sum += payload(i) & 0xff; n += 1; i += 2
    }
    (n, sum % 1000000007L)
  }

  def resizeHalf(mediaDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val enc: Encoder[Row] = Encoders.row(resizeSchema)
    mediaDf.select("doc_id", "media").mapPartitions { it =>
      it.map { r =>
        val (n, sum) = resizeStub(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), n, sum)
      }
    }(enc)
  }
}
