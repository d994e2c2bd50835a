package graft

import graft.functions.{CryptoCodecs, GraftFunctions}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Crypto kernels + expressions: RFC 4231 HMAC vectors, envelope
  * wrap/unwrap inverses, and GCM roundtrips (GCM is excluded from the
  * oracle path — random IV — so it is covered here).
  */
class CryptoSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("hmac_sha256 matches RFC 4231 test case 1") {
    val key = Array.fill[Byte](20)(0x0b)
    val out = CryptoCodecs.hmacSha256(key, "Hi There".getBytes("UTF-8"))
    assert(hex(out) ===
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
  }

  test("hmac_sha256 matches RFC 4231 test case 2") {
    val out = CryptoCodecs.hmacSha256("Jefe".getBytes("UTF-8"),
      "what do ya want for nothing?".getBytes("UTF-8"))
    assert(hex(out) ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("aes_ecb_encrypt/decrypt are bit-compatible with the built-in ECB mode") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // random payload lengths straddle the PKCS5 block boundary (0..48)
    val rows = (1 to 40).map { i =>
      (i, rnd.nextString(rnd.nextInt(49)),
        rnd.alphanumeric.take(16).mkString)
    }
    val df = rows.toDF("id", "payload", "key")
      .select(col("id"),
        GraftFunctions.aes_ecb_encrypt(col("payload").cast("binary"),
          col("key").cast("binary")).as("ours"),
        aes_encrypt(col("payload").cast("binary"),
          col("key").cast("binary"), lit("ECB")).as("builtin"))
    df.collect().foreach {
      case Row(id: Int, ours: Array[Byte], builtin: Array[Byte]) =>
        assert(ours === builtin, s"row $id ciphertext mismatch")
    }
    // roundtrip through OUR decrypt and through the built-in decrypt
    val rt = rows.toDF("id", "payload", "key")
      .select(col("payload"),
        GraftFunctions.aes_ecb_decrypt(
          GraftFunctions.aes_ecb_encrypt(col("payload").cast("binary"),
            col("key").cast("binary")),
          col("key").cast("binary")).cast("string").as("back"),
        aes_decrypt(
          GraftFunctions.aes_ecb_encrypt(col("payload").cast("binary"),
            col("key").cast("binary")),
          col("key").cast("binary"), lit("ECB"))
          .cast("string").as("back_builtin"))
    rt.collect().foreach {
      case Row(p: String, back: String, backB: String) =>
        assert(back === p); assert(backB === p)
    }
    // null in, null out (BinaryExpression null-safe contract)
    val n = Seq((Option.empty[Array[Byte]], "0123456789abcdef"))
      .toDF("payload", "key")
      .select(GraftFunctions.aes_ecb_encrypt(col("payload"),
        col("key").cast("binary")).as("ct")).collect()
    assert(n.head.isNullAt(0))
  }

  test("HmacSha256 expression agrees with kernel, via codegen plan") {
    import spark.implicits._
    val df = Seq(("k1", "hello"), ("k2", "world")).toDF("k", "v")
      .select(col("k"), col("v"),
        GraftFunctions.hmac_sha256(col("k").cast("binary"),
          col("v").cast("binary")).as("sig"))
    df.collect().foreach { case Row(k: String, v: String, sig: Array[Byte]) =>
      assert(sig === CryptoCodecs.hmacSha256(
        k.getBytes("UTF-8"), v.getBytes("UTF-8")))
    }
  }

  test("hmac_sha256 registered as SQL function via extensions") {
    val n = spark.sql(
      "SELECT hex(hmac_sha256(cast('Jefe' as binary), " +
        "cast('what do ya want for nothing?' as binary))) AS h")
      .collect().head.getString(0).toLowerCase
    assert(n ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("GCM encrypt/decrypt roundtrip over pseudo-random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val msgs = List.fill(100)(rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
    val df = msgs.toDF("m")
      .select(col("m"),
        aes_decrypt(
          aes_encrypt(col("m").cast("binary"),
            lit("0123456789abcdef".getBytes), lit("GCM")),
          lit("0123456789abcdef".getBytes), lit("GCM"))
          .cast("string").as("rt"))
    assert(df.filter(col("m") =!= col("rt")).count() === 0)
  }

  test("wrap_dek/unwrap_dek are inverses for 16/24/32-byte DEKs") {
    import spark.implicits._
    val deks = Seq(16, 24, 32).map(n => ("x" * n).getBytes("UTF-8"))
    val df = deks.toDF("dek")
      .select(col("dek"),
        GraftFunctions.unwrap_dek(lit("kek-graft-000001".getBytes),
          GraftFunctions.wrap_dek(lit("kek-graft-000001".getBytes),
            col("dek"))).as("rt"))
    df.collect().foreach { case Row(d: Array[Byte], rt: Array[Byte]) =>
      assert(d === rt)
    }
  }

  test("tampered payload fails hmac verification") {
    import spark.implicits._
    val df = Seq("payload-a").toDF("m")
      .select(
        GraftFunctions.hmac_sha256(lit("key0".getBytes),
          col("m").cast("binary")).as("sig"),
        GraftFunctions.hmac_sha256(lit("key0".getBytes),
          concat(col("m"), lit("x")).cast("binary")).as("sig_tampered"))
    val r = df.collect().head
    assert(!java.util.Arrays.equals(
      r.getAs[Array[Byte]]("sig"), r.getAs[Array[Byte]]("sig_tampered")))
  }
}
