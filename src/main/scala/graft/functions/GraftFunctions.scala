package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Column-level API + SQL registration for the engine's custom
  * expressions and envelope-crypto helpers.
  *
  * Envelope scheme (reference semantics, SURVEY.md §1.1): a per-batch
  * DEK encrypts payloads; the DEK itself is wrapped by a KEK. The
  * reference wraps via a Cloud KMS RPC; this engine wraps locally with
  * deterministic AES-ECB so results stay oracle-checkable — wrap/unwrap
  * therefore *compose* the built-in aes_encrypt/aes_decrypt (Spark-first:
  * no custom expression where a built-in already expresses it).
  */
object GraftFunctions {

  /** HMAC-SHA256 of `data` keyed by `key` (both BINARY → BINARY). */
  def hmac_sha256(key: Column, data: Column): Column =
    Bridge.column(
      HmacSha256(Bridge.expression(key), Bridge.expression(data)))

  /** KMS-style key wrap, local + deterministic: AES-ECB(kek, dek). */
  def wrap_dek(kek: Column, dek: Column): Column =
    aes_encrypt(dek, kek, lit("ECB"))

  /** Inverse of wrap_dek. */
  def unwrap_dek(kek: Column, wrapped: Column): Column =
    aes_decrypt(wrapped, kek, lit("ECB"))

  /** SQL-name registration so `spark.sql("... hmac_sha256(k, d) ...")`
    * works; injectable via SparkSession.builder.withExtensions or
    * callable on an existing session.
    */
  def registerExtensions(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(hmacFunction)
  }

  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = hmacFunction
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  private val hmacFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hmac_sha256"),
    new ExpressionInfo(classOf[HmacSha256].getName, "hmac_sha256"),
    (children: Seq[Expression]) => HmacSha256(children(0), children(1)))
}
