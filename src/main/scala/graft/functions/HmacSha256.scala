package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** hmac_sha256(key: BINARY, data: BINARY): BINARY — custom Catalyst
  * expression (SURVEY.md §4.3: Spark 4.1 ships Aes* expressions but no
  * Hmac*, so the reference pipeline's signature check needs this one
  * custom scalar).
  *
  * Implemented as a BinaryExpression with doGenCode so it fuses into
  * WholeStageCodegen like a built-in — a Scala udf() here would break
  * the codegen span and box every row on a 100 TB scan.
  */
case class HmacSha256(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"hmac_sha256 requires (BINARY, BINARY), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hmac_sha256"

  override protected def nullSafeEval(key: Any, data: Any): Any =
    CryptoCodecs.hmacSha256(
      key.asInstanceOf[Array[Byte]], data.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (k, d) => s"graft.functions.CryptoCodecs.hmacSha256($k, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HmacSha256 =
    copy(left = newLeft, right = newRight)
}
