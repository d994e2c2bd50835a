package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector scalar expressions (SURVEY.md §4.3's optional cosine
  * fast path, promoted to default): `zip_with` + `aggregate` is correct
  * but builds an intermediate array and evaluates interpreted lambdas
  * per element; these fuse a tight primitive loop into
  * WholeStageCodegen. Numeric/null semantics are bit-identical to the
  * fold form (see [[VectorKernels]]), so the DuckDB oracle results are
  * unchanged.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  /** Fully-qualified kernel call, e.g.
    * `graft.functions.VectorKernels.dotBoxed`.
    */
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecres")
      s"""
         |java.lang.Double $tmp = $kernel($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
}

/** dot_arrays(a, b): sequential-fold dot product. */
case class DotArrays(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_arrays"
  override protected def kernel: String =
    "graft.functions.VectorKernels.dotBoxed"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotBoxed(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotArrays =
    copy(left = newLeft, right = newRight)
}

/** cosine_sim(a, b): one-pass cosine similarity. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernel: String =
    "graft.functions.VectorKernels.cosineBoxed"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineBoxed(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
