package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(key: BIGINT): BOOLEAN — membership probe against
  * a pre-built [[org.apache.spark.util.sketch.BloomFilter]] carried as
  * serialized bytes inside the expression (SURVEY.md §4.3 pattern: a
  * custom scalar where Spark exposes no public equivalent — the
  * engine's own BloomFilterMightContain is optimizer-internal, only
  * injected by runtime row-level filtering).
  *
  * Used by `ops.bloomSemiJoin` as a scan-side pre-filter: rows whose
  * key cannot be in the build side are dropped at the probe scan,
  * BEFORE the join shuffle. False positives are possible (the later
  * equi-join removes them — results stay exact); false negatives are
  * not, so no qualifying row is ever lost.
  *
  * The filter deserializes lazily once per executor instance and codegen
  * references the deserialized object directly, so the hot path is one
  * virtual call per row inside WholeStageCodegen — no boxing, no UDF.
  */
case class BloomMightContain(child: Expression, serialized: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(serialized))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires BIGINT, got " +
          child.dataType.catalogString)
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(key: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
