package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** tokenize_pos(text) → rows of (pos, token) — a custom Generator
  * (UDTF surface, SURVEY.md §2.B). Built-in explode(split(...)) covers
  * plain tokenization; this demonstrates the whole-row-generator
  * extension point with positional output in one pass (no
  * posexplode(split(...)) double materialization of the token array).
  *
  * Generators run in GenerateExec outside codegen (CodegenFallback is
  * the norm for generators — the row fan-out itself isn't fusible).
  */
case class TokenizePos(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      s.split(' ').foreach { t =>
        if (t.nonEmpty) {
          out += InternalRow(i, UTF8String.fromString(t))
          i += 1
        }
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizePos =
    copy(child = newChild)
}
