package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter sketch: the map-only
  * half of set exclusion at corpus scale. The filter ships inside the
  * expression as its serialized bytes (a few KB-MB for millions of keys —
  * the same order as a broadcast hash relation's key set) and is
  * deserialized once per executor on first use; each row then costs a few
  * hash probes, inside the whole-stage-codegen span, with no join, no
  * shuffle, and no per-row allocation.
  *
  * False positives are possible by construction (rate set at build time);
  * callers that need exactness re-verify ONLY the probe-positive rows
  * against the real key set (see Dedup.excludeByBloom).
  */
case class BloomContainsExpr(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires bigint, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Exposed for generated code. */
  def contains(id: Long): Boolean = bf.mightContainLong(id)

  override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomContainsExpr].getName)
    nullSafeCodeGen(ctx, ev, id => s"${ev.value} = $self.contains($id);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}
