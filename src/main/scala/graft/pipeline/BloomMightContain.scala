package graft.pipeline

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a broadcast Bloom-filter corpus
  * fingerprint: `child` is a 64-bit content hash (xxhash64), the filter
  * travels once per executor as serialized bytes and is deserialized
  * lazily into a per-task slot — never into the plan string. Codegen'd,
  * so the probe fuses into the scan's whole-stage pipeline.
  *
  * No false negatives (a "not seen" verdict is always safe to keep);
  * false-positive rate is the filter's configured `fpp`.
  */
case class BloomMightContain(
    child: Expression, // long hash of the content
    bcFilter: Broadcast[Array[Byte]],
) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bloom probe needs a long hash input")

  @transient private lazy val filter: BloomFilter =
    BloomMightContain.deserialize(bcFilter.value)

  override def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcFilter", bcFilter,
      classOf[Broadcast[Array[Byte]]].getName)
    val helper = BloomMightContain.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val filterVar = ctx.addMutableState(classOf[BloomFilter].getName, "bloom",
      v => s"$v = $helper.deserialize((byte[]) $bcRef.value());")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = $filterVar.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
