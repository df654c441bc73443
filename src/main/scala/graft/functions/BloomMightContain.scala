package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe over a long column: the codegen'd
  * replacement for the per-row Scala UDF the bloom-prefiltered
  * contamination path (q65) used — a UDF breaks whole-stage codegen for
  * the entire filter stage, while this stays fused (same motivation as
  * Spark's internal `BloomFilterMightContain`, which is not public API;
  * reference loader.py has no sketch analog, this is extension surface).
  *
  * `right` must be a FOLDABLE binary column holding a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (`lit(bf.toByteArray)`);
  * the filter is deserialized ONCE per executor lifetime of the
  * expression (lazy val; codegen pins the deserialized object via
  * `addReferenceObj`), never per row. A bloom filter has no false
  * negatives, so `false` is certain and `true` means "probe further" —
  * the prefilter contract q65's oracle relies on.
  */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BIGINT probe, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable BINARY serialized filter")
    else if (right.eval(null) == null)
      // caught here, not in the lazy deserialization: a NULL binary
      // literal is foldable and BinaryType, and would otherwise NPE
      // inside readFrom during planning instead of failing analysis
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a non-NULL serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  /** Deserialized once; the foldable child makes this deterministic. */
  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(probe: Any, _bytes: Any): Any =
    filter.mightContainLong(probe.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (probe, _) =>
      s"${ev.value} = $bfRef.mightContainLong($probe);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}
