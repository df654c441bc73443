package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `pos_tokens(text)` — a native GENERATOR (the table-function extension
  * point, completing the scalar-Expression / typed-Aggregator / Generator
  * trio): emits one (pos, tok) row per whitespace token of `text`, in a
  * single pass over the utf-8 bytes.
  *
  * Semantics are EXACTLY `posexplode(split(text, ' '))` with Spark's
  * limit=-1 (empty tokens kept, including the trailing one; empty text →
  * one empty token at pos 0; NULL text → zero rows) — NativeExprSpec pins
  * the parity on the corpus plus the edge cases. The win is allocation
  * shape, not semantics: the declarative form materializes the full token
  * ARRAY per row before the generate; this streams tokens straight out of
  * the byte scan — the positional-postings builder (q187's phrase index,
  * the tf/df families) never allocates the intermediate array.
  *
  * Generators execute in `GenerateExec` outside whole-stage codegen
  * (same as any non-builtin generator), so `CodegenFallback` costs
  * nothing extra here; the per-row work is the byte scan itself.
  */
case class PosTokensGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("tok", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pos_tokens needs a string argument, got ${child.dataType.sql}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val bytes = v.asInstanceOf[UTF8String].getBytes
    new Iterator[InternalRow] {
      private var start = 0
      private var pos = 0
      private var exhausted = false
      override def hasNext: Boolean = !exhausted
      override def next(): InternalRow = {
        var i = start
        while (i < bytes.length && bytes(i) != ' ') i += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val row = new GenericInternalRow(Array[Any](pos, tok))
        pos += 1
        if (i >= bytes.length) exhausted = true else start = i + 1
        row
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): PosTokensGen = copy(child = newChild)
}
