package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature (32 longs) over a shingle-hash array in one primitive
  * pass: permutation i is h → (A(i)·h + B(i)) mod P with P = 2^31−1,
  * A(i) = 1103515245·(i+1) mod P, B(i) = (12345 + 2654435761·i) mod P —
  * the exact closed form of the declarative fold it replaces
  * (LlmKit.minhashSigDeclarative, kept as the parity-spec reference) and of
  * the DuckDB oracle rendering, so values are identical bit for bit.
  *
  * Why native: the declarative fold re-materializes a 32-element
  * accumulator ARRAY per input element (interpreted HigherOrderFunction,
  * one boxed array per shingle per row). Here the 32 running minima live in
  * a primitive long[] and each element costs 32 multiply-mod ops — this is
  * the hot inner loop of the whole LSH family (q27/q45/q47).
  *
  * A(i)·h ≤ (P−1)² < 2^62, so the arithmetic never overflows a long —
  * the same bound the oracle SQL relies on (LlmKit scaladoc).
  */
object MinhashSig {
  val P = 2147483647L
  val N = 32
  private val A = Array.tabulate(N)(i => (1103515245L * (i + 1)) % P)
  private val B = Array.tabulate(N)(i => (12345L + 2654435761L * i) % P)

  /** Static entry point shared by interpreted eval and codegen. A null
    * element updates nothing — the same as the declarative fold, where the
    * permuted value is null and `least` skips nulls. */
  def compute(hs: ArrayData): ArrayData = {
    val out = Array.fill(N)(P)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < N) {
          val v = (A(i) * h + B(i)) % P
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class MinhashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}
