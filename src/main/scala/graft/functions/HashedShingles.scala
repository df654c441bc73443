package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word-3-gram shingles of a text column, in one pass over the
  * utf-8 bytes: split on single spaces (keeping empty tokens, exactly like
  * `split(text, " ")` with Spark's limit=-1), hash each token (top 60 bits
  * of md5 = the engine-portable `strHash` contract, reduced mod P), then
  * combine consecutive token hashes as ((h1·31 + h2) mod P · 31 + h3)
  * mod P. Texts with < 3 tokens fall back to one whole-text hash.
  *
  * Value-identical to the declarative struct-state fold it replaces
  * (LlmKit.hashedShinglesDeclarative, kept as the parity-spec reference),
  * but with zero intermediate array allocations — the fold allocated one
  * accumulator array per token per row, which dominated GC in the LSH
  * query family.
  */
object HashedShingles {
  val P = 2147483647L

  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def hash60(md: java.security.MessageDigest, bytes: Array[Byte],
      from: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h >>> 4) % P // top 60 bits == first 15 hex chars of md5
  }

  /** Static entry point shared by interpreted eval and codegen. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val md = tlMd5.get()
    // token count = spaces + 1 (split keeps empties incl. trailing)
    var nTok = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nTok += 1
      i += 1
    }
    if (nTok < 3)
      return new GenericArrayData(
        Array(hash60(md, bytes, 0, bytes.length)))
    val th = new Array[Long](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        th(t) = hash60(md, bytes, start, i - start)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nTok - 2)
    var j = 0
    while (j < out.length) {
      out(j) = ((th(j) * 31 + th(j + 1)) % P * 31 + th(j + 2)) % P
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class HashedShinglesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedShingles.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}
