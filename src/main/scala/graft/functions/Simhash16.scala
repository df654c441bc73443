package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash of a text column in one pass over the utf-8 bytes:
  * split on single spaces (keeping empty tokens, exactly like
  * `split(text, " ")`), hash each token (top 60 bits of md5 — the
  * engine-portable `strHash` contract), accumulate ±1 per bit position
  * from the hash's low `bits` bits, emit the sign bits.
  *
  * Two widths share the token hash, so the 16-bit value is NOT a prefix
  * of the 60-bit one (each bit has its own counter, but the low 16
  * counters coincide — sign bits 0..15 agree across widths):
  *   - `bits = 16`: the compact signature the q28/q42 batch family and
  *     their DuckDB oracles reproduce declaratively;
  *   - `bits = 60` (the full strHash width): the streaming ingest dedup
  *     key — at 16 bits, distinct documents birthday-collide after a few
  *     hundred per watermark window and get silently dropped as
  *     near-dups (r14 ADVICE); at 60 bits the first expected collision
  *     sits near 2^30 distinct docs per window, while exact and
  *     minimally-edited re-posts still share a signature.
  *
  * `distinct = true` is the set SimHash (each distinct token string votes
  * once — `array_distinct` runs on the token STRINGS, before hashing,
  * matching q28's declarative form); `distinct = false` is the
  * TF-weighted variant (a token appearing k times votes k — q42 and the
  * streaming near-dup filter).
  *
  * Value-identical to the declarative HOF folds it replaces (kept in
  * LlmKit as the parity-spec references), but with primitive int[]
  * counters instead of one fresh array allocation per token per row.
  */
object Simhash16 {

  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Raw 60-bit token hash == conv(substr(md5(t),1,15),16,10) — NO mod P
    * (the shingle pipeline reduces mod P separately; SimHash uses the
    * raw low bits). */
  private def hash60(md: java.security.MessageDigest, bytes: Array[Byte],
      from: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    h >>> 4
  }

  /** Static entry point shared by interpreted eval and codegen. */
  def compute(s: UTF8String, distinct: Boolean, bits: Int): Long = {
    val bytes = s.getBytes
    val md = tlMd5.get()
    val seen =
      if (distinct) new java.util.HashSet[String]() else null
    val counters = new Array[Int](bits)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val take =
          if (distinct)
            // byte-exact token identity, matching array_distinct on strings
            seen.add(new String(bytes, start, i - start,
              java.nio.charset.StandardCharsets.ISO_8859_1))
          else true
        if (take) {
          val h = hash60(md, bytes, start, i - start)
          var j = 0
          while (j < bits) {
            counters(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counters(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** 16-bit entry point (kept for source compatibility with the parity
    * specs that call it directly). */
  def compute(s: UTF8String, distinct: Boolean): Long =
    compute(s, distinct, 16)
}

case class Simhash16Expr(child: Expression, distinct: Boolean,
    bits: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String =
    s"simhash$bits" + (if (distinct) "" else "_weighted")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    Simhash16.compute(input.asInstanceOf[UTF8String], distinct, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash16.compute($c, $distinct, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Simhash16Expr =
    copy(child = newChild)
}
