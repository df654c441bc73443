package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH bucket of a float vector: 8 sign bits, one per
  * deterministic hyperplane. Hyperplane component (i,j) is
  * ((i·dim + j)·2654435761 mod 2^32)/2^32 − 0.5 — the same closed form the
  * DuckDB oracle evaluates, and division by 2^32 is exact in binary, so
  * projections are bit-identical across engines and against the
  * declarative `aggregate(sequence…)` form this replaces (left fold over
  * j in index order).
  */
case class LshBucket(child: Expression, planes: Int = 8)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires array<float>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < planes) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val h = ((i.toLong * n + j) * 2654435761L) % 4294967296L
        acc += v.getFloat(j).toDouble * (h.toDouble / 4294967296.0 - 0.5)
        j += 1
      }
      if (acc > 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bucket = ctx.freshName("bucket")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
        long $bucket = 0L;
        int $n = $v.numElements();
        for (int $i = 0; $i < $planes; $i++) {
          double $acc = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            long $h = (((long) $i * $n + $j) * 2654435761L) % 4294967296L;
            $acc += (double) $v.getFloat($j)
              * ((double) $h / 4294967296.0 - 0.5);
          }
          if ($acc > 0) $bucket |= (1L << $i);
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
