package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression for the reference's nested-literal parse (SURVEY.md
  * §2.2 P-10, reference loader.py:146/154/175/197/207/258/270/302): converts
  * a Python-literal cell to canonical JSON so `from_json` can finish the job
  * with an explicit schema.
  *
  * A native expression (not a Scala UDF) so the call stays inside
  * whole-stage codegen: `doGenCode` emits a direct static call on
  * [[PyLiteral]] — no encoder round-trip, no closure serialization, and the
  * surrounding project/filter pipeline stays fused.
  *
  * NULL contract: NULL in → NULL out; malformed literal → NULL (the
  * reference's skip-bad-row-and-keep-going policy, SURVEY.md §7.4.1).
  */
case class PyToJson(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_to_json requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "py_to_json"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PyLiteral.toJsonUTF8(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val utf8 = classOf[UTF8String].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $utf8 ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.parse.PyLiteral.toJsonUTF8(${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PyToJson =
    copy(child = newChild)
}
