package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GeoFunctions

/** P7 as a NATIVE Catalyst expression with `doGenCode`: the generated
  * Java calls `GeoFunctions.processGeometry` directly (a static
  * forwarder on the Scala object), so the per-row cost is the Jackson
  * work itself — no Scala-UDF closure dispatch, no
  * catalyst↔external-type conversion round trip, and the projection
  * stays inside one WholeStageCodegen span instead of breaking it the
  * way a `ScalaUDF` node does.
  *
  * Semantics are identical to `GeoFunctions.process_geometry` (the UDF
  * form is kept for `spark.udf.register`-style SQL use); null inputs →
  * null via BinaryExpression's default null handling, matching UDF
  * behavior.
  */
case class ProcessGeometryExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "process_geometry_native"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(feature: Any, layer: Any): Any =
    UTF8String.fromString(GeoFunctions.processGeometry(
      feature.asInstanceOf[UTF8String].toString,
      layer.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, l) =>
      s"UTF8String.fromString(graft.functions.GeoFunctions.processGeometry($f.toString(), $l.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProcessGeometryExpr =
    copy(left = newLeft, right = newRight)
}

object ProcessGeometryExpr {

  /** Column API over the native expression (resolved through the
    * session's function registry — call `register(spark)` once).
    */
  def process_geometry_native(feature: Column, layer: Column): Column =
    call_function("process_geometry_native", feature, layer)

  /** Register as a SQL-callable function on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "process_geometry_native",
      exprs => ProcessGeometryExpr(exprs(0), exprs(1)), "built-in")
}
