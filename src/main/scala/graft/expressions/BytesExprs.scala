package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** One-pass byte-array kernels.
  *
  * [[BinaryConcatExpr]] replaces the `aggregate(arr, X'', concat)`
  * fold the WARC/WET fixture builders used: that fold re-allocates and
  * re-copies the growing accumulator on every step — O(n²) bytes
  * copied per group (measured as the 1-2.5 s fixture stages of
  * q_corpus_build / q_warc_extract at sf0.1). The kernel sums lengths
  * and copies each element exactly once. Concatenation is associative,
  * so values are byte-identical (parity-pinned).
  */
object BytesKernels {
  /** Concatenation of all elements; null elements contribute nothing
    * iff absent — the fixture arrays are containsNull-free, and a null
    * element makes the SQL fold's accumulator null, so the kernel
    * mirrors that: any null element → null result.
    */
  def concatAll(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      total += arr.getBinary(i).length
      i += 1
    }
    val out = new Array[Byte](total.toInt)
    var off = 0
    i = 0
    while (i < n) {
      val b = arr.getBinary(i)
      System.arraycopy(b, 0, out, off, b.length)
      off += b.length
      i += 1
    }
    out
  }
}

case class BinaryConcatExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "concat_binaries_native"
  override def dataType: DataType = BinaryType
  // The kernel yields null for a null ELEMENT even when the array
  // itself is non-nullable; without this override nullable follows
  // child.nullable, and over a non-nullable child (collect_list)
  // nullSafeCodeGen emits `false = ...` for the resultCode's isNull
  // assignment — a Janino compile failure and a silent interpreted
  // fallback for the whole WholeStageCodegen subtree.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<binary>, got ${other.simpleString}")
    }
  override def nullSafeEval(arr: Any): Any =
    BytesKernels.concatAll(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = graft.expressions.BytesKernels.concatAll($a);
        ${ev.isNull} = ${ev.value} == null;
      """
    })
  override protected def withNewChildInternal(c: Expression): BinaryConcatExpr =
    copy(child = c)
}

object BytesExprs {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "concat_binaries_native" -> (es => BinaryConcatExpr(es(0))),
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Session-extension hook (see [[GraftExtensions]]). */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[BytesKernels.type].getName, name),
        builder))
    }

  def registerOnLiveSession(): Unit =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .foreach(register)

  def concatBinaries(arr: Column): Column = {
    registerOnLiveSession()
    call_function("concat_binaries_native", arr)
  }
}
