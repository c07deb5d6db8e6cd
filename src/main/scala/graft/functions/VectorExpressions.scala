package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * Why an Expression and not a UDF or `zip_with`+`aggregate`: higher-
  * order lambdas and Scala UDFs run interpreted per element — each of
  * the 64 multiply-adds pays boxing/closure overhead and breaks the
  * surrounding whole-stage-codegen span. This expression emits a tight
  * primitive `for` loop straight into the generated Java, so a
  * similarity scan stays one fused codegen stage end to end. The
  * interpreted path (`nullSafeEval`) is the exact same fold, used only
  * where codegen is disabled.
  *
  * Accumulation is a left-to-right double fold in array order —
  * bit-identical to the `aggregate(zip_with(...))` spelling it replaces,
  * so oracle results are unchanged.
  */
case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_f expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  private val dotFIdent = FunctionIdentifier("dot_f")

  /** Idempotently register `dot_f` in the session's function registry so
    * both the Column API and SQL text can use it. Query functions call
    * this on entry — the driver contract hands them an arbitrary
    * session, so registration cannot assume a session-build hook.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotFIdent)) {
      registry.registerFunction(
        dotFIdent,
        new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"dot_f expects exactly 2 arguments, got ${children.length}")
          DotProductF(children(0), children(1))
        })
    }
  }

  /** Column-API entry point: `dotF(spark)($"a", $"b")`. */
  def dotF(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("dot_f", a, b)
  }
}
