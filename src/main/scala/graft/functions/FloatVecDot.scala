package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float vectors, computed in double, sequentially in
  * index order — so the result is bit-identical to a left-fold
  * `(0.0 + a0*b0) + a1*b1 + …` in any engine (the DuckDB oracle mirrors
  * it with list_reduce).
  *
  * This is the preference-order (b) case of the build rules: the
  * operation is a scalar expression Spark lacks (HOF `aggregate ∘
  * zip_with` computes it but interpreted, with per-element boxing — far
  * too slow for the O(n²) similarity pair loop). `doGenCode` emits a
  * tight primitive loop that runs inside WholeStageCodegen.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers pass ArrayType(FloatType) columns; enforced at analysis time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val fa = a.asInstanceOf[ArrayData].toFloatArray()
    val fb = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(fa.length, fb.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += fa(i).toDouble * fb(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val fa = ctx.freshName("fa")
      val fb = ctx.freshName("fb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |float[] $fa = $a.toFloatArray();
         |float[] $fb = $b.toFloatArray();
         |int $n = Math.min($fa.length, $fb.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $fa[$i] * (double) $fb[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object FloatVecDot {
  /** Idempotently register `vec_dot` in the session's function registry
    * so operators can use it via expr("vec_dot(a, b)").
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => {
        graft.GraftExtensions.checkArity(
          "vec_dot", "vec_dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>)", 2, exprs)
        FloatVecDot(exprs.head, exprs(1))
      }, "scala_udf")
}
