package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `sql2(array<float|double>, array<float|double>) → double` squared-L2
  * distance as a native codegen expression — the assignment kernel under
  * k-means E-steps, PQ codebook training/encoding and ADC lookup tables.
  * Like [[VectorDot]], it replaces an `aggregate∘zip_with` HOF chain that
  * runs its lambdas interpreted per element and materializes the zipped
  * difference array per pair; one fused primitive loop, bit-identical to
  * the fold by property test ([[graft.FunctionsSpec]]).
  *
  * Nullable even for non-null inputs: ragged lengths or a null element
  * yield null, exactly like the HOF fold. */
case class VectorSqL2(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vector_sql2 expects array<float|double> args, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_sql2"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sql2")
      s"""
         |java.lang.Double $r = graft.functions.VectorKernels.sqL2(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqL2 =
    copy(left = newLeft, right = newRight)
}

object VectorSqL2 {
  def apply(a: Column, b: Column): Column =
    Bridge.column(VectorSqL2(Bridge.expression(a), Bridge.expression(b)))
}
