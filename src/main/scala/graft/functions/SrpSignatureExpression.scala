package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `srp_signature(array<float|double>, bits) → long`: the sign-quantized
  * (binary) embedding signature — bit j is the sign of the projection onto
  * deterministic hyperplane j (the [[graft.scale.Similarity.srpBucket]]
  * weight family widened to ≤ 60 planes). The 1-bit-per-dimension extreme
  * of the quantized-index spectrum (int8 → PQ codes → signs): 60 bits per
  * vector instead of D·32, searched by pure integer Hamming distance.
  *
  * A native codegen expression for the same reason as [[VectorDot]]: the
  * HOF formulation is `bits` interpreted `aggregate∘zip_with` passes per
  * row; this is ONE fused primitive loop inside whole-stage codegen,
  * bit-identical by property test (VectorHashProps). Null element or null
  * array → null, the kernel poisoning contract. */
case class SrpSignature(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 60,
    s"bits must be in 1..60 (2j+1 must stay below the 127 modulus): $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_signature expects array<float|double>, got " +
        other.catalogString)
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_signature"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.srpSignature(input.asInstanceOf[ArrayData], bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |java.lang.Long $r = graft.functions.VectorKernels.srpSignature(
         |  $c, $bits, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  def apply(vec: Column, bits: Int): Column =
    Bridge.column(SrpSignature(Bridge.expression(vec), bits))
}
