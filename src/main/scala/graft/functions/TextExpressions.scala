package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen expressions for the per-row text-quality kernels (entropy,
  * n-gram construction, repetition stats, token runs). Same design as
  * [[VectorHashExpressions]]: the HOF formulations in
  * [[graft.scale.TextAnalysis]] stay as the executable specification;
  * these run the identical arithmetic as one fused loop inside whole-stage
  * codegen, property-tested bit-identical ([[graft.TextKernelProps]]). */
object TextExpressions {

  /** `string → double`: raw character-distribution entropy (un-rounded;
    * callers keep the round/empty guards). */
  case class CharEntropy(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_char_entropy"
    override def nullSafeEval(input: Any): Any =
      TextKernels.charEntropy(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charEntropy($c)")
    override protected def withNewChildInternal(newChild: Expression): CharEntropy =
      copy(child = newChild)
  }

  /** `array<string> → array<string>`: all word n-grams, space-joined. */
  case class NgramArray(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n > 1, "n-gram kernel needs n > 1 (n = 1 is the token array itself)")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_ngrams"
    override def nullSafeEval(input: Any): Any =
      TextKernels.ngramArray(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.ngramArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): NgramArray =
      copy(child = newChild)
  }

  /** `string → array<string>`: all character n-grams (code-point substr
    * semantics) in one O(len) byte pass. */
  case class CharNgramArray(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, "char n-gram kernel needs n >= 1")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_char_ngrams"
    override def nullSafeEval(input: Any): Any =
      TextKernels.charNgramArray(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charNgramArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): CharNgramArray =
      copy(child = newChild)
  }

  /** `array<string> → struct<dup_frac: double, top_frac: double>`: one
    * counting pass over the token array's n-grams. */
  case class NgramRepetition(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, "n must be positive")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = StructType(Seq(
      StructField("dup_frac", DoubleType, nullable = false),
      StructField("top_frac", DoubleType, nullable = false)))
    override def prettyName: String = "graft_ngram_repetition"
    override def nullSafeEval(input: Any): Any =
      TextKernels.ngramRepetition(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.ngramRepetition($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
      copy(child = newChild)
  }

  /** `array<string> → int`: longest consecutive equal-token run. */
  case class MaxTokenRun(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_max_token_run"
    override def nullSafeEval(input: Any): Any =
      TextKernels.maxTokenRun(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.maxTokenRun($c)")
    override protected def withNewChildInternal(newChild: Expression): MaxTokenRun =
      copy(child = newChild)
  }

  // ---- Column API ------------------------------------------------------

  def charEntropy(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))
  def ngramArray(toks: Column, n: Int): Column =
    Bridge.column(NgramArray(Bridge.expression(toks), n))
  def charNgramArray(text: Column, n: Int): Column =
    Bridge.column(CharNgramArray(Bridge.expression(text), n))
  def ngramRepetition(toks: Column, n: Int): Column =
    Bridge.column(NgramRepetition(Bridge.expression(toks), n))
  def maxTokenRun(toks: Column): Column =
    Bridge.column(MaxTokenRun(Bridge.expression(toks)))
}
