package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions (with `doGenCode`) for the dedup hot paths.
  *
  * The built-in formulations of these kernels are higher-order-function
  * chains (`transform`+`md5`+`conv`, k × `array_min∘transform`, bits ×
  * `size∘filter`), and HOF lambdas are evaluated INTERPRETED per element —
  * the one part of the engine that was not codegen-friendly. Each expression
  * here participates in whole-stage codegen (generated code calls the static
  * [[HashKernels]] loop directly) and is proven bit-identical to the HOF
  * formulation by property tests (`FunctionsSpec`).
  *
  * Reference behavior reproduced: token/shingle hashing for MinHash
  * signatures (Broder '97) and SimHash nibble votes (Charikar '02) exactly
  * as specified in [[graft.scale.Dedup]].
  */
object VectorHashExpressions {

  /** `array<string>` → `array<long>`: first-4-bytes-of-MD5 per element. */
  case class HashTokens(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "graft_hash_tokens"
    override def nullSafeEval(input: Any): Any =
      HashKernels.hashTokens(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.hashTokens($c)")
    override protected def withNewChildInternal(newChild: Expression): HashTokens =
      copy(child = newChild)
  }

  /** `array<long>` → `array<long>` of length k: one-pass MinHash signature. */
  case class MinhashSig(child: Expression, k: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k > 0, "k must be positive")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "graft_minhash_sig"
    override def nullSafeEval(input: Any): Any =
      HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): MinhashSig =
      copy(child = newChild)
  }

  /** `array<string>` (raw tokens) → `long`: SimHash with `bits` bit
    * positions, one MD5 digest per token. */
  case class Simhash(child: Expression, bits: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(bits > 0 && bits <= 32,
      "simhash uses one hex nibble per bit (md5 = 32 nibbles)")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    override def nullSafeEval(input: Any): Any =
      HashKernels.simhash(input.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression): Simhash =
      copy(child = newChild)
  }

  // ---- Column API ----------------------------------------------------

  def hashTokens(elems: Column): Column =
    Bridge.column(HashTokens(Bridge.expression(elems)))

  def minhashSig(hashed: Column, k: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(hashed), k))

  def simhash(tokens: Column, bits: Int): Column =
    Bridge.column(Simhash(Bridge.expression(tokens), bits))

  // ---- SQL registration ------------------------------------------------

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  /** (name, info, builder) triples for both registration routes. */
  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_hash_tokens",
      new ExpressionInfo(classOf[HashTokens].getName, "graft_hash_tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash_tokens(arr)")
        HashTokens(args.head)
      }),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(arr, k)")
        MinhashSig(args.head, litInt(args(1), "k"))
      }),
    ("graft_simhash",
      new ExpressionInfo(classOf[Simhash].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_simhash(tokens, bits)")
        Simhash(args.head, litInt(args(1), "bits"))
      }),
    ("graft_srp_signature",
      new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_srp_signature(vec, bits)")
        SrpSignature(args.head, litInt(args(1), "bits"))
      }))

  /** Builder-time route: `SparkSession.builder.withExtensions(new
    * GraftExtensions) or `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }

  /** Post-hoc route for sessions built elsewhere (the driver owns session
    * construction in the Verify/Bench harness): registers the same functions
    * on an existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      Bridge.registerFunction(spark, name, info, builder)
    }
}

/** `spark.sql.extensions` entry point registering the graft SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VectorHashExpressions.inject(ext)
}
