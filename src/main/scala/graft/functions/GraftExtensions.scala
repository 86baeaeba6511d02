package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's native expressions for the SQL surface:
  *
  * {{{
  * spark = SparkSession.builder().withExtensions(new GraftExtensions).…
  * spark.sql("SELECT simhash64(shingle_hashes(lower(text), 1, 128)) FROM docs")
  * }}}
  *
  * (The extension-injection pattern; cf. SparkSessionExtensions docs.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head, intArg(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args.head,
        intArg(args(1), "n"), if (args.length > 2) intArg(args(2), "maxTokens") else 0)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (args: Seq[Expression]) => HyperplaneBucket(args.head, intArg(args(1), "planes"))))
  }
}

object GraftExtensions {
  /** Register on an existing session (post-hoc, e.g. in tests). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    def intArg(e: Expression): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }
    put("simhash64", args => SimHash64(args.head))
    put("minhash_sig", args => MinHashSig(args.head, intArg(args(1))))
    put("shingle_hashes", args => ShingleHashes(args.head, intArg(args(1)),
      if (args.length > 2) intArg(args(2)) else 0))
    put("cosine_sim", args => CosineSim(args.head, args(1)))
    put("hyperplane_bucket", args => HyperplaneBucket(args.head, intArg(args(1))))
  }
}
