package graft.functions.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering the engine's native expressions under SQL
  * names (usable from spark.sql and via functions.call_function). Wired by
  * GraftSession.builder; also usable standalone via
  * spark.sql.extensions=graft.functions.expressions.GraftExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  /** Friendly failure for the arity argument instead of a raw CCE. */
  private def intLiteral(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, _) => i
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT for its count argument, got: ${other.sql}")
  }

  private def longLiteral(e: Expression, fn: String): Long = e match {
    case Literal(l: Long, _) => l
    case Literal(i: Int, _) => i.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT/BIGINT seed argument, got: ${other.sql}")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - k min-hashes (XXH64 seeds 0..k-1)"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        intLiteral(args(1), "minhash_signature"))))
    e.injectFunction((
      new FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, n) - distinct space-joined n-grams"),
      (args: Seq[Expression]) => WordShingles(args(0),
        intLiteral(args(1), "word_shingles"))))
    e.injectFunction((
      new FunctionIdentifier("char_shingles"),
      info("char_shingles", "char_shingles(text, n) - distinct character n-grams"),
      (args: Seq[Expression]) => CharShingles(args(0),
        intLiteral(args(1), "char_shingles"))))
    e.injectFunction((
      new FunctionIdentifier("simhash_chunks"),
      info("simhash_chunks", "simhash_chunks(tokens) - 64-bit SimHash as 4x16-bit chunks"),
      (args: Seq[Expression]) => SimHashChunks(args(0))))
    e.injectFunction((
      new FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(vec, nTables, bits, dim, seed) - sign-LSH bucket id per hyperplane table"),
      (args: Seq[Expression]) => {
        require(args.length == 5, "lsh_buckets expects 5 arguments: " +
          s"lsh_buckets(vec, nTables, bits, dim, seed); got ${args.length}")
        LshBuckets(args(0),
          intLiteral(args(1), "lsh_buckets"), intLiteral(args(2), "lsh_buckets"),
          intLiteral(args(3), "lsh_buckets"), longLiteral(args(4), "lsh_buckets"))
      }))
    // TopCentroids is intentionally not SQL-registered: its codebook is
    // runtime driver data (collected centroids), not literal SQL text.

    // whole-operator extension: plans AsOfJoinNode to the merge-scan exec,
    // with optimizer rules so pushdown/pruning don't stop at the node
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => new graft.plans.AsOfJoinOptimizations)
  }
}
