package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Spark-native plugin surface: `--conf
  * spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`) installs the engine's functions
  * into every session — the cluster-deployment analog of the reference's
  * `FunctionDirectory` registration (`functions/FunctionDirectory.java:38-62`),
  * done through the public `SparkSessionExtensions` API instead of a
  * per-session registry call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSim(
        GraftFunctions.toFloatArrExpr(exprs(0)),
        GraftFunctions.toFloatArrExpr(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("poly_fingerprint"),
      info("poly_fingerprint", "poly_fingerprint(s) - rolling polynomial hash"),
      (exprs: Seq[Expression]) => PolyFingerprint(
        GraftFunctions.toStrExpr(exprs.head))))
    ext.injectFunction((FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotF(
        GraftFunctions.toFloatArrExpr(exprs(0)),
        GraftFunctions.toFloatArrExpr(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("dot_l"),
      info("dot_l", "dot_l(a, b) - exact integer dot product of two bigint arrays"),
      (exprs: Seq[Expression]) => DotL(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(s) - 60-bit SimHash signature of the distinct tokens"),
      (exprs: Seq[Expression]) => SimHash60(
        GraftFunctions.toStrExpr(exprs.head))))
    ext.injectFunction((FunctionIdentifier("text_metrics"),
      info("text_metrics",
        "text_metrics(s) - one-pass (n_chars, n_punct, n_digits, n_tokens, n_stop, n_distinct)"),
      (exprs: Seq[Expression]) => TextMetrics(
        GraftFunctions.toStrExpr(exprs.head))))
    ext.injectFunction((FunctionIdentifier("vector_sum_l"),
      info("vector_sum_l", "vector_sum_l(v) - elementwise sum of bigint arrays"),
      (exprs: Seq[Expression]) => VectorSumL(exprs.head)))
    ext.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig",
        "hyperplane_sig(v, numPlanes, bitsPerTable) - LSH bucket per hash table"),
      (exprs: Seq[Expression]) => GraftFunctions.hyperplaneSigBuilder(exprs)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(s, k) - word k-grams"),
      (exprs: Seq[Expression]) => GraftFunctions.wordShinglesBuilder(exprs)))
  }
}
