package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cosine similarity between two float-array embedding columns.
  *
  * A native Catalyst expression (with `doGenCode`) instead of a Scala UDF or
  * a `zip_with`/`aggregate` composition: the tight primitive loop stays inside
  * whole-stage codegen with zero per-element boxing, which is what makes
  * brute-force ANN over 100 TB of embeddings feasible. Accumulates in double,
  * left-to-right (matches DuckDB's `list_cosine_similarity` on DOUBLE[] for
  * oracle parity).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // Reject anything but array<float> at analysis time — getFloat over an
  // array<double> would silently read garbage out of 8-byte slots. The
  // Column/SQL builders in GraftFunctions insert the cast, so double-array
  // literals still work there.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = (double) $a.getFloat($i);
         |  double yv = (double) $b.getFloat($i);
         |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Rolling polynomial fingerprint of a string (document fingerprinting,
  * SURVEY.md §7.8 text-analysis extension): h = (h*31 + byte) mod p with
  * p = 9007199254740881 (largest prime < 2^53), so every intermediate fits a
  * signed 64-bit integer — the same fold is expressible in DuckDB
  * (`list_reduce`) for oracle checking, and never overflows in either engine.
  */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L; var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 9007199254740881L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyFingerprint.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PolyFingerprint {
  // Called from generated code.
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L; var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 9007199254740881L
      i += 1
    }
    h
  }
}

/** Column-API + SQL registration for the engine's extra functions.
  *
  * The reference exposes new scalar functions by registering them in a
  * case-insensitive `FunctionDirectory` (reference
  * `functions/FunctionDirectory.java:80-96`); the Spark-native equivalent is
  * the session `FunctionRegistry`, which makes them usable from `spark.sql`
  * and keeps them codegen-compatible.
  */
object GraftFunctions {

  private[graft] def toFloatArrExpr(e: Expression): Expression =
    Cast(e, ArrayType(FloatType)) // no-op (removed by SimplifyCasts) if typed
  private[graft] def toStrExpr(e: Expression): Expression = Cast(e, StringType)

  // Shared SQL-surface builders for the literal-parameterized expressions,
  // used by BOTH registration paths (per-session FunctionRegistry here and
  // the SparkSessionExtensions plugin) so their validation can never drift.
  private[graft] def wordShinglesBuilder(exprs: Seq[Expression]): Expression =
    exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(k, _) =>
        WordShingles(toStrExpr(exprs.head), k.toString.toInt)
      case other => throw new IllegalArgumentException(
        s"word_shingles k must be a literal, got $other")
    }
  private[graft] def hyperplaneSigBuilder(exprs: Seq[Expression]): Expression =
    (exprs(1), exprs(2)) match {
      case (org.apache.spark.sql.catalyst.expressions.Literal(p, _),
            org.apache.spark.sql.catalyst.expressions.Literal(b, _)) =>
        HyperplaneSig(exprs.head, p.toString.toInt, b.toString.toInt)
      case other => throw new IllegalArgumentException(
        s"hyperplane_sig numPlanes/bitsPerTable must be literals, got $other")
    }
  private def toFloatArr(e: Expression): Expression = toFloatArrExpr(e)
  private def toStr(e: Expression): Expression = toStrExpr(e)

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(toFloatArr(Bridge.expression(a)),
      toFloatArr(Bridge.expression(b))))
  def poly_fingerprint(c: Column): Column =
    Bridge.column(PolyFingerprint(toStr(Bridge.expression(c))))
  def word_shingles(c: Column, k: Int): Column =
    Bridge.column(WordShingles(toStr(Bridge.expression(c)), k))
  def dot_f(a: Column, b: Column): Column =
    Bridge.column(DotF(toFloatArr(Bridge.expression(a)),
      toFloatArr(Bridge.expression(b))))
  def dot_l(a: Column, b: Column): Column =
    Bridge.column(DotL(Bridge.expression(a), Bridge.expression(b)))
  def nearest_centroid_l(vq: Column, nq: Column, cents: Column): Column =
    Bridge.column(NearestCentroidL(Bridge.expression(vq),
      Bridge.expression(nq), Bridge.expression(cents)))
  def pq_codes_l(vq: Column, book: Column, sub: Int): Column =
    Bridge.column(PqCodesL(Bridge.expression(vq),
      Bridge.expression(book), sub))
  def simhash60(c: Column): Column =
    Bridge.column(SimHash60(toStr(Bridge.expression(c))))
  def text_metrics(c: Column): Column =
    Bridge.column(TextMetrics(toStr(Bridge.expression(c))))
  def hyperplane_sig(v: Column, numPlanes: Int, bitsPerTable: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(v), numPlanes, bitsPerTable))
  def vector_sum_l(v: Column): Column =
    Bridge.column(VectorSumL(Bridge.expression(v)).toAggregateExpression())

  def register(spark: SparkSession): Unit = {
    // custom aggregate on the SQL surface (reference FunctionDirectory also
    // lists aggregates alongside scalars)
    spark.udf.register("gcd_agg",
      org.apache.spark.sql.functions.udaf(GcdAggregator))
    val reg = Bridge.sessionState(spark).functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(toFloatArr(exprs(0)), toFloatArr(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("poly_fingerprint",
      exprs => PolyFingerprint(toStr(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction("dot_f",
      exprs => DotF(toFloatArr(exprs(0)), toFloatArr(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("dot_l",
      exprs => DotL(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("nearest_centroid_l",
      exprs => NearestCentroidL(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("pq_codes_l",
      exprs => exprs.lift(2) match {
        case Some(org.apache.spark.sql.catalyst.expressions.Literal(s, _))
            if s != null =>
          PqCodesL(exprs(0), exprs(1), s.toString.toInt)
        case other => throw new IllegalArgumentException(
          "pq_codes_l requires (vq, book, sub) with sub a non-null " +
            s"integer literal, got ${other.getOrElse("2 arguments")}")
      }, "built-in")
    reg.createOrReplaceTempFunction("simhash60",
      exprs => SimHash60(toStr(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction("text_metrics",
      exprs => TextMetrics(toStr(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction("vector_sum_l",
      exprs => VectorSumL(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      hyperplaneSigBuilder, "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      wordShinglesBuilder, "built-in")
  }
}
