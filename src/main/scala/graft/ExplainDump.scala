package graft

/** Optimization-round evidence tool: write `.explain("formatted")` for the
  * named queries (or all) to <outDir>/<query>_<tag>.txt, at sf0.1 — the
  * bench scale, so plan shapes (broadcast vs SMJ thresholds, AQE initial
  * plan) match what the bench executes.
  * `sbt "runMain graft.ExplainDump plans/r13 before q93_... t107_..."` */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session(master = "local[8]")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // serve-path artifacts, same as Bench: plans for s100+ must show the
    // stored-index read, not inline training
    try {
      val wh = new commands.TableCommands(spark,
        java.nio.file.Files.createTempDirectory("graft_explain_wh").toString)
      operators.VectorIndex.build(spark, d, wh)
      operators.DedupIndex.build(spark, d, wh)
    } catch { case e: Throwable =>
      System.err.println(s"[explain] index build failed: ${e.getMessage}")
    }
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, d)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), plan)
        println(s"[explain] wrote $outDir/${n}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
