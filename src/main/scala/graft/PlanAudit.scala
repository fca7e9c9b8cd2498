package graft

/** Scratch: dump formatted plans of the round-2 operators for audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[8]")
    val d = "/root/testdata/sf0.01"
    // GRAFT_VIDX=1 audits the vector-index SERVE path instead of inline
    if (sys.env.contains("GRAFT_VIDX"))
      operators.VectorIndex.build(spark, d, new commands.TableCommands(
        spark, java.nio.file.Files.createTempDirectory("pa_wh").toString))
    args.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
