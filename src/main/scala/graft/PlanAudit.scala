package graft

/** Scratch: dump formatted plans of the round-2 operators for audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[8]")
    val d = "/root/testdata/sf0.01"
    args.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
