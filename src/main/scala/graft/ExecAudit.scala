package graft

/** Scratch: execute a query and dump its FINAL adaptive plan — AQE
  * decisions (stage reuse, broadcast demotion, coalescing) only exist
  * after execution, so [[PlanAudit]]'s pre-execution dump can't show
  * them. Prints ReusedExchange / scan counts first for quick grepping. */
object ExecAudit {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[8]")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      // drive THIS DataFrame's QueryExecution (df.write would plan a fresh
      // one and leave this plan un-finalized, hiding every AQE decision)
      df.queryExecution.toRdd.foreach(_ => ())
      // the adaptive plan string appends "== Initial Plan ==" after the
      // final plan — count only the final section or every number doubles
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      println(s"========== $n ==========")
      println(s"reused_exchanges=${p.sliding("ReusedExchange".length).count(_ == "ReusedExchange")} " +
        s"scans=${p.sliding("Scan parquet".length).count(_ == "Scan parquet")}")
      println(p)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
