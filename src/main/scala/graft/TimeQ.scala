package graft

/** Local profiling helper: time named queries at sf0.1 after a sf0.001
  * warm-up (JIT + codegen excluded), one line per query.
  * `sbt "runMain graft.TimeQ d83_dedup_minhash ..."` */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master = "local[32]")
    val names = args.toSeq
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
