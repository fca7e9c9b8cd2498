package graft

/** Bench-faithful subset timer for optimization A/B runs: same protocol as
  * graft.Bench (full-suite sf0.001 warm-up for the NAMED queries, noop sink,
  * clearCache + System.gc before each repeat, best-of-N with min/max) but
  * only for the named queries, printing one line per query.
  * GRAFT_BENCH_N repeats (default 5).
  * `tools/run_graft.sh graft.ABench q93_tpch_min_cost_supplier ...` */
object ABench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (autoParts, autoAdvisory) =   // Bench's data-sized rule, shared
      Graft.dataSizedConfs(sfDir, cpus.toInt)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", autoParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", autoAdvisory)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val wh = new commands.TableCommands(spark, java.nio.file.Files
        .createTempDirectory("graft_ab_wh").toString)
      operators.VectorIndex.build(spark, sfDir, wh)
      operators.DedupIndex.build(spark, sfDir, wh)
    } catch { case e: Throwable =>
      System.err.println(s"[abench] index build failed: ${e.getMessage}")
    }
    // same deterministic block cleanup as Bench: index artifacts stay,
    // each query run's localCheckpoint blocks are dropped before the next
    // clock start
    val keepRdds = spark.sparkContext.getPersistentRDDs.keySet
    def dropQueryRdds(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keepRdds.contains(id)) rdd.unpersist(false)
      }
    val names = args.toSeq
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      dropQueryRdds()
    }
    val reps = sys.env.getOrElse("GRAFT_BENCH_N", "5").toInt
    // GRAFT_AB="confKey=valA|valB": run each repeat alternating the two
    // values of a runtime SQL conf WITHIN one JVM (page cache, JIT, host
    // load shared), reporting min per arm — the only same-host A/B that
    // survives this machine's multi-second drift between JVM invocations.
    val ab = sys.env.get("GRAFT_AB").map { s =>
      // validate instead of pattern-matching blind: a missing '=' or a
      // value count != 2 otherwise throws an opaque MatchError (and a
      // conf value containing '|' would silently mis-split)
      val eq = s.indexOf('=')
      require(eq > 0, s"GRAFT_AB must be confKey=valA|valB, got: $s")
      val (k, vs) = (s.substring(0, eq), s.substring(eq + 1))
      val arms = vs.split('|')
      require(arms.length == 2,
        s"GRAFT_AB needs exactly two '|'-separated values, got: $vs")
      (k, arms(0), arms(1))
    }
    var total = 0.0
    var totA = 0.0; var totB = 0.0
    names.foreach { n =>
      def run(): Double = {
        spark.catalog.clearCache()
        dropQueryRdds()
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ab match {
        case Some((k, a, b)) =>
          val (tsA, tsB) = (1 to reps).map { _ =>
            spark.conf.set(k, a); val ta = run()
            spark.conf.set(k, b); val tb = run()
            (ta, tb)
          }.unzip
          totA += tsA.min; totB += tsB.min
          println(f"ABENCH $n A[$a]=${tsA.min}%.3f B[$b]=${tsB.min}%.3f " +
            f"(maxA=${tsA.max}%.3f maxB=${tsB.max}%.3f n=$reps)")
        case None =>
          val ts = (1 to reps).map(_ => run())
          total += ts.min
          println(f"ABENCH $n min=${ts.min}%.3f max=${ts.max}%.3f n=$reps")
      }
    }
    if (ab.isDefined)
      println(f"ABENCH_TOTAL A=$totA%.3f B=$totB%.3f s (${names.size} queries, min-of-$reps)")
    else
      println(f"ABENCH_TOTAL ${total}%.3f s (${names.size} queries, min-of-$reps)")
    spark.stop()
  }
}
