package graft

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Per-stage profiler for one or more named queries at sf0.1 (or
  * SPARK_GRAFT_SF_DIR): runs each query once after an sf0.001 warm-up and
  * prints every stage's wall-clock, task count, max/sum task time, input
  * and shuffle bytes — the guide §1/§7 empirical loop without the UI.
  * `tools/run_graft.sh graft.ProfQ q93_tpch_min_cost_supplier` */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(master =
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    // GRAFT_CONF="k=v;k=v": arbitrary runtime confs (e.g. graft.opt.*
    // toggles), so a profile can be taken per A/B arm
    sys.env.get("GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (sys.env.contains("GRAFT_VIDX")) {
      val wh = new commands.TableCommands(spark,
        java.nio.file.Files.createTempDirectory("graft_prof_wh").toString)
      operators.VectorIndex.build(spark, d, wh)
      operators.DedupIndex.build(spark, d, wh)
    }
    case class St(name: String, submitted: Long, var completed: Long = 0L,
        var tasks: Int = 0, var taskTime: Long = 0L, var maxTask: Long = 0L,
        var input: Long = 0L, var sr: Long = 0L, var sw: Long = 0L,
        var gc: Long = 0L, var cpu: Long = 0L, var deser: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, St]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages(e.stageInfo.stageId) = St(e.stageInfo.name.takeWhile(_ != '\n'),
            System.nanoTime())
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.get(e.stageInfo.stageId).foreach { s =>
            s.completed = System.nanoTime()
            val m = e.stageInfo.taskMetrics
            s.tasks = e.stageInfo.numTasks
            s.taskTime = m.executorRunTime
            s.input = m.inputMetrics.bytesRead
            s.sr = m.shuffleReadMetrics.totalBytesRead
            s.sw = m.shuffleWriteMetrics.bytesWritten
            s.gc = m.jvmGCTime
            s.cpu = m.executorCpuTime
            s.deser = m.executorDeserializeTime
          }
        }
    }
    args.foreach { n =>
      // warm-up at sf0.001 (JIT + codegen cache)
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      System.gc()
      stages.synchronized(stages.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // GRAFT_EXPLAIN_FINAL=1: print the FINAL adaptive plan (reuse,
      // AQE join flips and coalescing only exist post-execution)
      if (sys.env.contains("GRAFT_EXPLAIN_FINAL")) {
        val df = SparkEntry.queries(n)(spark, d)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
      }
      Thread.sleep(200) // let the last StageCompleted drain
      println(f"===== $n wall=$wall%.3f s =====")
      stages.synchronized {
        stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
          val w = if (s.completed > 0) (s.completed - s.submitted) / 1e9 else -1.0
          println(f"  stage $id%4d wall=$w%7.3f tasks=${s.tasks}%4d " +
            f"cpuSum=${s.taskTime / 1e3}%8.2f s in=${s.input / 1e6}%8.2f MB " +
            f"sr=${s.sr / 1e6}%7.2f MB sw=${s.sw / 1e6}%7.2f MB " +
            f"gc=${s.gc / 1e3}%6.2f cpu=${s.cpu / 1e9}%7.2f " +
            f"deser=${s.deser / 1e3}%5.2f  ${s.name}")
        }
        val sum = stages.values.filter(_.completed > 0)
          .map(s => (s.completed - s.submitted) / 1e9).sum
        println(f"  [stage wall sum=$sum%.3f s, n=${stages.size}]")
      }
    }
    spark.stop()
  }
}
