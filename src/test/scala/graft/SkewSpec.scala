package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling — the answer this engine gives for hot keys at 100 TB is
  * layered: (1) remove pathological keys from the plan entirely where the
  * operator allows it (the d82/d95 df-cap: a shingle in >5% of documents
  * carries no dedup signal, so it leaves before any join key forms);
  * (2) let AQE split the remaining skewed partitions at RUNTIME, which
  * subsumes manual salting — the same fan-out of a hot key across tasks,
  * but decided from actual partition sizes instead of a guessed salt
  * factor, and with no de-salt re-aggregation pass. This spec proves the
  * mechanism actually fires: a join keyed 90% to one value plans a skew
  * split under the thresholds a real deployment would set relative to its
  * partition sizes. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("AQE splits the skewed join partition at runtime") {
    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: production keeps the defaults (256 MB /
      // factor 5), which are the same RELATIVE shape at real partition sizes
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the fact rows share ONE key; the dimension is uniform
      val fact = spark.range(100000).select(
        when(col("id") % 10 === 0, col("id") % 1000).otherwise(lit(7L))
          .as("k"),
        col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // collect through the SAME QueryExecution we inspect — count() would
      // build a fresh one and leave this plan un-finalized
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "AQE must have re-planned")
      assert(plan.contains("skew=true"),
        s"the hot-key partition must be skew-split at runtime:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("d82 df-cap absorbs a hot shingle at 10x the cap threshold — " +
    "measured per-task shuffle bound") {
    // Corpus: 1230 docs of 30 unique tokens each; every even doc carries an
    // identical 5-token hot phrase, so its 3 shingles hit df ≈ 50% of the
    // corpus — 10× the 5% df-cap. 30 planted near-dup pairs (doc i vs
    // 10000+i with the last two tokens dropped). WITHOUT the cap, the
    // shingle self-join's hot buckets alone emit
    // 3 × C(615,2) ≈ 565k pair records into the aggregation exchange —
    // concentrated in the hot key's task. With the cap the hot shingles
    // leave the plan before any join key forms, so no task may come
    // anywhere near that volume. The bounds below (max 60k / total 150k
    // records, ~10× and ~4× under the hot-bucket blowup) are the measured
    // evidence; recall of the planted pairs proves the cap didn't buy
    // this by dropping signal.
    import spark.implicits._
    val base = (0 until 1200).map { i =>
      val toks = (0 until 30).map(j => s"u${i}_$j")
      val hot = if (i % 2 == 0) " h1 h2 h3 h4 h5" else ""
      (i.toLong, toks.mkString(" ") + hot)
    }
    val dups = (0 until 30).map { i =>
      val toks = (0 until 28).map(j => s"u${i}_$j")
      val hot = if (i % 2 == 0) " h1 h2 h3 h4 h5" else ""
      (10000L + i, toks.mkString(" ") + hot)
    }
    val docs = (base ++ dups).toDF("doc_id", "text").repartition(4)
    val writes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) writes.add(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pairs = operators.Dedup.ngramJaccardPairs(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // recall: every planted pair survives the cap (26 shared shingles of
      // 28 — jaccard 0.93, far over the 0.3 floor)
      (0 until 30).foreach { i =>
        assert(pairs.contains((i.toLong, 10000L + i)),
          s"planted near-dup ($i, ${10000 + i}) lost to the df-cap")
      }
      // no hot-phrase-only pairs: unrelated docs share ONLY capped shingles
      val planted = (0 until 30).map(i => (i.toLong, 10000L + i)).toSet
      assert(pairs.forall(planted), s"hot-only pair leaked: " +
        pairs.filterNot(planted).take(5).mkString(", "))
      // listener events are async — wait for quiescence before measuring
      var last = -1; var same = 0
      while (same < 3) {
        Thread.sleep(200)
        val n = writes.size
        if (n == last) same += 1 else { same = 0; last = n }
      }
      val ws = scala.jdk.CollectionConverters.CollectionHasAsScala(writes)
        .asScala.toSeq
      assert(ws.nonEmpty)
      assert(ws.max <= 60000L,
        s"hot-key task blowup: max per-task shuffle write ${ws.max} records")
      assert(ws.sum <= 150000L,
        s"pair volume blowup: total shuffle write ${ws.sum} records")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
