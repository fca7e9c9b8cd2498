package graft

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
}
