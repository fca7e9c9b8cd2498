package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the Spark analog of the reference's index
  * infrastructure (`IndexScanNode`, B⁺-trees): pre-organizing data by key so
  * the join needs no shuffle. At 100 TB this is the difference between a
  * full-network shuffle of the fact table and a local merge per bucket. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bucketed tables join without an exchange on the bucketed key") {
    val d = TestSpark.sfDir // warehouse dir set in TestSpark (static conf)
    Graft.table(spark, d, "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Graft.table(spark, d, "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Graft.table(spark, d, "orders")
        .join(Graft.table(spark, d, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
