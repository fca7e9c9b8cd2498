package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automatic index usage — the reference's `CreateIndexCommand` →
  * `IndexScanNode` intent: after CREATE INDEX, the SAME plain SQL string
  * routes through the bucketed re-cluster and runs exchange-free; before
  * it, the plan is unchanged (shuffled). Users never name the index table.
  */
class IndexRoutingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val q =
    """SELECT c_custkey, count(*) AS cnt
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey""".stripMargin

  test("plain SQL is routed through CREATE INDEX buckets, unchanged before") {
    val wh = java.nio.file.Files.createTempDirectory("graft_idx_wh").toString
    val engine = new Engine(spark, TestSpark.sfDir, wh)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val before = engine.sql(q)
      val beforePlan = before.queryExecution.executedPlan.toString
      assert(beforePlan.contains("Exchange hashpartitioning"),
        s"un-indexed join should shuffle, got:\n$beforePlan")
      val expected = before.collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap

      engine.sql("CREATE INDEX ON orders (o_custkey)")
      engine.sql("CREATE INDEX ON customer (c_custkey)")
      val after = engine.sql(q)
      val plan = after.queryExecution.executedPlan.toString
      assert(plan.contains("orders_by_o_custkey") &&
        plan.contains("customer_by_c_custkey"),
        s"query should scan the index tables, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"indexed join + agg should be exchange-free, got:\n$plan")
      val got = after.collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(got == expected, "index routing changed the result")

      // a query NOT touching the indexed keys keeps its base-table plan
      val other = engine.sql("SELECT count(*) AS n FROM orders")
      assert(!other.queryExecution.executedPlan.toString.contains("_by_"),
        "non-key query must not be rewritten")

      // dropping the index table out from under the engine reverts routing
      // (lazy existence check) instead of failing the query
      spark.sql("DROP TABLE orders_by_o_custkey")
      val reverted = engine.sql(q)
      assert(!reverted.queryExecution.executedPlan.toString
        .contains("orders_by_o_custkey"))
      assert(reverted.collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("orders_by_o_custkey", "customer_by_c_custkey")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }
}
