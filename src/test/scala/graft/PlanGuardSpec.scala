package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executed-plan regression guards for the heaviest queries: the plan
  * properties that make each one scale — scan counts, join strategies,
  * the absence of cartesians and per-group buffers — are pinned as a
  * table so a future edit can't silently reintroduce a second corpus
  * scan (round-3 d82), a corpus-sized broadcast (round-4 s96), or an
  * O(group) percentile buffer (round-3 q15).
  *
  * All assertions run against the FINAL adaptive plan after executing
  * the query (AQE stage reuse, broadcast promotion/demotion and skew
  * splits only exist post-execution; a pre-execution dump would both
  * hide reuse and double-count via the appended "Initial Plan" section).
  * Only size-independent properties are asserted: scan counts are
  * structural, and join-strategy requirements are limited to hinted or
  * cardinality-bounded joins that AQE cannot legally flip.
  */
class PlanGuardSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  /** (query, max "Scan parquet" count, forbidden fragments, required
    * fragments). maxScans values are the plans' current counts — a guard
    * failure means an edit added a scan, not that the bound was loose. */
  private val guards: Seq[(String, Int, Seq[String], Seq[String])] = Seq(
    // one fused fact scan (grouping sets); rank median over the bounded
    // price histogram, never a percentile buffer
    ("q19_approx_agg", 1, Seq("percentile", "ObjectHashAggregate"),
      Seq("Expand")),
    // rank-based percentiles: no O(group) Percentile buffer (q15's plan
    // reads lineitem thrice for the three rank anchors — all slim)
    ("q15_percentiles", 3, Seq("percentile", "ObjectHashAggregate"), Nil),
    // single-pass kernel: the regex passes must stay gone
    ("t71_quality_score", 1, Seq("regexp_replace"), Seq("text_metrics")),
    // one doc_id-pinned exchange feeds tf, df and top-terms
    ("t79_tfidf_topterms", 2, Nil, Nil),
    // the round-4 fix: corpus-sized probe/assignment sides JOIN BY
    // SHUFFLE on cluster id (merge hint); a BroadcastHashJoin here means
    // a corpus-sized frame is being shipped to every executor again.
    // The BroadcastNestedLoopJoin that remains is the |labels|-row
    // centroid table — bounded — so only BHJ is forbidden.
    ("s96_knn_graph", 2, Seq("BroadcastHashJoin"), Seq("SortMergeJoin")),
    // probe side is |queries|*nprobe-bounded and must stay broadcast
    ("s95_ivf_probe", 3, Nil, Seq("BroadcastHashJoin")),
    ("s94_ann_bucketed", 2, Nil, Nil),
    // one corpus pass (round-3 fix) + broadcast stop-shingle frame
    ("d82_dedup_ngram_jaccard", 2, Nil, Nil),
    ("d83_dedup_minhash", 2, Nil, Nil),
    ("d85_simhash_pairs", 4, Nil, Nil),
    // log-round components kernel: iterates over checkpointed frames,
    // never re-scans the corpus from parquet
    ("d87_dedup_components", 0, Nil, Nil),
    ("d89_minhash_estimate", 2, Nil, Nil),
    ("d92_semantic_dedup", 3, Nil, Nil),
    ("d93_dedup_decisions", 1, Nil, Nil),
    ("d95_winnow_near_dup", 3, Nil, Nil),
    ("d97_editdist_verify", 3, Nil, Nil),
    ("t88_winnow_fingerprints", 1, Nil, Nil),
    ("p100_corpus_prep", 2, Nil, Nil),
    // dictionary-based BPE: one corpus scan per merge round (AQE reuses
    // the word-frequency exchange across rounds)
    ("t93_bpe_merges", 3, Nil, Nil),
    ("t94_bpe_apply", 4, Nil, Nil),
    // DSIR: raw counts, totals and doc scoring all hang off ONE reused
    // corpus exchange; the vocab-bounded weight table must stay broadcast
    ("t95_dsir_select", 1, Nil, Seq("BroadcastHashJoin")),
    // PQ: codebook joins are broadcast-only — an SMJ means a corpus-sized
    // side started shuffling into the assignment
    ("s99_pq_encode", 3, Seq("SortMergeJoin"), Nil),
    ("s100_pq_adc_search", 4, Seq("SortMergeJoin"), Nil),
    // the multi-distinct split: Expand (Catalyst's distinct rewrite)
    // must stay gone
    ("q12_count_distinct", 3, Seq("Expand"), Nil),
    // the full IVF-PQ stack: candidate generation must stay broadcast/
    // cluster-bounded — an SMJ means a corpus frame started shuffling
    // into the probe or LUT side
    ("s101_ivfpq_search", 5, Seq("SortMergeJoin"), Nil))

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  guards.foreach { case (name, maxScans, forbid, require) =>
    test(s"$name: <=$maxScans scans, no cartesian" +
      (if (forbid.nonEmpty) s", none of ${forbid.mkString("/")}" else "") +
      (if (require.nonEmpty) s", has ${require.mkString("/")}" else "")) {
      val df = SparkEntry.queries(name)(spark, d)
      // drive THIS DataFrame's QueryExecution — a fresh count()/write
      // would plan a new one and leave this plan un-finalized
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(count(plan, "Scan parquet") <= maxScans,
        s"$name grew beyond $maxScans parquet scans:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      forbid.foreach(f => assert(!plan.contains(f),
        s"$name plan must not contain '$f':\n$plan"))
      require.foreach(r => assert(plan.contains(r),
        s"$name plan must contain '$r':\n$plan"))
      spark.catalog.clearCache()
    }
  }
}
