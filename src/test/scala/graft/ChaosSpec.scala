package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full-system chaos soak: BOTH self-maintaining gates (ADMIT documents,
  * VECTOR embeddings), a SQL-face serve twin, and the batch maintenance
  * surface (OPTIMIZE / BEGIN-COMMIT / SNAPSHOT / VERIFY) interleaved in
  * seeded-random epochs over ONE warehouse — with poison mixed into every
  * feed and random per-stream stops and whole-session deaths between
  * epochs. The per-feature soaks (GateSoakSpec, ServeSqlSpec) each
  * randomize ONE stream; this is the composition no pairwise spec
  * reaches: seven concurrent sink claims, three checkpoints, the txn
  * exclusion and the fence all holding at once.
  *
  * Invariants at EVERY epoch rest point (all streams drained):
  *  - every dropped document has exactly ONE verdict row;
  *  - every clean vector has exactly ONE codes row and ONE assign row;
  *    every poison vector exactly ONE quarantine row and NO index rows;
  *  - every clean query exactly k answers; every poison query exactly
  *    ONE reject row and NO answers;
  *  - a fenced verb and BEGIN are refused while anything is registered;
  *  - VERIFY's index audits are green at the end (no torn state ever
  *    published), and a BEGIN/COMMIT cycle works once claims are gone.
  */
class ChaosSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("chaos soak: both gates + serve twin + txn/snapshot/maintenance " +
      "in seeded-random epochs with poison and session deaths — " +
      "exactly-once everywhere, fences hold, audits green; two seeds, " +
      "fresh warehouse each") {
    Seq(20260816L, 70811L).foreach(chaos)
  }

  private def chaos(seed: Long): Unit = {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_chaos_wh").toString
    var engine = new Engine(spark, d, wh)
    val rng = new scala.util.Random(seed)
    val docDir = Files.createTempDirectory("graft_chaos_docs").toString
    val vecDir = Files.createTempDirectory("graft_chaos_vecs").toString
    val qDir = Files.createTempDirectory("graft_chaos_qs").toString
    val pool = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 40).select("embedding").collect()
      .map(_.getSeq[Float](0))
    val codesT = operators.VectorIndex.tableName("codes")
    val assignT = operators.VectorIndex.tableName("assign")
    val bandsT = operators.DedupIndex.tableName("bands")
    try {
      engine.sql("BUILD DEDUP INDEX ON documents")
      engine.sql("BUILD VECTOR INDEX ON embeddings")
      val docs = scala.collection.mutable.Set.empty[Long]
      val cleanVecs = scala.collection.mutable.Set.empty[Long]
      val poisonVecs = scala.collection.mutable.Set.empty[Long]
      val cleanQs = scala.collection.mutable.Set.empty[Long]
      val poisonQs = scala.collection.mutable.Set.empty[Long]
      var nextId = 9500000L
      var admitUp = false
      var vecUp = false
      var serveUp = false
      def ensureUp(): Unit = {
        if (!admitUp) {
          engine.sql(s"START ADMIT INGEST FROM '$docDir' AS cg")
          admitUp = true
        }
        if (!vecUp) {
          engine.sql(s"START VECTOR INGEST FROM '$vecDir' AS cv")
          vecUp = true
        }
        if (!serveUp) {
          engine.sql(
            s"START SERVE VECTORS FROM '$qDir' INTO chaos_ans AS sv")
          serveUp = true
        }
      }
      def freshText(i: Long): String =
        s"chaos courier number $i delivers a sealed ledger across the " +
          "rain bright harbor toward the waiting archive clerks tonight"
      (1 to 6).foreach { epoch =>
        // feed all three sources, with poison mixed in
        (0 until 1 + rng.nextInt(2)).foreach { _ =>
          nextId += 1
          val poison = rng.nextInt(4) == 0
          Seq((nextId, if (poison) null else freshText(nextId)))
            .toDF("doc_id", "text")
            .write.mode("append").parquet(docDir)
          docs += nextId // poison or not: exactly ONE verdict row
        }
        (0 until 1 + rng.nextInt(2)).foreach { _ =>
          nextId += 1
          if (rng.nextInt(4) == 0) {
            Seq((nextId, Seq(Float.NaN, 1.0f)))
              .toDF("vec_id", "embedding")
              .write.mode("append").parquet(vecDir)
            poisonVecs += nextId
          } else {
            Seq((nextId, pool(rng.nextInt(pool.length))))
              .toDF("vec_id", "embedding")
              .write.mode("append").parquet(vecDir)
            cleanVecs += nextId
          }
        }
        (0 until 1 + rng.nextInt(2)).foreach { _ =>
          nextId += 1
          if (rng.nextInt(4) == 0) {
            Seq((nextId, Seq(1.0f, 2.0f))).toDF("q_id", "embedding")
              .write.mode("append").parquet(qDir)
            poisonQs += nextId
          } else {
            Seq((nextId, pool(rng.nextInt(pool.length))))
              .toDF("q_id", "embedding")
              .write.mode("append").parquet(qDir)
            cleanQs += nextId
          }
        }
        ensureUp()
        engine.ingestQuery("cg").get.processAllAvailable()
        engine.ingestQuery("cv").get.processAllAvailable()
        engine.serveQuery("sv").get.processAllAvailable()
        // ── rest-point invariants ────────────────────────────────────
        val vCounts = engine.storage.table("ingest_verdicts")
          .groupBy(col("doc_id")).count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(vCounts.keySet == docs.toSet &&
          vCounts.values.forall(_ == 1L),
          s"epoch $epoch: verdicts lost/duplicated: $vCounts vs $docs")
        def onceEach(t: String, idc: String, ids: Set[Long],
            label: String): Unit = if (ids.nonEmpty) {
          val m = engine.storage.table(t)
            .filter(col(idc) >= 9500000L)
            .groupBy(col(idc)).count().collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(m.keySet == ids && m.values.forall(_ == 1L),
            s"epoch $epoch $label: $m vs expected $ids")
        }
        onceEach(codesT, "vec_id", cleanVecs.toSet, "codes")
        onceEach(assignT, "vec_id", cleanVecs.toSet, "assign")
        onceEach("vector_ingest_rejects", "vec_id", poisonVecs.toSet,
          "vec quarantine")
        onceEach("chaos_ans_rejects", "q_id", poisonQs.toSet,
          "query rejects")
        if (cleanQs.nonEmpty) {
          val a = engine.storage.table("chaos_ans")
            .groupBy(col("q_id")).count().collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(a.keySet == cleanQs.toSet && a.values.forall(_ == 3L),
            s"epoch $epoch: answers lost/duplicated: $a vs $cleanQs")
        }
        // fences hold while everything is live: a random claimed table
        // refuses maintenance, and BEGIN refuses outright
        val fenced = Seq("ingest_verdicts", codesT, bandsT, "chaos_ans")
        val probe = fenced(rng.nextInt(fenced.size))
        val fe = intercept[IllegalStateException](
          engine.sql(s"OPTIMIZE $probe"))
        assert(fe.getMessage.contains("live stream"), fe.getMessage)
        val te = intercept[IllegalArgumentException](engine.sql("BEGIN"))
        assert(te.getMessage.contains("live streams"), te.getMessage)
        // ── end the epoch: random per-stream stops or a session death ──
        if (rng.nextInt(6) == 0) {
          engine.close()
          engine = new Engine(spark, d, wh)
          admitUp = false; vecUp = false; serveUp = false
        } else {
          if (rng.nextBoolean()) {
            engine.sql("STOP INGEST cg"); admitUp = false
          }
          if (rng.nextBoolean()) {
            engine.sql("STOP INGEST cv"); vecUp = false
          }
          if (rng.nextBoolean()) {
            engine.sql("STOP SERVE sv"); serveUp = false
          }
        }
        // with the VECTOR gate stopped its index claims lift, so
        // OPTIMIZE on codes/assign is LEGAL — and it version-bumps +
        // sweeps UNDER the still-running serve twin's per-batch reads:
        // exactly the reader-vs-sweep composition the retain window and
        // the refresh-retry must absorb (the serve invariants at the
        // next rest point prove nothing was lost or doubled)
        if (!vecUp && serveUp && rng.nextBoolean()) {
          engine.sql(s"OPTIMIZE $codesT")
          engine.sql(s"OPTIMIZE $assignT")
        }
      }
      // drain: stop everything that is still registered (FORCE clears a
      // dead session's registrations after a close-epoch)
      Seq("cg", "cv").foreach { n =>
        try { engine.sql(s"STOP INGEST $n"); () }
        catch { case _: Exception =>
          try { engine.sql(s"STOP INGEST $n FORCE"); () }
          catch { case _: Exception => () }
        }
      }
      try { engine.sql("STOP SERVE sv"); () }
      catch { case _: Exception => () }
      // once the claims drain (serve releases async), the txn face and
      // maintenance reopen, and the audits pass on the final state
      val deadline = System.currentTimeMillis() + 15000
      var opened = false
      while (!opened && System.currentTimeMillis() < deadline) {
        try { engine.sql("BEGIN"); opened = true }
        catch { case _: IllegalArgumentException => Thread.sleep(100) }
      }
      assert(opened, "claims never drained after stopping all streams")
      engine.sql("COMMIT")
      engine.sql(s"VERIFY $codesT")   // duplicate/nesting/marker audit
      engine.sql(s"VERIFY $bandsT")   // set-ness + provenance audit
      engine.sql("OPTIMIZE ingest_verdicts")
      engine.sql("SNAPSHOT ingest_verdicts VERSION AS OF " +
        engine.storage.versionHistory("ingest_verdicts").last +
        " AS chaos_snap")
      assert(spark.table("chaos_snap").count() == docs.size.toLong)
      engine.sql("DROP SNAPSHOT chaos_snap")
    } finally {
      try {
        engine.sql("DROP DEDUP INDEX ON documents")
        engine.sql("DROP VECTOR INDEX ON embeddings")
      } catch { case _: Throwable => () }
      engine.close()
    }
  }
}
