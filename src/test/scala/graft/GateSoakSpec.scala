package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized soak of the VECTOR gate's batch kernel — the streaming
  * composition of the storage-model property spec: one gate driven
  * through a seeded-random interleaving of clean batches, poison rows,
  * replays, crash injections at both publish points, and tail
  * compactions at random thresholds, asserting after every step that
  *  - the paired sink markers stay EQUAL and non-decreasing (the
  *    invariant STOP ... PURGE's torn-pair refusal keys on),
  *  - and at the end that contents equal an exactly-once batch recompute
  *    (every committed vector routed+encoded once, every poison row
  *    quarantined once) and the VERIFY index audit passes.
  * Any interleaving that violates these is a real engine bug — the seed
  * pins it for replay. */
class GateSoakSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("vector gate soak: seeded-random clean/poison/replay/crash/" +
      "compaction interleavings keep the sink pair marker-equal and " +
      "monotone, contents exactly-once, and the VERIFY audit green") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_soak_wh").toString
    val cmds = new commands.TableCommands(spark, wh)
    operators.VectorIndex.build(spark, d, cmds)
    val codesT = operators.VectorIndex.tableName("codes")
    val assignT = operators.VectorIndex.tableName("assign")
    try {
      val (cents, book) = streaming.VectorStreams.freeze(
        cmds.table(operators.VectorIndex.tableName("centroids")),
        cmds.table(operators.VectorIndex.tableName("codebook")))
      val base = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("embedding")).head.getSeq[Float](0)
      val rng = new scala.util.Random(20260815L)
      // the reference model: what an exactly-once gate must end up with
      val committedClean =
        scala.collection.mutable.Map.empty[Long, Seq[Float]]
      val committedPoison = scala.collection.mutable.Set.empty[Long]
      // committed batches by effective id, for replay ops
      val pastBatches = scala.collection.mutable.Map
        .empty[Long, Seq[(Long, Seq[Float])]]
      var nextId = 9600000L
      var nextBatch = 0L
      var lastMarker = -1L
      def markers(): (Long, Long) =
        (cmds.lastCommittedBatch(codesT).getOrElse(-1L),
          cmds.lastCommittedBatch(assignT).getOrElse(-1L))
      def checkPair(ctx: String): Unit = {
        val (mc, ma) = markers()
        assert(mc == ma, s"[$ctx] sink pair torn at rest: codes $mc, " +
          s"assign $ma (only a mid-replay window may tear it)")
        assert(mc >= lastMarker, s"[$ctx] marker regressed: $mc < " +
          s"$lastMarker")
        lastMarker = mc
      }
      def runBatch(rows: Seq[(Long, Seq[Float])], id: Long): Unit =
        streaming.VectorStreams.ingestBatch(
          rows.toDF("vec_id", "embedding"), cmds, cents, book, id)
      (1 to 40).foreach { step =>
        rng.nextInt(10) match {
          case n if n <= 5 => // a fresh micro-batch, possibly poisoned,
            // possibly crashing mid-commit (then healed by replay — what
            // Spark's checkpoint recovery does)
            val rows = (0 until 1 + rng.nextInt(3)).map { _ =>
              nextId += 1
              if (rng.nextInt(4) == 0) (nextId, Seq(1.0f, 2.0f)) // poison
              else (nextId,
                base.map(_ + (rng.nextInt(1000) + 1) / 100000.0f))
            }
            val id = nextBatch
            if (rng.nextInt(5) == 0) { // crash one commit, then heal
              cmds.crashPoint =
                Some(if (rng.nextBoolean()) "staged" else "published")
              intercept[IllegalStateException] { runBatch(rows, id) }
              cmds.crashPoint = None
              // the pair MAY be torn right here — that is the state the
              // purge refusal guards; the replay below must heal it
            }
            runBatch(rows, id)
            rows.foreach { case (v, e) =>
              if (e.length == base.length) committedClean(v) = e
              else { committedPoison += v; () }
            }
            pastBatches(id) = rows
            nextBatch += 1
            checkPair(s"step $step commit")
          case 6 | 7 if pastBatches.nonEmpty => // replay a random PAST
            // batch (a re-delivered micro-batch after restart): no-op
            val id = pastBatches.keys.toSeq(
              rng.nextInt(pastBatches.size))
            runBatch(pastBatches(id), id)
            checkPair(s"step $step replay($id)")
          case 8 => // tail compaction at a random graduation threshold —
            // must carry markers forward and never change contents
            val thr = 1L << (14 + rng.nextInt(10)) // 16 KiB .. 8 MiB
            cmds.compactTail(codesT, thr)
            cmds.compactTail(assignT, thr)
            checkPair(s"step $step compact($thr)")
          case _ => // crash INSIDE a compaction, then retry — the stage
            // either never published (staged) or published atomically
            cmds.crashPoint =
              Some(if (rng.nextBoolean()) "staged" else "published")
            try { cmds.compactTail(codesT, 1L << 20); () }
            catch { case _: IllegalStateException => () } // no-op tails
            cmds.crashPoint = None
            cmds.compactTail(codesT, 1L << 20)
            checkPair(s"step $step compact-crash")
        }
      }
      // ── final contents equal an exactly-once recompute ──────────────
      val expected = streaming.VectorStreams.routeAndEncode(
        committedClean.toSeq.toDF("vec_id", "embedding"), cents, book)
        .collect().map(_.toSeq).toSet
      val gotCodes = cmds.table(codesT)
        .filter(col("vec_id") >= 9600000L)
        .select("vec_id", "codes").collect().map(_.toSeq).toSet
      val expCodes = expected.map(r => Seq(r(0), r(2)))
      assert(gotCodes == expCodes,
        s"soak diverged on codes: ${gotCodes.size} vs ${expCodes.size}")
      val gotAssign = cmds.table(assignT)
        .filter(col("vec_id") >= 9600000L)
        .select("vec_id", "cluster").collect().map(_.toSeq).toSet
      val expAssign = expected.map(r => Seq(r(0), r(1)))
      assert(gotAssign == expAssign,
        s"soak diverged on assign: ${gotAssign.size} vs ${expAssign.size}")
      val gotRejects =
        if (!cmds.tableExists("vector_ingest_rejects")) Set.empty[Long]
        else cmds.table("vector_ingest_rejects")
          .filter(col("vec_id") >= 9600000L)
          .groupBy(col("vec_id")).count().collect()
          .map { r => assert(r.getLong(1) == 1L,
            s"poison row ${r.getLong(0)} quarantined ${r.getLong(1)}x")
            r.getLong(0) }.toSet
      assert(gotRejects == committedPoison.toSet,
        s"soak diverged on the quarantine log: ${gotRejects.size} vs " +
          s"${committedPoison.size}")
      // ── and the cross-table VERIFY audit agrees ──────────────────────
      val e = new Engine(spark, d, wh)
      try {
        assert(e.sql(s"VERIFY $codesT").head.getString(0)
          .contains("invariants hold"))
        assert(e.sql(s"VERIFY $assignT").head.getString(0)
          .contains("invariants hold"))
      } finally e.close()
    } finally {
      operators.VectorIndex.drop(spark, cmds)
      ()
    }
  }
}
