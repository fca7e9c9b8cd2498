package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 guard pins: the stale-read retry's exception-TYPE match, the
  * retain-default rollback on refused stream starts (both the engine's
  * ingest path and the Scala-API twin path, including partial-claim
  * rollback), the malformed-registration PURGE message, and engine
  * construction surviving a corrupt pinned version dir. Each test is the
  * "done" criterion of a round-11 verdict ask or an ADVICE finding. */
class Round12GuardsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def freshWh(tag: String): String =
    Files.createTempDirectory(s"graft_${tag}_wh").toString

  test("staleRead matches the exception TYPE, not only the message: a raw " +
      "java.io.FileNotFoundException carries just the missing path as its " +
      "message (driver-side listing/footer reads surface it unwrapped), " +
      "so a message-only check killed the stream instead of retrying") {
    import streaming.VectorStreams.staleRead
    // unwrapped FNF, message is a bare path — the case the fix covers
    assert(staleRead(
      new java.io.FileNotFoundException("/wh/codes/v00007/part-0.parquet")))
    // FNF buried in a cause chain under generic wrappers
    assert(staleRead(new RuntimeException("job aborted",
      new java.io.FileNotFoundException("/wh/assign/v00003/part-1.parquet"))))
    // the pre-existing message-shaped signals still match
    assert(staleRead(new RuntimeException(
      "[FAILED_READ_FILE.FILE_NOT_EXIST] could not read file")))
    assert(staleRead(new RuntimeException(
      "java.io.FileNotFoundException: /wh/x.parquet was not found")))
    // a genuine fault is NOT a stale read — it must kill the stream
    assert(!staleRead(new RuntimeException("executor lost")))
    assert(!staleRead(new IllegalStateException("marker disagreement",
      new RuntimeException("torn pair"))))
  }

  test("a refused START ADMIT INGEST leaves no RETAIN-only table dirs: " +
      "the retain default lands AFTER the sink claims succeed, so a " +
      "foreign claim on one sink rolls everything back — before the fix " +
      "a later unrelated CREATE TABLE silently inherited retain=5") {
    val wh = freshWh("retainroll")
    val e1 = new Engine(spark, d, wh)
    val watch = Files.createTempDirectory("graft_retainroll_watch").toString
    try {
      e1.sql("BUILD DEDUP INDEX ON documents")
      // the verdict log does not exist yet (created lazily by the first
      // batch) — exactly the table whose dir the bug strands
      assert(!Files.exists(Paths.get(wh, "ingest_verdicts")))
      e1.storage.claimSink("ingest_verdicts", "other:twin")
      val err = intercept[Exception] {
        e1.sql(s"START ADMIT INGEST FROM '$watch' AS gate")
      }
      assert(err.getMessage.contains("single-writer"), err.getMessage)
      // no RETAIN-only dir stranded; registry rolled back; the foreign
      // claim untouched
      assert(!Files.exists(Paths.get(wh, "ingest_verdicts")),
        "refused START stranded a RETAIN-only ingest_verdicts dir")
      assert(e1.sql("SHOW INGESTS").isEmpty)
      assert(e1.storage.sinkOwner("ingest_verdicts").contains("other:twin"))
      // a later CREATE TABLE of the same name starts with NO retain
      // window (the inheritance the advice named)
      e1.storage.releaseSink("ingest_verdicts")
      e1.sql("CREATE TABLE ingest_verdicts (doc_id BIGINT)")
      assert(!e1.storage.hasRetain("ingest_verdicts"),
        "CREATE TABLE inherited a retain window from a refused START")
      e1.sql("DROP TABLE ingest_verdicts")
      // and a successful START still defaults retain=5 on its sinks
      val ok = e1.sql(s"START ADMIT INGEST FROM '$watch' AS gate")
      assert(ok.head.getString(0).contains("started admit ingest gate"))
      assert(e1.storage.hasRetain("ingest_verdicts"))
      e1.sql("STOP INGEST gate")
    } finally {
      e1.sql("DROP DEDUP INDEX ON documents")
      e1.close()
    }
  }

  test("a refused Scala-API twin start rolls back partial claims AND its " +
      "retain defaults: a foreign claim on the SECOND sink releases the " +
      "first sink's just-acquired claim and strands no RETAIN-only dirs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e1 = new Engine(spark, d, freshWh("twinroll"))
    try {
      // foreign owner on the REJECTS table: serve claims (table, rejects)
      // in order, so the refusal lands after table's claim is acquired
      e1.storage.claimSink("svc_roll_rejects", "other:twin")
      val src = MemoryStream[(Long, Seq[Double])]
      val err = intercept[IllegalStateException] {
        streaming.VectorStreams.serve(
          src.toDF().toDF("q_id", "embedding"), d, e1.storage, "svc_roll")
      }
      assert(err.getMessage.contains("single-writer"), err.getMessage)
      // the first table's fresh claim released, the foreign claim intact
      assert(e1.storage.sinkOwner("svc_roll").isEmpty,
        "partial claim leaked: svc_roll stayed claimed by a twin that " +
          "never started")
      assert(e1.storage.sinkOwner("svc_roll_rejects").contains("other:twin"))
      // no RETAIN-only dirs for either sink
      assert(!e1.storage.hasRetain("svc_roll"))
      assert(!e1.storage.hasRetain("svc_roll_rejects"))
      assert(!e1.storage.tableExists("svc_roll"))
    } finally e1.close()
  }

  test("STOP INGEST <name> FORCE PURGE on a malformed registration " +
      "reports the checkpoint was NOT purged: an unparseable entry has " +
      "no recoverable kind, so no rotation floor was recorded and " +
      "claiming a purge would be a lie") {
    val wh = freshWh("malformedreg")
    val e1 = new Engine(spark, d, wh)
    try {
      val reg = Paths.get(wh, "_ingest_registry")
      Files.createDirectories(reg)
      // a crash mid-write predating the atomic rename: content with no
      // tab separator parses as kind "?"
      Files.writeString(reg.resolve("badgate"), "garbage-without-a-tab")
      val shown = e1.sql("SHOW INGESTS").collect()
      assert(shown.exists(_.getString(0) == "badgate"))
      // non-FORCE refuses (may belong to a live engine elsewhere)
      intercept[IllegalStateException] { e1.sql("STOP INGEST badgate PURGE") }
      val msg = e1.sql("STOP INGEST badgate FORCE PURGE").head.getString(0)
      assert(msg.contains("NOT purged"), msg)
      assert(msg.contains("malformed"), msg)
      assert(e1.sql("SHOW INGESTS").isEmpty)
    } finally e1.close()
  }

  test("engine construction survives an empty/corrupt pinned version " +
      "dir: snapshotPath's require covers a REMOVED dir, but an existing-" +
      "yet-empty one makes spark.read.parquet throw AnalysisException — " +
      "any unreadable pin is skipped, never fatal, and SHOW SNAPSHOTS " +
      "still lists it as not viewable") {
    val wh = freshWh("corruptpin")
    val e1 = new Engine(spark, d, wh)
    try {
      e1.sql("CREATE TABLE pt (x INT)")
      e1.sql("INSERT INTO pt VALUES (1)")
      val ver = e1.storage.versionHistory("pt").last
      e1.sql(s"SNAPSHOT pt VERSION AS OF '$ver' AS pt_corrupt_pin")
      // simulate the damage: empty the pinned version dir in place
      // (dir exists, zero parquet files -> unreadable, not missing)
      val vdir = Paths.get(wh, "pt", ver)
      Option(vdir.toFile.listFiles()).getOrElse(Array.empty)
        .foreach(f => assert(f.delete(), s"could not empty $f"))
      // the session-scoped view must be gone so the new engine attempts
      // re-registration (a restart's shape; the shared test session
      // would otherwise mask the read)
      spark.catalog.dropTempView("pt_corrupt_pin")
      // the construction under test: must not throw
      val e2 = new Engine(spark, d, wh)
      try {
        val snaps = e2.sql("SHOW SNAPSHOTS").collect()
          .map(r => (r.getString(0), r.getBoolean(3)))
        assert(snaps.contains(("pt_corrupt_pin", false)),
          s"broken pin not listed as unviewable: ${snaps.mkString(", ")}")
        // and the engine is alive: a normal query still runs
        assert(e2.sql("SELECT 1 AS one").head.getInt(0) == 1)
        e2.sql("DROP SNAPSHOT pt_corrupt_pin")
      } finally e2.close()
    } finally e1.close()
  }
}
