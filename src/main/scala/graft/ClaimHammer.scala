package graft

/** Cross-PROCESS mutual-exclusion hammer for the per-table sink claims —
  * the child-JVM half of the LifecycleGuardsSpec cross-process race test.
  *
  * The in-JVM race specs never contend on the claim fence's cross-process
  * primitive: `TableCommands.withClaimLock` serializes same-JVM engines on
  * a shared monitor BEFORE the advisory `FileChannel` lock is touched, so
  * only separate JVMs exercise link(2)-create + file-lock under real
  * contention. This main hammers `claimSink`/`releaseSinkIfRun` on one
  * table from its own process; while it holds the claim it drops a
  * `held.<owner>` marker and checks for any OTHER holder's marker — two
  * markers alive at once means two processes held the single-writer claim
  * together, and a `VIOLATION` file records it for the parent spec.
  *
  * Claim-path only — no SparkSession is ever created (the claim methods
  * are pure NIO; the spec passes a null session deliberately).
  *
  * args: warehouse-dir, owner-tag, rounds, scratch-dir (markers + results)
  */
object ClaimHammer {
  def main(args: Array[String]): Unit = {
    val Array(wh, owner, roundsS, scratch) = args
    val rounds = roundsS.toInt
    val cmds = new commands.TableCommands(null, wh)
    val dir = java.nio.file.Paths.get(scratch)
    java.nio.file.Files.createDirectories(dir)
    val mine = dir.resolve(s"held.$owner")
    var wins = 0L
    var refused = 0L
    (1 to rounds).foreach { i =>
      val nonce =
        try Some(cmds.claimSink("xproc_sink", owner))
        catch { case _: IllegalStateException => refused += 1; None }
      nonce.foreach { n =>
        wins += 1
        java.nio.file.Files.writeString(mine, i.toString)
        // the hold window: any OTHER held.* marker now is a second
        // process inside the single-writer claim
        val others = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("held.") &&
            f.getName != mine.getFileName.toString)
        if (others.nonEmpty)
          java.nio.file.Files.writeString(dir.resolve("VIOLATION"),
            s"$owner round $i overlapped ${others.map(_.getName).mkString(",")}\n",
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
        java.nio.file.Files.deleteIfExists(mine)
        cmds.releaseSinkIfRun("xproc_sink", n)
      }
    }
    java.nio.file.Files.writeString(dir.resolve(s"wins.$owner"),
      s"$wins $refused")
    ()
  }
}
