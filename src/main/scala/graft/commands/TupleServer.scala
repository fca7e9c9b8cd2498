package graft.commands

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.DataFrame

/** The reference's `TupleSender` — the plan node that streams result tuples
  * to a connected client socket (SURVEY.md §2.1) — re-expressed as a
  * client-edge utility: serve a DataFrame's rows to one client as
  * header-prefixed CSV lines.
  *
  * Like `df.show`, the client edge is inherently a single point; the
  * compute stays distributed and rows stream through the driver via
  * `toLocalIterator` (one partition buffered at a time, never a full
  * `collect`), so serving 10⁹ rows needs driver memory for one partition,
  * not the result.
  */
object TupleServer {

  /** Handle on a background serve: `port` to connect to, `await()` to wait
    * for completion — it RETHROWS any serving failure (query error, client
    * disconnect), so a truncated stream can't read as success. `await`
    * blocks indefinitely by default (a 10⁹-row stream takes as long as it
    * takes); pass a timeout to bound the wait, in which case still-running
    * is reported as an error. */
  final case class Handle(port: Int, private val thread: Thread,
      private val failure: java.util.concurrent.atomic.AtomicReference[Throwable]) {
    def await(timeoutMs: Long = 0L): Unit = {
      thread.join(timeoutMs)
      if (failure.get() != null) throw failure.get()
      if (thread.isAlive)
        throw new IllegalStateException(s"tuple server still running after ${timeoutMs} ms")
    }
  }

  /** Bind an ephemeral server socket, then serve `df`'s rows to the first
    * client that connects, in the background. Client disconnects are
    * detected via `checkError` every [[CheckEvery]] rows — `checkError`
    * flushes, so a per-row check would turn every row into its own socket
    * write and defeat buffering on the very path meant for large results. */
  def serve(df: DataFrame): Handle = {
    val server = new ServerSocket(0)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread(() => {
      try {
        val client = server.accept()
        try {
          val out = new PrintWriter(new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(client.getOutputStream,
              java.nio.charset.StandardCharsets.UTF_8)))
          var emitted = 0L
          def emit(line: String): Unit = {
            out.println(line)
            emitted += 1
            if (emitted % CheckEvery == 0 && out.checkError())
              throw new java.io.IOException("client disconnected mid-stream")
          }
          emit(df.columns.mkString(","))
          df.toLocalIterator().forEachRemaining(row => emit(csvLine(row)))
          out.flush()
          if (out.checkError())
            throw new java.io.IOException("client disconnected at flush")
        } finally client.close()
      } catch { case e: Throwable => failure.set(e) }
      finally server.close()
    }, "graft-tuple-server")
    t.setDaemon(true)
    t.start()
    Handle(server.getLocalPort, t, failure)
  }

  private val CheckEvery = 1024L

  /** One result row as a CSV line (RFC-4180 quoting). Shared with
    * [[SharedServer]] so both serving surfaces frame rows identically. */
  private[commands] def csvLine(row: org.apache.spark.sql.Row): String =
    (0 until row.length).map { i =>
      val v = if (row.isNullAt(i)) "" else String.valueOf(row.get(i))
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    }.mkString(",")
}
