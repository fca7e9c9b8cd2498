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

  /** Bind an ephemeral server socket, then serve `df`'s rows to the first
    * client that connects, in the background. Returns (port, await): call
    * `await()` to wait for completion — it RETHROWS any serving failure
    * (query error, client disconnect), so a truncated stream can't read as
    * success. A disconnected client is detected via `checkError` and stops
    * the drain instead of silently pumping the whole result to nobody. */
  def serve(df: DataFrame): (Int, () => Unit) = {
    val server = new ServerSocket(0)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread(() => {
      try {
        val client = server.accept()
        try {
          val out = new PrintWriter(client.getOutputStream)
          def emit(line: String): Unit = {
            out.println(line)
            if (out.checkError())
              throw new java.io.IOException("client disconnected mid-stream")
          }
          emit(df.columns.mkString(","))
          df.toLocalIterator().forEachRemaining { row =>
            emit((0 until row.length).map { i =>
              val v = if (row.isNullAt(i)) "" else String.valueOf(row.get(i))
              if (v.exists(c => c == ',' || c == '"' || c == '\n'))
                "\"" + v.replace("\"", "\"\"") + "\""
              else v
            }.mkString(","))
          }
          out.flush()
          if (out.checkError())
            throw new java.io.IOException("client disconnected at flush")
        } finally client.close()
      } catch { case e: Throwable => failure.set(e) }
      finally server.close()
    }, "graft-tuple-server")
    t.setDaemon(true)
    t.start()
    val await = () => {
      t.join(120000)
      if (failure.get() != null) throw failure.get()
      if (t.isAlive) throw new IllegalStateException("tuple server still running")
    }
    (server.getLocalPort, await)
  }
}
