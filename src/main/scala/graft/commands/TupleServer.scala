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
    * client that connects, in the background. Returns (port, thread); join
    * the thread to wait for completion. Any serving error is rethrown on
    * join via the thread's uncaught handler storage. */
  def serve(df: DataFrame): (Int, Thread) = {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val client = server.accept()
      try {
        val out = new PrintWriter(client.getOutputStream)
        out.println(df.columns.mkString(","))
        df.toLocalIterator().forEachRemaining { row =>
          out.println((0 until row.length).map { i =>
            val v = if (row.isNullAt(i)) "" else String.valueOf(row.get(i))
            if (v.exists(c => c == ',' || c == '"' || c == '\n'))
              "\"" + v.replace("\"", "\"\"") + "\""
            else v
          }.mkString(","))
        }
        out.flush()
      } finally {
        client.close()
        server.close()
      }
    }, "graft-tuple-server")
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, t)
  }
}
