package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.commands.TableCommands

/** Structured Streaming → warehouse bridge: a stream lands in a
  * manifest-pointer table ([[TableCommands]]) one micro-batch at a time.
  *
  * Each batch goes through the same `insertInto` as batch INSERT — appends
  * write into the CURRENT version directory under Spark's output-commit
  * protocol, and an open transaction upgrades the append to a COW publish.
  * So a streaming ingest gets the storage layer's guarantees (atomic
  * version visibility, BEGIN/ROLLBACK, VERIFY, OPTIMIZE compaction) with
  * no sink-specific code — the reference's `InsertCommand` semantics on a
  * live stream. `foreachBatch` re-delivers a batch after a failure, so the
  * sink is at-least-once into an append table (exactly-once needs a
  * batchId-keyed dedup on read, or the dedup operators upstream).
  */
object WarehouseSink {

  /** Start appending `df` (a streaming frame) into warehouse `table`,
    * creating the table from the first non-empty batch if needed. */
  def start(df: DataFrame, cmds: TableCommands, table: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // never create from an EMPTY first batch: it would publish a
        // version dir with no parquet files, which readers can't infer a
        // schema from (appends of empty batches to an existing table are
        // harmless no-ops)
        if (cmds.tableExists(table)) cmds.insertInto(table, batch)
        else if (!batch.isEmpty) cmds.createTable(table, batch)
        ()
      }
      .start()
}
