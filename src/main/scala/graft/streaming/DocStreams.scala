package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Streaming transforms over a DOCUMENT stream (doc_id, text) — the
  * streaming twin of the batch dedup surface (operators.SimHash /
  * operators.Dedup). Possible only because the SimHash signature is a
  * map-side codegen kernel ([[graft.functions.SimHash60]]): each arriving
  * document gets its signature statelessly, so the only streaming state is
  * the dedup key set.
  */
object DocStreams {

  /** Content dedup on a document stream: signature per row (stateless),
    * then first-writer-wins on the signature. Identical code path for
    * batch (`spark.read`) and stream (`spark.readStream`).
    *
    * State note: with no event-time column on documents this uses unbounded
    * `dropDuplicates` state — the 100 TB deployment attaches an ingest
    * timestamp and swaps in `dropDuplicatesWithinWatermark` (same shape as
    * `EventStreams.streamingDedup`) so state is watermark-evicted.
    */
  def contentDedup(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        GraftFunctions.simhash60(col("text")).as("simhash"))
      .dropDuplicates("simhash")
      .select("doc_id", "simhash")
}
