package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.commands.TableCommands
import graft.operators.Similarity

/** Streaming transforms over an EMBEDDING stream (vec_id, embedding) — the
  * ingest leg of the vector-index lifecycle. BUILD (batch) trains and
  * materializes the index; the serve queries (s100–s105) read it; this
  * object is the third leg: vectors that arrive AFTER the build are routed
  * and compressed ON INGEST so the growing segment carries the same
  * (cluster, codes) artifact rows the stored tables hold — exactly the
  * Milvus/Lucene growing-segment discipline, and the producer of s104's
  * fresh tier once the segment is flushed.
  *
  * Possible statelessly because both model artifacts are k-bounded: the
  * coarse centroids and the PQ codebook freeze driver-side at stream start
  * ([[Similarity.freezeIndex]]) and ride the plan as literals, so each
  * arriving vector is one map-side argmax + 8 subspace argmins — no state
  * store, no shuffle, any throughput.
  */
object VectorStreams {

  /** Collect the frozen model artifacts from served index frames (or any
    * centroids/codebook pair with the build schema). */
  def freeze(centroids: DataFrame, codebook: DataFrame)
      : (Seq[Similarity.FrozenCent], Seq[Similarity.FrozenBookM]) =
    Similarity.freezeIndex(centroids, codebook)

  /** Route + PQ-encode each arriving vector against the frozen index.
    * Output rows (vec_id, cluster, codes) are bit-identical to what BUILD
    * would have written for the same vectors — the parity spec proves it
    * against the stored assign/codes tables. Identical code path for
    * batch (`spark.read`) and stream (`spark.readStream`). */
  def routeAndEncode(vecs: DataFrame,
      cents: Seq[Similarity.FrozenCent],
      book: Seq[Similarity.FrozenBookM]): DataFrame =
    Similarity.routeAndEncodeFrozen(vecs, cents, book)

  /** Streaming query SERVING — the fourth leg of the lifecycle: a live
    * stream of (q_id, embedding) query vectors is answered one
    * micro-batch at a time by the batch two-tier kernel
    * ([[Similarity.searchVectors]] — stored-index ADC tier + fresh-delta
    * brute force) and landed EXACTLY-ONCE in a warehouse results table
    * (`insertCommitted`: the answer version and its batch marker commit
    * in one pointer rename, so a crash-replayed batch is recognized and
    * skipped — an online serving log must not double-answer). Each
    * micro-batch plans exactly the batch plan (queries broadcast, one
    * ADC chain + one coverage anti-join), so streamed answers are
    * bit-identical to batch answers for the same query set — the parity
    * spec proves it. Scale shape: per-batch cost is the serve kernel's
    * (query-bounded broadcasts against the immutable index tables);
    * nothing accumulates in the stream — no state store, any query
    * rate that the per-batch serve latency sustains. */
  /** Streaming SEMANTIC-DECONTAMINATION gate — d103's ingest twin: each
    * arriving (vec_id, embedding) micro-batch is checked against the
    * corpus's eval slice by the batch kernel
    * ([[Similarity.decontamVectors]] — map-side centroid routing, then a
    * cluster equi-join against the eval side, never batch×eval), and the
    * flagged rows (vec_id, cluster, eval_id, sim — best eval match with
    * provenance) land EXACTLY-ONCE in a warehouse table via
    * `insertCommitted` (a crash-replayed batch is recognized by its
    * batch marker and skipped — a contamination audit log must not
    * double-report). Because each micro-batch plans exactly the batch
    * plan, streamed verdicts are bit-identical to batch d103 verdicts
    * for the same vectors — the parity spec proves it. Scale shape:
    * per-batch cost is the gate kernel's (batch-bounded candidate side,
    * broadcast centroids, cluster-key shuffle of the batch); nothing
    * accumulates in the stream — no state store, any arrival rate the
    * per-batch check latency sustains. */
  def decontamGate(vecStream: DataFrame, d: String, cmds: TableCommands,
      table: String, thr: Double = 0.3): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          cmds.insertCommitted(table,
            Similarity.decontamVectors(batch.sparkSession, d, batch, thr),
            batchId)
        ()
      }
      .start()

  def serve(queryStream: DataFrame, d: String, cmds: TableCommands,
      table: String, k: Int = 3): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // skip empty batches: creating a table from one would publish a
        // schema-less version, and replaying an empty append is a no-op
        if (!batch.isEmpty)
          cmds.insertCommitted(table,
            Similarity.searchVectors(batch.sparkSession, d, batch, k),
            batchId)
        ()
      }
      .start()
}
