package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed metadata, and run decode / feature-extraction as per-partition
  * batch logic over a typed Dataset (the Scala analog of `mapInPandas` —
  * one iterator per partition, so a real decoder would amortize model /
  * codec setup across the batch).
  *
  * No media libraries ship in this container, so [[MultimodalStub.decode]]
  * is a clearly-marked deterministic stand-in; everything around it — the
  * binary column, metadata struct, partitioning, batch iterator shape, and
  * output schema — is the real 100 TB plumbing and is oracle-checked.
  */
object Multimodal {

  /** Opaque payload row: what an image/audio table looks like at rest. */
  case class Blob(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features (what a real decoder would emit per asset). */
  case class BlobFeatures(doc_id: Long, n_bytes: Int, head_byte: Int,
      byte_sum: Long)

  object MultimodalStub {
    /** STUB decoder — a real pipeline would decode image/audio here
      * (e.g. JPEG -> pixels -> embedding). Deterministic byte-level
      * features stand in so the plumbing is testable without codecs. */
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff,
        sum % 65536)
    }
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "m95_multimodal_features",
      (s, d) => {
        import s.implicits._
        val blobs = Graft.table(s, d, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"),
            lit("text/plain").as("mime"))
          .as[Blob]
        blobs.mapPartitions { it =>
          it.map { b =>
            val (n, head, sum) = MultimodalStub.decode(b.payload)
            BlobFeatures(b.doc_id, n, head, sum)
          }
        }.toDF()
      },
      // ASCII corpus (verified): per-char code points == utf8 bytes. The
      // empty-doc guard matters even so: string_split('', '') is [''] and
      // ord('') = -1 in DuckDB, where the Spark stub sums zero bytes to 0.
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                     CAST(ord(substr(text, 1, 1)) AS INT) AS head_byte,
                     CAST(CASE WHEN LENGTH(text) = 0 THEN 0
                               ELSE list_sum(list_transform(string_split(text, ''),
                                                            c -> ord(c))) % 65536
                          END AS BIGINT) AS byte_sum
              FROM documents"""))
    ,
    QueryDef(
      "m96_frame_sample", // frame-sampling plumbing: treat the payload as
                          // fixed-size frames, keep every 4th, fingerprint
                          // each — the schema/partition/batch shape of video
                          // keyframe extraction with a byte-chunk stand-in
      (s, d) => {
        val frameSize = 16; val every = 4
        Graft.table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0),
              expr(s"(length(text) - 1) div $frameSize"))).as("frame_idx"))
          .filter(col("frame_idx") % every === 0)
          .select(col("doc_id"), col("frame_idx"),
            md5(expr(s"substring(text, frame_idx * $frameSize + 1, $frameSize)"))
              .as("frame_hash"))
      },
      Some("""SELECT doc_id, frame_idx,
                     md5(substr(text, frame_idx * 16 + 1, 16)) AS frame_hash
              FROM (SELECT doc_id, text,
                           unnest(range(0, ((LENGTH(text) - 1) // 16) + 1)) AS frame_idx
                    FROM documents)
              WHERE frame_idx % 4 = 0"""))
  )
}
