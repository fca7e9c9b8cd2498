package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed metadata, and run decode / feature-extraction as per-partition
  * batch logic over a typed Dataset (the Scala analog of `mapInPandas` —
  * one iterator per partition, so a decoder amortizes codec/model setup
  * across the batch).
  *
  * Two decode paths:
  *  - m95: byte-level feature extraction ([[MultimodalStub.decode]]) — the
  *    schema/partitioning/batch-shape baseline;
  *  - m97: a REAL binary-format decoder — [[WavCodec.decode]] parses a
  *    canonical RIFF/WAVE header (magics, little-endian u16/u32 fields)
  *    from payloads the plan itself assembles byte-for-byte with Spark
  *    expressions. The oracle recomputes the expected fields from the
  *    construction formulas, so a mis-parsed offset or endianness bug
  *    hash-mismatches. (Compressed codecs — JPEG/FLAC/H.264 — don't ship in
  *    this container; WAV's uncompressed layout exercises the same typed
  *    header-parse path.)
  */
object Multimodal {

  /** Opaque payload row: what an image/audio table looks like at rest. */
  case class Blob(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features (what a byte-level extractor emits per asset). */
  case class BlobFeatures(doc_id: Long, n_bytes: Int, head_byte: Int,
      byte_sum: Long)

  object MultimodalStub {
    /** Byte-level feature extractor — deterministic features over the raw
      * payload, the codec-free baseline next to [[WavCodec]]'s real header
      * decode. */
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff,
        sum % 65536)
    }
  }

  /** Decoded WAV header fields (m97's output schema). */
  case class WavMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, byte_rate: Int, block_align: Int,
      data_bytes: Int, valid: Boolean)

  object WavCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse a canonical 44-byte-header RIFF/WAVE PCM file. All multi-byte
      * fields are little-endian per the RIFF spec. Returns header fields
      * plus a validity flag covering magics, PCM format tag, and size
      * consistency (riff_size = 36 + data_size = payload - 8). */
    def decode(docId: Long, b: Array[Byte]): WavMeta = {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE" ||
          tag(b, 12) != "fmt " || tag(b, 36) != "data")
        WavMeta(docId, -1, -1, -1, -1, -1, -1, valid = false)
      else {
        val fmtSize = u32(b, 16); val audioFormat = u16(b, 20)
        val channels = u16(b, 22); val sampleRate = u32(b, 24)
        val byteRate = u32(b, 28); val blockAlign = u16(b, 32)
        val bits = u16(b, 34); val dataSize = u32(b, 40)
        val ok = fmtSize == 16 && audioFormat == 1 &&
          u32(b, 4) == 36 + dataSize && b.length == 44 + dataSize &&
          byteRate == sampleRate * channels * bits / 8 &&
          blockAlign == channels * bits / 8
        WavMeta(docId, sampleRate, channels, bits, byteRate, blockAlign,
          dataSize, ok)
      }
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
      "m97_wav_decode", // REAL structured-byte decode: the plan assembles a
                        // canonical RIFF/WAVE payload (44-byte header +
                        // UTF-8 text bytes as stand-in PCM) with pure Spark
                        // expressions — little-endian fields via hex
                        // reordering — and the typed mapPartitions decoder
                        // parses it back. The oracle recomputes every field
                        // from the construction formulas, so any parser
                        // offset/endianness bug breaks the hash-match.
      (s, d) => {
        import s.implicits._
        // little-endian hex of a 32/16-bit value (RIFF is little-endian)
        def le32(v: Column): Column = {
          val h = lpad(hex(v.cast("int")), 8, "0")
          concat(substring(h, 7, 2), substring(h, 5, 2),
            substring(h, 3, 2), substring(h, 1, 2))
        }
        def le16(v: Column): Column = {
          val h = lpad(hex(v.cast("int")), 4, "0")
          concat(substring(h, 3, 2), substring(h, 1, 2))
        }
        val sampleRate = lit(8000) + (col("doc_id") % 4).cast("int") * 4000
        val channels = lit(1) + (col("doc_id") % 2).cast("int")
        val bits = lit(16)
        val dataSize = octet_length(encode(col("text"), "UTF-8"))
        val byteRate = sampleRate * channels * bits / lit(8)
        val blockAlign = channels * bits / lit(8)
        val payloadHex = concat(
          lit("52494646"), le32(dataSize + 36), lit("57415645"), // RIFF..WAVE
          lit("666D7420"), le32(lit(16)), le16(lit(1)),          // fmt , PCM
          le16(channels), le32(sampleRate), le32(byteRate),
          le16(blockAlign), le16(bits),
          lit("64617461"), le32(dataSize),                       // data
          hex(encode(col("text"), "UTF-8")))
        val blobs = Graft.table(s, d, "documents")
          .select(col("doc_id"), unhex(payloadHex).as("payload"),
            lit("audio/wav").as("mime"))
          .as[Blob]
        blobs.mapPartitions(_.map(b => WavCodec.decode(b.doc_id, b.payload)))
          .toDF()
      },
      Some("""SELECT doc_id,
                     CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
                     CAST(1 + doc_id % 2 AS INT) AS channels,
                     16 AS bits_per_sample,
                     CAST((8000 + (doc_id % 4) * 4000) * (1 + doc_id % 2) * 2
                          AS INT) AS byte_rate,
                     CAST((1 + doc_id % 2) * 2 AS INT) AS block_align,
                     CAST(octet_length(encode(text)) AS INT) AS data_bytes,
                     TRUE AS valid
              FROM documents""")),

    QueryDef(
      "m96_frame_sample", // frame-sampling plumbing: treat the payload as
                          // fixed-size frames, keep every 4th, fingerprint
                          // each — the schema/partition/batch shape of video
                          // keyframe extraction with a byte-chunk stand-in
      (s, d) => {
        val frameSize = 16; val every = 4
        // empty-text guard: DuckDB's floor division gives (0-1)//16 = -1 →
        // zero frames, while Spark's `div` truncates toward zero → frame 0;
        // an empty doc must yield NO frames in both engines (explode of an
        // empty array drops the row)
        Graft.table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            explode(when(length(col("text")) > 0,
              sequence(lit(0), expr(s"(length(text) - 1) div $frameSize")))
              .otherwise(typedLit(Seq.empty[Long]))).as("frame_idx"))
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
