package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Little-endian byte readers shared by every header codec. */
  private object LE {
    def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  }

  object WavCodec {
    import LE.{u16, u32}
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

  /** Decoded BMP header fields (m98's output schema). */
  case class BmpMeta(doc_id: Long, width: Int, height: Int, bpp: Int,
      row_bytes: Int, image_bytes: Int, valid: Boolean)

  object BmpCodec {
    import LE.{u16, u32}

    /** Parse a BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes)
      * uncompressed 24-bpp BMP. Validity covers the magic, header sizes,
      * plane/compression constants, the 4-byte row padding rule
      * (row = ((width*3 + 3) / 4) * 4), and total-size consistency. */
    def decode(docId: Long, b: Array[Byte]): BmpMeta = {
      if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte)
        BmpMeta(docId, -1, -1, -1, -1, -1, valid = false)
      else {
        val fileSize = u32(b, 2); val pixelOffset = u32(b, 10)
        val dibSize = u32(b, 14); val width = u32(b, 18)
        val height = u32(b, 22); val planes = u16(b, 26)
        val bpp = u16(b, 28); val compression = u32(b, 30)
        val imageSize = u32(b, 34)
        // width/height are SIGNED int32 reads: negative dimensions can
        // satisfy every consistency equation below (width -1 → rowBytes
        // 0 → imageSize 0 → fileSize 54 == payload length) and then blow
        // up the pixel kernels (Array.ofDim(-1, ...) throws) — a crafted
        // 54-byte payload must degrade to valid=false, never a task
        // kill. The canonical subset this codec declares is bottom-up
        // (non-negative height) anyway. The consistency arithmetic is
        // done in Long: 32-bit `width*3` wraps for width ≥ 0x2AAAAAAB
        // (e.g. width=1431655766 → rowBytes 4), letting a 58-byte
        // payload with height=1 pass every Int equation and then index
        // past the buffer in the kernels; `rowBytes*height` wraps the
        // same way for large heights. A hard dimension cap (2^20 per
        // side, far above any real asset here) bounds the Int fields
        // the kernels consume even if a future equation slips.
        val maxDim = 1 << 20
        val rowBytesL = ((width.toLong * 3 + 3) / 4) * 4
        val ok = width >= 0 && height >= 0 &&
          width <= maxDim && height <= maxDim &&
          dibSize == 40 && planes == 1 && bpp == 24 &&
          compression == 0 && pixelOffset == 54 &&
          imageSize.toLong == rowBytesL * height &&
          fileSize.toLong == 54L + imageSize && b.length == fileSize
        BmpMeta(docId, width, height, bpp,
          if (ok) rowBytesL.toInt else -1, imageSize, ok)
      }
    }

    /** m99: nearest-neighbor 2× downsample — decode the header, then sample
      * the pixel at every even (row, col) and sum its 3 channel bytes. The
      * decode→transform→feature chain of an image-resize stage, with the
      * resampled content validated byte-for-byte (the oracle recomputes the
      * sampled-byte sum from the construction formulas, so any indexing,
      * stride, or padding slip in the sampler hash-mismatches). */
    def resample2x(docId: Long, b: Array[Byte]): BmpResample = {
      val m = decode(docId, b)
      if (!m.valid) BmpResample(docId, -1, -1, -1L, valid = false)
      else {
        var sum = 0L
        var r = 0
        while (r < m.height) {
          val base = 54 + r * m.row_bytes
          var c = 0
          while (c < m.width) {
            val o = base + 3 * c
            sum += (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
            c += 2
          }
          r += 2
        }
        BmpResample(docId, (m.width + 1) / 2, (m.height + 1) / 2, sum,
          valid = true)
      }
    }
  }

  /** m99's output: downsampled dimensions + sampled-content checksum. */
  case class BmpResample(doc_id: Long, out_w: Int, out_h: Int,
      sample_sum: Long, valid: Boolean)

  /** m101's per-image output: perceptual hash of the decoded pixel grid. */
  case class BmpBits(doc_id: Long, w: Int, h: Int, bits: String,
      valid: Boolean)

  case class BmpPhash(doc_id: Long, w: Int, h: Int, phash: String,
      valid: Boolean)

  object PerceptualHash {
    private def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.map(b => f"${b & 0xff}%02x").mkString
    }

    /** Average-hash (aHash) over a decoded BMP: one bit per pixel —
      * brightness above the image mean — read in VISUAL order (BMP rows are
      * stored bottom-up, so storage row h-1 is the top visual row; the
      * convention is co-specified with the oracle and pinned by a hand-built
      * image in the spec). Brightness is the integer sum of the 3 channel
      * bytes, and the mean test cross-multiplies (`gray*n > total`) so no
      * division ever rounds — the same bit pattern falls out on any engine.
      * The bit string is keyed with the dimensions and collapsed to md5, the
      * fixed-width group key the dedup shuffle partitions on. */
    /** The raw aHash bit string (visual top-down order) — m102's banded
      * near-dup needs the bits themselves, not the collapsed md5 key. */
    def aHashBits(docId: Long, b: Array[Byte]): BmpBits = {
      val m = BmpCodec.decode(docId, b)
      if (!m.valid) return BmpBits(docId, -1, -1, "", valid = false)
      val gray = Array.ofDim[Int](m.height, m.width)
      var total = 0L
      var r = 0
      while (r < m.height) {
        val base = 54 + r * m.row_bytes
        var c = 0
        while (c < m.width) {
          val o = base + 3 * c
          val g = (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
          gray(r)(c) = g
          total += g
          c += 1
        }
        r += 1
      }
      val n = m.height.toLong * m.width
      val bits = new StringBuilder(m.height * m.width)
      r = m.height - 1
      while (r >= 0) { // storage bottom-up → visual top-down
        var c = 0
        while (c < m.width) {
          bits.append(if (gray(r)(c) * n > total) '1' else '0')
          c += 1
        }
        r -= 1
      }
      BmpBits(docId, m.width, m.height, bits.toString, valid = true)
    }

    def aHash(docId: Long, b: Array[Byte]): BmpPhash = {
      val bb = aHashBits(docId, b)
      if (!bb.valid) BmpPhash(docId, -1, -1, "", valid = false)
      else BmpPhash(docId, bb.w, bb.h,
        md5hex(s"${bb.w}x${bb.h}:${bb.bits}"), valid = true)
    }
  }

  /** m100's output: one row per fixed-size PCM analysis window. */
  case class PcmWindow(doc_id: Long, win: Int, n_samples: Int,
      energy: Long, peak: Int, valid: Boolean)

  object PcmFeatures {
    /** Per-window features over a WAV payload's 16-bit LE PCM samples:
      * window index (fixed `winSize` samples, last window partial), energy
      * (sum of squared samples — exact integer, so engine-portable where a
      * float RMS would not hash-compare) and peak |amplitude|. One asset →
      * many feature rows: the flatMap shape of real audio featurizers
      * (MFCC frames, VAD windows), run through the same header codec as
      * m97 so a malformed payload degrades to a single invalid row. */
    def windows(docId: Long, b: Array[Byte], winSize: Int): Seq[PcmWindow] = {
      val m = WavCodec.decode(docId, b)
      if (!m.valid || m.bits_per_sample != 16)
        return Seq(PcmWindow(docId, -1, -1, -1L, -1, valid = false))
      val n = m.data_bytes / 2
      val out = scala.collection.mutable.ArrayBuffer.empty[PcmWindow]
      var w = 0
      while (w * winSize < n) {
        val end = math.min((w + 1) * winSize, n)
        var i = w * winSize
        var energy = 0L; var peak = 0
        while (i < end) {
          val s = (LE.u16(b, 44 + 2 * i) << 16) >> 16 // sign-extend int16
          energy += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        out += PcmWindow(docId, w, end - w * winSize, energy, peak,
          valid = true)
        w += 1
      }
      out.toSeq
    }

    /** m103's per-asset Haitsma-Kalker-style fingerprint, computed in the
      * SAME map-side pass as the decode: window count plus the delta-sign
      * bit string (bit w-1 = energy rose from window w-1 to w) over
      * [[windows]]' energies, so the bits cannot drift from m100's window
      * kernel. Returning the finished (n_win, bits) pair here — instead of
      * emitting window rows and reassembling them with a groupBy +
      * collect_list — keeps the corpus-sized decoded-window stream OFF the
      * network entirely: the asset's bytes and its windows live in one
      * task, so the first thing that shuffles is the ≤(id, bit-string)
      * fingerprint, invariant at any payload length. None = malformed
      * payload (the asset is excluded, matching m102's valid-flag
      * discipline). */
    def fingerprint(docId: Long, b: Array[Byte],
        winSize: Int): Option[(Int, String)] = {
      val ws = windows(docId, b, winSize)
      if (ws.exists(!_.valid)) None
      else {
        val es = ws.sortBy(_.win).map(_.energy)
        val sb = new java.lang.StringBuilder(math.max(es.length - 1, 0))
        var i = 1
        while (i < es.length) {
          sb.append(if (es(i) > es(i - 1)) '1' else '0')
          i += 1
        }
        Some((es.length, sb.toString))
      }
    }
  }

  /** m103's map-side fingerprint row: one per valid audio asset. */
  case class AudioFp(doc_id: Long, n_win: Int, bits: String)

  // little-endian hex of a 32/16-bit value (RIFF and BMP headers are both
  // little-endian) — byte-pairwise reorder of the big-endian hex string.
  // The value is masked to its low 32/16 bits FIRST: hex() of a negative
  // int renders the 16-char sign-extended bigint form, and lpad would keep
  // the high-order 'FFFFFFFF' prefix instead of the value's own bytes.
  private def le32(v: Column): Column = {
    val h = lpad(hex(v.cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }
  private def le16(v: Column): Column = {
    val h = lpad(hex(v.cast("long").bitwiseAND(lit(0xFFFFL))), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Plan-assembled canonical 24-bpp BMPs over `documents`: doc_id-derived
    * dims (width 4..16, height 1..7), little-endian file+DIB headers, the
    * 4-byte row-padding rule, and pixel content from `pixelsHex` — a
    * hex-string expression over the (doc_id, image_bytes, row_bytes, w, h)
    * columns. ONE header builder shared by m98 (constant fill) and m99
    * (position-dependent fill), so the formats cannot drift apart. */
  private def bmpBlobs(s: SparkSession, d: String, pixelsHex: Column,
      parallel: Boolean = true): org.apache.spark.sql.Dataset[Blob] = {
    import s.implicits._
    val width = (lit(4) + (col("doc_id") % 13)).cast("int")
    val height = (lit(1) + (col("doc_id") % 7)).cast("int")
    val w3 = width * 3 + 3
    val rowBytes = (w3 - pmod(w3, lit(4))).cast("int")
    (if (parallel) Graft.tableParallel(s, d, "documents")
     else Graft.table(s, d, "documents"))
      .select(col("doc_id"), rowBytes.as("row_bytes"),
        (rowBytes * height).as("image_bytes"),
        width.as("w"), height.as("h"))
      .select(col("doc_id"), unhex(concat(
        lit("424D"), le32(col("image_bytes") + 54), lit("00000000"),
        le32(lit(54)), le32(lit(40)), le32(col("w")), le32(col("h")),
        le16(lit(1)), le16(lit(24)), le32(lit(0)),
        le32(col("image_bytes")), le32(lit(2835)), le32(lit(2835)),
        le32(lit(0)), le32(lit(0)), pixelsHex)).as("payload"),
        lit("image/bmp").as("mime"))
      .as[Blob]
  }

  /** The m101 fixture blobs — pixel pattern keyed by doc_id mod 4 so
    * genuine duplicate groups exist. Shared by the m101 QueryDef and the
    * streaming image-dedup parity spec (stream and batch must hash the
    * SAME payloads). */
  private[graft] def m101Blobs(
      s: SparkSession, d: String): org.apache.spark.sql.Dataset[Blob] = {
    val pixHex = concat_ws("",
      transform(sequence(lit(0), col("image_bytes") - 1),
        i => lpad(hex(pmod(col("doc_id") % 4 * 31 + i, lit(256))), 2, "0")))
    bmpBlobs(s, d, pixHex)
  }

  /** The m104/m105/m106 synthetic frame stream: one row per 16-char
    * window of the text with its exact integer char-code-sum "energy" —
    * pure map-side generator + expression work, so it runs identically
    * over `spark.read` and `spark.readStream` (the streaming scene twin
    * feeds on exactly this frame shape). */
  private[graft] def frameEnergies(docs: DataFrame): DataFrame = {
    val frameSize = 16
    docs
      .select(col("doc_id"),
        explode(when(length(col("text")) > 0,
          sequence(lit(0), expr(s"(length(text) - 1) div $frameSize")))
          .otherwise(typedLit(Seq.empty[Long]))).as("frame_idx"),
        col("text"))
      .select(col("doc_id"), col("frame_idx"),
        aggregate(split(expr(
          s"substring(text, frame_idx * $frameSize + 1, $frameSize)"),
          ""), lit(0L), (a, c) => a + ascii(c)).as("energy"))
  }

  /** m105's per-frame scene assignment: (doc_id, frame_idx, energy,
    * scene_idx) — the lag delta and the running cut sum share ONE
    * doc-partitioned window spec. Shared by m105 (segment summary), m106
    * (keyframe selection) and the streaming parity spec. */
  private[graft] def sceneFrames(s: SparkSession, d: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    val frames = frameEnergies(
      Graft.tableParallel(s, d, "documents").select("doc_id", "text"))
    val cut = when(abs(col("energy") -
      lag(col("energy"), 1).over(byDoc)) > 150, 1).otherwise(0)
    frames.withColumn("scene_idx", sum(cut).over(
      byDoc.rowsBetween(Window.unboundedPreceding, 0)))
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
        // single-core on purpose: the hex(text) payload is cheap enough
        // that the repartition exchange costs more than it saves (A/B
        // 0.17 s vs 0.37 s min-of-5); the heavy per-sample synth queries
        // (m100/m103) take the tableParallel path instead.
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
      "m98_bmp_decode", // second real binary format, image-shaped: the plan
                        // assembles canonical 24-bpp BMPs (file + DIB
                        // headers, little-endian fields, the 4-byte row
                        // padding rule, A5-filled pixel rows) and the typed
                        // mapPartitions codec parses them back; the oracle
                        // recomputes width/height/row-padding arithmetic
                        // from the construction formulas, so offset,
                        // endianness, or padding bugs break the hash.
      (s, d) => {
        import s.implicits._
        // constant fill = trivial synth: the row-group-starved repartition
        // costs more than the single-core work it parallelizes (A/B: 0.14 s
        // min-of-5 vs 0.28 s with the exchange) — m99/m101/m102, whose
        // per-pixel hex synthesis dominates, stay on the parallel path.
        bmpBlobs(s, d, expr("repeat('A5', image_bytes)"), parallel = false)
          .mapPartitions(_.map(b => BmpCodec.decode(b.doc_id, b.payload)))
          .toDF()
      },
      Some("""SELECT doc_id,
             |       CAST(4 + doc_id % 13 AS INT) AS width,
             |       CAST(1 + doc_id % 7 AS INT) AS height,
             |       24 AS bpp,
             |       CAST(rb AS INT) AS row_bytes,
             |       CAST(rb * (1 + doc_id % 7) AS INT) AS image_bytes,
             |       TRUE AS valid
             |FROM (SELECT doc_id,
             |        ((4 + doc_id % 13) * 3 + 3)
             |          - (((4 + doc_id % 13) * 3 + 3) % 4) AS rb
             |      FROM documents)""".stripMargin)),

    QueryDef(
      "m99_bmp_resample", // image RESIZE stage over real binary payloads:
                          // the plan assembles 24-bpp BMPs whose pixel
                          // bytes vary by POSITION ((doc_id + offset) mod
                          // 256 — constant fill would make any sampler look
                          // correct), the typed codec decodes and
                          // nearest-neighbor 2×-downsamples each image, and
                          // the oracle recomputes the sampled-byte checksum
                          // from the construction formulas — stride,
                          // padding, and indexing slips hash-mismatch. (The
                          // sampling CONVENTION — even stored rows, which in
                          // BMP's bottom-up order count from the image
                          // bottom — is co-specified with the oracle, so a
                          // convention disagreement is pinned by the
                          // hand-built-image spec, not the hash.)
                          // Batch shape: one codec call per row inside
                          // mapPartitions (decoder setup amortized per
                          // partition), byte math only — no shuffle at all.
      (s, d) => {
        import s.implicits._
        val pixHex = concat_ws("",
          transform(sequence(lit(0), col("image_bytes") - 1),
            i => lpad(hex(pmod(col("doc_id") + i, lit(256))), 2, "0")))
        bmpBlobs(s, d, pixHex)
          .mapPartitions(_.map(b => BmpCodec.resample2x(b.doc_id, b.payload)))
          .toDF()
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, CAST(4 + doc_id % 13 AS INT) AS w,
             |         CAST(1 + doc_id % 7 AS INT) AS h,
             |         ((4 + doc_id % 13) * 3 + 3)
             |           - (((4 + doc_id % 13) * 3 + 3) % 4) AS rb
             |  FROM documents),
             |rws AS (SELECT doc_id, w, h, rb, unnest(range(0, h, 2)) AS r
             |        FROM dims),
             |cells AS (SELECT doc_id, w, h, rb, r, unnest(range(0, w, 2)) AS c
             |          FROM rws)
             |SELECT doc_id, CAST((w + 1) // 2 AS INT) AS out_w,
             |       CAST((h + 1) // 2 AS INT) AS out_h,
             |       CAST(SUM((doc_id + r * rb + 3 * c) % 256
             |              + (doc_id + r * rb + 3 * c + 1) % 256
             |              + (doc_id + r * rb + 3 * c + 2) % 256) AS BIGINT)
             |         AS sample_sum,
             |       TRUE AS valid
             |FROM cells GROUP BY doc_id, w, h""".stripMargin)),

    QueryDef(
      "m100_audio_energy", // audio FEATURE-EXTRACTION stage over real WAV
                           // payloads: the plan assembles mono 16-bit PCM
                           // whose samples vary by position ((doc_id*7 +
                           // i*13) mod 2^16, sign-interpreted — constant
                           // fill would hide stride/offset bugs), and the
                           // typed codec emits one row per 32-sample
                           // analysis window (flatMap shape: one asset →
                           // many feature rows, like MFCC/VAD framing).
                           // Energy is the exact integer sum of squares —
                           // a float RMS would not hash-compare; callers
                           // take sqrt(energy/n) at the edge. Last window
                           // is partial (doc lengths are not multiples of
                           // 32), pinning the boundary arithmetic. Zero
                           // shuffle: header build, decode, and windowing
                           // are all per-row map-side work.
      (s, d) => {
        import s.implicits._
        val nSamples = (lit(64) + (col("doc_id") % 64)).cast("int")
        val dataSize = nSamples * 2
        val sampleRate = lit(8000); val channels = lit(1); val bits = lit(16)
        val byteRate = sampleRate * channels * bits / lit(8)
        val blockAlign = channels * bits / lit(8)
        val pcmHex = concat_ws("",
          transform(sequence(lit(0), nSamples - 1),
            i => le16(pmod(col("doc_id") * 7 + i * 13, lit(65536)))))
        val payloadHex = concat(
          lit("52494646"), le32(dataSize + 36), lit("57415645"),
          lit("666D7420"), le32(lit(16)), le16(lit(1)),
          le16(channels), le32(sampleRate), le32(byteRate),
          le16(blockAlign), le16(bits),
          lit("64617461"), le32(dataSize), pcmHex)
        Graft.tableParallel(s, d, "documents")
          .select(col("doc_id"), unhex(payloadHex).as("payload"),
            lit("audio/wav").as("mime"))
          .as[Blob]
          .mapPartitions(_.flatMap(b =>
            PcmFeatures.windows(b.doc_id, b.payload, 32)))
          .toDF()
      },
      Some("""WITH samp AS (
             |  SELECT doc_id, CAST(i AS INT) AS i,
             |         CAST((doc_id * 7 + i * 13) % 65536 AS BIGINT) AS v
             |  FROM (SELECT doc_id, unnest(range(0, 64 + doc_id % 64)) AS i
             |        FROM documents)),
             |sgn AS (SELECT doc_id, i,
             |               CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
             |        FROM samp)
             |SELECT doc_id, CAST(i // 32 AS INT) AS win,
             |       CAST(COUNT(*) AS INT) AS n_samples,
             |       CAST(SUM(s * s) AS BIGINT) AS energy,
             |       CAST(MAX(ABS(s)) AS INT) AS peak,
             |       TRUE AS valid
             |FROM sgn GROUP BY doc_id, win""".stripMargin)),

    QueryDef(
      "m103_audio_near_dup", // audio NEAR-dup — the Haitsma-Kalker
                             // fingerprint shape over real WAV payloads:
                             // codec decode → 32-sample window energies →
                             // delta-sign bit string (bit w = energy
                             // rose from window w-1), then the m102
                             // two-tier discipline: exact fingerprint
                             // groups collapse to one representative
                             // (group size carried) BEFORE the banded
                             // near join, so a corpus full of repeated
                             // jingles cannot blow up the pair join.
                             // Payloads plant structure: samples are
                             // constant per window (amplitude 100+10w,
                             // rising), so base fingerprints are all-'1';
                             // window 0's amplitude swings ±20 by
                             // doc_id%3, flipping bit 0 for the %3==2
                             // third — genuine near groups (hamming 1)
                             // beside the exact groups per length class
                             // (doc_id%7). 2 bands keyed (n_win, band,
                             // substring) guarantee recall at hamming 1
                             // by pigeonhole. Decode/window/fingerprint
                             // all map-side next to the bytes; only (id,
                             // ≤7-bit strings) ever shuffle.
      (s, d) => {
        import s.implicits._
        val nSamples = (lit(64) + (col("doc_id") % 7) * 32).cast("int")
        val dataSize = nSamples * 2
        val pcmHex = concat_ws("",
          transform(sequence(lit(0), nSamples - 1),
            i => le16(lit(100) + floor(i / 32).cast("int") * 10 +
              when(i < 32, (col("doc_id") % 3 - 1) * 20).otherwise(0))))
        val payloadHex = concat(
          lit("52494646"), le32(dataSize + 36), lit("57415645"),
          lit("666D7420"), le32(lit(16)), le16(lit(1)),
          le16(lit(1)), le32(lit(8000)), le32(lit(16000)),
          le16(lit(2)), le16(lit(16)),
          lit("64617461"), le32(dataSize), pcmHex)
        // Decode → windows → delta-sign bit string all inside ONE map-side
        // pass (PcmFeatures.fingerprint): the decoded window stream — the
        // corpus-sized intermediate — never shuffles. The previous shape
        // (window rows + groupBy(doc_id) + collect_list) re-sent every
        // asset's windows over the network just to reassemble what the
        // decoding task already held; at 100 TB that exchange is the whole
        // decoded corpus. A malformed payload returns None and excludes
        // the asset (m102's valid-flag discipline).
        val fp = Graft.tableParallel(s, d, "documents")
          .select(col("doc_id"), unhex(payloadHex).as("payload"),
            lit("audio/wav").as("mime"))
          .as[Blob]
          .mapPartitions(_.flatMap(b =>
            PcmFeatures.fingerprint(b.doc_id, b.payload, 32)
              .map { case (nw, bits) => AudioFp(b.doc_id, nw, bits) }))
          .toDF()
        val grp = fp.groupBy("n_win", "bits")
          .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
        val bands = grp
          .select(col("rep"), col("n"), col("n_win"), col("bits"),
            explode(sequence(lit(0), lit(1))).as("band"))
          .withColumn("l", length(col("bits")))
          .withColumn("bstr", col("bits").substr(
            expr("(band * l) div 2 + 1"),
            expr("((band + 1) * l) div 2 - (band * l) div 2")))
        val cand = bands
          .select(col("n_win"), col("band"), col("bstr"),
            col("rep").as("d1"), col("bits").as("b1"), col("n").as("n1"))
          .join(bands.select(col("n_win"), col("band"), col("bstr"),
            col("rep").as("d2"), col("bits").as("b2"), col("n").as("n2")),
            Seq("n_win", "band", "bstr"))
          .filter(col("d1") < col("d2"))
          .select(col("d1"), col("d2"), col("n_win"),
            col("b1"), col("b2"), col("n1"), col("n2"))
          .distinct()
        cand
          .withColumn("hamming", expr(
            """aggregate(transform(sequence(1, length(b1)),
              |  i -> IF(substring(b1, i, 1) = substring(b2, i, 1), 0, 1)),
              |  0, (acc, x) -> acc + x)""".stripMargin).cast("long"))
          .filter(col("hamming") <= 1)
          .select(col("d1"), col("d2"), col("n_win"), col("hamming"),
            col("n1"), col("n2"))
      },
      Some("""WITH samp AS (
             |  SELECT doc_id, CAST(i AS INT) AS i,
             |         CAST(100 + (i // 32) * 10 +
             |              CASE WHEN i < 32 THEN (doc_id % 3 - 1) * 20
             |                   ELSE 0 END AS BIGINT) AS s
             |  FROM (SELECT doc_id, unnest(range(0, 64 + doc_id % 7 * 32))
             |          AS i
             |        FROM documents)),
             |en AS (SELECT doc_id, CAST(i // 32 AS INT) AS win,
             |              CAST(SUM(s * s) AS BIGINT) AS e
             |       FROM samp GROUP BY doc_id, win),
             |fp AS (
             |  SELECT a.doc_id,
             |         CAST(COUNT(*) + 1 AS INT) AS n_win,
             |         string_agg(CASE WHEN a.e > b.e THEN '1' ELSE '0' END,
             |                    '' ORDER BY a.win) AS bits
             |  FROM en a JOIN en b ON b.doc_id = a.doc_id
             |                     AND b.win = a.win - 1
             |  GROUP BY a.doc_id),
             |grp AS (SELECT n_win, bits, MIN(doc_id) AS rep,
             |               CAST(COUNT(*) AS BIGINT) AS n
             |        FROM fp GROUP BY n_win, bits),
             |bnd AS (SELECT rep, n, n_win, bits, len(bits) AS l,
             |               unnest(range(0, 2)) AS band
             |        FROM grp),
             |keyed AS (SELECT rep, n, n_win, bits, band,
             |                 substr(bits, (band * l) // 2 + 1,
             |                        ((band + 1) * l) // 2
             |                          - (band * l) // 2) AS bstr
             |          FROM bnd),
             |cand AS (
             |  SELECT DISTINCT a.rep AS d1, b.rep AS d2, a.n_win,
             |         a.bits AS b1, b.bits AS b2, a.n AS n1, b.n AS n2
             |  FROM keyed a JOIN keyed b
             |    ON a.n_win = b.n_win AND a.band = b.band
             |   AND a.bstr = b.bstr AND a.rep < b.rep),
             |hm AS (SELECT d1, d2, n_win, b1, b2, n1, n2,
             |              unnest(range(1, len(b1) + 1)) AS i
             |       FROM cand)
             |SELECT d1, d2, n_win, hamming, n1, n2 FROM (
             |  SELECT d1, d2, n_win, n1, n2,
             |         CAST(SUM(CASE WHEN substr(b1, i, 1) = substr(b2, i, 1)
             |                       THEN 0 ELSE 1 END) AS BIGINT) AS hamming
             |  FROM hm GROUP BY 1, 2, 3, 4, 5)
             |WHERE hamming <= 1""".stripMargin)),

    QueryDef(
      "m101_image_phash_dedup", // multimodal DEDUP: the image twin of the
                                // d8x text family. Plan-assembled BMPs whose
                                // pixel pattern depends on doc_id mod 4 (so
                                // genuine duplicate groups exist across
                                // doc_ids sharing dims + pattern), decoded
                                // by the real codec into an average-hash
                                // (bit per pixel vs the image mean, exact
                                // integer cross-multiplied test), then ONE
                                // shuffle on the 16-byte phash groups
                                // duplicates and picks the min-id canonical
                                // — the same decision shape as d93. At
                                // 100 TB: decode + hash are map-side
                                // per-asset work next to the bytes; only
                                // (doc_id, phash) ever shuffles, never
                                // pixels.
      (s, d) => {
        import s.implicits._
        val hashed = m101Blobs(s, d)
          .mapPartitions(_.map(b => PerceptualHash.aHash(b.doc_id, b.payload)))
          .toDF()
        val byHash = org.apache.spark.sql.expressions.Window.partitionBy("phash")
        hashed.select(col("doc_id"), col("w"), col("h"), col("phash"),
          count(lit(1)).over(byHash).as("group_n"),
          min(col("doc_id")).over(byHash).as("canonical"))
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, CAST(4 + doc_id % 13 AS INT) AS w,
             |         CAST(1 + doc_id % 7 AS INT) AS h,
             |         ((4 + doc_id % 13) * 3 + 3)
             |           - (((4 + doc_id % 13) * 3 + 3) % 4) AS rb
             |  FROM documents),
             |rws AS (SELECT doc_id, w, h, rb, unnest(range(0, h)) AS r
             |        FROM dims),
             |cells AS (SELECT doc_id, w, h, rb, r, unnest(range(0, w)) AS c
             |          FROM rws),
             |px AS (SELECT doc_id, w, h, r, c,
             |         ((doc_id % 4) * 31 + r * rb + 3 * c) % 256
             |       + ((doc_id % 4) * 31 + r * rb + 3 * c + 1) % 256
             |       + ((doc_id % 4) * 31 + r * rb + 3 * c + 2) % 256 AS g3
             |       FROM cells),
             |tot AS (SELECT doc_id, SUM(g3) AS total FROM px GROUP BY doc_id),
             |img AS (SELECT p.doc_id, p.w, p.h,
             |          md5(p.w || 'x' || p.h || ':' || string_agg(
             |            CASE WHEN p.g3 * (p.w * p.h) > t.total
             |                 THEN '1' ELSE '0' END, ''
             |            ORDER BY p.r DESC, p.c ASC)) AS phash
             |        FROM px p JOIN tot t USING (doc_id)
             |        GROUP BY p.doc_id, p.w, p.h)
             |SELECT doc_id, w, h, phash,
             |       CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT)
             |         AS group_n,
             |       MIN(doc_id) OVER (PARTITION BY phash) AS canonical
             |FROM img""".stripMargin)),

    QueryDef(
      "m102_image_near_dup", // image NEAR-dup: the d85 banded shape over
                             // perceptual-hash BITS instead of text
                             // simhash, run as the canonical TWO-TIER
                             // pipeline: exact-dup groups collapse FIRST
                             // (one representative per distinct bit
                             // string, group size carried), then banding
                             // proposes near pairs between REPRESENTATIVES
                             // only. That first collapse is the scale
                             // guarantee: a 100 TB crawl repeats the same
                             // blank thumbnail millions of times, and a
                             // pair join over raw doc_ids is Ω(group²) —
                             // measured on the 10× ScaleGen corpus, the
                             // representative form holds output pairs
                             // CONSTANT where the raw form grew 122×.
                             // Pixel payloads get a doc_id%3 perturbation
                             // on the first pixel so genuine near pairs
                             // (hamming 1-3) exist beside the exact
                             // groups; 4 bands keyed (w, h, band,
                             // substring) — ≤3 differing bits leave ≥1
                             // band intact (pigeonhole) — and exact
                             // hamming over candidates disposes. Decode +
                             // hash stay map-side next to the bytes; only
                             // (id, ≤112-bit strings) ever shuffle.
      (s, d) => {
        import s.implicits._
        val pixHex = concat_ws("",
          transform(sequence(lit(0), col("image_bytes") - 1),
            i => lpad(hex(pmod(col("doc_id") % 4 * 31 + i +
              when(i < 3, col("doc_id") % 3).otherwise(0), lit(256))),
              2, "0")))
        val hashed = bmpBlobs(s, d, pixHex)
          .mapPartitions(_.map(b =>
            PerceptualHash.aHashBits(b.doc_id, b.payload)))
          .toDF().filter(col("valid"))
        val grp = hashed.groupBy("w", "h", "bits")
          .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
        val bands = grp
          .select(col("rep"), col("n"), col("w"), col("h"), col("bits"),
            explode(sequence(lit(0), lit(3))).as("band"))
          .withColumn("l", length(col("bits")))
          .withColumn("bstr", col("bits").substr(
            expr("(band * l) div 4 + 1"),
            expr("((band + 1) * l) div 4 - (band * l) div 4")))
        val cand = bands
          .select(col("w"), col("h"), col("band"), col("bstr"),
            col("rep").as("d1"), col("bits").as("b1"), col("n").as("n1"))
          .join(bands.select(col("w"), col("h"), col("band"), col("bstr"),
            col("rep").as("d2"), col("bits").as("b2"), col("n").as("n2")),
            Seq("w", "h", "band", "bstr"))
          .filter(col("d1") < col("d2"))
          .select(col("d1"), col("d2"), col("w"), col("h"),
            col("b1"), col("b2"), col("n1"), col("n2"))
          .distinct()
        cand
          .withColumn("hamming", expr(
            """aggregate(transform(sequence(1, length(b1)),
              |  i -> IF(substring(b1, i, 1) = substring(b2, i, 1), 0, 1)),
              |  0, (acc, x) -> acc + x)""".stripMargin).cast("long"))
          .filter(col("hamming") <= 3)
          .select(col("d1"), col("d2"), col("w"), col("h"),
            col("hamming"), col("n1"), col("n2"))
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, CAST(4 + doc_id % 13 AS INT) AS w,
             |         CAST(1 + doc_id % 7 AS INT) AS h,
             |         ((4 + doc_id % 13) * 3 + 3)
             |           - (((4 + doc_id % 13) * 3 + 3) % 4) AS rb
             |  FROM documents),
             |rws AS (SELECT doc_id, w, h, rb, unnest(range(0, h)) AS r
             |        FROM dims),
             |cells AS (SELECT doc_id, w, h, rb, r, unnest(range(0, w)) AS c
             |          FROM rws),
             |px AS (SELECT doc_id, w, h, r, c,
             |         ((doc_id % 4) * 31 + r * rb + 3 * c
             |          + CASE WHEN r = 0 AND c = 0 THEN doc_id % 3
             |                 ELSE 0 END) % 256
             |       + ((doc_id % 4) * 31 + r * rb + 3 * c + 1
             |          + CASE WHEN r = 0 AND c = 0 THEN doc_id % 3
             |                 ELSE 0 END) % 256
             |       + ((doc_id % 4) * 31 + r * rb + 3 * c + 2
             |          + CASE WHEN r = 0 AND c = 0 THEN doc_id % 3
             |                 ELSE 0 END) % 256 AS g3
             |       FROM cells),
             |tot AS (SELECT doc_id, SUM(g3) AS total FROM px GROUP BY doc_id),
             |img AS (SELECT p.doc_id, p.w, p.h,
             |          string_agg(
             |            CASE WHEN p.g3 * (p.w * p.h) > t.total
             |                 THEN '1' ELSE '0' END, ''
             |            ORDER BY p.r DESC, p.c ASC) AS bits
             |        FROM px p JOIN tot t USING (doc_id)
             |        GROUP BY p.doc_id, p.w, p.h),
             |grp AS (SELECT w, h, bits, MIN(doc_id) AS rep,
             |               CAST(COUNT(*) AS BIGINT) AS n
             |        FROM img GROUP BY w, h, bits),
             |bnd AS (SELECT rep, n, w, h, bits, len(bits) AS l,
             |               unnest(range(0, 4)) AS band
             |        FROM grp),
             |keyed AS (SELECT rep, n, w, h, bits, band,
             |                 substr(bits, (band * l) // 4 + 1,
             |                        ((band + 1) * l) // 4
             |                          - (band * l) // 4) AS bstr
             |          FROM bnd),
             |cand AS (
             |  SELECT DISTINCT a.rep AS d1, b.rep AS d2, a.w, a.h,
             |         a.bits AS b1, b.bits AS b2, a.n AS n1, b.n AS n2
             |  FROM keyed a JOIN keyed b
             |    ON a.w = b.w AND a.h = b.h AND a.band = b.band
             |   AND a.bstr = b.bstr AND a.rep < b.rep),
             |hm AS (SELECT d1, d2, w, h, b1, b2, n1, n2,
             |              unnest(range(1, len(b1) + 1)) AS i
             |       FROM cand)
             |SELECT d1, d2, w, h, hamming, n1, n2 FROM (
             |  SELECT d1, d2, w, h, n1, n2,
             |         CAST(SUM(CASE WHEN substr(b1, i, 1) = substr(b2, i, 1)
             |                       THEN 0 ELSE 1 END) AS BIGINT) AS hamming
             |  FROM hm GROUP BY 1, 2, 3, 4, 5, 6)
             |WHERE hamming <= 3""".stripMargin)),

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
              WHERE frame_idx % 4 = 0""")),

    QueryDef(
      "m104_frame_dedup", // the VIDEO leg of the dedup matrix (text d8x,
                          // image m101/m102, audio m103): which sampled
                          // frames repeat across assets — the d91
                          // repeated-passages shape over m96's keyframe
                          // stream. Intro/outro/watermark frames shared by
                          // thousands of videos are exactly what a corpus
                          // prep flags before training. One shuffle keyed
                          // on the 16-byte frame hash, partial-aggregated
                          // map-side; frames themselves never move — the
                          // exchange carries (hash, doc_id) pairs and the
                          // output is the repeated subset with its spread
                          // (distinct docs, total occurrences, canonical
                          // first sighting by (doc, frame) order).
      (s, d) => {
        val frameSize = 16; val every = 4
        val frames = Graft.table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            explode(when(length(col("text")) > 0,
              sequence(lit(0), expr(s"(length(text) - 1) div $frameSize")))
              .otherwise(typedLit(Seq.empty[Long]))).as("frame_idx"))
          .filter(col("frame_idx") % every === 0)
          .select(col("doc_id"), col("frame_idx"),
            md5(expr(
              s"substring(text, frame_idx * $frameSize + 1, $frameSize)"))
              .as("frame_hash"))
        frames.groupBy("frame_hash")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occurrences"),
            min(struct(col("doc_id"), col("frame_idx"))).as("first0"))
          .filter(col("n_docs") >= 2)
          .select(col("frame_hash"), col("n_docs"), col("n_occurrences"),
            col("first0")("doc_id").as("first_doc"),
            col("first0")("frame_idx").as("first_frame"))
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, frame_idx,
             |         md5(substr(text, frame_idx * 16 + 1, 16)) AS frame_hash
             |  FROM (SELECT doc_id, text,
             |          unnest(range(0, ((LENGTH(text) - 1) // 16) + 1))
             |            AS frame_idx
             |        FROM documents)
             |  WHERE frame_idx % 4 = 0),
             |rep AS (
             |  SELECT frame_hash,
             |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |         CAST(COUNT(*) AS BIGINT) AS n_occurrences
             |  FROM fr GROUP BY frame_hash
             |  HAVING COUNT(DISTINCT doc_id) >= 2),
             |firsts AS (
             |  SELECT frame_hash, doc_id AS first_doc,
             |         frame_idx AS first_frame
             |  FROM (SELECT *, ROW_NUMBER() OVER (
             |          PARTITION BY frame_hash
             |          ORDER BY doc_id, frame_idx) AS rn
             |        FROM fr)
             |  WHERE rn = 1)
             |SELECT r.frame_hash, r.n_docs, r.n_occurrences,
             |       f.first_doc, f.first_frame
             |FROM rep r JOIN firsts f USING (frame_hash)""".stripMargin)),

    QueryDef(
      "m105_scene_cuts",  // video SCENE SEGMENTATION over the m104 frame
                          // stream — the shot-boundary pass every video
                          // curation pipeline runs before sampling
                          // keyframes or captioning (one representative
                          // per SCENE beats every-Nth-frame sampling:
                          // static shots collapse, fast cuts keep their
                          // variety). Frame "energy" is the exact integer
                          // char-code sum of the 16-char window (the
                          // text-as-video stand-in the m104 fixture
                          // established); a cut is an energy jump > 150
                          // between CONSECUTIVE frames, and scenes are
                          // the q61 gaps-and-islands idiom: cut flags →
                          // running sum → scene index. Scale shape: one
                          // map-side frame explode, ONE doc-partitioned
                          // window pass (both the lag delta and the
                          // running sum share the same partition+order
                          // spec — one Window operator, no second
                          // exchange), then a (doc, scene) groupBy that
                          // partial-aggregates map-side. Integer energy
                          // keeps every boundary and average engine-exact.
      (s, d) => sceneFrames(s, d)
        .groupBy("doc_id", "scene_idx")
        .agg(min(col("frame_idx")).as("start_frame"),
          max(col("frame_idx")).as("end_frame"),
          count(lit(1)).as("n_frames"),
          round(sum(col("energy")).cast("double") / count(lit(1)), 6)
            .as("avg_energy")),
      Some("""WITH fr AS (
             |  SELECT doc_id, frame_idx,
             |         CAST(list_sum(list_transform(regexp_split_to_array(
             |           substr(text, frame_idx * 16 + 1, 16), ''),
             |           c -> ord(c))) AS BIGINT) AS energy
             |  FROM (SELECT doc_id, text,
             |          unnest(range(0, ((LENGTH(text) - 1) // 16) + 1))
             |            AS frame_idx
             |        FROM documents WHERE LENGTH(text) > 0)),
             |cuts AS (
             |  SELECT doc_id, frame_idx, energy,
             |         CASE WHEN ABS(energy - LAG(energy) OVER (
             |                PARTITION BY doc_id ORDER BY frame_idx)) > 150
             |              THEN 1 ELSE 0 END AS cut
             |  FROM fr),
             |sc AS (
             |  SELECT doc_id, frame_idx, energy,
             |         CAST(SUM(cut) OVER (PARTITION BY doc_id
             |           ORDER BY frame_idx
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS BIGINT) AS scene_idx
             |  FROM cuts)
             |SELECT doc_id, scene_idx,
             |       MIN(frame_idx) AS start_frame,
             |       MAX(frame_idx) AS end_frame,
             |       COUNT(*) AS n_frames,
             |       ROUND(CAST(SUM(energy) AS DOUBLE) / COUNT(*), 6)
             |         AS avg_energy
             |FROM sc GROUP BY 1, 2""".stripMargin)),

    QueryDef(
      "m106_scene_keyframes", // the SAMPLING payoff of m105's
                              // segmentation: ONE representative frame per
                              // scene — the frame whose energy is closest
                              // to the scene mean (most "typical" of the
                              // shot; earliest frame breaks ties), which
                              // is what a captioning/embedding stage
                              // consumes instead of every-Nth-frame
                              // sampling. Selection is the argmin-by-
                              // struct idiom: scene means join back onto
                              // the frame stream ON THE SAME (doc, scene)
                              // keys the aggregate produced (exchange
                              // reuse, no window), min(struct(dist,
                              // frame, e)) picks the keyframe in one
                              // aggregate. The distance-to-mean compare
                              // never touches a float: |e − se/cn| is
                              // ranked as |e·cn − se|, exact integers in
                              // both engines, so the argmin cannot flip
                              // on rounding.
      (s, d) => {
        val scenes = sceneFrames(s, d)
        val means = scenes.groupBy("doc_id", "scene_idx")
          .agg(sum(col("energy")).as("se"), count(lit(1)).as("cn"))
        scenes.join(means, Seq("doc_id", "scene_idx"))
          .select(col("doc_id"), col("scene_idx"), col("frame_idx"),
            col("energy"),
            abs(col("energy") * col("cn") - col("se")).as("dist"))
          .groupBy("doc_id", "scene_idx")
          .agg(min(struct(col("dist"), col("frame_idx"), col("energy")))
            .as("k"))
          .select(col("doc_id"), col("scene_idx"),
            col("k")("frame_idx").as("keyframe_idx"),
            col("k")("energy").as("energy"))
      },
      Some("""WITH fr AS (
             |  SELECT doc_id, frame_idx,
             |         CAST(list_sum(list_transform(regexp_split_to_array(
             |           substr(text, frame_idx * 16 + 1, 16), ''),
             |           c -> ord(c))) AS BIGINT) AS energy
             |  FROM (SELECT doc_id, text,
             |          unnest(range(0, ((LENGTH(text) - 1) // 16) + 1))
             |            AS frame_idx
             |        FROM documents WHERE LENGTH(text) > 0)),
             |cuts AS (
             |  SELECT doc_id, frame_idx, energy,
             |         CASE WHEN ABS(energy - LAG(energy) OVER (
             |                PARTITION BY doc_id ORDER BY frame_idx)) > 150
             |              THEN 1 ELSE 0 END AS cut
             |  FROM fr),
             |sc AS (
             |  SELECT doc_id, frame_idx, energy,
             |         CAST(SUM(cut) OVER (PARTITION BY doc_id
             |           ORDER BY frame_idx
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS BIGINT) AS scene_idx
             |  FROM cuts),
             |mn AS (SELECT doc_id, scene_idx,
             |              CAST(SUM(energy) AS BIGINT) AS se,
             |              COUNT(*) AS cn
             |       FROM sc GROUP BY 1, 2),
             |dist AS (
             |  SELECT s.doc_id, s.scene_idx, s.frame_idx, s.energy,
             |         ABS(s.energy * m.cn - m.se) AS dist
             |  FROM sc s JOIN mn m USING (doc_id, scene_idx))
             |SELECT doc_id, scene_idx, frame_idx AS keyframe_idx, energy
             |FROM (SELECT *, ROW_NUMBER() OVER (
             |        PARTITION BY doc_id, scene_idx
             |        ORDER BY dist, frame_idx) AS rn
             |      FROM dist)
             |WHERE rn = 1""".stripMargin))
  )
}
