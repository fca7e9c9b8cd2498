package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** SimHash near-dup detection (Charikar 2002 random-hyperplane sketch over
  * token sets; SURVEY.md §7.8 extension — the reference has no hashing
  * surface at all).
  *
  * 60-bit signatures (so every value fits a signed BIGINT in both Spark and
  * the DuckDB oracle): bit b is set iff the count of distinct tokens whose
  * portable 60-bit hash has bit b set exceeds half the token count. The
  * per-bit tallies are plain integer SUMs, so the signature is exact and
  * engine-portable — no float accumulation anywhere.
  *
  * Scale shape: token explode -> one hash-groupBy per doc (map-side partial
  * aggregation collapses the 60 tallies before the shuffle) -> banded
  * equi-join for candidate pairs. Never an O(n²) cross join.
  */
object SimHash {

  private val Bits = 60
  private val Bands = 4 // 15 bits per band

  /** Absolute cap on a (band, band_val) bucket of DISTINCT signatures —
    * the d82/d95 posting-index hot-key cap applied to simhash banding.
    * Signature bits are majority votes over token hashes, so corpus-common
    * token statistics make some 15-bit bands low-entropy: the 10×/100×
    * `ScaleStress` corpus measured a single band value shared by 1,524
    * distinct signatures at 10× sf0.1 (uniform hashing predicts ~1), its
    * bucket growing linearly with the corpus and its pair volume
    * quadratically — 1.98 s → 134 s wall-clock. A band value shared by
    * over a thousand DIFFERENT signatures separates nothing — it is a
    * stopword band — and every true near-dup it would recall still has
    * three other, more selective bands to collide on. Dropping buckets
    * above the cap bounds per-key fan-out at ~500k pairs at any corpus
    * size. Inert at the sf0.01 gate (max bucket there is ~100), mirrored
    * in the oracle. */
  private val bandBucketCap = 1000L

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Graft.table(s, d, n)

  /** (doc_id, simhash) for a (doc_id, text) corpus — the codegen
    * [[graft.functions.SimHash60]] kernel: one map-side scan per document,
    * no token explosion, no 60-column aggregate, streaming-safe
    * (row-at-a-time, stateless). Token-less docs are dropped to match the
    * relational explode+tally formulation the oracle keeps (explode of an
    * empty token set emits no row, where the total kernel would emit
    * signature 0); equivalence including that case is spec-pinned in
    * FunctionsSpec. */
  def signatures(corpus: DataFrame): DataFrame =
    corpus
      // constant-cost token-existence test: any char outside the
      // tokenizer's separator set [ \t\n\f\r] means ≥1 token — avoids
      // materializing the full token array just to check emptiness
      .filter(col("text").rlike("[^ \\t\\n\\f\\r]"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash60(col("text")).as("simhash"))

  /** The relational formulation of [[signatures]] (explode distinct tokens
    * → 60 per-bit SUM tallies) — kept as the kernel's cross-check and the
    * shape the DuckDB oracle mirrors. */
  private[graft] def signaturesRelational(corpus: DataFrame): DataFrame = {
    val toks = corpus.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
      .select(col("doc_id"), Dedup.hash60(col("tok")).as("th"))
    val tallies = (0 until Bits).map(b =>
      sum((shiftright(col("th"), b).bitwiseAND(lit(1L))) * 2 - 1).as(s"s_$b"))
    val sig = (0 until Bits).map(b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy("doc_id")
      .agg(tallies.head, tallies.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** DuckDB equivalent of [[signatures]] over a corpus relation `corpus`
    * with (doc_id, text). */
  def signaturesSql(corpusSql: String): String = {
    val tallies = (0 until Bits)
      .map(b => s"SUM(((th >> $b) & 1) * 2 - 1) AS s_$b").mkString(",\n    ")
    val sig = (0 until Bits)
      .map(b => s"CASE WHEN s_$b > 0 THEN (1::BIGINT << $b) ELSE 0 END")
      .mkString(" + ")
    s"""SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM (
       |  SELECT doc_id,
       |    $tallies
       |  FROM (
       |    SELECT doc_id,
       |           ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th
       |    FROM (SELECT doc_id,
       |            unnest(list_distinct(list_filter(
       |              regexp_split_to_array(trim(text), '\\s+'), x -> x != ''))) AS tok
       |          FROM ($corpusSql)))
       |  GROUP BY doc_id)""".stripMargin
  }

  // derived near-dup corpus shared with the MinHash operators — one
  // definition (plan + oracle SQL) in Dedup, reused here
  private def corpusNear(s: SparkSession, d: String): DataFrame =
    Dedup.corpusNear(s, d)
  private def corpusNearSql: String = Dedup.corpusNearSql

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "d84_simhash_signatures",
      (s, d) => signatures(
        Graft.tableParallel(s, d, "documents").select("doc_id", "text")),
      Some(signaturesSql("SELECT doc_id, text FROM documents"))),

    QueryDef(
      "d85_simhash_pairs", // banded candidates -> hamming-distance filter
      (s, d) => {
        // Docs cluster onto far fewer distinct signatures than doc count
        // (template-heavy corpora), so band over DISTINCT signatures and only
        // expand back to doc pairs at the end — the banded join is quadratic
        // in bucket size, and bucket sizes shrink by the clustering factor.
        // NO persist: a cache here outlives the query (executor memory debt
        // bleeding into neighbors — measured on d82 in round 2). Instead,
        // ONE simhash-hash exchange is pinned under every consumer — the
        // distinct, both candidate-expansion joins, and the same-signature
        // self-join all require simhash clustering, so AQE stage reuse
        // materializes the signature kernel once (executed-plan audited:
        // the corpusNear union was running 3× = 6 corpus scans before).
        // explicit not-null INSIDE the shared subtree: the equi-join
        // consumers infer isnotnull(simhash) and would otherwise push it
        // below only THEIR exchange copies, forking the subtree away from
        // the distinct branch's (the t91 scan-fork mechanics)
        val sig = signatures(corpusNear(s, d))
          .filter(col("simhash").isNotNull)
          .repartition(col("simhash"))
        // zero-valued anchor, PROVABLY zero for any data (min - min of the
        // same aggregate; coalesce guards the all-NULL edge) — it exists
        // only to keep the distinct branch reading doc_id so column
        // pruning projects its copy of `sig` identically to the join
        // branches' (see the p100 commit for the fork mechanics). The
        // earlier least(min(doc_id), 0) form silently shifted the hamming
        // threshold if doc_id were ever negative; this one cannot.
        val uniq = sig.groupBy("simhash")
          .agg(coalesce(min(col("doc_id")) - min(col("doc_id")), lit(0L))
            .as("z"))
        val bands = uniq.select(col("simhash"), col("z"),
          posexplode(array((0 until Bands).map(b =>
            shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7FFFL))): _*))
            .as(Seq("band", "band_val")))
        // absolute hot-bucket cap (see bandBucketCap): bands is one row per
        // DISTINCT signature per band, so a plain count per (band, band_val)
        // IS the distinct-signature bucket size. Hot buckets collapse to one
        // broadcast row of packed 17-bit keys — the keyspace itself
        // (4 bands × 2^15 = 131,072 values) bounds that broadcast at ~1 MB
        // no matter the corpus, unlike a corpus-derived hot set. min(z)
        // rides along so this branch reads doc_id like every other consumer
        // of the shared signature subtree (the same anti-fork anchor as the
        // distinct branch; z is provably 0, see above).
        val bkey = col("band") * 32768 + col("band_val")
        val hotArr = bands.groupBy("band", "band_val")
          .agg(count(lit(1)).as("bsz"), min(col("z")).as("z2"))
          .filter(col("bsz") > lit(bandBucketCap) + col("z2"))
          .agg(collect_set(bkey).as("hot")) // 1 row (empty array if none)
        val kept = bands.crossJoin(broadcast(hotArr))
          .filter(!array_contains(col("hot"), bkey))
          .select(col("simhash"), col("z"), col("band"), col("band_val"))
        val sigPairs = kept.as("a").join(kept.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_val") === col("b.band_val") &&
              col("a.simhash") < col("b.simhash"))
          .select(col("a.simhash").as("s1"), col("b.simhash").as("s2"),
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"),
            // BOTH sides' anchors: referencing only a.z lets pruning drop
            // doc_id from the b-side band subtree and fork it
            (col("a.z") + col("b.z")).as("z"))
          .filter(col("hamming") <= lit(6) + col("z"))
          .select(col("s1"), col("s2"), col("hamming"))
          .distinct()
        val crossSig = sigPairs
          .join(sig.as("x"), col("s1") === col("x.simhash"))
          .join(sig.as("y"), col("s2") === col("y.simhash"))
          .select(
            least(col("x.doc_id"), col("y.doc_id")).as("d1"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("d2"),
            col("hamming"))
        val sameSig = sig.as("x").join(sig.as("y"),
            col("x.simhash") === col("y.simhash") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            lit(0).as("hamming"))
        crossSig.union(sameSig)
      },
      Some {
        // mirrors the engine's shape exactly: band over DISTINCT signatures
        // (so the hot-bucket cap counts the same thing), drop buckets above
        // bandBucketCap before the quadratic join, expand surviving
        // signature pairs back to doc pairs, and keep identical-signature
        // doc pairs through an UNcapped same-signature branch (disjoint
        // from the cross-signature branch: those have hamming >= 1)
        s"""WITH sig AS (${signaturesSql(corpusNearSql)}),
           |uniq AS (SELECT DISTINCT simhash FROM sig),
           |bands AS (
           |  SELECT simhash, CAST(p AS INT) AS band,
           |         (simhash >> (CAST(p AS INT) * 15)) & 32767 AS band_val
           |  FROM uniq CROSS JOIN (SELECT unnest(range($Bands)) AS p)),
           |kept AS (
           |  SELECT simhash, band, band_val FROM (
           |    SELECT simhash, band, band_val,
           |           COUNT(*) OVER (PARTITION BY band, band_val) AS bsz
           |    FROM bands)
           |  WHERE bsz <= $bandBucketCap),
           |sp AS (
           |  SELECT DISTINCT a.simhash AS s1, b.simhash AS s2,
           |         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)
           |           AS hamming
           |  FROM kept a JOIN kept b
           |    ON a.band = b.band AND a.band_val = b.band_val
           |   AND a.simhash < b.simhash
           |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6),
           |crosssig AS (
           |  SELECT least(x.doc_id, y.doc_id) AS d1,
           |         greatest(x.doc_id, y.doc_id) AS d2, hamming
           |  FROM sp JOIN sig x ON sp.s1 = x.simhash
           |          JOIN sig y ON sp.s2 = y.simhash),
           |samesig AS (
           |  SELECT x.doc_id AS d1, y.doc_id AS d2, CAST(0 AS INT) AS hamming
           |  FROM sig x JOIN sig y
           |    ON x.simhash = y.simhash AND x.doc_id < y.doc_id)
           |SELECT d1, d2, hamming FROM crosssig
           |UNION ALL
           |SELECT d1, d2, hamming FROM samesig""".stripMargin
      })
  )
}
