package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.commands.TableCommands

/** Build/serve split for the IVF-PQ vector index.
  *
  * A production vector store trains its quantizers ONCE and serves many
  * queries against the stored artifacts; retraining per query makes index
  * construction dominate search latency. This object materializes the four
  * trained artifacts of the s100/s101/s102 search stack as warehouse
  * tables (manifest-versioned parquet via [[TableCommands]], registered in
  * the session catalog) so the serve-path queries contain ZERO training
  * stages — the Spark analog of the reference's build-then-scan index
  * split (`commands/CreateIndexCommand.java:1-142` builds the structure,
  * `plans/IndexScanNode.java:17-51` serves from it).
  *
  * Artifacts (all over the `embeddings` corpus at a specific source dir):
  *   - `centroids` (clabel, cqa, ncq) — coarse-quantizer centroids with
  *     squared norms; ~|labels| rows, always broadcast at the consumer.
  *   - `assign` (vec_id, cluster) — each vector's coarse cluster route;
  *     corpus-sized, met through cluster-bounded equi-joins.
  *   - `codebook` (m, cid, cq) — the M×k product-quantization codebook;
  *     64 rows, always broadcast.
  *   - `codes` (vec_id, codes) — each vector's M PQ code ids (the 8-byte
  *     compressed corpus the ADC scan reads — 32× less I/O than raw
  *     vectors at 100 TB).
  *   - `meta` (src, m, k, iters) — provenance: the corpus dir and training
  *     params the index was built from. [[served]] refuses an index built
  *     for a DIFFERENT corpus dir or param set, so a stale index can never
  *     silently answer for the wrong data — search falls back to inline
  *     training instead (correct, just slower).
  *
  * Build is invoked from SQL (`BUILD VECTOR INDEX ON embeddings`, the
  * Engine route), from [[graft.Bench]]/[[graft.Verify]] as the setup step
  * of their serve-path runs, and from specs. Search sites consult
  * [[served]] per query: present-and-matching → catalog tables; absent →
  * the original inline-training pipeline, bit-identical output either way
  * (the artifacts are the same deterministic frames, round-tripped through
  * parquet with exact integer/array types).
  */
object VectorIndex {

  /** PQ training params the serve path is built for (s99/s100/s101's
    * published configuration: M=8 subspaces, k=8 centroids, 2 Lloyd
    * rounds). A search with different params never serves from the store. */
  val pqM = 8
  val pqK = 8
  val pqIters = 2

  private val corpus = "embeddings"
  private[graft] def tableName(part: String): String =
    s"vector_index_${corpus}_$part"
  private val parts = Seq("centroids", "assign", "codebook", "codes", "meta")

  /** Canonical form of a corpus dir for provenance comparison. */
  private def norm(d: String): String = new java.io.File(d).getAbsolutePath

  /** The stored index, handed to the search sites. */
  final case class Served(centroids: DataFrame, assign: DataFrame,
      codebook: DataFrame, codes: DataFrame)

  /** Train + materialize: runs the coarse-centroid, IVF-assignment, PQ
    * codebook and PQ encode pipelines once and publishes each as a
    * manifest table + catalog entry. Idempotent (rebuilds replace). */
  def build(s: SparkSession, d: String, cmds: TableCommands): Unit = {
    drop(s, cmds)
    import s.implicits._
    val meta = Seq((norm(d), pqM, pqK, pqIters))
      .toDF("src", "m", "k", "iters")
    (Similarity.indexArtifacts(s, d) :+ ("meta" -> meta)).foreach {
      case (p, df) =>
        val n = tableName(p)
        cmds.createTable(n, df)
        s.sql(s"DROP TABLE IF EXISTS `$n`")
        s.sql(s"CREATE TABLE `$n` USING parquet " +
          s"LOCATION '${cmds.dataPath(n)}'")
        ()
    }
  }

  /** Remove the stored index (catalog entries + warehouse tables).
    * Subsequent searches fall back to inline training. */
  def drop(s: SparkSession, cmds: TableCommands): Unit =
    parts.foreach { p =>
      val n = tableName(p)
      s.sql(s"DROP TABLE IF EXISTS `$n`")
      if (cmds.tableExists(n)) cmds.dropTable(n)
    }

  /** Re-register a persisted index from a prior session's warehouse into
    * this session's catalog (the Engine calls this at construction, like
    * its index-routing pre-seed). */
  def reregister(s: SparkSession, cmds: TableCommands): Unit =
    if (parts.forall(p => cmds.tableExists(tableName(p))))
      parts.foreach { p =>
        val n = tableName(p)
        if (!s.catalog.tableExists(n))
          s.sql(s"CREATE TABLE `$n` USING parquet " +
            s"LOCATION '${cmds.dataPath(n)}'")
        ()
      }

  /** The stored index for corpus dir `d`, iff complete and provenance-
    * matching. The meta read is one 1-row parquet file on the driver —
    * catalog-metadata-scale, like the Engine's constraint reads. */
  def served(s: SparkSession, d: String): Option[Served] =
    if (!parts.forall(p => s.catalog.tableExists(tableName(p)))) None
    else {
      val meta = s.table(tableName("meta")).collect()
      val ok = meta.length == 1 && meta(0).getString(0) == norm(d) &&
        meta(0).getInt(1) == pqM && meta(0).getInt(2) == pqK &&
        meta(0).getInt(3) == pqIters
      if (!ok) None
      else Some(Served(
        s.table(tableName("centroids")),
        s.table(tableName("assign")),
        s.table(tableName("codebook")),
        s.table(tableName("codes"))))
    }
}
