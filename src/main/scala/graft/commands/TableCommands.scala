package graft.commands

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's DDL / DML / utility command surface (SURVEY.md §2.8),
  * re-expressed over Parquet tables:
  *
  *  - CREATE TABLE / CREATE COLSTORE / LOAD  (reference
  *    `commands/CreateTableCommand.java`, `CreateColStoreCommand.java`,
  *    `LoadFileCommand.java` + the CSV profiler `storage/FileAnalyzer.java`)
  *    → CSV ingest to Parquet. The reference profiles each CSV column to
  *    pick RLE/dictionary/plain encodings; Parquet chooses per-chunk
  *    encodings natively, so the profiling step disappears by design.
  *  - INSERT (`commands/InsertCommand.java:34-281`) → append write.
  *  - UPDATE / DELETE (`commands/UpdateCommand.java:36-128`,
  *    `DeleteCommand.java:41-77`) → copy-on-write rewrite: Parquet is
  *    immutable, so mutation = filtered/projected rewrite + atomic swap.
  *    The reference mutates slotted heap pages in place; at 100 TB the
  *    COW rewrite is the only strategy that scales (and is exactly what
  *    Delta/Iceberg do under the hood, minus the manifest layer).
  *  - ANALYZE (`commands/AnalyzeCommand.java:93-115`) → catalog stats for
  *    Catalyst's CBO.
  *  - EXPLAIN (`commands/ExplainCommand.java`) → formatted plan string.
  *
  * Tables live at `<warehouse>/<name>` as Parquet directories.
  */
class TableCommands(spark: SparkSession, warehouse: String) {

  private def path(table: String) = s"$warehouse/$table"

  /** CREATE TABLE t AS <df> (error if exists, like the reference without
    * IF NOT EXISTS). */
  def createTable(name: String, df: DataFrame,
      ifNotExists: Boolean = false): Unit =
    df.write.mode(if (ifNotExists) SaveMode.Ignore else SaveMode.ErrorIfExists)
      .parquet(path(name))

  /** LOAD / CREATE COLSTORE: CSV file -> columnar (Parquet) table. */
  def loadCsv(name: String, csvPath: String, schema: StructType,
      header: Boolean = true): Unit =
    spark.read.option("header", header.toString).schema(schema).csv(csvPath)
      .write.mode(SaveMode.ErrorIfExists).parquet(path(name))

  /** DROP TABLE [IF EXISTS]. */
  def dropTable(name: String, ifExists: Boolean = true): Unit = {
    val dir = new java.io.File(path(name))
    if (!dir.exists && !ifExists)
      throw new IllegalArgumentException(s"table $name does not exist")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (dir.exists) rm(dir)
  }

  def table(name: String): DataFrame = {
    recover(name)
    spark.read.parquet(path(name))
  }

  /** Crash recovery for an interrupted [[rewrite]] swap: if the process died
    * between un-publishing the table and publishing the rewrite, only the
    * `__old` backup exists — restore it. (The `__rewrite` staging dir, if
    * present, is an incomplete write and is ignored; the next rewrite
    * overwrites it.) Idempotent and cheap: two existence checks. */
  private def recover(name: String): Unit = {
    val dir = new java.io.File(path(name))
    val bak = new java.io.File(s"${path(name)}__old")
    if (!dir.exists && bak.exists && !bak.renameTo(dir))
      throw new IllegalStateException(s"failed to restore $name from __old")
  }

  /** INSERT INTO t VALUES / SELECT — append semantics. */
  def insertInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).parquet(path(name))

  /** UPDATE t SET <col> = <expr> WHERE <cond>: copy-on-write rewrite.
    * All SET expressions evaluate against the OLD row (standard SQL UPDATE
    * semantics — `SET a = b, b = a` swaps), via a single simultaneous
    * projection. Distributed end-to-end — no driver-side row handling. */
  def update(name: String, cond: Column, sets: Map[String, Column]): Unit = {
    val cur = table(name)
    val updated = cur.select(cur.columns.map { c =>
      sets.get(c) match {
        case Some(e) => when(cond, e).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    rewrite(name, updated)
  }

  /** DELETE FROM t WHERE <cond>: copy-on-write rewrite keeping survivors. */
  def delete(name: String, cond: Column): Unit =
    rewrite(name, table(name).filter(!coalesce(cond, lit(false))))

  /** CREATE INDEX ON t (col) — the reference builds a B⁺-tree on the column
    * (`commands/CreateIndexCommand.java`); a distributed columnar engine has
    * no row-level index, so the Spark-native analog is re-clustering the
    * table into hash buckets sorted by the key: every equi-join, aggregation
    * or point lookup on that key then runs co-located with NO exchange — the
    * same read-path benefit the index gives the single-node engine, and the
    * one that matters at 100 TB (it removes the fact-table shuffle).
    * Registered as `<table>_by_<column>` in the session catalog. */
  def createIndex(table: String, column: String, buckets: Int = 8): Unit =
    this.table(table)
      .write.bucketBy(buckets, column).sortBy(column)
      .mode(SaveMode.Overwrite).saveAsTable(s"${table}_by_$column")

  /** ANALYZE t — register the parquet directory as an external catalog table
    * (idempotent) and compute table + column stats so CBO (join reorder,
    * broadcast thresholds) has real numbers for queries that read it via
    * `spark.table(name)`. */
  def analyze(name: String): Unit = {
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$name` USING parquet LOCATION '${path(name)}'")
    spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR ALL COLUMNS"); ()
  }

  /** EXPLAIN — formatted physical plan, the analog of the reference's
    * `PlanNode.printNodeTree`. */
  def explain(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Atomic-ish swap: write new data beside the table, then rename over it.
    * (A real deployment would use a table format with a manifest — this
    * mirrors the reference's simple single-writer model.) A crash between
    * the two renames leaves only `__old`, which [[recover]] restores on the
    * next read or rewrite. */
  private def rewrite(name: String, df: DataFrame): Unit = {
    recover(name)
    val tmp = s"${path(name)}__rewrite"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(path(name))
    val bak = new java.io.File(s"${path(name)}__old")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (bak.exists) rm(bak)
    if (!dir.renameTo(bak))
      throw new IllegalStateException(s"rewrite of $name failed at swap")
    if (!new java.io.File(tmp).renameTo(dir)) {
      bak.renameTo(dir) // roll back
      throw new IllegalStateException(s"rewrite of $name failed at publish")
    }
    rm(bak)
  }
}
