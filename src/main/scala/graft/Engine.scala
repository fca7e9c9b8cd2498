package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** SQL-string entry point — the engine's primary declared interface.
  *
  * The reference is driven by SQL strings end-to-end: the REPL client
  * (`client/ExclusiveClient.java:72-106`) hands each statement to
  * `server/NanoDBServer.doCommand(String)` (`server/NanoDBServer.java:69-74`),
  * which parses and executes it; every reference test is a SQL string
  * (`sql/SqlTestCase.java:28-230`). [[Engine.sql]] is that surface on Spark:
  * graft-specific storage DDL (`CREATE COLSTORE`, `LOAD`) routes to
  * [[commands.TableCommands]]; every other statement — queries, persistent
  * `CREATE VIEW`/`DROP VIEW`, `ANALYZE`, `EXPLAIN` — is delegated verbatim to
  * Spark SQL, so the whole relational surface (SURVEY.md §2) is reachable
  * from a string exactly as from the DataFrame API.
  *
  * Tables are registered in the session CATALOG (external Parquet tables in
  * the current database), not as temp views: the reference's
  * `CreateViewCommand` (`commands/CreateViewCommand.java:28-30`) declares
  * persistent views, and Spark only allows a persistent view to reference
  * catalog objects. (`events` is the one exception — its TIMESTAMP(NANOS)
  * column needs a read-side downcast, so it stays a temp view.)
  */
class Engine(val spark: SparkSession, sfDir: String, warehouse: String) {

  private val cmds = new commands.TableCommands(spark, warehouse)

  // idempotent: external-table DDL is IF NOT EXISTS, functions re-register
  Graft.tableNames.filterNot(_ == "events").foreach { n =>
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$n` USING parquet " +
      s"LOCATION '$sfDir/$n.parquet'")
  }
  Graft.table(spark, sfDir, "events").createOrReplaceTempView("events")
  functions.GraftFunctions.register(spark)

  private val createColstore =
    """(?is)\s*CREATE\s+(?:COLSTORE|TABLE)\s+(\w+)\s+FROM\s+'([^']+)'\s*;?\s*""".r
  private val loadFile =
    """(?is)\s*LOAD\s+'([^']+)'\s+INTO\s+(\w+)\s*;?\s*""".r
  private val createIndex =
    """(?is)\s*CREATE\s+INDEX\s+(?:\w+\s+)?ON\s+(\w+)\s*\(\s*(\w+)\s*\)\s*;?\s*""".r
  private val txnStmt =
    """(?is)\s*(BEGIN|START\s+TRANSACTION|COMMIT|ROLLBACK)\s*;?\s*""".r
  private val verifyStmt = """(?is)\s*VERIFY\s+(\w+)\s*;?\s*""".r
  private val optimizeStmt = """(?is)\s*OPTIMIZE\s+(\w+)\s*;?\s*""".r
  // storage DML/DDL accept an optional qualifier so `default.t` (and the
  // spark_catalog spellings) route to the same warehouse table as `t`,
  // while a genuinely foreign database is REJECTED with an engine error
  // instead of falling through to Spark SQL's non-catalog path (whose
  // "UPDATE ... not supported" error hides the actual problem)
  private val updateStmt =
    """(?is)\s*UPDATE\s+((?:`?\w+`?\.)*)`?(\w+)`?\s+SET\s+(.+?)\s*;?\s*""".r
  private val deleteStmt =
    """(?is)\s*DELETE\s+FROM\s+((?:`?\w+`?\.)*)`?(\w+)`?(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val dropTableStmt =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?((?:`?\w+`?\.)*)`?(\w+)`?\s*;?\s*""".r

  /** True iff the captured qualifier names this engine's (single) database:
    * empty, `default`, `spark_catalog`, or `spark_catalog.default`. */
  private def isLocalDb(qualifier: String): Boolean = {
    val q = qualifier.replace("`", "").stripSuffix(".").toLowerCase
    q.isEmpty || q == "default" || q == "spark_catalog" ||
      q == "spark_catalog.default"
  }

  private def localName(qualifier: String, tbl: String, verb: String): String =
    if (isLocalDb(qualifier)) tbl
    else throw new UnsupportedOperationException(
      s"graft engine: $verb on qualified table '$qualifier$tbl' is not " +
        s"supported — the warehouse is single-database; use the bare name '$tbl'")

  /** One statement in, a DataFrame out (commands return a 1-row status frame,
    * like the reference's command acknowledgements). */
  def sql(command: String): DataFrame = command match {
    case createColstore(name, csv) =>
      // reference: CREATE COLSTORE/TABLE ... FROM <csv> profiles the file and
      // builds the columnar store (commands/CreateColStoreCommand.java,
      // storage/FileAnalyzer.java); Parquet picks encodings natively
      cmds.createTable(name,
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(csv))
      registerTable(name)
      status(s"created colstore table $name")
    case loadFile(csv, name) =>
      // reference: LOAD <file> INTO <table> appends (LoadFileCommand.java)
      cmds.insertInto(name,
        spark.read.option("header", "true").schema(cmds.table(name).schema)
          .csv(csv))
      registerTable(name)
      status(s"loaded $csv into $name")
    case createIndex(tbl, column) =>
      // reference: CREATE INDEX builds a B+-tree (CreateIndexCommand.java);
      // here it re-clusters into a bucketed catalog table (see
      // TableCommands.createIndex for the 100 TB rationale)
      cmds.createIndex(tbl, column)
      status(s"indexed $tbl by $column as ${tbl}_by_$column")
    case updateStmt(q, tblRaw, rest) =>
      // reference: UpdateCommand.java — Spark SQL cannot mutate plain
      // parquet tables, so UPDATE/DELETE route to the COW rewrite
      val tbl = localName(q, tblRaw, "UPDATE")
      val (sets, cond) = splitWhere(rest)
      val setMap = splitTopLevel(sets).map { a =>
        val Array(c, e) = a.split("=", 2)
        c.trim -> org.apache.spark.sql.functions.expr(e.trim)
      }.toMap
      cmds.update(tbl, condExpr(cond), setMap)
      registerTable(tbl)
      status(s"updated $tbl")
    case deleteStmt(q, tblRaw, cond) =>
      val tbl = localName(q, tblRaw, "DELETE")
      cmds.delete(tbl, condExpr(cond)) // reference: DeleteCommand.java
      registerTable(tbl)
      status(s"deleted from $tbl")
    case txnStmt(kw) => // reference: BeginCommand/CommitCommand/RollbackCommand
      val before = cmds.warehouseTables
      val r = kw.toUpperCase.replaceAll("\\s+", " ") match {
        case "BEGIN" | "START TRANSACTION" => cmds.begin(); "begin"
        case "COMMIT" => cmds.commit(); "commit"
        case "ROLLBACK" => cmds.rollback(); "rollback"
      }
      if (r != "begin") {
        // pointers may have moved under registered catalog entries, and a
        // rollback deletes tables created inside the txn — drop their now-
        // dangling catalog entries too
        val after = cmds.warehouseTables
        after.filter(spark.catalog.tableExists).foreach(registerTable)
        (before.toSet -- after).foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS `$t`"))
      }
      status(r)
    case dropTableStmt(ifExists, q, tbl) if isLocalDb(q) && cmds.tableExists(tbl) =>
      // warehouse tables need BOTH the manifest dirs and the catalog entry
      // gone, or a later CREATE COLSTORE of the same name would refuse.
      // (A genuinely foreign-qualified DROP falls through to Spark SQL,
      // which owns other catalogs/databases and errors clearly if absent.)
      cmds.dropTable(tbl, ifExists != null)
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      status(s"dropped $tbl")
    case verifyStmt(tbl) => // reference: VerifyCommand (integrity check)
      status(s"verified $tbl: ${cmds.verifyTable(tbl)} rows")
    case optimizeStmt(tbl) => // reference: OptimizeCommand (compaction)
      cmds.optimizeTable(tbl)
      registerTable(tbl)
      status(s"optimized $tbl")
    case other => spark.sql(other)
  }

  private def condExpr(cond: String): Column =
    if (cond == null) org.apache.spark.sql.functions.lit(true)
    else org.apache.spark.sql.functions.expr(cond)

  /** One lexing pass shared by [[splitTopLevel]] and [[splitWhere]]: flags
    * each position that is TOP LEVEL — outside parens and outside
    * single-quoted SQL string literals ('' escapes). Keeping a single
    * scanner means the two splitters can never disagree on where a string
    * ends. */
  private def topLevel(s: String): Array[Boolean] = {
    val top = new Array[Boolean](s.length)
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => top(i) = depth == 0
      }
      i += 1
    }
    top
  }

  /** Split SET assignments on top-level commas — commas inside function-call
    * parens or string literals don't split. */
  private def splitTopLevel(s: String): Seq[String] = {
    val top = topLevel(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    s.indices.foreach { i =>
      if (top(i) && s.charAt(i) == ',') {
        out += s.substring(start, i); start = i + 1
      }
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Split "assignments [WHERE cond]" at the first TOP-LEVEL WHERE keyword
    * — a 'where' inside a SET string literal must not terminate the
    * assignment list. */
  private def splitWhere(s: String): (String, String) = {
    val top = topLevel(s)
    var i = 0
    while (i + 5 <= s.length) {
      if (top(i) && s.substring(i, i + 5).equalsIgnoreCase("where") &&
          (i == 0 || s.charAt(i - 1).isWhitespace) &&
          (i + 5 == s.length || s.charAt(i + 5).isWhitespace))
        return (s.substring(0, i).trim, s.substring(i + 5).trim)
      i += 1
    }
    (s.trim, null)
  }

  private def registerTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING parquet " +
      s"LOCATION '${cmds.dataPath(name)}'"); ()
  }

  private def status(msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }
}
