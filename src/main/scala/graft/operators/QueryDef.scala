package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine capability.
  *
  * @param name   stable key (driver correctness gate id)
  * @param fn     Spark-side implementation (session, sf-dir) => result
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None => driver records a rows-only check
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
