package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine operation: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. Operations without an oracle get the driver's weaker
  * rows-only check.
  *
  * Column-name contract: the Spark result and the oracle result MUST use
  * identical column names (the driver sorts columns by name before hashing).
  */
final case class Op(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Op {
  def apply(name: String, oracle: String)(
      q: (SparkSession, String) => DataFrame): Op =
    Op(name, q, Some(oracle))

  def noOracle(name: String)(q: (SparkSession, String) => DataFrame): Op =
    Op(name, q, None)
}
