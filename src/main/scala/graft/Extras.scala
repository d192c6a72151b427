package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operators beyond the 55-query contract: the LLM-pipeline scale paths
  * (dedup, similarity search, text analysis, multimodal plumbing).
  * Entries whose semantics are DuckDB-expressible also appear in
  * [[oracleSql]]; the rest get the driver's rows-only check.
  *
  * Populated by the extra-operator modules as they land (round 1+).
  */
object Extras {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  def oracleSql: Map[String, String] = Map.empty
}
