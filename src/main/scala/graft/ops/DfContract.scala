package graft.ops

import org.apache.spark.sql.DataFrame

/** The full E2 (typed DataFrame) implementation of the 55-query
  * contract — one entry per SURVEY.md §2.4 ID, hash-equivalent to the
  * Appendix-A SQL (guarded by DfContractSpec).
  */
object DfContract {
  val all: Map[String, Catalog => DataFrame] =
    RelationalQueries.queries ++
      AggregateQueries.queries ++
      WindowQueries.queries ++
      ScalarQueries.queries ++
      TemporalQueries.queries ++
      TextVectorQueries.queries
}
