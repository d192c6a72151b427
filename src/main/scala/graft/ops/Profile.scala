package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality first look every ingest runs:
  * per column, non-null / null / exact-distinct counts and min/max
  * (rendered as strings so one schema fits every column type).
  *
  * ONE aggregation pass over the table computes every column's stats
  * (Catalyst expands the multi-distinct into a single multi-phase
  * plan with partial aggregation); the per-column unpivot happens on
  * the single result row. For very wide tables (hundreds of columns)
  * batch the columns across several calls; for approximate profiling
  * at 100 TB swap countDistinct for approx_count_distinct
  * ([[Scale.approxDistinct]]).
  */
object Profile {

  /** Inline pipeline observability via Spark's Observation API: attach
    * named metric expressions (counts, sums, null tallies) to a frame
    * so the ONE action that materializes results also computes the
    * data-quality metrics — no second scan, the MR-counters idiom at
    * the declarative layer (and unlike accumulators, exactly-once under
    * task retries). Read `observation.get` AFTER an action on the
    * returned frame.
    */
  def observed(
      df: DataFrame,
      name: String,
      metrics: Seq[(String, Column)]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "at least one metric expression is required")
    val obs = org.apache.spark.sql.Observation(name)
    val named = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, named.head, named.tail: _*), obs)
  }

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("mn"),
        col(s"__mx_$c").as("mx"))
    }
    row.select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** Exact per-group percentiles (linear interpolation between closest
    * ranks — the PERCENTILE_CONT definition, so any ANSI engine agrees
    * on the value). One `percentile` aggregate computes every requested
    * probability in a single pass; per-group sort state is bounded by
    * the group's row count. The exact twin of
    * [[Scale.approxPercentiles]] — use the sketch form when a group is
    * itself 100 TB-scale; this form when groups fit a task (the usual
    * per-language / per-source profiling shape).
    */
  def groupPercentiles(
      df: DataFrame,
      key: String,
      target: Column,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), s"bad probs: $probs")
    val named = probs.map(p => ((p * 100).round.toInt, p))
    require(named.map(_._1).distinct.size == named.size,
      s"probs $probs collide after whole-percent naming")
    df.groupBy(key)
      .agg(percentile(target, array(probs.map(lit): _*)).as("__pcts"))
      .select(col(key) +: named.zipWithIndex.map { case ((n, _), i) =>
        element_at(col("__pcts"), i + 1).as(s"p$n")
      }: _*)
      .orderBy(key)
  }
}
