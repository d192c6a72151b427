package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).
  *
  * Pivot pins an EXPLICIT value list (never the values-discovery scan —
  * at 100 TB that is a full extra pass and a nondeterministic column
  * order) and renders missing cells as 0 so the result matches the
  * portable FILTER/CASE aggregation form. Unpivot uses Spark's native
  * `melt` (an Expand — one pass, no join).
  */
object Reshape {

  /** COUNT(*) per `groupCol` pivoted over the explicit `values` of
    * `pivotCol`; output columns are `n_<value>` (lowercased), absent
    * combinations are 0.
    */
  def pivotCounts(
      df: DataFrame,
      groupCol: String,
      pivotCol: String,
      values: Seq[String]): DataFrame = {
    // output names are lowercased, so values differing only by case
    // would silently collapse onto one column — refuse up front
    require(values.map(_.toLowerCase).distinct.size == values.size,
      s"pivot values collide after lowercasing: ${values.mkString(", ")}")
    val wide = df.groupBy(groupCol).pivot(pivotCol, values).count()
    values.foldLeft(wide) { (d, v) =>
      d.withColumn(s"n_${v.toLowerCase}", coalesce(col(s"`$v`"), lit(0L))).drop(v)
    }.orderBy(groupCol)
  }

  /** Melt the given numeric columns to (ids..., attr, val) long form;
    * values are cast to double so one value column fits all inputs.
    */
  def meltNumeric(
      df: DataFrame,
      ids: Seq[String],
      values: Seq[String]): DataFrame =
    df.select(ids.map(col) ++ values.map(v => col(v).cast("double").as(v)): _*)
      .melt(ids.map(col).toArray, values.map(col).toArray, "attr", "val")
      .orderBy((ids :+ "attr").map(col): _*)
}
