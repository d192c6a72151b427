package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The imperative corners of the MapReduce contract (SURVEY §2.1) that
  * the declarative operators don't exercise:
  *
  *  - `reduce(k, list(v))` with arbitrary per-group logic →
  *    `Dataset.groupByKey(...).flatMapGroups` — the escape hatch when a
  *    group's output isn't an aggregate (here: a bounded top-k heap per
  *    group, never materializing the whole group).
  *  - counters → `LongAccumulator`, merged task-side like MR counters.
  *
  * Prefer the declarative forms (Window / groupBy.agg) wherever they
  * express the semantics — these exist for the cases they can't.
  */
object TypedReduce {

  /** Top-k rows per group by a sort value, computed with a bounded
    * per-group buffer inside `flatMapGroups` (group input is iterated
    * once; memory is O(k), not O(group)). Output: (group, id, rank
    * 1..k) ordered like ROW_NUMBER with (value DESC, id ASC)
    * tie-breaking.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        // bounded buffer: keep the k best under (value DESC, id ASC)
        val best = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        rows.foreach { case (_, id, v) =>
          best += ((id, v))
          if (best.length > 4 * k) {
            val pruned = best.sortBy { case (i, vv) => (-vv, i) }.take(k)
            best.clear(); best ++= pruned
          }
        }
        best.sortBy { case (i, vv) => (-vv, i) }.take(k).zipWithIndex.map {
          case ((id, v), rank) => (key, id, v, rank + 1)
        }
      }
      .toDF(groupCol, idCol, valueCol, "rn")
  }

  /** Row counter over any DataFrame using a task-merged accumulator —
    * the MR counters surface. Returns the materialized count; the
    * accumulator is also left populated for the caller.
    */
  def countWithAccumulator(df: DataFrame, acc: LongAccumulator): Long = {
    df.foreach(_ => acc.add(1))
    acc.value
  }
}
