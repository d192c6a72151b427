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

  /** MapReduce SECONDARY SORT, instantiated on a real reducer: per-user
    * event-gap statistics that require the user's events in TIME ORDER.
    * `flatMapGroups` hands each group an UNSORTED iterator, so a reducer
    * needing value order would have to buffer and sort the group —
    * O(group) memory, the thing secondary sort exists to avoid. Here
    * the classic shape instead: hash-repartition by key, ONE in-task
    * sort by (key, time, id) (Spark's external spillable sort — a
    * billion-event user spills to disk, never to reducer memory), and a
    * mapPartitions that walks each partition's key runs with an O(1)
    * streaming fold per group.
    *
    * Output per user: event count, max inter-event gap (µs; 0 for a
    * single event), and the number of gaps above `gapThresholdSec` —
    * the session-break / bot-cadence signal. Gaps are exact integer
    * microseconds (unix_micros ↔ epoch_us), oracle-checked as X55.
    */
  def eventGapStats(events: DataFrame, gapThresholdSec: Long = 3600L): DataFrame = {
    require(gapThresholdSec > 0, s"gapThresholdSec=$gapThresholdSec")
    val spark = events.sparkSession
    import spark.implicits._
    val thrUs = gapThresholdSec * 1000000L
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // streaming run-walker: O(1) state per group, one output row per
        // key run; results buffer is #keys-per-partition sized (the
        // OUTPUT, not the data)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var cur = 0L
        var n = 0L
        var prevUs = 0L
        var maxGap = 0L
        var longGaps = 0L
        def flush(): Unit = if (n > 0) out += ((cur, n, maxGap, longGaps))
        it.foreach { case (u, us, _) =>
          if (n == 0 || u != cur) {
            flush()
            cur = u; n = 1L; prevUs = us; maxGap = 0L; longGaps = 0L
          } else {
            val gap = us - prevUs
            if (gap > maxGap) maxGap = gap
            if (gap > thrUs) longGaps += 1
            prevUs = us
            n += 1
          }
        }
        flush()
        out.iterator
      }
      .toDF("user_id", "n_events", "max_gap_us", "n_long_gaps")
      .orderBy("user_id")
  }
}
