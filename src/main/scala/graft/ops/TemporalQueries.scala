package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame (E2) forms of the batch-equivalent streaming queries.
  * The streaming module (graft.streaming) runs the same aggregations
  * through `readStream` + `window()`/`session_window()` + watermark;
  * these batch forms are the oracle-checkable equivalents (SURVEY §2.3).
  */
object TemporalQueries {

  val queries: Map[String, Catalog => DataFrame] = Map(
    // T01 — tumbling 1-hour window ≡ window($"ts", "1 hour") streaming.
    "T01" -> { c =>
      c.events.filter(col("user_id") < 50)
        .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
        .orderBy("w", "event_type")
    },
    // T02 — sliding 1h/30min via epoch arithmetic: each event lands in
    // ≤2 windows (explode of the two slide offsets), then one shuffle.
    // ≡ window($"ts", "1 hour", "30 minutes") streaming.
    "T02" -> { c =>
      import c.spark.implicits._
      val epoch = unix_timestamp(col("ts"))
      val wBase = floor(epoch / 1800).cast("bigint") * 1800 - col("off")
      c.events.filter(col("user_id") < 20)
        .crossJoin(broadcast(Seq(0, 1800).toDF("off")))
        .filter(epoch >= wBase && epoch < wBase + 3600)
        .select(timestamp_seconds(wBase).as("w_start"), col("value"))
        .groupBy("w_start")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
        .orderBy("w_start")
    },
    // T03 — session windows (30-min gap) as gaps-and-islands: LAG marks
    // session breaks, a running SUM numbers the sessions, then a plain
    // aggregate. ≡ session_window($"ts", "30 minutes") streaming.
    "T03" -> { c =>
      val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.events.filter(col("user_id") < 10)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        .withColumn("brk",
          when(lag("ts", 1).over(order).isNull ||
            col("ts") - lag("ts", 1).over(order) > expr("INTERVAL 30 MINUTE"), 1)
            .otherwise(0))
        .withColumn("sess", sum("brk").over(running))
        .groupBy("user_id", "sess")
        .agg(
          count(lit(1)).as("n"),
          min("ts").as("s_start"), max("ts").as("s_end"),
          round(sum("value"), 2).as("v"))
        .orderBy("user_id", "sess")
    }
  )
}
