package graft

import org.apache.spark.sql.functions._

import graft.ops.{Catalog, TypedReduce}

/** flatMapGroups top-k must agree with the declarative window form
  * (W01's semantics), and accumulators must count exactly once per row.
  */
class TypedReduceSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("flatMapGroups top-3 per segment equals the W01 window result") {
    val typed = TypedReduce.topKPerGroup(cat.customer, "c_mktsegment", "c_custkey", "c_acctbal", 3)
      .select("c_mktsegment", "c_custkey", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val windowed = graft.ops.WindowQueries.queries("W01")(cat)
      .select("c_mktsegment", "c_custkey", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(typed == windowed)
  }

  test("accumulator counts every lineitem row once") {
    val acc = spark.sparkContext.longAccumulator("graft.rows")
    val n = TypedReduce.countWithAccumulator(cat.lineitem, acc)
    assert(n == 60000L)
    assert(acc.value == 60000L)
  }

  test("secondary sort: gap stats match a planted fixture and a windowed reference, layout-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: events at t=0s, 10s, 5000s → gaps 10s and 4990s (one over
    // a 1-hour... use 60s threshold: 4990 > 60); user 2: single event
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
    def ts(s: Long) = java.sql.Timestamp.from(base.plusSeconds(s))
    val planted = Seq(
      (1L, ts(0L), 1L), (1L, ts(10L), 2L), (1L, ts(5000L), 3L),
      (2L, ts(100L), 4L))
      .toDF("user_id", "ts", "event_id")
    val got = TypedReduce.eventGapStats(planted, gapThresholdSec = 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 4990L * 1000000L, 1L),
      (2L, 1L, 0L, 0L)))
    // against the declarative window form on real events, any layout
    val events = graft.sources.Tables.load(spark, sf01, "events")
    def viaWindow(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      df.select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          coalesce(max("gap"), lit(0L)).as("max_gap_us"),
          coalesce(sum(when(col("gap") > 3600L * 1000000L, 1L)), lit(0L)).as("n_long_gaps"))
    }
    val a = TypedReduce.eventGapStats(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = viaWindow(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b, "secondary-sort fold must equal the windowed reference")
    val c = TypedReduce.eventGapStats(events.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(c == a, "layout must not change the fold")
  }
}
