package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table — the classic product
  * questions (conversion funnels, cohort retention) expressed as
  * ordinary equi-joins + aggregations so Catalyst plans them with
  * co-partitioned shuffles on user_id; no per-user collect_list of full
  * event histories, no windows over a global ordering.
  */
object EventAnalytics {

  /** Ordered conversion funnel: stage k counts users whose FIRST
    * qualifying stage-k event is at/after their first qualifying
    * stage-(k−1) event (the strict sequential-completion semantics).
    * Output (stage "1_<name>"…, n_users), one row per stage.
    *
    * Scale shape: one filtered scan + user_id groupBy per stage, joined
    * user_id-to-user_id — every shuffle is on the user key, partials
    * combine map-side, and the per-stage frontier is one (user, ts) row
    * per surviving user, never an event history.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val frontiers = stages.zipWithIndex.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, (st, i)) =>
        val filtered = events.filter(col("event_type") === st)
        val reached = acc match {
          case Nil =>
            filtered.groupBy("user_id").agg(min("ts").as("t"))
          case (_, prev) :: _ =>
            filtered
              .join(prev.select(col("user_id").as("pu"), col("t").as("pt")),
                col("user_id") === col("pu") && col("ts") >= col("pt"))
              .groupBy("user_id").agg(min("ts").as("t"))
        }
        (s"${i + 1}_$st", reached) :: acc
    }
    frontiers.reverse.zipWithIndex.map { case ((name, df), idx) =>
      df.agg(count(lit(1)).cast("bigint").as("n_users"))
        // order by the stage ORDINAL, not the label: "10_x" sorts
        // lexically before "1_y", which would interleave a >=10-stage
        // funnel out of sequence
        .select(lit(name).as("stage"), col("n_users"), lit(idx).as("__ord"))
    }.reduce(_ unionByName _).orderBy("__ord").drop("__ord")
  }

  /** Time-to-convert distribution: minutes from each user's first
    * `from` event to their first `to` event at/after it, summarized as
    * exact quantiles. Same join discipline as [[funnel]] — one (user,
    * ts) frontier row per user through every stage, shuffles on the
    * user key only; the final exact-percentile aggregate runs over one
    * small row per CONVERTED user, not over events.
    */
  def timeToConvert(events: DataFrame, from: String, to: String): DataFrame = {
    val f = events.filter(col("event_type") === from)
      .groupBy("user_id").agg(min("ts").as("t0"))
    val minutes = events.filter(col("event_type") === to)
      .join(f, Seq("user_id")).filter(col("ts") >= col("t0"))
      .groupBy("user_id").agg(min("ts").as("t1"), min("t0").as("t0"))
      .select(((unix_timestamp(col("t1")) - unix_timestamp(col("t0"))) / 60.0).as("m"))
    minutes.agg(
      count(lit(1)).cast("bigint").as("n_converted"),
      round(min("m"), 4).as("min_minutes"),
      round(expr("percentile(m, 0.5)"), 4).as("p50_minutes"),
      round(expr("percentile(m, 0.9)"), 4).as("p90_minutes"),
      round(max("m"), 4).as("max_minutes"))
  }

  /** Hour-over-hour cohort retention: per activity hour, how many
    * distinct users were active and how many of them were also active
    * in the NEXT hour. One distinct (hour, user) pass, then a
    * self-equi-join on (user, shifted hour) — both shuffles on the user
    * key, no window over the timeline.
    */
  def hourlyRetention(events: DataFrame): DataFrame = {
    val a = events.select(date_trunc("hour", col("ts")).as("h"), col("user_id")).distinct()
    a.as("a").join(a.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("b.h") === col("a.h") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("a.h").as("h"))
      .agg(
        count(lit(1)).cast("bigint").as("active"),
        count(col("b.user_id")).cast("bigint").as("retained"))
      .orderBy("h")
  }
}
