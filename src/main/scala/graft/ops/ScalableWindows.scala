package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable equivalents of GLOBAL (un-partitioned) window queries.
  *
  * The certified W04/W05 forms pin SQL semantics that force a
  * single-partition WindowExec — fine at test scale, a straggler at
  * 100 TB. These variants compute the same results with no
  * single-partition window anywhere in the plan:
  *
  *   - [[withGlobalRowNumber]]: two-pass global numbering — range-
  *     partition on the order key, per-partition local row_number
  *     (window partitioned by the range-partition id), then add each
  *     partition's cumulative row offset. Offsets are one count per
  *     partition — metadata-sized, merged driver-side exactly like
  *     partition-pruning values.
  *   - [[ntileCol]]/[[percentRankCol]]/[[cumeDistCol]]: the rank family
  *     derived from the global row number and the total count (exact
  *     Spark semantics; requires the order to be a total order, which
  *     every contract query guarantees via tiebreaker columns).
  *   - [[rangeCountNear]]: value-RANGE frame counts computed on the
  *     COMPRESSED domain — aggregate per distinct order value (one
  *     partial-agg shuffle), a range self-join on that tiny domain
  *     table, and a join back. Work on the big table is one aggregation;
  *     no window at all.
  *
  * Property-tested hash-equal to the certified single-partition W04/W05
  * results (ScalableWindowsSpec), plan-asserted to contain no
  * `Exchange SinglePartition`.
  */
object ScalableWindows {

  /** Adds `out` = global row number of the total order `order` (ASC).
    * The first order column must be numeric: its approximate quantiles
    * become LITERAL bucket boundaries, so bucket membership is a pure
    * deterministic function of the row (a sampled RangePartitioner
    * would re-sample per job and could disagree between the offset
    * count and the main query). Equal first-key values always share a
    * bucket, so ties never straddle a merge boundary. One full-data
    * exchange (the per-bucket window) instead of a single-partition
    * pipe; bucket counts are metadata-sized and merged driver-side like
    * partition-pruning values.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      order: Seq[String],
      out: String = "rn",
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val probs = (1 until n).map(_.toDouble / n).toArray
    val boundaries = df
      .select(col(order.head).cast("double").as("__k"))
      .stat.approxQuantile("__k", probs, 0.001)
      .distinct.sorted
    val bucketExpr = boundaries
      .map(b => when(col(order.head).cast("double") > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val staged = df.withColumn("__b", bucketExpr)
    // one count per bucket — metadata-sized; deterministic because __b
    // is a pure function of the row
    val counts = staged.groupBy("__b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .init.zip(counts).map { case ((_, off), (b, _)) => (b, off) }
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("__b", "__offset")
    val localWin = Window.partitionBy("__b").orderBy(order.map(col): _*)
    staged
      .withColumn("__local_rn", row_number().over(localWin))
      .join(broadcast(offsetsDf), Seq("__b"))
      .withColumn(out, (col("__offset") + col("__local_rn")).cast("long"))
      .drop("__b", "__local_rn", "__offset")
  }

  /** Adds `out` = global running sum of `valueCol` over the total order
    * `order` (inclusive of the current row) — a distributed prefix sum.
    * Same two-pass shape as [[withGlobalRowNumber]]: literal quantile
    * buckets on the first order key, per-bucket local running sum, plus
    * each bucket's cumulative total (metadata-sized, merged driver-side).
    */
  def withGlobalRunningSum(
      df: DataFrame,
      order: Seq[String],
      valueCol: String,
      out: String = "run_sum",
      numPartitions: Int = 0): DataFrame = {
    // the offset merge reads long bucket totals and emits a long sum;
    // fractional types would either crash the collect or silently
    // truncate — restrict to integral values explicitly
    val vt = df.schema(valueCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType).contains(vt),
      s"withGlobalRunningSum requires an integral value column, got $vt")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val probs = (1 until n).map(_.toDouble / n).toArray
    val boundaries = df
      .select(col(order.head).cast("double").as("__k"))
      .stat.approxQuantile("__k", probs, 0.001)
      .distinct.sorted
    val bucketExpr = boundaries
      .map(b => when(col(order.head).cast("double") > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val staged = df.withColumn("__b", bucketExpr)
    val totals = staged.groupBy("__b").agg(sum(col(valueCol)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .init.zip(totals).map { case ((_, off), (b, _)) => (b, off) }
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("__b", "__offset")
    val localWin = Window.partitionBy("__b").orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("__local", sum(col(valueCol)).over(localWin))
      .join(broadcast(offsetsDf), Seq("__b"))
      .withColumn(out, (col("__offset") + col("__local")).cast("long"))
      .drop("__b", "__local", "__offset")
  }

  /** Spark-exact NTILE(buckets) from a global row number and the total
    * row count: the first (N mod buckets) buckets get ceil(N/buckets)
    * rows, the rest floor(N/buckets).
    */
  def ntileCol(rn: Column, total: Column, buckets: Int): Column = {
    val base = floor(total / buckets).cast("long")
    val rem = total % buckets
    val cut = (base + 1) * rem
    when(rn <= cut, floor((rn - 1) / (base + 1)).cast("long") + 1)
      .otherwise(rem + floor((rn - 1 - cut) / base).cast("long") + 1)
  }

  /** PERCENT_RANK over a total order: (rn - 1) / (N - 1). */
  def percentRankCol(rn: Column, total: Column): Column =
    when(total > 1, (rn - 1).cast("double") / (total - 1).cast("double"))
      .otherwise(lit(0.0))

  /** CUME_DIST over a total order: rn / N. */
  def cumeDistCol(rn: Column, total: Column): Column =
    rn.cast("double") / total.cast("double")

  /** Adds `out` = COUNT(*) over `RANGE BETWEEN preceding PRECEDING AND
    * CURRENT ROW` on `valueCol`, computed on the compressed value
    * domain: per-value counts (one partial-agg shuffle), a range
    * self-join over the domain table, joined back on the value.
    */
  def rangeCountNear(
      df: DataFrame,
      valueCol: String,
      preceding: Long,
      out: String = "cnt_near"): DataFrame = {
    val counts = df.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__c"))
    // NULL order values are peers of each other in a RANGE frame (their
    // frame is exactly the null group) — match them null-safely instead
    // of dropping them through the inner joins
    val near = counts.as("a")
      .join(counts.as("b"),
        (col("a.__v").isNull && col("b.__v").isNull) ||
          (col("b.__v") >= col("a.__v") - preceding && col("b.__v") <= col("a.__v")))
      .groupBy(col("a.__v").as("__v"))
      .agg(sum(col("b.__c")).as(out))
    df.join(near, col(valueCol) <=> col("__v")).drop("__v")
  }

  /** W05 in scalable form (same columns, same total order). The total
    * count is a driver-side metadata value (one count job) so the plan
    * carries no single-partition exchange at all.
    */
  def w05Scalable(customer: DataFrame): DataFrame = {
    val order = Seq("c_acctbal", "c_custkey")
    val base = customer.filter(col("c_nationkey") === 3)
    val total = lit(base.count())
    withGlobalRowNumber(base, order, out = "__rn")
      .select(
        col("c_custkey"),
        ntileCol(col("__rn"), total, 4).as("quart"),
        round(percentRankCol(col("__rn"), total), 6).as("pr"),
        round(cumeDistCol(col("__rn"), total), 6).as("cd"))
      .orderBy("c_custkey")
      .limit(100)
  }

  /** W04 in scalable form (same columns, same total order). */
  def w04Scalable(part: DataFrame): DataFrame =
    rangeCountNear(part, "p_size", preceding = 2L)
      .select(col("p_partkey"), col("p_size"), col("cnt_near"))
      .orderBy("p_partkey")
      .limit(100)
}
