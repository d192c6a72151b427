package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-fixture bench (round-6 VERDICT item 5): synthesize a 10×
  * sf0.1 fixture where ONE key holds ~30% of the rows — a hot user in
  * events, a duplicate pile in documents — and measure the engine's
  * skew defenses engaging against the undefended forms.
  *
  *   1. SMJ equi-join on the hot user key: AQE skew-join split ON
  *      (engine default) vs OFF.
  *   2. groupBy aggregation on the hot key: Scale.saltedAggregate vs
  *      the naive one-reducer-per-key groupBy.
  *   3. X07 minhash dedup over the 30% duplicate pile: the
  *      maxBucket/identical-signature star defense keeps candidates
  *      LINEAR in the pile (the undefended all-pairs would be ~112M
  *      candidate pairs for the ~300k pile).
  *   4. J10 as-of join driven by the hot user: the custom merge exec
  *      holds ONE candidate row per stream regardless of key mass.
  *
  * Two fixture facts that gate whether AQE's split CAN engage, found
  * the hard way this round and load-bearing for any re-run:
  *
  *   - **The fixture must be written as many parquet files.** AQE
  *     splits a skewed reduce partition at map-output granularity; a
  *     single-file fixture has one mapper, so the hot partition is one
  *     unsplittable block and OptimizeSkewedJoin (correctly) reports
  *     zero skewed partitions. Production shuffles have thousands of
  *     mappers; we write 32 files.
  *   - **Thresholds compare against COMPRESSED shuffle bytes.** The
  *     10× events fixture is ~70 MB in memory but the 2-column shuffle
  *     writes ~2.5 MB compressed; the hot partition is ~1 MB. The
  *     stock 256 MB threshold is sized for production partitions, so
  *     at fixture scale it is scaled down proportionally (256 KB /
  *     128 KB advisory). At 100 TB the hot partition dwarfs the stock
  *     threshold and the default config engages unchanged.
  *
  * The dim side is materialized to parquet before the join:
  * OptimizeSkewedJoin pattern-matches SMJ(sort(shuffle), sort(shuffle));
  * a `distinct()` dim reuses its aggregate's exchange, the aggregate
  * sits between sort and shuffle, and the rule no longer matches.
  *
  * Results are recorded in STATUS.md / PLANS.md; the plan-level pin
  * lives in SkewDefenseSpec ("AQE skew-join split engages…").
  */
object SkewBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime
    val r = f
    (r, (System.nanoTime - t0) / 1e9)
  }

  /** 10× the sf0.1 events with ~30% of rows reassigned to user_id 0:
    * replicas get fresh event_ids; rows whose replicated id hashes into
    * 3/10 of the coin space move to the hot user.
    */
  def skewedEvents(spark: SparkSession, base: String): DataFrame = {
    val ev = graft.sources.Tables.load(spark, base, "events") // H1 ts conversion
    val rep = ev.crossJoin(spark.range(10).select(col("id").as("__r")))
      .withColumn("event_id", col("event_id") * 10 + col("__r"))
      .drop("__r")
    rep.withColumn("user_id",
      when(pmod(xxhash64(col("event_id")), lit(10L)) < 3, lit(0L))
        .otherwise(col("user_id")))
  }

  /** 10× the sf0.1 documents with ~30% of the corpus replaced by ONE
    * near-identical pile (doc 0's text): fresh doc_ids throughout.
    */
  def skewedDocuments(spark: SparkSession, base: String): DataFrame = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val pileText = docs.filter(col("doc_id") === 0).select("text").first().getString(0)
    val rep = docs.crossJoin(spark.range(10).select(col("id").as("__r")))
      .withColumn("doc_id", col("doc_id") * 10 + col("__r"))
      .drop("__r")
    rep.withColumn("text",
      when(pmod(xxhash64(col("doc_id")), lit(10L)) < 3, lit(pileText))
        .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.session(shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val fixDir = "/tmp/graft_skewfix"
    if (!new java.io.File(s"$fixDir/events/_SUCCESS").exists() ||
        spark.read.parquet(s"$fixDir/events").inputFiles.length < 32) {
      // 32 files so the downstream shuffles have 32 mappers (see scaladoc)
      skewedEvents(spark, base).repartition(32)
        .write.mode("overwrite").parquet(s"$fixDir/events")
      skewedDocuments(spark, base).repartition(32)
        .write.mode("overwrite").parquet(s"$fixDir/documents")
    }
    val ev = spark.read.parquet(s"$fixDir/events")
    val docs = spark.read.parquet(s"$fixDir/documents")
    ev.select("user_id").distinct()
      .withColumn("weight", pmod(xxhash64(col("user_id")), lit(97L)))
      .write.mode("overwrite").parquet(s"$fixDir/dims")
    val dims = spark.read.parquet(s"$fixDir/dims")
    println(s"RESULT fixture: events=${ev.count()} hot=${ev.filter(col("user_id") === 0).count()} " +
      s"docs=${docs.count()} pile=${docs.groupBy("text").count().agg(max("count")).first().getLong(0)}")

    // 1. SMJ join keyed on the hot user (1-row dim per user, so no pair
    // blowup — the skew is pure partition imbalance: the hot user's
    // partition holds ~30% of the shuffle bytes) + per-row hash work.
    def joinRun(): Long =
      ev.join(dims, Seq("user_id"))
        .select(pmod(xxhash64(sha2(concat_ws(":", col("props"), col("weight")), 256)), lit(1000000007L)).as("h"))
        .agg(sum("h")).first().getLong(0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    joinRun() // warm-up: scan caches, codegen, JIT — charged to neither variant
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (n1, tOff) = timed(joinRun())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (n2, tOn) = timed(joinRun())
    // the final AQE plan must MARK the join as skew-handled; inspect the
    // SAME execution that ran (first() would plan a fresh LIMIT query)
    val skewPlan = ev.join(dims, Seq("user_id"))
      .select(pmod(xxhash64(col("props")), lit(1000000007L)).as("h")).agg(sum("h"))
    skewPlan.collect()
    val planStr = skewPlan.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    require(n1 == n2, s"skew-join results diverge: $n1 vs $n2")
    require(planStr.contains("skew=true"), "AQE skew split must engage on the fixture")
    println(f"RESULT smj_join: skewOff=$tOff%.2fs skewOn=$tOn%.2fs rows=$n1 " +
      s"skewMarked=${planStr.contains("skew=true")}")

    // 2. aggregation skew, measured finding (recorded in PLANS.md):
    // Spark's existing machinery already flattens the hot key for both
    // classes we probed — algebraic aggs never see skew (map-side
    // partials mean each reducer receives ONE partial row per mapper
    // per key), and countDistinct is rewritten by Catalyst through an
    // Expand keyed on (key, value), spreading the hot key's values
    // across reducers (measured equal with/without salting, r6).
    // saltedAggregate's remaining role is custom partial-able shapes
    // whose PARTIALS compress (its algebra is spec-pinned in
    // ScaleSpec); holistic state (collect_list of unique values) is
    // not fixable by salting — the final merge holds the key's state
    // either way — and routes to the sort-based paths instead.
    def naiveAgg(): Long =
      ev.groupBy("user_id")
        .agg(countDistinct(col("props")).as("v"))
        .agg(sum("v")).first().getLong(0)
    def saltedAgg(): Long =
      graft.ops.Scale.saltedAggregate(
        ev.select(col("user_id"), col("props")).distinct
          .withColumn("v", lit(1L)),
        Seq(col("user_id")), 32,
        partial = Seq(sum(col("v")).as("pv")),
        fin = Seq(sum(col("pv")).as("v")))
        .agg(sum("v")).first().getLong(0)
    naiveAgg(); saltedAgg() // warm-up
    val (a1, tNaive) = timed(naiveAgg())
    val (a2, tSalted) = timed(saltedAgg())
    require(a1 == a2, s"salted agg diverges: $a1 vs $a2")
    println(f"RESULT agg: naiveCountDistinct=$tNaive%.2fs saltedTwoPhase=$tSalted%.2fs v=$a1")

    // 2b. X55 secondary sort over the hot user: 300k events for ONE
    // key stream through a single task's external sort + O(1) fold —
    // state never grows with key mass (the flatMapGroups alternative
    // would buffer the full 300k-row group).
    val (gaps, tGaps) = timed(graft.ops.TypedReduce.eventGapStats(ev).count())
    println(f"RESULT x55: users=$gaps t=$tGaps%.2fs")

    // 3. X07 dedup over the 30% duplicate pile: candidates stay linear
    val (cand, tCand) = timed(
      graft.text.MinHashDedup.candidatePairs(docs,
        graft.text.MinHashConfig(maxBucket = 4096)).count())
    val (winners, tWin) = timed(
      graft.text.MinHashDedup.dedupWinners(docs,
        graft.text.MinHashConfig(maxBucket = 4096)).count())
    println(f"RESULT x07: candidates=$cand (${tCand}%.2fs) winners=$winners (${tWin}%.2fs)")

    // 5. X67 dup-coverage over the pile: the viral shingles (each
    // shared by the whole 30% pile) reach the shared-set test through
    // a partial-aggregated min/max — no per-shingle occurrence list is
    // ever buffered — and hit lists stay doc-bounded, so the pile
    // costs its own size, not its square
    val (cov, tCov) = timed(
      graft.text.TextAnalysis.crossDocDupCoverage(docs, n = 5)
        .filter(col("dup_frac") >= 0.999).count())
    println(f"RESULT x67: fully_covered=$cov t=$tCov%.2fs")

    // 4. J10 as-of path driven by the skewed events (hot user on both
    // sides): the merge holds one candidate row per stream, so the hot
    // key streams through one task without any pair/state blowup
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val (asof, tAsof) = timed(
      graft.plans.AsOfJoin
        .asof(clicks, purchases, "user_id", "p_user", "ts", "p_ts", "purchase_id")
        .count())
    println(f"RESULT asof: rows=$asof t=$tAsof%.2fs")
    spark.stop()
  }
}
