package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.{Sinks, Tables}

/** Dynamic partition pruning (DPP) — the one big-cluster scan-saver a
  * real 100 TB star schema lives on: the FACT table is laid out
  * partitioned by a date-derived key ([[Sinks.parquetCompacted]]'s
  * `partitionBy` path, one file per partition dir), a DIM carrying the
  * filterable attribute joins on that key, and Spark turns the dim's
  * selective filter into a runtime `dynamicpruning` subquery on the
  * fact scan — so the fact read touches ONLY the partitions the
  * surviving dim keys name, without the filter being statically
  * derivable. This spec pins all three pieces of evidence on a
  * month-partitioned lineitem at sf0.01:
  *
  *   1. the executed fact scan carries a `dynamicpruning` expression in
  *      its `PartitionFilters` (the plan-shape pin);
  *   2. the scan's driver metrics report exactly the selected month
  *      partitions and STRICTLY fewer files than the layout holds (the
  *      files-read pin — the quantity that decides whether a 100 TB
  *      scan costs 3 months or 84);
  *   3. the pruned result equals the same query over the unpartitioned
  *      table, and the J02-shape star join is hash-identical across
  *      layouts (layout invariance — partitioning is physical, never
  *      semantic).
  */
class DppSpec extends SparkSpec {

  /** Every physical node reachable from `p`, descending through AQE
    * wrappers and materialized query stages (scans live inside stages
    * once AQE has executed them).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val through: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: through.flatMap(allNodes)
  }

  private def factScans(df: DataFrame): Seq[FileSourceScanExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "ship_month") => f
    }

  // month-partitioned copy of sf0.01 lineitem (~84 ship months, one
  // file per month via the compacted writer) + a tiny month dim with
  // the quarter attribute the query filters on — built once, shared by
  // both tests
  private lazy val layout: (String, String, Long, Long) = {
    val li = Tables.load(spark, sf01, "lineitem")
    val factDir = Files.createTempDirectory("graft-dpp-fact").toString
    Sinks.parquetCompacted(
      li.withColumn("ship_month",
        date_format(col("l_shipdate"), "yyyy-MM")),
      factDir, partitionBy = Seq("ship_month"))
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    spark.read.parquet(factDir)
      .select("ship_month").distinct()
      .withColumn("quarter",
        concat(substring(col("ship_month"), 1, 4), lit("-Q"),
          ceil(month(to_date(concat(col("ship_month"), lit("-01")))) / 3)))
      .write.mode("overwrite").parquet(dimDir)
    val months = spark.read.parquet(factDir).select("ship_month").distinct().count()
    val walk = Files.walk(java.nio.file.Paths.get(factDir))
    val nFiles =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count { p =>
          val n = p.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
        }.toLong
      } finally walk.close()
    (factDir, dimDir, months, nFiles)
  }

  test("DPP: month-partitioned fact joined to a quarter-filtered dim prunes to exactly the dim's months") {
    val (factDir, dimDir, totalMonths, totalFiles) = layout
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir)
    def revenueByMonth(f: DataFrame): Array[(String, Double)] =
      f.join(dim.filter(col("quarter") === "1995-Q1"), Seq("ship_month"))
        .groupBy("ship_month")
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))), 2).cast("double").as("revenue"))
        .orderBy("ship_month")
        .collect().map(r => (r.getString(0), r.getDouble(1)))

    val df = fact.join(dim.filter(col("quarter") === "1995-Q1"), Seq("ship_month"))
      .groupBy("ship_month")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))), 2).cast("double").as("revenue"))
      .orderBy("ship_month")
    val rows = df.collect()

    // 1 — plan shape: the fact scan's PartitionFilters carry a runtime
    // dynamicpruning subquery (NOT a static IN-list: the quarter
    // attribute exists only in the dim)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no dynamicpruning expression in the executed plan:\n$planStr")
    val scan = factScans(df).headOption.getOrElse(
      fail(s"no fact FileSourceScanExec found in:\n$planStr"))
    assert(scan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"fact scan PartitionFilters lack dynamicpruning: ${scan.partitionFilters}")

    // 2 — files/partitions actually read: exactly the three 1995-Q1
    // months, strictly below the full layout (the metric is driver-side,
    // posted when the scan resolves its dynamically selected partitions)
    val partsRead = scan.metrics("numPartitions").value
    val filesRead = scan.metrics("numFiles").value
    assert(partsRead == 3L,
      s"expected 3 pruned month partitions (1995-01..03), read $partsRead of $totalMonths")
    assert(filesRead < totalFiles,
      s"DPP read $filesRead files but the layout holds $totalFiles — nothing pruned")

    // 3 — pruning is physical, not semantic: same result as the
    // unpartitioned table with the month derived on the fly
    val unpart = Tables.load(spark, sf01, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      revenueByMonth(unpart).toSeq,
      "pruned result diverges from the unpartitioned computation")
    assert(rows.length == 3, s"1995-Q1 must cover 3 months, got ${rows.length}")
  }

  test("layout invariance: the J02-shape star join is identical over the partitioned and flat lineitem") {
    val (factDir, _, _, _) = layout
    def j02Shape(lineitem: DataFrame): Seq[(String, String, Double)] = {
      val c = graft.ops.Catalog(spark, sf01)
      lineitem
        .join(c.orders.filter(col("o_orderdate") >=
          lit(java.time.LocalDateTime.of(1997, 1, 1, 0, 0))),
          col("l_orderkey") === col("o_orderkey"))
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))), 2).cast("double").as("revenue"))
        .orderBy("r_name", "n_name")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    }
    val flat = j02Shape(Tables.load(spark, sf01, "lineitem"))
    val partitioned = j02Shape(spark.read.parquet(factDir).drop("ship_month"))
    assert(flat == partitioned,
      "J02-shape result changed under the month-partitioned layout")
  }
}
