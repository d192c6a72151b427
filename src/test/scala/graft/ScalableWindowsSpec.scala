package graft

import graft.core.Canonical
import graft.ops.{Catalog, ScalableWindows}

/** The scalable global-window variants must be value-identical to the
  * certified single-partition forms (same hashes as W04/W05) while
  * keeping every window partitioned — no Exchange SinglePartition in
  * the plan.
  */
class ScalableWindowsSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("W05: adaptive entry and BOTH branches hash-equal the certified result") {
    val base = cat.customer.filter(
      org.apache.spark.sql.functions.col("c_nationkey") === 3)
    val want = Contract.hash01("W05")
    assert(Canonical.hash16(ScalableWindows.w05Scalable(cat.customer)) == want)
    assert(Canonical.hash16(ScalableWindows.w05Plain(base)) == want)
    assert(Canonical.hash16(ScalableWindows.w05TwoPass(base)) == want)
  }

  test("W04: adaptive entry and BOTH branches hash-equal the certified result") {
    val want = Contract.hash01("W04")
    assert(Canonical.hash16(ScalableWindows.w04Scalable(cat.part)) == want)
    assert(Canonical.hash16(ScalableWindows.w04Plain(cat.part)) == want)
    assert(Canonical.hash16(ScalableWindows.w04TwoPass(cat.part)) == want)
  }

  test("scale branches have no single-partition exchange in the plan") {
    val base = cat.customer.filter(
      org.apache.spark.sql.functions.col("c_nationkey") === 3)
    Seq(
      ScalableWindows.w05TwoPass(base),
      ScalableWindows.w04TwoPass(cat.part)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"scalable window plan must not funnel to one partition:\n$plan")
    }
  }

  test("size-adaptive gate: plain below the threshold, two-pass above, branches agree at scale") {
    import org.apache.spark.sql.functions._
    // the test corpus is KB-scale: the adaptive entries must pick plain
    assert(!ScalableWindows.needsScaleBranch(
      cat.customer.filter(col("c_nationkey") === 3)))
    assert(!ScalableWindows.needsScaleBranch(cat.part))
    // a synthetic customer whose plan-stats estimate exceeds the 32 MB
    // threshold: the gate must flip, and the two branches must stay
    // value-identical on it (hash-equality at the LARGE size — the
    // "both sizes" half of the dual-branch pin). acctbal cycles through
    // 997 residues so the rank family sees heavy ties; custkey breaks
    // them into a total order.
    val big = spark.range(0L, 3000000L).select(
      (col("id") % 997L).cast("double").as("c_acctbal"),
      col("id").as("c_custkey"),
      lit(3L).as("c_nationkey"))
    assert(ScalableWindows.needsScaleBranch(big),
      s"3M-row fixture should exceed GlobalWindowScaleBytes: " +
        s"${big.queryExecution.optimizedPlan.stats.sizeInBytes}")
    assert(Canonical.hash16(ScalableWindows.w05TwoPass(big))
      == Canonical.hash16(ScalableWindows.w05Plain(big)))
    val bigPart = spark.range(0L, 8000000L).select(
      col("id").as("p_partkey"),
      (col("id") % 50L).cast("int").as("p_size"))
    assert(ScalableWindows.needsScaleBranch(bigPart))
    assert(Canonical.hash16(ScalableWindows.w04TwoPass(bigPart))
      == Canonical.hash16(ScalableWindows.w04Plain(bigPart)))
  }

  test("global running sum equals the single-partition window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val src = cat.documents.select(col("doc_id"), col("n_chars"))
    val naive = src
      .withColumn("cum", sum("n_chars").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val scalable = ScalableWindows
      .withGlobalRunningSum(src, Seq("doc_id"), "n_chars", out = "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scalable == naive)
    val plan = ScalableWindows.withGlobalRunningSum(src, Seq("doc_id"), "n_chars")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"))
  }

  test("W04 compressed-domain plan carries no nested-loop domain self-join") {
    val plan = ScalableWindows.w04Scalable(cat.part)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rangeCountNear must be equi-join only:\n$plan")
  }

  test("rangeCountNear refuses a continuous (fractional) order column") {
    val e = intercept[IllegalArgumentException] {
      ScalableWindows.rangeCountNear(cat.customer, "c_acctbal", 2L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("rangeCountNear is exact for order values near Long.MaxValue (no sequence wrap)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val m = Long.MaxValue
    val df = Seq(m, m, m - 1, m - 3, 10L).toDF("v")
    val got = ScalableWindows.rangeCountNear(df, "v", preceding = 2L)
      .groupBy("v").agg(max("cnt_near").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // frame [v-2, v]: m sees {m,m,m-1}; m-1 sees {m-1,m-3}; m-3 sees {m-3}; 10 sees {10}
    assert(got == Map(m -> 3L, (m - 1) -> 2L, (m - 3) -> 1L, 10L -> 1L), s"got $got")
  }

  test("global row number works on a STRING first order key (sampled literal boundaries)") {
    val df = ScalableWindows.withGlobalRowNumber(
      cat.customer, Seq("c_name", "c_custkey"), out = "g_rn", numPartitions = 7)
    val rows = df.select("c_name", "c_custkey", "g_rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(rows.map(_._3).toSeq == (1L to rows.length).toSeq, "row numbers must be 1..N dense")
    assert(rows.toSeq == rows.sortBy(t => (t._1, t._2)).toSeq,
      "numbering must follow the (c_name, c_custkey) total order")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"))
  }

  test("global-window bucketing refuses an unorderable-for-bucketing key type") {
    val e = intercept[IllegalArgumentException] {
      ScalableWindows.withGlobalRowNumber(
        cat.documents.selectExpr("doc_id", "array(doc_id) as arr"), Seq("arr", "doc_id"))
    }
    assert(e.getMessage.contains("numeric or string"))
  }

  test("bucket assignment is the O(log P) binary-search expression, not a when-chain") {
    // the projection must reference boundary_bucket once; a chained-when
    // fold would grow the plan linearly with the partition count
    val plan = ScalableWindows.withGlobalRowNumber(
      cat.orders, Seq("o_totalprice", "o_orderkey"), numPartitions = 256)
      .queryExecution.analyzed.toString
    assert(plan.contains("boundary_bucket"), s"expected boundary_bucket in:\n$plan")
    assert(!plan.contains("CASE WHEN"), "bucket assignment must not be a when-chain")
  }

  test("global row number is a correct total-order numbering under skewed partitioning") {
    val df = ScalableWindows.withGlobalRowNumber(
      cat.orders.repartition(13), Seq("o_totalprice", "o_orderkey"), out = "g_rn")
    val rows = df.select("o_totalprice", "o_orderkey", "g_rn")
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(rows.map(_._3).toSeq == (1L to rows.length).toSeq, "row numbers must be 1..N dense")
    assert(rows.toSeq == rows.sortBy(t => (t._1, t._2)).toSeq,
      "numbering must follow the (o_totalprice, o_orderkey) total order")
  }
}
