package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Co-located (bucketed) join — the 100 TB fact-fact join plan: write
  * both sides bucketed by the join key, and the join runs with NO
  * shuffle exchange on either side (SortMergeJoin over pre-bucketed
  * scans). This is the storage-level answer where AQE/broadcast can't
  * apply because both sides are large.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle and match the shuffled join") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val li = Tables.load(spark, sf001, "lineitem")
    val ord = Tables.load(spark, sf001, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
