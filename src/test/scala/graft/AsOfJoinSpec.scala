package graft

import org.apache.spark.sql.functions._

import graft.core.Canonical
import graft.ops.Catalog
import graft.plans.AsOfJoin

/** The native merge-based as-of join must reproduce the certified J10
  * result (hash-equal), survive partition-count changes, and actually
  * plan through AsOfJoinExec.
  */
class AsOfJoinSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  private def j10ViaNative = {
    val e = cat.events
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    AsOfJoin.asof(clicks, purchases, "user_id", "p_user", "ts", "p_ts", "purchase_id")
      .select(col("event_id"), col("purchase_id"))
      .orderBy("event_id")
      .limit(200)
  }

  test("native as-of join hash-equals the certified J10 result") {
    assert(Canonical.hash16(j10ViaNative) == Contract.hash01("J10"))
  }

  test("as-of join plans through AsOfJoinExec with sorted co-partitioned children") {
    val plan = j10ViaNative.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(user_id") ||
      plan.contains("Exchange hashpartitioning(p_user"), s"children not co-partitioned:\n$plan")
  }

  test("as-of join is partition-count invariant") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val h3 = Canonical.hash16(j10ViaNative)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val h8 = Canonical.hash16(j10ViaNative)
      assert(h3 == h8 && h8 == Contract.hash01("J10"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
