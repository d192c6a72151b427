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

  test("union+window as-of alternative stays hash-equal to the certified J10") {
    assert(Canonical.hash16(graft.ops.RelationalQueries.asofUnionWindow(cat))
      == Contract.hash01("J10"))
  }

  test("as-of edge cases: no match, inclusive tie, tie-break, null keys, empty right") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // user 10: matches tie at ts=100 (max tie wins)
      (2L, 10L, 99L),  // before any purchase → null
      (3L, 20L, 50L),  // user 20 has no purchases → null
      (4L, 10L, 200L)  // later click keeps latest purchase
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L, 7L), // tie at ts=100, smaller tie id
      (10L, 100L, 9L), // tie winner (max tie)
      (10L, 150L, 11L) // latest before ts=200
    ).toDF("p_user", "p_ts", "purchase_id")
    val got = AsOfJoin.asof(left, right, "user_id", "p_user", "ts", "p_ts", "purchase_id")
      .select("event_id", "purchase_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got == Map(1L -> 9L, 2L -> null, 3L -> null, 4L -> 11L))
    // empty right side → all null
    val gotEmpty = AsOfJoin.asof(left, right.filter(col("p_ts") < 0),
      "user_id", "p_user", "ts", "p_ts", "purchase_id")
      .select("event_id", "purchase_id")
      .collect().map(r => r.isNullAt(1))
    assert(gotEmpty.forall(identity) && gotEmpty.length == 4)
    // shared-lineage self-join must be rejected loudly
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, left, "user_id", "user_id", "ts", "ts", "event_id")
    }
  }

  test("as-of join with STRING keys keeps candidates across key groups (buffer-reuse regression)") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // one partition forces alice+bob through the same merge pass: a
      // stale buffer-backed candidateKey would corrupt alice's match as
      // soon as bob's rows are peeked
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val left = Seq(
        ("alice", 100L, 1L), ("alice", 300L, 2L),
        ("bob", 100L, 3L), ("bob", 300L, 4L)).toDF("k", "ts", "event_id")
      val right = Seq(
        ("alice", 50L, 10L), ("alice", 250L, 11L),
        ("bob", 60L, 20L)).toDF("rk", "rts", "purchase_id")
      val got = AsOfJoin.asof(left, right, "k", "rk", "ts", "rts", "purchase_id")
        .select("event_id", "purchase_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 10L, 2L -> 11L, 3L -> 20L, 4L -> 20L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
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
