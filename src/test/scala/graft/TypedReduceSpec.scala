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
}
