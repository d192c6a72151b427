package graft

import graft.core.{Canonical, Engine}
import graft.sources.Tables

/** The DotProductRewrite optimizer rule must (a) fire on the certified
  * SQL fold shape, (b) leave results hash-identical to §2.4, and
  * (c) not touch folds that aren't the dot-product pattern.
  */
class DotProductRewriteSpec extends SparkSpec {

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    Engine.configure(spark) // injects the rule idempotently
    Tables.registerAll(spark, sf01)
  }

  test("rule rewrites the certified L06/L07 SQL folds to graft_dot") {
    Seq("L06", "L07").foreach { id =>
      val df = spark.sql(Contract.byId(id).sparkSql)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"),
        s"$id: fold not rewritten to DotProduct:\n$optimized")
      assert(!optimized.contains("aggregate(zip_with"),
        s"$id: interpreter fold survived:\n$optimized")
      assert(Canonical.hash16(df) == Contract.hash01(id), s"$id hash changed")
    }
  }

  test("rule does not fire on non-dot-product folds (F07 sum of slice)") {
    val df = spark.sql(Contract.byId("F07").sparkSql)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), s"F07 wrongly rewritten:\n$optimized")
    assert(Canonical.hash16(df) == Contract.hash01("F07"))
  }

  test("rule does not fire on a NULL seed (fold is semantically NULL)") {
    import spark.implicits._
    Seq((1L, Array(1f, 2f), Array(3f, 4f))).toDF("id", "a", "b")
      .createOrReplaceTempView("dot_null_seed")
    val df = spark.sql(
      """SELECT id, aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
        |CAST(NULL AS DOUBLE), (s, x) -> s + x) AS d FROM dot_null_seed""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"),
      s"null-seed fold wrongly rewritten to DotProduct:\n$optimized")
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).isNullAt(1), "null seed must fold to NULL")
  }

  test("rewritten and interpreted forms agree on nulls, ragged and null-element arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (2L, Array(1f, 2f), Array(4f, 5f, 6f))) // ragged
      .toDF("id", "a", "b")
      // null element + null array rows, built via SQL to keep float type
      .union(spark.sql(
        "SELECT 3L, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))"))
      .union(spark.sql(
        "SELECT 4L, CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))"))
    df.createOrReplaceTempView("dot_edge")
    val fold =
      """SELECT id, aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
        |CAST(0.0 AS DOUBLE), (s, x) -> s + x) AS d FROM dot_edge ORDER BY id""".stripMargin
    val viaRule = spark.sql(fold).collect()
    val viaNative = spark.sql(
      "SELECT id, graft_dot(a, b) AS d FROM dot_edge ORDER BY id").collect()
    assert(viaRule.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
      == viaNative.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq)
    assert(viaRule(0).getDouble(1) == 32.0)
    assert(viaRule.drop(1).forall(_.isNullAt(1)), "ragged/null rows must be NULL")
  }
}
