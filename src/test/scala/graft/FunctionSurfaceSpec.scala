package graft

import org.apache.spark.sql.{Encoders, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.core.Canonical
import graft.functions.{MomentsAggregator, VectorFunctions}
import graft.ops.Catalog
import graft.sources.Tables

/** The custom-function surface (SURVEY §2.5): typed Aggregator UDAF
  * reproducing the A09 contract hash, the native graft_dot expression
  * through both the Column API and SQL registration, and the
  * SparkSessionExtensions hook.
  */
class FunctionSurfaceSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("typed Aggregator UDAF reproduces the A09 moments hash") {
    val m = udaf(new MomentsAggregator(),
      Encoders.row(StructType(Seq(
        StructField("x", DoubleType), StructField("y", DoubleType)))))
    val df = cat.lineitem
      .groupBy("l_returnflag")
      .agg(
        m(col("l_quantity"), col("l_extendedprice")).as("m1"),
        m(col("l_discount"), col("l_discount")).as("m2"))
      .select(
        col("l_returnflag"),
        round(sqrt(col("m1.var_x")), 4).as("sd"),
        round(col("m2.var_x"), 6).as("vr"),
        round(col("m1.corr"), 4).as("cr"))
      .orderBy("l_returnflag")
    assert(Canonical.hash16(df) == Contract.hash01("A09"))
  }

  test("graft_dot: SQL registration matches the certified fold and the Column API") {
    VectorFunctions.register(spark)
    Tables.registerAll(spark, sf01)
    val viaSql = spark.sql("""
      SELECT b.vec_id, ROUND(graft_dot(a.embedding, b.embedding), 6) AS cos
      FROM embeddings a CROSS JOIN embeddings b
      WHERE a.vec_id = 0 AND b.vec_id <> 0
      ORDER BY cos DESC, b.vec_id LIMIT 5""")
    assert(Canonical.hash16(viaSql) == Contract.hash01("L06"))
    val viaFold = spark.sql("""
      SELECT b.vec_id, ROUND(aggregate(zip_with(a.embedding, b.embedding,
               (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, x) -> s + x), 6) AS f,
             ROUND(graft_dot(a.embedding, b.embedding), 6) AS d
      FROM embeddings a CROSS JOIN embeddings b
      WHERE a.vec_id = 0 ORDER BY b.vec_id LIMIT 100""")
      .collect()
    viaFold.foreach(r => assert(r.getDouble(1) == r.getDouble(2), r.toString))
  }

  test("scalar UDF surface: registered UDF agrees with the built-in column path") {
    val tokCount = udf((s: String) => s.split(" ").count(_.nonEmpty))
    spark.udf.register("graft_tok_count", tokCount)
    val both = cat.documents
      .select(
        tokCount(col("text")).as("viaUdf"),
        size(graft.text.TextAnalysis.tokens(col("text"))).as("viaColumn"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("SparkSessionExtensions hook applies cleanly") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
