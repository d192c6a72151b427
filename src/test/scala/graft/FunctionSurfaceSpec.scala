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

  test("graft_zorder_n: 2-ary equals graft_zorder bit-for-bit; 3-ary locality, range and null contracts") {
    import graft.functions.{ZOrderValue, ZOrderValueN}
    graft.functions.VectorFunctions.register(spark)
    // the N-ary layout reproduces the certified 2-ary one exactly
    val both = cat.part.select(
      ZOrderValue(col("p_partkey").cast("long"), col("p_size").cast("long")).as("z2"),
      ZOrderValueN(col("p_partkey").cast("long"), col("p_size").cast("long")).as("zn"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // SQL registration agrees with the interpreted helper
    val viaSql = spark.sql("SELECT graft_zorder_n(3L, 5L, 7L)").collect()(0).getLong(0)
    assert(viaSql == ZOrderValueN.interleaveN(Array(3L, 5L, 7L), 20))
    // 3-ary locality: sorting a 16^3 grid by z3 and cutting it into 64
    // runs must give runs whose span in EVERY dimension is the 4-cell
    // Morton block, not the 16-cell domain
    import spark.implicits._
    val grid = (for { x <- 0 until 16; y <- 0 until 16; z <- 0 until 16 }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val sorted = grid
      .withColumn("m", ZOrderValueN(col("x"), col("y"), col("z")))
      .orderBy("m")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sorted.grouped(64).foreach { run =>
      Seq(run.map(_._1), run.map(_._2), run.map(_._3)).foreach { d =>
        assert(d.max - d.min <= 3,
          s"a 64-row Morton run must span one 4x4x4 block, got span ${d.max - d.min}")
      }
    }
    // out-of-range inputs error rather than silently masking
    intercept[Exception] {
      spark.range(1).select(ZOrderValueN(lit(1L << 21).cast("long"),
        lit(0L), lit(0L))).collect()
    }
    // nulls propagate
    val n = spark.sql("SELECT graft_zorder_n(CAST(NULL AS BIGINT), 1L, 2L)").collect()(0)
    assert(n.isNullAt(0))
  }

  test("WinnowHash codegen path equals interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "tiny"), (3L, ""), (4L, "aaaaaaaaaaaaaaaaaaaaaaaa")).toDF("id", "s")
    def prints(mode: String): Map[Long, Seq[Long]] = {
      val before = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try rows.select(col("id"),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.functions.WinnowHash(
              org.apache.spark.sql.GraftColumnBridge.expression(col("s")), 5, 4)).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", before)
    }
    val gen = prints("CODEGEN_ONLY")
    val interp = prints("NO_CODEGEN")
    assert(gen == interp, s"codegen ≠ interpreted: $gen vs $interp")
    assert(gen(1L).nonEmpty && gen(2L).isEmpty && gen(4L).size == 1)
  }

  test("CodePointUnits (native, one pass) equals the substr Column twin on adversarial strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // astral 𝔘 = one code point / two UTF-16 units; the native walk
    // must window code points exactly like Column substr (and DuckDB)
    val rows = Seq(
      (1L, ""), (2L, "a"), (3L, "plain ascii words"),
      (4L, (0x4e00 to 0x4e40).map(_.toChar).mkString),
      (5L, "𝔘" * 5 + " ab " + "𝔘"), (6L, "  spaces  kept  "),
      (7L, "é mixé́ nfc-sensitive")).toDF("id", "s")
    val want = rows.select(col("id"),
        graft.text.TextAnalysis.charUnitsTwin(col("s")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // pin BOTH evaluation paths: CODEGEN_ONLY exercises doGenCode
    // (the generated static-call code), NO_CODEGEN the interpreted
    // nullSafeEval — the two must agree with the substr twin exactly
    val before = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        val got = rows.select(col("id"),
            graft.text.TextAnalysis.charUnits(col("s")).as("u"))
          .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        assert(got == want,
          s"native ≠ twin under $mode: ${got.keys.filter(k => got(k) != want(k))}")
        assert(got(5L).count(_ == "𝔘") == 6 && got(5L).size == 10,
          s"astral units counted as single code points under $mode: ${got(5L)}")
      }
    } finally spark.conf.set("spark.sql.codegen.factoryMode", before)
  }
}
