package graft

import java.nio.file.Files

import graft.core.Canonical
import graft.sources.{Sinks, Tables}

/** Source/sink round-trips (SURVEY §2.3 scans/sinks): parquet for every
  * table (exact), CSV/JSON for a representative table with an explicit
  * schema on read.
  */
class SinksSpec extends SparkSpec {

  private def hashSorted(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.map(org.apache.spark.sql.functions.col).toSeq
    Canonical.hash16(df.orderBy(cols: _*))
  }

  test("parquet sink round-trips every table exactly") {
    Tables.names.foreach { name =>
      val src = Tables.load(spark, sf001, name)
      val dir = Files.createTempDirectory(s"sink-$name").toString
      Sinks.parquet(src, dir)
      val back = Sinks.readParquet(spark, dir)
      assert(hashSorted(back) == hashSorted(src), s"parquet round-trip drift for $name")
    }
  }

  test("orc sink round-trips every table exactly (incl. partitioned)") {
    Tables.names.foreach { name =>
      val src = Tables.load(spark, sf001, name)
      val dir = Files.createTempDirectory(s"sink-orc-$name").toString
      Sinks.orc(src, dir)
      val back = Sinks.readOrc(spark, dir)
      assert(hashSorted(back) == hashSorted(src), s"orc round-trip drift for $name")
    }
    val src = Tables.load(spark, sf001, "orders")
    val dir = Files.createTempDirectory("sink-orc-part").toString
    Sinks.orc(src, dir, partitionBy = Seq("o_orderstatus"))
    val back = Sinks.readOrc(spark, dir)
      .select(src.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    assert(hashSorted(back) == hashSorted(src))
  }

  test("partitioned parquet sink preserves content") {
    val src = Tables.load(spark, sf001, "orders")
    val dir = Files.createTempDirectory("sink-part").toString
    Sinks.parquet(src, dir, partitionBy = Seq("o_orderstatus"))
    val back = Sinks.readParquet(spark, dir).select(src.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    assert(hashSorted(back) == hashSorted(src))
  }

  test("csv sink round-trips with explicit schema") {
    val src = Tables.load(spark, sf001, "customer")
    val dir = Files.createTempDirectory("sink-csv").toString
    Sinks.csv(src, dir)
    val back = Sinks.readCsv(spark, dir, src.schema)
    assert(hashSorted(back) == hashSorted(src))
  }

  test("text sink round-trips the documents corpus") {
    val src = Tables.load(spark, sf001, "documents").select("text")
    val dir = Files.createTempDirectory("sink-text").toString
    Sinks.text(src, dir)
    val back = Sinks.readText(spark, dir).withColumnRenamed("value", "text")
    assert(hashSorted(back) == hashSorted(src))
  }

  test("json sink round-trips with explicit schema") {
    val src = Tables.load(spark, sf001, "documents")
    val dir = Files.createTempDirectory("sink-json").toString
    Sinks.json(src, dir)
    val back = Sinks.readJson(spark, dir, src.schema)
    assert(hashSorted(back) == hashSorted(src))
  }

  test("compacted parquet writer bounds file count and keeps one file per partition dir") {
    import org.apache.spark.sql.functions.col
    val src = Tables.load(spark, sf001, "lineitem").repartition(24) // many upstream tasks
    val est = src.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = (est / 4 + 1).toLong // expect exactly 4 files from the estimate
    val dir = Files.createTempDirectory("sink-compact").toString
    Sinks.parquetCompacted(src, dir, targetFileBytes = target)
    def partFiles(d: String): Seq[java.io.File] =
      new java.io.File(d).listFiles((_, n) => n.endsWith(".parquet")).toSeq
    assert(partFiles(dir).size == 4,
      s"expected 4 part files, got ${partFiles(dir).size} (est=$est target=$target)")
    assert(hashSorted(Sinks.readParquet(spark, dir)) == hashSorted(src))
    // partitioned: 24 upstream tasks x 5 langs would fragment into up to
    // 120 files; the compacted writer must leave ONE file per lang dir
    val docs = Tables.load(spark, sf001, "documents").repartition(24)
    val pdir = Files.createTempDirectory("sink-compact-part").toString
    Sinks.parquetCompacted(docs, pdir, partitionBy = Seq("lang"))
    val langDirs = new java.io.File(pdir).listFiles((f: java.io.File) => f.isDirectory).toSeq
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      assert(partFiles(d.toString).size == 1, s"${d.getName}: ${partFiles(d.toString).size} files")
    }
    assert(hashSorted(Sinks.readParquet(spark, pdir).select(docs.columns.map(col).toSeq: _*))
      == hashSorted(docs))
  }

  test("merged-schema read unions columns across parquet file generations") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("sink-evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(s"$dir/gen=2")
    val merged = Sinks.readParquetMerged(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("gen", "id", "v1", "v2"))
    val rows = merged.select("id", "v1", "v2").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(9.5))),
      s"old-generation rows must carry nulls in new columns: ${rows.mkString(",")}")
    // the default single-footer read would MISS v2 depending on which
    // footer wins — the merged read is the contract for evolved dirs
    assert(Sinks.readParquetMerged(spark, dir).filter(col("v2").isNotNull).count() == 1)
  }

  test("audited csv read keeps good rows and captures malformed lines; observe() meters the same pass") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("sink-csv-audit")
    Files.writeString(dir.resolve("feed.csv"),
      "doc_id,n_chars\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    val audited = Sinks.readCsvAudited(spark, dir.toString, schema)
    val (observedDf, obs) = graft.ops.Profile.observed(audited, "ingest_audit", Seq(
      "rows" -> count(lit(1)),
      "bad" -> count(col("_corrupt_record")),
      "chars" -> sum("n_chars")))
    val all = observedDf.collect()
    assert(all.length == 3, "PERMISSIVE must keep every line as a row")
    // the metrics rode along on the SAME action — no second scan
    val m = obs.get
    assert(m("rows") == 3L && m("bad") == 1L && m("chars") == 40L, s"metrics: $m")
    val bad = Sinks.badRecords(audited).collect().map(_.getString(0))
    assert(bad.toSeq == Seq("2,notanumber"), s"bad lines: ${bad.mkString("|")}")
    val good = audited.filter(col("_corrupt_record").isNull).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(good == Set((1L, 10L), (3L, 30L)))
  }

  test("audited jsonl read keeps good rows and captures malformed lines") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("sink-jsonl-audit")
    Files.writeString(dir.resolve("feed.jsonl"),
      """{"doc_id":1,"text":"alpha"}
        |{"doc_id":2,"text":   <-- truncated line
        |{"doc_id":3,"text":"gamma"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val audited = Sinks.readJsonAudited(spark, dir.toString, schema)
    assert(audited.count() == 3, "PERMISSIVE must keep every line as a row")
    val bad = Sinks.badRecords(audited).collect().map(_.getString(0))
    assert(bad.length == 1 && bad(0).contains("truncated"),
      s"bad lines: ${bad.mkString("|")}")
    val good = audited.filter(col("_corrupt_record").isNull).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "alpha"), (3L, "gamma")))
  }

  test("schema inference recovers types and content for csv and json") {
    val src = Tables.load(spark, sf001, "nation") // int keys + strings
    val csvDir = Files.createTempDirectory("sink-csv-inf").toString
    Sinks.csv(src, csvDir)
    val backCsv = Sinks.readCsvInferred(spark, csvDir)
      .select(src.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    assert(backCsv.schema.fields.map(_.dataType.typeName).toSeq
      == src.schema.fields.map(_.dataType.typeName).toSeq,
      s"inferred ${backCsv.schema} != ${src.schema}")
    assert(hashSorted(backCsv) == hashSorted(src))
    val jsonDir = Files.createTempDirectory("sink-json-inf").toString
    Sinks.json(src, jsonDir)
    val backJson = Sinks.readJsonInferred(spark, jsonDir)
      .select(src.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    // JSON infers integers as long — values must still round-trip
    assert(hashSorted(backJson) == hashSorted(src))
  }
}
