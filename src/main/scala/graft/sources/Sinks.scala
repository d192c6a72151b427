package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output writers — the MapReduce "output writer" surface (SURVEY
  * §2.1) over Spark's file sinks. All sinks write one directory per
  * dataset, partitioned by the DataFrame's partitioning; at scale the
  * caller chooses `partitionBy` columns and target file sizing via
  * partition count, not here.
  */
object Sinks {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** CSV with header and explicit timestamp format (round-trip safe for
    * the µs-precision timestamps this engine produces).
    */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  /** Single-string-column text sink (one line per row). */
  def text(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** ORC — the second self-describing columnar format Spark ships
    * natively; same pushdown/pruning properties as parquet, relevant
    * when the surrounding lake is Hive-flavored.
    */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Size-targeted parquet writer — the small-files defense for a
    * 100 TB lake: a shuffle-heavy plan ending in 10⁴–10⁵ tasks would
    * otherwise write that many files, and every later scan pays
    * per-file open/footer/scheduling cost. The file count derives from
    * Catalyst's own size estimate for the plan (for file sources, the
    * sum of input file sizes) over `targetFileBytes` — an ESTIMATE of
    * the in-memory size, so on-disk parquet files come out smaller by
    * roughly the encoder's compression ratio; pick the target
    * accordingly (the default 128 MB estimate ≈ 30–60 MB files, a sane
    * scan granule).
    *
    * With `partitionBy`, rows are instead repartitioned BY the
    * partition columns so each output directory is written by exactly
    * one task — one file per partition value instead of
    * (tasks × values) fragments, the classic dynamic-partition
    * compaction shape.
    */
  def parquetCompacted(
      df: DataFrame,
      path: String,
      targetFileBytes: Long = 128L << 20,
      partitionBy: Seq[String] = Nil): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    if (partitionBy.isEmpty) {
      val est0 = df.queryExecution.optimizedPlan.stats.sizeInBytes
      // Catalyst's size estimate for a JOIN is the product of its
      // children's — astronomically wrong, and it would peg the file
      // count at the cap (a million near-empty files). Treat any
      // petabyte-plus estimate as corrupt and fall back to exact
      // rows x schema default row size (one count job).
      val est =
        if (est0 < BigInt(1L << 50)) est0
        else BigInt(df.count()) * df.schema.defaultSize
      val nFiles = ((est + targetFileBytes - 1) / targetFileBytes)
        .max(BigInt(1)).min(BigInt(1 << 20)).toInt
      df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(path)
    } else {
      import org.apache.spark.sql.functions.col
      df.repartition(partitionBy.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partitionBy: _*)
        .parquet(path)
    }
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-evolution read: merge the footers of every file generation
    * under `path` (columns added over time surface as nullable; rows
    * from older files carry nulls there). Costs a footer pass per file —
    * the default read trusts one footer — so this is the ingest-time
    * reader for directories written across schema versions, not the
    * steady-state hot path.
    */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readCsv(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema)
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema)
      .json(path)

  /** Audited CSV read: PERMISSIVE parsing with the raw text of every
    * malformed line captured in `_corrupt_record` — the ingest-time
    * posture for untrusted feeds at scale (FAILFAST kills a 100 TB job
    * on one bad line; silent DROPMALFORMED loses data unaccountably;
    * this keeps the good rows AND a queryable audit of the bad ones).
    * Pair with [[badRecords]] to route rejects to a quarantine sink.
    */
  def readCsvAudited(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .csv(path)

  /** Audited JSONL read — [[readCsvAudited]]'s posture for the
    * line-delimited JSON interchange format training corpora actually
    * arrive in: PERMISSIVE parsing, malformed lines preserved verbatim
    * in `_corrupt_record`, good rows kept. Pair with [[badRecords]].
    */
  def readJsonAudited(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .json(path)

  /** The malformed rows of an audited read (raw line text only).
    * Spark disallows queries that reference ONLY the internal corrupt
    * column against the raw source scan, so the batch is materialized
    * first — fine for an audit query; a production ingest routes
    * rejects in the SAME pass that consumes the good rows (split
    * inside foreachBatch) and never pays this.
    */
  def badRecords(audited: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    audited.localCheckpoint(true)
      .filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record")
  }

  /** Schema-INFERRED readers (SURVEY §1.3: inference is only needed for
    * CSV/JSON sources). Inference costs an extra pass over the data —
    * prefer the pinned-schema readers for production reads; these exist
    * for ad-hoc ingest of files without a known schema.
    */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def readJsonInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)
}
