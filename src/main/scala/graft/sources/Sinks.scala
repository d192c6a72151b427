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

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

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
