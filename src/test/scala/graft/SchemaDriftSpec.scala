package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Regression guard for testdata encoding drift (round 6 post-mortem).
  *
  * The driver regenerated `/root/testdata` mid-round-6 and `events.ts`
  * changed from Parquet TIMESTAMP(NANOS) (surfaced as LongType under
  * `nanosAsLong`) to TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaced
  * as TIMESTAMP_NTZ) — and the loader, which hard-coded the first
  * encoding, took down 8 contract queries and 35 tests with one cryptic
  * analysis error. This spec writes the SAME logical events rows in
  * every encoding the loader claims to support and asserts that
  * `Tables.load` lands each of them on the pinned schema with identical
  * rendered instants — so the next environment swap fails ONE test with
  * a readable message instead of 35 without one.
  */
class SchemaDriftSpec extends SparkSpec {

  // Three instants with microsecond components (exercises sub-second paths).
  private val micros = Seq(
    1704067200000000L, // 2024-01-01T00:00:00Z
    1704070861234567L, // 2024-01-01T01:01:01.234567Z
    1735689599999999L) // 2024-12-31T23:59:59.999999Z

  private def writeEvents(ts: Seq[Row], tsType: DataType): String = {
    val dir = Files.createTempDirectory("graft-drift-").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = ts.zipWithIndex.map { case (r, i) =>
      Row(i.toLong, r.get(0), 100L + i, "click", i * 1.5, s"""{"k":$i}""")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def rendered(df: DataFrame): Seq[(Long, String)] =
    df.selectExpr("event_id", "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  test("events loader lands every supported ts encoding on the pinned schema with identical instants") {
    // Encoding A: raw int64 nanos-since-epoch (what TIMESTAMP(NANOS) files
    // surface as under nanosAsLong — a plain BIGINT column exercises the
    // identical LongType dispatch seam).
    val dirA = writeEvents(micros.map(m => Row(m * 1000L)), LongType)
    // Encoding B: TIMESTAMP_NTZ micros (the current testdata generation).
    val dirB = writeEvents(
      micros.map(m => Row(java.time.LocalDateTime.ofEpochSecond(
        m / 1000000L, ((m % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))),
      TimestampNTZType)
    // Encoding C: session-tz TIMESTAMP micros (pass-through route).
    val dirC = writeEvents(
      micros.map { m =>
        val t = new Timestamp(m / 1000L); t.setNanos(((m % 1000000L) * 1000L).toInt)
        Row(t)
      },
      TimestampType)

    val loaded = Seq("int64-nanos" -> dirA, "ntz-micros" -> dirB, "tz-micros" -> dirC)
      .map { case (enc, dir) => enc -> Tables.load(spark, dir, "events") }

    for ((enc, df) <- loaded) {
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: ts must land on TimestampType, got ${df.schema("ts").dataType}")
      assert(df.schema.fieldNames.toSeq ==
        Tables.schemas("events").fieldNames.toSeq, s"$enc: column drift")
    }
    val views = loaded.map { case (enc, df) => enc -> rendered(df) }
    val (refEnc, refRows) = views.head
    assert(refRows.map(_._2) == Seq(
      "2024-01-01 00:00:00.000000",
      "2024-01-01 01:01:01.234567",
      "2024-12-31 23:59:59.999999"), s"$refEnc: wrong rendered instants")
    for ((enc, rows) <- views.tail)
      assert(rows == refRows, s"$enc renders differently from $refEnc")
  }

  test("pinned NTZ columns tolerate the session-tz timestamp flavor (orders drift)") {
    val dir = Files.createTempDirectory("graft-drift-orders-").toString
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      // pinned as TimestampNTZType; deliver session-tz TIMESTAMP instead
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val ts = new Timestamp(1704067200000L) // 2024-01-01T00:00:00Z
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, 10L, "O", 100.5, ts, "1-URGENT"))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Tables.load(spark, dir, "orders")
    assert(df.schema("o_orderdate").dataType == TimestampNTZType,
      "drifted flavor must be cast back to the pinned NTZ type")
    val rendered = df.selectExpr("date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')")
      .first().getString(0)
    assert(rendered == "2024-01-01 00:00:00",
      s"UTC session must keep the instant identical, got $rendered")
  }

  test("events loader rejects an unsupported ts encoding with a readable message") {
    val dir = writeEvents(micros.map(m => Row((m / 1000000L).toString)), StringType)
    val e = intercept[IllegalStateException](Tables.load(spark, dir, "events"))
    assert(e.getMessage.contains("events.ts"))
  }
}
