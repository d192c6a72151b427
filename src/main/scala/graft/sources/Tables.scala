package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Table registry over the driver-generated parquet star schema
  * (TESTDATA.md / FIXTURES.md). Schemas are pinned and asserted on load:
  * schema drift fails fast instead of silently corrupting a hash check.
  *
  * `events` needs the H1 recipe (SURVEY.md §0.4): the stored `ts` encoding
  * has drifted across testdata generations — Parquet TIMESTAMP(NANOS)
  * (read as Long under `nanosAsLong`), then TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). The loader dispatches
  * on the type Spark actually reports and converts to the pinned
  * session-timestamp type; the session runs in UTC, so every route
  * renders the same instants and agrees with DuckDB exactly.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Pinned logical schemas (post events-conversion). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      // Parquet TIMESTAMP(MILLIS, isAdjustedToUTC=false) → NTZ in Spark 4;
      // midnight-valued (date-like), renders identically under UTC session.
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  // DataFrame plans are immutable — cache per (session, dir, table) so
  // repeated loads don't re-read parquet footers (50–100 ms each).
  private val dfCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  /** Load one table from `dir` (a `/root/testdata/sfX`-style directory),
    * applying the events ns→µs conversion, and assert the pinned schema.
    * Memoized per (session, dir, table).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    val perSession = {
      var m = dfCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        dfCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, name), loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events") {
        // Dispatch on what Spark reports for `ts` — testdata encodings have
        // drifted between generations, and each route must land on the same
        // pinned TimestampType rendering the same UTC instants.
        val tsExpr = raw.schema("ts").dataType match {
          case LongType         => "timestamp_micros(ts DIV 1000) AS ts" // nanos-as-long
          case TimestampNTZType => "CAST(ts AS TIMESTAMP) AS ts"         // NTZ micros, UTC session
          case TimestampType    => "ts"                                  // already session-tz
          case other => throw new IllegalStateException(
            s"events.ts arrived as unsupported type $other")
        }
        raw.selectExpr(
          "event_id", tsExpr, "user_id", "event_type", "value", "props")
      } else raw
    // Generalized timestamp-flavor normalization (the events lesson,
    // applied to every table): a regenerated file can flip a pinned
    // TIMESTAMP_NTZ column (orders.o_orderdate, lineitem.l_shipdate) to
    // session-tz TIMESTAMP or back. Under the UTC session the rendered
    // instants are identical either way, so cast to the pinned flavor
    // instead of failing; any OTHER mismatch still fails loudly below.
    val pinned = schemas(name)
    val tsFlavors: Set[DataType] = Set(TimestampType, TimestampNTZType)
    val normalized = df.select(df.schema.fields.map { f =>
      val want = pinned.fields.find(_.name == f.name).map(_.dataType)
      want match {
        case Some(w) if w != f.dataType &&
            tsFlavors(w) && tsFlavors(f.dataType) =>
          col(f.name).cast(w).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
    val got = normalize(normalized.schema)
    val want = normalize(pinned)
    require(got == want,
      s"schema drift for $name:\n  got  $got\n  want $want")
    normalized
  }

  /** Compare names + types only (nullability/metadata are load-path noise). */
  private def normalize(s: StructType): Seq[(String, DataType)] =
    s.fields.toSeq.map(f => (f.name, dropNullability(f.dataType)))

  private def dropNullability(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(dropNullability(et))
    case MapType(k, v, _) => MapType(dropNullability(k), dropNullability(v))
    case StructType(fs) =>
      StructType(fs.map(f => StructField(f.name, dropNullability(f.dataType))))
    case other => other
  }

  // Last directory registered per session: registration re-reads ten
  // parquet footers (+ schema asserts), so per-query callers must not
  // pay it repeatedly. Weak keys: sessions are few, but don't pin them.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all ten tables as temp views over `dir`. Idempotent and
    * memoized per session (re-registering only when `dir` changes); the
    * nanosAsLong conf is (re)applied defensively for externally created
    * sessions.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) != dir) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
  }
}
