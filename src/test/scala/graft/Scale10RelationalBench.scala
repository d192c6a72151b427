package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Catalog, DfContract}
import graft.sources.Tables

/** 10× relational-spine probe (VERDICT r7 item 5): the text/vector
  * paths have 10× scaling evidence; this gives the relational contract
  * spine the same. A 10×-duplicated sf0.1 fixture is written as a real
  * parquet catalog — fact tables (lineitem, orders, events, part) grow
  * 10× with join keys shifted PER REPLICA so replica r's lineitem joins
  * replica r's orders (cardinality grows linearly, like a real 10×
  * corpus), while dimension tables stay 1× (dims don't grow with fact
  * volume — that's what makes the broadcast star the right 100 TB
  * plan). o_custkey / user_id are NOT shifted: 10× more orders per
  * customer and 10× more events per user is the realistic skew
  * direction, and exactly what AQE + the as-of merge must absorb.
  *
  * Evidence wanted per query: wall scales ~linearly with the fact
  * growth, and the plan SHAPE is unchanged — broadcast star intact for
  * J02, equi-bucketed theta for J08 (pair mass legitimately 100× within
  * unshifted brand groups — reported, and absorbed by AQE skew
  * handling, not a reducer melt), partial-agg-below-exchange for A01,
  * native merge as-of for J10.
  *
  * Run: sbt "Test/runMain graft.Scale10RelationalBench"
  */
object Scale10RelationalBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime
    val r = f
    (r, (System.nanoTime - t0) / 1e9)
  }

  private def bestOf2(f: => Long): (Long, Double) = {
    val (r1, t1) = timed(f)
    val (_, t2) = timed(f)
    (r1, math.min(t1, t2))
  }

  private val KeyOff = 100000000L

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.session(
      master = "local[32]", shufflePartitions = 32, appName = "scale10rel")
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = new java.io.File(sys.props("java.io.tmpdir"), "graft_rel10").toString

    def dup10(df: DataFrame, shiftCols: Seq[String]): DataFrame =
      (0 until 10).map { r =>
        shiftCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(r * KeyOff)))
      }.reduce(_ unionByName _)

    // regenerate unless EVERY written table committed (_SUCCESS per
    // table) AND the fixture scheme marker matches — a crash after the
    // first write, or a fixture left by an older dup scheme, must not
    // be silently reused (it would invalidate the exact-10× requires)
    val allTables = Seq("lineitem", "orders", "events", "part",
      "region", "nation", "customer", "supplier", "documents", "embeddings")
    val marker = new java.io.File(dst, "_GRAFT_FIXTURE")
    // freshness covers EVERY source table's mtime, not just lineitem's:
    // regenerating the sf source without touching lineitem must not
    // silently reuse a stale fixture (ADVICE r8)
    val scheme = s"rel10:v1:$KeyOff:" +
      allTables.map(t => new java.io.File(src, s"$t.parquet").lastModified).max
    val fresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == scheme &&
      allTables.forall(t => new java.io.File(s"$dst/$t.parquet", "_SUCCESS").exists())
    if (!fresh) {
      def write(name: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      if (marker.exists()) marker.delete()
      // facts 10× with per-replica key shifts; dims 1× verbatim
      write("lineitem", dup10(Tables.load(spark, src, "lineitem"), Seq("l_orderkey")))
      write("orders", dup10(Tables.load(spark, src, "orders"), Seq("o_orderkey")))
      write("events", dup10(Tables.load(spark, src, "events"), Seq("event_id")))
      write("part", dup10(Tables.load(spark, src, "part"), Seq("p_partkey")))
      Seq("region", "nation", "customer", "supplier", "documents", "embeddings")
        .foreach(t => write(t, Tables.load(spark, src, t)))
      java.nio.file.Files.write(marker.toPath, scheme.getBytes("UTF-8"))
    }

    val cat1 = Catalog(spark, src)
    val cat10 = Catalog(spark, dst)
    val ids = Seq("A01", "J02", "J08", "J09", "J10")

    // EVERY timed run rebuilds the DataFrame from scratch: re-collecting
    // one Dataset object would let Spark reuse its shuffle map outputs
    // ("skipped stages") and time only the result stage — the first cut
    // of this probe did exactly that and reported 6M-row aggs at 0.04 s
    def measure(id: String, cat: Catalog): (Long, Double, String) = {
      var plan = ""
      val (n, t) = bestOf2 {
        val df = DfContract.all(id)(cat)
        val r = df.collect().length.toLong
        plan = df.queryExecution.executedPlan.toString // post-AQE final plan
        r
      }
      (n, t, plan)
    }
    // interleave 1× and 10× per query so JVM/codegen warmup cancels out
    val rows = ids.map { id =>
      val (n1, t1, _) = measure(id, cat1)
      val (n10, t10, p10) = measure(id, cat10)
      println(f"SCALE10REL $id%-4s 1x: $t1%6.2f s ($n1%,d rows)   10x: $t10%6.2f s ($n10%,d rows)   ratio ${t10 / t1}%.1fx")
      (id, p10)
    }
    val planOf = rows.toMap

    // J02: the broadcast star must survive the 10× fact growth — both
    // dim joins stay broadcast, never flipping to a shuffled join
    val j02 = planOf("J02")
    require("BroadcastHashJoin".r.findAllIn(j02).size >= 2,
      s"J02 star must keep nation+region broadcast at 10x:\n$j02")
    // A01: partial aggregation still combines map-side — the adaptive
    // final plan shows BOTH the partial and final HashAggregate
    val a01 = planOf("A01")
    require("HashAggregate".r.findAllIn(a01).size >= 2,
      s"A01 must partial-aggregate map-side at 10x:\n$a01")
    // J08: still an equi hash/sort-merge join on brand (+ residual), not
    // a nested-loop — the 100× pair growth happens inside buckets
    val j08 = planOf("J08")
    require(!j08.contains("CartesianProduct") && !j08.contains("BroadcastNestedLoopJoin"),
      s"J08 must stay an equi-bucketed theta join at 10x:\n$j08")
    // J10: the native merge as-of exec serves the 10× events too
    val j10 = planOf("J10")
    require(j10.contains("AsOfJoin"),
      s"J10 must run the native as-of exec at 10x:\n$j10")

    // row-count sanity: per-replica key shifts make join cardinality
    // exactly linear — J09's group counts at 10× are 10× the 1× counts
    val j09n1 = DfContract.all("J09")(cat1).agg(sum("n")).first().getLong(0)
    val j09n10 = DfContract.all("J09")(cat10).agg(sum("n")).first().getLong(0)
    require(j09n10 == 10 * j09n1,
      s"J09 join cardinality must scale linearly: 1x=$j09n1 10x=$j09n10")

    spark.stop()
  }
}
