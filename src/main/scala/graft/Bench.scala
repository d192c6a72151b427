package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every contract query against
  * SPARK_GRAFT_SF_DIR, best-of-3 warm wall time per query with results
  * fully collected (the BASELINE.md protocol), and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Stable iteration order: contract IDs first, then extras.
    val ordered =
      Contract.all.map(_.id).filter(SparkEntry.queries.contains) ++
        SparkEntry.queries.keys.filterNot(Contract.byId.contains).toSeq.sorted
    val qmap = SparkEntry.queries
    val results = ordered.map { name =>
      val fn = qmap(name)
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).collect(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }.min
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // headline value = the 55 BASELINE.md contract queries (comparable
    // to the recorded baseline); the X* extras are timed separately.
    val (contract, extras) = results.partition { case (k, _) => Contract.byId.contains(k) }
    val total = contract.map(_._2).filter(_ >= 0).sum
    val extrasTotal = extras.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","extras_sec":$extrasTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
