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
    // Stable iteration order: contract IDs first, then extras. An optional
    // comma-separated SPARK_GRAFT_ONLY narrows the run for solo re-benching
    // a suspect block with nothing else sharing the machine.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered =
      (Contract.all.map(_.id).filter(SparkEntry.queries.contains) ++
        SparkEntry.queries.keys.filterNot(Contract.byId.contains).toSeq.sorted)
        .filter(n => only.forall(_.contains(n)))
    val qmap = SparkEntry.queries
    // best-of-3 over SUCCESSFUL runs only; a failed query is reported
    // explicitly (None → "failed" list + nonzero count), never silently
    // dropped from the headline total
    def bestOf(s: SparkSession, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        runs: Int): Option[Double] = {
      val ok = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(s, sfDir).collect(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] run failed: ${String.valueOf(e.getMessage).take(120)}")
          None
        }
      }
      ok.minOption
    }
    val results = ordered.map(name => name -> bestOf(spark, qmap(name), runs = 3))
    val failed = results.collect { case (k, None) => k }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    // headline value = the 55 BASELINE.md contract queries (comparable
    // to the recorded baseline); the X* extras are timed separately.
    val (contract, extras) = results.partition { case (k, _) => Contract.byId.contains(k) }
    val total = contract.flatMap(_._2).sum
    val extrasTotal = extras.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // BASELINE.md was measured at local[4]; when this run uses a
    // different core count, also time the contract suite at local[4] so
    // round-over-round ratios never mix configurations
    val local4 =
      if (cpus == "4") { spark.stop(); total }
      else {
        spark.stop()
        val s4 = SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        s4.sparkContext.setLogLevel("WARN")
        val t = Contract.all.map(_.id).filter(qmap.contains)
          .filter(n => only.forall(_.contains(n)))
          .flatMap(name => bestOf(s4, qmap(name), runs = 2)).sum
        s4.stop()
        t
      }
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","cpus":"$cpus","local4_contract_sec":$local4,"failed_queries":$failedJson,"n_failed":${failed.size},"extras_sec":$extrasTotal,"queries":$qs,"sf":"$sfDir"}"""
    // The driver tail-captures ~1.5 KB of stdout; the full line with every
    // extra's timing outgrew that window in round 6 and the headline (which
    // leads the line) was truncated away. So: persist the full record to a
    // file, then print a compact headline-only line LAST — contract queries
    // only, millisecond precision — guaranteed to fit the tail window.
    // Path is overridable / cwd-relative so a checkout elsewhere still
    // lands the durable copy next to the build (ADVICE r7).
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      new java.io.File(sys.props("user.dir"), "BENCH_FULL.json").getPath)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(fullPath),
      (fullJson + "\n").getBytes("UTF-8"))
    println(fullJson)
    def r3(d: Double): String = f"$d%.3f"
    val qsShort = contract.map { case (k, v) =>
      "\"" + k + "\":" + v.map(r3).getOrElse("-1.0")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","cpus":"$cpus","local4_contract_sec":${r3(local4)},"n_failed":${failed.size},"extras_sec":${r3(extrasTotal)},"queries":$qsShort,"sf":"$sfDir","full":"BENCH_FULL.json"}""")
  }
}
