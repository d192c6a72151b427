package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.core.Canonical
import graft.ops.{Catalog, DfContract}
import graft.sources.Tables

/** Spill-path evidence (VERDICT r10 item 7, SURVEY §4.2 "config not
  * code"): run the 55-query contract plus the five heaviest extras at
  * sf0.1 under a deliberately starved memory configuration that FORCES
  * the external sort/aggregate/window operators to spill, and pin
  *
  *  (a) every hash stays green — the contract against the certified
  *      sf0.1 hashes, the extras against a normal-memory run in the
  *      same JVM — so correctness is independent of the
  *      in-memory-vs-spilled execution path, and
  *  (b) the spill actually HAPPENED: summed task metrics
  *      (memoryBytesSpilled / diskBytesSpilled) must be positive.
  *
  * This is the single-JVM stand-in for the 100 TB claim that matters:
  * an executor that cannot hold a partition's sort/agg state in memory
  * degrades to disk, not to wrong answers or OOM. The starvation is
  * pure configuration — a low `spark.memory.fraction` plus the
  * force-spill row thresholds of the external sorter, window, and
  * sort-merge-join buffers; no engine code changes.
  *
  * Run: sbt "Test/runMain graft.SpillBench"   (exit 1 on any failure)
  */
object SpillBench {

  private def session(starved: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.datetime.java8API.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName(if (starved) "graft-spill" else "graft-spill-baseline")
    if (starved)
      b.config("spark.memory.fraction", "0.1")
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
        .config("spark.sql.windowExec.buffer.spill.threshold", "5000")
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "5000")
    b.getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val extras = Seq("X38_minhash_from_banded", "X93_curation_manifest",
      "X92_source_lm_matrix", "X96_max_overlap_span", "X72_scrub_benchmark")
    var bad = 0

    // phase 1 — starved session: contract + extras, spill metrics on
    val spark = session(starved = true)
    spark.sparkContext.setLogLevel("WARN")
    @volatile var mem = 0L
    @volatile var disk = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) synchronized {
          mem += m.memoryBytesSpilled; disk += m.diskBytesSpilled
        }
      }
    })
    Tables.registerAll(spark, sfDir)
    val cat = Catalog(spark, sfDir)
    Contract.all.map(_.id).foreach { id =>
      val h = Canonical.hash16(DfContract.all(id)(cat))
      val want = Contract.hash1(id)
      if (h != want) { bad += 1; println(s"SPILL $id FAIL got $h want $want") }
      else println(s"SPILL $id OK $h")
    }
    val starvedExtras = extras.map { name =>
      name -> Canonical.hash16(SparkEntry.queries(name)(spark, sfDir))
    }.toMap
    Thread.sleep(3000) // let the listener bus drain
    val (memS, diskS) = (mem, disk)
    spark.stop()

    // phase 2 — normal session: extras baseline hashes
    val base = session(starved = false)
    base.sparkContext.setLogLevel("WARN")
    extras.foreach { name =>
      val h = Canonical.hash16(SparkEntry.queries(name)(base, sfDir))
      if (h != starvedExtras(name)) {
        bad += 1
        println(s"SPILL $name FAIL starved ${starvedExtras(name)} vs normal $h")
      } else println(s"SPILL $name OK $h (starved == normal)")
    }
    base.stop()

    println(f"SPILL metrics: memoryBytesSpilled=$memS%,d diskBytesSpilled=$diskS%,d")
    if (memS + diskS <= 0) { bad += 1; println("SPILL FAIL: no spill observed") }
    println(if (bad == 0) "SPILL all green (hashes stable under forced spilling)"
      else s"SPILL $bad failures")
    if (bad > 0) sys.exit(1)
  }
}
