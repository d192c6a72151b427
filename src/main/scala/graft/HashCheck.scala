package graft

import graft.core.{Canonical, Engine}
import graft.ops.{Catalog, DfContract}
import graft.sources.Tables

/** Ad-hoc correctness gate: run contract queries at a scale factor and
  * compare canonical hashes (SURVEY.md §2.2) to the certified hash01
  * values (§2.4). Usage:
  *   runMain graft.HashCheck [sfDir] [--df|--sql] [id id ...]
  * --sql runs the Appendix-A Spark SQL (E1); --df runs the typed
  * DataFrame implementations (E2); default runs both and cross-checks.
  * Exit code = number of mismatches.
  */
object HashCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1).toSeq
    val mode = rest.find(a => a == "--df" || a == "--sql").getOrElse("--both")
    // --partitions=N: re-prove partition invariance of the whole
    // inventory under a different shuffle width (certified in SURVEY
    // §0.2; this makes the evidence reproducible on demand)
    val partitions = rest.find(_.startsWith("--partitions="))
      .map(_.substring("--partitions=".length).toInt).getOrElse(8)
    val ids0 = rest.filterNot(_.startsWith("--"))
    val ids = if (ids0.nonEmpty) ids0 else Contract.all.map(_.id)
    // certified hashes exist ONLY for sf0.01 (hash01) and sf0.1 (hash1);
    // refuse any other directory rather than compare against the wrong set
    val expected = sfDir.replaceAll("/+$", "") match {
      case d if d.endsWith("sf0.1") => Contract.hash1
      case d if d.endsWith("sf0.01") => Contract.hash01
      case d =>
        System.err.println(
          s"no certified hashes for '$d' (only sf0.01 and sf0.1 are certified, SURVEY.md §2.4)")
        sys.exit(2)
    }
    val spark = Engine.session(shufflePartitions = partitions, appName = "graft-hashcheck")
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    val cat = Catalog(spark, sfDir)
    var bad = 0
    def check(id: String, label: String, want: String, run: () => String): Unit = {
      val t0 = System.nanoTime()
      val res =
        try {
          val h = run()
          if (h == want) s"OK    $h"
          else { bad += 1; s"FAIL  got $h want $want" }
        } catch {
          case e: Throwable => bad += 1; s"ERROR ${String.valueOf(e.getMessage).take(160)}"
        }
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$id%-4s $label%-4s $res  (${ms}%.0f ms)")
    }
    // a requested id found in neither the contract map nor the
    // self-pinned set is a typo or a removed query — fail loud rather
    // than silently reporting "all matched" over the remainder
    ids.filterNot(id =>
        Contract.byId.contains(id) || SelfPinned.ids.contains(id))
      .foreach { id => println(f"$id%-4s ???  FAIL unknown id"); bad += 1 }
    ids.filter(Contract.byId.contains).foreach { id =>
      if (mode != "--df")
        check(id, "sql", expected(id),
          () => Canonical.hash16(spark.sql(Contract.byId(id).sparkSql)))
      if (mode != "--sql")
        DfContract.all.get(id) match {
          case Some(fn) => check(id, "df", expected(id), () => Canonical.hash16(fn(cat)))
          case None => println(f"$id%-4s df   MISSING"); bad += 1
        }
    }
    // the three no-oracle queries carry engine-pinned regression hashes
    // (SelfPinned): checked as part of the standard gate, labeled
    // `self`, so sketch/trainer drift announces itself like any
    // contract hash mismatch
    val selfIds =
      if (ids0.nonEmpty) ids0.filter(SelfPinned.ids.contains) else SelfPinned.ids
    SelfPinned.forDir(sfDir).foreach { pins =>
      selfIds.foreach { id =>
        check(id, "self", pins(id),
          () => Canonical.hash16(SparkEntry.queries(id)(spark, sfDir)))
      }
    }
    println(s"\n${if (bad == 0) "all matched" else s"$bad mismatches"}")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
