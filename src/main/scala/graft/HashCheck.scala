package graft

import graft.core.{Canonical, Engine}
import graft.sources.Tables

/** Ad-hoc correctness gate: run contract queries at a scale factor and
  * compare canonical hashes (SURVEY.md §2.2) to the certified hash01
  * values (§2.4). Usage:
  *   runMain graft.HashCheck [sfDir] [id id ...]
  * Exit code = number of mismatches.
  */
object HashCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ids = if (args.length > 1) args.drop(1).toSeq else Contract.all.map(_.id)
    val spark = Engine.session(shufflePartitions = 8, appName = "graft-hashcheck")
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    var bad = 0
    ids.foreach { id =>
      val c = Contract.byId(id)
      val t0 = System.nanoTime()
      val res =
        try {
          val h = Canonical.hash16(spark.sql(c.sparkSql))
          val want = Contract.hash01(id)
          if (h == want) s"OK    $h"
          else { bad += 1; s"FAIL  got $h want $want" }
        } catch {
          case e: Throwable => bad += 1; s"ERROR ${e.getMessage.take(120)}"
        }
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$id%-4s $res  (${ms}%.0f ms)")
    }
    println(s"\n${ids.size - bad}/${ids.size} matched")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
