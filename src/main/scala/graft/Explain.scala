package graft

import graft.core.Engine
import graft.ops.{Catalog, DfContract}

/** Plan inspection tool: prints the formatted physical plan of contract
  * queries (DataFrame forms). Usage:
  *   runMain graft.Explain [sfDir] id [id ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ids = if (args.length > 1) args.drop(1).toSeq else Seq("J02", "P01", "A01", "L07")
    val spark = Engine.session(shufflePartitions = 8, appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val cat = Catalog(spark, sfDir)
    ids.foreach { id =>
      println(s"\n========== $id ==========")
      DfContract.all.get(id) match {
        case Some(fn) => fn(cat).explain("formatted")
        case None =>
          Extras.queries.get(id) match {
            case Some(fn) => fn(spark, sfDir).explain("formatted")
            case None => println(s"unknown id: $id (contract ids + ${Extras.queries.keys.toSeq.sorted.mkString(", ")})")
          }
      }
    }
    spark.stop()
  }
}
