package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling driver (test scope, not part of the declared
  * surface): runs named declared queries with the Spark event log on so
  * per-job/stage wall time can be attributed offline.
  *
  * Usage: Test/runMain graft.tools.ProfileQuery <sfDir> <eventLogDir> <q1,q2,...> [runs]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val logDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 3) args(3).toInt else 2
    new java.io.File(logDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", logDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qmap = graft.SparkEntry.queries
    names.foreach { n =>
      (1 to runs).foreach { i =>
        spark.sparkContext.setJobDescription(s"$n#run$i")
        val t0 = System.nanoTime()
        qmap(n)(spark, sfDir).collect()
        println(f"PROFILE $n run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
