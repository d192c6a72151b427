package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Engine

/** Shared session for all specs (one JVM-wide session; Spark startup is
  * ~5 s, so every suite reuses it via getOrCreate).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    Engine.session(master = "local[8]", shufflePartitions = 8, appName = "graft-test")

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
  val sf1 = "/root/testdata/sf0.1"

  /** Deterministic Thai-consonant-block string (seeded) — the shared
    * mixed-script fixture generator: any ≥16-cp result is one
    * spaceless run under [[graft.text.TextAnalysis.RunPattern]].
    * ONE definition for every spec, so the fixture alphabet can never
    * drift between suites.
    */
  protected def thai(seed: Int, n: Int): String = {
    val rng = new scala.util.Random(seed)
    (1 to n).map(_ => (0x0e01 + rng.nextInt(40)).toChar).mkString
  }

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.setLogLevel("WARN")
  }
}
