package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch component timing for the v2 curation decon chain (test
  * scope, not part of the declared surface).
  * Usage: Test/runMain graft.tools.ProfileDecon <sfDir>
  */
object ProfileDecon {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Engine.configure(spark)
    val c = graft.ops.Catalog(spark, sfDir)
    def timeIt[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DECON $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val corpus = c.documents.filter(col("source") =!= "src0")
    val bench = c.documents.filter(col("source") === "src0")
    (1 to 2).foreach { i =>
      timeIt(s"cleanCorpus w10 run$i") {
        noop(graft.text.SubstringDedup.cleanCorpus(corpus, 10))
      }
    }
    val cleaned = graft.text.SubstringDedup.cleanCorpus(corpus, 10)
      .localCheckpoint(true)
    val corpusClean = graft.text.SubstringDedup.withCleanText(corpus, cleaned)
      .localCheckpoint(true)
    (1 to 2).foreach { i =>
      timeIt(s"ngram contaminationScores run$i") {
        noop(graft.text.TextAnalysis.contaminationScores(corpusClean, bench, 5))
      }
    }
    val banded = spark.read.parquet(
      java.nio.file.Files.list(java.nio.file.Paths.get(
        sys.props("java.io.tmpdir")))
        .filter(p => p.getFileName.toString.startsWith("graft_minhash_banded_v2_"))
        .findFirst().get().toString)
    (1 to 2).foreach { i =>
      timeIt(s"crossNearDupsFromBanded run$i") {
        noop(graft.text.MinHashDedup.crossNearDupsFromBanded(
          corpusClean, bench, banded,
          graft.text.MinHashConfig(threshold = 0.5)))
      }
    }
    val cemb = c.embeddings.join(
      corpusClean.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val bemb = c.embeddings.join(
      bench.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    (1 to 2).foreach { i =>
      timeIt(s"semantic assignWithScore run$i") {
        noop(graft.vector.SemDedup.assignWithScore(cemb, bemb))
      }
    }
    (1 to 2).foreach { i =>
      timeIt(s"verifiedPairsFromBanded run$i") {
        noop(graft.text.MinHashDedup.verifiedPairsFromBanded(
          corpusClean, banded, graft.text.MinHashConfig()))
      }
    }
    (1 to 2).foreach { i =>
      timeIt(s"perplexityBuckets run$i") {
        noop(graft.text.TextAnalysis.perplexityBuckets(corpusClean, 3))
      }
    }
    spark.stop()
  }
}
