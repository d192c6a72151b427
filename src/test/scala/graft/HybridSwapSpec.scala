package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{HybridRetrieval, TextAnalysis}
import graft.vector.Ivf

/** The hybrid-retrieval PRODUCTION SWAP pins (round-12 brief item 3):
  * X101's declared query uses the exact channels (Bm25.knnJoin +
  * Ann.knnJoin); the documented scale forms serve the semantic channel
  * from the LSH buckets (rrfTopKAnn) or a persisted IVF index
  * (rrfTopKIvf). This spec proves the swap is SAFE: at full probe
  * (probeRadius = nPlanes / nProbe = nLists over an index of the same
  * embeddings) each indexed form is row-identical to the exact fusion —
  * the ivfKnnJoin ≡ knnJoin idiom lifted end-to-end through the fusion —
  * and at partial probe the contract shape (k rows per query, self
  * excluded) still holds.
  */
class HybridSwapSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getLong(4))).toSeq

  test("indexed hybrid forms at full probe are row-identical to the exact fusion") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        slice(TextAnalysis.tokens(col("text")), 1, 5).as("terms"))
      .join(emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qvec")), Seq("query_id"))

    val exact = rows(HybridRetrieval.rrfTopK(docs, emb, queries, k = 10))
    assert(exact.nonEmpty)

    // LSH semantic channel, every bucket probed
    val ann = rows(HybridRetrieval.rrfTopKAnn(docs, emb, queries, k = 10,
      nPlanes = 8, probeRadius = 8))
    assert(ann == exact, s"ANN swap diverged at full probe:\n$ann\nvs\n$exact")

    // persisted IVF semantic channel, every list probed
    val idx = Files.createTempDirectory("graft_hyb_ivf").toString
    Ivf.writeIndex(emb, idx, nLists = 8)
    val ivf = rows(HybridRetrieval.rrfTopKIvf(docs, idx, queries, k = 10,
      nProbe = 8))
    assert(ivf == exact, s"IVF swap diverged at full probe:\n$ivf\nvs\n$exact")

    // partial probe keeps the contract shape: k rows per query, never
    // the query's own doc (recall, not shape, is what probe trades)
    val part = rows(HybridRetrieval.rrfTopKIvf(docs, idx, queries, k = 10,
      nProbe = 2))
    val perQ = part.groupBy(_._1).values.map(_.size).toSet
    assert(perQ == Set(10), s"partial probe row counts per query: $perQ")
    assert(part.forall { case (q, d, _, _, _) => q != d })
  }
}
