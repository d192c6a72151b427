package graft

import org.apache.spark.sql.SparkSession

// scratch driver for round-6 X28 verification (removed before commit if noisy)
object X28Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val t0 = System.nanoTime
      val banded = graft.vector.Quantize.bandedQuantizedPairsAbove(emb, 0.4, nPlanes = 4, nBands = 80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val t1 = System.nanoTime
      val exact = graft.vector.Ann.allPairsAbove(emb, 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val t2 = System.nanoTime
      println(f"RESULT $sf: banded=${banded.size} exact=${exact.size} equal=${banded == exact} " +
        f"missing=${(exact -- banded).size} tBanded=${(t1 - t0) / 1e9}%.2fs tExact=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
