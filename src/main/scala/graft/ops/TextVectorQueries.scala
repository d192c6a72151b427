package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** DataFrame (E2) forms of the LLM-pipeline contract queries: exact
  * dedup, tokenize/word-count, document frequency, corpus stats, and
  * the vector-similarity trio (kNN, all-pairs, per-label aggregates).
  *
  * The dot products use the native codegen'd [[graft.functions.DotProduct]]
  * expression — semantically identical to the certified
  * aggregate(zip_with(...)) fold but a primitive loop at runtime.
  * Scale paths (MinHash LSH, blocked ANN) live in graft.text / graft.vector.
  */
object TextVectorQueries {

  val queries: Map[String, Catalog => DataFrame] = Map(
    "L01" -> { c =>
      c.documents.agg(
        count(lit(1)).as("total"),
        countDistinct(col("text")).as("uniq"))
    },
    // L02 — dedup winners: keep MIN(doc_id) per duplicated text. At
    // 100 TB group on a 128-bit text hash instead (see graft.text).
    "L02" -> { c =>
      c.documents.groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select("keep_id", "n")
        .orderBy("keep_id")
    },
    // L03/L04 — generator surface: explode(split) then two-phase agg.
    "L03" -> { c =>
      c.documents
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w"))
        .limit(20)
    },
    "L04" -> { c =>
      c.documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("w"))
        .limit(20)
    },
    "L05" -> { c =>
      c.documents.groupBy("lang")
        .agg(
          count(lit(1)).as("n"),
          min("n_chars").as("mn"), max("n_chars").as("mx"),
          sum("n_chars").cast("bigint").as("total_chars"))
        .orderBy("lang")
    },
    // L06 — kNN: probe vector broadcast against the scan; top-k via
    // TakeOrderedAndProject. The IVF/LSH-bucketed variant for large k/N
    // lives in graft.vector.
    "L06" -> { c =>
      val probe = broadcast(
        c.embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe_emb")))
      c.embeddings.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"), round(dot(col("probe_emb"), col("embedding")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(5)
    },
    // L07 — all-pairs ≥ threshold within label: label equi-key keeps the
    // join bucketed (not cartesian); dot computed once, filtered, then
    // rounded. LSH candidate generation replaces this at 100 TB.
    "L07" -> { c =>
      val a = c.embeddings.select(
        col("vec_id").as("i"), col("label"), col("embedding").as("ea"))
      val b = c.embeddings.select(
        col("vec_id").as("j"), col("label"), col("embedding").as("eb"))
      a.join(b, Seq("label"))
        .filter(col("i") < col("j"))
        .withColumn("dp", dot(col("ea"), col("eb")))
        .filter(col("dp") > 0.35)
        .select(col("i"), col("j"), round(col("dp"), 6).as("cos"))
        .orderBy("i", "j")
    },
    "L08" -> { c =>
      c.embeddings.groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          round(avg(element_at(col("embedding"), 1)), 6).as("avg_e0"))
        .orderBy("label")
    }
  )
}
