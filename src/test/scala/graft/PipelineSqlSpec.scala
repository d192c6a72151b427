package graft

import graft.core.Canonical
import graft.sources.Tables

/** E1 twins for the pipeline extras: every deterministic pipeline
  * operator must also be EXPRESSIBLE as Spark-dialect SQL text over the
  * registered views, hash-equal to the DataFrame builder — the same
  * E1 ≡ E2 duality the 55-query contract pins (DfContractSpec), here
  * for the training-pipeline surface. The SQL forms are the SEMANTIC
  * twins, not the scale path: X47/X53's SQL plans a single-partition
  * window that the builders deliberately avoid via the bucketed
  * two-pass machinery — equality proves the builders compute the same
  * function, exactly like W04/W05.
  */
class PipelineSqlSpec extends SparkSpec {

  private val coin =
    "substring(md5(cast(concat_ws(':', cast(doc_id as string), '42') as binary)), 1, 8)"

  private val sqlTwins: Map[String, String] = Map(
    "X47_shuffle_order" -> s"""
SELECT doc_id, row_number() OVER (ORDER BY $coin, doc_id) AS shuffle_pos
FROM documents ORDER BY shuffle_pos
""",
    "X48_mixture_resample" -> s"""
WITH tgt AS (SELECT * FROM VALUES
    ('de', CAST(0.15 AS DOUBLE)), ('en', CAST(0.4 AS DOUBLE)), ('es', CAST(0.15 AS DOUBLE)),
    ('fr', CAST(0.15 AS DOUBLE)), ('zh', CAST(0.15 AS DOUBLE)) AS t(lang, t)),
counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
j AS (SELECT c.lang, c.n, tgt.t FROM counts c JOIN tgt USING (lang)),
tm AS (SELECT MIN(n / t) AS tmax FROM j),
fr AS (SELECT lang, CASE WHEN n / t = tmax THEN 'g'
         WHEN tmax * t / n >= 1.0 THEN 'g'
         ELSE format_string('%08x', CAST(least(floor(tmax * t / n * 4294967296), 4294967295) AS BIGINT)) END AS cut
       FROM j CROSS JOIN tm)
SELECT d.doc_id, d.lang FROM documents d JOIN fr USING (lang)
WHERE ${coin.replace("doc_id", "d.doc_id")} < fr.cut
ORDER BY d.doc_id
""",
    "X49_eval_sample" -> s"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang ORDER BY $coin, doc_id) AS rk
  FROM documents) t
WHERE rk <= 25 ORDER BY doc_id
""",
    "X50_chunking" -> """
WITH t AS (SELECT doc_id, filter(split(text, ' '), w -> w != '') AS words FROM documents),
s AS (SELECT doc_id, words, size(words) AS n,
             explode(sequence(0, greatest(size(words) - 1, 0), 48)) AS st FROM t)
SELECT doc_id, CAST(st / 48 AS BIGINT) AS chunk_idx,
  CAST(size(slice(words, st + 1, 64)) AS BIGINT) AS n_tokens,
  array_join(slice(words, st + 1, 64), ' ') AS chunk
FROM s WHERE st = 0 OR st + 16 < n
ORDER BY doc_id, chunk_idx
""",
    "X53_vocab_coverage" -> """
WITH toks AS (SELECT explode(filter(split(text, ' '), w -> w != '')) AS w FROM documents),
c AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c),
r AS (SELECT w, cnt,
  row_number() OVER (ORDER BY cnt DESC, w) AS rk,
  SUM(cnt) OVER (ORDER BY cnt DESC, w
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM c)
SELECT CAST(rk AS BIGINT) AS rk, w, cnt, ROUND(run / tot, 6) AS coverage
FROM r CROSS JOIN t WHERE rk <= 500 ORDER BY rk
""",
    // X48's cut algebra with the n^0.5 temperature targets computed in
    // SQL (pow is java.lang.Math.pow in both engines)
    "X74_temperature_mixture" -> s"""
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
j AS (SELECT lang, n, pow(n, 0.5) AS t FROM counts),
tm AS (SELECT MIN(n / t) AS tmax FROM j),
fr AS (SELECT lang, CASE WHEN n / t = tmax THEN 'g'
         WHEN tmax * t / n >= 1.0 THEN 'g'
         ELSE format_string('%08x', CAST(least(floor(tmax * t / n * 4294967296), 4294967295) AS BIGINT)) END AS cut
       FROM j CROSS JOIN tm)
SELECT d.doc_id, d.lang FROM documents d JOIN fr USING (lang)
WHERE ${coin.replace("doc_id", "d.doc_id")} < fr.cut
ORDER BY d.doc_id
""",
    "X79_epoch_plan" -> """
WITH t AS (SELECT source, COUNT(*) AS n_docs,
    CAST(SUM(size(filter(split(text, ' '), w -> w != ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
  HAVING CAST(SUM(size(filter(split(text, ' '), w -> w != ''))) AS BIGINT) > 0),
z AS (SELECT SUM(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z FROM t)
SELECT source, n_docs, n_tokens,
  ROUND(pow(CAST(n_tokens AS DOUBLE), 0.5) / z, 6) AS weight,
  ROUND(CAST(1000000000 AS DOUBLE) * pow(CAST(n_tokens AS DOUBLE), 0.5) / z
        / CAST(n_tokens AS DOUBLE), 4) AS epochs
FROM t CROSS JOIN z ORDER BY source
""",
    // the single-window semantic twin of the distributed prefix sum
    "X80_budget_cut" -> s"""
WITH t AS (SELECT doc_id,
    CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS n_tokens
  FROM documents),
o AS (SELECT doc_id, n_tokens,
    row_number() OVER (ORDER BY $coin, doc_id) AS shuffle_pos FROM t),
c AS (SELECT doc_id, shuffle_pos, n_tokens,
    SUM(n_tokens) OVER (ORDER BY shuffle_pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM o)
SELECT doc_id, shuffle_pos, n_tokens, cum_tokens FROM c
WHERE cum_tokens - n_tokens < 5000 ORDER BY shuffle_pos
""",
    // the single-window semantic twin of the bucketed two-pass rank +
    // prefix sum the builder uses
    "X86_novelty_curve" -> """
WITH d AS (SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rn FROM documents),
nd AS (SELECT COUNT(*) AS n FROM documents),
b AS (SELECT CAST(((rn - 1) * 20) DIV n AS BIGINT) AS bucket, text FROM d CROSS JOIN nd),
tk AS (SELECT bucket, explode(filter(split(text, ' '), w -> w != '')) AS w FROM b),
fs AS (SELECT w, MIN(bucket) AS bucket FROM tk GROUP BY w),
nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM fs GROUP BY bucket),
pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(size(filter(split(text, ' '), w -> w != ''))) AS BIGINT) AS n_tokens
       FROM b GROUP BY bucket)
SELECT pb.bucket, pb.n_docs, pb.n_tokens,
  CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types,
  CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY pb.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
FROM pb LEFT JOIN nt ON pb.bucket = nt.bucket ORDER BY pb.bucket
""",
    "X87_split_divergence" -> s"""
WITH sp AS (SELECT CASE
    WHEN $coin < '${graft.ops.Scale.hexCutoff(0.8)}' THEN 'train'
    WHEN $coin < '${graft.ops.Scale.hexCutoff(0.9)}' THEN 'val'
    ELSE 'test' END AS split, text FROM documents),
tk AS (SELECT split, explode(filter(split(text, ' '), w -> w != '')) AS w FROM sp),
c AS (SELECT w,
        SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c_train,
        SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS c_val,
        SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS c_test
      FROM tk GROUP BY w),
t AS (SELECT SUM(c_train) AS n_train, SUM(c_val) AS n_val,
        SUM(c_test) AS n_test, COUNT(*) AS v FROM c),
p AS (SELECT CAST(c_train + 1 AS DOUBLE) / CAST(n_train + v AS DOUBLE) AS p_train,
        CAST(c_val + 1 AS DOUBLE) / CAST(n_val + v AS DOUBLE) AS p_val,
        CAST(c_test + 1 AS DOUBLE) / CAST(n_test + v AS DOUBLE) AS p_test
      FROM c CROSS JOIN t),
one AS (SELECT
  ROUND(SUM(p_train * ln(p_train / p_val)), 6) AS kl_train_val,
  ROUND(SUM(ABS(p_train - p_val)) / 2, 6) AS tv_train_val,
  ROUND(SUM(p_train * ln(p_train / p_test)), 6) AS kl_train_test,
  ROUND(SUM(ABS(p_train - p_test)) / 2, 6) AS tv_train_test,
  ROUND(SUM(p_val * ln(p_val / p_train)), 6) AS kl_val_train,
  ROUND(SUM(ABS(p_val - p_train)) / 2, 6) AS tv_val_train,
  ROUND(SUM(p_val * ln(p_val / p_test)), 6) AS kl_val_test,
  ROUND(SUM(ABS(p_val - p_test)) / 2, 6) AS tv_val_test,
  ROUND(SUM(p_test * ln(p_test / p_train)), 6) AS kl_test_train,
  ROUND(SUM(ABS(p_test - p_train)) / 2, 6) AS tv_test_train,
  ROUND(SUM(p_test * ln(p_test / p_val)), 6) AS kl_test_val,
  ROUND(SUM(ABS(p_test - p_val)) / 2, 6) AS tv_test_val
  FROM p)
SELECT split_a, split_b, kl, tv FROM (
  SELECT 'train' AS split_a, 'val' AS split_b, kl_train_val AS kl, tv_train_val AS tv FROM one
  UNION ALL SELECT 'train', 'test', kl_train_test, tv_train_test FROM one
  UNION ALL SELECT 'val', 'train', kl_val_train, tv_val_train FROM one
  UNION ALL SELECT 'val', 'test', kl_val_test, tv_val_test FROM one
  UNION ALL SELECT 'test', 'train', kl_test_train, tv_test_train FROM one
  UNION ALL SELECT 'test', 'val', kl_test_val, tv_test_val FROM one)
ORDER BY split_a, split_b
""",
    // graft_dot is the registered codegen'd dot — the X82/X85 twin idiom
    "X88_semantic_leakage" -> s"""
WITH sp AS (SELECT vec_id, embedding,
    CASE WHEN ${coin.replace("doc_id", "vec_id")} < '${graft.ops.Scale.hexCutoff(0.9)}'
      THEN 'train' ELSE 'eval' END AS split FROM embeddings),
s AS (SELECT a.vec_id AS eval_id, b.vec_id AS train_id,
    ROUND(graft_dot(a.embedding, b.embedding), 6) AS cos
  FROM sp a CROSS JOIN sp b WHERE a.split = 'eval' AND b.split = 'train'),
r AS (SELECT eval_id, train_id, cos,
    row_number() OVER (PARTITION BY eval_id ORDER BY cos DESC, train_id) AS rk FROM s)
SELECT eval_id, train_id, cos, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 1 AND cos >= 0.35 ORDER BY eval_id, rk
""",
    "X92_source_lm_matrix" -> """
WITH t AS (SELECT doc_id, source, filter(split(text, ' '), x -> x != '') AS toks FROM documents),
bg AS (SELECT doc_id, source, toks[i-1] AS w1, toks[i] AS w2
       FROM (SELECT doc_id, source, toks, explode(sequence(1, size(toks) - 1)) AS i
             FROM t WHERE size(toks) >= 2) u),
m AS (SELECT source AS model_source, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
cx AS (SELECT model_source, w1, SUM(c12) AS c1 FROM m GROUP BY 1, 2),
v AS (SELECT source AS model_source, COUNT(DISTINCT w) AS v
      FROM (SELECT source, explode(toks) AS w FROM t) z GROUP BY 1),
pd AS (SELECT bg.doc_id, bg.source, v.model_source,
         AVG(log10(CAST(COALESCE(m.c12, 0) + 1 AS DOUBLE) /
                   CAST(COALESCE(cx.c1, 0) + v.v AS DOUBLE))) AS logp
       FROM bg CROSS JOIN v
       LEFT JOIN m ON v.model_source = m.model_source AND bg.w1 = m.w1 AND bg.w2 = m.w2
       LEFT JOIN cx ON v.model_source = cx.model_source AND bg.w1 = cx.w1
       GROUP BY 1, 2, 3)
SELECT source AS scored_source, model_source,
  CAST(COUNT(*) AS BIGINT) AS n_docs, ROUND(AVG(logp), 6) AS avg_logp
FROM pd GROUP BY 1, 2 ORDER BY scored_source, model_source
""",
    "X91_heldout_logprob" -> s"""
WITH sp AS (SELECT doc_id, text, CASE
    WHEN $coin < '${graft.ops.Scale.hexCutoff(0.8)}' THEN 'train'
    WHEN $coin < '${graft.ops.Scale.hexCutoff(0.9)}' THEN 'val'
    ELSE 'test' END AS split FROM documents),
t AS (SELECT doc_id, split, filter(split(text, ' '), x -> x != '') AS toks FROM sp),
bg AS (SELECT doc_id, split, toks[i-1] AS w1, toks[i] AS w2
       FROM (SELECT doc_id, split, toks, explode(sequence(1, size(toks) - 1)) AS i
             FROM t WHERE size(toks) >= 2) u),
m AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg WHERE split = 'train' GROUP BY w1, w2),
cx AS (SELECT w1, SUM(c12) AS c1 FROM m GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w) AS v
      FROM (SELECT explode(toks) AS w FROM t WHERE split = 'train') z)
SELECT bg.doc_id, bg.split, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  ROUND(AVG(log10(CAST(COALESCE(m.c12, 0) + 1 AS DOUBLE) /
                  CAST(COALESCE(cx.c1, 0) + v.v AS DOUBLE))), 6) AS mean_logp
FROM bg LEFT JOIN m ON bg.w1 = m.w1 AND bg.w2 = m.w2
        LEFT JOIN cx ON bg.w1 = cx.w1
        CROSS JOIN v
GROUP BY bg.doc_id, bg.split ORDER BY bg.doc_id
""",
    "X89_zipf_fit" -> """
WITH toks AS (SELECT explode(filter(split(text, ' '), w -> w != '')) AS w FROM documents),
c AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rk FROM c),
xy AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
       FROM r WHERE rk <= 500)
SELECT CAST(COUNT(*) AS BIGINT) AS top_v,
  ROUND(regr_slope(y, x), 6) AS slope,
  ROUND(regr_intercept(y, x), 6) AS intercept,
  ROUND(regr_r2(y, x), 6) AS r2
FROM xy
""",
    // the ratio-margin criterion in one SQL text: both kNN directions
    // rank by the 6-dp-rounded graft_dot cosine (knnJoin's contract),
    // margins rounded before the threshold compare
    "X106_margin_pairs" -> """
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0),
b AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
fr AS (SELECT qid, vid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
       FROM (SELECT a.vec_id AS qid, b.vec_id AS vid,
               round(graft_dot(a.embedding, b.embedding), 6) AS cos
             FROM a CROSS JOIN b) f),
br AS (SELECT qid, vid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
       FROM (SELECT b.vec_id AS qid, a.vec_id AS vid,
               round(graft_dot(b.embedding, a.embedding), 6) AS cos
             FROM b CROSS JOIN a) g),
da AS (SELECT qid, AVG(cos) AS avg_a FROM fr WHERE rk <= 4 GROUP BY qid),
db AS (SELECT qid, AVG(cos) AS avg_b FROM br WHERE rk <= 4 GROUP BY qid)
SELECT f.qid AS i, f.vid AS j, f.cos,
  round(f.cos / (da.avg_a / 2 + db.avg_b / 2), 6) AS margin
FROM fr f JOIN da ON da.qid = f.qid JOIN db ON db.qid = f.vid
WHERE f.rk = 1 AND (da.avg_a / 2 + db.avg_b / 2) > 0
  AND round(f.cos / (da.avg_a / 2 + db.avg_b / 2), 6) >= 1.02
ORDER BY i, j
""")

  test("pipeline extras: Spark-SQL twins hash-equal to the DataFrame builders") {
    graft.core.Engine.configure(spark)
    Tables.registerAll(spark, sf001)
    sqlTwins.foreach { case (id, text) =>
      val viaSql = Canonical.hash16(spark.sql(text.trim))
      val viaBuilder = Canonical.hash16(Extras.queries(id)(spark, sf001))
      assert(viaSql == viaBuilder,
        s"$id: SQL twin hash $viaSql != builder hash $viaBuilder")
    }
  }

  test("X90: decontamination-report SQL twin over a shared banded index hash-equal to the builder") {
    graft.core.Engine.configure(spark)
    Tables.registerAll(spark, sf001)
    val docs = Tables.load(spark, sf001, "documents")
    val emb = Tables.load(spark, sf001, "embeddings")
    val corpus = docs.filter(org.apache.spark.sql.functions.col("source") =!= "src0")
    val bench = docs.filter(org.apache.spark.sql.functions.col("source") === "src0")
    // both forms consume the SAME banded rows (the persisted-artifact
    // contract the declared query rides)
    val dir = java.nio.file.Files.createTempDirectory("graft-x90-banded").toString
    val cfg = graft.text.MinHashConfig(threshold = 0.5)
    graft.text.MinHashDedup.writeBandedIndex(
      graft.text.MinHashDedup.signatures(docs, cfg), dir, cfg)
    val banded = graft.text.MinHashDedup.readBandedIndex(spark, dir, cfg)
    banded.createOrReplaceTempView("x90_banded")
    val viaBuilder = Canonical.hash16(
      graft.pipeline.TrainingSet.decontaminationReport(corpus, bench, banded, emb))
    // Spark SQL is 0-based on array indexing (DuckDB's oracle is
    // 1-based) — the i-1 offsets below are that dialect shift
    val viaSql = Canonical.hash16(spark.sql("""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE source != 'src0'),
bench AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
ct AS (SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks FROM corpus),
csh AS (SELECT DISTINCT doc_id, s FROM (
  SELECT doc_id, explode(transform(sequence(1, size(toks) - 4),
    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2], toks[i+3]))) AS s
  FROM ct WHERE size(toks) >= 5) u),
bt AS (SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks FROM bench),
bsh AS (SELECT DISTINCT s FROM (
  SELECT explode(transform(sequence(1, size(toks) - 4),
    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2], toks[i+3]))) AS s
  FROM bt WHERE size(toks) >= 5) u),
ng AS (SELECT csh.doc_id,
         ROUND(CAST(COUNT(bsh.s) AS DOUBLE) / COUNT(*), 6) AS ngram_frac
       FROM csh LEFT JOIN bsh ON csh.s = bsh.s GROUP BY csh.doc_id),
cand AS (
  SELECT DISTINCT a.id AS i, b.id AS j
  FROM x90_banded a JOIN x90_banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.id IN (SELECT doc_id FROM corpus)
    AND b.id IN (SELECT doc_id FROM bench)),
cids AS (SELECT i AS doc_id FROM cand UNION SELECT j FROM cand),
t3 AS (SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks
       FROM documents WHERE doc_id IN (SELECT doc_id FROM cids)),
sh3 AS (SELECT DISTINCT doc_id, s FROM (
  SELECT doc_id, explode(transform(sequence(1, size(toks) - 2),
    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))) AS s
  FROM t3 WHERE size(toks) >= 3) u),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh3 GROUP BY doc_id),
inter AS (SELECT cand.i, cand.j, COUNT(*) AS c
          FROM cand JOIN sh3 a ON cand.i = a.doc_id
                    JOIN sh3 b ON cand.j = b.doc_id AND a.s = b.s
          GROUP BY 1, 2),
nd AS (SELECT DISTINCT inter.i AS doc_id
       FROM inter JOIN sz sa ON inter.i = sa.doc_id
                  JOIN sz sb ON inter.j = sb.doc_id
       WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5),
cemb AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id IN (SELECT doc_id FROM corpus)),
bemb AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id IN (SELECT doc_id FROM bench)),
sem AS (SELECT c.vec_id AS doc_id,
          ROUND(MAX(graft_dot(c.embedding, b.embedding)), 6) AS semantic_cos
        FROM cemb c CROSS JOIN bemb b GROUP BY c.vec_id)
SELECT c.doc_id,
  COALESCE(ng.ngram_frac, CAST(0 AS DOUBLE)) AS ngram_frac,
  (nd.doc_id IS NOT NULL) AS near_dup,
  sem.semantic_cos,
  CASE WHEN COALESCE(ng.ngram_frac, CAST(0 AS DOUBLE)) >= 0.2
         OR nd.doc_id IS NOT NULL
         OR sem.semantic_cos >= 0.35 THEN 'drop' ELSE 'keep' END AS verdict
FROM corpus c
LEFT JOIN ng ON c.doc_id = ng.doc_id
LEFT JOIN nd ON c.doc_id = nd.doc_id
LEFT JOIN sem ON c.doc_id = sem.doc_id
ORDER BY c.doc_id
""".trim))
    assert(viaSql == viaBuilder,
      s"X90 SQL twin hash $viaSql != builder hash $viaBuilder")
  }

  test("X83/X85: SQL twins over shared inputs hash-equal to the builders") {
    graft.core.Engine.configure(spark)
    Tables.registerAll(spark, sf001)
    val docs = Tables.load(spark, sf001, "documents")
    val emb = Tables.load(spark, sf001, "embeddings")
    // X83 over a shared encoded corpus (BPE encode is deterministic
    // integer/string output, so in-spec generation is exact)
    val enc = graft.text.Bpe.encodeDocuments(
      docs, graft.text.Bpe.learnMerges(docs, numMerges = 12))
    enc.createOrReplaceTempView("bpe_encoded")
    val x83Sql = spark.sql("""
WITH toks AS (SELECT doc_id, COUNT(*) AS n_tokens FROM bpe_encoded GROUP BY doc_id),
w AS (SELECT doc_id, lang, n_chars,
    CAST(size(filter(split(text, '\\s+'), x -> x != '')) AS BIGINT) AS n_words
  FROM documents),
g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(SUM(n_words) AS BIGINT) AS total_words,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM w JOIN toks USING (doc_id) GROUP BY lang)
SELECT lang, n_docs, total_tokens, total_words, total_chars,
  ROUND(CAST(total_tokens AS DOUBLE) / total_words, 6) AS tokens_per_word,
  ROUND(CAST(total_chars AS DOUBLE) / total_tokens, 6) AS chars_per_token
FROM g ORDER BY lang
""".trim)
    assert(Canonical.hash16(x83Sql) ==
      Canonical.hash16(graft.text.Bpe.fertilityByLang(enc, docs)),
      "X83 SQL twin diverges from fertilityByLang")
    // X85 over FROZEN shared centroids (Lloyd float sums are not
    // canonical, so both forms must consume the same table — the same
    // contract the persisted artifact gives the declared query)
    val dim = emb.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).first().getInt(0)
    val cents = graft.vector.Ivf.refineCentroids(
      emb, graft.vector.Ivf.centroids(emb, 8), iters = 4, dim = dim)
      .localCheckpoint(true)
    cents.createOrReplaceTempView("cents")
    val x85Sql = spark.sql("""
WITH assigned AS (
  SELECT vec_id, centroid_id AS list_id, sc FROM (
    SELECT e.vec_id, c.centroid_id,
      graft_dot(e.embedding, c.centroid) AS sc,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY graft_dot(e.embedding, c.centroid) DESC, c.centroid_id) AS rk
    FROM embeddings e CROSS JOIN cents c) z
  WHERE rk = 1)
SELECT vec_id, list_id, ROUND(sc, 6) AS cos
FROM assigned WHERE sc < 0.3 ORDER BY vec_id
""".trim)
    assert(Canonical.hash16(x85Sql) ==
      Canonical.hash16(graft.vector.SemDedup.outliers(emb, cents, minCos = 0.3)),
      "X85 SQL twin diverges from outliers")
    // X82 rides the same argmax assignment + the X49 coin-window shape
    val x82Sql = spark.sql(s"""
WITH assigned AS (
  SELECT vec_id, centroid_id AS list_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY graft_dot(e.embedding, c.centroid) DESC, c.centroid_id) AS rk
    FROM embeddings e CROSS JOIN cents c) z
  WHERE rk = 1)
SELECT vec_id, list_id FROM (
  SELECT vec_id, list_id, row_number() OVER (PARTITION BY list_id
    ORDER BY ${coin.replace("doc_id", "vec_id")}, vec_id) AS rk2
  FROM assigned) t
WHERE rk2 <= 10 ORDER BY list_id, vec_id
""".trim)
    assert(Canonical.hash16(x82Sql) ==
      Canonical.hash16(graft.vector.SemDedup.diversitySample(emb, cents, k = 10)),
      "X82 SQL twin diverges from diversitySample")
  }

  test("X78/X84: cluster-downstream SQL twins hash-equal to the builders") {
    // the cluster table itself is iterative label propagation (no
    // recursive CTE in Spark SQL) — it is the SHARED input here, and the
    // twins pin the winner/report algebra downstream of it, exactly as
    // the DuckDB oracles do with their recursive-CTE clusters
    graft.core.Engine.configure(spark)
    val docs = Tables.load(spark, sf01, "documents")
    // a DISTINCT view name: clobbering the shared `documents` view
    // would poison later tests (Tables.registerAll memoizes per dir
    // and would not re-register it)
    docs.createOrReplaceTempView("documents_sf01")
    val clusters = graft.text.MinHashDedup.duplicateClusters(
      graft.text.MinHashDedup.verifiedPairs(docs)).localCheckpoint(true)
    assert(clusters.count() > 0, "sf0.01 must contain near-dup clusters")
    clusters.createOrReplaceTempView("clusters")
    val x78Sql = spark.sql("""
WITH q AS (SELECT doc_id,
    CAST(size(array_distinct(filter(split(text, ' '), w -> w != ''))) AS BIGINT) AS n_uniq
  FROM documents_sf01),
m AS (SELECT c.cluster_id, c.doc_id, q.n_uniq FROM clusters c JOIN q USING (doc_id)),
r AS (SELECT cluster_id, doc_id, n_uniq,
    row_number() OVER (PARTITION BY cluster_id ORDER BY n_uniq DESC, doc_id) AS rk,
    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM m)
SELECT cluster_id, doc_id AS keep_id, n_uniq, n_members
FROM r WHERE rk = 1 ORDER BY cluster_id
""".trim)
    assert(Canonical.hash16(x78Sql) ==
      Canonical.hash16(graft.text.MinHashDedup.qualityAwareWinners(docs, clusters)),
      "X78 SQL twin diverges from qualityAwareWinners")
    val x84Sql = spark.sql("""
WITH m AS (SELECT c.cluster_id, d.doc_id, d.n_chars
  FROM clusters c JOIN documents_sf01 d USING (doc_id)),
per AS (SELECT cluster_id, COUNT(*) AS cluster_size,
    SUM(n_chars) - min_by(n_chars, doc_id) AS chars_lost
  FROM m GROUP BY cluster_id)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(SUM(cluster_size - 1) AS BIGINT) AS docs_removed,
  CAST(SUM(chars_lost) AS BIGINT) AS chars_removed
FROM per GROUP BY cluster_size ORDER BY cluster_size
""".trim)
    assert(Canonical.hash16(x84Sql) ==
      Canonical.hash16(graft.text.MinHashDedup.dedupReport(docs, clusters)),
      "X84 SQL twin diverges from dedupReport")
  }

  test("X81: perplexity-bucket SQL twin hash-equal to the builder") {
    graft.core.Engine.configure(spark)
    Tables.registerAll(spark, sf001)
    // the full chain in one SQL text: add-one bigram LM score, global
    // fluency rank (single-window semantic twin of the bucketed
    // two-pass), equal-mass floor bucketing
    val x81Sql = spark.sql("""
WITH t AS (SELECT doc_id, filter(split(text, ' '), w -> w != '') AS ws FROM documents),
bgs AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
  SELECT doc_id, explode(zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
                                  (a, b) -> named_struct('w1', a, 'w2', b))) AS bg FROM t) x),
model AS (SELECT w1, w2, COUNT(*) AS c12 FROM bgs GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c12) AS c1 FROM model GROUP BY w1),
m AS (SELECT model.w1, model.w2, c12, c1 FROM model JOIN ctx USING (w1)),
v AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT explode(ws) AS w FROM t)),
scores AS (
  SELECT doc_id,
    ROUND(AVG(LOG(10.0, CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))), 6) AS mean_logp
  FROM bgs JOIN m USING (w1, w2) CROSS JOIN v GROUP BY doc_id),
n AS (SELECT COUNT(*) AS n FROM scores),
r AS (SELECT doc_id, mean_logp,
  row_number() OVER (ORDER BY mean_logp DESC, doc_id) AS rank FROM scores)
SELECT doc_id, mean_logp, CAST(rank AS BIGINT) AS rank,
  CAST(floor(CAST(rank - 1 AS DOUBLE) * 3 / n) AS BIGINT) AS bucket
FROM r CROSS JOIN n ORDER BY rank
""".trim)
    assert(Canonical.hash16(x81Sql) ==
      Canonical.hash16(Extras.queries("X81_perplexity_buckets")(spark, sf001)),
      "X81 SQL twin diverges from perplexityBuckets")
  }
}
