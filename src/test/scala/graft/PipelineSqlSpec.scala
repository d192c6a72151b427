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
}
