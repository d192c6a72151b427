package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-pair generation inside LSH buckets with a bounded-fanout
  * defense for oversized buckets — shared by the MinHash text path
  * ([[graft.text.MinHashDedup]]) and the sign-LSH vector path
  * ([[graft.vector.Ann]]).
  *
  * The hazard: a degenerate corpus (near-constant text or embeddings)
  * can send millions of members to one (band, bucket) key, whose
  * all-pairs self-join is O(m²) in candidate mass and melts the single
  * reducer that owns the key.
  */
object BucketedPairs {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Candidate pairs (i, j), i < j, within each (band, bucket) group of
    * `members` — columns (id: long, band, bucket, sigh: long), where
    * `sigh` is a 64-bit hash of the member's FULL signature (equal
    * signatures ⇒ equal sigh).
    *
    * Buckets of size ≤ `cap` are all-paired exhaustively (exact pair
    * listing). Oversized buckets degrade to a linear-candidate scheme
    * that keeps every reducer's fan-out ≤ `cap` and preserves the links
    * dedup consumes:
    *
    *   1. identical-signature groups star to the group's min id — members
    *      sharing a full signature are near-certain duplicates and stay
    *      pair-connected EXACTLY (the degenerate constant-corpus bucket
    *      is one such group: m−1 pairs, not m²);
    *   2. group representatives (one per distinct signature, G of them)
    *      are chunked by id hash into ⌈G/cap⌉ sub-chunks and all-paired
    *      within each chunk — the chunked self-join spreads the hot
    *      bucket over many reducers instead of one. Chunk sizes are
    *      hash-balanced, so ~cap in EXPECTATION with O(√(cap·log G))
    *      fluctuation, not a hard bound;
    *   3. every representative is linked to the bucket's min id, so each
    *      member still reaches exact verification through at most two
    *      hops (its group anchor, then the bucket anchor).
    *
    * Accuracy contract for an OVERSIZED bucket (callers must document
    * it): identical-signature duplicate pairs are always connected;
    * a DISTINCT-signature near-dup pair (B, C) is listed only if B and C
    * land in the same sub-chunk (probability ~cap/G) or connect through
    * anchors that themselves pass verification — exhaustive pair listing
    * and exact transitive connectivity among distinct-signature members
    * are NOT guaranteed. Small buckets lose nothing.
    *
    * Cost: candidates per oversized bucket ≈ (m−G) + G·cap/2 + G —
    * linear in m for fixed cap (the middle term is an expectation, per
    * the chunking note above). EAGER: this function runs jobs at
    * DataFrame-CONSTRUCTION time (the checkpoints below plus one
    * diagnostic aggregate) — callers timing only the action on the
    * returned frame under-count; time the whole builder+action.
    * The member table is localCheckpoint'ed
    * ONCE: the (usually expensive) signature lineage upstream of
    * `members` runs exactly one pass, and every downstream consumer
    * (bucket stats, the capped-fraction diagnostic, both self-join
    * sides) reads the materialized rows — at 8-byte-key × bands scale,
    * far smaller than the corpus. A warning is logged whenever any
    * bucket is capped, with the affected row fraction, so recall loss is
    * never silent.
    *
    * Output may contain the same (i, j) via several bands — callers
    * dedup after (or after scoring, whichever is cheaper).
    *
    * @param preMaterialized the caller guarantees `members` is already
    *   a cheap materialized scan (a persisted parquet/bucketed table,
    *   NOT an expensive live lineage). Skips both localCheckpoints so
    *   the scan's physical properties survive into planning — a table
    *   bucketed by (band, bucket) then feeds the stats aggregate, the
    *   tag join and BOTH self-join sides with zero shuffle exchanges
    *   (hash-partitioning on (band, bucket) satisfies every clustered
    *   distribution below, including the (band, bucket, sigh) and
    *   chunked-representative groupings). A checkpoint here would erase
    *   the bucketing (RDD scans carry no partitioning info) and
    *   re-introduce four exchanges.
    */
  def cappedCandidatePairs(
      members: DataFrame,
      cap: Int,
      preMaterialized: Boolean = false): DataFrame = {
    require(cap >= 2, s"cap=$cap must allow at least one pair")
    val m0 = if (preMaterialized) members else members.localCheckpoint(true)
    val stats = m0.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__n"), min("id").as("__banchor"))
    // the diagnostic aggregate (which runs eagerly anyway) also carries
    // the candidate-mass estimate the spread decision below needs:
    // small buckets all-pair (n² mass), oversized buckets degrade to
    // the linear scheme (≈ n·cap mass) — the `when` keeps the sum
    // overflow-safe for degenerate giant buckets too
    val diag = stats.agg(
      coalesce(sum(when(col("__n") > cap, col("__n"))), lit(0L)).as("capped"),
      coalesce(sum(col("__n")), lit(0L)).as("total"),
      coalesce(sum(when(col("__n") > cap, col("__n") * cap)
        .otherwise(col("__n") * col("__n"))), lit(0L)).as("mass")).first()
    val (cappedRows, totalRows) = (diag.getLong(0), diag.getLong(1))
    // spread the bucket self-join's pair expansion when — and only
    // when — it is actually heavy: a member table fresh off a narrow
    // parquet scan materializes with the scan's (often single-digit)
    // partition count, and since the self-join below broadcasts one
    // side, the O(Σ n²) candidate expansion runs on exactly those few
    // map tasks regardless of core count (measured: a 3.8 s two-task
    // stage under X103 at sf0.1 on 32 cores). One exchange on the join
    // key — 8-byte-key rows, the cheapest shuffle in this pipeline —
    // re-establishes parallelism proportional to the MEASURED candidate
    // mass (~64 k candidates per task), capped at the session's shuffle
    // parallelism; tiny expansions skip the exchange entirely (an
    // unconditional 32-way spread measurably REGRESSED the small banded
    // consumers at sf0.1). Explicit partition count, not
    // repartition(cols): AQE's small-shuffle coalescing sizes by
    // shuffle-read bytes, which is exactly NOT the expansion cost, and
    // would fold the tiny key shuffle back into the few tasks the
    // expansion is being rescued from. A hot bucket still lands on one
    // task — which is exactly what the cap bounds.
    val spreadTasks = math.min(
      m0.sparkSession.sessionState.conf.numShufflePartitions.toLong,
      diag.getLong(2) / 65536L).toInt
    val m =
      if (preMaterialized || spreadTasks <= 1) m0
      else m0.repartition(spreadTasks, col("band"), col("bucket"))
    if (cappedRows > 0) log.warn(
      s"cappedCandidatePairs: $cappedRows of $totalRows member rows " +
        f"(${cappedRows.toDouble / totalRows * 100}%.1f%%) sit in buckets larger than cap=$cap " +
        "and degrade from exhaustive to linear candidate generation — distinct-signature " +
        "pair recall in those buckets is reduced; raise the cap or the number of planes/bands " +
        "if this fraction is large")
    // the common case — NO bucket over the cap — doesn't need the stats
    // join or the three oversized tiers at all: they'd contribute zero
    // rows but still cost their full plan, codegen, and exchanges on
    // every invocation (measured: the majority of a banded query's cold
    // wall-clock at fixture scale). The diagnostic above already ran
    // eagerly, so this is a data-driven plan choice, not a guess; the
    // result is identical because `small` would equal `m` and every
    // oversized tier would filter to empty.
    if (cappedRows == 0) {
      return m.as("a")
        .join(m.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("i"), col("b.id").as("j"))
    }
    // tagged is read by both self-join sides and all three oversized
    // tiers — materialize it once (cheap: m is already local) rather
    // than re-running the stats join per consumer; in preMaterialized
    // mode re-reading the cheap scan per consumer is the better trade
    // (the checkpoint would drop the bucketed partitioning)
    val taggedRaw = m.join(stats, Seq("band", "bucket"))
    val tagged = if (preMaterialized) taggedRaw else taggedRaw.localCheckpoint(true)

    val small = tagged.filter(col("__n") <= cap)
    val smallPairs = small.as("a")
      .join(small.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))

    val over = tagged.filter(col("__n") > cap)
    // tier 1: identical-signature groups (group anchor = min id < members)
    val groups = over.groupBy("band", "bucket", "sigh")
      .agg(min("id").as("__ganchor"), min("__banchor").as("__banchor"))
    val groupStar = over
      .join(groups.select("band", "bucket", "sigh", "__ganchor"), Seq("band", "bucket", "sigh"))
      .filter(col("id") =!= col("__ganchor"))
      .select(col("__ganchor").as("i"), col("id").as("j"))
    // tier 2: representatives, chunked all-pairs (fan-out ≤ cap per chunk)
    val repStats = groups.groupBy("band", "bucket").agg(count(lit(1)).as("__g"))
    val reps = groups.join(repStats, Seq("band", "bucket"))
      .withColumn("__chunk",
        pmod(xxhash64(col("__ganchor")),
          greatest(lit(1L), ceil(col("__g").cast("double") / cap).cast("long"))))
    val repPairs = reps.as("a")
      .join(reps.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.__chunk") === col("b.__chunk") && col("a.__ganchor") < col("b.__ganchor"))
      .select(col("a.__ganchor").as("i"), col("b.__ganchor").as("j"))
    // tier 3: bucket anchor link (bucket anchor = min id < representatives)
    val anchorStar = reps.filter(col("__ganchor") =!= col("__banchor"))
      .select(col("__banchor").as("i"), col("__ganchor").as("j"))

    smallPairs.unionByName(groupStar).unionByName(repPairs).unionByName(anchorStar)
  }
}
