package graft

import graft.ops.{Catalog, DfContract}

/** Plan-shape audit over every DataFrame-form contract query: no
  * accidental cartesian products or nested-loop joins outside the
  * queries whose semantics require one, and every parquet scan prunes
  * columns (reads a strict subset where the query needs one).
  */
class PlanAuditSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  // nested-loop/cartesian is the intended plan here: J07 cross join,
  // A10/L06 1-row broadcast scalar, T02 2-row offsets frame
  private val nlAllowed = Set("J07", "A10", "L06", "T02")

  test("no unintended cartesian or nested-loop joins") {
    val offenders = Contract.all.map(_.id).filter { id =>
      val plan = DfContract.all(id)(cat).queryExecution.executedPlan.toString
      val hasNl = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      hasNl && !nlAllowed.contains(id)
    }
    assert(offenders.isEmpty, s"unexpected NL/cartesian join in: $offenders")
  }

  test("single-table scans prune columns to what the query touches") {
    // representative narrow queries: the scan schema must not include
    // untouched wide columns
    val l06Plan = DfContract.all("L06")(cat).queryExecution.executedPlan.toString
    assert(!l06Plan.contains("label"), "L06 scan should prune `label`")
    val p02Plan = DfContract.all("P02")(cat).queryExecution.executedPlan.toString
    assert(!p02Plan.contains("c_acctbal"), "P02 scan should prune `c_acctbal`")
  }

  test("IVF assign is map-side: no shuffle or window over the corpus") {
    val cents = graft.vector.Ivf.centroids(cat.embeddings, 16)
    val plan = graft.vector.Ivf.assign(cat.embeddings, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"assign must not rank through a window:\n$plan")
    // broadcast exchange of the one-row centroid array is fine; any
    // shuffle (hash/range/single-partition exchange) is not
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition").foreach { x =>
      assert(!plan.contains(x), s"assign must not shuffle ($x):\n$plan")
    }
  }

  test("EVERY extras plan: one-partition merges and NL joins only where semantics demand them") {
    // one-row global merges: table profile, global HLL union, funnel
    // stage counts, exact-percentile final, scalar idf / vocab totals,
    // the mixture resampler's min(n/t) over per-stratum counts, the
    // BPE encoder's one-row corpus stats, the k-means assign's
    // centroid-array collapse (global agg of an nLists-sized table),
    // the DSIR (V, R, T) totals row, BM25's (N, Σdl, df…) stats row,
    // the bigram LM's 1-row vocabulary-size count
    val spAllowed = Set(
      "X13_tfidf_top3", "X19_profile", "X37_hll_distinct",
      "X41_funnel", "X43_time_to_convert", "X48_mixture_resample",
      "X53_vocab_coverage", "X58_bpe_encode_stats",
      "X60_kmeans_clusters", "X61_semantic_dedup",
      "X62_importance_weights", "X63_bm25_topk", "X66_bm25_join",
      "X70_bigram_logprob", "X76_hard_negatives",
      // X79/X81: the 1-row normalizer aggregate (Σ n^α / corpus count);
      // X82/X85: the centroid-array collapse inside the assignment
      // (X60's shape)
      "X79_epoch_plan", "X81_perplexity_buckets", "X82_diversity_sample",
      "X85_semantic_outliers",
      // X86/X87: the 1-row corpus-count / split-totals aggregate;
      // X89: the final topV-sized regression collapses to one row;
      // X90: the benchmark-embedding array collapse (X60's shape)
      "X86_novelty_curve", "X87_split_divergence", "X89_zipf_fit",
      // X100: X87's kernel — the final KL/TV sums collapse to one row
      "X100_unigram_drift",
      // X90: the benchmark-embedding array collapse; X91: the 1-row
      // train-vocab count (X70's shape). X92 is deliberately NOT here:
      // its vocab aggregate is hash-partitioned by model_source, so
      // the audit must keep guarding it
      "X90_decontamination_report", "X91_heldout_logprob",
      // X93 composes X90 + X81 + the mixture: it inherits the
      // benchmark-embedding array collapse and the 1-row LM normalizer
      "X93_curation_manifest",
      // X84 (round 11): the capped-bucket exposure columns are a 1-row
      // global aggregate over the banded index's (band, bucket) counts,
      // broadcast-crossed onto the sizes-sized report (the X19/X37
      // single-row-stats shape)
      "X84_dedup_report",
      // X101 inherits X66's 1-row corpus-stats aggregate through its
      // BM25 channel; X102 the 1-row (B, V) totals row (X91's shape)
      "X101_hybrid_rrf", "X102_kn_heldout_logprob",
      // X107 rides Ivf.assign's 1-row collapsed-centroid-array
      // aggregate (X60's shape) for the coarse list assignment
      "X107_ivfpq_top5",
      // X110 (round 12): the residual-gain report IS a 1-row global
      // aggregate (corpus averages of |v|² and |v−c|²), plus
      // Ivf.assign's collapsed-centroid-array collapse (X60's shape)
      "X110_residual_gain",
      // X114/X115 (round 13): both collapse the dim×dim rotation
      // matrix to a 1-row broadcast array (Opq.collectRotation's
      // shape, = X60's collapsed-centroid idiom); X115's avg |Rx−y|²
      // is additionally a per-variant global aggregate over 2 rows
      "X114_opq_recall", "X115_opq_error",
      // X120 (round 13): the calibration curve IS five per-budget
      // 1-row Σhits/Σexact aggregates over the sample-sized recall
      // report, plus the 1-row fallback max over the |budgets|-row
      // curve (the X19/X37 single-row-stats shape)
      "X120_serve_calibration",
      // X121 (round 13): composes X93's chain from scratch — it
      // inherits the benchmark-embedding array collapse, the 1-row LM
      // normalizer, and the mixture's min(n/t) row (X93/X48's shapes)
      "X121_curation_manifest_v2",
      // X122 (round 13): BOTH manifests' inherited collapses plus its
      // own two 1-row summary aggregates (one per pipeline) — the
      // comparison IS two single-row rollups by design
      "X122_order_impact")
    // one-row broadcast scalars (probe vectors, totals, thresholds,
    // the collapsed centroid array) or candidate stages that ARE cross
    // joins by design (exact oracle twins, batched kNN against
    // broadcast queries); X12/X28: their threshold-0.4 geometry sits in
    // the non-pruning sign-LSH regime, so the cost router sends both to
    // the exact scan — the NL join IS the cheaper plan there (the banded
    // machinery's no-cartesian shape is pinned separately below with
    // forceBanded)
    val nlAllowed = Set(
      "X05_ngram_jaccard", "X06_embed_neardup", "X09_ann_top5",
      "X11_ivf_top5", "X12_embed_neardup_lsh", "X13_tfidf_top3",
      "X14_ivf_index_probe", "X28_quantized_neardup",
      "X48_mixture_resample", "X52_knn_join",
      "X53_vocab_coverage", "X60_kmeans_clusters", "X61_semantic_dedup",
      "X62_importance_weights", "X63_bm25_topk", "X66_bm25_join",
      "X70_bigram_logprob",
      // X76 = X66's BM25 join shapes (1-row corpus-stats broadcast
      // cross join + its single-row aggregate exchange)
      "X76_hard_negatives",
      // X79/X81 broadcast their 1-row normalizer across the stratum /
      // rank table (the A10/X62 idiom); X82/X85 ride the assignment's
      // 1-row collapsed-centroid-array broadcast (X60's shape)
      "X79_epoch_plan", "X81_perplexity_buckets", "X82_diversity_sample",
      "X85_semantic_outliers",
      // X86/X87 broadcast their 1-row count/totals across the bucketed /
      // vocab-sized table (the X53 idiom); X88 rides knnJoin's
      // broadcast-queries join (X52's shape); X90 broadcasts the 1-row
      // benchmark-embedding array (X60/X82's shape)
      "X86_novelty_curve", "X87_split_divergence", "X88_semantic_leakage",
      // X100 broadcasts X87's 1-row totals row across the vocab table
      "X100_unigram_drift",
      // X91 broadcasts the 1-row train-vocab count (X70's shape);
      // X92 crosses the bigram stream with the sources-sized vocab
      // broadcast — the |S|-fold probe IS the algorithm
      "X90_decontamination_report", "X91_heldout_logprob",
      "X92_source_lm_matrix",
      // X93 rides X90's broadcast-argmax embedding channel
      "X93_curation_manifest",
      // X84 (round 11): 1-row capped-stats broadcast cross join onto
      // the #distinct-sizes report rows (the X76 1-row-stats idiom)
      "X84_dedup_report",
      // X101 = X66's 1-row BM25 corpus-stats broadcast cross join plus
      // Ann.knnJoin's broadcast-queries join (X52's shape); X102
      // broadcasts the 1-row (B, V) totals across the bigram probe
      // (X91's shape)
      "X101_hybrid_rrf", "X102_kn_heldout_logprob",
      // X104/X105 cross the codes table with the broadcast nq-row ADC
      // lookup-table frame (and X105's exact side is the broadcast-
      // queries scan) — the linear N·nq ADC semantics, never a
      // data×data cartesian; X106 is two knnJoin broadcast-queries
      // scans (X52's shape); X107 adds Ivf.assign's collapsed-array
      // broadcast (X60's shape) and the broadcast probed-lists semi
      "X104_pq_adc_top5", "X105_pq_recall", "X106_margin_pairs",
      "X107_ivfpq_top5",
      // X108/X109 (round 12): the residual IVFADC scan joins codes
      // against the broadcast (nq × nProbe)-row residual lookup-table
      // frame — the LUT generation itself crosses the nq-row query set
      // with the nLists centroid / m·ks codebook broadcasts, all
      // metadata-sized (X104's shape, per probed list); X109's exact
      // side is the broadcast-queries scan
      "X108_ivfadc_top5", "X109_ivfadc_recall",
      // X110 is one map-side Ivf.assign (collapsed-array broadcast)
      // plus a global aggregate
      "X110_residual_gain",
      // X111/X112 (round 12): the two-stage serve rides X108's scan
      // shapes for its shortlist (broadcast LUT frame, nq-row query ×
      // nLists-centroid broadcast cross); the re-rank itself is
      // broadcast-HASH joins (shortlist on vec_id, queries on
      // query_id), and X112's exact side is the broadcast-queries scan
      "X111_ivfadc_rerank_top5", "X112_rerank_recall",
      // X113 is five probe-budget reruns of X111's shapes unioned
      "X113_probe_recall_curve",
      // X114/X115 (round 13): the rotation applies through ONE
      // broadcast dim-row cross (Opq.withRotated — X60's collapsed-
      // array idiom), the reconstruction through ONE broadcast
      // codebook row; X114's exact side is the broadcast-queries scan
      // (X52's shape) and its ADC side X104's broadcast LUT frame
      "X114_opq_recall", "X115_opq_error",
      // X120 (round 13): the decision rule IS a |targets|×|budgets|
      // broadcast threshold join (recall ≥ target has no equi key) plus
      // the 1-row fallback cross — both frames metadata-sized by
      // construction, on top of X113's serve shapes per budget
      "X120_serve_calibration")
    val sf001Dir = "/root/testdata/sf0.001"
    // AUDIT BLIND SPOT (ADVICE r8, accepted): queries that lazily
    // localCheckpoint an expensive prefix (X53, X80, X81) truncate
    // their logical plan at an ExistingRDD once the checkpoint
    // materializes, so this executedPlan string only covers the
    // post-checkpoint suffix on a re-audit after execution. The
    // pre-checkpoint stages are audited through their underlying
    // operators' own plan tests (the prefix-sum/no-SinglePartition pins
    // below and in ScalableWindowsSpec), and this sweep sees the full
    // plan on first (unexecuted) construction — which is what runs here.
    val offenders = Extras.queries.toSeq.sortBy(_._1).flatMap { case (id, fn) =>
      val plan = fn(spark, sf001Dir).queryExecution.executedPlan.toString
      Seq(
        (!spAllowed(id) && plan.contains("Exchange SinglePartition")) -> "SinglePartition",
        (!nlAllowed(id) && (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin"))) -> "NL-join")
        .collect { case (true, what) => s"$id:$what" }
    }
    assert(offenders.isEmpty,
      s"unexpected plan shapes (justify and allowlist, or fix): ${offenders.mkString(", ")}")
  }

  test("extras plans: tf-idf windows on doc_id, packing never funnels to one partition") {
    val x13 = graft.text.TextAnalysis.tfIdfTopTerms(cat.documents, 3)
      .queryExecution.executedPlan.toString
    // the top-k window must partition by doc_id, never run global
    assert(x13.contains("windowspecdefinition(doc_id"), s"X13 window not keyed by doc_id:\n$x13")
    val x18 = graft.text.TextAnalysis.packIntoBins(cat.documents, 4096L)
      .queryExecution.executedPlan.toString
    assert(!x18.contains("Exchange SinglePartition"), s"X18 must not single-partition:\n$x18")
    // the budget cut rides the same distributed prefix sum — the corpus
    // must never funnel through one partition
    val x80 = graft.pipeline.TrainingSet.budgetCut(cat.documents, 5000L)
      .queryExecution.executedPlan.toString
    assert(!x80.contains("Exchange SinglePartition"), s"X80 must not single-partition:\n$x80")
  }

  test("quantized scan and BPE counting stay codegen'd — no UDFs, no extra shuffles") {
    val q = graft.vector.Quantize.quantize(cat.embeddings)
      .queryExecution.executedPlan.toString
    assert(!q.contains("BatchEvalPython") && !q.contains("ScalaUDF"),
      s"quantize must be declarative transform/aggregate:\n$q")
    assert(!q.contains("Exchange"), s"quantize must be map-side only:\n$q")
    // the O(n²) quantized candidate stage must run on the native codegen
    // ByteDot kernel, never an interpreted zip_with/aggregate lambda
    // (measured 10× slower inside the cross join)
    val qp = graft.vector.Quantize.quantizedPairsAbove(cat.embeddings, 0.4)
      .queryExecution.executedPlan.toString
    assert(qp.contains("graft_bytedot"), s"candidate stage must use ByteDot:\n$qp")
    assert(!qp.contains("zip_with"), s"no HOF lambda in the candidate cross join:\n$qp")
    // the banded machinery (forced) keeps the ByteDot kernel AND never
    // plans a cartesian: candidates meet inside (band, bucket) equi-join
    // buckets only
    val bqp = graft.vector.Quantize.bandedQuantizedPairsAbove(
        cat.embeddings, 0.4, nPlanes = 4, nBands = 80, forceBanded = true)
      .queryExecution.executedPlan.toString
    assert(bqp.contains("graft_bytedot"), s"banded int8 filter must use ByteDot:\n$bqp")
    assert(!bqp.contains("CartesianProduct") && !bqp.contains("BroadcastNestedLoopJoin"),
      s"banded quantized scan must not plan a cartesian:\n$bqp")
    // the ROUTER pin: 4x80 geometry has expected candidate mass 5x the
    // cartesian (nBands/2^nPlanes), so the default call must take the
    // exact quantized scan — the broadcast nested-loop form, still on
    // the ByteDot kernel — instead of shuffling 5 cartesians of ids
    val routed = graft.vector.Quantize.bandedQuantizedPairsAbove(
        cat.embeddings, 0.4, nPlanes = 4, nBands = 80)
      .queryExecution.executedPlan.toString
    assert(routed.contains("BroadcastNestedLoopJoin") && routed.contains("graft_bytedot"),
      s"non-pruning geometry must route to the exact quantized scan:\n$routed")
    val bpe = graft.text.TextAnalysis.tokenCountComparison(cat.documents)
      .queryExecution.executedPlan.toString
    assert(!bpe.contains("ScalaUDF"), s"BPE counting must be built-in regexp:\n$bpe")
    // one shuffle for the lang aggregation, partial agg below it
    assert(bpe.lastIndexOf("HashAggregate") > bpe.indexOf("Exchange"),
      s"BPE stats must combine map-side:\n$bpe")
  }

  test("bloom semi-join probe is the native codegen'd expression, applied before the join") {
    val plan = graft.ops.Scale.bloomSemiJoin(
        cat.orders, "o_custkey",
        cat.customer.filter(org.apache.spark.sql.functions.col("c_acctbal") > 9000),
        "c_custkey")
      .queryExecution.executedPlan.toString
    // the prefilter lives on the big-side SCAN — a Scala UDF there would
    // break WholeStageCodegen exactly where a 100 TB prefilter matters most
    assert(!plan.contains("ScalaUDF"), s"bloom probe must not be a Scala UDF:\n$plan")
    assert(plan.contains("might_contain"),
      s"probe must be the native BloomFilterMightContain expression:\n$plan")
    // the probe filter must sit below the semi join (scan-side), not above it
    val probeAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("LeftSemi")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe filter should be under the semi join in the plan tree:\n$plan")
  }

  test("media pipelines preserve partitioning — no shuffle in decode/resize/sample paths") {
    val docs = cat.documents.limit(50)
    Seq(
      graft.media.MediaPipeline.decodeAndFeaturize(
        graft.media.MediaPipeline.toMediaTable(docs)).toDF(),
      graft.media.MediaPipeline.decodeAndFeaturize(
        graft.media.MediaPipeline.resizedMedia(
          graft.media.MediaPipeline.toMediaTable(docs), 8, 8)).toDF(),
      graft.media.AudioPipeline.decodeAndFeaturize(
        graft.media.AudioPipeline.toAudioTable(docs)).toDF(),
      graft.media.ClipPipeline.sampleFrames(
        graft.media.ClipPipeline.toClipTable(docs), 2).toDF()).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // limit(50) itself plans one single-partition exchange upstream of
      // the codec stages; the decode/featurize chain must not add any
      assert(plan.split("Exchange").length - 1 <= 1,
        s"media decode chain must not shuffle:\n$plan")
    }
  }

  test("no contract plan contains an unpartitioned (global) window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    // W04/W05 are size-adaptive: at this (KB-scale) corpus the gate
    // deliberately picks the plain single-partition window — the gate
    // decision and the scale branch's SinglePartition-free plan are
    // pinned in ScalableWindowsSpec, so they are exempt HERE only when
    // the gate actually chose the small branch (checked, not assumed)
    val adaptive = Set("W04", "W05")
    assert(!graft.ops.ScalableWindows.needsScaleBranch(
      cat.customer.filter(org.apache.spark.sql.functions.col("c_nationkey") === 3)))
    assert(!graft.ops.ScalableWindows.needsScaleBranch(cat.part))
    val offenders = Contract.all.map(_.id).filterNot(adaptive).filter { id =>
      val lp = DfContract.all(id)(cat).queryExecution.optimizedPlan
      lp.exists {
        case w: LWindow => w.partitionSpec.isEmpty
        case w: WindowGroupLimit => w.partitionSpec.isEmpty
        case _ => false
      }
    }
    assert(offenders.isEmpty,
      s"single-partition window straggler in: $offenders — route through ScalableWindows")
  }

  test("single-partition exchanges appear only under global single-row aggregates") {
    // a global agg funnels ~numPartitions partial rows through one
    // reducer — metadata-sized and inherent to a 1-row answer. Anything
    // else funneling to one partition is a scale bug.
    // S01/A08/A10/L01: global aggregates; S02: a union of ten per-table
    // global counts; J04/J05: EXISTS/NOT-EXISTS reduced to a global
    // count; W04/W05: the size-adaptive gate picks the plain global
    // window below GlobalWindowScaleBytes (gate decision + scale-branch
    // SinglePartition-freedom pinned in ScalableWindowsSpec)
    val allowed = Set("S01", "S02", "A08", "A10", "L01", "J04", "J05", "W04", "W05")
    val offenders = Contract.all.map(_.id).filter { id =>
      DfContract.all(id)(cat).queryExecution.executedPlan.toString
        .contains("Exchange SinglePartition") && !allowed(id)
    }
    assert(offenders.isEmpty, s"unexpected Exchange SinglePartition in: $offenders")
  }

  test("aggregations run partial before the shuffle (map-side combine)") {
    Seq("A01", "J01", "L05").foreach { id =>
      val plan = DfContract.all(id)(cat).queryExecution.executedPlan.toString
      val firstAgg = plan.indexOf("HashAggregate")
      val firstExchange = plan.indexOf("Exchange")
      assert(firstAgg >= 0 && firstExchange >= 0, s"$id: expected agg + exchange")
      // toString prints top-down: a partial agg must also exist BELOW
      // (after) the exchange in the tree text
      assert(plan.lastIndexOf("HashAggregate") > firstExchange,
        s"$id: no aggregate below the shuffle (missing partial agg)")
    }
  }
}
