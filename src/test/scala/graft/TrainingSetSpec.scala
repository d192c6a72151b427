package graft

import org.apache.spark.sql.functions._

import graft.ops.Catalog
import graft.pipeline.{TrainingSet, TrainingSetConfig}

/** End-to-end training-set build: the pipeline operators must COMPOSE —
  * quality gate → exact dedup → near dedup → decontamination → mixture
  * → deterministic order — with per-stage row accounting, and the
  * chunk writer must materialize files whose NAME order replays the
  * training order.
  */
class TrainingSetSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf001)

  private val mixture = Map(
    "en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)

  test("build: monotone stage accounting, contamination removed, permutation order, layout-invariant") {
    // benchmark drawn FROM the corpus: any of its docs that survive to
    // stage 4 carry 100% shingle overlap and must drop there
    val bench = cat.documents.filter(col("doc_id") % 97 === 0)
    val cfg = TrainingSetConfig(mixture = Some(mixture))
    val r = TrainingSet.build(cat.documents, Some(bench), cfg)

    val counts = r.audit.map(_._2)
    assert(r.audit.head._1 == "0_input" && counts.head == cat.documents.count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"stage counts must be non-increasing: ${r.audit}")
    assert(counts.last > 0, "the pipeline must not empty the corpus")
    assert(r.audit.toMap.apply("6_ordered") == r.audit.toMap.apply("5_mixture"),
      "ordering must not change membership")

    val survivors = r.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(benchIds).isEmpty,
      "corpus copies of benchmark docs must be decontaminated")

    // shuffle_pos is a 1..n permutation over the survivors
    val pos = r.docs.select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(pos.sameElements(1L to pos.length.toLong),
      "training order must be a complete permutation")

    // pure function of (corpus, benchmark, config): layout never matters
    val r2 = TrainingSet.build(cat.documents.repartition(7), Some(bench), cfg)
    val a = r.docs.select("doc_id", "shuffle_pos").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = r2.docs.select("doc_id", "shuffle_pos").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b, "the build must be deterministic under partition layout")

    // optional stages off → pass-through accounting
    val plain = TrainingSet.build(cat.documents, None, TrainingSetConfig())
    val pm = plain.audit.toMap
    assert(pm("4_decontaminated") == pm("3_near_dedup"))
    assert(pm("5_mixture") == pm("4_decontaminated"))
  }

  test("build with 1b/2b/5b: model gate, span removal and importance sampling compose") {
    val s = spark
    import s.implicits._
    // planted fixture: math-prose target docs, spam docs the model must
    // gate out, and a pair sharing a verbatim 6-gram boilerplate span.
    // Vocabularies are wide enough (12 words over 40 draws) that the
    // RULE gate (top-word/dup-word fractions) passes everything — each
    // later stage's effect is then attributable to that stage alone.
    val clean = Array("theorem", "proof", "lemma", "axiom", "integral",
      "derivative", "matrix", "tensor", "manifold", "functor", "kernel", "basis")
    val spamV = Array("casino", "winner", "prize", "click", "free",
      "bonus", "jackpot", "deal", "offer", "discount", "buy", "now")
    def doc(id: Long, vocab: Array[String], extra: String = ""): (Long, String, String) = {
      val rnd = new scala.util.Random(id)
      val words = (0 until 40).map(_ => vocab(rnd.nextInt(vocab.length)))
      (id, (words.mkString(" ") + extra), "en")
    }
    val boiler = " subscribe to our newsletter for updates today"
    val target = (0L until 30L).map(doc(_, clean)).toDF("doc_id", "text", "lang")
    val corpus = (
      (100L until 130L).map(doc(_, clean)) ++          // target-like keepers
      (200L until 220L).map(doc(_, spamV)) ++          // spam: model gate
      Seq(doc(300L, clean, boiler), doc(301L, clean, boiler)) // shared span
    ).toDF("doc_id", "text", "lang")

    val model = graft.text.QualityClassifier.train(target, corpus.filter(col("doc_id") >= 200 && col("doc_id") < 220), dim = 64, iters = 40)
    val r = TrainingSet.build(
      corpus,
      benchmark = None,
      cfg = TrainingSetConfig(minWords = 5),
      qualityModel = Some((model, 0.5)),
      spanRemovalN = Some(6),
      importanceSample = Some((target, 25)))

    val a = r.audit.toMap
    assert(a.contains("1b_model_quality") && a.contains("2b_span_removal") &&
      a.contains("5b_importance_sample"), s"missing stage rows: ${r.audit}")
    // the rule gate is neutral on this fixture — attribution is clean
    assert(a("1_quality") == 52, s"rule gate should pass all: ${r.audit}")
    // model gate: all 20 spam docs (and only them) drop
    assert(a("1b_model_quality") == 32, s"spam must be gated: ${r.audit}")
    // importance sample: exactly 25 (k) survivors reach the ordering
    assert(a("5b_importance_sample") == 25 && a("6_ordered") == 25)
    // no spam doc reaches the final set
    val finalIds = r.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(finalIds.forall(id => id < 200L || id >= 220L), s"spam survived: $finalIds")
    // span removal: the boilerplate 6-gram is cut from surviving texts
    val texts = r.docs.select("doc_id", "text").collect()
      .map(rr => (rr.getLong(0), rr.getString(1))).toMap
    texts.filter { case (k, _) => k == 300L || k == 301L }.values.foreach { t =>
      assert(!t.contains("subscribe to our newsletter for updates today"),
        s"shared span must be removed: $t")
    }
    // the counts stay monotone through the optional stages too
    val counts = r.audit.map(_._2)
    assert(counts.zip(counts.tail).forall { case (x, y) => y <= x }, s"${r.audit}")
  }

  test("binnedChunks: bins are contiguous training-order slices within the token budget") {
    val r = TrainingSet.build(cat.documents.limit(150), None, TrainingSetConfig())
    val maxTokens = 64
    val binTokens = 500L
    val rows = TrainingSet.binnedChunks(r, maxTokens, stride = 64, binTokens)
      .collect()
      .map(x => (x.getAs[Long]("shuffle_pos"), x.getAs[Long]("chunk_idx"),
        x.getAs[Long]("n_tokens"), x.getAs[Long]("bin")))
      .sortBy(t => (t._1, t._2))
    // bins are non-decreasing in training order and start at 0,
    // with no gaps
    assert(rows.head._4 == 0L)
    assert(rows.map(_._4).zip(rows.map(_._4).tail).forall { case (a, b) =>
      b == a || b == a + 1
    }, "bin ids must be contiguous and non-decreasing in training order")
    // each bin's token total respects the start-assignment budget
    rows.groupBy(_._4).foreach { case (bin, rs) =>
      val tokens = rs.map(_._3).sum
      assert(tokens <= binTokens + maxTokens - 1,
        s"bin $bin holds $tokens tokens > budget")
    }
    // deterministic under layout
    val again = TrainingSet.binnedChunks(
      TrainingSet.build(cat.documents.limit(150).repartition(7), None, TrainingSetConfig()),
      maxTokens, 64, binTokens)
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_idx"), x.getAs[Long]("bin")))
      .toSet
    val base = TrainingSet.binnedChunks(r, maxTokens, 64, binTokens)
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_idx"), x.getAs[Long]("bin")))
      .toSet
    assert(again == base, "bin assignment must be layout-invariant")
  }

  test("lengthBucketedBatches: batch size and length-spread bounds, contiguous ids, layout-invariant") {
    val chunks = graft.text.TextAnalysis
      .chunkDocuments(cat.documents, maxTokens = 64, stride = 48)
      .select("doc_id", "chunk_idx", "n_tokens")
    val out = TrainingSet.lengthBucketedBatches(chunks, bucketWidth = 16, batchSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.length == chunks.count(), "every chunk gets a batch")
    val byBatch = out.groupBy(_._4)
    byBatch.foreach { case (b, rows) =>
      assert(rows.length <= 8, s"batch $b has ${rows.length} > 8 chunks")
      val lens = rows.map(_._3)
      assert(lens.max - lens.min < 16,
        s"batch $b spans ${lens.max - lens.min} >= bucketWidth tokens of padding")
    }
    // flat contiguous batch ids starting at 0
    val idsSorted = byBatch.keys.toSeq.sorted
    assert(idsSorted == (0L until idsSorted.length.toLong))
    // at most one under-filled batch per length bucket
    val under = byBatch.values.count(_.length < 8)
    val nBuckets = out.map(_._3 / 16).distinct.length
    assert(under <= nBuckets, s"$under underfilled batches for $nBuckets buckets")
    // deterministic under partition layout
    val again = TrainingSet.lengthBucketedBatches(
      chunks.repartition(7), bucketWidth = 16, batchSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(again == out.map(t => (t._1, t._2, t._4)).toSet)
    // the global row number must order by the composite (bucket-hex ++
    // coin) key, never the raw coarse bucket: boundary bucketing cannot
    // split equal first-key values, so a window keyed on __bucket (a
    // handful of distinct lengths) would degenerate to one partition
    // per length bucket — the straggler the two-pass shape exists to kill
    val plan = TrainingSet.lengthBucketedBatches(chunks, bucketWidth = 16, batchSize = 8)
      .queryExecution.executedPlan.toString
    val winSpec = plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString("\n")
    assert(winSpec.contains("__key"),
      s"row-number window must order by the composite __key:\n$winSpec")
    assert(!winSpec.contains("__bucket#"),
      s"row-number window must not touch the coarse __bucket key:\n$winSpec")
  }

  test("writeChunks: part-file name order replays the deterministic training order") {
    val r = TrainingSet.build(cat.documents.limit(120), None, TrainingSetConfig())
    val out = java.nio.file.Files.createTempDirectory("graft-trainset").toString
    TrainingSet.writeChunks(r, out, maxTokens = 64, stride = 64,
      targetFileBytes = 16L << 10)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    assert(parts.length >= 2, s"expected several part files, got ${parts.length}")
    // concatenating files in name order must yield ascending
    // (shuffle_pos, chunk_idx) — i.e. the training order
    val seq = parts.flatMap { p =>
      spark.read.parquet(p).select("shuffle_pos", "chunk_idx")
        .collect().map(x => (x.getLong(0), x.getLong(1)))
    }
    assert(seq.sameElements(seq.sorted), "file name order must equal training order")
    // chunk coverage: every surviving doc appears
    val docIds = spark.read.parquet(out).select("doc_id").distinct().count()
    assert(docIds == r.docs.count(), "every surviving doc must be chunked")
  }

  test("writeBinnedChunks: bin-partitioned layout round-trips, one bin per file, bounded fan-out") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val r = TrainingSet.build(cat.documents.limit(120), None, TrainingSetConfig())
    val out = java.nio.file.Files.createTempDirectory("graft-binned").toString
    val maxTokens = 64
    val binTokens = 500L
    val targetFileBytes = 16L << 10
    TrainingSet.writeBinnedChunks(r, out, maxTokens, stride = 64,
      binTokens = binTokens, targetFileBytes = targetFileBytes)
    // round-trip: the written rows ARE binnedChunks' output (bin rides
    // as the partition directory)
    def key(x: org.apache.spark.sql.Row) =
      (x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_idx"),
        x.getAs[Long]("n_tokens"), x.getAs[Long]("shuffle_pos"), x.getAs[Long]("bin"))
    val want = TrainingSet.binnedChunks(r, maxTokens, 64, binTokens)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("shuffle_pos"), col("bin")).collect().map(key).toSet
    val back = spark.read.parquet(out)
    val got = back
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("shuffle_pos"), col("bin").cast("long").as("bin")).collect().map(key).toSet
    assert(got == want, "written layout must round-trip binnedChunks exactly")
    // per-file batch invariant: every physical file belongs to exactly
    // one bin directory, and within a bin dir the file NAME order
    // replays the training order (a name-order reader needs no sort)
    val binDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bin="))
    assert(binDirs.length == want.map(_._5).toSet.size,
      s"one directory per bin expected, got ${binDirs.length}")
    var totalFiles = 0
    binDirs.foreach { d =>
      val parts = d.listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getPath).sorted
      totalFiles += parts.length
      val seq = parts.flatMap { p =>
        spark.read.parquet(p).select("shuffle_pos", "chunk_idx")
          .collect().map(x => (x.getLong(0), x.getLong(1)))
      }
      assert(seq.sameElements(seq.sorted),
        s"file name order inside ${d.getName} must equal training order")
    }
    // fan-out bound: ≤ nBins + nTasks files (each range-task boundary
    // splits at most one bin) — never the nBins × nTasks spray
    val nBins = want.map(_._5).toSet.size
    val est = TrainingSet.binnedChunks(r, maxTokens, 64, binTokens)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(col("chunk"))).cast("long"))
      .first().getLong(0) + want.size * 64L
    val nTasks = ((est + targetFileBytes - 1) / targetFileBytes).max(1L).toInt
    assert(totalFiles <= nBins + nTasks,
      s"fan-out $totalFiles files exceeds nBins=$nBins + nTasks=$nTasks")
  }

  test("splitLeakage: raw corpus leaks near-dup pairs across splits, deduped corpus is leak-free") {
    import org.apache.spark.sql.functions._
    val docs = cat.documents.select("doc_id", "text")
    val banded = graft.text.MinHashDedup.bandedSignatures(docs)
      .select(col("doc_id").as("id"), col("band"), col("band_hash").as("bucket"))
      .localCheckpoint(true)
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val raw = TrainingSet.splitLeakage(docs, banded, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    // fixture sanity: the corpus HAS near-dups, and a hash split sends
    // ~1 - (0.8² + 0.1² + 0.1²) = 34% of pair mass across boundaries
    assert(raw.nonEmpty, "raw corpus must show split leakage")
    assert(raw.forall(p => p._3 != p._4), "only cross-split pairs are leaks")
    // the documented fix — split AFTER dedup — yields zero leakage:
    // every verified pair's non-minimal member was removed, so no
    // verified pair survives among the winners
    val deduped = docs.join(
      graft.text.MinHashDedup.dedupWinners(docs), Seq("doc_id"), "left_semi")
    val clean = TrainingSet.splitLeakage(deduped, banded, weights).count()
    assert(clean == 0L, s"deduped corpus must be leak-free, found $clean pairs")
  }

  test("epochExpand: per-doc multiplicity is floor(epochs) plus the exact coin-selected residual") {
    val strata = "lang"
    val budget = 200000L
    val alpha = 0.5
    val rows = TrainingSet.epochExpand(cat.documents, strata, budget, alpha)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // driver-side reference: the plan's rounded epochs, split into
    // full repeats + the hexCutoff residual on the md5 coin
    val plan = TrainingSet.epochPlan(cat.documents, strata, budget, alpha)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    def coin(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$id:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    }
    val byDoc = rows.groupBy(r => (r._1, r._2))
    val docs = cat.documents.select("doc_id", strata).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(byDoc.keySet.subsetOf(docs.toSet), "expanded rows must come from corpus docs")
    docs.foreach { case (id, g) =>
      val e = plan(g)
      val full = math.floor(e).toLong
      val want = full + (if (coin(id) < graft.ops.Scale.hexCutoff(e - full)) 1L else 0L)
      val got = byDoc.get((id, g)).map(_.length.toLong).getOrElse(0L)
      assert(got == want, s"doc $id ($g, epochs=$e): $got reps, want $want")
      // epochs are exactly 0..k-1 for the doc's k repetitions
      byDoc.get((id, g)).foreach { rs =>
        assert(rs.map(_._3).sorted.toSeq == (0L until got).toSeq)
      }
    }
    // non-vacuous: at least one stratum repeats (full >= 1) and at
    // least one residual coin fired somewhere
    assert(rows.map(_._3).max >= 1, "budget too small — no stratum repeats")
  }

  test("leakFreeSplit: no verified pair crosses a split; the per-doc split provably would") {
    import org.apache.spark.sql.functions._
    val docs = cat.documents.select("doc_id", "text")
    val pairs = graft.text.MinHashDedup.verifiedPairs(docs).localCheckpoint(true)
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = TrainingSet.leakFreeSplit(docs, pairs, weights).localCheckpoint(true)
    // complete: one row per doc; unclustered docs group under their own id
    assert(split.count() == docs.count())
    // the leak-free property, checked pair by pair
    val m = split.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val ps = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    ps.foreach { case (i, j) =>
      assert(m(i)._2 == m(j)._2, s"pair ($i,$j) split ${m(i)._2} vs ${m(j)._2}")
      assert(m(i)._1 == m(j)._1, s"pair ($i,$j) must share a group id")
    }
    // non-vacuous: the naive per-doc md5 split DOES leak on this corpus
    val naive = graft.ops.Scale.md5Split(docs.select("doc_id"), "doc_id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ps.exists { case (i, j) => naive(i) != naive(j) },
      "fixture must show the per-doc split leaking (else the fix is untested)")
    // and group-keyed coins change nothing for singletons
    val clustered = ps.flatMap(p => Seq(p._1, p._2)).toSet
    m.foreach { case (id, (g, s)) =>
      if (!clustered(id)) assert(g == id && s == naive(id),
        s"singleton $id must split exactly like the per-doc split")
    }
  }

  test("packChunks: X18 contract at chunk granularity — offsets in range, packs contiguous and budget-bounded") {
    val r = TrainingSet.build(cat.documents.limit(120), None, TrainingSetConfig())
    val maxTokens = 64
    val packTokens = 192L
    val chunks = graft.text.TextAnalysis
      .chunkDocuments(r.docs.select("doc_id", "text"), maxTokens, stride = 64)
      .join(r.docs.select("doc_id", "shuffle_pos"), Seq("doc_id"))
    val packed = TrainingSet.packChunks(chunks, packTokens)
      .select("doc_id", "chunk_idx", "n_tokens", "shuffle_pos", "pack_id", "pack_off")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .sortBy(t => (t._4, t._2)) // training order
    assert(packed.nonEmpty)
    // pack ids: start at 0, contiguous, monotone non-decreasing in
    // training order (packs ARE training-order slices)
    val ids = packed.map(_._5)
    assert(ids.head == 0L && ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 },
      "pack ids must be contiguous and monotone in training order")
    // in-pack offsets: first chunk of the stream starts at 0; every
    // offset in [0, packTokens); consecutive chunks within a pack are
    // token-contiguous (off_next = off + n_tokens)
    assert(packed.head._6 == 0L)
    assert(packed.forall(t => t._6 >= 0 && t._6 < packTokens),
      "pack_off must lie in [0, packTokens)")
    packed.zip(packed.tail).foreach { case (a, b) =>
      if (a._5 == b._5)
        assert(b._6 == a._6 + a._3,
          s"within a pack chunks must be token-contiguous: $a -> $b")
    }
    // budget: a pack totals at most packTokens + maxChunk - 1 (only the
    // chunk STARTING inside the budget may overflow), and every pack
    // except possibly the last is filled past packTokens - maxChunk
    val totals = packed.groupBy(_._5).view.mapValues(_.map(_._3).sum).toMap
    assert(totals.values.forall(_ <= packTokens + maxTokens - 1),
      s"pack overflow bound violated: ${totals.filter(_._2 > packTokens + maxTokens - 1)}")
    val lastPack = totals.keys.max
    assert(totals.filter(_._1 != lastPack).values.forall(_ >= packTokens - maxTokens + 1),
      "non-final packs must be filled to within one chunk of the budget")
    // the writeChunks composition: packed write keeps name-order =
    // training order AND pack contiguity across part files
    val out = java.nio.file.Files.createTempDirectory("graft-packed").toString
    TrainingSet.writeChunks(r, out, maxTokens = 64, stride = 64,
      targetFileBytes = 16L << 10, packTokens = Some(packTokens))
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    val seq = parts.flatMap { p =>
      spark.read.parquet(p).select("shuffle_pos", "chunk_idx", "pack_id")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    }
    assert(seq.map(t => (t._1, t._2)).sameElements(seq.map(t => (t._1, t._2)).sorted),
      "packed write must keep file name order = training order")
    val packSeq = seq.map(_._3)
    assert(packSeq.zip(packSeq.tail).forall { case (a, b) => b == a || b == a + 1 },
      "packs must stay contiguous across the written stream")
  }

  test("packExactChunks + writeExactPacks: pieces conserve chunk tokens, non-final packs are exactly the budget, sink and manifest round-trip") {
    val r = TrainingSet.build(cat.documents.limit(120), None, TrainingSetConfig())
    val maxTokens = 64
    val packTokens = 192L
    val chunks = graft.text.TextAnalysis
      .chunkDocuments(r.docs.select("doc_id", "text"), maxTokens, stride = 64)
      .join(r.docs.select("doc_id", "shuffle_pos"), Seq("doc_id"))
    val chunkRows = chunks.select("doc_id", "chunk_idx", "n_tokens", "chunk")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getString(3)))
      .toMap
    val pieces = TrainingSet.packExactChunks(chunks, packTokens)
    val rows = pieces
      .select("doc_id", "chunk_idx", "piece_idx", "pack_id", "pack_off",
        "piece_tokens", "piece")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getString(6)))
    assert(rows.nonEmpty)

    // count conservation + text reconstruction: a chunk's pieces
    // partition its tokens exactly, in piece_idx order
    rows.groupBy(t => (t._1, t._2)).foreach { case (key, ps) =>
      val (nTokens, chunkText) = chunkRows(key)
      val sorted = ps.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == sorted.indices.map(_.toLong),
        s"$key: piece_idx must be dense from 0")
      assert(sorted.map(_._6).sum == nTokens,
        s"$key: piece tokens must sum to the chunk's n_tokens")
      assert(sorted.map(_._7).filter(_.nonEmpty).mkString(" ") == chunkText,
        s"$key: concatenated pieces must reproduce the chunk text")
    }
    // exact budget: every pack except the last totals exactly
    // packTokens; in-pack offsets tile [0, packTokens) contiguously
    val byPack = rows.groupBy(_._4)
    val lastPack = byPack.keys.max
    byPack.foreach { case (p, ps) =>
      val total = ps.map(_._6).sum
      if (p != lastPack)
        assert(total == packTokens, s"pack $p must be exactly $packTokens, got $total")
      else assert(total <= packTokens, s"final pack $p must not overflow: $total")
      val inOrder = ps.sortBy(_._5)
      assert(inOrder.head._5 == 0L, s"pack $p must start at offset 0")
      inOrder.zip(inOrder.tail).foreach { case (a, b) =>
        assert(b._5 == a._5 + a._6,
          s"pack $p pieces must be token-contiguous: $a -> $b")
      }
    }
    // pack ids contiguous from 0 (packs ARE training-order slices)
    val packIds = byPack.keys.toSeq.sorted
    assert(packIds == (0L to lastPack),
      "pack ids must be dense from 0")

    // the model-ready sink: pieces + manifest round-trip, manifest rows
    // agree with a recomputation over the written pieces, and every
    // non-final manifest row says exact
    val out = java.nio.file.Files.createTempDirectory("graft-exactpacks").toString
    TrainingSet.writeExactPacks(r, out, maxTokens = 64, stride = 64,
      packTokens = packTokens, targetFileBytes = 16L << 10)
    val back = spark.read.parquet(s"$out/pieces")
    val manifest = spark.read.parquet(s"$out/manifest")
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(6)))
      .toMap
    val recomputed = back.groupBy("pack_id")
      .agg(count(lit(1)).as("n_pieces"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("piece_tokens")).as("n_tokens"))
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(manifest.keySet == recomputed.keySet)
    manifest.foreach { case (p, (np, nd, nt, exact)) =>
      assert(recomputed(p) == ((np, nd, nt)),
        s"manifest row for pack $p must match the written pieces")
      assert(exact == (nt == packTokens), s"pack $p exact flag")
      if (p != manifest.keys.max)
        assert(exact, s"non-final pack $p must be exact in the written layout")
    }
    // file-name order replays the feed order (pack_id, pack_off)
    val parts = new java.io.File(s"$out/pieces").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    val seq = parts.flatMap { p =>
      spark.read.parquet(p).select("pack_id", "pack_off")
        .collect().map(x => (x.getLong(0), x.getLong(1)))
    }
    assert(seq.sameElements(seq.sorted),
      "pieces must be written in feed order: part-file name order = (pack_id, pack_off)")
  }

  test("curriculumOrder: rank equals the naive (mean_logp DESC, doc_id) order; NTILE cut is exact") {
    val s = spark
    import s.implicits._
    // doc i carries i rare singleton tokens diluting the common-word
    // mass — fluency (mean unigram logp) strictly DESCENDS with i, so
    // the curriculum must emit doc 0 first and doc 9 last
    val docs = (0L until 10L).map { i =>
      val rare = (0 until i.toInt).map(k => s"rare_${i}_$k")
      (i, (Seq.fill(20)("the") ++ rare).mkString(" "))
    }.toDF("doc_id", "text")
    val got = TrainingSet.curriculumOrder(docs, nStages = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // naive reference: the scorer's own output, sorted driver-side
    val ref = graft.text.TextAnalysis.unigramLogProb(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, lp) => (-lp, id) }
    assert(got.map(_._1).sameElements(ref.map(_._1)),
      s"order ${got.map(_._1).toSeq} vs ${ref.map(_._1).toSeq}")
    assert(got.map(_._1).toSeq == (0L until 10L).toSeq,
      s"fluency must descend with doc id: ${got.map(_._1).toSeq}")
    assert(got.map(_._3).toSeq == (1L to 10L).toSeq, "ord must be 1..N in output order")
    // N=10, k=4: the first N mod k = 2 stages take ceil(10/4)=3 rows
    assert(got.map(_._4).toSeq == Seq(1L, 1, 1, 2, 2, 2, 3, 3, 4, 4),
      s"NTILE cut: ${got.map(_._4).toSeq}")
  }
}
