package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * construction step of a training-data pipeline, Spark-first.
  *
  * Scale shape (the whole point of doing this distributed):
  *
  *  - the CORPUS is scanned exactly once, to build the (word, freq)
  *    vocabulary — every subsequent step runs over the vocab table,
  *    which is Heaps-law sized (≪ corpus) and carries each distinct
  *    word once with its frequency;
  *  - each merge step is one vocab-sized aggregation (pair counts,
  *    weighted by word freq) + a metadata-sized argmax collect (ONE
  *    row) + one vocab-sized map applying the merge;
  *  - the vocab is `localCheckpoint`ed per step, so lineage stays flat
  *    across iterations instead of doubling (the classic iterative-
  *    algorithm trap on Spark);
  *  - a production trainer bounds `numMerges` (vocab size budget) and
  *    usually samples the corpus first — compose with
  *    [[graft.ops.Scale.hashSplit]] / stratified sampling for that.
  *
  * Determinism: ties on pair count break lexicographically on
  * (left, right), so the learned merge table is a pure function of the
  * corpus — reruns and engine ports reproduce it exactly.
  *
  * Convention notes (self-consistent, pinned by BpeSpec's driver-side
  * reference implementation): words are whitespace tokens; initial
  * symbols are single characters (no end-of-word marker); pair counts
  * include overlapping occurrences ("aaa" counts (a,a) twice); a merge
  * replaces occurrences left-to-right greedily ("aaa" → [aa, a]).
  */
object Bpe {

  /** Learn `numMerges` BPE merges from `documents(textCol)`.
    *
    * Returns one row per merge: (step, left, right, pair_count),
    * ordered by step — step 1 is the first (highest-count) merge.
    * Stops early when no pair reaches `minPairCount`.
    *
    * Hybrid execution: the trainer's working set is the VOCAB, not the
    * corpus, and the vocab is Heaps-law sized — on most corpora it fits
    * in driver memory even when the corpus is 100 TB. When it does
    * (≤ `driverVocabLimit` rows, probed with ONE bounded
    * limit-pushdown collect), the merge loop runs as a driver-side
    * incremental fold with pair counts maintained under an inverted
    * pair→words index — IDENTICAL semantics (same overlap counting,
    * same left-to-right greedy apply, same codepoint-lexicographic
    * tie-break = Spark's UTF8-binary `asc`), ~2 Spark jobs total
    * instead of two PER MERGE (a real 32k-merge tokenizer train was
    * 64k sequential jobs — pure scheduler latency, since each job is
    * vocab-sized anyway; BpeSpec pins path equality and the job-count
    * win mechanically). A vocab over the limit falls back to the
    * distributed per-merge loop unchanged; pass `driverVocabLimit = 0`
    * to force it.
    */
  def learnMerges(
      documents: DataFrame,
      numMerges: Int,
      minPairCount: Long = 2L,
      textCol: String = "text",
      driverVocabLimit: Int = 1 << 18): DataFrame = {
    require(numMerges >= 1, s"numMerges=$numMerges")
    require(minPairCount >= 1, s"minPairCount=$minPairCount")
    val spark = documents.sparkSession
    import spark.implicits._
    val vocabDf = wordVocab(documents, textCol)
      .select(charSyms(col("w")).as("syms"), col("freq"))
    if (driverVocabLimit > 0) {
      // bounded probe: limit pushdown caps the collect at limit+1 rows
      // no matter the vocab size — if everything arrived, the vocab
      // fits and the rows ARE the working set
      val probe = vocabDf.limit(driverVocabLimit + 1).collect()
      if (probe.length <= driverVocabLimit) {
        val rows = probe.map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
        return driverMerges(rows, numMerges, minPairCount)
          .toDF("step", "left", "right", "pair_count")
      }
    }
    var vocab = vocabDf.localCheckpoint(true)
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    // Batched distributed loop (VERDICT r13 item 5): each scan collects
    // the top candidate WINDOW and applies every merge that is provably
    // the sequential argmax at its turn — see [[acceptBatch]] for the
    // exactness argument. A chain-heavy corpus (each merge's token
    // feeding the next top pair) degenerates to one merge per scan —
    // same job count as the old per-merge loop (the collision-check job
    // is skipped for singleton batches); a corpus with independent
    // high-count pairs (any real multilingual vocab) folds whole
    // windows per scan. BpeSpec pins batched ≡ driver-reference on
    // chain-heavy + supplementary-plane fixtures and the corpus, and
    // pins the job-count win mechanically.
    while (step <= numMerges && !done) {
      val window = vocab
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(BatchWindow + 1)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (window.isEmpty || window.head._3 < minPairCount) done = true
      else {
        val batch = acceptBatch(vocab, window, minPairCount,
          maxAccept = numMerges - step + 1)
        batch.foreach { case (a, b, cnt) =>
          merges += ((step, a, b, cnt)); step += 1
        }
        val prev = vocab
        vocab = vocab
          .select(mergeFoldAll(col("syms"), batch.map(m => (m._1, m._2)))
            .as("syms"), col("freq"))
          .localCheckpoint(true)
        prev.unpersist()
      }
    }
    vocab.unpersist()
    merges.toSeq.toDF("step", "left", "right", "pair_count")
  }

  /** Candidate window per batched scan. Also the per-scan batch-size
    * cap: the combined fold carries one when-branch per accepted merge,
    * so the cap bounds expression size.
    */
  private val BatchWindow = 64

  /** The longest prefix of the sorted candidate `window` that provably
    * equals the next |prefix| steps of SEQUENTIAL BPE, so applying it
    * in one vocab pass changes no hash. A pair is tentatively accepted
    * in (cnt desc, left asc, right asc) order while
    *
    *   1. its symbols are disjoint from every accepted pair's symbols
    *      (its count is then invariant under the accepted merges —
    *      occurrences can neither be consumed nor created);
    *   2. its merged token a+b is NOT an existing vocab symbol and not
    *      another accepted pair's merged token (a fresh token cannot
    *      conflate with pairs counted in this scan);
    *
    * and the scan STOPS at the first rejection (prefix rule: a skipped
    * pair's sequential count after earlier merges is unknowable without
    * a rescan). The prefix is then truncated to counts STRICTLY above
    * the stop bound — the first rejected pair's count, or the first
    * unseen pair's count when the window was full. Why that makes the
    * batch exact: every pair CONFLICTING with the accepted set ranks at
    * or below the stop point (the scan would have stopped there), so
    * its count is ≤ the bound; and every pair the accepted merges can
    * CREATE (x, a+b)/(a+b, y) is count-bounded by an old conflicting
    * pair ((x, a)/(b, y) share a symbol) — so after any accepted
    * prefix, nothing can reach, let alone outrank, the next accepted
    * pair's strictly-greater count. The empty-truncation case falls
    * back to the plain argmax — a single sequential step is exact by
    * definition. Cost: one distributed semi-join (the fresh-token
    * check) per MULTI-merge batch; singleton batches skip it.
    */
  private def acceptBatch(
      vocab: DataFrame,
      window: Array[(String, String, Long)],
      minPairCount: Long,
      maxAccept: Int): Seq[(String, String, Long)] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val windowFull = window.length >= BatchWindow + 1
    val candidates = if (windowFull) window.dropRight(1) else window

    // one driver-side acceptance scan under a given fresh-token oracle
    def scan(existing: String => Boolean): Seq[(String, String, Long)] = {
      val accepted = ArrayBuffer.empty[(String, String, Long)]
      val used = scala.collection.mutable.Set.empty[String]
      val newTs = scala.collection.mutable.Set.empty[String]
      var stopCnt = if (windowFull) window.last._3 else -1L
      var idx = 0
      var stopped = false
      while (!stopped && idx < candidates.length && accepted.size < maxAccept) {
        val (a, b, cnt) = candidates(idx)
        val t = a + b
        if (cnt < minPairCount) stopped = true
        else if (used(a) || used(b) || existing(t) || newTs(t)) {
          stopCnt = math.max(stopCnt, cnt)
          stopped = true
        } else {
          accepted += ((a, b, cnt)); used += a; used += b; newTs += t
          idx += 1
        }
      }
      // window cut by maxAccept/BatchWindow with pairs left over: the
      // next unprocessed pair bounds everything below it
      if (!stopped && idx < candidates.length)
        stopCnt = math.max(stopCnt, candidates(idx)._3)
      val safe =
        if (stopCnt >= 0) accepted.takeWhile(_._3 > stopCnt) else accepted
      if (safe.nonEmpty) safe.toSeq
      else Seq(window.head) // plain sequential argmax step — always exact
    }

    // tentative pass with an empty oracle first: a batch that comes out
    // a SINGLETON is exact without any check (a single argmax step is
    // sequential BPE whatever its token collides with), so the
    // chain-heavy regime pays the same 2 jobs per merge as the old
    // per-merge loop. Only a multi-merge tentative batch buys the
    // fresh-token job: which candidate merged strings are already
    // vocab symbols (including symbols occurring only as single-symbol
    // words — conflation with those would boost pairs the scan already
    // counted). The real oracle can only stop the scan EARLIER, so
    // re-scanning with it is the exact algorithm, not an approximation.
    val tentative = scan(_ => false)
    if (tentative.lengthCompare(1) <= 0) tentative
    else {
      val candTs = candidates.map(p => p._1 + p._2).distinct.toSeq
      val existing: Set[String] = vocab.select(explode(col("syms")).as("s"))
        .join(candTs.toDF("s"), Seq("s"), "left_semi")
        .distinct().collect().map(_.getString(0)).toSet
      scan(existing)
    }
  }

  /** Codepoint-lexicographic string comparison — identical to Spark's
    * UTF8-binary `asc` ordering (UTF-8 byte order IS codepoint order;
    * Java String.compareTo orders by UTF-16 code unit, which disagrees
    * for supplementary-plane characters vs U+E000–U+FFFF).
    */
  private def cpCompare(s: String, t: String): Int = {
    var i = 0
    var j = 0
    while (i < s.length && j < t.length) {
      val cs = s.codePointAt(i)
      val ct = t.codePointAt(j)
      if (cs != ct) return Integer.compare(cs, ct)
      i += Character.charCount(cs)
      j += Character.charCount(ct)
    }
    Integer.compare(s.length - i, t.length - j)
  }

  /** Left-to-right greedy merge of (a, b) in one symbol array — the
    * driver-side twin of [[mergeFold]] (the freshly merged token never
    * participates in another merge within the same step). Returns the
    * input array unchanged (same reference) when the pair is absent.
    */
  private def greedyMergeWord(
      syms: Array[String], a: String, b: String): Array[String] = {
    var has = false
    var i = 0
    while (!has && i < syms.length - 1) {
      if (syms(i) == a && syms(i + 1) == b) has = true
      i += 1
    }
    if (!has) syms
    else {
      val out = Array.newBuilder[String]
      var last: String = null
      syms.foreach { s =>
        if (last == a && s == b) last = a + b
        else { if (last != null) out += last; last = s }
      }
      if (last != null) out += last
      out.result()
    }
  }

  /** The driver-side merge loop over a collected (syms, freq) vocab —
    * pair counts maintained INCREMENTALLY under an inverted pair→words
    * index, so each merge touches only the words that contain its pair
    * instead of rescanning the vocab (the standard fast-BPE-trainer
    * shape). Semantics are bit-identical to the distributed loop: the
    * argmax comparison is the strict total order (count desc, left
    * asc, right asc) under [[cpCompare]], so hash-pinned merge tables
    * (X57) are unchanged by the path switch — BpeSpec pins both paths
    * equal on the pinned corpus and on a supplementary-plane fixture.
    */
  private def driverMerges(
      vocab: Array[(Array[String], Long)],
      numMerges: Int,
      minPairCount: Long): Seq[(Int, String, String, Long)] = {
    val words = vocab.map(_._1)
    val freqs = vocab.map(_._2)
    val counts = new java.util.HashMap[(String, String), Long]()
    val index = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    def bump(p: (String, String), f: Long): Unit = {
      val n = counts.merge(p, f, (x, y) => x + y)
      if (n == 0L) counts.remove(p)
    }
    def enroll(wi: Int): Unit = {
      val ws = words(wi)
      var k = 0
      while (k < ws.length - 1) {
        val p = (ws(k), ws(k + 1))
        bump(p, freqs(wi))
        index.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
          .add(wi)
        k += 1
      }
    }
    words.indices.foreach(enroll)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // strict total order ⇒ map iteration order is irrelevant
      var bestP: (String, String) = null
      var bestC = 0L
      counts.forEach { (p, c) =>
        if (bestP == null || c > bestC ||
          (c == bestC && {
            val ca = cpCompare(p._1, bestP._1)
            ca < 0 || (ca == 0 && cpCompare(p._2, bestP._2) < 0)
          })) { bestP = p; bestC = c }
      }
      if (bestP == null || bestC < minPairCount) done = true
      else {
        val (a, b) = bestP
        out += ((step, a, b, bestC))
        val members = index.getOrDefault(bestP, new java.util.HashSet[Integer]())
          .toArray(Array.empty[Integer])
        members.foreach { wiBox =>
          val wi = wiBox.intValue()
          val oldSyms = words(wi)
          val newSyms = greedyMergeWord(oldSyms, a, b)
          if (!(newSyms eq oldSyms)) {
            // exact recount of this word's contribution: retract every
            // old adjacent pair, enroll every new one
            var k = 0
            while (k < oldSyms.length - 1) {
              val p = (oldSyms(k), oldSyms(k + 1))
              bump(p, -freqs(wi))
              val s = index.get(p)
              if (s != null) { s.remove(wiBox); if (s.isEmpty) index.remove(p) }
              k += 1
            }
            words(wi) = newSyms
            enroll(wi)
          }
        }
        step += 1
      }
    }
    out.result()
  }

  /** Corpus token statistics under a learned merge table: encode the
    * VOCAB once (numMerges folds over the Heaps-law-sized word table,
    * never the corpus), then join words back to the corpus — the corpus
    * is scanned once and each distinct word pays the merge replay once,
    * not once per occurrence.
    *
    * Output (one row): corpus words, corpus BPE tokens, tokens/word,
    * and the character compression ratio chars/token.
    */
  def encodeStats(
      documents: DataFrame,
      merges: DataFrame,
      textCol: String = "text"): DataFrame = {
    // merges are metadata-sized BY CONSTRUCTION (numMerges rows)
    val ms = merges.select("step", "left", "right")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val encoded = encodeVocab(wordVocab(documents, textCol), ms.map(m => (m._2, m._3)))
    encoded
      .select(
        col("freq"),
        (size(col("syms")) * col("freq")).as("toks"),
        (length(col("w")) * col("freq")).as("chars"))
      .agg(
        sum(col("freq")).cast("long").as("n_words"),
        sum(col("toks")).cast("long").as("n_tokens"),
        round(sum(col("toks")) / sum(col("freq")), 6).as("tokens_per_word"),
        round(sum(col("chars")) / sum(col("toks")), 6).as("chars_per_token"))
  }

  /** Encode every document under a learned merge table in ONE corpus
    * pass — the shape a production tokenizer runs at 100 TB: per word,
    * rank-greedy BPE application (repeatedly merge the present pair
    * with the lowest learned rank), memoized per partition so each
    * distinct word in a partition pays the replay once (Zipf: the memo
    * hit rate is the corpus repetition rate). No K-fold replay over
    * the corpus, no join back through the vocab.
    *
    * Rank-greedy application equals the sequential merge replay for
    * SELF-CONSISTENT learned tables (a learned pair's operand tokens
    * always predate it, so a later merge can never create an earlier
    * pair) — BpeSpec pins the equivalence on the learned table.
    *
    * Output: (doc_id, pos, token) — one row per token OCCURRENCE with
    * its position in the document, the substrate for token frequency /
    * vocab coverage / sequence-reconstruction queries.
    */
  def encodeDocuments(
      documents: DataFrame,
      merges: DataFrame,
      textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // metadata-sized by construction (numMerges rows)
    val ranks: Map[(String, String), Int] = merges.select("step", "left", "right")
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    documents
      .select(col("doc_id"), col(textCol).as("text"))
      // null rows (e.g. the quarantined lines of an audited ingest)
      // carry no tokens — dropped, matching the vocab path where
      // explode(split(NULL)) drops them
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        it.flatMap { case (id, text) =>
          var pos = -1L
          text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
            var toks = memo.get(w)
            if (toks == null) {
              toks = encodeWord(w, ranks)
              if (memo.size < (1 << 16)) memo.put(w, toks)
            }
            toks.iterator.map { t => pos += 1; (id, pos, t) }
          }
        }
      }
      .toDF("doc_id", "pos", "token")
  }

  /** Tokenizer fertility by language — the multilingual tokenizer
    * health metric (tokens per word / chars per token per language):
    * a language whose fertility is far above the corpus mean pays
    * proportionally more sequence length for the same text, which
    * skews both the compute bill and the effective mixture — the
    * standard table consulted before fixing a vocab or a temperature
    * schedule. `encoded` is [[encodeDocuments]]' (doc_id, pos, token)
    * output (in production the PERSISTED encoded-corpus parquet — the
    * encode runs once, this audit is a cheap relational downstream).
    *
    * Word/char denominators come from the raw corpus with the same
    * whitespace tokenization the encoder used, so the ratio is
    * internally consistent. Docs the encoder dropped (null/empty
    * text → zero tokens) drop out of BOTH sides via the inner join.
    *
    * Scale shape: one count-per-doc aggregate over the encoded table
    * (shuffle on doc_id), a map-side word count on the corpus, an
    * equi-join on doc_id, and a languages-sized final aggregate.
    */
  def fertilityByLang(encoded: DataFrame, documents: DataFrame): DataFrame = {
    val toks = encoded.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val words = documents.select(
      col("doc_id"), col("lang"), col("n_chars"),
      size(filter(split(col("text"), "\\s+"), w => w =!= "")).cast("long").as("n_words"))
    words.join(toks, Seq("doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tokens").cast("bigint").as("total_tokens"),
        sum("n_words").cast("bigint").as("total_words"),
        sum("n_chars").cast("bigint").as("total_chars"))
      .withColumn("tokens_per_word",
        round(col("total_tokens").cast("double") / col("total_words"), 6))
      .withColumn("chars_per_token",
        round(col("total_chars").cast("double") / col("total_tokens"), 6))
      .orderBy("lang")
  }

  /** Rank-greedy BPE application to one word: repeatedly find the
    * adjacent pair with the lowest learned rank and merge ALL its
    * occurrences left-to-right, until no learned pair remains.
    *
    * Symbols are CODEPOINTS, matching the trainer's Spark-side
    * `split(w, "")` (UTF8/codepoint-aware) — Java's `String.split("")`
    * would shatter surrogate pairs into lone halves and desynchronize
    * the encoder from the learned table on non-BMP text.
    */
  private def encodeWord(w: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = w.codePoints.toArray.map(cp => new String(Character.toChars(cp)))
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val (a, b) = (syms(bi), syms(bi + 1))
        val out = Array.newBuilder[String]
        var last: String = null
        syms.foreach { s =>
          if (last == a && s == b) last = a + b
          else { if (last != null) out += last; last = s }
        }
        if (last != null) out += last
        syms = out.result()
      }
    }
    syms
  }

  /** (w, freq) for every whitespace word of the corpus — the single
    * corpus-wide scan everything else iterates on top of.
    */
  private def wordVocab(documents: DataFrame, textCol: String): DataFrame =
    documents
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** Replay `merges` (in learned order) over the vocab's symbol arrays.
    * Each merge is one vocab-sized map; lineage is checkpointed every
    * few steps so the plan stays bounded at any merge count.
    */
  private def encodeVocab(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var v = vocab.select(col("w"), col("freq"), charSyms(col("w")).as("syms"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      v = v.withColumn("syms", mergeFold(col("syms"), a, b))
      if ((i + 1) % 8 == 0) v = v.localCheckpoint(true)
    }
    v
  }

  /** Single-character symbol array of a word. `split(w, "")` runs with
    * Java's limit -1, which KEEPS the trailing empty match — filtered
    * here so a 3-char word is exactly 3 symbols.
    */
  private def charSyms(w: Column): Column =
    filter(split(w, ""), _ =!= lit(""))

  /** All adjacent symbol pairs of `syms` as struct(a, b) — overlapping
    * occurrences included (zip of the array with its own tail).
    */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (x, y) => struct(x.as("a"), y.as("b")))

  /** Left-to-right greedy merge of adjacent (a, b) into the single
    * symbol a+b — the standard BPE replacement, as one codegen-friendly
    * fold: append each symbol unless the accumulator ends with `a` and
    * the symbol is `b`, in which case the tail is replaced by the
    * merged token (so "aaa" merging (a,a) yields [aa, a], and the
    * freshly merged token never participates in another merge within
    * the same step).
    */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(
            slice(acc, lit(1), size(acc) - 1),
            array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** [[mergeFold]] for a whole ACCEPTED BATCH in one pass — sound only
    * under [[acceptBatch]]'s invariants: pairwise symbol-disjoint pairs
    * (at most one rule can fire at any position) whose merged tokens
    * are fresh (a written token can never re-fire a rule), so one fold
    * applying whichever rule matches equals applying the merges one
    * after another over the whole vocab.
    */
  private def mergeFoldAll(syms: Column, pairs: Seq[(String, String)]): Column = {
    require(pairs.nonEmpty, "mergeFoldAll needs at least one merge")
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) => {
        val last = element_at(acc, -1)
        val merged = pairs.tail.foldLeft(
          when(last === lit(pairs.head._1) && x === lit(pairs.head._2),
            lit(pairs.head._1 + pairs.head._2))) { case (w, (a, b)) =>
          w.when(last === lit(a) && x === lit(b), lit(a + b))
        }
        when(size(acc) > 0 && merged.isNotNull,
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x)))
      })
  }
}
