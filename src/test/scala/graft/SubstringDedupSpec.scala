package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Catalog
import graft.text.{SubstringDedup, TextAnalysis}

/** Pins for exact substring-level dedup (X118/X119): planted-fixture
  * exactness (canonical exemption, self-repetition, overlap merging),
  * the hashed scale path ≡ the string-keyed oracle twin on the real
  * corpus, and corpus-wide token-accounting invariants.
  */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  lazy val cat: Catalog = Catalog(spark, sf01)

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def spansOf(df: DataFrame, l: Int): Set[(Long, Long, Long, Long)] =
    SubstringDedup.duplicatedSpans(df, l).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("planted cross-doc passage: canonical first occurrence exempt, later one becomes a maximal span") {
    val passage = "p1 p2 p3 p4 p5 p6 p7"
    val fixture = docs(
      1L -> s"u1 u2 $passage u3",       // canonical (min doc_id, pos): untouched
      2L -> s"v1 $passage v2 v3",       // passage at tokens 2..8
      3L -> "a1 a2 a3 a4 a5 a6 a7 a8")  // unique: no spans
    // overlap merging is implicit: the 7-token passage is covered by
    // three stride-1 5-token windows (pos 2,3,4 in doc 2) merging to one span
    assert(spansOf(fixture, 5) === Set((2L, 2L, 8L, 7L)))

    val clean = SubstringDedup.cleanCorpus(fixture, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(clean(1L) === ((10L, 0L, s"u1 u2 $passage u3")))
    assert(clean(2L) === ((10L, 7L, "v1 v2 v3")))
    assert(clean(3L) === ((8L, 0L, "a1 a2 a3 a4 a5 a6 a7 a8")))
  }

  test("self-repetition within one doc: second copy removed, doc fully dup comes out empty") {
    val fixture = docs(
      1L -> "m1 m2 m3 m4 m5 m1 m2 m3 m4 m5", // repeat adjacent: only pos-6 window re-occurs
      2L -> "m1 m2 m3 m4 m5")                // exactly the canonical passage again
    assert(spansOf(fixture, 5) === Set((1L, 6L, 10L, 5L), (2L, 1L, 5L, 5L)))
    val clean = SubstringDedup.cleanCorpus(fixture, 5).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(clean(1L) === "m1 m2 m3 m4 m5")
    assert(clean(2L) === "") // entirely a non-canonical duplicate
  }

  test("distinct adjacent duplicated runs merge into one span; docs shorter than minTokens emit nothing") {
    val fixture = docs(
      1L -> "r1 r2 r3 r4 r5",                // canonical for R
      2L -> "s1 s2 s3 s4 s5",                // canonical for S
      3L -> "r1 r2 r3 r4 r5 s1 s2 s3 s4 s5", // R then S: adjacent coverage → ONE span
      4L -> "r1 r2 r3")                      // < minTokens: no windows at all
    assert(spansOf(fixture, 5) === Set((3L, 1L, 10L, 10L)))
  }

  test("hashed scale path is row-identical to the string-keyed oracle twin on the corpus") {
    val l = 10
    val str = SubstringDedup.duplicatedSpans(cat.documents, l)
      .orderBy("doc_id", "span_start").collect().toSeq
    val hash = SubstringDedup.duplicatedSpans(cat.documents, l, hashKeys = true)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(str.nonEmpty, "corpus fixture should contain duplicated spans at sf0.01")
    assert(str === hash)
    val strClean = SubstringDedup.cleanCorpus(cat.documents, l)
      .orderBy("doc_id").collect().toSeq
    val hashClean = SubstringDedup.cleanCorpus(cat.documents, l, hashKeys = true)
      .orderBy("doc_id").collect().toSeq
    assert(strClean === hashClean)
  }

  test("corpus-wide token accounting: n_tokens - dup_tokens = tokens(clean_text), every doc present") {
    val clean = SubstringDedup.cleanCorpus(cat.documents, 10)
    assert(clean.count() === cat.documents.count())
    val broken = clean
      .withColumn("recount", size(TextAnalysis.tokens(col("clean_text"))).cast("long"))
      .where(col("n_tokens") - col("dup_tokens") =!= col("recount"))
    assert(broken.isEmpty, s"token accounting broken: ${broken.collect().mkString(", ")}")
  }

  test("spans are maximal and disjoint: within a doc, gap >= 1 between consecutive spans") {
    val rows = SubstringDedup.duplicatedSpans(cat.documents, 10)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach {
      case Array((d1, _, e1), (d2, s2, _)) if d1 == d2 =>
        assert(s2 > e1 + 1, s"doc $d1 spans [$e1] and [$s2] should have merged")
      case _ =>
    }
    rows.foreach { case (d, s, e) =>
      assert(s >= 1 && e >= s, s"degenerate span ($d, $s, $e)")
    }
  }

  test("incremental against windowKeys equals batch over the union, restricted to the new ids") {
    val corpus = cat.documents.filter(col("doc_id") < 300)
    val fresh = cat.documents.filter(col("doc_id") >= 300)
    val keys = SubstringDedup.windowKeys(corpus, 10)
    val incSpans = SubstringDedup.incrementalDuplicatedSpans(fresh, keys, 10)
      .orderBy("doc_id", "span_start").collect().toSeq
    val batchSpans = SubstringDedup.duplicatedSpans(cat.documents, 10, hashKeys = true)
      .filter(col("doc_id") >= 300)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(batchSpans.nonEmpty, "fixture should produce spans among the new ids")
    assert(incSpans === batchSpans)
    val incClean = SubstringDedup.incrementalCleanCorpus(fresh, keys, 10)
      .orderBy("doc_id").collect().toSeq
    val batchClean = SubstringDedup.cleanCorpus(cat.documents, 10, hashKeys = true)
      .filter(col("doc_id") >= 300).orderBy("doc_id").collect().toSeq
    assert(incClean === batchClean)
  }

  test("one filtering pass yields a span-clean sub-corpus: dup-free docs stay dup-free among themselves") {
    // the lemma the streaming-v2 equivalence's seed construction leans
    // on: docs with dup_tokens == 0 from a FULL-corpus clean form a
    // sub-corpus on which cleanCorpus is identity — a kept doc had zero
    // duplicated windows in the full context, and dropping other docs
    // only removes window occurrences, so no new duplication can
    // appear. Checked on the real corpus (which has genuine duplicated
    // spans — require that, so the filter actually bites) and on an
    // adversarial chain fixture where every doc shares a window with
    // the next one.
    def lemma(corpus: DataFrame, l: Int): Unit = {
      val keep = SubstringDedup.cleanCorpus(corpus, l)
        .filter(col("dup_tokens") === 0).select("doc_id")
      val sub = corpus.join(keep, Seq("doc_id"), "left_semi")
      val again = SubstringDedup.cleanCorpus(sub, l)
      assert(again.filter(col("dup_tokens") =!= 0).isEmpty,
        "the filtered sub-corpus must be span-clean in one pass")
      assert(again.count() == sub.count())
    }
    val c = cat.documents.select("doc_id", "text")
    val dupDocs = SubstringDedup.cleanCorpus(c, 10)
      .filter(col("dup_tokens") > 0).count()
    assert(dupDocs > 0, "fixture must exhibit duplication for the lemma to bite")
    lemma(c, 10)
    // adversarial chain: doc i shares a window with doc i+1 — only
    // part of the chain survives the filter, and the survivors must
    // still be mutually clean
    val chain = docs((1L to 6L).map { i =>
      val shared = (1 to 5).map(t => s"s${i}_$t").mkString(" ")
      val prev = (1 to 5).map(t => s"s${i - 1}_$t").mkString(" ")
      i -> (if (i == 1L) s"$shared u$i a b c" else s"$prev mid$i $shared")
    }: _*)
    lemma(chain, 5)
  }

  test("charTokens: spaceless duplicated char runs are cut exactly; word path blind; wordy docs byte-identical") {
    // deterministic spaceless texts (CJK block, no spaces, effectively
    // collision-free 10-grams)
    def cjk(seed: Int, n: Int): String = {
      val rng = new scala.util.Random(seed)
      (1 to n).map(_ => (0x4e00 + rng.nextInt(2000)).toChar).mkString
    }
    val a = cjk(3, 200)
    val shared = a.substring(60, 100) // 40-char run, positions 61..100 of doc 1
    val fillL = cjk(91, 20)
    val fillR = cjk(92, 20)
    val wordy1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val wordy2 = wordy1 + " tail extra"
    val corpus = docs(
      1L -> a, 2L -> (fillL + shared + fillR), 3L -> cjk(77, 150),
      10L -> wordy1, 11L -> wordy2)
    val viaChar = SubstringDedup.cleanCorpus(corpus, 10, charTokens = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 2: exactly the 40 shared chars cut (canonical copy lives in
    // doc 1); fillers survive, rejoined with "" — exact reconstruction
    assert(viaChar(2L) == ((80L, 40L, fillL + fillR)), s"doc2: ${viaChar(2L)}")
    assert(viaChar(1L)._2 == 0L && viaChar(3L)._2 == 0L,
      s"canonical + unrelated untouched: ${viaChar(1L)} ${viaChar(3L)}")
    // wordy docs behave byte-identically to the word-only path — the
    // dispatch must not fire on them
    val viaWord = SubstringDedup.cleanCorpus(corpus, 10)
      .filter(col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(Seq(10L, 11L).map(k => k -> viaChar(k)).toMap == viaWord,
      s"wordy rows must not move under charTokens: $viaWord vs $viaChar")
    assert(viaChar(11L)._2 == 40L && viaChar(11L)._3 == "tail extra",
      s"the wordy near-dup still cut through the word machinery: ${viaChar(11L)}")
    // the word-only path is BLIND to the spaceless pair — the gap
    // charTokens exists to close
    val blind = SubstringDedup.cleanCorpus(corpus, 10)
      .filter(col("doc_id") === 2L).select("dup_tokens").first().getLong(0)
    assert(blind == 0L, s"word path must miss the spaceless run: $blind")
  }

  test("charTokens: embedded spaces survive the char cut; incremental equals batch on the union") {
    def cjk(seed: Int, n: Int): String = {
      val rng = new scala.util.Random(seed)
      (1 to n).map(_ => (0x4e00 + rng.nextInt(2000)).toChar).mkString
    }
    val a = cjk(3, 200)
    // two "tokens" but avg length >> 16 → char mode; the first 90 chars
    // duplicate doc 1's prefix, the space + tail are original
    val tail = cjk(5, 60)
    val c = a.substring(0, 90) + " " + tail
    val corpus = docs(1L -> a)
    val batch = docs(4L -> c, 5L -> cjk(88, 120))
    val keys = SubstringDedup.windowKeys(corpus, 10, charTokens = true)
      .localCheckpoint(true)
    val inc = SubstringDedup.incrementalCleanCorpus(batch, keys, 10, charTokens = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(inc(4L) == ((151L, 90L, " " + tail)),
      s"char cut must preserve the embedded space exactly: ${inc(4L)}")
    assert(inc(5L)._2 == 0L)
    // incremental ≡ batch over (corpus ∪ batch) restricted to batch ids
    val batchTwin = SubstringDedup
      .cleanCorpus(corpus.unionByName(batch), 10, hashKeys = true, charTokens = true)
      .filter(col("doc_id") >= 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(inc == batchTwin, s"incremental ≠ batch: $inc vs $batchTwin")
  }

  test("charTokens: one-long-token LATIN docs (URLs, base64) keep word semantics — no destructive prefix cuts") {
    // each doc is ONE token averaging far past the length bound, but
    // pure ASCII — the majority-non-ASCII half of the dispatch must
    // keep them on word semantics (char-cutting their shared prefix
    // would mangle ordinary data, exactly what the doc contract forbids)
    val corpus = docs(
      1L -> "https://www.example.com/alpha/beta/gamma/delta/epsilon",
      2L -> "https://www.example.com/alpha/beta/gamma/zeta/omega",
      3L -> ("MIIBIjANBgkqhkiG9w0BAQEFAAOCAQ8A" * 3),
      4L -> ("MIIBIjANBgkqhkiG9w0BAQEFAAOCAQ8A" * 2 + "tailblob"))
    val cleaned = SubstringDedup.cleanCorpus(corpus, 10, charTokens = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(cleaned.values.forall(_._2 == 0L),
      s"ASCII one-token docs must stay word-windowed (no cuts): $cleaned")
    assert(cleaned(2L)._1 == 1L && cleaned(2L)._3.startsWith("https://"),
      s"unit accounting stays word-based: ${cleaned(2L)}")
    // an all-whitespace doc stays word-mode too (its non-ASCII count is 0)
    val ws = SubstringDedup.cleanCorpus(docs(9L -> "   "), 10, charTokens = true)
      .collect().map(r => (r.getLong(1), r.getString(3))).head
    assert(ws == ((0L, "")), s"all-whitespace doc: $ws")
  }

  test("window-key granularity pin: a word-built store under charTokens fails loud, and vice versa") {
    def cjk(seed: Int, n: Int): String = {
      val rng = new scala.util.Random(seed)
      (1 to n).map(_ => (0x4e00 + rng.nextInt(2000)).toChar).mkString
    }
    val corpus = docs(1L -> cjk(3, 200), 2L -> (1 to 30).map(i => s"c$i").mkString(" "))
    val wordDir = java.nio.file.Files.createTempDirectory("graft_wk_word").toString
    SubstringDedup.windowKeys(corpus, 10).write.mode("overwrite").parquet(wordDir)
    val charDir = java.nio.file.Files.createTempDirectory("graft_wk_char").toString
    SubstringDedup.windowKeys(corpus, 10, charTokens = true)
      .write.mode("overwrite").parquet(charDir)
    // matched loads pass and strip the stamp
    assert(SubstringDedup.loadWindowKeys(spark, wordDir, 10).columns.toSeq == Seq("key"))
    assert(SubstringDedup.loadWindowKeys(spark, charDir, 10, charTokens = true)
      .columns.toSeq == Seq("key"))
    // crossed loads fail loud in BOTH directions
    val e1 = intercept[IllegalArgumentException] {
      SubstringDedup.loadWindowKeys(spark, wordDir, 10, charTokens = true)
    }
    assert(e1.getMessage.contains("charTokens"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SubstringDedup.loadWindowKeys(spark, charDir, 10)
    }
    assert(e2.getMessage.contains("charTokens"), e2.getMessage)
    // a LEGACY table (no stamp column) can only have been word-built
    val legacy = java.nio.file.Files.createTempDirectory("graft_wk_legacy").toString
    spark.read.parquet(wordDir).drop("cfg_chartok")
      .write.mode("overwrite").parquet(legacy)
    assert(SubstringDedup.loadWindowKeys(spark, legacy, 10).count() > 0)
    val e3 = intercept[IllegalArgumentException] {
      SubstringDedup.loadWindowKeys(spark, legacy, 10, charTokens = true)
    }
    assert(e3.getMessage.contains("charTokens"), e3.getMessage)
    // the incremental consumer guards a stamped frame directly too
    val e4 = intercept[IllegalArgumentException] {
      SubstringDedup.incrementalDuplicatedSpans(
        corpus, spark.read.parquet(wordDir), 10, charTokens = true)
    }
    assert(e4.getMessage.contains("charTokens"), e4.getMessage)
  }

  test("window-key length pin: a store built at a different windowTokens fails loud; legacy grandfathered") {
    // a key table built at windowTokens=8 consumed by a 10-token run
    // never matches anything and the span cut silently degrades — the
    // cfg_wintok stamp turns that into a loud refusal
    val corpus = docs(1L -> (1 to 40).map(i => s"c$i").mkString(" "))
    val dir8 = java.nio.file.Files.createTempDirectory("graft_wk_w8").toString
    SubstringDedup.windowKeys(corpus, 8).write.mode("overwrite").parquet(dir8)
    assert(SubstringDedup.loadWindowKeys(spark, dir8, 8).columns.toSeq == Seq("key"))
    val e1 = intercept[IllegalArgumentException] {
      SubstringDedup.loadWindowKeys(spark, dir8, 10)
    }
    assert(e1.getMessage.contains("windowTokens"), e1.getMessage)
    // the incremental consumer guards a stamped frame directly too
    val e2 = intercept[IllegalArgumentException] {
      SubstringDedup.incrementalDuplicatedSpans(
        corpus, spark.read.parquet(dir8), 10)
    }
    assert(e2.getMessage.contains("windowTokens"), e2.getMessage)
    // a table from before the stamp existed is grandfathered — its
    // window length is unknowable, so any minTokens loads it
    val legacy = java.nio.file.Files.createTempDirectory("graft_wk_w8_legacy").toString
    spark.read.parquet(dir8).drop("cfg_wintok")
      .write.mode("overwrite").parquet(legacy)
    assert(SubstringDedup.loadWindowKeys(spark, legacy, 10).count() > 0)
  }

  test("run-level: embedded quote cut across mixed and homogeneous docs; word tier rides the spliced text") {
    val quote = thai(21, 40)
    val tail2 = thai(22, 30)
    val w = (1 to 12).map(i => s"w$i").mkString(" ")           // 12 shared-prefix words
    val fixture = docs(
      1L -> w,                                                 // word canonical
      2L -> s"${(1 to 11).map(i => s"w$i").mkString(" ")} $quote tail one",
      3L -> s"completely different words here right now okay yes no maybe $quote other end",
      4L -> (quote + tail2))                                   // homogeneous spaceless
    val spans = SubstringDedup.duplicatedSpansRunLevel(fixture, 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(spans === Set(
      // doc 2's quote run is the char-stage canonical (lowest vid) —
      // docs 3 and 4 carry the cut; doc 4's span is in whole-doc units
      (3L, "char", 0, 1L, 40L, 40L),
      (4L, "char", 0, 1L, 40L, 40L),
      // word tier: doc 2 shares its first 11 tokens with doc 1
      (2L, "word", -1, 1L, 11L, 11L)), s"spans: $spans")
    val clean = SubstringDedup.cleanCorpusRunLevel(fixture, 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(clean(1L) === ((12L, 0L, 0L, w)), s"doc 1: ${clean(1L)}")
    // doc 2: quote kept (canonical), 11-token word prefix cut
    assert(clean(2L) === ((14L, 11L, 0L, s"$quote tail one")), s"doc 2: ${clean(2L)}")
    // doc 3: run fully cut (40 chars), words unique and kept (the
    // splice's doubled space normalizes away in the word rejoin)
    assert(clean(3L) === ((12L, 0L, 40L,
      "completely different words here right now okay yes no maybe other end")),
      s"doc 3: ${clean(3L)}")
    // doc 4 (homogeneous): char accounting, quote prefix cut
    assert(clean(4L) === ((70L, 40L, 40L, tail2)), s"doc 4: ${clean(4L)}")
  }

  test("run-level: nothing duplicated → every doc passes through; vid overflow fails loud") {
    val fixture = docs(
      1L -> "plain english words only in this one document here",
      2L -> s"mixed context ${(0x0e01 to 0x0e1a).map(_.toChar).mkString} trailing words",
      3L -> (0x4e00 to 0x4e60).map(_.toChar).mkString)
    val clean = SubstringDedup.cleanCorpusRunLevel(fixture, 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(clean.keySet === Set(1L, 2L, 3L))
    assert(clean(1L) === ((0L, "plain english words only in this one document here")))
    // the mixed doc reconstructs verbatim (single-spaced input)
    assert(clean(2L) ===
      ((0L, s"mixed context ${(0x0e01 to 0x0e1a).map(_.toChar).mkString} trailing words")))
    assert(clean(3L) === ((0L, (0x4e00 to 0x4e60).map(_.toChar).mkString)))
    // a null-text doc must come out exactly once (on the word path,
    // like doc-level cleanCorpus sends it), never silently vanish
    val withNull = fixture.unionByName(
      Seq(9L).toDF("doc_id").select(col("doc_id"),
        lit(null).cast("string").as("text")))
    val nulled = SubstringDedup.cleanCorpusRunLevel(withNull, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nulled === Set(1L, 2L, 3L, 9L),
      s"null-text doc must not vanish: $nulled")
    // packed-vid overflow raises instead of aliasing documents
    val big = docs((1L << 50) -> (0x4e00 to 0x4e60).map(_.toChar).mkString)
    val e = intercept[Exception] {
      SubstringDedup.cleanCorpusRunLevel(big, 10).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("vid overflow"),
      s"expected vid-overflow raise, got: ${e.getMessage}")
  }

  test("charTokens requires minTokens >= 2 (width-1 windows would collide across granularities)") {
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedSpans(
        docs(1L -> "abc"), 1, charTokens = true).collect()
    }
  }

  test("minTokens must be positive") {
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedSpans(cat.documents, 0)
    }
  }

  test("stats join strategy: explicit broadcast below the input gate, merge-hinted shuffle above, both exact") {
    // small corpus (KB-scale estimate): the duplicate-marking join must
    // be the explicit broadcast — zero probe-side shuffle locally
    assert(cat.documents.queryExecution.optimizedPlan.stats.sizeInBytes
      <= SubstringDedup.BroadcastDupStatsMaxInputBytes,
      "test corpus unexpectedly exceeds the broadcast gate")
    val smallPlan = SubstringDedup.duplicatedSpans(cat.documents, 10, hashKeys = true)
      .queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin"),
      s"small corpus must plan the broadcast stats join:\n$smallPlan")

    // >16 MB-estimate fixture (the hot-key shape): the gate must flip
    // to the merge-hinted shuffle join — the compile-time plan that can
    // never OOM building a statically planned broadcast (the 1000×
    // growth failure this gate exists for); AQE still runtime-adapts.
    // Exactness on this path is analytic: every doc except the
    // canonical first loses exactly the 10-token boilerplate span.
    val n = 1000000L
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val big = spark.range(1L, n + 1L).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("u"),
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit("a " + boiler + " u"),
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit("c")).as("text"))
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes
      > SubstringDedup.BroadcastDupStatsMaxInputBytes,
      "big fixture must cross the broadcast gate")
    val spans = SubstringDedup.duplicatedSpans(big, 10, hashKeys = true)
    val bigPlan = spans.queryExecution.executedPlan.toString
    assert(bigPlan.contains("SortMergeJoin"),
      s"big input must plan the merge-hinted stats join:\n$bigPlan")
    val mass = spans
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("span_tokens"),
        org.apache.spark.sql.functions.lit(0L))).first().getLong(0)
    assert(mass == 10L * (n - 1), s"merge-path span mass must be 10*(n-1): $mass")
  }
}
