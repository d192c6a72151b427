package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Pins the distributed BPE trainer against a driver-side reference
  * implementation of the SAME conventions (whitespace words, char
  * symbols, overlapping pair counts, left-to-right greedy merge,
  * lexicographic tiebreak) — the rows-only X57/X58 correctness
  * anchor — plus the trainer's monotonicity law.
  */
class BpeSpec extends SparkSpec {

  /** Codepoint-lexicographic string order — the reference must break
    * ties exactly like the engine, whose `asc(...)` compares UTF8
    * bytes = codepoint order. Java String's compareTo orders by UTF-16
    * code UNIT, which disagrees for supplementary characters vs
    * U+E000–U+FFFF; same reason char counts below use codePointCount
    * (Spark `length()` counts codepoints, String.length counts units).
    */
  private val cpOrder: Ordering[String] = (s: String, t: String) =>
    Ordering.Implicits.seqOrdering[Seq, Int](Ordering.Int)
      .compare(s.codePoints.toArray.toSeq, t.codePoints.toArray.toSeq)

  private def cpCount(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Codepoint symbol split. Java's `split("")` cuts BETWEEN UTF-16
    * units, shattering surrogate pairs into lone halves; Spark's
    * `split(w, "")` is UTF8/codepoint-aware — the reference must match
    * the engine, not Java's quirk.
    */
  private def cpSyms(w: String): Vector[String] =
    w.codePoints.toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Reference BPE on a word-frequency map, pure Scala. */
  private def refMerges(
      wordFreq: Map[String, Long],
      k: Int,
      minCnt: Long): Seq[(Int, String, String, Long)] = {
    var vocab = wordFreq.toSeq.map { case (w, f) => (cpSyms(w), f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = vocab
        .flatMap { case (syms, f) => syms.zip(syms.tail).map(p => p -> f) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        implicit val ord: Ordering[String] = cpOrder
        val ((a, b), cnt) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }(
            Ordering.Tuple3(Ordering.Long, ord, ord)).head
        if (cnt < minCnt) done = true
        else {
          out += ((step, a, b, cnt))
          vocab = vocab.map { case (syms, f) =>
            val acc = Vector.newBuilder[String]
            var last: String = null
            syms.foreach { s =>
              if (last == a && s == b) last = a + b
              else { if (last != null) acc += last; last = s }
            }
            if (last != null) acc += last
            (acc.result(), f)
          }
          step += 1
        }
      }
    }
    out.result()
  }

  private def refEncode(
      wordFreq: Map[String, Long],
      merges: Seq[(String, String)]): Map[String, Vector[String]] =
    wordFreq.keysIterator.map { w =>
      var syms = cpSyms(w)
      merges.foreach { case (a, b) =>
        val acc = Vector.newBuilder[String]
        var last: String = null
        syms.foreach { s =>
          if (last == a && s == b) last = a + b
          else { if (last != null) acc += last; last = s }
        }
        if (last != null) acc += last
        syms = acc.result()
      }
      w -> syms
    }.toMap

  private def wordFreq(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  /** Spark jobs started while `run` executes. Drains the async
    * listener bus (onJobStart is delivered off the calling thread)
    * before reading the counter.
    */
  private def countJobs(run: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { run; Thread.sleep(500) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  private val fixture = Seq(
    "the theme of the thesis is the same theme",
    "low lower lowest low low slower slow",
    "aaa aaaa aa a banana bandana",
    "the slow theme sang a low song",
    // supplementary-plane codepoints: exercises codepoint symbol
    // splitting and codepoint char counts (a 2-codepoint word is 4
    // UTF-16 units — String.length would get this wrong)
    "𝕒𝕒 𝕒𝕒 ☃x ☃x")

  test("learnMerges ≡ driver-side reference on the fixture, including tiebreaks and counts") {
    import spark.implicits._
    val docs = fixture.toDF("text")
    val got = Bpe.learnMerges(docs, numMerges = 10, minPairCount = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refMerges(wordFreq(fixture), k = 10, minCnt = 2L)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty && got.head._1 == 1)
    // overlap convention visible in the data: "aaa"/"aaaa" count (a,a)
    // with overlaps, and the greedy merge never double-consumes a char
    val aa = got.find(m => m._2 == "a" && m._3 == "a")
    assert(aa.nonEmpty, "the (a,a) merge must be learned from the aaa pile")
  }

  test("max pair count is non-increasing across merge steps (law)") {
    import spark.implicits._
    val docs = fixture.toDF("text")
    val steps = Bpe.learnMerges(docs, numMerges = 10, minPairCount = 1L)
      .orderBy("step").collect().map(_.getLong(3))
    assert(steps.zip(steps.tail).forall { case (x, y) => x >= y },
      s"counts must be non-increasing: ${steps.toSeq}")
  }

  test("learnMerges on the documents corpus is deterministic and respects minPairCount") {
    val cat = graft.ops.Catalog(spark, sf001)
    val a = Bpe.learnMerges(cat.documents, numMerges = 6).collect().map(_.toSeq).toSeq
    val b = Bpe.learnMerges(cat.documents, numMerges = 6).collect().map(_.toSeq).toSeq
    assert(a == b, "relearning must reproduce the merge table exactly")
    assert(a.nonEmpty && a.forall(_.last.asInstanceOf[Long] >= 2L))
  }

  test("driver-fold trainer ≡ distributed trainer, at a fraction of the Spark jobs") {
    import spark.implicits._
    // path equality on the supplementary-plane fixture (tie-breaks and
    // codepoint symbols are where the paths could drift) and on the
    // real corpus
    val docs = fixture.toDF("text")
    def table(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("step").collect().map(_.toSeq).toSeq
    assert(
      table(Bpe.learnMerges(docs, numMerges = 10, minPairCount = 1L)) ==
        table(Bpe.learnMerges(docs, numMerges = 10, minPairCount = 1L,
          driverVocabLimit = 0)),
      "driver fold must reproduce the distributed trainer on the fixture")
    val cat = graft.ops.Catalog(spark, sf001)
    assert(
      table(Bpe.learnMerges(cat.documents, numMerges = 6)) ==
        table(Bpe.learnMerges(cat.documents, numMerges = 6,
          driverVocabLimit = 0)),
      "driver fold must reproduce the distributed trainer on the corpus")

    // the point of the hybrid: a 64-merge train is O(1) jobs, not O(2
    // per merge) — count jobs via a listener around each path
    val jobsDriver = countJobs {
      Bpe.learnMerges(docs, numMerges = 64, minPairCount = 1L).collect()
    }
    val jobsDistributed = countJobs {
      Bpe.learnMerges(docs, numMerges = 64, minPairCount = 1L,
        driverVocabLimit = 0).collect()
    }
    assert(jobsDriver * 4 <= jobsDistributed,
      s"driver fold must cut Spark jobs at least 4x at 64 merges: " +
        s"$jobsDriver vs $jobsDistributed")
  }

  test("batched distributed trainer: >=4x fewer jobs than 2-per-merge at 64 merges, hash-identical") {
    import spark.implicits._
    // independence-rich fixture — the real-vocab shape the batching is
    // for: 64 two-codepoint words over 128 DISTINCT codepoints with
    // strictly distinct frequencies, so every top pair is symbol-
    // disjoint from every other, no merged token collides, and the
    // whole merge table folds in one or two scans. (The chain-heavy
    // `fixture` above exercises the opposite regime — there exactness
    // forces near-singleton batches, pinned equal in the previous
    // test.)
    val texts = (0 until 64).map { i =>
      val w = new String(Character.toChars(0x400 + 2 * i)) +
        new String(Character.toChars(0x400 + 2 * i + 1))
      Array.fill(200 - i)(w).mkString(" ")
    }
    val docs = texts.toDF("text")
    val got = Bpe.learnMerges(docs, numMerges = 64, minPairCount = 1L,
        driverVocabLimit = 0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refMerges(wordFreq(texts), k = 64, minCnt = 1L),
      "batched distributed trainer must equal the sequential reference")
    assert(got.size == 64)

    val jobs = countJobs {
      Bpe.learnMerges(docs, numMerges = 64, minPairCount = 1L,
        driverVocabLimit = 0).collect()
    }
    // the old per-merge loop paid 2 jobs (argmax + checkpoint) per
    // merge; the batch must beat that by at least 4x here
    val sequentialJobs = 2 * 64
    assert(jobs * 4 <= sequentialJobs,
      s"batched distributed trainer must cut jobs at least 4x vs the " +
        s"per-merge loop: $jobs vs $sequentialJobs")
  }

  test("rank-greedy one-pass encode ≡ sequential merge replay on the learned table") {
    import spark.implicits._
    val docs = fixture.toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val merges = Bpe.learnMerges(docs, numMerges = 10, minPairCount = 2L)
    val ms = merges.orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = refEncode(wordFreq(fixture), ms) // sequential replay reference
    // every (doc, token) occurrence of the one-pass encoder must equal
    // the replayed encoding of the doc's words, in order
    val got = Bpe.encodeDocuments(docs, merges)
      .orderBy("doc_id", "pos")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    val want = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => enc(w)).toSeq
    }.toMap
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // corpus-scale smoke: token counts under both paths agree
    val cat = graft.ops.Catalog(spark, sf001)
    val m2 = Bpe.learnMerges(cat.documents, numMerges = 6)
    val onePass = Bpe.encodeDocuments(cat.documents, m2).count()
    val viaStats = Bpe.encodeStats(cat.documents, m2).collect()(0).getLong(1)
    assert(onePass == viaStats,
      s"one-pass token count $onePass must equal vocab-replay count $viaStats")
    // null rows (audited-ingest quarantine lines) carry no tokens and
    // must not kill the job
    val withNulls = docs.select("doc_id", "text")
      .unionByName(Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(Bpe.encodeDocuments(withNulls, merges).filter(col("doc_id") === 99L).count() == 0)
  }

  test("encodeStats ≡ reference encode; zero merges means one token per char") {
    import spark.implicits._
    val docs = fixture.toDF("text")
    val wf = wordFreq(fixture)
    val merges = Bpe.learnMerges(docs, numMerges = 8, minPairCount = 2L)
    val ms = merges.orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = refEncode(wf, ms)
    val wantTokens = wf.map { case (w, f) => enc(w).size * f }.sum
    val wantWords = wf.values.sum
    val wantChars = wf.map { case (w, f) => cpCount(w) * f }.sum
    val row = Bpe.encodeStats(docs, merges).collect()(0)
    assert(row.getLong(0) == wantWords && row.getLong(1) == wantTokens)
    assert(row.getDouble(2) ==
      BigDecimal(wantTokens.toDouble / wantWords).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(3) ==
      BigDecimal(wantChars.toDouble / wantTokens).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // zero merges: the encoding is the char split, so chars == tokens
    val none = Bpe.encodeStats(docs, merges.limit(0)).collect()(0)
    assert(none.getLong(1) == wantChars && none.getDouble(3) == 1.0)
    // merges strictly compress the fixture (the theme/low piles repeat)
    assert(row.getLong(1) < wantChars)
  }
}
