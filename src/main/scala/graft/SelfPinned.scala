package graft

/** Engine-pinned regression hashes for the three queries no external
  * oracle can check (SURVEY.md §4.3.3): X37's HLL++ sketch estimates
  * (DataSketches-specific register layout — DuckDB's HLL differs by
  * construction) and X57/X58's iteratively learned BPE merge table
  * (driver-looped trainer, no SQL restatement). All three are
  * DETERMINISTIC functions of a fixed corpus — lexicographic
  * tiebreaks in the trainer, order-insensitive register max-merge in
  * the sketch — so their canonical hashes are stable engine
  * constants: the property specs (ScaleSpec, BpeSpec) pin the
  * SEMANTICS against driver-side references, and these pins turn any
  * silent behavioral drift into a loud hash mismatch round over
  * round, exactly like the certified contract hashes.
  *
  * Regenerate after an INTENTIONAL semantic change with
  *   runMain graft.SelfPinned
  * which prints the current values for both certified scale factors.
  * [[HashCheck]] verifies these pins as part of the standard gate
  * (label `self`), and [[Verify]] emits a `self_pinned.json` verdict
  * file beside the parquet dumps so the crosscheck reports the three
  * queries as checked-against-pinned rather than oracle-free.
  */
object SelfPinned {

  val ids: Seq[String] =
    Seq("X37_hll_distinct", "X57_bpe_merges", "X58_bpe_encode_stats")

  /** Canonical SHA-256 prefixes at sf0.01 (the Contract.hash01 idiom). */
  val hash01: Map[String, String] = Map(
    "X37_hll_distinct" -> "50c03c3be74ce031",
    "X57_bpe_merges" -> "bb49ef09e2364f6f",
    "X58_bpe_encode_stats" -> "ab6f554b436e20c2")

  /** Canonical SHA-256 prefixes at sf0.1. */
  val hash1: Map[String, String] = Map(
    "X37_hll_distinct" -> "76e644496014c75a",
    "X57_bpe_merges" -> "605ec27eebd6e935",
    "X58_bpe_encode_stats" -> "577bce149655633c")

  /** The pin set for a data directory, when one is certified for it. */
  def forDir(sfDir: String): Option[Map[String, String]] =
    sfDir.replaceAll("/+$", "") match {
      case d if d.endsWith("sf0.1") => Some(hash1)
      case d if d.endsWith("sf0.01") => Some(hash01)
      case _ => None
    }

  /** Regeneration tool: print the current canonical hashes for both
    * certified scale factors (copy into the maps above after an
    * intentional semantic change).
    */
  def main(args: Array[String]): Unit = {
    // optional first arg = shuffle width, to re-prove partition
    // invariance of the pinned values (the HashCheck --partitions idiom)
    val spark = graft.core.Engine.session(
      shufflePartitions = args.headOption.map(_.toInt).getOrElse(8),
      appName = "graft-selfpin")
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"); id <- ids) {
      val h = graft.core.Canonical.hash16(SparkEntry.queries(id)(spark, sf))
      println(s"SELFPIN $sf $id $h")
    }
    spark.stop()
  }
}
