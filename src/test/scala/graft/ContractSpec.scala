package graft

import graft.core.Canonical
import graft.sources.Tables

/** The t2 gate, run locally: every contract query's canonical hash at
  * sf0.01 must equal the certified hash01 (SURVEY.md §2.4) — the same
  * values DuckDB produces, so a pass here predicts a pass in the
  * driver's DuckDB compare.
  */
class ContractSpec extends SparkSpec {

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerAll(spark, sf01)
  }

  Contract.all.foreach { c =>
    test(s"${c.id} matches certified hash01 at sf0.01") {
      val got = Canonical.hash16(spark.sql(c.sparkSql))
      assert(got == Contract.hash01(c.id),
        s"${c.id}: canonical hash mismatch (got $got, want ${Contract.hash01(c.id)})")
    }
  }
}
