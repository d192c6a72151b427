package graft

import graft.core.Canonical
import graft.ops.{Catalog, DfContract}

/** E2 gate: the typed DataFrame implementation of every contract query
  * must produce the same certified hash as the SQL form (SURVEY §7.3 —
  * guards the API layer against changing semantics).
  */
class DfContractSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("every contract query has a DataFrame implementation") {
    val missing = Contract.all.map(_.id).filterNot(DfContract.all.contains)
    assert(missing.isEmpty, s"missing DF implementations: $missing")
  }

  Contract.all.foreach { c =>
    test(s"${c.id} DataFrame form matches certified hash01 at sf0.01") {
      DfContract.all.get(c.id).foreach { fn =>
        val got = Canonical.hash16(fn(cat))
        assert(got == Contract.hash01(c.id),
          s"${c.id}: DF hash mismatch (got $got, want ${Contract.hash01(c.id)})")
      }
    }
  }
}
