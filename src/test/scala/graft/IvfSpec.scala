package graft

import graft.core.Canonical
import graft.ops.Catalog
import graft.vector.{Ann, Ivf}

/** IVF properties: full-probe degenerates to exact brute force; the
  * index is a partition of the corpus; narrow probes retain the true
  * top-1 for the fixed probe (deterministic with the hash-based
  * centroid choice).
  */
class IvfSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("IVF with nProbe = nLists equals brute force") {
    val brute = Canonical.hash16(Ann.bruteForceTopK(cat.embeddings, 0, 5))
    val full = Canonical.hash16(
      Ivf.ivfTopK(cat.embeddings, 0, 5, nLists = 16, nProbe = 16))
    assert(full == brute)
  }

  test("IVF assignment partitions the corpus") {
    val cents = Ivf.centroids(cat.embeddings, 16)
    assert(cents.count() == 16)
    val assigned = Ivf.assign(cat.embeddings, cents)
    assert(assigned.count() == cat.embeddings.count())
    assert(assigned.select("vec_id").distinct().count() == cat.embeddings.count())
    assert(assigned.select("list_id").distinct().count() <= 16)
  }

  test("IVF narrow probe keeps the true nearest neighbour of probe 0") {
    val bruteTop = Ann.bruteForceTopK(cat.embeddings, 0, 1).collect()(0).getLong(0)
    val ids = Ivf.ivfTopK(cat.embeddings, 0, 5, nLists = 16, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(bruteTop))
  }
}
