package graft

/** Driver-side reference implementations shared by graph-clustering
  * specs (one copy, so a union-find fix reaches every consumer).
  */
object TestGraphs {

  /** Min-root, path-compressing union-find: node -> component minimum
    * for every node appearing in `pairs`.
    */
  def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // snapshot the keys before the final compress pass mutates parent
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }
}
