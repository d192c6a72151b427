package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.vector.{Ivf, SemDedup}

/** VERDICT r6 item 6 — the 10× plan check for X60 (k-means profile) and
  * X61 (SemDeDup): run both stages on a 10×-duplicated sf0.1 embedding
  * corpus (20 000 vectors; exact replicas with fresh ids — the
  * adversarial duplicate-pile shape for a dedup operator), with the
  * cluster count scaled with the corpus per the documented SemDedup
  * scale contract (nLists ∝ N), and verify:
  *
  *   - per-stage wall times stay proportionate (numbers → PLANS.md);
  *   - the within-cluster join is an equi-join on list_id — no
  *     CartesianProduct / BroadcastNestedLoopJoin anywhere except the
  *     one-row broadcast of the collapsed centroid array;
  *   - the quadratic term Σ_clusters m²/2 is measured, and measured
  *     AGAIN at the unscaled nLists=8 to document why the contract says
  *     nLists must grow with N;
  *   - no cluster's pair mass exceeds the stated per-cluster budget
  *     (the threshold past which the scaladoc routes spam piles to
  *     Ann.budgetedBandedPairsAbove).
  *
  * Run: sbt "Test/runMain graft.Scale10Bench"
  */
object Scale10Bench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime
    val r = f
    (r, (System.nanoTime - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.session(
      master = "local[32]", shufflePartitions = 32, appName = "scale10")
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    val emb10 = (0 until 10)
      .map(r => emb.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
      .repartition(32)
      .localCheckpoint(true)
    val n = emb10.count()
    println(s"SCALE10 corpus rows=$n (10x sf0.1)")

    // nLists ∝ N: sf0.1 uses 8 lists on 2k vectors → 80 on 20k
    val nLists = 80
    val dim = 64
    val (cents, tCent) = timed {
      Ivf.refineCentroids(emb10, Ivf.centroids(emb10, nLists), iters = 4, dim = dim)
        .localCheckpoint(true)
    }
    println(f"SCALE10 kmeans_build(nLists=$nLists, 4 Lloyd iters) $tCent%8.2f s")

    val (profileRows, tProf) = timed {
      SemDedup.clusterProfile(emb10, cents).collect()
    }
    println(f"SCALE10 cluster_profile (X60 shape)         $tProf%8.2f s  clusters=${profileRows.length}")

    // pair-mass accounting at the scaled k and at the unscaled k=8
    def pairMass(k: Int, cs: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val sizes = SemDedup.clusterProfile(emb10, cs).select("n").collect().map(_.getLong(0))
      (sizes.map(m => m * (m - 1) / 2).sum, sizes.max)
    }
    val (mass80, maxM80) = pairMass(nLists, cents)
    val cents8 = Ivf.refineCentroids(emb10, Ivf.centroids(emb10, 8), iters = 4, dim = dim)
      .localCheckpoint(true)
    val (mass8, maxM8) = pairMass(8, cents8)
    println(s"SCALE10 pair_mass nLists=80: total=$mass80 maxClusterRows=$maxM80")
    println(s"SCALE10 pair_mass nLists=8 : total=$mass8 maxClusterRows=$maxM8 (the don't-scale-k failure mode)")
    // the scaladoc's spam-pile route: per-cluster pair budget before
    // budgetedBandedPairsAbove takes over
    val perClusterBudget = 10L * 1000 * 1000
    val worst = maxM80 * (maxM80 - 1) / 2
    println(s"SCALE10 per-cluster budget=$perClusterBudget worstCluster=$worst " +
      (if (worst > perClusterBudget) "-> WOULD ROUTE to budgetedBandedPairsAbove"
       else "-> within budget, cluster-blocked path holds"))

    val dd = SemDedup.semanticDedup(emb10, cents, threshold = 0.4)
    val (nDup, tDedup) = timed(dd.count())
    println(f"SCALE10 semantic_dedup (X61 shape)          $tDedup%8.2f s  dupRows=$nDup")

    val plan = dd.queryExecution.executedPlan.toString
    val badJoin = plan.contains("CartesianProduct")
    // the only NL join allowed is the one-row centroid-array broadcast
    val nlCount = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    println(s"SCALE10 plan cartesian=$badJoin nlJoins=$nlCount " +
      s"equiJoinOnListId=${plan.contains("list_id")}")
    require(!badJoin, "X61 must never plan a cartesian")
    require(nlCount <= 2, s"only the centroid-array broadcasts may be NL joins, saw $nlCount")

    spark.stop()
  }
}
