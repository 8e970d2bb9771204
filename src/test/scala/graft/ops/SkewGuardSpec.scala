package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Hot-cluster guard contract: on a corpus that collapses onto one
  * centroid (the realistic embedding skew the uniform fixtures never
  * show), semDedup's candidate volume must stay bounded by the
  * sub-bucket split instead of going quadratic in the hot cluster —
  * while the guarded result remains a sound under-approximation of the
  * exact cluster-wide rule (drops only provable dups, keeps a superset
  * of the exact keepers).
  */
class SkewGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** 4 deterministic seed directions (ids 0-3), `nHot` hot vectors on
    * seed 0's direction + noise, `nBg` background vectors. 64-dim. */
  private def skewed(nHot: Int, nBg: Int, noise: Double = 0.06): DataFrame = {
    val rnd = new scala.util.Random(7)
    val u = Array.fill(64)(1.0f / 8.0f)
    def axis(a: Int) = Array.tabulate(64)(d => if (d == a) 1.0f else 0.0f)
    val seeds = Seq(
      0L -> u, 1L -> axis(1), 2L -> axis(2), 3L -> axis(3))
    val hot = (0 until nHot).map { i =>
      (4L + i, Array.tabulate(64)(d =>
        u(d) + (noise * (rnd.nextDouble() * 2 - 1)).toFloat))
    }
    val bg = (0 until nBg).map { i =>
      (4L + nHot + i, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    (seeds ++ hot ++ bg).toDF("vec_id", "embedding")
  }

  test("guard splits the hot cluster: candidate volume drops >= 4x, result stays sound") {
    val vecs = skewed(nHot = 800, nBg = 200)
    def candidates(maxCluster: Int): Long = {
      val scope = CacheScope.owned()
      try {
        val a = CorpusOps.semDedupAssignments(vecs, k = 4, maxCluster)(scope)
        a.groupBy("cid", "sub").agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) div 2")).cast("long")).as[Long].collect().head
      } finally scope.close()
    }
    val unguarded = candidates(Int.MaxValue)
    val guarded = candidates(64)
    info(s"candidates: unguarded=$unguarded guarded=$guarded")
    // hot cluster ~800 members -> ~320k unguarded pairs; cap=64 splits
    // it into 16 sub-buckets, so anything close to even cuts 4x easily
    assert(unguarded > 200000L, s"fixture lost its hot cluster: $unguarded")
    assert(guarded * 4 <= unguarded,
      s"guard did not bound candidates: $guarded vs $unguarded")

    // soundness: guarded drops are a SUBSET of the exact rule's drops
    // (missing cross-sub-bucket pairs can only KEEP more), and the
    // guard still removes the bulk of the hot cluster
    def keepSet(maxCluster: Int): Set[Long] =
      CorpusOps.semDedup(vecs, k = 4, tau = 0.5, maxCluster)
        .filter(col("keep")).select("vec_id").as[Long].collect().toSet
    val exactKeep = keepSet(Int.MaxValue)
    val guardedKeep = keepSet(64)
    assert(exactKeep.subsetOf(guardedKeep),
      s"guard dropped vectors the exact rule keeps: ${exactKeep -- guardedKeep}")
    val hotIds = (4L until 804L).toSet
    val hotSurvivors = guardedKeep & hotIds
    assert(hotSurvivors.size <= 100,
      s"guard neutered the dedup: ${hotSurvivors.size} of 800 hot vectors kept")
  }

  test("ivf hot-list guard bounds probe scans and keeps candidates a subset") {
    val vecs = skewed(nHot = 800, nBg = 200)
    val queries = vecs.filter(col("vec_id").isin(10L, 11L, 900L))
      .select(col("vec_id").as("qid"), col("embedding"))
    val full = CorpusOps.ivfCandidates(vecs, queries, nlist = 4, nprobe = 1)
      .as[(Long, Long)].collect().toSet
    val guarded = CorpusOps.ivfCandidates(vecs, queries, nlist = 4, nprobe = 1,
        maxList = 64)
      .as[(Long, Long)].collect().toSet
    info(s"ivf candidates: full=${full.size} guarded=${guarded.size}")
    assert(guarded.subsetOf(full), "guard invented candidates outside the probed lists")
    // hot queries (10, 11) probe the hot list: guarded scan must be a
    // fraction of the full list membership
    assert(guarded.size * 2 <= full.size,
      s"hot-list guard did not shrink the probe scan: ${guarded.size} vs ${full.size}")
    // the guarded probe still finds same-sub-bucket neighbors
    assert(guarded.nonEmpty)
  }
}
