package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, SparkEntry}

/** Cheap structural guards — the value-level check is the external
  * DuckDB oracle compare (tools/check_oracle.py, driver t2). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("every declared query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, SparkFixture.sfDir).count()
      // q17_except: all nationkeys have suppliers at some SFs;
      // l2_embedding_cosine: fixture embeddings have no >=0.9 pairs
      if (n == 0 && name != "q17_except" && name != "l2_embedding_cosine") Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("oracle map only references declared queries; flagship entry works") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracles without queries: $undeclared")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ann (lsh + ivf) recall vs brute force stays above the data-limited floor") {
    val bf = SparkEntry.queries("l3_knn_bruteforce")(spark, SparkFixture.sfDir)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(name: String): Double = {
      val ann = SparkEntry.queries(name)(spark, SparkFixture.sfDir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & ann).size.toDouble / bf.size
    }
    val lsh = recall("l3_ann_lsh")
    val ivf = recall("l3_ann_ivf")
    val km = recall("l3_ann_ivf_kmeans")
    info(s"recall@10: lsh=$lsh ivf=$ivf ivf_kmeans=$km")
    // fixture embeddings are near-random (top-10 cosine ~0.37), which
    // bounds any bucketed/probed ANN on this data
    assert(lsh >= 0.1, s"lsh recall collapsed: $lsh")
    assert(ivf >= 0.1, s"ivf recall collapsed: $ivf")
    assert(km >= 0.1, s"ivf_kmeans recall collapsed: $km")
  }
}
