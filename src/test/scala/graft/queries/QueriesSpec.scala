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
    // bounds any bucketed/probed ANN on this data; multi-probe (3
    // Hamming-1 flips/table) lifted lsh from 0.27 to 0.53 on this seed
    assert(lsh >= 0.4, s"lsh recall collapsed: $lsh")
    assert(ivf >= 0.1, s"ivf recall collapsed: $ivf")
    assert(km >= 0.1, s"ivf_kmeans recall collapsed: $km")
  }

  test("pq adc recall vs exact L2 top-10 stays above the quantization floor") {
    // PQ ranks by (approximate) L2, so its honest reference is the
    // EXACT L2 top-10, not the cosine brute force the other ANN
    // variants share.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = graft.Tables(spark, SparkFixture.sfDir, "embeddings")
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("d2r").asc, col("vid").asc)
    val exact = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("d2r", round(graft.functions.VectorExprs.vec_l2sq(col("qe"), col("ve")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, SparkFixture.sfDir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val pq = recallOf("l3_ann_pq")
    val ivfpq = recallOf("l3_ann_ivfpq")
    info(s"recall@10 vs exact L2: pq=$pq ivfpq=$ivfpq")
    // 8 subspaces x 16 seed centroids on near-random fixture vectors —
    // coarse, but ADC must still beat random top-10 by a wide margin;
    // ivfpq additionally pays the 4/32-list probe coverage
    assert(pq >= 0.1, s"pq recall collapsed: $pq")
    assert(ivfpq >= 0.05, s"ivfpq recall collapsed: $ivfpq")
  }

  test("Lloyd-trained PQ codebook beats the seed codebook once data feeds the centroids") {
    // at sf0.001 (200 vectors / 16 centroids per subspace) Lloyd is
    // data-starved and can lose to the seed init — the honest claim is
    // at sf0.01+, where training lifted recall 0.267 -> 0.367 on this
    // seed; pin the lift there
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("d2r").asc, col("vid").asc)
    val exact = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      .join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("d2r", round(graft.functions.VectorExprs.vec_l2sq(col("qe"), col("ve")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, dir)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val pq = recallOf("l3_ann_pq")
    val pqTrained = recallOf("l3_ann_pq_trained")
    info(s"recall@10 vs exact L2 at sf0.01: pq=$pq pq_trained=$pqTrained")
    assert(pqTrained > pq, s"training did not lift pq recall at sf0.01: $pqTrained <= $pq")
  }
}
