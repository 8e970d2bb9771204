package graft.queries

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkFixture, Tables}

/** Cross-validation of the hand-rolled MinHash/LSH dedup against
  * spark.ml's MinHashLSH: every exact near-dup pair (the oracle-checked
  * l2_jaccard_pairs output) must surface in the ml pipeline's
  * approxSimilarityJoin at the matching distance threshold.
  */
class MlLshSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("spark.ml MinHashLSH finds every exact near-dup pair") {
    val exact = SparkEntry.queries("l2_jaccard_pairs")(spark, SparkFixture.sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)

    val docs = Tables(spark, SparkFixture.sfDir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("shingles", array_distinct(
        expr("transform(sequence(0, greatest(size(ws)-3, 0)), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
      .select("doc_id", "shingles")

    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = mh.fit(feat)
    val mlPairs = model.approxSimilarityJoin(feat, feat, 0.25, "dist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"))
      .filter(col("d1") < col("d2"))
      .as[(Long, Long)].collect().toSet

    val missed = exact -- mlPairs
    assert(missed.isEmpty, s"ml pipeline missed exact pairs: $missed")
  }
}
