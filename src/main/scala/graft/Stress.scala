package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress harness: rebuilds `documents` / `embeddings` at
  * `factor`× the chosen fixture (distinct ids; each copy's text is
  * prefixed with 20 copy-specific words, so replicas sit BELOW the 0.8
  * Jaccard near-dup threshold — the corpus grows without a synthetic
  * candidate-pair explosion), then times the corpus-heavy pipelines at
  * 1× and `factor`×. Prints one JSON line per run.
  *
  * This is the "would it survive 10×?" check the plan audits argue on
  * paper: candidate-bounded near-dup, banded minhash, bucketed ANN and
  * the cleanup composite should all grow ~linearly in rows, not
  * quadratically.
  *
  * Usage: `sbt "runMain graft.Stress [sfDir] [factor]"`
  */
object Stress {

  private val queriesUnderTest = Seq(
    "l2_jaccard_pairs", "l2_containment", "l2_winnow_pairs", "l2_minhash_lsh", "l2_simhash", "l2_embedding_cosine",
    "l2_dup_clusters", "l3_ann_lsh", "l3_semdedup", "l3_ann_pq", "l3_ann_ivfpq",
    "l6_corpus_clean",
    "l6_pack_shards", "l8_decontaminate", "l8_repetition", "l8_chunk_windows",
    "l8_line_dedup", "l4_entropy", "l8_mixture_apply")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = BenchSession.build()

    val scaledDir = java.nio.file.Files.createTempDirectory("graft-stress").toString
    buildScaled(spark, sfDir, scaledDir, factor)

    def timeAll(dir: String): Seq[(String, Double)] =
      queriesUnderTest.map(name => name -> BenchSession.timeQuery(spark, name, dir))

    // warm-up BOTH corpora (JIT, codegen, parquet footers) so neither
    // side's first query absorbs one-time costs the other skips
    timeAll(sfDir); timeAll(scaledDir)
    val base = timeAll(sfDir)
    val scaled = timeAll(scaledDir)
    def js(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"stress":"base","sf":"$sfDir","queries":${js(base)}}""")
    println(s"""{"stress":"${factor}x","queries":${js(scaled)}}""")
    val ratios = base.zip(scaled).map { case ((k, b), (_, s0)) => k -> s0 / b }
    val ratioBody = ratios.map { case (k, r) => f""""$k":$r%.1f""" }.mkString(",")
    println("{\"stress\":\"ratio_at_" + factor + "x_data\",\"ratios\":{" + ratioBody + "}}")
    spark.stop()
  }

  private def buildScaled(spark: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    val docs = Tables(spark, sfDir, "documents")
    val maxDoc = 10000000L
    // 40 pad words: a copy of an n-word doc shares n-2 shingles and
    // adds ~40, so J = (n-2)/(n+38) < 0.8 needs n < 162 — true for the
    // whole fixture (max 100 tokens). A 20-word pad would leave docs
    // with >= 82 tokens ABOVE the threshold and flood the corpus with
    // synthetic near-dup pairs.
    val pad = (i: Int) =>
      (('a' to 't').map(c => s"$c$i") ++ ('a' to 't').map(c => s"$c${i + 1000}"))
        .mkString(" ") + " "
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + i * maxDoc).as("doc_id"),
        concat(lit(if (i == 0) "" else pad(i)), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = Tables(spark, sfDir, "embeddings")
    (0 until factor).map { i =>
      emb.select((col("vec_id") + i * maxDoc).as("vec_id"), col("embedding"), col("label"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
