package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Cache-lifecycle contract for the CorpusOps scaffolds: a pipeline
  * that composes transforms under an OWNED scope must return executor
  * storage to baseline after `close()` — no cached tables, no
  * local-checkpoint blocks left behind (the session-owned default
  * keeps the pre-scope behavior: the session cleans up).
  */
class CacheScopeSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def persistedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("owned scope: compose-and-run pipeline leaves no persisted RDDs behind") {
    // make the baseline honest: clear anything earlier suites cached
    spark.sharedState.cacheManager.clearCache()
    val before = persistedRddIds

    val docs = (0 until 60).map(i => (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
      .toDF("doc_id", "text")
      .union(Seq((60L, "w0a w0b w0c w0d w0e")).toDF("doc_id", "text"))
    val scope = CacheScope.owned()
    // the pipeline shape the scaffolds exist for: near-dup pairs feed
    // cluster assignment (several cached intermediates + per-round
    // local checkpoints), winnow pairs add their cached entry table
    val pairs = CorpusOps.nearDupPairs(docs)(scope)
    val clusters = CorpusOps.dupClustersConverged(pairs)(scope)
    val winnow = CorpusOps.winnowPairs(docs)(scope)
    assert(clusters.count() > 0)   // terminal actions
    winnow.count()

    assert(persistedRddIds.size > before.size,
      "pipeline should have persisted scaffolds before close()")
    scope.close()
    val leaked = persistedRddIds -- before
    assert(leaked.isEmpty, s"persisted RDDs leaked past scope.close(): $leaked")
  }

  test("owned scope close() is idempotent and results stay correct before close") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val scope = CacheScope.owned()
    val out = CorpusOps.dupClusters(pairs)(scope)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 3L), (1L, 2L, 3L), (1L, 3L, 3L)))
    scope.close()
    scope.close() // second close: no-op, no throw
  }

  test("no raw .cache() in src/main outside CacheScope itself") {
    // The lifecycle contract only holds if EVERY cache in the library
    // routes through CacheScope (scope.cached / Llm.cached). A raw
    // .cache() in a query or transform body silently opts out: a user
    // lifting that body into a long-lived pipeline inherits an
    // unreleasable corpus-sized cache. CacheScope.scala is the one
    // legitimate call site.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assume(java.nio.file.Files.isDirectory(root), "run from the repo root")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("ops/CacheScope.scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if line.contains(".cache()") && !line.trim.startsWith("//") &&
            !line.trim.startsWith("*") =>
            s"$p:${i + 1}: ${line.trim}"
        }
      }.toList
    assert(offenders.isEmpty,
      s"raw .cache() outside CacheScope:\n${offenders.mkString("\n")}")
  }

  test("reliable mode checkpoints to durable storage and matches local-mode labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      // a path deep enough to cross the every-2nd-round checkpoints
      val pairs = (0L until 16L).map(i => (i, i + 1)).toDF("d1", "d2")
      val local = CorpusOps.dupClusters(pairs)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      val durable = CorpusOps.dupClusters(pairs, reliable = true)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      assert(durable == local)
      val durableConv = CorpusOps.dupClustersConverged(pairs, reliable = true)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      assert(durableConv == local)
      // the checkpoint actually went to the durable dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"reliable mode wrote nothing under $dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }
}
