package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Ownership scope for the cached / checkpointed scaffolds the
  * [[CorpusOps]] transforms build internally (shingle-prefix arrays,
  * winnow entry tables, cluster-round checkpoints, cleanup-stage
  * keeper tables).
  *
  * Why it exists: those scaffolds are cached because each construction
  * reuses them >= 2x WITHIN one query, but `cache()` pins executor
  * storage until somebody unpersists — a long-lived pipeline session
  * composing many CorpusOps calls would otherwise accumulate
  * corpus-scale cached tables for the session lifetime (eviction masks
  * it at fixture scale; at 100 TB it evicts the caches you wanted).
  *
  * Ownership contract:
  *  - Default ([[CacheScope.sessionOwned]]): the SESSION owns cleanup.
  *    `cache()`d tables clear with
  *    `spark.sharedState.cacheManager.clearCache()`; local-CHECKPOINT
  *    blocks are RDD-level persistence the SQL cache manager never
  *    sees — under the default they live until the RDDs are
  *    unpersisted (`sparkContext.getPersistentRDDs`) or the session
  *    ends. One-shot oracle queries run this way; the bench harness
  *    releases both kinds between timed runs (BenchSession.timeQuery).
  *  - Pipelines call `CacheScope.owned()`, pass it to each transform,
  *    run their terminal actions, then `scope.close()` — every scaffold
  *    cached or locally-checkpointed under the scope is unpersisted.
  *    Close AFTER the actions: the scaffolds are lazy, and plans built
  *    from them reference the cached tables by plan identity.
  *
  * {{{
  * implicit val scope: CacheScope = CacheScope.owned()
  * val pairs = CorpusOps.nearDupPairs(docs)
  * val clusters = CorpusOps.dupClustersConverged(pairs)
  * clusters.write.parquet(out)          // terminal action
  * scope.close()                        // storage returns to baseline
  * }}}
  */
final class CacheScope private[ops] (track: Boolean) {

  private val cleanups = ArrayBuffer.empty[() => Unit]

  /** cache() `df` and, in an owned scope, register its unpersist. */
  private[graft] def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    if (track) synchronized { cleanups += (() => { c.unpersist(false); () }) }
    c
  }

  /** Cache only in OWNED scopes — for tables whose reuse is ACROSS
    * queries (the CleanupStages pair table): a one-shot query
    * references such a table once, so the session-owned default would
    * pay the columnar cache build without ever reading it back
    * (measured ~0.3 s of pure cost on l6_corpus_clean at sf0.1). A
    * pipeline that declares ownership is exactly the caller that will
    * read it a second time. */
  private[graft] def cachedIfShared(df: DataFrame): DataFrame =
    if (track) cached(df) else df

  /** Lineage-truncating checkpoint between iterative rounds — local
    * (executor-resident blocks, fast, NOT fault-tolerant) or reliable
    * (`SparkContext.setCheckpointDir` storage, survives executor loss;
    * see [[CorpusOps.dupClusters]]'s `reliable` flag). Local-checkpoint
    * blocks are RDD-level persistence, invisible to the SQL cache
    * manager, so an owned scope unpersists the underlying RDDs
    * directly; reliable checkpoint FILES follow the cluster's
    * `spark.cleaner.referenceTracking.cleanCheckpoints` policy. */
  private[graft] def checkpointed(df: DataFrame, reliable: Boolean): DataFrame = {
    val ck =
      if (reliable) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    if (track && !reliable) synchronized {
      cleanups += (() => CacheScope.unpersistPlanRdds(ck))
    }
    ck
  }

  /** Unpersist everything registered under this (owned) scope. Safe to
    * call twice; a no-op for [[CacheScope.sessionOwned]]. */
  def close(): Unit = synchronized {
    cleanups.foreach(f => f())
    cleanups.clear()
  }
}

object CacheScope {

  /** Default scope: caching happens, cleanup belongs to the session
    * (cache-manager clear / session stop). The pre-scope behavior. */
  implicit val sessionOwned: CacheScope = new CacheScope(track = false)

  /** A scope the CALLER closes — composition-friendly pipelines use
    * this so repeated invocations return storage to baseline. */
  def owned(): CacheScope = new CacheScope(track = true)

  /** Release the RDD blocks behind a locally-checkpointed Dataset: the
    * checkpoint wraps an RDD in a LogicalRDD leaf, and that RDD (not
    * the SQL cache manager) holds the persisted blocks. Idempotent. */
  private[ops] def unpersistPlanRdds(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
}
