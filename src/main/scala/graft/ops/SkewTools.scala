package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for hot keys. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) is the first line of defense and is
  * enabled engine-wide; explicit salting remains the right tool when a
  * single key dominates a SHUFFLE AGGREGATION (AQE can't split one
  * hash-aggregate key) or when joining a hot-keyed fact against a
  * small-but-not-broadcastable dim.
  */
object SkewTools {

  /** Salted equi-join: fact rows get a random salt in [0, buckets),
    * the dim side is exploded once per salt value, and the join key
    * becomes (key, salt) — a hot key spreads over `buckets` reducers.
    * Semantics identical to `fact.join(dim, keys, "inner")` for 1:N
    * fact:dim joins (each fact row still matches its dim row once).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = fact.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val expanded = dim.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }

  /** q92-style hot-key profile: the top-`topK` join keys by fact
    * frequency, kept only while they are actually hot — frequency at
    * least `minSkew`× the uniform share (n_rows / n_keys). One
    * partial-aggregatable frequency pass over the fact plus a
    * key-count-sized top-K; the result is at most `topK` rows and is
    * meant to be broadcast. On a uniform fact it is EMPTY and
    * [[saltedJoinProfiled]] degrades to the plain join shape. */
  def hotKeyProfile(fact: DataFrame, key: String, topK: Int = 16,
                    minSkew: Double = 4.0): DataFrame = {
    require(topK >= 0 && minSkew >= 1.0)
    val freq = fact.groupBy(col(key)).agg(count(lit(1)).as("__f"))
    val bar = freq.agg((sum("__f") / count(lit(1))).as("__uniform"))
    freq.crossJoin(broadcast(bar))
      .filter(col("__f") >= col("__uniform") * minSkew)
      .orderBy(desc("__f"), asc(key)).limit(topK)
      .select(col(key))
  }

  /** Skew-mitigated equi-join driven by a hot-key profile: only the
    * profiled hot keys pay the salt — hot fact rows get a round-robin
    * salt in [0, buckets) and the matching dim rows are replicated
    * `buckets` ways, while every cold key joins exactly once at salt 0
    * (no dim blow-up, unlike [[saltedJoin]] which explodes the WHOLE
    * dim). The hottest key's shuffle partition shrinks from max_freq
    * rows to ~max_freq / buckets — the bound AQE's skew split gives a
    * sort-merge join, delivered even for the hash joins and
    * hash-partition layouts AQE's splitter does not cover. Semantics
    * identical to `fact.join(dim, Seq(key), "inner")` for 1:N fact:dim
    * joins, column order included. `hot` defaults to
    * [[hotKeyProfile]] (one extra partial-aggregated fact pass); pass
    * a precomputed profile (e.g. persisted q92 output) to skip it. */
  def saltedJoinProfiled(fact: DataFrame, dim: DataFrame, key: String,
                         buckets: Int = 8, hot: Option[DataFrame] = None,
                         topK: Int = 16)
                        (implicit scope: CacheScope): DataFrame = {
    require(buckets > 0)
    // cached: the ≤topK-row profile feeds BOTH the fact salt and the
    // dim expansion — uncached, each branch re-runs the profile's
    // full fact frequency pass
    val hotKeys = broadcast(scope.cached(
      hot.getOrElse(hotKeyProfile(fact, key, topK))
        .select(col(key), lit(true).as("__hot"))))
    val salted = saltFact(fact, hotKeys, key, buckets)
    val expanded = dim.join(hotKeys, Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), array((0 until buckets).map(lit): _*))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt assignment half of [[saltedJoinProfiled]], split out so the
    * spread is testable: hot rows are round-robin'd over [0, buckets)
    * (perfectly uniform within a partition — no single reducer ever
    * sees more than ~max_freq / buckets of a hot key), cold rows keep
    * salt 0. The salt never reaches the output, so nondeterministic
    * numbering is safe. */
  private[ops] def saltFact(fact: DataFrame, hotKeys: DataFrame,
                            key: String, buckets: Int): DataFrame =
    fact.join(hotKeys, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. `partial` and `merge`
    * must form a semigroup on the aggregated column (sum/count/min/max
    * style). */
  def saltedSum(df: DataFrame, key: String, valueCol: Column, buckets: Int,
                resultName: String): DataFrame = {
    require(buckets > 0)
    df.withColumn("__salt", (rand(42) * buckets).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(resultName))
  }
}
