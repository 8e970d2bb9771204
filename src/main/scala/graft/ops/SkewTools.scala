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
