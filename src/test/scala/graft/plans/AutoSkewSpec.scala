package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

/** Contracts for the opt-in auto-skew optimizer rule: off means OFF
  * (plan untouched), on means the q94 saltedJoinProfiled shape — hot
  * keys salted over buckets, dim replicated for hot keys only — with
  * results bit-equal to the plain join.
  */
class AutoSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def factDim() = {
    // the engine's own q54 spelling: differently-NAMED key attributes
    // (l_suppkey = s_suppkey), query text untouched — the profile is
    // registered against the fact column only
    val li = Tables(spark, SparkFixture.sfDir, "lineitem")
      .select("l_suppkey", "l_extendedprice")
    val su = Tables(spark, SparkFixture.sfDir, "supplier")
      .select("s_suppkey", "s_nationkey")
    li.join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      // decimal-exact revenue: a double sum would reassociate under
      // the salted partitioning and break bit-equality spuriously
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("rev"),
        count(lit(1)).as("n"))
  }

  private def optimized() = factDim().queryExecution.optimizedPlan.toString

  test("off by default: the join plans untouched even with a profile registered") {
    AutoSkew.register(spark, "l_suppkey", Seq(1L, 2L), buckets = 4)
    try {
      val plan = optimized()
      assert(!plan.contains("__graft_salt"),
        s"rule fired without the config flag:\n$plan")
    } finally AutoSkew.unregister(spark, "l_suppkey")
  }

  test("enabled without a registered profile: still untouched") {
    spark.conf.set(AutoSkew.EnabledKey, "true")
    try {
      val plan = optimized()
      assert(!plan.contains("__graft_salt"),
        s"rule fired without a profile:\n$plan")
    } finally spark.conf.unset(AutoSkew.EnabledKey)
  }

  test("enabled + profile: rewritten into the q94 shape, results bit-equal to the plain join") {
    // baseline: the plain join's result (rule off)
    val plain = factDim().collect()
      .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet

    // a real profile: the fixture's hottest supplier keys (driver-side
    // <= topK rows — exactly what a persisted q92 output gives)
    val hot = graft.ops.SkewTools.hotKeyProfile(
        Tables(spark, SparkFixture.sfDir, "lineitem"), "l_suppkey",
        topK = 4, minSkew = 1.0)
      .collect().map(_.getLong(0)).toSeq
    assert(hot.nonEmpty, "fixture must yield a hot-key profile")

    spark.conf.set(AutoSkew.EnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", hot, buckets = 4)
    try {
      val plan = optimized()
      // the hand-built q94 shape, plan-visible: a salt projection on
      // the fact, a conditional-array explode on the dim, and the join
      // carrying BOTH the key and the salt equality
      assert(plan.contains("__graft_salt"), s"salt projection missing:\n$plan")
      assert(plan.contains("explode(if"), s"conditional dim replication missing:\n$plan")
      assert(plan.contains("monotonically_increasing_id"),
        s"round-robin fact salt missing:\n$plan")
      assert(plan.contains("__graft_salt_r"),
        s"join lost the salt equality:\n$plan")
      // and the salted result is EXACTLY the plain join's
      val salted = factDim().collect()
        .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(salted == plain, s"salted result diverged:\n$salted\nvs\n$plain")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("multi-conjunct join: only the registered key is salted, the second equi-conjunct rides along") {
    // two AND'd equi-conjuncts; the profile covers l_suppkey only —
    // the rewrite must salt THAT key and carry the nationkey equality
    // into the rewritten join untouched
    def twoKey() = {
      val li = Tables(spark, SparkFixture.sfDir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"),
          (col("l_suppkey") % 25).as("l_nk"))
      val su = Tables(spark, SparkFixture.sfDir, "supplier")
        .select("s_suppkey", "s_nationkey")
      li.join(su, col("l_suppkey") === col("s_suppkey") &&
          col("l_nk") === col("s_nationkey"))
        .groupBy("s_nationkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("rev"),
          count(lit(1)).as("n"))
    }
    val plain = twoKey().collect()
      .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet
    spark.conf.set(AutoSkew.EnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", Seq(1L, 2L, 3L), buckets = 4)
    try {
      val plan = twoKey().queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_salt"), s"rule did not fire:\n$plan")
      // the salt gate tests l_suppkey, never the second key
      assert("""if \(l_suppkey#\d+L? IN""".r.findFirstIn(plan).isDefined,
        s"salt not gated on the registered fact key:\n$plan")
      assert("""l_nk#\d+L? IN""".r.findFirstIn(plan).isEmpty,
        s"unregistered key got salted:\n$plan")
      // one dim replication, not one per conjunct
      assert("explode\\(if".r.findAllIn(plan).size == 1,
        s"expected exactly one dim replication:\n$plan")
      val salted = twoKey().collect()
        .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(salted == plain, s"two-key salted result diverged")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("registerFromProfile: wires a persisted q92 profile in one call; empty profile is a no-op") {
    val li = Tables(spark, SparkFixture.sfDir, "lineitem")
    val profile = graft.ops.SkewTools.hotKeyProfile(li, "l_suppkey",
      topK = 4, minSkew = 1.0)
    spark.conf.set(AutoSkew.EnabledKey, "true")
    try {
      AutoSkew.registerFromProfile(spark, profile, buckets = 4)
      val plan = optimized()
      assert(plan.contains("__graft_salt"),
        s"profile-wired rule did not fire:\n$plan")
      AutoSkew.unregister(spark, "l_suppkey")
      // an empty profile (no measured skew) must register nothing
      AutoSkew.registerFromProfile(spark,
        profile.filter(col("l_suppkey") < 0), buckets = 4)
      val plan2 = optimized()
      assert(!plan2.contains("__graft_salt"),
        s"empty profile must be a no-op:\n$plan2")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("left-outer join: hot fact keys salt, unmatched fact rows null-extend exactly once") {
    // fact LEFT OUTER dim with a dim that MISSES half the keys (even
    // s_suppkey only): null-extension must survive the dim replication
    // — an unmatched hot fact row carries one salt and no dim replica
    // exists at any salt, so it emits exactly once with nulls
    def lo() = {
      val li = Tables(spark, SparkFixture.sfDir, "lineitem")
        .select("l_suppkey", "l_extendedprice")
      val su = Tables(spark, SparkFixture.sfDir, "supplier")
        .filter(col("s_suppkey") % 2 === 0)
        .select("s_suppkey", "s_nationkey")
      li.join(su, col("l_suppkey") === col("s_suppkey"), "left_outer")
        .groupBy("s_nationkey") // null group = the unmatched fact rows
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("rev"),
          count(lit(1)).as("n"))
    }
    def rows() = lo().collect()
      .map(r => (if (r.isNullAt(0)) Int.MinValue else r.getInt(0),
        r.getDecimal(1), r.getLong(2))).toSet
    val plain = rows()
    assert(plain.exists(_._1 == Int.MinValue),
      "fixture must produce unmatched fact rows — test is vacuous")
    val hot = graft.ops.SkewTools.hotKeyProfile(
        Tables(spark, SparkFixture.sfDir, "lineitem"), "l_suppkey",
        topK = 4, minSkew = 1.0)
      .collect().map(_.getLong(0)).toSeq
    spark.conf.set(AutoSkew.EnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", hot, buckets = 4)
    try {
      val plan = lo().queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_salt"), s"left-outer did not salt:\n$plan")
      assert(plan.contains("LeftOuter"),
        s"rewrite lost the outer join type:\n$plan")
      assert(rows() == plain,
        "left-outer salted result diverged from the plain join")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("left-semi/anti joins: hot fact keys salt, results bit-equal (the decontamination shape)") {
    // the L-battery exclusion shape: fact semi/anti-joined against a
    // key list under a hot key — fact-preserved, so the one-salt
    // argument holds (a fact row meets the dim replica at its salt iff
    // the key exists at all; semi/anti emit each fact row <= once)
    def q(tpe: String) = {
      val li = Tables(spark, SparkFixture.sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice")
      val su = Tables(spark, SparkFixture.sfDir, "supplier")
        .filter(col("s_suppkey") % 2 === 0)
        .select("s_suppkey")
      li.join(su, col("l_suppkey") === col("s_suppkey"), tpe)
        .groupBy("l_suppkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("rev"),
          count(lit(1)).as("n"))
    }
    def rows(tpe: String) = q(tpe).collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).toSet
    val plainSemi = rows("left_semi")
    val plainAnti = rows("left_anti")
    assert(plainSemi.nonEmpty && plainAnti.nonEmpty,
      "fixture must exercise both match and no-match keys")
    val hot = graft.ops.SkewTools.hotKeyProfile(
        Tables(spark, SparkFixture.sfDir, "lineitem"), "l_suppkey",
        topK = 4, minSkew = 1.0)
      .collect().map(_.getLong(0)).toSeq
    spark.conf.set(AutoSkew.EnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", hot, buckets = 4)
    try {
      val semiPlan = q("left_semi").queryExecution.optimizedPlan.toString
      assert(semiPlan.contains("__graft_salt"), s"semi did not salt:\n$semiPlan")
      assert(semiPlan.contains("LeftSemi"),
        s"rewrite lost the semi join type:\n$semiPlan")
      val antiPlan = q("left_anti").queryExecution.optimizedPlan.toString
      assert(antiPlan.contains("__graft_salt"), s"anti did not salt:\n$antiPlan")
      assert(antiPlan.contains("LeftAnti"),
        s"rewrite lost the anti join type:\n$antiPlan")
      assert(rows("left_semi") == plainSemi,
        "salted semi result diverged from the plain join")
      assert(rows("left_anti") == plainAnti,
        "salted anti result diverged from the plain join")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("right/full outer joins: never rewritten (dim replication would multiply preserved rows)") {
    def ro() = {
      val li = Tables(spark, SparkFixture.sfDir, "lineitem")
        .select("l_suppkey", "l_extendedprice")
      val su = Tables(spark, SparkFixture.sfDir, "supplier")
        .select("s_suppkey", "s_nationkey")
      li.join(su, col("l_suppkey") === col("s_suppkey"), "right_outer")
    }
    spark.conf.set(AutoSkew.EnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", Seq(1L, 2L), buckets = 4)
    try {
      val plan = ro().queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_salt"),
        s"right-outer must not rewrite:\n$plan")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("salted aggregate: hot GROUP BY key splits into two phases, results bit-equal") {
    def agg() = Tables(spark, SparkFixture.sfDir, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("rev"),
        count(lit(1)).as("n"),
        min("l_quantity").as("mn"),
        max("l_quantity").as("mx"))
    def rows() = agg().collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val plain = rows()
    spark.conf.set(AutoSkew.AggEnabledKey, "true")
    AutoSkew.register(spark, "l_suppkey", Seq(1L, 2L, 3L), buckets = 4)
    try {
      val plan = agg().queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_salt"),
        s"aggregate did not salt:\n$plan")
      // two logical Aggregates: the salted partial + the key merge
      assert("Aggregate \\[".r.findAllIn(plan).size == 2,
        s"expected a two-phase aggregate:\n$plan")
      assert(plan.contains("monotonically_increasing_id"),
        s"round-robin salt missing:\n$plan")
      assert(rows() == plain,
        "salted aggregate diverged from the plain aggregate")
    } finally {
      spark.conf.unset(AutoSkew.AggEnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("salted aggregate gate: join flag alone leaves aggregates untouched; AVG-shaped aggs never rewrite") {
    spark.conf.set(AutoSkew.EnabledKey, "true") // JOIN flag, not the agg one
    AutoSkew.register(spark, "l_suppkey", Seq(1L, 2L), buckets = 4)
    try {
      val p1 = Tables(spark, SparkFixture.sfDir, "lineitem")
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.toString
      assert("Aggregate \\[".r.findAllIn(p1).size == 1 && !p1.contains("__graft_salt"),
        s"aggregate rewritten without the agg flag:\n$p1")
      spark.conf.set(AutoSkew.AggEnabledKey, "true")
      // AVG is not in the decomposable set — the whole aggregate must
      // pass through untouched (partial-avg-of-avgs would be wrong)
      val p2 = Tables(spark, SparkFixture.sfDir, "lineitem")
        .groupBy("l_suppkey").agg(avg("l_quantity").as("a"))
        .queryExecution.optimizedPlan.toString
      assert(!p2.contains("__graft_salt"),
        s"non-decomposable aggregate was salted:\n$p2")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      spark.conf.unset(AutoSkew.AggEnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }

  test("mis-typed profile: rewrite falls back to the plain join instead of failing the query") {
    val plain = factDim().collect()
      .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet
    spark.conf.set(AutoSkew.EnabledKey, "true")
    // string hot keys against a BIGINT join column: Literal.create
    // cannot coerce — the rule must keep the plain join, not throw
    AutoSkew.register(spark, "l_suppkey", Seq("not-a-key"), buckets = 4)
    try {
      val plan = optimized()
      assert(!plan.contains("__graft_salt"),
        s"mis-typed profile should fall back, not salt:\n$plan")
      val got = factDim().collect()
        .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(got == plain, "fallback result diverged from the plain join")
    } finally {
      spark.conf.unset(AutoSkew.EnabledKey)
      AutoSkew.unregister(spark, "l_suppkey")
    }
  }
}
