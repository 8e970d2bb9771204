package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.IntegerType

/** OPT-IN automatic skew-join rewriting — the q92 → q94 loop closed
  * inside the optimizer: a session that has measured its hot keys
  * (q92's skew profile, persisted) registers them here, flips
  * `spark.graft.autoSkew.enabled`, and every INNER equi-join whose
  * FACT-side key column carries a registered profile is rewritten into
  * the [[graft.ops.SkewTools.saltedJoinProfiled]] shape — hot fact rows
  * salted round-robin over `buckets`, dim rows replicated once per
  * salt FOR THE HOT KEYS ONLY, cold keys joining exactly once at
  * salt 0 — without the query author touching the query.
  *
  * OFF BY DEFAULT. Design points:
  *  - The profile arrives as REGISTERED VALUES, not a plan: q94's
  *    hand-built shape joins a broadcast profile table because it
  *    computes the profile in-query; here the profile is already a
  *    ≤topK driver-side list, so the hot test inlines as an IN
  *    literal — the rewritten plan carries NO extra join at all.
  *  - The LEFT side is the fact (gets the salt column), the RIGHT
  *    the dimension (gets the replication explode) — the
  *    `fact.join(dim, ...)` orientation every query in this engine
  *    writes. The profile is registered against the FACT-side column
  *    name; the dim attribute is whatever the matched equi-conjunct
  *    binds it to (`l_suppkey = s_suppkey` matches — names need not
  *    agree), and multi-conjunct AND'd conditions match on their
  *    first profiled equi-conjunct with the remaining conjuncts
  *    carried into the rewritten join untouched. Only the profiled
  *    key is salted.
  *  - Registration is per (session, fact column name), keyed WEAKLY
  *    by the session object itself: reference identity (no hash
  *    collisions, no id reuse after GC) and a session's profiles
  *    evaporate when it is collected — no growth across session
  *    churn.
  *  - A profile whose values cannot be coerced to the join column's
  *    type (e.g. string hot keys against a bigint column) must not
  *    take the QUERY down: the rewrite falls back to the plain join
  *    (the rule is an optimization, never a correctness gate).
  *
  * Correctness: identical to the plain join for 1:N fact:dim joins —
  * each hot fact row matches its dim row at exactly one salt value,
  * each cold pair at salt 0; the salt never reaches the output
  * (restored by a pruning Project), so the nondeterministic
  * round-robin is retry-safe (the q94/saltFact argument). At 100 TB
  * this turns the one reducer holding a hot key's max_freq rows into
  * `buckets` reducers holding ~max_freq/buckets each — the bound
  * AQE's skew split only delivers to sort-merge joins, extended here
  * to hash joins and hash-partitioned layouts.
  */
object AutoSkew {

  /** Session config flag gating the join rewrite (default false). */
  val EnabledKey = "spark.graft.autoSkew.enabled"

  /** Separate opt-in for the two-phase salted AGGREGATE rewrite
    * (default false) — a group-by rewrite changes more plans than a
    * join salt, so it gets its own switch. */
  val AggEnabledKey = "spark.graft.autoSkew.agg.enabled"

  final case class Profile(hot: Seq[Any], buckets: Int)

  // weak keys: a SparkSession's profile map lives exactly as long as
  // the session object; lookups are reference-identity (SparkSession
  // does not override equals), so two sessions can never alias
  private val registry =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, Profile]]()

  /** Register a hot-key profile for the FACT-side column `key` in this
    * session — typically q92's persisted skew-profile output, collected
    * (≤ topK rows by construction). Joins whose fact side exposes `key`
    * rewrite while the flag is on, whatever the dim column is named. */
  def register(spark: SparkSession, key: String, hotKeys: Seq[Any],
               buckets: Int = 8): Unit = registry.synchronized {
    require(buckets > 0, s"buckets must be > 0 (got $buckets)")
    require(hotKeys.nonEmpty, "empty hot-key profile — don't register one")
    var m = registry.get(spark)
    if (m == null) {
      m = scala.collection.mutable.Map.empty[String, Profile]
      registry.put(spark, m)
    }
    m.put(key, Profile(hotKeys, buckets)); ()
  }

  /** Register straight from a persisted [[graft.ops.SkewTools.hotKeyProfile]]
    * output (or any 1-column hot-key table): collects at most `topK`
    * rows driver-side — the profile is ≤ topK by construction, this
    * cap just refuses to collect an arbitrary table someone passes by
    * mistake — and registers them under the profile column's NAME
    * (the fact-side join column q92 measured). The one-call bridge
    * from the measured q92 loop into the optimizer: persist the
    * profile nightly, call this at session start, flip the flag. */
  def registerFromProfile(spark: SparkSession, profile: org.apache.spark.sql.DataFrame,
                          buckets: Int = 8, topK: Int = 64): Unit = {
    require(profile.columns.length == 1,
      s"expected a 1-column hot-key profile, got ${profile.columns.mkString(",")}")
    val key = profile.columns.head
    val hot = profile.limit(topK + 1).collect().map(_.get(0)).toSeq
    require(hot.size <= topK,
      s"profile has more than $topK rows — not a hotKeyProfile output")
    // an EMPTY profile means q92 measured no skew — a no-op, not an
    // error (the session-start call must be safe to make every day)
    if (hot.nonEmpty) register(spark, key, hot, buckets)
  }

  /** Remove `key`'s profile for this session. */
  def unregister(spark: SparkSession, key: String): Unit =
    registry.synchronized {
      Option(registry.get(spark)).foreach(_.remove(key)); ()
    }

  private[plans] def lookup(spark: SparkSession, col: String): Option[Profile] =
    registry.synchronized {
      Option(registry.get(spark)).flatMap(_.get(col))
    }

  /** Marks joins this rule already produced (the rewritten join's
    * extra salt conjunct also falls outside the match pattern — the
    * tag is belt and braces against re-entry). */
  private[plans] val rewrittenTag =
    new TreeNodeTag[Boolean]("graft.autoSkew.rewritten")
}

/** The optimizer rule ([[graft.GraftExtensions]] injects it into every
  * session; it no-ops unless [[AutoSkew.EnabledKey]] is true AND some
  * fact-side join key has a registered profile). */
case class AutoSkewRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import AutoSkew._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val joinOn = spark.conf.get(EnabledKey, "false").toBoolean
    val aggOn = spark.conf.get(AggEnabledKey, "false").toBoolean
    if (!joinOn && !aggOn) return plan
    plan.transformUp {
      // INNER and LEFT OUTER equi-joins: for LEFT OUTER the fact is
      // the PRESERVED left side (the orientation every query here
      // writes), and the rewrite preserves null-extension exactly —
      // an unmatched hot fact row carries ONE salt value and the dim
      // has no replica of its key at ANY salt, so it null-extends
      // exactly once; matched rows meet their dim row at exactly one
      // salt, as in the inner case. RIGHT/FULL outer are skipped: the
      // dim-side replication would multiply preserved right rows.
      // LEFT SEMI/ANTI (r17): the dedup/exclusion shapes the L battery
      // leans on (decontamination anti-joins under a hot gram key) —
      // exactly the fact-preserved joins AQE's skew split misses
      // (OptimizeSkewedJoin handles SMJ inner/outer; a broadcast-able
      // exclusion list keeps the join a BHJ where one hot hash
      // partition UPSTREAM still straggles, and a non-broadcast one
      // shuffles on the hot key). Soundness is the same one-salt
      // argument: a fact row carries ONE salt, the dim's key exists at
      // that salt iff it exists at all (hot keys at every salt, cold
      // at 0), and semi/anti emit each fact row at most once whatever
      // the match count — so EXISTS/NOT-EXISTS per row is unchanged. A
      // NULL fact key salts 0 and still never equals any dim key —
      // anti keeps it, semi drops it, as the plain join does.
      case j @ Join(left, right, jt, Some(cond), _)
          if joinOn &&
            (jt == Inner || jt == LeftOuter || jt == LeftSemi || jt == LeftAnti) &&
            j.getTagValue(rewrittenTag).isEmpty =>
        val conjuncts = splitConjunctivePredicates(cond)
        // first equi-conjunct whose LEFT(fact)-side attribute has a
        // profile, either spelling orientation (fact=dim or dim=fact)
        val hit = conjuncts.zipWithIndex.iterator.flatMap {
          case (EqualTo(x: AttributeReference, y: AttributeReference), i) =>
            if (left.outputSet.contains(x) && right.outputSet.contains(y) &&
              lookup(spark, x.name).isDefined) Iterator((x, y, i))
            else if (left.outputSet.contains(y) && right.outputSet.contains(x) &&
              lookup(spark, y.name).isDefined) Iterator((y, x, i))
            else Iterator.empty
          case _ => Iterator.empty
        }.nextOption()
        hit match {
          case Some((la, ra, idx)) =>
            val rest = conjuncts.zipWithIndex.collect {
              case (c, i) if i != idx => c
            }
            val p = lookup(spark, la.name).get
            // a mis-typed profile must not fail the query — but the
            // fallback try is NARROW (only the Literal.create coercion
            // of the hot values), so a genuine rewrite bug still
            // surfaces instead of silently degrading to the plain join
            coerceHotLits(p, la, ra) match {
              case Some((hotL, hotR)) =>
                rewrite(j, left, right, la, ra, rest, p, hotL, hotR)
              case None => j
            }
          case None => j
        }
      // hot GROUP BY keys: the two-phase salted aggregate (the q33
      // shape) — see rewriteAgg for when this pays
      case a: Aggregate
          if aggOn && a.getTagValue(rewrittenTag).isEmpty =>
        matchAgg(a).map { case (key, p, hot) => rewriteAgg(a, key, p, hot) }
          .getOrElse(a)
    }
  }

  /** Coerce the profile's hot values to both join attributes' types up
    * front — the ONLY failure the rule tolerates by design. Returns
    * None (with a warning) on a mis-typed profile. */
  private def coerceHotLits(p: Profile, la: AttributeReference,
                            ra: AttributeReference)
      : Option[(Seq[Expression], Seq[Expression])] =
    try Some((p.hot.map(v => Literal.create(v, la.dataType)),
              p.hot.map(v => Literal.create(v, ra.dataType))))
    catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft.autoSkew: profile for '${la.name}' is not " +
          s"coercible to ${la.dataType}/${ra.dataType} " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — " +
          "falling back to the plain join")
        None
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      la: AttributeReference, ra: AttributeReference,
                      rest: Seq[Expression], p: Profile,
                      hotL: Seq[Expression],
                      hotR: Seq[Expression]): LogicalPlan = {
    // fact side: hot rows get a round-robin salt in [0, buckets),
    // cold rows salt 0 — saltFact's exact semantics as expressions
    val saltL = Alias(
      If(In(la, hotL),
        Cast(Pmod(MonotonicallyIncreasingID(), Literal(p.buckets.toLong)),
          IntegerType),
        Literal(0)),
      "__graft_salt")()
    val leftP = Project(left.output :+ saltL, left)
    // dim side: hot keys replicate once per salt value, cold keys
    // exist only at salt 0 — the dim attribute takes the FACT
    // column's hot literals (coerced to ITS type; the equi-conjunct
    // guarantees comparability)
    val arr = If(In(ra, hotR),
      CreateArray((0 until p.buckets).map(i => Literal(i))),
      CreateArray(Seq(Literal(0))))
    val saltR = AttributeReference("__graft_salt_r", IntegerType,
      nullable = false)()
    val gen = Generate(Explode(arr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(saltR),
      child = right)
    // the profiled key + the salt equality + every remaining conjunct
    // of the original condition, untouched; the JOIN TYPE is preserved
    // (Inner stays Inner, LeftOuter stays LeftOuter — null-extension
    // semantics ride the original type)
    val cond = (Seq(EqualTo(la, ra), EqualTo(saltL.toAttribute, saltR)) ++
      rest).reduce(And)
    val nj = Join(leftP, gen, j.joinType, Some(cond), j.hint)
    nj.setTagValue(rewrittenTag, true)
    // restore the original join output: the salt columns never escape
    Project(j.output, nj)
  }

  /** Match an Aggregate the salted two-phase rewrite can handle:
    * every grouping expression a plain attribute, one of them carrying
    * a registered profile, and every aggregate either a grouping
    * passthrough or an undistinct, unfiltered SUM/COUNT/MIN/MAX —
    * the decomposable class (partial-then-merge loses nothing). AVG
    * and friends are deliberately out: the caller spells sum/count
    * when it wants maintainable/decomposable aggregates (the
    * engine-wide convention). */
  private def matchAgg(a: Aggregate)
      : Option[(AttributeReference, Profile, Seq[Expression])] = {
    val groupAttrs = a.groupingExpressions.collect {
      case ar: AttributeReference => ar
    }
    if (groupAttrs.size != a.groupingExpressions.size) return None
    val shapeOk = a.aggregateExpressions.forall {
      case ar: AttributeReference => groupAttrs.exists(_.exprId == ar.exprId)
      case Alias(AggregateExpression(f, _, false, None, _), _) => f match {
        case _: Sum | _: Count | _: Min | _: Max => true
        case _ => false
      }
      case _ => false
    }
    if (!shapeOk) return None
    groupAttrs.iterator.flatMap { k =>
      lookup(spark, k.name).flatMap { p =>
        coerceHotLits(p, k, k).map { case (hot, _) => (k, p, hot) }
      }
    }.nextOption()
  }

  /** Two-phase SALTED AGGREGATE — the q33 shape as an optimizer
    * rewrite: group by (keys..., salt) first (hot keys spread
    * round-robin over `buckets`, cold keys salt 0), then merge the
    * partials by the original keys. Where it pays: when the child's
    * partitioning already satisfies the group-by (e.g. the aggregate
    * rides a join's hash exchange), ALL of a hot key's rows sit in one
    * partition and the single partial-aggregation task becomes the
    * straggler — the salt splits that task's work `buckets` ways at
    * the cost of one extra (key-count-sized) merge pass. SUM stays
    * exact for decimal/integral types (addition is associative); the
    * salted regrouping can reassociate FLOAT sums, which Spark's own
    * partial aggregation already does. Output attributes keep their
    * exprIds and types, so parent plans resolve unchanged. */
  private def rewriteAgg(a: Aggregate, key: AttributeReference, p: Profile,
                         hot: Seq[Expression]): LogicalPlan = {
    val groupAttrs = a.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val salt = Alias(
      If(In(key, hot),
        Cast(Pmod(MonotonicallyIncreasingID(), Literal(p.buckets.toLong)),
          IntegerType),
        Literal(0)),
      "__graft_salt")()
    val proj = Project(a.child.output :+ salt, a.child)
    def complete(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    // (partial alias for phase 1, final named expression for phase 2)
    // — grouping passthroughs carry no partial
    val phases: Seq[(Option[NamedExpression], NamedExpression)] =
      a.aggregateExpressions.map {
        case ar: AttributeReference => (None, ar)
        case al @ Alias(ae @ AggregateExpression(f, _, false, None, _), _) =>
          val partial = Alias(ae, s"__graft_p${al.exprId.id}")()
          val pr = partial.toAttribute
          val finalChild: Expression = f match {
            case _: Sum =>
              // re-summing widens decimal precision — cast back so the
              // output type (and the parent's resolution) is unchanged
              val s = complete(Sum(pr))
              if (s.dataType == al.dataType) s else Cast(s, al.dataType)
            case _: Count =>
              // COUNT is non-nullable; Sum-of-counts is nullable by
              // type though never null here (every final group has a
              // partial row) — Coalesce restores the static contract
              Coalesce(Seq(complete(Sum(pr)), Literal(0L)))
            case _: Min => complete(Min(pr))
            case _: Max => complete(Max(pr))
            case other =>
              throw new IllegalStateException(s"unreachable: $other")
          }
          (Some(partial), Alias(finalChild, al.name)(al.exprId, al.qualifier))
      }
    val partialAgg = Aggregate(groupAttrs :+ salt.toAttribute,
      groupAttrs ++ phases.flatMap(_._1), proj)
    partialAgg.setTagValue(rewrittenTag, true)
    val finalAgg = Aggregate(groupAttrs, phases.map(_._2), partialAgg)
    finalAgg.setTagValue(rewrittenTag, true)
    finalAgg
  }
}
