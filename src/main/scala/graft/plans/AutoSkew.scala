package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.IntegerType

/** OPT-IN automatic skew-join rewriting — the q92 → q94 loop closed
  * inside the optimizer: a session that has measured its hot keys
  * (q92's skew profile, persisted) registers them here, flips
  * `spark.graft.autoSkew.enabled`, and every INNER equi-join on the
  * registered column is rewritten into the
  * [[graft.ops.SkewTools.saltedJoinProfiled]] shape — hot fact rows
  * salted round-robin over `buckets`, dim rows replicated once per
  * salt FOR THE HOT KEYS ONLY, cold keys joining exactly once at
  * salt 0 — without the query author touching the query.
  *
  * OFF BY DEFAULT. Two deliberate design points:
  *  - The profile arrives as REGISTERED VALUES, not a plan: q94's
  *    hand-built shape joins a broadcast profile table because it
  *    computes the profile in-query; here the profile is already a
  *    ≤topK driver-side list, so the hot test inlines as an IN
  *    literal — the rewritten plan carries NO extra join at all.
  *  - The LEFT side is the fact (gets the salt column), the RIGHT
  *    the dimension (gets the replication explode) — the
  *    `fact.join(dim, key)` orientation every query in this engine
  *    writes. Registration is per (session, column name).
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

  /** Session config flag gating the rule (default false). */
  val EnabledKey = "spark.graft.autoSkew.enabled"

  final case class Profile(hot: Seq[Any], buckets: Int)

  // keyed by (sessionUUID, column name): profiles are session state,
  // and two concurrent sessions must not see each other's hot keys
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Profile]()

  private def rkey(spark: SparkSession, col: String): String =
    System.identityHashCode(spark) + "/" + col

  /** Register a hot-key profile for `key` in this session — typically
    * q92's persisted skew-profile output, collected (≤ topK rows by
    * construction). Joins on `key` rewrite while the flag is on. */
  def register(spark: SparkSession, key: String, hotKeys: Seq[Any],
               buckets: Int = 8): Unit = {
    require(buckets > 0, s"buckets must be > 0 (got $buckets)")
    require(hotKeys.nonEmpty, "empty hot-key profile — don't register one")
    registry.put(rkey(spark, key), Profile(hotKeys, buckets)); ()
  }

  /** Remove `key`'s profile for this session. */
  def unregister(spark: SparkSession, key: String): Unit = {
    registry.remove(rkey(spark, key)); ()
  }

  private[plans] def lookup(spark: SparkSession, col: String): Option[Profile] =
    Option(registry.get(rkey(spark, col)))

  /** Marks joins this rule already produced (the rewritten join's
    * two-conjunct condition also falls outside the match pattern —
    * the tag is belt and braces against re-entry). */
  private[plans] val rewrittenTag =
    new TreeNodeTag[Boolean]("graft.autoSkew.rewritten")
}

/** The optimizer rule ([[graft.GraftExtensions]] injects it into every
  * session; it no-ops unless [[AutoSkew.EnabledKey]] is true AND the
  * join key has a registered profile). */
case class AutoSkewRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import AutoSkew._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner,
          Some(EqualTo(la: AttributeReference, ra: AttributeReference)), _)
          if j.getTagValue(rewrittenTag).isEmpty &&
            la.name == ra.name &&
            left.outputSet.contains(la) && right.outputSet.contains(ra) &&
            lookup(spark, la.name).isDefined =>
        rewrite(j, left, right, la, ra, lookup(spark, la.name).get)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      la: AttributeReference, ra: AttributeReference,
                      p: Profile): LogicalPlan = {
    def hotLits(dt: org.apache.spark.sql.types.DataType): Seq[Expression] =
      p.hot.map(v => Literal.create(v, dt))
    // fact side: hot rows get a round-robin salt in [0, buckets),
    // cold rows salt 0 — saltFact's exact semantics as expressions
    val saltL = Alias(
      If(In(la, hotLits(la.dataType)),
        Cast(Pmod(MonotonicallyIncreasingID(), Literal(p.buckets.toLong)),
          IntegerType),
        Literal(0)),
      "__graft_salt")()
    val leftP = Project(left.output :+ saltL, left)
    // dim side: hot keys replicate once per salt value, cold keys
    // exist only at salt 0
    val arr = If(In(ra, hotLits(ra.dataType)),
      CreateArray((0 until p.buckets).map(i => Literal(i))),
      CreateArray(Seq(Literal(0))))
    val saltR = AttributeReference("__graft_salt_r", IntegerType,
      nullable = false)()
    val gen = Generate(Explode(arr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(saltR),
      child = right)
    val cond = And(EqualTo(la, ra), EqualTo(saltL.toAttribute, saltR))
    val nj = Join(leftP, gen, Inner, Some(cond), j.hint)
    nj.setTagValue(rewrittenTag, true)
    // restore the original join output: the salt columns never escape
    Project(j.output, nj)
  }
}
