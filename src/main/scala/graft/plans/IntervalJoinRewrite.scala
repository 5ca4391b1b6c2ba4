package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule (extension-ladder tier (c), registered through
  * [[graft.GraftExtensions]]): rewrite a PURE interval join —
  *
  *   left JOIN right ON left.t >= right.lo AND left.t < right.hi
  *
  * with no equality conjunct — into the bucketed equi-join shape of
  * [[graft.operators.RangeJoin]]. Spark's only physical plan for an
  * equality-free join condition is BroadcastNestedLoopJoin (quadratic,
  * and memory-bound on the broadcast side); after this rewrite the join
  * carries a bucket equality, so the planner picks a shuffle-hash /
  * sort-merge join and the original predicate survives as the exact
  * containment filter.
  *
  * Scope kept deliberately tight (the honest part of a tier-(c)
  * extension is knowing when NOT to fire): inner joins, timestamp
  * endpoints, exactly the two range conjuncts, no existing equality —
  * joins that already have an equi key plan fine without help. Bucket
  * width is fixed at one hour; intervals explode to span/width + 1
  * candidate rows (epoch-positive timestamps assumed — integral division
  * is used as floor).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  val bucketMs: Long = 3600L * 1000

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def bucketOf(t: Expression): Expression =
    IntegralDivide(UnixMillis(t), Literal(bucketMs))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && {
          val cs = splitConjuncts(cond)
          cs.length == 2 && extractRange(cs, left, right).isDefined
        } =>
      val Some((t, lo, hi)) = extractRange(splitConjuncts(cond), left, right)
      // left gains its single bucket; right explodes to covered buckets
      val lBucket = Alias(bucketOf(t), "__graft_bucket_l")()
      val newLeft = Project(left.output :+ lBucket, left)
      // degenerate intervals match nothing in the original semantics —
      // drop them so the bucket sequence is never descending. Compare in
      // MILLIS (the bucket unit): a sub-millisecond interval straddling a
      // bucket boundary passes hi > lo at microsecond precision but still
      // yields stopBucket < startBucket, and Sequence with an explicit
      // step would throw at runtime.
      val nonEmpty = Filter(
        GreaterThanOrEqual(
          Subtract(UnixMillis(hi), Literal(1L)), UnixMillis(lo)),
        right)
      val buckets = Alias(
        Sequence(
          bucketOf(lo),
          // hi is exclusive → last covered bucket holds hi - 1ms
          IntegralDivide(Subtract(UnixMillis(hi), Literal(1L)), Literal(bucketMs)),
          Some(Literal(1L)))
          // TimeZoneAwareExpression: unresolved until a zone is bound
          .withTimeZone(conf.sessionLocalTimeZone),
        "__graft_buckets")()
      val withBuckets = Project(right.output :+ buckets, nonEmpty)
      val rBucketAttr = AttributeReference("__graft_bucket_r", LongType)()
      val exploded = Generate(
        Explode(buckets.toAttribute),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(rBucketAttr),
        child = withBuckets)
      val newRight = Project(right.output :+ rBucketAttr, exploded)
      val newCond = And(EqualTo(lBucket.toAttribute, rBucketAttr), cond)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
  }

  /** Matches exactly { t >= lo, t < hi } (either conjunct order, either
    * operand orientation) with t from the left side and lo/hi from the
    * right, all TimestampType. */
  private def extractRange(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    val leftOut = left.outputSet
    val rightOut = right.outputSet
    def sides(a: Expression, b: Expression): Boolean =
      a.references.subsetOf(leftOut) && a.references.nonEmpty &&
        b.references.subsetOf(rightOut) && b.references.nonEmpty &&
        a.dataType == TimestampType && b.dataType == TimestampType

    // normalize to (t, lo) meaning t >= lo
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(t, lo) if sides(t, lo) => (t, lo)
      case LessThanOrEqual(lo, t) if sides(t, lo) => (t, lo)
    }
    // normalize to (t, hi) meaning t < hi
    val upper = conjuncts.collectFirst {
      case LessThan(t, hi) if sides(t, hi) => (t, hi)
      case GreaterThan(hi, t) if sides(t, hi) => (t, hi)
    }
    for {
      (t1, lo) <- lower
      (t2, hi) <- upper
      if t1.semanticEquals(t2)
    } yield (t1, lo, hi)
  }
}
