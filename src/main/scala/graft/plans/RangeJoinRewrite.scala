package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: time-range theta joins → binned equi-joins.
  *
  * A join whose only condition is a time band — `b.ts BETWEEN a.ts + lo AND
  * a.ts + hi` — has no equi key, so Spark plans BroadcastNestedLoopJoin (one
  * side fully replicated, O(|A|·|B|) compares): the plan that dies first at
  * 100 TB. The standard scalable execution is interval binning, which q98
  * hand-writes with the DataFrame API; this rule is the engine-grade version
  * — users write the NAIVE theta join in plain SQL and the optimizer
  * rewrites it (the same user experience as a Databricks-style range-join
  * optimization, rebuilt on open Catalyst APIs).
  *
  * Rewrite: with band width W = hi - lo, tag the `a` side with bin
  * `floor(µs(a)/W)` EXPLODED to {bin, bin+1}, tag the `b` side with
  * `floor((µs(b)-lo)/W)`, and equi-join on the bin with the ORIGINAL band
  * predicate as exact residual. Every true pair lands in exactly one shared
  * bin (µs(b)-lo ∈ [µs(a), µs(a)+W] ⇒ its bin ∈ {binA, binA+1}), so the
  * join is a plain hash-partitioned equi-join: candidate mass is linear in
  * rows-per-band, the 2× explode is the only overhead, and the residual
  * keeps the result exact. Division is integral (`div`) on epoch micros —
  * no floating-point bin boundaries.
  *
  * Installed via `spark.experimental.extraOptimizations` (that batch runs
  * to fixpoint, hence the rewritten-marker guard) — the injection point
  * Spark exposes for exactly this kind of session-scoped optimizer
  * extension; `SparkSessionExtensions.injectOptimizerRule` is the
  * builder-time equivalent.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  private val BinName = "__graft_bin"

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Normalize a conjunct to (isLower, b, a, shiftMicros) meaning
    * `b >= a + shift` (lower) or `b <= a + shift` (upper), for TimestampType
    * attributes and literal day-time intervals in any written orientation.
    */
  private def bound(e: Expression)
      : Option[(Boolean, AttributeReference, AttributeReference, Long)] = {
    def shifted(x: Expression): Option[(AttributeReference, Long)] = x match {
      case a: AttributeReference if a.dataType == TimestampType => Some((a, 0L))
      case TimestampAddInterval(a: AttributeReference,
          Literal(v: Long, _: DayTimeIntervalType), _) if a.dataType == TimestampType =>
        Some((a, v))
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(b: AttributeReference, rhs) if b.dataType == TimestampType =>
        shifted(rhs).map { case (a, v) => (true, b, a, v) }
      case LessThanOrEqual(b: AttributeReference, rhs) if b.dataType == TimestampType =>
        shifted(rhs).map { case (a, v) => (false, b, a, v) }
      case GreaterThanOrEqual(lhs, b: AttributeReference) if b.dataType == TimestampType =>
        shifted(lhs).map { case (a, v) => (false, b, a, v) } // a + v >= b ≡ b <= a + v
      case LessThanOrEqual(lhs, b: AttributeReference) if b.dataType == TimestampType =>
        shifted(lhs).map { case (a, v) => (true, b, a, v) } // a + v <= b ≡ b >= a + v
      case _ => None
    }
  }

  /** A conjunct that already gives the join a shuffle key: attr = attr
    * across sides. If one exists the planner hash-partitions on it and the
    * band is a cheap residual — binning would only add explode overhead.
    */
  private def hasEquiKey(j: Join, conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists {
      case EqualTo(l: AttributeReference, r: AttributeReference) =>
        (j.left.outputSet.contains(l) && j.right.outputSet.contains(r)) ||
          (j.left.outputSet.contains(r) && j.right.outputSet.contains(l))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Never touch streaming joins: stream-stream join state eviction is
    // derived from the ORIGINAL condition's event-time bounds, and the
    // stateful operator does its own range bookkeeping.
    case j @ Join(left, right, Inner, Some(cond), _)
        if !j.isStreaming && !hasEquiKey(j, splitAnd(cond)) &&
          !cond.references.exists(_.name.startsWith(BinName)) =>
      val bounds = splitAnd(cond).flatMap(bound)
      val band = (for {
        (isLo, b1, a1, lo) <- bounds if isLo
        (isHi, b2, a2, hi) <- bounds if !isHi
        if b1.semanticEquals(b2) && a1.semanticEquals(a2) && hi > lo
      } yield (b1, a1, lo, hi)).headOption
      band match {
        case Some((b, a, lo, hi)) if left.outputSet.contains(a) && right.outputSet.contains(b) =>
          rewrite(j, left, right, a, b, lo, hi, aOnLeft = true)
        case Some((b, a, lo, hi)) if right.outputSet.contains(a) && left.outputSet.contains(b) =>
          rewrite(j, right, left, a, b, lo, hi, aOnLeft = false)
        case _ => j
      }
  }

  private def rewrite(j: Join, aSide: LogicalPlan, bSide: LogicalPlan,
      a: AttributeReference, b: AttributeReference,
      lo: Long, hi: Long, aOnLeft: Boolean): LogicalPlan = {
    val w = Literal(hi - lo, LongType)
    val aBin = new IntegralDivide(UnixMicros(a), w)
    val binL = AttributeReference(BinName + "_a", LongType)()
    val aTagged = Generate(
      Explode(CreateArray(Seq(aBin, Add(aBin, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binL), child = aSide)
    val bBin = new IntegralDivide(
      Subtract(UnixMicros(b), Literal(lo, LongType)), w)
    val binR = Alias(bBin, BinName + "_b")()
    val bTagged = Project(bSide.output :+ binR, bSide)
    val newCond = And(EqualTo(binL, binR.toAttribute), j.condition.get)
    val newJoin =
      if (aOnLeft) Join(aTagged, bTagged, Inner, Some(newCond), j.hint)
      else Join(bTagged, aTagged, Inner, Some(newCond), j.hint)
    Project(j.output, newJoin)
  }
}
