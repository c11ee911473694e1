package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.TimestampType

/** Native AS-OF JOIN — the full custom-operator ladder (LogicalPlan →
  * SparkStrategy → SparkPlan) for the one relational operator every
  * time-series/feature-store workload needs and Spark lacks as a first-class
  * node (pandas merge_asof / kdb aj): for each left row, the single right
  * row with the same key and the greatest timestamp ≤ the left timestamp.
  *
  * The composition form (union-tag + window, q96) is one scalable answer;
  * this operator is the ENGINE answer: each side declares
  * `ClusteredDistribution(key)` and per-partition `(key, ts)` ordering, so
  * EnsureRequirements co-partitions both children on the key hash, and the
  * exec does ONE synchronized forward merge per partition — O(|L|+|R|)
  * compares, O(1) state (the last right row's key/ts), zero buffering of
  * either side. At 100 TB that is one shuffle per side and a streaming merge
  * per partition — strictly less state than the window form, which must
  * hold each key's sort run. `zipPartitions` hard-fails on partition-count
  * mismatch, so a co-partitioning regression is loud, never silent.
  *
  * Match output is the right timestamp (the canonical as-of payload; carrying
  * more right columns is mechanical — the row is already in hand).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: AttributeReference,
    rightKey: AttributeReference,
    leftTs: AttributeReference,
    rightTs: AttributeReference,
    matchAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchAttr
  override def producedAttributes: AttributeSet = AttributeSet(matchAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, m) =>
      AsOfJoinExec(lk, rk, lt, rt, m, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: AttributeReference,
    rightKey: AttributeReference,
    leftTs: AttributeReference,
    rightTs: AttributeReference,
    matchAttr: AttributeReference,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchAttr
  override def producedAttributes: AttributeSet = AttributeSet(matchAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey.asInstanceOf[Expression], left.output)
    val lt = BindReferences.bindReference(leftTs.asInstanceOf[Expression], left.output)
    val rk = BindReferences.bindReference(rightKey.asInstanceOf[Expression], right.output)
    val rt = BindReferences.bindReference(rightTs.asInstanceOf[Expression], right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // right rows are held across left-row iterations (the merge head), so
      // copy them out of the scan's reused buffer; left rows are projected
      // before the next one is fetched and need no copy.
      val rs = ri.map(_.copy()).buffered
      val proj = UnsafeProjection.create(outAttrs.map(a => a: Expression), outAttrs)
      val matchRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var lastKey: Any = null
      var lastTs: Any = null
      li.map { lrow =>
        val lKeyV = lk.eval(lrow)
        val lTsV = lt.eval(lrow)
        // consume every right row at or before (key, ts): strictly forward,
        // each right row visited once per partition
        var advancing = true
        while (advancing && rs.hasNext) {
          val hKey = rk.eval(rs.head)
          val c = keyOrd.compare(hKey, lKeyV)
          if (c < 0 || (c == 0 && tsOrd.compare(rt.eval(rs.head), lTsV) <= 0)) {
            val r = rs.next()
            lastKey = rk.eval(r)
            lastTs = rt.eval(r)
          } else {
            advancing = false
          }
        }
        val matched = lastKey != null && keyOrd.compare(lastKey, lKeyV) == 0
        matchRow.update(0, if (matched) lastTs else null)
        proj(joined(lrow, matchRow))
      }
    }
  }
}

/** DataFrame-level API over the custom node (the strategy installs lazily,
  * session-wide, idempotently — same pattern as [[RangeJoinRewrite]]).
  */
object AsOf {
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, ts: String, as: String): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    plan(spark, left, right, key, ts, as)
  }

  /** Build the custom logical node WITHOUT installing the strategy — for
    * sessions where [[graft.pg.PgExtensions]] already injected it.
    */
  def plan(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, ts: String, as: String): DataFrame = {
    def attr(plan: LogicalPlan, name: String): AttributeReference =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output}"))
        .asInstanceOf[AttributeReference]
    val lPlan = org.apache.spark.sql.graft.Internals.analyzedPlan(left)
    val rPlan0 = org.apache.spark.sql.graft.Internals.analyzedPlan(right)
    // Self-join hygiene: when both sides descend from the same relation
    // they share exprIds, and the analyzer's DeduplicateRelations cannot
    // disambiguate references held inside a node type it doesn't know —
    // so give the right side fresh output ids up front.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty) {
        import org.apache.spark.sql.catalyst.plans.logical.Project
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      } else rPlan0
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key), attr(lPlan, ts), attr(rPlan, ts),
      AttributeReference(as, TimestampType, nullable = true)())
    org.apache.spark.sql.graft.Internals.ofRows(spark, node)
  }
}
