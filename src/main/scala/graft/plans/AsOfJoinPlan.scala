package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Native as-of join — custom-operator ladder rung (c): a whole-operator
  * semantic Spark lacks, expressed as LogicalPlan + SparkStrategy +
  * SparkPlan (the AsOf.asOfJoin composition is rung (a); this is the
  * plan-native form that halves its cost).
  *
  * Semantics (same contract as AsOf.asOfJoin / DuckDB ASOF LEFT JOIN): for
  * every left row (key, ts) attach the carried columns of the right row
  * with the greatest right.ts ≤ left.ts for the same key; nulls if none.
  *
  * Why a custom operator pays here: the composed form UNIONS both inputs
  * and runs a running-`last` window — one shuffle of left+right TOGETHER,
  * then a per-partition sort of the union, then a filter dropping the
  * right rows again. This exec instead asks EnsureRequirements for each
  * side hash-clustered by key and sorted (key, ts) — the SortMergeJoin
  * cost shape — and streams ONE forward merge pass per partition: no
  * union blow-up, no window state, right side never materialized into
  * output rows. At 100 TB that is half the shuffled bytes and it composes
  * with bucketed storage (zero shuffles; BucketingSpec shape).
  */
object NativeAsOf {

  /** Logical node: created already-resolved from analyzed child plans;
    * `carriedOut` are the fresh nullable output attributes (asof_*). */
  final case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, leftTs: Attribute,
      rightKey: Attribute, rightTs: Attribute,
      carried: Seq[Attribute],
      carriedOut: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ carriedOut
    override def producedAttributes: AttributeSet = AttributeSet(carriedOut)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one-pattern match, children via planLater. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, lts, rk, rts, carried, carriedOut) =>
        AsOfJoinExec(lk, lts, rk, rts, carried, carriedOut,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical merge-scan: each side hash-clustered on its key and sorted
    * (key, ts) by EnsureRequirements; one forward pass zips the
    * co-partitioned sides. Per left row the right cursor only moves
    * forward, so the pass is O(|L| + |R|) per partition with O(1) state —
    * the classic sorted as-of merge. */
  final case class AsOfJoinExec(
      leftKey: Expression, leftTs: Expression,
      rightKey: Expression, rightTs: Expression,
      carried: Seq[Expression], carriedOut: Seq[Attribute],
      left: SparkPlan, right: SparkPlan) extends SparkPlan {

    override def output: Seq[Attribute] = left.output ++ carriedOut
    override def producedAttributes: AttributeSet = AttributeSet(carriedOut)
    override def children: Seq[SparkPlan] = Seq(left, right)
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[SparkPlan]): AsOfJoinExec =
      copy(left = newChildren(0), right = newChildren(1))

    override protected def doExecute(): RDD[InternalRow] = {
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      val lOut = left.output
      val rOut = right.output
      val lk = leftKey; val lts = leftTs
      val rk = rightKey; val rts = rightTs
      val carriedExprs = carried
      val outAttrs = output
      val carriedAttrs = carriedOut
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lkB = BindReferences.bindReference(lk, lOut)
        val ltsB = BindReferences.bindReference(lts, lOut)
        val rkB = BindReferences.bindReference(rk, rOut)
        val rtsB = BindReferences.bindReference(rts, rOut)
        val carB = carriedExprs.map(BindReferences.bindReference(_, rOut))
        val n = carB.length
        val rBuf = rIter.buffered
        val matched = new Array[Any](n)
        val nullRow = InternalRow.fromSeq(Seq.fill[Any](n)(null))
        val matchRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(matched)
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(outAttrs, lOut ++ carriedAttrs)
        var lastKey: Any = null
        var haveMatch = false

        lIter.map { lrow =>
          val lkv = lkB.eval(lrow)
          if (lkv == null) {
            // null keys never match (join-key semantics)
            proj(joined(lrow, nullRow))
          } else {
            val ltv = ltsB.eval(lrow)
            if (ltv == null) {
              // null left ts: "latest right row at-or-before NULL" has no
              // answer — emit the null row, like an unmatched key
              proj(joined(lrow, nullRow))
            } else {
              if (haveMatch && keyOrd.compare(lastKey, lkv) != 0) haveMatch = false
              var advance = true
              while (advance && rBuf.hasNext) {
                val head = rBuf.head
                val rkv = rkB.eval(head)
                if (rkv == null) { rBuf.next() } // skip unmatched-able rows
                else {
                  val c = keyOrd.compare(rkv, lkv)
                  if (c < 0) { rBuf.next(); haveMatch = false }
                  else if (c == 0) {
                    val rtv = rtsB.eval(head)
                    if (rtv == null) { rBuf.next() } // null ts never ≤ lts
                    else if (tsOrd.compare(rtv, ltv) <= 0) {
                      var i = 0
                      while (i < n) {
                        // copy: evaluated values may point into the reused row
                        matched(i) = InternalRow.copyValue(carB(i).eval(head))
                        i += 1
                      }
                      lastKey = InternalRow.copyValue(rkv)
                      haveMatch = true
                      rBuf.next()
                    } else advance = false
                  } else advance = false
                }
              }
              proj(joined(lrow, if (haveMatch) matchRow else nullRow))
            }
          }
        }
      }
    }
  }

  /** Gate query q90: identical semantics (and oracle SQL) to q58, executed
    * through the native operator instead of the union+window composition —
    * the DuckDB ASOF hash compare pins the custom exec every round. */
  def qAsOfNative(t: graft.Tables): DataFrame = {
    val ev = t.events
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    asOfJoin(clicks, purchases, "user_id", "ts", "value")
      .select("user_id", "event_id", "asof_value", "asof_ts")
      .orderBy("user_id", "event_id")
  }

  /** User-facing front door: same signature family as AsOf.asOfJoin.
    * Carries `valueCol` (as asof_<valueCol>) and the matched right ts (as
    * asof_ts). Built from the ANALYZED child plans so the node is resolved
    * by construction; the strategy is installed on the session on first
    * use (idempotent). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String): DataFrame = {
    val spark = left.sparkSession
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = GraftBridge.analyzed(left)
    // both sides often derive from the same source (self-as-of), sharing
    // exprIds; the analyzer's DeduplicateRelations doesn't know this node,
    // so mint fresh right-side exprIds via an Alias projection
    import org.apache.spark.sql.functions.col
    val rPlan = GraftBridge.analyzed(
      right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*))
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    val rv = attr(rPlan, valueCol)
    val rt = attr(rPlan, ts)
    val carriedOut = Seq(
      AttributeReference(s"asof_$valueCol", rv.dataType, nullable = true)(),
      AttributeReference("asof_ts", rt.dataType, nullable = true)())
    GraftBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, ts), attr(rPlan, key), rt,
        Seq(rv, rt), carriedOut))
  }
}
