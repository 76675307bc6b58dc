package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution, Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Sorted-merge union — the reference's core read-path algorithm as a
  * first-class physical operator.
  *
  * The reference interleaves N time-sorted scanner streams by
  * min-head selection (`marketdb-iteratee/.../TimeSeriesEnumerator.scala:70-98`).
  * Catalyst's default plan for "union then global time order" is
  * Union + Sort (full re-sort). When the inputs are already sorted —
  * per-series scans of a `TimeSeriesTable` are — an O(n) k-way merge
  * preserves the order without sorting.
  *
  * Pieces (SURVEY §2-custom preference (c)):
  *  - `SortedMergeUnion` logical node,
  *  - `SortedMergeUnionStrategy` plans it: the merge exec when every
  *    child is small enough to sit in one partition (stats-based
  *    decision, like broadcast-join planning); otherwise falls back to
  *    Union + global Sort, which range-partitions across the cluster,
  *  - `SortedMergeUnionExec` physical node declaring
  *    `requiredChildOrdering` (children arrive sorted — a no-op if the
  *    source already is) and `outputOrdering` (downstream operators
  *    see the order for free, e.g. a subsequent limit or as-of probe).
  */
case class SortedMergeUnion(children: Seq[LogicalPlan], timeCol: String,
    tieCols: Seq[String] = Nil)
    extends LogicalPlan {
  require(children.nonEmpty, "SortedMergeUnion needs at least one child")
  /** Merge key columns: time first, then optional tiebreaks. With
    * tiebreaks forming a per-child total order, merge + limit returns a
    * deterministic row set (hard rule 4); without them, tie order
    * between equal timestamps is unspecified (reference semantics). */
  def orderCols: Seq[String] = timeCol +: tieCols
  override def output: Seq[Attribute] = children.head.output
  // declare the merge keys as referenced in EVERY child, or column
  // pruning (e.g. under a bare count()) strips them and the strategy
  // can no longer resolve the ordering
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      children.flatMap(_.output.filter(a => orderCols.contains(a.name))))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(children = newChildren)
}

object SortedMergeUnionStrategy extends SparkStrategy {
  /** Per-child size bound for the single-partition merge path
    * (overridable via -Dgraft.mergeSizeThreshold for tests/tuning). */
  def mergeSizeThreshold: Long =
    java.lang.Long.getLong("graft.mergeSizeThreshold", 256L * 1024 * 1024)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s @ SortedMergeUnion(children, _, _) =>
      val orders = s.orderCols.map { name =>
        val attr = s.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(
            s"merge column $name not in ${s.output.map(_.name)}"))
        SortOrder(attr, Ascending)
      }
      val smallEnough = children.forall(
        _.stats.sizeInBytes <= BigInt(mergeSizeThreshold))
      if (smallEnough) {
        SortedMergeUnionExec(children.map(planLater), orders) :: Nil
      } else {
        // distributed fallback: union + global sort (range partition);
        // built from physical building blocks so the same logical node
        // covers both scales
        import org.apache.spark.sql.execution.{SortExec, UnionExec}
        SortExec(orders, global = true,
          UnionExec(children.map(planLater))) :: Nil
      }
    case _ => Nil
  }
}

case class SortedMergeUnionExec(children: Seq[SparkPlan], orders: Seq[SortOrder])
    extends SparkPlan {

  private val orderNames: Seq[String] = orders.map(_.child match {
    case a: Attribute => a.name
    case other => other.sql
  })

  override def output: Seq[Attribute] = children.head.output
  override def outputOrdering: Seq[SortOrder] = orders
  override def outputPartitioning: Partitioning = SinglePartition
  // one partition per child, each sorted: EnsureRequirements inserts
  // the coalescing exchange / sort only where the child isn't already
  override def requiredChildDistribution: Seq[Distribution] =
    children.map(_ => AllTuples)
  // each child's ordering must reference THAT child's attributes
  // (schemas are name-aligned, exprIds are not)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    children.map { c =>
      orderNames.map { name =>
        val attr = c.output.find(_.name == name).getOrElse(
          throw new IllegalStateException(s"$name missing in child output"))
        SortOrder(attr, Ascending)
      }
    }

  override protected def doExecute(): RDD[InternalRow] = {
    // LazilyGeneratedOrdering serializes the expressions and
    // regenerates code on the executor (RowOrdering.create's product
    // is a non-serializable generated class); the closure must capture
    // only this (a SparkPlan itself is not serializable)
    val ordering =
      new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(
        orders, output)
    children.map(_.execute()).reduce { (l, r) =>
      l.zipPartitions(r)(SortedMergeUnionExec.mergeSorted(ordering))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(children = newChildren)
}

object SortedMergeUnionExec {
  /** Two-way merge of sorted InternalRow iterators; generalizes to
    * k-way by left-fold (merge tree). Heads are copied because
    * operator output rows may be reused by the producer. */
  def mergeSorted(ord: Ordering[InternalRow])(
      a: Iterator[InternalRow], b: Iterator[InternalRow]): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private var headA: InternalRow = advance(a)
      private var headB: InternalRow = advance(b)
      private def advance(it: Iterator[InternalRow]): InternalRow =
        if (it.hasNext) it.next().copy() else null
      override def hasNext: Boolean = headA != null || headB != null
      override def next(): InternalRow = {
        val takeA = headB == null ||
          (headA != null && ord.compare(headA, headB) <= 0)
        if (takeA) { val r = headA; headA = advance(a); r }
        else { val r = headB; headB = advance(b); r }
      }
    }
}
