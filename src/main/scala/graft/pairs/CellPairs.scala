package graft.pairs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/**
 * Pair emission for one salted-grid cell (see `Candidates.saltedSelfJoin`):
 * a custom Generator that streams (src, dst) pairs with src <= dst under the
 * element type's ordering — all unordered pairs of `ls` when the cell is a
 * self cell, the ls x rs cross product otherwise.
 *
 * This replaces the previous higher-order-function construction
 * (`flatten(transform(idx, i => transform(idx, j => when(i < j, ...))))` +
 * `filter` + `sort_array` on both lists), which was measured as the single
 * hottest stage of the 1M pipeline: the HOF form allocates k^2 structs per
 * self cell (half of them null, built only to be filtered), materializes
 * the full pair array per row before exploding, and pays an O(k log k)
 * sort per cell that the pair set does not need (src/dst orientation comes
 * from a per-pair comparison, not list order). The generator emits each
 * pair exactly once through an iterator — no null padding, no intermediate
 * arrays, no sort — and the emitted pair multiset is identical
 * (CandidatesSpec pins parity against the naive self-join).
 *
 * Generic over the id type (image ids are strings, the document/embedding
 * twins use bigint ids); ordering is the type's own interpreted ordering —
 * the same one SQL `least`/`greatest` apply — so src/dst orientation
 * matches the previous expression exactly.
 */
case class CellPairs(ls: Expression, rs: Expression, selfCell: Expression)
    extends Expression
    with Generator
    with CodegenFallback {

  override def children: Seq[Expression] = Seq(ls, rs, selfCell)

  private lazy val elemType: DataType =
    ls.dataType.asInstanceOf[ArrayType].elementType

  private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("src", elemType, nullable = false),
    StructField("dst", elemType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val l = ls.eval(input).asInstanceOf[ArrayData]
    val isSelf = selfCell.eval(input).asInstanceOf[Boolean]
    if (l == null || l.numElements() == 0) return Iterator.empty
    val la = l.toObjectArray(elemType)

    if (isSelf) {
      if (la.length < 2) return Iterator.empty
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < la.length - 1
        override def next(): InternalRow = {
          val a = la(i); val b = la(j)
          j += 1
          if (j >= la.length) { i += 1; j = i + 1 }
          pairRow(a, b)
        }
      }
    } else {
      val r = rs.eval(input).asInstanceOf[ArrayData]
      if (r == null || r.numElements() == 0) return Iterator.empty
      val ra = r.toObjectArray(elemType)
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 0
        override def hasNext: Boolean = i < la.length
        override def next(): InternalRow = {
          val a = la(i); val b = ra(j)
          j += 1
          if (j >= ra.length) { j = 0; i += 1 }
          pairRow(a, b)
        }
      }
    }
  }

  private def pairRow(a: Any, b: Any): InternalRow =
    if (ordering.lteq(a, b)) InternalRow(a, b) else InternalRow(b, a)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellPairs =
    copy(ls = newChildren(0), rs = newChildren(1), selfCell = newChildren(2))

  override def prettyName: String = "cell_pairs"
}

object CellPairs {
  /** (src, dst) pair rows for a grid cell: `df.select(CellPairs.col(...))`
    * expands to the two-column generator output. */
  def col(ls: Column, rs: Column, selfCell: Column): Column =
    GraftBridge.column(CellPairs(
      GraftBridge.expression(ls),
      GraftBridge.expression(rs),
      GraftBridge.expression(selfCell)))
}
