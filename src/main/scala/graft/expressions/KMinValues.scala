package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a mergeable
  * TypedImperativeAggregate.
  *
  * Classic bottom-k estimator (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002; Beyer et al., SIGMOD 2007 for
  * the (k-1)/x unbiased form): keep the k smallest 64-bit hashes of the
  * values; if the k-th smallest hash, mapped to (0,1), is x, the distinct
  * count is ≈ (k-1)/x. Fully mergeable (union, re-truncate to k) → Spark
  * runs it as partial + final aggregation with map-side combine, exactly
  * like a built-in. Deterministic by construction (xxhash64, no RNG) —
  * unlike sampling sketches, repeated runs give identical estimates.
  *
  * This is the pattern for cheap per-group cardinality at 100 TB: the
  * buffer is k longs regardless of group size, so a groupBy over billions
  * of rows ships only fixed-size sketches through the shuffle.
  */
case class KMinValues(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    oracleHash: Boolean = false)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  /** Production default is xxhash64 (well-mixed). `oracleHash = true`
    * swaps in the RollingHash polynomial over a STRING child — weaker
    * mixing, but DuckDB replays it exactly in HUGEINT (CLAUDE.md rule
    * 12), which lets the gate hash-check the full sketch lifecycle in
    * the ESTIMATE regime: k-min set, k-th value, (k-1)/x eval. */
  private lazy val hasher: Expression =
    if (oracleHash) RollingHash(child) else XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    // NULLs contribute nothing, matching COUNT(DISTINCT) — XxHash64 would
    // otherwise hash every null row to the seed constant (+1 distinct)
    if (child.eval(input) == null) return buf
    val h = hasher.eval(input).asInstanceOf[Long]
    buf += h
    while (buf.size > k) buf -= buf.last
    buf
  }

  override def merge(
      a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a ++= b
    while (a.size > k) a -= a.last
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    if (buf.isEmpty) 0.0
    else if (buf.size < k) buf.size.toDouble // exact below the sketch size
    else {
      // map the k-th smallest signed hash onto (0,1)
      val kth = buf.last
      val x = (kth.toDouble - Long.MinValue.toDouble) /
        (Long.MaxValue.toDouble - Long.MinValue.toDouble)
      if (x <= 0.0) k.toDouble else (k - 1).toDouble / x
    }
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { out += bb.getLong; i += 1 }
    out
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(offset: Int): KMinValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren.head)
}

object KMinValues {
  /** Column API: kmv_distinct(col, k) — approximate COUNT(DISTINCT col). */
  def apply(c: Column, k: Int): Column =
    CatalystBridge.column(
      KMinValues(CatalystBridge.expression(c), k).toAggregateExpression())

  /** Oracle-mode variant (polynomial hash over a string column). */
  def oracle(c: Column, k: Int): Column =
    CatalystBridge.column(
      KMinValues(CatalystBridge.expression(c), k, oracleHash = true)
        .toAggregateExpression())
}
