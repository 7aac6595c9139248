package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MISRA–GRIES heavy-hitters sketch as a mergeable Spark aggregate —
  * the frequent-items summary (top sources, hot keys, dominant
  * domains) with a HARD deterministic error bound, completing the
  * engine's mergeable-sketch family (HLL distinct q46, KMV quantiles
  * q48, MinHash unions d15, Bloom membership q39).
  *
  * State is at most `capacity` (item → counter) pairs. Stream update
  * is the classic rule: bump a tracked item, admit into spare room,
  * otherwise decrement EVERY counter (dropping zeros) — that global
  * decrement is what buys the guarantee. Merge (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): sum counters pairwise, and when
  * more than `capacity` survive, subtract the (capacity+1)-th largest
  * counter from all and drop the non-positive — the same bound
  * composes across partials, which is exactly what makes this a
  * one-pass map-side-combined aggregate at 100 TB: every map task
  * folds its slice into ≤ capacity pairs and only KB-scale sketches
  * cross the shuffle.
  *
  * Guarantees (n = group's total item count, k = capacity):
  *  - every reported counter is a LOWER bound on the true count, and
  *    undercounts by at most n/(k+1);
  *  - every item with true count > n/(k+1) is present in the sketch.
  * When k ≥ the group's distinct-item count no decrement ever fires
  * and the sketch IS the exact frequency table — the oracle-able
  * regime the q51 gate runs in (the driver fixture's 150 users sit
  * far under the 256 default); the decrement/merge regime is pinned
  * by a driver-mirror spec instead, because its counter values
  * legitimately depend on partition merge order (only the BOUNDS are
  * order-invariant, and bounds don't hash).
  *
  * Output: array of (item, cnt_lb) structs sorted by (cnt_lb desc,
  * item asc) — deterministic within any fixed merge tree, exact-total
  * order in the exact regime. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt_lb", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT item column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val cur = buf.getOrElse(x, 0L) // tracked counters are always ≥ 1
      if (cur > 0L) buf.update(x, cur + 1L)
      else if (buf.size < capacity) buf.update(x, 1L)
      else {
        // global decrement; zeros fall out — amortized O(1) per item
        // (each decrement consumes one prior increment)
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (k2, c) =>
          if (c == 1L) dead += k2 else buf.update(k2, c - 1L)
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreachEntry { (k2, c) => b1.update(k2, b1.getOrElse(k2, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[Long]
      b1.foreachEntry { (k2, c) =>
        if (c - cut <= 0L) dead += k2 else b1.update(k2, c - cut)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray
    // (cnt desc, item asc) — a total order, so ties can't reshuffle
    java.util.Arrays.sort(entries, (a: (Long, Long), b: (Long, Long)) => {
      val byCnt = java.lang.Long.compare(b._2, a._2)
      if (byCnt != 0) byCnt else java.lang.Long.compare(a._1, b._1)
    })
    new GenericArrayData(entries.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](item, cnt))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (k2, c) => bb.putLong(k2); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong(), bb.getLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_misra_gries"
}

object MisraGriesAgg {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  /** Column surface: `mgSketch(items, k)` → array<struct<item,cnt_lb>>
    * sorted by (cnt_lb desc, item asc). */
  def mgSketch(items: Column, capacity: Int): Column =
    toColumn(MisraGriesAgg(toExpression(items), capacity).toAggregateExpression())
}
