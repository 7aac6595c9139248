package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-GROUP MinHash signature: the elementwise minimum, over every
  * shingle hash of every row in the group, of `numHashes` independent
  * permutation hashes — i.e. the MinHash sketch of the UNION of the
  * group's shingle sets (min is associative/commutative/idempotent,
  * so the union sketch equals the merge of per-doc sketches).
  *
  * This is the aggregation shape a 100 TB sketching pass needs:
  * `TypedImperativeAggregate` participates in partial aggregation, so
  * every map task folds its rows into one 8·numHashes-byte buffer and
  * only buffers cross the shuffle — corpus bytes never move. The same
  * mergeability serves cluster-level signatures (group = near-dup
  * cluster), per-source dedup summaries, or incremental refresh
  * (yesterday's sketch ⊔ today's batch).
  *
  * The permutation family is `portableMix64(x ⊕ seed_s)` — 32-bit
  * multiply constants only, so a DuckDB oracle recomputes the exact
  * signature (64×64 multiplies would overflow INT128; see the d08
  * oracle note in SparkEntry). Minima compare as SIGNED longs in both
  * engines. Null input arrays contribute nothing; a group with no
  * shingles at all evaluates to Long.MaxValue entries (the empty-set
  * sketch identity), never null.
  *
  * Reference anchor: the reference has no aggregation beyond SUM/GROUP
  * BY (`README.md:150-151`, SURVEY.md §2 O19); this extends the
  * engine's aggregate surface with a custom mergeable-state function —
  * the category Spark exposes as `TypedImperativeAggregate` (what
  * `approx_count_distinct`'s HLL uses underneath).
  */
case class MinHashUnionAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val seeds: Array[Long] = MinHashUnionAgg.seeds(numHashes)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sd = seeds
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val z = SketchExpressions.portableMix64(x ^ sd(s))
          if (z < buf(s)) buf(s) = z
          s += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var s = 0
    while (s < numHashes) {
      if (b2(s) < b1(s)) b1(s) = b2(s)
      s += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var s = 0
    while (s < numHashes) { bb.putLong(buf(s)); s += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_union"
}

object MinHashUnionAgg {
  /** Permutation seeds, derived with a 32-bit multiplier so the same
    * constants are reproducible in external SQL; exposed so oracle
    * builders can inline them. */
  def seeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(s =>
      SketchExpressions.portableMix64(2654435761L * (s + 1)))
}
