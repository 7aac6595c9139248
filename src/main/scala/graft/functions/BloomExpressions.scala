package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Portable Bloom filter over BIGINT keys — the explicit form of the
  * runtime row-level filter (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injects the same shape):
  * build a compact bitset from the SMALL join side, broadcast it, and
  * drop non-joining fact rows BEFORE they reach the join's shuffle.
  * At 100 TB the win is that pruned rows never serialize into an
  * exchange: the bitset rides one broadcast (mBits/8 bytes), and the
  * probe is a per-row expression inside whole-stage codegen.
  *
  * Portability: bit positions come from `portableMix64(key ⊕ seed_j)`
  * (32-bit multiplier constants — DuckDB recomputes the chain without
  * HUGEINT overflow; the SQL spelling is `SparkEntry.mixSqlU`, the
  * same finalizer the d12 simhash oracle re-derives), with
  * `seed_j = GOLD·(j+1) mod 2^64` inlined as literals in oracle SQL.
  * mBits is a power of two so `mod` is a mask on both engines. The
  * whole chain is hash-certified end-to-end by the q39 gate query
  * ([[graft.operators.Relational.bloomPrefilterFlags]]).
  *
  * [[BloomBuildAgg]] is a [[TypedImperativeAggregate]]: map tasks fold
  * their keys into one local bitset and only bitsets cross the
  * shuffle (word-wise OR merge — associative, commutative,
  * idempotent, so partial aggregation and speculative re-execution
  * are both safe).
  */
object BloomExpressions {
  /** 2^63-safe golden-ratio step; seeds are full 64-bit literals (no
    * SQL-side multiply needed — inlined by oracle builders). */
  private val Gold = 0x9e3779b97f4a7c15L

  def seed(j: Int): Long = Gold * (j + 1)

  def bitPosition(key: Long, j: Int, mBits: Int): Int =
    (SketchExpressions.portableMix64(key ^ seed(j)) & (mBits - 1)).toInt

  /** Probe kernel, shared by interpreted eval and generated code (one
    * static call keeps the probe inside whole-stage codegen). */
  def mightContain(bloom: Array[Byte], key: Long, mBits: Int, k: Int): Boolean = {
    var j = 0
    while (j < k) {
      val pos = bitPosition(key, j, mBits)
      if ((bloom(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      j += 1
    }
    true
  }

  /** Bitset aggregate: bytes laid out little-endian-by-byte (bit i of
    * the filter is bit `i & 7` of byte `i >>> 3`), so build and probe
    * agree without any word-width bookkeeping. */
  case class BloomBuildAgg(
      child: Expression,
      mBits: Int,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    require(mBits >= 8 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 8, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    // analysis-time type error on a non-BIGINT key, not a runtime
    // ClassCastException in update()
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${child.dataType.simpleString}")

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits >>> 3)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.asInstanceOf[Long]
        var j = 0
        while (j < k) {
          val pos = bitPosition(key, j, mBits)
          buf(pos >>> 3) = (buf(pos >>> 3) | (1 << (pos & 7))).toByte
          j += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
      b1
    }

    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_bloom_build"
  }

  /** Per-row membership probe; `left` is the (broadcast) bitset,
    * `right` the BIGINT key. Codegen emits one static kernel call so
    * the probe never breaks a WholeStageCodegen span. */
  case class BloomMightContain(left: Expression, right: Expression, mBits: Int, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY bitset, BIGINT key), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

    override protected def nullSafeEval(bloom: Any, key: Any): Any =
      mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long], mBits, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, key) =>
        s"${ev.value} = graft.functions.BloomExpressions.mightContain($b, $key, $mBits, $k);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "graft_bloom_might_contain"
  }

  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  def bloomBuild(key: Column, mBits: Int, k: Int): Column =
    toColumn(BloomBuildAgg(toExpression(key), mBits, k).toAggregateExpression())
  def bloomContains(bloom: Column, key: Column, mBits: Int, k: Int): Column =
    toColumn(BloomMightContain(toExpression(bloom), toExpression(key), mBits, k))
}
