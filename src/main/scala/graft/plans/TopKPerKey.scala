package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.BaseOrdering
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.Platform

/** Whole-operator custom Catalyst work (SURVEY.md §2.1 preference
  * (c)): TOP-K PER KEY as a first-class plan node.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY key
  * ORDER BY ord)` then `rank <= k` — must SORT every partition's full
  * row set before discarding all but k rows per key. This node keeps
  * a bounded k-row heap per key instead: one pass, O(rows · log k)
  * comparisons, memory O(keys-per-partition · k) — at 100 TB that is
  * the difference between spilling a full sort of the fact table and
  * streaming it once.
  *
  * SPILL SAFETY: held bytes are tracked against `maxHeldBytes`; on
  * breach the current heaps are drained to a SORTED local spill
  * segment (ordered by key bytes, then the requested row order) and
  * the pass continues with empty heaps. A partition that never
  * spills emits straight from its heaps; one that spilled finishes
  * with a streaming k-way merge over its segments, emitting the
  * first k rows per key group with O(segments) memory — so the
  * many-distinct-keys regime (where keys·k rows cannot fit) degrades
  * to external-merge behavior instead of OOM, the same shape Spark's
  * sort-based window path has, but only over the ≤ k-per-key-per-
  * segment survivors rather than the raw input.
  *
  * The full extension stack: logical [[TopKPerKey]] → planner
  * [[TopKStrategy]] (session-scoped via
  * `spark.experimental.extraStrategies` or injected by
  * [[graft.functions.GraftExtensions]]) → physical
  * [[TopKPerKeyExec]], constructed through the
  * [[org.apache.spark.sql.graftbridge.Bridge]] seam.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxHeldBytes: Long = TopK.defaultMaxHeldBytes) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxHeldBytes > 0, "maxHeldBytes must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node; a no-op for every other operator. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, maxHeldBytes) =>
      TopKPerKeyExec(keys, order, k, planLater(child), maxHeldBytes) :: Nil
    case _ => Nil
  }
}

/** One pass, one bounded heap per key. Requires clustering on the
  * keys — EnsureRequirements inserts the single hash exchange, the
  * same shuffle the window formulation pays, after which rows stream
  * through without sorting (unless the byte budget forces sorted
  * spill segments; see the class doc). */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    maxHeldBytes: Long = TopK.defaultMaxHeldBytes) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys = BindReferences.bindReferences(keys, childOutput)
    val boundOrder = BindReferences.bindReferences(order, childOutput)
    val numFields = childOutput.size
    val budget = maxHeldBytes
    val kk = k
    child.execute().mapPartitions { it =>
      new TopKPartitionIterator(it, boundKeys, boundOrder, kk, numFields, budget)
    }
  }
}

/** Per-partition driver of the heap pass + optional spill merge. */
private[plans] final class TopKPartitionIterator(
    input: Iterator[InternalRow],
    boundKeys: Seq[Expression],
    boundOrder: Seq[SortOrder],
    k: Int,
    numFields: Int,
    maxHeldBytes: Long) extends Iterator[UnsafeRow] {

  private val keyProj = UnsafeProjection.create(boundKeys)
  // "first" under the requested SortOrder = rank 1.
  private val ordering: BaseOrdering = GenerateOrdering.generate(boundOrder)
  // max-heap of each key's current k best: head = the worst kept row,
  // evicted when a better one arrives.
  private val heapCmp = new java.util.Comparator[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(b, a)
  }
  // segment order: key bytes lexicographically (any total order that
  // groups equal keys works — UnsafeRow equality is bytes equality),
  // then the requested row order, so a k-way merge sees each key as
  // one contiguous group with rows arriving best-first.
  private def compareKeyBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
  private var heldBytes = 0L
  private val spills = scala.collection.mutable.ArrayBuffer.empty[File]
  private val openReaders = scala.collection.mutable.ArrayBuffer.empty[SegmentReader]

  // ---- pass 1: heap fold under the byte budget -------------------------
  locally {
    // Close readers before deleting: a downstream consumer that stops
    // early (LIMIT) leaves merge streams open, and the files must not
    // outlive the task either way.
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      openReaders.foreach(_.close())
      spills.foreach(f => if (f.exists()) f.delete())
    })
    while (input.hasNext) {
      val row = input.next().asInstanceOf[UnsafeRow]
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k + 1, heapCmp)
        val kc = key.copy()
        heaps.put(kc, heap)
        heldBytes += kc.getSizeInBytes + 64
      }
      if (heap.size < k) {
        val rc = row.copy()
        heap.add(rc)
        heldBytes += rc.getSizeInBytes + 48
      } else if (ordering.compare(row, heap.peek()) < 0) {
        val out = heap.poll()
        val rc = row.copy()
        heap.add(rc)
        heldBytes += rc.getSizeInBytes - out.getSizeInBytes
      }
      if (heldBytes > maxHeldBytes) spillCurrentHeaps()
    }
  }

  private def sortedHeldRows(): (Array[UnsafeRow], java.util.IdentityHashMap[UnsafeRow, Array[Byte]]) = {
    val buf = new java.util.ArrayList[UnsafeRow]()
    heaps.values.iterator.asScala.foreach { h =>
      val arr = h.toArray(new Array[UnsafeRow](h.size))
      buf.addAll(java.util.Arrays.asList(arr: _*))
    }
    val rows = buf.toArray(new Array[UnsafeRow](buf.size))
    val keyBytes = new java.util.IdentityHashMap[UnsafeRow, Array[Byte]]()
    rows.foreach(r => keyBytes.put(r, keyProj(r).copy().getBytes))
    java.util.Arrays.sort(rows, new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = {
        val d = compareKeyBytes(keyBytes.get(a), keyBytes.get(b))
        if (d != 0) d else ordering.compare(a, b)
      }
    })
    (rows, keyBytes)
  }

  private def spillCurrentHeaps(): Unit = {
    val (rows, keyBytes) = sortedHeldRows()
    val file = File.createTempFile("graft_topk_", ".spill", TopK.spillDir())
    spills += file
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
    try {
      val writeBuffer = new Array[Byte](4096)
      rows.foreach { r =>
        val kb = keyBytes.get(r)
        out.writeInt(kb.length)
        out.write(kb)
        out.writeInt(r.getSizeInBytes)
        r.writeToStream(out, writeBuffer)
      }
      out.writeInt(-1) // segment terminator
    } finally out.close()
    heaps = new java.util.HashMap()
    heldBytes = 0L
  }

  private final class SegmentReader(file: File) {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file), 1 << 16))
    private var closed = false
    var row: UnsafeRow = _
    var keyBytes: Array[Byte] = _
    openReaders += this
    advance()
    def close(): Unit = if (!closed) { closed = true; in.close() }
    def advance(): Unit = {
      // segment record: [keyLen][keyBytes][rowLen][rowBytes] — the key
      // bytes were computed for the pre-spill sort, so the merge is a
      // pure read with no re-projection
      val keyLen = in.readInt()
      if (keyLen < 0) { row = null; keyBytes = null; close() }
      else {
        val kb = new Array[Byte](keyLen)
        in.readFully(kb)
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val r = new UnsafeRow(numFields)
        r.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET, len)
        row = r
        keyBytes = kb
      }
    }
  }

  // ---- emit ------------------------------------------------------------
  private val emit: Iterator[UnsafeRow] =
    if (spills.isEmpty) {
      // never spilled: emit each key's survivors best-first
      // (deterministic within key), no sort across keys needed
      heaps.values.iterator.asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, new java.util.Comparator[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(a, b)
        })
        arr.iterator
      }
    } else {
      // spilled: flush the tail heaps as the last sorted segment, then
      // stream a k-way merge, keeping the first k rows per key group
      if (!heaps.isEmpty) spillCurrentHeaps()
      val readers = spills.map(new SegmentReader(_)).filter(_.row != null)
      val pq = new java.util.PriorityQueue[SegmentReader](
        math.max(readers.size, 1),
        new java.util.Comparator[SegmentReader] {
          override def compare(a: SegmentReader, b: SegmentReader): Int = {
            val d = compareKeyBytes(a.keyBytes, b.keyBytes)
            if (d != 0) d else ordering.compare(a.row, b.row)
          }
        })
      readers.foreach(pq.add)
      new Iterator[UnsafeRow] {
        private var currentKey: Array[Byte] = null
        private var emitted = 0
        private var nextRow: UnsafeRow = fetch()
        private def fetch(): UnsafeRow = {
          while (!pq.isEmpty) {
            val seg = pq.poll()
            val row = seg.row
            val kb = seg.keyBytes
            seg.advance()
            if (seg.row != null) pq.add(seg)
            if (currentKey == null || compareKeyBytes(currentKey, kb) != 0) {
              currentKey = kb
              emitted = 1
              return row
            } else if (emitted < k) {
              emitted += 1
              return row
            } // else: beyond k for this key — skip
          }
          null
        }
        override def hasNext: Boolean = nextRow != null
        override def next(): UnsafeRow = {
          val r = nextRow
          nextRow = fetch()
          r
        }
      }
    }

  override def hasNext: Boolean = emit.hasNext
  override def next(): UnsafeRow = emit.next()
}

/** Column-name API over the plan node. */
/** Optimizer rule: push a deterministic predicate that references
  * ONLY the top-k node's KEY columns below the node. Such a predicate
  * selects WHOLE key groups, and per-key top-k is independent across
  * groups, so the filter commutes — and once below, Catalyst's own
  * PushDownPredicates keeps cascading it (through the candidate join,
  * into the scan). This is what makes `SELECT ... FROM graft_knn(...)
  * WHERE query_id < 50` cost the 50-query search, not the all-pairs
  * one. Safety: keys must be plain attributes (a predicate on an
  * input of a derived key could vary WITHIN a group and must stay
  * put); non-deterministic predicates never move. Injected into the
  * operator-optimization batch by [[graft.functions.GraftExtensions]]
  * (where it interleaves with the builtin pushdown to full cascade)
  * and appended to `experimental.extraOptimizations` by
  * [[TopK.install]] as a late fallback for extension-less sessions. */
object PushFilterThroughTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, t: TopKPerKey) if {
        val keyAttrs = t.keys.collect { case a: Attribute => a }
        keyAttrs.length == t.keys.length && t.keys.forall(_.resolved)
      } =>
      // split CONJUNCTS (as Catalyst's own pushdown does): the
      // key-only deterministic ones commute and move below; the rest
      // stay put — a mixed `WHERE query_id < 50 AND cosine > 0.9`
      // still prunes the key groups before the heap pass
      val keySet = AttributeSet(t.keys.collect { case a: Attribute => a })
      val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.subsetOf(keySet))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(push.reduceLeft(
          org.apache.spark.sql.catalyst.expressions.And), t.child))
        if (keep.isEmpty) pushed
        else Filter(keep.reduceLeft(
          org.apache.spark.sql.catalyst.expressions.And), pushed)
      }
  }
}

object TopK {

  /** Default held-bytes budget per task before sorted spill segments
    * kick in — sized well under a default executor task's share so
    * the node never out-competes sibling operators for memory. */
  val defaultMaxHeldBytes: Long = 128L * 1024 * 1024

  /** Spill directory honoring the executor's configured local disks:
    * first entry of `spark.local.dir` (Spark's own shuffle/spill
    * location) when set, else the JVM tmpdir — a cluster whose /tmp
    * is small or tmpfs-backed must not take top-k spills there. */
  private[plans] def spillDir(): File = {
    val configured = Option(org.apache.spark.SparkEnv.get)
      .flatMap(env => env.conf.getOption("spark.local.dir"))
      .map(_.split(",").head.trim)
      .filter(_.nonEmpty)
    val dir = new File(configured.getOrElse(System.getProperty("java.io.tmpdir")))
    if (dir.isDirectory) dir else new File(System.getProperty("java.io.tmpdir"))
  }

  /** Register the strategy + the key-filter pushdown on `spark`
    * (idempotent, session-scoped). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushFilterThroughTopK))
      spark.experimental.extraOptimizations = opts :+ PushFilterThroughTopK
  }

  /** Keep each key's top `k` rows under `(orderCol desc, tieBreakers
    * asc)` — the `row_number <= k` result without the sort. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, tieBreakers: Seq[String] = Seq.empty,
      maxHeldBytes: Long = defaultMaxHeldBytes): DataFrame =
    kPerKey(df, keyCols, orderCol, k, tieBreakers, ascending = false, maxHeldBytes)

  /** Keep each key's BOTTOM `k` rows — `(orderCol asc, tieBreakers
    * asc)` — the smallest-first selection (stratified draws, minima
    * per group) through the same bounded-heap node. */
  def bottomKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, tieBreakers: Seq[String] = Seq.empty,
      maxHeldBytes: Long = defaultMaxHeldBytes): DataFrame =
    kPerKey(df, keyCols, orderCol, k, tieBreakers, ascending = true, maxHeldBytes)

  private def kPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, tieBreakers: Seq[String], ascending: Boolean,
      maxHeldBytes: Long): DataFrame = {
    install(df.sparkSession)
    val dir = if (ascending) Ascending else Descending
    val nulls = if (ascending) NullsFirst else NullsLast
    val order =
      SortOrder(UnresolvedAttribute.quoted(orderCol), dir, nulls, Seq.empty) +:
        tieBreakers.map(c =>
          SortOrder(UnresolvedAttribute.quoted(c), Ascending, NullsFirst, Seq.empty))
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keyCols.map(UnresolvedAttribute.quoted), order, k, Bridge.plan(df),
        maxHeldBytes))
  }
}
