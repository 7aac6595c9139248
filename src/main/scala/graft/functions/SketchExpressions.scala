package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{column => _}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketching hot path.
  *
  * Why not higher-order array functions: Spark evaluates
  * `transform`/`aggregate` lambdas interpreted (no codegen), with a
  * boxed function call per element — a simhash built from HOFs costs
  * O(tokens × 64) lambda invocations per row and gets *re-evaluated
  * per downstream reference* (observed: 114 s for 500 docs). These
  * expressions do the same math as one tight imperative loop per row
  * (~µs), using Spark's own XxHash64 so results stay consistent with
  * the SQL `xxhash64` function family.
  *
  * Every expression implements `doGenCode` (round 14): a
  * `CodegenFallback` anywhere in an operator excludes the WHOLE
  * operator from whole-stage codegen (`CollapseCodegenStages.
  * supportCodegen`), so each kernel used to knock its entire stage —
  * scan, filters, sibling expressions — out of operator fusion. The
  * generated code calls the very same JIT-compiled kernel (a static
  * forwarder for stateless kernels, a `references`-array instance
  * method for model-carrying ones), so results are identical by
  * construction; only the stage fusion changes.
  */
object SketchExpressions {

  /** Portable 64-bit token hash: poly-31 over Unicode codepoints,
    * finalized with two multiply/xorshift rounds whose constants fit
    * in 32 bits — chosen so the *identical* arithmetic is expressible
    * in portable SQL on a 128-bit integer type (a 64×64 multiply
    * would overflow INT128; 64×32 does not). Scala `Long` arithmetic
    * wraps mod 2^64, matching the SQL `% 2^64` spelling. Used by the
    * oracle-checked SimHash variant; avalanche quality is adequate for
    * sketching (measured near-uniform bit balance over word corpora). */
  def portableTokenHash64(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = h * 31L + cp
      i += Character.charCount(cp)
    }
    portableMix64(h)
  }

  /** The 32-bit-constant multiply/xorshift finalizer shared by the
    * portable token hash and the MinHash affine-coefficient
    * derivation. */
  private[functions] def portableMix64(x: Long): Long = {
    var z = x ^ (x >>> 33)
    z *= 4283543511L // 0xff51afd7
    z ^= (z >>> 29)
    z *= 3301882366L // 0xc4ceb9fe
    z ^ (z >>> 32)
  }

  /** 64-bit SimHash over an array<string> of tokens: bit b of the
    * output is the sign of Σ_tokens (±1 by bit b of hash(token)).
    * Null tokens are skipped; empty/null arrays → 0L. The hash is
    * Spark's XxHash64 by default; `portable = true` switches to
    * [[portableTokenHash64]] so a SQL oracle can recompute the
    * identical sketch. */
  /** Static kernel target of [[SimHash64]] (also its codegen call). */
  def simhashKernel(arr: ArrayData, portable: Boolean): Long = {
    val sums = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h =
          if (portable) portableTokenHash64(arr.getUTF8String(i))
          else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 63
    while (b >= 0) {
      out = (out << 1) | (if (sums(b) > 0) 1L else 0L)
      b -= 1
    }
    out
  }

  case class SimHash64(child: Expression, portable: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0L
      else simhashKernel(v.asInstanceOf[ArrayData], portable)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.SketchExpressions.simhashKernel(${c.value}, $portable);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** MinHash signature over an array<string> of *tokens*: builds the
    * k-word shingle set imperatively (no interpreted `transform`/
    * `slice`/`array_join` chain), then element s of the output
    * array<long> is min over shingles of h_s(shingle). The hash
    * family is UNIVERSAL-AFFINE: one 64-bit base hash per shingle
    * (the chain of its tokens' xxhash64 values), then
    * `h_s(x) = a_s·x + b_s` with per-seed odd multipliers derived by
    * splitmix-style finalization — one multiply-add per (shingle,
    * seed) instead of a fresh k-token hash chain per seed, an
    * O(numHashes)× cut of the dominant sketch cost with the same
    * collision structure (the standard multiply-shift family used by
    * production MinHash implementations). Empty/null input →
    * Long.MaxValue entries (never collides with real content). */
  case class MinHashSignature(child: Expression, numHashes: Int, shingleK: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    // Per-seed affine coefficients, fixed across rows: a_s odd (a
    // bijection mod 2^64), b_s arbitrary. Derived once per operator
    // instance via the portable finalizer (any well-mixed constants
    // work; seeds only need to be fixed and distinct).
    @transient private lazy val coefA: Array[Long] =
      Array.tabulate(numHashes)(s => portableMix64(0x9e3779b97f4a7c15L * (s + 1)) | 1L)
    @transient private lazy val coefB: Array[Long] =
      Array.tabulate(numHashes)(s => portableMix64(0xbf58476d1ce4e5b9L * (s + 101)))

    /** Codegen/eval kernel; `arr` may be null (null input → the
      * empty-set signature of Long.MaxValue entries, same as eval
      * always produced). Public so generated code can call it via the
      * `references` array. */
    def kernel(arr: ArrayData): ArrayData = {
      val mins = Array.fill(numHashes)(Long.MaxValue)
      if (arr != null) {
        val n = arr.numElements()
        // token hashes once; shingle base hash = chained token hashes
        val th = new Array[Long](n)
        var i = 0
        while (i < n) {
          th(i) = if (arr.isNullAt(i)) 0L
            else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
          i += 1
        }
        val k = math.min(shingleK, math.max(n, 1))
        val nShingles = math.max(n - k + 1, if (n == 0) 0 else 1)
        val a = coefA
        val b = coefB
        var s = 0
        while (s < nShingles) {
          var base = 42L
          var j = 0
          while (j < k && s + j < n) {
            base = XxHash64Function.hash(th(s + j), LongType, base)
            j += 1
          }
          var seed = 0
          while (seed < numHashes) {
            val h = a(seed) * base + b(seed)
            if (h < mins(seed)) mins(seed) = h
            seed += 1
          }
          s += 1
        }
      }
      new GenericArrayData(mins)
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      kernel(if (v == null) null else v.asInstanceOf[ArrayData])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashSig", this)
      val c = child.genCode(ctx)
      ev.copy(code = code"""
        ${c.code}
        ArrayData ${ev.value} = $ref.kernel(${c.isNull} ? null : ${c.value});""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
  }

  /** MinHash signature derived from an ALREADY-COMPUTED array<long>
    * of shingle hashes (see [[ShingleHashes]] — same seed-42 token
    * chain): element s is min over shingles of `a_s·h + b_s`, the
    * universal-affine family of [[MinHashSignature]]. Callers that
    * need both the signature (for banding) and the shingle set (for
    * exact verification) pay ONE tokenize+hash pass instead of two —
    * the sketch-bearing scan is the dominant cost of MinHash dedup.
    * Empty input → Long.MaxValue entries; null → null (callers filter
    * null shingle sets). */
  case class MinHashFromHashes(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    @transient private lazy val coefA: Array[Long] =
      Array.tabulate(numHashes)(s => portableMix64(0x9e3779b97f4a7c15L * (s + 1)) | 1L)
    @transient private lazy val coefB: Array[Long] =
      Array.tabulate(numHashes)(s => portableMix64(0xbf58476d1ce4e5b9L * (s + 101)))

    /** Codegen/eval kernel (public: generated code calls it through
      * the `references` array). */
    def kernel(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val a = coefA
      val b = coefB
      var i = 0
      while (i < n) {
        val base = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val h = a(s) * base + b(s)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashFrom", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }
    override protected def withNewChildInternal(c: Expression): MinHashFromHashes =
      copy(child = c)
  }

  /** Order-sensitive 64-bit document fingerprint over an
    * array<string> of tokens: `h' = portableMix64(h ⊕ tokenHash)`
    * folded left-to-right from 0 — same identity semantics as an
    * xxhash64 chain (same sequence ⇒ same fingerprint, any edit ⇒
    * different) but every step is expressible in portable SQL, so the
    * value is oracle-checkable. Null tokens are skipped. */
  /** Static kernel target of [[PortableFingerprint64]]. */
  def portableFingerprintKernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        h = portableMix64(h ^ portableTokenHash64(arr.getUTF8String(i)))
      i += 1
    }
    h
  }

  case class PortableFingerprint64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override protected def nullSafeEval(v: Any): Any =
      portableFingerprintKernel(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchExpressions.portableFingerprintKernel($c);")
    override protected def withNewChildInternal(c: Expression): PortableFingerprint64 =
      copy(child = c)
  }

  /** Shared imperative kernel, also the codegen call target (Scala
    * objects emit static forwarders, so generated Java can call
    * `graft.functions.SketchExpressions.dotKernel(a, b)` directly). */
  def dotKernel(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var d = 0.0
    var i = 0
    while (i < n) { d += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    d
  }

  /** Dot product of two array<float> vectors in one primitive loop —
    * the `zip_with`+`aggregate` HOF pair costs 2 boxed lambda calls
    * per dimension. Null input → null; length mismatch → 0.0 (NOT
    * null: a null branch here would force `ev.isNull` assignment in
    * doGenCode, which is a literal when both children are non-nullable
    * and breaks Janino compilation — silently disabling codegen for
    * the whole stage). Implements `doGenCode` since it sits inside
    * per-candidate-pair projections. */
  case class FloatVectorDot(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) 0.0 else dotKernel(a, b)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""${ev.value} = ($a.numElements() == $b.numElements())
           |  ? graft.functions.SketchExpressions.dotKernel($a, $b) : 0.0;
         """.stripMargin)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** Sign-LSH bucket id over array<float>: bit p of the bucket is the
    * sign of the projection onto pseudo-random hyperplane (table, p),
    * whose component i is a zero-state hash of (table, p, i) scaled
    * to [−1, 1]. One fused loop per row instead of planes × dims
    * interpreted lambdas. */
  case class SignLshBucket(child: Expression, planes: Int, table: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    private def comp(p: Int, i: Int): Double = {
      var h = XxHash64Function.hash(table.toLong, LongType, 42L)
      h = XxHash64Function.hash(p.toLong, LongType, h)
      h = XxHash64Function.hash(i.toLong, LongType, h)
      val m = ((h % 200001L) + 200001L) % 200001L
      (m - 100000L) / 100000.0
    }

    // The hyperplane components are row-independent (a function of
    // (table, plane, dim index) only), so they are materialized once
    // per expression instance per executor and grown if a wider
    // vector ever appears — three chained xxhash64 calls per
    // component per ROW was the dominant cost of the LSH scan.
    @transient private var compCache: Array[Array[Double]] = _

    private def components(n: Int): Array[Array[Double]] = {
      if (compCache == null || compCache(0).length < n)
        compCache = Array.tabulate(planes)(p => Array.tabulate(n)(i => comp(p, i)))
      compCache
    }

    /** Codegen/eval kernel (public: generated code calls it through
      * the `references` array). */
    def kernel(arr: ArrayData): Long = {
      val n = arr.numElements()
      val comps = components(n)
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val cp = comps(p)
        var proj = 0.0
        var i = 0
        while (i < n) { proj += arr.getFloat(i) * cp(i); i += 1 }
        bucket = (bucket << 1) | (if (proj > 0) 1L else 0L)
        p += 1
      }
      bucket
    }
    override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("signLsh", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }
    override protected def withNewChildInternal(c: Expression): SignLshBucket = copy(c)
  }

  /** Tokenizer kernel — the imperative twin of `TextFunctions.tokens`
    * (`filter(split(lower(trim(text)), "\s+"), _ =!= "")`): lowercase
    * via `UTF8String.toLowerCase` (same method the `lower()` SQL
    * function calls), split on Java-regex `\s` whitespace (the six
    * ASCII chars — multibyte UTF-8 never contains ASCII bytes, so a
    * byte scan is safe), drop empties. Interpreted HOF chains cost
    * ~3s per 5k docs at sf0.1; this is one pass. */
  def tokenizeKernel(s: UTF8String): Array[UTF8String] = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    var i = 0
    var start = -1
    while (i <= n) {
      val isWs = i == n || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      }
      if (isWs) {
        if (start >= 0) { out += UTF8String.fromBytes(bytes, start, i - start); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /** [[tokenizeKernel]] boxed as ArrayData — the static call target
    * shared by [[Tokenize]]'s eval and codegen paths. */
  def tokenizeArrayData(s: UTF8String): ArrayData =
    new GenericArrayData(tokenizeKernel(s).asInstanceOf[Array[Any]])

  /** array<string> tokens of raw text — drop-in for the HOF
    * formulation of `TextFunctions.tokens` (identical output). */
  case class Tokenize(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override protected def nullSafeEval(v: Any): Any =
      tokenizeArrayData(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchExpressions.tokenizeArrayData($c);")
    override protected def withNewChildInternal(c: Expression): Tokenize = copy(c)
  }

  /** Sorted distinct 64-bit hashes of the k-word shingles of raw
    * text. A shingle's hash is the seed-42 chain of its tokens'
    * hashes — same discriminating power as hashing the joined string
    * (distinctness preserved modulo 64-bit collisions), without
    * materializing shingle strings. Shorter-than-k docs contribute
    * one whole-token-stream shingle, mirroring
    * `TextFunctions.wordShingles`. Sorted output lets
    * [[SortedLongJaccard]] verify candidates with one merge scan. */
  /** Static kernel target of [[ShingleHashes]]. */
  def shingleHashKernel(v: UTF8String, k: Int): ArrayData = {
    val toks = tokenizeKernel(v)
    val n = toks.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = XxHash64Function.hash(toks(i), StringType, 42L); i += 1 }
    val nShingles = math.max(n - k + 1, 1)
    val hs = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      var h = 42L
      var j = 0
      while (j < k && s + j < n) { h = XxHash64Function.hash(th(s + j), LongType, h); j += 1 }
      hs(s) = h
      s += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place (sorted)
    var w = 0
    var r = 0
    while (r < nShingles) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  case class ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override protected def nullSafeEval(v: Any): Any =
      shingleHashKernel(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchExpressions.shingleHashKernel($c, $k);")
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(c)
  }

  /** Sorted distinct PORTABLE 64-bit hashes of the k-word shingles:
    * poly-31 over the shingle string's codepoints (tokens joined by
    * single spaces) finalized with [[portableMix64]] — i.e. exactly
    * `portableTokenHash64(array_to_string(tokens[s:s+k-1], ' '))`,
    * so an external SQL engine reconstructs identical values (the
    * d07-oracle shingle spelling composed with the d08-oracle hash
    * spelling). Same shingle framing as [[ShingleHashes]]:
    * shorter-than-k docs contribute one whole-token-stream shingle.
    * Feeds [[MinHashUnionAgg]], whose per-group sketch must be
    * recomputable by the DuckDB oracle end-to-end. */
  /** Static kernel target of [[PortableShingleHashes]]. */
  def portableShingleHashKernel(v: UTF8String, k: Int): ArrayData = {
    val toks = tokenizeKernel(v)
    val n = toks.length
      val nShingles = math.max(n - k + 1, 1)
      val hs = new Array[Long](nShingles)
      var s = 0
      while (s < nShingles) {
        var h = 0L
        var j = 0
        while (j < k && s + j < n) {
          if (j > 0) h = h * 31L + ' '.toInt // the joining space
          val str = toks(s + j).toString
          var i = 0
          while (i < str.length) {
            val cp = str.codePointAt(i)
            h = h * 31L + cp
            i += Character.charCount(cp)
          }
          j += 1
        }
        hs(s) = portableMix64(h)
      s += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < nShingles) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  case class PortableShingleHashes(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override protected def nullSafeEval(v: Any): Any =
      portableShingleHashKernel(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchExpressions.portableShingleHashKernel($c, $k);")
    override protected def withNewChildInternal(c: Expression): PortableShingleHashes =
      copy(child = c)
  }

  /** Exact Jaccard of two SORTED DISTINCT array<long> sets via one
    * merge scan — O(|a|+|b|), no hash sets, no HOFs. Empty∪empty →
    * 0.0 (matches `Dedup.jaccard`'s `when(union > 0)` guard). */
  /** Static kernel target of [[SortedLongJaccard]]. */
  def sortedJaccardKernel(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  case class SortedLongJaccard(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(l: Any, r: Any): Any =
      sortedJaccardKernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.SketchExpressions.sortedJaccardKernel($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** All `bands` LSH band hashes of a MinHash signature in one pass:
    * band b's hash is the seed-42-chained XxHash64 of its
    * `len/bands` consecutive signature entries. Collision-equivalent
    * to `xxhash64(slice(sig, …))` per band (same band slice ⇒ same
    * hash) without the interpreted transform+slice chain. */
  /** Static kernel target of [[BandHashes]]. */
  def bandHashKernel(arr: ArrayData, bands: Int): ArrayData = {
    val n = arr.numElements()
    // also guards the SQL path (graft_band_hashes), which has no
    // Scala-side validation: trailing signature entries must not be
    // silently discarded
    if (n % bands != 0) throw new IllegalArgumentException(
      s"bands ($bands) must divide the signature length ($n)")
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var j = b * rows
      val end = j + rows
      while (j < end) { h = XxHash64Function.hash(arr.getLong(j), LongType, h); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  case class BandHashes(child: Expression, bands: Int)
      extends UnaryExpression {
    require(bands >= 1, "bands must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override protected def nullSafeEval(v: Any): Any =
      bandHashKernel(v.asInstanceOf[ArrayData], bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchExpressions.bandHashKernel($c, $bands);")
    override protected def withNewChildInternal(c: Expression): BandHashes = copy(child = c)
  }

  /** The `m` nearest quantizer cells for an array<float> vector,
    * ranked by squared euclidean to each centroid (|c|² − 2q·c; the
    * |q|² term is constant per row), ties broken by cell id. The
    * centroid table is part of the expression (it is a tiny fitted
    * model — cells × dim floats — exactly what a driver would
    * broadcast), so probe selection costs one eval per row instead of
    * a crossJoin + window shuffle. */
  case class TopCells(child: Expression, centroids: Array[Array[Float]], m: Int)
      extends UnaryExpression {
    require(m >= 1 && m <= centroids.length, "1 <= m <= nCells")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable

    @transient private lazy val cNorm2: Array[Double] =
      centroids.map { c =>
        var s = 0.0
        var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
        s
      }

    /** Codegen/eval kernel (public: generated code calls it through
      * the `references` array). */
    def kernel(arr: ArrayData): ArrayData = {
      val k = centroids.length
      val dist = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cent = centroids(c)
        val n = math.min(arr.numElements(), cent.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += arr.getFloat(i).toDouble * cent(i); i += 1 }
        dist(c) = cNorm2(c) - 2.0 * dot
        c += 1
      }
      // selection of the m smallest (k is small; simple partial sort)
      val idx = Array.tabulate(k)(identity)
      var s = 0
      while (s < m) {
        var best = s
        var t = s + 1
        while (t < k) {
          if (dist(idx(t)) < dist(idx(best)) ||
            (dist(idx(t)) == dist(idx(best)) && idx(t) < idx(best))) best = t
          t += 1
        }
        val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
        s += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(idx, m))
    }
    override protected def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("topCells", this)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }
    override protected def withNewChildInternal(c: Expression): TopCells = copy(child = c)
  }

  /** PQ ENCODE — the M sub-quantizer code ids of a vector's RESIDUAL
    * against its coarse cell centroid (classic IVF-PQ: Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
    * Children are (vec, cell); the models ride inside the expression
    * like [[TopCells]]' centroid table — tiny, driver-fit, broadcast
    * with the plan. One tight loop per row: m × ks × subDim flops,
    * emits array<int> of length m (stored instead of the vector —
    * that compression is the entire point of PQ at trillion-vector
    * scale). */
  case class PqEncode(vec: Expression, cell: Expression,
      centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]])
      extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = cell
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    /** Codegen/eval kernel (public: generated code calls it through
      * the `references` array). */
    def kernel(arr: ArrayData, cellId: Int): ArrayData = {
      val cent = centroids(cellId)
      val m = codebooks.length
      val sub = cent.length / m
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        val book = codebooks(s)
        var bestJ = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < book.length) {
          val e = book(j)
          var d = 0.0
          var i = 0
          val n = math.min(sub, math.min(arr.numElements() - s * sub, e.length))
          while (i < n) {
            val r = arr.getFloat(s * sub + i).toDouble - cent(s * sub + i) - e(i)
            d += r * r
            i += 1
          }
          if (d < bestD) { bestD = d; bestJ = j }
          j += 1
        }
        out(s) = bestJ
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def nullSafeEval(v: Any, c: Any): Any =
      kernel(v.asInstanceOf[ArrayData], c.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqEncode", this)
      nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $ref.kernel($v, $c);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
      copy(vec = l, cell = r)
  }

  /** PQ ADC DISTANCE — the approximate squared L2 distance of a
    * PQ-coded candidate to a query: Σₛ ‖(q − centroid[cell])ₛ −
    * bookₛ[codeₛ]‖², computed DIRECTLY per (query, candidate) pair in
    * one O(dim) loop over the residual. The textbook ADC lookup-table
    * variant (precompute m·ks sub-distances per (query, cell), score
    * candidates in O(m)) was implemented first and MEASURED 5-8×
    * slower end-to-end: a LUT is m·ks doubles — 64 KB per probe row
    * at the certified 32×256 geometry — and riding the probe→cell
    * shuffle it cost ~6.4 GB of exchange at 20k queries where the
    * direct path ships the 256 B query vector. The LUT trick is a
    * cache-locality optimization for a single machine scanning one
    * cell; across a shuffle boundary the bytes dominate the flops
    * (128 vs 32 per pair — noise next to the exchange). */
  case class PqAdcDistance(vec: Expression, cell: Expression, codes: Expression,
      centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]])
      extends TernaryExpression {
    override def first: Expression = vec
    override def second: Expression = cell
    override def third: Expression = codes
    override def dataType: DataType = DoubleType
    /** Codegen/eval kernel (public: generated code calls it through
      * the `references` array). */
    def kernel(arr: ArrayData, cellId: Int, codeA: ArrayData): Double = {
      val cent = centroids(cellId)
      val m = codebooks.length
      val sub = cent.length / m
      var d = 0.0
      var s = 0
      while (s < m) {
        val e = codebooks(s)(codeA.getInt(s))
        var ds = 0.0
        var i = 0
        val n = math.min(sub, math.min(arr.numElements() - s * sub, e.length))
        while (i < n) {
          val r = arr.getFloat(s * sub + i).toDouble - cent(s * sub + i) - e(i)
          ds += r * r
          i += 1
        }
        d += ds
        s += 1
      }
      d
    }
    override protected def nullSafeEval(v: Any, c: Any, k: Any): Any =
      kernel(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], k.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqAdc", this)
      nullSafeCodeGen(ctx, ev, (v, c, k) => s"${ev.value} = $ref.kernel($v, $c, $k);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PqAdcDistance =
      copy(vec = f, cell = s, codes = t)
  }

  // Column-API wrappers (Spark 4: Column wraps a ColumnNode, so the
  // classic converter — reached via GraftColumnBridge — bridges
  // to/from catalyst Expressions)
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  def simhash64(tokens: Column, portable: Boolean = false): Column =
    toColumn(SimHash64(toExpression(tokens), portable))
  def minhashFromHashes(shingleHashes: Column, numHashes: Int): Column =
    toColumn(MinHashFromHashes(toExpression(shingleHashes), numHashes))
  def portableFingerprint64(tokens: Column): Column =
    toColumn(PortableFingerprint64(toExpression(tokens)))
  def minhashSignature(tokens: Column, numHashes: Int, shingleK: Int): Column =
    toColumn(MinHashSignature(toExpression(tokens), numHashes, shingleK))
  def tokenize(text: Column): Column = toColumn(Tokenize(toExpression(text)))
  def shingleHashes(text: Column, k: Int): Column =
    toColumn(ShingleHashes(toExpression(text), k))
  def portableShingleHashes(text: Column, k: Int): Column =
    toColumn(PortableShingleHashes(toExpression(text), k))
  def minhashUnion(shingleHashes: Column, numHashes: Int): Column =
    toColumn(MinHashUnionAgg(toExpression(shingleHashes), numHashes)
      .toAggregateExpression())
  def sortedLongJaccard(a: Column, b: Column): Column =
    toColumn(SortedLongJaccard(toExpression(a), toExpression(b)))
  def topCells(vec: Column, centroids: Array[Array[Float]], m: Int): Column =
    toColumn(TopCells(toExpression(vec), centroids, m))
  def pqEncode(vec: Column, cell: Column, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]]): Column =
    toColumn(PqEncode(toExpression(vec), toExpression(cell), centroids, codebooks))
  def pqAdcDistance(vec: Column, cell: Column, codes: Column,
      centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]]): Column =
    toColumn(PqAdcDistance(toExpression(vec), toExpression(cell),
      toExpression(codes), centroids, codebooks))
  def bandHashes(sig: Column, bands: Int): Column =
    toColumn(BandHashes(toExpression(sig), bands))
  def floatDot(a: Column, b: Column): Column =
    toColumn(FloatVectorDot(toExpression(a), toExpression(b)))
  def signLshBucket(vec: Column, planes: Int, table: Int): Column =
    toColumn(SignLshBucket(toExpression(vec), planes, table))

  /** The ±1 sign matrix of the seeded random projection
    * ([[graft.operators.Similarity.randomProjection]]): sign(j)(i) =
    * bit 0 of `portableMix64((i·outDim + j) ⊕ seed)`. Derived from
    * the portable finalizer so a SQL oracle re-derives the identical
    * matrix from first principles (mixSqlU % 2) — the model is a
    * deterministic function of (dims, seed), no stored state. */
  def projectionSigns(inDim: Int, outDim: Int, seed: Long): Array[Array[Int]] =
    Array.tabulate(outDim)(j => Array.tabulate(inDim)(i =>
      if ((portableMix64((i.toLong * outDim + j) ^ seed) & 1L) == 1L) 1 else -1))
}
