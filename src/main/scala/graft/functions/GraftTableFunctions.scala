package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

/** TABLE-VALUED SQL surface for the engine's flagship TABLE-level
  * operators — the front door the scalar registry ([[GraftFunctions]])
  * cannot provide: deduplication, vector top-k search, and keyed
  * upsert/merge are whole-relation transforms, so they register on the
  * session's `TableFunctionRegistry` (the same registry Spark's own
  * `range()` TVF lives in) and are called FROM clauses of plain SQL:
  *
  * {{{
  *   SELECT * FROM graft_exact_dedup('documents', 'doc_id', 'text')
  *   SELECT * FROM graft_knn('embeddings', 'vec_id', 'embedding', 5)
  *   SELECT * FROM graft_upsert('tgt', 'upd', 'key_col', 'ord_col')
  * }}}
  *
  * This closes the product gap the reference's users would hit first:
  * its entire user surface is SQL (reference `README.md:150` — the
  * Metabase→Postgres read path), so an engine whose signature
  * capabilities are Scala-only is API-complete but product-incomplete.
  * With the TVF registry, every flagship table operator is reachable
  * from the same `spark.sql(...)` string a BI tool would send.
  *
  * Relation arguments are names resolved against the session catalog
  * (temp views included); a parenthesized argument is treated as an
  * inline subquery — `graft_knn('(SELECT ... FROM t WHERE ...)', ...)`
  * — the same convention JDBC's `dbtable` option established. Scalar
  * arguments must be literals (they choose algorithms and size
  * structures at PLAN time, exactly like `range(0, 10)`'s bounds).
  *
  * Plan shape: the builder runs at analysis time and returns the
  * operator's LOGICAL plan — Catalyst then optimizes the composed
  * query as ONE tree, so an outer `WHERE`/`ORDER BY`/join over the
  * TVF participates in pushdown and AQE like any other subquery; there
  * is no materialization boundary at the TVF call.
  */
object GraftTableFunctions {

  import org.apache.spark.sql.catalyst.expressions.Literal

  private def evalArg(e: Expression, fn: String): Any = e match {
    case l: Literal => l.value
    case other if other.foldable => other.eval()
    case other => throw new IllegalArgumentException(
      s"$fn arguments must be literals, got: $other")
  }

  private def strArg(e: Expression, fn: String): String = evalArg(e, fn) match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"$fn expected a string literal, got: $other")
  }

  private def intArg(e: Expression, fn: String): Int = evalArg(e, fn) match {
    case i: Int => i
    case l: Long => Math.toIntExact(l)
    case d: org.apache.spark.sql.types.Decimal => d.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expected an integer literal, got: $other")
  }

  private def longArg(e: Expression, fn: String): Long = evalArg(e, fn) match {
    case i: Int => i.toLong
    case l: Long => l
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expected an integer literal, got: $other")
  }

  private def dblArg(e: Expression, fn: String): Double = evalArg(e, fn) match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expected a numeric literal, got: $other")
  }

  /** Resolve a relation argument: catalog/temp-view name, or an
    * inline `(SELECT ...)` subquery string. */
  private def rel(spark: SparkSession, s: String): DataFrame =
    if (s.trim.startsWith("(")) spark.sql(s.trim) else spark.table(s)

  /** name → (usage doc, allowed arities, builder). Builders return
    * DataFrames; registration wraps them down to logical plans. */
  private val defs: Seq[(String, String, Set[Int],
      (SparkSession, Seq[Expression]) => DataFrame)] = Seq(

    ("graft_exact_dedup",
      "graft_exact_dedup(table, idCol, textCol) - one surviving row per" +
        " distinct textCol content (smallest idCol wins); table may be a" +
        " '(SELECT ...)' subquery string", Set(3),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_exact_dedup"
        graft.operators.Dedup.exactDedup(rel(s, strArg(a(0), fn)),
          strArg(a(1), fn), strArg(a(2), fn))
      }),

    ("graft_minhash_pairs",
      "graft_minhash_pairs(table, idCol, textCol[, numHashes, bands," +
        " shingleK, threshold]) - near-duplicate pairs (id_a, id_b," +
        " jaccard) via banded MinHash + exact verification", Set(3, 7),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_minhash_pairs"
        // TVF = the query layer, so the kernel-width prep lives here
        // (same rationale as NorthStar's kernel sessions): the fixture
        // corpora are single-row-group parquet, one scan task — hash-
        // repartition on md5(text) with an EXPLICIT count (AQE keeps
        // counted exchanges; it coalesces uncounted ones by bytes) so
        // the 128-hash sketch stage runs wide, and exactDedup-style
        // md5 keys let Catalyst reuse the exchange downstream.
        val widen = math.min(8, s.sessionState.conf.numShufflePartitions)
        val df = rel(s, strArg(a(0), fn))
          .repartition(widen, org.apache.spark.sql.functions.md5(
            col(strArg(a(2), fn))))
        if (a.length == 3)
          graft.operators.Dedup.minhashPairs(df, strArg(a(1), fn), strArg(a(2), fn))
        else
          graft.operators.Dedup.minhashPairs(df, strArg(a(1), fn), strArg(a(2), fn),
            numHashes = intArg(a(3), fn), bands = intArg(a(4), fn),
            shingleK = intArg(a(5), fn), threshold = dblArg(a(6), fn))
      }),

    ("graft_knn",
      "graft_knn(table, idCol, vecCol, k) - exact cosine top-k neighbors" +
        " (query_id, nbr_id, cosine, rank) for every vector in table",
      Set(4),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_knn"
        val df = rel(s, strArg(a(0), fn))
        // deliberately the LAZY explicit-queries branch, NOT the
        // sealed half-matrix one: a TVF must stay an optimizable
        // subtree, so an outer `WHERE query_id < 50` can cascade
        // (PushFilterThroughTopK, then the builtin pushdown) into the
        // query-side scan and cost the 50-query search. The sealed
        // all-pairs route materializes at ANALYSIS time, walling the
        // filter off behind an InMemoryRelation — its halved dot
        // products only win when the consumer truly wants every query.
        graft.operators.Similarity.bruteForceTopK(df,
          strArg(a(1), fn), strArg(a(2), fn), intArg(a(3), fn),
          queries = Some(df))
      }),

    ("graft_ivf_topk",
      "graft_ivf_topk(table, idCol, vecCol, k, nCells, nProbe) -" +
        " approximate cosine top-k via an IVF cell index (build + probe)",
      Set(6),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_ivf_topk"
        graft.operators.IvfIndex.topK(s, rel(s, strArg(a(0), fn)),
          strArg(a(1), fn), strArg(a(2), fn), intArg(a(3), fn),
          nCells = intArg(a(4), fn), nProbe = intArg(a(5), fn))
      }),

    ("graft_asof_join",
      "graft_asof_join(left, right, key, leftTs, rightTs, rightCol," +
        " outCol[, rightCol2, outCol2 ...]) - attach each left row the" +
        " LATEST right row at-or-before its timestamp per key (left" +
        " join; payload columns renamed as given)", Set(7, 9, 11),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_asof_join"
        val pairs = a.drop(5).grouped(2).map {
          case Seq(rc, out) => strArg(rc, fn) -> strArg(out, fn)
        }.toMap
        graft.operators.AsOfJoin.asOf(
          rel(s, strArg(a(0), fn)), rel(s, strArg(a(1), fn)),
          strArg(a(2), fn), strArg(a(3), fn), strArg(a(4), fn), pairs)
      }),

    ("graft_interval_join",
      "graft_interval_join(left, right, leftTs, rightTs, lowerUs," +
        " upperUs[, key]) - pair rows where rightTs is within" +
        " [leftTs + lowerUs, leftTs + upperUs] (numeric timestamps)," +
        " optionally equi-keyed; banded so candidates stay local",
      Set(6, 7),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_interval_join"
        graft.operators.RangeJoin.intervalJoin(
          rel(s, strArg(a(0), fn)), rel(s, strArg(a(1), fn)),
          strArg(a(2), fn), strArg(a(3), fn),
          lowerUs = longArg(a(4), fn), upperUs = longArg(a(5), fn),
          equiKeys = if (a.length == 7) Seq(strArg(a(6), fn)) else Seq.empty)
      }),

    ("graft_time_travel",
      "graft_time_travel(root, version) - read a graft warehouse table" +
        " AS OF <version>, LIVE rows: deletion vectors applied" +
        " merge-on-read, the version's column rename map applied," +
        " shallow-clone pointers resolved; loud when the snapshot was" +
        " vacuumed", Set(2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_time_travel"
        graft.pipeline.Warehouse.readVersionLive(
          s, strArg(a(0), fn), longArg(a(1), fn))
      }),

    ("graft_live",
      "graft_live(root) - read a graft warehouse table's CURRENT" +
        " version LIVE: deletion vectors applied merge-on-read, the" +
        " version's column rename map applied, shallow-clone pointers" +
        " resolved (graft_time_travel at the current version)", Set(1),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_live"
        val root = strArg(a(0), fn)
        val v = graft.pipeline.Warehouse.currentVersion(s, root).getOrElse(
          throw new IllegalStateException(
            s"$fn: no committed snapshot under $root"))
        graft.pipeline.Warehouse.readVersionLive(s, root, v)
      }),

    ("graft_change_feed",
      "graft_change_feed(root, version) - the STORED change feed of the" +
        " version-1 -> version transition (shipment keys, old_image/" +
        "new_image structs, change_type); loud when never published",
      Set(2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_change_feed"
        graft.pipeline.Warehouse.readChangeFeed(
          s, strArg(a(0), fn), longArg(a(1), fn))
      }),

    ("graft_history",
      "graft_history(root) - one row per committed snapshot of a graft" +
        " warehouse: (version, n_rows). The version list is one driver" +
        " metadata listing; the counts are a LAZY union of per-version" +
        " metadata-cheap aggregates (clone pointers resolved), so the" +
        " history of a 100 TB table costs one count-star per retained" +
        " version, no full-width scan. n_rows is the SNAPSHOT-FILE" +
        " cardinality: a version carrying merge-on-read deletion" +
        " vectors reports its pre-delete count (read the live view via" +
        " Warehouse.readWithDv)", Set(1),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_history"
        import org.apache.spark.sql.functions.{count, lit}
        val w = graft.pipeline.Warehouse
        val root = strArg(a(0), fn)
        val vs = w.versions(s, root)
        require(vs.nonEmpty, s"$fn: no committed snapshot under $root")
        vs.map { v =>
          // manifest-aware raw read: a manifest version's rows live in
          // its LISTED files, not its version dir alone
          w.readVersionRaw(s, root, v)
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(v).as("version"), col("n_rows"))
        }.reduce(_.unionByName(_))
      }),

    ("graft_compact",
      "graft_compact(root[, targetFileBytes]) - PROCEDURE with result:" +
        " compacts the warehouse's current snapshot into size-targeted" +
        " files as the NEXT version (layout-only; lost-update fenced)," +
        " then reads the compacted snapshot back. Like Delta's" +
        " OPTIMIZE, the side effect runs when the query is analyzed",
      Set(1, 2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_compact"
        val w = graft.pipeline.Warehouse
        val root = strArg(a(0), fn)
        val target = if (a.length > 1) longArg(a(1), fn) else 128L * 1024 * 1024
        w.compact(s, root, target)
        val cur = w.currentVersion(s, root).getOrElse(
          throw new IllegalArgumentException(
            s"$fn: no committed snapshot under $root"))
        s.read.parquet(w.dataPath(s, root, cur)) // compact publishes PLAIN
      }),

    ("graft_optimize",
      "graft_optimize(root[, targetFileBytes[, smallFileBytes]]) -" +
        " PROCEDURE with result: bin-packs a MANIFEST table's files" +
        " smaller than smallFileBytes into ~targetFileBytes files as" +
        " the next version — right-sized files ride by reference and" +
        " the table STAYS in manifest mode (unlike graft_compact)," +
        " bounding manifest metadata growth; then reads the table" +
        " back. No-op when nothing is worth packing. The side effect" +
        " runs when the query is analyzed",
      Set(1, 2, 3),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_optimize"
        val w = graft.pipeline.Warehouse
        val root = strArg(a(0), fn)
        val target = if (a.length > 1) longArg(a(1), fn) else 128L * 1024 * 1024
        val small = if (a.length > 2) longArg(a(2), fn) else target / 2
        w.optimizeFiles(s, root, target, small)
        // connector read: a manifest version has no single data dir,
        // and a carried rename map must surface logical names
        s.read.format("graft").load(root)
      }),

    ("graft_vacuum",
      "graft_vacuum(root, keepLast) - PROCEDURE with result: prunes" +
        " snapshots beyond the keepLast newest (with their deletion" +
        " vectors and change feeds), then reads the CURRENT snapshot" +
        " back; time travel past the retention floor fails loudly" +
        " afterwards. The side effect runs when the query is analyzed",
      Set(2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_vacuum"
        val w = graft.pipeline.Warehouse
        val root = strArg(a(0), fn)
        w.vacuum(s, root, keepLast = intArg(a(1), fn))
        val cur = w.currentVersion(s, root).getOrElse(
          throw new IllegalArgumentException(
            s"$fn: no committed snapshot under $root"))
        w.readVersionRaw(s, root, cur)
      }),

    ("graft_clone",
      "graft_clone(srcRoot, dstRoot) - PROCEDURE with result: publish" +
        " the source warehouse's current snapshot as the next version" +
        " of dstRoot WITHOUT copying data (zero-copy shallow clone," +
        " O(1) metadata; loud when the source carries deletion" +
        " vectors), then read the clone back through its pointer",
      Set(2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_clone"
        val w = graft.pipeline.Warehouse
        val dst = strArg(a(1), fn)
        val v = w.cloneShallow(s, strArg(a(0), fn), dst)
        s.read.parquet(w.dataPath(s, dst, v))
      }),

    ("graft_restore",
      "graft_restore(root, version) - PROCEDURE with result: re-commit" +
        " version's content as the NEXT version (rollback with" +
        " forward-only history; deletion vectors of the restored" +
        " version fold in), then read the restored snapshot back",
      Set(2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_restore"
        val w = graft.pipeline.Warehouse
        val root = strArg(a(0), fn)
        val toV = longArg(a(1), fn)
        val schema = w.readVersionRaw(s, root, toV).schema
        val v = w.restore(s, root, toV, schema)
        s.read.parquet(w.dataPath(s, root, v))
      }),

    ("graft_group_member",
      "graft_group_member(groupDir, name) - read one member of a" +
        " CONSISTENT SNAPSHOT GROUP through the group's pinned" +
        " (table -> version) set; loud when the pin was vacuumed",
      Set(2),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_group_member"
        val (root, v) = graft.pipeline.Warehouse
          .snapshotGroupMembers(s, strArg(a(0), fn))
          .getOrElse(strArg(a(1), fn), throw new IllegalArgumentException(
            s"$fn: snapshot group ${strArg(a(0), fn)} has no member" +
              s" '${strArg(a(1), fn)}'"))
        // schema inferred from the pinned snapshot's own files; the
        // pin resolves through dataPath (manifest file lists included),
        // so clones + missing-snapshot loudness ride the same seam as
        // graft_time_travel
        graft.pipeline.Warehouse.readVersionRaw(s, root, v)
      }),

    ("graft_new_content",
      "graft_new_content(corpus, increment, id, text) - the increment" +
        " rows whose content is NEW: absent from the corpus and not an" +
        " echo of an earlier increment row (smallest id wins) - the" +
        " daily-batch incremental exact dedup", Set(4),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_new_content"
        graft.operators.Dedup.incrementalExactDedup(
          rel(s, strArg(a(0), fn)), rel(s, strArg(a(1), fn)),
          strArg(a(2), fn), strArg(a(3), fn))
      }),

    ("graft_bm25",
      "graft_bm25(docs, id, text, queries, k) - BM25 lexical top-k:" +
        " queries relation carries (query_id, term) rows; scores in" +
        " integer micro-units, ranked per query", Set(5),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_bm25"
        graft.operators.Retrieval.bm25TopK(
          rel(s, strArg(a(0), fn)), strArg(a(1), fn), strArg(a(2), fn),
          rel(s, strArg(a(3), fn)), intArg(a(4), fn))
      }),

    ("graft_stratified_sample",
      "graft_stratified_sample(table, id, stratum, text, k) -" +
        " deterministic k-per-stratum sample ordered by the portable" +
        " content fingerprint (reproducible across engines and ingest" +
        " orders); emits (id, stratum, sample_rank)", Set(5),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_stratified_sample"
        graft.operators.Sharding.stratifiedByFingerprint(
          rel(s, strArg(a(0), fn)), strArg(a(1), fn), strArg(a(2), fn),
          strArg(a(3), fn), intArg(a(4), fn))
      }),

    ("graft_upsert",
      "graft_upsert(target, updates, keyCol, ordCol) - LWW upsert:" +
        " updates (deduped per key by greatest ordCol) overwrite target" +
        " rows on keyCol; unmatched update keys insert", Set(4),
      (s: SparkSession, a: Seq[Expression]) => {
        val fn = "graft_upsert"
        graft.pipeline.Merge.upsert(rel(s, strArg(a(0), fn)),
          rel(s, strArg(a(1), fn)), strArg(a(2), fn), col(strArg(a(3), fn)))
      }))

  /** Declared parameter names, for SQL named-argument calls
    * (`graft_knn(table => 'embeddings', ...)`). Variadic tails
    * (asof's payload pairs) stay positional-only. */
  private val paramNames: Map[String, Seq[String]] = Map(
    "graft_exact_dedup" -> Seq("table", "id", "text"),
    "graft_minhash_pairs" ->
      Seq("table", "id", "text", "hashes", "bands", "shingle", "threshold"),
    "graft_knn" -> Seq("table", "id", "vec", "k"),
    "graft_ivf_topk" -> Seq("table", "id", "vec", "k", "cells", "probes"),
    "graft_asof_join" -> Seq("left", "right", "key", "left_ts", "right_ts"),
    "graft_interval_join" ->
      Seq("left", "right", "left_ts", "right_ts", "lower_us", "upper_us", "key"),
    "graft_time_travel" -> Seq("root", "version"),
    "graft_history" -> Seq("root"),
    "graft_compact" -> Seq("root", "target_file_bytes"),
    "graft_vacuum" -> Seq("root", "keep_last"),
    "graft_clone" -> Seq("src_root", "dst_root"),
    "graft_restore" -> Seq("root", "version"),
    "graft_group_member" -> Seq("group_dir", "name"),
    "graft_new_content" -> Seq("corpus", "increment", "id", "text"),
    "graft_change_feed" -> Seq("root", "version"),
    "graft_bm25" -> Seq("docs", "id", "text", "queries", "k"),
    "graft_stratified_sample" -> Seq("table", "id", "stratum", "text", "k"),
    "graft_upsert" -> Seq("target", "updates", "key", "ord"))

  /** Rewrite a mixed positional/named argument list to pure
    * positional: named args must follow all positional ones, name
    * declared parameters (case-insensitive), and fill a contiguous
    * run — a skipped middle parameter has no value to default to, so
    * it is an error, loudly, with the parameter list in the message. */
  private def resolveNamed(fn: String, args: Seq[Expression]): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.NamedArgumentExpression
    val nPos = args.indexWhere(_.isInstanceOf[NamedArgumentExpression]) match {
      case -1 => args.length
      case i => i
    }
    val (pos, rest) = args.splitAt(nPos)
    if (rest.isEmpty) return args
    val named = rest.map {
      case NamedArgumentExpression(k, v) => k.toLowerCase -> v
      case other => throw new IllegalArgumentException(
        s"$fn: positional argument after a named argument: $other")
    }
    val params = paramNames.getOrElse(fn, Seq.empty)
    if (named.map(_._1).distinct.length != named.length)
      throw new IllegalArgumentException(
        s"$fn: duplicate named argument among ${named.map(_._1).mkString(", ")}")
    val m = named.toMap
    val chosen = params.drop(nPos).takeWhile(p => m.contains(p))
    if (chosen.length != m.size || chosen.toSet != m.keySet)
      throw new IllegalArgumentException(
        s"$fn: named arguments ${m.keySet.mkString(", ")} must contiguously" +
          s" fill the declared parameters after the ${nPos} positional" +
          s" one(s); parameters: ${params.mkString(", ")}")
    pos ++ chosen.map(m)
  }

  private def checked(name: String, usage: String, arities: Set[Int],
      build: (SparkSession, Seq[Expression]) => DataFrame)
      (spark: SparkSession, rawArgs: Seq[Expression]): LogicalPlan = {
    val args = resolveNamed(name, rawArgs)
    if (!arities.contains(args.length))
      throw new IllegalArgumentException(
        s"$name expects ${arities.toSeq.sorted.mkString(" or ")} argument(s)," +
          s" got ${args.length}; usage: $usage")
    Bridge.plan(build(spark, args))
  }

  /** (name, usage, plan builder bound to the ACTIVE session) — shared
    * by both registration paths. The extensions path has no session at
    * registration time, so the builder binds `SparkSession.active` at
    * CALL time (analysis runs on the query's session thread). */
  val registrations: Seq[(String, String, Seq[Expression] => LogicalPlan)] =
    defs.map { case (name, usage, arities, build) =>
      (name, usage,
        (args: Seq[Expression]) =>
          checked(name, usage, arities, build)(SparkSession.active, args))
    }

  /** Register every `graft_*` table function on a live session.
    * Idempotent and quiet: re-registration (Catalog.registerAll runs
    * once per gate query) would log a replace warning per function. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.tableFunctionRegistry
    registrations.foreach { case (name, usage, builder) =>
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
      val _ = usage
    }
  }

  /** Extensions-path injection (see [[GraftExtensions]]). */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    registrations.foreach { case (name, usage, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftTableFunctions", null,
          name, usage, ""),
        builder))
    }
}
