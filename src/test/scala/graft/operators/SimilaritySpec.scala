package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables

/** Similarity search: brute-force correctness against independent
  * driver-side math, ANN recall against brute force. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Float]] =
    Tables.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosineRef(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  test("brute-force top-k matches independent reference computation") {
    val emb = Tables.embeddings(spark, dir)
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3,
      queries = Some(emb.filter(col("vec_id") < 10))).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      }
    (0L until 10L).foreach { q =>
      val expected = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosineRef(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      assert(got(q) === expected, s"query $q")
    }
  }

  test("MIPS: exact top-k matches reference inner products; norms matter") {
    val emb = Tables.embeddings(spark, dir)
    def ipRef(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    val got = Similarity.mipsTopK(emb, "vec_id", "embedding", k = 3,
      queries = emb.filter(col("vec_id") < 10)).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      }
    (0L until 10L).foreach { q =>
      val expected = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, ipRef(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
      assert(got(q) === expected, s"query $q")
    }
    // Norm-sensitivity, pinned on a constructed corpus (the fixture's
    // near-uniform norms make MIPS and cosine order coincide there):
    // vs query [1,0], a=[0.9,0] wins on cosine (1.0 vs 0.707) but
    // b=[10,10] wins on inner product (10 vs 0.9) — the divergence
    // that makes MIPS its own operator.
    import spark.implicits._
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.0f)),
      (2L, Array(10.0f, 10.0f))).toDF("vec_id", "embedding")
    val top = Similarity.mipsTopK(tiny, "vec_id", "embedding", k = 1,
      queries = tiny.filter(col("vec_id") === 0L)).collect()
    assert(top.length === 1 && top.head.getLong(1) === 2L,
      "MIPS must rank the long vector first where cosine would not")
  }

  test("MIPS ANN: augmented-LSH candidates reach >=60% recall@5 vs exact MIPS") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 50)
    val truth = Similarity.mipsTopK(emb, "vec_id", "embedding", k = 5, queries)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.mipsAnnTopK(emb, "vec_id", "embedding", k = 5, queries)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    assert(recall >= 0.6, f"MIPS ANN recall@5 = $recall%.3f")
    // every approximate hit must be a REAL corpus pair scored with the
    // exact dot — ranks beyond recall cannot invent neighbors
    assert(approx.forall { case (q, n) => q != n })
  }

  test("ANN top-k reaches >=60% recall@5 vs brute force on clustered fixture") {
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", k = 5,
      planes = 4, tables = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      val a = ann.getOrElse(q, Set.empty)
      a.intersect(brute(q)).size.toDouble / 5
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, f"mean recall@5 = $mean%.3f")
  }

  test("IVF top-k reaches >=60% recall@5 vs brute force") {
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = IvfIndex.topK(spark, emb, "vec_id", "embedding", k = 5,
      nCells = 10, nProbe = 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 5
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, f"IVF mean recall@5 = $mean%.3f")
  }

  test("IVF index persists and reloads: search over loaded == direct topK") {
    val emb = Tables.embeddings(spark, dir)
    val direct = IvfIndex.topK(spark, emb, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 2).collect().toSeq

    val (assigned, centroids) = IvfIndex.build(spark, emb, "vec_id", "embedding", nCells = 8)
    val dirOut = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    IvfIndex.save(assigned, centroids, dirOut)
    val (loaded, loadedCentroids) = IvfIndex.load(spark, dirOut)
    assert(loadedCentroids.map(_.toSeq).toSeq === centroids.map(_.toSeq).toSeq)
    val viaIndex = IvfIndex.search(loaded, loadedCentroids, k = 3, nProbe = 2)
      .collect().toSeq
    assert(viaIndex.toSet === direct.toSet)
    spark.catalog.clearCache()
  }

  test("incremental append touches only its cells and searches like a rebuild") {
    import scala.jdk.CollectionConverters._
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") < 450)
    val grow = emb.filter(col("vec_id") >= 450 && col("vec_id") < 455)
    val (assigned, centroids) =
      IvfIndex.build(spark, base, "vec_id", "embedding", nCells = 12)
    val dirOut = java.nio.file.Files.createTempDirectory("ivf_append").toString
    IvfIndex.save(assigned, centroids, dirOut)
    spark.catalog.clearCache()

    def inventory(): Map[String, Set[String]] = {
      val root = java.nio.file.Paths.get(dirOut, "cells")
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.list(p).iterator().asScala
            .map(_.getFileName.toString).toSet)
        .toMap
    }
    val before = inventory()
    val touched = IvfIndex.append(spark, dirOut, grow, "vec_id", "embedding")
    val after = inventory()

    // 5 vectors across 12 cells: some cells MUST be untouched, and the
    // append must not have rewritten them — that is the O(batch) claim
    assert(touched.nonEmpty && touched.length <= 5)
    val touchedDirs = touched.map(c => s"cell=$c").toSet
    assert(before.keySet.diff(touchedDirs).nonEmpty, "expected untouched cells")
    before.foreach { case (d, fs0) =>
      if (touchedDirs.contains(d)) {
        assert(fs0.subsetOf(after(d)), s"append must keep $d's existing files")
        assert(after(d) != fs0, s"touched cell $d gained no files")
      } else assert(after(d) === fs0, s"untouched cell $d was rewritten")
    }

    // full-probe search over the appended index must equal a
    // from-scratch build over the grown corpus (both are exact at
    // nProbe = nCells, whatever cells the appended rows landed in)
    val qs = emb.filter(col("vec_id") < 50)
    val (loaded, lc) = IvfIndex.load(spark, dirOut)
    val viaAppend = IvfIndex.search(loaded, lc, k = 5, nProbe = 12,
      queries = Some(qs), idCol = "vec_id", vecCol = "embedding")
      .collect().toSet
    val rebuild = IvfIndex.topK(spark, emb.filter(col("vec_id") < 455),
      "vec_id", "embedding", k = 5, nCells = 12, nProbe = 12,
      queries = Some(qs)).collect().toSet
    assert(viaAppend === rebuild,
      "appended index diverged from a from-scratch rebuild at full probe width")
    spark.catalog.clearCache()
  }

  test("delete touches only its cells, empties cleanly, searches like a rebuild") {
    import scala.jdk.CollectionConverters._
    val emb = Tables.embeddings(spark, dir)
    val (assigned, centroids) =
      IvfIndex.build(spark, emb.filter(col("vec_id") < 450), "vec_id", "embedding", nCells = 12)
    val dirOut = java.nio.file.Files.createTempDirectory("ivf_delete").toString
    IvfIndex.save(assigned, centroids, dirOut)
    spark.catalog.clearCache()

    def inventory(): Map[String, Set[String]] = {
      val root = java.nio.file.Paths.get(dirOut, "cells")
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.list(p).iterator().asScala
            .map(_.getFileName.toString).toSet)
        .toMap
    }
    val before = inventory()
    // delete ALL of one cell's ids plus a couple from another: exactly
    // those two cells are touched; the emptied cell's dir must vanish
    val cellsDf = spark.read.parquet(s"$dirOut/cells")
    val cellIds = cellsDf.select("cell", "id").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val emptyCell = cellIds.keys.min
    val otherCell = cellIds.keys.max
    assert(emptyCell != otherCell)
    val delIds = cellIds(emptyCell) ++ cellIds(otherCell).take(2)
    assert(cellIds(otherCell).size > 2, "partner cell must keep survivors")
    // materialize the expected survivor assignment BEFORE the delete
    // rewrites the files a lazy cellsDf filter would re-scan
    val survivorRows = cellsDf.filter(!col("id").isin(delIds.map(Long.box): _*))
      .collect().toList
    val survivors = spark.createDataFrame(
      survivorRows.asJava, cellsDf.schema)
    import spark.implicits._
    val touched = IvfIndex.delete(spark, dirOut, delIds.toDF("vec_id"), "vec_id")
    assert(touched.toSet === Set(emptyCell, otherCell))

    val after = inventory()
    assert(!after.contains(s"cell=$emptyCell"),
      "a fully-emptied cell must lose its directory, not keep stale rows")
    before.foreach { case (d, fs0) =>
      if (d == s"cell=$emptyCell" || d == s"cell=$otherCell") ()
      else assert(after(d) === fs0, s"untouched cell $d was rewritten")
    }

    // idempotent replay: deleting the same ids again touches nothing
    assert(IvfIndex.delete(spark, dirOut, delIds.toDF("vec_id"), "vec_id").isEmpty)

    // at ANY probe width the shrunk index searches exactly like the
    // same saved assignment with those rows filtered out (quantizer
    // unchanged — survivors' cells identical)
    val qs = emb.filter(col("vec_id") < 50)
    val (loaded, lc) = IvfIndex.load(spark, dirOut)
    for (nProbe <- Seq(3, 12)) {
      val viaDelete = IvfIndex.search(loaded, lc, k = 5, nProbe = nProbe,
        queries = Some(qs), idCol = "vec_id", vecCol = "embedding").collect().toSet
      val viaFilter = IvfIndex.search(survivors, lc, k = 5, nProbe = nProbe,
        queries = Some(qs), idCol = "vec_id", vecCol = "embedding").collect().toSet
      assert(viaDelete === viaFilter, s"nProbe=$nProbe")
    }
    spark.catalog.clearCache()
  }

  test("compact collapses fragmented cells to one file; search unchanged") {
    import scala.jdk.CollectionConverters._
    val emb = Tables.embeddings(spark, dir)
    val (assigned, centroids) =
      IvfIndex.build(spark, emb.filter(col("vec_id") >= 100), "vec_id", "embedding", nCells = 8)
    val dirOut = java.nio.file.Files.createTempDirectory("ivf_compact").toString
    IvfIndex.save(assigned, centroids, dirOut)
    spark.catalog.clearCache()
    // two appends fragment their touched cells
    IvfIndex.append(spark, dirOut, emb.filter(col("vec_id") < 50), "vec_id", "embedding")
    IvfIndex.append(spark, dirOut,
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 100), "vec_id", "embedding")

    def files(): Map[String, Set[String]] = {
      val root = java.nio.file.Paths.get(dirOut, "cells")
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.list(p).iterator().asScala
            .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = files()
    assert(before.values.exists(_.size > 1), "appends must have fragmented some cell")

    val qs = emb.filter(col("vec_id") < 30)
    val (l0, c0) = IvfIndex.load(spark, dirOut)
    val preCompact = IvfIndex.search(l0, c0, k = 5, nProbe = 3,
      queries = Some(qs), idCol = "vec_id", vecCol = "embedding").collect().toSet

    val compacted = IvfIndex.compact(spark, dirOut, maxFilesPerCell = 1)
    val after = files()
    assert(compacted.nonEmpty)
    compacted.foreach { c =>
      assert(after(s"cell=$c").size === 1, s"cell $c not collapsed to one file")
    }
    before.foreach { case (d, fs0) =>
      if (!compacted.map(c => s"cell=$c").contains(d))
        assert(after(d) === fs0, s"untouched cell $d was rewritten")
    }
    // idempotent: nothing is fragmented anymore
    assert(IvfIndex.compact(spark, dirOut, maxFilesPerCell = 1).isEmpty)

    val (l1, c1) = IvfIndex.load(spark, dirOut)
    val postCompact = IvfIndex.search(l1, c1, k = 5, nProbe = 3,
      queries = Some(qs), idCol = "vec_id", vecCol = "embedding").collect().toSet
    assert(postCompact === preCompact, "compaction changed search results")
    spark.catalog.clearCache()
  }

  test("PQ lifecycle: append encodes with the FROZEN model, O(batch) files; delete+compact exact") {
    import scala.jdk.CollectionConverters._
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") >= 100)
    // small geometry keeps the spec's driver k-means fast; the gate
    // rows certify the production 32×256 shape
    val (encoded, model) = IvfIndex.buildPq(spark, base,
      "vec_id", "embedding", nCells = 8, m = 8, ks = 16)
    val dirOut = java.nio.file.Files.createTempDirectory("ivfpq_lifec").toString
    IvfIndex.savePq(encoded, model, dirOut)
    encoded.unpersist()
    spark.catalog.clearCache()

    def files(): Map[String, Set[String]] = {
      val root = java.nio.file.Paths.get(dirOut, "cells")
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.list(p).iterator().asScala
            .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    def artifact() = {
      val (loaded, _) = IvfIndex.loadPq(spark, dirOut)
      loaded.select("id", "cell", "codes")
    }
    def assertEncodesExactly(corpus: org.apache.spark.sql.DataFrame, msg: String): Unit = {
      val (_, lm) = IvfIndex.loadPq(spark, dirOut)
      val expect = IvfIndex.encodePq(corpus, "vec_id", "embedding", lm)
      val got = artifact()
      assert(expect.exceptAll(got).union(got.exceptAll(expect)).isEmpty, msg)
    }

    // the saved model round-trips exactly (codebooks included) — the
    // precondition for "frozen" meaning anything
    val (_, lm0) = IvfIndex.loadPq(spark, dirOut)
    assert(lm0.centroids.map(_.toSeq).toSeq === model.centroids.map(_.toSeq).toSeq)
    assert(lm0.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    // append a 5-vector batch: touched cells gain files, untouched
    // cells keep theirs byte-for-byte (the O(batch) claim)
    val before = files()
    val touched = IvfIndex.appendPq(spark, dirOut,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding")
    val after = files()
    assert(touched.nonEmpty && touched.length <= 5)
    val touchedDirs = touched.map(c => s"cell=$c").toSet
    assert(before.keySet.diff(touchedDirs).nonEmpty, "expected untouched cells")
    before.foreach { case (d, fs0) =>
      if (touchedDirs.contains(d)) {
        assert(fs0.subsetOf(after(d)), s"appendPq must keep $d's existing files")
        assert(after(d) != fs0, s"touched cell $d gained no files")
      } else assert(after(d) === fs0, s"untouched cell $d was rewritten")
    }
    // append ≡ rebuild-with-same-model, row-for-row, code-for-code
    assertEncodesExactly(
      emb.filter(col("vec_id") < 5 || col("vec_id") >= 100),
      "appended artifact diverged from a one-shot encode under the frozen model")

    // second append (fragmentation), then delete the FIRST batch plus
    // a slice of the base: survivors must re-encode exactly
    IvfIndex.appendPq(spark, dirOut,
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 50), "vec_id", "embedding")
    IvfIndex.deletePq(spark, dirOut,
      emb.filter(col("vec_id") < 5 || (col("vec_id") >= 100 && col("vec_id") < 120)),
      "vec_id")
    assertEncodesExactly(
      emb.filter((col("vec_id") >= 5 && col("vec_id") < 50) || col("vec_id") >= 120),
      "post-delete artifact diverged from a re-encode of the survivors")

    // compact: fragmented cells collapse to one file, content exact,
    // search results unchanged at any probe width
    val (lc0, lmc0) = IvfIndex.loadPq(spark, dirOut)
    val qs = emb.filter(col("vec_id") < 30)
    val preCompact = IvfIndex.searchPq(lc0, lmc0, k = 5, nProbe = 8,
      qs, "vec_id", "embedding").collect().toSet
    assert(files().values.exists(_.size > 1), "appends must have fragmented some cell")
    val compacted = IvfIndex.compactPq(spark, dirOut, maxFilesPerCell = 1)
    assert(compacted.nonEmpty)
    compacted.foreach { c =>
      assert(files()(s"cell=$c").size === 1, s"cell $c not collapsed to one file")
    }
    assertEncodesExactly(
      emb.filter((col("vec_id") >= 5 && col("vec_id") < 50) || col("vec_id") >= 120),
      "compaction mutated the coded rows")
    val (lc1, lmc1) = IvfIndex.loadPq(spark, dirOut)
    val postCompact = IvfIndex.searchPq(lc1, lmc1, k = 5, nProbe = 8,
      qs, "vec_id", "embedding").collect().toSet
    assert(postCompact === preCompact, "compaction changed PQ search results")
    spark.catalog.clearCache()
  }

  test("PQ append on an ATTR-carrying index: attribute values survive, full schema exact") {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val base = emb.filter(col("vec_id") >= 100)
    val (encoded, model) = IvfIndex.buildPq(spark, base,
      "vec_id", "embedding", nCells = 8, m = 8, ks = 16,
      attrCols = Seq("label"))
    val dirOut = java.nio.file.Files.createTempDirectory("ivfpq_attr_app").toString
    IvfIndex.savePq(encoded, model, dirOut)
    encoded.unpersist()
    IvfIndex.appendPq(spark, dirOut,
      emb.filter(col("vec_id") < 20), "vec_id", "embedding")
    val (loaded, lm) = IvfIndex.loadPq(spark, dirOut)
    assert(loaded.columns.contains("label"),
      "appendPq dropped the attribute column from the saved artifact")
    // FULL-schema multiset equality vs a one-shot re-encode with attrs
    // — an append that corrupted or nulled label values must fail here
    val expect = IvfIndex.encodePq(
      emb.filter(col("vec_id") < 20 || col("vec_id") >= 100),
      "vec_id", "embedding", lm, attrCols = Seq("label"))
    val cols = loaded.columns.toSeq.map(col)
    val got = loaded.select(cols: _*)
    val exp = expect.select(cols: _*)
    assert(exp.exceptAll(got).union(got.exceptAll(exp)).isEmpty,
      "attr-carrying append diverged from the frozen-model re-encode")
    // filtered search over the appended artifact still scopes by attr:
    // every neighbor of a label-L query carries label L
    val qs = emb.filter(col("vec_id") < 10)
    val hits = IvfIndex.searchPq(loaded, lm, k = 3, nProbe = 8, qs,
      "vec_id", "embedding", attrCols = Seq("label"))
      .join(emb.select(col("vec_id").as("nbr_id"),
        col("label").as("nbr_label")), "nbr_id")
      .join(emb.select(col("vec_id").as("query_id"),
        col("label").as("q_label")), "query_id")
    assert(hits.filter(col("nbr_label") =!= col("q_label")).isEmpty,
      "filtered PQ search leaked a neighbor outside the query's label")
    spark.catalog.clearCache()
  }

  test("random projection: exact vs Scala reference, and angles survive") {
    val emb = Tables.embeddings(spark, dir)
    val got = Similarity.randomProjection(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // plain-Scala mirror of the integer formulation
    val signs = graft.functions.SketchExpressions.projectionSigns(64, 16, 25214903917L)
    val vecs = emb.filter(col("embedding").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      .filter(_._2.length == 64)
    assert(vecs.nonEmpty)
    vecs.foreach { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      (0 until 16).foreach { j =>
        val y = (0 until 64).map(i => q(i) * signs(j)(i)).sum
        assert(got((id, j.toLong)) === y, s"vec $id dim $j")
      }
    }

    // JL sanity at 16 dims: cosine error on sampled pairs is bounded
    // (~1/sqrt(16) scale) — the projection must still rank neighbors
    val ids = vecs.keys.toSeq.sorted.take(30)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d > 0) a.zip(b).map { case (x, y) => x * y }.sum / d else 0.0
    }
    val projected = ids.map(id => id ->
      (0 until 16).map(j => got((id, j.toLong)).toDouble).toArray).toMap
    val errs = for (a <- ids; b <- ids if a < b) yield math.abs(
      cos(vecs(a).map(_.toDouble), vecs(b).map(_.toDouble)) -
        cos(projected(a), projected(b)))
    val mean = errs.sum / errs.size
    assert(mean < 0.30, f"mean cosine distortion $mean%.3f too high for 16 dims")
    spark.catalog.clearCache()
  }

  test("exhaustive-mode LSH (planes = -1) equals all-pairs brute force") {
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5)
      .collect().toSet
    val exhaustive = Similarity.annTopK(emb, "vec_id", "embedding", k = 5,
      planes = -1, tables = 1, maxBucket = Int.MaxValue).collect().toSet
    assert(exhaustive === brute)
    spark.catalog.clearCache()
  }

  test("saved-index search with nProbe = nCells equals brute force (v08 shape)") {
    val got = NorthStar.ivfSavedTopK(spark, dir).collect().toSeq
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5,
      queries = Some(emb.filter(col("vec_id") < 50)))
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === brute)
    spark.catalog.clearCache()
  }

  test("int8 quantization: bounded rounding error, zero-vector safety, 4x payload") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).limit(50)
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding").collect()
    val byId = q.map(r => r.getLong(0) ->
      (r.getSeq[Byte](1).toArray, r.getFloat(2))).toMap
    byId.foreach { case (id, (qv, scale)) =>
      val orig = vecs(id)
      assert(qv.length === orig.length)
      assert(qv.forall(b => b >= -127 && b <= 127))
      // dequantized error bounded by half a quantization step
      orig.zip(qv).foreach { case (x, b) =>
        assert(math.abs(x - b * scale) <= scale / 2 + 1e-6,
          s"vec $id: |$x - $b*$scale| > step/2")
      }
    }
    // zero vector: no division blowup, zero output
    val z = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zq = Similarity.quantizeInt8(z, "vec_id", "embedding").head
    assert(zq.getSeq[Byte](1).forall(_ == 0) && zq.getFloat(2) === 0f)
  }

  test("int8 top-k keeps >=90% recall@5 vs float brute force") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val int8 = Similarity.int8TopK(emb, "vec_id", "embedding", k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      int8.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / 5
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, f"int8 mean recall@5 = $mean%.3f")
    spark.catalog.clearCache()
  }

  test("embedding near-dup pairs recover planted perturbed vectors") {
    val pairs = NorthStar.embeddingNearDups(spark, dir).collect()
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(planted.length >= 36, s"recovered ${planted.length}/40 planted vector pairs")
    assert(pairs.forall(_.getDouble(2) >= 0.95))
  }

  test("null embeddings are excluded consistently across every vector operator") {
    import org.apache.spark.sql.types._
    val rows = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .limit(30).collect().toSeq :+
      org.apache.spark.sql.Row(999999L, null)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val clean = withNull.filter(col("embedding").isNotNull)

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet

    val brute = Similarity.bruteForceTopK(withNull, "vec_id", "embedding", k = 3)
    assert(!ids(brute).contains(999999L), "brute force leaked the null row")
    assert(brute.collect().toSet ===
      Similarity.bruteForceTopK(clean, "vec_id", "embedding", k = 3).collect().toSet,
      "null row changed non-null results")

    val ann = Similarity.annTopK(withNull, "vec_id", "embedding", k = 3,
      planes = -1, tables = 1, maxBucket = Int.MaxValue)
    assert(!ids(ann).contains(999999L), "ANN leaked the null row")

    val pairs = Similarity.cosineNearDupPairs(withNull, "vec_id", "embedding", 0.0)
    assert(!ids(pairs).contains(999999L), "near-dup pairs leaked the null row")

    val ivf = IvfIndex.topK(spark, withNull, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 4)
    assert(!ids(ivf).contains(999999L), "IVF leaked the null row")
    spark.catalog.clearCache()
  }

  test("cosine expression equals reference on sampled pairs") {
    val emb = Tables.embeddings(spark, dir).limit(20)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .select("a", "b", "cos").collect()
    pairs.foreach { r =>
      val expect = cosineRef(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(r.getDouble(2) - expect) < 1e-6)
    }
  }

  // ── IVF-PQ ──

  /** Unit-normalized fixture (the cosine-as-L2 contract the PQ gate
    * uses) plus a small built index shared by the PQ tests. */
  private lazy val pqFixture = {
    val emb = Tables.embeddings(spark, dir).repartition(8, col("vec_id"))
    val unit = emb
      .withColumn("nrm", Similarity.l2Norm(col("embedding")))
      .select(col("vec_id"),
        when(col("nrm") > 0,
          transform(col("embedding"), x => (x / col("nrm")).cast("float")))
          .otherwise(col("embedding")).as("embedding"))
    val (encoded, model) = IvfIndex.buildPq(spark, unit,
      "vec_id", "embedding", nCells = 6, m = 8, ks = 16)
    val unitVecs = unit.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    (unit, encoded, model, unitVecs)
  }

  test("PQ encode: every stored code is the argmin sub-quantizer entry (driver recompute)") {
    val (_, encoded, model, unitVecs) = pqFixture
    val rows = encoded.collect()
    assert(rows.nonEmpty)
    val dim = model.centroids(0).length
    val sub = dim / model.m
    rows.foreach { r =>
      val v = unitVecs(r.getLong(0))
      val cell = r.getInt(1)
      val codes = r.getSeq[Int](2)
      assert(codes.length === model.m)
      for (s <- 0 until model.m) {
        val dists = (0 until model.ks).map { j =>
          val e = model.codebooks(s)(j)
          var d = 0.0
          for (i <- 0 until sub) {
            val t = v(s * sub + i).toDouble - model.centroids(cell)(s * sub + i) - e(i)
            d += t * t
          }
          d
        }
        assert(dists(codes(s)) === dists.min,
          s"vec ${r.getLong(0)} subspace $s: code ${codes(s)} is not an argmin")
      }
    }
  }

  test("PQ ADC search equals driver-side ADC recompute at full probe width") {
    // nProbe = nCells makes the candidate set exhaustive, so the ONLY
    // machinery under test is the per-pair residual ADC scoring +
    // ranking — pinned against the same arithmetic done longhand on
    // the driver (identical double operations in identical order ⇒
    // exact equality, no tolerance).
    val (unit, encoded, model, unitVecs) = pqFixture
    val queries = unit.filter(col("vec_id") < 5)
    val got = IvfIndex.searchPq(encoded, model, k = 5, nProbe = 6,
      queries, "vec_id", "embedding").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq).toMap
    val cellOf = encoded.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val codesOf = encoded.collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    val dim = model.centroids(0).length
    val sub = dim / model.m
    (0L until 5L).foreach { q =>
      val qv = unitVecs(q)
      def adc(nbr: Long): Double = {
        val cent = model.centroids(cellOf(nbr))
        val codes = codesOf(nbr)
        var d = 0.0
        for (s <- 0 until model.m) {
          val e = model.codebooks(s)(codes(s))
          var ds = 0.0
          for (i <- 0 until sub) {
            val t = qv(s * sub + i).toDouble - cent(s * sub + i) - e(i)
            ds += t * t
          }
          d += ds
        }
        d
      }
      val expected = cellOf.keys.filter(_ != q).toSeq
        .map(id => (id, adc(id)))
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
      assert(got(q) === expected, s"query $q")
    }
  }

  test("PQ index persists and reloads: loaded search equals in-memory search exactly") {
    val (unit, encoded, model, _) = pqFixture
    val direct = IvfIndex.searchPq(encoded, model, k = 5, nProbe = 6,
      unit, "vec_id", "embedding").collect().map(_.toString).sorted.toSeq
    val idxDir = graft.core.RunTemp.dir("graft_ivfpq_spec_", keep = 8)
    IvfIndex.savePq(encoded, model, idxDir)
    val (loaded, loadedModel) = IvfIndex.loadPq(spark, idxDir)
    // model survives the round-trip bit-for-bit
    assert(loadedModel.centroids.map(_.toSeq).toSeq === model.centroids.map(_.toSeq).toSeq)
    assert(loadedModel.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val viaDisk = IvfIndex.searchPq(loaded, loadedModel, k = 5, nProbe = 6,
      unit, "vec_id", "embedding").collect().map(_.toString).sorted.toSeq
    assert(viaDisk === direct)
    spark.catalog.clearCache()
  }

  test("IVF-PQ certified configuration keeps >=60% recall@5 vs brute force") {
    val (unit, _, _, _) = pqFixture
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = IvfIndex.pqTopK(spark, unit, "vec_id", "embedding", k = 5,
      nCells = 10, m = 32, ks = 256, nProbe = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      pq.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 5
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, f"IVF-PQ mean recall@5 = $mean%.3f")
    spark.catalog.clearCache()
  }

  test("PQ rerank at exhaustive candidates equals brute force exactly (v18 shape)") {
    // depth >= corpus and nProbe = nCells make the candidate set
    // exhaustive; rerank scores are EXACT cosine on raw vectors, so
    // the result must equal brute force row-for-row — the only
    // approximation left in the production stack is candidate
    // generation, which this pins out.
    val (unit, encoded, model, _) = pqFixture
    val n = unit.count().toInt
    val got = IvfIndex.searchPqRerank(encoded, model, unit, k = 5, depth = n,
        nProbe = model.centroids.length, queries = unit,
        idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val brute = Similarity.bruteForceTopK(unit, "vec_id", "embedding", k = 5)
      .select("query_id", "nbr_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === brute.toSeq)
  }

  test("PQ rerank beats raw ADC recall at the certified configuration") {
    val (unit, _, _, _) = pqFixture
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 5).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val (encoded, model) = IvfIndex.buildPq(spark, unit,
      "vec_id", "embedding", nCells = 10, m = 32, ks = 256)
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val by = df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = brute.keys.toSeq.map(q =>
        by.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 5)
      rs.sum / rs.size
    }
    val adc = meanRecall(IvfIndex.searchPq(encoded, model, 5, 7,
      unit, "vec_id", "embedding"))
    val rr = meanRecall(IvfIndex.searchPqRerank(encoded, model, unit, 5, 50, 7,
      unit, "vec_id", "embedding"))
    assert(rr >= 0.75, f"rerank recall $rr%.3f under the certified bar")
    assert(rr >= adc, f"rerank ($rr%.3f) must not lose to raw ADC ($adc%.3f)")
    encoded.unpersist()
    spark.catalog.clearCache()
  }

  private lazy val labels: Map[Long, Int] =
    Tables.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap

  /** Driver-side filtered exact reference: each query's scope is rows
    * sharing its label; top-k by (-cosine, id). */
  private def filteredRef(q: Long, k: Int): Seq[Long] =
    vecs.toSeq
      .filter { case (id, _) => id != q && labels(id) == labels(q) }
      .map { case (id, v) => (id, cosineRef(vecs(q), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)

  test("filtered search: in-scope only, and exact at full probe width") {
    val emb = Tables.embeddings(spark, dir)
    val (assigned, centroids) = IvfIndex.build(spark, emb,
      "vec_id", "embedding", nCells = 10, attrCols = Seq("label"))
    val got = IvfIndex.search(assigned, centroids, k = 5, nProbe = 10,
      queries = Some(emb.filter(col("vec_id") < 50)),
      idCol = "vec_id", vecCol = "embedding", attrCols = Seq("label"))
      .collect()
    assigned.unpersist()
    // scope: every returned neighbor shares its query's label
    got.foreach { r =>
      assert(labels(r.getLong(1)) == labels(r.getLong(0)),
        s"out-of-scope neighbor ${r.getLong(1)} for query ${r.getLong(0)}")
    }
    // exactness at nProbe = nCells: equals the filtered brute force
    val byQuery = got.groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq).toMap
    (0L until 50L).foreach { q =>
      assert(byQuery(q) === filteredRef(q, 5), s"query $q")
    }
    spark.catalog.clearCache()
  }

  test("filtered PQ search equals unfiltered PQ search over each label's sub-index") {
    val emb = Tables.embeddings(spark, dir)
    // tiny geometry: the pin is STRUCTURAL (same candidates, same ADC
    // arithmetic), so model quality is irrelevant to it
    val (encoded, model) = IvfIndex.buildPq(spark, emb, "vec_id", "embedding",
      nCells = 10, m = 8, ks = 16, attrCols = Seq("label"))
    val queries = emb.filter(col("vec_id") < 30)
    val filtered = IvfIndex.searchPq(encoded, model, k = 5, nProbe = 4,
      queries, "vec_id", "embedding", attrCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // scope: neighbors share their query's label
    filtered.foreach { case (q, n, _) =>
      assert(labels(n) == labels(q), s"out-of-scope PQ neighbor $n for query $q")
    }
    // per label, filtered search over the full index must equal the
    // unfiltered search over that label's sub-index with the SAME
    // model — codes and cell assignments are per-row, so the filter
    // only thins the candidate set, exactly like the sub-index does
    val qLabels = (0L until 30L).map(labels).distinct
    val expected = qLabels.flatMap { l =>
      IvfIndex.searchPq(encoded.filter(col("label") === l), model,
        k = 5, nProbe = 4, queries.filter(col("label") === l),
        "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(filtered === expected)
    // attrs persist with the codes
    val idxDir = graft.core.RunTemp.dir("graft_ivfpq_attr_spec_")
    IvfIndex.savePq(encoded, model, idxDir)
    val (loaded, _) = IvfIndex.loadPq(spark, idxDir)
    assert(loaded.columns.contains("label"), "label column lost on savePq")
    encoded.unpersist()
    spark.catalog.clearCache()
  }

  test("filtered attributes survive save, append, delete: searches stay scoped and exact") {
    val emb = Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") >= 50)
    val (assigned, centroids) = IvfIndex.build(spark, base,
      "vec_id", "embedding", nCells = 10, attrCols = Seq("label"))
    val idxDir = graft.core.RunTemp.dir("graft_ivf_attr_spec_")
    IvfIndex.save(assigned, centroids, idxDir)
    assigned.unpersist()
    // append the held-out rows: attr columns are derived from the
    // saved schema and must ride the appended files
    IvfIndex.append(spark, idxDir, emb.filter(col("vec_id") < 50),
      "vec_id", "embedding")
    val (loaded, loadedCentroids) = IvfIndex.load(spark, idxDir)
    assert(loaded.columns.contains("label"), "label column lost on append/save")
    val got = IvfIndex.search(loaded, loadedCentroids, k = 5, nProbe = 10,
      queries = Some(emb.filter(col("vec_id") < 50)),
      idCol = "vec_id", vecCol = "embedding", attrCols = Seq("label"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq).toMap
    (0L until 50L).foreach { q =>
      assert(got(q) === filteredRef(q, 5), s"appended-index query $q")
    }
    // delete a few ids: the touched-cell rewrite must keep the attrs
    import spark.implicits._
    IvfIndex.delete(spark, idxDir, Seq(0L, 1L, 2L).toDF("vec_id"), "vec_id")
    val (afterDel, delCentroids) = IvfIndex.load(spark, idxDir)
    assert(afterDel.columns.contains("label"), "label column lost on delete rewrite")
    val q3 = IvfIndex.search(afterDel, delCentroids, k = 5, nProbe = 10,
      queries = Some(emb.filter(col("vec_id") === 3L)),
      idCol = "vec_id", vecCol = "embedding", attrCols = Seq("label"))
      .collect().sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
    val refMinusDeleted = vecs.toSeq
      .filter { case (id, _) => id != 3L && labels(id) == labels(3L) && !Set(0L, 1L, 2L).contains(id) }
      .map { case (id, v) => (id, cosineRef(vecs(3L), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(q3 === refMinusDeleted, "post-delete filtered search")
    spark.catalog.clearCache()
  }

  test("range search: exact radius set vs driver-side reference, broadcast plan") {
    val emb = Tables.embeddings(spark, dir)
    val out = Similarity.rangeSearch(emb, "vec_id", "embedding",
      minCosine = 0.25, queries = emb.filter(col("vec_id") < 20))
    // reference: every (q < 20, c) pair with quantized cosine >= 0.25
    val ref = (for {
      (q, qv) <- vecs.toSeq if q < 20
      (c, cv) <- vecs.toSeq if c != q
      cos = math.floor(cosineRef(qv, cv) * 10000 + 0.5) / 10000.0
      if cos >= 0.25
    } yield (q, c)).toSet
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === ref, s"radius set diverged: extra=${got -- ref} missing=${ref -- got}")
    // the query side must broadcast — a shuffle here would be the
    // wrong plan at any corpus size
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "range scan must not shuffle the corpus")
  }
}
