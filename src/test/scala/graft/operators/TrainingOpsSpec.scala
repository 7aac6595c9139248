package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Tables
import graft.functions.TextFunctions

/** Invariants of the training-data prep operators (d16-d18) that the
  * DuckDB oracles cannot express directly: assignment determinism,
  * token conservation across chunking, and decontamination recall on
  * a constructed overlap. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("train split covers every doc exactly once and is re-run stable") {
    val s1 = NorthStar.trainSplit(spark, dir).collect()
    val s2 = NorthStar.trainSplit(spark, dir).collect()
    assert(s1.toSeq == s2.toSeq, "split assignment must be deterministic")
    val n = Tables.documents(spark, dir)
      .filter(col("text").isNotNull &&
        TextFunctions.tokenCount(col("text")) > 0).count()
    assert(s1.length == n, "every tokenful doc gets exactly one split")
    val bySplit = s1.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // 80/10/10 in expectation; allow wide slack on 500 docs
    assert(bySplit("train") > bySplit.getOrElse("val", 0))
    assert(bySplit("train") > bySplit.getOrElse("test", 0))
  }

  test("mixture sample: deterministic, rates track source weights, filter-only plan") {
    val m1 = NorthStar.mixtureSample(spark, dir)
    val rows = m1.collect()
    assert(rows.toSeq == NorthStar.mixtureSample(spark, dir).collect().toSeq,
      "mixture must be deterministic")
    // every kept row honors its cut; rates per source track the weight
    assert(rows.forall(r => r.getLong(2) < r.getLong(3)), "kept rows honor the cut")
    val total = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && TextFunctions.tokenCount(col("text")) > 0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    total.foreach { case (src, n) =>
      val frac = (src.drop(3).toLong % 4 + 1) * 0.2
      val got = kept.getOrElse(src, 0L).toDouble / n
      // 25 docs/source at sf0.001 — binomial noise is wide; just
      // require the rate to sit in a generous band around the weight
      assert(math.abs(got - frac) < 0.3, s"$src rate $got vs weight $frac")
    }
    // the keep decision is a pure per-row filter: no hash exchange
    // anywhere (the output orderBy adds only a range exchange)
    val plan = m1.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"mixture sampling must not shuffle on any key:\n$plan")
  }

  test("temperature mixture: deterministic, up-weights minority languages, targets half the corpus") {
    val rows = NorthStar.temperatureMixture(spark, dir).collect()
    assert(rows.toSeq == NorthStar.temperatureMixture(spark, dir).collect().toSeq,
      "temperature mixture must be deterministic")
    assert(rows.forall(r => r.getLong(2) < r.getLong(3)), "kept rows honor the cut")
    val counts = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && TextFunctions.tokenCount(col("text")) > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α = 0.5: keep FRACTION must be monotonically non-increasing in
    // language size — the defining property of temperature sampling
    val cutByLang = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    for {
      (l1, c1) <- cutByLang.keys.map(l => l -> counts(l))
      (l2, c2) <- cutByLang.keys.map(l => l -> counts(l))
      if c1 < c2
    } assert(cutByLang(l1) >= cutByLang(l2),
      s"smaller lang $l1($c1) must keep a fraction >= bigger lang $l2($c2)")
    // target is half the corpus (clamping + fingerprint noise allowed)
    val n = counts.values.sum.toDouble
    assert(rows.length > 0.3 * n && rows.length < 0.7 * n,
      s"kept ${rows.length} of $n — expected about half")
  }

  test("weighted sample: quality-tilted, deterministic, pruned via TopKPerKey") {
    val sample = NorthStar.weightedSample(spark, dir).collect()
    assert(sample.nonEmpty)
    // per-language rank sequences are dense from 1
    sample.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length).toSeq, lang)
    }
    // the whole point: sampled mean quality must exceed the corpus
    // mean (selection probability rises with w)
    val corpusMeanW = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && TextFunctions.tokenCount(col("text")) > 0)
      .select(graft.functions.Quantize.quantize4(
        TextFunctions.qualityScore(col("text"))).as("w"))
      .filter(col("w") > 0)
      .agg(avg("w")).head.getDouble(0)
    val sampleMeanW = sample.map(_.getDouble(2)).sum / sample.length
    assert(sampleMeanW > corpusMeanW,
      f"sampled mean quality $sampleMeanW%.4f must beat corpus mean $corpusMeanW%.4f")
    // re-run stability (content-derived draw, no RNG state)
    val again = NorthStar.weightedSample(spark, dir).collect()
    assert(again.map(_.toString).toSeq === sample.map(_.toString).toSeq)
    // selection rides the bounded-heap node, not a full-stratum sort
    val p = NorthStar.weightedSample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "weighted draw must prune via TopKPerKey")
    spark.catalog.clearCache()
  }

  test("bpe pair counts: frequency-weighted adjacent pairs, within-word repeats counted") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab"), (2L, "ab"), (3L, "aaa")).toDF("doc_id", "text")
    // words: aa(1) -> {aa:1}; ab(2) -> {ab:2}; aaa(1) -> {aa:2}
    val got = NorthStar.bpePairCountsOf(docs, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("aa", 3L, 1L), ("ab", 2L, 2L)))
  }

  test("bpe pair counts: deterministic rank under ties breaks by pair") {
    import spark.implicits._
    val docs = Seq((1L, "xy yz")).toDF("doc_id", "text")
    val got = NorthStar.bpePairCountsOf(docs, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("xy", 1L, 1L), ("yz", 1L, 2L)))
  }

  test("bpe merge loop: hand-computed merges on a toy corpus, driver path") {
    import spark.implicits._
    // words: abab(freq 2), ab(freq 1)
    // iter 1 pairs: (a,b) = 2·2 + 1 = 5, (b,a) = 2 → merge (a,b) n=5
    //   abab -> [ab, ab], ab -> [ab]
    // iter 2 pairs: (ab,ab) = 2 → merge (ab,ab) n=2 -> abab
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val got = NorthStar.bpeTrainMergesOf(docs, "text", nMerges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, "a", "b", "ab", 5L), (2L, "ab", "ab", "abab", 2L)))
  }

  test("bpe merge loop: winner ties break by (left, right) symbol order") {
    import spark.implicits._
    // xy and yz both count 1; tiebreak picks (x,y) first. After that
    // merge, remaining pairs: (y,z) = 1 -> second merge.
    val docs = Seq((1L, "xy yz")).toDF("doc_id", "text")
    val got = NorthStar.bpeTrainMergesOf(docs, "text", nMerges = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got === Seq(("x", "y"), ("y", "z")))
  }

  test("bpe merge loop: overlapping repeats merge left-to-right non-overlapping") {
    import spark.implicits._
    // "aaa": pairs (a,a) = 2; merge (a,a) must produce [aa, a], not [aa, aa]
    // second merge: (aa,a) = 1 beats nothing else -> aaa
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = NorthStar.bpeTrainMergesOf(docs, "text", nMerges = 2)
      .collect().map(r => (r.getString(3), r.getLong(4))).toSeq
    assert(got === Seq(("aa", 2L), ("aaa", 1L)))
  }

  test("bpe merge loop: distributed path equals driver path on the fixture corpus") {
    val docs = graft.core.Tables.documents(spark, dir).select("doc_id", "text")
    val viaDriver = NorthStar.bpeTrainMergesOf(docs, "text", nMerges = 15)
      .collect().map(_.toString).toSeq
    val viaCluster = NorthStar.bpeTrainMergesOf(docs, "text", nMerges = 15,
      driverVocabCap = 0L, cacheEvery = 4) // cap 0 forces the distributed loop
      .collect().map(_.toString).toSeq
    assert(viaCluster === viaDriver)
    assert(viaDriver.size === 15)
    spark.catalog.clearCache()
  }

  test("bpe symbols: trained inventory on the toy corpus") {
    import spark.implicits._
    // after merges (a,b)->ab then (ab,ab)->abab:
    //   abab(freq 2) -> [abab], ab(freq 1) -> [ab]
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val syms = NorthStar.bpeSymbolsOf(docs, "text", nMerges = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(syms === Set(("abab", 2L, 4L), ("ab", 1L, 2L)))
  }

  test("bpe symbols: character conservation and path equality on the fixture") {
    val docs = graft.core.Tables.documents(spark, dir).select("doc_id", "text")
    val viaDriver = NorthStar.bpeSymbolsOf(docs, "text", nMerges = 10)
    val rows = viaDriver.collect().map(_.toString).sorted.toSeq
    val viaCluster = NorthStar.bpeSymbolsOf(docs, "text", nMerges = 10,
      driverVocabCap = 0L, cacheEvery = 4).collect().map(_.toString).sorted.toSeq
    assert(viaCluster === rows)
    // merging never creates or destroys characters: Σ n·n_chars over
    // the trained symbols equals the raw token stream's total chars
    val symChars = viaDriver
      .agg(sum(col("n") * col("n_chars"))).head.getLong(0)
    val tokChars = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")).cast("long"))).head.getLong(0)
    assert(symChars === tokChars)
    spark.catalog.clearCache()
  }

  test("bpe encode: per-doc token counts under the trained merges on a toy corpus") {
    import spark.implicits._
    // merges learned from the corpus: (a,b)->ab then (ab,ab)->abab.
    // doc 1 tokens: abab->1 sym, abab->1, ab->1; doc 2: ba stays
    // unmerged (2 syms: the (b,a) pair was never the winner), ab->1.
    val docs = Seq((1L, "abab abab ab"), (2L, "ba ab")).toDF("doc_id", "text")
    val got = NorthStar.bpeEncodeCountsOf(docs, "text", nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 3L), (2L, 2L, 3L)))
  }

  test("bpe encode: corpus total equals the trained symbol mass; paths agree") {
    val docs = graft.core.Tables.documents(spark, dir).select("doc_id", "text")
    val enc = NorthStar.bpeEncodeCountsOf(docs, "text", nMerges = 10)
    val rows = enc.collect().map(_.toString).toSeq
    // Σ per-doc tokens == Σ n over the d39 symbol inventory: both
    // count the corpus token stream under the same final segmentation
    val encTotal = enc.agg(sum(col("n_tokens"))).head.getLong(0)
    val symTotal = NorthStar.bpeSymbolsOf(docs, "text", nMerges = 10)
      .agg(sum(col("n"))).head.getLong(0)
    assert(encTotal === symTotal)
    spark.catalog.clearCache()
    // distributed-loop path byte-equal
    val viaCluster = NorthStar.bpeEncodeCountsOf(docs, "text", nMerges = 10,
      driverVocabCap = 0L, cacheEvery = 4).collect().map(_.toString).toSeq
    assert(viaCluster === rows)
    spark.catalog.clearCache()
  }

  test("bpe merge loop runs dry loudly, never silently short") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text") // one pair total
    val e = intercept[IllegalArgumentException] {
      NorthStar.bpeTrainMergesOf(docs, "text", nMerges = 3).collect()
    }
    assert(e.getMessage.contains("ran dry"))
  }

  test("perplexity filter: in-domain text scores below gibberish, keep honors the threshold") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the chair"),
      (200L, "the cat sat on the mat"), // in-domain: every bigram seen
      (201L, "zz qq ww vv pp kk")       // out-of-domain: nothing seen
    ).toDF("doc_id", "text")
    val scores = NorthStar.perplexityFilterOf(docs, refBelow = 100L, thresholdMicro = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(200L) < scores(201L),
      s"in-domain ${scores(200L)} must beat gibberish ${scores(201L)}")
    assert(scores(0L) === scores(200L), "identical text scores identically")
    val mid = (scores(200L) + scores(201L)) / 2
    val kept = NorthStar.perplexityFilterOf(docs, refBelow = 100L, thresholdMicro = mid)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(kept(200L) && !kept(201L))
  }

  test("perplexity filter fails loudly on an empty reference slice") {
    import spark.implicits._
    val docs = Seq((200L, "some text here")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      NorthStar.perplexityFilterOf(docs, refBelow = 100L, thresholdMicro = 0L)
    }
    assert(ex.getMessage.contains("no language model"))
  }

  test("token chunking conserves the token stream") {
    val chunks = NorthStar.tokenChunks(spark, dir)
    val totalChunked = chunks.agg(sum("n_tokens")).head.getLong(0)
    val totalTokens = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .agg(sum(TextFunctions.tokenCount(col("text")))).head.getLong(0)
    assert(totalChunked == totalTokens, "chunk token counts must sum to the corpus")
    // every chunk except a doc's last is exactly full
    val short = chunks.withColumn("max_idx",
        max("chunk_idx").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(col("chunk_idx") < col("max_idx") && col("n_tokens") =!= 32)
    assert(short.count() == 0, "only a doc's final chunk may be partial")
  }

  test("sequence packing: token conservation and full interior sequences") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val manifest = NorthStar.packSequences(spark, dir, seqLen = 256L).cache()
    // conservation: each doc's manifest contributions sum to its token count
    val perDoc = manifest.groupBy("doc_id").agg(sum("n_tokens").as("packed"))
    val counts = graft.core.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
    assert(perDoc.join(counts, "doc_id").filter(col("packed") =!= col("n")).count() === 0,
      "packing lost or duplicated tokens")
    assert(perDoc.count() === counts.count(), "every tokenful doc must be packed")
    // every sequence except each language's LAST holds exactly seqLen tokens
    val perSeq = manifest.groupBy("lang", "seq_id").agg(sum("n_tokens").as("t"))
    val lastSeq = perSeq.groupBy("lang").agg(max("seq_id").as("last"))
    val interior = perSeq.join(lastSeq, "lang").filter(col("seq_id") < col("last"))
    assert(interior.filter(col("t") =!= 256L).count() === 0,
      "interior sequences must be exactly full")
    manifest.unpersist()
  }

  private def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, Seq[T]]): Seq[T] =
    graft.PlanWalk.collectAll(p)(pf)

  test("sequence packing: no per-language window over the document stream") {
    val manifest = NorthStar.packSequences(spark, dir, seqLen = 256L)
    manifest.collect() // finalize the adaptive plan
    val windows = collectAll(manifest.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
    }
    assert(windows.nonEmpty, "expected window nodes in the packing plan")
    // the running-sum window over DOCUMENTS (ordered by doc_id) must be
    // partition-local — partitioned by (pid, lang), never lang alone:
    // one window group per language is a single task scanning a whole
    // stratum at 100 TB
    val docStream = windows.filter(_.orderSpec.exists(
      _.child.references.exists(_.name == "doc_id")))
    assert(docStream.nonEmpty, "expected the doc_id-ordered running-sum window")
    docStream.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      assert(partCols.contains("pid"),
        s"doc-stream window must partition by (pid, lang); got $partCols")
    }
    // the only lang-partitioned window left must run over the subtotal
    // frame (ordered by pid), not over documents
    windows.filterNot(docStream.contains).foreach { w =>
      val ordCols = w.orderSpec.flatMap(_.child.references.map(_.name)).toSet
      assert(ordCols == Set("pid"),
        s"non-local window must be the tiny per-pid offset cumsum; orders by $ordCols")
    }
  }

  test("two-phase prefix-sum reproduces the single-window packing byte-for-byte") {
    import org.apache.spark.sql.expressions.Window
    val twoPhase = NorthStar.packSequences(spark, dir, seqLen = 256L).collect()
    // reference: the naive per-language unbounded window (fine at sf0.001)
    val base = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def seqOf(p: org.apache.spark.sql.Column) = floor(p / 256L).cast("long")
    val naive = base.withColumn("start", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(seqOf(col("start")), seqOf(col("start") + col("n") - 1))))
      .select(col("lang"), col("seq_id"), col("doc_id"),
        (least((col("seq_id") + 1) * 256L, col("start") + col("n")) -
          greatest(col("seq_id") * 256L, col("start"))).as("n_tokens"))
      .orderBy("lang", "seq_id", "doc_id")
      .collect()
    assert(twoPhase.toSeq == naive.toSeq,
      "distributed prefix-sum must yield the identical manifest")
  }

  test("decontamination flags a constructed benchmark copy") {
    import spark.implicits._
    // doc 3 is benchmark (id < 10); doc 12 repeats its text verbatim →
    // must be flagged with every distinct shingle shared
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, "one two three four five six"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta"),
      (15L, "totally unrelated words nothing in common here at all")
    ).toDF("doc_id", "text")
    val flagged = NorthStar.decontaminationOf(docs, n = 5, benchBelow = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(12L), s"expected only doc 12 flagged, got $flagged")
    assert(flagged(12L) == 4, "8 tokens -> 4 distinct 5-gram shingles, all shared")
  }

  test("fraction decontamination: verbatim copy flags, light overlap does not") {
    import spark.implicits._
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // benchmark
      (12L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim copy
      (15L, "alpha beta gamma delta epsilon completely different words here now ok"),
      (20L, "totally unrelated words nothing in common here at all")
    ).toDF("doc_id", "text")
    val got = NorthStar.decontaminationFractionOf(docs, n = 5, benchBelow = 10L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet === Set(12L, 15L, 20L), "benchmark rows never report")
    assert(got(12L) === ((4L, 4L, 10000L, true)), "verbatim copy: full overlap")
    // 11 tokens -> 7 shingles, exactly the first one shared -> 1428 bp
    assert(got(15L) === ((7L, 1L, 1428L, false)), "light overlap stays under 50%")
    assert(got(20L)._2 === 0L && !got(20L)._4)
  }

  test("DSIR importance: deterministic, covers every tokenful doc, ranks target-like up") {
    val r1 = NorthStar.dsirImportance(spark, dir).collect()
    assert(r1.toSeq == NorthStar.dsirImportance(spark, dir).collect().toSeq,
      "importance scores must be deterministic")
    val n = Tables.documents(spark, dir)
      .filter(col("text").isNotNull &&
        TextFunctions.tokenCount(col("text")) > 0).count()
    assert(r1.length.toLong == n, "every tokenful doc gets a score")
    // keep is exactly the sign of the score
    assert(r1.forall(r => r.getBoolean(3) == (r.getLong(2) > 0L)))
    // the point of the operator: the target slice scores higher than
    // the rest ON AVERAGE (English docs share the English buckets)
    val lang = Tables.documents(spark, dir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, other) = r1.partition(r => lang(r.getLong(0)) == "en")
    assert(en.nonEmpty && other.nonEmpty, "fixture must carry both slices")
    def mean(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(_.getLong(2).toDouble).sum / xs.length
    assert(mean(en) > mean(other),
      s"en mean ${mean(en)} must exceed non-target mean ${mean(other)}")
  }

  test("d48: the vocabulary is the MINIMAL coverage prefix; UNK rates are exact") {
    // corpus token mass: a×8, b×5, c×4, d×2, e×1 (total 20). At 90%
    // coverage (18 tokens) the rank order is a(8) b(5) c(4) → cum 17
    // short of ceil(18), so d joins (cum-с rule includes the crossing
    // token); e stays OOV. Docs are built to give distinct UNK rates.
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a a a b b"),        // no unks
      (2L, "b b b c c c c d d"),         // no unks (d is in-vocab)
      (3L, "e"))                          // 100% unk
      .toDF("doc_id", "text")
    val tmp = graft.core.RunTemp.dir("graft_vocab_spec_")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = NorthStar.vocabCoverage(spark, tmp, coverBp = 9000).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) === ((10L, 0L, 0L, 4L)))
    assert(got(2L) === ((9L, 0L, 0L, 4L)), "the threshold-crossing token is in-vocab")
    assert(got(3L) === ((1L, 1L, 10000L, 4L)), "OOV-only doc reads 100% unk")
  }

  test("d49: no near-dup cluster straddles splits; every planted pair stays together") {
    val dir = "/root/testdata/sf0.001"
    val clusters = NorthStar.nearDupClustersFrame(spark, dir)
    val split = NorthStar.groupAwareSplitFrom(clusters, spark, dir)
    val byDoc = split.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    // the leakage invariant: one split per cluster
    val perCluster = clusters.collect()
      .map(r => r.getLong(1) -> byDoc(r.getLong(0))._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(perCluster.nonEmpty)
    perCluster.foreach { case (cid, splits) =>
      assert(splits.size === 1, s"cluster $cid straddles splits: $splits")
    }
    // every planted pair (id, id+100000) is near-dup ⇒ same split
    val planted = byDoc.keys.filter(_ >= 100000L)
    assert(planted.nonEmpty)
    planted.foreach { pid =>
      assert(byDoc(pid)._2 === byDoc(pid - 100000L)._2,
        s"planted pair ($pid, ${pid - 100000L}) leaked across splits")
    }
    // the contrast: d16's per-doc split DOES leak on this corpus —
    // the mutated copy hashes differently from its original, so some
    // planted pair lands in different d16 buckets (that observed leak
    // is d49's reason to exist)
    clusters.unpersist()
  }
}
