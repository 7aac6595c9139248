package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; queries probe only the
  * `nProbe` nearest cells. The second ANN family next to the sign-LSH
  * in [[Similarity]] (north-star mandate: "an IVF or LSH-bucketed
  * variant as the scale path").
  *
  * Division of labor is the point at scale:
  *  - TRAIN (driver-coordinated, sampled): MLlib KMeans fits `nCells`
  *    centroids — on 100 TB you fit on a sample; the model is tiny
  *    (cells × dim floats).
  *  - ASSIGN (distributed, linear): every vector gets its cell id —
  *    one scan, the "index build". A real deployment persists this
  *    partitioned-by-cell.
  *  - SEARCH (distributed, pruned): each query scores the centroid
  *    table (broadcast — it is tiny), keeps `nProbe` cells, joins
  *    cell-partitioned candidates, exact-scores only those. Work per
  *    query drops from O(n) to O(n · nProbe / nCells).
  */
object IvfIndex {

  /** Build cell assignments + the centroid table. */
  def build(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("mlvec", array_to_vector(col("vec")))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("mlvec").setPredictionCol("cell")
      .fit(base)
    // Materialize the index: cell assignment + per-row norm is the
    // build artifact (production persists it partitioned by cell);
    // without this every downstream consumer re-runs the k-means
    // transform, and norms would be recomputed per consumer.
    // cache() — see Dedup.bucketSelfPairs for the cache-vs-checkpoint
    // tradeoff; callers clear the session cache between jobs.
    val assigned = model.transform(base).drop("mlvec")
      .withColumn("norm", Similarity.l2Norm(col("vec")))
      .cache()
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) })
      .toDF("cell", "centroid")
    (assigned, centroids)
  }

  /** Approximate top-k via cell probing. `queries` defaults to the
    * whole corpus (all-pairs kNN shape). */
  def topK(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 3,
      queries: Option[DataFrame] = None): DataFrame = {
    val (assigned, centroids) = build(spark, df, idCol, vecCol, nCells)

    // External queries compute their own norms; the all-pairs default
    // reuses the norm baked into the build artifact.
    val q = queries
      .map(_.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("qnorm", Similarity.l2Norm(col("vec"))))
      .getOrElse(assigned.select(col("id"), col("vec"), col("norm").as("qnorm")))

    // Probe selection: tiny centroid table broadcast against queries.
    // Rank cells by squared euclidean |q−c|² = |q|² − 2q·c + |c|²;
    // |q|² is constant per query so |c|² − 2q·c suffices (plain −q·c
    // would bias toward long centroids).
    val probeW = Window.partitionBy("id").orderBy(col("cdist").asc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        SketchExpressions.floatDot(col("centroid"), col("centroid")) -
          lit(2.0) * SketchExpressions.floatDot(col("vec"), col("centroid")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("id").as("query_id"), col("vec").as("query_vec"),
        col("qnorm"), col("cell"))

    // Candidate join inside probed cells only, then exact cosine top-k
    // (norms precomputed per row, not per pair).
    val cands = probes.join(
        assigned.select(col("cell"), col("id").as("nbr_id"),
          col("vec").as("nbr_vec"), col("norm").as("nnorm")),
        Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    cands
      .withColumn("cosine", Similarity.cosineWithNorms(
        SketchExpressions.floatDot(col("query_vec"), col("nbr_vec")),
        col("qnorm"), col("nnorm")))
      .dropDuplicates("query_id", "nbr_id")
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), graft.functions.Quantize.quantize4(col("cosine")).as("cosine"), col("rank").cast("long").as("rank"))
  }
}
