package graft

// Ad-hoc profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    import graft.operators.{Dedup, NorthStar}

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }

    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    // Heap-pruned rank vs plain window rank, interleaved in one JVM
    // so machine variance cancels: same scored candidate stream.
    locally {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Similarity
      val big = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val base = big.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .withColumn("norm", Similarity.l2Norm(col("vec")))
        .cache()
      base.count()
      val q = base.select(col("id").as("query_id"), col("vec").as("qv"), col("norm").as("qn"))
        .filter(col("query_id") < 2000)
      val scored = q.crossJoin(base)
        .filter(col("query_id") =!= col("id"))
        .withColumn("cosine", Similarity.dot(col("qv"), col("vec")) / (col("qn") * col("norm")))
        .select(col("query_id"), col("id").as("nbr_id"), col("cosine"))
      for (round <- 1 to 3) {
        time(s"window rank r$round") {
          val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("nbr_id").asc)
          scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5).count()
        }
        time(s"heap rank r$round") {
          graft.plans.TopK.topKPerKey(scored, Seq("query_id"), "cosine", 5, Seq("nbr_id")).count()
        }
      }
      base.unpersist()
    }
    locally {
      import graft.pipeline._
      val root = java.nio.file.Files.createTempDirectory("cocoa_scratch").toString
      val dirs = CocoaPipeline.Dirs(
        s"$root/landing", s"$root/staging", s"$root/warehouse", s"$root/archive")
      time("cocoa gen batch 1") {
        CocoaGen.writeLandingFiles(spark, dirs.landing, 2, 500, seed = 41, idOffset = 0); 0L
      }
      time("cocoa run batch 1") {
        CocoaPipeline.runBatch(spark, dirs, new java.sql.Timestamp(1700000000000L)).warehouseRows
      }
      time("cocoa gen batch 2") {
        CocoaGen.writeLandingFiles(spark, dirs.landing, 2, 500, seed = 42, idOffset = 500); 0L
      }
      time("cocoa run batch 2") {
        CocoaPipeline.runBatch(spark, dirs, new java.sql.Timestamp(1700000100000L)).warehouseRows
      }
      time("cocoa read+order") {
        Warehouse.read(spark, dirs.warehouse).orderBy("shipment_id").count()
      }
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.cache().count()
    time("ivf build only") {
      val (assigned, cents) = graft.operators.IvfIndex.build(spark, emb, "vec_id", "embedding", 10)
      assigned.count()
    }
    time("v04 full") {
      NorthStar.ivfTopK(spark, sfDir).count()
    }
    time("v02 full") {
      NorthStar.annTopK(spark, sfDir).count()
    }
    time("v03 full") {
      NorthStar.embeddingNearDups(spark, sfDir).count()
    }
    spark.stop()
  }
}
