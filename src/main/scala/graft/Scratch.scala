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

    for (round <- 1 to 2) {
      time(s"d09 ngram jaccard r$round") {
        SparkEntry.queries("d09_ngram_jaccard_near_dups")(spark, sfDir).count()
      }
      time(s"d13 neardup clusters r$round") {
        SparkEntry.queries("d13_neardup_clusters")(spark, sfDir).count()
      }
      time(s"d14 corpus clean r$round") {
        SparkEntry.queries("d14_corpus_clean")(spark, sfDir).count()
      }
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
