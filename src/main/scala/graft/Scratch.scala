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

    // ANN recall/time tradeoff: recall@5 vs brute force at sf0.01,
    // wall time at the bench SF.
    locally {
      import graft.operators.Similarity
      val small = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      val bf = Similarity.bruteForceTopK(small, "vec_id", "embedding", 5)
        .select("query_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val big = spark.read.parquet(s"$sfDir/embeddings.parquet")
      for ((tables, planes) <- Seq((10, 0), (8, 0), (6, 0), (10, -1), (8, -1))) {
        // planes = -1 encodes "occupancy 64": one fewer plane than auto
        val n = small.count()
        val p = if (planes == 0) 0
        else math.max(4, math.ceil(math.log(n / 64.0) / math.log(2)).toInt)
        val ann = Similarity.annTopK(small, "vec_id", "embedding", 5,
          planes = p, tables = tables)
          .select("query_id", "nbr_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (ann & bf).size.toDouble / bf.size
        spark.catalog.clearCache()
        val pBig = if (planes == 0) 0
        else math.max(4, math.ceil(math.log(big.count() / 64.0) / math.log(2)).toInt)
        time(f"v02 tables=$tables occ=${if (planes == 0) 32 else 64} recall=$recall%.3f") {
          Similarity.annTopK(big, "vec_id", "embedding", 5,
            planes = pBig, tables = tables).count()
        }
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
