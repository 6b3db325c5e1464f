package graft.tools
import org.apache.spark.sql.SparkSession

/** Stage anatomy of ds_pq_ann: cache load, codebook training (per
  * Lloyd's iteration), encode+ADC shortlist, exact re-rank — run twice
  * so round 2 is the settled number. */
object PqAnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    graft.queries.DataOps.oracleExportEnabled = false
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      s.catalog.clearCache()
      time("full ds_pq_ann")(
        graft.queries.DataOps.queries("ds_pq_ann")(s, dir).collect())
      s.catalog.clearCache()
      import org.apache.spark.sql.functions._
      val e = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("cache load")(e.count())
      val books = time("train 2 iters")(
        graft.queries.DataOps.pqTrainBooks(e, 8, 8, 16, iters = 2))
      val codes = graft.queries.DataOps.pqAssignCodes(e, books, 8)
        .select(col("vec_id") +: (0 until 8).map(m => col(s"code_$m")): _*)
      time("encode count")(codes.count())
      val M = 8
      val centLits = (0 until M).map(m =>
        typedLit(books(m).sortBy(_._1).map(_._2.map(_.toFloat))))
      val q = e.filter(col("vec_id") === 0).select(
        (0 until M).map(m => slice(col("embedding"), m * 8 + 1, 8).as(s"q_$m")): _*)
      val joined = (0 until M).foldLeft(codes.crossJoin(broadcast(q))) { (acc, m) =>
        acc.withColumn(s"cent_$m", element_at(centLits(m), col(s"code_$m") + 1))
      }
      import graft.ops.Vectors
      val score =
        (0 until M).map(m => Vectors.dot(col(s"q_$m"), col(s"cent_$m"))).reduce(_ + _) /
          sqrt((0 until M).map(m =>
            Vectors.dot(col(s"cent_$m"), col(s"cent_$m"))).reduce(_ + _))
      val shortlist = joined.filter(col("vec_id") =!= 0)
        .withColumn("score", score)
        .orderBy(col("score").desc, col("vec_id")).limit(100).select(col("vec_id"))
      time("ADC shortlist")(shortlist.collect())
      val qFull = e.filter(col("vec_id") === 0).select(col("embedding").as("q_v"))
      time("re-rank")(shortlist.join(e, Seq("vec_id"))
        .crossJoin(broadcast(qFull))
        .withColumn("cos", Vectors.cosine(col("embedding"), col("q_v")))
        .orderBy(col("cos").desc, col("vec_id")).limit(10).collect())
      println(s"n_vecs=" + s.read.parquet(s"$dir/embeddings.parquet").count())
    }
    s.stop()
  }
}
