package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale shape of the CDC apply (replication) step: fixed churn against
  * 1× and 4× corpora, CoW vs merge-on-read replicas — is a replication
  * step churn-proportional or corpus-proportional? Each round builds a
  * source + replica (initial load via replicateOnce), commits a fixed
  * ~3k-row churn (delete + update + ingest), and times ONE
  * replicateOnce. The id-bounds candidate pruning plus the file-pruned
  * feed should keep the step flat in corpus size for clustered churn;
  * the MoR face should beat CoW under scattered churn (masks vs file
  * rewrites). */
object CdcApplyProfile {
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
      println(f"PROF $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val base = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val shift = base.agg(max("o_orderkey")).head().getLong(0) + 1

    var seq = 0
    for (mult <- Seq(1, 4); mode <- Seq("copy-on-write", "merge-on-read")) {
      seq += 1
      val corpus = (0 until mult).map(i =>
        base.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)))
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      println(s"--- corpus ${mult}x ($n rows), replica mode $mode ---")
      val whDir = java.nio.file.Files.createTempDirectory("capplyprof").toString
      val cat = s"gcap$seq"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", whDir)
      val hc = new graft.catalog.HadoopCatalog(whDir, s)
      val src = hc.createTable("db.src", graft.core.Schema.fromSpark(corpus.schema),
        properties = Map("format-version" -> "3"))
      val rep = hc.createTable("db.rep", graft.core.Schema.fromSpark(
          corpus.withColumn("_src_row_id", lit(0L)).schema),
        properties = Map("format-version" -> "3", "write.merge.mode" -> mode))
      // several appends → a multi-file replica, so candidate pruning has
      // something to prune
      (0 until 4).foreach(i => src.refresh().append(
        corpus.filter(col("o_orderkey") % 4 === i)))
      time("initial load (full backfill)") {
        graft.streaming.TableChanges.replicateOnce(src.refresh(), rep)
      }
      // fixed ~3k-row churn regardless of corpus size, scattered over the
      // FIRST 1× slice (so at 4× it is also clustered toward old files)
      s.sql(s"DELETE FROM $cat.db.src WHERE o_orderkey % 97 = 3 AND o_orderkey < $shift")
      s.sql(s"UPDATE $cat.db.src SET o_totalprice = o_totalprice + 1 " +
        s"WHERE o_orderkey % 97 = 5 AND o_orderkey < $shift")
      src.refresh().append(base.filter(col("o_orderkey") % 97 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + lit(mult * shift)))
      val r = time(s"apply fixed churn (${mult}x, $mode)") {
        graft.streaming.TableChanges.replicateOnce(src.refresh(), rep)
      }
      println(s"     applied insert=${r._1} update=${r._2} delete=${r._3}")
      corpus.unpersist()
    }
    s.stop()
  }
}
