package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** 1-minute system load average — stamped around every measured rep so
    * the artifact is self-adjudicating on this box's periodic external
    * load (same-code totals drifted 154.9→224.4 s across windows; a
    * number without load evidence can't be told from a regression). */
  private def load1(): Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** Cumulative JVM process CPU seconds. Wall time that the CPU column
    * can't account for = scheduler pressure from OUTSIDE this process —
    * the direct fingerprint of a poisoned window. */
  private def procCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** One measured rep: (wall sec, ok, load before, load after, cpu sec). */
  final case class Rep(t: Double, ok: Boolean, loadBefore: Double,
    loadAfter: Double, cpuSec: Double)

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
    // recycle the SparkSession every N queries: 123 queries through one
    // session accumulate heap/cache/codegen pressure that made late-suite
    // numbers drift up to 17× vs isolated (r10: ice_readable_metrics 16.1s
    // in-suite vs 0.93s fresh). Each new session gets an untimed warmup.
    val recycleEvery = sys.env.getOrElse("SPARK_GRAFT_RECYCLE", "20").toInt.max(1)
    var failed = List.empty[String]
    var sinceRecycle = 0
    val measured = selected.map { case (name, fn) =>
      if (sinceRecycle >= recycleEvery) {
        spark.stop()
        spark = mkSession()
        try SparkEntry.queries("count_star")(spark, sfDir).count() catch { case _: Throwable => }
        sinceRecycle = 0
      }
      sinceRecycle += 1
      // SPARK_GRAFT_WARMUP=1 (set by the parent for fresh-JVM isolation
      // children): one UNTIMED rep first, so "isolated" measures
      // steady-state plan+compute rather than cold-JIT — r12's cold
      // children read 2× the in-suite number and looked like phantom
      // regressions (stream_lineage_cdc 19.3s cold vs 9.94 in-suite)
      if (sys.env.get("SPARK_GRAFT_WARMUP").contains("1"))
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      // a crashing query must fail the bench run, not record a fast time —
      // and a fast-CRASHING rep must not win the min either
      val times = (1 to reps).map { _ =>
        val lb = load1()
        val c0 = procCpuSec()
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
        Rep((System.nanoTime() - t0) / 1e9, ok, lb, load1(),
          procCpuSec() - c0)
      }
      val good = times.filter(_.ok).map(_.t)
      name -> (if (good.nonEmpty) good.min else times.map(_.t).max, times)
    }
    val results: Map[String, Double] = measured.map { case (n, (t, _)) => n -> t }
    val repStats: Map[String, Seq[Rep]] = measured.map { case (n, (_, ts)) => n -> ts }

    // prior settled numbers (last run's BENCH_FULL.json, committed at round
    // end): a query's settled value is its isolated time when one was
    // recorded, else its in-suite time. Drives RATIO-based isolation below.
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_FULL_OUT", "BENCH_FULL.json"))
    val prior: Map[String, Double] =
      if (!java.nio.file.Files.exists(fullPath)) Map.empty
      else try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val j = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(fullPath)))
        def nums(field: String): Map[String, Double] = j \ field match {
          case JObject(fs) => fs.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
          }.toMap
          case _ => Map.empty
        }
        nums("queries") ++ nums("isolated") // isolated wins on shared keys
      } catch { case _: Throwable => Map.empty }

    // isolated re-run: suspect queries each get a FRESH SparkContext (and
    // an untimed warmup), so the artifact separates plan+compute cost from
    // in-suite memory pressure / cache churn. Selection is by RATIO vs the
    // prior settled number (>2× = suite-noise suspect) plus the top-K by
    // absolute time; r9's top-5-absolute-only selection shipped two
    // phantom 5× "regressions" that re-measured flat in a fresh session.
    // SPARK_GRAFT_ISOLATE=0 disables.
    val isolateK = sys.env.getOrElse("SPARK_GRAFT_ISOLATE", "5").toInt
    val suspects: Seq[String] =
      if (isolateK <= 0 || failed.nonEmpty) Nil
      else {
        // >2× always suspect; queries already slower than 1s settled get a
        // tighter 1.5× trigger — sub-2× creep on an expensive query (r12:
        // ice_scan_filter_dsl 1.78→2.63s) otherwise never earns a
        // fresh-JVM verdict
        val byRatio = results.toSeq.collect {
          case (n, t) if prior.get(n).exists(p =>
            p > 0.05 && (t > 2 * p || (p > 1.0 && t > 1.5 * p))) => n
        }
        val byAbs = results.toSeq.sortBy(-_._2).take(isolateK).map(_._1)
        // ratio suspects FIRST so the cap can never drop them (the whole
        // point of ratio selection is catching suite-noise regressions
        // outside the top-K absolute); cap grows with the suspect count
        (byRatio ++ byAbs).distinct
          .take(math.max(byRatio.size, (isolateK + byRatio.size).min(15)))
      }
    // fresh-JVM isolation (r12): the r11 in-JVM isolated re-runs were
    // themselves load-poisoned — a fresh SparkContext in the SAME JVM
    // right after the 126-query suite recorded 4.20s for a query a
    // genuinely fresh session measures at 1.94s (heap fragmentation,
    // codegen-cache pressure, and box heat all survive a context
    // restart). Each suspect now gets its OWN child JVM, forked with this
    // JVM's exact arguments (add-opens, -Xmx, spark props) after the
    // suite session has fully stopped, so "isolated" matches what a
    // single-query `sbt runMain` would measure. The child is Bench
    // itself with SPARK_GRAFT_ONLY=<name> and isolation disabled; its
    // best-of-reps number is read back from its full-artifact file.
    // per-suspect attempt records for the artifact: (wall, loadBefore,
    // loadAfter, cpuSec) of every child run, accepted or not — plus the
    // parent's pre-launch load reading per attempt (the quiet verdict)
    val isoAttempts = scala.collection.mutable.Map.empty[String, Seq[Seq[Double]]]
    val isoPre = scala.collection.mutable.Map.empty[String, Seq[Double]]
    val isolated: Seq[(String, Double)] =
      if (suspects.isEmpty) Nil
      else {
        spark.stop()
        val cooldownMs =
          sys.env.getOrElse("SPARK_GRAFT_ISOLATE_COOLDOWN_MS", "5000").toLong
        Thread.sleep(cooldownMs) // let suite shutdown + box load settle
        import scala.jdk.CollectionConverters._
        val javaBin = java.nio.file.Paths
          .get(sys.props("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toSeq
        val cp = sys.props("java.class.path")
        // quiet-window gating (this box's external load cycles 0 → ~3.5
        // on an hourly cadence): wait for load1 under the threshold
        // before each child, and re-run (bounded) when load rose through
        // the run — an isolated number stamped "quiet" is evidence; one
        // stamped "noisy" after retries ran out is at least labeled
        val quietLoad =
          sys.env.getOrElse("SPARK_GRAFT_ISO_QUIET_LOAD", "1.5").toDouble
        val quietWaitMs =
          sys.env.getOrElse("SPARK_GRAFT_ISO_QUIET_WAIT_MS", "180000").toLong
        val isoTries =
          sys.env.getOrElse("SPARK_GRAFT_ISO_TRIES", "3").toInt.max(1)
        def awaitQuiet(): Double = {
          val deadline = System.nanoTime() + quietWaitMs * 1000000L
          var l = load1()
          while (l > quietLoad && System.nanoTime() < deadline) {
            Thread.sleep(5000)
            l = load1()
          }
          l
        }
        def runChild(name: String): Option[Double] = {
          val out = java.nio.file.Files.createTempFile("bench-iso-", ".json")
          java.nio.file.Files.delete(out) // child must see it absent (prior-parse)
          val pb = new ProcessBuilder(
            (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava)
          val env = pb.environment()
          env.put("SPARK_GRAFT_ONLY", name)
          env.put("SPARK_GRAFT_ISOLATE", "0")
          env.put("SPARK_GRAFT_WARMUP", "1") // untimed first rep (cold JIT)
          env.put("SPARK_GRAFT_REPS", reps.toString)
          env.put("SPARK_GRAFT_SF_DIR", sfDir)
          env.put("SPARK_GRAFT_CPUS", cpus)
          env.put("SPARK_GRAFT_FULL_OUT", out.toString)
          env.put("SPARK_GRAFT_SUMMARY_OUT", out.toString + ".summary")
          // child stdout would violate the parent's last-line-JSON
          // contract; its numbers come back through the artifact file
          pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
          pb.redirectError(ProcessBuilder.Redirect.INHERIT)
          val p = pb.start()
          val done = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
          if (!done) { p.destroyForcibly(); p.waitFor() }
          if (!done || p.exitValue() != 0) None
          else try {
            import org.json4s._
            import org.json4s.jackson.JsonMethods
            val j = JsonMethods.parse(new String(
              java.nio.file.Files.readAllBytes(out)))
            val reps = j \ "load" \ name match {
              case JArray(rows) => rows.collect { case JArray(vs) =>
                vs.collect { case JDouble(d) => d; case JInt(i) => i.toDouble }
              }
              case _ => Nil
            }
            isoAttempts(name) = isoAttempts.getOrElse(name, Nil) ++ reps
            val t = j \ "queries" \ name match {
              case JDouble(v) => Some(v)
              case JInt(v) => Some(v.toDouble)
              case _ => None
            }
            try {
              java.nio.file.Files.deleteIfExists(out)
              java.nio.file.Files.deleteIfExists(
                java.nio.file.Paths.get(out.toString + ".summary"))
            } catch { case _: Throwable => }
            t
          } catch { case _: Throwable => None }
        }
        suspects.flatMap { name =>
          var best: Option[Double] = None
          var attempt = 0
          var launchedQuiet = false
          while (attempt < isoTries && !launchedQuiet) {
            attempt += 1
            // quiet is judged at LAUNCH (after the wait, before the child
            // saturates the cores): the child's own 32-thread reps keep
            // 1-min loadavg above any sane threshold for their duration,
            // so in-rep load edges can't distinguish self-load from the
            // external cycle — the pre-launch reading can, and it is
            // recorded per attempt as `isolated_pre_load`
            val pre = awaitQuiet()
            isoPre(name) = isoPre.getOrElse(name, Nil) :+ pre
            launchedQuiet = pre <= quietLoad
            val t = runChild(name)
            best = (best.toSeq ++ t.toSeq).minOption
          }
          if (best.isEmpty) {
            System.err.println(s"BENCH ISOLATED FAILURE in $name (fresh-JVM child)")
            if (!failed.contains(name)) failed ::= name
          }
          best.map(name -> _)
        }
      }
    // locale-fixed: under a comma-decimal default locale f"%.3f" would
    // emit invalid JSON into both artifacts
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // per-rep load evidence: [wall, load1 before, load1 after, proc-cpu] —
    // a rep whose wall ≫ cpu/cores or whose load edges sit above the
    // quiet threshold was measured through external box load, and the
    // artifact now says so itself (same-code totals drifted 154.9→224.4 s
    // across windows before this field existed)
    def repRow(r: Rep): String =
      s"[${fmt(r.t)},${fmt(r.loadBefore)},${fmt(r.loadAfter)},${fmt(r.cpuSec)}]"
    val loads = repStats.map { case (k, rs) =>
      "\"" + k + "\":" + rs.map(repRow).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val isoLoads = isoAttempts.map { case (k, rows) =>
      "\"" + k + "\":" + rows.map(_.map(fmt).mkString("[", ",", "]"))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val isoPres = isoPre.map { case (k, vs) =>
      "\"" + k + "\":" + vs.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"isolated":$iso,"isolation_mode":"fresh-jvm-warm-quiet","load":$loads,"isolated_load":$isoLoads,"isolated_pre_load":$isoPres,"sf":"$sfDir"}"""
    java.nio.file.Files.write(fullPath, full.getBytes("UTF-8"))
    println(full)
    // the driver records only the final ~2000 chars of output and parses
    // the LAST stdout line as JSON; the full per-query line above exceeds
    // that window, so the last line is a compact summary (slowest 25 + all
    // isolated re-runs) guaranteed to fit, with a pointer to the full
    // artifact on disk. Also persisted to its own file so the record
    // survives any stdout mangling (build.sbt suppresses sbt's trailing
    // "[success]" line, which broke the r9/r10 parses).
    val top = results.toSeq.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"full":"${fullPath.toString}","queries":$top,"isolated":$iso,"isolation_mode":"fresh-jvm-warm-quiet"}"""
    val summaryPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SUMMARY_OUT", "BENCH_SUMMARY.json"))
    java.nio.file.Files.write(summaryPath, summary.getBytes("UTF-8"))
    spark.stop() // before the final println: stop() must not out-print it
    println(summary)
    if (failed.nonEmpty) {
      System.err.println(s"BENCH FAILED queries: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
