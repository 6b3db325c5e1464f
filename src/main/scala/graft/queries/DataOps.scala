package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.TextFunctions
import graft.ops.{Multimodal, Vectors}

/** Training-data pipeline operators over `documents` / `embeddings` /
  * `events` (SURVEY.md §2.L): deduplication (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding cosine), similarity search (brute force +
  * IVF), text analysis (lang-id, quality, tokens, fingerprints),
  * multimodal plumbing, and a Structured Streaming windowed aggregation.
  *
  * Oracle-design rule: every oracle-checked query computes with
  * deterministic, engine-portable primitives (md5, regex token counts,
  * list intersections, sequential-fold cosine) and ends in a total ORDER
  * BY; probabilistic stages (LSH, IVF) are pre-filters whose output is
  * exact-rescored, with recall driven to ~1 at the tested thresholds.
  */
object DataOps {
  import Tables._

  /** Custom-hash operators (SimHash, fingerprints) are not expressible in
    * portable SQL, so their queries materialize the hash stage to a fixed
    * local path and the DuckDB oracle re-derives the DOWNSTREAM logic
    * (banding/hamming, winnowing minima) from that export — the gate then
    * checks everything but the hash function itself, instead of a weak
    * rows-only count. Bench disables the export so measured times stay
    * pure compute. */
  @volatile var oracleExportEnabled: Boolean = true
  /** Overridable per PROCESS (`graft.export.dir`): a concurrent test JVM
    * exercising the same gate functions must not overwrite the export a
    * Verify run's DuckDB oracle is about to read — the oracle SQL strings
    * bake this path in at class load, so the override must be a JVM
    * property set before first use (build.sbt pins the test JVMs to
    * /tmp/graft_export_test; Verify/Bench/driver keep the default). */
  private val ExportDir =
    sys.props.getOrElse("graft.export.dir", "/tmp/graft_export")

  /** DataFrames persisted inside query functions, released when the NEXT
    * query starts (SparkEntry wraps every entry with releaseCaches).
    * Without this the dedup shingle/minhash caches — the heaviest
    * intermediates in the suite — pin executor storage memory for the
    * whole session, competing with later queries' shuffles. */
  private val liveCaches = new scala.collection.mutable.ArrayBuffer[DataFrame]
  private val liveRdds = new scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]
  private[graft] def trackCache(df: DataFrame): DataFrame =
    liveCaches.synchronized { liveCaches += df; df }
  /** RDD-level caches (lineage-truncated iterative frames) ride the same
    * release contract as DataFrame persists. */
  private[graft] def trackRdd(r: org.apache.spark.rdd.RDD[_]): Unit =
    liveCaches.synchronized { liveRdds += r }
  /** Temp warehouses created inside query functions (dedupIncremental):
    * the returned DataFrame reads them lazily, so they are deleted when
    * the NEXT query starts (same contract as the caches) — repeated
    * bench/verify runs can't accumulate corpus-sized /tmp copies. */
  private val liveTempDirs = new scala.collection.mutable.ArrayBuffer[String]
  private lazy val tempDirShutdownHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => liveTempDirs.foreach { p =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      catch { case _: Exception => }
    }))
  private[graft] def trackTempDir(p: String): String =
    liveCaches.synchronized { tempDirShutdownHook; liveTempDirs += p; p }
  /** Memory-sink temp views from streaming gates: the sink holds every
    * output row ON THE DRIVER, and the gate's returned DataFrame reads
    * it lazily — so the view is dropped when the NEXT query starts
    * (same contract as the caches). Without this a sequential runner
    * accumulates one driver-resident result set per streaming gate. */
  private val liveTempViews =
    new scala.collection.mutable.ArrayBuffer[(SparkSession, String)]
  private[graft] def trackTempView(s: SparkSession, name: String): Unit =
    liveCaches.synchronized { liveTempViews += ((s, name)) }
  private[graft] def releaseCaches(): Unit = liveCaches.synchronized {
    // a tracked cache may belong to an already-stopped SparkSession (test
    // suites cycle sessions in one JVM) — never let stale state fail a
    // fresh query; drop the reference either way
    liveCaches.foreach { df =>
      try if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
      catch { case _: Exception => }
    }
    liveCaches.clear()
    liveRdds.foreach { r =>
      try if (!r.sparkContext.isStopped) r.unpersist(false)
      catch { case _: Exception => }
    }
    liveRdds.clear()
    liveTempDirs.foreach { p =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      catch { case _: Exception => }
    }
    liveTempDirs.clear()
    liveTempViews.foreach { case (s, n) =>
      try if (!s.sparkContext.isStopped) s.catalog.dropTempView(n)
      catch { case _: Exception => }
    }
    liveTempViews.clear()
  }

  /** Whitespace token count — ONE definition for every operator that
    * tokenizes (textTokens, textQuality, packSequences, mixBudget); the
    * matching DuckDB form is `len(list_filter(string_split_regex(
    * trim(text), '\s+'), w -> w <> ''))`. A tokenization-rule change
    * must touch this and each oracle SQL together. */
  private def wsTokenCount: Column =
    size(filter(split(trim(col("text")), "\\s+"), w => w =!= ""))

  private def exportForOracle(df: DataFrame, name: String): Unit =
    if (oracleExportEnabled)
      df.write.mode("overwrite").parquet(s"$ExportDir/$name")

  // ---------------------------------------------------------------- dedup

  /** Exact dedup by content hash: input has injected duplicates; keep the
    * smallest doc_id per md5(text). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val dups = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    docs.unionByName(dups)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }
  val dedupExactSql =
    """WITH input AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM input GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  private def wordSet(c: Column): Column =
    array_distinct(filter(split(lower(trim(c)), "\\s+"), w => w =!= ""))

  // distinct 3-word shingles — order-sensitive, so far more discriminative
  // than word sets on repetitive corpora (oracle-side formulation; the
  // Spark side works on ShingleHashes3 int64 arrays)
  private[queries] val shingleSetSql =
    """list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))""".stripMargin

  /** Jaccard over SORTED DISTINCT int64 shingle-hash arrays: one linear
    * merge for |∩|, union by inclusion–exclusion. Value-equal to the
    * string-shingle Jaccard absent 64-bit collisions (P ≈ n²/2⁶⁵ —
    * ~7e-7 for the 2.6e5 distinct shingles at sf0.1; a collision merges
    * two shingles and perturbs J by ~1/|set|). */
  private[queries] def jaccardHashes(a: Column, b: Column): Column = {
    val inter = TextFunctions.sorted_intersect_size(a, b)
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** Exact 3-gram (shingle) Jaccard near-dup pairs via PREFIX FILTERING —
    * the standard exact set-similarity join: under a global token order,
    * two sets with J ≥ t must share a token within their first
    * |S| - ceil(t·|S|) + 1 tokens, so candidates come from a token-keyed
    * equi-join (one shuffle) instead of an all-pairs cross join, with zero
    * false negatives. The DuckDB oracle is the naive quadratic formulation
    * of the same predicate. */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir).orderBy(col("a_id"), col("b_id"))

  /** Unordered (a_id < b_id) near-dup pair frame shared by dedupJaccard
    * and dedupCluster. */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    // sorted distinct int64 shingle hashes, not strings: fixed-width
    // shuffle keys and a linear-merge rescore (see ShingleHashes3).
    // NOT persisted: the codegen'd hash recompute per consumer is cheaper
    // than cache materialization here (measured 2.2-3.1s unpersisted vs
    // 4.4-4.5s persisted at sf0.1) — unlike minhash below, whose extra
    // 128-permutation signature pass makes the cache pay for itself
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.shingle_hashes3(col("text")).as("ws"))
    // global token order = (document frequency asc, token): any total order
    // keeps the prefix-filter guarantee, and rarest-first makes the prefix
    // tokens rare — candidates collapse to docs sharing RARE shingles
    val exploded = docs.select(col("doc_id"), size(col("ws")).as("n"),
      explode(col("ws")).as("tok"))
    // groupBy to a tiny df table that AQE broadcast-joins back — measured
    // faster than a count-over-tok window (which sorts the whole exploded
    // frame) because the exploded side never shuffles for the join
    val freq = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // per-doc prefix via a row_number window; a collect_list + array_sort
    // formulation was tried and measured SLOWER (12.6s vs 7.8s at sf0.1 —
    // the array materialization costs more than the window's sort)
    val ranked = exploded.join(freq, Seq("tok"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("tok"))))
      .withColumn("k", (col("n") - ceil(col("n") * 0.5) + 1).cast("int"))
    // length filter, also lossless at t=0.5: J ≥ 0.5 ⟹ sizes within 2×
    val tokens = ranked.filter(col("rank") <= col("k"))
      .select(col("doc_id"), col("n"), col("tok"))
    val cands = tokens.as("x").join(tokens.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id") &&
          col("x.n") <= col("y.n") * 2 && col("y.n") <= col("x.n") * 2)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val ws = docs.select(col("doc_id"), col("ws"))
    cands
      .join(ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws")), Seq("a_id"))
      .join(ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws")), Seq("b_id"))
      .withColumn("j", jaccardHashes(col("a_ws"), col("b_ws")))
      .filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id"))
  }

  /** Connected-component dedup CLUSTERING over the exact-Jaccard pair
    * graph: a production dedup pipeline keeps one document per near-dup
    * cluster, not per pair — (a,b) and (b,c) must collapse into one group
    * even when (a,c) itself is under threshold. Min-label propagation:
    * every matched node starts labeled with its own id; each round one
    * shuffle join propagates labels across edges and a groupBy takes the
    * min, until no label changes. Rounds ≈ component diameter — near-dup
    * clusters are near-cliques, so 2–4 rounds; for adversarial
    * long-chain graphs the large-star/small-star formulation (same join
    * shape) halves diameters per round. Each round's label frame is
    * persisted and materialized (the convergence count), so lineage
    * depth is bounded by the round count; superseded rounds unpersist
    * immediately and the final frame rides the trackCache contract. The
    * DuckDB oracle derives the same components with a recursive CTE. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // BOTH edge directions from ONE pass over the pair chain (explode, not
    // a self-union: two union branches racing on an uncached frame each
    // compute the full jaccard chain — measured 10.8 s vs 4.5 s init)
    val edges = jaccardPairs(s, dir)
      .select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v")),
        struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(lvl)
    try {
      val (labels, labelsRdd, _) = connectedComponents(edges)
      trackRdd(labelsRdd) // consumed by the returned frame; freed next query
      labels.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
        .select(col("label").as("cluster_rep"), col("cluster_size"))
        .orderBy(col("cluster_rep"))
    } finally edges.unpersist(false)
  }

  /** Min-label CONNECTED COMPONENTS over a both-directions edge frame
    * (`u`, `v` long columns; every undirected edge present both ways).
    * Each round is one neighbor-min propagation followed by a POINTER
    * DOUBLING shortcut (`label ← labels(label)`) — the label-frame form
    * of the large-star contraction: the shortcut at least halves every
    * remaining label-chain depth, so rounds are O(log diameter) instead
    * of O(diameter) (a 10k-node path converges in ~14 rounds, not 10k).
    * Near-dup clusters are near-cliques (2–4 rounds either way); the
    * doubling is what makes adversarial chain graphs safe at scale.
    *
    * Every round's label frame is LINEAGE-TRUNCATED (persisted leaf-RDD
    * frame): an iterative frame otherwise nests the whole prior round's
    * plan so round N re-analyzes and re-codegens an exponentially-growing
    * tree (measured 11 s → 41 s per round at sf0.1; ~0.3 s with
    * truncation). Superseded rounds unpersist immediately; the caller
    * owns the returned RDD's blocks (track or unpersist after use). On a
    * cluster a reliable checkpoint(dir) gives the same shape with
    * executor-loss durability. The decimal label sum detects the
    * fixpoint WITHOUT a per-round join: labels only ever decrease, so
    * the exact sum strictly decreases until converged (Long partials
    * could wrap on large id spaces and fake a premature fixpoint).
    * Returns (node→label frame, its backing RDD, rounds run). */
  private[graft] def connectedComponents(edges: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[_], Int) = {
    val bridge = org.apache.spark.sql.GraftBridge
    def labelSum(d: DataFrame): java.math.BigDecimal =
      d.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0)
    var (labels, labelsRdd) = bridge.cachedLeafFrame(
      edges.select(col("u").as("node")).distinct().withColumn("label", col("node")))
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged) {
      val prop = edges.join(labels, edges("u") === labels("node"))
        .select(edges("v").as("node"), labels("label"))
      // neighbor-min merge, materialized once (both doubling sides read
      // the same persisted RDD — no recompute of the groupBy)
      val (merged, mergedRdd) = bridge.cachedLeafFrame(
        labels.union(prop).groupBy(col("node")).agg(min(col("label")).as("label")))
      // pointer doubling: every label VALUE is itself a node (it is a min
      // over node ids), and labels(x) ≤ x by induction — so the shortcut
      // only ever decreases labels and stays inside the component
      val l2 = merged.select(col("node").as("__n2"), col("label").as("__l2"))
      val doubled = merged.join(l2, merged("label") === l2("__n2"), "left")
        .select(merged("node"),
          coalesce(col("__l2"), merged("label")).as("label"))
      val (next, nextRdd) = bridge.cachedLeafFrame(doubled)
      // the sum both decides convergence and materializes `next`
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      mergedRdd.unpersist(false)
      labelsRdd.unpersist(false)
      labels = next
      labelsRdd = nextRdd
      rounds += 1
    }
    (labels, labelsRdd, rounds)
  }
  val dedupClusterSql =
    s"""WITH RECURSIVE tok AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, $shingleSetSql AS s FROM tok),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
      |edges AS (
      |  SELECT a_id AS u, b_id AS v FROM pairs
      |  UNION ALL SELECT b_id, a_id FROM pairs),
      |cc(node, comp) AS (
      |  SELECT DISTINCT u, u FROM edges
      |  UNION
      |  SELECT e.v, cc.comp FROM cc JOIN edges e ON e.u = cc.node
      |  WHERE cc.comp < e.v),
      |comps AS (SELECT node, min(comp) AS comp FROM cc GROUP BY node)
      |SELECT comp AS cluster_rep, count(*) AS cluster_size
      |FROM comps GROUP BY comp ORDER BY cluster_rep""".stripMargin

  val dedupJaccardSql =
    s"""WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, $shingleSetSql AS s FROM tok)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |      CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** EXACT SUBSTRING DEDUP (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better"): flag every 8-word window that occurs
    * verbatim in MORE THAN ONE document and report, per affected doc, how
    * many of its distinct windows are cross-doc duplicated. The suffix
    * array of the paper is a single-machine structure; the distributed
    * equivalent is window fingerprints: one explode over 64-bit window
    * hashes (8-byte shuffle keys via WindowHashesN, not ~50-byte strings),
    * one groupBy to find windows with ≥2 distinct docs, one equi-join
    * back. Work is O(total tokens) rows through two shuffles — no pairwise
    * comparisons, so it survives 100 TB where the suffix array can't. The
    * DuckDB oracle derives the identical counts from literal window
    * strings. */
  def substringDedup(s: SparkSession, dir: String): DataFrame = {
    // the hashed window arrays feed BOTH the shared-window aggregate and
    // the join-back side; persist them once (doc-count rows of ~50-long
    // arrays — ~400 B/doc) instead of re-tokenizing the corpus per branch
    // (measured 6.0 → 1.0 s at sf0.1)
    val docs = trackCache(t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.window_hashes(col("text"), 8).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ex = docs
      .select(col("doc_id"), size(col("ws")).as("tot_windows"),
        explode(col("ws")).as("h"))
    // windows seen in ≥2 distinct docs; ws is per-doc DISTINCT, so a
    // plain count(*) equals the distinct-doc count — no countDistinct
    val shared = ex.groupBy(col("h"))
      .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select(col("h"))
    nonEmpty(ex.join(shared, Seq("h"))
      .groupBy(col("doc_id"), col("tot_windows"))
      .agg(count(lit(1)).as("dup_windows"))
      .select(col("doc_id"), col("dup_windows"), col("tot_windows"))
      .orderBy(col("doc_id")))
  }
  val substringDedupSql = {
    val win = "concat_ws(' ', w[i],w[i+1],w[i+2],w[i+3],w[i+4],w[i+5],w[i+6],w[i+7])"
    s"""WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(w) - 7, 1)), i -> $win)) AS wins
      |  FROM tok),
      |ex AS (SELECT doc_id, len(wins) AS tot_windows, unnest(wins) AS h FROM d),
      |shared AS (SELECT h FROM ex GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
      |SELECT doc_id, count(*) AS dup_windows, any_value(tot_windows) AS tot_windows
      |FROM ex JOIN shared USING (h)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** MinHash+LSH near-dedup: 64 permutations over 3-word shingles, 1-row
    * bands (recall 1-(1-j)^64 ≈ 1-5e-20 at j≥0.5), candidates
    * exact-rescored by shingle Jaccard. Same answer as dedupJaccard, found
    * the scalable way: signatures shuffle once on (band, hash) instead of
    * an all-pairs cross join. */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // shingling + 128-perm minhash is the heavy compute and feeds THREE
    // consumers (band explode, both sides of the rescore join) — persist
    // it once instead of recomputing per branch. MEMORY_AND_DISK: spills
    // instead of OOMing at scale, and each executor holds only its slice
    val docs = trackCache(t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.shingle_hashes3(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        TextFunctions.minhash_of_hashes(col("ws"), 128).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // 64 bands × 2 rows: catch probability 1-(1-j²)^64 (≈1-1e-8 at j=0.5)
    // with far fewer candidates than 1-row bands — a pair must collide on
    // BOTH permutations of some band
    val bands = docs.select(col("doc_id"), explode(transform(
      sequence(lit(0), lit(63)),
      b => struct(b.as("band"),
        element_at(col("sig"), b * 2 + 1).as("h1"),
        element_at(col("sig"), b * 2 + 2).as("h2")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.h1").as("h1"), col("bk.h2").as("h2"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h1") === col("y.h1") &&
          col("x.h2") === col("y.h2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val ws = docs.select(col("doc_id"), col("ws"))
    cands
      .join(ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws")), Seq("a_id"))
      .join(ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws")), Seq("b_id"))
      .withColumn("j", jaccardHashes(col("a_ws"), col("b_ws")))
      .filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }
  /** Oracle = the exact pairwise result (LSH is a recall-~1 pre-filter). */
  val dedupMinhashLshSql = dedupJaccardSql

  /** SimHash near-dup: 64-bit signatures, 4×16-bit band index (pigeonhole:
    * hamming ≤ 3 ⟹ some band equal), exact hamming verify via bit_count.
    * Signatures are exported so the oracle can verify the band-join +
    * hamming logic pairwise in DuckDB. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.simhash64(col("text")).as("sh"))
    exportForOracle(docs, "simhash_sigs")
    val banded = docs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"), shiftright(col("sh"), i * 16)
          .bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.bk.band") === col("y.bk.band") && col("x.bk.key") === col("y.bk.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sh").as("a_sh"), col("y.sh").as("b_sh"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }
  /** Oracle = naive pairwise hamming over the exported signatures; the
    * band join is exact for hamming ≤ 3 by pigeonhole (4 bands). */
  val dedupSimhashSql =
    s"""WITH s AS (SELECT doc_id, sh
      |  FROM read_parquet('$ExportDir/simhash_sigs/*.parquet'))
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3
      |ORDER BY a_id, b_id""".stripMargin

  /** Embedding near-dup via IVF-cell candidates + exact rescore — the
    * shape production embedding dedup (SemDeDup-style) runs at 100 TB:
    * every vector is assigned to its top-2 of K coarse cells (top-2 buys
    * boundary recall), candidate pairs are generated WITHIN a cell (one
    * shuffle on cell id), and candidates are exact-rescored with the true
    * cosine. No all-pairs cross join anywhere. At threshold 0.4 on this
    * near-uniform corpus no LSH family separates matches from background
    * (bit-agreement 0.63 vs 0.50), so a lossless pre-filter cannot exist;
    * the operator is therefore DEFINED as clustered near-dup — and the
    * oracle runs the IDENTICAL deterministic procedure in DuckDB, keeping
    * the gate exact. Recall vs the quadratic join is asserted in
    * DataOpsSpec (measured: 0.92 @sf0.001, 0.97 @sf0.01, 0.81 @sf0.1 with
    * ~5× candidate pruning). K=256 fixed centroids, m=8 probes here; at
    * scale K ∝ n keeps candidates ~ n·m² (linear), cells bounded. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), Vectors.norm(col("embedding")).as("nrm"))
    val cents = e.filter(col("vec_id") < 256)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_v"),
        col("nrm").as("cent_n"))
    // norms precomputed ONCE per vector/centroid — the n×K assignment then
    // costs one dot product per pair instead of three array folds
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cs", Vectors.dot(col("embedding"), col("cent_v")) /
        (col("nrm") * col("cent_n")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cs").desc, col("cent_id"))))
      .filter(col("rn") <= 8)
      .select(col("cent_id"), col("vec_id"), col("embedding"), col("nrm"))
    val a = assigned.select(col("cent_id"), col("vec_id").as("a_id"),
      col("embedding").as("a_v"), col("nrm").as("a_n"))
    val b = assigned.select(col("cent_id"), col("vec_id").as("b_id"),
      col("embedding").as("b_v"), col("nrm").as("b_n"))
    a.join(b, Seq("cent_id")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", Vectors.dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }
  val embedNearDupSql =
    """WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 256),
      |scored AS (
      |  SELECT e.vec_id, e.embedding, c.cent_id,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(e.embedding, c.cent_v) DESC, c.cent_id) AS rn
      |  FROM embeddings e CROSS JOIN cents c),
      |assign AS (SELECT vec_id, embedding, cent_id FROM scored WHERE rn <= 8)
      |SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |FROM assign a JOIN assign b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
      |ORDER BY a_id, b_id""".stripMargin

  // ------------------------------------------------------------ similarity

  /** Brute-force cosine top-k against one query vector (the scale baseline:
    * one pass, map-side top-k via sort+limit). Emits ids only — scores stay
    | out of the hash so float noise can't flip equality. */
  def annCosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_v"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos", Vectors.cosine(col("embedding"), col("q_v")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"))
  }
  val annCosineTopKSql =
    """SELECT b.vec_id
      |FROM embeddings q JOIN embeddings b ON b.vec_id <> 0
      |WHERE q.vec_id = 0
      |ORDER BY list_cosine_similarity(q.embedding, b.embedding) DESC, b.vec_id
      |LIMIT 10""".stripMargin

  /** IVF-style ANN: assign vectors to fixed coarse centroids (embeddings
    * 0..15 — deterministic, no training step), probe the query's 4 nearest
    * cells, exact-rescore candidates. The scale path: the bucketed join
    * touches ~4/16 of the data instead of all of it. The oracle runs the
    * identical deterministic procedure in DuckDB; recall vs brute force is
    * asserted in DataOpsSpec. */
  def annIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_v"))
    // cell assignment = argmax cosine over the 16 centroids
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cs", Vectors.cosine(col("embedding"), col("cent_v")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cs").desc, col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_v"))
    val probeCells = cents.crossJoin(broadcast(q))
      .withColumn("cs", Vectors.cosine(col("cent_v"), col("q_v")))
      .orderBy(col("cs").desc, col("cent_id")).limit(4)
      .select(col("cent_id"))
    assigned.join(broadcast(probeCells), Seq("cent_id"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos", Vectors.cosine(col("embedding"), col("q_v")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"))
  }
  val annIvfTopKSql =
    """WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
      |scored AS (
      |  SELECT e.vec_id, e.embedding, c.cent_id,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(e.embedding, c.cent_v) DESC, c.cent_id) AS rn
      |  FROM embeddings e CROSS JOIN cents c),
      |assign AS (SELECT vec_id, embedding, cent_id FROM scored WHERE rn = 1),
      |q AS (SELECT embedding AS q_v FROM embeddings WHERE vec_id = 0),
      |probe AS (
      |  SELECT cent_id FROM cents, q
      |  ORDER BY list_cosine_similarity(cent_v, q_v) DESC, cent_id LIMIT 4)
      |SELECT a.vec_id
      |FROM assign a JOIN probe USING (cent_id), q
      |WHERE a.vec_id <> 0
      |ORDER BY list_cosine_similarity(a.embedding, q.q_v) DESC, a.vec_id
      |LIMIT 10""".stripMargin

  /** PRODUCT-QUANTIZATION ANN (Jégou et al., IEEE TPAMI 2011): the
    * 100-TB embedding-search path — each 64-dim float vector compresses
    * to 8 four-bit codes (8-dim subspaces, 16 centroids each, trained by
    * the same deterministic Lloyd's as embedKmeans on the SLICED
    * vectors): 64× smaller than raw floats, so the scan that brute-force
    * reads 100 TB reads ~1.6 TB of codes. Search is the production
    * two-stage shape: (1) ADC shortlist — score candidates from codes
    * alone via the reconstruction cosine Σₘdot(qₘ,cₘ)/√(Σₘ|cₘ|²)
    * (= exact cosine against the decoded vector; |q| drops out of the
    * ordering) and keep the top 100; (2) exact re-rank — fetch full
    * vectors for the shortlist only and order by true cosine. The
    * codebooks export so the DuckDB oracle re-derives encode + ADC +
    * re-rank identically; recall vs exact cosine top-k is asserted in
    * DataOpsSpec (9/10 on this corpus). */
  def pqAnn(s: SparkSession, dir: String): DataFrame = {
    val e = trackCache(t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val M = 8; val sub = 8; val k = 16
    // per-subspace codebooks, trained JOINTLY: per Lloyd's iteration ONE
    // map-side pass assigns every subspace's code and ONE shuffle computes
    // every (sub, cid, pos) mean — 1 + iters Spark jobs total, vs
    // M × (1 + iters) when each subspace trains through kmeansCents
    // separately (measured 6.3 → 3.5 s at sf0.1; M×k×sub doubles reach
    // the driver per round either way)
    val books = pqTrainBooks(e, M, sub, k, iters = 2)
    exportForOracle(
      s.createDataFrame(books.zipWithIndex.flatMap { case (cents, m) =>
        cents.flatMap { case (cid, v) =>
          v.zipWithIndex.map { case (x, p) => (m, cid, p, x) }
        }
      }).toDF("sub", "cid", "pos", "v"), "pq_cents")
    // encode: per subspace an argmax-cosine over k broadcast-literal
    // centroids — map-side, zero shuffle, the whole chain fuses into one
    // codegen stage producing (vec_id, code_0..code_7)
    val codes = pqAssignCodes(e, books, sub)
      .select(col("vec_id") +: books.indices.map(m => col(s"code_$m")): _*)
    // ADC: the codebooks are driver-known (M×k×sub = 1024 floats), so
    // each code's centroid attaches as a LITERAL array lookup —
    // element_at over a 16-entry array<array<float>> constant — instead
    // of a broadcast join per subspace: the eight joins' exchanges and
    // plan nodes collapse into the same single codegen stage as the
    // encode (measured 3.15 → ~1.9 s; at 100 TB this is the difference
    // between one map-only pass over the codes and eight). The query's
    // subvectors still ride a 1-row broadcast; the score is a FIXED
    // left-to-right sum so Spark and DuckDB run the same IEEE sequence.
    val centLits = books.map(cents =>
      typedLit(cents.sortBy(_._1).map(_._2.map(_.toFloat))))
    val q = e.filter(col("vec_id") === 0).select(
      (0 until M).map(m => slice(col("embedding"), m * sub + 1, sub).as(s"q_$m")): _*)
    val cq = codes.crossJoin(broadcast(q))
    val joined = cq.select(cq.columns.map(col).toSeq ++ (0 until M).map(m =>
      element_at(centLits(m), col(s"code_$m") + 1).as(s"cent_$m")): _*)
    // reconstruction cosine: Σₘ dot(qₘ,cₘ) = dot(q, recon) and
    // Σₘ |cₘ|² = |recon|² — the true cosine against the decoded vector
    // (|q| is a common factor and drops out of the ordering)
    val score =
      (0 until M).map(m => Vectors.dot(col(s"q_$m"), col(s"cent_$m"))).reduce(_ + _) /
        sqrt((0 until M).map(m =>
          Vectors.dot(col(s"cent_$m"), col(s"cent_$m"))).reduce(_ + _))
    val shortlist = joined.filter(col("vec_id") =!= 0)
      .withColumn("score", score)
      .orderBy(col("score").desc, col("vec_id"))
      .limit(100)
      .select(col("vec_id"))
    // the shortlist is k-bounded (100 ids): collect it once and re-rank
    // by predicate — leaving it lazy re-EXECUTES the whole encode+ADC
    // subtree inside the re-rank plan (no exchange below the top-k, so
    // Spark has nothing to reuse), doubling the pass over the codes
    val shortIds = shortlist.collect().map(_.getLong(0)).toSeq
    // exact re-rank touches ONLY the shortlist's full vectors
    val qFull = e.filter(col("vec_id") === 0).select(col("embedding").as("q_v"))
    nonEmpty(e.filter(col("vec_id").isin(shortIds: _*))
      .crossJoin(broadcast(qFull))
      .withColumn("cos", Vectors.cosine(col("embedding"), col("q_v")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id")))
  }
  val pqAnnSql = {
    val M = 8; val sub = 8
    // every list is element-cast to DOUBLE before any fold so DuckDB
    // accumulates in double exactly like Spark's VectorDot (inner products
    // over FLOAT[] would accumulate in FLOAT — ~1e-8 divergence that can
    // flip an argmax or a shortlist boundary); centroids round through
    // FLOAT first to match the float typedLit literals on the Spark side,
    // and cosine is spelled as ip/(sqrt·sqrt) — Vectors.cosine's exact
    // op sequence — instead of list_cosine_similarity
    def dbl(l: String) = s"list_transform($l, x -> CAST(x AS DOUBLE))"
    def cos(a: String, b: String) =
      s"(list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))))"
    val subs = (0 until M).map(m =>
      dbl(s"embedding[${m * sub + 1}:${(m + 1) * sub}]") + s" AS s$m").mkString(", ")
    val ip = (0 until M).map(m => s"list_inner_product(q_$m, c$m.cent_v)")
      .reduce((a, b) => s"($a\n      |  + $b)")
    val nrm = (0 until M).map(m => s"list_inner_product(c$m.cent_v, c$m.cent_v)")
      .reduce((a, b) => s"($a\n      |  + $b)")
    s"""WITH cents AS (
      |  SELECT sub, cid, list(CAST(CAST(v AS FLOAT) AS DOUBLE) ORDER BY pos) AS cent_v
      |  FROM read_parquet('$ExportDir/pq_cents/*.parquet') GROUP BY sub, cid),
      |e4 AS (SELECT vec_id, $subs FROM embeddings),
      |${(0 until M).map(m =>
        s"""a$m AS (
      |  SELECT vec_id, cid AS code_$m FROM (
      |    SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${cos(s"e.s$m", "c.cent_v")} DESC, c.cid) AS rn
      |    FROM e4 e JOIN cents c ON c.sub = $m) WHERE rn = 1)""").mkString(",\n")},
      |q AS (SELECT ${(0 until M).map(m => s"s$m AS q_$m").mkString(", ")}
      |      FROM e4 WHERE vec_id = 0),
      |shortlist AS (
      |  SELECT a0.vec_id
      |  FROM a0 ${(1 until M).map(m => s"JOIN a$m USING (vec_id)").mkString(" ")}
      |${(0 until M).map(m =>
        s"  JOIN cents c$m ON c$m.sub = $m AND c$m.cid = code_$m").mkString("\n")}, q
      |  WHERE a0.vec_id <> 0
      |  ORDER BY ($ip / sqrt($nrm)) DESC, a0.vec_id
      |  LIMIT 100)
      |SELECT e.vec_id
      |FROM shortlist s JOIN (
      |  SELECT vec_id, ${dbl("embedding")} AS emb FROM embeddings) e USING (vec_id), (
      |  SELECT ${dbl("embedding")} AS q_v FROM embeddings WHERE vec_id = 0) q
      |ORDER BY ${cos("e.emb", "q.q_v")} DESC, e.vec_id
      |LIMIT 10""".stripMargin
  }

  /** SEMANTIC CLUSTERING of the embedding space — the SemDeDup-style
    * stage that groups a corpus into k clusters before per-cluster
    * near-dup pruning: Lloyd's k-means with DETERMINISTIC init (the k
    * smallest vec_ids) and cosine assignment. Each iteration is one
    * map-side assignment (centroids broadcast as literals through the
    * same codegen cosine the ANN ops use) plus one partial-aggregated
    * per-dimension mean whose shuffle volume is tasks × k × dim — the
    * data never moves, only k×dim doubles reach the driver per round.
    * The final centroids are exported so the oracle re-derives the
    * assignment + histogram from them with the identical argmax-cosine
    * formulation. */
  /** Map-side argmax-cosine assignment over k literal centroids, ties to
    * the lower cid — a codegen'd expression chain, no join, no shuffle. */
  private def assignToCents(e: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    // same bit-identical norm hoist as pqAssignCodes: |v| computed once
    // per row (not once per centroid) and |c| a driver literal using
    // VectorDot's exact float-cast left-to-right fold, so each centroid
    // costs one VectorDot instead of three — values unchanged to the
    // last ulp, oracle hashes stable
    val scored = cents.map { case (cid, v) =>
      val cn = math.sqrt(v.foldLeft(0.0) { (a, x) =>
        val f = x.toFloat.toDouble; a + f * f })
      struct((Vectors.dot(col("embedding"), typedLit(v.map(_.toFloat))) /
        (col("__vn") * lit(cn))).as("cs"), lit(-cid).as("ncid"))
    }
    e.withColumn("__vn", sqrt(Vectors.dot(col("embedding"), col("embedding"))))
      .withColumn("cid", -greatest(scored: _*).getField("ncid"))
      .drop("__vn")
  }

  /** Lloyd's k-means with DETERMINISTIC init (the k smallest vec_ids) and
    * cosine assignment; per round only k×dim doubles reach the driver. */
  private def kmeansCents(e: DataFrame, k: Int,
      iters: Int): Seq[(Int, Seq[Double])] = {
    var cents: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < k)
      .orderBy(col("vec_id")).collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](1).map(_.toDouble)
      }.toSeq
    for (_ <- 1 to iters) {
      val means = assignToCents(e, cents)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      cents = means.groupBy(_._1).map { case (cid, xs) =>
        cid -> xs.sortBy(_._2).map(_._3).toSeq
      }.toSeq.sortBy(_._1)
    }
    cents
  }

  /** code_m columns = argmax-cosine over subspace m's broadcast-literal
    * centroids, for EVERY subspace in one map-side pass. */
  private[graft] def pqAssignCodes(e: DataFrame,
      books: Seq[Seq[(Int, Seq[Double])]], sub: Int): DataFrame =
    // cosine(s,c) per centroid with the two redundant norm dots hoisted:
    // |s| is computed ONCE per row per subspace (not once per centroid),
    // and |c| is a DRIVER-computed double literal over the same
    // float-cast left-to-right fold VectorDot runs — bit-identical to
    // the oracle's sqrt(list_inner_product(c,c)) — so each centroid
    // costs ONE VectorDot instead of three. Values are unchanged to the
    // last ulp (same dividend, same sqrt(ss)*sqrt(cc) product order), so
    // codes, books, and oracle hashes are identical; the generated code
    // for the train/encode argmax — this query's cost center — is ~3×
    // smaller.
    // three flat selects, not a withColumn-per-subspace fold: 24 nested
    // projections over expression trees this size make ANALYSIS the
    // bottleneck (each withColumn re-resolves the whole accumulated plan)
    {
      val base = e.columns.map(col).toSeq
      val withS = e.select(base ++ books.indices.map(m =>
        slice(col("embedding"), m * sub + 1, sub).as(s"__s_$m")): _*)
      val withSn = withS.select(withS.columns.map(col).toSeq ++
        books.indices.map(m =>
          sqrt(Vectors.dot(col(s"__s_$m"), col(s"__s_$m"))).as(s"__sn_$m")): _*)
      withSn.select(base ++ books.zipWithIndex.map { case (cents, m) =>
        val scored = cents.map { case (cid, v) =>
          val cn = math.sqrt(v.foldLeft(0.0) { (a, x) =>
            val f = x.toFloat.toDouble; a + f * f })
          struct((Vectors.dot(col(s"__s_$m"), typedLit(v.map(_.toFloat))) /
            (col(s"__sn_$m") * lit(cn))).as("cs"), lit(-cid).as("ncid"))
        }
        (-greatest(scored: _*).getField("ncid")).as(s"code_$m")
      }: _*)
    }

  /** Joint multi-subspace Lloyd's for PQ codebooks: deterministic init
    * (subvectors of the k smallest vec_ids, one collect), then per
    * iteration one assignment pass + ONE (sub, cid, pos) mean shuffle —
    * job count independent of M. */
  private[graft] def pqTrainBooks(e: DataFrame, M: Int, sub: Int, k: Int,
      iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    val initRows = e.filter(col("vec_id") < k).orderBy(col("vec_id")).collect()
    var books: Seq[Seq[(Int, Seq[Double])]] = (0 until M).map { m =>
      initRows.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](1).slice(m * sub, (m + 1) * sub)
          .map(_.toDouble).toSeq
      }.toSeq
    }
    for (_ <- 1 to iters) {
      val stacked = pqAssignCodes(e, books, sub)
        .select(explode(array((0 until M).map(m =>
          struct(lit(m).as("sub"), col(s"code_$m").as("cid"),
            slice(col("embedding"), m * sub + 1, sub).as("v"))): _*)).as("x"))
        .select(col("x.sub").as("sub"), col("x.cid").as("cid"),
          posexplode(col("x.v")).as(Seq("pos", "vv")))
      val means = stacked.groupBy(col("sub"), col("cid"), col("pos"))
        .agg(avg(col("vv")).as("m")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      books = (0 until M).map { m =>
        means.filter(_._1 == m).groupBy(_._2).map { case (cid, xs) =>
          cid -> xs.sortBy(_._3).map(_._4).toSeq
        }.toSeq.sortBy(_._1)
      }
    }
    books
  }

  private def exportCents(s: SparkSession, cents: Seq[(Int, Seq[Double])],
      name: String): Unit =
    exportForOracle(
      s.createDataFrame(cents.flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, p) => (cid, p, x) }
      }).toDF("cid", "pos", "v"),
      name)

  def embedKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = trackCache(t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cents = kmeansCents(e, 16, 3)
    exportCents(s, cents, "kmeans_cents")
    assignToCents(e, cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("rep_id"))
      .orderBy(col("cid"))
  }

  /** SEMDEDUP — semantic dedup end-to-end: k-means clusters the embedding
    * space (deterministic init, broadcast-literal assignment), then
    * near-dup pruning runs WITHIN each cluster only — a vector is dropped
    * when a smaller-id vector in ITS cluster has cosine >= the
    * threshold. The per-cluster self-join is one shuffle on the cluster
    * id with pair count Σc² — choose k ∝ n (as the IVF ops do) and the
    * candidate volume stays linear in the corpus while never comparing
    * across clusters; the quadratic all-pairs join never exists. The
    * final centroids export so the oracle re-derives assignment +
    * pruning with the identical argmax/threshold formulation. */
  def semDeDup(s: SparkSession, dir: String): DataFrame = {
    val e = trackCache(t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cents = kmeansCents(e, 16, 3)
    exportCents(s, cents, "semdedup_cents")
    val assigned = assignToCents(e, cents)
      .withColumn("nrm", Vectors.norm(col("embedding")))
    val a = assigned.select(col("cid"), col("vec_id").as("a_id"),
      col("embedding").as("a_v"), col("nrm").as("a_n"))
    val b = assigned.select(col("cid"), col("vec_id").as("b_id"),
      col("embedding").as("b_v"), col("nrm").as("b_n"))
    val dropped = a.join(b, Seq("cid")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", Vectors.dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .filter(col("cos") >= 0.4)
      .select(col("cid"), col("b_id").as("vec_id"))
      .distinct()
    nonEmpty(assigned.select(col("cid"), col("vec_id"))
      .join(dropped.withColumn("dropped", lit(1)), Seq("cid", "vec_id"), "left")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("dropped"), lit(0))).cast("long").as("n_dropped"))
      .orderBy(col("cid")))
  }
  val semDeDupSql =
    s"""WITH cents AS (
      |  SELECT cid, list(CAST(v AS FLOAT) ORDER BY pos) AS cent_v
      |  FROM read_parquet('$ExportDir/semdedup_cents/*.parquet') GROUP BY cid),
      |scored AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.embedding, c.cent_v) DESC, c.cid) AS rn
      |  FROM embeddings e CROSS JOIN cents c),
      |assign AS (SELECT vec_id, embedding, cid FROM scored WHERE rn = 1),
      |dropped AS (
      |  SELECT DISTINCT b.cid, b.vec_id
      |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4)
      |SELECT a.cid, count(*) AS n_vecs, CAST(count(d.vec_id) AS BIGINT) AS n_dropped
      |FROM assign a LEFT JOIN dropped d ON a.cid = d.cid AND a.vec_id = d.vec_id
      |GROUP BY a.cid ORDER BY a.cid""".stripMargin
  val embedKmeansSql =
    s"""WITH cents AS (
      |  SELECT cid, list(CAST(v AS FLOAT) ORDER BY pos) AS cent_v
      |  FROM read_parquet('$ExportDir/kmeans_cents/*.parquet') GROUP BY cid),
      |scored AS (
      |  SELECT e.vec_id, c.cid,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.embedding, c.cent_v) DESC, c.cid) AS rn
      |  FROM embeddings e CROSS JOIN cents c)
      |SELECT cid, count(*) AS n_vecs, min(vec_id) AS rep_id
      |FROM scored WHERE rn = 1
      |GROUP BY cid ORDER BY cid""".stripMargin

  // ------------------------------------------------------------- text ops

  def textTokens(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("doc_id"),
        wsTokenCount.as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"))
      .orderBy(col("doc_id"))
  }
  val textTokensSql =
    """SELECT doc_id,
      |  len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length/word/punctuation ratios + a keep/drop flag
    * (all integer-derived doubles — bit-identical across engines). */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nWords = wsTokenCount.cast("double")
    val nPunct = length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("double")
    t(s, dir, "documents")
      .select(col("doc_id"),
        nChars.cast("long").as("n_chars"),
        nWords.cast("long").as("n_words"),
        (length(regexp_replace(col("text"), "\\s", "")).cast("double") / nWords).as("avg_word_len"),
        (nPunct / nChars).as("punct_ratio"),
        (nWords >= 20 && nWords <= 1000 && (nPunct / nChars) < 0.1).as("keep"))
      .orderBy(col("doc_id"))
  }
  val textQualitySql =
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS n_words,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
      |    len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS avg_word_len,
      |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
      |  (len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) BETWEEN 20 AND 1000)
      |    AND (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) < 0.1) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with"),
    "es" -> Seq("el", "la", "que", "los", "una", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une", "du"))

  /** Language-ID by stopword-hit counts + CJK script detection — the same
    * closed-form heuristic on both engines. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val toks = wordSet(col("text"))
    val hits = langStopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }.toMap
    val pred = when(col("text").rlike("[一-鿿]"), lit("zh"))
      .when(hits("en") >= hits("es") && hits("en") >= hits("de") && hits("en") >= hits("fr"), lit("en"))
      .when(hits("es") >= hits("de") && hits("es") >= hits("fr"), lit("es"))
      .when(hits("de") >= hits("fr"), lit("de"))
      .otherwise(lit("fr"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), pred.as("lang_pred"))
      .orderBy(col("doc_id"))
  }
  val textLangIdSql = {
    def h(words: Seq[String]) =
      s"len(list_intersect(list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> w <> '')), [${words.map(w => s"'$w'").mkString(",")}]))"
    val en = h(langStopwords(0)._2); val es = h(langStopwords(1)._2)
    val de = h(langStopwords(2)._2); val fr = h(langStopwords(3)._2)
    s"""SELECT doc_id, lang,
       |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |       WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
       |       WHEN $es >= $de AND $es >= $fr THEN 'es'
       |       WHEN $de >= $fr THEN 'de'
       |       ELSE 'fr' END AS lang_pred
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: rolling 8-char window hashes (xxhash64),
    * fingerprint = 4 smallest window hashes (winnowing-style), emitted as
    * a '-'-joined STRING so every comparison layer can hash it. xxhash64
    * itself is not SQL-portable, so the window hashes are exported and the
    * oracle re-derives the winnowing minima from them in DuckDB. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    // one-pass byte-walk gram hashing (same values as the former
    // transform(sequence, i => xxhash64(substr(text, i, 8))) form on the
    // ASCII corpus, without its per-position UTF8String allocation)
    val windows = graft.functions.SlidingMinFunctions.gram_hashes(col("text"), 8)
    val docs = t(s, dir, "documents")
    exportForOracle(docs.select(col("doc_id"), explode(windows).as("h")),
      "fingerprint_windows")
    docs
      .select(col("doc_id"),
        concat_ws("-", transform(slice(array_sort(windows), 1, 4),
          h => h.cast("string"))).as("fingerprint"))
      .orderBy(col("doc_id"))
  }
  val textFingerprintSql =
    s"""WITH w AS (
      |  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      |  FROM read_parquet('$ExportDir/fingerprint_windows/*.parquet'))
      |SELECT doc_id, string_agg(CAST(h AS VARCHAR), '-' ORDER BY h) AS fingerprint
      |FROM w WHERE rn <= 4 GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ multimodal

  /** Binary media columns + batched stub decode (see graft.ops.Multimodal).
    * Only environment-independent plumbing metrics face the oracle. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("n_bytes"), col("n_frames"))
      .orderBy(col("media_id"))
  }
  val multimodalFeaturesSql =
    """SELECT doc_id AS media_id, strlen(text) AS n_bytes,
      |  CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  /** MULTIMODAL NEAR-DUP — perceptual-hash image dedup, closing the
    * multimodal family's loop: 64-bit dHash over each binary media
    * payload (stub decode, real hash shape — ops/Multimodal.scala), a
    * 4×16-bit band index (pigeonhole: hamming ≤ 3 ⟹ some band equal)
    * generates candidates as an EQUI-join, exact hamming verifies. Same
    * contract as `ds_dedup_simhash` but over the MEDIA column: the hash
    * stage is exported so the DuckDB oracle re-derives the band+verify
    * logic pairwise. At 100 TB: hashing is one embarrassingly-parallel
    * pass over the binary column; candidates shuffle on (band, key) —
    * never an all-pairs join. */
  def multimodalNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      .as[Multimodal.MediaRow]
    val hashes = Multimodal.perceptualHashes(media).toDF()
    exportForOracle(hashes, "media_dhash")
    val banded = hashes.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"), shiftright(col("dhash"), i * 16)
          .bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.bk.band") === col("y.bk.band") && col("x.bk.key") === col("y.bk.key") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a_id"), col("y.media_id").as("b_id"),
        col("x.dhash").as("a_h"), col("y.dhash").as("b_h"))
      .distinct()
    nonEmpty(pairs
      .withColumn("hamming", bit_count(col("a_h").bitwiseXOR(col("b_h"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id")))
  }
  /** Oracle = naive pairwise hamming over the exported hashes; the band
    * join is exact for hamming ≤ 3 by pigeonhole (4 bands). */
  val multimodalNearDupSql =
    s"""WITH h AS (SELECT media_id, dhash
      |  FROM read_parquet('$ExportDir/media_dhash/*.parquet'))
      |SELECT a.media_id AS a_id, b.media_id AS b_id,
      |       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
      |FROM h a JOIN h b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
      |ORDER BY a_id, b_id""".stripMargin

  // ------------------------------------------------------------- streaming

  /** Structured Streaming: tumbling-window counts over the events table
    * with a watermark, executed with Trigger.AvailableNow against the
    * parquet as a file-stream source (SURVEY.md §2.J — beyond the
    * reference's incremental scan). */
  /** File-stream sources need a DIRECTORY (basePath is pinned to the
    * source path for stable partition inference): when the testdata table
    * is a single parquet FILE, stage a copy into a fingerprint-keyed temp
    * dir once — re-runs over the same file reuse it, and a regenerated
    * file (new size/mtime) gets a fresh dir. */
  private def stagedStreamSrc(dir: String, table: String): String = {
    val srcFile = new java.io.File(s"$dir/$table.parquet")
    if (srcFile.isDirectory) srcFile.getPath
    else {
      val fp = Integer.toHexString(srcFile.getCanonicalPath.hashCode) +
        s"_${srcFile.length()}_${srcFile.lastModified()}"
      val staged = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_stream_${fp}")
      if (!staged.exists()) {
        val tmp = new java.io.File(staged.getPath + s".tmp${ProcessHandle.current().pid()}")
        tmp.mkdirs()
        java.nio.file.Files.copy(srcFile.toPath,
          new java.io.File(tmp, "part-00000.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // atomic publish so a concurrent runner never lists a half dir
        if (!tmp.renameTo(staged)) {
          org.apache.commons.io.FileUtils.deleteDirectory(tmp)
          require(staged.exists(), s"stream staging failed for $srcFile")
        }
      }
      staged.getPath
    }
  }

  /** STREAMING DEDUP — `dropDuplicatesWithinWatermark` over the event
    * stream on a coarse key (user, type, hour), then a per-type distinct
    * count off the sink: the standard streaming-ingest dedup stage for a
    * training-data pipeline (duplicate events from at-least-once
    * transports collapse before they reach the corpus). The watermark TTL
    * here exceeds the dataset span, so state holds exactly the distinct
    * keys and the semantics equal batch DISTINCT — which is what the
    * DuckDB oracle checks. At scale the TTL is the real knob: state is
    * bounded by keys-per-TTL-window, not by stream length. */
  def streamDedup(s: SparkSession, dir: String): DataFrame =
    streamDedupFrom(s, stagedStreamSrc(dir, "events"), maxFilesPerTrigger = None)

  /** STREAM-STREAM INTERVAL JOIN — attribute each click to the views it
    * followed within 30 minutes (the sessioned-attribution join every
    * event pipeline runs). Both sides are watermarked streams; the
    * time-bound join condition lets Structured Streaming expire buffered
    * state past `watermark + interval` — state is bounded by the
    * interval's event volume, not stream length (the TTL here exceeds
    * the corpus span so the semantics equal the batch interval join the
    * DuckDB oracle runs). */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame =
    streamIntervalJoinFrom(s, stagedStreamSrc(dir, "events"),
      maxFilesPerTrigger = None)

  private[graft] def streamIntervalJoinFrom(s: SparkSession, src: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    val sch = s.read.parquet(src).schema
    def stream = {
      val r = s.readStream.schema(sch)
      maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.parquet(src).withColumn("ts", col("ts").cast("timestamp"))
    }
    val views = stream.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "3650 days")
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "3650 days")
    val joined = views.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("interval 30 minutes"))
      .select(col("v_id"), col("c_id"), col("user_id"))
    val qname = "ij_" + java.util.UUID.randomUUID().toString.replace("-", "")
    trackTempView(s, qname)
    graft.table.WriteFiles.withScopedConfs(s, "spark.sql.shuffle.partitions" -> "8") {
      val q = joined.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    nonEmpty(s.table(qname).orderBy(col("v_id"), col("c_id")))
  }
  val streamIntervalJoinSql =
    """SELECT v.event_id AS v_id, c.event_id AS c_id, v.user_id
      |FROM events v JOIN events c ON v.user_id = c.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
      |ORDER BY v_id, c_id""".stripMargin

  private[graft] def streamDedupFrom(s: SparkSession, src: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    val sch = s.read.parquet(src).schema
    val reader = s.readStream.schema(sch)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withWatermark("ts", "3650 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hr")
      .select("user_id", "event_type", "hr")
    val qname = "dd_" + java.util.UUID.randomUUID().toString.replace("-", "")
    trackTempView(s, qname)
    graft.table.WriteFiles.withScopedConfs(s, "spark.sql.shuffle.partitions" -> "8") {
      val q = stream.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    nonEmpty(s.table(qname)
      .groupBy("event_type")
      .agg(count(lit(1)).as("distinct_keys"))
      .orderBy("event_type"))
  }
  val streamDedupSql =
    """SELECT event_type, count(*) AS distinct_keys
      |FROM (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  def streamWindowAgg(s: SparkSession, dir: String): DataFrame = {
    // events.ts is parquet timestamp[us] (TIMESTAMP_NTZ to Spark), which
    // watermarks and tumbling windows accept natively — stream straight
    // off the source parquet (file-stream sources need an explicit schema).
    val src = stagedStreamSrc(dir, "events")
    val sch = s.read.parquet(src).schema
    // watermarks require a true TIMESTAMP (instant) event-time column;
    // with the session tz pinned to UTC the NTZ→instant cast is identity
    val stream = s.readStream.schema(sch).parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    val qname = "ev_" + java.util.UUID.randomUUID().toString.replace("-", "")
    trackTempView(s, qname)
    // the stateful shuffle width is captured at query START: scope it to a
    // handful of state-store partitions — a 32-way state store spends more
    // time on per-partition store setup/commit than on this aggregation
    graft.table.WriteFiles.withScopedConfs(s, "spark.sql.shuffle.partitions" -> "8") {
      val q = agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // wstart as epoch SECONDS (bigint): NTZ (Spark) vs TIMESTAMP (DuckDB)
    // types can't schema-match in the gate; integers do. Session tz is
    // UTC, so the NTZ→timestamp cast preserves the naive instant.
    s.table(qname)
      .select(unix_seconds(col("window.start").cast("timestamp")).as("wstart"),
        col("event_type"), col("count").as("n"))
      .orderBy(col("wstart"), col("event_type"))
  }
  val streamWindowAggSql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS wstart,
      |  event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** STREAMING SESSIONIZATION with custom state — the
    * `flatMapGroupsWithState` surface: per-user session state (last event
    * time, open-session start/count) carried ACROSS micro-batches in the
    * state store. A silence of MORE than 30 minutes (strict >) closes
    * the open session and emits it; the final still-open session per user stays in state (exactly
    * the streaming semantics — it could still grow), so the gate compares
    * CLOSED sessions only. Within a batch the group's events are sorted
    * by (ts, event_id) before folding — the per-user event volume bounds
    * the buffer, the state store bounds everything else; at 100 TB the
    * state shuffle partitions by user_id like any keyed stream.
    * ACROSS batches the fold assumes time-ordered arrival (append-only
    * log ingestion); an event older than the state's last timestamp
    * joins the open session rather than rewriting history — the standard
    * trade-off of unbuffered streaming sessionization. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame =
    streamSessionizeFrom(s, stagedStreamSrc(dir, "events"), maxFilesPerTrigger = None)

  /** Seam for the cross-batch state test: `maxFilesPerTrigger = Some(1)`
    * over a multi-file dir forces one micro-batch per file, so sessions
    * spanning files exercise state-store carry-over. */
  private[graft] def streamSessionizeFrom(s: SparkSession, src: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val sch = s.read.parquet(src).schema
    import s.implicits._
    val reader = s.readStream.schema(sch)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(src)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("event_id"))
      .as[(Long, Long, Long)]
    val gapUs = 1800000000L
    val closedSessions = stream.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessClosed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, it, state) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var st = state.getOption.getOrElse(SessState(0L, 0L, 0L))
        val closed = scala.collection.mutable.ArrayBuffer[SessClosed]()
        evs.foreach { e =>
          if (st.openCount == 0L) st = SessState(e._2, e._2, 1L)
          else if (e._2 - st.lastTs > gapUs) {
            closed += SessClosed(user, st.openStart, st.openCount)
            st = SessState(e._2, e._2, 1L)
          } else st = SessState(e._2, st.openStart, st.openCount + 1L)
        }
        state.update(st)
        closed.iterator
      }
    val qname = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    trackTempView(s, qname)
    graft.table.WriteFiles.withScopedConfs(s, "spark.sql.shuffle.partitions" -> "8") {
      val q = closedSessions.toDF.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    nonEmpty(s.table(qname)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_closed_sessions"),
        sum(col("nEvents")).as("closed_events"))
      .orderBy(col("user_id")))
  }
  val streamSessionizeSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, event_id,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |numbered AS (
      |  SELECT user_id, ts_us,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM numbered GROUP BY user_id, session_id),
      |last AS (SELECT user_id, max(session_id) AS last_id FROM sess GROUP BY user_id)
      |SELECT s.user_id, count(*) AS n_closed_sessions,
      |       CAST(sum(s.n_events) AS BIGINT) AS closed_events
      |FROM sess s JOIN last l ON s.user_id = l.user_id AND s.session_id < l.last_id
      |GROUP BY s.user_id ORDER BY s.user_id""".stripMargin

  // ---------------------------------------------- training-mix operators

  /** INCREMENTAL corpus dedup — the production shape of exact dedup
    * (daily-crawl ingestion): the corpus lives in an engine table, each
    * ingest batch appends a snapshot, and only the NEW rows — read via
    * the incremental append scan between the two snapshot ids, so only
    * the files the new snapshot added are opened — are hashed and
    * checked, first within the batch, then against the corpus pinned at
    * the pre-ingest snapshot. At 100 TB both join sides are narrow
    * (hash, doc_id) projections: the shuffle moves 16-byte keys, never
    * text, and the corpus side amortizes to a maintained fingerprint
    * table instead of a rescan (ref incremental scan:
    * table/__init__.py:1272; upsert's dup detection: upsert_util.py). */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val wh = new graft.catalog.HadoopCatalog(trackTempDir(
      java.nio.file.Files.createTempDirectory("graft_incdedup").toString), s)
    val tab = wh.createTable("corpus", graft.core.Schema.fromSpark(docs.schema))
    tab.append(docs.filter(col("doc_id") % 3 =!= 0))
    val snap1 = tab.metadata.currentSnapshotId.get
    // the new batch: genuinely-new docs plus re-crawled copies of corpus
    // docs under fresh ids — exactly what a crawler ingest looks like
    val batch = docs.filter(col("doc_id") % 3 === 0).unionByName(
      docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 3 =!= 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
    tab.append(batch)
    val snap2 = tab.metadata.currentSnapshotId.get
    val newHashed = tab.incrementalAppendScan(snap1, snap2)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val corpusHashes = tab.scan.useSnapshot(snap1).toDF
      .select(md5(col("text").cast("binary")).as("h")).distinct()
    newHashed.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .join(corpusHashes, Seq("h"), "left_anti")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }
  val dedupIncrementalSql =
    """WITH corpus AS (
      |  SELECT md5(text) AS h FROM documents WHERE doc_id % 3 <> 0),
      |batch AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, md5(text) FROM documents
      |  WHERE doc_id % 10 = 0 AND doc_id % 3 <> 0),
      |survivors AS (SELECT h, min(doc_id) AS doc_id FROM batch GROUP BY h)
      |SELECT s.doc_id FROM survivors s
      |WHERE s.h NOT IN (SELECT h FROM corpus)
      |ORDER BY s.doc_id""".stripMargin

  /** REPETITION quality filter — the Gopher-rules repetition signals:
    * fraction of the document taken by its single most frequent word,
    * and the duplicate fraction among word 2-grams. The 2-gram signal
    * is computed entirely map-side (array transform + distinct count on
    * the row, no explode); the top-word mode needs a (doc_id, word)
    * count, which partial-aggregates map-side before its one shuffle.
    * Documents failing either threshold are flagged for drop — at
    * 100 TB this runs as a pure scan → filter pipeline ahead of the
    * dedup stages. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 2)
    val grams = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", col("w")(i - 1), col("w")(i)))
    val mapSide = tok.select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
      (lit(1.0) - size(array_distinct(grams)).cast("double") /
        size(grams).cast("double")).as("dup_2gram_frac"))
    val topWord = tok.select(col("doc_id"), size(col("w")).as("n"),
        explode(col("w")).as("word"))
      .groupBy(col("doc_id"), col("n"), col("word")).count()
      .groupBy(col("doc_id"), col("n")).agg(max(col("count")).as("top_cnt"))
      .select(col("doc_id"),
        (col("top_cnt").cast("double") / col("n").cast("double")).as("top_word_frac"))
    mapSide.join(topWord, "doc_id")
      .select(col("doc_id"), col("n_words"), col("top_word_frac"),
        col("dup_2gram_frac"),
        (col("top_word_frac") <= 0.1 && col("dup_2gram_frac") <= 0.2).as("keep"))
      .orderBy(col("doc_id"))
  }
  val textRepetitionSql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sized AS (SELECT doc_id, w, len(w) AS n FROM tok WHERE len(w) >= 2),
      |gr AS (
      |  SELECT doc_id, n,
      |    list_transform(generate_series(1, n - 1), i -> w[i] || ' ' || w[i+1]) AS g
      |  FROM sized),
      |map_side AS (
      |  SELECT doc_id, n AS n_words,
      |    1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE)
      |      AS dup_2gram_frac
      |  FROM gr),
      |wc AS (
      |  SELECT doc_id, n, word, count(*) AS c
      |  FROM (SELECT doc_id, n, unnest(w) AS word FROM sized)
      |  GROUP BY doc_id, n, word),
      |top AS (
      |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(any_value(n) AS DOUBLE)
      |    AS top_word_frac
      |  FROM wc GROUP BY doc_id)
      |SELECT m.doc_id, m.n_words, t.top_word_frac, m.dup_2gram_frac,
      |  (t.top_word_frac <= 0.1 AND m.dup_2gram_frac <= 0.2) AS keep
      |FROM map_side m JOIN top t USING (doc_id)
      |ORDER BY m.doc_id""".stripMargin

  /** Benchmark DECONTAMINATION: flag training documents that share any
    * 4-word shingle with the held-out eval set (doc_id % 7 == 0 plays
    * the benchmark corpus) — the standard n-gram-overlap hygiene pass
    * run before pretraining. One gram-keyed equi-join (single shuffle);
    * at 100 TB the grams become int64 xxhash64 keys and the eval side —
    * benchmarks are ~10⁵ docs, not 10¹⁰ — broadcasts, making this a
    * shuffle-free map-side probe over the training corpus. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 4)
    val grams = tok.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(1), size(col("w")) - 3),
        i => concat_ws(" ", slice(col("w"), i, lit(4)))))).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 7 === 0).select("g").distinct()
    grams.filter(col("doc_id") % 7 =!= 0)
      .join(evalGrams, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared"))
      .orderBy(col("doc_id"))
  }
  val decontaminateSql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 3),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS g
      |  FROM tok WHERE len(w) >= 4),
      |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0)
      |SELECT t.doc_id, count(DISTINCT t.g) AS n_shared
      |FROM grams t JOIN ev ON t.g = ev.g
      |WHERE t.doc_id % 7 <> 0
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** BLOOM-PREFILTERED DECONTAMINATION — the runtime-filter variant of
    * `decontaminate`: build a Bloom filter over the eval set's 4-grams
    * (distributed treeAggregate of mergeable bitsets), ship it inside a
    * codegen'd expression (functions/BloomFilters.scala), and drop
    * corpus grams MAP-SIDE before the exact equi-join. Bloom filters
    * have no false negatives, so `prefilter → exact join` returns
    * byte-identical results to the plain join (the oracle gate proves
    * it) while the shuffle carries only the surviving fraction — at a
    * 100 TB corpus vs a fixed eval set this turns a corpus-sized gram
    * shuffle into a kilobytes broadcast plus a shuffle of near-matches
    * only, the same semi-join reduction Spark's runtime row-level
    * filtering applies to joins it can prove. DataOpsSpec separately
    * asserts the prefilter both fires (drops most grams) and stays
    * lossless. */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFunctions
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 4)
    val grams = trackCache(tok.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(1), size(col("w")) - 3),
        i => concat_ws(" ", slice(col("w"), i, lit(4)))))).as("g")).persist())
    val evalGrams = grams.filter(col("doc_id") % 7 === 0).select("g").distinct()
    import s.implicits._
    val nEval = evalGrams.count()
    val bloom = BloomFunctions.buildBloom(evalGrams.as[String], nEval, 0.01)
    nonEmpty(grams.filter(col("doc_id") % 7 =!= 0)
      .filter(BloomFunctions.bloom_might_contain(col("g"), bloom))
      .join(evalGrams, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared"))
      .orderBy(col("doc_id")))
  }
  // byte-identical to the un-prefiltered join: the oracle is the exact
  // semantics, which is precisely the losslessness claim
  val bloomDecontaminateSql = decontaminateSql

  /** DETERMINISTIC stratified sampling — the training-mix step that takes
    * each language at its own rate. The keep decision is a pure function
    * of (doc_id, lang) (modulus, not rand()), so the sample is
    * reproducible across engines, retries and scales — a property random
    * sampling loses the moment a task retries. Map-side only: zero
    * shuffle, composes with any downstream op. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // per-stratum keep-rates in tenths: downsample dominant en, keep the
    // tail languages whole
    val rate = typedLit(Map("en" -> 3, "de" -> 10, "es" -> 10, "fr" -> 10, "zh" -> 10))
    docs.filter(pmod(col("doc_id"), lit(10)) < coalesce(rate(col("lang")), lit(10)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang"))
  }
  val sampleStratifiedSql =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents
      |WHERE doc_id % 10 < (CASE lang WHEN 'en' THEN 3 ELSE 10 END)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** DETERMINISTIC CORPUS SHUFFLE + SHARDING — the last step before a
    * training run: give every document a pseudorandom but REPRODUCIBLE
    * (engine/retry/scale-invariant) shard and position, so the training
    * loader streams shard files in order and sees a well-mixed corpus.
    * Both keys derive from md5(doc_id) — no rand(), no global sort: the
    * shard is one hash shuffle, the position a per-shard window. The
    * order-sensitive checksum Σ pos·doc_id proves both engines computed
    * the IDENTICAL permutation, not just the same membership. */
  def shardShuffle(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val h = md5(col("doc_id").cast("string"))
    val keyed = docs.select(col("doc_id"),
      (conv(substring(h, 1, 7), 16, 10).cast("long") % 8).as("shard_id"),
      conv(substring(h, 8, 8), 16, 10).cast("long").as("ord_key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard_id")).orderBy(col("ord_key"), col("doc_id"))
    nonEmpty(keyed.withColumn("pos", row_number().over(win))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pos") * col("doc_id")).as("ord_checksum"))
      .orderBy(col("shard_id")))
  }
  val shardShuffleSql =
    """WITH k AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 8 AS shard_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 8, 8))::BIGINT AS ord_key
      |  FROM documents),
      |p AS (
      |  SELECT shard_id, doc_id,
      |    row_number() OVER (PARTITION BY shard_id ORDER BY ord_key, doc_id) AS pos
      |  FROM k)
      |SELECT shard_id, count(*) AS n_docs,
      |  CAST(sum(pos * doc_id) AS BIGINT) AS ord_checksum
      |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /** SEQUENCE PACKING: assign documents to fixed-token-budget training
    * sequences by cumulative token count in deterministic (lang, doc_id)
    * order — the greedy packing pretraining loaders run. The running sum
    * is a window per LANGUAGE partition (never a global single-partition
    * window): strata pack independently and in parallel; at 100 TB the
    * partition key becomes (lang, shard) with per-shard budgets. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tokens = wsTokenCount
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col("lang"), col("doc_id"), tokens.as("tok"))
      .withColumn("seq_id", floor((sum(col("tok")).over(win) - col("tok")) / 512))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("seq_tokens"))
      .orderBy(col("lang"), col("seq_id"))
  }
  val packSequencesSql =
    """WITH tok AS (
      |  SELECT lang, doc_id,
      |    len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS tok
      |  FROM documents),
      |packed AS (
      |  SELECT lang, doc_id, tok,
      |    CAST(floor((sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok) / 512) AS BIGINT) AS seq_id
      |  FROM tok)
      |SELECT lang, seq_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS seq_tokens
      |FROM packed GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin

  /** TOKEN-BUDGET SOURCE MIXING — the data-mixing step that caps each
    * source's contribution to the training mix at a token budget (the
    * published-recipe shape: per-domain token counts, not row counts).
    * Docs are taken in deterministic doc_id order per source until the
    * budget fills; the running sum is a window per SOURCE partition so
    * the 20 (at 100 TB: thousands of) sources select their prefixes
    * independently and in parallel — no global sort, no driver loop.
    * A doc is kept while the budget is not yet EXCEEDED before it, so
    * each source overshoots by at most one document. */
  def mixBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tokens = wsTokenCount
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col("source"), col("doc_id"), tokens.as("tok"))
      .withColumn("cum_before", sum(col("tok")).over(win) - col("tok"))
      .filter(col("cum_before") < 150)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"), sum(col("tok")).as("tokens_kept"))
      .orderBy(col("source"))
  }
  val mixBudgetSql =
    """WITH tok AS (
      |  SELECT source, doc_id,
      |    len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS tok
      |  FROM documents),
      |cum AS (
      |  SELECT source, doc_id, tok,
      |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS cum_before
      |  FROM tok)
      |SELECT source, count(*) AS docs_kept, CAST(sum(tok) AS BIGINT) AS tokens_kept
      |FROM cum WHERE cum_before < 150
      |GROUP BY source ORDER BY source""".stripMargin

  /** URL-NORMALIZED DEDUP — the first stage of a web-corpus curation
    * pipeline: canonicalize each document's URL (case-fold, strip
    * scheme + www, drop query/fragment, trim trailing slashes) and keep
    * ONE document per canonical URL — the longest, ties broken to the
    * lowest doc_id. The synthetic corpus has no URL column, so a
    * deterministic messy URL is derived per document; the gate's subject
    * is the normalizer and the keep policy, both exact across engines.
    * Scale: normalization is map-side codegen; the keep decision is a
    * single groupBy on the canonical key with an order-preserving
    * integer max — no join, no global window. */
  def urlDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // deterministic MESSY url per doc (corpus has no url column): scheme
    // case, www prefix, trailing slash and tracking params all vary by
    // doc_id so the normalizer has real work on every branch
    val raw = concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS://WWW.")).otherwise(lit("http://")),
      col("source"), lit(".example.com/page/"),
      (col("doc_id") % 200).cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("?utm_source=feed&ref=abc")).otherwise(lit("")))
    // canonicalize: case-fold, strip scheme + www, drop query/fragment,
    // trim the trailing slash — all anchored regexes (identical
    // replace-first vs replace-all semantics across engines)
    val canon = regexp_replace(regexp_replace(regexp_replace(
      lower(raw), "^https?://(www\\.)?", ""), "[?#].*$", ""), "/+$", "")
    // keep policy in ONE aggregate: longest doc wins, ties to lowest
    // doc_id, via an order-preserving integer key (doc_id < 10^7 here;
    // exact integer arithmetic so both engines agree bit-for-bit)
    val keepKey = col("n_chars") * 10000000L + (lit(9999999L) - col("doc_id"))
    nonEmpty(docs
      .select(canon.as("url"), col("doc_id"), col("n_chars"), keepKey.as("k"))
      .groupBy("url")
      .agg(count(lit(1)).as("dups"), max(col("k")).as("mk"))
      .select(col("url"), col("dups"),
        (col("mk") / 10000000L).cast("long").as("best_len"),
        (lit(9999999L) - pmod(col("mk"), lit(10000000L))).as("keep_id"))
      .orderBy(col("url")))
  }
  val urlDedupSql =
    """WITH u AS (
      |  SELECT
      |    regexp_replace(regexp_replace(regexp_replace(lower(
      |      (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END) ||
      |      source || '.example.com/page/' || CAST(doc_id % 200 AS VARCHAR) ||
      |      (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
      |      (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END)),
      |      '^https?://(www\.)?', ''), '[?#].*$', ''), '/+$', '') AS url,
      |    doc_id, n_chars,
      |    n_chars * 10000000 + (9999999 - doc_id) AS k
      |  FROM documents)
      |SELECT url, count(*) AS dups,
      |  CAST(max(k) // 10000000 AS BIGINT) AS best_len,
      |  9999999 - (max(k) % 10000000) AS keep_id
      |FROM u GROUP BY url ORDER BY url""".stripMargin

  /** DOCUMENT CHUNKING — split each document into overlapping word
    * windows (window 40, stride 30 → 25% overlap), the preprocessing an
    * embedding/RAG pipeline runs before vectorizing. Pure map-side
    * codegen: the window starts are a `sequence()` column and each chunk
    * is an `array_join(slice(words, …))` under one `posexplode` — no
    * shuffle at all until the output sort, and chunk count per document
    * adapts to its length (never a driver loop, never a UDF). At 100 TB
    * the op is embarrassingly parallel and output-proportional. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val words = split(col("text"), "\\s+")
    val starts = sequence(lit(0), greatest(size(words) - 1, lit(0)), lit(30))
    val chunks = transform(starts, st => array_join(slice(words, st + 1, lit(40)), " "))
    nonEmpty(docs
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        size(split(col("chunk"), "\\s+")).as("chunk_words"),
        md5(col("chunk").cast("binary")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx")))
  }
  val chunkDocsSql =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, words, unnest(range(0, greatest(len(words), 1), 30)) AS s
      |  FROM w),
      |c AS (
      |  SELECT doc_id, s // 30 AS chunk_idx,
      |    array_to_string(words[s + 1 : s + 40], ' ') AS chunk
      |  FROM st)
      |SELECT doc_id, chunk_idx,
      |  len(regexp_split_to_array(chunk, '\s+')) AS chunk_words,
      |  md5(chunk) AS chunk_hash
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** END-TO-END CURATION PIPELINE — the composition flagship: language
    * gate → length/word quality gate → URL-normalized dedup → per-source
    * token budget, all in ONE declarative plan. This is the shape of a
    * production pretraining-curation run; the point of the gate is that
    * stage boundaries stay INSIDE Catalyst — no driver materialization
    * between stages, so the optimizer fuses the map-side gates into the
    * scan and the whole pipeline costs one groupBy (dedup winners), one
    * id equi-join (apply the winners) and one per-source window (budget
    * cumsum) regardless of how many gates precede them. At 100 TB every
    * stage scales independently: gates are embarrassingly parallel, the
    * dedup shuffle is keyed by canonical url, the budget window is
    * per-source (never a global sort). */
  def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    // stage 1+2: language + quality gates (map-side, fused into the scan)
    val gated = docs
      .filter(col("lang").isin("en", "de", "fr"))
      .withColumn("words", size(split(col("text"), "\\s+")))
      .filter(col("words") >= 10 && col("n_chars") >= 100)
    // stage 3: url-normalized dedup (same canonicalizer + keep policy as
    // ds_url_dedup: longest doc wins, ties to lowest doc_id)
    val raw = concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS://WWW.")).otherwise(lit("http://")),
      col("source"), lit(".example.com/page/"),
      (col("doc_id") % 200).cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("?utm_source=feed&ref=abc")).otherwise(lit("")))
    val canon = regexp_replace(regexp_replace(regexp_replace(
      lower(raw), "^https?://(www\\.)?", ""), "[?#].*$", ""), "/+$", "")
    val withUrl = gated.withColumn("url", canon)
      .withColumn("k", col("n_chars") * 10000000L + (lit(9999999L) - col("doc_id")))
    val winners = withUrl.groupBy("url").agg(max(col("k")).as("mk"))
      .select((lit(9999999L) - pmod(col("mk"), lit(10000000L))).as("doc_id"))
    val deduped = withUrl.join(winners, Seq("doc_id"))
    // stage 4: per-source token budget — deterministic prefix by doc_id,
    // window cumsum scoped to the source key (no global sort)
    val cumBefore = sum(col("words")).over(
      Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("words")
    val kept = deduped.withColumn("cum_before", cumBefore)
      .filter(col("cum_before") < 300)
    nonEmpty(kept.groupBy("source", "lang")
      .agg(count(lit(1)).as("docs_kept"),
        sum(col("words")).cast("long").as("tokens_kept"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("lang")))
  }
  val pipelineCurateSql =
    """WITH gated AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    len(regexp_split_to_array(text, '\s+')) AS words
      |  FROM documents
      |  WHERE lang IN ('en','de','fr')
      |    AND len(regexp_split_to_array(text, '\s+')) >= 10
      |    AND n_chars >= 100),
      |u AS (
      |  SELECT *,
      |    regexp_replace(regexp_replace(regexp_replace(lower(
      |      (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END) ||
      |      source || '.example.com/page/' || CAST(doc_id % 200 AS VARCHAR) ||
      |      (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
      |      (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END)),
      |      '^https?://(www\.)?', ''), '[?#].*$', ''), '/+$', '') AS url,
      |    n_chars * 10000000 + (9999999 - doc_id) AS k
      |  FROM gated),
      |winners AS (
      |  SELECT 9999999 - (max(k) % 10000000) AS doc_id FROM u GROUP BY url),
      |deduped AS (
      |  SELECT u.* FROM u JOIN winners USING (doc_id)),
      |budgeted AS (
      |  SELECT *,
      |    sum(words) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - words AS cum_before
      |  FROM deduped)
      |SELECT source, lang, count(*) AS docs_kept,
      |  CAST(sum(words) AS BIGINT) AS tokens_kept,
      |  min(doc_id) AS first_doc
      |FROM budgeted WHERE cum_before < 300
      |GROUP BY source, lang ORDER BY source, lang""".stripMargin

  /** PII REDACTION — scrub emails and phone-shaped numbers before
    * training, reporting per-document redaction counts (the audit trail
    * a compliance pipeline keeps). The testdata is synthetic with no
    * real PII, so deterministic PII is INJECTED first (id-derived email
    * / phone suffixes) and the scrubber is verified against it — both
    * engines compute injection and redaction identically. Pure map-side
    * string work: codegen regexp, zero shuffle, composes ahead of any
    * dedup stage. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val seeded = docs.withColumn("t",
      concat(col("text"),
        when(col("doc_id") % 4 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-0199")))
          .otherwise(lit(""))))
    nonEmpty(seeded.select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).as("n_phones"),
        length(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("redacted_len"))
      .filter(col("n_emails") + col("n_phones") > 0)
      .orderBy(col("doc_id")))
  }
  val piiRedactSql =
    """WITH seeded AS (
      |  SELECT doc_id, text ||
      |    (CASE WHEN doc_id % 4 = 0
      |       THEN ' contact user' || doc_id || '@example.com' ELSE '' END) ||
      |    (CASE WHEN doc_id % 6 = 0
      |       THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
      |       ELSE '' END) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
      |  length(regexp_replace(regexp_replace(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_len
      |FROM seeded
      |WHERE len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
      |      len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) > 0
      |ORDER BY doc_id""".stripMargin


  /** TOP-K CORPUS VOCABULARY — term frequency + document frequency for
    * the K most frequent tokens, the corpus statistic behind stopword
    * lists, tokenizer vocab sizing, and quality heuristics. Scale: the
    * explode is map-side; term counting is ONE shuffle on the word with
    * map-side partial aggregation (the per-partition distinct for df
    * rides the same exchange); the top-K is TakeOrdered — no global
    * sort materializes the full vocabulary. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    nonEmpty(docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(25))
  }
  val vocabTopKSql =
    """SELECT w AS word, count(*) AS cnt, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |GROUP BY w ORDER BY cnt DESC, word LIMIT 25""".stripMargin

  /** PER-DOCUMENT TF-IDF KEYWORDS — top-3 terms per document by
    * tf·idf with the raw-frequency idf variant idf = N/df, i.e.
    * score = tf·N/df. That keeps the score ONE IEEE-754 division of two
    * exactly-representable integers — correctly rounded and therefore
    * bit-identical between Spark and DuckDB (log-based idf is NOT: libm
    * `ln` differs in the last ulp across implementations and flips
    * row_number ties). Scale: tf is one shuffle on (doc, term) with
    * map-side combine; df aggregates the already-grouped tf frame (no
    * second pass over tokens); the df join broadcasts (vocabulary-sized);
    * the top-3 window partitions by doc_id — no global sort. */
  def tfidfTopK(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val n = docs.count()
    // tf feeds both the df derivation and the scoring join (and the
    // guard+count evaluations) — persist so the explode+groupBy over the
    // corpus text runs once
    val tf = trackCache(docs
      .select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).persist())
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfq), Seq("term"))
      .withColumn("score", (col("tf") * n).cast("double") / col("df").cast("double"))
    nonEmpty(scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("score"), col("rk"))
      .orderBy(col("doc_id"), col("rk")))
  }
  val tfidfTopKSql =
    """WITH words AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term, CAST(tf * n AS DOUBLE) / CAST(df AS DOUBLE) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (SELECT doc_id, term, score,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      |      FROM scored)
      |SELECT doc_id, term, score, rk FROM r WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  /** DOCUMENT-FREQUENCY BOILERPLATE REMOVAL — the corpus-level analog of
    * repeated-line stripping (CCNet/RefinedWeb style): tokens appearing
    * in more than 79% of all documents are corpus boilerplate and are
    * removed from every document, preserving the original token order
    * of what survives. Scale: document frequency is one shuffle on the
    * token; the boilerplate vocabulary is tiny by construction (tokens
    * in >79% of docs) so the removal join is a BROADCAST anti-join —
    * the corpus itself is never reshuffled for it; reassembly is one
    * shuffle on doc_id with an in-group sort, never a global sort. */
  def boilerplateRemove(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val thresh = docs.count() * 79L / 100L
    val words = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val boiler = words.groupBy("w")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > thresh)
      .select("w")
    val kept = words.join(broadcast(boiler), Seq("w"), "left_anti")
    nonEmpty(kept.groupBy("doc_id")
      .agg(count(lit(1)).as("words_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("clean_text"))
      .orderBy("doc_id"))
  }
  val boilerplateRemoveSql =
    """WITH words AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |boiler AS (
      |  SELECT w FROM (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w)
      |  WHERE df > (SELECT (count(*) * 79) // 100 FROM documents)),
      |kept AS (SELECT * FROM words WHERE w NOT IN (SELECT w FROM boiler))
      |SELECT doc_id, count(*) AS words_kept,
      |       string_agg(w, ' ' ORDER BY pos) AS clean_text
      |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** BIGRAM CORPUS-FAMILIARITY SCORING — the integer-exact core of
    * LM-perplexity quality filtering (CCNet-style): per document, how
    * common its word bigrams are across the corpus (familiarity_sum) and
    * how many are near-hapax (rare_bigrams, corpus count <= 2) — the
    * rare-bigram ratio is the standard "gibberish vs fluent" signal.
    * All-integer outputs keep the cross-engine gate exact where log-prob
    * averages would drift on float summation order. Scale: bigram
    * extraction is map-side (transform over sequence, one explode);
    * corpus counts are ONE shuffle on the bigram with map-side partials;
    * the score join is bigram-keyed — no all-pairs, no global sort. */
  def lmFamiliarity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bg = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val counts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    nonEmpty(bg.join(counts, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c")).cast("long").as("familiarity_sum"),
        sum(when(col("c") <= 2, 1L).otherwise(0L)).cast("long").as("rare_bigrams"))
      .orderBy("doc_id"))
  }
  val lmFamiliaritySql =
    """WITH w AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |bg AS (
      |  SELECT a.doc_id, a.t AS w1, b.t AS w2
      |  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |       CAST(sum(c2.c) AS BIGINT) AS familiarity_sum,
      |       CAST(count(*) FILTER (WHERE c2.c <= 2) AS BIGINT) AS rare_bigrams
      |FROM bg JOIN c2 USING (w1, w2)
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  /** BM25 TOP-K RETRIEVAL — rank documents for a fixed query ("spark
    * merge vector stream") with the BM25 weighting family (k1=1.2,
    * b=0.75) using the raw idf variant idf=(N-df+0.5)/(df+0.5) — every
    * factor is a correctly-rounded IEEE op over exactly-representable
    * integers, applied in ONE fixed expression order, so Spark and
    * DuckDB produce bit-identical doubles (the log-idf variant would
    * drift in the last ulp and flip ranking ties; same engineering rule
    * as tfidfTopK). Per-term scores are summed left-to-right as named
    * columns, never a float SUM over an unordered group. Scale: per-doc
    * tf/dl come from array ops on the token list — NO explode and NO
    * shuffle for scoring; corpus stats (N, total length, per-term df)
    * are one two-stage aggregate producing a single broadcastable row;
    * the top-k is TakeOrderedAndProject. Scoring 100 TB is one map pass. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = Seq("spark", "merge", "vector", "stream")
    val toks = docs.select(col("doc_id"),
      filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("ws"))
    // the narrow per-doc (dl, tf*) proxy feeds BOTH passes (corpus
    // stats and scoring) and the bench's guard+count — persist so the
    // tokenize pass over the corpus runs once (guide §8: decide on a
    // lightweight proxy, never re-derive it from the heavy column)
    val per = trackCache(toks.select(
      (col("doc_id") +: size(col("ws")).as("dl") +:
        terms.zipWithIndex.map { case (tm, i) =>
          size(filter(col("ws"), w => w === tm)).as(s"tf${i + 1}")
        }): _*).persist())
    val st = per.agg(count(lit(1)).as("n"),
      (sum(col("dl")).as("total") +:
        terms.indices.map(i =>
          sum(when(col(s"tf${i + 1}") > 0, 1L).otherwise(0L)).as(s"df${i + 1}"))): _*)
      .first()
    val n = st.getAs[Long]("n")
    val total = st.getAs[Long]("total")
    // norm = k1 * (1 - b + b * dl/avgdl) with dl/avgdl == dl*N/total —
    // one division of exact integers, identical op order in the oracle
    val norm = lit(1.2) * (lit(0.25) + lit(0.75) *
      ((col("dl") * lit(n)).cast("double") / lit(total.toDouble)))
    val score = terms.indices.map { i =>
      val df = st.getAs[Long](s"df${i + 1}")
      val idf = ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)
      lit(idf) * (col(s"tf${i + 1}").cast("double") * lit(2.2)) /
        (col(s"tf${i + 1}").cast("double") + norm)
    }.reduceLeft(_ + _)
    nonEmpty(per.withColumn("score", score)
      .filter(col("score") > 0d)
      .select(col("doc_id"), col("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(15))
  }
  val bm25TopKSql = {
    val terms = Seq("spark", "merge", "vector", "stream")
    val tfCols = terms.zipWithIndex.map { case (tm, i) =>
      s"len(list_filter(ws, w -> w = '$tm')) AS tf${i + 1}"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(count(*) FILTER (WHERE tf${i + 1} > 0) AS BIGINT) AS df${i + 1}"
    ).mkString(", ")
    val score = terms.indices.map { i =>
      val t1 = i + 1
      s"(((CAST(n - df$t1 AS DOUBLE) + 0.5) / (CAST(df$t1 AS DOUBLE) + 0.5)) * " +
        s"(CAST(tf$t1 AS DOUBLE) * 2.2) / (CAST(tf$t1 AS DOUBLE) + " +
        "(1.2 * (0.25 + 0.75 * (CAST(dl * n AS DOUBLE) / CAST(total AS DOUBLE))))))"
    }.mkString(" + ")
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> w <> '') AS ws
      |  FROM documents),
      |per AS (SELECT doc_id, len(ws) AS dl, $tfCols FROM toks),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS total,
      |              $dfCols FROM per)
      |SELECT doc_id, dl, $score AS score
      |FROM per CROSS JOIN st
      |WHERE $score > 0
      |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
  }

  /** HYPERLOGLOG DISTINCT SKETCH — distributed cardinality registers over
    * md5-hashed document texts (with injected duplicates), grouped by
    * language: 256 buckets from the first 2 md5 hex chars, rho from the
    * leading-zero count of the next 13 (52 bits, via bin() string length
    * — exact integer logic, no float log). The oracle re-derives the
    * REGISTER TABLE itself (md5 is engine-portable) plus the exact
    * distinct count; the float estimate (harmonic mean) is asserted
    * against the exact answer in DataOpsSpec at <5% error rather than
    * hash-compared, per the house rule for probabilistic stages. Scale:
    * registers are ONE groupBy((lang,bucket)).max(rho) with map-side
    * combine — the 100-TB sketch shuffles at most groups x 256 rows of
    * bytes, then folds to one row per group; this is exactly how a
    * distributed HLL union works (max of registers is associative). */
  def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val dups = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000)
    val in = docs.unionByName(dups)
    val h = md5(col("text").cast("binary"))
    val hashed = in.select(col("lang"), col("text"),
      conv(substring(h, 1, 2), 16, 10).cast("long").as("bucket"),
      conv(substring(h, 3, 13), 16, 10).cast("long").as("v"))
    val regs = hashed
      .withColumn("rho",
        when(col("v") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("v")))))
      .groupBy(col("lang"), col("bucket"))
      .agg(max(col("rho")).as("r"))
    val sketch = regs.groupBy("lang").agg(
      count(lit(1)).as("buckets_used"),
      sum((col("bucket") + 1L) * col("r")).as("register_checksum"))
    val exact = hashed.groupBy("lang")
      .agg(countDistinct(col("text")).as("exact_distinct"))
    nonEmpty(sketch.join(exact, Seq("lang"))
      .select(col("lang"), col("buckets_used"), col("register_checksum"),
        col("exact_distinct"))
      .orderBy(col("lang")))
  }
  val hllDistinctSql =
    """WITH input AS (
      |  SELECT lang, text FROM documents
      |  UNION ALL
      |  SELECT lang, text FROM documents WHERE doc_id % 7 = 0),
      |hashed AS (
      |  SELECT lang, text,
      |    ('0x' || substr(md5(text), 1, 2))::BIGINT AS bucket,
      |    ('0x' || substr(md5(text), 3, 13))::BIGINT AS v
      |  FROM input),
      |regs AS (
      |  SELECT lang, bucket,
      |    max(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END) AS r
      |  FROM hashed GROUP BY lang, bucket),
      |sk AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS buckets_used,
      |         CAST(sum((bucket + 1) * r) AS BIGINT) AS register_checksum
      |  FROM regs GROUP BY lang),
      |ex AS (SELECT lang, count(DISTINCT text) AS exact_distinct
      |       FROM hashed GROUP BY lang)
      |SELECT lang, buckets_used, register_checksum, exact_distinct
      |FROM sk JOIN ex USING (lang) ORDER BY lang""".stripMargin

  /** CHARACTER-TRIGRAM DIVERSITY — gibberish/boilerplate detection by the
    * Simpson repeat-index of character trigrams: Σ c·(c−1) / (n·(n−1)),
    * the probability two random trigram draws collide. Machine-generated
    * or template text repeats trigrams (high index), natural prose
    * doesn't (the top-50 ranking surfaces the most template-like docs for
    * review); entropy would say the same thing but costs a log() per
    * count — the Simpson form is ONE division of exact integer products,
    * so the gate hash-checks the doubles bit-for-bit. Scale: trigrams
    * come from a per-doc array expression (no corpus-wide explode
    * materialization survives the agg), the per-doc counts are a
    * map-side-combining groupBy, and flagging is a stateless filter —
    * one shuffle total, keyed by (doc_id, trigram). */
  def charDiversity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // whole operator is MAP-SIDE (r11): one byte-walk pass hashes every
    // 3-byte gram (GramHash64 — xxhash64 of the same bytes the previous
    // concat(cs[i],cs[i+1],cs[i+2]) form hashed, so values are
    // bit-identical on the ASCII corpus), and RunRepetition computes
    // Σ c·(c−1) per document in-task (sort + run-length over a few
    // hundred longs). The previous form exploded EVERY gram into a
    // two-level groupBy — a cluster-wide shuffle of ~Σ len(text) rows;
    // now only (doc_id, n, rep) reaches the top-50 ordering. A
    // shorter-than-3-byte text yields one whole-text gram (n = 1),
    // excluded by the same n >= 2 filter that excluded its empty array
    // before.
    import graft.functions.SlidingMinFunctions.{gram_hashes, run_repetition}
    // the n >= 2 gate is expressed on BYTE LENGTH before hashing (n =
    // octet_length - 2 for texts past k bytes, so n >= 2 ⇔ bytes >= 4):
    // a filter on size(h) gets pushed beneath the projection and
    // re-inlines the gram-hash expression — every document hashed twice
    val per = docs
      .filter(octet_length(col("text")) >= 4)
      .select(col("doc_id"), gram_hashes(col("text"), 3).as("h"))
      .select(col("doc_id"), size(col("h")).cast("long").as("n"),
        run_repetition(col("h")).as("rep"))
    nonEmpty(per
      .withColumn("simpson",
        col("rep").cast("double") / (col("n") * (col("n") - 1L)).cast("double"))
      .select(col("doc_id"), col("n"), col("rep"), col("simpson"))
      .orderBy(col("simpson").desc, col("doc_id"))
      .limit(50))
  }
  val charDiversitySql =
    """WITH tri AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(len(text) - 2, 1)),
      |                          i -> substr(text, i, 3))) AS g
      |  FROM documents),
      |per AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(c * (c - 1)) AS BIGINT) AS rep
      |  FROM (SELECT doc_id, g, count(*) AS c
      |        FROM tri WHERE len(g) = 3 GROUP BY doc_id, g)
      |  GROUP BY doc_id HAVING sum(c) >= 2)
      |SELECT doc_id, n, rep,
      |  CAST(rep AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS simpson
      |FROM per
      |ORDER BY simpson DESC, doc_id LIMIT 50""".stripMargin

  /** OOV RATE — tokenizer-coverage analysis: the fraction of corpus
    * tokens outside the top-1000 vocabulary, per language. This is the
    * statistic that sizes a tokenizer's vocab and flags languages it
    * under-serves. All counts are exact integers; the rate is ONE
    * division per output row, so the gate hash-checks the doubles.
    * Scale: vocab is a map-side-combining token count + TakeOrdered
    * 1000 (never a global sort); membership is a BROADCAST join of the
    * token stream against the 1000-row vocab — the corpus is never
    * reshuffled for the lookup; per-language totals map-side-combine.
    * Ties at the vocab boundary break (count desc, term) in both
    * engines. */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("lang"), explode(
      filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(1000)
      .select(col("term"), lit(1).as("in_vocab"))
    nonEmpty(toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy("lang"))
  }
  val oovRateSql =
    """WITH toks AS (
      |  SELECT lang,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                       w -> w <> '')) AS term
      |  FROM documents),
      |vocab AS (
      |  SELECT term FROM (SELECT term, count(*) AS c FROM toks GROUP BY term)
      |  ORDER BY c DESC, term LIMIT 1000)
      |SELECT lang, count(*) AS n_tokens,
      |  CAST(count(*) FILTER (WHERE toks.term NOT IN (SELECT term FROM vocab))
      |    AS BIGINT) AS n_oov,
      |  CAST(CAST(count(*) FILTER (WHERE toks.term NOT IN (SELECT term FROM vocab))
      |    AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
      |FROM toks GROUP BY lang ORDER BY lang""".stripMargin

  /** STREAM-STATIC ENRICHMENT JOIN — enrich a streaming fact (orders as
    * a file stream) with a broadcast static dimension (customer): the
    * stateless streaming join every event pipeline runs before its
    * stateful stages. Because the static side is broadcast, each
    * micro-batch is a map-side hash join — NO shuffle, NO join state
    * store, and state size is zero regardless of stream length (the
    * spec asserts BroadcastHashJoin in the streaming plan). At 100 TB
    * of stream this costs exactly one pass; a too-big-to-broadcast
    * dimension degrades to a per-batch shuffle join, never to stream-
    * stream state. */
  def streamStaticEnrich(s: SparkSession, dir: String): DataFrame =
    streamStaticEnrichRun(s, dir)._1

  /** Test seam: also returns the final StreamingQueryProgress so the
    * spec can assert the join ran STATELESS (no state-store operators). */
  private[graft] def streamStaticEnrichRun(s: SparkSession, dir: String)
      : (DataFrame, org.apache.spark.sql.streaming.StreamingQueryProgress) = {
    val src = stagedStreamSrc(dir, "orders")
    val sch = s.read.parquet(src).schema
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    val stream = s.readStream.schema(sch).parquet(src)
      .filter(col("o_totalprice") > 400000d)
    val joined = stream.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"),
        col("c_nationkey"), col("o_totalprice"))
    val qname = "se_" + java.util.UUID.randomUUID().toString.replace("-", "")
    trackTempView(s, qname)
    val progress = graft.table.WriteFiles.withScopedConfs(
        s, "spark.sql.shuffle.partitions" -> "8") {
      val q = joined.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.lastOption.orNull
    }
    (nonEmpty(s.table(qname).orderBy(col("o_orderkey"))), progress)
  }
  val streamStaticEnrichSql =
    """SELECT o_orderkey, o_custkey, c_mktsegment, c_nationkey, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 400000
      |ORDER BY o_orderkey""".stripMargin

  /** INVERTED INDEX BUILD — the search-engine index shape: per-term
    * document frequency, total term frequency, and the first-8 posting
    * list serialized as "doc:tf" (string output keeps the gate
    * hash-exact). Two term-keyed shuffles, both honest at scale: the
    * (term, doc_id) tf groupBy map-side-combines, and posting capping
    * uses a windowed row_number so a term's FULL posting list is never
    * collected — only the ≤8 surviving rows reach collect_list. The
    * residual skew (a stopword's postings sort inside one partition's
    * window) is the known cost of per-term ordering; the documented
    * web-scale variant range-buckets (term, doc_id bucket) first so no
    * single task owns a whole stopword. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val tf = trackCache(docs.select(col("doc_id"), explode(
        filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .persist())
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("total_tf"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    val post = tf.withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .groupBy("term").agg(expr(
        """array_join(transform(sort_array(collect_list(struct(doc_id, tf))),
          |  p -> concat(CAST(p.doc_id AS STRING), ':', CAST(p.tf AS STRING))), ',')"""
          .stripMargin).as("postings"))
    nonEmpty(stats.join(post, Seq("term"))
      .orderBy(col("df").desc, col("term"))
      .limit(20))
  }
  val invertedIndexSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                       w -> w <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY term, doc_id),
      |stats AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
      |                 CAST(sum(tf) AS BIGINT) AS total_tf
      |          FROM tf GROUP BY term),
      |capped AS (SELECT term, doc_id, tf,
      |                  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      |           FROM tf),
      |post AS (SELECT term, string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
      |         FROM capped WHERE rn <= 8 GROUP BY term)
      |SELECT s.term, s.df, s.total_tf, p.postings
      |FROM stats s JOIN post p USING (term)
      |ORDER BY s.df DESC, s.term LIMIT 20""".stripMargin

  /** COUNT-MIN-SKETCH HEAVY HITTERS — estimate term frequencies with a
    * 4-row × 512-column CMS (cells from md5("r<j>:"+term), engine-
    * portable) and report the exact top-15 terms with their sketch
    * estimates side by side. All columns are integers, so the oracle
    * hash-checks the whole sketch-query path; the CMS over-count
    * guarantee (estimate ≥ exact, always) is asserted in DataOpsSpec.
    * Scale: the token explode collapses to per-term counts with ONE
    * map-side-combining groupBy; the sketch is built from DISTINCT
    * terms (vocabulary-sized, not corpus-sized) and is itself only
    * 4×512 cells — at 100 TB this is the textbook mergeable-summary
    * shape: register sums are associative, so executors build partial
    * sketches and one tiny reduce merges them. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs.select(explode(
      filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "")).as("term"))
    val counts = trackCache(
      terms.groupBy("term").agg(count(lit(1)).as("c")).persist())
    val cellExpr =
      """transform(sequence(0, 3), j -> named_struct('j', j, 'cell',
        |  CAST(conv(substring(md5(CAST(concat('r', j, ':', term) AS BINARY)),
        |    1, 8), 16, 10) AS BIGINT) % 512))""".stripMargin
    val cells = counts.select(col("term"), col("c"),
      explode(expr(cellExpr)).as("jc"))
      .select(col("term"), col("c"), col("jc.j").as("j"), col("jc.cell").as("cell"))
    val sketch = cells.groupBy("j", "cell").agg(sum(col("c")).as("cnt"))
    val top = counts.orderBy(col("c").desc, col("term")).limit(15)
    val topCells = top.select(col("term"), col("c"), explode(expr(cellExpr)).as("jc"))
      .select(col("term"), col("c"), col("jc.j").as("j"), col("jc.cell").as("cell"))
    nonEmpty(topCells.join(sketch, Seq("j", "cell"))
      .groupBy(col("term"), col("c").as("exact_count"))
      .agg(min(col("cnt")).cast("long").as("cms_estimate"))
      .select(col("term"), col("exact_count"), col("cms_estimate"))
      .orderBy(col("exact_count").desc, col("term")))
  }
  val cmsHeavyHittersSql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                            w -> w <> '')) AS term
      |  FROM documents),
      |counts AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
      |cells AS (
      |  SELECT term, c, j,
      |    ('0x' || substr(md5('r' || j || ':' || term), 1, 8))::BIGINT % 512 AS cell
      |  FROM counts CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
      |sketch AS (SELECT j, cell, CAST(sum(c) AS BIGINT) AS cnt
      |           FROM cells GROUP BY j, cell),
      |top AS (SELECT term, c FROM counts ORDER BY c DESC, term LIMIT 15)
      |SELECT t.term, t.c AS exact_count, CAST(min(sk.cnt) AS BIGINT) AS cms_estimate
      |FROM top t
      |JOIN cells ce ON t.term = ce.term
      |JOIN sketch sk ON ce.j = sk.j AND ce.cell = sk.cell
      |GROUP BY t.term, t.c
      |ORDER BY exact_count DESC, t.term""".stripMargin

  /** PMI COLLOCATIONS — corpus-level collocation mining: score every
    * bigram seen ≥5 times by the PMI ratio (c_xy·N_b)/(c_x·c_y). The
    * score is ONE division of two exactly-representable integer
    * products (all counts < 2^26 at oracle scale, products < 2^53), so
    * the double is correctly rounded and identical in both engines —
    * the log() of textbook PMI is monotone and dropped deliberately,
    * same bit-exactness rule as bm25TopK. Scale: bigram and unigram
    * counts are map-side-combining groupBys over the token stream; the
    * two count joins key on vocabulary-sized frames (the ≥5 support
    * filter shrinks the left side first); top-k is
    * TakeOrderedAndProject. No all-pairs stage anywhere. */
  def pmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs
      .select(filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("ws"))
    val bg = trackCache(toks.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist())
    val nb = bg.count()
    val uni = toks.select(explode(col("ws")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cu"))
    val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
    val scored = bgc
      .join(uni.select(col("term").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .withColumn("pmi_ratio",
        (col("cxy") * lit(nb)).cast("double") / (col("cu1") * col("cu2")).cast("double"))
    nonEmpty(scored
      .select(col("w1"), col("w2"), col("cxy"), col("cu1"), col("cu2"), col("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(20))
  }
  val pmiCollocationsSql =
    """WITH w AS (
      |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     w -> w <> '') AS ws
      |  FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i])) AS w1,
      |         unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i+1])) AS w2
      |  FROM w WHERE len(ws) >= 2),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
      |uni AS (SELECT unnest(ws) AS term FROM w),
      |cu AS (SELECT term, CAST(count(*) AS BIGINT) AS cu FROM uni GROUP BY term),
      |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy
      |        FROM bg GROUP BY w1, w2 HAVING count(*) >= 5)
      |SELECT w1, w2, cxy, u1.cu AS cu1, u2.cu AS cu2,
      |  CAST(cxy * nb.n AS DOUBLE) / CAST(u1.cu * u2.cu AS DOUBLE) AS pmi_ratio
      |FROM bgc
      |JOIN cu u1 ON bgc.w1 = u1.term
      |JOIN cu u2 ON bgc.w2 = u2.term
      |CROSS JOIN nb
      |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 20""".stripMargin

  /** EXACT DISCRETE QUANTILES — per-language p50/p90/p99 of document
    * token length by rank selection: row_number within (lang, ordered by
    * dl, doc_id), pick rank ceil(q·n) via pure integer arithmetic
    * ((n·q%+99) div 100) — no float interpolation, so the result is an
    * integer row hash-checked end to end. Scale: ONE hash shuffle on
    * lang then a per-group sort — the exact-quantile cost model; group
    * skew is bounded by language cardinality, and the documented 100-TB
    * relaxation is percentile_approx (a mergeable t-digest) when a
    * per-group sort no longer pays, traded consciously for exactness
    * here. */
  def quantileLengths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val dl = docs.select(col("lang"), col("doc_id"), wsTokenCount.as("dl"))
    val w = Window.partitionBy("lang").orderBy(col("dl"), col("doc_id"))
    val ranked = dl
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    nonEmpty(ranked.groupBy("lang")
      .agg(max(col("n")).cast("long").as("n_docs"),
        max(when(col("rn") === expr("(n*50+99) div 100"), col("dl"))).cast("long").as("p50"),
        max(when(col("rn") === expr("(n*90+99) div 100"), col("dl"))).cast("long").as("p90"),
        max(when(col("rn") === expr("(n*99+99) div 100"), col("dl"))).cast("long").as("p99"))
      .orderBy("lang"))
  }
  val quantileLengthsSql =
    """WITH dl AS (
      |  SELECT lang, doc_id,
      |    len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS dl
      |  FROM documents),
      |r AS (
      |  SELECT lang, dl,
      |    row_number() OVER (PARTITION BY lang ORDER BY dl, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM dl)
      |SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
      |  CAST(max(CASE WHEN rn = (n*50+99)//100 THEN dl END) AS BIGINT) AS p50,
      |  CAST(max(CASE WHEN rn = (n*90+99)//100 THEN dl END) AS BIGINT) AS p90,
      |  CAST(max(CASE WHEN rn = (n*99+99)//100 THEN dl END) AS BIGINT) AS p99
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  /** HASHED-FEATURE LINEAR CLASSIFIER — the fasttext-shaped quality
    * filter production pipelines run over every document: word features
    * hash into a fixed bucket space (no vocabulary to broadcast, the
    * 100-TB property), each bucket carries a weight, and the document
    * score is the weight sum. Weights here are derived arithmetically
    * from the bucket id (a stand-in for trained weights — the dataflow,
    * hashing, and aggregation are the operator) and INTEGER-valued, so
    * the score is exact and order-independent: no libm, no float
    * summation drift. One narrow shuffle on doc_id; the hash stage is
    * exported so the oracle re-derives scoring from the same buckets. */
  def hashClassifier(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val K = 4096
    val feats = docs
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"), w => w =!= "")).as("tok"))
      .select(col("doc_id"), pmod(xxhash64(col("tok")), lit(K.toLong)).as("bucket"))
    exportForOracle(feats, "hash_features")
    // deterministic integer weight in [-999, 999] (Knuth multiplicative)
    val w = pmod(col("bucket") * lit(2654435761L), lit(1999L)) - lit(999L)
    nonEmpty(feats.withColumn("w", w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("raw_score"))
      .withColumn("label", col("raw_score") > 0)
      .orderBy(col("doc_id")))
  }
  val hashClassifierSql =
    s"""WITH f AS (SELECT doc_id, bucket
      |  FROM read_parquet('$ExportDir/hash_features/*.parquet')),
      |w AS (SELECT doc_id, ((bucket * 2654435761) % 1999) - 999 AS w FROM f)
      |SELECT doc_id, count(*) AS n_feats, CAST(sum(w) AS BIGINT) AS raw_score,
      |       sum(w) > 0 AS label
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** TEMPERATURE-SCALED SOURCE MIXING — the published-recipe sampling
    * step that flattens the domain distribution before training: source
    * weights ∝ n^(1/2) (temperature sampling at τ=2; sqrt because IEEE
    * sqrt is correctly rounded, so both engines derive IDENTICAL integer
    * weights — pow(x, 0.7) would drift in the last ulp between libms),
    * quotas split an overall doc budget proportionally in pure integer
    * arithmetic, and each source keeps its first quota docs in
    * deterministic hash order. Per-source windows — strata select their
    * prefixes independently, no global sort; at 100 TB the rank windows
    * run per (source, shard). */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val perSrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs") * lit(1000000L))).cast("long"))
    val tot = perSrc.agg(sum(col("w")).as("tot_w"), sum(col("n_docs")).as("tot_n"))
    val quotas = perSrc.crossJoin(broadcast(tot))
      .withColumn("quota",
        expr("CAST((w * (tot_n DIV 2)) DIV tot_w AS BIGINT)"))
      .select(col("source"), col("quota"))
    val h = md5(col("doc_id").cast("string"))
    val ranked = docs.select(col("source"), col("doc_id"),
        conv(substring(h, 1, 8), 16, 10).cast("long").as("ord"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("ord"), col("doc_id"))))
    nonEmpty(ranked.join(broadcast(quotas), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"), sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("source")))
  }
  val temperatureMixSql =
    """WITH n AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(floor(sqrt(n_docs * 1000000)) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |q AS (
      |  SELECT source,
      |    (w * ((SELECT CAST(sum(n_docs) AS BIGINT) FROM n) // 2))
      |      // (SELECT CAST(sum(w) AS BIGINT) FROM n) AS quota
      |  FROM n),
      |r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id) AS rk
      |  FROM documents)
      |SELECT r.source, count(*) AS docs_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum
      |FROM r JOIN q ON r.source = q.source
      |WHERE rk <= quota
      |GROUP BY r.source ORDER BY r.source""".stripMargin

  /** TRAIN→EVAL CONTAINMENT — decontamination's scoring form: for every
    * (train doc, eval doc) pair sharing 5-gram shingles, the fraction of
    * the EVAL doc's distinct grams found in the train doc (Brown et al.'s
    * n-gram containment). Eval fixture: prefix-halves of every 17th doc
    * under shifted ids, so true containments exist by construction. The
    * join is a gram equi-join on 64-bit gram hashes (one shuffle, no
    * pairs expansion beyond true gram matches); the ratio test is
    * cross-multiplied in integers — no division, no float compare. */
  def containment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def gramsOf(d: DataFrame): DataFrame = d
      .select(col("doc_id"), filter(split(lower(col("text")), "\\s+"), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(col("w")) - 4),
          i => xxhash64(concat_ws(" ", slice(col("w"), i, lit(5))))))).as("h"))
    val evalDocs = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat_ws(" ", slice(filter(split(lower(col("text")), "\\s+"), w => w =!= ""),
          lit(1), greatest(lit(5), floor(size(filter(split(lower(col("text")), "\\s+"),
            w => w =!= "")) / 2).cast("int")))).as("text"))
    val trainG = gramsOf(docs)
    val evalG = gramsOf(evalDocs)
    exportForOracle(trainG, "contain_train")
    exportForOracle(evalG, "contain_eval")
    val evalN = evalG.groupBy(col("doc_id")).agg(count(lit(1)).as("eval_n"))
      .withColumnRenamed("doc_id", "eval_id")
    nonEmpty(trainG.select(col("doc_id").as("train_id"), col("h"))
      .join(evalG.select(col("doc_id").as("eval_id"), col("h")), Seq("h"))
      .groupBy(col("train_id"), col("eval_id")).agg(count(lit(1)).as("overlap"))
      .join(evalN, Seq("eval_id"))
      .filter(col("overlap") * 10 >= col("eval_n") * 8) // containment >= 0.8
      .select(col("train_id"), col("eval_id"), col("overlap"), col("eval_n"))
      .orderBy(col("train_id"), col("eval_id")))
  }
  val containmentSql =
    s"""WITH tg AS (SELECT doc_id, h
      |  FROM read_parquet('$ExportDir/contain_train/*.parquet')),
      |eg AS (SELECT doc_id, h
      |  FROM read_parquet('$ExportDir/contain_eval/*.parquet')),
      |en AS (SELECT doc_id AS eval_id, count(*) AS eval_n FROM eg GROUP BY doc_id),
      |ov AS (
      |  SELECT tg.doc_id AS train_id, eg.doc_id AS eval_id, count(*) AS overlap
      |  FROM tg JOIN eg ON tg.h = eg.h
      |  GROUP BY tg.doc_id, eg.doc_id)
      |SELECT train_id, eval_id, CAST(overlap AS BIGINT) AS overlap,
      |       CAST(eval_n AS BIGINT) AS eval_n
      |FROM ov JOIN en USING (eval_id)
      |WHERE overlap * 10 >= eval_n * 8
      |ORDER BY train_id, eval_id""".stripMargin

  /** HISTOGRAM-SKETCH QUANTILES — the MERGEABLE companion to the exact
    * per-key window quantiles (`ds_quantile_lengths`): token counts bin
    * into fixed-width buckets (a histogram is an associative,
    * commutative sketch — partial-aggregates map-side, merges in any
    * order), and p50/p90/p99 read off the cumulative counts. At 100 TB
    * the shuffle carries only (lang, bin) partial counts — thousands of
    * rows — where an exact quantile would sort the corpus; resolution
    * is the bin width, the honest sketch tradeoff. Pure integer
    * cross-multiplied rank tests, no float percentile math. */
  def histogramQuantile(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val hist = docs.select(col("lang"), wsTokenCount.as("tok"))
      .select(col("lang"), expr("CAST(tok DIV 16 AS BIGINT)").as("bin"))
      .groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(win))
    val tot = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
    nonEmpty(cum.join(broadcast(tot), Seq("lang"))
      .groupBy(col("lang"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("bin"))).as("p50_bin"),
        min(when(col("cum") * 10 >= col("n") * 9, col("bin"))).as("p90_bin"),
        min(when(col("cum") * 100 >= col("n") * 99, col("bin"))).as("p99_bin"),
        max(col("n")).as("n_docs"))
      .orderBy(col("lang")))
  }
  val histogramQuantileSql =
    """WITH tok AS (
      |  SELECT lang,
      |    len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS tok
      |  FROM documents),
      |h AS (SELECT lang, tok // 16 AS bin, count(*) AS cnt FROM tok GROUP BY lang, bin),
      |c AS (
      |  SELECT lang, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cnt) OVER (PARTITION BY lang) AS n
      |  FROM h)
      |SELECT lang,
      |  CAST(min(CASE WHEN cum * 2 >= n THEN bin END) AS BIGINT) AS p50_bin,
      |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN bin END) AS BIGINT) AS p90_bin,
      |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN bin END) AS BIGINT) AS p99_bin,
      |  CAST(max(n) AS BIGINT) AS n_docs
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  /** EDIT-DISTANCE NEAR-DUP — the title/short-field dedup technique:
    * blocking (first token + length band) plus SORTED-NEIGHBORHOOD
    * candidate generation (Hernández–Stolfo): within a block, records
    * sort lexicographically and only the W nearest neighbors pair, so
    * candidates are ≤ W per record — LINEAR in the corpus where naive
    * within-block pairing went quadratic on skewed blocks (measured:
    * 77s → 2s at sf0.1 on blocks sharing a common first token). Exact
    * Levenshtein then verifies within a 20% relative bound; prefixes cap
    * at 80 chars so one giant doc can't inflate a DP cell. Recall
    * tradeoff is the documented blocking one: near-dups that sort far
    * apart inside a block (or differ in the first token) are missed —
    * the MinHash/SimHash family covers those; this op is the cheap
    * short-field pass. Integer cross-multiplied threshold. */
  def editNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val W = 5
    // cached: this frame (a parquet scan of the text column + a window
    // shuffle) feeds BOTH sides of the neighbor join — uncached, Spark
    // recomputes the scan and the rank sort twice
    val keyed = trackCache(docs.select(col("doc_id"),
        substring(lower(trim(col("text"))), 1, 80).as("p"))
      .filter(length(col("p")) >= 8) // degenerate empties would block together
      .withColumn("tok0", substring_index(col("p"), " ", 1))
      .withColumn("lband", expr("CAST(length(p) DIV 8 AS BIGINT)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("tok0"), col("lband")).orderBy(col("p"), col("doc_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the neighbor offset is exploded into the JOIN KEY — a bare
    // `b.rn BETWEEN a.rn+1 AND a.rn+W` conjunct would leave Spark an
    // equi-join on the block key alone, materializing the full quadratic
    // block before filtering (measured: 79s at sf0.1); keying on the
    // target rn keeps the join strictly W-candidates-per-record
    val probes = keyed.select(col("tok0"), col("lband"),
      col("doc_id").as("a_doc"), col("p").as("ap"),
      explode(sequence(col("rn") + 1, col("rn") + W)).as("rn"))
    val pairs = probes.join(
        keyed.select(col("tok0"), col("lband"), col("rn"),
          col("doc_id").as("b_doc"), col("p").as("bp")),
        Seq("tok0", "lband", "rn"))
      .select(least(col("a_doc"), col("b_doc")).as("a_id"),
        greatest(col("a_doc"), col("b_doc")).as("b_id"),
        col("ap"), col("bp"))
    nonEmpty(pairs
      .withColumn("dist", levenshtein(col("ap"), col("bp")))
      .withColumn("maxlen", greatest(length(col("ap")), length(col("bp"))))
      .filter(col("dist") * 5 <= col("maxlen")) // relative distance <= 20%
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy(col("a_id"), col("b_id")))
  }
  val editNearDupSql =
    """WITH k AS (
      |  SELECT doc_id, substr(lower(trim(text)), 1, 80) AS p
      |  FROM documents),
      |k2 AS (
      |  SELECT doc_id, p, split_part(p, ' ', 1) AS tok0, length(p) // 8 AS lband,
      |    row_number() OVER (PARTITION BY split_part(p, ' ', 1), length(p) // 8
      |      ORDER BY p, doc_id) AS rn
      |  FROM k WHERE length(p) >= 8)
      |SELECT least(a.doc_id, b.doc_id) AS a_id,
      |  greatest(a.doc_id, b.doc_id) AS b_id,
      |  CAST(levenshtein(a.p, b.p) AS INT) AS dist
      |FROM k2 a JOIN k2 b
      |  ON a.tok0 = b.tok0 AND a.lband = b.lband
      |  AND b.rn > a.rn AND b.rn <= a.rn + 5
      |WHERE levenshtein(a.p, b.p) * 5 <= greatest(length(a.p), length(b.p))
      |ORDER BY a_id, b_id""".stripMargin

  // ------------------------------------------------------ winnowing dedup

  /** Winnowing fingerprint near-dup (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003 — the MOSS algorithm): hash every k-char gram, slide a window
    * of w consecutive hashes, keep each window's MINIMUM; the distinct
    * minima are the doc's fingerprints (density ~2/(w+1), guaranteed to
    * catch any shared run of k+w-1 chars). Candidate pairs share >= 5
    * fingerprints. 100-TB story: O(chars) hashing map-side, one window
    * shuffle per doc (tiny partitions — a doc's grams), fingerprints are
    * ~25% of gram count, and the document-frequency cap (<= 50 docs per
    * fingerprint) kills the quadratic posting-list blowup a template
    * shared by thousands of docs would otherwise cause — the same cap the
    * inverted-index op applies. xxhash64 is not SQL-portable, so the gram
    * hashes are exported and the oracle re-derives windows/minima/pairs. */
  def winnowDedup(s: SparkSession, dir: String): DataFrame = {
    val k = 8; val w = 8
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // injected near-dups: same text with a suffix — every original window
    // survives, so the pair must surface
    val dups = base.filter(col("doc_id") % 17 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000)
      .withColumn("text", concat(col("text"), lit(" winnow-copy")))
    val docs = base.unionByName(dups)
    // one-pass byte-walk gram hashing (functions/SlidingMin.scala:GramHash64)
    // — the r10 transform(sequence, i => xxhash64(substr)) form allocated a
    // copied UTF8String per gram position and alone cost ~2s of the query's
    // 5.2s (profiled r11); this is the same xxhash64 (seed 42) with zero
    // per-gram allocation
    val hashArr = graft.functions.SlidingMinFunctions.gram_hashes(col("text"), k)
    // the gram frame exists only for the oracle's independent re-derivation
    // (export is a no-op in bench runs); the ENGINE path below never
    // explodes grams. Export uses the SAME GramHash64 expression as the
    // engine path, so the two can't diverge on gram definition.
    exportForOracle(docs.select(col("doc_id"), posexplode(hashArr))
      .toDF("doc_id", "pos", "h"), "winnow_grams")
    // winnowing minima via the codegen monotonic-deque kernel
    // (functions/SlidingMin.scala): O(n) map-side, no doc_id shuffle of
    // raw gram hashes — the previous explode + rowsBetween-window form
    // shuffled EVERY gram hash before its per-window min; only the
    // distinct fingerprints (~n/w per doc) reach the shuffle now
    // array_distinct already makes (doc_id, fp) unique — no distinct()
    // shuffle needed on top
    val fps = docs
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.SlidingMinFunctions.sliding_min(hashArr, w))).as("fp"))
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("fp")
    val sel = fps.join(rare, "fp")
    sel.as("a").join(sel.as("b"), "fp")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 5)
      .orderBy(col("doc_a"), col("doc_b"))
  }
  val winnowDedupSql =
    s"""WITH g AS (
      |  SELECT doc_id, pos, h FROM read_parquet('$ExportDir/winnow_grams/*.parquet')),
      |mm AS (
      |  SELECT doc_id, pos,
      |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m,
      |    max(pos) OVER (PARTITION BY doc_id) AS maxpos
      |  FROM g),
      |fps AS (SELECT DISTINCT doc_id, m AS fp FROM mm WHERE pos <= maxpos - 7),
      |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
      |sel AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |FROM sel a JOIN sel b USING (fp)
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 5
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------- k-anonymity guard

  /** k-anonymity suppression over quasi-identifiers: a released corpus
    * must not contain a (lang, source, length-bucket) combination held by
    * fewer than k documents — such rows re-identify their authors.
    * Groups below k are suppressed. One shuffle on the QI tuple; the
    * surviving-group set is QI-cardinality-sized (tiny), so the
    * filter-back join broadcasts no matter the corpus size. */
  def kanonSuppress(s: SparkSession, dir: String): DataFrame = {
    val kAnon = 3
    val docs = t(s, dir, "documents")
      .withColumn("len_bucket", expr("n_chars DIV 100"))
    val keep = docs.groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") >= kAnon)
    docs.join(broadcast(keep), Seq("lang", "source", "len_bucket"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("len_bucket"), col("group_n"))
      .orderBy(col("doc_id"))
  }
  val kanonSuppressSql =
    """WITH d AS (
      |  SELECT doc_id, lang, source, n_chars // 100 AS len_bucket FROM documents),
      |g AS (
      |  SELECT lang, source, len_bucket, count(*) AS group_n
      |  FROM d GROUP BY 1, 2, 3 HAVING count(*) >= 3)
      |SELECT d.doc_id, d.lang, d.source, d.len_bucket, g.group_n
      |FROM d JOIN g USING (lang, source, len_bucket)
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------- n-gram novelty

  /** N-gram novelty scoring: how much of each document is FIRST SEEN
    * there? A word-5-gram is novel to the lowest doc_id containing it;
    * per doc we report novel vs total distinct grams — the dedup-aware
    * sampling signal (prefer high-novelty docs when packing a training
    * mix). One shuffle on the gram hash; min-per-gram is map-side
    * combinable, so the reduce side sees one record per distinct gram,
    * not per occurrence. Gram hashes exported for the oracle. */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val words = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val grams = transform(
      sequence(lit(1), size(words) - 4),
      i => xxhash64(concat_ws(" ", slice(words, i, lit(5)))))
    // Docs with <5 tokens contribute no grams (sequence(1, n<1) would count
    // DOWN and slice would throw); they surface as novel=0/total=0 via the
    // left join below.
    val g = docs
      .filter(size(words) >= 5)
      .select(col("doc_id"), explode(array_distinct(grams)).as("g"))
    exportForOracle(g, "novelty_grams")
    val firstDoc = g.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    val novelty = g.join(firstDoc, "g")
      .groupBy("doc_id")
      .agg(count(when(col("first_doc") === col("doc_id"), 1)).as("novel"),
        count(lit(1)).as("total"))
    docs.select("doc_id").join(novelty, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("novel"), lit(0L)).as("novel"),
        coalesce(col("total"), lit(0L)).as("total"))
      .orderBy(col("doc_id"))
  }
  val ngramNoveltySql =
    s"""WITH g AS (
      |  SELECT DISTINCT doc_id, g
      |  FROM read_parquet('$ExportDir/novelty_grams/*.parquet')),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g),
      |n AS (
      |  SELECT g.doc_id,
      |    count(*) FILTER (WHERE f.first_doc = g.doc_id) AS novel,
      |    count(*) AS total
      |  FROM g JOIN f USING (g) GROUP BY 1)
      |SELECT d.doc_id, coalesce(n.novel, 0) AS novel, coalesce(n.total, 0) AS total
      |FROM documents d LEFT JOIN n USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_winnow_dedup" -> (winnowDedup _),
    "ds_kanon_suppress" -> (kanonSuppress _),
    "ds_ngram_novelty" -> (ngramNovelty _),
    "ds_histogram_quantile" -> (histogramQuantile _),
    "ds_edit_neardup" -> (editNearDup _),
    "ds_hash_classifier" -> (hashClassifier _),
    "ds_temperature_mix" -> (temperatureMix _),
    "ds_containment" -> (containment _),
    "ds_cms_heavy_hitters" -> (cmsHeavyHitters _),
    "ds_inverted_index" -> (invertedIndex _),
    "ds_char_diversity" -> (charDiversity _),
    "ds_bloom_decontaminate" -> (bloomDecontaminate _),
    "ds_oov_rate" -> (oovRate _),
    "stream_static_join" -> (streamStaticEnrich _),
    "ds_pmi_collocations" -> (pmiCollocations _),
    "ds_quantile_lengths" -> (quantileLengths _),
    "ds_bm25_topk" -> (bm25TopK _),
    "ds_hll_distinct" -> (hllDistinct _),
    "ds_lm_familiarity" -> (lmFamiliarity _),
    "ds_vocab_topk" -> (vocabTopK _),
    "ds_tfidf_topk" -> (tfidfTopK _),
    "ds_semdedup" -> (semDeDup _),
    "ds_boilerplate_rm" -> (boilerplateRemove _),
    "ds_mix_budget" -> (mixBudget _),
    "ds_pii_redact" -> (piiRedact _),
    "ds_url_dedup" -> (urlDedup _),
    "ds_pipeline_curate" -> (pipelineCurate _),
    "ds_chunk_docs" -> (chunkDocs _),
    "ds_decontaminate" -> (decontaminate _),
    "ds_sample_stratified" -> (sampleStratified _),
    "ds_shard_shuffle" -> (shardShuffle _),
    "ds_pack_sequences" -> (packSequences _),
    "ds_dedup_incremental" -> (dedupIncremental _),
    "ds_text_repetition" -> (textRepetition _),
    "ds_dedup_exact" -> (dedupExact _),
    "ds_dedup_jaccard" -> (dedupJaccard _),
    "ds_dedup_cluster" -> (dedupCluster _),
    "ds_substring_dedup" -> (substringDedup _),
    "ds_dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "ds_dedup_simhash" -> (dedupSimhash _),
    "ds_embed_neardup" -> (embedNearDup _),
    "ds_embed_kmeans" -> (embedKmeans _),
    "ds_pq_ann" -> (pqAnn _),
    "ds_ann_cosine_topk" -> (annCosineTopK _),
    "ds_ann_ivf_topk" -> (annIvfTopK _),
    "ds_text_tokens" -> (textTokens _),
    "ds_text_quality" -> (textQuality _),
    "ds_text_langid" -> (textLangId _),
    "ds_text_fingerprint" -> (textFingerprint _),
    "ds_multimodal_features" -> (multimodalFeatures _),
    "ds_multimodal_neardup" -> (multimodalNearDup _),
    "stream_window_agg" -> (streamWindowAgg _),
    "stream_dedup" -> (streamDedup _),
    "stream_interval_join" -> (streamIntervalJoin _),
    "stream_sessionize" -> (streamSessionize _),
  )

  val oracles: Map[String, String] = Map(
    "ds_winnow_dedup" -> winnowDedupSql,
    "ds_kanon_suppress" -> kanonSuppressSql,
    "ds_ngram_novelty" -> ngramNoveltySql,
    "ds_histogram_quantile" -> histogramQuantileSql,
    "ds_edit_neardup" -> editNearDupSql,
    "ds_hash_classifier" -> hashClassifierSql,
    "ds_temperature_mix" -> temperatureMixSql,
    "ds_containment" -> containmentSql,
    "ds_cms_heavy_hitters" -> cmsHeavyHittersSql,
    "ds_inverted_index" -> invertedIndexSql,
    "ds_char_diversity" -> charDiversitySql,
    "ds_bloom_decontaminate" -> bloomDecontaminateSql,
    "ds_oov_rate" -> oovRateSql,
    "stream_static_join" -> streamStaticEnrichSql,
    "ds_pmi_collocations" -> pmiCollocationsSql,
    "ds_quantile_lengths" -> quantileLengthsSql,
    "ds_bm25_topk" -> bm25TopKSql,
    "ds_hll_distinct" -> hllDistinctSql,
    "ds_mix_budget" -> mixBudgetSql,
    "ds_pii_redact" -> piiRedactSql,
    "ds_url_dedup" -> urlDedupSql,
    "ds_pipeline_curate" -> pipelineCurateSql,
    "ds_chunk_docs" -> chunkDocsSql,
    "ds_decontaminate" -> decontaminateSql,
    "ds_vocab_topk" -> vocabTopKSql,
    "ds_tfidf_topk" -> tfidfTopKSql,
    "ds_lm_familiarity" -> lmFamiliaritySql,
    "ds_semdedup" -> semDeDupSql,
    "ds_boilerplate_rm" -> boilerplateRemoveSql,
    "ds_sample_stratified" -> sampleStratifiedSql,
    "ds_shard_shuffle" -> shardShuffleSql,
    "ds_pack_sequences" -> packSequencesSql,
    "ds_dedup_incremental" -> dedupIncrementalSql,
    "ds_text_repetition" -> textRepetitionSql,
    "ds_dedup_exact" -> dedupExactSql,
    "ds_dedup_jaccard" -> dedupJaccardSql,
    "ds_dedup_cluster" -> dedupClusterSql,
    "ds_substring_dedup" -> substringDedupSql,
    "ds_dedup_minhash_lsh" -> dedupMinhashLshSql,
    "ds_dedup_simhash" -> dedupSimhashSql,
    "ds_embed_neardup" -> embedNearDupSql,
    "ds_embed_kmeans" -> embedKmeansSql,
    "ds_pq_ann" -> pqAnnSql,
    "ds_ann_cosine_topk" -> annCosineTopKSql,
    "ds_ann_ivf_topk" -> annIvfTopKSql,
    "ds_text_tokens" -> textTokensSql,
    "ds_text_quality" -> textQualitySql,
    "ds_text_langid" -> textLangIdSql,
    "ds_text_fingerprint" -> textFingerprintSql,
    "ds_multimodal_features" -> multimodalFeaturesSql,
    "ds_multimodal_neardup" -> multimodalNearDupSql,
    "stream_window_agg" -> streamWindowAggSql,
    "stream_dedup" -> streamDedupSql,
    "stream_interval_join" -> streamIntervalJoinSql,
    "stream_sessionize" -> streamSessionizeSql,
  )
}

/** flatMapGroupsWithState per-user session state: last event time plus
  * the open session's start and event count (micros). Top-level case
  * classes so Spark's product encoders derive for the state store. */
final case class SessState(lastTs: Long, openStart: Long, openCount: Long)

/** A CLOSED session emitted downstream once a >gap silence follows it. */
final case class SessClosed(user_id: Long, sessionStartUs: Long, nEvents: Long)
