package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every catalog query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Timing discipline: one JVM+session warmup query first (JIT, codegen
  * cache, FS metadata), then each query end-to-end (plan → execute →
  * count) — the count() action materializes every operator but avoids
  * driver-side result transfer costs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    // GRAFT_MASTER/GRAFT_JARS mirror graft.Verify's multi-JVM overrides
    // (e.g. local-cluster[2,8,4096] + the sbt-package jar) so the SAME
    // harness that times local[32] can time a real two-executor-JVM deploy
    // — serialization/broadcast costs are invisible in one JVM
    val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-optimize CACHED plan materialization too (off by default
      // for partitioning-compat only): catalog queries persist intermediates
      // (signature tables, occurrence caches, loop inputs), and without this
      // every persist materializes at the session width regardless of size —
      // q_perplexity_tiers 496→29 tasks, q_digest_persist 468→32 at sf0.1,
      // and at 100 TB the same flag sizes cached partitions to AQE's
      // advisory bytes instead of a fixed width (guide §2.2/§6). Loop inputs
      // whose co-partitioning must survive caching pin it explicitly
      // (Graph.scala repartition(width, col) notes). Oracle re-verified
      // 252/252 with the flag on (r17 optimization round).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      // A/B lever for the narrow-input rebalance (operators.Scale.fanOut);
      // unset = library default (on)
      .config("graft.fanout.enabled", sys.env.getOrElse("GRAFT_FANOUT", "true"))
    // GRAFT_CONF="k=v;k2=v2": extra session conf for same-window config
    // A/Bs (the guide §1 discipline: measure a candidate config against
    // the unset default in one window, then bake the winner into the code
    // where the driver's own runs pick it up). The driver never sets it.
    val builder1 = parseGraftConf(sys.env.get("GRAFT_CONF"))
      .foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
    val spark = sys.env.get("GRAFT_JARS")
      .fold(builder1)(j => builder1.config("spark.jars", j))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: scan + shuffle + codegen on the biggest table
    Queries.q1_agg(spark, sfDir).count()

    // SPARK_GRAFT_REPEAT=N runs the WHOLE catalog N times (default 2) and
    // reports each query's MIN across passes — the right estimator under
    // the bursty host interference observed on shared runners (a burst only
    // ever ADDS time). Round 4 proved back-to-back per-query repeats are
    // NOT enough: BENCH_r04 recorded a contiguous alphabetical block
    // (q_filter…q_kmeans, ~15 queries) uniformly 2.4–4.5× slower than both
    // r3 and a clean same-code rerun — a ~40 s interference burst covers
    // both adjacent repeats of every query inside it. Catalog-level passes
    // put ~a full catalog runtime between a query's two runs, so one burst
    // can poison at most one of them. Same total work as per-query
    // repeats; first pass still pays plan/codegen cost, so the min stays
    // the query's steady-state time.
    val repeat =
      math.max(1, sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(2))

    def once(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      // the timed window CLOSES before cache teardown: a persisted-result
      // query must not be billed for unpersisting its own blocks (that cost
      // lands in every pass, so min-across-passes cannot remove it)
      val elapsed = (System.nanoTime() - t0) / 1e9
      // several catalog queries (iteration fixpoints, dedup pipelines)
      // return their PERSISTED result; over a 70+-query catalog those
      // caches accumulate into real memory pressure that bleeds into later
      // queries' timings — drop the whole cache after every run. Each pass
      // is therefore COLD per query (no warm-cache min; round-4 repeats
      // shared a query's caches, flattering the persisted-result queries).
      spark.catalog.clearCache()
      // failures are marked -1.0, never reported as a (fast) success
      if (ok) elapsed else -1.0
    }

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run to a subset — an iteration
    // aid while tuning a single query; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))

    // one catalog pass: production mode first (portableMode false — the
    // xxhash64 default paths a user ships), then the hash-mode-sensitive
    // queries again in portable (oracle) mode as distinct `_portable` keys,
    // so both modes stay observable round-over-round
    val prodEntries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
    val portEntries = Bench.portableBench
      .filter(n => selected(n + "_portable"))
      .map(n => (n + "_portable", SparkEntry.queries(n)))
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def record(name: String, t: Double): Unit = acc.get(name) match {
      case Some(prev) if prev < 0 || t < 0 => acc(name) = -1.0
      case Some(prev) => acc(name) = math.min(prev, t)
      case None => acc(name) = t
    }
    for (_ <- 1 to repeat) {
      prodEntries.foreach { case (name, fn) => record(name, once(name, fn)) }
      Queries.portableMode = true
      portEntries.foreach { case (name, fn) => record(name, once(name, fn)) }
      Queries.portableMode = false
    }
    val results = acc.toSeq
    val sf = sfDir.split("/").last.stripPrefix("sf")
    // BENCH_FULL.json is the committed sf0.1 convention (round-over-round
    // comparisons read it assuming that scale); a run at any other SF that
    // didn't name its own SPARK_GRAFT_FULL_OUT routes to a scale-suffixed
    // file instead of silently overwriting the headline artifact (a round-10
    // sf0.001 run did exactly that and read as a false 31% speedup)
    val fullOutRaw = sys.env.getOrElse("SPARK_GRAFT_FULL_OUT", "BENCH_FULL.json")
    val fullOut =
      if (fullOutRaw == "BENCH_FULL.json" && only.nonEmpty) {
        // a SPARK_GRAFT_ONLY iteration run must never overwrite the
        // committed full-catalog artifact with a partial one — the next
        // full bench's vs_prev_round would compare against 1 key
        val redirected = "BENCH_FULL_subset.json"
        System.err.println(
          s"[bench] SPARK_GRAFT_ONLY subset run; writing $redirected " +
            "instead of the committed BENCH_FULL.json")
        redirected
      } else if (fullOutRaw == "BENCH_FULL.json" && sf != "0.1") {
        val redirected = s"BENCH_FULL_sf$sf.json"
        System.err.println(
          s"[bench] sf=$sf is not the BENCH_FULL.json convention (sf0.1); writing $redirected")
        redirected
      } else fullOutRaw
    val (prevPath, prevQueries, baselineId) = resolvePrev(sf)
    System.err.println(s"[bench] vs_prev_round baseline: $prevPath")
    val (fullLine, stdoutLine, failedNames) =
      renderArtifacts(results, repeat, sf, fullOut, prevQueries, baselineId)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(fullOut),
      fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (failedNames.nonEmpty)
      System.err.println(
        s"[bench] ${failedNames.size} queries FAILED: ${failedNames.mkString(", ")}")
    // the one-line contract JSON, twice: stdout (now unprefixed —
    // run/outputStrategy in build.sbt bypasses sbt's "[info] " logger,
    // which made the driver's extractor read "parsed": null two rounds
    // running) and a file next to BENCH_FULL.json, so the extractor no
    // longer depends on log formatting at all. The file inherits fullOut's
    // subset/scale redirection: a SPARK_GRAFT_ONLY or off-scale run must
    // not overwrite the committed full-catalog line either.
    val lineOut =
      if (fullOut.contains("BENCH_FULL")) fullOut.replace("BENCH_FULL", "BENCH_LINE")
      else fullOut + ".line.json"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(lineOut),
      (stdoutLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(stdoutLine)
    spark.stop()
  }

  /** GRAFT_CONF="k=v;k2=v2" → pairs; malformed tokens (no '=') are warned
    * about LOUDLY instead of silently dropped — a typo'd A/B lever would
    * otherwise measure the default config while the operator believes the
    * candidate applied (r17 advice). Shared by Profile/PlanDump. */
  def parseGraftConf(env: Option[String]): Seq[(String, String)] =
    env.map(_.split(";").toSeq).getOrElse(Nil).filter(_.trim.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => Some((k.trim, v.trim))
        case _ =>
          System.err.println(
            s"[graft] WARNING: GRAFT_CONF token '$kv' is not k=v — IGNORED " +
              "(the A/B would silently measure the default config)")
          None
      }
    }

  /** Renders both bench artifacts from the timing results; pure so the
    * failure-accounting contract is unit-testable (GatesSpec).
    *
    * Returns (BENCH_FULL.json body, bounded stdout line, failed names).
    *
    * Precision/size discipline: millisecond precision on stdout keeps the
    * whole JSON line short enough to survive the driver's bounded ~2000-char
    * tail capture (full-precision doubles truncated the line's head in
    * rounds 1-3); the stdout line carries only the pinned `headline` subset
    * plus the catalog total, while BENCH_FULL.json carries every query at
    * full precision. LOUD failure accounting (round-6 verdict #3): a query
    * recording -1.0 surfaces as an explicit `failed` count in BOTH artifacts
    * and by name in `failed_queries` — a total that silently excludes
    * erroring queries would read as "all green" while the catalog shrinks.
    */
  /** Resolve the previous-round baseline this run's `vs_prev_round`
    * compares against. Preference order:
    *
    *   1. `SPARK_GRAFT_PREV` — an explicit override (iteration runs,
    *      forensic re-chains);
    *   2. the newest committed `BENCH_BASELINE_r*.json` snapshot — written
    *      ONCE at round close by tools/snapshot_baseline.sh from a named
    *      commit, never rewritten;
    *   3. the legacy convention path (whatever sits at BENCH_FULL.json /
    *      BENCH_FULL_sf$sf.json).
    *
    * The snapshot tier exists because the convention path is overwritten
    * by every run: two consecutive driver rounds "compared" against a
    * same-round artifact that had already replaced the committed one
    * (r14/r15 verdicts, task 1). Snapshots are sf0.1 round boundaries, so
    * other scale factors skip straight to their own convention path.
    *
    * Returns (path, parsed queries, identity JSON fragment). The identity
    * names the baseline file and, when the snapshot recorded them, its
    * round and git hash — so the artifact itself proves WHICH boundary it
    * measured, checkable without forensics. */
  def resolvePrev(sf: String): (String, Map[String, Double], String) = {
    val explicit = sys.env.get("SPARK_GRAFT_PREV")
    val snapshot =
      if (explicit.isDefined || sf != "0.1") None
      else {
        val re = "BENCH_BASELINE_r(\\d+)\\.json".r
        // anchor the search at the repo root, not the process cwd: a
        // bench launched from elsewhere would otherwise silently skip the
        // snapshot tier and chain against the overwritable BENCH_FULL.json
        // convention path — the exact intra-round-baseline bug the tier
        // fixes (r16 advice). Walk cwd-upward to the first directory that
        // holds either a snapshot or a .git marker.
        val anchors = Iterator.iterate(
            new java.io.File(".").getAbsoluteFile.getParentFile)(_.getParentFile)
          .takeWhile(_ != null).take(16).toSeq
        val root = anchors.find { d =>
          Option(d.listFiles()).getOrElse(Array.empty).exists(f =>
            re.pattern.matcher(f.getName).matches() || f.getName == ".git")
        }
        val found = root.flatMap { d =>
          Option(d.listFiles()).getOrElse(Array.empty)
            .toSeq
            .collect { case f if re.pattern.matcher(f.getName).matches() =>
              val re(r) = f.getName: @unchecked
              (r.toInt, f.getPath)
            }
            .sortBy(-_._1).headOption.map(_._2)
        }
        if (found.isEmpty)
          // visible, not silent: the fallback path is overwritten by every
          // run, so a missing snapshot at the measured scale is a setup bug
          System.err.println("[graft-bench] WARNING: no BENCH_BASELINE_r*.json" +
            s" found from ${new java.io.File(".").getAbsolutePath} upward —" +
            " falling back to the overwritable BENCH_FULL.json convention path")
        found
      }
    val path = explicit.orElse(snapshot).getOrElse(
      if (sf == "0.1") "BENCH_FULL.json" else s"BENCH_FULL_sf$sf.json")
    (path, readPrevQueries(path, sf), baselineIdentity(path))
  }

  /** JSON fragment naming the baseline: its file name plus the
    * `baseline_round`/`baseline_git` fields the snapshot tool injected
    * (absent for a legacy BENCH_FULL baseline — the file name alone still
    * records what this run chained against). */
  def baselineIdentity(path: String): String = {
    // JSON-escape: an explicit SPARK_GRAFT_PREV path containing a quote or
    // backslash must not render the artifact invalid (r16 advice)
    val name = java.nio.file.Paths.get(path).getFileName.toString
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val extra = try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      val r = "\"baseline_round\":(\\d+)".r.findFirstMatchIn(txt)
        .map(m => s""","round":${m.group(1)}""").getOrElse("")
      val g = "\"baseline_git\":\"([0-9a-fA-F]+)\"".r.findFirstMatchIn(txt)
        .map(m => s""","git":"${m.group(1)}"""").getOrElse("")
      r + g
    } catch { case _: Exception => "" }
    s""""baseline":{"file":"$name"$extra}"""
  }

  /** Parse the `queries` map out of a prior BENCH_FULL.json (our own flat
    * format: numeric values, no nesting). Empty on any miss — a first run
    * or a format change must not fail the bench — and empty when the prior
    * artifact's `sf` differs from this run's (cross-scale "ratios" are
    * meaningless). */
  def readPrevQueries(path: String, sf: String = ""): Map[String, Double] =
    try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      // exists, not forall: an artifact MISSING its sf field must be
      // treated as a scale mismatch (a vacuous pass here would compare,
      // e.g., sf0.001 iteration times against committed sf0.1 numbers)
      val sfOk = sf.isEmpty ||
        "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(txt).exists(_.group(1) == sf)
      val qIdx = txt.indexOf("\"queries\":{")
      if (qIdx < 0 || !sfOk) Map.empty
      else {
        val body = txt.substring(qIdx + 11, txt.indexOf('}', qIdx))
        "\"([A-Za-z0-9_]+)\":(-?[0-9.Ee+-]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Exception => Map.empty }

  def renderArtifacts(results: Seq[(String, Double)], repeat: Int, sf: String,
      fullOut: String, prevQueries: Map[String, Double] = Map.empty,
      baselineId: String = "")
      : (String, String, Seq[String]) = {
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String =
      if (v < 0) "-1.0"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullJson = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1.0"
      else String.format(java.util.Locale.ROOT, "%.6f", Double.box(v)))
    }.mkString("{", ",", "}")
    val failedNames = results.collect { case (k, v) if v < 0 => k }
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // mechanical round-over-round comparison on keys PRESENT AND GREEN in
    // both artifacts — new queries and failures on either side are excluded
    // so the ratio measures the same work, not catalog growth
    val byName = results.toMap
    val common = prevQueries.keySet.intersect(byName.keySet).toSeq
      .filter(k => prevQueries(k) >= 0 && byName(k) >= 0)
    val vsPrev =
      if (common.isEmpty) """"vs_prev_round":null"""
      else {
        val prevSum = common.map(prevQueries).sum
        val curSum = common.map(byName).sum
        val ratio = if (prevSum > 0) curSum / prevSum else -1.0
        // drift attribution carried IN the artifact (the round-12/13 house
        // method, made mechanical): a fixed panel of long-stable cells; if
        // their ratio moves with the total, the spread is host drift, not
        // code — a genuine regression moves changed cells but not controls
        val controlPanel = controls.filter(common.contains)
        // Per-cell control ratios, aggregated as the MEDIAN rather than the
        // sum-ratio: the r17/r18 adjudication of the nx_* "regressions"
        // proved this host's contention is NON-uniform at minute scale
        // (identical jobs/stages/tasks/shuffle-bytes cells swung 1.3×–2.6×
        // leg-to-leg within one A/B/B/A window), so one inflated member
        // could drag a sum-ratio panel and taint every adjusted reading;
        // the median ignores outlier members by construction. The sum-based
        // "ratio" stays in the artifact for cross-round continuity.
        val perCellRatios = controlPanel
          .filter(k => prevQueries(k) > 0)
          .map(k => byName(k) / prevQueries(k)).sorted
        val controlRatio =
          if (perCellRatios.isEmpty) -1.0
          else {
            val n = perCellRatios.size
            if (n % 2 == 1) perCellRatios(n / 2)
            else (perCellRatios(n / 2 - 1) + perCellRatios(n / 2)) / 2.0
          }
        val ctl =
          if (controlPanel.isEmpty) """"controls":null"""
          else {
            val cp = controlPanel.map(prevQueries).sum
            val cc = controlPanel.map(byName).sum
            val sumRatio = if (cp > 0) cc / cp else -1.0
            val names = controlPanel.map("\"" + _ + "\"")
              .mkString("[", ",", "]")
            s""""controls":{"cells":$names,"prev_sec":${fmt(cp)},"cur_sec":${fmt(cc)},"ratio":${fmt(sumRatio)},"ratio_median":${fmt(controlRatio)}}"""
          }
        // drift-NORMALIZED ratio: total ratio divided by the control
        // panel's (median) ratio, so host drift (which moves both alike)
        // cancels and a machine threshold on this one field flags real
        // regressions even on a drifting host (r13 verdict #7)
        val adj =
          if (controlRatio > 0 && ratio > 0)
            s""""ratio_drift_adjusted":${fmt(ratio / controlRatio)}"""
          else """"ratio_drift_adjusted":null"""
        val base = if (baselineId.isEmpty) "" else "," + baselineId
        s""""vs_prev_round":{"common_keys":${common.size},"prev_sec":${fmt(prevSum)},"cur_sec":${fmt(curSum)},"ratio":${fmt(ratio)},$adj,$ctl$base}"""
      }
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","repeat":$repeat,"failed":${failedNames.size},"failed_queries":$failedJson,$vsPrev,"queries":$fullJson,"sf":"$sf"}"""
    val qs = headline.filter(byName.contains)
      .map(k => "\"" + k + "\":" + fmt(byName(k)))
      .mkString("{", ",", "}")
    val stdoutLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sf","queries_run":${results.size},"failed":${failedNames.size},$vsPrev,"full":"$fullOut"}"""
    (fullLine, stdoutLine, failedNames)
  }

  /** Drift-controls panel for `vs_prev_round.ratio_drift_adjusted`.
    *
    * Selection rule: **no /tmp-cache-backed cell** — a control that can
    * pay a disk-cache rebuild inside its timed window measures cache
    * temperature, not host drift. Round 15 proved the blind spot is
    * active: q_bpe sat in the panel, inflated 2.7× on a cold-/tmp driver
    * run, and dragged the adjustment to a flattering 0.853 (r15 verdict
    * #2). That rule excludes q_copurchase/q_hits/q_related_items (all
    * read the copurchase /tmp store — a cold first pass rebuilds it),
    * q_bpe, and EVERY q_stream_* cell: all streaming twins route through
    * runStream's content-fingerprinted 'streamsplit' store under /tmp,
    * so on a cold /tmp — or a SPARK_GRAFT_ONLY run where no earlier cell
    * warmed the shared split dir — the split rebuild lands inside the
    * timed window, the exact q_bpe failure mode (the r16 panel shipped
    * with q_stream_tumbling in violation of its own rule; r16 advice).
    * Session-local persist/unpersist within a query is fine because
    * clearCache() resets it between cells anyway.
    *
    * Second selection rule (r17, the optimization round): **no
    * persist/localCheckpoint in the cell's path** — a drift control must
    * be insensitive to CODE/CONFIG changes, and the r17 cached-plan-AQE
    * session default (canChangeCachedPlanOutputPartitioning) structurally
    * sped up every persisting cell. The r16 panel held five such cells
    * (q_char_lm, q_ngram_lm, q_cluster_split, q_pagerank all persist),
    * so across the r17 boundary the old panel measured the OPTIMIZATION
    * instead of the host and `ratio_drift_adjusted` over-penalized the
    * total. All current members were verified structurally neutral to the
    * flag (identical jobs/stages/tasks/shuffle bytes under both settings,
    * graft.Profile, r17 notes).
    *
    * Shape diversity, so the panel moves with the host across regimes
    * rather than with any one subsystem:
    *   nx_q1        — codegen scan→project floor (physically cannot
    *                  regress from a plan change; pure host signal)
    *   q1_agg       — scan + hash-aggregate exchange
    *   q_sort       — global sort (range exchange)
    *   q_join_inner — shuffle equi-join
    *   q_tpch1      — decimal-heavy wide aggregation (ALU throughput)
    *   q_multimodal — per-row binary decode (narrow executor compute)
    *   q_triangles  — shuffle-heavy self-join
    * (No streaming member: the micro-batch lifecycle regime is
    * structurally /tmp-cache-backed here, so it cannot serve as a drift
    * control.)
    *
    * The rendered artifact lists the member NAMES in
    * `vs_prev_round.controls.cells`, so a future panel edit is visible
    * in the round diff of the artifact itself. */
  val controls: Seq[String] = Seq(
    "nx_q1", "q1_agg", "q_sort", "q_join_inner", "q_tpch1",
    "q_multimodal", "q_triangles")

  /** Stdout headline set — a pinned, stable subset (the expensive and
    * family-representative queries) so the driver's bounded tail capture
    * always holds the complete JSON line and round-over-round deltas compare
    * the same keys. BenchFormatSpec asserts the worst-case line length stays
    * under the capture budget; grow this list only with that test green.
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_sort", "q_join_inner", "q_join_broadcast",
    "q_window_sliding", "q_window_session", "q_interval_join", "q_asof_join",
    "q_connected_components", "q_transitive_closure", "q_pagerank",
    "q_pagerank_delta", "q_triangles", "q_kmeans",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_verified",
    "q_dedup_incremental", "q_semantic_dedup", "q_dedup_simhash",
    "q_ngram_jaccard", "q_cosine_topk", "q_ann_lsh", "q_ann_ivf",
    "q_embedding_neardup", "q_text_profile", "q_pipeline_clean",
    "q_bm25", "q_multimodal", "nx_q5", "nx_q8",
    "q_tpch2", "q_ngram_lm", "q_perplexity_tiers",
    "q_dedup_minhash_portable", "q_ann_lsh_portable")

  /** Queries re-timed under portable (oracle-recomputable) hashing, reported
    * as `<name>_portable` keys so both hash modes stay observable per round.
    */
  val portableBench: Seq[String] = Seq(
    "q_dedup_minhash", "q_dedup_simhash", "q_ann_lsh", "q_embedding_neardup",
    "q_dedup_incremental", "q_semantic_dedup", "q_distinct_kmv",
    "q_heavy_hitters", "q_dup_spans", "q_winnow", "q_dsir")
}
