package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver records only the last ~2000 chars of bench output (combined
  * stdout+stderr, sbt epilogue included), so the stdout JSON line must stay
  * comfortably under that budget — rounds 1-3 each lost their BENCH artifact
  * to truncation before the line was bounded. These tests fail the build if
  * the pinned headline set grows past the budget or drifts from the catalog.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("headline keys all resolve to catalog queries") {
    val catalog = Queries.all.keySet
    val valid = catalog ++ Bench.portableBench.map(_ + "_portable")
    val unknown = Bench.headline.filterNot(valid.contains)
    assert(unknown.isEmpty, s"headline names not in the catalog: $unknown")
  }

  test("soak r16/r17 growth cells resolve to catalog queries") {
    val cells = Soak.r16Cells ++ Soak.r17Cells
    val missing = cells.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"soak cells not in the catalog: $missing")
    // production-mode sweep: no portable-variant keys belong here
    assert(cells.forall(!_.endsWith("_portable")))
  }

  test("portable-bench keys exist in the catalog") {
    val missing = Bench.portableBench.filterNot(Queries.all.contains)
    assert(missing.isEmpty, s"portable bench names not in the catalog: $missing")
  }

  test("worst-case stdout line fits the driver's tail capture") {
    // worst case: every headline value at 7 chars ("999.999"), total at 8,
    // four-digit queries_run, vs_prev_round at its widest — mirrors
    // Bench.main's interpolation exactly
    val qs = Bench.headline.map(k => "\"" + k + "\":999.999")
      .mkString("{", ",", "}")
    val cells = Bench.controls.map("\"" + _ + "\"").mkString("[", ",", "]")
    val vsPrev =
      """"vs_prev_round":{"common_keys":9999,"prev_sec":9999.999,"cur_sec":9999.999,"ratio":99.999,""" +
        """"ratio_drift_adjusted":99.999,""" +
        s""""controls":{"cells":$cells,"prev_sec":9999.999,"cur_sec":9999.999,"ratio":99.999,"ratio_median":99.999},""" +
        """"baseline":{"file":"BENCH_BASELINE_r99.json","round":99,"git":"0123456789ab"}}"""
    val line =
      s"""{"metric":"total","value":9999.999,"unit":"sec","queries":$qs,"sf":"0.01","queries_run":9999,"failed":999,$vsPrev,"full":"BENCH_FULL.json"}"""
    // 2000-char capture minus ~100 chars of sbt/Spark epilogue printed after
    // the line, minus slack for log lines that may interleave on shutdown
    assert(line.length < 1600,
      s"bench stdout line would be ${line.length} chars — trim the headline set " +
        "or its value precision before it outgrows the driver's tail capture")
  }

  test("vs_prev_round compares only keys green in BOTH rounds") {
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> -1.0, "gone" -> 5.0)
    val cur = Seq("a" -> 2.0, "b" -> -1.0, "c" -> 3.0, "new" -> 9.0)
    val (full, stdout, failed) =
      Bench.renderArtifacts(cur, 2, "0.1", "BENCH_FULL.json", prev)
    // only "a" is present and green on both sides: ratio = 2.0/1.0; no
    // control-panel cell is present, so controls (and the drift-normalized
    // ratio, which needs them) are explicit nulls
    val expect =
      """"vs_prev_round":{"common_keys":1,"prev_sec":1.000,"cur_sec":2.000,"ratio":2.000,""" +
        """"ratio_drift_adjusted":null,"controls":null}"""
    assert(full.contains(expect), full)
    assert(stdout.contains(expect))
    assert(failed == Seq("b"))
    // no prior artifact → explicit null, never a fabricated ratio
    val (full2, _, _) = Bench.renderArtifacts(cur, 2, "0.1", "x.json")
    assert(full2.contains(""""vs_prev_round":null"""))
  }

  test("ratio_drift_adjusted divides out the control panel's drift") {
    // total ratio 2.5, control (q_triangles) ratio 2.0 → a host that
    // drifted 2× accounts for most of the spread; adjusted = 2.5/2.0 = 1.25
    val prev = Map("a" -> 1.0, "q_triangles" -> 1.0)
    val cur = Seq("a" -> 3.0, "q_triangles" -> 2.0)
    val (full, _, _) =
      Bench.renderArtifacts(cur, 1, "0.1", "BENCH_FULL.json", prev)
    assert(full.contains(""""ratio_drift_adjusted":1.250"""), full)
    // the panel members are listed by NAME in-artifact, so a panel edit is
    // visible in the artifact's round diff (r15 verdict #2)
    assert(full.contains(""""controls":{"cells":["q_triangles"],"prev_sec":1.000,"cur_sec":2.000,"ratio":2.000,"ratio_median":2.000}"""), full)
  }

  test("control aggregation is the MEDIAN of per-cell ratios, not the sum-ratio") {
    // three controls: two flat (1.0×), one inflated 10× by a contention
    // burst. Sum-ratio would read (1+1+10)/3 = 4.0 and taint the adjusted
    // total; the median reads 1.0 and the adjustment survives the outlier.
    val prev = Map("a" -> 8.0,
      "q_sort" -> 1.0, "q_join_inner" -> 1.0, "q_triangles" -> 1.0)
    val cur = Seq("a" -> 16.0,
      "q_sort" -> 1.0, "q_join_inner" -> 10.0, "q_triangles" -> 1.0)
    val (full, _, _) =
      Bench.renderArtifacts(cur, 1, "0.1", "BENCH_FULL.json", prev)
    assert(full.contains(""""ratio_median":1.000"""), full)
    // total ratio 28/11 = 2.545; adjusted by the median (1.0), not the
    // sum-ratio (12/3): the real 2× regression of "a" stays visible
    assert(full.contains(""""ratio_drift_adjusted":2.545"""), full)
  }

  test("controls panel members resolve to catalog queries and none is /tmp-cache-backed") {
    val missing = Bench.controls.filterNot(Queries.all.contains)
    assert(missing.isEmpty, s"control cells not in the catalog: $missing")
    // the selection rule, pinned: the known /tmp-cache-backed cells (they
    // read CacheKey-pathed disk stores whose rebuild cost lands inside a
    // timed window on a cold host) must never re-enter the panel — q_bpe
    // did exactly that in r15 and dragged the adjustment to 0.853
    val cacheBacked = Set("q_copurchase", "q_hits", "q_related_items",
      "q_bpe", "q_wordcount_file", "q_distinct_kmv", "q_heavy_hitters",
      "q_hist_persist", "q_inverted_index", "q_bm25", "q_ann_ivf_persist",
      "q_ann_ivf_sharded", "q_digest_persist")
    // EVERY streaming twin is cache-backed too: runStream builds/reads
    // the content-fingerprinted 'streamsplit' store under /tmp, so a
    // cold-/tmp or SPARK_GRAFT_ONLY window pays the split rebuild inside
    // the timed cell — r16 shipped q_stream_tumbling in the panel and
    // this set's omission of stream cells is why the spec missed it
    def violates(n: String) = cacheBacked.contains(n) || n.startsWith("q_stream_")
    val violations = Bench.controls.filter(violates)
    assert(violations.isEmpty, s"cache-backed cells in the panel: $violations")
    // second selection rule (r17): no persist/localCheckpoint in a control
    // cell's path — a session-level caching/AQE change (e.g. the r17
    // cached-plan-AQE default) structurally moves every persisting cell,
    // so such a cell measures the code change, not the host, and corrupts
    // ratio_drift_adjusted across that round's boundary. Known persisting
    // cells pinned here; panel edits must keep clear of them.
    val persisting = Set("q_char_lm", "q_ngram_lm", "q_cluster_split",
      "q_pagerank", "q_pagerank_weighted", "q_pagerank_delta", "q_kmeans",
      "q_connected_components", "q_transitive_closure", "q_label_prop",
      "q_kcore", "q_fuzzy_join", "q_perplexity_tiers", "q_e2e_curation",
      "q_dedup_incremental", "q_semantic_dedup", "q_iterate", "q_sssp",
      "q_ppr", "q_er_clusters", "q_dedup_clusters", "q_link_predict",
      "q_quality_classifier", "q_dsir")
    val persistViolations = Bench.controls.filter(persisting.contains)
    assert(persistViolations.isEmpty,
      s"persisting cells in the panel: $persistViolations")
    // STALENESS RISK (r17 advice): both denylists above are hand-maintained
    // — a NEW catalog query that persists or caches but is absent here
    // passes silently, so the guard is only as fresh as the last audit.
    // Keep them at least rename-consistent with the catalog, so a renamed
    // or deleted cell can't linger and give false confidence:
    val staleDeny = (cacheBacked ++ persisting).filterNot(Queries.all.contains)
    assert(staleDeny.isEmpty, s"denylist names not in the catalog: $staleDeny")
  }

  test("parseGraftConf keeps k=v pairs and drops malformed tokens loudly") {
    assert(Bench.parseGraftConf(None) == Nil)
    assert(Bench.parseGraftConf(Some("a=1;b = x=y ;;oops;=v")) ==
      Seq(("a", "1"), ("b", "x=y")))
  }

  test("resolvePrev prefers the newest BENCH_BASELINE snapshot and names it") {
    // run in a temp cwd-independent way: baselineIdentity reads the file
    // directly, so exercise it on a synthetic snapshot
    val tmp = java.nio.file.Files.createTempFile("BENCH_BASELINE_r15", ".json")
    java.nio.file.Files.write(tmp,
      """{"baseline_round":15,"baseline_git":"edd405c","metric":"total","queries":{"q_a":1.0},"sf":"0.1"}"""
        .getBytes("UTF-8"))
    val id = Bench.baselineIdentity(tmp.toString)
    assert(id.contains(""""round":15"""), id)
    assert(id.contains(""""git":"edd405c""""), id)
    assert(id.contains(tmp.getFileName.toString), id)
    // a legacy BENCH_FULL baseline still gets named by file
    val legacy = java.nio.file.Files.createTempFile("bench_legacy", ".json")
    java.nio.file.Files.write(legacy,
      """{"metric":"total","queries":{"q_a":1.0},"sf":"0.1"}""".getBytes("UTF-8"))
    val lid = Bench.baselineIdentity(legacy.toString)
    assert(lid.contains(legacy.getFileName.toString) && !lid.contains("round"),
      lid)
    // the identity fragment lands inside vs_prev_round verbatim
    val (full, _, _) = Bench.renderArtifacts(Seq("q_a" -> 2.0), 1, "0.1",
      "x.json", Map("q_a" -> 1.0), id)
    assert(full.contains(""""baseline":{"file":""""), full)
    assert(full.contains(""""round":15"""), full)
    java.nio.file.Files.delete(tmp); java.nio.file.Files.delete(legacy)
    // the repo itself carries the r15 snapshot: resolvePrev from the repo
    // root must pick a BENCH_BASELINE_r*.json, never the overwritable
    // BENCH_FULL.json convention path (the r14/r15 intra-round bug)
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get("BENCH_BASELINE_r15.json"))) {
      val (path, qs, ident) = Bench.resolvePrev("0.1")
      // r17: the snapshot search anchors at the repo root (cwd-upward
      // walk), so the resolved path may be absolute — the NAME proves the
      // snapshot tier was chosen over the convention path
      assert(java.nio.file.Paths.get(path).getFileName.toString
        .startsWith("BENCH_BASELINE_r"), path)
      assert(qs.nonEmpty, "snapshot must parse")
      assert(ident.contains(""""round":"""), ident)
    }
  }

  test("readPrevQueries parses our own BENCH_FULL format and misses safely") {
    val tmp = java.nio.file.Files.createTempFile("bench_prev", ".json")
    val body =
      """{"metric":"total","value":3.5,"unit":"sec","repeat":2,"failed":1,"failed_queries":["q_b"],"vs_prev_round":null,"queries":{"q_a":1.25,"q_b":-1.0,"q_c":2.25},"sf":"0.1"}"""
    java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
    val m = Bench.readPrevQueries(tmp.toString)
    assert(m == Map("q_a" -> 1.25, "q_b" -> -1.0, "q_c" -> 2.25))
    assert(Bench.readPrevQueries(tmp.toString, "0.1") == m,
      "matching sf must not suppress the comparison")
    assert(Bench.readPrevQueries(tmp.toString, "0.001").isEmpty,
      "a prior artifact at a different scale factor must be ignored")
    // an artifact MISSING its sf field is a mismatch, not a vacuous match —
    // cross-scale ratios must never come out of an untagged file
    val noSf = java.nio.file.Files.createTempFile("bench_prev_nosf", ".json")
    java.nio.file.Files.write(noSf,
      """{"metric":"total","queries":{"q_a":1.25}}""".getBytes("UTF-8"))
    assert(Bench.readPrevQueries(noSf.toString, "0.1").isEmpty,
      "missing sf field must suppress the comparison")
    assert(Bench.readPrevQueries(noSf.toString) == Map("q_a" -> 1.25),
      "no requested sf still parses (caller opted out of the guard)")
    java.nio.file.Files.delete(noSf)
    assert(Bench.readPrevQueries("/nonexistent/path.json").isEmpty)
    java.nio.file.Files.delete(tmp)
  }
}
