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

  test("portable-bench keys exist in the catalog") {
    val missing = Bench.portableBench.filterNot(Queries.all.contains)
    assert(missing.isEmpty, s"portable bench names not in the catalog: $missing")
  }

  test("worst-case stdout line fits the driver's tail capture") {
    // worst case: every headline value at 7 chars ("999.999"), total at 8,
    // four-digit queries_run — mirrors Bench.main's interpolation exactly
    val qs = Bench.headline.map(k => "\"" + k + "\":999.999")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":9999.999,"unit":"sec","queries":$qs,"sf":"0.01","queries_run":9999,"failed":999,"full":"BENCH_FULL.json"}"""
    // 2000-char capture minus ~100 chars of sbt/Spark epilogue printed after
    // the line, minus slack for log lines that may interleave on shutdown
    assert(line.length < 1600,
      s"bench stdout line would be ${line.length} chars — trim the headline set " +
        "or its value precision before it outgrows the driver's tail capture")
  }
}
