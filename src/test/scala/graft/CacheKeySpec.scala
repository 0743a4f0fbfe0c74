package graft

import graft.functions.CacheKey
import org.scalatest.funsuite.AnyFunSuite

class CacheKeySpec extends AnyFunSuite {

  test("cache key is parameter-complete: any param change builds a fresh path") {
    val base = CacheKey.path("copurchase", 1, "sf0.01", Seq(20, 2L), "100_42")
    // same inputs -> same path (the build-once/query-many reuse contract)
    assert(base == CacheKey.path("copurchase", 1, "sf0.01", Seq(20, 2L), "100_42"))
    // a parameter edit (basket cap, min count) MUST change the path —
    // this is the round-8 staleness hazard: pre-fix, changing maxBasketSize
    // silently reused the old artifact while the oracle recomputed fresh
    assert(base != CacheKey.path("copurchase", 1, "sf0.01", Seq(21, 2L), "100_42"))
    assert(base != CacheKey.path("copurchase", 1, "sf0.01", Seq(20, 3L), "100_42"))
    // a logic-version bump (derivation code changed shape) gets a fresh path
    assert(base != CacheKey.path("copurchase", 2, "sf0.01", Seq(20, 2L), "100_42"))
    // a regenerated corpus (new fingerprint) gets a fresh path
    assert(base != CacheKey.path("copurchase", 1, "sf0.01", Seq(20, 2L), "101_42"))
    // a different scale tag gets a fresh path
    assert(base != CacheKey.path("copurchase", 1, "sf0.1", Seq(20, 2L), "100_42"))
  }

  test("cache key tokens are filesystem-safe and unambiguous") {
    val p = CacheKey.path("histstore", 1, "sf0.01", Seq(256, 900.0, 105000.0),
      "7_9")
    // NB: Scala unifies the mixed literal Seq to Seq[Double], so the Int
    // bins renders as 256.0 — deterministic, which is all the key needs
    assert(p == "/tmp/graft_histstore_v1_256.0_900.0_105000.0_sf0.01_7-9")
    // strings with separators are sanitized, not passed through
    val q = CacheKey.path("invidx", 1, "tag", Seq("doc id", "a/b"), "1_2")
    assert(!q.drop("/tmp/".length).contains("/") && !q.contains(" "))
    // param-free form has no dangling separator
    assert(CacheKey.path("wordcount", 1, "t", Nil, "1_2")
      == "/tmp/graft_wordcount_v1_t_1-2")
  }

  test("cache key is injective: axis values cannot smuggle the separator") {
    // pre-fix, sfTag/fp passed through raw, so distinct (sfTag, fp) pairs
    // could render the SAME path by moving an '_' across the boundary
    assert(CacheKey.path("k", 1, "a_b", Nil, "c")
      != CacheKey.path("k", 1, "a", Nil, "b_c"))
    // same for a param/sfTag boundary slide
    assert(CacheKey.path("k", 1, "b_t", Seq("a"), "f")
      != CacheKey.path("k", 1, "t", Seq("a_b"), "f"))
  }
}
