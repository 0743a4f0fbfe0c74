package graft.functions

/** Canonical key builder for the build-once/query-many /tmp caches
  * (co-purchase pairs, wordcount text, inverted index, sketch/hist
  * stores, IVF index, stream splits).
  *
  * A cache path must change whenever ANY input to the cached artifact
  * changes, or one stale dir silently poisons every consumer while the
  * oracles recompute fresh. Three axes are folded into the name:
  *
  *   - `kind` + `version` — a per-site logic tag, bumped when the
  *     derivation code changes shape (new dedup rule, different split
  *     ordering) without any parameter or corpus change;
  *   - `params` — the operator parameter tuple (basket cap, min count,
  *     nlist, bins, ...) that previously was baked into the code but NOT
  *     the path, so a parameter edit reused the old artifact;
  *   - `fp` — the corpus content fingerprint (row count + order-independent
  *     hash sum) computed by the caller.
  *
  * Values are rendered with a stable sanitizer so doubles, strings and
  * negative numbers survive as filesystem-safe tokens. Publishing stays
  * the caller's job (atomic same-filesystem rename or completion marker).
  */
object CacheKey {
  private def token(v: Any): String =
    v.toString.replaceAll("[^0-9a-zA-Z.]", "-")

  /** `/tmp/graft_{kind}_v{version}[_{p1}_{p2}...]_{sfTag}_{fp}`
    *
    * Every variable axis — params, sfTag AND fp — is rendered through
    * [[token]], whose output never contains the `_` separator, so the
    * rendered key is injective per (kind, version, param arity): distinct
    * (sfTag, fp) pairs can no longer collide by smuggling separators
    * (e.g. sfTag "a_b"+fp "c" vs sfTag "a"+fp "b_c"). `kind` is a
    * per-site string literal, never data-derived. */
  def path(kind: String, version: Int, sfTag: String, params: Seq[Any],
      fp: String): String = {
    val p = if (params.isEmpty) "" else params.map(token).mkString("_", "_", "")
    s"/tmp/graft_${kind}_v$version${p}_${token(sfTag)}_${token(fp)}"
  }
}
