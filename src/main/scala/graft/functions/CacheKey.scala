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

  /** Order-independent corpus content fingerprint: row count + sum of
    * per-row xxhash64 over EXACTLY the columns the cached artifact derives
    * from. The column list is the caller's contract: an under-covering
    * list (ids but not payload) lets a corpus whose content changed under
    * unchanged keys silently serve a stale artifact — the round-15 sf1
    * hash sweep caught the IVF store doing exactly that. One shared
    * definition so the coverage rule is testable instead of re-inlined
    * per site (each per-row hash is reduced mod 2^31-1, so the sum of any
    * realistic corpus cannot overflow the long). */
  def contentFp(df: org.apache.spark.sql.DataFrame,
      cols: org.apache.spark.sql.Column*): String = {
    import org.apache.spark.sql.functions._
    val fpRow = df.agg(count(lit(1)), coalesce(sum(
      pmod(xxhash64(cols: _*), lit(2147483647L))), lit(0L))).head()
    s"${fpRow.getLong(0)}_${fpRow.getLong(1)}"
  }

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

  /** Session-memoized corpus fingerprints. The (count + hash-sum) scan
    * exists ONLY to derive a cache path; per (site, corpus dir) it cannot
    * change within a session (the test corpora are immutable), so queries
    * that share a cached artifact — or call their builder twice — must not
    * pay one full-table driver-blocking scan per call. */
  private val fpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def memoFp(key: String)(compute: => String): String =
    fpCache.computeIfAbsent(key, _ => compute)

  /** Build-once / publish-atomically for a multi-file cache directory —
    * the copurchasePairs tmp+ATOMIC_MOVE discipline as ONE shared helper.
    * If `path` lacks a completed artifact, `build` runs against a fresh
    * sibling tmp dir, a `_complete` marker is stamped INSIDE it, and the
    * whole dir moves into place in one rename. A crashed writer therefore
    * leaves only an orphan tmp (never a half-readable cache), and of two
    * racing sessions the loser's move throws FileAlreadyExists and its tmp
    * is discarded — the previous write-in-place-then-mark pattern let the
    * loser overwrite files the winner's reader was using. A pre-existing
    * dir WITHOUT the marker is a legacy or aborted artifact and is
    * replaced (re-checked immediately before the delete to shrink the
    * race window to the rename itself). */
  def publishDir(path: String)(build: String => Unit): Unit = {
    val target = java.nio.file.Paths.get(path)
    val marker = target.resolve("_complete")
    if (java.nio.file.Files.exists(marker)) return
    val tmp = java.nio.file.Paths.get(
      path + ".tmp." + java.util.UUID.randomUUID())
    build(tmp.toString)
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.createFile(tmp.resolve("_complete"))
    if (java.nio.file.Files.isDirectory(target) &&
        !java.nio.file.Files.exists(marker))
      deleteRecursively(target)
    try java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // rename(2) onto an existing non-empty dir surfaces as ENOTEMPTY
      // (DirectoryNotEmptyException) on Linux, not FileAlreadyExists —
      // catch the FileSystemException family, and treat it as a lost race
      // only if a COMPLETED artifact is now in place; anything else
      // (permissions, cross-device) must still fail loudly
      case e: java.nio.file.FileSystemException =>
        if (java.nio.file.Files.exists(marker)) deleteRecursively(tmp)
        else throw e
    }
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toVector.foreach(deleteRecursively)
      } finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p); ()
  }
}
