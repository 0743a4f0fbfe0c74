package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four families, each designed for the 100 TB shape:
  *  - exact: hash-groupBy on a content digest — one shuffle of (digest, id).
  *  - MinHash+LSH: shingle → 64 minhashes → 16 bands → bucket join. Only
  *    bucket-colliding pairs are compared; the candidate set (not the corpus)
  *    is quadratic. No UDFs anywhere: hashing runs in native hot-path
  *    expressions (graft.plans: WordShingles, MinHashRowExpr, ArrayMatchCount)
  *    or closed-form Catalyst expressions (xxhash64 band keys).
  *  - SimHash: 64-bit signature via per-bit vote of token hashes; near-dups
  *    are pairs within small Hamming distance, found via 4×16-bit band join.
  *  - exact n-gram Jaccard: the verification step — set overlap of word
  *    n-grams for candidate pairs.
  */
object Dedup {

  /** Cross-engine-portable 60-bit hash: the first 15 hex chars of md5 read as
    * an integer. Bit-identical in DuckDB as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`, which is what makes the
    * probabilistic dedup queries oracle-checkable: the oracle recomputes the
    * very same signatures instead of trusting a rows-only count. xxhash64
    * stays the default for production paths (faster); the algorithm is
    * identical either way. */
  def portableHash60(c: Column): Column =
    graft.plans.TextExpressions.portableHash60(c)

  /** The composed-builtin formulation of [[portableHash60]] — kept as the
    * readable specification of the hash (TextExprSpec pins the native
    * expression equal to it value-for-value). */
  def portableHash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Modulus for portable affine minhash permutations: 2^31-1 (prime).
    * Keeping h, a, b < 2^31 bounds every product under 2^62 — no wraparound,
    * so the arithmetic is exact in any engine regardless of ANSI/overflow
    * semantics. */
  val PortableP = 2147483647L

  /** Per-permutation affine constants (a_i, b_i), identical literals on the
    * Spark and oracle-SQL sides. */
  def portablePermConsts(i: Int): (Long, Long) = {
    val a0 = (2654435761L * (i + 1)) % PortableP
    val a = if (a0 == 0L) 1L else a0
    val b = (1013904223L * (i + 1)) % PortableP
    (a, b)
  }

  /** Word n-gram (shingle) array. Empty result when the doc has < n words.
    * Native single-pass expression (graft.plans.WordShingles) — the composed
    * split→transform→slice→concat_ws form below walks four interpreted
    * higher-order functions per document and was the dominant cost of the
    * whole minhash family; TextExprSpec pins the two equal string-for-string. */
  def shingles(text: Column, n: Int): Column =
    graft.plans.TextExpressions.wordShingles(text, n)

  /** The composed-builtin reference formulation of [[shingles]] (kept as the
    * semantic spec the native expression is pinned against). */
  def shinglesComposed(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(words) - lit(n)),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Exact dedup: groups identical texts by md5 digest; keeps the smallest id
    * as the canonical representative. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** `numHashes` minhash signature columns h0..hN per id: min over shingles
    * of an affine permutation of xxhash64(shingle). Wrapping Long arithmetic
    * is deterministic and identical across partitionings. See the
    * formulation note below for why this is explode+groupBy and why that is
    * both faster and shuffle-cheap. */
  /** Default-mode affine constants (wrapping 64-bit arithmetic). */
  def defaultPermConsts(i: Int): (Long, Long) =
    (0x9E3779B97F4A7C15L * (2 * i + 1) | 1L, 0xC2B2AE3D27D4EB4FL * (i + 1))

  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 5,
      portable: Boolean = false, fused: Boolean = true): DataFrame = {
    // Formulation notes (measured at sf0.1): explode + groupBy aggregation
    // beats a per-row array_min(transform(...)) closed form ~4× (HOFs are
    // interpreted and allocate per row), and the explode never crosses
    // partitions, so map-side partial aggregation collapses to ONE
    // signature row per doc before the shuffle. The fused per-row pass
    // below then removes even that shuffle.
    // no Scale.fanOut here — measured (min-of-5, sf0.1): the rebalance
    // shuffle costs ~0.4 s against a shingle+fused-minhash pass that the
    // single scan task already finishes faster; contrast charLmScore /
    // FuzzyJoin where the per-row construction dominates and fanOut pays
    val consts = (0 until numHashes).map(i =>
      if (portable) portablePermConsts(i) else defaultPermConsts(i))
    // production+fused: the per-ROW native signature (plans.MinHashRowExpr,
    // the streaming formulation) — ONE narrow pass, no explode, no hash
    // aggregate, ZERO shuffle for signature generation (the explode+agg
    // shape below still shuffles one signature row per doc for the
    // groupBy). Bit-identical: same shingling, same xxhash64(seed 42),
    // same wrapping h*a+b mins (StreamingSpec + NearDupSpec pin it; the
    // <n-words null filter reproduces the no-shingles-no-group behavior).
    // Measured sf0.1: q_dedup_verified 2.98→2.21 s, q_dedup_incremental
    // 2.05→1.53 s, q_dedup_minhash ~parity (min-of-5). Portable mode rides
    // the SAME per-row pass (modP arithmetic, value-identical to the
    // explode+agg formulation below, which the DuckDB oracle replays and
    // which remains as the fused=false readable specification).
    if (fused) {
      val (as, bs) = consts.unzip
      // no fanOut, re-measured for this shape (the Scale.fanOut doctrine:
      // re-measure after any hot-path expression change): sf0.1 min-of-5,
      // q_dedup_minhash 0.98 without vs 0.93 with, but q_dedup_incremental
      // 1.53 without vs 2.08 with — each increment pays the rebalance
      // shuffle and the native per-row pass is too cheap to amortize it.
      // At real scale the scan width comes from maxPartitionBytes splits,
      // not this local-small-file artifact.
      // Portable mode rides the same per-row pass with modP arithmetic —
      // value-identical to the explode+agg formulation the DuckDB oracle
      // replays (and which remains below as the fused=false readable spec).
      // the sub-shingle filter runs on a CHEAP word-count proxy BEFORE the
      // expression (signature null ⟺ words < shingleSize, same split
      // semantics) — filtering on sig.isNotNull re-evaluated the whole
      // md5/xxhash pass per predicate reference (measured 3 plan
      // occurrences; portable md5 made it a 1.5× regression)
      return df
        .filter(size(split(col(textCol), " ")) >= shingleSize)
        .select(col(idCol).as("doc_id"),
          graft.plans.TextExpressions
            .minhashRow(col(textCol), shingleSize, as, bs,
              modP = if (portable) PortableP else -1L).as("sig"))
        .select(col("doc_id") +:
          (0 until numHashes).map(i => col("sig").getItem(i).as(s"h$i")): _*)
    }
    val sh0 = df.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), shingleSize)).as("shingle"))
    val sh =
      if (portable) sh0.withColumn("h", portableHash60(col("shingle")) % PortableP)
      else sh0.withColumn("h", xxhash64(col("shingle")))
    val aggs = consts.zipWithIndex.map { case ((a, b), i) =>
      if (portable) min((col("h") * lit(a) + lit(b)) % PortableP).as(s"h$i")
      else min(col("h") * lit(a) + lit(b)).as(s"h$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Probability that a pair with Jaccard similarity `s` becomes an LSH
    * candidate under (bands, rowsPerBand): 1 − (1 − s^r)^b — the S-curve
    * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4). */
  def lshCandidateProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand.toDouble), bands.toDouble)

  /** The similarity where the S-curve crosses ~1/2: (1/b)^(1/r) — the
    * effective LSH threshold of a (bands, rows) choice. */
  def lshThreshold(bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 / bands, 1.0 / rowsPerBand)

  /** LSH parameter planner: among the factorizations bands × rows =
    * `numHashes`, pick the one whose S-curve best separates pairs around
    * `targetSim` — minimizing (candidate probability below target =
    * false-positive area) + (miss probability above target = false-negative
    * area), each integrated numerically over [0,target] / [target,1]. More
    * bands push the curve left (recall up, candidates up); more rows push
    * it right (precision up). Returns (bands, rowsPerBand).
    *
    * Scale note: this is driver-side closed-form math over ≤ d(numHashes)
    * factorizations — run it BEFORE a 100 TB minhash pass to size the band
    * join instead of hand-tuning; the candidate volume it implies is what
    * [[minhashCandidates]]'s shuffle carries. */
  def planLsh(numHashes: Int = 64, targetSim: Double = 0.5): (Int, Int) = {
    require(numHashes > 0 && targetSim > 0.0 && targetSim < 1.0,
      s"bad planLsh($numHashes, $targetSim)")
    val options = (1 to numHashes).filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    def err(b: Int, r: Int): Double = {
      val n = 200
      // FP area: candidates among pairs BELOW the target similarity
      val fp = (0 until n).map { i =>
        val s = targetSim * (i + 0.5) / n
        lshCandidateProb(s, b, r) * (targetSim / n)
      }.sum
      // FN area: misses among pairs AT/ABOVE the target similarity
      val fn = (0 until n).map { i =>
        val s = targetSim + (1.0 - targetSim) * (i + 0.5) / n
        (1.0 - lshCandidateProb(s, b, r)) * ((1.0 - targetSim) / n)
      }.sum
      fp + fn
    }
    options.minBy { case (b, r) => err(b, r) }
  }

  /** Banded LSH rows (doc_id, band_id, band_hash) of a minhash signature
    * table — THE band-key derivation, shared by the full-corpus and
    * incremental paths: the increment contract ("increments compose to
    * the full-corpus output", NearDupSpec) depends on both sides banding
    * byte-identically, so the logic lives once. Portable mode keeps the
    * joined signature string itself (what the oracle recomputes);
    * default hashes it (smaller shuffle key). */
  private def minhashBanded(sig: DataFrame, bands: Int, rows: Int,
      portable: Boolean): DataFrame = {
    def bandKey(b: Int): Column = {
      val joined = concat_ws("_",
        (b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*)
      if (portable) joined else xxhash64(joined)
    }
    sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(bandKey): _*))
        .as(Seq("band_id", "band_hash")))
  }

  /** Banded rows (doc_id, simhash, band_id, band_val) of a simhash table
    * — shared by [[simhashNearDups]] and its incremental twin for the
    * same composability reason as [[minhashBanded]]. The last band takes
    * the remainder bits. */
  private def simhashBanded(sig: DataFrame, nBands: Int, nBits: Int): DataFrame = {
    val width = nBits / nBands
    sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until nBands).map { b =>
        val w = if (b == nBands - 1) nBits - b * width else width
        val mask = if (w >= 64) -1L else (1L << w) - 1
        shiftright(col("simhash"), b * width).bitwiseAND(mask)
      }: _*)).as(Seq("band_id", "band_val")))
  }

  /** LSH candidate pairs: signatures banded (bands × rowsPerBand = numHashes);
    * docs sharing any band bucket become candidates; estimated similarity =
    * fraction of matching signature components.
    *
    * Shuffle shape (the 100 TB concern): band rows carry ONLY
    * (band_id, band_hash, doc_id) — full signatures do NOT ride the band-join
    * shuffle. (Round 2 put the 64-long array on every banded row: ~8 KB moved
    * per doc where ~0.5 KB suffices, 16× amplification.) Candidate pairs are
    * deduped as bare (a_id, b_id) and only then join back to the one-row-per-
    * doc signature table twice for est_sim (NearDupSpec pins the scalar-only
    * band-join inputs). The `sig` input feeds four consumers here and Spark's
    * exchange reuse does NOT dedupe them (measured: 0 reused exchanges, the
    * signature aggregate re-ran per consumer) — callers should pass a
    * persisted signature table, as [[minhashNearDups]] / [[nearDupPipeline]]
    * do. */
  def minhashCandidates(sig: DataFrame, bands: Int = 16, numHashes: Int = 64,
      minEstSim: Double = 0.5, portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rows = numHashes / bands
    val banded = minhashBanded(sig, bands, rows, portable)
    val a = banded.select(col("doc_id").as("a_id"), col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("b_id"), col("band_id"), col("band_hash"))
    // dedupe (a pair collides once per shared band) BEFORE fetching
    // signatures, so the est_sim fold — an interpreted higher-order
    // function — runs once per candidate pair, not once per band hit
    val pairs = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val sigs = sig.select(col("doc_id"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    pairs
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .select(col("a_id"), col("b_id"),
        // fused match count (plans.ArrayMatchCount): runs once per candidate
        // pair — billions at 100 TB — where the composed zip_with fold is
        // interpreted; integer-identical (NearDupSpec pins it)
        (graft.plans.VectorExpressions.matchCountNative(col("a_sig"), col("b_sig"))
          .cast("double") / lit(numHashes.toDouble)).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  /** Full MinHash+LSH near-dup pipeline.
    *
    * The signature table feeds FOUR consumers in the candidates plan (two
    * banded sides, two est_sim signature fetches); Spark's exchange reuse
    * does not dedupe them (measured: 0 reused exchanges at sf0.1, the
    * signature aggregate ran per consumer), so the signatures are persisted
    * for the duration of the run — one ~520-byte row per document, the
    * standard LSH-pipeline materialization point at any scale — and released
    * once the (small) near-dup pair output is materialized. The output stays
    * persisted: it IS the result; callers release it. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      minEstSim: Double = 0.5, portable: Boolean = false): DataFrame = {
    val sig = minhashSignature(df, idCol, textCol, portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = minhashCandidates(sig, minEstSim = minEstSim, portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    sig.unpersist()
    out
  }

  /** Empty signature table with the [[minhashSignature]] schema — the seed
    * for [[minhashNearDupsIncremental]] on a fresh corpus. */
  def emptySignatures(spark: org.apache.spark.sql.SparkSession,
      numHashes: Int = 64): DataFrame = {
    val fields = org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      (0 until numHashes).map(i => org.apache.spark.sql.types.StructField(
        s"h$i", org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields))
  }

  /** Incremental MinHash+LSH near-dup detection: dedup a NEW batch of
    * documents against a stored signature corpus — the production crawl
    * cycle (sign today's increment, pair it against everything signed so
    * far, append its signatures). Emits pairs where at least one side is
    * new: new×existing and new×new, never existing×existing (already
    * reported in earlier increments). Result pairs over increments compose
    * to the full-corpus [[minhashNearDups]] output (pinned in NearDupSpec).
    *
    * 100 TB shape: the band join is (new bands) ⋈ (all bands) — per
    * increment the shuffled probe side is the increment, not the corpus;
    * the corpus side ships only (band_id, band_hash, doc_id) band rows and
    * one signature row per candidate doc, both linear in corpus size with
    * bucket-bounded join fan-out. `existingSigs` is typically a bucketed
    * parquet table maintained by the caller from `newSigs` unions.
    *
    * Returns (pairs, newSigs): append `newSigs` to the store after the
    * pairs are consumed. */
  def minhashNearDupsIncremental(newDocs: DataFrame, existingSigs: DataFrame,
      idCol: String, textCol: String, minEstSim: Double = 0.5,
      bands: Int = 16, numHashes: Int = 64,
      portable: Boolean = false): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val rows = numHashes / bands
    val newSigs = minhashSignature(newDocs, idCol, textCol,
        numHashes = numHashes, portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager materialization, NOT just persist: the pair job reads newSigs
    // through four plan branches (probe bands, corpus bands via allSigs,
    // and both sides of the est-sim signature join) — inside one job the
    // still-cold cache makes every branch recompute the signatures (the
    // shingle explode + MinHashAgg is the expensive stage); measured 1.9×
    // on the two-increment catalog query
    newSigs.count()
    val allSigs = existingSigs.union(newSigs)

    // probe side = the increment; build side = the whole corpus' band rows
    def banded(sig: DataFrame) = minhashBanded(sig, bands, rows, portable)
    val pairs = banded(newSigs)
      .select(col("doc_id").as("n_id"), col("band_id"), col("band_hash"))
      .join(banded(allSigs)
        .select(col("doc_id").as("o_id"), col("band_id"), col("band_hash")),
        Seq("band_id", "band_hash"))
      .filter(col("n_id") =!= col("o_id"))
      .select(least(col("n_id"), col("o_id")).as("a_id"),
        greatest(col("n_id"), col("o_id")).as("b_id"))
      .distinct()
    val sigs = allSigs.select(col("doc_id"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    val scored = pairs
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .select(col("a_id"), col("b_id"),
        (graft.plans.VectorExpressions.matchCountNative(col("a_sig"), col("b_sig"))
          .cast("double") / lit(numHashes.toDouble)).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
    (scored, newSigs)
  }

  /** Exact-jaccard verification of candidate pairs: n-gram sets are built
    * ONLY for documents appearing in `cands` — the verify cost is
    * candidate-bound, not corpus-bound (the production LSH→verify shape).
    * Self-contained caching: the (small, pair-sized) output is materialized
    * persisted and any candidate persist THIS call added is released before
    * returning — direct callers don't inherit a cached-block leak (callers
    * release the returned handle, the library-wide contract). */
  def verifyCandidates(df: DataFrame, cands0: DataFrame, idCol: String,
      textCol: String, n: Int, minJaccard: Double): DataFrame = {
    // the candidate plan (LSH banding) feeds three branches below
    // (candidate-doc set, intersection base, output base) — persist it or
    // the whole signature+banding pipeline re-executes per branch
    val callerPersisted =
      cands0.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cands = if (callerPersisted) cands0 else cands0.persist()
    val candDocs = cands.select(col("a_id").as("_cand_id"))
      .union(cands.select(col("b_id").as("_cand_id"))).distinct()
    // three consumers below (sizes + both sides of the intersection join):
    // persist or the scan+join+shingle explode re-executes per consumer —
    // candidate-bound, so the cache is pair-sized, not corpus-sized
    val grams = df.join(candDocs, df(idCol) === candDocs("_cand_id"))
      .select(df(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .persist()
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    // intersection via a COMPOUND (b_id, g) equi-join: probing by b_id alone
    // with g-equality as a residual condition evaluates |grams(a)|×|grams(b)|
    // comparisons per pair (per-pair quadratic — the dominant verify cost);
    // hashing on (b_id, g) makes it linear in the matching grams
    val inter = cands.select(col("a_id"), col("b_id"))
      .join(grams.select(col("doc_id").as("a_id"), col("g")), "a_id")
      .join(grams.select(col("doc_id").as("b_id"), col("g")), Seq("b_id", "g"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    // left joins + coalesce: a candidate pair where either doc has no
    // n-grams (< n words) scores an explicit jaccard of 0 instead of
    // silently disappearing from the verified output
    val union_ = coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) -
      coalesce(col("inter"), lit(0L))
    // finally, not sequentially: a failed materialization must still
    // release this call's caches (the library-wide fail-fast contract)
    try {
      val out = cands.select(col("a_id"), col("b_id"))
        .join(inter, Seq("a_id", "b_id"), "left_outer")
        .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_grams", "na"),
          Seq("a_id"), "left_outer")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_grams", "nb"),
          Seq("b_id"), "left_outer")
        .select(col("a_id"), col("b_id"),
          when(union_ === 0, lit(0.0))
            .otherwise(coalesce(col("inter"), lit(0L)).cast("double") / union_)
            .as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
        .persist()
      out.count() // materialize before releasing this call's caches
      out
    } finally {
      grams.unpersist()
      if (!callerPersisted) cands.unpersist()
    }
  }

  /** Per-pair exact-jaccard verification (plans.NgramJaccard): attach the
    * two texts with ONE join each and evaluate the distinct-n-gram Jaccard
    * natively per candidate pair — versus [[verifyCandidates]]' set-join
    * shape (~6 shuffle stages), this is the right verify when candidates
    * per doc are few (the LSH regime: measured 1.13 → 0.51 s on the sf0.1
    * verify stage). A doc in k pairs re-builds its gram set k times and its
    * text rides the shuffle per pair, so hub-heavy candidate sets should
    * keep the set-join path — both produce bit-identical jaccard values
    * (NearDupSpec pins it). Same cache discipline: the pair-sized output
    * returns materialized persisted; this call's candidate persist is
    * released. */
  def verifyCandidatesDirect(df: DataFrame, cands0: DataFrame, idCol: String,
      textCol: String, n: Int, minJaccard: Double): DataFrame = {
    val callerPersisted =
      cands0.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cands = if (callerPersisted) cands0 else cands0.persist()
    val texts = df.select(col(idCol), col(textCol))
    try {
      val out = cands.select(col("a_id"), col("b_id"))
        .join(texts.select(col(idCol).as("a_id"), col(textCol).as("__a_text")), "a_id")
        .join(texts.select(col(idCol).as("b_id"), col(textCol).as("__b_text")), "b_id")
        .select(col("a_id"), col("b_id"),
          graft.plans.TextExpressions
            .ngramJaccard(col("__a_text"), col("__b_text"), n).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
        .persist()
      out.count()
      out
    } finally {
      if (!callerPersisted) cands.unpersist()
    }
  }

  /** LSH candidates → exact-jaccard verify: the end-to-end near-dup
    * pipeline. Output = pairs with true n-gram jaccard ≥ `minJaccard` that
    * LSH surfaced (at 64 hashes / 16 bands a jaccard-0.8 pair is missed with
    * p ≈ 2e-4; ≥0.95 pairs with p ≈ 3e-12 — effectively exact). */
  def nearDupPipeline(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, verifyNgram: Int = 3,
      minJaccard: Double = 0.8): DataFrame = {
    // est-sim cushion derived from the caller's threshold: est_sim has
    // σ = sqrt(j(1-j)/64) ≤ 0.0625, so a 0.25 (≥4σ) margin makes
    // P(est < cushion | j ≥ minJaccard) negligible at ANY threshold —
    // banding recall (≈2e-4 at j=0.8, ≈3e-12 at j≥0.95) binds instead —
    // while still pruning the verify join to near-threshold candidates.
    // Signatures persisted for the same multi-consumer reason as
    // minhashNearDups (exchange reuse measurably does not dedupe them).
    val sig = minhashSignature(df, idCol, textCol, shingleSize = shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = minhashCandidates(sig,
      minEstSim = math.max(0.0, minJaccard - 0.25))
    // per-pair verify (the LSH regime: few candidates per doc — see
    // verifyCandidatesDirect); returns materialized persisted and releases
    // the candidate cache itself; only the signature cache remains to drop
    val out = verifyCandidatesDirect(df, cands, idCol, textCol, verifyNgram,
      minJaccard)
    sig.unpersist()
    out
  }

  /** 64-bit SimHash per document: per-bit majority vote of token hashes
    * (token multiplicity counts). Per-row closed form — narrow map stage,
    * zero shuffle (see minhashSignature scale note). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame = {
    // explode + fused single-buffer vote aggregate (same formulation
    // rationale as minhashSignature: partial agg collapses map-side, the
    // shuffle carries one vote buffer per doc; plans.SimHashAgg updates all
    // per-bit counters in one pass instead of nBits separate conditional-sum
    // slots — bit-identical signatures, pinned by the oracle which
    // recomputes them in SQL). Portable mode uses the 60-bit md5-derived
    // token hash (oracle-recomputable) → a 60-bit signature.
    // no fanOut here: the split-token explode is cheap per input row —
    // measured at sf0.1 the rebalance shuffle costs more than the
    // single-task explode it parallelizes (0.51 s → 0.89 s); contrast
    // minhashSignature/charLmScore where the derived-row construction
    // dominates and fanOut pays
    val nBits = if (portable) 60 else 64
    val tok0 = df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
    val tok =
      if (portable) tok0.withColumn("h", portableHash60(col("w")))
      else tok0.withColumn("h", xxhash64(col("w")))
    tok.groupBy(col("doc_id"))
      .agg(graft.plans.SimHashAgg.signature(col("h"), nBits).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, via a
    * (maxDist+1)-band join: by pigeonhole, any pair within distance d shares
    * at least one of d+1 bands untouched, so recall is exact for the given
    * maxDist. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, portable: Boolean = false): DataFrame = {
    val nBits = if (portable) 60 else 64
    val nBands = maxDist + 1
    // every band needs >= 1 bit or banding degenerates to a cross join
    require(maxDist >= 0 && nBands <= nBits,
      s"maxDist=$maxDist out of range for $nBits-bit signatures")
    val sig = simhash(df, idCol, textCol, portable = portable)
    val banded = simhashBanded(sig, nBands, nBits)
    val a = banded.select(col("doc_id").as("a_id"), col("simhash").as("a_sim"),
      col("band_id"), col("band_val"))
    val b = banded.select(col("doc_id").as("b_id"), col("simhash").as("b_sim"),
      col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Incremental SimHash near-dup detection: pair a NEW batch against a
    * stored (doc_id, simhash) signature table — same increment contract as
    * [[minhashNearDupsIncremental]] (new×existing and new×new pairs only;
    * increments compose to the full-corpus [[simhashNearDups]], pinned in
    * NearDupSpec). Returns (pairs, newSigs); append `newSigs` to the store. */
  def simhashNearDupsIncremental(newDocs: DataFrame, existingSigs: DataFrame,
      idCol: String, textCol: String, maxDist: Int = 3,
      portable: Boolean = false): (DataFrame, DataFrame) = {
    val nBits = if (portable) 60 else 64
    val nBands = maxDist + 1
    require(maxDist >= 0 && nBands <= nBits,
      s"maxDist=$maxDist out of range for $nBits-bit signatures")
    val newSigs = simhash(newDocs, idCol, textCol, portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager materialization BEFORE the pair job (the minhash twin's fix,
    // measured 1.9× there): the join below consumes newSigs through TWO
    // plan branches scheduled together — against a cold cache both would
    // recompute the signature aggregation, the increment's dominant stage
    newSigs.count()
    val allSigs = existingSigs.union(newSigs)
    def banded(sig: DataFrame) = simhashBanded(sig, nBands, nBits)
    val pairs = banded(newSigs)
      .select(col("doc_id").as("n_id"), col("simhash").as("n_sim"),
        col("band_id"), col("band_val"))
      .join(banded(allSigs)
        .select(col("doc_id").as("o_id"), col("simhash").as("o_sim"),
          col("band_id"), col("band_val")),
        Seq("band_id", "band_val"))
      .filter(col("n_id") =!= col("o_id"))
      .select(least(col("n_id"), col("o_id")).as("a_id"),
        greatest(col("n_id"), col("o_id")).as("b_id"),
        bit_count(col("n_sim").bitwiseXOR(col("o_sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    (pairs, newSigs)
  }

  /** Shared gram pipeline of [[ngramJaccard]] and [[ngramContainment]]:
    * (distinct grams per doc under the id bound, optional df-cap, per-doc
    * sizes, pair-keyed intersection counts). One home, because both
    * scoring rules must count over the SAME capped gram sets — a df-cap
    * change that missed its twin would silently skew one metric's
    * denominators. Returns pair rows (a_id, b_id, inter, na, nb). */
  private def gramIntersections(df: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int, maxId: Long, maxDf: Int): DataFrame = {
    val grams0 = df.filter(col(idCol) < maxId)
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        explode(array_distinct(shingles(col(textCol), n))).as("g"))
    val grams = if (maxDf == Int.MaxValue) grams0 else {
      val keep = grams0.groupBy(col("g")).agg(count(lit(1)).as("df_"))
        .filter(col("df_") <= maxDf).select(col("g"))
      // shuffle-on-g join (the inter join below shuffles on g anyway);
      // broadcasting the kept-gram list would not survive large corpora
      grams0.join(keep, Seq("g"))
    }
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val inter = grams.as("x").join(grams.as("y"),
        col("x.g") === col("y.g") && col("x.lang") === col("y.lang")
          && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n_grams", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n_grams", "nb"), "b_id")
  }

  /** Exact word-n-gram Jaccard for candidate pairs (the verify step after
    * LSH; here candidates = same-language pairs under an id bound).
    *
    * `maxDf` is the scale lever: grams occurring in more than `maxDf`
    * documents (boilerplate) are dropped from BOTH sides of the jaccard
    * (set semantics preserved: sizes and intersections are computed on the
    * filtered sets). That bounds the gram-equality self-join to at most
    * maxDf candidates per gram — linear in the corpus for a fixed cap —
    * instead of quadratic in the documents sharing a common gram. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int, maxId: Long, minJaccard: Double,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val scored = gramIntersections(df, idCol, textCol, langCol, n,
      maxId, maxDf)
    scored
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Asymmetric n-gram CONTAINMENT pairs — the subset-duplication detector
    * Jaccard structurally misses: a short document wholly quoted inside a
    * long one scores Jaccard ≈ |A|/|B| (arbitrarily small) but containment
    * C(A,B) = |A∩B|/|A| = 1. This is the boilerplate/quotation/wrapper-page
    * signal a curation pipeline needs ALONGSIDE resemblance dedup
    * (Broder's distinction: resemblance vs containment).
    *
    * Same scale discipline as [[ngramJaccard]]: distinct grams per doc, a
    * df-cap drops stop-grams before the gram equi-join (bounding each
    * gram's join fan-out at maxDf²), intersection counts aggregate
    * pair-keyed with map-side partials. Emits BOTH directions' scores;
    * pairs survive when either reaches `minContainment`. Ratios divide
    * exact integer counts once in double. */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int, maxId: Long, minContainment: Double,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val scored = gramIntersections(df, idCol, textCol, langCol, n,
      maxId, maxDf)
    scored
      .select(col("a_id"), col("b_id"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") / col("na").cast("double")).as("cont_a"),
        (col("inter").cast("double") / col("nb").cast("double")).as("cont_b"))
      .filter(col("cont_a") >= minContainment ||
        col("cont_b") >= minContainment)
  }

  /** Near-dup cluster resolution — the final step of a fuzzy-dedup pipeline.
    * Pair lists ((a_id, b_id) from [[minhashNearDups]] / [[ngramJaccard]] /
    * [[simhashNearDups]]) are not directly actionable: near-dup similarity is
    * not transitive, so production pipelines close the pair graph into
    * clusters and keep one representative per cluster. This runs min-label
    * connected components over the pair graph and returns
    * (doc_id, cluster_id) for every document appearing in ≥ 1 pair, with
    * cluster_id = the smallest doc id of the cluster: rows where
    * doc_id == cluster_id are the kept representatives, all other rows are
    * the removal set. Documents in no pair are singleton clusters and are
    * not emitted (their removal set contribution is empty).
    *
    * 100 TB shape: the pair graph is output-sized (near-dup pairs, not the
    * corpus), and each CC round shuffles only (node, label) rows on the node
    * id with the edge side cached pre-partitioned — see
    * [[graft.algorithms.Graph.connectedComponents]]. Cluster diameter bounds
    * the round count; near-dup clusters are shallow (dup "cliques" minus LSH
    * misses), so rounds stay in the single digits. */
  /** Test-visible probe: did the last [[nearDupClusters]] call close the
    * graph driver-side? (NearDupSpec asserts the threshold switch.) */
  @volatile private[graft] var lastClustersClosedDriverSide = false

  def nearDupClusters(pairs: DataFrame, maxIter: Int = 50,
      parallelism: Option[Int] = None,
      driverCloseMaxPairs: Long = 100000L): DataFrame = {
    lastClustersClosedDriverSide = false
    // the pair graph is output-sized — typically orders of magnitude below
    // the corpus — so inheriting the corpus-scale shuffle width makes every
    // CC round mostly task-scheduling overhead (AQE, which would coalesce,
    // is off inside driver loops). When the caller already materialized the
    // pairs (the minhashNearDups contract), size the CC shuffle from the
    // actual pair count: ≈64k label rows per partition, floor 1. A billion
    // pairs at 100 TB still gets ~15k partitions.
    val counted =
      if (pairs.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        Some(pairs.count()) else None
    // the fast path selects a_id/b_id BY NAME, so the type guard must look
    // those fields up by name too (a positional check would pass on a frame
    // whose leading columns are integral while the id columns are not)
    val integralIds = Seq("a_id", "b_id")
      .flatMap(nm => pairs.schema.fields.find(_.name == nm)) match {
      case fs if fs.length == 2 => fs.forall(_.dataType match {
        case org.apache.spark.sql.types.LongType
           | org.apache.spark.sql.types.IntegerType => true
        case _ => false
      })
      case _ => false
    }
    def distributed(): DataFrame = {
      val p = parallelism.orElse(
        counted.map(n => graft.operators.Iteration.sizedWidth(n)))
      graft.algorithms.Graph.connectedComponents(
          pairs.select(col("a_id").as("src"), col("b_id").as("dst")),
          maxIter = maxIter, parallelism = p)
        // cast to long so the OUTPUT SCHEMA does not depend on which path
        // ran: the driver fast path always emits longs, and a caller
        // appending successive runs to one table must not hit a schema
        // mismatch the first time the corpus crosses the threshold
        .select(col("node").cast("long").as("doc_id"),
          col("component").cast("long").as("cluster_id"))
    }
    counted match {
      // tiny-graph fast path: a materialized pair graph under the threshold
      // closes on the driver in one collect + union-find — distributed CC
      // rounds on a 47-pair graph are pure job-scheduling overhead, while
      // 100k (Long, Long) pairs collect in ~1.6 MB. Same output contract:
      // every node appearing in ≥1 pair, cluster_id = min id of its
      // component (union always attaches the larger root under the smaller,
      // so each root IS its component's min).
      case Some(n) if n <= driverCloseMaxPairs && integralIds =>
        val spark = pairs.sparkSession
        import spark.implicits._
        val rows = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
          .collect()
        // a null id would fail the typed union-find; route it to the
        // distributed path (where null join keys degrade gracefully)
        // instead of throwing
        if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) distributed()
        else {
          lastClustersClosedDriverSide = true
          val es = rows.map(r => (r.getLong(0), r.getLong(1)))
          val parent = new java.util.HashMap[Long, Long]()
          def find(x0: Long): Long = {
            var x = x0
            while (parent.get(x) != x) {
              parent.put(x, parent.get(parent.get(x))) // path halving
              x = parent.get(x)
            }
            x
          }
          es.foreach { case (a, b) =>
            parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
            val ra = find(a); val rb = find(b)
            if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
          }
          val nodes = parent.keySet().toArray(new Array[java.lang.Long](0))
          spark.createDataset(nodes.toSeq.map(n => (n.longValue(), find(n))))
            .toDF("doc_id", "cluster_id")
        }
      case _ => distributed()
    }
  }

  /** Benchmark decontamination: flag training documents that share at least
    * `minHits` distinct word n-grams with ANY benchmark document (the
    * GPT-3-style 13-gram test-set-leakage check; `n` scales with corpus
    * document length). Returns (doc_id, hits) over the training side; feed
    * it to [[decontaminate]] to drop the flagged docs.
    *
    * 100 TB shape: benchmarks are megabytes while the corpus is terabytes,
    * so the benchmark gram set is explicitly `broadcast` — the training
    * grams are never shuffled, and the per-doc hit count collapses map-side
    * (partial agg) before the one (doc_id)-keyed exchange of the flagged
    * subset. The explode is narrow: grams stream through the join without
    * materializing per-doc gram sets. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13, minHits: Long = 1): DataFrame = {
    val bgrams = bench
      .select(explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .distinct()
    val tgrams = train.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), n))).as("g"))
    tgrams.join(broadcast(bgrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** C4-style global line dedup: the corpus keeps exactly ONE occurrence of
    * every distinct line of at least `minWords` words — the first in
    * (doc id, line position) order — and shorter lines pass through
    * untouched (boilerplate like navigation fragments is what this targets;
    * short lines carry no dedup signal). Returns (doc_id, text) with each
    * document's surviving lines re-joined in their original order; documents
    * whose every line was deduplicated away survive with empty text.
    *
    * 100 TB shape: one shuffle keyed on the line (the first-occurrence
    * window; per-key group is occurrence-count-sized) and one shuffle back
    * on the doc id for reassembly — both linear in total line count. The
    * whole-document degenerate case (no delimiter in any text) reduces to
    * exact dedup keeping first. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, delimiter: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).cast("long").as("doc_id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(delimiter)))
        .as(Seq("pos", "line")))
    // identical lines have identical word counts, so each window is
    // uniformly eligible or uniformly exempt — ranks are never consumed
    // by exempt rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("line")).orderBy(col("doc_id"), col("pos"))
    val kept = lines
      .withColumn("nw", size(filter(split(col("line"), " "), x => x =!= "")))
      .withColumn("rn", row_number().over(w))
      .filter(col("nw") < minWords || col("rn") === 1)
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")),
        delimiter).as("_text_clean"))
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("_text_clean"), lit("")).as("text"))
  }

  /** Repeated-span profile — the sub-document dedup signal (ExactSubstr
    * approximated at word-n-gram granularity): for each document, the
    * fraction of its word `n`-gram occurrences whose gram also appears in at
    * least one OTHER document. Doc-level dedup (exact/minhash) misses
    * partially-copied text — boilerplate headers, quoted paragraphs,
    * syndicated passages; a high `dup_frac` on a doc no pairwise method
    * flagged is exactly the "stitched from copied spans" case.
    *
    * Returns every input id: (doc_id, n_grams, n_dup_grams, dup_frac);
    * docs with < n words profile as (0, 0, 0.0).
    *
    * 100 TB shape: grams travel as 8-byte hashes, never strings (hash
    * collisions conservatively over-mark — fine for a filter signal, and in
    * portable mode the oracle recomputes the identical md5-derived hashes).
    * Cross-doc grams are detected with min(doc)≠max(doc) — two cheap aggs,
    * no count-distinct state. One gram-hash shuffle, one hash-keyed join
    * back, one doc-keyed collapse: all linear in token count. */
  def dupSpanProfile(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, portable: Boolean = false): DataFrame = {
    val h: Column => Column =
      if (portable) portableHash60 else (c: Column) => xxhash64(c)
    val grams = graft.operators.Scale.fanOut(df)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(shingles(col(textCol), n)).as("gram"))
      .select(col("doc_id"), h(col("gram")).as("gh"))
    val dup = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("gh"), lit(1).as("dup"))
    val perDoc = grams.join(dup, Seq("gh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("dup")).as("n_dup_grams"))
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        when(col("n_grams").isNull, lit(0.0))
          .otherwise(col("n_dup_grams").cast("double") /
            col("n_grams").cast("double"))
          .as("dup_frac"))
  }

  /** Winnowed fingerprint selection (Schleimer–Wilkerson–Aiken 2003 — the
    * MOSS algorithm): from each document's word-`n`-gram hash sequence,
    * keep one fingerprint per length-`w` window — the RIGHTMOST minimal
    * hash (the standard tie rule), deduplicated across overlapping windows.
    *
    * The point at 100 TB: the fingerprint index shrinks to ~2/(w+1) of the
    * full gram set while GUARANTEEING any shared span of ≥ w+n−1 words
    * still collides on at least one selected fingerprint (every length-w
    * window of a shared span selects from the same hashes) — the
    * index-size lever for sub-document dedup that [[dupSpanProfile]]'s
    * full gram set doesn't have. Selection is a per-document array fold —
    * narrow, no shuffle; only the selected fingerprints hit the cross-doc
    * stages.
    *
    * Returns one row per selected fingerprint: (doc_id, pos, fp) where
    * `pos` is the 1-based gram position. Docs with < n+w−1 words select
    * nothing. */
  def winnow(df: DataFrame, idCol: String, textCol: String, n: Int = 5,
      w: Int = 4, portable: Boolean = false): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val h: Column => Column =
      if (portable) portableHash60 else (c: Column) => xxhash64(c)
    val hs = transform(shingles(col(textCol), n), g => h(g))
    val fps = graft.operators.Scale.fanOut(df)
      .select(col(idCol).cast("long").as("doc_id"), hs.as("hs"))
      .select(col("doc_id"),
        // one struct(fp, pos) per window start; rightmost minimal via <=
        explode(array_distinct(transform(
          when(size(col("hs")) >= w,
            sequence(lit(1), size(col("hs")) - (w - 1)))
            .otherwise(typedLit(Seq.empty[Int])),
          s => aggregate(
            if (w == 1) typedLit(Seq.empty[Int]) else sequence(s + 1, s + (w - 1)),
            struct(element_at(col("hs"), s).as("fp"), s.as("pos")),
            (acc, j) => when(element_at(col("hs"), j) <= acc.getField("fp"),
              struct(element_at(col("hs"), j).as("fp"), j.as("pos")))
              .otherwise(acc))))).as("f"))
    fps.select(col("doc_id"), col("f.pos").as("pos"), col("f.fp").as("fp"))
  }

  /** [[dupSpanProfile]] over the winnowed fingerprint set: per document,
    * (n_fps, n_dup_fps, dup_frac) where a fingerprint is "dup" when its
    * VALUE also appears in another document. Same signal, ~2/(w+1) of the
    * index cost; the w+n−1-word detection guarantee bounds what thinning
    * can miss. */
  def winnowProfile(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, w: Int = 4, portable: Boolean = false): DataFrame = {
    val fps = winnow(df, idCol, textCol, n, w, portable)
    val dup = fps.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("fp"), lit(1).as("dup"))
    val perDoc = fps.join(dup, Seq("fp"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"), count(col("dup")).as("n_dup_fps"))
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("n_dup_fps"), lit(0L)).as("n_dup_fps"),
        when(col("n_fps").isNull, lit(0.0))
          .otherwise(col("n_dup_fps").cast("double") /
            col("n_fps").cast("double"))
          .as("dup_frac"))
  }

  /** Incremental EXACT dedup of a new increment against a stored digest
    * history, Bloom-prefiltered. Returns the increment's new-content rows
    * (digest, keep_id, n_copies): within-increment dups collapsed to the
    * smallest id, rows whose digest already exists in `history` dropped.
    * The result is exact — the Bloom filter is a prefilter only, its false
    * positives are removed by an exact confirmation join.
    *
    * 100 TB shape: the naive formulation anti-joins increment × history on
    * digest, shuffling the corpus-sized history every crawl cycle. Here a
    * Bloom filter built over the history digests (one scan, a driver-side
    * bitset sized to the history cardinality, or `expectedItems` when the
    * caller pins it) is broadcast and prefilters the
    * increment to PROBABLE dups — a (dup rate + fpp)-sized subset. Only
    * those digests are then broadcast against one more history scan for
    * exact confirmation: the history is scanned twice but never shuffled,
    * and nothing corpus-sized crosses the network. */
  def exactIncremental(newDocs: DataFrame, history: DataFrame, idCol: String,
      textCol: String, historyDigestCol: String = "digest",
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    // within-increment exact dedup: one increment-sized shuffle
    val inc = exact(newDocs, idCol, textCol)
    val hist = history.select(col(historyDigestCol).as("digest"))
    // first-cycle guard: a zero-row Bloom aggregate returns NULL (no
    // filter), and an empty history needs no dedup at all.
    // isEmpty is a limit-1 probe — trivial at any history size.
    // The early return honors the same contract as the main path: result
    // persisted AND materialized (DigestStore.dedupCycle's append and the
    // caller's aggregation each re-read it; cycle 1 is the LARGEST
    // increment, the worst place to recompute the digest shuffle twice).
    if (hist.isEmpty) {
      val p = inc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      return p
    }
    // the increment aggregate feeds BOTH the probable-dup probe and the
    // final anti-join. What makes the caching pay is the CROSS-ACTION
    // shape, not the in-plan sharing (AQE already reuses the identical
    // digest-grouping exchange stage within one action — SCALE.md "within
    // one action" note): the eager result below is consumed again by the
    // digest-store append write and the caller's own aggregation, each a
    // separate action that would otherwise recompute the whole pipeline.
    // The increment cache exists only for the result's materialization and
    // is released before returning; the result comes back persisted
    // (callers release it when consumed). Measured flat at sf0.1.
    val incP = inc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // expectedItems <= 0 → size the Bloom to the ACTUAL history (a
    // parquet count is metadata-only for a stored digest table): the
    // r16 fixed-constant audit found the old fixed 2^20 default silently
    // degrading — the history grows without bound across crawl cycles,
    // and once it exceeds the sizing the fpp decays toward 1, so the
    // "prefilter" passes everything and every cycle broadcasts a
    // near-increment-sized probe set. Correctness never depended on it
    // (the confirmation join is exact); the SIZING did. An explicit
    // expectedItems remains the knob for callers whose history table is
    // expensive to count (e.g. a view over raw logs).
    val items = if (expectedItems > 0) expectedItems
      else math.max(1L, hist.count())
    // native codegen'd Bloom build + probe (plans.BloomExpressions): the
    // isEmpty guard above means the aggregate always sees >=1 row here
    val bloom = graft.plans.BloomExpressions
      .buildBloom(hist, col("digest"), items, fpp).get
    val probable = incP.filter(
      graft.plans.BloomExpressions.mightContain(bloom, col("digest")))
    // exact confirmation: history-side scan, dup-bound broadcast joins
    val confirmed = hist
      .join(broadcast(probable.select(col("digest"))), Seq("digest"), "left_semi")
    val out = incP.join(broadcast(confirmed), Seq("digest"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    incP.unpersist()
    out
  }

  /** Drop training documents flagged by [[contamination]]. The flagged-id
    * set is contamination-sized (small), so the anti-join broadcasts. */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13, minHits: Long = 1): DataFrame = {
    val bad = contamination(train, bench, idCol, textCol, n, minHits)
      .select(col("doc_id").as("_contaminated_id"))
    train.join(broadcast(bad), train(idCol) === col("_contaminated_id"),
      "left_anti")
  }
}
