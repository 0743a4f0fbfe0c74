package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Random sampling is useless for a reproducible corpus: re-running the
  * pipeline must assign every document to the same split, and an appended
  * increment must not reshuffle earlier assignments. Both operations here
  * key off a HASH of a stable id, so membership is a pure function of the
  * row — rerun-stable, increment-stable, and embarrassingly parallel (the
  * split is a narrow map stage; the stratified sample shuffles once on the
  * stratum key).
  *
  * Production paths hash with xxhash64 (codegen'd); `portable = true`
  * switches to the md5-derived 60-bit hash ([[Dedup.portableHash60]]) that
  * DuckDB reproduces bit-for-bit, making both operators oracle-checkable.
  */
object Sampling {

  private def bucketHash(c: Column, portable: Boolean): Column =
    if (portable) Dedup.portableHash60(c) else abs(xxhash64(c))

  /** Assignment bucket in [0, buckets): hash mod buckets of the id column
    * (cast to string so any id type hashes identically on both engines). */
  def hashBucket(id: Column, buckets: Int, portable: Boolean = false): Column =
    pmod(bucketHash(id.cast("string"), portable), lit(buckets.toLong))

  /** Deterministic train/validation/test split: cumulative percentage
    * thresholds over the hash bucket, e.g. Seq(("train", 80), ("val", 90),
    * ("test", 100)). A document's split never changes as the corpus grows
    * (assignment depends only on its own id). */
  def hashSplit(df: DataFrame, idCol: String,
      thresholds: Seq[(String, Int)] = Seq(("train", 80), ("val", 90), ("test", 100)),
      portable: Boolean = false): DataFrame =
    df.withColumn("split",
      assignSplit(hashBucket(col(idCol), 100, portable), thresholds))

  private def assignSplit(b: Column, thresholds: Seq[(String, Int)]): Column = {
    require(thresholds.nonEmpty && thresholds.last._2 == 100,
      s"thresholds must end at 100, got $thresholds")
    // unsorted thresholds would make later when-branches unreachable and
    // silently empty a split
    require(thresholds.map(_._2) == thresholds.map(_._2).sorted,
      s"thresholds must be ascending, got $thresholds")
    thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, upTo), rest) => when(b < upTo, name).otherwise(rest)
    }
  }

  /** Leakage-guarded train/val/test split: the assignment unit is the
    * NEAR-DUP CLUSTER, not the document, so near-duplicates can never
    * straddle the train/eval boundary — a doc-level [[hashSplit]] leaks
    * paraphrases of eval documents into train, which is exactly the
    * contamination an eval split exists to prevent. `clusters` =
    * (doc_id, cluster_id) from [[Dedup.nearDupClusters]]; documents
    * absent from it are singletons (their own cluster), so the output
    * covers the full corpus. Every member inherits the representative's
    * bucket draw; splits stay stable as the corpus grows, except that a
    * NEW near-dup edge deliberately moves a doc to its cluster's split.
    *
    * 100 TB shape: one equi join on the id — `clusters` is only the
    * near-dup subset, usually far smaller than the corpus (AQE
    * broadcasts it when small), then a narrow hash projection; no
    * shuffle beyond the join. Returns (idCol, cluster_id, bucket,
    * split). */
  def clusterSplit(df: DataFrame, idCol: String, clusters: DataFrame,
      thresholds: Seq[(String, Int)] = Seq(("train", 80), ("val", 90), ("test", 100)),
      portable: Boolean = false): DataFrame = {
    val cl = clusters.select(col("doc_id").cast("long").as("_cl_doc"),
      col("cluster_id").cast("long").as("_cl_id"))
    // ids must be non-null and numeric: a silently-null cast would miss the
    // cluster join AND null the bucket, dropping the row through the
    // when-chain into the LAST split — every bad id would land in 'test'
    // with no error. try_cast probes without throwing (ANSI casts throw
    // their own opaque error first otherwise), then the guard names ours.
    val idTry = expr(s"try_cast(`$idCol` AS BIGINT)")
    val idL = when(col(idCol).isNull || idTry.isNull,
        raise_error(concat(lit(s"clusterSplit: non-numeric or null $idCol: "),
          coalesce(col(idCol).cast("string"), lit("null")))).cast("long"))
      .otherwise(idTry)
    val unit = coalesce(col("_cl_id"), idL)
    val b = hashBucket(unit, 100, portable)
    df.join(cl, idL === col("_cl_doc"), "left")
      .select(col(idCol), unit.as("cluster_id"), b.as("bucket"),
        assignSplit(b, thresholds).as("split"))
  }

  /** Deterministic stratified sample: the k rows per stratum with the
    * smallest id-hash — a uniform-without-replacement draw per stratum
    * (hash order is pseudo-random) that every rerun reproduces. One
    * shuffle on the stratum key; ties cannot happen because the hash is
    * salted with the unique id itself. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int, portable: Boolean = false): DataFrame = {
    val h = bucketHash(col(idCol).cast("string"), portable)
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Diversity-balanced sampling: assign every row to its nearest seed
    * vector (the `nSeeds` smallest-id vectors — a deterministic, zero-
    * training quantizer), then draw the `perCluster` smallest-hash rows per
    * cluster. The embedding-space analog of stratified sampling: a uniform
    * draw over-represents dense regions; this caps every region's
    * contribution — the standard diversity step before fine-tuning-data
    * selection.
    *
    * 100 TB shape: seeds are collected once (model-sized) and ride as
    * literals; assignment is one narrow map; the per-cluster draw is
    * [[stratifiedSample]]'s single (cluster)-keyed shuffle. Distances round
    * to `dp` decimals (ties → lowest seed) so the assignment — and with the
    * portable hash, the whole sample — is reproducible by the SQL oracle. */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
      nSeeds: Int, perCluster: Int, dp: Int = 6,
      portable: Boolean = false): DataFrame = {
    val seeds = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .orderBy(col("id")).limit(nSeeds).collect()
    require(seeds.length == nSeeds, s"need $nSeeds seed vectors")
    val seedLit = typedLit(seeds.map(_.getSeq[Double](1)).toSeq)
    val v = col(vecCol).cast("array<double>")
    val dists = transform(sequence(lit(0), lit(nSeeds - 1)), c =>
      round(aggregate(zip_with(v, element_at(seedLit, c + 1),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, t) => acc + t), dp))
    val assigned = df.withColumn("cluster",
      (array_position(dists, array_min(dists)) - 1).cast("int"))
    stratifiedSample(assigned, "cluster", idCol, perCluster, portable)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    * keep the k rows with the largest key u^(1/w), u a deterministic
    * hash-derived uniform in (0,1) — each row's inclusion probability is
    * proportional to its weight, and the draw is rerun-stable (a quality-
    * or importance-weighted subset selection that doesn't reshuffle when
    * the corpus regenerates). The RANKING form is the equivalent
    * log-domain key ln(u)/w (u^(1/w) = exp(ln(u)/w), exp monotone — same
    * order), scaled to integer micro-units: the power form compresses
    * toward 1.0 as weights grow, so decimal rounding there collapses
    * large-weight rows into ties and the ordering degenerates toward the
    * id tie-break; the log form keeps ~ln(2^60)·10^`dp`/w distinct levels
    * — graceful degradation instead of a cliff. Micro-integer keys with
    * id tie-breaks make the draw reproducible by the SQL oracle. One
    * TakeOrdered at any scale — no full sort, no shuffle of losers. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      dp: Int = 6, portable: Boolean = false): DataFrame = {
    require(k > 0, s"bad k $k")
    // u in (0,1]: the hash folded to 60 bits, scaled by 2^60 (exact as a
    // double on both engines); +1 keeps u > 0 so ln stays finite
    val h = bucketHash(col(idCol).cast("string"), portable)
    val u = (pmod(h, lit(1L << 60)).cast("double") + 1.0) /
      lit((1L << 60).toDouble)
    // guard the divisor with when(): the filter alone isn't enough under
    // ANSI mode, where 1/0 in the same projection throws before pruning
    val key = round(log(u) / when(weight.cast("double") > 0,
      weight.cast("double")) * math.pow(10, dp), 0).cast("long")
    df.filter(weight.cast("double") > 0)
      .withColumn("ares_key", key)
      .orderBy(col("ares_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Uniform fraction sample via hash threshold: keeps id-hashes below
    * `fraction` of the bucket space. Unlike `df.sample` this is stable
    * across reruns AND across corpus growth.
    *
    * The hash is SALTED (`salt || "_" || id`) so sampling is independent
    * of [[hashSplit]]'s un-salted bucket: with a shared hash the moduli
    * nest (100 divides the bucket space), so a small-fraction sample
    * would land entirely in 'train' — every kept id has a small hash,
    * hence a small hash-mod-100. Change `salt` for an independent
    * re-draw; the subset-monotonicity-in-`fraction` property holds per
    * salt. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      buckets: Int = 1000000, portable: Boolean = false,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    df.filter(
      hashBucket(concat(lit(s"${salt}_"), col(idCol).cast("string")),
        buckets, portable) < (fraction * buckets).toLong)
  }

  /** Deterministic corpus-shuffle key: hash(seed || id). Ordering by it is
    * a seeded pseudo-random permutation of the corpus — the shuffle step a
    * training pipeline runs before sharding, so shards stop reflecting
    * crawl/source locality and become ~IID samples. Rerun-stable for a
    * fixed seed; change the seed for a fresh permutation. Compose with
    * [[tokenShards]] via its `orderCol`. */
  def shuffleKey(id: Column, seed: Long, portable: Boolean = false): Column =
    bucketHash(concat(lit(s"${seed}_"), id.cast("string")), portable)

  /** Domain-mixture sampling: down-sample each stratum to its target keep
    * fraction (Pile/DoReMi-style mixture reweighting, without upsampling) —
    * strata absent from the map keep `default`. Membership is a hash
    * threshold on the id, so it is rerun- and growth-stable and each
    * stratum's sample is a SUBSET of its sample at any higher fraction.
    * Thresholds are precomputed driver-side as integers (no per-row float
    * math to diverge between engines); the whole operator is a narrow map
    * stage — the fraction map travels in the plan as a literal.
    * Salted like [[hashSample]] (and for the same reason): membership
    * must be independent of [[hashSplit]]'s un-salted bucket, or a
    * low-fraction mixture falls entirely inside 'train'. */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double = 1.0,
      buckets: Int = 1000000, portable: Boolean = false,
      salt: String = "sample"): DataFrame = {
    (fractions.values ++ Seq(default)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"bad fraction $f"))
    val thresholds = fractions.map { case (k, f) => k -> (f * buckets).toLong }
    val thrCol = thresholds.foldLeft(lit((default * buckets).toLong)) {
      case (acc, (k, t)) => when(col(strataCol) === k, lit(t)).otherwise(acc)
    }
    df.filter(hashBucket(concat(lit(s"${salt}_"), col(idCol).cast("string")),
      buckets, portable) < thrCol)
  }

  /** TOKEN-budget mixture: cap each stratum (source/language/domain) at a
    * token budget instead of a document fraction — real pretraining mixes
    * are specified in tokens, and [[mixtureSample]]'s per-document hash
    * thresholds cannot hit a token target under skewed document lengths.
    * Documents are taken in seeded-pseudo-random order ([[shuffleKey]])
    * within each stratum until the budget is crossed; the FIRST document
    * crossing the boundary is kept (so every positive budget yields at
    * least one document) and strata absent from the map are kept whole.
    * Deterministic, rerun-stable, and for a fixed seed each stratum's
    * selection only ever GROWS as its budget grows (prefix property).
    * Returns (doc_id, stratum, cost).
    *
    * 100 TB shape: the same distributed two-pass prefix sum as
    * [[tokenShards]], keyed per stratum — range-repartition on
    * (stratum, order), per-(partition, stratum) partial sums (a
    * #partitions-row collect), exclusive scan on the driver, then a narrow
    * per-partition running filter. The naive `sum OVER (PARTITION BY
    * stratum ORDER BY ...)` window puts each stratum through ONE task —
    * a handful of sources at 100 TB means a handful of tasks doing all
    * the work. */
  def tokenBudgetMixture(df: DataFrame, strataCol: String, idCol: String,
      cost: Column, budgets: Map[String, Long], seed: Long = 42L,
      partitions: Option[Int] = None, portable: Boolean = false): DataFrame = {
    budgets.values.foreach(b => require(b >= 0L, s"bad budget $b"))
    val spark = df.sparkSession
    import spark.implicits._
    val (pre, _, base) =
      stratumPrefix(df, strataCol, idCol, cost, seed, partitions, portable)
    val bBudgets = spark.sparkContext.broadcast(budgets)
    // keep a doc iff its stratum's tokens BEFORE it are under the budget
    val out = pre.flatMap { case (id, st, c, before) =>
      if (bBudgets.value.get(st).forall(before < _)) Some((id, st, c)) else None
    }.toDF("doc_id", "stratum", "cost")
      // eager localCheckpoint: materialized ONCE while `base` is still hot,
      // lineage cut, and the blocks are GC-managed — persist() here leaked a
      // cached table per call for the session's lifetime
      .localCheckpoint()
    base.unpersist()
    out
  }

  /** Exact integer square root (Newton), the α=1/2 temperature weight —
    * driver-side, on #strata values. */
  private[graft] def isqrt(n: Long): Long = {
    require(n >= 0L, s"isqrt of negative $n")
    if (n == 0L) 0L
    else {
      var x = math.max(1L, math.sqrt(n.toDouble).toLong)
      // integer Newton, then clamp both ways; comparisons use the
      // overflow-safe identity x² ≤ n ⟺ x ≤ n div x (x² itself can wrap
      // near Long.MaxValue)
      var next = (x + n / x) / 2
      while (next < x) { x = next; next = (x + n / x) / 2 }
      while (x + 1 <= n / (x + 1)) x += 1
      while (x > n / x) x -= 1
      x
    }
  }

  /** Temperature-flattened mixture (the mC4/XLM-R α-sampling rule): derive
    * each stratum's token budget FROM the corpus itself — q_i ∝ n_i^α over
    * the per-stratum token masses n_i — then cap strata at those budgets.
    * α < 1 flattens the distribution: head languages/sources are
    * down-weighted, tail ones keep (relatively) more, which is how
    * multilingual pretraining mixes avoid English swallowing the budget.
    *
    * Arithmetic: budgets b_i = ⌊totalBudget · w_i / Σw⌋ with integer
    * weights — α=1/2 uses the EXACT integer square root (cross-engine
    * reproducible: DuckDB's floor(sqrt(n)) agrees for n < 2^51, far past
    * any real stratum mass), α=1 uses n_i itself; other α values take the
    * double-pow path (deterministic on a platform, not oracle-exact —
    * the catalog query pins α=1/2). Products go through BigInt so a
    * 10^12-token budget times a 10^7 weight cannot overflow.
    *
    * 100 TB shape: the mass aggregation is one partially-aggregated
    * groupBy collecting #strata rows driver-side (bounded); selection is
    * [[tokenBudgetMixture]]'s distributed two-pass prefix sum. Returns its
    * (doc_id, stratum, cost) plus the derived budget per row. */
  def temperatureMixture(df: DataFrame, strataCol: String, idCol: String,
      cost: Column, totalBudget: Long, alpha: Double = 0.5,
      seed: Long = 42L, partitions: Option[Int] = None,
      portable: Boolean = false): DataFrame = {
    require(totalBudget > 0L, s"bad totalBudget $totalBudget")
    require(alpha > 0.0 && alpha <= 1.0, s"bad alpha $alpha")
    val masses: Seq[(String, Long)] = df
      .groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(sum(cost).as("n"))
      .collect().toSeq
      .map(r => (r.getString(0), math.max(0L, r.getLong(1))))
    val weights: Seq[(String, Long)] = masses.map { case (k, n) =>
      val w =
        if (alpha == 0.5) isqrt(n)
        else if (alpha == 1.0) n
        else math.round(math.pow(n.toDouble, alpha))
      (k, w)
    }
    val wSum = weights.map(w => BigInt(w._2)).sum
    val budgets: Map[String, Long] = weights.map { case (k, w) =>
      (k, if (wSum == 0) 0L else (BigInt(totalBudget) * w / wSum).toLong)
    }.toMap
    val bCol = budgets.foldLeft(lit(-1L)) { case (acc, (k, b)) =>
      when(col("stratum") === k, lit(b)).otherwise(acc)
    }
    tokenBudgetMixture(df, strataCol, idCol, cost, budgets, seed,
      partitions, portable)
      .withColumn("budget", bCol)
  }

  /** Epoch-based mixture: hit each stratum's TOKEN budget by REPEATING the
    * stratum when the budget exceeds its size — the upsampling half of a
    * pretraining mix ([[tokenBudgetMixture]] can only cap). A stratum with
    * budget B and total tokens T contributes ⌊B/T⌋ full epochs of every
    * document plus a partial epoch: the seeded-order prefix holding the
    * remaining B mod T tokens (first budget-crossing doc kept, exactly
    * [[tokenBudgetMixture]]'s selection rule — with B < T this operator IS
    * tokenBudgetMixture plus an `epoch = 0` column). Strata absent from the
    * map contribute one full epoch. Returns (doc_id, stratum, cost, epoch),
    * epoch in [0, ⌊B/T⌋]; deterministic, rerun-stable, and for a fixed seed
    * a stratum's output only grows with its budget.
    *
    * `maxEpochs` fails fast when a budget implies an absurd repeat count
    * (a mis-scaled budget would explode the output by B/T ×; real mixes
    * repeat rare sources single-digit times).
    *
    * 100 TB shape: the same distributed per-stratum two-pass prefix sum as
    * [[tokenBudgetMixture]] (range exchange + #partitions×#strata-row
    * collect + narrow running maps); totals fall out of the same pass-1
    * collect, the epoch plan is driver-computed and broadcast, and the
    * repeat is a narrow flatMap whose amplification IS the requested
    * output size. */
  def epochMixture(df: DataFrame, strataCol: String, idCol: String,
      cost: Column, budgets: Map[String, Long], seed: Long = 42L,
      maxEpochs: Long = 1000L, partitions: Option[Int] = None,
      portable: Boolean = false): DataFrame = {
    budgets.values.foreach(b => require(b >= 0L, s"bad budget $b"))
    val spark = df.sparkSession
    import spark.implicits._
    val (pre, totals, base) =
      stratumPrefix(df, strataCol, idCol, cost, seed, partitions, portable)
    // `base` is persisted by stratumPrefix; the finally releases it even
    // when the maxEpochs guard throws (out is materialized before return)
    try {
      // epoch plan per stratum: (full epochs, remainder tokens)
      val plan: Map[String, (Long, Long)] = totals.map { case (st, total) =>
        st -> (budgets.get(st) match {
          case None => (1L, 0L)
          case Some(_) if total == 0L => (0L, 0L)
          case Some(b) => (b / total, b % total)
        })
      }
      plan.foreach { case (st, (full, _)) =>
        require(full <= maxEpochs,
          s"stratum $st: budget implies $full epochs > maxEpochs $maxEpochs") }
      val bPlan = spark.sparkContext.broadcast(plan)
      val out = pre.flatMap { case (id, st, c, before) =>
        val (full, rem) = bPlan.value.getOrElse(st, (1L, 0L))
        val copies = full + (if (before < rem) 1L else 0L)
        (0L until copies).map(e => (id, st, c, e))
      }.toDF("doc_id", "stratum", "cost", "epoch")
        .localCheckpoint() // eager; GC-managed blocks, no session-life leak
      out
    } finally { base.unpersist(); () }
  }

  /** Shared engine for the token-budget mixtures: per-stratum EXCLUSIVE
    * prefix sums in seeded pseudo-random order. Returns (rows, totals,
    * base): `rows` = (doc_id, stratum, cost, tokensBefore) where
    * `tokensBefore` is the stratum's tokens strictly before the doc in
    * ([[shuffleKey]], id) order; `totals` = tokens per stratum (free from
    * pass 1); `base` = the persisted range-partitioned input the caller
    * must unpersist after materializing its output (range bounds are
    * sampled — recomputation could repartition differently and corrupt the
    * offsets). [[globalPrefix]] is the unstratified sibling — a fix to one
    * engine's offset logic almost certainly applies to the other.
    * The naive `sum OVER (PARTITION BY stratum ORDER BY ...)`
    * window puts each stratum through ONE task — a handful of sources at
    * 100 TB means a handful of tasks doing all the work; this is the
    * distributed two-pass prefix sum instead (range exchange,
    * #partitions × #strata rows to the driver, narrow running maps). */
  private def stratumPrefix(df: DataFrame, strataCol: String, idCol: String,
      cost: Column, seed: Long, partitions: Option[Int], portable: Boolean)
      : (org.apache.spark.sql.Dataset[(Long, String, Long, Long)],
         Map[String, Long], DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = partitions.getOrElse(math.max(df.rdd.getNumPartitions, 1))
    val ord = shuffleKey(col(idCol), seed, portable)
    val base = df.select(col(strataCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("doc_id"),
        ord.cast("long").as("_ord"), cost.cast("long").as("cost"))
      .repartitionByRange(p, col("stratum"), col("_ord"), col("doc_id"))
      .sortWithinPartitions("stratum", "_ord", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = base.as[(String, Long, Long, Long)].rdd
    // pass 1: per-(partition, stratum) token sums — #partitions × #strata
    // rows to the driver (strata are mixture components: a handful)
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (st, _, _, c) => m.update(st, m.getOrElse(st, 0L) + c) }
      Iterator((i, m.toVector))
    }.collect().sortBy(_._1)
    // exclusive scan: tokens of each stratum BEFORE each partition
    val running = scala.collection.mutable.Map.empty[String, Long]
    val offsets = partSums.map { case (_, sums) =>
      val snapshot = sums.map { case (st, _) => st -> running.getOrElse(st, 0L) }.toMap
      sums.foreach { case (st, s) => running.update(st, running.getOrElse(st, 0L) + s) }
      snapshot
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: narrow running annotation from each partition's offsets
    val pre = rdd.mapPartitionsWithIndex { (i, it) =>
      val run = scala.collection.mutable.Map[String, Long]() ++ bOffsets.value(i)
      it.map { case (st, id, _, c) =>
        val before = run.getOrElse(st, 0L)
        run.update(st, before + c)
        (id, st, c, before)
      }
    }.toDS()
    (pre, running.toMap, base)
  }

  /** CCNet-style perplexity tiering (Wenzek et al. 2020 §4.3: rank the
    * corpus by LM score, cut into head/middle/tail thirds, train on
    * head+middle): exact global rank of each SCORED document by
    * (score desc, id), cut at the ntile-3 boundaries (first tiers take the
    * ceil), `kept` = head|middle. Documents with `gramsCol` = 0 (too short
    * to score — their 0.0 score would otherwise outrank everything) tier
    * as `unscored`, kept = false, and do not consume rank slots.
    *
    * Ranking orders on the integer surrogate floor(score·1e9) (ties then
    * broken by id): the score is an engine-bit-identical double (see
    * [[NgramLm]]'s integer-micro discipline), so the surrogate — and hence
    * the tiering — is reproducible by the SQL oracle, where raw
    * double-ordering ULP ties would not be.
    *
    * 100 TB shape: the rank is [[globalPrefix]] with cost 1 — the
    * distributed two-pass prefix sum (range exchange + #partitions-row
    * collect + narrow running annotation), never a one-task global window;
    * the tier cut is integer arithmetic against the scored count, riding
    * the plan as literals. Returns (doc_id, score, tier, kept). */
  def perplexityTiers(scored: DataFrame, idCol: String, scoreCol: String,
      gramsCol: String): DataFrame = {
    val in = scored.select(col(idCol).cast("long").as("doc_id"),
      col(scoreCol).cast("double").as("score"),
      col(gramsCol).cast("long").as("n_grams"))
    val rankable = in.filter(col("n_grams") > 0)
    // n comes back from globalPrefix's pass-1 partial sums (cost 1 sums
    // to the row count) — a separate rankable.count() would be a third
    // full scan of the scored corpus
    val (starts, base, n) = globalPrefix(rankable, "doc_id", lit(1L),
      Some(-floor(col("score") * 1e9).cast("long")), None)
    val tier = when(col("rank") * 3 < n, "head")
      .when(col("rank") * 3 < 2 * n, "middle")
      .otherwise("tail")
    val ranked = rankable.select(col("doc_id"), col("score"))
      .join(starts.select(col("doc_id"), col("c0").as("rank")), Seq("doc_id"))
      .select(col("doc_id"), col("score"), tier.as("tier"),
        (col("rank") * 3 < 2 * n).as("kept"))
    val out = ranked.unionByName(
        in.filter(col("n_grams") <= 0).select(col("doc_id"), col("score"),
          lit("unscored").as("tier"), lit(false).as("kept")))
    // eager GC-managed blocks, not a returned-still-persisted table; the
    // finally keeps an exception from stranding the prefix cache
    try out.localCheckpoint()
    finally { base.unpersist(); () }
  }

  /** Deterministic negative sampling for contrastive training pairs: for
    * every anchor document, `k` pseudo-random partner documents drawn
    * uniformly from the corpus — negative j of anchor a is the document at
    * position hash(a, j) mod N in doc_id order, bumped one slot if it would
    * be the anchor itself. Fully deterministic given the hash mode (the
    * oracle replays position assignment, hashing and the self-exclusion
    * bump), so pair sets are reproducible across runs and engines — the
    * property a training-data pipeline needs for resumable epoch builds.
    *
    * 100 TB shape: positions come from the distributed two-pass prefix sum
    * ([[globalPrefix]] with cost 1 — never a one-task global window); the
    * draw is a narrow hash projection; resolving positions to documents is
    * ONE equi join on `pos` carrying k·N well-spread rows. Returns
    * (anchor_id, j, neg_id). */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      portable: Boolean = false): DataFrame = {
    require(k >= 1, s"need k >= 1 negatives, got $k")
    val (starts, base, n) = globalPrefix(df.select(col(idCol)), idCol,
      lit(1L), None, None)
    require(n >= 2, s"need >= 2 documents to draw negatives, got $n")
    var pos: DataFrame = null
    try {
      pos = starts.select(col("doc_id"), col("c0").as("pos"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val anchors = pos
        .select(col("doc_id").as("anchor_id"), col("pos").as("a_pos"))
        .withColumn("j", explode(array((0 until k).map(lit): _*)))
      val key = concat(col("anchor_id").cast("string"), lit("#"),
        col("j").cast("string"))
      val h =
        if (portable) Dedup.portableHash60(key)
        else greatest(abs(xxhash64(key)), lit(0L))
      val raw = h % lit(n)
      val tgt = when(raw === col("a_pos"), (raw + lit(1L)) % lit(n))
        .otherwise(raw)
      anchors.select(col("anchor_id"), col("j").cast("long").as("j"),
          tgt.as("t_pos"))
        .join(pos.select(col("doc_id").as("neg_id"), col("pos").as("t_pos")),
          "t_pos")
        .select(col("anchor_id"), col("j"), col("neg_id"))
        // MATERIALIZE before the finally releases pos/base: the anchors
        // side and the join side both reference pos, and globalPrefix's
        // range-repartition re-samples bounds on recomputation — a lazy
        // return evaluated after unpersist could rebuild the two sides
        // against DIFFERENT partition boundaries and emit wrong pairs
        // (the tokenShards/packSequences localCheckpoint discipline)
        .localCheckpoint()
    } finally {
      // release BOTH caches — pos outlived the call in earlier revisions,
      // leaking a cached table per invocation for the session's lifetime
      if (pos != null) pos.unpersist()
      base.unpersist(); ()
    }
  }

  /** Contiguous token-budget sharding: documents ordered by id are packed
    * into shards of ~`budget` cost units (tokens) — shard(d) = exclusive
    * prefix sum of cost before d, integer-divided by the budget. This is the
    * shard-manifest step of a training pipeline (split a curated corpus into
    * ~equal-token files in a stable order). Returns (doc_id, cost, shard).
    *
    * 100 TB shape: the naive formulation is `sum(cost) OVER (ORDER BY id)` —
    * a GLOBAL window, which Spark executes on a single partition (the whole
    * corpus through one task). This instead runs the classic distributed
    * two-pass prefix sum: range-repartition by id, per-partition partial
    * sums (a #partitions-row collect), exclusive-scan the offsets on the
    * driver, then a per-partition running sum starting at each offset —
    * fully parallel with one range exchange. The RDD stage is one of the
    * rare genuinely-imperative per-partition computations Catalyst cannot
    * express.
    *
    * The range-partitioned input is persisted while both passes run (range
    * bounds are sampled, so recomputation could repartition differently and
    * corrupt the offsets); the small (id, cost, shard) manifest output is
    * materialized, then the input cache is released. */
  def tokenShards(df: DataFrame, idCol: String, cost: Column, budget: Long,
      partitions: Option[Int] = None, orderCol: Option[Column] = None): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    val (starts, base, _) = globalPrefix(df, idCol, cost, orderCol, partitions)
    try {
      // shard = exclusive prefix before the doc, integer-divided by budget;
      // `div` keeps the division exact past 2^53 total tokens
      val out = starts
        .select(col("doc_id"), col("cost"), expr(s"c0 div $budget").as("shard"))
        .localCheckpoint() // eager; GC-managed blocks, no session-life leak
      out
    } finally { base.unpersist(); () }
  }

  /** Shared global engine of [[tokenShards]] and [[packSequences]]: the
    * distributed two-pass EXCLUSIVE prefix sum of `cost` in (`orderCol`,
    * id) order — range-repartition, per-partition partial sums (a
    * #partitions-row collect), driver exclusive scan, narrow running
    * annotation. The id tie-break keeps the order well-defined when the
    * order key collides (e.g. a hashed shuffleKey); ids are assumed
    * unique. [[stratumPrefix]] is the stratified sibling (per-stratum
    * offsets tracked per partition); a fix to one engine's offset logic
    * almost certainly applies to the other.
    *
    * Returns (starts, base): `starts` = (doc_id, cost, c0) with c0 the
    * tokens strictly before the doc, a narrow map over `base`; `base` =
    * the persisted range-partitioned input the CALLER must unpersist
    * after materializing anything derived from `starts` (range bounds
    * are sampled — recomputation could repartition differently and
    * corrupt the offsets). */
  private def globalPrefix(df: DataFrame, idCol: String, cost: Column,
      orderCol: Option[Column], partitions: Option[Int])
      : (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = partitions.getOrElse(math.max(df.rdd.getNumPartitions, 1))
    val ord = orderCol.getOrElse(col(idCol).cast("long"))
    val base = df.select(col(idCol).cast("long").as("doc_id"),
        ord.cast("long").as("_ord"), cost.cast("long").as("cost"))
      .repartitionByRange(p, col("_ord"), col("doc_id"))
      .sortWithinPartitions("_ord", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = base.as[(Long, Long, Long)].rdd
    val sums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(s += _._3); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val starts = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { case (id, _, c) => val c0 = run; run += c; (id, c, c0) }
    }.toDF("doc_id", "cost", "c0")
    // the grand total rides out for free (offsets.last = Σcost — with
    // cost 1 it's the row count): callers must NOT re-scan to count
    (starts, base, offsets.last)
  }

  /** Exact global quantile buckets (deciles, percentiles, …) WITHOUT a
    * one-partition window: rank every row in (`orderCol`, id) order via
    * the distributed two-pass prefix sum, then bucket = rank·q / N by
    * exact integer arithmetic. The curriculum/winsorization primitive —
    * "which quality decile is this document in" — computed at any corpus
    * size where the textbook `ntile() OVER (ORDER BY …)` collapses onto
    * one task. `orderCol` must be integer-valued (scale fractional scores
    * before calling — exactness of the bucket edges depends on it).
    * Returns (doc_id, rank, bucket) with rank 0-based and bucket in
    * [0, q). */
  def quantileBuckets(df: DataFrame, idCol: String, orderCol: Column, q: Int,
      partitions: Option[Int] = None): DataFrame = {
    require(q >= 1, s"need q >= 1 buckets, got $q")
    // n rides out of globalPrefix's pass-1 sums (cost 1) — no count() job
    val (starts, base, n) = globalPrefix(df, idCol, lit(1L),
      Some(orderCol), partitions)
    try {
      starts
        .select(col("doc_id"), col("c0").as("rank"),
          expr(s"(c0 * ${q}L) div ${math.max(n, 1L)}L").as("bucket"))
        .localCheckpoint() // same contract as the siblings: eager, GC-managed
    } finally { base.unpersist(); () }
  }

  /** Sequence packing — the final pretraining stage: documents concatenate
    * (in `orderCol, id` order) into fixed-`seqLen`-token training rows,
    * documents SPLIT across row boundaries (contiguous packing, zero
    * padding waste — the GPT-style regime, vs. greedy whole-doc packing).
    * Emits one segment per (document × training row) overlap:
    *
    *   (doc_id, cost, row_id, doc_off, row_off, len)
    *
    * — "`len` tokens of `doc_id` starting at `doc_off` land in row
    * `row_id` at offset `row_off`". Every value derives from the corpus
    * prefix sum by integer arithmetic, so the manifest is deterministic,
    * partition-independent, and cheap to re-emit incrementally.
    *
    * 100 TB shape: the same distributed two-pass prefix sum as
    * [[tokenShards]] (range exchange + #partitions-row collect + narrow
    * running sum), then a narrow per-doc explode of its covered rows —
    * segments per doc = 1 + cost/seqLen, so the manifest is linear in
    * corpus tokens / seqLen. The single-partition global-window cumsum
    * this replaces is the classic driver-funnel scale bug. */
  def packSequences(df: DataFrame, idCol: String, cost: Column, seqLen: Long,
      partitions: Option[Int] = None,
      orderCol: Option[Column] = None): DataFrame = {
    require(seqLen > 0, s"bad seqLen $seqLen")
    val (starts, base, _) = globalPrefix(df, idCol, cost, orderCol, partitions)
    try {
      val L = lit(seqLen)
      val out = starts
        .filter(col("cost") > 0)
        .select(col("doc_id"), col("cost"), col("c0"),
          // `div` is exact integer division — Column./ is double division,
          // which loses exactness past 2^53 total tokens
          explode(sequence(expr(s"c0 div $seqLen"),
            expr(s"(c0 + cost - 1) div $seqLen"))).as("row_id"))
        .select(col("doc_id"), col("cost"), col("row_id"),
          (greatest(col("c0"), col("row_id") * L) - col("c0")).as("doc_off"),
          (greatest(col("c0"), col("row_id") * L) - col("row_id") * L).as("row_off"),
          (least(col("c0") + col("cost"), (col("row_id") + 1) * L)
            - greatest(col("c0"), col("row_id") * L)).as("len"))
        .localCheckpoint() // eager; GC-managed blocks, no session-life leak
      out
    } finally { base.unpersist(); () }
  }

  // =====================================================================
  // DSIR-style importance resampling (hashed n-gram features)
  // =====================================================================

  /** Word unigrams + adjacent bigrams over the corpus single-space-token
    * convention (the dedup-family convention: split on ' ', drop empties).
    * Bigrams join with a space — unambiguous, since unigrams contain none. */
  def wordGrams(text: Column): Column = {
    val ws = filter(split(coalesce(text, lit("")), " "), w => w =!= "")
    val n1 = greatest(size(ws) - 1, lit(0))
    val bigrams = zip_with(
      slice(ws, lit(1), n1),
      slice(ws, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    concat(ws, bigrams)
  }

  /** Feature bucket in [0, buckets) of one gram. */
  def gramBucket(gram: Column, buckets: Int, portable: Boolean): Column =
    pmod(bucketHash(gram, portable), lit(buckets.toLong))

  /** Hashed-gram bucket counts of a corpus: (bucket, cnt) with every bucket
    * present (zeros included). One explode + partial-aggregated groupBy —
    * the shuffle carries at most `buckets` rows per map task, never grams.
    */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
      portable: Boolean = false): DataFrame = {
    val counted = df
      .select(explode(wordGrams(col(textCol))).as("g"))
      .select(gramBucket(col("g"), buckets, portable).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(buckets).toDF("bucket")
      .join(counted, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document by
    * how much more likely its hashed n-gram features are under a TARGET
    * distribution (e.g. curated/wiki-like text) than under the RAW corpus
    * distribution, then keep the top-weighted documents.
    *
    * Feature model: Laplace-smoothed bucket probabilities
    * p(b) = (cnt_b + 1) / (N + buckets) over `buckets` hashed slots.
    *
    * Scoring arithmetic per mode:
    *  - production (`portable=false`): the paper's per-gram log-likelihood
    *    ratio log p_target(b) − log p_raw(b), summed over the doc's grams
    *    (DOUBLE; sequential fold over the doc's own gram array, so the sum
    *    order is the array order — deterministic under repartition);
    *  - portable (`portable=true`): an exact integer variant — per-bucket
    *    micro-probabilities (cnt+1)·10^12 div (N+buckets) (integer floor
    *    division, positives, so Spark `div` ≡ DuckDB `//`), doc score the
    *    BIGINT sum of per-gram differences. Monotone in the same direction
    *    as the ratio and bit-reproducible cross-engine, which is what lets
    *    the DuckDB oracle check the whole pipeline end to end.
    *
    * 100 TB shape: both distributions are bounded aggregations (≤ `buckets`
    * rows cross the shuffle per map task); the per-bucket score table —
    * `buckets` rows, collected driver-side, the documented bounded
    * materialization — rides into the scoring pass as an array literal, so
    * scoring is one narrow codegen pass over the raw corpus: no join, no
    * shuffle, no gram ever leaves its partition.
    */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024,
      portable: Boolean = false): DataFrame = {
    val tCnt = bucketCounts(target, textCol, buckets, portable)
      .orderBy("bucket").collect().map(_.getLong(1))
    val rCnt = bucketCounts(raw, textCol, buckets, portable)
      .orderBy("bucket").collect().map(_.getLong(1))
    scoreWithCounts(raw, textCol, buckets, portable, tCnt, rCnt)
  }

  /** [[importanceScores]] for the common shape where the target IS a slice
    * of the raw corpus (a predicate): both bucket distributions come out of
    * ONE corpus scan (count + conditional count per bucket) instead of two —
    * at 100 TB the distribution pass is the dominant cost and this halves
    * it. Scores are identical to importanceScores(raw, raw.filter(cond)). */
  def importanceScoresBy(raw: DataFrame, targetCond: Column, idCol: String,
      textCol: String, buckets: Int = 1024,
      portable: Boolean = false): DataFrame = {
    require(buckets > 0, s"bad buckets $buckets")
    val counted = raw
      .select(targetCond.as("t"), explode(wordGrams(col(textCol))).as("g"))
      .select(col("t"), gramBucket(col("g"), buckets, portable).as("bucket"))
      .groupBy("bucket").agg(
        count(lit(1)).as("rc"),
        count_if(col("t")).as("tc"))
    val byBucket = counted.collect()
      .map(r => (r.getLong(0).toInt, (r.getLong(1), r.getLong(2)))).toMap
    val rCnt = Array.tabulate(buckets)(b => byBucket.get(b).fold(0L)(_._1))
    val tCnt = Array.tabulate(buckets)(b => byBucket.get(b).fold(0L)(_._2))
    scoreWithCounts(raw, textCol, buckets, portable, tCnt, rCnt)
  }

  private def scoreWithCounts(raw: DataFrame, textCol: String, buckets: Int,
      portable: Boolean, tCnt: Array[Long], rCnt: Array[Long]): DataFrame = {
    require(buckets > 0, s"bad buckets $buckets")
    val SCALE = 1000000000000L // 10^12 micro-prob units (portable mode)
    val tN = tCnt.sum + buckets
    val rN = rCnt.sum + buckets
    val scoresCol =
      if (portable) {
        // BigInt intermediates (the temperatureMixture discipline): the
        // Long product (cnt+1)·10^12 wraps once a bucket holds >~9.2M
        // grams — a few tens of GB of text at 1024 buckets, far below
        // the target scale. Each FINAL term is a probability × SCALE
        // ≤ SCALE, so the difference always fits back in a Long.
        val s: Seq[Long] = (0 until buckets).map(b =>
          ((BigInt(tCnt(b)) + 1) * SCALE / tN
            - (BigInt(rCnt(b)) + 1) * SCALE / rN).toLong)
        typedLit(s)
      } else {
        val s: Seq[Double] = (0 until buckets).map(b =>
          math.log((tCnt(b) + 1).toDouble / tN)
            - math.log((rCnt(b) + 1).toDouble / rN))
        typedLit(s)
      }
    val zero: Column = if (portable) lit(0L) else lit(0.0)
    raw.withColumn("score",
      aggregate(wordGrams(col(textCol)), zero, (acc, g) =>
        acc + element_at(scoresCol,
          (gramBucket(g, buckets, portable) + 1).cast("int"))))
  }

  /** Importance resampling: the k highest-scored documents, deterministic
    * under ties via the id (TakeOrdered — k rows per partition cross). */
  def importanceResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024,
      portable: Boolean = false): DataFrame =
    importanceScores(raw, target, idCol, textCol, buckets, portable)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** [[importanceResample]] over a target PREDICATE — the single-scan
    * distribution path ([[importanceScoresBy]]). */
  def importanceResampleBy(raw: DataFrame, targetCond: Column, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024,
      portable: Boolean = false): DataFrame =
    importanceScoresBy(raw, targetCond, idCol, textCol, buckets, portable)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
