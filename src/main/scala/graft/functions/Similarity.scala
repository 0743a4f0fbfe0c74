package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: exact baseline. The dot product is a
  *    sequential Catalyst `aggregate` fold over `zip_with` — codegen'd, no
  *    UDF, deterministic order of FP accumulation.
  *  - LSH-bucketed ANN: the scale path. Random-hyperplane signs (planes
  *    derived from a hash, no RNG state) give a 16-bit bucket; candidates
  *    are bucket-local, so the pairwise cost is per-bucket quadratic rather
  *    than corpus quadratic. Probing adjacent buckets (1-bit flips) trades
  *    recall for cost.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (deterministic FP
    * order). Kept as the composed-builtin reference implementation; the hot
    * paths below use the fused native expression (bitwise-identical —
    * VectorExprSpec — and ~4× faster on the pairwise score join). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Fused codegen dot product (graft.plans.DotProduct). */
  def dotFast(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dotFast(a, a))

  /** dot / (na·nb) with zero-norm inputs scored 0.0 instead of NaN.
    * The guard matters because Spark TOTAL-orders NaN ABOVE every real
    * number: an unguarded all-zero embedding (failed encoder, padding
    * row) would top every top-k ranking and pass every `sim >= minSim`
    * near-dup filter — the int8 path (`int8TopK`) always guarded this;
    * every float cosine site now routes through here too. */
  private[functions] def cosineOf(dot: Column, na: Column, nb: Column): Column =
    when(na * nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))

  def cosine(a: Column, b: Column): Column =
    cosineOf(dot(a, b), norm(a), norm(b))

  /** Per-label centroid cosine — the embedding QA pass: how well does each
    * vector agree with its own label's centroid (mislabeled or corrupt
    * embeddings score low; feed the bottom quantile to review or drop).
    *
    * Scale shape: the centroid is a (labels × dim)-row partial-aggregated
    * mean (vectors explode once, map-side combine collapses per
    * partition), collected into a LABELS-row array table and broadcast
    * back — the per-row score is then one narrow fused-dot pass; the
    * corpus never joins on anything wider than its label. Cosines round
    * to `dp` decimals (the cross-engine tolerance absorbing double-sum
    * association order, as everywhere in this family). */
  def centroidCosine(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, dp: Int = 6): DataFrame = {
    val e = df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("label"), col("i"), col("x").cast("double").as("x"))
    val cent = e.groupBy(col("label"), col("i")).agg(avg(col("x")).as("c"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("cvec"))
    val dv = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), col(labelCol).as("label"), dv.as("v"))
      .join(broadcast(cent), Seq("label"))
      .select(col(idCol), col("label"),
        round(cosineOf(dotFast(col("v"), col("cvec")),
          norm(col("v")), norm(col("cvec"))), dp).as("cos_centroid"))
  }

  /** Symmetric per-vector int8 quantization — the storage/IO compression
    * step for embedding tables (4 bytes/dim → 1: the shape FAISS/ScaNN
    * store the corpus in, rescaling at score time). scale = max|xᵢ|/127;
    * codeᵢ = round(xᵢ/scale) ∈ [-127, 127]; an all-zero vector gets
    * scale 0 and zero codes. Per-dim dequant error is ≤ scale/2
    * (spec-pinned). Zero shuffle — one narrow codegen pass; every
    * arithmetic step (float→double cast, abs, max, /127.0, /scale,
    * round-half-away) is reproduced verbatim by the SQL oracle, so codes
    * are bit-checkable. Returns (idCol, scale, codes array<byte>). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    // fused single-pass native expression (plans.QuantizeInt8Expr) — the
    // composed form below is the readable specification; VectorExprSpec
    // pins them value-identical on corpus + edges
    df.select(col(idCol).cast("long").as(idCol),
        graft.plans.VectorExpressions.quantizeInt8Native(col(vecCol)).as("_q"))
      .select(col(idCol), col("_q").getField("scale").as("scale"),
        col("_q").getField("codes").as("codes"))

  /** The composed-builtin formulation of [[quantizeInt8]] — kept as the
    * readable specification of the arithmetic (each step is what the SQL
    * oracle replays; the native expression is pinned equal to it). */
  def quantizeInt8Composed(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
        transform(col(vecCol), x => x.cast("double")).as("_v"))
      .withColumn("scale",
        array_max(transform(col("_v"), x => abs(x))) / lit(127.0))
      .select(col(idCol), col("scale"),
        transform(col("_v"), x =>
          when(col("scale") === 0.0, lit(0).cast("byte"))
            .otherwise(round(x / col("scale"), 0).cast("byte"))).as("codes"))

  /** Inverse of [[quantizeInt8]]: codeᵢ·scale back to doubles. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Top-k by QUANTIZED cosine, scored entirely from int8 codes: the
    * per-vector scales cancel in the cosine, so
    * sim = Σcₐc_b / √(Σcₐ²·Σc_b²) needs only small-integer sums —
    * order-independent (bit-identical under any partitioning, unlike
    * float dot products) and reading a 4×-smaller corpus. The 100 TB
    * shape: the corpus is stored as [[quantizeInt8]] codes; the
    * full-precision vectors are never touched at query time (the
    * symmetric-int8 sibling of the PQ/ADC path — exact w.r.t. the codes,
    * ~1–3% cosine error w.r.t. the floats, spec-bounded). Zero vectors
    * score 0 (not NaN). Ranks with id tie-break like [[bruteForceTopK]]. */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String,
      maxQueryId: Long, k: Int, roundTo: Int = 6): DataFrame = {
    // fused integer dot (plans.IntDotProduct): identical values to the
    // composed aggregate(zip_with(cast,cast)) fold the oracle replays —
    // exact integer math, codegen'd once per candidate pair
    val iDot = (a: Column, b: Column) =>
      graft.plans.VectorExpressions.intDotNative(a, b)
    val v = quantizeInt8(df, idCol, vecCol)
      .select(col(idCol).as("id"), col("codes"),
        iDot(col("codes"), col("codes")).as("n2"))
    val q = v.filter(col("id") < maxQueryId)
      .select(col("id").as("q_id"), col("codes").as("q_c"), col("n2").as("q_n2"))
    val c = v.select(col("id").as("c_id"), col("codes").as("c_c"), col("n2").as("c_n2"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        when(col("q_n2") === 0L || col("c_n2") === 0L, lit(0.0))
          .otherwise(round(iDot(col("q_c"), col("c_c")).cast("double") /
            sqrt((col("q_n2") * col("c_n2")).cast("double")), roundTo)).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact top-k neighbors by cosine for the query vectors (`idCol < maxQueryId`)
    * against the whole corpus. Ranks on a rounded similarity with id
    * tie-break so results are stable across engines and partitionings. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      maxQueryId: Long, k: Int, roundTo: Int = 6): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val q = v.filter(col("id") < maxQueryId)
      .select(col("id").as("q_id"), col("vec").as("q_vec"),
        norm(col("vec")).as("q_norm"))
    val c = v.select(col("id").as("c_id"), col("vec").as("c_vec"),
      norm(col("vec")).as("c_norm"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosineOf(dotFast(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm")), roundTo).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The default-mode ±1 plane matrix for `bits` planes (shared with the
    * SQL-function registration in [[graft.plans.GraftExtensions]]). */
  private[graft] def xxSignMatrix(bits: Int): Seq[Seq[Double]] =
    (0 until bits).map(p => (0 until MaxSignDim).map(i => xxSign(p, i)))

  /** 16-bit random-hyperplane bucket. Plane components are ±1 derived from
    * xxhash64(plane, dim) — deterministic, identical on every executor.
    *
    * The plane matrix is data-independent, so the ±1 signs are computed ONCE
    * here on the driver (reproducing Spark's xxhash64 chain exactly via
    * catalyst's XXH64) and embedded as array literals — round 2 re-hashed
    * per (row × plane × dim) through interpreted higher-order functions,
    * which dominated the ANN queries' runtime. Values are bit-identical to
    * that formulation (same signs, same fold order; NearDupSpec pins it). */
  def lshBucket(vec: Column, bits: Int = 16): Column = {
    val signs: Seq[Seq[Double]] = xxSignMatrix(bits)
    // fused single-pass vote loop (graft.plans.LshBucket) — bit-identical to
    // the composed aggregate(zip_with(...)) folds (NearDupSpec pins it
    // against the original per-row-hash formulation), but stays in codegen
    // with zero per-row allocation: this is the scan cost of bucketing the
    // corpus, the dominant term of the ANN queries before fusing
    graft.plans.VectorExpressions.lshBucketNative(vec, signs)
  }

  /** Driver-side twin of `xxhash64(lit(p), i)` bit 13 → ±1: Spark folds the
    * children left-to-right from seed 42, each via XXH64.hashInt. */
  private def xxSign(p: Int, i: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h = XXH64.hashInt(i, XXH64.hashInt(p, 42L))
    if (((h >> 13) & 1L) == 1L) 1.0 else -1.0
  }

  /** Driver-side twin of the oracle's sign derivation:
    * `('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT & 1` — the plane
    * matrix is data-independent, so it is computed ONCE here and embedded as
    * array literals instead of re-hashing per (row × plane × dim). */
  private def md5Sign(p: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 1L) 1L else -1L
  }

  /** Max dimensionality the pre-built sign matrices cover (both hash modes).
    * 2048 spans every common embedding size (768/1024/1536/2048); the matrix
    * stays a driver-side constant (16 planes × 2048 doubles ≈ 256 KB) and
    * vectors are sliced to their actual length, so small dims pay nothing.
    * Signs beyond index 511 extend the same hash chains, so buckets for
    * dims ≤ 512 are unchanged. */
  private val MaxSignDim = 2048

  /** Cross-engine-deterministic variant of [[lshBucket]]: coordinates are
    * quantized to integers (`floor(x * 1e6)`) and the ±1 plane signs come
    * from the portable md5-derived hash, so every vote is exact integer
    * arithmetic — bit-identical in the DuckDB oracle, immune to FP
    * summation order. Same algorithm (dense random hyperplanes), different
    * hash source; quantization error is irrelevant to a hash. */
  def lshBucketPortable(vec: Column, bits: Int): Column = {
    val qv = transform(vec, x => floor(x.cast("double") * lit(1e6)).cast("long"))
    val planeBits = (0 until bits).map { p =>
      val signs: Seq[Long] = (0 until MaxSignDim).map(i => md5Sign(p, i))
      // slice to the vector length so zip_with stays null-free
      val signCol = slice(typedlit(signs), lit(1), size(vec))
      val v = aggregate(zip_with(qv, signCol, (x, s) => x * s),
        lit(0L), (acc, x) => acc + x)
      when(v > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    val bucket = planeBits.reduce((a, b) => a.bitwiseOR(b))
    // beyond MaxSignDim the sign slice would null-pad and every vote
    // would go null → bucket 0 for all rows; fail loudly instead
    when(size(vec) <= MaxSignDim, bucket)
      .otherwise(raise_error(concat(lit(
        s"lshBucketPortable supports dim <= $MaxSignDim, got "),
        size(vec).cast("string"))).cast("long"))
  }

  /** ANN via LSH buckets: neighbors are searched only within the query's
    * bucket. Returns per-query top-k among bucket-mates (may have < k rows —
    * the recall/cost tradeoff, stated in the result by `bucket`).
    *
    * `multiprobe = true` additionally probes every 1-bit-flip neighbor of
    * the query's bucket (the standard LSH recall lever: a near neighbor that
    * disagrees on ONE hyperplane is still found). Cost scales the QUERY side
    * by bits+1 — the corpus side is untouched, so at 100 TB the probe count
    * multiplies only the small side of the join. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      maxQueryId: Long, k: Int, bits: Int = 16, roundTo: Int = 6,
      portable: Boolean = false, multiprobe: Boolean = false): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket",
        if (portable) lshBucketPortable(col("vec"), bits)
        else lshBucket(col("vec"), bits))
    val q0 = v.filter(col("id") < maxQueryId)
      .select(col("id").as("q_id"), col("vec").as("q_vec"),
        norm(col("vec")).as("q_norm"), col("bucket"))
    val q =
      if (!multiprobe) q0
      else q0.select(col("q_id"), col("q_vec"), col("q_norm"),
        explode(array(col("bucket") +: (0 until bits).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val c = v.select(col("id").as("c_id"), col("vec").as("c_vec"),
      norm(col("vec")).as("c_norm"), col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("bucket"),
        round(cosineOf(dotFast(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm")), roundTo).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer assigns every vector
    * to its nearest centroid's list; a query scores only the vectors in its
    * `nprobe` nearest lists. The classic FAISS-style scale path: candidate
    * cost is (nprobe/nlist) of the corpus, recall tunable via nprobe.
    *
    * Everything distributed: lists are a (cluster → vectors) partitioning,
    * the probe set is computed per query against the broadcast centroids,
    * and the scoring join shuffles on the cluster id. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      maxQueryId: Long, k: Int, nlist: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 5, roundTo: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.algorithms.KMeans

    // nlist <= 0 → corpus-adaptive (the semanticDedupPairs discipline):
    // hold list population ~1024 so per-probe scan cost stays CONSTANT as
    // the corpus grows — a fixed nlist makes every probed list grow
    // linearly with n, and with query count also ~n the total goes
    // quadratic, the exact failure mode the r14 100× sweep caught in
    // q_semantic_dedup. The adaptive cluster count then makes BOTH n×k
    // terms super-linear (assignment and per-query probe selection), so
    // past the 64-list routing threshold auto mode trains a two-level
    // residual quantizer: assignment at n×2√k (KMeans.assignTwoLevel) and
    // probe selection at √k + nprobe·√k per query (nearest coarse cells,
    // then fine ranking only inside them). Explicit-nlist callers keep the
    // flat path and its exact probe ranking bit-for-bit.
    val pts = KMeans.prep(df, idCol, vecCol)
    val effNlist =
      if (nlist > 0) nlist
      else {
        val chosen = autoNlist(pts.count())
        System.err.println(s"[graft-scale] ivfTopK auto nlist=$chosen")
        chosen
      }
    val twoLevel = nlist <= 0 && effNlist > 64

    // the returned top-k plan references the assignment table lazily, so
    // hand the GC-managed localCheckpoint blocks to the plan and release
    // the persist the trainer made — repeated ANN calls must not
    // accumulate session-lifetime cached tables (semanticDedupPairs'
    // explicit-unpersist discipline, adapted for a lazy return value)
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val queries0 = v.filter(col("id") < maxQueryId)
      .as[(Long, Array[Double])]

    val (asg, queries) = if (!twoLevel) {
      // flat quantizer: train on the corpus (deterministic init)
      val assigned =
        KMeans.assignWithCentroidsPrepped(pts, effNlist, kmeansIters)
      val centroidsB = spark.sparkContext.broadcast(assigned.centroids)
      val a = assigned.assignments.localCheckpoint()
      assigned.assignments.unpersist()
      // per-query probe set: nprobe nearest centroids (tiny loop over nlist)
      val q = queries0.flatMap { case (id, vec) =>
        val ctr = centroidsB.value
        val dists = ctr.indices.map { c =>
          var d = 0.0; var i = 0
          val cc = ctr(c)
          while (i < vec.length) { val t = vec(i) - cc(i); d += t * t; i += 1 }
          (c.toLong, d)
        }
        dists.sortBy(t => (t._2, t._1)).take(nprobe)
          .map { case (c, _) => (id, vec, c) }
      }
      (a, q)
    } else {
      val model =
        KMeans.assignTwoLevelPreppedModel(pts, effNlist, kmeansIters)
      val coarseB = spark.sparkContext.broadcast(model.coarse)
      val fineB = spark.sparkContext.broadcast(model.fine)
      val kf = model.kf
      val a = model.assignments.localCheckpoint()
      model.assignments.unpersist()
      // two-level probe: rank the nprobe nearest COARSE cells, then rank
      // fine residual cells only within them — √k + nprobe·√k distances
      // per query instead of k. Distances to a composed cell (C_c + F_f)
      // are computed on the round6-snapped residual, the SAME snapping the
      // assignment used, so a query lands first on its own vector's list.
      val q = queries0.flatMap { case (id, vec) =>
        val coarse = coarseB.value
        val fine = fineB.value
        val dc = coarse.indices.map { c =>
          var d = 0.0; var i = 0
          val cc = coarse(c)
          while (i < vec.length) { val t = vec(i) - cc(i); d += t * t; i += 1 }
          (c, d)
        }
        val topCoarse =
          dc.sortBy(t => (t._2, t._1)).take(math.min(nprobe, coarse.length))
        val cells = topCoarse.flatMap { case (c, _) =>
          val cc = coarse(c)
          val r = new Array[Double](vec.length)
          var i = 0
          while (i < vec.length) {
            r(i) = KMeans.round6(vec(i) - cc(i)); i += 1
          }
          fine.indices.map { f =>
            var d = 0.0; var j = 0
            val ff = fine(f)
            while (j < r.length) { val t = r(j) - ff(j); d += t * t; j += 1 }
            (c.toLong * kf + f, d)
          }
        }
        cells.sortBy(t => (t._2, t._1)).take(nprobe)
          .map { case (cell, _) => (id, vec, cell) }
      }
      (a, q)
    }
    pts.unpersist()

    val lists = v.join(asg.withColumnRenamed("id", "c_id0"),
        col("id") === col("c_id0"))
      .select(col("id").as("c_id"), col("vec").as("c_vec"),
        norm(col("vec")).as("c_norm"), col("cluster"))

    val queriesDf = queries
      .toDF("q_id", "q_vec", "cluster")
      .withColumn("q_norm", norm(col("q_vec")))

    val scored = queriesDf.join(lists, Seq("cluster"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosineOf(dotFast(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm")), roundTo).as("sim"))
      .distinct() // a candidate can appear via several probed lists
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Incremental embedding near-dup: pair a NEW batch of vectors against a
    * stored (id, vec, bucket, nrm) corpus — the embedding-side twin of
    * [[graft.functions.Dedup.minhashNearDupsIncremental]]. Emits
    * new×existing and new×new pairs above `minSim`, never
    * existing×existing; increments compose to the full-corpus
    * [[cosineNearDups]] (pinned in NearDupSpec). Returns (pairs, newSide):
    * append `newSide` to the store after the pairs are consumed.
    *
    * 100 TB shape: the bucket join probes with the increment only; the
    * corpus side ships one row per vector, bucket-bounded fan-out.
    * `existing` is typically a parquet table partitioned by `bucket`.
    * `bits` is FROZEN with the stored corpus (increments must bucket the
    * same way — the frozen-quantizer append discipline); size it for the
    * corpus you EXPECT via [[autoBits]] at store creation, not for the
    * first increment. */
  def cosineNearDupsIncremental(newDf: DataFrame, existing: DataFrame,
      idCol: String, vecCol: String, minSim: Double, bits: Int = 12,
      portable: Boolean = false): (DataFrame, DataFrame) = {
    val newSide = newDf.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket",
        if (portable) lshBucketPortable(col("vec"), bits)
        else lshBucket(col("vec"), bits))
      .withColumn("nrm", norm(col("vec")))
    // unionByName, NOT positional union: a stored corpus read back from a
    // bucket-PARTITIONED parquet table arrives with the partition column
    // appended LAST — (id, vec, nrm, bucket) against newSide's (id, vec,
    // bucket, nrm) — and a positional union would silently swap bucket
    // and nrm on one side (widened long↔double, no analysis error)
    val allSide = existing.select(col("id"), col("vec"), col("bucket"),
      col("nrm")).unionByName(newSide)
    val pairs = newSide
      .select(col("id").as("n_id"), col("vec").as("n_vec"),
        col("nrm").as("n_nrm"), col("bucket"))
      .join(allSide.select(col("id").as("o_id"), col("vec").as("o_vec"),
        col("nrm").as("o_nrm"), col("bucket")), Seq("bucket"))
      .filter(col("n_id") =!= col("o_id"))
      .select(least(col("n_id"), col("o_id")).as("a_id"),
        greatest(col("n_id"), col("o_id")).as("b_id"),
        round(cosineOf(dotFast(col("n_vec"), col("o_vec")),
          col("n_nrm"), col("o_nrm")), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
      .distinct()
    (pairs, newSide)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): k-means clusters the embedding space, then pairwise
    * cosine runs ONLY within a cluster — the cluster count bounds the
    * quadratic, which is the whole scale lever of the technique (vs the
    * hyperplane buckets of [[cosineNearDups]]: k-means adapts to the data's
    * density, so clusters stay balanced where fixed hyperplanes can't).
    * Returns (a_id, b_id, sim), sim rounded to 6 dp; resolve to a keep set
    * with [[graft.functions.Dedup.nearDupClusters]].
    *
    * nlist = 1 degenerates to the full exact pairwise cosine — the provable
    * configuration the catalog oracle checks (the q_ann_ivf trick).
    * 100 TB: one shuffle on the cluster id; per-cluster work is
    * cluster-size-quadratic, so nlist scales with the corpus (FAISS-style
    * sizing), and the k-means rounds themselves reduce to k×dim doubles per
    * partition. */
  /** Corpus-adaptive sizing for the candidate-quadratic ops. The scale
    * contract of both SemDeDup clustering and hyperplane bucketing is that
    * PER-GROUP population stays constant as the corpus grows, so candidate
    * pair volume (groups × pop²/groups = n × pop) stays LINEAR in the
    * corpus. A fixed nlist/bits breaks that silently: the round-14 100×
    * sweep measured q_semantic_dedup at 128× wall per 10× decade — nlist=16
    * let cluster population grow 10× per decade, so pair volume grew 100×.
    * Floors keep the sf0.1 test plans bit-identical (n=2000 → 16 / 8). */
  def autoNlist(n: Long, targetClusterRows: Long = 1024L): Int =
    math.max(16L, (n + targetClusterRows - 1) / targetClusterRows)
      .min(Int.MaxValue).toInt

  /** Hyperplane count such that expected bucket population ≈
    * targetBucketRows: buckets = 2^bits ≈ n / target. Planes are a fixed
    * family indexed by position, so bits=k+1 strictly refines bits=k and
    * pairs(bits hi) ⊆ pairs(bits lo) — NearDupSpec pins it. */
  def autoBits(n: Long, targetBucketRows: Long = 64L): Int = {
    val buckets = math.max(1.0, n.toDouble / targetBucketRows)
    math.max(8, math.ceil(math.log(buckets) / math.log(2.0)).toInt).min(48)
  }

  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      minSim: Double, nlist: Int = 16, kmeansIters: Int = 2,
      targetClusterRows: Long = 1024L): DataFrame = {
    // nlist <= 0 → corpus-adaptive: hold cluster population ~targetClusterRows
    // (default 1024) so the within-cluster pairwise stays linear in the
    // corpus (n × target pairs). The n × nlist assignment term this leaves
    // is the standard IVF trade (brute-force over centroids); past the
    // 64-cluster routing threshold below it drops to n × 2√nlist via the
    // two-level residual assignment. Sizing counts the PREPPED points (the
    // rows training actually sees — a raw df.count() would re-scan the
    // input AND over-count null id/vec rows KMeans.prep drops); the same
    // persisted dataset then feeds both trainings and the pair join, so
    // sizing rides the cache-materialization pass training needs anyway.
    val pts = graft.algorithms.KMeans.prep(df, idCol, vecCol)
    // try/finally from the moment each cache exists: a failure anywhere in
    // sizing, training, assignment, or the pair materialization must not
    // strand the points (or assignment) blocks in a long-lived session
    try {
      val k =
        if (nlist > 0) nlist
        else {
          val n = pts.count()
          val chosen = autoNlist(n, targetClusterRows)
          System.err.println(
            s"[graft-scale] semanticDedupPairs auto nlist=$chosen " +
              s"(corpus n=$n, target cluster ~$targetClusterRows rows)")
          chosen
        }
      // above the floor the cluster count grows with the corpus, so the
      // single-level n×k assignment is itself super-linear — switch to the
      // two-level residual assignment (n × 2√k); explicit nlist callers keep
      // the single-level labels their specs pin
      val assigned =
        if (nlist <= 0 && k > 64)
          graft.algorithms.KMeans.assignTwoLevelPrepped(pts, k, kmeansIters)
        else graft.algorithms.KMeans.assignPrepped(pts, k, kmeansIters)
      try {
        val v = pts.toDF("id", "vec")
          .join(assigned, Seq("id"))
          .withColumn("nrm", norm(col("vec")))
        val a = v.select(col("id").as("a_id"), col("vec").as("a_vec"),
          col("nrm").as("a_nrm"), col("cluster"))
        val b = v.select(col("id").as("b_id"), col("vec").as("b_vec"),
          col("nrm").as("b_nrm"), col("cluster"))
        val out = a.join(b, Seq("cluster"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            round(cosineOf(dotFast(col("a_vec"), col("b_vec")),
              col("a_nrm"), col("b_nrm")), 6)
              .as("sim"))
          .filter(col("sim") >= minSim)
        // assignPrepped hands back a persisted assignment table;
        // materialize the (small) pair output as GC-managed localCheckpoint
        // blocks — not a returned-still-persisted table the caller would
        // have to release — then drop the assignment and points caches
        out.localCheckpoint()
      } finally assigned.unpersist()
    } finally pts.unpersist()
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * bucket-constrained (the LSH near-dup path for embeddings). bits <= 0 →
    * corpus-adaptive via [[autoBits]] (expected bucket population ~64, so
    * candidate pairs stay linear in the corpus — the round-14 100× sweep
    * caught fixed bits=8 going quadratic at 200k vectors); the chosen value
    * is logged. A portable (oracle-recomputable) caller passes bits
    * explicitly — the SQL twin bakes the plane count. */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      minSim: Double, bits: Int = 12, portable: Boolean = false): DataFrame = {
    val nbits =
      if (bits > 0) bits
      else {
        // count what actually buckets: null id/vec rows drop out of the
        // bucket join anyway, and counting them would overestimate n
        val n = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
          .count()
        val chosen = autoBits(n)
        System.err.println(
          s"[graft-scale] cosineNearDups auto bits=$chosen " +
            s"(corpus n=$n, target bucket ~64 rows)")
        chosen
      }
    val v = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket",
        if (portable) lshBucketPortable(col("vec"), nbits)
        else lshBucket(col("vec"), nbits))
      .withColumn("nrm", norm(col("vec")))
    val a = v.select(col("id").as("a_id"), col("vec").as("a_vec"),
      col("nrm").as("a_nrm"), col("bucket"))
    val b = v.select(col("id").as("b_id"), col("vec").as("b_vec"),
      col("nrm").as("b_nrm"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosineOf(dotFast(col("a_vec"), col("b_vec")),
          col("a_nrm"), col("b_nrm")), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
      .distinct()
  }
}
