package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the FAISS-style ANN memory-compression path
  * (IVF-PQ): vectors split into `m` subspaces, each subvector quantized to
  * one of `ksub` learned centroids, so a D-dim float vector stores as `m`
  * small codes (64 dims × 4 B → 8 B at m=8). Approximate distances come
  * from ADC (asymmetric distance computation): the query stays exact, each
  * doc contributes a table lookup per subspace.
  *
  * At 100 TB this is what makes billion-vector search feasible: the encoded
  * corpus is 32× smaller than the floats, the per-query cost is m integer
  * lookups per candidate, and everything here is pure Catalyst expressions —
  * codebooks ride as array literals (they are model constants, same on every
  * executor), the corpus is touched by one narrow encode pass, and scoring
  * is a broadcast of the (tiny) query side. Compose with [[IvfIndex]] for
  * the IVF-PQ shape: coarse lists bound the candidates, PQ bounds the
  * per-candidate memory.
  *
  * Determinism: sub-distances are rounded to `dp` decimals before both the
  * encode argmin (ties → lowest code) and the ADC table (scaled to integer
  * micro-units before summing), so encode and scoring are reproducible
  * bit-for-bit by an SQL oracle given the same codebook — the same
  * portability discipline as the LSH/IVF family.
  */
object ProductQuantizer {

  /** codebook(j)(c) = centroid c of subspace j, each of length dim/m. */
  final case class Model(m: Int, ksub: Int, dim: Int,
      codebook: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
    /** Flattened [m·ksub][dsub] literal column (row j·ksub+c). */
    private[ProductQuantizer] def cbLit: Column =
      typedLit(codebook.flatten.map(_.toSeq).toSeq)
  }

  /** Deterministic seed codebook: subspace slices of the `ksub` corpus
    * vectors with the smallest ids — the zero-iteration model the SQL
    * oracle can rebuild. */
  def seedModel(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Model = {
    val seeds = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .orderBy(col("id")).limit(ksub).collect()
    require(seeds.length == ksub, s"need $ksub seed vectors")
    val dim = seeds.head.getSeq[Double](1).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val cb = Array.tabulate(m, ksub) { (j, c) =>
      seeds(c).getSeq[Double](1).slice(j * dsub, (j + 1) * dsub).toArray
    }
    Model(m, ksub, dim, cb)
  }

  /** Lloyd iterations over all subspaces at once: one explode of the corpus
    * into (subspace, subvector) rows per round, nearest-centroid assign
    * against the broadcast codebook, groupBy (subspace, code) mean. The
    * codebook (m·ksub·dsub doubles) is collected per round — model-sized,
    * never corpus-sized. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
      iters: Int, dp: Int = 6): Model = {
    var model = seedModel(df, idCol, vecCol, m, ksub)
    val subs = df.select(col(vecCol).cast("array<double>").as("vec"))
      .select(explode(expr(
        s"transform(sequence(0, ${m - 1}), " +
          s"j -> struct(j AS j, slice(vec, j * ${model.dsub} + 1, ${model.dsub}) AS sv))"))
        .as("s"))
      .select(col("s.j").as("j"), col("s.sv").as("sv"))
      .persist()
    try {
      for (_ <- 0 until iters) {
        val assigned = subs.withColumn("c",
          encodeSub(col("j"), col("sv"), model, dp))
        val next = assigned
          .groupBy(col("j"), col("c"))
          .agg(array((0 until model.dsub).map(i =>
            avg(element_at(col("sv"), i + 1))): _*).as("mean"))
          .collect()
        val cb = model.codebook.map(_.map(identity)) // copy; empty clusters keep old centroid
        next.foreach { r =>
          cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
        }
        model = Model(m, ksub, model.dim, cb)
      }
      model
    } finally { subs.unpersist(); () }
  }

  /** Rounded squared L2 between `sv` and centroid `c` of subspace `j`. */
  private def subDist2(sv: Column, cbRow: Column, dp: Int): Column =
    round(aggregate(zip_with(sv, cbRow, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v), dp)

  /** argmin code for one (subspace, subvector); ties keep the lowest c.
    * Formulated as array_min + first array_position so the expression tree
    * is LINEAR in ksub — a nested when()-fold duplicates the distance
    * subtrees O(ksub²) times, which at ksub=16 already ballooned task
    * binaries past 12 MiB and aborted codegen. */
  private def encodeSub(j: Column, sv: Column, model: Model, dp: Int): Column = {
    val cb = model.cbLit
    val dists = transform(sequence(lit(0), lit(model.ksub - 1)),
      c => subDist2(sv, element_at(cb, j * model.ksub + c + 1), dp))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Encode: adds `codes` (array<int>, length m) to each row. One narrow
    * pass, no shuffle. */
  def encode(df: DataFrame, vecCol: String, model: Model,
      dp: Int = 6): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val codes = array((0 until model.m).map { j =>
      encodeSub(lit(j), slice(v, j * model.dsub + 1, model.dsub), model, dp)
    }: _*)
    df.withColumn("codes", codes)
  }

  /** ADC top-k: exact queries against the encoded corpus. Each query row
    * gains a micro-integer lookup table (m·ksub entries, built once per
    * query from the codebook literals), the corpus side contributes only
    * its codes, and the per-pair distance is m integer adds — the scored
    * join is a broadcast of the query side. Returns
    * (q_id, c_id, adc_micro, rank), ranked (adc asc, c_id asc). */
  /** Per-query ADC lookup table: m·ksub micro-integer entries, row i =
    * rounded squared L2 between the query's subvector i/ksub and centroid
    * i%ksub. */
  private def qTable(qv: Column, model: Model, dp: Int): Column = {
    val cb = model.cbLit
    val idx = expr(s"transform(sequence(0, ${model.m * model.ksub - 1}), i -> i)")
    transform(idx, i => {
      // Column `/` is double division — truncate back to the subspace id
      val j = (i / model.ksub).cast("int")
      round(subDist2(
        slice(qv, j * model.dsub + 1, lit(model.dsub)),
        element_at(cb, i + 1), dp) * 1e6, 0).cast("long")
    })
  }

  /** ADC distance: m integer lookups of `codes` into `q_table`. */
  private def adcMicro(model: Model): Column =
    aggregate(sequence(lit(0), lit(model.m - 1)), lit(0L), (acc, j) =>
      acc + element_at(col("q_table"),
        (j * model.ksub + element_at(col("codes"), j + 1) + 1).cast("int")))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adc_micro").asc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** @param excludeSelfId drop candidates whose id equals the query id —
    *                       the corpus-query shape (see IvfIndex.query's
    *                       identical contract); pass false for an external
    *                       query id space, where a coincidental collision
    *                       would silently hide a true nearest neighbor. */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, k: Int, dp: Int = 6,
      excludeSelfId: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      qTable(col(vecCol).cast("array<double>"), model, dp).as("q_table"))
    val c = encoded.select(col(idCol).cast("long").as("c_id"), col("codes"))
    val cond = if (excludeSelfId) col("q_id") =!= col("c_id") else lit(true)
    rankTopK(c.join(broadcast(q), cond)
      .select(col("q_id"), col("c_id"), adcMicro(model).as("adc_micro")), k)
  }

  /** IVF-PQ — the full FAISS shape: the coarse quantizer prunes candidates
    * to each query's `nprobe` lists ([[IvfIndex.probeAssignments]], a
    * narrow map against broadcast centroids over partition-pruned lists),
    * and PQ codes bound per-candidate memory and compute (integer ADC).
    * At nprobe = nlist the pruning is the identity, so the composition
    * provably equals flat [[adcTopK]] over the same encoded corpus —
    * pinned in PqSpec. Candidates are duplicate-free by construction:
    * every corpus vector lives in exactly one list. */
  def ivfPqTopK(built: IvfIndex.Built, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, k: Int, nprobe: Int,
      dp: Int = 6, excludeSelfId: Boolean = true): DataFrame =
    ivfPqTopK(built, encodeLists(built, model, dp), queries, idCol, vecCol,
      model, k, nprobe, dp, excludeSelfId)

  /** PQ-encode an IVF index's lists ONCE at index-build time: pass the
    * result to the pre-encoded [[ivfPqTopK]] overload (and persist or
    * parquet it alongside the index) so each query batch pays only the
    * probe + ADC — not a full-corpus re-encode. */
  def encodeLists(built: IvfIndex.Built, model: Model,
      dp: Int = 6): DataFrame =
    encode(built.lists, "c_vec", model, dp)
      .select(col("c_id"), col("cluster"), col("codes"))

  /** [[ivfPqTopK]] over pre-encoded lists (see [[encodeLists]]) — the
    * build-once/query-many shape. */
  def ivfPqTopK(built: IvfIndex.Built, encodedLists: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, model: Model,
      k: Int, nprobe: Int, dp: Int,
      excludeSelfId: Boolean): DataFrame = {
    val enc = encodedLists
    val probes = IvfIndex
      .probeAssignments(built, queries, idCol, vecCol, nprobe)
    val q = probes.select(col("q_id"), col("q_vec")).distinct()
      .select(col("q_id"), qTable(col("q_vec"), model, dp).as("q_table"))
    val candidates = probes.select(col("q_id"), col("cluster"))
      .join(enc, Seq("cluster"))
    val filtered =
      if (excludeSelfId) candidates.filter(col("q_id") =!= col("c_id"))
      else candidates
    rankTopK(filtered
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("c_id"), adcMicro(model).as("adc_micro")), k)
  }
}
