package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Predicate, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter build + probe, replacing the library's last two
  * scalar UDF probes.
  *
  * BUILD rides Spark's own `BloomFilterAggregate` (the `InjectRuntimeFilter`
  * machinery): a codegen'd partial aggregate, where the
  * `DataFrameStatFunctions.bloomFilter` it replaces is an RDD-level
  * aggregate outside codegen. Key derivation is
  * `xxhash64(cast(key AS string))` — the same child-hash convention as
  * Spark's injected runtime filters. A changed hash scheme is safe in every
  * caller because the Bloom is a PREFILTER only: false positives are
  * removed by an exact confirmation join, and might-contain has no false
  * negatives for a key inserted under the same derivation.
  *
  * PROBE is [[BloomProbe]], a custom codegen'd predicate holding the filter
  * through a BROADCAST handle — deliberately NOT Spark's
  * `BloomFilterMightContain(Literal(bytes), …)`: a megabyte binary literal
  * is rehashed (`Literal.hashCode` is O(size) on arrays) on every plan
  * transform/canonicalization pass and reserialized with every stage's
  * task binary, which measured 2.2× on the digest-store pipeline. The
  * broadcast handle keeps the plan node bytes-free; executors fetch the
  * filter once.
  *
  * 100 TB shape: the filter is numBits/8 bytes (fpp- and item-bounded,
  * never data-bounded); one broadcast fetch per executor, zero per-row UDF
  * bridge, probe stays inside whole-stage codegen. */
object BloomExpressions {

  /** One codegen'd aggregate action over `df`: the Bloom filter of `key`,
    * or None when `df` is empty (the aggregate returns NULL on zero rows —
    * callers skip prefiltering instead of NPE-ing, the `stat.bloomFilter`
    * failure mode this replaces).
    *
    * `BloomFilterAggregate` Math.min-clamps BOTH its parameters against
    * the runtime-filter session caps (4M items / 64M bits by default) —
    * sized for the optimizer's own injected filters, not for a caller
    * who budgeted a 100M-digest history. A silently clamped filter
    * saturates (fpp → 1) and the "prefilter" passes everything, so the
    * caps are raised to the requested size for the duration of the
    * build and restored after. */
  /** Serializes the cap-raise window below: without it, a concurrent
    * build's finally-restore could land between another build's conf.set
    * and its job submission, clamping that build back to the 64M-bit
    * session default — a silently saturated "prefilter" at history scale.
    * Builds are rare, corpus-scan-sized actions; serializing the conf
    * window (not the scan — the action still runs inside the lock, which
    * is the only way the raised caps provably cover its submission) is
    * the correctness-first trade. */
  private val buildLock = new Object

  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double): Option[BloomFilter] = buildLock.synchronized {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expr(key.cast("string")))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) = (conf.get(itemsKey), conf.get(bitsKey))
    try {
      conf.set(itemsKey, math.max(prevItems.toLong, expectedItems))
      conf.set(bitsKey, math.max(prevBits.toLong, numBits))
      Option(df.select(agg.as("bf")).head().getAs[Array[Byte]](0))
        .map(bytes =>
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
    } finally {
      conf.set(itemsKey, prevItems); conf.set(bitsKey, prevBits)
    }
  }

  /** One broadcast per FILTER, not per probe call: repeated probes of the
    * same filter (a crawl driver re-deriving probe columns) must not pin
    * duplicate filter-sized broadcast blocks. Keys are weak — once the
    * caller drops the filter (the documented per-cycle unpersist point),
    * the entry clears and the now-unreachable Broadcast is GC-collected by
    * ContextCleaner. */
  private val probeBroadcasts =
    new java.util.WeakHashMap[BloomFilter, Broadcast[BloomFilter]]()

  /** Codegen'd broadcast probe: might `key` be in the filter? NULL keys
    * hash like any value and may pass the prefilter; every caller's exact
    * confirmation (equi-join) then drops them, so no contract changes.
    * NOTE the key must reach here with the SAME data type the filter was
    * built on — the derivation hashes the key's own string rendering, so a
    * probe-side int 5 never matches a build-side double 5.0 (a FALSE
    * NEGATIVE, not a harmless FP); Scale.bloomPrunedJoin enforces this. */
  def mightContain(bloom: BloomFilter, key: Column): Column = {
    val bc = probeBroadcasts.synchronized {
      var h = probeBroadcasts.get(bloom)
      if (h == null) {
        h = SparkSession.active.sparkContext.broadcast(bloom)
        probeBroadcasts.put(bloom, h)
      }
      h
    }
    ColumnBridge.column(BloomProbe(bc,
      new XxHash64(Seq(ColumnBridge.expr(key.cast("string"))))))
  }
}

/** `bloom.mightContainLong(child)` over a broadcast filter handle — the
  * codegen'd probe half of [[BloomExpressions]] (see there for why not a
  * binary `Literal`). `child` is the xxhash64-derived long; XxHash64 never
  * returns null, so the predicate itself is non-nullable. */
case class BloomProbe(bloom: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom)
    // materialize the broadcast value ONCE per generated class, not per row
    val bfVar = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls) ((org.apache.spark.broadcast.Broadcast) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $bfVar.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
