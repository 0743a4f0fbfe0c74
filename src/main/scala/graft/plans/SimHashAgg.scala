package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Single-pass SimHash vote aggregate: maintains all `nBits` per-bit vote
  * counters in one primitive `long[nBits]` buffer and emits the finished
  * signature (bit i set iff its vote sum is positive), instead of `nBits`
  * separate conditional-sum aggregate slots each re-evaluating its
  * shift/mask projection per row.
  *
  * Values are bit-identical to the n-separate-aggregates formulation: the
  * per-bit vote is the same order-independent integer sum of ±1 over token
  * hashes, and the sign threshold (`> 0`) is identical — NearDupSpec's
  * mode-invariance cases and the q_dedup_simhash oracle (which recomputes
  * signatures in SQL) pin the equivalence.
  *
  * Reference: the simhash fold of the reference's keyed aggregations
  * (src/operator/mod.rs keyed folds) — partial-aggregating Spark twin, same
  * rationale as the minhash family's fused signature pass
  * ([[MinHashRowExpr]]): one buffer update per row instead of 64
  * separate codegen'd aggregate slots. */
case class SimHashAgg(child: Expression, nBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  // analysis-time rejection (the JaroWinklerExpr discipline): the update
  // loop casts to Long — a non-long hash column would otherwise pass
  // analysis and kill every task with a runtime ClassCastException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_agg needs a bigint hash input, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < nBits) {
        buf(i) += (((h >> i) & 1L) << 1) - 1L // +1 if bit set, else -1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < nBits) { if (buf(i) > 0) sig |= 1L << i; i += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  /** Finished `nBits`-bit signature over the (Long) token-hash column. */
  def signature(h: Column, nBits: Int): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expr(h), nBits).toAggregateExpression())
}
