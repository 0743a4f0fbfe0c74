package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass minhash signature aggregate: maintains ALL `n` per-permutation
  * minima in one primitive `long[n]` buffer, instead of `n` separate `min`
  * aggregate slots each re-evaluating its affine projection expression.
  *
  * Values are bit-identical to the n-separate-aggregates formulation (same
  * affine arithmetic: wrapping 64-bit when `modP <= 0`, mod-p otherwise), so
  * the two are interchangeable under the DuckDB oracle; which one runs is a
  * measured choice in [[graft.functions.Dedup.minhashSignature]].
  *
  * Reference: the per-key minhash fold of src/operator/mod.rs keyed folds —
  * this is its partial-aggregating Spark twin. */
case class MinHashAgg(child: Expression, as: Seq[Long], bs: Seq[Long],
    modP: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(as.length == bs.length && as.nonEmpty)

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(as.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < buf.length) {
        val p =
          if (modP > 0) (h * aArr(i) + bArr(i)) % modP
          else h * aArr(i) + bArr(i) // wrapping, matches non-ANSI Long math
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** `n`-minima signature column over the (Long) hash column. */
  def signature(h: Column, as: Seq[Long], bs: Seq[Long], modP: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expr(h), as, bs, modP).toAggregateExpression())
}
