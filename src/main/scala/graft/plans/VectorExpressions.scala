package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the similarity hot path: a fused
  * dot-product over two `array<float>` (or `array<double>`) columns.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the built-in
  * composition allocates an intermediate array per row and boxes the lambda
  * variables; at 100 TB of embeddings the ANN scoring join evaluates this
  * once per (query, candidate) pair — the fused loop below stays in
  * whole-stage codegen with zero allocation per row. Accumulation order is
  * ascending-index, identical to the sequential `aggregate` fold, so results
  * are bit-compatible with the composed version (asserted in
  * VectorExprSpec).
  *
  * This is preference path (b) of the build rules: compose built-ins when
  * possible (the oracle queries do), drop to a custom Expression only where
  * the hot loop justifies it.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  // Semantics match the composed aggregate(zip_with(...)) fold exactly:
  // length mismatch or a null element → NULL (zip_with null-pads the shorter
  // side and null poisons the running sum). VectorExprSpec pins this.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val aF = elemIsFloat(left); val bF = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** Position-wise match count of two long arrays — the minhash est_sim
  * numerator. Semantics match the composed
  * `aggregate(zip_with(a, b, (x,y) -> IF(x=y,1,0)), 0, +)` exactly: the
  * count runs over the shorter length (zip_with's null padding makes IF
  * yield 0 there), a null element compares unequal. At 100 TB the candidate
  * set is billions of pairs and this runs once per pair — the fused loop
  * replaces an interpreted higher-order fold (NearDupSpec pins equality). */
case class ArrayMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_match_count needs array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayMatchCount = copy(left = newLeft, right = newRight)
}

/** Integer dot product of two integral arrays, accumulated in a wrapping
  * long — the int8/PQ ANN scoring kernel (sim numerators and norms computed
  * entirely from quantized codes). Semantics match the composed
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS BIGINT)*CAST(y AS BIGINT)),
  * 0L, +)` exactly: length mismatch → NULL (zip_with null-pads, null poisons
  * the sum), a null element → NULL, accumulation in ascending index order
  * (exact integer math — order-independent anyway). At query time this runs
  * once per (query, candidate) pair over the whole corpus; the fused loop
  * replaces an interpreted higher-order fold per pair (VectorExprSpec pins
  * equality). */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def ok(dt: DataType) = dt match {
    case ArrayType(org.apache.spark.sql.types.ByteType, _) |
         ArrayType(org.apache.spark.sql.types.ShortType, _) |
         ArrayType(org.apache.spark.sql.types.IntegerType, _) |
         ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot needs integral-array inputs, got ${left.dataType} / ${right.dataType}")

  private def getter(e: Expression): (ArrayData, Int) => Long = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.ByteType, _) => (a, i) => a.getByte(i).toLong
    case ArrayType(org.apache.spark.sql.types.ShortType, _) => (a, i) => a.getShort(i).toLong
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => (a, i) => a.getInt(i).toLong
    case _ => (a, i) => a.getLong(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val ga = getter(left); val gb = getter(right)
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  private def genGet(e: Expression): String = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.ByteType, _) => "getByte"
    case ArrayType(org.apache.spark.sql.types.ShortType, _) => "getShort"
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => "getInt"
    case _ => "getLong"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = genGet(left)
    val bGet = genGet(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((long) $a.$aGet($i)) * ((long) $b.$bGet($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotProduct = copy(left = newLeft, right = newRight)
}

/** Fused int8 symmetric quantization: per-vector scale = max|x|/127 and the
  * rounded codes in ONE pass — struct(scale, codes). Value-identical to the
  * composed three-transform formulation in
  * [[graft.functions.Similarity.quantizeInt8Composed]] (float→double widen,
  * abs-max ignoring nulls, `round(x/scale, 0)` = BigDecimal HALF_UP —
  * Spark's Round on doubles — then the double→byte cast), including the
  * edges: empty vector → (null scale, empty codes), null element → null
  * code, all-null or null scale → all-null codes, scale 0 → zero codes.
  * VectorExprSpec pins the equality on the corpus plus crafted .5-tie and
  * null/empty cases, and the DuckDB oracle replays the arithmetic.
  *
  * Why an Expression: the composed form walks three interpreted
  * higher-order transforms per vector (cast, abs, round/divide) — the
  * dominant cost of the corpus-sized compression pass that precedes every
  * int8 read path. */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale",
      org.apache.spark.sql.types.DoubleType, nullable = true),
    org.apache.spark.sql.types.StructField("codes",
      ArrayType(org.apache.spark.sql.types.ByteType, containsNull = true),
      nullable = true)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 needs array<float|double>, got $dt")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    // pass 1: abs-max over non-null elements (array_max semantics)
    var maxAbs = Double.NaN
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        val ax = math.abs(x)
        // array_max uses greatest-so-far with NaN > everything (Spark's
        // ordering); replicate via java.lang.Double.compare
        if (!seen || java.lang.Double.compare(ax, maxAbs) > 0) maxAbs = ax
        seen = true
      }
      i += 1
    }
    val scale: Any = if (!seen) null else maxAbs / 127.0
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      codes(i) =
        if (scale == null) null
        else if (scale.asInstanceOf[Double] == 0.0) 0.toByte
        else if (a.isNullAt(i)) null
        else {
          val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
          val q = x / scale.asInstanceOf[Double]
          // Spark Round(double, 0): BigDecimal HALF_UP (half away from
          // zero), then the relaxed double→byte cast truncates toward zero
          val r =
            if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) q
            else java.math.BigDecimal.valueOf(q)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
          r.toByte
        }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(scale, new GenericArrayData(codes))
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Expr =
    copy(child = newChild)
}

/** Fused random-hyperplane LSH bucket: all `bits` plane votes in ONE pass
  * over the vector, with the ±1 plane matrix baked in driver-side.
  *
  * Bit-identical to the composed literal-matrix formulation in
  * [[graft.functions.Similarity.lshBucket]] (and therefore to the original
  * per-row-hash formulation NearDupSpec pins): per plane the signed sum
  * accumulates ascending-index (`acc + vec[i] * sign[p][i]`, from 0.0), a
  * null element nulls every plane's vote so the bucket is 0, and a vector
  * longer than the matrix raises the same named error. The composed form
  * walks `bits` interpreted higher-order folds per row — this is the scan
  * cost of bucketing a 100 TB corpus, so it gets the fused loop. */
case class LshBucket(child: Expression, signs: Seq[Seq[Double]])
    extends Expression with UnaryLike[Expression] {

  // fail fast DRIVER-side: an empty or ragged plane matrix would otherwise
  // surface as a per-row IndexOutOfBounds deep inside a corpus-sized scan
  require(signs.nonEmpty && signs.forall(_.length == signs.head.length),
    s"lshBucket needs a non-empty rectangular sign matrix, got rows of " +
      s"lengths ${signs.map(_.length).distinct.mkString(",")}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket needs an array<float|double> input, got $other")
    }

  @transient private lazy val signArr: Array[Array[Double]] =
    signs.map(_.toArray).toArray

  private def bucketOf(a: ArrayData): Long = {
    val n = a.numElements()
    val bits = signArr.length
    val maxDim = signArr(0).length
    if (n > maxDim)
      throw new IllegalArgumentException(s"lshBucket supports dim <= $maxDim, got $n")
    val isF = elemIsFloat
    var i = 0
    while (i < n) { // a null element nulls every plane's vote → bucket 0
      if (a.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val s = signArr(p)
      var acc = 0.0
      i = 0
      while (i < n) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * s(i)
        i += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else bucketOf(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBucketExpr", this, classOf[LshBucket].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${childGen.code}
            |boolean ${ev.isNull} = ${childGen.isNull};
            |long ${ev.value} = -1L;
            |if (!${ev.isNull}) {
            |  ${ev.value} = $self.bucketOfPublic(${childGen.value});
            |}
       """.stripMargin)
  }

  /** Codegen entry point (doGenCode calls through the reference object). */
  def bucketOfPublic(a: ArrayData): Long = bucketOf(a)

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object VectorExpressions {
  private def expr(c: Column): Expression = ColumnBridge.expr(c)
  private def column(e: Expression): Column = ColumnBridge.column(e)

  /** Fused dot product (codegen). */
  def dotNative(a: Column, b: Column): Column = column(DotProduct(expr(a), expr(b)))

  /** Fused L2 norm. */
  def normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))

  /** Fused cosine similarity. */
  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (normNative(a) * normNative(b))

  /** Fused LSH bucket over a baked-in ±1 plane matrix (see [[LshBucket]]). */
  def lshBucketNative(vec: Column, signs: Seq[Seq[Double]]): Column =
    column(LshBucket(expr(vec), signs))

  /** Position-wise match count of two long arrays (see [[ArrayMatchCount]]). */
  def matchCountNative(a: Column, b: Column): Column =
    column(ArrayMatchCount(expr(a), expr(b)))

  /** Fused integer dot product over integral arrays (see [[IntDotProduct]]). */
  def intDotNative(a: Column, b: Column): Column =
    column(IntDotProduct(expr(a), expr(b)))

  /** Fused int8 quantization → struct(scale, codes) (see [[QuantizeInt8Expr]]). */
  def quantizeInt8Native(vec: Column): Column =
    column(QuantizeInt8Expr(expr(vec)))
}
