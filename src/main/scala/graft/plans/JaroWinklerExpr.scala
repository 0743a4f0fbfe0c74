package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native Catalyst expression — the
  * spelling-similarity primitive for entity resolution / record linkage
  * (complements [[graft.functions.FuzzyJoin]]'s boolean edit-distance-1
  * predicate with a graded score and a Winkler prefix boost).
  *
  * Semantics pinned to the classic algorithm exactly as DuckDB's
  * `jaro_winkler_similarity` computes it (probed against reference
  * vectors, so the catalog query is oracle-checkable):
  *  - operates on UTF-8 BYTES (not code points);
  *  - either side empty → 0.0;
  *  - match window = max(len1, len2)/2 − 1 (integer division, floor 0);
  *  - transpositions = floor(mismatched-matched-positions / 2);
  *  - Winkler boost p = 0.1 over a ≤ 4-byte common prefix, applied only
  *    when the Jaro score exceeds 0.7.
  *
  * Division order in the Jaro formula follows the canonical
  * (m/l1 + m/l2 + (m−t)/m) / 3 shape; catalog queries round the score
  * before thresholding so a last-ulp engine difference cannot flip a
  * comparison.
  *
  * CodegenFallback (same trade as the other text expressions here): the
  * O(len·window) flag-array scan dominates the per-row cost, not the
  * eval() virtual call, and the expression stays off the UDF
  * serialization path. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two strings, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerExpr {

  /** The scalar algorithm, shared with tests. */
  def similarity(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!f2(j) && s1(i) == s2(j)) { f1(i) = true; f2(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    val half = t / 2 // integer floor, as the reference engines compute it
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - half) / md) / 3.0
    if (jaro <= 0.7) return jaro
    // Winkler boost over the ≤4-byte common prefix
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1(p) == s2(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
