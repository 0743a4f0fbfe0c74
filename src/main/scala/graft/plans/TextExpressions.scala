package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle expression for the dedup hot path.
  *
  * Produces exactly the strings of the composed-builtin formulation in
  * [[graft.functions.Dedup.shingles]] — `split(text, " ")` (regex split,
  * limit -1: empty words from doubled/leading/trailing spaces are KEPT),
  * then each window of `n` consecutive words joined by a single space;
  * fewer than `n` words → empty array. TextExprSpec pins the equivalence
  * on the real corpus plus the whitespace edge cases.
  *
  * Why an Expression: the composed form routes every document through four
  * interpreted higher-order functions (`transform(sequence, slice,
  * concat_ws)`) that allocate per SHINGLE — measured ~6 µs per shingle at
  * sf0.1, which made signature generation the dominant cost of the whole
  * minhash family. This single JVM pass builds each shingle once from the
  * raw bytes. Shingling feeds an explode (generator) whose output rows are
  * strings either way — the expression only removes interpreter overhead,
  * not data movement, so the 100 TB shuffle shape is unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    // regex " " matches only the literal space byte, so splitting on the
    // raw bytes is equivalent to Spark's split(text, " ") — including the
    // limit=-1 behavior of keeping trailing empty words
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
    // word start offsets (word w spans [starts(w), starts(w+1) - 2 + 1))
    val starts = new Array[Int](nWords + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = bytes.length + 1
    val out = new Array[Any](nWords - n + 1)
    var s = 0
    while (s <= nWords - n) {
      // words s..s+n-1 joined by " " are a contiguous byte range of the
      // input (the separators between them ARE single spaces)
      val from = starts(s)
      val until = starts(s + n) - 1 // drop the trailing separator
      out(s) = UTF8String.fromBytes(bytes, from, until - from)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object TextExpressions {
  /** Native shingle array (see [[WordShingles]]). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expr(text), n))
}
