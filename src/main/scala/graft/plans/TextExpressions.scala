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
  * on the real corpus plus the whitespace edge cases. NULL text → NULL
  * (the composed form's null result is conf-dependent — empty array under
  * legacy sizeOfNull i.e. ANSI off, null under ANSI — but both explode to
  * zero rows, the only consumer).
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
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = TextScan.wordStarts(bytes)
    val nWords = starts.length - 1
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
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

/** Per-ROW SimHash signature: one pass over the document's words, no
  * explode/groupBy. Bit-identical to the batch explode+vote-aggregate
  * formulation in [[graft.functions.Dedup.simhash]] (default xxhash64 mode):
  * same word split (single space, empty words skipped), same per-word
  * xxhash64 (seed 42, identical to the `xxhash64` Column function on the
  * word), same order-independent ±1 vote per bit, same `> 0` threshold —
  * StreamingSpec pins signature equality against the batch aggregate.
  *
  * This is the streaming-shaped variant: a stateful streaming operator needs
  * the signature ON the record (one row in, one signature out), where the
  * batch path amortizes via partial aggregation of exploded tokens. */
case class SimHashExpr(child: Expression, nBits: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val votes = new Array[Long](nBits)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) { // empty words are skipped, as in the batch filter
          val w = UTF8String.fromBytes(bytes, start, i - start)
          val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(w, StringType, 42L)
          var b = 0
          while (b < nBits) {
            votes(b) += (((h >> b) & 1L) << 1) - 1L
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Per-ROW minhash signature: shingle the document and fold all affine
  * minima in one pass — no explode/groupBy. Bit-identical to the batch
  * [[graft.functions.Dedup.minhashSignature]] default mode: same shingles
  * (see [[WordShingles]] — each shingle is a contiguous byte range), same
  * per-shingle xxhash64 (seed 42, ≡ the `xxhash64` Column function), same
  * wrapping affine permutations, same minima (StreamingSpec pins row ≡ batch
  * signature equality). NULL when the document has fewer than `n` words —
  * the batch explode never produces a signature row for those either.
  *
  * The streaming-shaped variant: a stateful streaming dedup needs the
  * signature ON the record, where batch amortizes via partial aggregation.
  *
  * `modP > 0` selects the PORTABLE arithmetic instead: per-shingle hash =
  * md5-derived 60 bits mod P ([[PortableHash60Expr]]'s digest, no string
  * round-trips), permutation = (h·a + b) mod P — value-identical to the
  * explode+agg portable formulation the DuckDB oracle replays (all
  * operands < 2³¹, products < 2⁶², exact in any engine). */
case class MinHashRowExpr(child: Expression, n: Int, as: Seq[Long], bs: Seq[Long],
    modP: Long = -1L)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(as.length == bs.length && as.nonEmpty)

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = TextScan.wordStarts(bytes)
    val nWords = starts.length - 1
    if (nWords < n) return null
    val mins = Array.fill(aArr.length)(Long.MaxValue)
    var s = 0
    while (s <= nWords - n) {
      val from = starts(s)
      val until = starts(s + n) - 1
      val h =
        if (modP > 0)
          PortableHash60Expr.hash60(bytes, from, until - from) % modP
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(UTF8String.fromBytes(bytes, from, until - from), StringType, 42L)
      var k = 0
      while (k < mins.length) {
        // default: wrapping Long math (matches non-ANSI `h*a + b`);
        // portable: exact mod-P arithmetic (operands < 2³¹, no wraparound)
        val p = if (modP > 0) (h * aArr(k) + bArr(k)) % modP
                else h * aArr(k) + bArr(k)
        if (p < mins(k)) mins(k) = p
        k += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashRowExpr =
    copy(child = newChild)
}

/** Per-ROW character-bigram COUNTS: one pass over the document's chars,
  * emitting (bigram, count) structs — the pre-aggregated form of
  * `explode(transform(sequence(1, length-1), i -> substring(text, i, 2)))`
  * followed by `groupBy(doc, bg).count`. Equivalence: the emitted multiset
  * {(bg, n)} per document equals the grouped explode exactly (same
  * char-boundary bigrams as SQL `substring`, TextExprSpec pins it on the
  * corpus plus unicode/degenerate edges), and every downstream consumer
  * aggregates with order-independent integer sums, so results are
  * bit-identical.
  *
  * Why an Expression: the composed form pays two interpreted higher-order
  * functions PER CHARACTER (sequence + transform + substring, each
  * allocating), then a full (doc, bigram) hash aggregate whose shuffle
  * carries one row per distinct (doc, bigram). This single JVM pass builds
  * each distinct bigram string ONCE (alphabet²-bounded per doc, not
  * position-bounded) in an open-addressed long-keyed table — bigrams are
  * ≤ 8 bytes (UTF-8 chars are ≤ 4), packed 0xFF-padded into one long
  * (0xFF never occurs in valid UTF-8, so packing is injective) — and the
  * downstream `groupBy(doc_id, bg)` disappears entirely: the explode output
  * IS the aggregate. The 100 TB shape strictly improves — one less
  * corpus-sized shuffle. */
case class CharBigramCounts(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bg", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nB = bytes.length
    // char start offsets (UTF-8 boundary walk, same boundaries as SQL substring)
    var nChars = 0
    var i = 0
    while (i < nB) { i += UTF8String.numBytesForFirstByte(bytes(i)); nChars += 1 }
    if (nChars < 2) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    i = 0
    var c = 0
    while (i < nB) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(nChars) = nB

    // shared open-addressed long->count table (TextScan.LongCountTable);
    // distinct bigrams are alphabet²-bounded, so this stays small even for
    // huge documents (a position-sized table would be O(doc length))
    val tbl = new TextScan.LongCountTable

    def pack(from: Int, until: Int): Long = {
      var k = -1L // all-ones = all-0xFF padding
      var p = from
      while (p < until) { k = (k << 8) | (bytes(p) & 0xffL); p += 1 }
      k
    }
    var b = 0
    while (b < nChars - 1) {
      val from = starts(b)
      val until = starts(b + 2)
      tbl.add(pack(from, until), from, until - from)
      b += 1
    }
    tbl.toRows(bytes)
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramCounts =
    copy(child = newChild)
}

/** Per-row distinct-CHARACTER counts — the unigram sibling of
  * [[CharBigramCounts]]: one JVM pass over the document's UTF-8 bytes
  * produces `array<struct<ch: string, n: long>>`, one entry per distinct
  * character (SQL `substring` char boundaries — TextExprSpec pins the
  * multiset equivalence against the composed explode+groupBy form on the
  * corpus plus unicode/degenerate edges). NULL text → NULL; empty → empty
  * array.
  *
  * Why an Expression: this feeds the character-entropy quality signal
  * ([[graft.functions.TextAnalysis.charEntropy]]), where the whole
  * computation collapses to a NARROW per-row pass — the per-doc
  * distribution lives in this array (alphabet-bounded, ~10²) and the
  * entropy folds over it with one `aggregate` higher-order call, so the
  * composed form's corpus-sized explode + (doc, char) hash-aggregate
  * shuffle disappears entirely. At 100 TB the signal costs exactly one
  * scan, zero Exchanges. Chars are ≤ 4 UTF-8 bytes, packed 0xFF-padded
  * into one long key (0xFF never occurs in valid UTF-8 → injective) in the
  * same open-addressed table scheme as the bigram pass. */
case class CharCounts(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ch", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_counts needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nB = bytes.length
    if (nB == 0) return new GenericArrayData(Array.empty[Any])

    // shared open-addressed long->count table (TextScan.LongCountTable);
    // distinct chars are alphabet-bounded so this stays tiny for any
    // document size. The math.min clamps a malformed trailing UTF-8 char.
    val tbl = new TextScan.LongCountTable

    var i = 0
    while (i < nB) {
      val clen = UTF8String.numBytesForFirstByte(bytes(i))
      var key = -1L // all-ones = all-0xFF padding
      var p = i
      val until = math.min(i + clen, nB)
      while (p < until) { key = (key << 8) | (bytes(p) & 0xffL); p += 1 }
      tbl.add(key, i, until - i)
      i += clen
    }
    tbl.toRows(bytes)
  }

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

/** Native text normalization — exactly
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
  * "\\s+", " "))` (the [[graft.functions.TextAnalysis.normalizeText]]
  * contract, which the dedup-family oracles replicate in SQL).
  *
  * ASCII documents (the overwhelming common case, detected by one byte
  * scan) take a single-pass byte loop: lower A–Z in place, keep [a-z0-9],
  * collapse every maximal run of anything else to one interior space, and
  * never emit leading/trailing spaces — equivalent because after `lower`
  * every non-[a-z0-9] char becomes whitespace-or-space and `\s+` collapses
  * each such run to exactly one space, which `trim` then strips at the
  * edges. Non-ASCII inputs fall back to the SAME operations the composed
  * builtins run — `UTF8String.toLowerCase`, `java.util.regex` replaceAll,
  * `UTF8String.trim` — so unicode edge cases (Turkish İ whose lowercase
  * CONTAINS ASCII i, Kelvin K → k, combining marks) are identical by
  * construction, not by re-implementation. TextExprSpec pins equality on
  * the corpus and those edges. No shuffle-shape change — a narrow map
  * either way; this removes two regex-engine passes per document. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val nonAlnum =
    java.util.regex.Pattern.compile("[^a-z0-9\\s]")
  @transient private lazy val wsRun = java.util.regex.Pattern.compile("\\s+")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      val out = new Array[Byte](bytes.length)
      var o = 0
      var pendingSpace = false
      i = 0
      while (i < bytes.length) {
        var b = bytes(i)
        if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
          if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
          pendingSpace = false
          out(o) = b
          o += 1
        } else pendingSpace = true
        i += 1
      }
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
    } else {
      val lowered = u.toLowerCase.toString
      val collapsed = wsRun.matcher(
        nonAlnum.matcher(lowered).replaceAll(" ")).replaceAll(" ")
      UTF8String.fromString(collapsed).trim()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

/** md5-derived 60-bit portable hash, natively: the value of
  * `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex chars of the
  * md5 digest read as an integer — computed as `(first 8 digest bytes as a
  * big-endian long) >>> 4`, one digest pass per row.
  *
  * Why an Expression: the composed builtin chain materializes the 32-char
  * hex string (md5), copies 15 chars (substring), renders a base-10 STRING
  * (conv), then parses it back (cast to long) — four string round-trips per
  * hashed value on every portable-mode dedup/sketch/sampling path, measured
  * as the dominant `_portable` vs production gap in BENCH. The digest itself
  * is unchanged, so the value is bit-identical to the composed form AND to
  * the DuckDB oracle's `('0x' || substr(md5(s), 1, 15))::BIGINT`
  * (TextExprSpec pins both equivalences). NULL in → NULL out. */
case class PortableHash60Expr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"portable_hash60 needs a string input, got ${child.dataType}")

  // first 15 hex chars = bytes 0..6 in full + the high nibble of byte 7 =
  // the top 60 bits of the big-endian first-8-byte word; >>> leaves the
  // top 4 result bits zero, matching the unsigned hex read
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    PortableHash60Expr.hash60(bytes, 0, bytes.length)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableHash60Expr =
    copy(child = newChild)
}

object PortableHash60Expr {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** The 60-bit value over a byte RANGE (no slice copy): top 60 bits of
    * the md5 digest — shared by the scalar expression and the per-row
    * minhash's portable mode. */
  private[plans] def hash60(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, offset, len)
    val d = md.digest()
    val first8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    first8 >>> 4
  }
}

/** Exact word-n-gram Jaccard of two documents in one pass: distinct n-gram
  * sets built from contiguous byte ranges (the [[WordShingles]] shingling,
  * single-space split with empty words kept), |A∩B| / |A∪B| as a double —
  * 0.0 when both sets are empty (the no-grams-scores-zero contract of the
  * join-based verify), NULL text → NULL.
  *
  * Why an Expression: candidate-bound near-dup verification computes this
  * once per LSH candidate pair. The set-join formulation (explode distinct
  * grams → compound-key intersection join → three size joins) builds each
  * doc's gram set once but costs ~6 shuffle stages; per-pair evaluation
  * needs ONE join to attach the two texts. Trade-off: a doc appearing in k
  * candidate pairs re-builds its gram set k times and its text rides the
  * shuffle per pair — right when candidates per doc are few (the LSH
  * regime), wrong for hub-heavy pair sets; both paths stay available and
  * NearDupSpec pins them bit-equal. */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ngram_jaccard needs string inputs, got ${left.dataType} / ${right.dataType}")

  private def gramSet(u: UTF8String): java.util.HashSet[UTF8String] = {
    val bytes = u.getBytes
    val out = new java.util.HashSet[UTF8String]()
    val starts = TextScan.wordStarts(bytes)
    val nWords = starts.length - 1
    if (nWords < n) return out
    var s = 0
    while (s <= nWords - n) {
      val from = starts(s)
      val until = starts(s + n) - 1
      out.add(UTF8String.fromBytes(bytes, from, until - from))
      s += 1
    }
    out
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = gramSet(l.asInstanceOf[UTF8String])
    val b = gramSet(r.asInstanceOf[UTF8String])
    var inter = 0L
    val it = b.iterator()
    while (it.hasNext) if (a.contains(it.next())) inter += 1
    val union = a.size.toLong + b.size.toLong - inter
    if (union == 0L) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NgramJaccard = copy(left = newLeft, right = newRight)
}

/** Scan helpers shared by the native text expressions — ONE definition of
  * the word-boundary scan and of the open-addressed count table, so a
  * boundary or probing fix cannot drift between the siblings that used to
  * inline them (WordShingles/MinHashRowExpr/NgramJaccard for the scan,
  * CharBigramCounts/CharCounts for the table). */
private[plans] object TextScan {

  /** Word start offsets of `bytes` split on the literal space byte —
    * equivalent to Spark's split(text, " "), including the limit=-1
    * behavior of keeping trailing empty words. Word w spans
    * [starts(w), starts(w+1) - 2 + 1); starts(nWords) = length + 1 is the
    * sentinel, so nWords = starts.length - 1. */
  def wordStarts(bytes: Array[Byte]): Array[Int] = {
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = bytes.length + 1
    starts
  }

  /** Open-addressed long→count table keyed by a packed span, keeping the
    * first-occurrence byte span per key. Grows by doubling at 1/2 load;
    * packed keys are seeded with all-ones padding so 0 never occurs and
    * cnt==0 marks an empty slot. Emission order is slot order — identical
    * probe constants to the previous inlined copies, so row order (and the
    * driver's hash compare) is unchanged. */
  final class LongCountTable {
    private var cap = 256
    private var keys = new Array[Long](cap)
    private var cnts = new Array[Long](cap)
    private var offs = new Array[Int](cap)
    private var lens = new Array[Int](cap)
    private var used = 0

    private def slot(key: Long, ks: Array[Long], ns: Array[Long], c: Int): Int = {
      var h = java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L) & (c - 1)
      while (ns(h) != 0 && ks(h) != key) h = (h + 1) & (c - 1)
      h
    }

    def add(key: Long, off: Int, len: Int): Unit = {
      if (used * 2 >= cap) { // grow + rehash
        val nc = cap * 2
        val nk = new Array[Long](nc); val nn = new Array[Long](nc)
        val no = new Array[Int](nc); val nl = new Array[Int](nc)
        var s = 0
        while (s < cap) {
          if (cnts(s) != 0) {
            val h = slot(keys(s), nk, nn, nc)
            nk(h) = keys(s); nn(h) = cnts(s); no(h) = offs(s); nl(h) = lens(s)
          }
          s += 1
        }
        cap = nc; keys = nk; cnts = nn; offs = no; lens = nl
      }
      val h = slot(key, keys, cnts, cap)
      if (cnts(h) == 0) { keys(h) = key; offs(h) = off; lens(h) = len; used += 1 }
      cnts(h) += 1
    }

    /** (span-string, count) rows in slot order. */
    def toRows(bytes: Array[Byte]): GenericArrayData = {
      val out = new Array[Any](used)
      var s = 0
      var o = 0
      while (s < cap) {
        if (cnts(s) != 0) {
          out(o) = org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromBytes(bytes, offs(s), lens(s)), cnts(s))
          o += 1
        }
        s += 1
      }
      new GenericArrayData(out)
    }
  }
}

object TextExpressions {
  /** Native md5-derived 60-bit portable hash (see [[PortableHash60Expr]]). */
  def portableHash60(c: Column): Column =
    ColumnBridge.column(PortableHash60Expr(ColumnBridge.expr(c)))

  /** Exact word-n-gram Jaccard per pair (see [[NgramJaccard]]). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(NgramJaccard(ColumnBridge.expr(a), ColumnBridge.expr(b), n))

  /** Native shingle array (see [[WordShingles]]). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expr(text), n))

  /** Native normalization (see [[NormalizeTextExpr]]). */
  def normalizeText(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expr(text)))

  /** Per-row char-bigram (bg, n) counts (see [[CharBigramCounts]]). */
  def charBigramCounts(text: Column): Column =
    ColumnBridge.column(CharBigramCounts(ColumnBridge.expr(text)))

  /** Per-row distinct-char (ch, n) counts (see [[CharCounts]]). */
  def charCounts(text: Column): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expr(text)))

  /** Per-row SimHash signature (see [[SimHashExpr]]). */
  def simhashRow(text: Column, nBits: Int = 64): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expr(text), nBits))

  /** Per-row minhash signature (see [[MinHashRowExpr]]); default-mode affine
    * constants come from [[graft.functions.Dedup.defaultPermConsts]];
    * `modP > 0` selects portable mod-P arithmetic. */
  def minhashRow(text: Column, shingleSize: Int, as: Seq[Long], bs: Seq[Long],
      modP: Long = -1L): Column =
    ColumnBridge.column(
      MinHashRowExpr(ColumnBridge.expr(text), shingleSize, as, bs, modP))
}
