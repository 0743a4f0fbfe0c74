package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers the library's native
  * Catalyst expressions as SQL functions, so a pure-SQL user (spark-sql,
  * Thrift server, `spark.sql(...)`) gets the same fused hot paths as the
  * Column API — the build-preference path (c) registration point.
  *
  * Use either
  *  - `--conf spark.sql.extensions=graft.plans.GraftExtensions` (cluster
  *    submit / session builder), or
  *  - [[GraftExtensions.register]] on an already-running session.
  *
  * | SQL | Column API |
  * |---|---|
  * | `graft_dot(a, b)` | `VectorExpressions.dotNative` |
  * | `graft_lsh_bucket(vec, bits)` | `Similarity.lshBucket` |
  * | `graft_word_shingles(text, n)` | `Dedup.shingles` |
  * | `graft_char_counts(text)` | [[CharCounts]] (`TextAnalysis.charEntropy`'s scan) |
  * | `graft_simhash(text)` | per-row [[SimHashExpr]] (≡ batch `Dedup.simhash`) |
  * | `graft_minhash(text, n)` | per-row [[MinHashRowExpr]] (≡ batch `Dedup.minhashSignature`) |
  * | `graft_match_count(a, b)` | [[ArrayMatchCount]] (minhash est_sim numerator) |
  * | `graft_int_dot(a, b)` | [[IntDotProduct]] (int8 ANN scoring kernel) |
  * | `graft_portable_hash60(s)` | [[PortableHash60Expr]] (`Dedup.portableHash60`) |
  * | `graft_quantize_int8(vec)` | [[QuantizeInt8Expr]] (`Similarity.quantizeInt8`) |
  * | `graft_ngram_jaccard(a, b, n)` | [[NgramJaccard]] (per-pair exact verify) |
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // observe-only scale linter (PlanLint) — inert unless the session sets
    // spark.graft.lint=warn|fail
    ext.injectOptimizerRule(session => PlanLint.LintRule(session))
  }
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  // the 5-arg constructor: the 3-arg form's parameter order is
  // (className, DB, name), which would store the function name in the db
  // slot and the usage text as the NAME — DESCRIBE FUNCTION then shows the
  // usage sentence as the function's name and "Usage: N/A"
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) triples for every registered function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - fused dot product over two float/double arrays"),
      { args =>
        require(args.length == 2, s"graft_dot expects 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket",
        "graft_lsh_bucket(vec, bits) - random-hyperplane LSH bucket (bits planes)"),
      { args =>
        require(args.length == 2, s"graft_lsh_bucket expects 2 arguments, got ${args.length}")
        LshBucket(args(0),
          graft.functions.Similarity.xxSignMatrix(litInt(args(1), "graft_lsh_bucket", "bits")))
      }),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(text, n) - array of n-word shingles"),
      { args =>
        require(args.length == 2, s"graft_word_shingles expects 2 arguments, got ${args.length}")
        WordShingles(args(0), litInt(args(1), "graft_word_shingles", "n"))
      }),
    (FunctionIdentifier("graft_char_counts"),
      info("graft_char_counts",
        "graft_char_counts(text) - array of (ch, n) distinct-character counts"),
      { args =>
        require(args.length == 1, s"graft_char_counts expects 1 argument, got ${args.length}")
        CharCounts(args(0))
      }),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(text) - 64-bit per-document SimHash signature"),
      { args =>
        require(args.length == 1, s"graft_simhash expects 1 argument, got ${args.length}")
        SimHashExpr(args(0), 64)
      }),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(text, shingleSize) - 64-hash per-document minhash signature " +
          "(default-mode affine constants; NULL below shingleSize words)"),
      { args =>
        require(args.length == 2, s"graft_minhash expects 2 arguments, got ${args.length}")
        val (as, bs) = (0 until 64).map(graft.functions.Dedup.defaultPermConsts).unzip
        MinHashRowExpr(args(0), litInt(args(1), "graft_minhash", "shingleSize"), as, bs)
      }),
    (FunctionIdentifier("graft_match_count"),
      info("graft_match_count",
        "graft_match_count(a, b) - position-wise match count of two bigint arrays"),
      { args =>
        require(args.length == 2, s"graft_match_count expects 2 arguments, got ${args.length}")
        ArrayMatchCount(args(0), args(1))
      }),
    (FunctionIdentifier("graft_int_dot"),
      info("graft_int_dot",
        "graft_int_dot(a, b) - exact integer dot product over two integral arrays"),
      { args =>
        require(args.length == 2, s"graft_int_dot expects 2 arguments, got ${args.length}")
        IntDotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_portable_hash60"),
      info("graft_portable_hash60",
        "graft_portable_hash60(s) - md5-derived 60-bit hash, " +
          "bit-identical to ('0x' || substr(md5(s), 1, 15))::BIGINT"),
      { args =>
        require(args.length == 1,
          s"graft_portable_hash60 expects 1 argument, got ${args.length}")
        PortableHash60Expr(args(0))
      }),
    (FunctionIdentifier("graft_quantize_int8"),
      info("graft_quantize_int8",
        "graft_quantize_int8(vec) - struct(scale, codes): symmetric int8 " +
          "quantization with per-vector scale max|x|/127"),
      { args =>
        require(args.length == 1,
          s"graft_quantize_int8 expects 1 argument, got ${args.length}")
        QuantizeInt8Expr(args(0))
      }),
    (FunctionIdentifier("graft_ngram_jaccard"),
      info("graft_ngram_jaccard",
        "graft_ngram_jaccard(a, b, n) - exact distinct word-n-gram Jaccard " +
          "of two documents"),
      { args =>
        require(args.length == 3,
          s"graft_ngram_jaccard expects 3 arguments, got ${args.length}")
        NgramJaccard(args(0), args(1), litInt(args(2), "graft_ngram_jaccard", "n"))
      }))

  /** Inject the functions into an already-running session (the
    * extensions-config path only applies at session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
