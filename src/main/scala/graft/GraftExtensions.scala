package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.binning.{Binning, UniformAxis}
import graft.dfops.Interp

/** SQL surface: exposes the engine's core scalar operators to
  * `spark.sql(...)` via the Catalyst `FunctionRegistry`, either through
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * [[GraftExtensions.register]] on a live session.
  *
  * Registered functions:
  *  - `graft_bin_uniform(x, nBins, centerLo, centerHi)` — bin index with
  *    the engine's exact kernel semantics (center-range convention,
  *    rounding guard, inclusive right edge; NULL = out of range)
  *  - `graft_tof2ev(t, d, t0, binwidth, binning, sign, e0)`
  *  - `graft_interp(x, xs, ys)` — np.interp with literal array knots
  *  - `graft_tof2ns(t, binwidth, binning)`, `graft_mm_to_ps(mm, t0)` —
  *    remaining calibration scalars
  *  - `graft_poly_hash(s, k)`, `graft_token_count(text)`,
  *    `graft_lang_id(text)`, `graft_fingerprint(text)`,
  *    `graft_simhash(text)`, `graft_hamming(a, b)` — text-pipeline scalars
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def lit(e: Expression, what: String): Any = e match {
    case Literal(v, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }
  private def d(e: Expression, what: String): Double = lit(e, what) match {
    case n: java.lang.Number => n.doubleValue()
    case v => throw new IllegalArgumentException(s"$what must be numeric, got $v")
  }
  private def i(e: Expression, what: String): Int = d(e, what).toInt
  private def darr(e: Expression, what: String): Array[Double] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
      children.map(c => d(c, what)).toArray
    case other => throw new IllegalArgumentException(
      s"$what must be an array literal, got $other")
  }

  private def col(e: Expression) = GraftBridge.column(e)
  private def ex(c: org.apache.spark.sql.Column) = GraftBridge.resolvedExpression(c)

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "graft_bin_uniform",
      new ExpressionInfo(classOf[Binning.type].getName, "graft_bin_uniform"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "graft_bin_uniform(x, nBins, centerLo, centerHi)")
        val ax = UniformAxis("_", i(args(1), "nBins"),
          d(args(2), "centerLo"), d(args(3), "centerHi"))
        ex(Binning.uniformBinIndex(col(args.head), ax))
      },
    ),
    (
      "graft_tof2ev",
      new ExpressionInfo(classOf[graft.calibrate.Energy.type].getName, "graft_tof2ev"),
      (args: Seq[Expression]) => {
        require(args.length == 7,
          "graft_tof2ev(t, d, t0, binwidth, binning, scale_sign, e0)")
        val scale = if (d(args(5), "scale_sign") >= 0) "kinetic" else "binding"
        ex(graft.calibrate.Energy.tof2ev(col(args.head), d(args(1), "d"),
          d(args(2), "t0"), d(args(3), "binwidth"), i(args(4), "binning"),
          scale, d(args(6), "e0")))
      },
    ),
    (
      "graft_interp",
      new ExpressionInfo(classOf[Interp.type].getName, "graft_interp"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_interp(x, xs_array, ys_array)")
        ex(Interp.piecewiseLinear(col(args.head),
          darr(args(1), "xs"), darr(args(2), "ys")))
      },
    ),
    (
      "graft_tof2ns",
      new ExpressionInfo(classOf[graft.calibrate.Energy.type].getName, "graft_tof2ns"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_tof2ns(t, binwidth, binning)")
        ex(graft.calibrate.Energy.tof2ns(col(args.head),
          d(args(1), "binwidth"), i(args(2), "binning")))
      },
    ),
    (
      "graft_mm_to_ps",
      new ExpressionInfo(classOf[graft.calibrate.Delay.type].getName, "graft_mm_to_ps"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_mm_to_ps(mm, time0_mm)")
        ex((col(args.head) - col(args(1))) / org.apache.spark.sql.functions.lit(0.15))
      },
    ),
    (
      "graft_poly_hash",
      new ExpressionInfo(classOf[graft.pipeline.TextOps.type].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_poly_hash(s, k)")
        ex(graft.pipeline.TextOps.polyHashFixed(col(args.head), i(args(1), "k")))
      },
    ),
    (
      "graft_token_count",
      new ExpressionInfo(classOf[graft.pipeline.TextOps.type].getName, "graft_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_count(text)")
        ex(graft.pipeline.TextOps.tokenCount(col(args.head)))
      },
    ),
    (
      "graft_lang_id",
      new ExpressionInfo(classOf[graft.pipeline.TextOps.type].getName, "graft_lang_id"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_lang_id(text)")
        ex(graft.pipeline.TextOps.langId(col(args.head)))
      },
    ),
    (
      "graft_fingerprint",
      new ExpressionInfo(classOf[graft.pipeline.TextOps.type].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_fingerprint(text)")
        ex(graft.pipeline.TextOps.fingerprint(col(args.head)))
      },
    ),
    (
      "graft_simhash",
      new ExpressionInfo(classOf[graft.pipeline.Dedup.type].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(text)")
        ex(graft.pipeline.Dedup.simhash(col(args.head)))
      },
    ),
    (
      "graft_hamming",
      new ExpressionInfo(classOf[graft.pipeline.Dedup.type].getName, "graft_hamming"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hamming(sig_a, sig_b)")
        ex(graft.pipeline.Dedup.hamming(col(args.head), col(args(1))))
      },
    ),
    (
      "graft_hash_bucket",
      new ExpressionInfo(classOf[graft.pipeline.Sampling.type].getName, "graft_hash_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash_bucket(key)")
        ex(graft.pipeline.Sampling.hashBucket(col(args.head)))
      },
    ),
    (
      "graft_sig_agreement",
      new ExpressionInfo(classOf[graft.pipeline.PositionalEqCount].getName, "graft_sig_agreement"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_sig_agreement(sig_a, sig_b)")
        graft.pipeline.PositionalEqCount(args.head, args(1))
      },
    ),
    (
      "graft_normalize_text",
      new ExpressionInfo(classOf[graft.pipeline.TextOps.type].getName, "graft_normalize_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_normalize_text(text)")
        ex(graft.pipeline.TextOps.normalizeText(col(args.head)))
      },
    ),
    (
      "graft_char_entropy",
      new ExpressionInfo(classOf[graft.pipeline.CharEntropyExpr].getName, "graft_char_entropy"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_char_entropy(text)")
        graft.pipeline.CharEntropyExpr(args.head)
      },
    ),
    (
      "graft_cosine",
      new ExpressionInfo(classOf[graft.pipeline.CosineSimExpr].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(vecA, vecB)")
        graft.pipeline.CosineSimExpr(args.head, args(1))
      },
    ),
    (
      "graft_html_text",
      new ExpressionInfo(classOf[graft.pipeline.HtmlTextExpr].getName, "graft_html_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_html_text(html)")
        graft.pipeline.HtmlTextExpr(args.head)
      },
    ),
    (
      "graft_html_markdown",
      new ExpressionInfo(classOf[graft.pipeline.HtmlMarkdownExpr].getName, "graft_html_markdown"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_html_markdown(html)")
        graft.pipeline.HtmlMarkdownExpr(args.head)
      },
    ),
    (
      "graft_tag_texts",
      new ExpressionInfo(classOf[graft.pipeline.HtmlTagTextsExpr].getName, "graft_tag_texts"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_tag_texts(xml, tag)")
        val tag = args(1) match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"tag must be a string literal, got $other")
        }
        graft.pipeline.HtmlTagTextsExpr(args.head, tag)
      },
    ),
    (
      "graft_feature_buckets",
      new ExpressionInfo(
        classOf[graft.pipeline.FeatureBucketsExpr].getName,
        "graft_feature_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_feature_buckets(text, numBuckets)")
        val b = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null =>
            v.toString.toInt
          case other =>
            throw new IllegalArgumentException(
              s"numBuckets must be an integer literal, got $other")
        }
        graft.pipeline.FeatureBucketsExpr(args.head, b)
      },
    ),
  )

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
