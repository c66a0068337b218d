package graft.pipeline

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich et al. 2016): merge learning
  * on a bounded driver-side sample — the standard practice, tokenizers
  * train on samples and apply at corpus scale — and a native codegen
  * encode expression so the apply step fuses into the scan pipeline at
  * 100 TB (replacing [[TextOps.bpeishTokenCount]]'s regex proxy with the
  * real merge-table algorithm).
  *
  * Convention: words are whitespace tokens; each word's symbol sequence
  * is its characters plus a final `"</w>"` end-of-word marker, so merges
  * can capture suffixes without crossing word boundaries.
  */
object Bpe {

  /** End-of-word marker symbol. */
  val EndOfWord = "</w>"

  /** Per-word symbol cap: the greedy encode is O(len²) per word (each
    * merge pass rescans the pairs), so a single multi-megabyte unbroken
    * "word" in hostile crawl text would pin an executor for hours.
    * Words longer than this emit as ONE piece (word + `</w>`) without
    * merging, and merge LEARNING skips them — no natural-language word
    * comes close (the longest real words are < 100 chars; URLs/hashes
    * past the cap are exactly the strings a subword vocabulary should
    * not learn merges from). Same posture as real tokenizers, whose
    * regex pre-tokenizers bound word length before the quadratic step.
    */
  val DefaultMaxWordLen = 512

  /** Learn `numMerges` merges from a deterministic bounded sample of the
    * corpus (`TakeOrderedAndProject` — no global sort, scales). Classic
    * frequency-greedy learning: repeatedly merge the most frequent
    * adjacent symbol pair (ties broken lexicographically so the merge
    * table is reproducible). Driver-side by design — the sample is
    * bounded by `sampleN` rows and merge learning is inherently
    * iterative; the learned table then applies distributed via
    * [[bpeTokens]].
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      sampleN: Int = 10000,
      maxWordLen: Int = DefaultMaxWordLen,
  ): Seq[(String, String)] = {
    // top-N by a deterministic portable hash of the text: reproducible
    // across runs yet UNBIASED — ordering by the raw text would train the
    // merge table on the lexicographically-smallest documents (leading
    // digits/punctuation/short docs), skewing learned merges on any real
    // corpus
    val texts = df.select(col(textCol).cast("string"))
      .orderBy(TextOps.portableTokenHash(col(textCol)), col(textCol))
      .limit(sampleN)
      .collect().map(_.getString(0))
    val wordFreq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach(t => t.trim.split("\\s+")
      .filter(w => w.nonEmpty && w.length <= maxWordLen)
      .foreach(w => wordFreq(w) += 1L))
    var words: Map[Vector[String], Long] = wordFreq.map { case (w, n) =>
      (w.map(_.toString).toVector :+ EndOfWord) -> n
    }.toMap
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    while (k < numMerges) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts((syms(i), syms(i + 1))) += n
          i += 1
        }
      }
      if (pairCounts.isEmpty) k = numMerges
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 &&
              syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> n
        }.groupMapReduce(_._1)(_._2)(_ + _)
        k += 1
      }
    }
    merges.toSeq
  }

  /** Merge table → rank map (earlier merge = lower rank = higher
    * priority during encoding).
    */
  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Greedy rank-order BPE apply to one word: repeatedly merge the
    * lowest-rank adjacent pair until none is in the table — the standard
    * GPT-2-style encode.
    */
  def encodeWord(
      word: String,
      rank: Map[(String, String), Int],
      maxWordLen: Int = DefaultMaxWordLen,
  ): Array[String] = {
    if (word.isEmpty) return Array.empty
    // the O(len²) guard — see [[DefaultMaxWordLen]]
    if (word.length > maxWordLen) return Array(word + EndOfWord)
    var syms = mutable.ArrayBuffer.empty[String]
    word.foreach(c => syms += c.toString)
    syms += EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val joined = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
        syms(bestAt) = joined
      }
    }
    syms.toArray
  }

  /** Whitespace-split text → concatenated BPE pieces of every word. */
  def encode(text: String, rank: Map[(String, String), Int],
      maxWordLen: Int = DefaultMaxWordLen): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    text.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty) out ++= encodeWord(w, rank, maxWordLen)
    }
    out.toArray
  }

  /** Codegen entry point (also used by interpreted eval). */
  def encodeUtf8(
      text: UTF8String,
      rank: Map[(String, String), Int],
  ): ArrayData =
    new GenericArrayData(
      encode(text.toString, rank).map(UTF8String.fromString(_)))

  /** Native BPE encode: `text -> array<string>` of merge pieces. The rank
    * table travels once per executor as a broadcast and the per-row call
    * fuses into whole-stage codegen (same shape as [[BloomMightContain]]).
    */
  case class BpeEncode(
      child: Expression,
      bcRanks: Broadcast[Map[(String, String), Int]],
  ) extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("bpe encode needs a string input")

    override def nullSafeEval(t: Any): Any =
      Bpe.encodeUtf8(t.asInstanceOf[UTF8String], bcRanks.value)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bcRanks", bcRanks,
        classOf[Broadcast[Map[(String, String), Int]]].getName)
      val helper = Bpe.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, t =>
        s"""${ev.value} = $helper.encodeUtf8($t,
           |  (scala.collection.immutable.Map) $bcRef.value());""".stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  /** Column form: BPE pieces of `textCol` under the learned `merges`. */
  def bpeTokens(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(ranks(merges))
    org.apache.spark.sql.GraftBridge.column(
      BpeEncode(org.apache.spark.sql.GraftBridge.expression(
        col(textCol).cast("string")), bc))
  }

  /** True subword token count under the learned tokenizer — the number a
    * packing/chunking budget should use once a merge table exists.
    * When the pieces themselves are also needed, bind [[bpeTokens]] once
    * and use the single-argument overload — this variant builds its own
    * broadcast rank table and runs the greedy encode again.
    */
  def bpeTokenCount(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Column =
    size(bpeTokens(df, textCol, merges))

  /** Token count over an already-bound [[bpeTokens]] column — reuses that
    * column's broadcast and encode instead of re-deriving both.
    */
  def bpeTokenCount(pieces: Column): Column = size(pieces)
}
