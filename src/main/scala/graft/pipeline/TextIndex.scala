package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistable inverted text index — the lexical-retrieval sibling of
  * [[Ivf]]: build once over the corpus, then answer BM25 queries
  * without ever re-tokenizing 100 TB of text.
  *
  * [[TextOps.bm25]] scores a literal query against an IN-FLIGHT corpus
  * (it re-reads and re-tokenizes every document per query). This is the
  * at-rest form, shaped for the two things retrieval at corpus scale
  * needs:
  *
  *   - '''Build once, probe many''': [[build]] writes `dir/postings`
  *     (`term, id, tf, doc_len`) and `dir/vocab` (`term, df`), both
  *     PARTITIONED by `term_bucket = pmod(hash(term), nBuckets)`, plus
  *     a 1-row `dir/stats` (corpus size, average length). A query's
  *     terms hash to a handful of buckets, so the `term_bucket IN (…)`
  *     predicate is directory-level partition pruning — a 3-term query
  *     reads ~3/nBuckets of the postings bytes, not a full scan.
  *   - '''Batch search''': [[searchAll]] scores a whole DataFrame of
  *     queries in one plan — queries explode to (query, term), the
  *     term→postings equi-join is the only index-touching exchange
  *     (both sides keyed on `term`; under AQE a small query batch
  *     broadcasts), and the per-query top-k is one keyed window over
  *     scored candidates only. Decontamination sweeps (score every
  *     benchmark prompt against the training corpus) are exactly this
  *     shape: millions of queries, one pass.
  *
  * Scoring matches [[TextOps.bm25]] term for term (Lucene positive
  * idf), so an index search and an in-flight scan return identical
  * scores — parity-pinned in TextIndexSpec and oracle-checked in the
  * gate. Reference scope note: the reference engine has no retrieval
  * surface; this family is part of the training-data-pipeline brief.
  */
object TextIndex {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** [[searchAll]]'s default auto-prune rule: a query term is dropped
    * when `df > max(AutoPruneMinDf, AutoPruneFraction · nDocs)`. The
    * fraction is the standard stopword cutoff (a term in >10 % of a
    * web-scale corpus carries idf ≈ ln(1 + ~0.5/df) ≈ 0 — all exchange
    * mass, no score mass); the absolute floor keeps small corpora
    * untouched, because a df ≤ 10 000 term is cheap at ANY corpus size
    * and pruning only exists to stop the Θ(queries × Σ df) candidate
    * exchange from scaling with the corpus.
    */
  val AutoPruneFraction: Double = 0.1
  val AutoPruneMinDf: Long = 10000L

  /** Tokenize + count + write the index. Returns the postings count.
    * `nBuckets` bounds both file count and the prune ratio — at 100 TB
    * pick O(thousands) so a query touches a few directories of a few GB.
    */
  /** The in-flight postings frame `(idCol, term, tf, doc_len)` — the
    * build's corpus pass, also usable directly as [[searchAll]]'s
    * `index` when the caller already holds the corpus in a plan.
    */
  def postingsFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lens = df.select(col(idCol),
      TextOps.tokenCount(col(textCol)).as("doc_len"))
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .join(lens, Seq(idCol))
  }

  def build(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dir: String,
      nBuckets: Int = 64,
  ): Long = {
    val spark = df.sparkSession
    // sum_len rides along for exact stats merging: doc_len sums are
    // integers, so a double sum is EXACT below 2^53 total tokens and
    // merge-then-average equals rebuild-average bit for bit
    df.select(col(idCol), TextOps.tokenCount(col(textCol)).as("doc_len"))
      .agg(count(lit(1)).as("n_docs"), avg(col("doc_len")).as("avg_len"),
        sum(col("doc_len")).cast("long").as("sum_len"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    val tf = postingsFrame(df, textCol, idCol)
    // cluster each write by its partition column first (guide §6 file
    // sizing): an unclustered partitionBy write opens one file per
    // (task × bucket) — measured 1024 tiny files per index at 16 tasks ×
    // 64 buckets, paying open/close/footer per file on write and listing
    // + per-file open on every pruned read. Repartitioned, each bucket's
    // rows sit in one task → one file per bucket. Same rows, same
    // layout contract (term_bucket=… directories), same search results.
    val postings = tf
      .withColumn("term_bucket", pmod(hash(col("term")), lit(nBuckets)))
    postings.repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/postings")
    // df(term) from the postings themselves — one more bounded agg,
    // bucketed identically so vocab lookups prune the same way
    val vocab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("term_bucket", pmod(hash(col("term")), lit(nBuckets)))
    vocab.repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/vocab")
    spark.read.parquet(s"$dir/postings").count()
  }

  /** The corpus scalars `(n_docs, avg_len, n_buckets)` (1 row — bounded
    * driver state; the bucket count rides along so a search can never
    * hash into a different layout than the build wrote).
    */
  def loadStats(spark: SparkSession, dir: String): (Long, Double, Int) = {
    val r = spark.read.parquet(s"$dir/stats").head()
    (r.getLong(r.fieldIndex("n_docs")), r.getDouble(r.fieldIndex("avg_len")),
      r.getInt(r.fieldIndex("n_buckets")))
  }

  /** The buckets a term set hashes to — computed THROUGH Spark's own
    * hash expression so driver and executor can never disagree.
    */
  private def bucketsOf(spark: SparkSession, terms: Seq[String],
      nBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("term")
      .select(pmod(hash(col("term")), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** Single-query BM25 top-k against the on-disk index. The
    * `term_bucket IN (…)` predicate reaches both scans as a PARTITION
    * filter (directory skip — spec-pinned); `term IN (…)` prunes
    * within the touched files via parquet dictionary/stats.
    *
    * Output: `(idCol, bm25)` — descending rounded score, ties to the
    * lower id, top `k`.
    */
  def search(
      spark: SparkSession,
      dir: String,
      queryTerms: Seq[String],
      k: Int,
      idCol: String = "doc_id",
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val (nDocs, avgLen, nBuckets) = loadStats(spark, dir)
    val buckets = bucketsOf(spark, queryTerms, nBuckets)
    def pruned(path: String) = spark.read.parquet(path)
      .filter(col("term_bucket").isin(buckets: _*))
      .filter(col("term").isin(queryTerms: _*))
    val postings = pruned(s"$dir/postings")
    val vocab = pruned(s"$dir/vocab").select("term", "df")
    scored(postings.join(vocab, Seq("term")), idCol, nDocs, avgLen, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Batch BM25: `queries` carries `(qIdCol, termsCol: array<string>)`;
    * every query is scored in ONE plan. `index` may be the loaded
    * `dir/postings` frame or any frame with `(term, idCol, tf,
    * doc_len)`; df(term) is derived on the fly when `vocab` is None.
    *
    * Output: `(qIdCol, idCol, bm25)` — per query the top `k` by
    * descending rounded score, ties to the lower id.
    *
    * Plan shape at scale (the `index64` rehearsal measured the naive
    * form at f² shuffle — 2.5 GB at a ×16 corpus×batch): query terms
    * pre-join their df counts and BROADCAST onto the postings scan, so
    * the index side never shuffles and non-matching postings die
    * map-side; per-(query, doc) score summation is the ONE inherent
    * candidate-mass exchange (slim `(q, doc, partial sum)` rows); the
    * final ranking runs as [[TopKAgg]] — a mergeable heap whose partial
    * phase caps the second exchange at `partitions × queries × k` rows,
    * where the window form it replaces re-shuffled the whole candidate
    * set — on a real batch call [[TopKAgg.tuneForBatchSearch]] once per
    * session first, or the heap silently degrades to sort-based
    * aggregation past 128 query groups per task. Query batches are
    * assumed broadcast-sized (bounded thousands); set
    * `broadcastQueries = false` for a mega-batch and the planner falls
    * back to a shuffle join.
    *
    * That score-sum exchange is `Θ(Σ_q Σ_{t∈q} df(t))` — exact BM25's
    * irreducible cost, and it is dominated by STOPWORD-grade terms
    * (df ≈ N ⇒ idf ≈ ln(1 + ~0.5/N) ≈ 0: maximal candidate fan-out,
    * negligible score mass). The scale-killer is therefore pruned BY
    * DEFAULT: with `maxDfFraction = None` and `autoDfPrune = true` (the
    * defaults), query terms with `df > max(autoPruneMinDf,
    * `[[AutoPruneFraction]]` · nDocs)` are dropped BEFORE candidate
    * generation — the rule that kept the ×64 `index64` rehearsal at
    * 7.2 s / 199 MB where the unpruned plan aborted the box on a ~10 GB
    * exchange (NOTES.md, round 10). The absolute floor means small
    * corpora (df ≤ `autoPruneMinDf` is harmless at ANY fraction) are
    * never pruned, so behavior only changes where the unpruned plan was
    * headed for the cliff. `maxDfFraction = Some(r)` overrides with an
    * exact fractional cap (no floor); `autoDfPrune = false` restores the
    * pre-round-11 unpruned plan. A driver-side WARN names the active
    * rule and the override knobs whenever the cap can prune (no eager
    * job — searchAll stays a pure plan builder); [[termDfs]] is the
    * bounded lookup for seeing exactly which terms a query loses.
    * Ranking is exact over the survivors; a query whose terms are
    * ALL pruned returns no rows (same as a query of unindexed terms).
    */
  def searchAll(
      queries: DataFrame,
      qIdCol: String,
      termsCol: String,
      index: DataFrame,
      nDocs: Long,
      avgLen: Double,
      k: Int,
      idCol: String = "doc_id",
      vocab: Option[DataFrame] = None,
      k1: Double = 1.2,
      b: Double = 0.75,
      broadcastQueries: Boolean = true,
      maxDfFraction: Option[Double] = None,
      autoDfPrune: Boolean = true,
      autoPruneMinDf: Long = AutoPruneMinDf,
  ): DataFrame = {
    val qTerms = queries
      .select(col(qIdCol), explode(col(termsCol)).as("term")).distinct()
    val dfreq = vocab.map(_.select("term", "df")).getOrElse(
      index.groupBy(col("term")).agg(count(lit(1)).as("df")))
    // (q, term, df) is queries × terms rows — tiny; joining df here keeps
    // the candidate-mass rows from ever carrying a second join
    val qt0 = qTerms.join(dfreq, Seq("term"))
    val qt = maxDfFraction match {
      case Some(r) =>
        require(r > 0.0 && r <= 1.0, s"maxDfFraction must be in (0, 1], got $r")
        qt0.filter(col("df") <= lit(r * nDocs))
      case None if autoDfPrune =>
        val cap = math.max(autoPruneMinDf.toDouble, AutoPruneFraction * nDocs)
        // one driver-side log line per plan BUILD, never a Spark job:
        // searchAll is a lazy plan builder, and an eager dropped-term
        // census would run a cluster job at construction time for plans
        // that may never execute (the first round-11 cut did exactly
        // that when a vocab was supplied). `termDfs` is the bounded
        // lookup a caller uses to see exactly which terms the rule
        // drops; the WARN fires only when the cap is actually below the
        // corpus size (i.e. the rule CAN prune something).
        if (cap < nDocs) logger.warn(
          s"searchAll auto df-prune active: query terms with df > $cap " +
            s"of $nDocs docs are dropped before candidate generation — " +
            "their idf ≈ 0 but they dominate the candidate exchange; " +
            "override with maxDfFraction = Some(r) or autoDfPrune = false; " +
            "inspect per-term dfs with TextIndex.termDfs")
        qt0.filter(col("df") <= lit(cap))
      case None => qt0
    }
    val cand = index.join(
      if (broadcastQueries) broadcast(qt) else qt, Seq("term"))
    val perQuery = scored(cand, idCol, nDocs, avgLen, k1, b, Seq(qIdCol))
    TopKAgg.rankTopK(perQuery, qIdCol, idCol, "bm25", k)
  }

  /** Incrementally add `newDocs` to an existing index WITHOUT
    * re-tokenizing the indexed corpus: new postings append into their
    * term-bucket directories (only the delta is written), the vocab df
    * counts merge through one full-outer join materialized to a fresh
    * directory and swapped in (old → `vocab_old`, new → `vocab`, drop
    * `vocab_old` — NOT one atomic op: a crash mid-swap leaves both
    * generations on disk and `vocab` possibly absent, recoverable by
    * renaming either back), and the stats row updates from the exact
    * running `sum_len`. Returns the new corpus size.
    *
    * Caller contract: `newDocs` ids must be disjoint from the indexed
    * ids (an id-level check would cost a full postings scan — the same
    * reason [[Dedup]]'s incremental paths put disjointness on the
    * caller). Crash window: postings append first, vocab/stats after —
    * a crash between them leaves the appended postings uncounted in
    * vocab/stats, and RE-RUNNING the same merge would append those
    * postings twice. Recover by restoring the postings directory from
    * a snapshot (or rebuilding); do not blind-retry a crashed merge.
    */
  def merge(newDocs: DataFrame, textCol: String, idCol: String,
      dir: String): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    val spark = newDocs.sparkSession
    val statsRow = spark.read.parquet(s"$dir/stats").head()
    // empty batch: a no-op that must not run the swap machinery (and
    // whose null sum(_l) would NPE the stats arithmetic below)
    if (newDocs.isEmpty)
      return statsRow.getLong(statsRow.fieldIndex("n_docs"))
    val n0 = statsRow.getLong(statsRow.fieldIndex("n_docs"))
    val sum0 = statsRow.getLong(statsRow.fieldIndex("sum_len"))
    val nBuckets = statsRow.getInt(statsRow.fieldIndex("n_buckets"))

    val tf = postingsFrame(newDocs, textCol, idCol)
    tf.withColumn("term_bucket", pmod(hash(col("term")), lit(nBuckets)))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$dir/postings")

    // vocab: old + delta df counts; write to a sibling dir, then swap —
    // overwriting a directory that feeds the running plan is undefined
    val delta = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val old = spark.read.parquet(s"$dir/vocab").select("term", "df")
    old.join(delta.withColumnRenamed("df", "_d"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("_d"), lit(0L))).as("df"))
      .withColumn("term_bucket", pmod(hash(col("term")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/vocab_new")
    val hconf = spark.sparkContext.hadoopConfiguration
    val vocabPath = new HPath(s"$dir/vocab")
    val fs = vocabPath.getFileSystem(hconf)
    // recoverable swap order (NOT delete-then-rename: a crash in that
    // window loses the only vocab copy): park the old generation, move
    // the new one in, then drop the parked copy
    val oldPath = new HPath(s"$dir/vocab_old")
    fs.delete(oldPath, true) // leftover from a previous crashed swap
    require(fs.rename(vocabPath, oldPath),
      s"could not park $dir/vocab for the swap")
    require(fs.rename(new HPath(s"$dir/vocab_new"), vocabPath),
      s"could not swap $dir/vocab_new into place (old vocab parked at " +
        s"$oldPath)")
    fs.delete(oldPath, true)

    val d = newDocs.select(TextOps.tokenCount(col(textCol)).as("_l"))
      .agg(count(lit(1)), sum(col("_l")).cast("long")).head()
    val n = n0 + d.getLong(0)
    val sumLen = sum0 + d.getLong(1)
    import spark.implicits._
    Seq((n, sumLen.toDouble / n, sumLen, nBuckets))
      .toDF("n_docs", "avg_len", "sum_len", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    n
  }

  /** Map-only BM25 of a TEXT column against a frozen `(term → df)`
    * snapshot — zero shuffle: term frequencies come from one pass over
    * the bound token array, idf and length normalization fold in as
    * literals. This is the decontamination-on-ingest shape — score
    * documents as they arrive (batch or STREAM; stateless, so it lifts
    * onto readStream unchanged) against index-derived statistics
    * without touching the index again. Documents containing none of
    * the terms score 0.0 (where [[search]] returns no row).
    */
  def scoreColumn(textCol: Column, termDf: Map[String, Long], nDocs: Long,
      avgLen: Double, k1: Double = 1.2, b: Double = 0.75): Column = {
    require(termDf.nonEmpty, "empty query")
    // bind the token array ONCE (the transform(array(…)) idiom) — a
    // bare reference per term would re-split the text per term
    val score = transform(array(TextOps.tokens(textCol)), ts => {
      termDf.toSeq.sortBy(_._1).map { case (t, dfr) =>
        val idf = log(lit(1.0) +
          (lit(nDocs.toDouble) - lit(dfr.toDouble) + 0.5) /
            (lit(dfr.toDouble) + 0.5))
        val tf = size(filter(ts, x => x === lit(t))).cast("double")
        when(tf > 0.0, idf *
          (tf * (lit(k1) + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * size(ts) / lit(avgLen))))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
    }).getItem(0)
    round(score, 6)
  }

  /** The query terms' df rows as a bounded driver map (≤ |query|). */
  def termDfs(spark: SparkSession, dir: String,
      queryTerms: Seq[String]): Map[String, Long] = {
    val (_, _, nBuckets) = loadStats(spark, dir)
    val buckets = bucketsOf(spark, queryTerms, nBuckets)
    spark.read.parquet(s"$dir/vocab")
      .filter(col("term_bucket").isin(buckets: _*))
      .filter(col("term").isin(queryTerms: _*))
      .select("term", "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Sum of per-term BM25 contributions — the formula of
    * [[TextOps.bm25]] verbatim, over rows carrying
    * `(tf, df, doc_len [, extra keys])`.
    */
  private def scored(cand: DataFrame, idCol: String, nDocs: Long,
      avgLen: Double, k1: Double, b: Double,
      extraKeys: Seq[String] = Seq.empty): DataFrame = {
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val s = idf *
      (col("tf").cast("double") * (lit(k1) + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("doc_len") / lit(avgLen)))
    cand.withColumn("_s", s)
      .groupBy((extraKeys :+ idCol).map(col): _*)
      .agg(round(sum(col("_s")), 6).as("bm25"))
  }
}
