package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance record linkage: near-identical string pairs (title
  * variants, OCR'd duplicates, templated boilerplate) via blocked
  * comparison + exact Levenshtein verification.
  *
  * Scale design: candidate generation is an equi-join on a blocking key
  * (caller-chosen domain key plus a length band — edit distance ≤ k
  * implies |len(a) − len(b)| ≤ k, so banding by `len / (k+1)` with
  * neighbor-band probing keeps the guarantee). Candidates then pass the
  * Ukkonen q-gram COUNT filter — `ed(a,b) ≤ k` forces
  * `|Q(a) ∩ Q(b)| ≥ max(|a|,|b|) − q + 1 − k·q` (multiset, each edit
  * destroys ≤ q q-grams) — via the native sorted-merge kernel, so the
  * O(k·n) banded Levenshtein DP (Spark's 3-arg codegen `levenshtein`)
  * only runs on survivors; hash collisions only ADD candidates, never
  * drop one, so the filter is exact. Cost is pairs-per-block, never
  * |L|×|R|.
  *
  * Blocking contract (measured, see NOTES round 7): the length band
  * adds selectivity only when lengths VARY — fixed-length keys (e.g.
  * constant-width prefixes) collapse every row into one band, and
  * candidate mass within a (block, band) grows quadratically in block
  * size. `blockCol` must bound comparison cliques; a corpus-scale
  * self-link needs a content-bearing block (domain, first token,
  * minhash band), not just length.
  */
object Fuzzy {

  private val QLen = 3

  /** Sorted multiset of hashed q-grams (one per position); empty for
    * strings shorter than q. Computed once per row in the projection —
    * the pair-join side only runs the merge kernel.
    */
  private def qgrams(c: Column): Column =
    when(length(c) < QLen, array().cast("array<bigint>"))
      .otherwise(sort_array(transform(
        sequence(lit(1), length(c) - (QLen - 1)),
        i => xxhash64(c.substr(i, lit(QLen))))))

  /** Distinct `(id_a, id_b, dist)` pairs (`id_a < id_b`) within the same
    * `blockCol` whose `textCol` edit distance is ≤ `maxEdit`. Length
    * banding: each row lands in its own band and probes its successor
    * band (pairs ≤ `maxEdit` apart in length are then always co-banded
    * somewhere, each unordered pair compared once per shared band and
    * dedup'd).
    */
  def editSimilarityPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxEdit: Int): DataFrame = {
    require(maxEdit >= 0, "maxEdit must be >= 0")
    val bandWidth = maxEdit + 1
    val base = df.select(col(idCol).as("id"), col(textCol).as("txt"),
        col(blockCol).as("blk"), qgrams(col(textCol)).as("qg"),
        (length(col(textCol)).cast("long") / bandWidth).cast("long").as("band"))
      .filter(col("txt").isNotNull)
    // each row probes its own band and the next: any pair with
    // |len diff| <= maxEdit shares at least one probed band
    val probes = base.select(col("id"), col("txt"), col("blk"), col("qg"),
      explode(array(col("band"), col("band") + 1)).as("band"))
    val inter = org.apache.spark.sql.GraftBridge.column(
      SortedLongIntersectCount(
        org.apache.spark.sql.GraftBridge.expression(col("a.qg")),
        org.apache.spark.sql.GraftBridge.expression(col("b.qg"))))
    probes.as("a").join(probes.as("b"), Seq("blk", "band"))
      .filter(col("a.id") < col("b.id"))
      // Ukkonen count filter: necessary condition for ed <= maxEdit, so
      // dropping failures is exact; the bound can go <= 0 (short strings,
      // large k), where the predicate is trivially true and the DP decides
      .filter(inter >= greatest(length(col("a.txt")), length(col("b.txt"))) -
        lit(QLen - 1 + maxEdit * QLen))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.txt"), col("b.txt"), maxEdit).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxEdit)
      .distinct()
  }

  /** Keep one representative (min id) per connected fuzzy-duplicate
    * cluster — `editSimilarityPairs` + the shared connected-components
    * machinery.
    */
  def dropFuzzyDuplicates(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxEdit: Int): DataFrame = {
    val pairs = editSimilarityPairs(df, idCol, textCol, blockCol, maxEdit)
      .select(col("id_a"), col("id_b"))
    val clusters = Dedup.connectedComponents(pairs)
    val losers = clusters.filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
