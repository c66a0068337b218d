package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance record linkage: near-identical string pairs (title
  * variants, OCR'd duplicates, templated boilerplate) via blocked
  * comparison + exact Levenshtein verification.
  *
  * Scale design: candidate generation is an equi-join on a blocking key
  * (caller-chosen domain key plus a length band — edit distance ≤ k
  * implies |len(a) − len(b)| ≤ k, so banding by `len / (k+1)` with
  * neighbor-band probing keeps the guarantee), and verification is
  * Spark's codegen'd `levenshtein` WITH its threshold argument — the
  * banded DP cuts off at k+1, O(k·n) per pair instead of O(n²). Cost is
  * pairs-per-block, never |L|×|R|.
  */
object Fuzzy {

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
        col(blockCol).as("blk"),
        (length(col(textCol)).cast("long") / bandWidth).cast("long").as("band"))
      .filter(col("txt").isNotNull)
    // each row probes its own band and the next: any pair with
    // |len diff| <= maxEdit shares at least one probed band
    val probes = base.select(col("id"), col("txt"), col("blk"),
      explode(array(col("band"), col("band") + 1)).as("band"))
    probes.as("a").join(probes.as("b"), Seq("blk", "band"))
      .filter(col("a.id") < col("b.id"))
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
