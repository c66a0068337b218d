package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins that swapping the LSH band-hash function for the native
  * [[BandHashesExpr]] kernel preserves every consumer-visible property:
  * equal band slices hash equal (the only property any consumer keys
  * on), and the full near-duplicate pair set — candidates, verification,
  * est_jaccard — is identical to the declarative
  * `xxhash64(concat_ws("_", slice(sig, …)))` form it replaced, including
  * the all-null-signature (short/null text) grouping behavior.
  */
class BandHashesExprSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-19 declarative band table, verbatim. */
  private def declBands(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_", slice(col("sig"), b * rows + 1, lit(rows)))),
      )),
    ).withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_hash"))
  }

  private def pairsFromBands(banded: DataFrame, sigs: DataFrame,
      numHashes: Int, threshold: Double): DataFrame = {
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_hash") === col("b.band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sigs.as("sa"), col("id_a") === col("sa.id"))
      .join(sigs.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (org.apache.spark.sql.GraftBridge.column(PositionalEqCount(
          org.apache.spark.sql.GraftBridge.expression(col("sa.sig")),
          org.apache.spark.sql.GraftBridge.expression(col("sb.sig"))))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumped over the lazy dog"),
    (3L, "completely different content about spark aggregation engines"),
    (4L, "der schnelle braune fuchs und der faule hund ist nicht da"),
    (5L, "abc"), // shorter than k → all-null signature
    (6L, "xy"), // another short doc: must group with 5 exactly as before
    (7L, null: String), // null text → all-null signature too
  ).toDF("doc_id", "text")

  test("equal band slices hash equal; distinct slices hash distinct here") {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id")
    val fused = Dedup.minhashBands(sigs, 32, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // docs 0 and 1 are identical → identical sigs → all 8 band hashes equal
    (0 until 8).foreach { b =>
      assert(fused((0L, b)) === fused((1L, b)))
      // doc 3 shares no shingles with doc 0 → bands must differ
      assert(fused((0L, b)) !== fused((3L, b)))
    }
    // all-null sigs (short/null text) group together, as concat_ws did
    (0 until 8).foreach { b =>
      assert(fused((5L, b)) === fused((6L, b)))
      assert(fused((5L, b)) === fused((7L, b)))
    }
  }

  test("near-dup pair set identical to the declarative band-hash form") {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id")
      .repartition(col("id"))
    def toSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fused = toSet(Dedup.minhashFromSigs(sigs, 32, 8, 0.3,
      inlineVerify = false))
    val decl = toSet(pairsFromBands(declBands(sigs, 32, 8), sigs, 32, 0.3))
    assert(fused === decl)
    assert(fused.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
  }

  test("inline-verify plan still matches the default plan after fusion") {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id")
      .repartition(col("id"))
    def toSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(
      toSet(Dedup.minhashFromSigs(sigs, 32, 8, 0.3, inlineVerify = true)) ===
      toSet(Dedup.minhashFromSigs(sigs, 32, 8, 0.3, inlineVerify = false)))
  }
}
