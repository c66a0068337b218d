package graft.dfops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, """{"k": 7, "tag": "a", "nested": {"x": 1.5}}"""),
    (2L, """{"k": 11, "tag": "b", "nested": {"x": -2.0}}"""),
    (3L, """{"k": null, "tag": "c"}"""),
    (4L, """not json at all"""),
    (5L, null.asInstanceOf[String]),
  ).toDF("id", "js")

  test("extractJson pulls typed fields; malformed/missing -> null") {
    val out = SemiStructured.extractJson(docs, "js", Map(
      "k" -> (("$.k", IntegerType)),
      "tag" -> (("$.tag", StringType)),
      "x" -> (("$.nested.x", DoubleType)),
    )).orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[Any]("k"))).toSeq ===
      Seq(Some(7), Some(11), None, None, None))
    assert(out(0).getAs[Double]("x") === 1.5)
    assert(out(1).getAs[String]("tag") === "b")
  }

  test("flattenJson with explicit schema: permissive nulls, one parse") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("tag", StringType)))
    val out = SemiStructured.flattenJson(docs, "js", schema).orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[Any]("k"))).toSeq ===
      Seq(Some(7), Some(11), None, None, None))
    assert(out.map(r => Option(r.getAs[String]("tag"))).toSeq ===
      Seq(Some("a"), Some("b"), Some("c"), None, None))
  }

  test("inferJsonSchema on a bounded sample finds fields and types") {
    val schema = SemiStructured.inferJsonSchema(docs, "js", sampleN = 10)
    val names = schema.fieldNames.toSet
    assert(names.contains("k") && names.contains("tag") && names.contains("nested"))
    assert(schema("k").dataType === LongType) // Spark JSON inference: integral -> long
    val nested = schema("nested").dataType.asInstanceOf[StructType]
    assert(nested("x").dataType === DoubleType)
  }

  test("flattenJsonInferred end-to-end with prefix") {
    val out = SemiStructured.flattenJsonInferred(docs, "js", prefix = "p_")
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("p_k") === 7L)
    assert(out(3).getAs[Any]("p_k") === null)
  }

  test("fields absent from the sample read as null corpus-wide (documented)") {
    val sampleBiased = Seq((1L, """{"a": 1}"""), (2L, """{"a": 2, "b": 9}"""))
      .toDF("id", "js")
    val schema = SemiStructured.inferJsonSchema(sampleBiased, "js", sampleN = 1)
    assert(!schema.fieldNames.contains("b"))
    val out = SemiStructured.flattenJson(sampleBiased, "js", schema)
    assert(out.columns.contains("a") && !out.columns.contains("b"))
  }
}
