package graft.loader

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compactionPlan: FFD packing respects target, big files stay singleton") {
    val files = Seq("a" -> 90L, "b" -> 60L, "c" -> 35L, "d" -> 30L,
      "e" -> 20L, "f" -> 150L)
    val plan = Lake.compactionPlan(files, targetBytes = 100L)
    // every file exactly once
    assert(plan.flatten.sorted === files.map(_._1).sorted)
    // the >= target file is alone
    assert(plan.exists(g => g == Seq("f")))
    val sizes = files.toMap
    plan.filter(_.size > 1).foreach { g =>
      assert(g.map(sizes).sum <= 100L, s"group $g over target")
    }
    // FFD on these sizes: {90}, {60,35}, {30,20} (+{f}) -> 4 groups
    assert(plan.size === 4)
  }

  test("compact: row content preserved, file count reduced") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    val df = spark.range(20000).select(col("id"),
      (col("id") % 7).cast("double").as("v"))
    df.repartition(16).write.parquet(in)
    val nIn = new java.io.File(in).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nIn === 16)

    Lake.compact(spark, in, out, targetBytes = 512L * 1024)
    val nOut = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nOut < nIn, s"expected fewer files, got $nOut of $nIn")

    val a = spark.read.parquet(in).agg(count(lit(1)), sum("id"), sum("v")).head()
    val b = spark.read.parquet(out).agg(count(lit(1)), sum("id"), sum("v")).head()
    assert(a === b)
  }

  test("compact: mixed flat+partitioned layout fails loudly (no silent loss)") {
    // top-level files PLUS partition subdirs: the non-recursive listing
    // would compact only the top level and report success over dropped
    // rows — must refuse instead (self-review round-13 catch). Hidden
    // entries (_SUCCESS) stay allowed.
    val dir = java.nio.file.Files.createTempDirectory("graft_mixed").toString
    val in = s"$dir/in"
    spark.range(100).select(col("id"), (col("id") % 3).as("p"))
      .repartition(2).write.parquet(in)
    spark.range(50).select(col("id"))
      .write.parquet(s"$in/p=extra") // a partition-style subdir
    val e = intercept[IllegalArgumentException] {
      Lake.compact(spark, in, s"$dir/out", targetBytes = 1L << 20)
    }
    assert(e.getMessage.contains("subdirectories"))
  }

  test("compact: empty input and non-empty output fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact3").toString
    // empty input: a silent 0-group success would mask a bad path/scheme
    new java.io.File(s"$dir/empty").mkdirs()
    val e1 = intercept[IllegalArgumentException] {
      Lake.compact(spark, s"$dir/empty", s"$dir/out1", targetBytes = 1024L)
    }
    assert(e1.getMessage.contains("no parquet files"))
    // pre-populated output: append would duplicate rows on a rerun
    spark.range(10).coalesce(1).write.parquet(s"$dir/in")
    spark.range(5).coalesce(1).write.parquet(s"$dir/out2")
    val e2 = intercept[IllegalArgumentException] {
      Lake.compact(spark, s"$dir/in", s"$dir/out2", targetBytes = 1024L)
    }
    assert(e2.getMessage.contains("not empty"))
  }

  test("compact: oversized files copy through byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    spark.range(50000).select(col("id"), rand(7).as("v"))
      .coalesce(1).write.parquet(in)
    val src = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Lake.compact(spark, in, out, targetBytes = 1024L) // everything oversized
    val copies = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(copies.length === 1)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(src.toPath),
      java.nio.file.Files.readAllBytes(copies.head.toPath)))
  }
}
