package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col

import graft.binning.UniformAxis

/** Guards on the driver contract and on the physical-plan shapes the
  * scale story depends on (regressions here wouldn't fail correctness,
  * only the 100 TB plan).
  */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${o -- q}")
  }

  test("multi-axis histogram plan: one exchange, partial aggregation, no UDFs") {
    val df = Seq.fill(1000)((math.random() * 10, math.random() * 10))
      .toDF("x", "y")
    val hist = binning.Binning.histogram(df,
      Seq(UniformAxis("x", 10, 0.0, 10.0), UniformAxis("y", 10, 0.0, 10.0)))
    hist.collect()
    val executed = hist.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other                    => other.toString
    }
    // partial + final hash aggregation around a single shuffle on the
    // flat bin key — the per-partition histogram the reference hand-rolls
    assert("partial_count".r.findAllIn(executed).nonEmpty, executed)
    assert("Exchange hashpartitioning\\(_flat".r.findAllIn(executed).length === 1,
      executed)
    assert(!executed.contains("BatchEvalPython") && !executed.contains("ScalaUDF"),
      "hot path must stay UDF-free")
  }

  test("asofJoin and rangeJoin never plan a nested-loop or cartesian join") {
    val left = Seq.tabulate(500)(i => (i.toLong, s"k${i % 3}", (i * 7 % 100).toLong))
      .toDF("id", "k", "t")
    val right = Seq.tabulate(50)(i => (s"k${i % 3}", (i * 13 % 100).toLong, i * 1.0))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("v").as("v"))
    val asof = dfops.DfOps.asofJoin(left, right, "t", "t", Seq("k"), Seq("v"))
    asof.collect()
    val range = dfops.DfOps.rangeJoin(
      left.select(col("id"), col("t").cast("double").as("x")), "x",
      right.select(col("t").cast("double").as("lo"),
        (col("t") + 10.0).cast("double").as("hi"), col("v")),
      "lo", "hi", bucketWidth = 10.0)
    range.collect()
    for (df <- Seq(asof, range)) {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
    }
  }

  test("histogram scan prunes to exactly the binned columns") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toFile.getPath + "/t"
    Seq.fill(100)((1.0, 2.0, 3.0, "pad")).toDF("a", "b", "c", "d")
      .write.parquet(dir)
    val hist = binning.Binning.histogram(spark.read.parquet(dir),
      Seq(UniformAxis("a", 5, 0.0, 5.0), UniformAxis("c", 5, 0.0, 5.0)))
    val scan = hist.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    val schema = scan.split("ReadSchema: ").last
    assert(schema === "struct<a:double,c:double>", scan)
  }
}
