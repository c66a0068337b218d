package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins RefBench's self-heal + fail-loud commit protocol (VERDICT r17
  * #2): a contaminated or baseline-shifted baseline refresh must carry
  * `usable:false` and a nonzero exit code so the by-hand "discard the
  * hot refresh" discipline the r17 close exercised is enforced by
  * protocol. No SparkSession: selfHeal is pure adjudication over
  * scripted readings.
  */
class RefBenchSpec extends AnyFunSuite {

  private val QC = 0.05 // quiet cpu canary
  private val QB = 0.02 // quiet bw canary

  private def quiet(name: String, sec: Double): RefBench.Reading =
    (name, sec, QC, QB)

  test("a quiet first pass needs no retries and is usable, exit 0") {
    val (rs, contaminated, retried) = RefBench.selfHeal(
      Seq(quiet("binning_4d", 3.5), quiet("workflow_4d", 4.2)),
      reRun = n => fail(s"quiet reading retried: $n"))
    assert(rs.map(_._1) === Seq("binning_4d", "workflow_4d"))
    assert(contaminated.isEmpty && retried.isEmpty)
    assert(BenchProtocol.verdict(contaminated, runQuiet = true) === ((true, 0)))
  }

  test("a hot reading that heals on retry: retried named, contaminated" +
      " empty, the quiet attempt's seconds kept") {
    val (rs, contaminated, retried) = RefBench.selfHeal(
      Seq(quiet("binning_4d", 3.5), ("workflow_4d", 6.1, QC, QB * 2.0)),
      reRun = _ => (4.2, QC, QB)) // retry reads quiet
    assert(contaminated.isEmpty)
    assert(retried === Map("workflow_4d" -> 1))
    assert(rs.find(_._1 == "workflow_4d").get._2 === 4.2)
  }

  test("irrecoverably hot: named contaminated after the budget, and the" +
      " verdict is usable:false exit 3 — a driver checking only the exit" +
      " code can never commit the refresh") {
    var reruns = 0
    val (_, contaminated, retried) = RefBench.selfHeal(
      Seq(quiet("binning_4d", 3.5), ("workflow_4d", 6.1, QC, QB * 2.0)),
      reRun = _ => { reruns += 1; (5.9, QC, QB * 2.2) }, // stays hot
      maxRounds = 2)
    assert(reruns === 2) // budget honored
    assert(contaminated === Seq("workflow_4d"))
    assert(retried === Map("workflow_4d" -> 2))
    assert(BenchProtocol.verdict(contaminated, runQuiet = true) ===
      ((false, 3)))
  }

  test("uniformly hot box: every reading mutually quiet (relative test" +
      " blind), run_quiet false → usable:false exit 4") {
    // all canaries elevated TOGETHER: relative minima are themselves hot,
    // so selfHeal sees nothing to retry...
    val (_, contaminated, retried) = RefBench.selfHeal(
      Seq(("binning_4d", 4.8, QC * 8, QB * 8), ("workflow_4d", 6.0, QC * 8, QB * 8)),
      reRun = n => fail(s"mutually-quiet reading retried: $n"))
    assert(contaminated.isEmpty && retried.isEmpty)
    // ...and the absolute whole-run check carries the verdict
    assert(!Bench.runQuiet(QC * 8, QB * 8))
    assert(BenchProtocol.verdict(contaminated, runQuiet = false) ===
      ((false, 4)))
  }

  test("keep-quieter-attempt rule: a retry with a WORSE worst" +
      " band-normalized canary is discarded even if faster; one that" +
      " trades a quiet bw for a quiet cpu does not win either") {
    // original: cpu quiet, bw 2.0× → worst normalized score 2.0/1.0 on bw
    // retry 1: faster seconds but bw 3× → worse; must be discarded
    val (rs1, cont1, _) = RefBench.selfHeal(
      Seq(quiet("a", 1.0), ("b", 6.1, QC, QB * 2.0)),
      reRun = _ => (4.0, QC, QB * 3.0), maxRounds = 1)
    assert(rs1.find(_._1 == "b").get._2 === 6.1) // original kept
    assert(cont1 === Seq("b"))
    // retry 2: cpu now quiet but bw worse than before (2.5×) vs original
    // (cpu 2.0×, bw quiet → worst 2.0): worst(new)=2.5 > worst(old)=2.0
    val (rs2, _, _) = RefBench.selfHeal(
      Seq(quiet("a", 1.0), ("b", 6.1, QC * 2.0, QB)),
      reRun = _ => (4.0, QC, QB * 2.5), maxRounds = 1)
    assert(rs2.find(_._1 == "b").get._2 === 6.1)
    // retry 3: strictly quieter worst score wins even when slower
    val (rs3, cont3, _) = RefBench.selfHeal(
      Seq(quiet("a", 1.0), ("b", 4.0, QC * 2.0, QB)),
      reRun = _ => (4.4, QC * 1.1, QB), maxRounds = 1)
    assert(rs3.find(_._1 == "b").get._2 === 4.4)
    assert(cont3.isEmpty)
  }

  test("empty readings are named misuse") {
    intercept[IllegalArgumentException](
      RefBench.selfHeal(Seq.empty, reRun = _ => (0, 0, 0)))
  }
}
