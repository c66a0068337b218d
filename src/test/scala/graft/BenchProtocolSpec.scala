package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the benchmark suite protocol with SCRIPTED canary probes — the
  * round-16 hardening: a contaminated run must extend itself, and when
  * extension cannot heal it, it must NAME the unusable queries instead
  * of exiting clean with a headline total (round 15's driver artifact
  * archived `quiet_reps:0` numbers as the number of record).
  *
  * No SparkSession: the protocol is pure orchestration; workloads here
  * are no-op closures and shuffle MB a constant.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private val QUIET_CPU = 0.05
  private val QUIET_BW = 0.02
  private val HOT = 10.0

  private def ws(names: String*): Seq[(String, () => Unit)] =
    names.map(n => n -> (() => ()))

  /** Probe pair that replays scripted (cpu, bw) readings in call order;
    * falls back to quiet once the script is exhausted.
    */
  private final class Script(readings: Seq[(Double, Double)]) {
    private var i = -1
    val cpu: () => Double = () => { i += 1; readings.lift(i).map(_._1).getOrElse(QUIET_CPU) }
    // bw probe fires right after cpu in both bracket positions: reuse i
    val bw: () => Double = () => readings.lift(i).map(_._2).getOrElse(QUIET_BW)
  }

  private def run(workloads: Seq[(String, () => Unit)],
      script: Seq[(Double, Double)], rounds: Int = 3,
      maxExtra: Int = 10): BenchProtocol.SuiteResult = {
    val s = new Script(script)
    BenchProtocol.runSuite(workloads, rounds, maxExtra, s.cpu, s.bw,
      (_, _) => 1.25)
  }

  test("quiet box: no extension, no contamination, all reps quiet") {
    val r = run(ws("a", "b", "c"), script = Seq.empty, rounds = 3)
    assert(r.extraRounds === 0)
    assert(r.contaminated.isEmpty && r.unusable.isEmpty)
    assert(r.stats.map(_.name) === Seq("a", "b", "c"))
    assert(r.stats.forall(_.quietReps === 3))
    assert(r.stats.forall(_.shuffleMb === 1.25))
    // on a quiet box the agreed subset IS the quiet set (no-op workloads
    // all sit within the +50 ms agreement slack), so the two dispersion
    // fields coincide
    assert(r.stats.forall(s => s.agreedSpread === s.spread))
  }

  test("warmups: each workload executes `warmups` untimed passes plus" +
      " the shuffle-metered run before any timed round") {
    var calls = 0
    val counting = Seq("w" -> (() => { calls += 1; () }))
    val s = new Script(Seq.empty)
    // the shuffleMbOf stub EXECUTES the run like Bench's listener-delta
    // implementation does, so the count mirrors production
    val r = BenchProtocol.runSuite(counting, rounds = 2, maxExtraRounds = 0,
      s.cpu, s.bw, (_, run) => { run(); 0.0 }, warmups = 3)
    // 3 warm-ups + 1 shuffle-metered + 2 timed rounds
    assert(calls === 6)
    assert(r.stats.head.quietReps === 2) // only the timed rounds count
    intercept[IllegalArgumentException](
      BenchProtocol.runSuite(counting, rounds = 1, maxExtraRounds = 0,
        s.cpu, s.bw, (_, _) => 0.0, warmups = -1))
  }

  test("extraWarmups: only the named workload pays the additional untimed" +
      " passes (the long-C2-tail remedy)") {
    var a = 0; var b = 0
    val counting = Seq(
      "tail" -> (() => { a += 1; () }),
      "other" -> (() => { b += 1; () }))
    val s = new Script(Seq.empty)
    val r = BenchProtocol.runSuite(counting, rounds = 2, maxExtraRounds = 0,
      s.cpu, s.bw, (_, run) => { run(); 0.0 }, warmups = 1,
      extraWarmups = Map("tail" -> 4))
    // tail: 1 + 4 warm-ups + 1 shuffle-metered + 2 timed rounds
    assert(a === 8)
    // other: suite default only
    assert(b === 4)
    assert(r.stats.forall(_.quietReps === 2))
    intercept[IllegalArgumentException](
      BenchProtocol.runSuite(counting, rounds = 1, maxExtraRounds = 0,
        s.cpu, s.bw, (_, _) => 0.0, extraWarmups = Map("tail" -> -2)))
  }

  test("transient spike: the suite self-heals with extra rounds and the" +
      " artifact stays clean") {
    // 2 workloads → 3 probe pairs per round. Round 1 quiet (sets the
    // suite-wide floor, 1 quiet rep each), round 2 fully HOT (0 quiet
    // reps), script exhausted from round 3 → quiet again. After the 2
    // base rounds every query has only 1 quiet rep, so exactly one
    // extension round must run to reach 2.
    val quietRound = Seq.fill(3)((QUIET_CPU, QUIET_BW))
    val hotRound = Seq.fill(3)((HOT, HOT))
    val r = run(ws("a", "b"), script = quietRound ++ hotRound, rounds = 2)
    assert(r.extraRounds === 1)
    assert(r.contaminated.isEmpty && r.unusable.isEmpty)
    assert(r.stats.forall(_.quietReps === 2))
  }

  test("irrecoverable contamination: the affected query is named" +
      " unusable AND contaminated; quiet queries stay clean") {
    // 3 workloads → 4 probe pairs per round (leading + one after each
    // workload); brackets are SHARED between neighbours: a = pairs 0,1;
    // b = 1,2; c = 2,3. Heating pair 1 (between a and b) in EVERY round
    // keeps both a and b permanently un-quiet while c stays clean — the
    // round-15 shape, where contamination pinned to one time window of
    // each interleaved round poisoned the adjacent queries only.
    def round = Seq((QUIET_CPU, QUIET_BW), (HOT, HOT),
      (QUIET_CPU, QUIET_BW), (QUIET_CPU, QUIET_BW))
    val script = Seq.fill(20)(round).flatten // hot every round, forever
    val r = run(ws("a", "b", "c"), script, rounds = 3, maxExtra = 4)
    assert(r.extraRounds === 4) // budget exhausted
    assert(r.unusable === Seq("a", "b"))
    assert(r.contaminated === Seq("a", "b")) // zero quiet reps for both
    assert(r.stats.find(_.name == "c").get.quietReps >= 2)
    // contaminated queries still REPORT stats (all-rep fallback), so the
    // artifact stays parseable — they are just flagged not-a-number
    val a = r.stats.find(_.name == "a").get
    assert(a.min >= 0 && a.median >= 0)
  }

  test("one slow bracket under the 1.3x/1.5x band is still quiet" +
      " (thresholds are relative to the suite-wide minimum)") {
    // probe readings at 1.2× cpu / 1.4× bw of the quiet floor: inside
    // both bands → no extension
    val mild = Seq.fill(12)((QUIET_CPU * 1.2, QUIET_BW * 1.4))
    val r = run(ws("a", "b"), script = (QUIET_CPU, QUIET_BW) +: mild,
      rounds = 3)
    assert(r.extraRounds === 0)
    assert(r.unusable.isEmpty)
  }

  test("uniformly hot box: every rep mutually quiet (relative test" +
      " passes, unusable empty) yet verdict says usable:false, exit 4") {
    // all canaries elevated TOGETHER — the whole-run baseline shift the
    // committed quiet constants exist for. Relative to the suite's own
    // minima every rep is quiet, so the per-query gate cannot fire...
    val hotAll = Seq.fill(40)((HOT, HOT))
    val r = run(ws("a", "b"), script = hotAll, rounds = 3)
    assert(r.extraRounds === 0)
    assert(r.unusable.isEmpty && r.contaminated.isEmpty)
    assert(r.stats.forall(_.quietReps === 3))
    // ...but the absolute run_quiet check does, and verdict folds it
    // into usable + a DISTINCT exit code so the driver can tell
    // hot-box from noisy-box
    assert(!Bench.runQuiet(HOT, HOT))
    assert(BenchProtocol.verdict(r.unusable, runQuiet = false) ===
      ((false, 4)))
    // quiet box for contrast: usable, exit 0
    assert(BenchProtocol.verdict(Nil, runQuiet = true) === ((true, 0)))
    // noisy box outranks hot box in the roll-up
    assert(BenchProtocol.verdict(Seq("1x:q"), runQuiet = false) ===
      ((false, 3)))
  }

  test("sub-second floor reproduction: a spike inside the timed region" +
      " (canaries quiet) forces extension until the min is reproduced") {
    // the workload sleeps 400 ms on its first two timed reps (a spike
    // shorter than the canary bracket: both brackets read quiet) and
    // 20 ms from then on. After 3 base rounds only ONE rep sits at the
    // floor — the plain quiet criterion would stop here and report
    // min=0.02 with median 0.4 — so extension rounds must run until the
    // floor is reproduced. Counts are asserted as RANGES, not exact
    // values: on a loaded CI box a 20 ms sleep can overshoot past the
    // max(1.3×min, +50 ms) band and cost an extra extension round
    // (ADVICE r17); the 400/20 separation keeps the spike reps
    // unambiguously outside the band either way.
    var rep = 0 // rep 1 is the protocol's untimed warm-up call
    val spiky = Seq("spiky" -> (() => {
      rep += 1
      Thread.sleep(if (rep <= 3) 400L else 20L)
    }))
    val r = run(spiky, script = Seq.empty, rounds = 3)
    assert(r.extraRounds >= 1 && r.extraRounds <= 10)
    assert(r.unusable.isEmpty)
    val s = r.stats.head
    // all reps quiet — the brackets saw nothing
    assert(s.quietReps === 3 + r.extraRounds)
    assert(s.agreedReps >= 2) // the floor was reproduced...
    assert(s.agreedReps <= s.quietReps - 2) // ...but spike reps never agree
    assert(s.min < 0.15, s"floor not at the quiet value: ${s.min}")
    // the dispersion the verdict is based on: `spread` spans the spike
    // reps (they are canary-quiet), `agreedSpread` only the agreed
    // subset, bounded by the agreement band itself
    assert(s.spread > 2.0, s"spike reps should widen spread: ${s.spread}")
    assert(s.agreedSpread <= math.max(1.3, (s.min + 0.05) / s.min) + 1e-9,
      s"agreedSpread ${s.agreedSpread} escaped the agreement band")
    assert(s.agreedSpread < s.spread)
  }

  test("sub-second floor NEVER reproduced: the query is named unusable" +
      " after the budget even though every rep is canary-quiet") {
    // one fluke-fast rep, every other rep 20× slower with quiet canaries
    // — the r16 ×1 shape (workflow_4d min 0.262 s vs median 0.961 s,
    // usable:true). The floor is never reproduced, so the query must be
    // named rather than its min archived. (400 vs 20 ms: wide enough
    // that no realistic sleep overshoot can bring the slow reps inside
    // the fluke's agreement band — ADVICE r17.)
    var rep = 0 // rep 1 is the untimed warm-up
    val fluke = Seq("fluke" -> (() => {
      rep += 1
      Thread.sleep(if (rep == 2) 20L else 400L)
    }))
    val r = run(fluke, script = Seq.empty, rounds = 3, maxExtra = 3)
    assert(r.extraRounds === 3) // budget exhausted trying to heal
    assert(r.unusable === Seq("fluke"))
    assert(r.contaminated.isEmpty) // canaries were quiet throughout
    assert(r.stats.head.agreedReps === 1)
    assert(BenchProtocol.verdict(r.unusable, runQuiet = true)._2 === 3)
  }

  test("at or above 0.5 s the plain quiet criterion stands (long regions" +
      " dilute short spikes; sustained weather hits the brackets)") {
    var rep = 0 // rep 1 is the untimed warm-up
    val long = Seq("long" -> (() => {
      rep += 1
      Thread.sleep(if (rep <= 2) 900L else 550L) // spread 1.6×, all ≥0.5 s
    }))
    val r = run(long, script = Seq.empty, rounds = 3)
    assert(r.extraRounds === 0)
    assert(r.unusable.isEmpty)
    assert(r.stats.head.agreedReps === r.stats.head.quietReps)
  }

  test("selfBracketed: hot brackets don't burn the budget; the agreement" +
      " band is the quiet criterion for every rep") {
    // the ×100 scale-leg shape: the workload's own GC/page residue makes
    // every post-workload bracket read hot (bw 1.6× the quiet floor,
    // which the pre-workload brackets still establish) — structural, not
    // co-tenant weather. Canary-gated mode extends to the budget and
    // names the query unusable; selfBracketed must accept
    // floor-reproducing reps and finish in the base rounds.
    val hotBrackets = (0 until 40).map(i =>
      (QUIET_CPU, if (i % 2 == 0) QUIET_BW else QUIET_BW * 1.6))
    def w = Seq("big" -> (() => Thread.sleep(30L)))
    val canaried = {
      val s = new Script(hotBrackets)
      BenchProtocol.runSuite(w, 3, 3, s.cpu, s.bw, (_, _) => 1.0)
    }
    assert(canaried.unusable === Seq("big")) // the failure mode being fixed
    val self = {
      val s = new Script(hotBrackets)
      BenchProtocol.runSuite(w, 3, 3, s.cpu, s.bw, (_, _) => 1.0,
        selfBracketed = true)
    }
    assert(self.extraRounds === 0)
    assert(self.unusable.isEmpty && self.contaminated.isEmpty)
    assert(self.stats.head.agreedReps === 3)
    // a rep outside the agreement band still doesn't count: floor
    // reproduction is REQUIRED, not just bracket amnesty
    var rep = 0
    def spiky = Seq("spiky" -> (() => {
      rep += 1
      Thread.sleep(if (rep <= 3) 400L else 20L)
    }))
    val s2 = new Script(hotBrackets)
    val healed = BenchProtocol.runSuite(spiky, 3, 10, s2.cpu, s2.bw,
      (_, _) => 1.0, selfBracketed = true)
    assert(healed.extraRounds >= 1) // extension until the floor reproduced
    assert(healed.unusable.isEmpty)
    assert(healed.stats.head.min < 0.15)
    assert(healed.stats.head.agreedSpread <= math.max(1.3,
      (healed.stats.head.min + 0.05) / healed.stats.head.min) + 1e-9)
  }

  test("empty workload list and zero rounds are named misuse, not a" +
      " crash deep inside quietMins") {
    intercept[IllegalArgumentException](run(Seq.empty, script = Seq.empty))
    intercept[IllegalArgumentException](
      run(ws("a"), script = Seq.empty, rounds = 0))
  }

  test("a workload that throws never aborts the suite (named stderr," +
      " stats still emitted)") {
    val boom = Seq("ok" -> (() => ()),
      "boom" -> (() => throw new RuntimeException("kaput")))
    val r = run(boom, script = Seq.empty, rounds = 2)
    assert(r.stats.map(_.name) === Seq("ok", "boom"))
    assert(r.unusable.isEmpty) // canaries quiet; failure is a run error,
    // not weather — timings of the throwing stub are near-zero but real
  }
}
