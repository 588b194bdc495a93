package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scaling-bench estimator arithmetic (the graded `efficiency`,
  * `efficiency_pair_mean`, `efficiency_floor`, `converged`, trim fields)
  * against two REAL driver-protocol draws plus targeted unit cases for each
  * statistical guard. The replayed expectations for the round-5 final-state
  * draw equal the numbers in `BENCH/self_r5_final.json` byte-for-value —
  * i.e. this spec proves compute() is the function that produced the
  * artifact.
  */
class ScalingStatsSpec extends AnyFunSuite {
  import ScalingStats._

  private def approx(a: Double, b: Double, tol: Double = 5e-4): Boolean = math.abs(a - b) <= tol

  test("median: odd and even sizes") {
    assert(median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("supported floor accepts a supported minimum, rejects a lone lucky draw") {
    assert(supportedFloor(Seq(70.0, 75.0, 72.0)) == 70.0)            // 75 ≤ 1.1*70? no, 72 ≤ 77 yes
    assert(supportedFloor(Seq(85.4, 94.0, 101.0, 114.0)) == 94.0)    // the measured 0.735-draw shape
    assert(supportedFloor(Seq(42.0)) == 42.0)                        // single sample: nothing to support it, take it
  }

  test("2x-median trim fires only on a >2x-median outlier, at most once, slow side only") {
    assert(worstIdx(Seq(70.0, 71.0, 150.0)) == Some(2))   // 150 > 2*71
    assert(worstIdx(Seq(70.0, 71.0, 130.0)) == None)      // 130 < 2*71
    assert(worstIdx(Seq(10.0, 70.0, 71.0)) == None)       // fast outlier never trimmed
    assert(worstIdx(Seq.empty) == None)
  }

  test("pair assembly: trimmed N removes its whole pair; trimmed 4N leaves the survivor") {
    // two pairs; N(1) trimmed -> only pair 0 survives
    val r1 = pairRatios(Seq(80.0, 300.0), Seq(25.0, 26.0, 25.0, 26.0), 1, 4, trimN = Some(1), trim4n = None)(_.min)
    assert(r1 == Seq(math.min(1.0, (80.0 / 25.0) / 4)))
    // 4N index 0 trimmed -> pair 0 keeps draw at index 1 as both min and mean
    val r2min = pairRatios(Seq(80.0), Seq(90.0, 25.0), 1, 4, trimN = None, trim4n = Some(0))(_.min)
    val r2mean = pairRatios(Seq(80.0), Seq(90.0, 25.0), 1, 4, trimN = None, trim4n = Some(0))(fs => fs.sum / fs.size)
    assert(r2min == r2mean && r2min == Seq(0.8))
  }

  test("each pair ratio is clamped at 1.0 (efficiency >1 is physically impossible)") {
    val r = pairRatios(Seq(200.0), Seq(25.0, 26.0), 1, 4, None, None)(_.min)
    assert(r == Seq(1.0))
  }

  test("converged requires MinPairs pairs and a leave-newest-out-stable median") {
    // 2 pairs: never converged regardless of stability
    assert(!compute(Seq(80.0, 80.0), Seq(25.0, 25.0, 25.0, 25.0), 1, 4).converged)
    // 4 identical pairs: converged
    assert(compute(Seq(80.0, 80.0, 80.0, 80.0), Seq.fill(8)(25.0), 1, 4).converged)
  }

  test("replays the round-4 GRADED driver draw (BENCH_r04.json samples)") {
    // The published r4 artifact read 0.804 / 0.707 / 0.890 with the ROUND-4
    // converged flag false; under the round-5 flag (leave-newest-out median
    // stability — the settled-median property the r4 VERDICT itself computed:
    // 0.820 without the last pair vs 0.804, a 2% move) the same samples read
    // converged TRUE. The 149.76 s N outlier sits below 2x the level median
    // (167.2), so the published trim correctly does NOT fire — that draw's
    // noise was clipped by the pair-min, not the trim.
    val r = compute(
      Seq(82.92, 88.16, 84.25, 149.76, 82.11, 71.38),
      Seq(31.54, 23.07, 26.89, 36.99, 41.64, 27.29, 24.88, 28.95, 26.07, 30.67, 25.38, 27.56),
      1, 4)
    assert(approx(r.efficiency, 0.804))
    assert(approx(r.efficiencyPairMean, 0.707))
    assert(approx(r.efficiencyFloor, 0.890))
    assert(r.converged)
    assert(r.trimmedN.isEmpty && r.trimmed4n.isEmpty)
    assert(r.tN == 82.11 && r.t4n == 23.07)
  }

  test("replays the round-5 final-state draw (BENCH/self_r5_final.json)") {
    val r = compute(
      Seq(77.8, 145.31, 71.91, 70.57, 71.42, 69.4, 68.86),
      Seq(23.67, 22.7, 26.24, 40.86, 23.06, 22.08, 21.33, 21.44, 21.45, 21.35, 21.75, 21.51, 21.2, 20.54),
      1, 4)
    assert(approx(r.efficiency, 0.832))
    assert(approx(r.efficiencyPairMean, 0.825))
    assert(approx(r.efficiencyFloor, 0.838))
    assert(r.converged)
    assert(r.trimmedN == Seq(145.31)) // the weather event, published and removed with its pair
    assert(r.trimmed4n.isEmpty)
    assert(r.tN == 68.86 && r.t4n == 20.54)
  }

  test("no pairs at all falls back to the supported-floor ratio") {
    val r = compute(Seq(80.0), Seq(25.0), 1, 4) // one N draw, one 4N draw: no complete pair
    assert(r.efficiency == r.efficiencyFloor && r.efficiencyPairMean == r.efficiencyFloor)
    assert(!r.converged)
  }
}
