package graft

/** Pure estimator math for the scaling bench — extracted from [[Bench]] so the
  * graded numbers (`efficiency`, `efficiency_pair_mean`, `efficiency_floor`,
  * `converged`, the published trim) are unit-testable against pinned draws.
  * Rationale for every statistical choice lives on [[Bench]] and in
  * BENCH/RESULTS.md; this object is only the arithmetic.
  *
  * Inputs are the raw per-level wall-clock samples in loop order: pair `i`
  * consists of `runsN(i)` sandwiched between `runs4n(2*i)` and `runs4n(2*i+1)`.
  */
object ScalingStats {

  val ConvergeTol = 0.10
  val MinPairs = 3

  /** All published scaling fields for one draw. `trimmedN`/`trimmed4n` are the
    * samples REMOVED by the 2×-median outlier trim (published, auditable);
    * `tN`/`t4n` are the supported per-level floors the docs/sec figures use.
    */
  final case class Result(
      efficiency: Double,
      efficiencyPairMean: Double,
      efficiencyFloor: Double,
      converged: Boolean,
      tN: Double,
      t4n: Double,
      trimmedN: Seq[Double],
      trimmed4n: Seq[Double])

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Smallest SUPPORTED sample: a minimum whose second-smallest neighbor is
    * >10% away is one lucky scheduling window, not a reproducible floor.
    */
  def supportedFloor(runs: Seq[Double]): Double = {
    val s = runs.sorted
    if (s.size < 2 || s(1) <= 1.10 * s(0)) s(0) else s(1)
  }

  /** Index of the single worst draw iff it exceeds 2× the level median —
    * at most ONE draw per level is ever trimmed.
    */
  def worstIdx(runs: Seq[Double]): Option[Int] =
    if (runs.nonEmpty && runs.max > 2 * median(runs))
      Some(runs.indexOf(runs.max)) else None

  /** Clamped per-pair efficiency ratios assembled POST-TRIM: a pair whose N
    * draw was trimmed is gone; a pair that lost one 4N draw keeps the
    * survivor. `stat4n` picks the pair's 4N statistic (min for the headline,
    * mean for the published gauge).
    */
  def pairRatios(
      runsN: Seq[Double], runs4n: Seq[Double], nLow: Int, nHigh: Int,
      trimN: Option[Int], trim4n: Option[Int])(
      stat4n: Seq[Double] => Double): Seq[Double] =
    runsN.indices.flatMap { i =>
      if (2 * i + 1 < runs4n.size && !trimN.contains(i)) {
        val fours = Seq(2 * i, 2 * i + 1).filterNot(trim4n.contains).map(runs4n)
        if (fours.isEmpty) None
        else Some(math.min(1.0, (runsN(i) / stat4n(fours)) / (nHigh.toDouble / nLow)))
      } else None
    }

  def compute(runsN: Seq[Double], runs4n: Seq[Double], nLow: Int, nHigh: Int): Result = {
    val trimN = worstIdx(runsN)
    val trim4n = worstIdx(runs4n)
    val tN = supportedFloor(runsN)
    val t4n = supportedFloor(runs4n)
    val effFloor = ((1.0 / t4n) / (1.0 / tN)) / (nHigh.toDouble / nLow)
    val ratios = pairRatios(runsN, runs4n, nLow, nHigh, trimN, trim4n) _
    val pairEffs = ratios(_.min)
    val pairEffsMean = ratios(fs => fs.sum / fs.size)
    val eff = if (pairEffs.isEmpty) effFloor else median(pairEffs)
    val effMean = if (pairEffsMean.isEmpty) effFloor else median(pairEffsMean)
    // converged = leave-newest-out stability of the REPORTED median (round 5)
    val didConverge = pairEffs.size >= MinPairs &&
      math.abs(median(pairEffs.dropRight(1)) - eff) <= ConvergeTol * eff
    Result(eff, effMean, effFloor, didConverge, tN, t4n,
      trimN.map(runsN).toSeq, trim4n.map(runs4n).toSeq)
  }
}
