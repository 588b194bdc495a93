package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure-DataFrame port of the reference's scoring entry point
  * (`utils/evaluator.py::evaluate/get_accuracy` ≈L20–110; SURVEY §2.4 A4, §3 E3;
  * §0.1 citation caveat).
  *
  * The reference relies on pandas positional index alignment between the groundtruth
  * and parsed CSVs — an implicit 1:1 join on line identity (J1). We make that an
  * explicit equi-join on the line key and never rely on row order.
  *
  * Metrics (pair-counting, Zhu et al. ICSE-SEIP 2019):
  *  - real_pairs     = Σ C(n,2) over groundtruth groups
  *  - parsed_pairs   = Σ C(n,2) over parsed groups
  *  - accurate_pairs = Σ C(n,2) over cells of the (parsed × groundtruth) contingency
  *  - precision = accurate/parsed, recall = accurate/real, F1 harmonic
  *  - Parsing Accuracy = fraction of lines in parsed groups that correspond 1:1 to a
  *    groundtruth group (same member set).
  */
object Evaluator {

  final case class Scores(precision: Double, recall: Double, f1: Double,
                          parsingAccuracy: Double, total: Long)

  /** The contingency table — also exposed as a queryable operator (SQL-expressible,
    * used by the harness oracle). Input needs columns `gt_id` and `event_id`, one row
    * per line (already joined on the line key).
    */
  def contingency(joined: DataFrame): DataFrame =
    joined.groupBy("event_id", "gt_id").agg(count(lit(1)).as("n"))

  def evaluate(joined: DataFrame): Scores = {
    // ONE action (round 6): the five scalars were four separate collect()s —
    // four driver round-trips / job submissions over the (tiny, cached)
    // contingency. Assembling them into a single one-row cross-join plan
    // keeps the arithmetic expression-for-expression identical (same sums,
    // same double division in Scala below) while paying job overhead once.
    // This matters most for log_pa_by_style's 16 concurrent evaluations.
    // coalesce(1) before caching (round 6): the contingency is O(#parsed
    // groups × #gt groups) — template-universe sized (tens to thousands of
    // rows), never corpus-sized — but it inherited the session's shuffle
    // partitioning, so every downstream aggregate launched one task per
    // shuffle partition over a ~100-row cache. Under log_pa_by_style's 16
    // concurrent evaluations those empty tasks were the dominant cost
    // (measured ~0.7 s wall per 32-task stage at 0 ms task time — pure
    // scheduling). One partition ⇒ one task per downstream stage; the
    // map-side combine upstream still runs at full width.
    val cont = contingency(joined).coalesce(1).persist()
    try {
      val gtAgg = cont.groupBy("gt_id").agg(sum("n").as("gsize"))
      val parsedAgg = cont.groupBy("event_id")
        .agg(count_distinct(col("gt_id")).as("span"), sum("n").as("psize"),
             max("gt_id").as("gt1"))
      // 1:1 groups: parsed group spans exactly one gt group AND has its full size.
      val accurate = parsedAgg.filter(col("span") === 1)
        .join(gtAgg, parsedAgg("gt1") === gtAgg("gt_id"))
        .filter(col("psize") === col("gsize"))
        .agg(coalesce(sum("psize"), lit(0L)).as("accurate"))
      val row = cont.agg(pairSumCol("n").as("pairs"), sum("n").as("total"))
        .crossJoin(gtAgg.agg(pairSumCol("gsize").as("real_pairs")))
        .crossJoin(parsedAgg.agg(pairSumCol("psize").as("parsed_pairs")))
        .crossJoin(accurate)
        .collect()(0)
      val pairs = row.getLong(0)
      val total = row.getLong(1)
      val realPairs = row.getLong(2)
      val parsedPairs = row.getLong(3)
      val accurateEvents = row.getLong(4)

      val precision = if (parsedPairs == 0) 0.0 else pairs.toDouble / parsedPairs
      val recall = if (realPairs == 0) 0.0 else pairs.toDouble / realPairs
      val f1 = if (precision + recall == 0) 0.0
               else 2 * precision * recall / (precision + recall)
      Scores(precision, recall, f1, accurateEvents.toDouble / total, total)
    } finally cont.unpersist()
  }

  private def pairSumCol(sizeCol: String): Column =
    coalesce(sum(col(sizeCol) * (col(sizeCol) - 1) / 2), lit(0L)).cast("long")
}
