package graft.lfa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LFA-style template miner (Nagappan & Vouk, "Abstracting log lines to log event
  * types for mining software system logs", MSR'10; the reference ships it as
  * `logparser/LFA/LFA.py::LogParser` ≈200 LoC — upstream-from-memory cite,
  * SURVEY §0.1).
  *
  * Core idea: tokens that belong to the static part of a log line occur with the
  * frequency of their event type, while parameter tokens are rare — so each LINE
  * can be split individually, with no global support knob:
  *  pass 1: global (position, word) frequencies (LFA counts per position, like
  *          SLCT's pass 1);
  *  pass 2: within each line, sort its token frequencies descending and split at
  *          the LARGEST GAP between consecutive frequencies; tokens at or above
  *          the split are constants, the rest become `<*>`. A line whose token
  *          frequencies are all equal has no gap and is kept fully constant
  *          (covers both all-unique lines and fully-static lines).
  *
  * Relational formulation (no sequential state): frequency join + one window over
  * the line id for the gap scan + one `max_by` per line for the split threshold —
  * ties on the gap resolve to the HIGHER frequency (split conservatively, fewer
  * constants), deterministically. Shuffles: (pos,tok) count, the per-line window,
  * template grouping — all bounded and map-side combinable, so like
  * [[graft.slct.Slct]] the whole mine is DuckDB-provable (SparkEntry
  * `lfa_templates`).
  */
object Lfa {

  private val Wildcard = "<*>"

  /** Mine the template catalog: (event_template, occurrences). Every line lands in
    * exactly one template (LFA has no outlier stream — rare lines simply become
    * heavily-wildcarded templates with small occurrence counts).
    */
  def mineTemplates(lines: DataFrame, lineCol: String): DataFrame = {
    val pe = graft.miner.MinerOutput.explodedTokens(lines, lineCol)
    val freq = pe.groupBy("pos", "tok").agg(count(lit(1)).as("wf"))
    // materialized once: `marked` feeds the threshold branch AND the final
    // assembly join — unmaterialized, the tokenize+frequency join re-runs per
    // branch (CollapseProject re-evaluation trap)
    val marked = pe.join(freq, Seq("pos", "tok")).localCheckpoint(true)

    // largest-RELATIVE-gap split per line: order the line's tokens by frequency
    // descending; ratio_i = wf_i / wf_{i+1} (1.0 for the last row). The split
    // threshold is the smallest wf among rows achieving the max ratio — ties
    // split as low as possible, keeping more tokens constant. A relative gap
    // separates the static band from the parameter band even when the static
    // tokens' own frequencies differ a lot (freqs [90,50,2]: ratios [1.8, 25]
    // put the split under 50 → "login <*> ok"; an ABSOLUTE gap would split
    // under 90 and wildcard the verb). All-equal frequencies give ratio 1.0
    // everywhere and threshold = the common frequency → fully constant line.
    // The ratio is an IEEE double division of two exact integers, so the SQL
    // oracle reproduces every comparison bit-identically.
    val w = Window.partitionBy("lid").orderBy(desc("wf"), col("pos"))
    val thr = marked
      .withColumn("ratio",
        col("wf").cast("double") / coalesce(lead(col("wf"), 1).over(w), col("wf")))
      .withColumn("rmax", max(col("ratio")).over(Window.partitionBy("lid")))
      .groupBy("lid")
      .agg(min(when(col("ratio") === col("rmax"), col("wf"))).as("thr"))

    marked.join(thr, Seq("lid"))
      .withColumn("piece", when(col("wf") >= col("thr"), col("tok")).otherwise(lit(Wildcard)))
      .groupBy("lid")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("piece"))))
        .getField("piece")).as("event_template"))
      .groupBy("event_template")
      .agg(count(lit(1)).as("occurrences"))
  }

  /** [[mineTemplates]] plus the engine's md5-prefix event id. */
  def mineCatalog(lines: DataFrame, lineCol: String): DataFrame =
    graft.miner.MinerOutput.withEventId(mineTemplates(lines, lineCol))
}
