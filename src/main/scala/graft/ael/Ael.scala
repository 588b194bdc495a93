package graft.ael

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AEL-style template miner (Jiang, Hassan, Hamann & Flora, "An Automated Approach
  * for Abstracting Execution Logs to Execution Events", JSME'08; reference ships it
  * as `logparser/AEL/AEL.py` — upstream-from-memory cite, SURVEY §0.1).
  *
  * The four published stages, re-expressed declaratively:
  *  1. anonymize — the paper's heuristics normalized to two PER-TOKEN rules
  *     (token-level so the oracle needs no lookbehind, which RE2 lacks):
  *     `key=value` → `key=<*>`, then any digit-bearing token → `<*>`;
  *  2. tokenize — bin by (token count, wildcard count);
  *  3. categorize — identical anonymized lines merge into one template;
  *  4. reconcile — template groups in one bin that are identical except at ONE
  *     position merge into the holed template. Implemented as a single
  *     leftmost-hole greedy round: each template picks its smallest position
  *     whose hole signature is shared by ≥ 2 distinct templates, and a merge is
  *     emitted only where ≥ 2 templates actually chose the same hole (a template
  *     whose partners merged elsewhere keeps its original form — no lone
  *     wildcards). The reference applies one such merge pass per bin; fixpoint
  *     iteration is out of scope and documented rather than approximated.
  *
  * Stages 1–3 are a map + one aggregation; stage 4 operates on template GROUPS
  * (post-categorize cardinality, orders of magnitude below row count), so its
  * explode-by-position is bounded by |templates|·len. Order-independent,
  * collect-free, DuckDB-provable (SparkEntry `ael_templates`).
  */
object Ael {

  private val Wildcard = "<*>"

  /** Per-token anonymization, shared by the miner and the oracle's SQL mirror. */
  def anonymizeTokens(toks: Column): Column =
    transform(toks, t =>
      when(t.rlike("^\\w+=\\S+$"), regexp_replace(t, "=.*$", "=<*>"))
        .when(t.rlike("[0-9]"), lit(Wildcard))
        .otherwise(t))

  /** Mine the reconciled catalog: (event_template, occurrences). */
  def mineTemplates(lines: DataFrame, lineCol: String): DataFrame = {
    // stages 1–3: anonymize per token, bin, categorize
    val cat = lines
      .select(anonymizeTokens(split(trim(col(lineCol)), "\\s+")).as(("pieces")))
      .withColumn("len", size(col("pieces")))
      .withColumn("nwild", size(filter(col("pieces"),
        p => p === Wildcard || p.endsWith("=<*>"))))
      .groupBy(col("len"), col("nwild"), col("pieces"))
      .agg(count(lit(1)).as("occurrences"))

    // stage 4: hole signatures over template groups
    val holes = cat
      .select(col("len"), col("nwild"), col("pieces"), col("occurrences"),
        explode(sequence(lit(1), col("len"))).as("p"))
      .withColumn("holed", transform(col("pieces"),
        (piece, i) => when(i === col("p") - 1, lit(Wildcard)).otherwise(piece)))
    val mergeable = holes
      .groupBy("len", "nwild", "p", "holed")
      .agg(count_distinct(col("pieces")).as("ntpl"))
      .filter(col("ntpl") >= 2)
      .select(col("len"), col("nwild"), col("p"), col("holed"), lit(true).as("m"))
    // each template's chosen hole = its smallest mergeable position (if any)
    val chosen = holes.join(broadcast(mergeable),
        Seq("len", "nwild", "p", "holed"), "left")
      .groupBy(col("len"), col("nwild"), col("pieces"))
      .agg(min(when(col("m"), col("p"))).as("p_chosen"),
        first(col("occurrences")).as("occurrences"))
      .withColumn("merged",
        when(col("p_chosen").isNotNull, transform(col("pieces"),
          (piece, i) => when(i === col("p_chosen") - 1, lit(Wildcard)).otherwise(piece)))
          .otherwise(col("pieces")))
    // a merge is real only where >= 2 templates chose the same hole
    chosen
      .groupBy(col("len"), col("nwild"), col("p_chosen"), col("merged"))
      .agg(count_distinct(col("pieces")).as("ntpl"),
        sum(col("occurrences")).as("occ"),
        // deterministic fallback when the group turns out to be a lone chooser
        min(col("pieces")).as("lone_pieces"))
      .withColumn("out_pieces",
        when(col("p_chosen").isNotNull && col("ntpl") >= 2, col("merged"))
          .otherwise(col("lone_pieces")))
      .groupBy(concat_ws(" ", col("out_pieces")).as("event_template"))
      .agg(sum(col("occ")).as("occurrences"))
  }

  /** [[mineTemplates]] plus the engine's md5-prefix event id. */
  def mineCatalog(lines: DataFrame, lineCol: String): DataFrame =
    graft.miner.MinerOutput.withEventId(mineTemplates(lines, lineCol))
}
