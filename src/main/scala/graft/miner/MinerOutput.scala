package graft.miner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared output/input shapes for the declarative miners (IPLoM, SLCT, AEL,
  * LogCluster) — one definition of the engine's md5-prefix event id and of the
  * line→token explode, so a change to either is a single edit.
  */
object MinerOutput {

  /** `(event_template, occurrences)` → the engine's catalog projection with
    * `event_id = substr(md5(template), 1, 8)` (F5, same as [[graft.drain.DrainTree.eventId]]).
    */
  def withEventId(templates: DataFrame): DataFrame =
    templates.select(substring(md5(col("event_template")), 1, 8).as("event_id"),
      col("event_template"), col("occurrences"))

  /** Shared template assembly for the agreement-based miners (IPLoM step 4,
    * LenMa, LogMine): `rows` carries one row per (cluster member, position) as
    * `(ckey, w, pos, tok)` with weight `w` (1 for raw lines, the pattern
    * multiplicity for deduped patterns). A position is a constant iff every
    * member agrees (min == max detects it without a per-cell count_distinct);
    * occurrences = Σw, read off at pos 0 (every member contributes exactly one
    * row there); identical templates from different clusters merge their counts.
    */
  def agreementTemplates(rows: DataFrame): DataFrame =
    rows.groupBy("ckey", "pos")
      .agg(min(col("tok")).as("lo"), max(col("tok")).as("hi"), sum(col("w")).as("n"))
      .withColumn("piece",
        when(col("lo") === col("hi"), col("lo")).otherwise(lit("<*>")))
      .groupBy("ckey")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("piece"))))
        .getField("piece")).as("event_template"),
        max(when(col("pos") === 0, col("n"))).as("occurrences"))
      .groupBy("event_template")
      .agg(sum("occurrences").as("occurrences"))

  /** Exploded `(lid, pos, tok)` tokens per line — whitespace tokenization matching
    * the engine's F2 semantics.
    *
    * `lid` is a STABLE content-derived line id (round-3 fix; was
    * `monotonically_increasing_id`, which SURVEY S3 bans for grouping keys: under
    * AQE re-planning or lost-executor recompute two plan branches could see
    * different ids for the same line and a miner's per-line grouping silently
    * shifts). The id is `struct(h = xxhash64(line), dup = row_number over lines
    * with identical content)`: any re-evaluation reproduces the same multiset of
    * ids, and which physical duplicate gets dup=k is irrelevant because identical
    * lines are indistinguishable to every downstream grouping. The duplicate
    * sequence comes from a count-then-re-expand (groupBy gets a MAP-SIDE partial
    * combine, so the exchange moves one row per distinct line — strictly cheaper
    * than the window-over-content alternative, which shuffles and sorts every
    * row). A 64-bit hash collision merging two distinct lines has p ≈ n²/2⁶⁴ —
    * at the mine phase's bounded input (≤10⁵ lines after sampling) that is ~10⁻⁹.
    */
  def explodedTokens(lines: DataFrame, lineCol: String): DataFrame =
    lines
      .select(trim(col(lineCol)).as("line"))
      .groupBy("line").agg(count(lit(1)).as("line_cnt"))
      .select(col("line"),
        explode(sequence(lit(1), col("line_cnt").cast("int"))).as("dup"))
      .select(struct(xxhash64(col("line")).as("h"), col("dup")).as("lid"),
        split(col("line"), "\\s+").as("toks"))
      .select(col("lid"), posexplode(col("toks")).as(Seq("pos", "tok")))
}
