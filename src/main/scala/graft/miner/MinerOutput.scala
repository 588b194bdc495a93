package graft.miner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * lines are indistinguishable to every downstream grouping. The window
    * partitions by line CONTENT (hash-shuffle, no global sort) so it scales; a
    * 64-bit hash collision merging two distinct lines has p ≈ n²/2⁶⁴ — at the
    * mine phase's bounded input (≤10⁵ lines after sampling) that is ~10⁻⁹.
    */
  def explodedTokens(lines: DataFrame, lineCol: String): DataFrame =
    lines
      .select(trim(col(lineCol)).as("line"))
      .withColumn("dup", row_number().over(Window.partitionBy("line").orderBy("line")))
      .select(struct(xxhash64(col("line")).as("h"), col("dup")).as("lid"),
        split(col("line"), "\\s+").as("toks"))
      .select(col("lid"), posexplode(col("toks")).as(Seq("pos", "tok")))
}
