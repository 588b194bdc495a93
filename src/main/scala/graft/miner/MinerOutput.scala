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

  /** Exploded `(lid, pos, tok)` tokens per line — whitespace tokenization matching
    * the engine's F2 semantics. `lid` is a per-evaluation row id: valid as a
    * grouping/join key only within ONE evaluation of this frame (materialize
    * first if several branches must agree on it — see LogCluster).
    */
  def explodedTokens(lines: DataFrame, lineCol: String): DataFrame =
    lines
      .select(monotonically_increasing_id().as("lid"),
        split(trim(col(lineCol)), "\\s+").as("toks"))
      .select(col("lid"), posexplode(col("toks")).as(Seq("pos", "tok")))
}
