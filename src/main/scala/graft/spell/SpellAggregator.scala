package graft.spell

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[Array[String], SpellModel, SpellModel]` — the distributed
  * Spell residue miner (SURVEY §2.8, the Spell analog of
  * [[graft.drain.DrainAggregator]]):
  *
  *  - `reduce` runs online Spell partition-locally (the buffer is a live model
  *    inside the partial aggregate; serialization only at partition boundaries),
  *    capped at `perPartitionLimit` lines per partition so a pathological residue
  *    can never blow an executor (the lines beyond the cap fall through to the
  *    self-template match path, same contract as the old driver-side bound);
  *  - `merge` is [[SpellModel.canonicalMerge]]: a fresh model replayed from the
  *    sorted union of both cluster lists, so merge(a,b) == merge(b,a)
  *    bit-identically. Across different merge-tree shapes the result is
  *    grouping-grade reproducible (online Spell is insertion-order dependent) —
  *    the same contract DrainAggregator documents;
  *  - `finish` returns the merged model (it carries the prefix tree, so it is
  *    directly usable as the frozen match catalog).
  *
  * This replaces the round-2 driver-side residue mine: no `.collect()` of residue
  * rows — only O(#clusters) partial models cross the wire.
  */
class SpellAggregator(tau: Double = 0.5, perPartitionLimit: Long = 100000L)
    extends Aggregator[Array[String], SpellModel, SpellModel] {

  override def zero: SpellModel = new SpellModel(tau)

  override def reduce(b: SpellModel, tokens: Array[String]): SpellModel = {
    if (b.minedLines < perPartitionLimit) b.add(tokens)
    b
  }

  override def merge(b1: SpellModel, b2: SpellModel): SpellModel =
    b1.canonicalMerge(b2)

  override def finish(r: SpellModel): SpellModel = r

  override def bufferEncoder: Encoder[SpellModel] = Encoders.javaSerialization[SpellModel]
  override def outputEncoder: Encoder[SpellModel] = Encoders.javaSerialization[SpellModel]
}
