package graft.drain

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One catalog row produced by mining. */
final case class TemplateRow(event_id: String, event_template: String, occurrences: Long)

/** Typed `Aggregator[Array[String], DrainTree, Seq[TemplateRow]]` — the one-pass,
  * shuffle-light Drain miner (SURVEY §2.8):
  *
  *  - `reduce` runs online Drain partition-locally (Spark keeps the buffer as a live
  *    object inside a partial aggregate; serialization happens only at partition
  *    boundaries),
  *  - `merge` re-inserts right-tree clusters into the left tree in canonical
  *    (length, template) order. NOTE: this canonicalizes only the right side — the
  *    left tree's structure is kept intact, so merge is NOT commutative and Spark's
  *    partial-merge pairing order is not deterministic across runs. The guarantee is
  *    PA-grade reproducibility (stable grouping quality), not a bit-identical
  *    template set; for bit-exactness use the default sequential-exact miner,
  *  - `finish` freezes the catalog.
  *
  * Trade-off vs [[graft.pipeline.LogPipeline.mineDrain]] (the default): this never
  * shuffles raw token rows — only O(#templates) partial trees — so at 10^12-doc scale
  * it is the cheaper mine; but the mined template set depends on the partition layout
  * (online Drain is input-order-dependent), so it is *run-reproducible* (canonical
  * merge) yet not bit-identical to the sequential oracle. The default miner is
  * sequential-exact; use this one when mining cost dominates and grouping-metric
  * parity (PA) suffices — which is exactly the reference's own correctness bar.
  */
class DrainAggregator(depth: Int = 4, st: Double = 0.4, maxChild: Int = 100)
    extends Aggregator[Array[String], DrainTree, Seq[TemplateRow]] {

  override def zero: DrainTree = new DrainTree(depth, st, maxChild)

  override def reduce(b: DrainTree, tokens: Array[String]): DrainTree = {
    b.add(tokens); b
  }

  override def merge(b1: DrainTree, b2: DrainTree): DrainTree = b1.mergeFrom(b2)

  override def finish(r: DrainTree): Seq[TemplateRow] =
    r.catalog().map { case (id, tpl, n) => TemplateRow(id, tpl, n) }

  /** Java serialization keeps the buffer encoder dependency-free; the buffer crosses
    * the wire only once per partition (partial → final), so codec speed is
    * irrelevant next to the per-row mining work.
    */
  override def bufferEncoder: Encoder[DrainTree] = Encoders.javaSerialization[DrainTree]
  override def outputEncoder: Encoder[Seq[TemplateRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TemplateRow]]()
}
