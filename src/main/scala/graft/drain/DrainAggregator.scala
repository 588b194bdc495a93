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
  *  - `merge` is [[DrainTree.canonicalMerge]]: a fresh tree rebuilt from the sorted
  *    union of both cluster lists, so `merge(a,b)` and `merge(b,a)` are bit-identical
  *    (Spark does not fix which partial lands on which side). What is NOT promised is
  *    invariance across different merge-TREE shapes — online Drain is
  *    insertion-order dependent — so across-run reproducibility is PA-grade (stable
  *    grouping quality); for bit-exactness use the default sequential-exact miner,
  *  - `finish` freezes the catalog.
  *
  * Trade-off vs [[graft.pipeline.LogPipeline.mineDrain]] (the default): this never
  * shuffles raw token rows — only O(#templates) partial trees — so at 10^12-doc scale
  * it is the cheaper mine; the price is the PA-grade (not bit-exact-vs-sequential)
  * template set. Use this one when mining cost dominates and grouping-metric
  * parity (PA) suffices — which is exactly the reference's own correctness bar.
  */
class DrainAggregator(depth: Int = 4, st: Double = 0.4, maxChild: Int = 100)
    extends Aggregator[Array[String], DrainTree, Seq[TemplateRow]] {

  override def zero: DrainTree = new DrainTree(depth, st, maxChild)

  override def reduce(b: DrainTree, tokens: Array[String]): DrainTree = {
    b.add(tokens); b
  }

  override def merge(b1: DrainTree, b2: DrainTree): DrainTree = b1.canonicalMerge(b2)

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
