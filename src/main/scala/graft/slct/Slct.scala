package graft.slct

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** SLCT-style frequent-word template miner (Vaarandi, "A Data Clustering Algorithm
  * for Mining Patterns from Event Logs", IPOM'03; the reference ships it as
  * `logparser/SLCT` wrapping Vaarandi's C implementation — upstream-from-memory
  * cite, SURVEY §0.1).
  *
  * Scope — the two counting passes that define the algorithm:
  *  pass 1: global (position, word) frequencies; pairs with count ≥ `support` are
  *          the frequent words;
  *  pass 2: each line is abstracted to its frequent words (infrequent positions →
  *          `<*>`); abstracted lines with ≥ `support` occurrences are the clusters.
  * Lines falling only into sub-support candidates are SLCT's outliers; the
  * reference streams them to a side file — here they are simply not emitted
  * (the count is recoverable as total − sum(occurrences); callers that need the
  * outlier rows anti-join the abstraction against the catalog).
  *
  * Like [[graft.iplom.Iplom]], and unlike the online Drain/Spell miners, both
  * passes are plain aggregations: shuffle 1 counts (pos, word) pairs (map-side
  * combinable; the frequent set is ≤ positions·n/support entries, broadcastable
  * by construction), shuffle 2 groups abstracted lines. Order-independent,
  * collect-free, and therefore DuckDB-provable end-to-end (SparkEntry
  * `slct_templates`).
  */
object Slct {

  private val Wildcard = "<*>"

  /** Mine the cluster catalog: (event_template, occurrences), occurrences ≥ support. */
  def mineTemplates(lines: DataFrame, lineCol: String, support: Long): DataFrame = {
    // lid stays inside ONE lineage here (only the abstraction branch groups by
    // it; the freq branch never touches lid), so no materialization is needed —
    // contrast LogCluster, where lid crosses branches
    val pe = graft.miner.MinerOutput.explodedTokens(lines, lineCol)
    val freq = pe.groupBy("pos", "tok")
      .agg(count(lit(1)).as("wf"))
      .filter(col("wf") >= support)
      .select(col("pos"), col("tok"), lit(true).as("is_freq"))
    pe.join(broadcast(freq), Seq("pos", "tok"), "left")
      .withColumn("piece",
        when(col("is_freq").isNotNull, col("tok")).otherwise(lit(Wildcard)))
      .groupBy("lid")
      .agg(concat_ws(" ",
        array_sort(collect_list(struct(col("pos"), col("piece"))))
          .getField("piece")).as("event_template"))
      .groupBy("event_template")
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") >= support)
  }

  /** [[mineTemplates]] plus the engine's md5-prefix event id. */
  def mineCatalog(lines: DataFrame, lineCol: String, support: Long): DataFrame =
    graft.miner.MinerOutput.withEventId(mineTemplates(lines, lineCol, support))
}
