package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation. Both are
  * engine-reproducible by construction (the decision rule is pure arithmetic over
  * md5, so the DuckDB oracles replay it exactly) — the property a 100 TB corpus
  * pipeline needs so that a re-run, a backfill, or a second engine selects the
  * SAME documents. Spark's own `sample()` is seed-deterministic only per
  * partitioning, which reshuffles under repartition; a content-hash rule is stable
  * under any layout.
  */
object Sampling {

  /** Uniform 32-bit hash key from a row id: first 8 hex chars of md5. */
  private def hashKey(idCol: String) =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")

  /** Hash-stratified sampling: a row is kept iff its 32-bit content hash falls
    * below `fraction(stratum) · 2^32`. No shuffle — the decision is a per-row
    * expression plus one broadcast join for the per-stratum fractions; strata
    * missing from the map are dropped (fraction 0).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = fractions.toSeq
      .map { case (s, f) => (s, (f * 4294967296.0).toLong) }
      .toDF(stratumCol, "hash_bound")
    df.join(broadcast(bounds), Seq(stratumCol))
      .filter(hashKey(idCol) < col("hash_bound"))
      .drop("hash_bound")
  }

  /** Per-stratum token budget: rows are ordered by content hash inside each
    * stratum (a deterministic, unbiased order) and kept while the running token
    * total stays within `budget` — the "N tokens per language" curation step. One
    * shuffle (the window partition); at 10^12 rows the stratum is the natural
    * partition key and skew is bounded by the language mix.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashKey(idCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_tokens", sum(col(tokenCol)).over(w))
      .filter(col("running_tokens") <= budget)
      .drop("running_tokens")
  }

  /** Per-key row cap — "at most `k` documents per registered domain", the standard
    * crawl-curation guard against one site dominating the corpus. Semantics are a
    * single `row_number() OVER (PARTITION BY key ORDER BY order) <= k` — but one
    * window alone must co-locate EVERY row of a key, and web domains are the
    * canonical skew key (a hot domain can carry 10^9 rows at crawl scale, all into
    * one reducer). Two phases instead:
    *
    *   1. pre-cap over (key, salt): bounds any one reducer's group to the salt
    *      bucket's share and its OUTPUT to `k` rows — the hot domain leaves
    *      phase 1 as ≤ salts·k rows, everything else unchanged;
    *   2. final cap over key alone on the ≤ salts·k survivors.
    *
    * The global top-k by `order` is contained in the union of per-bucket top-k's,
    * so the result is row-identical to the single-window form (which is exactly
    * what the DuckDB oracle replays) for any deterministic total order.
    */
  def keyCap(df: DataFrame, keyCol: String, orderCol: String, k: Int,
             salts: Int = 64): DataFrame = {
    // temp names picked to not collide with caller columns (withColumn silently
    // REPLACES an existing column, and the trailing drop would then delete the
    // caller's data)
    def temp(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"${base}_$i")
        .find(n => !df.columns.contains(n)).get
    val preRn = temp("__keycap_pre_rn")
    val capRn = temp("__keycap_rn")
    // Salt on a hash of the FULL row, not of orderCol alone: the per-bucket
    // top-k containment argument holds for ANY bucketing, but a salt derived
    // from orderCol degrades back to one hot reducer when the order column has
    // heavy duplicates inside a hot key (e.g. coarse timestamps — every dup
    // hashes to the same bucket). The full-row hash only collides for
    // content-identical rows, which no salt can separate (round-4 ADVICE).
    // MapType columns (at any nesting depth) are excluded from the salt inputs:
    // xxhash64 rejects them at analysis time, and the containment argument only
    // needs SOME deterministic bucketing — orderCol is always orderable, hence
    // always hashable, so the input set is never empty (round-4 ADVICE).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCol = pmod(xxhash64(
      df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq: _*),
      lit(salts))
    val pre = Window.partitionBy(col(keyCol), saltCol)
      .orderBy(col(orderCol))
    val fin = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn(preRn, row_number().over(pre))
      .filter(col(preRn) <= k)
      .withColumn(capRn, row_number().over(fin))
      .filter(col(capRn) <= k)
      .drop(preRn, capRn)
  }
}
