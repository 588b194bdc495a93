package graft.lenma

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LenMa-style template miner (Shima, "Length Matters: Clustering System Log
  * Messages using Length of Words", arXiv'16; the reference ships it as
  * `logparser/LenMa/LenMa.py` wrapping the author's templateminer —
  * upstream-from-memory cite, SURVEY §0.1).
  *
  * Core idea: a log line's WORD-LENGTH VECTOR (token count + per-position token
  * lengths) identifies its event type — parameters change a word's characters but
  * rarely its shape. The reference clusters online: each message joins the first
  * existing cluster whose length-vector cosine similarity ≥ threshold, and the
  * cluster template keeps a position's word iff every member agrees.
  *
  * Scope here — the deterministic, order-independent instance: similarity
  * threshold 1.0 WITH norm equality, i.e. clusters are exact length-vector groups
  * (cosine 1.0 alone admits parallel-but-scaled integer vectors; requiring equal
  * norms makes the relation transitive, so the result is a partition — no
  * first-match-wins order dependence). The tunable sub-1.0 threshold is the
  * online greedy part and stays out of scope like Drain/Spell's streaming modes
  * (SURVEY §2.9). Template rule per cluster is the reference's: a position is a
  * constant iff all members share one token, else `<*>`.
  *
  * Shape: one groupBy on the length-vector key (map-side combinable), one
  * per-(cluster, pos) agreement agg — fully declarative, DuckDB-provable
  * (SparkEntry `lenma_templates`).
  */
object LenMa {


  /** Mine the template catalog: (event_template, occurrences). */
  def mineTemplates(lines: DataFrame, lineCol: String): DataFrame = {
    val toks = lines
      .select(split(trim(col(lineCol)), "\\s+").as("toks"))
      .withColumn("lkey", concat_ws(",",
        transform(col("toks"), t => length(t).cast("string"))))

    graft.miner.MinerOutput.agreementTemplates(
      toks.select(col("lkey").as("ckey"), lit(1L).as("w"),
        posexplode(col("toks")).as(Seq("pos", "tok"))))
  }

  /** [[mineTemplates]] plus the engine's md5-prefix event id. */
  def mineCatalog(lines: DataFrame, lineCol: String): DataFrame =
    graft.miner.MinerOutput.withEventId(mineTemplates(lines, lineCol))
}
