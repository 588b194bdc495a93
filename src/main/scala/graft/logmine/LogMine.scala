package graft.logmine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LogMine-style hierarchical pattern miner (Hamooni, Debnath, Xu, Zhang, Jiang &
  * Mueen, "LogMine: Fast Pattern Recognition for Log Analytics", CIKM'16; the
  * reference ships it as `logparser/LogMine/LogMine.py` ≈400 LoC —
  * upstream-from-memory cite, SURVEY §0.1).
  *
  * Core idea: level-0 patterns are the DISTINCT processed lines (exact dedup with
  * counts); patterns closer than `maxDist` cluster, and each cluster's template
  * keeps a position's token iff all members agree.
  *
  * Scope — the deterministic, order-independent instance:
  *  - distance is restricted to EQUAL-token-count patterns: dist(p, q) =
  *    mismatched positions / len (the paper's 1 − 2·matches/(len₁+len₂) at
  *    len₁ = len₂). Cross-length Smith-Waterman alignment — the sequential part —
  *    stays out of scope like Drain/Spell's online modes (SURVEY §2.9).
  *  - clustering is the TRANSITIVE CLOSURE of the ≤ maxDist relation (min-label
  *    connected components, [[graft.dedup.Dedup.connectedComponents]]) instead of
  *    the reference's one-pass friends-of-friends whose result depends on scan
  *    order. Every pattern lands in exactly one cluster; singletons keep their
  *    own pattern as template.
  *
  * Scale shape: candidate pairs come from an EXACT pigeonhole banding — split the
  * `len` positions into ⌊maxDist·len⌋ + 1 contiguous bands; two patterns within
  * `maxDist` differ in ≤ ⌊maxDist·len⌋ positions, so at least one band matches
  * completely, and the band equi-join finds every qualifying pair (no recall
  * caveat, same guarantee as the simhash pigeonhole). Per-bucket work is bounded
  * by band-value frequency, never all-pairs-in-length-group. One distance verify
  * join makes precision exact. Everything is groupBy/join/window — DuckDB-provable
  * end-to-end (SparkEntry `logmine_templates`).
  */
object LogMine {


  /** Mine the template catalog: (event_template, occurrences). */
  def mineTemplates(lines: DataFrame, lineCol: String, maxDist: Double = 0.3): DataFrame = {
    // level 0: distinct processed patterns with multiplicities; the pattern
    // string doubles as a stable id via xxhash64 (collision ~n²/2⁶⁴ — negligible
    // at mine-phase inputs, same contract as the miner lid)
    val patterns = lines
      .select(trim(col(lineCol)).as("p"))
      .filter(col("p") =!= "")
      .groupBy("p").agg(count(lit(1)).as("cnt"))
      .withColumn("pid", xxhash64(col("p")))
      .withColumn("toks", split(col("p"), "\\s+"))
      .withColumn("len", size(col("toks")))

    // exact pigeonhole banding: nb = floor(maxDist·len)+1 contiguous bands; a
    // pair within maxDist matches at least one full band
    val banded = patterns
      .withColumn("nb", (floor(col("len") * maxDist) + 1).cast("int"))
      .select(col("pid"), col("len"), col("toks"), col("nb"),
        explode(sequence(lit(0), col("nb") - 1)).as("band"))
      .withColumn("bstart", floor(col("band") * col("len") / col("nb")).cast("int"))
      .withColumn("bend", floor((col("band") + 1) * col("len") / col("nb")).cast("int"))
      .withColumn("bh", xxhash64(col("band"),
        concat_ws(" ", slice(col("toks"), col("bstart") + 1, col("bend") - col("bstart")))))
      .select(col("len"), col("band"), col("bh"), col("pid"))

    val a = banded.select(col("len"), col("band"), col("bh"), col("pid").as("id_a"))
    val b = banded.select(col("len"), col("band"), col("bh"), col("pid").as("id_b"))
    val cand = a.join(b, Seq("len", "band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // exact distance verify: mismatched positions / len <= maxDist
    val pa = patterns.select(col("pid").as("id_a"), col("toks").as("t_a"), col("len"))
    val pb = patterns.select(col("pid").as("id_b"), col("toks").as("t_b"), col("len").as("len_b"))
    val pairs = cand.join(pa, Seq("id_a")).join(pb, Seq("id_b"))
      .filter(col("len") === col("len_b"))
      .withColumn("mism", size(filter(zip_with(col("t_a"), col("t_b"),
        (x, y) => x =!= y), m => m)))
      .filter(col("mism") <= floor(col("len") * maxDist))
      .select("id_a", "id_b")

    // transitive closure -> cluster labels; singletons keep their own pid
    val labeled = graft.dedup.Dedup.connectedComponents(pairs)
    val withCluster = patterns
      .join(labeled.withColumnRenamed("id", "pid"), Seq("pid"), "left")
      .withColumn("cluster", coalesce(col("component"), col("pid")))

    // per cluster: positionwise agreement -> constant, else wildcard (shared
    // assembly; weight = the level-0 pattern multiplicity)
    graft.miner.MinerOutput.agreementTemplates(
      withCluster.select(col("cluster").as("ckey"), col("cnt").as("w"),
        posexplode(col("toks")).as(Seq("pos", "tok"))))
  }

  /** [[mineTemplates]] plus the engine's md5-prefix event id. */
  def mineCatalog(lines: DataFrame, lineCol: String, maxDist: Double = 0.3): DataFrame =
    graft.miner.MinerOutput.withEventId(mineTemplates(lines, lineCol, maxDist))
}
