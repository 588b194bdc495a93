package graft.logcluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LogCluster-style pattern miner (Vaarandi & Pihelgas, "LogCluster — A Data
  * Clustering and Pattern Mining Algorithm for Event Logs", CNSM'15; the reference
  * ships it as `logparser/LogCluster` wrapping the Perl implementation —
  * upstream-from-memory cite, SURVEY §0.1).
  *
  * SLCT's successor: words are frequent POSITION-INDEPENDENTLY (support = number of
  * lines containing the word, counted once per line), a line's cluster identity is
  * its ordered tuple of frequent words, and the infrequent runs between them become
  * `*{min,max}` wildcards whose bounds aggregate over the cluster's members.
  *
  * Relational formulation (no per-line sequential state): a window running-count of
  * frequent words within each line assigns every infrequent token to a gap slot
  * (slot i = after the i-th frequent word); per (line, slot) counts → per
  * (cluster, slot) min/max — with explicit zero rows for slots a member leaves
  * empty, so the min is honest — → reassembled by ordered string_agg. Shuffles:
  * word support, per-line key/gap building (one window over lid), cluster
  * aggregation. All bounded, order-independent, DuckDB-provable (SparkEntry
  * `logcluster_templates`).
  *
  * Lines with NO frequent word form the empty-tuple cluster; like SLCT's outliers
  * they are dropped from the catalog when below `support` (and a `*{m,n}`-only
  * pattern when above — kept, it is a legitimate LogCluster output).
  */
object LogCluster {

  /** Mine: (event_template, occurrences) with occurrences ≥ support. */
  def mineTemplates(lines: DataFrame, lineCol: String, support: Long): DataFrame = {
    // Empty tokens (only possible from all-blank lines: split of a trimmed line
    // on \s+ can't otherwise yield "") are dropped up front — a frequent ""
    // would collapse ambiguously in the space-joined cluster key and diverge
    // from the SQL oracle's grouping (round-3 ADVICE fix). Blank lines thus
    // contribute no tokens and fall out of clustering entirely.
    val pe = graft.miner.MinerOutput.explodedTokens(lines, lineCol)
      .filter(col("tok") =!= "")

    // support = lines containing the word (distinct lid), the paper's definition
    val freq = pe.groupBy("tok")
      .agg(count_distinct(col("lid")).as("wf"))
      .filter(col("wf") >= support)
      .select(col("tok"), lit(true).as("is_freq"))

    // slot of a token = number of frequent words at positions <= pos (so an
    // infrequent token between frequent words k and k+1 lands in slot k; tokens
    // before the first frequent word land in slot 0).
    // localCheckpoint is an OPTIMIZATION here (since round 3 lid is a stable
    // content-derived key — MinerOutput.explodedTokens — so re-evaluation across
    // branches is safe): `marked` feeds THREE branches (keys, gapCounts, slots)
    // and materializing one evaluation avoids recomputing the parse + window
    // three times.
    val w = Window.partitionBy("lid").orderBy("pos")
    val marked = pe.join(broadcast(freq), Seq("tok"), "left")
      .withColumn("fseq", sum(when(col("is_freq").isNotNull, 1L).otherwise(0L)).over(w))
      .withColumn("slot", when(col("is_freq").isNotNull, col("fseq") - 1).otherwise(col("fseq")))
      .localCheckpoint(true)

    // per line: the cluster key (ordered frequent words) and n = |key|
    val keys = marked
      .groupBy("lid")
      .agg(
        concat_ws(" ", array_sort(collect_list(when(col("is_freq").isNotNull,
          struct(col("pos"), col("tok"))))).getField("tok")).as("ckey"),
        sum(when(col("is_freq").isNotNull, 1L).otherwise(0L)).as("nfreq"))

    // per (line, slot): infrequent-run length, with EXPLICIT zeros for empty slots
    // (slots 0..nfreq) so cluster-level min() sees members that skipped nothing
    val gapCounts = marked.filter(col("is_freq").isNull)
      .groupBy("lid", "slot").agg(count(lit(1)).as("g"))
    val slots = keys
      .select(col("lid"), col("ckey"), col("nfreq"),
        explode(sequence(lit(0L), col("nfreq"))).as("slot"))
      .join(gapCounts, Seq("lid", "slot"), "left")
      .withColumn("g", coalesce(col("g"), lit(0L)))

    // per (cluster, slot): gap bounds over members; occurrences = member count
    val members = keys.groupBy("ckey", "nfreq").agg(count_distinct(col("lid")).as("occurrences"))
      .filter(col("occurrences") >= support)
    val gapBounds = slots.join(members.select("ckey"), Seq("ckey"), "left_semi")
      .groupBy("ckey", "slot")
      .agg(min(col("g")).as("mn"), max(col("g")).as("mx"))

    // reassemble: slot i's gap piece precedes word i; word pieces come from the
    // key split back on spaces (safe: words are whitespace-free by construction)
    val gapPieces = gapBounds
      .withColumn("piece", when(col("mx") === 0, lit(null))
        .otherwise(concat(lit("*{"), col("mn").cast("string"), lit(","),
          col("mx").cast("string"), lit("}"))))
      .select(col("ckey"), (col("slot") * 2).cast("long").as("ord"), col("piece"))
    val wordPieces = members
      .select(col("ckey"),
        posexplode(when(col("nfreq") === 0, array().cast("array<string>"))
          .otherwise(split(col("ckey"), " "))).as(Seq("wpos", "piece")))
      .select(col("ckey"), (col("wpos") * 2 + 1).cast("long").as("ord"), col("piece"))
    val assembled = gapPieces.unionByName(wordPieces)
      .filter(col("piece").isNotNull)
      .groupBy("ckey")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("ord"), col("piece"))))
        .getField("piece")).as("event_template"))

    members.join(assembled, Seq("ckey"))
      .select(col("event_template"), col("occurrences"))
  }

  /** [[mineTemplates]] plus the engine's md5-prefix event id. */
  def mineCatalog(lines: DataFrame, lineCol: String, support: Long): DataFrame =
    graft.miner.MinerOutput.withEventId(mineTemplates(lines, lineCol, support))
}
