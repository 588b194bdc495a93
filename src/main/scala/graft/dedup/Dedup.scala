package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed around its
  * shuffle shape at 100 TB:
  *
  *  - exact: one hash-aggregate shuffle on a 16-byte key — the cheapest possible.
  *  - MinHash+LSH: signature is a pure column expression (higher-order functions, no
  *    UDF); candidate generation is a band-bucket self-join (shuffle on band hash,
  *    never all-pairs); verification is exact Jaccard on the candidates only.
  *  - SimHash: 64-bit sketch; near-dup = Hamming distance ≤ k via bucketed prefix.
  *  - embedding cosine: random-hyperplane LSH buckets → exact cosine on candidates.
  */
object Dedup {

  // ---- exact -----------------------------------------------------------------

  /** Exact dedup: group by content hash, keep the smallest id as the canonical row.
    * Map-side partial aggregation makes this one shuffle of (hash → min,count).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Rows surviving exact dedup (the keep set). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---- shingles / MinHash / LSH ----------------------------------------------

  /** Word k-shingles as an array column — `transform(sequence(...))` keeps it inside
    * whole-stage codegen (no UDF).
    */
  def wordShingles(textCol: Column, k: Int): Column = {
    val toks = split(trim(textCol), "\\s+")
    val n = size(toks)
    when(n < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - k + 1),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the min over
    * shingle hashes. Pure column expression; one pass over the shingle array per
    * hash function.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      h => array_min(transform(shingles, s => xxhash64(s, h))))

  /** LSH band keys: hash `rows`-sized runs of the signature; docs sharing any band
    * key are candidates. Output: array of (band, bandHash).
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(concat_ws(",",
        transform(slice(sig, b * rows + 1, lit(rows)), x => x.cast("string")))).as("band_hash")))

  /** Estimated Jaccard from two signatures: fraction of agreeing positions. */
  def sigAgreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p)).cast("double") /
      size(a).cast("double")

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    * Shuffle shape: explode bands → shuffle on (band, band_hash) → within-bucket
    * self-join (small buckets) → exact verify. Returns (id_a, id_b, jaccard) with
    * id_a < id_b.
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
                      numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7): DataFrame = {
    val withSig = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles", array_distinct(wordShingles(col("text"), k)))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
    val banded = withSig
      .select(col("id"), col("shingles"),
        explode(lshBandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
      .select(col("id"), col("shingles"), col("bk.band"), col("bk.band_hash"))
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    cand
      .withColumn("jaccard", exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard over two shingle-set arrays (arrays must be distinct). */
  def exactJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)).cast("double"), lit(1.0))

  /** All-pairs n-gram Jaccard above a threshold — the LSH-free exact variant for
    * modest cardinalities (verification oracle for the LSH path; the LSH path is the
    * scale path). Broadcast-joins when one side is small; otherwise a full shuffle —
    * by design, use minhashDupPairs at scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), k)).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash ---------------------------------------------------------------

  /** 64-bit SimHash over word tokens: per-bit majority vote of token hashes.
    * Implemented as a Scala UDF (bit loop); per-row cost is O(tokens × 64 / word).
    */
  val simhash64 = udf { (text: String) =>
    if (text == null) 0L
    else {
      val toks = text.trim.split("\\s+")
      val counts = new Array[Int](64)
      toks.foreach { t =>
        var h = scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xFFFFFFFFL
        // widen to 64 bits deterministically
        h = h * 0x9E3779B97F4A7C15L + 0xC2B2AE3D27D4EB4FL
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        var i = 0
        while (i < 64) { if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1; i += 1 }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }

  /** Near-dup candidates by SimHash: docs whose simhash agrees on a `prefixBits`-bit
    * band (4 rotations) are candidates; verified by Hamming distance ≤ maxHamming.
    * The rotation-band trick keeps this a hash-equi-join (shuffleable) rather than a
    * quadratic distance scan.
    */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withH = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    // 4 bands of 16 bits: pigeonhole — hamming ≤ 3 ⇒ at least one identical band
    val banded = withH.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sh"), b * 16)
          .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding near-dup ----------------------------------------------------

  /** Embedding cosine near-dup pairs via random-hyperplane LSH buckets (deterministic
    * seeded hyperplanes) + exact cosine verify on candidates.
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, planes: Int = 16,
                        threshold: Double = 0.95): DataFrame = {
    val sig = graft.sim.Ann.hyperplaneSignature(col(vecCol), dim, planes)
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("bucket"))
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.sim.Ann.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
