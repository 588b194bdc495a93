package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — one full scan, no shuffle (top-k via
  * `orderBy.limit` is a partial TakeOrdered, map-side). Scale path: random-hyperplane
  * LSH buckets prune the scan to matching buckets (probes = hamming-adjacent buckets).
  * Dot products use `aggregate`/`zip_with` higher-order functions — codegen'd, no UDF.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12d))

  /** Deterministic pseudo-random hyperplane component r(plane, dim-index) ∈ {-1,+1}
    * from a seeded hash — no RNG state, reproducible on any executor.
    */
  private def rademacher(plane: Int, i: Column): Column =
    when(pmod(xxhash64(lit(plane), i), lit(2)) === 0, lit(1.0d)).otherwise(lit(-1.0d))

  /** Sign of the projection of `vec` onto hyperplane `plane` (Rademacher weights). */
  private def planeBit(vec: Column, plane: Int): Column = {
    val proj = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
      (v, i) => v * rademacher(plane, i)), lit(0.0d), (acc, v) => acc + v)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** `planes`-bit LSH bucket id: similar vectors (small angle) collide with high
    * probability. Pure column expression.
    */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int): Column =
    (0 until planes).map(p => planeBit(vec, p) * lit(1L << p)).reduce(_ + _)

  /** Brute-force cosine top-k against a literal query vector — the exactness oracle.
    * Generic in the element type so callers can score in float32 (storage-native) or
    * float64 (bit-reproducible against a float64 SQL oracle).
    */
  def bruteForceTopK[T: scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[T], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idCol).as("id"), cosine(col(vecCol), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** LSH-bucketed top-k: score only vectors whose bucket is within `probeHamming`
    * bits of the query's bucket. At cluster scale the bucket column is a partition /
    * cluster key, so a probe touches a bounded row range instead of the full table.
    * Generic in the element type (like [[bruteForceTopK]]) so `probeHamming = planes`
    * + double vectors turns the probe into a full scan whose result is provably the
    * brute-force answer — the exactness setting the DuckDB oracle checks.
    */
  def lshTopK[T: scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      query: Seq[T], k: Int, planes: Int = 12,
      probeHamming: Int = 2): DataFrame = {
    val q = typedlit(query)
    // probeHamming >= planes accepts EVERY bucket (hamming over `planes` bits is
    // at most `planes`), so the signature + filter are the identity — skip
    // computing them (round 6): the per-row signature was planes × dim
    // interpreted-lambda xxhash64 evaluations feeding an always-true predicate.
    val candidates =
      if (probeHamming >= planes) df.select(col(idCol).as("id"), col(vecCol).as("v"))
      else {
        val qBucket = hyperplaneSignature(q, dim, planes)
        df.select(col(idCol).as("id"), col(vecCol).as("v"),
            hyperplaneSignature(col(vecCol), dim, planes).as("bucket"))
          .filter(bit_count(col("bucket").bitwiseXOR(qBucket)) <= probeHamming)
      }
    candidates
      .select(col("id"), cosine(col("v"), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  // ---- IVF (inverted-file) index ---------------------------------------------

  /** A fitted IVF index: k centroids + the input with a `bucket` column. At cluster
    * scale the bucketed table is written partitioned/clustered by `bucket`, so a
    * probe reads only nProbe partitions of the corpus.
    */
  final case class IvfIndex(centroids: Array[Array[Float]], bucketed: DataFrame)

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def nearestCentroid(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      val d = sqDist(cs(c), v)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Fit an IVF index with deterministic k-means: seeds = the k rows with smallest
    * xxhash64(id) (a deterministic sample), then `iters` Lloyd rounds. Assignment is
    * a broadcast-centroid map (k×dim floats); the centroid update is one
    * posexplode + groupBy per round — both scale-out shapes.
    */
  def ivfFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 3): IvfIndex = {
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    var centroids: Array[Array[Float]] = base
      .withColumn("h", xxhash64(col("id")))
      .orderBy("h").limit(k)
      .select("v").collect()
      .map(_.getSeq[Float](0).toArray)

    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assign = udf { (v: Seq[Float]) => nearestCentroid(bc.value, v.toArray) }
      val assigned = base.withColumn("bucket", assign(col("v")))
      val updated = assigned
        .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("bucket", "pos").agg(avg("x").as("m"))
        .collect()
      val next = centroids.map(_.clone())
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      centroids = next
    }
    val bcF = spark.sparkContext.broadcast(centroids)
    val assignF = udf { (v: Seq[Float]) => nearestCentroid(bcF.value, v.toArray) }
    IvfIndex(centroids, base.withColumn("bucket", assignF(col("v"))))
  }

  /** IVF probe: score only the `nProbe` buckets nearest to the query. Scoring is
    * float64 regardless of the storage type — the selection/ranking is then
    * bit-reproducible against a float64 SQL oracle, and `nProbe >= k-centroids`
    * (probe everything) provably reduces to brute force.
    */
  def ivfTopK(index: IvfIndex, query: Seq[Float], k: Int, nProbe: Int = 2): DataFrame = {
    val q = query.toArray
    val probes = index.centroids.zipWithIndex
      .sortBy { case (c, _) => sqDist(c, q) }
      .take(nProbe).map(_._2)
    val qd = typedlit(query.map(_.toDouble))
    index.bucketed
      .filter(col("bucket").isin(probes.toSeq: _*))
      .select(col("id"), cosine(col("v").cast("array<double>"), qd).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** Bucket width that keeps the within-bucket join linear: enough hyperplanes that
    * the expected bucket holds ~`targetBucket` rows. Fixed `planes` (round 1's 8 →
    * 256 buckets) goes quadratic-in-bucket at corpus scale; deriving it from the
    * corpus size keeps per-bucket work bounded at ANY n (10^12 rows → ~31 planes,
    * within the clamp: `hyperplaneSignature` packs up to 62 sign bits in a long, so
    * the bounded-bucket guarantee holds to ~2^62·targetBucket rows — beyond any
    * physical corpus). One `count()` of the corpus is the price — trivial next to
    * the join it sizes.
    */
  def autoPlanes(n: Long, targetBucket: Int = 512): Int =
    math.min(62, math.max(4,
      math.ceil(math.log(math.max(n, 1L).toDouble / targetBucket) / math.log(2)).toInt))

  /** All-pairs top-k join (each left row gets its k nearest right rows) via bucketed
    * candidates + window rank — the batch-ANN shape used for corpus-vs-corpus linking.
    * `planes = 0` (default) auto-scales bucket count to the right corpus size via
    * [[autoPlanes]], so the per-bucket self-join stays bounded at 100 TB.
    */
  /** `probeHamming = 0` (default) joins buckets exactly — the scale path (equi-join
    * on the bucket key). `probeHamming > 0` widens the candidate set to buckets
    * within that hamming distance (a non-equi join — Spark plans a broadcast
    * nested-loop when one side is small); `probeHamming >= planes` matches every
    * bucket pair, so the result is provably the exact top-k join — the exactness
    * setting the DuckDB oracle checks with a small left side.
    */
  def topKJoin(left: DataFrame, right: DataFrame, idL: String, idR: String,
               vecCol: String, dim: Int, k: Int, planes: Int = 0,
               probeHamming: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = if (planes > 0) planes else autoPlanes(right.count())
    // Per-ROW norms are hoisted out of the pair loop (round 6): `cosine` per
    // pair re-evaluated norm(v_l) and norm(v_r) — two interpreted dim-element
    // folds — once per CANDIDATE PAIR. norm(v) is a pure per-row function, so
    // computing it once per side and scoring dot/(max(nl·nr, ε)) is the same
    // IEEE expression tree per pair (identical fold order, identical doubles),
    // with per-pair work cut to one fold. probeHamming >= p accepts every
    // bucket pair, so the signatures feed an always-true predicate — skipped.
    val exhaustive = probeHamming >= p
    val bl = if (exhaustive) Seq.empty[org.apache.spark.sql.Column]
      else Seq(hyperplaneSignature(col(vecCol), dim, p).as("bucket_l"))
    val br = if (exhaustive) Seq.empty[org.apache.spark.sql.Column]
      else Seq(hyperplaneSignature(col(vecCol), dim, p).as("bucket_r"))
    val l = left.select(Seq(col(idL).as("id_l"), col(vecCol).as("v_l"),
      norm(col(vecCol)).as("n_l")) ++ bl: _*)
    val r = right.select(Seq(col(idR).as("id_r"), col(vecCol).as("v_r"),
      norm(col(vecCol)).as("n_r")) ++ br: _*)
    val w = Window.partitionBy("id_l").orderBy(desc("score"), col("id_r"))
    val joined =
      if (exhaustive) l.crossJoin(r)
      else if (probeHamming <= 0) l.join(r, col("bucket_l") === col("bucket_r"))
      else l.join(r,
        bit_count(col("bucket_l").bitwiseXOR(col("bucket_r"))) <= probeHamming)
    joined
      .withColumn("score",
        dot(col("v_l"), col("v_r")) / greatest(col("n_l") * col("n_r"), lit(1e-12d)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id_l", "id_r", "score", "rank")
  }
}
