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

  /** Brute-force cosine top-k against a literal query vector — the exactness oracle. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idCol).as("id"), cosine(col(vecCol), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** LSH-bucketed top-k: score only vectors whose bucket is within `probeHamming`
    * bits of the query's bucket. At cluster scale the bucket column is a partition /
    * cluster key, so a probe touches a bounded row range instead of the full table.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              query: Seq[Float], k: Int, planes: Int = 12,
              probeHamming: Int = 2): DataFrame = {
    val q = typedlit(query)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(col(vecCol), dim, planes).as("bucket"))
    val qBucket = hyperplaneSignature(q, dim, planes)
    bucketed
      .filter(bit_count(col("bucket").bitwiseXOR(qBucket)) <= probeHamming)
      .select(col("id"), cosine(col("v"), q).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** All-pairs top-k join (each left row gets its k nearest right rows) via bucketed
    * candidates + window rank — the batch-ANN shape used for corpus-vs-corpus linking.
    */
  def topKJoin(left: DataFrame, right: DataFrame, idL: String, idR: String,
               vecCol: String, dim: Int, k: Int, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.select(col(idL).as("id_l"), col(vecCol).as("v_l"),
      hyperplaneSignature(col(vecCol), dim, planes).as("bucket"))
    val r = right.select(col(idR).as("id_r"), col(vecCol).as("v_r"),
      hyperplaneSignature(col(vecCol), dim, planes).as("bucket"))
    val w = Window.partitionBy("id_l").orderBy(desc("score"), col("id_r"))
    l.join(r, Seq("bucket"))
      .withColumn("score", cosine(col("v_l"), col("v_r")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id_l", "id_r", "score", "rank")
  }
}
