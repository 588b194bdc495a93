package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-decontamination for training corpora: flag training documents that
  * share word n-grams with an evaluation/benchmark set, so they can be dropped
  * before pre-training (the standard n-gram-overlap decontamination rule used by
  * web-corpus pipelines).
  *
  * Scale shape (the 100 TB path): both sides reduce to DISTINCT n-gram strings;
  * the benchmark side is orders of magnitude smaller than the corpus (eval sets
  * are thousands of docs, the corpus is billions) and is always broadcast, so the
  * training side never shuffles — one scan + explode + broadcast-hash semi-shape
  * join + per-doc hash agg. Nothing here is quadratic in corpus size.
  */
object Decontam {

  /** Training docs sharing ≥ `minOverlap` DISTINCT word n-grams with ANY benchmark
    * doc, with the overlap count. Columns: (train_id, n_overlap).
    *
    * `array_distinct` before the explode keeps within-doc repeats from inflating
    * the overlap count; `countDistinct` after the join keeps a shingle shared with
    * several benchmark docs from counting more than once (the benchmark side is
    * collapsed to a distinct shingle set first, which also minimizes the broadcast).
    */
  def ngramOverlap(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Int): DataFrame = {
    val trainSh = train.select(col(idCol).as("train_id"),
      explode(Dedup.wordShinglesDistinct(col(textCol), n)).as("sh"))
    val benchSh = bench
      .select(explode(Dedup.wordShinglesDistinct(col(textCol), n)).as("sh"))
      .distinct()
    trainSh.join(broadcast(benchSh), Seq("sh"))
      .groupBy("train_id")
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }
}
