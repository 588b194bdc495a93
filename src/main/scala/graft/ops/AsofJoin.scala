package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the most recent right row with
  * `right.ts <= left.ts` on the same key (the time-series enrichment primitive:
  * "which config/tier/rate snapshot was in force when this event happened").
  *
  * Spark has no native as-of join, and the naive per-row correlated lookup is a
  * non-starter at scale. This is the UNION + running-last re-expression:
  *
  *   1. union both sides on (key, ts) with a side tag, right rows sorting
  *      BEFORE left rows at equal ts (ties are inclusive: a snapshot stamped at
  *      exactly the event's ts is already in force);
  *   2. one window per key ordered by (ts, side): `last(right payload,
  *      ignoreNulls)` carries each snapshot forward to every later left row;
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle, on the key — the same hash partitioning both inputs would
  * need for any co-located join — then a per-partition sorted scan. No
  * broadcast, no range explosion, no per-key collect; skewed keys can be
  * pre-salted by the caller exactly like any other keyed shuffle. At 10^12 rows
  * this is the plan you want: it degrades into sort-based aggregation per
  * partition and never materializes candidate pairs.
  *
  * Contract: `rightCols` must not collide with left column names (ENFORCED —
  * `withColumn` silently replaces a same-named column, so a collision would
  * corrupt the left payload with no error); if several right rows share
  * (key, ts) the caller pre-dedups (the oracle does the same — see SparkEntry
  * `j_asof`). A NULL value inside a right payload column is
  * indistinguishable from "no snapshot" to the ignoreNulls carry, so an older
  * non-null value would survive past it — encode explicit deletions as sentinel
  * values, not NULLs.
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = rightCols.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"AsofJoin.asof: rightCols ${collisions.mkString(", ")} collide with left " +
        "column names — rename one side (withColumn would silently overwrite)")
    // collision-safe temp name (same move as Sampling.keyCap): a caller column
    // literally named "_side" would otherwise be silently replaced
    val side = Iterator.from(0).map(i => if (i == 0) "_side" else s"_side_$i")
      .find(n => !leftCols.contains(n) && !rightCols.contains(n)).get
    val l = left
      .withColumn(side, lit(1))
      .select((Seq(col(key), col(tsCol), col(side)) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right
      .withColumn(side, lit(0))
      .select((Seq(col(key), col(tsCol), col(side)) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col)): _*)
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col(side) === 1).drop(side)
      .select((Seq(col(key), col(tsCol)) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        rightCols.map(col)): _*)
  }
}
