package graft.ops

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {

  private def ts(off: Long) = new java.sql.Timestamp(1704067200000L + off * 1000L)

  test("asof: latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(5), "c"),
      (2L, ts(10), "d"),
      (3L, ts(10), "e")
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(8), 100L), (1L, ts(20), 200L), (1L, ts(25), 300L),
      (2L, ts(11), 400L)
    ).toDF("user_id", "ts", "snap")

    val out = AsofJoin.asof(left, right, "user_id", "ts", Seq("snap"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set(
      (1L, ts(10), "a", 100L), // snapshot at 8 in force at 10
      (1L, ts(20), "b", 200L), // tie ts: snapshot AT the event's ts is inclusive
      (1L, ts(5), "c", -1L),   // no snapshot yet -> null
      (2L, ts(10), "d", -1L),  // right exists but only later -> null
      (3L, ts(10), "e", -1L))) // key with no right rows at all
  }

  test("asof plan: single shuffle on the key, no broadcast/product") {
    import spark.implicits._
    val left = (0L until 200L).map(i => (i % 7, ts(i), i)).toDF("user_id", "ts", "x")
    val right = (0L until 50L).map(i => (i % 7, ts(i * 3), i * 10)).toDF("user_id", "ts", "snap")
    val plan = AsofJoin.asof(left, right, "user_id", "ts", Seq("snap"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not expand pairs:\n$plan")
    // exactly one exchange feeds the window (the union's two scans share it)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size >= 1)
    assert(!plan.contains("SortMergeJoin"), "no join node at all - union+window only")
  }
}
