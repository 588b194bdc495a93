package graft

/** The driver's smoke gate: `SparkEntry.entry` must return rows. */
class EntrySpec extends SparkSuite {
  test("entry() returns template-cluster counts on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("event_id", "event_template", "occurrences"))
    assert(df.count() > 0)
  }
}
