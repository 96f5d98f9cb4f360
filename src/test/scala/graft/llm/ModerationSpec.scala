package graft.llm

import graft.SparkSpec

class ModerationSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("blocklist: matching is normalization-invariant (case, runs of " +
       "whitespace), substring-level, one row per (doc, phrase)") {
    val d = docs(
      1L -> "totally clean text",
      2L -> "some BAD   PHRASE here",       // case + double space
      3L -> "bad phrase and worse words",   // two hits
      4L -> "badphrase",                    // no token boundary -> no hit
      5L -> "prefix bad phrases suffix")    // substring hit ("bad phrase")
    val hits = Moderation.blocklistHits(d,
      Seq("bad phrase", "worse words")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hits == Set(
      (2L, "bad phrase"), (3L, "bad phrase"), (3L, "worse words"),
      (5L, "bad phrase")), hits)
  }

  test("kwic: every occurrence surfaces with a clipped window at doc " +
       "edges and exact 1-based positions") {
    val d = docs(
      1L -> "cat b c d cat f",
      2L -> "cat",
      3L -> "a b cat")
    val got = Moderation.kwic(d, "cat", window = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 1L, "cat b c"),         // window clipped at the left edge
      (1L, 5L, "c d cat f"),       // clipped at the right edge
      (2L, 1L, "cat"),             // single-token doc
      (3L, 3L, "a b cat")), got)
  }

  test("fk orphan census: a planted orphan key is counted, clean edges " +
       "report zero") {
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 11L), (3L, 99L))
      .toDF("id", "parent_id")
    val parent = Seq(10L, 11L, 12L).toDF("pk")
    val r = graft.operators.Profiling
      .fkOrphans("t.fk", child, "parent_id", parent, "pk")
      .collect().head
    assert(r.getString(0) == "t.fk")
    assert(r.getLong(1) == 3 && r.getLong(2) == 1)
  }
}
