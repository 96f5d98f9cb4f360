package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private def writeFixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("clean lines parse into the declared schema; malformed lines land " +
       "in quarantine with their raw bytes; nothing is dropped") {
    val path = writeFixture(Seq(
      """{"doc_id": 1, "text": "hello world", "source": "src0"}""",
      """{"doc_id": 2, "text": "also fine", "source": "src1", "extra": 9}""",
      """{"doc_id": 3 "text": "missing comma"}""",
      """not json at all""",
      """{"doc_id": 4, "text": null, "source": "src0"}"""))
    val (clean, quarantine) = Jsonl.readDocs(spark, path, schema)
    val rows = clean.collect()
    // undeclared fields are skipped, null field values are fine
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    assert(clean.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "source")) // corrupt col never escapes
    val q = quarantine.collect().map(_.getString(0))
    assert(q.length == 2, q.mkString("|"))
    assert(q.exists(_.contains("missing comma")) &&
      q.contains("not json at all"), q.mkString("|"))
  }

  test("ingest stats: one row with clean/quarantine counts and corpus size") {
    val path = writeFixture(Seq(
      """{"doc_id": 1, "text": "abcde", "source": "s"}""",
      """{"doc_id": 2, "text": "xy", "source": "s"}""",
      """broken"""))
    val r = Jsonl.ingestStats(spark, path, schema, "text").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2L && r(0).getLong(1) == 7L &&
      r(0).getLong(2) == 1L, r(0).toString)
  }

  test("a declared corrupt column in the caller schema is rejected") {
    intercept[IllegalArgumentException](Jsonl.readDocs(spark, "/tmp/x",
      StructType(Seq(StructField("_corrupt_record", StringType)))))
  }

  test("csv twin: typed clean rows, header dropped, short/untypeable " +
       "rows quarantined") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("feed.csv"),
      Seq("doc_id,text,source",            // header -> dropped
        "1,hello world,src0",
        "2,\"quoted, with comma\",src1",   // quoted delimiter survives
        "oops,not a number,src0",          // untypeable doc_id
        "3,short-row").mkString("", "\n", "\n"))
    val (clean, quarantine) = Csv.readRows(spark, dir.toString, schema)
    val rows = clean.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L), rows.toSeq)
    assert(rows.find(_.getLong(0) == 2L).get.getString(1) ==
      "quoted, with comma")
    val q = quarantine.collect().map(_.getString(0))
    assert(q.length == 2 && q.exists(_.startsWith("oops")) &&
      q.contains("3,short-row"), q.mkString("|"))
  }

  test("gzipped jsonl decodes transparently") {
    val dir = Files.createTempDirectory("graft_jsonlgz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("part-0.jsonl.gz")))
    out.write("""{"doc_id": 7, "text": "zipped", "source": "s"}""".getBytes("UTF-8"))
    out.write('\n'); out.close()
    val (clean, quarantine) = Jsonl.readDocs(spark, dir.toString, schema)
    assert(clean.collect().map(_.getLong(0)).toSeq == Seq(7L))
    assert(quarantine.count() == 0)
  }

  test("xml: clean rows typed with escapes unwound; garbage and all-null " +
       "elements quarantined") {
    val dir = Files.createTempDirectory("graft_xml")
    Files.writeString(dir.resolve("part-0.xml"),
      Seq(
        "<row><doc_id>1</doc_id><text>a &lt;b&gt; &amp; c</text>" +
          "<source>s1</source></row>",
        "<row><doc_id>2</doc_id><text>plain</text><source>s2</source></row>",
        "not xml at all",
        "<row><other>field</other></row>" // parses, but no declared field
      ).mkString("", "\n", "\n"))
    val (clean, quarantine) = Xml.readRecords(spark, dir.toString, schema)
    val rows = clean.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1L, "a <b> & c", "s1"), (2L, "plain", "s2")))
    assert(quarantine.collect().map(_.getString(0)).toSet ==
      Set("not xml at all", "<row><other>field</other></row>"))
  }
}
