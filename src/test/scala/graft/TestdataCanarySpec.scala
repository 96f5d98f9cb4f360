package graft

/** Canary for driver-side testdata drift — the generator has changed column
  * physical types between rounds (events.ts went TIMESTAMP(NANOS) →
  * TIMESTAMP_NTZ(MICROS)), which silently crashed every consumer of the
  * drifted table instead of failing one named test. This spec pins the
  * engine's expectations for every table at sf0.001 and prints a
  * table.column-level diff on mismatch, so the NEXT drift is a single clear
  * failure naming the table and column.
  *
  * Where the engine's reader is deliberately layout-adaptive (events.ts), the
  * expectation lists every accepted physical type.
  */
class TestdataCanarySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // column -> accepted Spark simpleString types (raw scan, before any
  // Tables.* normalization). timestamp[us] parquet columns surface as
  // timestamp_ntz under Spark 4's default inferTimestampNTZ.
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp_ntz", "timestamp", "date"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp_ntz", "timestamp", "date")),
    "events" -> Seq(
      "event_id" -> Set("bigint"),
      // layout-adaptive in Tables.events: nanos-as-long (legacy layout) or
      // a microsecond timestamp type (current layout)
      "ts" -> Set("bigint", "timestamp_ntz", "timestamp"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  test("every testdata table matches the engine's expected schema at " +
       "every scale factor (drift produces a named table.column diff, " +
       "not a vanished query)") {
    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         (tbl, cols) <- expected.toSeq.sortBy(_._1)) {
      val actual = spark.read
        .parquet(s"/root/testdata/$sf/$tbl.parquet").schema
        .map(f => f.name -> f.dataType.simpleString)
      val actualMap = actual.toMap
      for ((name, accepted) <- cols) {
        actualMap.get(name) match {
          case None =>
            diffs += s"$sf/$tbl.$name: MISSING (table has: " +
              actual.map(_._1).mkString(", ") + ")"
          case Some(t) if !accepted(t) =>
            diffs += s"$sf/$tbl.$name: got $t, engine accepts " +
              accepted.mkString("{", ", ", "}")
          case _ => ()
        }
      }
      val unexpected = actual.map(_._1).filterNot(cols.map(_._1).toSet)
      if (unexpected.nonEmpty)
        diffs += s"$sf/$tbl: NEW columns " + unexpected.mkString(", ")
    }
    assert(diffs.isEmpty, "\nTESTDATA DRIFT:\n  " + diffs.mkString("\n  "))
  }

  test("normalized events reader yields session-zoned microsecond " +
       "timestamps on the current layout") {
    val ts = Tables.events(spark, dir).schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType, ts.toString)
  }
}
