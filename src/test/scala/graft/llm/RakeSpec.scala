package graft.llm

import graft.SparkSpec

/** text_rake re-derived in plain Scala from the raw documents: phrases,
  * word degree/frequency, fixed-point scores, and the final top-20 must
  * match the distributed pipeline exactly.
  */
class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("top-20 RAKE phrases on sf0.001 equal the brute reference") {
    val sf = "/root/testdata/sf0.001"
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // occurrences: (token, phrase-length, phrase-id) per phrase member
    case class Occ(tok: String, plen: Long, phrase: Seq[String])
    val occ = docs.flatMap { case (_, text) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) { runs += cur.toSeq; cur = cur.take(0) } }
        else cur += t
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.flatMap(r => r.map(t => Occ(t, r.length.toLong, r)))
    }
    val freq = occ.groupBy(_.tok).view.mapValues(_.length.toLong).toMap
    val deg = occ.groupBy(_.tok).view.mapValues(_.map(_.plen).sum).toMap
    val sFx = freq.keys.map(t => t -> deg(t) * 1048576L / freq(t)).toMap
    val phrases = occ.groupBy(o => o.phrase).map { case (p, os) =>
      // os holds every member occurrence of every instance of this
      // phrase-run; score uses ONE instance's members
      (p.mkString(" "), os.length.toLong / p.length, // n_occurrences
        p.map(sFx).sum)
    }
    val brute = phrases.toSeq
      .map { case (p, n, s) => (p, n, s) }
      .sortBy { case (p, _, s) => (-s, p) }.take(20)
    val got = graft.SparkEntry.queries("text_rake")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == brute, s"\ngot:   $got\nbrute: $brute")
  }
}
