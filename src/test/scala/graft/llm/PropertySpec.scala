package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the custom operators: the TopK aggregator must be
  * indistinguishable from the window-rank formulation on arbitrary data,
  * and exact dedup must be idempotent.
  */
class PropertySpec extends SparkSpec {

  private def checkProp(prop: Prop, tests: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopK aggregator == window row_number formulation on random data") {
    val genRows = Gen.nonEmptyListOf(for {
      g <- Gen.chooseNum(0L, 5L)
      id <- Gen.chooseNum(0L, 50L)
      s <- Gen.chooseNum(-10, 10)
    } yield (g, id, s.toDouble))
    checkProp(Prop.forAll(genRows) { rows =>
      import spark.implicits._
      // distinct (g, id): ranking is defined per distinct member
      val df = rows.toDF("g", "id", "s")
        .groupBy("g", "id").agg(max("s").as("s"))
      val viaAgg = Similarity.topKPerGroup(df, "g", "id", "s", 3)
        .select("g", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
      val viaWindow = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("g", "id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      viaAgg == viaWindow
    })
  }

  test("decontaminate against itself flags every multi-token doc with " +
       "its full shingle count; against a disjoint corpus flags nothing") {
    val genDocs = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 50L)
      n <- Gen.chooseNum(3, 12)
      base <- Gen.chooseNum(0, 1)
    } yield (id, (1 to n).map(i => s"w${base}_${i}").mkString(" ")))
    checkProp(Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
        .groupBy("doc_id").agg(first("text").as("text"))
      val n = 3
      val self = Dedup.decontaminate(df, df, n = n).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = Dedup.withShingles(df, "doc_id", "text", n)
        .select(col("doc_id"), size(col("sh")).as("k"))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      // disjoint vocabulary -> zero contamination
      val shifted = df.select(col("doc_id"),
        regexp_replace(col("text"), "w", "zz").as("text"))
      val none = Dedup.decontaminate(df, shifted, n = n).count()
      self == expected && none == 0L
    }, tests = 5)
  }

  test("exact dedup is idempotent and total-count preserving") {
    val genDocs = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 100L)
      t <- Gen.oneOf("aa bb", "aa  BB", "cc dd", "x", "")
    } yield (id, t))
    checkProp(Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
        .groupBy("doc_id").agg(first("text").as("text"))
      val once = Dedup.exact(df)
      val onceRows = once.collect()
      // multiplicities must add back to the corpus size
      val totalCopies = onceRows.map(_.getLong(2)).sum
      // dedup of the deduped survivors keeps every row with n_copies 1
      val surviving = df.join(once.select("doc_id"), "doc_id")
      val twice = Dedup.exact(surviving).collect()
      totalCopies == df.count() &&
        twice.length == onceRows.length &&
        twice.forall(_.getLong(2) == 1L)
    })
  }

  test("windows_with_pos invariants on random token arrays: distinct " +
       "windows, valid first-occurrence positions, exact reconstruction") {
    val genDoc = for {
      id <- Gen.chooseNum(0L, 30L)
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd"))
    } yield (id, toks.mkString(" "))
    checkProp(Prop.forAll(Gen.nonEmptyListOf(genDoc)) { docs =>
      import spark.implicits._
      val n = 3
      val byId = docs.toMap // one text per id, same row set as df below
      val df = byId.toSeq.toDF("doc_id", "text")
      val toksById = byId.map { case (id, t) =>
        id -> t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
      }
      Dedup.windowsWithPos(df, "doc_id", "text", n).collect().forall { r =>
        val (id, w, pos) = (r.getLong(0), r.getString(1), r.getInt(2))
        val toks = toksById(id)
        // pos in range and the window IS the n tokens starting there
        pos >= 0 && pos + n <= toks.length &&
          w == toks.slice(pos, pos + n).mkString(" ") &&
          // first occurrence: no earlier start yields the same window
          (0 until pos).forall(p =>
            toks.slice(p, p + n).mkString(" ") != w)
      } && {
        // per doc: one row per DISTINCT window, none for short docs
        val counts = Dedup.windowsWithPos(df, "doc_id", "text", n)
          .groupBy("doc_id").agg(count(lit(1)).as("c"),
            countDistinct(col("w")).as("d"))
          .collect()
        counts.forall(r => r.getLong(1) == r.getLong(2))
      }
    })
  }

  test("dedupLines is idempotent and never grows the text") {
    val genDoc = for {
      id <- Gen.chooseNum(0L, 30L)
      lines <- Gen.listOf(Gen.oneOf("nav", "body", "x y", ""))
    } yield (id, lines.mkString("\n"))
    checkProp(Prop.forAll(Gen.nonEmptyListOf(genDoc)) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
        .groupBy("doc_id").agg(first("text").as("text"))
      val once = Dedup.dedupLines(df)
      val twice = Dedup.dedupLines(once.select("doc_id", "text"))
      val o = once.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2)))).toMap
      val t = twice.collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2)))).toMap
      o.keySet == t.keySet && o.forall { case (id, (text, _)) =>
        t(id)._1 == text && t(id)._2 == 0 // second pass drops nothing
      }
    })
  }

  test("chunking invariants on arbitrary docs/params: exact coverage " +
       "when overlaps are dropped, boundary overlap preserved, bounded " +
       "chunk sizes") {
    val genCase = for {
      nToks <- Gen.chooseNum(1, 120)
      chunk <- Gen.chooseNum(2, 40)
      overlap <- Gen.chooseNum(0, 1).flatMap(_ => Gen.chooseNum(0, chunk - 1))
    } yield (nToks, chunk, overlap)
    checkProp(Prop.forAll(genCase) { case (nToks, chunk, overlap) =>
      import spark.implicits._
      val toks = (1 to nToks).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val out = Mixing.chunkDocs(df, "doc_id", "text", chunk, overlap)
        .orderBy("chunk_id").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4).split(" ").toSeq))
      val sizesOk = out.forall { case (_, _, n, words) =>
        n == words.length && n >= 1 && n <= chunk
      }
      // every chunk after the first repeats exactly `overlap` boundary
      // tokens; dropping them reassembles the document losslessly
      val overlapsOk = out.sliding(2).forall {
        case Array((_, _, _, a), (_, _, _, b)) =>
          a.takeRight(overlap) == b.take(overlap)
        case _ => true
      }
      val reassembled = out.head._4 ++
        out.tail.flatMap { case (_, _, _, w) => w.drop(overlap) }
      sizesOk && overlapsOk && reassembled == toks
    }, tests = 30)
  }

  test("token budget is a prefix property: a larger budget keeps a " +
       "superset of a smaller budget's documents, per-stratum totals " +
       "overflow by at most the crossing document") {
    val genDocs = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 60L)
      src <- Gen.oneOf("a", "b")
      n <- Gen.chooseNum(1, 9)
    } yield (id, src, (1 to n).map(i => s"t$i").mkString(" ")))
    val genBudgets = for {
      lo <- Gen.chooseNum(2L, 15L)
      hi <- Gen.chooseNum(16L, 60L)
    } yield (lo, hi)
    checkProp(Prop.forAll(genDocs, genBudgets) { (docs, budgets) =>
      import spark.implicits._
      val (lo, hi) = budgets
      val df = docs.toDF("doc_id", "source", "text")
        .groupBy("doc_id", "source").agg(first("text").as("text"))
      def kept(b: Long) =
        Mixing.tokenBudget(df, "doc_id", "text", "source", b).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val small = kept(lo)
      val big = kept(hi)
      val subsetOk = small.map(t => (t._1, t._2)).toSet
        .subsetOf(big.map(t => (t._1, t._2)).toSet)
      val boundOk = Seq(small -> lo, big -> hi).forall { case (rows, b) =>
        rows.groupBy(_._2).forall { case (_, rs) =>
          val total = rs.map(_._3).sum
          total < b + rs.map(_._3).max
        }
      }
      subsetOk && boundOk
    }, tests = 15)
  }

  test("count-min property: estimates never undercount and respect the " +
       "2n/w bound on arbitrary token streams") {
    // The epsilon-bound (est <= n + 2N/w) is PROBABILISTIC over the hash
    // draw -- with fixed hashes an adversarial stream can exceed it, and
    // a ScalaCheck run eventually generates one (observed). The
    // deterministic theorems are: never undercount; a row whose bucket
    // isolates the key estimates it EXACTLY (so the min does too); and
    // the sketch is linear under merge (split the stream anywhere, merge
    // the halves, get the identical array).
    val genTokens = Gen.nonEmptyListOf(Gen.chooseNum(0, 30).map(i => s"t$i"))
    checkProp(org.scalacheck.Prop.forAll(genTokens) { toks =>
      val cms = new graft.operators.Sketches.CountMin(4, 32)
      val sk = toks.foldLeft(cms.zero)(cms.reduce)
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val distinct = truth.keys.toSeq
      val noUnder = truth.forall { case (t, n) =>
        val est = (0 until 4).map(i =>
          sk(i * 32 + graft.operators.Sketches.CountMin.bucket(i, t, 32))).min
        est >= n
      }
      val exactWhenIsolated = truth.forall { case (t, n) =>
        val est = (0 until 4).map(i =>
          sk(i * 32 + graft.operators.Sketches.CountMin.bucket(i, t, 32))).min
        val isolated = (0 until 4).exists { i =>
          val b = graft.operators.Sketches.CountMin.bucket(i, t, 32)
          distinct.forall(o => o == t ||
            graft.operators.Sketches.CountMin.bucket(i, o, 32) != b)
        }
        !isolated || est == n
      }
      val cut = toks.size / 2
      val merged = cms.merge(
        toks.take(cut).foldLeft(cms.zero)(cms.reduce),
        toks.drop(cut).foldLeft(cms.zero)(cms.reduce))
      noUnder && exactWhenIsolated && java.util.Arrays.equals(sk, merged)
    }, tests = 30)
  }

  test("pagerank property: ranks positive, mass within truncation loss, " +
       "invariant under edge-list duplication (dedup by construction)") {
    val genEdges = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 12L)
      b <- Gen.chooseNum(0L, 12L)
      if a != b
    } yield (a, b))
    checkProp(org.scalacheck.Prop.forAll(genEdges) { edges =>
      import spark.implicits._
      def run(es: Seq[(Long, Long)]) =
        graft.operators.Graphs.pageRank(es.toDF("src", "dst"), iters = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val r = run(edges)
      val scale = 1L << 40
      // duplicated edge lists describe the same graph
      r == run(edges ++ edges) &&
        r.values.forall(_ > 0) &&
        r.values.sum <= scale + r.size
    }, tests = 5)
  }

  test("byte-level BPE round-trips ARBITRARY unicode byte-exactly: " +
       "pretokens partition the input; ids always decode back") {
    // plain driver-side property (the encode closure is the same object
    // the distributed path broadcasts): any string — control chars,
    // surrogate pairs, zalgo, whitespace runs — must survive
    // pretokenize -> byte-encode -> merge -> id -> decode unchanged.
    val genText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "\n", "  "),
      Gen.oneOf("é", "中", "😀", "ß", "'ll", "3.14", "☃", " "),
      Gen.asciiPrintableStr.map(_.take(5))
    )).map(_.mkString)
    val hist = Map("the" -> 50L, " the" -> 40L, "ing" -> 30L, " a" -> 20L)
    val merges = Bpe.ByteLevel.train(hist, numMerges = 15)
    val ranks = merges.zipWithIndex.toMap
    val vocab = Bpe.ByteLevel.vocabulary(merges)
    val inv = Bpe.ByteLevel.inverse(vocab)
    checkProp(Prop.forAll(genText) { t =>
      val pre = Bpe.ByteLevel.preTokenize(t)
      val ids = Bpe.ByteLevel.encodeTextToIds(t, ranks, vocab)
      pre.mkString == t &&
        Bpe.ByteLevel.decodeIds(ids, inv) == t &&
        ids.forall(i => i >= 0 && i < 256 + merges.length)
    }, tests = 200)
  }
}
