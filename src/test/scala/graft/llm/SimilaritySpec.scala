package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("TopK aggregator: exact top-k with id tie-break, any partitioning") {
    import spark.implicits._
    val scored = (1 to 100).map(i => (1L, i.toLong, (i % 10).toDouble))
      .toDF("g", "id", "s").repartition(13)
    val top = Similarity.topKPerGroup(scored, "g", "id", "s", 5).collect()
    // score 9 at ids 9,19,...,99 -> top5 = ids 9,19,29,39,49
    assert(top.map(r => (r.getInt(2), r.getLong(1))).toSeq ==
      Seq((1, 9L), (2, 19L), (3, 29L), (4, 39L), (5, 49L)))
  }

  test("bruteForceKnn ranks by true cosine, excludes self") {
    val d = vecs(
      0L -> Seq(1.0, 0.0, 0.0),
      1L -> Seq(0.9, 0.1, 0.0), // closest to 0
      2L -> Seq(0.5, 0.5, 0.0),
      3L -> Seq(0.0, 1.0, 0.0)) // farthest from 0
    val out = Similarity.bruteForceKnn(d, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(!out.map(_.getLong(1)).contains(0L))
  }

  test("mmr: first pick is the relevance top-1; a redundant twin is " +
       "demoted behind a diverse alternative; lam=1 degenerates to pure " +
       "relevance; deterministic under partitioning") {
    // query 0 along x; candidates: 1 and 2 near-identical high-relevance
    // directions (cos ≈ 0.99994 apart), 3 less relevant but far from both
    // — at lam=mu=0.5 the twin's marginal score is negative while the
    // diverse candidate keeps a +0.035 margin
    val d = vecs(
      0L -> Seq(1.0, 0.0, 0.0),
      1L -> Seq(0.9, 0.1, 0.0),
      2L -> Seq(0.9, 0.11, 0.0),
      3L -> Seq(0.8, -0.6, 0.0))
    def run(df: org.apache.spark.sql.DataFrame, lam: Double, mu: Double) =
      Similarity.mmrRerank(df, nQueries = 1, nCand = 3, k = 3,
          lam = lam, mu = mu)
        .orderBy("rank").collect()
        .map(r => (r.getInt(1), r.getLong(2)))
    val mmr = run(d, 0.5, 0.5)
    assert(mmr.head == (1, 1L), "rank 1 must be the cosine top-1")
    assert(mmr(1) == (2, 3L),
      s"diversity must promote the orthogonal candidate: ${mmr.toSeq}")
    assert(mmr(2) == (3, 2L))
    val pure = run(d, 1.0, 0.0)
    assert(pure.map(_._2).toSeq == Seq(1L, 2L, 3L),
      "mu=0 must reproduce the relevance order")
    import spark.implicits._
    val big = (0L until 60L)
      .map(i => (i, Seq.tabulate(8)(j => math.sin(i * 7 + j).abs + 0.1)))
      .toDF("vec_id", "embedding")
    val a = Similarity.mmrRerank(big, nQueries = 3, nCand = 12, k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Similarity.mmrRerank(big.repartition(11), nQueries = 3,
        nCand = 12, k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "greedy must be partitioning-invariant")
    assert(a.size == 18, "3 queries x 6 ranks")
  }

  test("LSH buckets identical vectors together; knn finds exact twins") {
    val twin = Seq.tabulate(8)(i => math.sin(i + 1))
    val d = vecs(
      0L -> twin, 1L -> twin.map(_ * 2.0), // same direction -> same buckets
      2L -> Seq.tabulate(8)(i => math.cos(3 * i + 2)))
    val out = Similarity.lshKnn(d, planes = 6, k = 2, dim = 8).collect()
    val n0 = out.filter(_.getLong(0) == 0L)
    assert(n0.nonEmpty && n0.head.getLong(1) == 1L)
    assert(math.abs(n0.head.getDouble(3) - 1.0) < 1e-12)
  }

  test("lshKnn recall vs brute force beats chance by a wide margin") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceKnn(d, nQueries = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshKnn(d, planes = 4, tables = 8, k = 5)
      .filter(col("query_id") < 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    // These embeddings are uniform random 64-dim vectors — the worst case
    // for LSH (nearest neighbors are barely more similar than random
    // pairs). 8 tables of 4 planes still has to beat the ~1/16 same-bucket
    // chance rate decisively; on real clustered embeddings recall is far
    // higher (see the planted-twin test above).
    assert(recall > 0.3, s"recall=$recall")
  }

  test("planesFor scales the bucket space with the corpus and clamps") {
    assert(Similarity.planesFor(500) == 4)            // min clamp
    assert(Similarity.planesFor(64L * 1024) == 11)    // 2^11 buckets, pop 32
    assert(Similarity.planesFor(1L << 40) == 24)      // max clamp
    // expected bucket population stays ~targetBucket across scales
    Seq(100000L, 10000000L).foreach { n =>
      val p = Similarity.planesFor(n, targetBucket = 64)
      val pop = n.toDouble / (1L << p)
      assert(pop <= 128 && pop >= 16, s"n=$n planes=$p pop=$pop")
    }
  }

  test("lshKnn auto planes (corpus-scaled) keeps recall above chance") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceKnn(d, nQueries = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshKnn(d, tables = 8, k = 5) // planes = auto
      .filter(col("query_id") < 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("ivfKnn recall vs brute force beats the probed-list fraction") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceKnn(d, nQueries = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfKnn(d, nlist = 16, nprobe = 4, k = 5)
      .filter(col("query_id") < 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    // probing 4 of 16 lists scans ~25% of a uniform corpus; recall must
    // beat that baseline decisively (the quantizer concentrates neighbors)
    assert(recall > 0.35, s"recall=$recall")
  }

  test("ivfKnn is deterministic across runs AND partitionings (driver-" +
       "side Lloyd's, no RNG)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfKnn(df, nlist = 8, nprobe = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = run(d)
    assert(run(d) == base)
    assert(run(d.repartition(11)) == base)
  }

  test("pinned-centroid ivfKnn (the oracle-replayable variant) is " +
       "deterministic and the trained quantizer matches or beats it") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceKnn(d, nQueries = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(res: Set[(Long, Long)]) =
      (brute & res).size.toDouble / brute.size
    def pinned(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfKnn(df, nprobe = 4, k = 5,
          centroidVecIds = 0L until 16L, nQueries = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = pinned(d)
    assert(pinned(d.repartition(11)) == p)
    // both quantizers must beat the 4/16 probed-list fraction baseline
    // (no trained-vs-pinned ordering assert: at 50 vectors the 16 pinned
    // corpus points cover a third of the space and can WIN — the ordering
    // only emerges at scale, where pinned points stop being dense)
    val trained = Similarity.ivfKnn(d, nlist = 16, nprobe = 4, k = 5)
      .filter(col("query_id") < 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recallOf(trained) > 0.25, s"trained recall=${recallOf(trained)}")
    assert(recallOf(p) > 0.25, s"pinned recall=${recallOf(p)}")
  }

  test("pqKnn recall vs exact L2 beats chance decisively on uniform " +
       "vectors; deterministic across partitionings") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // exact L2 top-5 per query, computed independently of the operator
    val all = d.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray)).sortBy(_._1)
    val queries = all.take(20)
    val brute = queries.flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (nid, nv) =>
          val d2 = qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum
          (nid, d2)
        }
        .sortBy { case (nid, d2) => (d2, nid) }.take(5)
        .map { case (nid, _) => (qid, nid) }
    }.toSet
    val approx = Similarity.pqKnn(d, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    // uniform random 64-dim vectors are PQ's worst case (no cluster
    // structure for the codebooks to exploit); random top-5 agreement on
    // this corpus would be ~5/n. The coded scan must still rank true
    // neighbors far above chance.
    assert(recall > 0.3, s"recall=$recall")
    val re = Similarity.pqKnn(d.repartition(7), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(re == approx)
  }

  test("pqKnn: a planted exact twin codes identically and ranks 1 (its " +
       "ADC distance is the query's own quantization distortion — the " +
       "minimum any code can score)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // planted exact twin: identical vector -> identical argmin codes in
    // every subspace -> its ADC total is the minimal achievable for the
    // query, so it must rank first (ADC is never 0 — the table stores
    // distances from the QUERY's subvectors to the centroids, so even the
    // twin pays the query's quantization distortion)
    val twin = d.filter(col("vec_id") === 0)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val out = Similarity.pqKnn(d.unionByName(twin), k = 3)
    val first = out.filter(col("query_id") === 0 &&
      col("neighbor_id") === 100000L).collect()
    assert(first.length == 1 && first(0).getInt(2) == 1, first.mkString)
    assert(first(0).getDouble(3) > 0.0) // distortion, not SDC's zero
  }

  test("pinned planes / corpus-size hint keep the LSH operators fully " +
       "lazy — no sizing job at plan-construction time") {
    val sc = spark.sparkContext
    val d = vecs(
      0L -> Seq.tabulate(8)(i => math.sin(i + 1)),
      1L -> Seq.tabulate(8)(i => math.cos(i + 2)),
      2L -> Seq.tabulate(8)(i => math.sin(2 * i)))
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    Similarity.lshKnn(d, planes = 4, tables = 2, k = 2, dim = 8)
    Similarity.lshKnn(d, tables = 2, k = 2, dim = 8, corpusSize = 3)
    Similarity.cosineNearDups(d, planes = 4, tables = 2, dim = 8)
    Similarity.cosineNearDups(d, tables = 2, dim = 8, corpusSize = 3)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"plan construction ran ${after - before} eager job(s)")
  }

  test("jacobiEigen: hand-computable 2x2 and orthonormal basis on a " +
       "random symmetric 8x8") {
    val (ev, v) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(ev.sorted.zip(Seq(1.0, 3.0)).forall(p =>
      math.abs(p._1 - p._2) < 1e-12), ev.toSeq.toString)
    // eigenvector for λ=3 is (1,1)/√2 up to sign
    val k3 = if (math.abs(ev(0) - 3.0) < 1e-9) 0 else 1
    assert(math.abs(math.abs(v(0)(k3)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0)(k3) - v(1)(k3)) < 1e-12)
    // random symmetric: V columns orthonormal, A V = V Λ
    val rnd = new scala.util.Random(7)
    val d = 8
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (ev8, v8) = Similarity.jacobiEigen(m)
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(r => v8(r)(a) * v8(r)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
      val av = (0 until d).map(r => m(a)(r) * v8(r)(b)).sum
      assert(math.abs(av - ev8(b) * v8(a)(b)) < 1e-9)
    }
  }

  test("pcaWhiten: output covariance is the identity, planted anisotropy " +
       "is removed, stable across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d = 6
    // anisotropic cloud: dim 0 stretched 10x, dim 1 shifted
    val data = (0L until 400L).map { i =>
      (i, Seq.tabulate(d)(j => rnd.nextGaussian() *
        (if (j == 0) 10.0 else 1.0) + (if (j == 1) 5.0 else 0.0)))
    }
    val df = data.toDF("vec_id", "embedding")
    val out = Similarity.pcaWhiten(df, dim = d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out.size == 400)
    val n = out.size.toDouble
    val vecs = out.values.toArray
    for (a <- 0 until d) {
      val mean = vecs.map(_(a)).sum / n
      assert(math.abs(mean) < 1e-9, s"whitened dim $a must be centered")
      for (b <- a until d) {
        val cov = vecs.map(v => v(a) * v(b)).sum / n
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(cov - want) < 1e-6,
          s"whitened cov($a,$b)=$cov must be $want")
      }
    }
    val again = Similarity.pcaWhiten(df.repartition(13), dim = d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val maxDiff = out.keys.map(k =>
      out(k).zip(again(k)).map(p => math.abs(p._1 - p._2)).max).max
    assert(maxDiff < 1e-6,
      s"whitening must be stable across partitionings (maxDiff=$maxDiff)")
  }

  test("cosineNearDups finds planted duplicate directions only") {
    val a = Seq.tabulate(8)(i => math.sin(i * 2 + 1))
    val d = vecs(
      0L -> a, 1L -> a.map(_ * 3.0),
      2L -> Seq.tabulate(8)(i => math.cos(5 * i)),
      3L -> Seq.tabulate(8)(i => math.sin(i) * math.cos(i)))
    val pairs = Similarity.cosineNearDups(d, planes = 3, threshold = 0.99,
        dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("hardNegatives honors the cosine window: near-dups excluded above " +
       "the ceiling, easy negatives below the floor, rest ranked by cos") {
    import spark.implicits._
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64); parts.foreach { case (i, x) => a(i) = x }; a
    }
    // anchor 0 = e0. Candidates: 10 = near-dup (cos ~0.995, above ceiling),
    // 11 = hard (cos ~0.71), 12 = harder (cos ~0.89), 13 = orthogonal
    // (cos 0, below floor).
    val rows = Seq(
      (0L, v(0 -> 1f)),
      (10L, v(0 -> 1f, 1 -> 0.1f)),
      (11L, v(0 -> 1f, 1 -> 1f)),
      (12L, v(0 -> 1f, 1 -> 0.5f)),
      (13L, v(1 -> 1f)))
    val out = Similarity.hardNegatives(rows.toDF("vec_id", "embedding"),
        nAnchors = 1, k = 5, floor = 0.2, ceiling = 0.9)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(12L, 11L), out.mkString(";"))
    intercept[IllegalArgumentException](
      Similarity.hardNegatives(rows.toDF("vec_id", "embedding"),
        floor = 0.9, ceiling = 0.2))
  }

  test("semanticDecontaminate flags planted bench twins exactly, never " +
       "leaks a bench row into the output, and is exact (no LSH miss)") {
    import spark.implicits._
    // bench vectors: ids 0 and 1 (orthogonal directions). Corpus: id 10 =
    // exact copy of bench 0 (cos 1), id 11 = copy of bench 1, id 12 =
    // near-copy of bench 0 (cos ~0.995), id 13 = orthogonal to both.
    def vec(i: Int): Array[Float] = {
      val v = new Array[Float](64); v(i) = 1f; v
    }
    def mix(a: Array[Float], b: Array[Float], w: Float) =
      a.zip(b).map { case (x, y) => x + w * y }
    val rows = Seq(
      (0L, vec(0)), (1L, vec(1)),
      (10L, vec(0)), (11L, vec(1)),
      (12L, mix(vec(0), vec(2), 0.1f)), (13L, vec(3)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(df,
        benchPred = col("vec_id") < 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(10L, 11L, 12L), out.mkString(";"))
    assert(out.forall(_._2 == 1L)) // each hits exactly one bench vector
    assert(out.find(_._1 == 10L).get._3 == 1.0)
    // the near-copy is caught — the exactness guarantee an LSH-bucketed
    // candidate join could not make at this threshold
    assert(out.find(_._1 == 12L).get._3 > 0.99)
  }

  test("semanticDedup keeps one min-id survivor per component, counts drops") {
    // Component {0,1,2} chained by direction (0~1, 1~2 — NOT 0~2 direct if
    // buckets split them; components must still collapse the chain), plus
    // two singletons. All five rows must appear exactly once in either the
    // survivor set or a drop count.
    val a = Seq.tabulate(8)(i => math.sin(i * 2 + 1))
    val d = vecs(
      0L -> a, 1L -> a.map(_ * 3.0), 2L -> a.map(_ * 0.5),
      3L -> Seq.tabulate(8)(i => math.cos(5 * i)),
      4L -> Seq.tabulate(8)(i => math.sin(i) * math.cos(i)))
    val out = Similarity.semanticDedup(d, planes = 3, threshold = 0.99,
        dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 2L, 3L -> 0L, 4L -> 0L), out.toString)
  }

  test("semanticDedup leaves a pair-free corpus untouched") {
    val d = vecs(
      0L -> Seq.tabulate(8)(i => math.sin(7 * i + 1)),
      1L -> Seq.tabulate(8)(i => math.cos(3 * i + 2)))
    val out = Similarity.semanticDedup(d, planes = 3, threshold = 0.999,
        dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L))
  }

  test("quantizeInt8: codes clamp to ±127, the max-|v| element saturates, " +
       "zero vectors code to zeros, dequantization error within half a step") {
    val d = vecs(
      0L -> Seq(0.5, -1.0, 0.25, 0.0),
      1L -> Seq(0.0, 0.0, 0.0, 0.0),
      2L -> Seq(2.0, 1.0, -0.5, 0.001))
    val out = Similarity.quantizeInt8(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    assert(out(1L)._2 == Seq(0, 0, 0, 0)) // zero scale -> zero codes
    assert(out(0L) == ((1.0, Seq(64, -127, 32, 0))))
    assert(out(2L)._1 == 2.0 && out(2L)._2.head == 127)
    out.values.foreach { case (s, qs) =>
      assert(qs.forall(q => q >= -127 && q <= 127))
      if (s > 0) assert(qs.exists(q => math.abs(q) == 127),
        "the max-|v| element must saturate the code range")
    }
    // |q·s/127 − v| ≤ s/254 (half a quantization step) for every element
    val d0 = Seq(0.5, -1.0, 0.25, 0.0)
    d0.zip(out(0L)._2).foreach { case (v, q) =>
      assert(math.abs(q * out(0L)._1 / 127.0 - v) <= out(0L)._1 / 254.0 + 1e-12)
    }
  }

  test("int8Knn: dequantized-dot ranking tracks cosine truth (recall ≥ " +
       "0.85 at sf0.001) and is deterministic across partitionings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val truth = Similarity.bruteForceKnn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Similarity.int8Knn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(found).size.toDouble / truth.size
    assert(recall >= 0.85, s"int8 recall $recall below floor")
    val re = Similarity.int8Knn(emb.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = Similarity.int8Knn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(re == base)
  }

  test("randomProject: JL distance preservation within the k=16 " +
       "concentration band, exact determinism, and a shuffle-free plan") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val proj = Similarity.randomProject(emb)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must be map-only")
    val p = proj.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val v = emb.selectExpr("vec_id", "cast(embedding as array<double>)")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val ids = v.keys.toSeq.sorted.take(12)
    for (a <- ids; b <- ids if a < b) {
      val dOrig = v(a).zip(v(b)).map { case (x, y) =>
        val d = x - y; d * d }.sum
      val dProj = (0 until 16).map { j =>
        val d = (p((a, j)) - p((b, j))).toDouble / (1L << 20); d * d }.sum
      val ratio = dProj / 16.0 / dOrig
      assert(ratio > 0.2 && ratio < 3.0,
        s"JL distortion $ratio out of band for pair ($a,$b)")
    }
    // exact integer determinism under repartitioning
    val re = Similarity.randomProject(emb.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(re == p)
  }

  test("kmeans: planted tight clusters separate perfectly; assignments " +
       "and centroids deterministic across partitionings") {
    import spark.implicits._
    // two tight blobs around (0,0,..) and (0.9,0.9,..); seeds 0 and 1 land
    // one in each blob
    val rows = (0 until 20).map { n =>
      val base = if (n % 2 == 0) 0.0 else 0.9
      (n.toLong, Seq.tabulate(4)(i => base + 0.001 * ((n * 7 + i) % 5)))
    }
    val d = rows.toDF("vec_id", "embedding")
    val assign = Similarity.kmeansAssignments(d, k = 2, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val evens = (0 until 20 by 2).map(n => assign(n.toLong)).toSet
    val odds = (1 until 20 by 2).map(n => assign(n.toLong)).toSet
    assert(evens.size == 1 && odds.size == 1 && evens != odds,
      s"blobs must separate: $assign")
    val c1 = Similarity.kmeansCentroids(d, k = 2, iters = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val c2 = Similarity.kmeansCentroids(d.repartition(7), k = 2, iters = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(c1 == c2, "integer k-means must be partitioning-invariant")
  }

  test("kmeans: identical seeds make one cluster empty — it carries its " +
       "centroid unchanged (ties assign to the lowest k)") {
    import spark.implicits._
    val d = ((0L, Seq(0.5, 0.5)) +: (1L to 10L).map(n =>
      (n, Seq(0.5, 0.5)))).toDF("vec_id", "embedding")
    // seeds 0 and 1 are the same point -> every vector ties -> all to k=0
    val assign = Similarity.kmeansAssignments(d, k = 2, iters = 3).collect()
      .map(r => r.getInt(1)).toSet
    assert(assign == Set(0))
    val cents = Similarity.kmeansCentroids(d, k = 2, iters = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // cluster 1 never gained members: its centroid is still the seed
    val seed = math.floor(0.5 * 1048576.0 + 0.5).toLong
    assert(cents((1, 0)) == seed && cents((1, 1)) == seed)
  }

  test("davies-bouldin: two tight well-separated blobs score far below a " +
       "split-blob clustering, and the table is internally consistent") {
    import spark.implicits._
    val rows = (0 until 20).map { n =>
      val base = if (n % 2 == 0) 0.0 else 0.9
      (n.toLong, Seq.tabulate(4)(i => base + 0.001 * ((n * 7 + i) % 5)))
    }
    val d = rows.toDF("vec_id", "embedding")
    val out = Similarity.kmeansDaviesBouldin(d, k = 2, iters = 4).collect()
    assert(out.length == 2)
    // n sums to the corpus; db is the mean of d_i and identical per row
    assert(out.map(_.getLong(1)).sum == 20L)
    val dIs = out.sortBy(_.getInt(0)).map(_.getDouble(4))
    val db = out.head.getDouble(5)
    assert(out.forall(_.getDouble(5) == db))
    assert(db == dIs.foldLeft(0.0)(_ + _) / 2)
    // tight separated blobs: scatter tiny vs the inter-centroid gap
    assert(db < 0.1, s"db=$db")
    // the sf0.001 embeddings table runs end to end with k=8
    val real = graft.SparkEntry.queries("embed_db_index")(spark,
      "/root/testdata/sf0.001").collect()
    assert(real.length == 8 && real.forall(_.getDouble(5) > 0))
  }

  test("brute-force plan: corpus is not shuffled before the TopK aggregate") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Similarity.bruteForceKnn(d).queryExecution.executedPlan.toString
    // the only join must be broadcast nested loop (small query side built
    // and broadcast; corpus streamed), never a sort-merge/shuffle join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("filtered kNN: neighbors share the query's label; reduces to " +
       "plain kNN on a single-label corpus; label equality plans a hash " +
       "join, not a nested loop") {
    import spark.implicits._
    val rows = Seq(
      (0L, Seq(1.0, 0.0), 0), (1L, Seq(0.9, 0.1), 0),
      (2L, Seq(0.99, 0.01), 1), // closest overall, but other label
      (3L, Seq(0.0, 1.0), 0), (4L, Seq(0.1, 0.9), 1))
    val df = rows.map { case (i, v, l) => (i, v.map(_.toFloat), l) }
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.filteredKnn(df, nQueries = 1, k = 2).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    // query 0 (label 0): only 1 and 3 are eligible; 2 is excluded
    assert(got.toSeq == Seq((1L, 1), (3L, 2)), got.toSeq)
    val single = df.withColumn("label", org.apache.spark.sql.functions.lit(7))
    val a = Similarity.filteredKnn(single, nQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Similarity.bruteForceKnn(single, nQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    val plan = Similarity.filteredKnn(df).queryExecution.executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("incrementalSemanticDedup flags a subset of the brute-force " +
       "cross truth with consistent censuses") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val index = Similarity.lshBuckets(
        corpus.select(col("vec_id").as("vid"),
          col("embedding").cast("array<double>").as("v")),
        planes = 4, tables = 8, dim = 64)
      .select("vid", "table", "bucket")
    val out = Similarity.incrementalSemanticDedup(batch, corpus, index,
        planes = 4, tables = 8, threshold = 0.4, dim = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.nonEmpty, "the planted cross near-dups must be caught")
    // brute-force truth: every cross pair's exact cosine
    val nv = batch.select(col("vec_id").as("new_id"),
      col("embedding").cast("array<double>").as("va"))
    val cv = corpus.select(col("vec_id").as("corpus_id"),
      col("embedding").cast("array<double>").as("vb"))
    val truth = nv.crossJoin(cv)
      .select(col("new_id"),
        Similarity.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.4)
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n"), max(col("cos")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // candidates come from a lossy LSH index, the verify is exact:
    // everything flagged is true, censuses never exceed the truth
    out.foreach { case (id, (n, mx)) =>
      val (tn, tmx) = truth(id) // flagged id MUST exist in truth
      assert(n <= tn && mx <= tmx, s"$id: ($n,$mx) vs ($tn,$tmx)")
    }

    // the stored-index story made literal: the bucket index survives a
    // parquet round-trip and drives the identical census
    val dir = java.nio.file.Files
      .createTempDirectory("bucket_index_").toString
    index.write.mode("overwrite").parquet(dir)
    val out2 = Similarity.incrementalSemanticDedup(batch, corpus,
        spark.read.parquet(dir),
        planes = 4, tables = 8, threshold = 0.4, dim = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out2 == out)
  }

  test("IVF train/index/search split: centroids and the (vid, list) " +
       "relation round-trip parquet and reproduce the monolithic top-k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val direct = Similarity.ivfKnn(emb, nlist = 16, nprobe = 4, k = 10,
        nQueries = 20)
      .select("query_id", "neighbor_id", "rank", "score")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(direct.nonEmpty)
    // persist BOTH artifacts the way a vector store would
    val cents = Similarity.ivfCentroids(emb, nlist = 16)
    val cdir = java.nio.file.Files
      .createTempDirectory("ivf_centroids_").toString
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "c").write.mode("overwrite").parquet(cdir)
    val idir = java.nio.file.Files
      .createTempDirectory("ivf_index_").toString
    Similarity.ivfIndexRelation(emb, cents)
      .write.mode("overwrite").parquet(idir)
    // cold reload -> identical search results
    val cents2 = spark.read.parquet(cdir).orderBy(col("list"))
      .collect().map(_.getSeq[Double](1).toArray)
    val viaIndex = Similarity.ivfSearchWithIndex(emb, cents2,
        spark.read.parquet(idir), nprobe = 4, k = 10, nQueries = 20)
      .select("query_id", "neighbor_id", "rank", "score")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(viaIndex == direct)
  }
}
