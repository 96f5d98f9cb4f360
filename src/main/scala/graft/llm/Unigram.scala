package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-LM tokenizer (Kudo 2018) — the OTHER production tokenizer
  * family next to BPE (SentencePiece's default): instead of a learned
  * merge sequence, a piece VOCABULARY with log-probabilities, trained by
  * EM, applied by per-word Viterbi segmentation. Reference implementations
  * tokenize to maximize Σ log P(piece); sampling variants (subword
  * regularization) derive from the same lattice.
  *
  * Scale shape — identical to [[Bpe]]: the corpus word histogram is a
  * sufficient statistic for every count EM consults, so the distributed
  * work is one explode→groupBy→count aggregate; training runs driver-side
  * over the bounded (word, count) table, and the trained (piece, logprob)
  * table broadcasts back inside the encode closure for embarrassingly
  * map-side application. The corpus text is never collected.
  *
  * Determinism: EM is arithmetic over a sorted word list; Viterbi ties
  * break toward FEWER pieces, then lexicographically smaller first piece;
  * pruning ties break lexicographically. The result is a pure function of
  * the histogram under any partitioning.
  */
object Unigram {

  /** A trained model: piece -> ln P(piece), normalized over the vocab. */
  type Model = Map[String, Double]

  /** UTF-16 offsets of each CODEPOINT boundary of `w` (length = codepoint
    * count + 1, last entry = w.length). Every index in this file is a
    * codepoint index into this table — the same unit DuckDB's
    * `substr`/`length` count — so supplementary-plane characters
    * (surrogate pairs in the JVM) are one position, never split.
    */
  private[llm] def cpOffsets(w: String): Array[Int] = {
    val buf = new mutable.ArrayBuffer[Int](w.length + 1)
    var i = 0
    while (i < w.length) { buf += i; i += Character.charCount(w.codePointAt(i)) }
    buf += w.length
    buf.toArray
  }

  /** Codepoint count of `s` — the piece-length unit shared with the
    * DuckDB oracle's `length()`. */
  private[llm] def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** A FROZEN model with INTEGER-valued scores (centinats ×(−1)) — the
    * SentencePiece .model deployment shape (train once, freeze, apply),
    * pinned so [[viterbi]]'s DP is replayable by an external engine:
    * sums of whole-number doubles are exact, so every score comparison
    * and the (score, piece-count, lexicographic) tie-break replay as
    * BIGINT arithmetic verbatim. Full [a-z0-9] alphabet so every alnum
    * word is segmentable; multi-char pieces priced to beat their
    * character spell-outs so the DP is non-trivial on this corpus.
    */
  val FrozenModel: Model = {
    val alphabet = (('a' to 'z') ++ ('0' to '9'))
      .map(c => c.toString -> -700.0)
    val multi = Seq(
      "jo" -> -900.0, "in" -> -800.0, "ha" -> -900.0, "sh" -> -850.0,
      "row" -> -1000.0, "ba" -> -900.0, "tch" -> -1100.0, "sc" -> -900.0,
      "an" -> -800.0, "cust" -> -1300.0, "omer" -> -1300.0,
      "col" -> -1100.0, "umn" -> -1150.0, "fil" -> -1100.0,
      "ter" -> -950.0, "sma" -> -1100.0, "ll" -> -850.0,
      "slo" -> -1100.0, "mer" -> -950.0, "ge" -> -850.0, "or" -> -800.0,
      "der" -> -950.0, "vec" -> -1100.0, "tor" -> -950.0, "li" -> -900.0,
      "ne" -> -850.0, "da" -> -900.0, "ta" -> -850.0, "ble" -> -1000.0,
      "agg" -> -1100.0, "val" -> -1050.0, "ue" -> -850.0,
      "key" -> -1000.0, "str" -> -1050.0, "eam" -> -1050.0,
      "win" -> -1000.0, "dow" -> -1000.0, "spa" -> -1050.0,
      "rk" -> -850.0, "gr" -> -900.0, "oup" -> -1000.0, "pa" -> -900.0,
      "rt" -> -850.0)
    (alphabet ++ multi).toMap
  }

  /** Frozen-model corpus encode to (idCol, pos, piece) rows — the
    * Unigram member of the frozen-tokenizer family, completing the
    * subword triad next to [[Bpe.encodeFrozen]] (greedy merges) and
    * [[Wordpiece.encodeFrozen]] (longest match): here the walk is the
    * OPTIMAL segmentation under the piece scores (Viterbi DP). Same
    * word-type-encode-once scale shape. Words the model cannot segment
    * (any non-[a-z0-9] character) emit no pieces on both engines —
    * viterbi returns the empty path exactly when no position chain
    * reaches the end.
    */
  def encodeFrozen(docs: DataFrame, model: Model,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    TextFeatures.encodeByWordType(docs, idCol, textCol)(
      viterbi(_, model).toVector)

  /** Seed vocabulary: every substring of length ≤ `maxPieceLen`
    * CODEPOINTS of every histogram word, scored by occurrence-weighted
    * count, cut to `seedSize` (single codepoints always kept — the
    * fallback alphabet that makes every word segmentable).
    */
  def seedVocab(wordCounts: Map[String, Long], seedSize: Int,
                maxPieceLen: Int = 6): Map[String, Long] = {
    val subCount = mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      val off = cpOffsets(w)
      val n = off.length - 1
      var i = 0
      while (i < n) {
        var len = 1
        while (len <= maxPieceLen && i + len <= n) {
          subCount.updateWith(w.substring(off(i), off(i + len))) { prev =>
            Some(prev.getOrElse(0L) + c)
          }
          len += 1
        }
        i += 1
      }
    }
    val chars = subCount.filter(p => cpLen(p._1) == 1)
    val multi = subCount.filter(p => cpLen(p._1) > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.size))
    (chars ++ multi).toMap
  }

  /** Viterbi-best segmentation of `word` under the model: maximizes the
    * summed log-prob; ties prefer fewer pieces, then the lexicographically
    * smaller piece ending at each position (fixed tie policy = fixed
    * output). Returns Nil only if some character is not in the model —
    * impossible for models built by [[train]], which keeps the alphabet.
    */
  def viterbi(word: String, model: Model, maxPieceLen: Int = 6)
      : List[String] = {
    val off = cpOffsets(word)
    val n = off.length - 1 // codepoint count — DP positions are codepoints
    // best(i) = (score, pieces, lastPiece) for word[0, i) codepoints
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val nPieces = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)("")
    score(0) = 0.0
    nPieces(0) = 0
    var i = 1
    while (i <= n) {
      var len = 1
      while (len <= maxPieceLen && len <= i) {
        val piece = word.substring(off(i - len), off(i))
        model.get(piece).foreach { lp =>
          val s = score(i - len) + lp
          val k = nPieces(i - len) + 1
          val better = s > score(i) ||
            (s == score(i) && (k < nPieces(i) ||
              (k == nPieces(i) && piece < back(i))))
          if (better) { score(i) = s; nPieces(i) = k; back(i) = piece }
        }
        len += 1
      }
      i += 1
    }
    if (score(n).isNegInfinity) return Nil
    var out = List.empty[String]
    var pos = n
    while (pos > 0) { out = back(pos) :: out; pos -= cpLen(back(pos)) }
    out
  }

  /** EM training over the word histogram: `emRounds` rounds of
    * Viterbi-E-step piece counting and M-step re-normalization (hard EM —
    * the standard SentencePiece simplification at small vocab), then a
    * prune to `vocabSize` by expected count (alphabet always kept),
    * then one final re-estimation over the surviving vocab.
    */
  def train(wordCounts: Map[String, Long], vocabSize: Int,
            emRounds: Int = 3, maxPieceLen: Int = 6): Model = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val words = wordCounts.toSeq.sortBy(_._1) // fixed iteration order
    var probs: Model = {
      val seed = seedVocab(wordCounts, seedSize = vocabSize * 4, maxPieceLen)
      val total = seed.values.sum.toDouble
      seed.map { case (p, c) => p -> math.log(c / total) }
    }
    def estep(model: Model): Map[String, Double] = {
      val counts = mutable.HashMap.empty[String, Double]
      words.foreach { case (w, c) =>
        viterbi(w, model, maxPieceLen).foreach { piece =>
          counts.updateWith(piece)(prev => Some(prev.getOrElse(0.0) + c.toDouble))
        }
      }
      counts.toMap
    }
    def renorm(counts: Map[String, Double], keep: Set[String]): Model = {
      val kept = counts.filter { case (p, c) => keep(p) && c > 0 }
      // smoothing floor so alphabet pieces never vanish from the model
      val withAlpha = keep.map(p => p -> math.max(kept.getOrElse(p, 0.0), 0.5))
        .toMap
      val total = withAlpha.values.sum
      withAlpha.map { case (p, c) => p -> math.log(c / total) }
    }
    val alphabet = probs.keySet.filter(cpLen(_) == 1)
    var r = 0
    while (r < emRounds) {
      probs = renorm(estep(probs), probs.keySet)
      r += 1
    }
    // prune: keep the alphabet plus the top multi-char pieces by count
    val counts = estep(probs)
    val keepMulti = counts.filter(p => cpLen(p._1) > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - alphabet.size))
      .map(_._1)
    val keep = alphabet ++ keepMulti
    renorm(estep(probs), keep)
  }

  /** Corpus-level training: word histogram (the same whitespace normal
    * form as every text operator) → driver EM. `topWords` bounds the
    * histogram like Bpe.trainOnCorpus.
    */
  def trainOnCorpus(docs: DataFrame, textCol: String = "text",
                    vocabSize: Int = 512, topWords: Int = 4096,
                    emRounds: Int = 3): Model = {
    val hist = docs
      .select(explode(TextFeatures.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    train(hist, vocabSize, emRounds)
  }

  /** Map-side encode: per-document piece count + summed piece log-prob
    * under the broadcast model (out-of-vocab characters fall back to one
    * piece each at the model's floor probability — counted, not dropped).
    */
  def tokenCounts(docs: DataFrame, model: Model, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val floor = model.values.min
    val enc = udf { text: String =>
      val m = bc.value
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      var n = 0
      var lp = 0.0
      toks.foreach { w =>
        val pieces = viterbi(w, m)
        if (pieces.isEmpty) {
          // fallback prices one piece per CODEPOINT (the oracle's
          // length(word) unit), not per UTF-16 unit
          val wl = w.codePointCount(0, w.length)
          n += wl; lp += floor * wl
        } else { n += pieces.size; lp += pieces.map(m).sum }
      }
      (n, lp)
    }
    docs.select(col(idCol), enc(col(textCol)).as("e"))
      .select(col(idCol), col("e._1").as("n_pieces"), col("e._2").as("log_prob"))
  }
}
