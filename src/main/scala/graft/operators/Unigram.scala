package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** UNIGRAM-LM (SentencePiece-style) tokenizer TRAINING — the other half
  * of production tokenization beside [[Bpe]] (Kudo 2018, arXiv
  * 1804.10959): a vocabulary of scored pieces, segmentation as the
  * LOWEST-COST path through the piece lattice (Viterbi), training as
  * EM — segment under current scores, re-estimate scores from usage,
  * prune to the target size. Where BPE composes a word bottom-up
  * through a frozen merge order, unigram picks the globally cheapest
  * decomposition — the algorithm the q142 fertility monitor's
  * "retrain differently" signal calls for.
  *
  * INTEGER-EXACT by construction (the q80/q110 replay discipline, so
  * the whole train→encode chain sits under the DuckDB oracle gate):
  * piece scores are fixed-point NEGATIVE LOG-PROBABILITY COSTS,
  * `cost(p) = ilog2(T) − ilog2(count(p))` in 1/65536-bit units, where
  * [[ilog2]] is a 16-round square-and-shift binary logarithm over
  * BIGINT arithmetic — bitwise-identical in Scala and in the oracle's
  * unrolled SQL (UnigramQ replays every round). No float ln/log
  * anywhere; ties in the lattice break deterministically (smallest
  * start index = longest final piece).
  *
  * EM here is HARD (Viterbi) EM: the E-step assigns each word its
  * single cheapest segmentation, the M-step re-estimates counts from
  * those assignments (frequency-weighted), multi-symbol pieces that
  * fell out of use drop, single-symbol pieces are floored at count 1
  * (coverage — every word stays segmentable forever). Hard EM is the
  * integer-replayable member of the EM family: soft EM's
  * forward-backward marginals are sums of PRODUCTS of probabilities,
  * irreducibly float; Viterbi is min-plus, exactly representable in
  * scaled-integer costs. UnigramSpec pins the two monotonicity lemmas
  * hard EM actually guarantees (E-step: the new segmentation is no
  * costlier than the old one under the same costs, integer-exact;
  * M-step: a segmentation is at least as likely under its own
  * empirical counts as under the previous ones, checked in exact
  * BigInt rational arithmetic) plus end-to-end exact-likelihood
  * non-decrease on planted corpora.
  *
  * Scale decomposition is [[Bpe.train]]'s: the corpus pass is one
  * distributed tokenize + aggregation to the BOUNDED word-frequency
  * table (`minFreq` floor, `maxVocab` cap — at most that many rows
  * ever reach the driver), seeding/EM/pruning run on the driver over
  * that table (tokenizer-trainer economics: the table is vocab-sized,
  * not corpus-sized), and ENCODING never touches the driver — the
  * piece table broadcasts (O(|vocab|), a driver artifact by
  * construction), each scan task segments through a per-partition memo
  * keyed by distinct word, and only the output rows shuffle. The
  * corpus text crosses no exchange.
  *
  * Word model shared with [[Bpe]]: pre-tokenization via the same
  * [[Bpe.PreTok]] policies (whitespace default, CpClass opt-in —
  * recorded in the saved artifact, unknown policies fail loud at
  * load), words segment over initial symbols = code points + the
  * terminal `</w>` marker, pieces are CONCATENATIONS of consecutive
  * symbols (so suffix pieces like `ing</w>` are first-class, and
  * [[Bpe.decodeTokens]] decodes unigram streams verbatim — the marker
  * resolution and `<0xNN>` byte-run reassembly are piece-level
  * contracts, not BPE ones). The string-keyed vocabulary inherits
  * [[Bpe.vocabOf]]'s documented collision caveat: a span SPELLED like
  * the marker (or a byte symbol) aliases that piece.
  */
object Unigram {

  /** Fixed-point fraction bits of [[ilog2]] (Q16: 1 bit = 1/65536). */
  val LogFracBits: Int = 16

  /** Lattice sentinel: no piece covers this span. Any real path costs
    * strictly less (a word of 2^20 symbols at the ~2^22 max per-piece
    * cost stays under 2^42). */
  val Inf: Long = 1L << 60

  /** Cost of an out-of-vocabulary SINGLE SYMBOL during [[encode]] under
    * a frozen vocabulary (an unseen code point): far above any trained
    * piece cost, far below [[Inf]], so the lattice stays total — the
    * unknown symbol becomes its own piece and resolves by the encode
    * policy (byte fallback / unkId / failOnUnk), never by a crash in
    * the DP. */
  val UnkSymCost: Long = 1L << 40

  /** floor(log2(x) · 2^16) in pure 64-bit integer arithmetic: take the
    * MSB, normalize the mantissa to Q30 ∈ [2^30, 2^31), then 16 rounds
    * of square-and-shift emit one fraction bit each. Every operation is
    * BIGINT-expressible (the oracle unrolls the same 16 rounds —
    * UnigramQ), and the intermediate never overflows (m < 2^31 before
    * each squaring ⇒ m² < 2^62). */
  def ilog2(x: Long): Long = {
    require(x >= 1L, s"ilog2 of $x")
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (msb >= 30) x >>> (msb - 30) else x << (30 - msb)
    var r = msb.toLong
    var i = 0
    while (i < 16) {
      m = (m * m) >> 30
      if (m >= (1L << 31)) { m >>= 1; r = r * 2 + 1 }
      else r = r * 2
      i += 1
    }
    r
  }

  /** Prune policy. [[PruneBy.Count]] (default, and what every oracle
    * row replays): keep the `vocabTarget` multis with the highest
    * usage counts — cheap, SQL-replayable, and what frequency-ranked
    * trainers ship. [[PruneBy.Loss]] (the SentencePiece discipline,
    * Kudo 2018 §3.2): keep the multis whose REMOVAL costs the corpus
    * most — each candidate's loss is the exact integer cost increase
    * when its words re-segment without it — which protects
    * low-frequency pieces with no cheap decomposition (rare-script
    * runs) over high-frequency pieces whose halves are nearly free.
    * Loss pruning is NOT oracle-replayed at corpus scale (it would
    * square the DP machinery per candidate inside the SQL chain);
    * UnigramSpec pins its semantics against a brute-force reference,
    * and q156 replays the full loss fold in SQL at the one
    * proportionate scale — a planted corpus where count- and
    * loss-ranking disagree. */
  sealed trait PruneBy extends Serializable
  object PruneBy {
    case object Count extends PruneBy
    case object Loss extends PruneBy
  }

  /** Training knobs — every one replayed verbatim by the oracle chain.
    * `maxPieceSyms` bounds a piece's SYMBOL span (the lattice fan-in);
    * `seedSize` bounds the multi-symbol seed candidates (top by count,
    * [[Bpe.cpOrder]] tie-break) and `vocabTarget` the multi-symbol
    * pieces surviving the prune — single symbols ride along always
    * (coverage). */
  final case class Knobs(maxPieceSyms: Int = 6, minSeedCount: Long = 2L,
                         seedSize: Int = 1 << 20, emRounds: Int = 2,
                         vocabTarget: Int = 1 << 15, postEmRounds: Int = 1,
                         pruneBy: PruneBy = PruneBy.Count) {
    require(maxPieceSyms >= 1 && seedSize >= 0 && emRounds >= 0 &&
      vocabTarget >= 0 && postEmRounds >= 0, s"bad knobs: $this")
  }

  /** A trained model: `pieces` in [[Bpe.cpOrder]] (ids are positions —
    * the oracle's `row_number() OVER (ORDER BY piece) − 1`), `counts`
    * and `costs` aligned, the pre-tokenization policy it was trained
    * under. */
  final case class Model(pieces: IndexedSeq[String],
                         counts: IndexedSeq[Long],
                         costs: IndexedSeq[Long],
                         preTok: Bpe.PreTok) {
    require(pieces.length == counts.length && pieces.length == costs.length,
      "misaligned model columns")
    /** piece → cost, the lattice's score function. */
    lazy val costOf: Map[String, Long] = pieces.zip(costs).toMap
    /** The id space [[encode]] emits against: the pieces, plus the 256
      * byte pieces when `byteFallback` (the [[Bpe.vocabOf]] fold), in
      * [[Bpe.cpOrder]]. */
    def vocab(byteFallback: Boolean = false): IndexedSeq[String] = {
      val all = if (byteFallback) (pieces ++ Bpe.ByteSymbols).distinct
                else pieces
      all.sorted(Bpe.cpOrder).toIndexedSeq
    }
  }

  /** Fail loud — naming the empty-corpus cause — where an empty model
    * would otherwise surface as a cryptic iterator `.max` throw deep in
    * the lattice setup. */
  private def requireModel(model: Model, op: String): Unit =
    require(model.pieces.nonEmpty,
      s"unigram $op needs a non-empty model — it was trained on an " +
        "empty corpus (or loaded from an empty artifact)")

  /** Effective counts → costs: `T = Σ ce`, `cost = ilog2(T) − ilog2(ce)`. */
  private def costsOf(eff: mutable.LinkedHashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    val t = eff.valuesIterator.sum
    val lt = ilog2(t)
    val out = mutable.HashMap.empty[String, Long]
    eff.foreach { case (p, c) => out(p) = lt - ilog2(c) }
    out
  }

  /** Cheapest segmentation of one symbol sequence under `cost` —
    * min-plus DP over spans of ≤ `maxLen` symbols, ties to the
    * SMALLEST start index (the longest final piece; the oracle's
    * `list_position` of `list_min` picks the same). `unkSingles`
    * (encode-time) prices unknown single symbols at [[UnkSymCost]] so
    * the lattice stays total; training never needs it (every single
    * symbol is in the vocabulary by the coverage floor). */
  private[graft] def viterbi(syms: IndexedSeq[String],
                             cost: String => Option[Long], maxLen: Int,
                             unkSingles: Boolean = false): Vector[String] = {
    val n = syms.length
    val best = Array.fill(n + 1)(Inf)
    val bp = Array.fill(n + 1)(0)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      var bb = Inf
      var bi = -1
      while (i < j) {
        if (best(i) < Inf) {
          val piece = syms.slice(i, j).mkString
          val c = cost(piece) match {
            case Some(v) => v
            case None =>
              if (unkSingles && j - i == 1) UnkSymCost else Inf
          }
          if (c < Inf) {
            val cand = best(i) + c
            if (cand < bb) { bb = cand; bi = i }
          }
        }
        i += 1
      }
      best(j) = bb
      bp(j) = bi
      j += 1
    }
    require(best(n) < Inf,
      s"unsegmentable symbol sequence ${syms.mkString("[", ",", "]")} — " +
        "coverage floor violated (corrupt model?)")
    val out = mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      val i = bp(k)
      out += syms.slice(i, k).mkString
      k = i
    }
    out.reverseIterator.toVector
  }

  /** Total order on (cost, piece path): cost ascending, then the piece
    * list element-wise by [[Bpe.cpCompare]] with a shorter prefix
    * first — EXACTLY DuckDB's natural sort on `STRUCT(c, ps)` (BIGINT
    * asc, then list-of-VARCHAR comparison under binary collation), so
    * the oracle's `list_sort` replays the ranking bit for bit. */
  private[graft] def pathLt(a: (Long, Vector[String]),
                            b: (Long, Vector[String])): Boolean =
    if (a._1 != b._1) a._1 < b._1
    else {
      val (pa, pb) = (a._2, b._2)
      var i = 0
      while (i < pa.length && i < pb.length) {
        val c = Bpe.cpCompare(pa(i), pb(i))
        if (c != 0) return c < 0
        i += 1
      }
      pa.length < pb.length
    }

  /** The K CHEAPEST segmentations of one symbol sequence, in
    * [[pathLt]] order — exact k-best min-plus DP (per-position top-k
    * truncation is exact: costs are non-negative and appending a
    * suffix never changes which of two prefixes is lexicographically
    * first, so a global top-k path's every prefix ranks top-k at its
    * position). The lattice for `encode`'s unk regime prices unknown
    * single symbols at [[UnkSymCost]] when `unkSingles`. */
  private[graft] def kbestViterbi(syms: IndexedSeq[String],
                                  cost: String => Option[Long],
                                  maxLen: Int, k: Int,
                                  unkSingles: Boolean = false)
      : Vector[(Long, Vector[String])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = syms.length
    val hist = new Array[Vector[(Long, Vector[String])]](n + 1)
    hist(0) = Vector((0L, Vector.empty))
    var j = 1
    while (j <= n) {
      val cands = mutable.ArrayBuffer.empty[(Long, Vector[String])]
      var i = math.max(0, j - maxLen)
      while (i < j) {
        val piece = syms.slice(i, j).mkString
        val c = cost(piece) match {
          case Some(v) => v
          case None => if (unkSingles && j - i == 1) UnkSymCost else Inf
        }
        if (c < Inf) hist(i).foreach { case (pc, ps) =>
          cands += ((pc + c, ps :+ piece))
        }
        i += 1
      }
      hist(j) = cands.sortWith(pathLt).take(k).toVector
      j += 1
    }
    require(hist(n).nonEmpty,
      s"unsegmentable symbol sequence ${syms.mkString("[", ",", "]")}")
    hist(n)
  }

  /** SUBWORD REGULARIZATION (Kudo 2018 §3) — the training-data op that
    * exposes a model to segmentation variants instead of one frozen
    * argmax — as a DETERMINISTIC, oracle-replayable variant: each word
    * OCCURRENCE picks among its [[kbestViterbi]] paths by a
    * hash-geometric draw. `draw = polyhash(salt:id:tp) mod (2^m − 1)`
    * (m = paths found, tp = the occurrence's 1-based pre-tok position),
    * `pick = m − bitlength(draw + 1)` — the argmax gets ~1/2 the mass,
    * rank r gets ~2^−(r+1) (the α-style bias toward the best path),
    * and everything is pure integer arithmetic on both engines. Same
    * salt + corpus ⇒ the same stream bit for bit (replayable shards);
    * a NEW salt per epoch gives fresh diversity — exactly the
    * epoch-shuffle discipline, applied to segmentation.
    *
    * Output contract, unk policy and scale shape are [[encode]]'s
    * (broadcast model, per-partition word memo over the k-best lists,
    * text crosses no exchange); the id participates in the draw via
    * its STRING form (the oracle's `CAST(id AS VARCHAR)`). */
  def encodeSampled(docs: DataFrame, idCol: String, textCol: String,
                    model: Model, k: Int = 4, salt: String = "e1",
                    unkId: Long = -1L, byteFallback: Boolean = false,
                    failOnUnk: Boolean = false,
                    emitPieces: Boolean = true): DataFrame = {
    require(k >= 1 && k <= 62,
      s"k must be in [1, 62] (the draw is a 2^m − 1 modulus), got $k")
    requireModel(model, "encodeSampled")
    val spark = docs.sparkSession
    val vocabSeq = model.vocab(byteFallback)
    if (byteFallback) {
      val vs = vocabSeq.toSet
      require(Bpe.ByteSymbols.forall(vs.contains),
        "byteFallback requires the 256 byte pieces in the vocabulary")
    }
    val costB = spark.sparkContext.broadcast(model.costOf)
    val idsB = spark.sparkContext.broadcast(Bpe.vocabIds(vocabSeq))
    val maxLen = math.max(1, model.pieces.iterator.map(symLen).max)
    val preTok = model.preTok
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField) ++
      (if (emitPieces)
        Seq(StructField("pieces", ArrayType(StringType, containsNull = false)))
      else Nil) ++ Seq(
      StructField("token_ids", ArrayType(LongType, containsNull = false)),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_unk", LongType, nullable = false)))
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val cost = costB.value
        val ids = idsB.value
        // per-distinct-word memo of the k-best segmentations plus their
        // LAZILY-filled encoded forms: the draw stays per (doc,
        // position) — it picks WHICH form to append — and a form is
        // encoded on its FIRST draw only (so a failOnUnk throw still
        // fires exactly when a drawn segmentation carries the unk, the
        // legacy per-occurrence behavior), after which the per-piece
        // vocabulary lookups are amortized away (see Bpe.encode)
        val memo = new java.util.HashMap[String,
          (Array[Seq[String]], Array[Bpe.EncodedWord])](1 << 12)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val idStr = String.valueOf(r.get(0))
            val toks = preTok.jvmSplit(r.getString(1))
            val pieces =
              if (emitPieces) mutable.ArrayBuffer.empty[String] else null
            val tids = mutable.ArrayBuffer.empty[Long]
            var nUnk = 0L
            var tp = 1
            while (tp <= toks.length) {
              val w = toks(tp - 1)
              var kb = memo.get(w)
              if (kb == null) {
                val segs: Array[Seq[String]] =
                  kbestViterbi(Bpe.initial(w), cost.get, maxLen, k,
                    unkSingles = true).map(_._2: Seq[String]).toArray
                kb = (segs, new Array[Bpe.EncodedWord](segs.length))
                if (memo.size < Bpe.MemoCap) memo.put(w, kb)
              }
              val m = kb._1.length
              val draw = graft.functions.PolyHash
                .hash(s"$salt:$idStr:$tp") % ((1L << m) - 1L)
              val pick = m - (64 - java.lang.Long
                .numberOfLeadingZeros(draw + 1L))
              var e = kb._2(pick)
              if (e == null) {
                e = Bpe.encodeSegmented(kb._1(pick), ids, unkId,
                  byteFallback, failOnUnk, emitPieces,
                  "unigram encodeSampled")
                kb._2(pick) = e
              }
              tids ++= e.tids
              if (emitPieces) pieces ++= e.pieces
              nUnk += e.nUnk
              tp += 1
            }
            Some(
              if (emitPieces)
                Row(r.get(0), pieces.toSeq, tids.toSeq,
                  tids.length.toLong, nUnk)
              else Row(r.get(0), tids.toSeq, tids.length.toLong, nUnk))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** SEED candidates from the word-frequency table: every symbol span
    * of ≤ `maxPieceSyms` symbols, counted per occurrence (overlapping
    * spans count; frequency-weighted), grouped by CONCATENATED STRING.
    * Single-symbol pieces (the alphabet) are always kept with their
    * span counts; multi-symbol candidates keep the top `seedSize` by
    * (count DESC, [[Bpe.cpOrder]] ASC) above `minSeedCount`. Returns
    * (effective counts in insertion order: alphabet first in cp order,
    * then kept multis in pick order; the alphabet set). */
  private[graft] def seedFromVocab(vocab: Seq[(String, Long)], knobs: Knobs)
      : (mutable.LinkedHashMap[String, Long], Set[String]) = {
    val spans = mutable.HashMap.empty[String, Long]
    val alpha = mutable.HashSet.empty[String]
    vocab.foreach { case (w, f) =>
      val syms = Bpe.initial(w)
      val n = syms.length
      syms.foreach(alpha += _)
      var i = 0
      while (i < n) {
        var l = 1
        val sb = new java.lang.StringBuilder
        while (l <= knobs.maxPieceSyms && i + l <= n) {
          sb.append(syms(i + l - 1))
          val p = sb.toString
          spans(p) = spans.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val multis = spans.iterator
      .filter { case (p, c) => !alpha.contains(p) && c >= knobs.minSeedCount }
      .toArray
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else Bpe.cpCompare(pa, pb) < 0
      }
    val eff = mutable.LinkedHashMap.empty[String, Long]
    alpha.toSeq.sorted(Bpe.cpOrder).foreach(s => eff(s) = spans(s))
    multis.take(knobs.seedSize).foreach { case (p, c) => eff(p) = c }
    (eff, alpha.toSet)
  }

  /** One hard-EM round: costs from current counts, Viterbi-segment
    * every vocabulary word, counts from usage (frequency-weighted),
    * drop dead multis, floor singles at 1. */
  private[graft] def emRound(vocab: Seq[(String, Long)],
                             eff: mutable.LinkedHashMap[String, Long],
                             alpha: Set[String], knobs: Knobs)
      : mutable.LinkedHashMap[String, Long] = {
    val cost = costsOf(eff)
    val cnt = mutable.HashMap.empty[String, Long]
    vocab.foreach { case (w, f) =>
      viterbi(Bpe.initial(w), cost.get, knobs.maxPieceSyms).foreach { p =>
        cnt(p) = cnt.getOrElse(p, 0L) + f
      }
    }
    val out = mutable.LinkedHashMap.empty[String, Long]
    alpha.toSeq.sorted(Bpe.cpOrder)
      .foreach(s => out(s) = math.max(cnt.getOrElse(s, 0L), 1L))
    cnt.iterator.filter { case (p, _) => !alpha.contains(p) }
      .toArray.sortWith { case ((a, _), (b, _)) => Bpe.cpCompare(a, b) < 0 }
      .foreach { case (p, c) => out(p) = c }
    out
  }

  /** PRUNE to `vocabTarget` multi-symbol pieces by (count DESC, cp
    * ASC); singles always survive (coverage). */
  private[graft] def pruneEff(eff: mutable.LinkedHashMap[String, Long],
                              alpha: Set[String], knobs: Knobs)
      : mutable.LinkedHashMap[String, Long] = {
    val out = mutable.LinkedHashMap.empty[String, Long]
    eff.foreach { case (p, c) => if (alpha.contains(p)) out(p) = c }
    eff.iterator.filter { case (p, _) => !alpha.contains(p) }
      .toArray
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else Bpe.cpCompare(pa, pb) < 0
      }
      .take(knobs.vocabTarget)
      .foreach { case (p, c) => out(p) = c }
    out
  }

  /** [[PruneBy.Loss]]: each multi-symbol piece's EXACT integer corpus
    * loss — Σ over words whose Viterbi path uses it of freq × (cost of
    * the cheapest segmentation WITHOUT the piece − current cost),
    * under the current cost table — then keep the `vocabTarget` multis
    * with the LARGEST loss (count DESC then [[Bpe.cpOrder]] on ties).
    * Always well-defined: singles survive every prune, so the
    * alternative path exists. Driver cost: one extra Viterbi per
    * (word, distinct multi piece in its path) — bounded by the vocab
    * table, the trainer economics. */
  /** The exact integer removal-loss table [[pruneEffByLoss]] ranks by:
    * for every multi-symbol piece appearing in some word's Viterbi
    * path, Σ over those words of freq × (cost of the cheapest
    * segmentation WITHOUT the piece − current cost), under `eff`'s
    * cost table. Exposed so the q156 oracle row can hash the loss
    * computation itself, not only the prune it induces. */
  private[graft] def removalLosses(vocab: Seq[(String, Long)],
                                   eff: mutable.LinkedHashMap[String, Long],
                                   alpha: Set[String], knobs: Knobs)
      : Map[String, Long] = {
    val cost = costsOf(eff)
    val loss = mutable.HashMap.empty[String, Long]
    vocab.foreach { case (w, f) =>
      val syms = Bpe.initial(w)
      val seg = viterbi(syms, cost.get, knobs.maxPieceSyms)
      val base = seg.map(cost).sum
      seg.distinct.filterNot(alpha.contains).foreach { p =>
        val alt = viterbi(syms,
          q => if (q == p) None else cost.get(q), knobs.maxPieceSyms)
          .map(cost).sum
        loss(p) = loss.getOrElse(p, 0L) + f * (alt - base)
      }
    }
    loss.toMap
  }

  private[graft] def pruneEffByLoss(vocab: Seq[(String, Long)],
                                    eff: mutable.LinkedHashMap[String, Long],
                                    alpha: Set[String], knobs: Knobs)
      : mutable.LinkedHashMap[String, Long] = {
    val loss = removalLosses(vocab, eff, alpha, knobs)
    val out = mutable.LinkedHashMap.empty[String, Long]
    eff.foreach { case (p, c) => if (alpha.contains(p)) out(p) = c }
    eff.iterator.filter { case (p, _) => !alpha.contains(p) }
      .toArray
      .sortWith { case ((pa, ca), (pb, cb)) =>
        val la = loss.getOrElse(pa, 0L)
        val lb = loss.getOrElse(pb, 0L)
        if (la != lb) la > lb
        else if (ca != cb) ca > cb
        else Bpe.cpCompare(pa, pb) < 0
      }
      .take(knobs.vocabTarget)
      .foreach { case (p, c) => out(p) = c }
    out
  }

  /** The full training loop over a collected word-frequency table,
    * pure and spec-testable: seed → `emRounds` hard-EM rounds → prune
    * (by count or by loss, [[PruneBy]]) → `postEmRounds` more → final
    * costs. */
  def trainFromVocab(vocab: Seq[(String, Long)], knobs: Knobs = Knobs(),
                     preTok: Bpe.PreTok = Bpe.PreTok.Whitespace): Model = {
    require(vocab.nonEmpty,
      "unigram training needs a non-empty word-frequency table — the " +
        "corpus is empty (or all-NULL text / below minFreq)")
    var (eff, alpha) = seedFromVocab(vocab, knobs)
    (1 to knobs.emRounds).foreach(_ => eff = emRound(vocab, eff, alpha, knobs))
    eff = knobs.pruneBy match {
      case PruneBy.Count => pruneEff(eff, alpha, knobs)
      case PruneBy.Loss => pruneEffByLoss(vocab, eff, alpha, knobs)
    }
    (1 to knobs.postEmRounds)
      .foreach(_ => eff = emRound(vocab, eff, alpha, knobs))
    val cost = costsOf(eff)
    val pieces = eff.keysIterator.toIndexedSeq.sorted(Bpe.cpOrder)
    Model(pieces, pieces.map(eff), pieces.map(cost), preTok)
  }

  /** WARM-START retraining over a collected word-frequency table — the
    * increment matching BPE's incremental trainer, for the signal
    * [[graft.streaming.StreamFertility]] fires batch by batch: instead
    * of re-seeding every ≤L-symbol span of the corpus (the dominant
    * cold-start cost: the span enumeration PLUS `emRounds` hard-EM
    * rounds over a seed set up to `seedSize` ≈ 2^20 pieces), seed EM
    * from the PREVIOUS model's piece inventory and counts, run
    * `warmRounds` hard-EM rounds against the UPDATED table, prune, and
    * re-derive costs.
    *
    * Contract (the honest scope of a warm start): the piece inventory
    * can only SHRINK or re-weight — counts and costs re-estimate on the
    * new corpus, multis that fell out of use drop, and every NEW single
    * symbol the drifted corpus introduces joins the alphabet floored at
    * count 1 (coverage: encoding stays total) — but no new MULTI piece
    * is ever learned (that requires a span enumeration —
    * [[warmPlusFromVocab]] bounds it to the drifted words; a cold
    * retrain runs it over everything). Use it for drift in
    * FREQUENCIES; for a drifted slice whose new content needs new
    * composed pieces use warm+; when the fertility monitor shows a
    * language slice pinned at the byte-fallback ceiling (content the
    * inventory cannot compose), that is the cold-retrain signal.
    *
    * Exactness: on an UNCHANGED corpus whose trained model is a hard-EM
    * fixed point (`emRound` maps its counts to themselves — the state
    * cold training converges to), the warm start returns the cold model
    * BIT FOR BIT for any `warmRounds ≥ 0` (spec-pinned): the seed
    * reconstructs the fixed point, every round maps it to itself, the
    * prune is a no-op at `vocabTarget`, and the cost chain is the same
    * [[ilog2]] arithmetic.
    *
    * Measured (UnigramSpec's timing fixture — 4,056-word planted vocab,
    * seedSize 2^14, emRounds 2, postEmRounds 1): cold 104 ms, warm
    * 24 ms ≈ 4.4× at `warmRounds = 1` (the BPE-incremental 97× was at
    * 1000 merges; unigram's per-round Viterbi over the vocab table is
    * inventory-size-insensitive, so the warm-start ceiling is the
    * seeding pass + the rounds saved — here 4 driver passes down to 1
    * — not 97×). */
  def warmStartFromVocab(vocab: Seq[(String, Long)], prev: Model,
                         knobs: Knobs = Knobs(),
                         warmRounds: Int = 1): Model =
    warmCore(vocab, prev, knobs, warmRounds, extraMultis = Nil)

  /** The shared warm-retrain core: seed EM from the previous model's
    * inventory (+ optionally `extraMultis` — [[warmPlusFromVocab]]'s
    * drift-restricted candidates, appended to the seed with their span
    * counts when not already present), run `warmRounds` hard-EM rounds
    * against the updated table, prune, re-derive costs. With an empty
    * `extraMultis` this IS the plain warm start bit for bit. */
  private def warmCore(vocab: Seq[(String, Long)], prev: Model,
                       knobs: Knobs, warmRounds: Int,
                       extraMultis: Seq[(String, Long)]): Model = {
    require(vocab.nonEmpty,
      "unigram warm start needs a non-empty word-frequency table — the " +
        "corpus is empty (or all-NULL text / below minFreq)")
    requireModel(prev, "warmStartFromVocab")
    require(warmRounds >= 0, s"warmRounds must be >= 0, got $warmRounds")
    val maxPrev = prev.pieces.iterator.map(symLen).max
    require(knobs.maxPieceSyms >= maxPrev,
      s"knobs.maxPieceSyms = ${knobs.maxPieceSyms} is below the previous " +
        s"model's longest piece ($maxPrev symbols) — the lattice could " +
        "never use it; pass the training knobs the model was built with")
    // alphabet = the NEW corpus's single symbols ∪ the previous model's
    // (prev singles stay — coverage for recurring content the new table
    // happens to miss this batch; they floor at 1 like any unused single)
    val alphaSet = mutable.HashSet.empty[String]
    vocab.foreach { case (w, _) => Bpe.initial(w).foreach(alphaSet += _) }
    prev.pieces.foreach(p => if (symLen(p) == 1) alphaSet += p)
    val alpha = alphaSet.toSet
    val prevCount = prev.pieces.zip(prev.counts).toMap
    val eff0 = mutable.LinkedHashMap.empty[String, Long]
    alpha.toSeq.sorted(Bpe.cpOrder).foreach(s =>
      eff0(s) = math.max(prevCount.getOrElse(s, 0L), 1L))
    prev.pieces.filterNot(alpha.contains).sorted(Bpe.cpOrder)
      .foreach(p => eff0(p) = prevCount(p))
    extraMultis.foreach { case (p, c) =>
      if (!eff0.contains(p)) eff0(p) = c }
    var eff: mutable.LinkedHashMap[String, Long] = eff0
    (1 to warmRounds).foreach(_ => eff = emRound(vocab, eff, alpha, knobs))
    eff = knobs.pruneBy match {
      case PruneBy.Count => pruneEff(eff, alpha, knobs)
      case PruneBy.Loss => pruneEffByLoss(vocab, eff, alpha, knobs)
    }
    val cost = costsOf(eff)
    val pieces = eff.keysIterator.toIndexedSeq.sorted(Bpe.cpOrder)
    Model(pieces, pieces.map(eff), pieces.map(cost), prev.preTok)
  }

  /** WARM+ retraining — the bounded middle tier between
    * [[warmStartFromVocab]] (no new multi pieces ever) and a cold
    * retrain (full span enumeration over the whole table): enumerate
    * candidate spans ONLY over the DRIFTED words — words carrying at
    * least one single symbol absent from the previous model's piece
    * inventory, exactly the rows behind the fertility monitor's
    * `n_unk > 0` warm signal — merge the new candidate multis into the
    * warm seed with their drifted-slice span counts, then the standard
    * warm rounds / prune / cost chain.
    *
    * Covers the common drift case (a new domain or language arrives:
    * its new content needs new COMPOSED pieces, the established slices
    * don't) at a fraction of cold cost — the span enumeration touches
    * the drifted words only, and the EM rounds stay the warm count.
    * Exactness pins (spec'd): on a corpus with NO drifted words the
    * output is BIT-IDENTICAL to [[warmStartFromVocab]] (no new words ⇒
    * no new spans ⇒ the same seed); candidate selection reuses the cold
    * seeder's exact policy ([[seedFromVocab]]: count ≥ `minSeedCount`,
    * top `seedSize` by count DESC / [[Bpe.cpOrder]] ASC) restricted to
    * the drifted slice, so warm+ on an ALL-drifted table enumerates the
    * same candidate multis a cold start would (the final seed is their
    * union with the previous inventory). Pieces already in the previous
    * inventory keep their warm seed counts (the drifted slice must not
    * double-count established pieces). */
  def warmPlusFromVocab(vocab: Seq[(String, Long)], prev: Model,
                        knobs: Knobs = Knobs(),
                        warmRounds: Int = 1): Model = {
    requireModel(prev, "warmPlusFromVocab")
    val prevSingles =
      prev.pieces.iterator.filter(symLen(_) == 1).to(Set)
    val drifted = vocab.filter { case (w, _) =>
      Bpe.initial(w).exists(s => !prevSingles.contains(s)) }
    val candidates =
      if (drifted.isEmpty) Nil
      else {
        val (eff, alphaD) = seedFromVocab(drifted, knobs)
        val prevPieces = prev.pieces.toSet
        eff.iterator.filter { case (p, _) =>
          !alphaD.contains(p) && symLen(p) > 1 && !prevPieces.contains(p)
        }.toSeq
      }
    warmCore(vocab, prev, knobs, warmRounds, candidates)
  }

  /** Distributed WARM+ — [[warmStart]]'s corpus pass (one in-scan
    * tokenize + aggregation to the bounded word-frequency table under
    * the previous model's pre-tokenization policy), then
    * [[warmPlusFromVocab]] on the driver. */
  def warmPlus(docs: DataFrame, textCol: String, prev: Model,
               knobs: Knobs = Knobs(), warmRounds: Int = 1,
               minFreq: Long = 1L,
               maxVocab: Int = Bpe.DefaultMaxVocab): Model = {
    require(maxVocab > 0, "maxVocab must be > 0")
    val vocab = Bpe.wordFrequencies(docs, textCol, prev.preTok)
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    warmPlusFromVocab(vocab.toIndexedSeq, prev, knobs, warmRounds)
  }

  /** Distributed WARM-START — [[train]]'s corpus pass (one in-scan
    * tokenize + aggregation to the bounded word-frequency table, under
    * the PREVIOUS model's recorded pre-tokenization policy — no drift
    * seam), then [[warmStartFromVocab]] on the driver. */
  def warmStart(docs: DataFrame, textCol: String, prev: Model,
                knobs: Knobs = Knobs(), warmRounds: Int = 1,
                minFreq: Long = 1L,
                maxVocab: Int = Bpe.DefaultMaxVocab): Model = {
    require(maxVocab > 0, "maxVocab must be > 0")
    val vocab = Bpe.wordFrequencies(docs, textCol, prev.preTok)
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    warmStartFromVocab(vocab.toIndexedSeq, prev, knobs, warmRounds)
  }

  /** Distributed TRAIN — [[Bpe.train]]'s shape verbatim: one in-scan
    * tokenize + aggregation to the word-frequency table, `minFreq`
    * floor, at most `maxVocab` rows collected (top by frequency,
    * word-ascending tie-break), then [[trainFromVocab]] on the driver. */
  def train(docs: DataFrame, textCol: String, knobs: Knobs = Knobs(),
            minFreq: Long = 1L, maxVocab: Int = Bpe.DefaultMaxVocab,
            preTok: Bpe.PreTok = Bpe.PreTok.Whitespace): Model = {
    require(maxVocab > 0, "maxVocab must be > 0")
    val vocab = Bpe.wordFrequencies(docs, textCol, preTok)
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromVocab(vocab.toIndexedSeq, knobs, preTok)
  }

  /** Per-document unigram ENCODING — [[Bpe.encode]]'s exact output
    * contract ((idCol, pieces, token_ids, n_tokens, n_unk), one row
    * per non-NULL-text input, NULL texts absent) and unk policy
    * (byteFallback decomposition / failOnUnk / unkId with `n_unk`
    * telemetry), with Viterbi segmentation in place of merge
    * application. Unknown SINGLE SYMBOLS (code points outside the
    * training alphabet) enter the lattice at [[UnkSymCost]] — the
    * segmentation stays total and deterministic; the resulting
    * out-of-vocabulary piece then resolves by the policy.
    *
    * Scale shape: the model broadcasts, per-partition word memo capped
    * at [[Bpe.MemoCap]], output rides the scan — corpus text crosses
    * no exchange, the driver collects nothing. `emitPieces = false`
    * drops the `pieces` column and skips building its strings (the
    * opaque mapPartitions defeats Catalyst pruning — see
    * [[Bpe.encode]]); ids/counts/policies bitwise unaffected. */
  def encode(docs: DataFrame, idCol: String, textCol: String, model: Model,
             unkId: Long = -1L, byteFallback: Boolean = false,
             failOnUnk: Boolean = false,
             emitPieces: Boolean = true): DataFrame = {
    requireModel(model, "encode")
    val spark = docs.sparkSession
    val vocabSeq = model.vocab(byteFallback)
    if (byteFallback) {
      val vs = vocabSeq.toSet
      require(Bpe.ByteSymbols.forall(vs.contains),
        "byteFallback requires the 256 byte pieces in the vocabulary")
    }
    val costB = spark.sparkContext.broadcast(model.costOf)
    val idsB = spark.sparkContext.broadcast(Bpe.vocabIds(vocabSeq))
    val maxLen = {
      // the lattice fan-in only needs to reach the longest trained
      // piece; knobs are not part of the frozen model, the pieces are
      val m = model.pieces.iterator.map(symLen).max
      math.max(1, m)
    }
    val preTok = model.preTok
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField) ++
      (if (emitPieces)
        Seq(StructField("pieces", ArrayType(StringType, containsNull = false)))
      else Nil) ++ Seq(
      StructField("token_ids", ArrayType(LongType, containsNull = false)),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_unk", LongType, nullable = false)))
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val cost = costB.value
        val ids = idsB.value
        // per-distinct-word memo of the fully ENCODED form (see
        // Bpe.encode): vocabulary lookups and fallback branches run
        // once per distinct word per task, not once per occurrence
        val memo = new java.util.HashMap[String, Bpe.EncodedWord](1 << 12)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val toks = preTok.jvmSplit(r.getString(1))
            val pieces =
              if (emitPieces) mutable.ArrayBuffer.empty[String] else null
            val tids = mutable.ArrayBuffer.empty[Long]
            var nUnk = 0L
            var i = 0
            while (i < toks.length) {
              val w = toks(i)
              var e = memo.get(w)
              if (e == null) {
                e = Bpe.encodeSegmented(
                  viterbi(Bpe.initial(w), cost.get, maxLen,
                    unkSingles = true),
                  ids, unkId, byteFallback, failOnUnk, emitPieces,
                  "unigram encode")
                if (memo.size < Bpe.MemoCap) memo.put(w, e)
              }
              tids ++= e.tids
              if (emitPieces) pieces ++= e.pieces
              nUnk += e.nUnk
              i += 1
            }
            Some(
              if (emitPieces)
                Row(r.get(0), pieces.toSeq, tids.toSeq,
                  tids.length.toLong, nUnk)
              else Row(r.get(0), tids.toSeq, tids.length.toLong, nUnk))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** A piece's length in SYMBOLS (code points, with the `</w>` marker
    * counting 1 wherever it appears as a trained suffix). */
  private[graft] def symLen(piece: String): Int = {
    var n = 0
    var i = 0
    while (i < piece.length) {
      if (piece.startsWith(Bpe.EndOfWord, i)) { i += Bpe.EndOfWord.length }
      else i += Character.charCount(piece.codePointAt(i))
      n += 1
    }
    n
  }

  /** Per-document piece counts — [[Bpe.pieceCounts]]'s contract
    * ((idCol, n_words, n_pieces); NULL texts absent) under unigram
    * segmentation; same in-scan shape, driver collects nothing. */
  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  model: Model): DataFrame = {
    requireModel(model, "pieceCounts")
    val spark = docs.sparkSession
    val costB = spark.sparkContext.broadcast(model.costOf)
    val maxLen = math.max(1, model.pieces.iterator.map(symLen).max)
    val preTok = model.preTok
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      idField,
      StructField("n_words", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false)))
    val perDoc = docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { rows =>
        val cost = costB.value
        val memo = new java.util.HashMap[String, java.lang.Long](1 << 12)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val toks = preTok.jvmSplit(r.getString(1))
            var pieces = 0L
            var i = 0
            while (i < toks.length) {
              val w = toks(i)
              var p = memo.get(w)
              if (p == null) {
                p = java.lang.Long.valueOf(
                  viterbi(Bpe.initial(w), cost.get, maxLen,
                    unkSingles = true).length.toLong)
                if (memo.size < Bpe.MemoCap) memo.put(w, p)
              }
              pieces += p.longValue
              i += 1
            }
            Some(Row(r.get(0), toks.length.toLong, pieces))
          }
        }
      }(Encoders.row(outSchema))
    perDoc.groupBy(col(idCol))
      .agg(sum("n_words").as("n_words"), sum("n_pieces").as("n_pieces"))
  }

  /** Tokenizer fertility by group — [[Bpe.fertility]]'s exact output
    * contract and integer arithmetic over unigram segmentation: the
    * A/B number that decides WHICH tokenizer family a language slice
    * should be paying (q148 publishes both sides). */
  def fertility(docs: DataFrame, idCol: String, textCol: String,
                groupCol: String, model: Model): DataFrame = {
    val pc = pieceCounts(docs, idCol, textCol, model)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(groupCol),
        length(col(textCol)).cast("long").as("_fr_chars"))
      .join(pc, Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum("_fr_chars").as("n_chars"))
      .withColumn("pieces_per_kchar",
        expr("n_pieces * 1000L div n_chars"))
      .withColumn("pieces_per_word_milli",
        expr("n_pieces * 1000L div n_words"))
  }

  /** The model's 64-bit denomination — the identity a token dataset is
    * stamped with ([[graft.store.Denomination]]): any change to a
    * piece, a count, a cost or the pre-tokenization policy changes the
    * hash, so ids encoded under one artifact can never be silently
    * read as another's. Deterministic fold, no floats. */
  def modelHash(model: Model): Long =
    graft.store.Denomination.hash64(
      Iterator("unigram", Bpe.PreTok.nameOf(model.preTok)) ++
        model.pieces.iterator ++
        model.counts.iterator.map(_.toString) ++
        model.costs.iterator.map(_.toString))

  /** Persist a trained model as parquet under `dir` — `pieces` (vid,
    * piece, count, cost) in id order, `meta` (key, value: `algo` =
    * "unigram", `pretok`). The FROZEN artifact every encode job ships;
    * an artifact recording an unknown algo or policy fails loud at
    * load (the [[Bpe.PreTok.fromName]] discipline). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, dir: String,
                model: Model): Unit = {
    import spark.implicits._
    model.pieces.indices
      .map(i => (i.toLong, model.pieces(i), model.counts(i), model.costs(i)))
      .toDF("vid", "piece", "count", "cost")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/pieces")
    Seq(("algo", "unigram"), ("pretok", Bpe.PreTok.nameOf(model.preTok)))
      .toDF("key", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[saveModel]] artifact. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                dir: String): Model = {
    val meta = spark.read.parquet(s"$dir/meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val algo = meta.getOrElse("algo", "?")
    require(algo == "unigram",
      s"tokenizer artifact at $dir records algo '$algo', not 'unigram' — " +
        "refusing to segment under the wrong algorithm")
    val preTok = Bpe.PreTok.fromName(meta.getOrElse("pretok", "whitespace"))
    val rows = spark.read.parquet(s"$dir/pieces")
      .orderBy("vid").collect()
    Model(rows.map(_.getString(1)).toIndexedSeq,
      rows.map(_.getLong(2)).toIndexedSeq,
      rows.map(_.getLong(3)).toIndexedSeq, preTok)
  }
}
