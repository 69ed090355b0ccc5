package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, Unigram}

/** Unigram-LM tokenization under the ORACLE GATE — the q126/q136
  * machinery extended to the second tokenizer family: the oracle
  * replays SEEDING (every ≤L-symbol span of the word-frequency table,
  * top candidates by count), the fixed-point BINARY LOGARITHM
  * (16 square-and-shift rounds unrolled per cost table — bitwise
  * [[Unigram.ilog2]]), each HARD-EM round (a full Viterbi DP over the
  * vocabulary words as a recursive CTE, then count re-estimation with
  * the single-symbol coverage floor), the PRUNE, and the final
  * encoding pass — so the trained vocabulary, every piece cost, every
  * segmentation decision and every token id is hash-checked against
  * DuckDB, exactly as q126 does for BPE.
  *
  * The DP replay: `best[j] = min over i ∈ [j−L, j) of best[i] +
  * cost(syms[i..j))`, candidates enumerated ascending so
  * `list_position(cands, list_min(cands))` lands on the SMALLEST start
  * index — [[Unigram.viterbi]]'s strict-< tie-break verbatim. Absent
  * pieces cost a 2^60 sentinel; backtracking is a second recursive CTE
  * walking the stored argmin indices. Every fixed-point operation is
  * BIGINT (`//`, `<<`, comparisons) — no float touches the chain on
  * either engine.
  *
  * Scale: the oracle's cost is DuckDB's, not Spark's — the Spark side
  * trains on the bounded word-frequency table and encodes in-scan with
  * a broadcast piece table ([[Unigram.encode]]); nothing here changes
  * the 100 TB shape.
  */
object UnigramQ {

  import BpeQ.sqlToksCp

  private val sqlToks = """string_split_regex(trim(text), '\s+')"""

  /** The lattice sentinel, [[Unigram.Inf]]. */
  private val Inf: Long = 1L << 60

  /** Unrolled [[Unigram.ilog2]] over `fromCte(piece, c)` →
    * `{pfx}fin(piece, c, r)`: msb via the binary-string length (exact,
    * no float log), Q30 mantissa, 16 square-and-shift rounds. */
  private def ilogCtes(pfx: String, fromCte: String): String = {
    val rounds = (1 to 16).map { k =>
      s"""$pfx$k AS (SELECT piece, c,
         |  CASE WHEN m2 >= 2147483648 THEN m2 // 2 ELSE m2 END AS m,
         |  CASE WHEN m2 >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END AS r
         |  FROM (SELECT piece, c, (m * m) // 1073741824 AS m2, r
         |        FROM $pfx${k - 1}))""".stripMargin
    }.mkString(",\n")
    s"""${pfx}b AS (SELECT piece, c, length(bin(c)) - 1 AS msb FROM $fromCte),
       |${pfx}0 AS (SELECT piece, c,
       |  CASE WHEN msb >= 30 THEN c // (CAST(1 AS BIGINT) << (msb - 30))
       |       ELSE c * (CAST(1 AS BIGINT) << (30 - msb)) END AS m,
       |  CAST(msb AS BIGINT) AS r FROM ${pfx}b),
       |$rounds,
       |${pfx}fin AS (SELECT piece, c, r FROM ${pfx}16)""".stripMargin
  }

  /** From `effCte(piece, c)`: `{pfx}cm(m)`, the one-row piece → cost
    * map (`cost = ilog2(Σc) − ilog2(c)` — the total rides the chain as
    * a NULL-keyed row). MATERIALIZED: the recursive DP references it
    * every step. */
  private def costMapCtes(pfx: String, effCte: String): String =
    s"""${pfx}tin AS (SELECT CAST(NULL AS VARCHAR) AS piece,
       |    CAST(SUM(c) AS BIGINT) AS c FROM $effCte
       |  UNION ALL SELECT piece, c FROM $effCte),
       |${ilogCtes(pfx + "l", pfx + "tin")},
       |${pfx}cost AS (SELECT i.piece, t.r - i.r AS cost
       |  FROM ${pfx}lfin i,
       |       (SELECT r FROM ${pfx}lfin WHERE piece IS NULL) t
       |  WHERE i.piece IS NOT NULL),
       |${pfx}cm AS MATERIALIZED (
       |  SELECT map(list(piece ORDER BY piece),
       |             list(cost ORDER BY piece)) AS m FROM ${pfx}cost)"""
      .stripMargin

  /** Viterbi DP + backtrack over `wordsCte(word, syms)` under the
    * `{cmCte}` cost map → `{pfx}fin(word, pieces)`. */
  private def viterbiCtes(pfx: String, wordsCte: String, cmCte: String,
                          maxLen: Int): String =
    s"""${pfx}dp AS (
       |  SELECT word, syms, 0 AS j, [CAST(0 AS BIGINT)] AS best,
       |         [CAST(0 AS BIGINT)] AS bp
       |  FROM $wordsCte
       |  UNION ALL
       |  SELECT word, syms, j + 1,
       |         list_append(best, CASE WHEN mn >= $Inf THEN NULL
       |                                ELSE mn END),
       |         list_append(bp, lo + list_position(cands, mn) - 1)
       |  FROM (
       |    SELECT word, syms, j, best, bp, lo, cands,
       |           list_min(cands) AS mn
       |    FROM (
       |      SELECT word, syms, j, best, bp,
       |             greatest(0, j + 1 - $maxLen) AS lo,
       |        list_transform(range(greatest(0, j + 1 - $maxLen), j + 1),
       |          i -> COALESCE(best[CAST(i + 1 AS INTEGER)] +
       |                 map_extract($cmCte.m,
       |                   array_to_string(list_slice(syms,
       |                     CAST(i + 1 AS INTEGER),
       |                     CAST(j + 1 AS INTEGER)), ''))[1], $Inf))
       |          AS cands
       |      FROM ${pfx}dp, $cmCte WHERE j < len(syms)))),
       |${pfx}dpf AS (SELECT word, syms, bp,
       |              best[CAST(len(syms) + 1 AS INTEGER)] AS cost
       |              FROM ${pfx}dp WHERE j = len(syms)),
       |${pfx}bt AS (
       |  SELECT word, syms, bp, CAST(len(syms) AS BIGINT) AS j,
       |         CAST([] AS VARCHAR[]) AS pieces
       |  FROM ${pfx}dpf
       |  UNION ALL
       |  SELECT word, syms, bp, bp[CAST(j + 1 AS INTEGER)] AS j,
       |         list_prepend(array_to_string(list_slice(syms,
       |           CAST(bp[CAST(j + 1 AS INTEGER)] + 1 AS INTEGER),
       |           CAST(j AS INTEGER)), ''), pieces)
       |  FROM ${pfx}bt WHERE j > 0),
       |${pfx}fin AS MATERIALIZED (SELECT word, pieces FROM ${pfx}bt
       |                           WHERE j = 0)""".stripMargin

  /** COST-ONLY Viterbi DP over (word, excluded piece) pairs — the
    * removal-loss replay's alternative-path leg ([[Unigram
    * .removalLosses]]'s inner re-Viterbi): the same min-plus recurrence
    * as [[viterbiCtes]], but each row carries the piece its lattice
    * must pretend not to know (`CASE WHEN piece = excl THEN NULL`) and
    * only `best[n]` survives — a removal loss needs the alternative's
    * COST, not its path (every min path has the same total, so the
    * tie-break is irrelevant here). `pairsCte(word, excl, syms)`. */
  private def viterbiExclCtes(pfx: String, pairsCte: String,
                              cmCte: String, maxLen: Int): String = {
    val piece = s"""array_to_string(list_slice(syms,
       |                     CAST(i + 1 AS INTEGER),
       |                     CAST(j + 1 AS INTEGER)), '')""".stripMargin
    s"""${pfx}dp AS (
       |  SELECT word, excl, syms, 0 AS j, [CAST(0 AS BIGINT)] AS best
       |  FROM $pairsCte
       |  UNION ALL
       |  SELECT word, excl, syms, j + 1,
       |         list_append(best, CASE WHEN mn >= $Inf THEN NULL
       |                                ELSE mn END)
       |  FROM (
       |    SELECT word, excl, syms, j, best, list_min(cands) AS mn
       |    FROM (
       |      SELECT word, excl, syms, j, best,
       |        list_transform(range(greatest(0, j + 1 - $maxLen), j + 1),
       |          i -> COALESCE(best[CAST(i + 1 AS INTEGER)] +
       |                 CASE WHEN $piece = excl THEN NULL
       |                      ELSE map_extract($cmCte.m, $piece)[1] END,
       |                 $Inf))
       |          AS cands
       |      FROM ${pfx}dp, $cmCte WHERE j < len(syms)))),
       |${pfx}fin AS MATERIALIZED (
       |  SELECT word, excl,
       |         best[CAST(len(syms) + 1 AS INTEGER)] AS altcost
       |  FROM ${pfx}dp WHERE j = len(syms))""".stripMargin
  }

  /** Counts after a Viterbi pass, with the coverage floor →
    * `{pfx}eff(piece, c)`: frequency-weighted usage, dead multis drop
    * (absent), singles floored at 1. */
  private def emCntCtes(pfx: String, vitFin: String,
                        wfCte: String = "uwf",
                        alphaCte: String = "ualpha"): String =
    s"""${pfx}cnt AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS c
       |  FROM (SELECT f.freq, unnest(b.pieces) AS piece
       |        FROM $vitFin b JOIN $wfCte f USING (word)) GROUP BY piece),
       |${pfx}eff AS MATERIALIZED (SELECT piece, c FROM ${pfx}cnt
       |  UNION ALL
       |  SELECT a.piece, CAST(1 AS BIGINT) AS c FROM $alphaCte a
       |  LEFT JOIN ${pfx}cnt c ON c.piece = a.piece
       |  WHERE c.piece IS NULL)""".stripMargin

  /** The full replay chain (needs a `WITH RECURSIVE` prefix). Ends at:
    * `uwf(word, freq)`, `ufvfin(word, pieces)` — every distinct word of
    * `encodeFrom` segmented under the trained vocabulary — and
    * `uvoc(piece, vid)` (ids = `row_number() OVER (ORDER BY piece) − 1`,
    * DuckDB's binary collation = [[Bpe.cpOrder]]). Knobs mirror
    * [[Unigram.Knobs]] verbatim. */
  /** The seeding block: word-frequency table, symbol decomposition,
    * alphabet, span counts, kept multis, `{name}eff0`. */
  private def seedCtes(name: String, trainFrom: String, toks: String,
                       maxPieceSyms: Int, minSeedCount: Long,
                       seedSize: Int): String =
    s"""${name}wf AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toks) AS w FROM $trainFrom) GROUP BY w),
       |${name}w0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    list_append(list_transform(range(1, length(word) + 1),
       |      i -> substring(word, CAST(i AS INTEGER), 1)), '</w>') AS syms
       |  FROM ${name}wf),
       |${name}alpha AS (SELECT DISTINCT unnest(syms) AS piece
       |                 FROM ${name}w0),
       |${name}spans AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS c FROM (
       |  SELECT array_to_string(list_slice(syms, CAST(i AS INTEGER),
       |           CAST(i + l - 1 AS INTEGER)), '') AS piece, freq
       |  FROM (SELECT word, freq, syms,
       |               unnest(range(1, len(syms) + 1)) AS i FROM ${name}w0),
       |       range(1, $maxPieceSyms + 1) t(l)
       |  WHERE i + l - 1 <= len(syms)) GROUP BY piece),
       |${name}multis AS (SELECT s.piece, s.c FROM ${name}spans s
       |  LEFT JOIN ${name}alpha a ON a.piece = s.piece
       |  WHERE a.piece IS NULL AND s.c >= $minSeedCount
       |  ORDER BY s.c DESC, s.piece ASC LIMIT $seedSize),
       |${name}eff0 AS (SELECT piece, c FROM ${name}multis
       |  UNION ALL
       |  SELECT a.piece, s.c FROM ${name}alpha a
       |  JOIN ${name}spans s ON s.piece = a.piece)""".stripMargin

  private[queries] def unigramChainCtes(
      maxPieceSyms: Int, minSeedCount: Long, seedSize: Int,
      emRounds: Int, vocabTarget: Int, postEmRounds: Int,
      trainFrom: String = "documents", encodeFrom: String = "documents",
      toks: String = sqlToks, name: String = "u"): String = {
    val parts = Seq.newBuilder[String]
    parts += seedCtes(name, trainFrom, toks, maxPieceSyms, minSeedCount,
      seedSize)
    var prevEff = s"${name}eff0"
    (1 to emRounds).foreach { k =>
      val pfx = s"${name}e$k"
      parts += costMapCtes(pfx, prevEff)
      parts += viterbiCtes(pfx + "v", s"${name}w0", pfx + "cm",
        maxPieceSyms)
      parts += emCntCtes(pfx, pfx + "vfin", s"${name}wf", s"${name}alpha")
      prevEff = pfx + "eff"
    }
    parts += s"""${name}pr AS MATERIALIZED (
       |  SELECT piece, c FROM (
       |    SELECT e.piece, e.c FROM $prevEff e
       |    LEFT JOIN ${name}alpha a ON a.piece = e.piece
       |    WHERE a.piece IS NULL
       |    ORDER BY e.c DESC, e.piece ASC LIMIT $vocabTarget)
       |  UNION ALL
       |  SELECT e.piece, e.c FROM $prevEff e
       |  JOIN ${name}alpha a ON a.piece = e.piece)""".stripMargin
    prevEff = s"${name}pr"
    (1 to postEmRounds).foreach { k =>
      val pfx = s"${name}p$k"
      parts += costMapCtes(pfx, prevEff)
      parts += viterbiCtes(pfx + "v", s"${name}w0", pfx + "cm",
        maxPieceSyms)
      parts += emCntCtes(pfx, pfx + "vfin", s"${name}wf", s"${name}alpha")
      prevEff = pfx + "eff"
    }
    parts += costMapCtes(s"${name}f", prevEff)
    parts += s"${name}feff AS (SELECT piece, c FROM $prevEff)"
    parts += s"""${name}w0e AS (SELECT word,
       |  list_append(list_transform(range(1, length(word) + 1),
       |    i -> substring(word, CAST(i AS INTEGER), 1)), '</w>') AS syms
       |  FROM (SELECT DISTINCT unnest($toks) AS word
       |        FROM $encodeFrom))""".stripMargin
    parts += viterbiCtes(s"${name}fv", s"${name}w0e", s"${name}fcm",
      maxPieceSyms)
    parts += s"""${name}voc AS (SELECT piece,
       |  CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT) AS vid
       |  FROM (SELECT piece FROM $prevEff))""".stripMargin
    parts.result().mkString(",\n")
  }

  /** The oracle-scale knobs, shared by every query here and its Spark
    * twin — small enough that the DuckDB replay stays ~seconds, large
    * enough that seeding/EM/prune all bind. */
  private val K = Unigram.Knobs(maxPieceSyms = 4, minSeedCount = 2L,
    seedSize = 400, emRounds = 2, vocabTarget = 60, postEmRounds = 1)

  private def chain(trainFrom: String = "documents",
                    encodeFrom: String = "documents",
                    toks: String = sqlToks): String =
    unigramChainCtes(K.maxPieceSyms, K.minSeedCount, K.seedSize,
      K.emRounds, K.vocabTarget, K.postEmRounds, trainFrom, encodeFrom,
      toks)

  /** q147: UNIGRAM-LM TRAIN + ENCODE to token ids ([[Unigram.train]] +
    * [[Unigram.encode]]) — the full second-tokenizer-family path from
    * raw text to the unit a trainer consumes, hash-checked position by
    * position: seeding, two hard-EM rounds, the prune to 60 multi
    * pieces, the post-prune round, final Viterbi segmentation of every
    * corpus word, stable cp-order ids. */
  val q147 = Q(
    "q147_unigram_encode",
    s"""WITH RECURSIVE
       |${chain()},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.pieces
       |        FROM tokq t JOIN ufvfin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(pieces) AS piece,
       |                unnest(range(1, len(pieces) + 1)) AS sp FROM pcs),
       |outp AS (SELECT doc_id,
       |                CAST(row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tp, sp) - 1 AS BIGINT) AS pos,
       |                piece FROM flat)
       |SELECT o.doc_id, o.pos, o.piece, v.vid AS token_id
       |FROM outp o JOIN uvoc v ON v.piece = o.piece
       |ORDER BY o.doc_id, o.pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val model = Unigram.train(docs, "text", K)
    Unigram.encode(docs, "doc_id", "text", model)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("pieces"), col("token_ids"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.pieces").as("piece"), col("col.token_ids").as("token_id"))
      .orderBy("doc_id", "pos")
  }

  /** q148: TOKENIZER FERTILITY A/B — BPE vs unigram, per language,
    * over the q136 planted mixed-script corpus, both under
    * [[Bpe.PreTok.CpClass]]: the decision table for the retrain signal
    * q142 monitors (which family should each language slice be
    * paying?). The oracle replays BOTH training chains — the unrolled
    * BPE rounds and the unigram EM — over the same pre-split corpus,
    * plus each family's per-document piece counts and the exact
    * integer fertility arithmetic. Planted documents carry lang `zz` —
    * the slice where the two families actually diverge. */
  val q148 = Q(
    "q148_tokenizer_fertility_ab",
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, lang, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, 'zz',
       |         text || ' v' || CAST(doc_id AS VARCHAR) || '世界算法7!'
       |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL),
       |${BpeQ.bpeChainCtes(30, encodeFrom = "corpus",
          trainFrom = "corpus", toks = sqlToksCp)},
       |${chain(trainFrom = "corpus", encodeFrom = "corpus",
          toks = sqlToksCp)},
       |btok AS (SELECT doc_id, unnest($sqlToksCp) AS word FROM corpus),
       |bcnt AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |                CAST(SUM(len(f.syms)) AS BIGINT) AS n_pieces
       |         FROM btok t JOIN fin f USING (word) GROUP BY t.doc_id),
       |ucnt AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |                CAST(SUM(len(f.pieces)) AS BIGINT) AS n_pieces
       |         FROM btok t JOIN ufvfin f USING (word) GROUP BY t.doc_id),
       |g AS (SELECT c.lang, 'bpe' AS algo, b.n_words, b.n_pieces,
       |             CAST(length(c.text) AS BIGINT) AS nc
       |      FROM corpus c JOIN bcnt b ON b.doc_id = c.doc_id
       |      UNION ALL
       |      SELECT c.lang, 'unigram' AS algo, u.n_words, u.n_pieces,
       |             CAST(length(c.text) AS BIGINT) AS nc
       |      FROM corpus c JOIN ucnt u ON u.doc_id = c.doc_id)
       |SELECT lang, algo,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(SUM(nc) AS BIGINT) AS n_chars,
       |       CAST(SUM(n_pieces) * 1000 // SUM(nc) AS BIGINT)
       |         AS pieces_per_kchar,
       |       CAST(SUM(n_pieces) * 1000 // SUM(n_words) AS BIGINT)
       |         AS pieces_per_word_milli
       |FROM g GROUP BY lang, algo ORDER BY lang, algo""".stripMargin) {
    (s, dir) =>
      val docs = Tables.documents(s, dir)
      val planted = docs
        .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          lit("zz").as("lang"),
          concat(col("text"), lit(" v"), col("doc_id").cast("string"),
            lit("世界算法7!")).as("text"))
      val corpus = docs.select("doc_id", "lang", "text").unionAll(planted)
      val cp = Bpe.PreTok.CpClass
      val merges = Bpe.train(corpus, "text", numMerges = 30, preTok = cp)
      val bpeF = Bpe.fertility(corpus, "doc_id", "text", "lang", merges, cp)
        .withColumn("algo", lit("bpe"))
      val model = Unigram.train(corpus, "text", K, preTok = cp)
      val uniF = Unigram.fertility(corpus, "doc_id", "text", "lang", model)
        .withColumn("algo", lit("unigram"))
      bpeF.unionAll(uniF)
        .select(col("lang"), col("algo"), col("n_docs"), col("n_words"),
          col("n_pieces"), col("n_chars"), col("pieces_per_kchar"),
          col("pieces_per_word_milli"))
        .orderBy("lang", "algo")
  }

  /** q149: UNIGRAM DECODE ROUNDTRIP under byte fallback — q134's
    * contract for the second family: the model trains on the BASE
    * corpus (whitespace policy), the PLANTED corpus (CJK + emoji code
    * points outside the training alphabet) encodes under the frozen
    * vocabulary — unknown symbols enter the lattice at
    * [[Unigram.UnkSymCost]] and decompose to `<0xNN>` byte pieces —
    * and [[Bpe.decode]] (shared verbatim: the marker and byte-run
    * contracts are piece-level) reassembles. Oracle: the
    * whitespace-normalized text, zero invalid sequences. */
  val q149 = Q(
    "q149_unigram_decode_roundtrip",
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' 世界 😀tok'
       |  FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL)
       |SELECT doc_id,
       |       array_to_string($sqlToks, ' ') AS text_rt,
       |       CAST(0 AS BIGINT) AS n_invalid
       |FROM corpus WHERE text IS NOT NULL
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val planted = docs
      .filter(col("doc_id") % 7 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" 世界 😀tok")).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(planted)
    val model = Unigram.train(docs, "text", K)
    val vocab = model.vocab(byteFallback = true)
    // decode reads only (doc_id, token_ids) — skip the audit strings
    // the opaque encoder cannot prune (emitPieces = false)
    val enc = Unigram.encode(corpus, "doc_id", "text", model,
      byteFallback = true, emitPieces = false)
    Bpe.decode(enc, "doc_id", "token_ids", vocab)
      .select(col("doc_id"), col("text").as("text_rt"), col("n_invalid"))
      .orderBy("doc_id")
  }

  /** q150: GLOBAL TOKEN-BALANCED PACK STREAMS DENOMINATED IN UNIGRAM
    * TOKENS — q132's loader artifact with the weight, ids and
    * separator re-based from the BPE tokenizer to the trained unigram
    * vocabulary: proof the two families are interchangeable in the
    * packing pipeline (same epoch-shuffle seed 7 / 8 shards, budget
    * 700, weight = n_pieces + 1 counting the trailing separator,
    * separator id one past the vocabulary). The oracle replays
    * training, Viterbi segmentation, ids, the shuffle key, the global
    * prefix sum AND the concatenation, position by position. */
  val q150 = Q(
    "q150_unigram_pack_streams",
    s"""WITH RECURSIVE
       |${chain()},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.pieces
       |        FROM tokq t JOIN ufvfin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(pieces) AS piece,
       |                unnest(range(1, len(pieces) + 1)) AS sp FROM pcs),
       |docids AS (SELECT f.doc_id, v.vid,
       |                  row_number() OVER (PARTITION BY f.doc_id
       |                    ORDER BY f.tp, f.sp) AS dp
       |           FROM flat f JOIN uvoc v ON v.piece = f.piece),
       |ucnt AS (SELECT t.doc_id,
       |                CAST(SUM(len(f.pieces)) AS BIGINT) AS n_pieces
       |         FROM tokq t JOIN ufvfin f USING (word)
       |         GROUP BY t.doc_id),
       |usepv AS (SELECT CAST(COUNT(*) AS BIGINT) AS sep FROM uvoc),
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${TextQ.sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN ucnt c ON c.doc_id = d.doc_id),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard, w
       |      FROM k),
       |ww AS (SELECT doc_id, ek, shard, w,
       |         SUM(w) OVER (ORDER BY shard, ek, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |       FROM s),
       |pk AS (SELECT doc_id, ek, shard, w,
       |              CAST((cum - w) // 700 AS BIGINT) AS pack_id FROM ww),
       |tok2 AS (SELECT doc_id, vid, dp FROM docids
       |         UNION ALL
       |         SELECT p.doc_id, (SELECT sep FROM usepv) AS vid,
       |                p.w AS dp
       |         FROM pk p),
       |expl AS (SELECT p.pack_id, p.shard, p.ek, t.doc_id, t.dp, t.vid
       |         FROM tok2 t JOIN pk p USING (doc_id)),
       |outp AS (SELECT pack_id,
       |                CAST(row_number() OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id, dp) - 1 AS BIGINT)
       |                  AS pos,
       |                vid AS token_id FROM expl)
       |SELECT pack_id, pos, token_id FROM outp
       |ORDER BY pack_id, pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val model = Unigram.train(docs, "text", K)
    // token_ids-only encode straight into the shuffle — the former
    // docs⋈enc re-attach was an identity join (enc.doc_id ⊆ docs.doc_id,
    // doc_id unique) that broadcast the encoded corpus and re-scanned
    // the table; emitPieces = false skips building the audit strings
    // the opaque encoder could never have pruned (see Bpe.encode)
    val enc = Unigram.encode(docs, "doc_id", "text", model,
      emitPieces = false)
    val e = graft.operators.Mixing.epochShuffle(
      enc.select(col("doc_id"), col("token_ids")),
      "doc_id", seed = 7L, nShards = 8)
    graft.operators.Packing.packTokenStreams(e, "shard", "pos",
      "token_ids", budget = 700L, sepId = model.pieces.length.toLong)
      .select(col("pack_id"), posexplode(col("token_ids")))
      .select(col("pack_id"), col("pos").cast("long").as("pos"),
        col("col").as("token_id"))
      .orderBy("pack_id", "pos")
  }

  /** q151: VOCABULARY UTILIZATION — the per-piece table tokenizer
    * teams audit before shipping an embedding matrix: every piece's
    * stable id, TRAINED count, fixed-point cost, and its ACTUAL usage
    * under the final segmentation of the corpus (Σ word-frequency ×
    * occurrences). Pieces the corpus never uses (singles kept only by
    * the coverage floor) read 0 — the dead-slot count in the embedding
    * table. The oracle replays the trained counts, the cost chain and
    * the usage fold directly — the cost table itself goes under the
    * hash gate, not just the segmentations it induces. */
  val q151 = Q(
    "q151_unigram_vocab_stats",
    s"""WITH RECURSIVE
       |${chain()},
       |uses AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS n_uses
       |         FROM (SELECT f.freq, unnest(b.pieces) AS piece
       |               FROM ufvfin b JOIN uwf f USING (word))
       |         GROUP BY piece)
       |SELECT v.vid, v.piece, e.c AS train_count, co.cost,
       |       COALESCE(u.n_uses, CAST(0 AS BIGINT)) AS n_uses
       |FROM uvoc v
       |JOIN ufeff e ON e.piece = v.piece
       |JOIN ufcost co ON co.piece = v.piece
       |LEFT JOIN uses u ON u.piece = v.piece
       |ORDER BY v.vid""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val model = Unigram.train(docs, "text", K)
    val stats = model.pieces.indices
      .map(i => (i.toLong, model.pieces(i), model.counts(i),
        model.costs(i)))
      .toDF("vid", "piece", "train_count", "cost")
    val uses = Unigram.encode(docs, "doc_id", "text", model)
      .select(explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n_uses"))
    stats.join(uses, Seq("piece"), "left")
      .select(col("vid"), col("piece"), col("train_count"), col("cost"),
        coalesce(col("n_uses"), lit(0L)).as("n_uses"))
      .orderBy("vid")
  }

  /** K-best Viterbi DP + per-occurrence path table →
    * `{pfx}fin(word, kb)` where `kb` is the [[Unigram.pathLt]]-ordered
    * top-k `STRUCT(c, ps)` list (DuckDB's natural struct/list sort IS
    * that order). */
  private def kbestCtes(pfx: String, wordsCte: String, cmCte: String,
                        maxLen: Int, k: Int): String = {
    val empty = "CAST([] AS STRUCT(c BIGINT, ps VARCHAR[])[])"
    val piece = s"""array_to_string(list_slice(syms,
       |                   CAST(i + 1 AS INTEGER),
       |                   CAST(j + 1 AS INTEGER)), '')""".stripMargin
    s"""${pfx}dp AS (
       |  SELECT word, syms, 0 AS j,
       |         [[{'c': CAST(0 AS BIGINT), 'ps': CAST([] AS VARCHAR[])}]]
       |           AS hist
       |  FROM $wordsCte
       |  UNION ALL
       |  SELECT word, syms, j + 1, list_append(hist, topk)
       |  FROM (
       |    SELECT word, syms, j, hist,
       |      list_slice(list_sort(flatten(
       |        list_transform(range(greatest(0, j + 1 - $maxLen), j + 1),
       |          i -> CASE WHEN map_extract($cmCte.m, $piece)[1] IS NULL
       |               THEN $empty
       |               ELSE list_transform(hist[CAST(i + 1 AS INTEGER)],
       |                 cand -> {'c': cand.c +
       |                            map_extract($cmCte.m, $piece)[1],
       |                          'ps': list_append(cand.ps, $piece)})
       |          END))), 1, $k) AS topk
       |    FROM ${pfx}dp, $cmCte WHERE j < len(syms))),
       |${pfx}fin AS MATERIALIZED (
       |  SELECT word, hist[CAST(len(syms) + 1 AS INTEGER)] AS kb
       |  FROM ${pfx}dp WHERE j = len(syms))""".stripMargin
  }

  /** q152: SUBWORD REGULARIZATION ([[Unigram.encodeSampled]], Kudo
    * 2018 §3 made deterministic) — each word occurrence picks among
    * its k-best segmentations by a hash-geometric draw (the argmax
    * gets ~1/2 the mass, rank r ~2^−(r+1)), so a trainer sees
    * segmentation VARIANTS while every shard stays bit-replayable
    * (same salt ⇒ same stream; new salt per epoch ⇒ fresh diversity —
    * the epoch-shuffle discipline applied to segmentation). The oracle
    * replays the k-best DP (per-position top-k truncation is exact:
    * costs non-negative, suffixes never flip a prefix's lex rank), the
    * `2^m − 1` modulus, the bit-length pick and the flatten — every
    * sampled token position hash-checked. */
  val q152 = Q(
    "q152_unigram_sampled_encode",
    s"""WITH RECURSIVE
       |${chain()},
       |${kbestCtes("usmp", "uw0e", "ufcm", K.maxPieceSyms, 4)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pick AS (SELECT doc_id, tp,
       |                kb[CAST(len(kb) - (length(bin(
       |                  (${TextQ.sqlHash(
                            "'e1:' || CAST(doc_id AS VARCHAR) || ':' || " +
                              "CAST(tp AS VARCHAR)")})
       |                   % ((CAST(1 AS BIGINT) << len(kb)) - 1) + 1
       |                  )) - 1) AS INTEGER)].ps AS pieces
       |         FROM (SELECT t.doc_id, t.tp, f.kb
       |               FROM tokq t JOIN usmpfin f USING (word))),
       |flat AS (SELECT doc_id, tp, unnest(pieces) AS piece,
       |                unnest(range(1, len(pieces) + 1)) AS sp FROM pick),
       |outp AS (SELECT doc_id,
       |                CAST(row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tp, sp) - 1 AS BIGINT) AS pos,
       |                piece FROM flat)
       |SELECT o.doc_id, o.pos, o.piece, v.vid AS token_id
       |FROM outp o JOIN uvoc v ON v.piece = o.piece
       |ORDER BY o.doc_id, o.pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val model = Unigram.train(docs, "text", K)
    Unigram.encodeSampled(docs, "doc_id", "text", model, k = 4,
      salt = "e1")
      .select(col("doc_id"),
        posexplode(arrays_zip(col("pieces"), col("token_ids"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.pieces").as("piece"), col("col.token_ids").as("token_id"))
      .orderBy("doc_id", "pos")
  }

  /** q153: VOCABULARY-SIZE SWEEP — the tokenizer team's sizing table:
    * the SAME corpus trained at two vocabulary targets (the q109
    * classifier-sweep pattern applied to tokenization), each reporting
    * its realized vocab size and exact fertility — the compression-vs-
    * table-size trade as one artifact. The oracle replays BOTH
    * complete training chains side by side (the generator's name
    * prefix keeps the two EM histories disjoint in one statement). */
  val q153 = Q(
    "q153_unigram_vocab_sweep",
    s"""WITH RECURSIVE
       |${chain()},
       |${unigramChainCtes(K.maxPieceSyms, K.minSeedCount, K.seedSize,
          K.emRounds, 30, K.postEmRounds, name = "v")},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word FROM documents),
       |chars AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS nc
       |          FROM documents WHERE text IS NOT NULL),
       |uc AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |              CAST(SUM(len(f.pieces)) AS BIGINT) AS n_pieces
       |       FROM tokq t JOIN ufvfin f USING (word) GROUP BY t.doc_id),
       |vc AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |              CAST(SUM(len(f.pieces)) AS BIGINT) AS n_pieces
       |       FROM tokq t JOIN vfvfin f USING (word) GROUP BY t.doc_id),
       |uagg AS (SELECT CAST(60 AS BIGINT) AS vocab_target,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM uvoc) AS n_vocab,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(c.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(c.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(ch.nc) AS BIGINT) AS n_chars
       |  FROM uc c JOIN chars ch USING (doc_id)),
       |vagg AS (SELECT CAST(30 AS BIGINT) AS vocab_target,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM vvoc) AS n_vocab,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(c.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(c.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(ch.nc) AS BIGINT) AS n_chars
       |  FROM vc c JOIN chars ch USING (doc_id))
       |SELECT vocab_target, n_vocab, n_docs, n_words, n_pieces, n_chars,
       |       CAST(n_pieces * 1000 // n_chars AS BIGINT)
       |         AS pieces_per_kchar,
       |       CAST(n_pieces * 1000 // n_words AS BIGINT)
       |         AS pieces_per_word_milli
       |FROM (SELECT * FROM vagg UNION ALL SELECT * FROM uagg)
       |ORDER BY vocab_target""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    def side(target: Int) = {
      val model = Unigram.train(docs, "text", K.copy(vocabTarget = target))
      val pc = Unigram.pieceCounts(docs, "doc_id", "text", model)
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"), length(col("text")).cast("long").as("nc"))
        .join(pc, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
          sum("n_pieces").as("n_pieces"), sum("nc").as("n_chars"))
        .select(lit(target.toLong).as("vocab_target"),
          lit(model.pieces.length.toLong).as("n_vocab"),
          col("n_docs"), col("n_words"), col("n_pieces"), col("n_chars"))
        .withColumn("pieces_per_kchar",
          expr("n_pieces * 1000L div n_chars"))
        .withColumn("pieces_per_word_milli",
          expr("n_pieces * 1000L div n_words"))
    }
    side(30).unionAll(side(60)).orderBy("vocab_target")
  }

  /** q154: CP-CLASS PRE-TOKENIZED UNIGRAM ENCODE — q136's multilingual
    * regime for the second family, at TOKEN level (q148 hash-checks the
    * same segmentations only through the fertility aggregate): the
    * planted mixed-script corpus trains and encodes under
    * [[Bpe.PreTok.CpClass]], so recurring CJK runs accumulate frequency,
    * survive the seed floor, and the EM learns multi-symbol pieces
    * inside them — every token position hash-checked through the
    * pre-split twin + the full training replay. */
  val q154 = Q(
    "q154_unigram_cpclass_encode",
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' v' || CAST(doc_id AS VARCHAR)
       |           || '世界算法7!'
       |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL),
       |${chain(trainFrom = "corpus", encodeFrom = "corpus",
          toks = sqlToksCp)},
       |tokq AS (SELECT doc_id, unnest($sqlToksCp) AS word,
       |                unnest(range(1, len($sqlToksCp) + 1)) AS tp
       |         FROM corpus),
       |pcs AS (SELECT t.doc_id, t.tp, f.pieces
       |        FROM tokq t JOIN ufvfin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(pieces) AS piece,
       |                unnest(range(1, len(pieces) + 1)) AS sp FROM pcs),
       |outp AS (SELECT doc_id,
       |                CAST(row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tp, sp) - 1 AS BIGINT) AS pos,
       |                piece FROM flat)
       |SELECT o.doc_id, o.pos, o.piece, v.vid AS token_id
       |FROM outp o JOIN uvoc v ON v.piece = o.piece
       |ORDER BY o.doc_id, o.pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val planted = docs
      .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" v"), col("doc_id").cast("string"),
          lit("世界算法7!")).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(planted)
    val model = Unigram.train(corpus, "text", K,
      preTok = Bpe.PreTok.CpClass)
    Unigram.encode(corpus, "doc_id", "text", model)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("pieces"), col("token_ids"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.pieces").as("piece"), col("col.token_ids").as("token_id"))
      .orderBy("doc_id", "pos")
  }

  /** q155: SAMPLED-ENCODING PACK STREAMS — the q150 loader artifact
    * re-based from the frozen argmax segmentation to
    * [[Unigram.encodeSampled]]'s deterministic subword regularization
    * (q152's hash-geometric per-occurrence pick, salt `e1`, k = 4): the
    * REGULARIZED training shards a deployment wanting Kudo-style
    * segmentation diversity actually packs, as a first-class artifact
    * instead of a hand-composition. Same epoch-shuffle seed 7 / 8
    * shards / budget 700 / separator one past the vocabulary; the
    * WEIGHT is the sampled piece count + 1 (a document's pack footprint
    * follows its sampled segmentation, not the argmax one), so the
    * oracle replays training, the k-best DP, every draw, the shuffle
    * key, the global prefix sum AND the concatenation position by
    * position. A new salt per epoch re-draws every pick — the
    * epoch-shuffle discipline applied to segmentation — while the same
    * salt replays shards bit for bit. */
  val q155 = Q(
    "q155_unigram_sampled_packs",
    s"""WITH RECURSIVE
       |${chain()},
       |${kbestCtes("usmp", "uw0e", "ufcm", K.maxPieceSyms, 4)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pick AS (SELECT doc_id, tp,
       |                kb[CAST(len(kb) - (length(bin(
       |                  (${TextQ.sqlHash(
                            "'e1:' || CAST(doc_id AS VARCHAR) || ':' || " +
                              "CAST(tp AS VARCHAR)")})
       |                   % ((CAST(1 AS BIGINT) << len(kb)) - 1) + 1
       |                  )) - 1) AS INTEGER)].ps AS pieces
       |         FROM (SELECT t.doc_id, t.tp, f.kb
       |               FROM tokq t JOIN usmpfin f USING (word))),
       |flat AS (SELECT doc_id, tp, unnest(pieces) AS piece,
       |                unnest(range(1, len(pieces) + 1)) AS sp FROM pick),
       |docids AS (SELECT f.doc_id, v.vid,
       |                  row_number() OVER (PARTITION BY f.doc_id
       |                    ORDER BY f.tp, f.sp) AS dp
       |           FROM flat f JOIN uvoc v ON v.piece = f.piece),
       |ucnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pieces
       |         FROM flat GROUP BY doc_id),
       |usepv AS (SELECT CAST(COUNT(*) AS BIGINT) AS sep FROM uvoc),
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${TextQ.sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN ucnt c ON c.doc_id = d.doc_id),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard, w
       |      FROM k),
       |ww AS (SELECT doc_id, ek, shard, w,
       |         SUM(w) OVER (ORDER BY shard, ek, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |       FROM s),
       |pk AS (SELECT doc_id, ek, shard, w,
       |              CAST((cum - w) // 700 AS BIGINT) AS pack_id FROM ww),
       |tok2 AS (SELECT doc_id, vid, dp FROM docids
       |         UNION ALL
       |         SELECT p.doc_id, (SELECT sep FROM usepv) AS vid,
       |                p.w AS dp
       |         FROM pk p),
       |expl AS (SELECT p.pack_id, p.shard, p.ek, t.doc_id, t.dp, t.vid
       |         FROM tok2 t JOIN pk p USING (doc_id)),
       |outp AS (SELECT pack_id,
       |                CAST(row_number() OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id, dp) - 1 AS BIGINT)
       |                  AS pos,
       |                vid AS token_id FROM expl)
       |SELECT pack_id, pos, token_id FROM outp
       |ORDER BY pack_id, pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val model = Unigram.train(docs, "text", K)
    // token_ids-only sampled encode straight into the shuffle — same
    // identity-join removal and emitPieces pruning as q150
    val enc = Unigram.encodeSampled(docs, "doc_id", "text", model,
      k = 4, salt = "e1", emitPieces = false)
    val e = graft.operators.Mixing.epochShuffle(
      enc.select(col("doc_id"), col("token_ids")),
      "doc_id", seed = 7L, nShards = 8)
    graft.operators.Packing.packTokenStreams(e, "shard", "pos",
      "token_ids", budget = 700L, sepId = model.pieces.length.toLong)
      .select(col("pack_id"), posexplode(col("token_ids")))
      .select(col("pack_id"), col("pos").cast("long").as("pos"),
        col("col").as("token_id"))
      .orderBy("pack_id", "pos")
  }

  /** q156: LOSS-AWARE PRUNING under the oracle gate ([[Unigram.PruneBy
    * .Loss]], Kudo 2018 §3.2) — the round-15 waiver closed at the one
    * scale where the replay is proportionate: a planted 4-word corpus
    * (`ab`×900, `a`×500, `b`×500, `xy`×40) where count- and
    * loss-ranking DISAGREE — the 1400-count `b</w>` decomposes almost
    * freely into two cheap survivors, so its removal costs the corpus
    * LESS than the 900-count `ab</w>` whose alternative spells three
    * pieces — trained at emRounds = 0 / vocabTarget = 1 so exactly one
    * multi survives: the LOSS winner `ab</w>`, not the count winner.
    * The oracle replays seeding, the fixed-point cost chain, every
    * word's base Viterbi cost, the per-(word, candidate) re-Viterbi
    * WITHOUT the candidate ([[viterbiExclCtes]]), the exact integer
    * loss fold Σ freq × (alt − base), the loss-ranked prune, the
    * post-prune cost chain, and the kept rows' `removal_loss` values
    * themselves. The full-scale waiver stands documented in
    * [[Unigram.PruneBy]]: replaying the loss DP per candidate over a
    * real corpus squares the oracle's DP machinery; this row pins the
    * semantics exactly where the two policies part. */
  val q156 = Q(
    "q156_unigram_loss_prune",
    s"""WITH RECURSIVE
       |corpus AS (
       |  SELECT 'ab' AS text FROM range(900)
       |  UNION ALL SELECT 'a' FROM range(500)
       |  UNION ALL SELECT 'b' FROM range(500)
       |  UNION ALL SELECT 'xy' FROM range(40)),
       |${seedCtes("u", "corpus", sqlToks, 3, 2L, 100)},
       |${costMapCtes("L", "ueff0")},
       |${viterbiCtes("bv", "uw0", "Lcm", 3)},
       |cand AS (SELECT DISTINCT b.word, b.excl FROM
       |  (SELECT word, unnest(pieces) AS excl FROM bvfin) b
       |  LEFT JOIN ualpha a ON a.piece = b.excl WHERE a.piece IS NULL),
       |pairs AS (SELECT c.word, c.excl, w.syms FROM cand c
       |          JOIN uw0 w USING (word)),
       |${viterbiExclCtes("xv", "pairs", "Lcm", 3)},
       |loss AS (SELECT x.excl AS piece,
       |           CAST(SUM(f.freq * (x.altcost - b.cost)) AS BIGINT)
       |             AS loss
       |         FROM xvfin x
       |         JOIN uwf f USING (word)
       |         JOIN bvdpf b USING (word)
       |         GROUP BY x.excl),
       |upr AS MATERIALIZED (
       |  SELECT piece, c FROM (
       |    SELECT e.piece, e.c FROM ueff0 e
       |    LEFT JOIN ualpha a ON a.piece = e.piece
       |    LEFT JOIN loss l ON l.piece = e.piece
       |    WHERE a.piece IS NULL
       |    ORDER BY COALESCE(l.loss, 0) DESC, e.c DESC, e.piece ASC
       |    LIMIT 1)
       |  UNION ALL
       |  SELECT e.piece, e.c FROM ueff0 e
       |  JOIN ualpha a ON a.piece = e.piece),
       |${costMapCtes("F", "upr")},
       |uvoc AS (SELECT piece,
       |  CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT) AS vid
       |  FROM (SELECT piece FROM upr))
       |SELECT v.vid, v.piece, e.c AS train_count, co.cost,
       |       CAST(COALESCE(l.loss, 0) AS BIGINT) AS removal_loss
       |FROM uvoc v
       |JOIN upr e ON e.piece = v.piece
       |JOIN Fcost co ON co.piece = v.piece
       |LEFT JOIN loss l ON l.piece = v.piece
       |ORDER BY v.vid""".stripMargin) { (s, dir) =>
    import s.implicits._
    val corpus = s.range(900).select(lit("ab").as("text"))
      .unionAll(s.range(500).select(lit("a").as("text")))
      .unionAll(s.range(500).select(lit("b").as("text")))
      .unionAll(s.range(40).select(lit("xy").as("text")))
    val knobs = Unigram.Knobs(maxPieceSyms = 3, minSeedCount = 2L,
      seedSize = 100, emRounds = 0, vocabTarget = 1, postEmRounds = 0,
      pruneBy = Unigram.PruneBy.Loss)
    val model = Unigram.train(corpus, "text", knobs)
    // the same bounded word table train() collected, for the loss table
    val vocab = Bpe.wordFrequencies(corpus, "text", model.preTok)
      .orderBy(col("freq").desc, col("word").asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    val (eff, alpha) = Unigram.seedFromVocab(vocab, knobs)
    val losses = Unigram.removalLosses(vocab, eff, alpha, knobs)
    model.pieces.indices
      .map(i => (i.toLong, model.pieces(i), model.counts(i),
        model.costs(i), losses.getOrElse(model.pieces(i), 0L)))
      .toDF("vid", "piece", "train_count", "cost", "removal_loss")
      .orderBy("vid")
  }

  /** q157: WARM-START RETRAINING under the oracle gate
    * ([[Unigram.warmStart]] — round 16's incremental trainer, here
    * hash-checked, not only spec-pinned): the base model trains on the
    * full corpus (the standard chain), the corpus DRIFTS (a third of
    * the documents leave; a planted cohort arrives carrying the new
    * symbols `世界`), and the warm start replays in SQL exactly as the
    * driver runs it — the previous model's singles ∪ the drifted
    * corpus's alphabet (new symbols floored at 1, the coverage
    * contract), the previous multis with their trained counts, ONE
    * hard-EM round against the NEW word-frequency table (the same
    * recursive-CTE Viterbi DP, usage re-estimation, coverage floor,
    * dead multis dropping), the count prune and the fixed-point cost
    * chain — every surviving piece, trained count and cost
    * hash-checked. */
  val q157 = Q(
    "q157_unigram_warm_start",
    s"""WITH RECURSIVE
       |${chain()},
       |drift AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 != 0
       |  UNION ALL
       |  SELECT doc_id + 3000000, text || ' zqz 世界'
       |  FROM documents WHERE doc_id % 4 = 0 AND text IS NOT NULL),
       |${seedCtes("n", "drift", sqlToks, K.maxPieceSyms, K.minSeedCount,
          K.seedSize)},
       |walpha AS (SELECT DISTINCT piece FROM (
       |  SELECT piece FROM nalpha
       |  UNION ALL
       |  SELECT e.piece FROM ufeff e
       |  JOIN ualpha a ON a.piece = e.piece)),
       |weff0 AS MATERIALIZED (
       |  SELECT w.piece, GREATEST(COALESCE(e.c, 0), 1) AS c
       |  FROM walpha w LEFT JOIN ufeff e ON e.piece = w.piece
       |  UNION ALL
       |  SELECT e.piece, e.c FROM ufeff e
       |  LEFT JOIN walpha w ON w.piece = e.piece
       |  WHERE w.piece IS NULL),
       |${costMapCtes("W", "weff0")},
       |${viterbiCtes("wv", "nw0", "Wcm", K.maxPieceSyms)},
       |${emCntCtes("w1", "wvfin", "nwf", "walpha")},
       |wpr AS MATERIALIZED (
       |  SELECT piece, c FROM (
       |    SELECT e.piece, e.c FROM w1eff e
       |    LEFT JOIN walpha a ON a.piece = e.piece
       |    WHERE a.piece IS NULL
       |    ORDER BY e.c DESC, e.piece ASC LIMIT ${K.vocabTarget})
       |  UNION ALL
       |  SELECT e.piece, e.c FROM w1eff e
       |  JOIN walpha a ON a.piece = e.piece),
       |${costMapCtes("Z", "wpr")},
       |wvoc AS (SELECT piece,
       |  CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT) AS vid
       |  FROM (SELECT piece FROM wpr))
       |SELECT v.vid, v.piece, e.c AS train_count, co.cost
       |FROM wvoc v
       |JOIN wpr e ON e.piece = v.piece
       |JOIN Zcost co ON co.piece = v.piece
       |ORDER BY v.vid""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val base = Unigram.train(docs, "text", K)
    val planted = docs
      .filter(col("doc_id") % 4 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" zqz 世界")).as("text"))
    val drift = docs.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id", "text").unionAll(planted)
    val warm = Unigram.warmStart(drift, "text", base, K, warmRounds = 1)
    warm.pieces.indices
      .map(i => (i.toLong, warm.pieces(i), warm.counts(i), warm.costs(i)))
      .toDF("vid", "piece", "train_count", "cost")
      .orderBy("vid")
  }

  val all: Seq[Q] = Seq(q147, q148, q149, q150, q151, q152, q153, q154,
    q155, q156, q157)
}
