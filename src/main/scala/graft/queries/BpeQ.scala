package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, Mixing, Packing}

/** BPE tokenization under the ORACLE GATE — the queries that close the
  * "every loader artifact is denominated in whitespace tokens" gap: the
  * trained merge table's application is replayed bitwise in DuckDB, so
  * per-document token-id sequences (q126) and BPE-denominated packs
  * (q127) hash-match the oracle, and q80's training loop itself (long
  * held "not SQL-expressible") gets a real oracle too.
  *
  * Two replays, each twinning one Scala code path exactly:
  *
  * 1. TRAINING ([[Bpe.trainFromVocab]]) — `numMerges` rounds unrolled as
  *    MATERIALIZED CTEs (the q102 Lloyd discipline). Each round counts
  *    adjacent symbol pairs over the word-frequency table (SUM(freq),
  *    the per-occurrence weighting of the Scala loop), picks the
  *    highest-count pair with the (count DESC, left ASC, right ASC)
  *    tie-break, and applies it EXHAUSTIVELY LEFT-TO-RIGHT to every
  *    word. The left-to-right walk (`i += 2` on match, over the round's
  *    ORIGINAL symbols) is restated non-iteratively: match positions
  *    grouped into consecutive runs (`i − row_number()` trick), every
  *    ODD-ranked position within a run selected — exactly the greedy
  *    pairing ("aaaa" under (a,a) → positions {1,2,3} → select {1,3} →
  *    [aa, aa]). A round whose best pair falls under `minPairCount`
  *    selects nothing and every later round replays the same no-op —
  *    the Scala early-stop, shape-stable.
  *
  * 2. ENCODING ([[Bpe.segmentRanked]]) — a RECURSIVE CTE (the q110
  *    per-step discipline) over the corpus's distinct words: each step
  *    finds the LOWEST-ranKED mergeable adjacent pair (first position on
  *    ties — `list_position` of `list_min`) via a rank MAP keyed by
  *    [left, right] symbol lists (no delimiter collisions), merges that
  *    one occurrence, and stops when no pair has a rank. Training's
  *    exhaustive-by-round application and encoding's greedy re-scan are
  *    DIFFERENT procedures that agree except in pathological
  *    string-collision vocabularies — the oracle replays each against
  *    its own Scala twin, so the gate would catch a divergence instead
  *    of assuming it away.
  *
  * Vocabulary ids replay [[Bpe.vocabOf]]: alphabet pieces get
  * `row_number() OVER (ORDER BY piece) − 1` (DuckDB's binary collation =
  * [[Bpe.cpOrder]] by construction), merge `r`'s product gets `A + r − 1`,
  * and first-wins collision resolution is `MIN(vid)` per piece.
  *
  * Scale: the oracle's cost is DuckDB's, not Spark's — the Spark side
  * trains on the bounded word-frequency table and encodes in-scan with a
  * broadcast rank map ([[Bpe.encode]]); nothing here changes the 100 TB
  * shape. The replay is exact because the chain operates on the same
  * bounded vocabulary (`minFreq` = 1, cap non-binding at oracle scale;
  * the generator replays only the uncapped regime).
  */
object BpeQ {

  import TextQ.{sqlHash, sqlToks}

  /** One unrolled training round: pair counts over `w{r-1}`, the argmax
    * pick `m{r}`, run-parity selection `sl{r}`, the rewritten `w{r}`. */
  private def roundCtes(r: Int, minPairCount: Long): String = {
    val prev = s"w${r - 1}"
    s"""pc$r AS (
       |  SELECT a, b, c FROM (
       |    SELECT syms[i] AS a, syms[i + 1] AS b,
       |           CAST(SUM(freq) AS BIGINT) AS c
       |    FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
       |          FROM $prev)
       |    GROUP BY 1, 2) WHERE c >= $minPairCount),
       |m$r AS (SELECT a, b FROM pc$r ORDER BY c DESC, a ASC, b ASC LIMIT 1),
       |sl$r AS (
       |  SELECT word, list(i ORDER BY i) AS sels FROM (
       |    SELECT word, i,
       |           row_number() OVER (PARTITION BY word, grp ORDER BY i) AS k
       |    FROM (
       |      SELECT word, i,
       |             i - row_number() OVER (PARTITION BY word ORDER BY i)
       |               AS grp
       |      FROM (SELECT t.word, t.i FROM
       |              (SELECT word, syms, unnest(range(1, len(syms))) AS i
       |               FROM $prev) t, m$r
       |            WHERE t.syms[i] = m$r.a AND t.syms[i + 1] = m$r.b)))
       |  WHERE k % 2 = 1 GROUP BY word),
       |w$r AS MATERIALIZED (
       |  SELECT w.word, w.freq,
       |    CASE WHEN s.sels IS NULL THEN w.syms ELSE
       |      list_filter(list_transform(range(1, len(w.syms) + 1),
       |        j -> CASE WHEN list_contains(s.sels, j)
       |                  THEN w.syms[j] || w.syms[j + 1]
       |                  WHEN list_contains(s.sels, j - 1) THEN NULL
       |                  ELSE w.syms[j] END), x -> x IS NOT NULL) END AS syms
       |  FROM $prev w LEFT JOIN sl$r s USING (word))""".stripMargin
  }

  /** The full replay chain (requires a `WITH RECURSIVE` prefix). Ends at:
    * `wf(word, freq)`, `mg(r, a, b)` — the trained merges in rank order,
    * `fin(word, syms)` — every distinct word of `encodeFrom`'s greedy
    * segmentation under the trained table, `voc(piece, vid)` — the
    * stable-id vocabulary. Training always reads `documents`;
    * `encodeFrom` (any earlier CTE or table with doc_id/text) is the
    * corpus being ENCODED — the frozen-tokenizer-on-new-text regime when
    * it differs. */
  private[queries] def bpeChainCtes(numMerges: Int,
                                    minPairCount: Long = 2L,
                                    encodeFrom: String = "documents",
                                    trainFrom: String = "documents",
                                    toks: String = sqlToks): String = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val rounds = (1 to numMerges).map(roundCtes(_, minPairCount))
      .mkString(",\n")
    val mgUnion = (1 to numMerges)
      .map(r => s"SELECT $r AS r, a, b FROM m$r").mkString(" UNION ALL ")
    s"""wf AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toks) AS w FROM $trainFrom) GROUP BY w),
       |w0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    list_append(list_transform(range(1, length(word) + 1),
       |      i -> substring(word, CAST(i AS INTEGER), 1)), '</w>') AS syms
       |  FROM wf),
       |$rounds,
       |mg AS MATERIALIZED ($mgUnion),
       |rk AS (SELECT map(list(k ORDER BY rr), list(rr ORDER BY rr)) AS m
       |       FROM (SELECT [a, b] AS k, CAST(MAX(r) AS BIGINT) AS rr
       |             FROM mg GROUP BY 1)),
       |w0e AS (SELECT word,
       |          list_append(list_transform(range(1, length(word) + 1),
       |            i -> substring(word, CAST(i AS INTEGER), 1)), '</w>')
       |            AS syms
       |        FROM (SELECT DISTINCT unnest($toks) AS word
       |              FROM $encodeFrom)),
       |seg AS (
       |  SELECT word, syms, 0 AS step FROM w0e
       |  UNION ALL
       |  SELECT word,
       |    list_filter(list_transform(range(1, len(syms) + 1),
       |      j -> CASE WHEN j = p THEN syms[j] || syms[j + 1]
       |                WHEN j = p + 1 THEN NULL ELSE syms[j] END),
       |      x -> x IS NOT NULL),
       |    step + 1
       |  FROM (
       |    SELECT word, syms, step, list_min(rks) AS bb,
       |           list_position(rks, list_min(rks)) AS p
       |    FROM (
       |      SELECT g.word, g.syms, g.step,
       |        list_transform(range(1, len(g.syms)),
       |          i -> COALESCE(
       |                 map_extract(rk.m, [g.syms[i], g.syms[i + 1]])[1],
       |                 9223372036854775807)) AS rks
       |      FROM seg g, rk))
       |  WHERE bb < 9223372036854775807),
       |fin AS MATERIALIZED (
       |  SELECT word, syms FROM (
       |    SELECT word, syms,
       |           row_number() OVER (PARTITION BY word ORDER BY step DESC)
       |             AS rn
       |    FROM seg) WHERE rn = 1),
       |alpha AS (SELECT DISTINCT unnest(syms) AS piece FROM w0),
       |av AS (SELECT piece,
       |              CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT)
       |                AS vid FROM alpha),
       |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM av),
       |voc AS (SELECT piece, CAST(MIN(vid) AS BIGINT) AS vid FROM (
       |          SELECT piece, vid FROM av
       |          UNION ALL
       |          SELECT a || b AS piece, na.n + r - 1 AS vid FROM mg, na)
       |        GROUP BY piece)""".stripMargin
  }

  /** The q80 pieces-per-document tail, shared by q80's upgraded oracle
    * and q127's denomination: `cnt(doc_id, n_words, n_pieces)`. */
  private val cntCte: String =
    s"""tokp AS (SELECT doc_id, unnest($sqlToks) AS word FROM documents),
       |cnt AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |               CAST(SUM(len(f.syms)) AS BIGINT) AS n_pieces
       |        FROM tokp t JOIN fin f USING (word) GROUP BY t.doc_id)"""
      .stripMargin

  /** q126: per-document BPE ENCODING to token ids ([[Bpe.encode]]) — 30
    * merges trained from the corpus (q80's knobs), the vocabulary built
    * from the corpus alphabet + merge products with stable first-wins
    * ids, every document's piece sequence and id sequence emitted
    * position by position. The oracle replays training (unrolled CTEs),
    * greedy segmentation (recursive CTE), id assignment, and the
    * per-document flatten — the whole path from raw text to the unit a
    * trainer consumes, hash-checked. */
  val q126 = Q(
    "q126_bpe_encode",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |outp AS (SELECT doc_id,
       |                CAST(row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tp, sp) - 1 AS BIGINT) AS pos,
       |                piece FROM flat)
       |SELECT o.doc_id, o.pos, o.piece, v.vid AS token_id
       |FROM outp o JOIN voc v ON v.piece = o.piece
       |ORDER BY o.doc_id, o.pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges)
    Bpe.encode(docs, "doc_id", "text", merges, vocab)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("pieces"), col("token_ids"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.pieces").as("piece"), col("col.token_ids").as("token_id"))
      .orderBy("doc_id", "pos")
  }

  /** q127: GLOBAL TOKEN-BALANCED PACKS DENOMINATED IN BPE TOKENS —
    * q117's two-pass global packing with the weight column re-based from
    * whitespace `n_tokens` to the trained tokenizer's exact piece count
    * ([[Bpe.pieceCounts]]), i.e. the unit a training run actually
    * consumes per sequence. Same epoch-shuffle order (seed 7, 8 shards),
    * budget 700 BPE tokens; the oracle re-derives the merge table, every
    * word's segmentation, the per-document piece count, the mixed key,
    * and the global running sum. */
  val q127 = Q(
    "q127_bpe_token_packs",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |$cntCte,
       |k AS (SELECT d.doc_id, c.n_pieces AS n_tok,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard, n_tok
       |      FROM k),
       |w AS (SELECT doc_id, shard, n_tok,
       |        SUM(n_tok) OVER (ORDER BY shard, ek, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM s)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tok,
       |       CAST((cum - n_tok) // 700 AS BIGINT) AS pack_id
       |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val counts = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_pieces").as("n_tok"))
    val e = Mixing.epochShuffle(
      docs.select("doc_id").join(counts, Seq("doc_id")),
      "doc_id", seed = 7L, nShards = 8)
    Packing.packGlobalByBudget(e, "shard", "pos", "n_tok", budget = 700L)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("pack_id"))
      .orderBy("doc_id")
  }

  /** q80's REAL oracle (the round-11 "not SQL-expressible" claim,
    * falsified): training + per-document piece counts, the chain above. */
  private[queries] val q80OracleSql: String =
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |$cntCte
       |SELECT doc_id, n_words, n_pieces
       |FROM cnt ORDER BY doc_id""".stripMargin

  /** q129: EXACT BPE-token quantiles — q118's distribution-compression
    * rank arithmetic over the trained tokenizer's piece counts instead
    * of whitespace counts: the corpus length telemetry in the unit the
    * context window is actually budgeted in. Histogram bounded by
    * distinct piece counts; type-1 lower quantile in multiplication
    * form, integer-exact on both engines. */
  val q129 = Q(
    "q129_bpe_token_quantiles",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |$cntCte,
       |h AS (SELECT n_pieces AS v, CAST(COUNT(*) AS BIGINT) AS c
       |      FROM cnt GROUP BY 1),
       |cum AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS cc FROM h),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
       |p AS (SELECT * FROM (VALUES (10),(25),(50),(75),(90),(99))
       |      AS p(pct))
       |SELECT pct, CAST(MIN(v) AS BIGINT) AS value
       |FROM p, cum, n WHERE cc * 100 >= pct * n
       |GROUP BY pct ORDER BY pct""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    graft.operators.Sketches.exactQuantiles(
      Bpe.pieceCounts(docs, "doc_id", "text", merges)
        .select(col("n_pieces")),
      "n_pieces", Seq(10, 25, 50, 75, 90, 99))
      .orderBy("pct")
  }

  /** q131: BYTE-LEVEL FALLBACK ENCODING under a FROZEN tokenizer — the
    * regime [[Bpe.encode]]'s `byteFallback` exists for: new text under a
    * vocabulary whose training alphabet misses some of its code points
    * (every seventh document is re-planted under id+10⁶ with appended
    * CJK + emoji words — code points no training document contains).
    * The vocabulary folds the 256 `<0xNN>` byte pieces into the
    * alphabet ([[Bpe.vocabOf]] with `byteFallback`), unknown pieces
    * decompose to their UTF-8 byte pieces IN PLACE (positions expand),
    * and NO unk id can exist. The oracle replays training, frozen
    * segmentation over the PLANTED corpus's words, the byte-piece
    * decomposition (`hex(encode(piece))` — DuckDB's UTF-8 bytes — cut
    * into `<0xNN>` pieces), the stable ids over the widened alphabet,
    * and the per-document `n_unk` telemetry; every token position
    * hash-checked. */
  /** [[bpeChainCtes]] with the 256 byte pieces folded into the alphabet
    * CTE — the oracle twin of `vocabOf(..., byteFallback = true)`. */
  private def byteFallbackChain(numMerges: Int, encodeFrom: String): String = {
    val plainAlpha = "alpha AS (SELECT DISTINCT unnest(syms) AS piece FROM w0)"
    val chain = bpeChainCtes(numMerges, encodeFrom = encodeFrom)
    require(chain.contains(plainAlpha), "alpha CTE shape changed")
    chain.replace(plainAlpha,
      """alpha AS (SELECT DISTINCT unnest(syms) AS piece FROM w0
        |          UNION
        |          SELECT '<0x' || printf('%02X', CAST(i AS INTEGER)) || '>'
        |          FROM range(0, 256) t(i))""".stripMargin)
  }

  val q131 = Q(
    "q131_bpe_byte_fallback",
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' 世界 😀tok'
       |  FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL),
       |${byteFallbackChain(30, "corpus")},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM corpus),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |expd AS (SELECT fl.doc_id, fl.tp, fl.sp,
       |                (v.vid IS NULL) AS was_unk,
       |                CASE WHEN v.vid IS NOT NULL THEN [fl.piece]
       |                     ELSE list_transform(
       |                       range(octet_length(encode(fl.piece))),
       |                       i -> '<0x' || substr(hex(encode(fl.piece)),
       |                              CAST(2 * i + 1 AS INTEGER), 2) || '>')
       |                END AS outp
       |         FROM flat fl LEFT JOIN voc v ON v.piece = fl.piece),
       |unkc AS (SELECT doc_id,
       |                CAST(COALESCE(SUM(CASE WHEN was_unk THEN 1 ELSE 0
       |                  END), 0) AS BIGINT) AS n_unk
       |         FROM expd GROUP BY doc_id),
       |flat2 AS (SELECT doc_id, tp, sp, unnest(outp) AS piece,
       |                 unnest(range(1, len(outp) + 1)) AS bp FROM expd),
       |outp AS (SELECT doc_id,
       |                CAST(row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tp, sp, bp) - 1 AS BIGINT) AS pos,
       |                piece FROM flat2)
       |SELECT o.doc_id, o.pos, o.piece, v.vid AS token_id, u.n_unk
       |FROM outp o JOIN voc v ON v.piece = o.piece
       |JOIN unkc u ON u.doc_id = o.doc_id
       |ORDER BY o.doc_id, o.pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val planted = docs
      .filter(col("doc_id") % 7 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" 世界 😀tok")).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(planted)
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges, byteFallback = true)
    Bpe.encode(corpus, "doc_id", "text", merges, vocab, byteFallback = true)
      .select(col("doc_id"), col("n_unk"),
        posexplode(arrays_zip(col("pieces"), col("token_ids"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.pieces").as("piece"), col("col.token_ids").as("token_id"),
        col("n_unk"))
      .orderBy("doc_id", "pos")
  }

  /** q132: PER-PACK CONCATENATED TOKEN STREAMS
    * ([[Packing.packTokenStreams]]) — the tensor-shaped loader artifact
    * q127 stopped short of: q127's BPE-budgeted global pack ASSIGNMENT
    * (same epoch shuffle seed 7 / 8 shards, weight = n_pieces + 1
    * counting each document's trailing separator, budget 700) with every
    * pack's actual token-id stream materialized — member documents
    * concatenated in the global (shard, ek, doc_id) order, each followed
    * by the separator id (one past the vocabulary: |alphabet| +
    * |trained merges|). The oracle replays training, segmentation, ids,
    * the shuffle key, the global prefix sum AND the concatenation,
    * position by position. */
  val q132 = Q(
    "q132_bpe_pack_streams",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |docids AS (SELECT f.doc_id, v.vid,
       |                  row_number() OVER (PARTITION BY f.doc_id
       |                    ORDER BY f.tp, f.sp) AS dp
       |           FROM flat f JOIN voc v ON v.piece = f.piece),
       |$cntCte,
       |sepv AS (SELECT na.n + (SELECT CAST(COUNT(*) AS BIGINT) FROM mg)
       |           AS sep FROM na),
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
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
       |         SELECT p.doc_id, (SELECT sep FROM sepv) AS vid,
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
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges)
    // token_ids-only encode (emitPieces = false: the opaque encoder
    // defeats column pruning, so the audit strings would otherwise be
    // built and serialized just to be dropped), fed to the shuffle
    // directly — the former docs⋈enc re-attach joined the encoder's own
    // output back to its input ids (enc.doc_id ⊆ docs.doc_id, doc_id
    // unique), i.e. an identity join that broadcast the whole encoded
    // corpus and re-scanned the table
    val enc = Bpe.encode(docs, "doc_id", "text", merges, vocab,
      emitPieces = false)
    val e = Mixing.epochShuffle(enc.select(col("doc_id"),
      col("token_ids")), "doc_id", seed = 7L, nShards = 8)
    Packing.packTokenStreams(e, "shard", "pos", "token_ids",
      budget = 700L, sepId = vocab.length.toLong)
      .select(col("pack_id"), posexplode(col("token_ids")))
      .select(col("pack_id"), col("pos").cast("long").as("pos"),
        col("col").as("token_id"))
      .orderBy("pack_id", "pos")
  }

  /** q133: BEST-FIT-DECREASING pack assignment
    * ([[Packing.packBestFit]]) — the padding-efficiency policy: per
    * shard (q127's epoch shuffle), documents in weight-DESC/id-ASC
    * order each land in the FULLEST open pack that still fits (ties:
    * lowest pack id), new pack otherwise. The oracle replays the
    * sequential heuristic STEP BY STEP: a recursive CTE whose working
    * row per shard carries the open-pack state (a struct list) and the
    * accumulated assignments, one recursion step per document — the
    * q110/q126 state-threading discipline applied to bin packing. The
    * `x.u < budget` guard twins the Scala tier's exactly-full-packs-
    * leave-the-map rule (reachable only by weight-0 documents). */
  val q133 = Q(
    "q133_bestfit_packs",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |$cntCte,
       |k AS (SELECT d.doc_id, c.n_pieces AS w,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
       |docs2 AS (SELECT doc_id, w, (ek * 8) // 2147483647 AS shard,
       |                 row_number() OVER (
       |                   PARTITION BY (ek * 8) // 2147483647
       |                   ORDER BY w DESC, doc_id ASC) AS rn
       |          FROM k),
       |bfd AS (
       |  SELECT shard, 0 AS i,
       |         CAST([] AS STRUCT(p BIGINT, u BIGINT)[]) AS bins,
       |         CAST([] AS STRUCT(id BIGINT, p BIGINT)[]) AS asg
       |  FROM (SELECT DISTINCT shard FROM docs2)
       |  UNION ALL
       |  SELECT shard, i,
       |         CASE WHEN newp
       |              THEN list_append(bins, {'p': np, 'u': w})
       |              ELSE list_transform(bins,
       |                x -> CASE WHEN x.p = cp
       |                          THEN {'p': x.p, 'u': x.u + w}
       |                          ELSE x END) END AS bins,
       |         list_append(asg,
       |           {'id': did, 'p': CASE WHEN newp THEN np ELSE cp END})
       |           AS asg
       |  FROM (
       |    SELECT shard, i, bins, asg, did, w, np,
       |           (NOT (w <= 700 AND len(fl) > 0)) AS newp,
       |           CASE WHEN len(fl) > 0 THEN
       |             list_min(list_transform(
       |               list_filter(fl, x -> x.u = mx), x -> x.p))
       |           ELSE CAST(-1 AS BIGINT) END AS cp
       |    FROM (
       |      SELECT shard, i, bins, asg, did, w, np, fl,
       |             list_max(list_transform(fl, x -> x.u)) AS mx
       |      FROM (
       |        SELECT b.shard, b.i + 1 AS i, b.bins, b.asg,
       |               d.doc_id AS did, d.w,
       |               CAST(len(b.bins) AS BIGINT) AS np,
       |               list_filter(b.bins,
       |                 x -> x.u + d.w <= 700 AND x.u < 700) AS fl
       |        FROM bfd b JOIN docs2 d
       |          ON d.shard = b.shard AND d.rn = b.i + 1)))),
       |fin2 AS (SELECT shard, asg FROM (
       |           SELECT shard, asg,
       |                  row_number() OVER (PARTITION BY shard
       |                    ORDER BY i DESC) AS r
       |           FROM bfd) WHERE r = 1),
       |outa AS (SELECT shard, unnest(asg) AS a FROM fin2)
       |SELECT d.shard, o.a.id AS doc_id, d.w AS n_tok,
       |       CAST(o.a.p AS BIGINT) AS pack_id
       |FROM outa o JOIN docs2 d ON d.shard = o.shard AND d.doc_id = o.a.id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val counts = Bpe.pieceCounts(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_pieces").as("n_tok"))
    val e = Mixing.epochShuffle(
      docs.select("doc_id").join(counts, Seq("doc_id")),
      "doc_id", seed = 7L, nShards = 8)
    Packing.packBestFit(e, "shard", "doc_id", "n_tok", budget = 700L)
      .select(col("shard"), col("doc_id"), col("n_tok"), col("pack_id"))
      .orderBy("doc_id")
  }

  /** q134: DECODE ROUNDTRIP under byte fallback ([[Bpe.decode]] —
    * encode's inverse): q131's planted corpus (every seventh document
    * re-planted with CJK + emoji words no training document contains)
    * encodes under the frozen byte-fallback vocabulary, then DECODES
    * back — `<0xNN>` byte-piece runs reassembled as UTF-8 — and the
    * oracle asserts the roundtrip CONTRACT itself: decode ∘ encode
    * equals the whitespace-normalized text (tokens joined by single
    * spaces), with zero invalid sequences, for every document
    * including the planted ones whose CJK/emoji words exist ONLY as
    * byte pieces. A decoder bug anywhere — byte reassembly, word
    * boundaries, piece lookup — breaks the hash. */
  val q134 = Q(
    "q134_bpe_decode_roundtrip",
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
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges, byteFallback = true)
    // decode reads only (doc_id, token_ids): skip building the audit
    // piece strings the opaque encoder cannot prune (emitPieces = false)
    val enc = Bpe.encode(corpus, "doc_id", "text", merges, vocab,
      byteFallback = true, emitPieces = false)
    Bpe.decode(enc, "doc_id", "token_ids", vocab)
      .select(col("doc_id"), col("text").as("text_rt"), col("n_invalid"))
      .orderBy("doc_id")
  }

  /** q135: PER-PACK DOCUMENT BOUNDARY OFFSETS — q132's pack streams
    * with the sample-boundary artifact materialized: each pack's member
    * doc_ids and their START offsets within `token_ids` (the
    * attention-mask input a trainer otherwise re-derives by scanning
    * for separators). The oracle replays q132's whole chain — training,
    * segmentation, the shuffle key, the global prefix sum — then the
    * WITHIN-pack exclusive prefix sum of member weights (n_pieces + 1,
    * the separator counted), which IS the offset arithmetic
    * [[Packing.packTokenStreams]]' fold computes over the collected
    * member list; every (pack, member) row hash-checked. */
  val q135 = Q(
    "q135_bpe_pack_offsets",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |$cntCte,
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard, w
       |      FROM k),
       |ww AS (SELECT doc_id, ek, shard, w,
       |         SUM(w) OVER (ORDER BY shard, ek, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |       FROM s),
       |pk AS (SELECT doc_id, ek, shard, w,
       |              CAST((cum - w) // 700 AS BIGINT) AS pack_id FROM ww),
       |offs AS (SELECT pack_id, doc_id,
       |                row_number() OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id) - 1 AS idx,
       |                SUM(w) OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |                  - w AS off
       |         FROM pk)
       |SELECT pack_id, CAST(idx AS BIGINT) AS idx, doc_id,
       |       CAST(off AS BIGINT) AS off
       |FROM offs ORDER BY pack_id, idx""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges)
    // token_ids-only encode (emitPieces = false: the opaque encoder
    // defeats column pruning, so the audit strings would otherwise be
    // built and serialized just to be dropped), fed to the shuffle
    // directly — the former docs⋈enc re-attach joined the encoder's own
    // output back to its input ids (enc.doc_id ⊆ docs.doc_id, doc_id
    // unique), i.e. an identity join that broadcast the whole encoded
    // corpus and re-scanned the table
    val enc = Bpe.encode(docs, "doc_id", "text", merges, vocab,
      emitPieces = false)
    val e = Mixing.epochShuffle(enc.select(col("doc_id"),
      col("token_ids")), "doc_id", seed = 7L, nShards = 8)
    Packing.packTokenStreams(e, "shard", "pos", "token_ids",
      budget = 700L, sepId = vocab.length.toLong,
      docIdCol = Some("doc_id"))
      .select(col("pack_id"),
        posexplode(arrays_zip(col("doc_ids"), col("doc_offsets"))))
      .select(col("pack_id"), col("pos").cast("long").as("idx"),
        col("col.doc_ids").as("doc_id"), col("col.doc_offsets").as("off"))
      .orderBy("pack_id", "idx")
  }

  /** DuckDB twin of [[Bpe.PreTok.CpClass]]'s split: whitespace tokens
    * further cut into maximal letter/number/other code-point-class runs
    * (RE2's `\p{L}`/`\p{N}` are the same Unicode general categories the
    * JVM split matches). */
  private[queries] val sqlToksCp: String =
    """flatten(list_transform(string_split_regex(trim(text), '\s+'),
      |  w -> regexp_extract_all(w,
      |         '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}]+')))"""
      .stripMargin.replace("\n", " ")

  /** q136: CP-CLASS PRE-TOKENIZED BPE ([[Bpe.PreTok.CpClass]] — the
    * GPT-2-style letter/number/punct run pre-split, opt-in beside the
    * whitespace default): every fifth document is re-planted with a
    * mixed-script word (`v<id>世界算法7!`) that whitespace tokenization
    * would keep as ONE unique word — under CpClass it splits into runs,
    * the recurring CJK run accumulates corpus frequency, and training +
    * encoding operate on runs. The oracle replays the PRE-SPLIT itself
    * (the `regexp_extract_all` twin of the JVM split) plus the whole
    * q126 chain — training rounds, greedy segmentation, stable ids,
    * per-document flatten — over the run vocabulary; every token
    * position hash-checked. q126/q131/q132 stay on the whitespace
    * default, untouched. */
  val q136 = Q(
    "q136_bpe_cpclass_encode",
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' v' || CAST(doc_id AS VARCHAR)
       |           || '世界算法7!'
       |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL),
       |${bpeChainCtes(30, encodeFrom = "corpus", trainFrom = "corpus",
          toks = sqlToksCp)},
       |tokq AS (SELECT doc_id, unnest($sqlToksCp) AS word,
       |                unnest(range(1, len($sqlToksCp) + 1)) AS tp
       |         FROM corpus),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |outp AS (SELECT doc_id,
       |                CAST(row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tp, sp) - 1 AS BIGINT) AS pos,
       |                piece FROM flat)
       |SELECT o.doc_id, o.pos, o.piece, v.vid AS token_id
       |FROM outp o JOIN voc v ON v.piece = o.piece
       |ORDER BY o.doc_id, o.pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val planted = docs
      .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" v"), col("doc_id").cast("string"),
          lit("世界算法7!")).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(planted)
    val cp = Bpe.PreTok.CpClass
    val (merges, alphabet) = Bpe.trainAndAlphabet(corpus, "text",
      numMerges = 30, preTok = cp)
    val vocab = Bpe.vocabOf(alphabet, merges)
    Bpe.encode(corpus, "doc_id", "text", merges, vocab, preTok = cp)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("pieces"), col("token_ids"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.pieces").as("piece"), col("col.token_ids").as("token_id"))
      .orderBy("doc_id", "pos")
  }

  /** q137: DECODE ROUNDTRIP under CP-CLASS pre-tokenization AND byte
    * fallback together — the two newest encode regimes composed: the
    * vocabulary trains on the BASE corpus under [[Bpe.PreTok.CpClass]]
    * (its alphabet has no CJK) with the byte pieces folded in, the
    * PLANTED corpus (q136's mixed-script words) encodes under it —
    * every CJK run decomposes to UTF-8 byte pieces — and decode
    * reassembles. The oracle is the policy's documented normal form:
    * the code-point-class RUNS joined by single spaces (`</w>` lands
    * after every run, so "v7!" decodes "v 7 !" — the boundary trade
    * [[Bpe.PreTok]] documents), zero invalid sequences, every document
    * hash-checked. */
  val q137 = Q(
    "q137_bpe_cpclass_decode",
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' v' || CAST(doc_id AS VARCHAR)
       |           || '世界算法7!'
       |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL)
       |SELECT doc_id,
       |       array_to_string($sqlToksCp, ' ') AS text_rt,
       |       CAST(0 AS BIGINT) AS n_invalid
       |FROM corpus WHERE text IS NOT NULL
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val planted = docs
      .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" v"), col("doc_id").cast("string"),
          lit("世界算法7!")).as("text"))
    val corpus = docs.select("doc_id", "text").unionAll(planted)
    val cp = Bpe.PreTok.CpClass
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30, preTok = cp)
    val vocab = Bpe.vocabOf(alphabet, merges, byteFallback = true)
    // decode reads only (doc_id, token_ids) — emitPieces = false as q134
    val enc = Bpe.encode(corpus, "doc_id", "text", merges, vocab,
      byteFallback = true, preTok = cp, emitPieces = false)
    Bpe.decode(enc, "doc_id", "token_ids", vocab)
      .select(col("doc_id"), col("text").as("text_rt"), col("n_invalid"))
      .orderBy("doc_id")
  }

  /** q139: RIGHT-TO-BE-FORGOTTEN over materialized pack streams
    * ([[Packing.forgetPacks]]) — q132's packs with every seventh-ish
    * document (`doc_id % 7 = 3`) DELETED after the fact: all its token
    * positions (separator included) are masked to the pad id (one past
    * the separator slot), everything else — pack ids, positions, other
    * members' tokens — BYTE-IDENTICAL to q132 (the shape-stable
    * contract: a deletion event must not shift sample boundaries in
    * shards a trainer already indexed). The oracle replays q132's whole
    * chain and applies the mask per position via the member identity the
    * concatenation already tracks; a mask that leaks one position (or
    * bleeds into a neighbor member) breaks the hash. */
  val q139 = Q(
    "q139_pack_forget",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |docids AS (SELECT f.doc_id, v.vid,
       |                  row_number() OVER (PARTITION BY f.doc_id
       |                    ORDER BY f.tp, f.sp) AS dp
       |           FROM flat f JOIN voc v ON v.piece = f.piece),
       |$cntCte,
       |sepv AS (SELECT na.n + (SELECT CAST(COUNT(*) AS BIGINT) FROM mg)
       |           AS sep FROM na),
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
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
       |         SELECT p.doc_id, (SELECT sep FROM sepv) AS vid,
       |                p.w AS dp
       |         FROM pk p),
       |expl AS (SELECT p.pack_id, p.shard, p.ek, t.doc_id, t.dp, t.vid
       |         FROM tok2 t JOIN pk p USING (doc_id)),
       |outp AS (SELECT pack_id,
       |                CAST(row_number() OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id, dp) - 1 AS BIGINT)
       |                  AS pos,
       |                CASE WHEN doc_id % 7 = 3
       |                     THEN (SELECT sep FROM sepv) + 1
       |                     ELSE vid END AS token_id FROM expl)
       |SELECT pack_id, pos, token_id FROM outp
       |ORDER BY pack_id, pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges)
    // token_ids-only encode (emitPieces = false: the opaque encoder
    // defeats column pruning, so the audit strings would otherwise be
    // built and serialized just to be dropped), fed to the shuffle
    // directly — the former docs⋈enc re-attach joined the encoder's own
    // output back to its input ids (enc.doc_id ⊆ docs.doc_id, doc_id
    // unique), i.e. an identity join that broadcast the whole encoded
    // corpus and re-scanned the table
    val enc = Bpe.encode(docs, "doc_id", "text", merges, vocab,
      emitPieces = false)
    val e = Mixing.epochShuffle(enc.select(col("doc_id"),
      col("token_ids")), "doc_id", seed = 7L, nShards = 8)
    // the pack artifact is MATERIALIZED in production (training files on
    // disk); the checkpoint stands in for that file read — forgetPacks /
    // repackForgotten reference their input twice (member probe + mask)
    val packs = Packing.packTokenStreams(e, "shard", "pos", "token_ids",
      budget = 700L, sepId = vocab.length.toLong,
      docIdCol = Some("doc_id")).localCheckpoint(true)
    val dead = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    // posexplode_outer, not posexplode: InferFiltersFromGenerate only
    // fires on non-outer explodes, and its size()>0/isnotnull filter
    // would be pushed through the projection and re-expand the full
    // per-token mask transform, evaluating it 3x per pack. Packs are
    // never empty (every member contributes >= 1 token + separator and
    // the mask preserves length), so dropping the null row the outer
    // variant emits for an empty array restores posexplode's row set.
    Packing.forgetPacks(packs, dead, "doc_id",
      padId = vocab.length.toLong + 1L)
      .select(col("pack_id"), posexplode_outer(col("token_ids")))
      .filter(col("pos").isNotNull)
      .select(col("pack_id"), col("pos").cast("long").as("pos"),
        col("col").as("token_id"))
      .orderBy("pack_id", "pos")
  }

  /** q141: PACK REPAIR after deletion ([[Packing.repackForgotten]] —
    * [[Packing.forgetPacks]]'s space-reclaiming sibling, the
    * before-training variant): q139's deletion set REMOVED from the
    * packs instead of masked — surviving members re-concatenate in the
    * original global order under their ORIGINAL pack ids, fully-deleted
    * packs vanish. The oracle replays q132's chain minus the deleted
    * documents' token rows, with positions renumbered per pack — an
    * off-by-one in the slice re-concatenation or a shifted survivor
    * breaks the hash. */
  val q141 = Q(
    "q141_pack_repair",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |docids AS (SELECT f.doc_id, v.vid,
       |                  row_number() OVER (PARTITION BY f.doc_id
       |                    ORDER BY f.tp, f.sp) AS dp
       |           FROM flat f JOIN voc v ON v.piece = f.piece),
       |$cntCte,
       |sepv AS (SELECT na.n + (SELECT CAST(COUNT(*) AS BIGINT) FROM mg)
       |           AS sep FROM na),
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
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
       |         SELECT p.doc_id, (SELECT sep FROM sepv) AS vid,
       |                p.w AS dp
       |         FROM pk p),
       |expl AS (SELECT p.pack_id, p.shard, p.ek, t.doc_id, t.dp, t.vid
       |         FROM tok2 t JOIN pk p USING (doc_id)),
       |outp AS (SELECT pack_id,
       |                CAST(row_number() OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id, dp) - 1 AS BIGINT)
       |                  AS pos,
       |                vid AS token_id
       |         FROM expl WHERE doc_id % 7 <> 3)
       |SELECT pack_id, pos, token_id FROM outp
       |ORDER BY pack_id, pos""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges)
    // token_ids-only encode (emitPieces = false: the opaque encoder
    // defeats column pruning, so the audit strings would otherwise be
    // built and serialized just to be dropped), fed to the shuffle
    // directly — the former docs⋈enc re-attach joined the encoder's own
    // output back to its input ids (enc.doc_id ⊆ docs.doc_id, doc_id
    // unique), i.e. an identity join that broadcast the whole encoded
    // corpus and re-scanned the table
    val enc = Bpe.encode(docs, "doc_id", "text", merges, vocab,
      emitPieces = false)
    val e = Mixing.epochShuffle(enc.select(col("doc_id"),
      col("token_ids")), "doc_id", seed = 7L, nShards = 8)
    // the pack artifact is MATERIALIZED in production (training files on
    // disk); the checkpoint stands in for that file read — forgetPacks /
    // repackForgotten reference their input twice (member probe + mask)
    val packs = Packing.packTokenStreams(e, "shard", "pos", "token_ids",
      budget = 700L, sepId = vocab.length.toLong,
      docIdCol = Some("doc_id")).localCheckpoint(true)
    val dead = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    // posexplode_outer + null filter for the same reason as q139: the
    // inferred generate filter would re-expand the slice/flatten rebuild
    // 3x per pack (surviving packs are non-empty by the size(_fp_alive)
    // > 0 semantic filter, so the row set is identical)
    Packing.repackForgotten(packs, dead, "doc_id")
      .select(col("pack_id"), posexplode_outer(col("token_ids")))
      .filter(col("pos").isNotNull)
      .select(col("pack_id"), col("pos").cast("long").as("pos"),
        col("col").as("token_id"))
      .orderBy("pack_id", "pos")
  }

  /** q142: TOKENIZER FERTILITY by language ([[Bpe.fertility]]) — the
    * pieces-per-1000-chars (and pieces-per-word milli) each language
    * slice pays under the frozen merge table, exact-integer scaled
    * division. The oracle replays the whole segmentation chain (the
    * q80/q127 cnt CTE) grouped by `lang` with HUGEINT-safe sums — the
    * monitored form of q136's multilingual finding: a language near the
    * byte-fallback floor is the retrain-with-CpClass signal. */
  val q142 = Q(
    "q142_bpe_fertility",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |$cntCte,
       |g AS (SELECT d.lang, c.n_words, c.n_pieces,
       |             CAST(length(d.text) AS BIGINT) AS nc
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id)
       |SELECT lang,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(SUM(nc) AS BIGINT) AS n_chars,
       |       CAST(SUM(n_pieces) * 1000 // SUM(nc) AS BIGINT)
       |         AS pieces_per_kchar,
       |       CAST(SUM(n_pieces) * 1000 // SUM(n_words) AS BIGINT)
       |         AS pieces_per_word_milli
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val merges = Bpe.train(docs, "text", numMerges = 30)
    Bpe.fertility(docs, "doc_id", "text", "lang", merges)
      .orderBy("lang")
  }

  /** q159: CHECKPOINT-RESUME attribution ([[Packing.locate]]) — the
    * training-ops read back from a trainer's global token offset to
    * pack coordinates: q132's materialized pack streams, 8 planted
    * checkpoint offsets (`step × total // 8` — the stream's own
    * eighths), each located to (pack, position-in-pack, the document
    * being consumed, the token id under the cursor). The oracle replays
    * q132's whole chain, numbers the global stream in artifact order
    * (`pack_id`, `pos`), derives the same planted offsets from its own
    * total and joins them back — an off-by-one in the prefix sum, a
    * member attributed past its separator, or a drifted global order
    * breaks the hash. */
  val q159 = Q(
    "q159_resume_locate",
    s"""WITH RECURSIVE
       |${bpeChainCtes(30)},
       |tokq AS (SELECT doc_id, unnest($sqlToks) AS word,
       |                unnest(range(1, len($sqlToks) + 1)) AS tp
       |         FROM documents),
       |pcs AS (SELECT t.doc_id, t.tp, f.syms
       |        FROM tokq t JOIN fin f USING (word)),
       |flat AS (SELECT doc_id, tp, unnest(syms) AS piece,
       |                unnest(range(1, len(syms) + 1)) AS sp FROM pcs),
       |docids AS (SELECT f.doc_id, v.vid,
       |                  row_number() OVER (PARTITION BY f.doc_id
       |                    ORDER BY f.tp, f.sp) AS dp
       |           FROM flat f JOIN voc v ON v.piece = f.piece),
       |$cntCte,
       |sepv AS (SELECT na.n + (SELECT CAST(COUNT(*) AS BIGINT) FROM mg)
       |           AS sep FROM na),
       |k AS (SELECT d.doc_id, c.n_pieces + 1 AS w,
       |             (${sqlHash("'7:' || CAST(d.doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
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
       |         SELECT p.doc_id, (SELECT sep FROM sepv) AS vid,
       |                p.w AS dp
       |         FROM pk p),
       |expl AS (SELECT p.pack_id, p.shard, p.ek, t.doc_id, t.dp, t.vid
       |         FROM tok2 t JOIN pk p USING (doc_id)),
       |outp AS (SELECT pack_id,
       |                CAST(row_number() OVER (PARTITION BY pack_id
       |                  ORDER BY shard, ek, doc_id, dp) - 1 AS BIGINT)
       |                  AS pos,
       |                doc_id, vid AS token_id FROM expl),
       |gstr AS (SELECT pack_id, pos, doc_id, token_id,
       |                CAST(row_number() OVER (ORDER BY pack_id, pos)
       |                  - 1 AS BIGINT) AS goff
       |         FROM outp),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gstr),
       |stepsq AS (SELECT CAST(k AS BIGINT) AS step,
       |                  (CAST(k AS BIGINT) * n) // 8 AS goff
       |           FROM range(8) t(k), tot)
       |SELECT st.step, st.goff AS global_off, g.pack_id,
       |       g.pos AS pack_off, g.doc_id, g.token_id
       |FROM stepsq st JOIN gstr g USING (goff)
       |ORDER BY step""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, alphabet) = Bpe.trainAndAlphabet(docs, "text",
      numMerges = 30)
    val vocab = Bpe.vocabOf(alphabet, merges)
    // token_ids-only encode (emitPieces = false: the opaque encoder
    // defeats column pruning, so the audit strings would otherwise be
    // built and serialized just to be dropped), fed to the shuffle
    // directly — the former docs⋈enc re-attach joined the encoder's own
    // output back to its input ids (enc.doc_id ⊆ docs.doc_id, doc_id
    // unique), i.e. an identity join that broadcast the whole encoded
    // corpus and re-scanned the table
    val enc = Bpe.encode(docs, "doc_id", "text", merges, vocab,
      emitPieces = false)
    val e = Mixing.epochShuffle(enc.select(col("doc_id"),
      col("token_ids")), "doc_id", seed = 7L, nShards = 8)
    // the pack artifact is MATERIALIZED in production; the checkpoint
    // stands in for that file read (the q139 discipline) — locate
    // probes it three times (total, range check, the join)
    val packs = Packing.packTokenStreams(e, "shard", "pos", "token_ids",
      budget = 700L, sepId = vocab.length.toLong,
      docIdCol = Some("doc_id")).localCheckpoint(true)
    val total = packs
      .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
    val steps = s.range(8).select(col("id").as("step"),
      expr(s"id * $total div 8").as("goff"))
    Packing.locate(packs, steps, "step", "goff").orderBy("step")
  }

  val all: Seq[Q] = Seq(q126, q127, q129, q131, q132, q133, q134, q135,
    q136, q137, q139, q141, q142, q159)
}
