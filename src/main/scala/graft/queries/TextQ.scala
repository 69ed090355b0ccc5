package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis._
import graft.operators.{Dedup, Mixing, Redact, Urls}

/** Text-analysis + deduplication queries over `documents` — the
  * training-data-pipeline operator family: token statistics, exact dedup,
  * n-gram Jaccard near-dup pairs, language-ID heuristic, document
  * fingerprinting, MinHash+LSH, SimHash, and quality scoring.
  *
  * The repetitive oracle SQL (16 MinHash aggregates, 32 SimHash bit sums,
  * the language-ID CASE chain) is GENERATED from the same constants the
  * Spark operators use ([[TextAnalysis]]), so the two sides cannot drift.
  */
object TextQ {

  /** DuckDB twin of [[TextAnalysis.strHash]] — `(?s)` so '.' also matches
    * newlines, like PolyHash's every-code-point loop. */
  private[queries] def sqlHashM(c: String, mult: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
    s"list_transform(regexp_extract_all($c, '(?s).'), ch -> CAST(unicode(ch) AS BIGINT))), " +
    s"(a, b) -> (a * $mult + b) % $P)"

  private[queries] def sqlHash(c: String): String = sqlHashM(c, 31)

  /** DuckDB twin of [[graft.functions.WideWindowHashes]]' 62-bit key:
    * two independent 31-bit polynomials (multipliers 31 and 37) combined
    * as `h31 * P + h37` — max value < 2^62, exact in BIGINT. */
  private def sqlWideHash(c: String): String =
    s"(${sqlHashM(c, 31)} * $P + ${sqlHashM(c, 37)})"

  private[queries] val sqlToks = """string_split_regex(trim(text), '\s+')"""

  /** Shared CTE prefix: tokens + distinct 3-gram shingles (with source for
    * blocked variants). DuckDB lists are 1-based; range(1, len-1) is empty
    * for < 3 tokens, matching the Spark guard. */
  private def shCte(withSource: Boolean): String = {
    val src = if (withSource) ", source" else ""
    s"""toks AS (SELECT doc_id$src, $sqlToks AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id$src, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
       |       FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i))""".stripMargin
  }

  /** q20: corpus token statistics per language — token counting (whitespace
    * tokenizer) + grouped aggregation. */
  val q20 = Q(
    "q20_token_stats",
    s"""SELECT lang, n_docs, total_tokens, max_tokens, n_sources,
       |       CAST(total_tokens AS DOUBLE) / n_docs AS avg_tokens
       |FROM (
       |  SELECT lang, COUNT(*) AS n_docs,
       |         CAST(SUM(len($sqlToks)) AS BIGINT) AS total_tokens,
       |         CAST(MAX(len($sqlToks)) AS BIGINT) AS max_tokens,
       |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |  FROM documents GROUP BY lang
       |)
       |ORDER BY lang""".stripMargin) { (s, dir) =>
    val nTok = graft.functions.TokenStats(col("text")).getField("n_tokens")
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(nTok).as("total_tokens"),
        max(nTok).as("max_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .withColumn("avg_tokens", col("total_tokens").cast("double") / col("n_docs"))
      .orderBy("lang")
  }

  /** q21: exact deduplication on normalized text (hash-groupBy; SURVEY.md
    * north-star dedup #1). */
  val q21 = Q(
    "q21_exact_dedup",
    """SELECT canonical_id, n_copies FROM (
      |  SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
      |  FROM documents
      |  GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |                               ' +', ' ', 'g'))
      |)
      |ORDER BY canonical_id""".stripMargin) { (s, dir) =>
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("canonical_id")
  }

  /** q22: all-pairs n-gram Jaccard within source blocks, threshold 0.3 —
    * integer-exact threshold compare, double jaccard derived from the same
    * integers. */
  val q22 = Q(
    "q22_ngram_jaccard",
    s"""WITH ${shCte(withSource = true)},
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
       |          FROM sh a JOIN sh b
       |            ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
       |       CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
       |FROM inter
       |JOIN sizes sa ON id_a = sa.doc_id
       |JOIN sizes sb ON id_b = sb.doc_id
       |WHERE common * 1000 >= 300 * (sa.sz + sb.sz - common)
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
      blockCols = Seq("source"), thresholdMilli = 300)
      .orderBy("id_a", "id_b")
  }

  /** q23: language-ID heuristic — stopword-hit argmax with lexicographic
    * tie-break, 'und' when nothing hits; reported as a confusion matrix
    * against the labeled lang. (The corpus is synthetic English word-soup,
    * so the matrix mostly lands on en/und — the operator is what's tested.)
    */
  val q23 = {
    val langs = Stopwords.map(_._1)
    val sqlScores = Stopwords.map { case (l, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($sqlToks, w -> w IN ($list))) AS s_$l"
    }.mkString(",\n         ")
    val zero = langs.map(l => s"s_$l = 0").mkString(" AND ")
    val argmax = langs.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      if (rest.isEmpty) s"ELSE '$l'"
      else s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
    }.mkString("\n              ")
    Q(
      "q23_lang_id",
      s"""SELECT actual, predicted, COUNT(*) AS n FROM (
         |  SELECT lang AS actual,
         |         CASE WHEN $zero THEN 'und'
         |              $argmax END AS predicted
         |  FROM (
         |    SELECT lang,
         |         $sqlScores
         |    FROM documents
         |  )
         |)
         |GROUP BY actual, predicted
         |ORDER BY actual, predicted""".stripMargin) { (s, dir) =>
      graft.functions.LangScores.ensureRegistered(s)
      val ls = graft.functions.LangScores(col("text"))
      val scored = Tables.documents(s, dir)
        .select(col("lang").as("actual") +: Stopwords.map { case (l, _) =>
          ls.getField(s"s_$l").as(s"s_$l")
        }: _*)
      val anyHit = langs.map(l => col(s"s_$l") > 0).reduce(_ || _)
      val argmaxCol = langs.zipWithIndex.foldRight(lit(langs.last)) {
        case ((l, i), elseCol) =>
          val rest = langs.drop(i + 1)
          if (rest.isEmpty) elseCol
          else when(rest.map(r => col(s"s_$l") >= col(s"s_$r")).reduce(_ && _), lit(l))
            .otherwise(elseCol)
      }
      scored
        .withColumn("predicted", when(!anyHit, lit("und")).otherwise(argmaxCol))
        .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("actual", "predicted")
    }
  }

  /** q24: document fingerprinting — deterministic 31-polynomial rolling hash
    * over the full text (SURVEY.md north-star; the expression-index analog).
    * The published value is the narrow 31-bit hash (the operator's
    * contract); a consumer treating fingerprints as corpus-scale IDENTITY
    * (exact dedup by fp) is in the global-key regime and should derive
    * them with [[graft.functions.TextAnalysis.wideStrHash]] instead — see
    * the hash-width policy in docs/SCALE.md. */
  val q24 = Q(
    "q24_fingerprint",
    s"""SELECT doc_id, ${sqlHash("text")} AS fp,
       |       CAST(length(text) AS BIGINT) AS len, n_chars
       |FROM documents
       |WHERE doc_id % 11 = 0
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), strHash(col("text")).as("fp"),
        length(col("text")).cast("long").as("len"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q25: MinHash + LSH near-dup pairs (threshold 0.5): 16-min signature in
    * one groupBy, 4×4 banding, bucket self-join for candidates, exact
    * Jaccard verify on candidates only. The oracle re-derives the entire
    * pipeline from the same hash constants. */
  /** Shared CTE chain ending in a `pairs` relation: the full MinHash+LSH
    * pipeline (used by q25 and as the edge set of q41's clustering). */
  private def minhashPairsCtes(thresholdMilli: Int): String = {
    val sigAggs = (0 until 16).map(k =>
      s"MIN((${MinhashA(k)} * h + ${MinhashB(k)}) % $P) AS sig_$k")
      .mkString(",\n              ")
    val sigCols = (0 until 16).map(k => s"sig_$k").mkString(", ")
    val sigEq = (0 until 16).map(k => s"s.sig_$k = gp.sig_$k")
      .mkString(" AND ")
    val bandSelects = (0 until 4).map { b =>
      val key = (0 until 4).map(r => s"CAST(sig_${b * 4 + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT rep AS doc_id, $b AS band, $key AS bkey FROM grp"
    }.mkString("\n  UNION ALL\n  ")
    s"""${shCte(withSource = false)},
       |gh AS (SELECT doc_id, ${sqlHash("g")} AS h FROM sh),
       |sig AS (SELECT doc_id,
       |              $sigAggs
       |        FROM gh GROUP BY doc_id),
       |grp AS (SELECT $sigCols, MIN(doc_id) AS rep
       |        FROM sig GROUP BY $sigCols),
       |bands AS (
       |  $bandSelects
       |),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |         UNION
       |         SELECT gp.rep AS id_a, s.doc_id AS id_b
       |         FROM sig s JOIN grp gp ON $sigEq
       |         WHERE s.doc_id <> gp.rep),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |common AS (SELECT c.id_a, c.id_b, COUNT(*) AS common
       |           FROM cand c
       |           JOIN sh a ON a.doc_id = c.id_a
       |           JOIN sh b ON b.doc_id = c.id_b AND b.g = a.g
       |           GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
       |                 CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
       |          FROM common
       |          JOIN sizes sa ON id_a = sa.doc_id
       |          JOIN sizes sb ON id_b = sb.doc_id
       |          WHERE common * 1000 >= $thresholdMilli * (sa.sz + sb.sz - common))""".stripMargin
  }

  val q25 = Q(
    "q25_minhash_lsh",
    s"""WITH ${minhashPairsCtes(500)}
       |SELECT id_a, id_b, common, sz_a, sz_b, jaccard FROM pairs
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
      thresholdMilli = 500)
      .orderBy("id_a", "id_b")
  }

  /** q41: near-dup clusters — connected components over the MinHash pair
    * graph, canonical id = min doc in the component (min-label propagation
    * in Spark; recursive-CTE transitive closure in the oracle). This is the
    * "keep one representative per duplicate cluster" step of a corpus
    * dedup pipeline. */
  val q41 = Q(
    "q41_neardup_clusters",
    s"""WITH RECURSIVE ${minhashPairsCtes(500)},
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |closure AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT c.id, e.b FROM closure c JOIN edges e ON e.a = c.r
       |)
       |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS component
       |FROM closure GROUP BY id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pairs = Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
      thresholdMilli = 500)
    graft.operators.Components.of(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  /** Shared CTE chain ending in `sig AS (doc_id[, source], simhash)` — the
    * bit-parallel SimHash pipeline (used by q26 and q46). Bit j's vote is
    * the parity of the j-th universal rehash of the token hash, generated
    * from the same [[TextAnalysis.HplaneA]]/[[HplaneB]] constants the
    * codegen'd [[graft.functions.SimHashSig]] uses; bit 63's addend is
    * BIGINT min, spelled `-(2^63-1) - 1` because the bare literal does
    * not parse as BIGINT. Term order 0..63 keeps every partial sum in
    * range (≤ 2^63-1 before the negative bit-63 term). */
  private def simhashCtes(withSource: Boolean, from: String = "documents"): String = {
    val src = if (withSource) ", source" else ""
    val bitSums = (0 until 64).map(j =>
      s"SUM((((${HplaneA(j)} * h + ${HplaneB(j)}) % $P) % 2) * cnt) AS b_$j")
      .mkString(",\n              ")
    val sig = (0 until 64).map { j =>
      val bit = if (j == 63) "CAST(-9223372036854775807 AS BIGINT) - 1"
                else s"CAST(${1L << j} AS BIGINT)"
      s"CASE WHEN b_$j * 2 > total THEN $bit ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""tok AS (SELECT doc_id$src, w, COUNT(*) AS cnt FROM (
       |       SELECT doc_id$src, unnest($sqlToks) AS w FROM $from) GROUP BY ALL),
       |th AS (SELECT doc_id$src, cnt, ${sqlHash("w")} AS h FROM tok),
       |bits AS (SELECT doc_id$src,
       |              $bitSums,
       |              CAST(SUM(cnt) AS BIGINT) AS total
       |         FROM th GROUP BY doc_id$src),
       |sig AS (SELECT doc_id$src, $sig AS simhash FROM bits)""".stripMargin
  }

  /** q26: 64-bit SimHash signatures — bit-parallel (64 SUM aggregates in one
    * groupBy, no per-bit explode). */
  val q26 = Q(
    "q26_simhash",
    s"""WITH ${simhashCtes(withSource = false)}
       |SELECT doc_id, simhash FROM sig
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.simhashSignatures(Tables.documents(s, dir), "doc_id", "text")
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy("doc_id")
  }

  /** Verify radius for q46 — at the 4-band pigeonhole limit, so candidate
    * recall is exact (3 flipped bits cannot touch all 4 of the 16-bit
    * bands). 3/64 bits is the same relative radius the former 32-bit
    * tier's ≤1 verified at, on twice the planes. */
  private val SimhashMaxHamming = 3

  /** q46: SimHash near-dup EDGE SET within source blocks — identical
    * (source, signature) groups collapse to a min-id representative
    * (star edges at hamming 0, the quadratic-skew guard for the 100 TB
    * boilerplate regime), then 4×16-bit banding over the DISTINCT
    * signatures (exact recall for hamming ≤ 3 by pigeonhole) + popcount
    * verify — the oracle replays BOTH halves (grp/star CTEs twin the
    * collapse, bands/cand twin the banding), exercised as a
    * PLANTED-REWRITE recovery audit: every fifth document is re-planted
    * with its tokens REVERSED (identical token multiset → identical
    * signature, hamming 0) under id+10⁶ — the signature tier's
    * signature catch, invisible to exact dedup (q21 normalizes
    * case/punct, not order) and the standard way to smoke a near-dup
    * detector whose honest banding admits ~4·C(d,2)·2⁻¹⁶ random
    * candidates (the round-8 n²/128 finding, fixed — on this corpus the
    * old degenerate tier's 41 accidental candidates vanish). The dedup
    * family's third detector: exact (q21), Jaccard/MinHash (q22/q25),
    * bit-distance (here). Band extraction masks (`& 65535`) instead of
    * mod so the arithmetic-shift sign fill of bit-63 signatures cannot
    * reach the key in either dialect. */
  val q46 = Q(
    "q46_simhash_neardup",
    s"""WITH corpus AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, source,
       |         array_to_string(list_reverse($sqlToks), ' ')
       |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL),
       |${simhashCtes(withSource = true, from = "corpus")},
       |grp AS (SELECT source, simhash, MIN(doc_id) AS rep
       |        FROM sig GROUP BY source, simhash),
       |star AS (SELECT g.rep AS id_a, s.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
       |         FROM sig s JOIN grp g
       |           ON s.source = g.source AND s.simhash = g.simhash
       |         WHERE s.doc_id <> g.rep),
       |bands AS (SELECT rep AS doc_id, source, simhash, band, (simhash >> (band * 16)) & 65535 AS bkey
       |          FROM grp, UNNEST([0, 1, 2, 3]) AS t(band)),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, x.simhash AS sim_a,
       |                y.doc_id AS id_b, y.simhash AS sim_b
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bkey = y.bkey AND x.source = y.source
       |              AND x.doc_id < y.doc_id)
       |SELECT id_a, id_b, hamming FROM star
       |UNION ALL
       |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sim_a, sim_b)) <= $SimhashMaxHamming
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
    val planted = docs
      .filter(col("doc_id") % 5 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat_ws(" ", reverse(split(trim(col("text")), "\\s+"))).as("text"))
    Dedup.simhashPairs(docs.unionAll(planted), "doc_id", "text",
      maxHamming = SimhashMaxHamming, blockCols = Seq("source"))
      .orderBy("id_a", "id_b")
  }

  /** q27: quality scoring — exact-integer metrics (token count, short-token
    * count, stopword hits, summed token length) + the derived double ratios
    * and a rule-based keep/drop flag. */
  val q27 = {
    val enList = Stopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    Q(
      "q27_quality_score",
      s"""SELECT doc_id, n_tokens, sum_tok_len, short_tokens, stop_hits,
         |       CAST(sum_tok_len AS DOUBLE) / n_tokens AS avg_tok_len,
         |       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
         |       (n_tokens BETWEEN 10 AND 1000) AND (short_tokens * 1000 < 400 * n_tokens)
         |         AS quality_ok
         |FROM (
         |  SELECT doc_id,
         |         CAST(len(w) AS BIGINT) AS n_tokens,
         |         CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS BIGINT)
         |           AS sum_tok_len,
         |         CAST(len(list_filter(w, t -> length(t) <= 2)) AS BIGINT) AS short_tokens,
         |         CAST(len(list_filter(w, t -> t IN ($enList))) AS BIGINT) AS stop_hits
         |  FROM (SELECT doc_id, $sqlToks AS w FROM documents)
         |)
         |WHERE doc_id % 13 = 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val en = Stopwords.toMap.apply("en")
      val st = graft.functions.TokenStats(col("text"))
      Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"),
          st.getField("n_tokens").as("n_tokens"),
          st.getField("sum_tok_len").as("sum_tok_len"),
          st.getField("short_tokens").as("short_tokens"),
          graft.functions.StopHits(col("text"), en).as("stop_hits"))
        .withColumn("avg_tok_len", col("sum_tok_len").cast("double") / col("n_tokens"))
        .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("quality_ok",
          col("n_tokens").between(10, 1000) &&
          col("short_tokens") * 1000 < col("n_tokens") * 400)
        .orderBy("doc_id")
    }
  }

  /** q47: corpus vocabulary — top-20 tokens by total occurrences with
    * document frequency (the "term statistics" pass every text pipeline
    * runs before filtering/weighting). One explode + one two-aggregate
    * groupBy; the top-k is TakeOrderedAndProject. */
  val q47 = Q(
    "q47_vocab_topk",
    s"""SELECT w, n, df FROM (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM (SELECT doc_id, unnest($sqlToks) AS w FROM documents)
       |  GROUP BY w)
       |ORDER BY n DESC, w
       |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("w"))
      .limit(20)
  }

  /** q48: TF-IDF term ranking — top term per document (every 17th doc) by
    * an EXACT-integer tf-idf surrogate: score_milli = (tf · N · 1000) div
    * df. Deliberately no ln(): libm log implementations differ across
    * engines, so a float idf would break bitwise oracle parity; integer
    * division is monotone in tf/df exactly like tf·log(N/df) for ranking
    * within a document. df comes from the FULL corpus; tf only from the
    * selected docs. */
  val q48 = Q(
    "q48_tfidf_top_term",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |dfreq AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |          FROM tok GROUP BY w),
       |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM tok WHERE doc_id % 17 = 0 GROUP BY doc_id, w),
       |scored AS (SELECT doc_id, w, tf, df, (tf * n * 1000) // df AS score_milli
       |           FROM tf JOIN dfreq USING (w), n_docs),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (
       |             PARTITION BY doc_id ORDER BY score_milli DESC, w) AS rn
       |           FROM scored)
       |SELECT doc_id, w, tf, df, score_milli
       |FROM ranked WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val dfreq = tok.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val tf = tok.filter(col("doc_id") % 17 === 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_milli").desc, col("w"))
    tf.join(dfreq, "w").crossJoin(broadcast(n))
      .withColumn("score_milli", expr("(tf * n * 1000) div df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "w", "tf", "df", "score_milli")
      .orderBy("doc_id")
  }

  /** q49: deterministic train/val split — assignment by polyhash of the
    * document id (NOT row order or rand(): the split must be reproducible
    * run-to-run, machine-to-machine, and stable under corpus append, which
    * only a content/key hash gives). 90/10 by hash mod 100; reported as
    * per-(lang, split) counts and char volume. */
  val q49 = Q(
    "q49_stratified_split",
    s"""SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM (
       |  SELECT lang, n_chars,
       |         CASE WHEN ${sqlHash("CAST(doc_id AS VARCHAR)")} % 100 < 90
       |              THEN 'train' ELSE 'val' END AS split
       |  FROM documents)
       |GROUP BY lang, split
       |ORDER BY lang, split""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("split",
        when(strHash(col("doc_id").cast("string")) % 100 < 90, lit("train"))
          .otherwise(lit("val")))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang", "split")
  }

  /** q53: deterministic per-source sample — the 3 docs per source with the
    * smallest polyhash(doc_id), i.e. reproducible uniform-ish subsampling
    * keyed on content identity (rand()/TABLESAMPLE give a different corpus
    * every run and every partitioning; a hash rank never does). The same
    * pattern scales to weighted sampling by scaling the hash. */
  val q53 = Q(
    "q53_hash_sample",
    s"""WITH h AS (SELECT source, doc_id,
       |                  ${sqlHash("CAST(doc_id AS VARCHAR)")} AS hv
       |           FROM documents),
       |r AS (SELECT source, doc_id, hv,
       |             ROW_NUMBER() OVER (
       |               PARTITION BY source ORDER BY hv, doc_id) AS rn
       |      FROM h)
       |SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, hv
       |FROM r WHERE rn <= 3
       |ORDER BY source, rn""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("hv"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        strHash(col("doc_id").cast("string")).as("hv"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("source", "rn", "doc_id", "hv")
      .orderBy("source", "rn")
  }

  /** q56: sequence packing — contiguous token-budget packs per source
    * ([[graft.operators.Packing]]; the pretraining batch-construction
    * step). One window shuffle on the blocking key; the per-source scan is
    * inherently sequential, parallelism comes from the key. */
  val q56 = Q(
    "q56_sequence_packing",
    s"""WITH t AS (SELECT doc_id, source, CAST(len($sqlToks) AS BIGINT) AS tok
       |           FROM documents),
       |c AS (SELECT doc_id, source, tok,
       |             SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
       |                            ROWS BETWEEN UNBOUNDED PRECEDING
       |                            AND CURRENT ROW) AS cum
       |      FROM t)
       |SELECT source,
       |       CAST((cum - tok) // 2048 AS BIGINT) AS pack_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(tok) AS BIGINT) AS pack_weight
       |FROM c GROUP BY source, pack_id
       |ORDER BY source, pack_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).withColumn("tok",
      graft.functions.TokenStats(col("text")).getField("n_tokens"))
    graft.operators.Packing
      .packSummary(docs, "doc_id", "tok", Seq("source"), budget = 2048)
      .orderBy("source", "pack_id")
  }

  /** q58: benchmark decontamination ([[graft.operators.Decontaminate]]) —
    * training docs (doc_id % 97 ≠ 0, the stand-in train split) sharing ≥ 2
    * distinct 3-gram shingles with any eval doc (doc_id % 97 = 0, the
    * stand-in benchmark). The eval shingle set broadcasts; the train corpus
    * never shuffles. The oracle re-derives the overlap join from the shared
    * shingle CTE. */
  val q58 = Q(
    "q58_decontaminate",
    s"""WITH ${shCte(withSource = false)},
       |ov AS (SELECT t.doc_id AS tid, e.doc_id AS eid, COUNT(*) AS overlap
       |       FROM sh t JOIN sh e ON t.g = e.g
       |       WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT tid AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
       |       CAST(MAX(overlap) AS BIGINT) AS top_overlap
       |FROM ov GROUP BY tid ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Decontaminate.flagged(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", minShared = 2)
      .orderBy("doc_id")
  }

  /** q59: Gopher-style repetition quality filter — per-doc top-bigram
    * dominance and duplicate-trigram fraction, computed in one in-scan pass
    * by the codegen'd [[graft.functions.RepetitionStats]] (zero shuffle);
    * the flag threshold compare is exact integer arithmetic, the reported
    * fractions derive from the same integers. The oracle recomputes both
    * metrics via explode→groupBy. */
  val q59 = Q(
    "q59_repetition_filter",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |bi AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
       |       FROM toks, UNNEST(range(1, len(w))) AS t(i)),
       |topbi AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n,
       |                 CAST(SUM(c) AS BIGINT) AS n_bigrams
       |          FROM (SELECT doc_id, b, COUNT(*) AS c FROM bi GROUP BY 1, 2)
       |          GROUP BY doc_id),
       |tri AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |               CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_trigrams
       |        FROM (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
       |              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i))
       |        GROUP BY doc_id)
       |SELECT t.doc_id,
       |       COALESCE(n_bigrams, 0) AS n_bigrams,
       |       COALESCE(top_bigram_n, 0) AS top_bigram_n,
       |       COALESCE(n_trigrams, 0) AS n_trigrams,
       |       COALESCE(n_distinct_trigrams, 0) AS n_distinct_trigrams,
       |       CASE WHEN COALESCE(n_bigrams, 0) > 0
       |            THEN CAST(top_bigram_n AS DOUBLE) / n_bigrams
       |            END AS top_bigram_frac,
       |       CASE WHEN COALESCE(n_trigrams, 0) > 0
       |            THEN CAST(n_trigrams - n_distinct_trigrams AS DOUBLE) / n_trigrams
       |            END AS dup_trigram_frac,
       |       CAST(CASE WHEN (COALESCE(n_bigrams, 0) > 0
       |                       AND top_bigram_n * 1000 >= n_bigrams * 100)
       |                   OR (COALESCE(n_trigrams, 0) > 0
       |                       AND (n_trigrams - n_distinct_trigrams) * 1000 >= n_trigrams * 20)
       |                 THEN 1 ELSE 0 END AS BIGINT) AS repetitive
       |FROM toks t
       |LEFT JOIN topbi ON t.doc_id = topbi.doc_id
       |LEFT JOIN tri ON t.doc_id = tri.doc_id
       |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    graft.functions.RepetitionStats.ensureRegistered(s)
    val rs = graft.functions.RepetitionStats(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        rs.getField("n_bigrams").as("n_bigrams"),
        rs.getField("top_bigram_n").as("top_bigram_n"),
        rs.getField("n_trigrams").as("n_trigrams"),
        rs.getField("n_distinct_trigrams").as("n_distinct_trigrams"))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0,
          col("top_bigram_n").cast("double") / col("n_bigrams")))
      .withColumn("dup_trigram_frac",
        when(col("n_trigrams") > 0,
          (col("n_trigrams") - col("n_distinct_trigrams")).cast("double") /
            col("n_trigrams")))
      .withColumn("repetitive",
        graft.functions.RepetitionStats.repetitiveFlag(
          col("n_bigrams"), col("top_bigram_n"),
          col("n_trigrams"), col("n_distinct_trigrams")).cast("long"))
      .orderBy("doc_id")
  }

  /** q60: CROSS-CORPUS decontamination under key skew — the eval set is
    * derived from the `events` stream (every 10th event replays the full
    * text of the document its user points at), so a handful of hot
    * documents repeat across thousands of eval rows and their grams
    * dominate the join key distribution. Runs the salted shuffle path
    * ([[graft.operators.Decontaminate.flaggedSalted]]: Decontaminate ∘
    * Salting — train side salted by doc id, eval side replicated) whose
    * output is pinned identical to the broadcast path by the oracle. Plan
    * shape (no corpus-wide shuffle, hot grams fanned out over the salt)
    * is spec-pinned in PlanSpec. */
  val q60 = Q(
    "q60_decontaminate_skew",
    s"""WITH ${shCte(withSource = false)},
       |evd AS (SELECT e.event_id AS eid, d.text
       |        FROM events e JOIN documents d ON d.doc_id = e.user_id
       |        WHERE e.event_id % 10 = 0),
       |etoks AS (SELECT eid, string_split_regex(trim(text), '\\s+') AS w FROM evd),
       |esh AS (SELECT DISTINCT eid, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
       |        FROM etoks, UNNEST(range(1, len(w) - 1)) AS t(i)),
       |th AS (SELECT doc_id, ${sqlWideHash("g")} AS h FROM sh WHERE doc_id % 97 <> 0),
       |eh AS (SELECT eid, ${sqlWideHash("g")} AS h FROM esh),
       |ov AS (SELECT t.doc_id AS tid, e.eid, COUNT(*) AS overlap
       |       FROM th t JOIN eh e ON t.h = e.h
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT tid AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
       |       CAST(MAX(overlap) AS BIGINT) AS top_overlap
       |FROM ov GROUP BY tid ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val evalDocs = Tables.events(s, dir)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("user_id"))
      .join(docs.select(col("doc_id").as("src_doc"), col("text")),
        col("src_doc") === col("user_id"))
      .select(col("event_id").as("doc_id"), col("text"))
    graft.operators.Decontaminate.flaggedSalted(
      docs.filter(col("doc_id") % 97 =!= 0), evalDocs,
      "doc_id", "text", minShared = 2, saltR = 8)
      .orderBy("doc_id")
  }

  /** q62: duplicate-span statistics ([[graft.operators.Dedup.spanDupStats]])
    * — fixed-width (8-token) chunk hashing over every document, flagging
    * documents whose chunk stream is ≥ 90% made of chunks that also appear
    * in ≥ 2 distinct documents. The RefinedWeb "exact substring dedup"
    * tier at chunk granularity; the oracle re-derives chunking, the
    * duplicated-chunk set, and the integer flag threshold. */
  val q62 = Q(
    "q62_span_dup",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |ch AS (SELECT doc_id, len(w) // 8 AS n_chunks,
       |              ${sqlWideHash("array_to_string(w[i:i+7], ' ')")} AS hv
       |       FROM toks, UNNEST(range(1, 8 * (len(w) // 8) - 6, 8)) AS t(i)),
       |dup AS (SELECT hv FROM (
       |          SELECT hv, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY hv)
       |        WHERE nd >= 2)
       |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
       |       CAST(COUNT(*) AS BIGINT) AS n_dup_chunks,
       |       CAST((COUNT(*) * 1000) // n_chunks AS BIGINT) AS dup_milli,
       |       CAST(COUNT(*) AS DOUBLE) / n_chunks AS dup_frac,
       |       CAST(CASE WHEN COUNT(*) * 1000 >= n_chunks * 900
       |                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM ch JOIN dup USING (hv)
       |GROUP BY doc_id, n_chunks
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.spanDupStats(Tables.documents(s, dir), "doc_id", "text",
      span = 8, minDocs = 2, flagMilli = 900)
      .orderBy("doc_id")
  }

  /** q63: per-source quota sampling ([[graft.operators.Mixing.quotaSample]])
    * — domain balancing: cap every source at 15 documents, chosen
    * deterministically by content-addressed hash rank through the bounded
    * [[graft.operators.TopKAgg]] buffer (map-side partial agg, ≤ quota
    * rows per group per partition, no per-group sort). The oracle is the
    * window formulation the aggregator replaces. */
  val q63 = Q(
    "q63_quota_sample",
    s"""WITH h AS (SELECT source, doc_id,
       |                  ${sqlHash("CAST(doc_id AS VARCHAR)")} AS hv
       |           FROM documents),
       |r AS (SELECT source, doc_id,
       |             ROW_NUMBER() OVER (
       |               PARTITION BY source ORDER BY hv, doc_id) AS rank
       |      FROM h)
       |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id
       |FROM r WHERE rank <= 15
       |ORDER BY source, rank""".stripMargin) { (s, dir) =>
    graft.operators.Mixing.quotaSample(Tables.documents(s, dir),
      "doc_id", "source", quota = 15)
      .orderBy("source", "rank")
  }

  /** Static mixture weights shared by q64's Spark side and oracle. */
  private val MixRates = Seq("src0" -> 100, "src1" -> 250, "src2" -> 500,
    "src3" -> 900)
  private val MixDefault = 50

  /** q64: static-rate corpus mixing audit ([[graft.operators.Mixing
    * .rateMixSummary]]) — Pile-style per-source mixture weights applied as
    * a pure map-side modular-hash filter (zero corpus shuffle; only the
    * 20-row summary aggregates). The oracle replays the same CASE rate
    * table and hash filter. */
  val q64 = Q(
    "q64_rate_mix",
    s"""WITH d AS (SELECT source, doc_id,
       |                  CASE ${MixRates.map { case (g, r) =>
                             s"WHEN source = '$g' THEN $r" }.mkString(" ")}
       |                       ELSE $MixDefault END AS rate_milli,
       |                  ${sqlHash("CAST(doc_id AS VARCHAR)")} % 1000 AS hm
       |           FROM documents)
       |SELECT source, CAST(rate_milli AS BIGINT) AS rate_milli,
       |       CAST(COUNT(*) AS BIGINT) AS n_total,
       |       CAST(SUM(CASE WHEN hm < rate_milli THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_kept
       |FROM d GROUP BY source, rate_milli
       |ORDER BY source""".stripMargin) { (s, dir) =>
    graft.operators.Mixing.rateMixSummary(Tables.documents(s, dir),
      "doc_id", "source", MixRates.toMap, defaultMilli = MixDefault)
      .orderBy("source")
  }

  /** q65: concat-and-chunk index ([[graft.operators.Packing
    * .concatChunkIndex]]) — the GPT-style loader policy: per-source token
    * streams conceptually concatenated in doc_id order and cut into
    * 512-token windows that straddle document boundaries. Output is the
    * loader index (per-doc token span + first/last chunk touched); token
    * counts ride the scan ([[graft.functions.TokenStats]]), the only
    * exchange is the per-source window. The oracle replays the cumulative
    * window and exact integer chunk division. */
  val q65 = Q(
    "q65_concat_chunks",
    s"""WITH t AS (SELECT source, doc_id,
       |                  CAST(len($sqlToks) AS BIGINT) AS n_tokens
       |           FROM documents),
       |c AS (SELECT source, doc_id, n_tokens,
       |             SUM(n_tokens) OVER (
       |               PARTITION BY source ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM t)
       |SELECT source, doc_id, n_tokens,
       |       CAST(cum - n_tokens AS BIGINT) AS start_off,
       |       CAST(cum AS BIGINT) AS end_off,
       |       CAST(CASE WHEN n_tokens > 0 THEN (cum - n_tokens) // 512 END
       |            AS BIGINT) AS first_chunk,
       |       CAST(CASE WHEN n_tokens > 0 THEN (cum - 1) // 512 END
       |            AS BIGINT) AS last_chunk,
       |       CAST(CASE WHEN n_tokens > 0
       |                 THEN (cum - 1) // 512 - (cum - n_tokens) // 512 + 1
       |                 ELSE 0 END AS BIGINT) AS n_chunks
       |FROM c ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
    val nTok = graft.functions.TokenStats(col("text")).getField("n_tokens")
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), nTok.cast("long").as("n_tokens"))
    graft.operators.Packing.concatChunkIndex(docs, "doc_id", "n_tokens",
      Seq("source"), chunkTokens = 512)
      .orderBy("source", "doc_id")
  }

  /** q66: the decontaminated corpus ([[graft.operators.Decontaminate
    * .clean]]) — q58's flag set applied as a left-anti join, returning the
    * surviving training documents. The oracle re-derives the flag set and
    * anti-joins it the SQL way. */
  val q66 = Q(
    "q66_decontaminate_clean",
    s"""WITH ${shCte(withSource = false)},
       |ov AS (SELECT t.doc_id AS tid, e.doc_id AS eid, COUNT(*) AS overlap
       |       FROM sh t JOIN sh e ON t.g = e.g
       |       WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |flagged AS (SELECT DISTINCT tid FROM ov)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id % 97 <> 0
       |  AND d.doc_id NOT IN (SELECT tid FROM flagged)
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Decontaminate.clean(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", minShared = 2)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** q68: sketch-tier corpus statistics ([[graft.operators.Sketches
    * .groupStats]]) — HLL++ distinct texts and approximate median length
    * per source, one scan with fixed-size mergeable state. NO SQL oracle
    * by construction (DuckDB's approximate aggregates use different
    * algorithms, so cross-engine hash parity is impossible); the accuracy
    * contracts are pinned against exact computation in SketchesSpec and
    * the driver records a rows-only check. */
  val q68 = Q.noOracle("q68_sketch_stats") { (s, dir) =>
    graft.operators.Sketches.groupStats(
      Tables.documents(s, dir), "source", "text", "n_chars")
      .orderBy("source")
  }

  /** q69: q68's exact cousin ([[graft.operators.Sketches
    * .exactGroupStats]]) — the same grouping with exact COUNT(DISTINCT)
    * and the exact LOW median (the ⌈n/2⌉-th order statistic, integer-
    * exact in both engines where interpolated medians would float), so
    * the sketch tier's query scaffolding IS hash-verified even though the
    * sketch values themselves can't be (q68 is rows-only by construction;
    * SketchesSpec bounds q68's estimates against THIS query's exacts). */
  val q69 = Q(
    "q69_sketch_exact",
    """WITH r AS (SELECT source, text, n_chars,
      |                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
      |                  COUNT(*) OVER (PARTITION BY source) AS cnt
      |           FROM documents)
      |SELECT source, COUNT(*) AS n_rows,
      |       CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct,
      |       CAST(MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END) AS BIGINT)
      |         AS exact_median_low
      |FROM r GROUP BY source
      |ORDER BY source""".stripMargin) { (s, dir) =>
    graft.operators.Sketches.exactGroupStats(
      Tables.documents(s, dir), "source", "text", "n_chars")
      .orderBy("source")
  }

  /** q75: span-level decontamination ([[graft.operators.Decontaminate
    * .scrubSpans]]) — scrub, don't drop: every sliding 8-token window of a
    * training document that occurs anywhere in the (events-replayed, like
    * q60) eval set is masked out, flagged windows merging into maximal
    * runs by q72's gaps-and-islands rule, and the document survives as
    * the kept tokens joined by single spaces. The oracle re-derives
    * window hashes, the island merge, and the token-index rebuild
    * (list_filter with an index lambda over the run list). */
  val q75 = Q(
    "q75_scrub_spans",
    s"""WITH ttoks AS (SELECT doc_id, $sqlToks AS w
       |               FROM documents WHERE doc_id % 97 <> 0),
       |evd AS (SELECT d.text FROM events e JOIN documents d
       |        ON d.doc_id = e.user_id WHERE e.event_id % 10 = 0),
       |etoks AS (SELECT $sqlToks AS w FROM evd),
       |eh AS (SELECT DISTINCT ${sqlWideHash("array_to_string(w[i:i+7], ' ')")} AS h
       |       FROM etoks, UNNEST(range(1, len(w) - 6)) AS t(i)),
       |twin AS (SELECT doc_id, i AS p,
       |                ${sqlWideHash("array_to_string(w[i:i+7], ' ')")} AS h
       |         FROM ttoks, UNNEST(range(1, len(w) - 6)) AS t(i)),
       |flag AS (SELECT doc_id, p FROM twin JOIN eh USING (h)),
       |isl AS (SELECT doc_id, p,
       |               CASE WHEN p - LAG(p) OVER (
       |                 PARTITION BY doc_id ORDER BY p) <= 8
       |               THEN 0 ELSE 1 END AS brk
       |        FROM flag),
       |grp AS (SELECT doc_id, p,
       |               SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g
       |        FROM isl),
       |runs AS (SELECT doc_id, g, MIN(p) AS p0, MAX(p) AS p1
       |         FROM grp GROUP BY doc_id, g),
       |rl AS (SELECT doc_id, list({'p0': p0, 'p1': p1}) AS rs,
       |              CAST(COUNT(*) AS BIGINT) AS n_spans
       |       FROM runs GROUP BY doc_id),
       |kept AS (SELECT t.doc_id,
       |                list_filter(t.w, (tok, i) -> NOT COALESCE(
       |                  list_aggregate(list_transform(r.rs,
       |                    x -> i BETWEEN x.p0 AND x.p1 + 7), 'bool_or'),
       |                  FALSE)) AS kw,
       |                CAST(len(t.w) AS BIGINT) AS n_tokens,
       |                COALESCE(r.n_spans, 0) AS n_spans
       |         FROM ttoks t LEFT JOIN rl r USING (doc_id))
       |SELECT doc_id, COALESCE(array_to_string(kw, ' '), '') AS text, n_tokens,
       |       CAST(n_tokens - len(kw) AS BIGINT) AS removed_tokens, n_spans
       |FROM kept ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val evalDocs = Tables.events(s, dir)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("user_id"))
      .join(docs.select(col("doc_id").as("src_doc"), col("text")),
        col("src_doc") === col("user_id"))
      .select(col("event_id").as("doc_id"), col("text"))
    graft.operators.Decontaminate.scrubSpans(
      docs.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text"),
      evalDocs, "doc_id", "text", minTokens = 8)
      .orderBy("doc_id")
  }

  /** q74: temperature-weighted source mixing ([[graft.operators.Mixing
    * .temperatureMix]]) — the n_s^(1/2) (T = 2) pretraining rebalance:
    * each source's share of a global document budget is proportional to
    * sqrt(n_s), then membership is the content-addressed ppm-hash filter.
    * Everything after the (IEEE-exactly-rounded) sqrt is integer
    * arithmetic, so the oracle replays the whole derivation bit-for-bit:
    * milli-sqrt weights, integer-div quotas, ppm rates, hash keeps. */
  val q74 = Q(
    "q74_temperature_mix",
    s"""WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
       |           FROM documents GROUP BY source),
       |w AS (SELECT source, n_total,
       |             CAST(floor(sqrt(n_total) * 1000) AS BIGINT) AS w
       |      FROM n),
       |t AS (SELECT *, SUM(w) OVER () AS tw FROM w),
       |r AS (SELECT source, n_total, w,
       |             (30000 * w) // tw AS quota,
       |             LEAST(1000000, (((30000 * w) // tw) * 1000000) // n_total)
       |               AS rate_ppm
       |      FROM t),
       |k AS (SELECT d.source,
       |             CAST(SUM(CASE WHEN ((${sqlHash("CAST(doc_id AS VARCHAR)")}
       |                            * 2654435761) % $P) % 1000000 < r.rate_ppm
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |      FROM documents d JOIN r USING (source) GROUP BY d.source)
       |SELECT r.source, r.n_total, r.w, CAST(r.quota AS BIGINT) AS quota,
       |       CAST(r.rate_ppm AS BIGINT) AS rate_ppm, k.n_kept
       |FROM r JOIN k USING (source) ORDER BY source""".stripMargin) { (s, dir) =>
    graft.operators.Mixing.temperatureMix(Tables.documents(s, dir),
      "doc_id", "source", budget = 30000L)
      .orderBy("source")
  }

  /** q81: TOKEN-budget temperature mixing ([[graft.operators.Mixing
    * .temperatureMixTokens]]) — q74's n^½ rebalance with the size measure
    * real pretraining mixes on: source weights are sqrt(total TOKENS),
    * the budget is a token budget, membership stays document-granular.
    * Everything after the IEEE-exactly-rounded sqrt is integer
    * arithmetic, so the oracle replays the whole derivation bit-for-bit:
    * token sums, milli-sqrt weights, integer-div token quotas, ppm rates,
    * hash keeps, and the kept-token tally. */
  val q81 = Q(
    "q81_token_temperature_mix",
    s"""WITH t AS (SELECT source, doc_id,
       |                  CAST(len($sqlToks) AS BIGINT) AS nt,
       |                  ((${sqlHash("CAST(doc_id AS VARCHAR)")}
       |                    * 2654435761) % $P) % 1000000 AS hv
       |           FROM documents),
       |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |             CAST(SUM(nt) AS BIGINT) AS total_tokens
       |      FROM t GROUP BY source),
       |w AS (SELECT source, n_docs, total_tokens,
       |             CAST(floor(sqrt(total_tokens) * 1000) AS BIGINT) AS w
       |      FROM n),
       |tw AS (SELECT *, CAST(SUM(w) OVER () AS BIGINT) AS tws FROM w),
       |r AS (SELECT source, n_docs, total_tokens, w,
       |             CAST((100000 * w) // tws AS BIGINT) AS quota_tokens,
       |             CAST(LEAST(1000000, (((100000 * w) // tws) * 1000000)
       |                    // total_tokens) AS BIGINT) AS rate_ppm
       |      FROM tw),
       |k AS (SELECT t.source,
       |             CAST(SUM(CASE WHEN t.hv < r.rate_ppm THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n_kept,
       |             CAST(SUM(CASE WHEN t.hv < r.rate_ppm THEN t.nt ELSE 0 END)
       |                  AS BIGINT) AS kept_tokens
       |      FROM t JOIN r USING (source) GROUP BY t.source)
       |SELECT r.source, r.n_docs, r.total_tokens, r.w, r.quota_tokens,
       |       r.rate_ppm, k.n_kept, k.kept_tokens
       |FROM r JOIN k USING (source) ORDER BY source""".stripMargin) { (s, dir) =>
    graft.operators.Mixing.temperatureMixTokens(Tables.documents(s, dir),
      "doc_id", "source", "text", budget = 100000L)
      .orderBy("source")
  }

  /** q82: contamination fraction ([[graft.operators.Decontaminate
    * .overlapFraction]]) — the filter-by-fraction criterion: for every
    * train document with at least one shingle, the fraction of its
    * DISTINCT word-3-grams occurring anywhere in the eval set, as an
    * exact integer per-mille plus the double derived from the same
    * integers. The oracle re-derives the per-doc gram sets, the eval
    * distinct-gram membership, and the integer division. */
  val q82 = Q(
    "q82_overlap_fraction",
    s"""WITH ${shCte(withSource = false)},
       |t AS (SELECT doc_id, g FROM sh WHERE doc_id % 97 <> 0),
       |eg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
       |agg AS (SELECT t.doc_id,
       |               CAST(COUNT(*) AS BIGINT) AS n_grams,
       |               CAST(SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END)
       |                    AS BIGINT) AS n_hit
       |        FROM t LEFT JOIN eg ON t.g = eg.g
       |        GROUP BY t.doc_id)
       |SELECT doc_id, n_grams, n_hit,
       |       CAST((n_hit * 1000) // n_grams AS BIGINT) AS hit_milli,
       |       CAST(n_hit AS DOUBLE) / n_grams AS hit_frac
       |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Decontaminate.overlapFraction(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q73: Bloom-gated decontamination ([[graft.operators.Decontaminate
    * .flaggedBloom]]) — the middle regime between q58's broadcast join and
    * q60's bare salted shuffle: the eval gram set folds into one Bloom
    * sketch that gates the train shingles map-side before the
    * shuffle-hash join, so only admitted grams cross the exchange. False
    * positives are removed by the exact join, so the output hash-matches
    * the same SQL as an exact overlap join (the oracle knows nothing of
    * the sketch); the join key is the 62-bit WidePolyHash long (global
    * gram scope — see [[graft.functions.WidePolyHash]]), replayed by the
    * oracle like q60. Plan shape (gate below the exchange) is
    * spec-pinned in DecontaminateSpec. */
  val q73 = Q(
    "q73_decontaminate_bloom",
    s"""WITH ${shCte(withSource = false)},
       |th AS (SELECT doc_id, ${sqlWideHash("g")} AS h FROM sh WHERE doc_id % 89 <> 0),
       |eh AS (SELECT doc_id, ${sqlWideHash("g")} AS h FROM sh WHERE doc_id % 89 = 0),
       |ov AS (SELECT t.doc_id AS tid, e.doc_id AS eid, COUNT(*) AS overlap
       |       FROM th t JOIN eh e ON t.h = e.h
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 3)
       |SELECT tid AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
       |       CAST(MAX(overlap) AS BIGINT) AS top_overlap
       |FROM ov GROUP BY tid ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Decontaminate.flaggedBloom(
      docs.filter(col("doc_id") % 89 =!= 0),
      docs.filter(col("doc_id") % 89 === 0),
      "doc_id", "text", minShared = 3)
      .orderBy("doc_id")
  }

  /** q76: GLOBAL sliding-window duplication ([[graft.operators
    * .ExactSubstring.globalStats]]) — the tier-matrix cell q72 (shard-
    * confined) and q62 (chunk-aligned) both miss: every sliding 8-token
    * window occurring >= 2 times ANYWHERE in the corpus is flagged, runs
    * merge per document. The oracle re-derives window hashes (the join
    * key is the 62-bit wide hash — global scope needs more than a
    * 31-bit space, see [[graft.functions.WideWindowHashes]]), the
    * global occurrence count, and the island merge. */
  val q76 = Q(
    "q76_global_window_dup",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |win AS (SELECT doc_id, i AS p,
       |               ${sqlWideHash("array_to_string(w[i:i+7], ' ')")} AS h
       |        FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i)),
       |dupw AS (SELECT doc_id, p FROM (
       |           SELECT doc_id, p, COUNT(*) OVER (PARTITION BY h) AS c
       |           FROM win) WHERE c >= 2),
       |isl AS (SELECT doc_id, p,
       |               CASE WHEN p - LAG(p) OVER (
       |                 PARTITION BY doc_id ORDER BY p) <= 8
       |               THEN 0 ELSE 1 END AS brk
       |        FROM dupw),
       |grp AS (SELECT doc_id, p,
       |               SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g
       |        FROM isl),
       |runs AS (SELECT doc_id, g, MIN(p) AS p0, MAX(p) AS p1,
       |                COUNT(*) AS nw
       |         FROM grp GROUP BY doc_id, g),
       |agg AS (SELECT doc_id, CAST(SUM(nw) AS BIGINT) AS n_dup_win,
       |               CAST(COUNT(*) AS BIGINT) AS n_runs,
       |               CAST(SUM(p1 - p0 + 8) AS BIGINT) AS dup_tokens,
       |               CAST(MAX(p1 - p0 + 8) AS BIGINT) AS max_dup_run
       |        FROM runs GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
       |       CAST(GREATEST(len(t.w) - 7, 0) AS BIGINT) AS n_win,
       |       CAST(COALESCE(a.n_dup_win, 0) AS BIGINT) AS n_dup_win,
       |       CAST(COALESCE(a.n_runs, 0) AS BIGINT) AS n_runs,
       |       CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |       CAST(COALESCE(a.max_dup_run, 0) AS BIGINT) AS max_dup_run
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    graft.operators.ExactSubstring.globalStats(
      Tables.documents(s, dir), "doc_id", "text", minTokens = 8)
      .orderBy("doc_id")
  }

  /** q72: token-level exact-substring duplication ([[graft.operators
    * .ExactSubstring.stats]]) — the suffix-automaton tier below q62's
    * chunk-hash stand-in: every SLIDING 8-token window (not just
    * chunk-aligned ones) whose token sequence occurs at least twice in
    * the document's source shard is flagged, and flagged windows merge
    * into maximal duplicated token runs (gaps-and-islands). The oracle
    * re-derives windows from raw gram STRINGS (space-join is injective
    * over whitespace-free tokens — no hash in the loop), counts per
    * (source, gram), and replays the island merge with window functions.
    * `max_rep_span` (any-length longest repeat — the automaton-only
    * output) is spec-pinned instead, being inexpressible without a
    * quadratic SQL blowup. */
  val q72 = Q(
    "q72_exact_substring",
    s"""WITH toks AS (SELECT doc_id, source, $sqlToks AS w FROM documents),
       |win AS (SELECT doc_id, source, i AS p,
       |               array_to_string(w[i:i+7], ' ') AS g
       |        FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i)),
       |dupw AS (SELECT doc_id, p FROM (
       |           SELECT doc_id, p,
       |                  COUNT(*) OVER (PARTITION BY source, g) AS c
       |           FROM win) WHERE c >= 2),
       |isl AS (SELECT doc_id, p,
       |               CASE WHEN p - LAG(p) OVER (
       |                 PARTITION BY doc_id ORDER BY p) <= 8
       |               THEN 0 ELSE 1 END AS brk
       |        FROM dupw),
       |grp AS (SELECT doc_id, p,
       |               SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g
       |        FROM isl),
       |runs AS (SELECT doc_id, g, MIN(p) AS p0, MAX(p) AS p1,
       |                COUNT(*) AS nw
       |         FROM grp GROUP BY doc_id, g),
       |agg AS (SELECT doc_id, CAST(SUM(nw) AS BIGINT) AS n_dup_win,
       |               CAST(COUNT(*) AS BIGINT) AS n_runs,
       |               CAST(SUM(p1 - p0 + 8) AS BIGINT) AS dup_tokens,
       |               CAST(MAX(p1 - p0 + 8) AS BIGINT) AS max_dup_run
       |        FROM runs GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
       |       CAST(GREATEST(len(t.w) - 7, 0) AS BIGINT) AS n_win,
       |       CAST(COALESCE(a.n_dup_win, 0) AS BIGINT) AS n_dup_win,
       |       CAST(COALESCE(a.n_runs, 0) AS BIGINT) AS n_runs,
       |       CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |       CAST(COALESCE(a.max_dup_run, 0) AS BIGINT) AS max_dup_run
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    graft.operators.ExactSubstring.stats(
      Tables.documents(s, dir), "doc_id", "text", "source", minTokens = 8)
      .drop("max_rep_span")
      .orderBy("doc_id")
  }

  /** q77: LM-quality scoring ([[graft.operators.LmQuality.score]]) — the
    * CCNet-style perplexity filter in its exact-integer form: an add-one-
    * smoothed bigram model trained on the content-hash-deterministic 10 %
    * reference slice scores every document's bigram occurrences in ppm,
    * `((c12+1)·10⁶) div (c1+V)` (see the operator scaladoc for why no
    * ln()). The oracle retrains the identical model from raw SQL — same
    * polyhash gram keys, same integer smoothing — so counts, OOV tallies,
    * and both ppm scores hash-match bit-for-bit. */
  val q77 = Q(
    "q77_lm_quality",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |ref AS (SELECT w FROM toks
       |        WHERE ${sqlHash("CAST(doc_id AS VARCHAR)")} % 10 = 0),
       |uni AS (SELECT ${sqlHash("w[i]")} AS h1, CAST(COUNT(*) AS BIGINT) AS c1
       |        FROM ref, UNNEST(range(1, len(w) + 1)) AS t(i) GROUP BY 1),
       |bi AS (SELECT ${sqlHash("w[i] || ' ' || w[i+1]")} AS h12,
       |              CAST(COUNT(*) AS BIGINT) AS c12
       |       FROM ref, UNNEST(range(1, len(w))) AS t(i) GROUP BY 1),
       |voc AS (SELECT GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS v FROM uni),
       |occ AS (SELECT doc_id, ${sqlHash("w[i] || ' ' || w[i+1]")} AS h12,
       |               ${sqlHash("w[i]")} AS h1
       |        FROM toks, UNNEST(range(1, len(w))) AS t(i)),
       |p AS (SELECT doc_id, c12,
       |             ((COALESCE(c12, 0) + 1) * 1000000)
       |               // (COALESCE(c1, 0) + v) AS p_ppm
       |      FROM occ LEFT JOIN bi USING (h12) LEFT JOIN uni USING (h1), voc),
       |scored AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |                  CAST(SUM(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END)
       |                       AS BIGINT) AS oov_bigrams,
       |                  CAST(SUM(p_ppm) AS BIGINT) // COUNT(*) AS avg_p_ppm,
       |                  MIN(p_ppm) AS min_p_ppm
       |           FROM p GROUP BY doc_id)
       |SELECT d.doc_id, CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |       CAST(COALESCE(oov_bigrams, 0) AS BIGINT) AS oov_bigrams,
       |       avg_p_ppm, min_p_ppm
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN scored USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    graft.operators.LmQuality.score(
      Tables.documents(s, dir),
      strHash(col("doc_id").cast("string")) % 10 === 0, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q78: BM25 top-k retrieval ([[graft.operators.Retrieval.bm25TopK]]) —
    * rank training documents against each eval query document (q73's
    * corpus/eval split) by the integer-exact BM25 surrogate: exact
    * rational tf saturation at k1 = 6/5, b = 3/4 and the unlogged
    * (N−df+0.5)/(df+0.5) odds idf, both in fixed-point integer division
    * (the q48 no-libm contract), so DuckDB replays the scoring
    * bit-for-bit. The oracle re-ranks with a window; the Spark side ranks
    * through the bounded [[graft.operators.TopKAgg]] heap, proving (like
    * q51) that the ≤-k-rows-per-partition path returns exactly the
    * window's answer. */
  val q78 = Q(
    "q78_bm25_topk",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl
       |      FROM toks WHERE doc_id % 89 <> 0),
       |ct AS (SELECT doc_id, dl, unnest(w) AS t FROM c),
       |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf,
       |              MIN(dl) AS dl
       |       FROM ct GROUP BY doc_id, t),
       |dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |              CAST(SUM(dl) AS BIGINT) AS s FROM c),
       |qt AS (SELECT DISTINCT doc_id AS qid, unnest(w) AS t
       |       FROM toks WHERE doc_id % 89 = 0),
       |term AS (SELECT qt.qid, tf.doc_id,
       |                ((2*n - 2*df + 1)*1000) // (2*df + 1) AS idf_milli,
       |                (22*tf.tf*s*1000) // (10*tf.tf*s + 3*s + 9*tf.dl*n)
       |                  AS part_permille
       |         FROM qt JOIN tf ON tf.t = qt.t
       |                 JOIN dfreq ON dfreq.t = qt.t, st),
       |sc AS (SELECT qid, doc_id,
       |              CAST(SUM(idf_milli * part_permille) AS BIGINT) AS score
       |       FROM term GROUP BY qid, doc_id),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |         PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |       FROM sc)
       |SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
       |FROM rk WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Retrieval.bm25TopK(
      docs.filter(col("doc_id") % 89 =!= 0),
      docs.filter(col("doc_id") % 89 === 0),
      "doc_id", "text", k = 3)
      .orderBy("query_id", "rank")
  }

  /** q79: near-dup keep-one ([[graft.operators.Dedup.keepCanonical]]) —
    * the deduped-corpus materialization over q41's MinHash clusters: one
    * row per document with its component and whether it survives (highest
    * n_chars per component, ties to the lowest doc_id). The oracle replays
    * the transitive closure (q41's recursive CTE) and re-ranks each
    * component with a window. */
  val q79 = Q(
    "q79_neardup_keep",
    s"""WITH RECURSIVE ${minhashPairsCtes(500)},
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |closure AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT c.id, e.b FROM closure c JOIN edges e ON e.a = c.r
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM closure GROUP BY id),
       |d AS (SELECT doc_id, n_chars,
       |             CAST(COALESCE(component, doc_id) AS BIGINT) AS component
       |      FROM documents LEFT JOIN comp ON comp.id = doc_id),
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
       |      FROM d)
       |SELECT doc_id, component, rn = 1 AS kept
       |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      thresholdMilli = 500)
    Dedup.keepCanonical(docs, "doc_id", "n_chars", pairs)
      .orderBy("doc_id")
  }

  /** q80: BPE tokenizer training + application ([[graft.operators.Bpe]])
    * — learn 30 merges from the corpus word-frequency table (distributed
    * pass; driver merge loop is vocab-sized), then count each document's
    * BPE pieces under the trained table. Rows-only through round 11; now
    * under the REAL oracle gate — [[BpeQ.bpeChainCtes]] replays the
    * training loop as unrolled materialized CTEs and the per-word
    * segmentation bitwise (the q102/q110 exact-replay discipline), so
    * the per-document piece counts hash-match. The spec suite (BpeSpec:
    * the hand-computable Sennrich example, rank parity, determinism,
    * brute-force twin) still pins the Scala path independently. */
  val q80 = Q("q80_bpe_train", BpeQ.q80OracleSql) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val merges = graft.operators.Bpe.train(docs, "text", numMerges = 30)
    graft.operators.Bpe.pieceCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  /** q89: cross-document boilerplate REMOVAL ([[graft.operators.Dedup
    * .scrubDupSpans]]) — the rewrite twin of q62's measurement: every
    * 8-word chunk present in ≥ 2 distinct documents is deleted wherever
    * it appears and each text reassembles from its surviving words. The
    * oracle re-derives the chunk hashes with q62's exact formula, takes
    * the SAME dup set, and rebuilds each text word-by-word with a
    * position-ordered string_agg — so the rewritten STRINGS hash-match,
    * not just the removal counts. */
  val q89 = Q(
    "q89_scrub_dup_spans",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |base AS (SELECT doc_id, w, len(w) // 8 AS n_chunks FROM toks),
       |ch AS (SELECT doc_id, CAST((t.i - 1) // 8 AS BIGINT) AS k,
       |              ${sqlWideHash("array_to_string(w[t.i:t.i+7], ' ')")} AS hv
       |       FROM base, UNNEST(range(1, 8 * n_chunks - 6, 8)) AS t(i)),
       |dup AS (SELECT hv FROM (
       |          SELECT hv, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY hv)
       |        WHERE nd >= 2),
       |rem AS (SELECT DISTINCT doc_id, k FROM ch JOIN dup USING (hv)),
       |words AS (SELECT doc_id, t.i AS i, w[t.i] AS word
       |          FROM base, UNNEST(range(1, len(w) + 1)) AS t(i)),
       |kept AS (SELECT words.doc_id, i, word
       |         FROM words LEFT JOIN rem
       |           ON words.doc_id = rem.doc_id AND (words.i - 1) // 8 = rem.k
       |         WHERE rem.doc_id IS NULL),
       |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS clean_text
       |        FROM kept GROUP BY doc_id),
       |nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM rem GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CASE WHEN nrem.doc_id IS NULL THEN d.text
       |            ELSE COALESCE(agg.clean_text, '') END AS clean_text,
       |       CAST(COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_removed
       |FROM documents d
       |LEFT JOIN agg ON d.doc_id = agg.doc_id
       |LEFT JOIN nrem ON d.doc_id = nrem.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    Dedup.scrubDupSpans(Tables.documents(s, dir), "doc_id", "text",
      span = 8, minDocs = 2)
      .orderBy("doc_id")
  }

  /** q90/q95's SHARED planted-PII fixture (the synthetic corpus carries
    * no PII): an email+phone tail on every doc_id % 7 == 0 document, an
    * IPv4 tail on the remaining doc_id % 11 == 0 ones. ONE helper per
    * dialect so the two planted-recovery audits can never drift apart. */
  private val sqlPiiPlant: String =
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || " +
      "CAST(doc_id AS VARCHAR) || '@example.com or 555-867-5309' " +
      "WHEN doc_id % 11 = 0 THEN text || ' from 192.168.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.17 port 80' ELSE text END"

  /** Spark twin of [[sqlPiiPlant]] (byte-identical planted strings). */
  private def piiPlantCol: org.apache.spark.sql.Column =
    when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"),
        lit("@example.com or 555-867-5309")))
      .when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" from 192.168."),
          (col("doc_id") % 256).cast("string"), lit(".17 port 80")))
      .otherwise(col("text"))

  /** q90: PII redaction ([[graft.operators.Redact.redactPii]]) — the
    * scrub-before-packing curation step. The synthetic corpus carries no
    * PII, so (like q46/q85) the query is a PLANTED-RECOVERY audit: both
    * dialects plant [[sqlPiiPlant]]'s deterministic tails, then redact.
    * The oracle runs the SAME RE2-safe pattern text under DuckDB ('g'
    * flag = Spark's replace-all) — rewritten strings AND per-category
    * counts hash-match. */
  val q90 = Q(
    "q90_pii_redact",
    s"""WITH corpus AS (
       |  SELECT doc_id, $sqlPiiPlant AS text FROM documents)
       |SELECT doc_id,
       |       regexp_replace(regexp_replace(regexp_replace(text,
       |         '${Redact.EmailRe}', '${Redact.EmailTok}', 'g'),
       |         '${Redact.PhoneRe}', '${Redact.PhoneTok}', 'g'),
       |         '${Redact.Ipv4Re}', '${Redact.Ipv4Tok}', 'g') AS red_text,
       |       CAST(len(regexp_extract_all(text, '${Redact.EmailRe}')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '${Redact.PhoneRe}')) AS BIGINT) AS n_phones,
       |       CAST(len(regexp_extract_all(text, '${Redact.Ipv4Re}')) AS BIGINT) AS n_ips
       |FROM corpus ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), piiPlantCol.as("text"))
    Redact.redactPii(planted, "doc_id", "text").orderBy("doc_id")
  }

  /** DuckDB twin of the index-ordered double dot fold (VectorQ's
    * convention), needed here for q91's semantic leg. */
  private def sqlDotD(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    s"list_transform(range(1, len($a) + 1), " +
    s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** q91: HYBRID retrieval ([[graft.operators.Retrieval.hybridRrfTopK]])
    * — BM25 top-10 (q78's integer-exact scoring, same query split) and
    * exact-cosine top-10 over the embedding table (same id space),
    * fused by reciprocal-rank fusion in exact integer milli-units
    * `60000 div (60 + rank)` with full-outer candidate union. The
    * oracle replays BOTH legs' rankings and the fusion arithmetic, so
    * the hybrid ranking hash-matches end to end. */
  val q91 = Q(
    "q91_hybrid_rrf",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl
       |      FROM toks WHERE doc_id % 89 <> 0),
       |ct AS (SELECT doc_id, dl, unnest(w) AS t FROM c),
       |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf,
       |              MIN(dl) AS dl
       |       FROM ct GROUP BY doc_id, t),
       |dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |              CAST(SUM(dl) AS BIGINT) AS s FROM c),
       |qt AS (SELECT DISTINCT doc_id AS qid, unnest(w) AS t
       |       FROM toks WHERE doc_id % 89 = 0),
       |term AS (SELECT qt.qid, tf.doc_id,
       |                ((2*n - 2*df + 1)*1000) // (2*df + 1) AS idf_milli,
       |                (22*tf.tf*s*1000) // (10*tf.tf*s + 3*s + 9*tf.dl*n)
       |                  AS part_permille
       |         FROM qt JOIN tf ON tf.t = qt.t
       |                 JOIN dfreq ON dfreq.t = qt.t, st),
       |sc AS (SELECT qid, doc_id,
       |              CAST(SUM(idf_milli * part_permille) AS BIGINT) AS score
       |       FROM term GROUP BY qid, doc_id),
       |lex AS (SELECT qid, doc_id, rank FROM (
       |          SELECT *, ROW_NUMBER() OVER (
       |            PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |          FROM sc) WHERE rank <= 10),
       |nv AS (SELECT vec_id, embedding,
       |              sqrt(${sqlDotD("embedding", "embedding")}) AS nrm
       |       FROM embeddings),
       |qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
       |       FROM nv WHERE vec_id % 89 = 0),
       |semsc AS (SELECT qv.qid, nv.vec_id AS doc_id,
       |                 ROUND(${sqlDotD("nv.embedding", "qv.qe")}
       |                       / (nv.nrm * qv.qn), 6) AS cos_r
       |          FROM nv, qv
       |          WHERE nv.vec_id % 89 <> 0 AND nv.vec_id <> qv.qid),
       |sem AS (SELECT qid, doc_id, rank FROM (
       |          SELECT qid, doc_id, ROW_NUMBER() OVER (
       |            PARTITION BY qid ORDER BY cos_r DESC, doc_id) AS rank
       |          FROM semsc) WHERE rank <= 10),
       |f AS (SELECT COALESCE(lex.qid, sem.qid) AS query_id,
       |             COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       |             CAST(COALESCE(60000 // (60 + lex.rank), 0)
       |                + COALESCE(60000 // (60 + sem.rank), 0) AS BIGINT)
       |               AS rrf_milli
       |      FROM lex FULL JOIN sem
       |        ON lex.qid = sem.qid AND lex.doc_id = sem.doc_id)
       |SELECT query_id, doc_id, rrf_milli, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY rrf_milli DESC, doc_id) AS rank
       |      FROM f) WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    graft.operators.Retrieval.hybridRrfTopK(
      docs.filter(col("doc_id") % 89 =!= 0),
      docs.filter(col("doc_id") % 89 === 0),
      emb.filter(col("doc_id") % 89 =!= 0),
      emb.filter(col("doc_id") % 89 === 0),
      "doc_id", "text", "embedding", kEach = 10, rrfK = 60, k = 5)
      .orderBy("query_id", "rank")
  }

  /** q92: vocabulary drift between two corpus slices ([[graft.operators
    * .Drift.topDrift]]) — the distribution-shift monitor a pipeline runs
    * between crawls. Per-term probability drift in exact integer ppm
    * (floor-division both sides, the integer-score discipline), union
    * vocabulary via full-outer join, top-20 by (drift DESC, term). */
  val q92 = Q(
    "q92_vocab_drift",
    s"""WITH ta AS (SELECT unnest($sqlToks) AS term FROM documents
       |            WHERE doc_id % 2 = 0),
       |tb AS (SELECT unnest($sqlToks) AS term FROM documents
       |       WHERE doc_id % 2 = 1),
       |ca AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ca FROM ta GROUP BY term),
       |cb AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cb FROM tb GROUP BY term),
       |na AS (SELECT CAST(SUM(ca) AS BIGINT) AS n FROM ca),
       |nb AS (SELECT CAST(SUM(cb) AS BIGINT) AS n FROM cb),
       |d AS (SELECT COALESCE(ca.term, cb.term) AS term,
       |             CAST(COALESCE(ca.ca, 0) * 1000000 // na.n AS BIGINT) AS a_ppm,
       |             CAST(COALESCE(cb.cb, 0) * 1000000 // nb.n AS BIGINT) AS b_ppm
       |      FROM ca FULL JOIN cb ON ca.term = cb.term, na, nb)
       |SELECT term, a_ppm, b_ppm,
       |       CAST(ABS(a_ppm - b_ppm) AS BIGINT) AS drift_ppm
       |FROM d ORDER BY drift_ppm DESC, term LIMIT 20""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Drift.topDrift(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text", k = 20)
  }

  /** q95: per-source PII rates ([[graft.operators.Redact
    * .piiSourceStats]]) — the drop/quarantine decision table over q90's
    * planted corpus (same plants, so rates are non-vacuous): exact
    * integer-milli PII rate + per-family totals per source. */
  val q95 = Q(
    "q95_pii_source_stats",
    s"""WITH corpus AS (
       |  SELECT doc_id, source, $sqlPiiPlant AS text FROM documents),
       |c AS (SELECT source,
       |             len(regexp_extract_all(text, '${Redact.EmailRe}')) AS ne,
       |             len(regexp_extract_all(text, '${Redact.PhoneRe}')) AS np,
       |             len(regexp_extract_all(text, '${Redact.Ipv4Re}')) AS ni
       |      FROM corpus)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_pii_docs,
       |       CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) * 1000
       |            // COUNT(*) AS BIGINT) AS pii_rate_milli,
       |       CAST(SUM(ne) AS BIGINT) AS n_emails,
       |       CAST(SUM(np) AS BIGINT) AS n_phones,
       |       CAST(SUM(ni) AS BIGINT) AS n_ips
       |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), piiPlantCol.as("text"))
    Redact.piiSourceStats(planted, "source", "text").orderBy("source")
  }

  /** q96: LEAKAGE-SAFE train/val split ([[graft.operators.Mixing
    * .leakageSafeSplit]]) — near-dup clusters (q41's component map)
    * assign to splits atomically by the content hash of the cluster
    * representative (q49's placement convention), so no verified
    * near-dup pair ever straddles the boundary. The oracle replays the
    * pair graph, the recursive closure, the representative fallback,
    * and the hash placement. */
  val q96 = Q(
    "q96_leakage_safe_split",
    s"""WITH RECURSIVE ${minhashPairsCtes(500)},
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |cnodes AS (SELECT DISTINCT a AS id FROM edges),
       |closure AS (
       |  SELECT id, id AS r FROM cnodes
       |  UNION
       |  SELECT c.id, e.b FROM closure c JOIN edges e ON e.a = c.r
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM closure GROUP BY id)
       |SELECT d.doc_id,
       |       CAST(COALESCE(comp.component, d.doc_id) AS BIGINT) AS rep,
       |       CASE WHEN ${sqlHash("CAST(COALESCE(comp.component, d.doc_id) AS VARCHAR)")}
       |                 % 1000 < 100
       |            THEN 'val' ELSE 'train' END AS split
       |FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    Mixing.leakageSafeSplit(Tables.documents(s, dir), "doc_id", "text",
      valMilli = 100, thresholdMilli = 500)
      .orderBy("doc_id")
  }

  /** q98: URL extraction + canonicalization + registered domains
    * ([[graft.operators.Urls.canonicalUrls]]) — the link-hygiene tier
    * of a crawl pipeline. Planted-recovery audit (q90's discipline: the
    * synthetic corpus carries no URLs): both dialects append the same
    * deterministic URL tails — mixed-case scheme/host, an explicit
    * port, utm_* tracking params around a kept param, a fragment, and a
    * second URL on a different registered domain — then extract with
    * the SHARED escape-free pattern and replay the canonicalization
    * string surgery step for step, so the canonical STRINGS and domains
    * hash-match. */
  /** q98/q101's SHARED planted-URL fixture (the q90 discipline: the
    * synthetic corpus carries no URLs) — one constant pair per dialect. */
  private val sqlUrlPlant: String =
    "CASE WHEN doc_id % 5 = 0 THEN text || ' see HTTPS://News.Site' || " +
      "CAST(doc_id % 20 AS VARCHAR) || '.Example.COM:443/Article/a' || " +
      "CAST(doc_id AS VARCHAR) || '?utm_source=feed&id=' || " +
      "CAST(doc_id AS VARCHAR) || '&utm_campaign=x#frag' " +
      "WHEN doc_id % 7 = 0 THEN text || ' ref http://cdn.mirror' || " +
      "CAST(doc_id % 10 AS VARCHAR) || '.example.org/asset?id=' || " +
      "CAST(doc_id AS VARCHAR) || " +
      "' also http://Blocked.Spam.example.net/x' ELSE text END"

  /** Spark twin of [[sqlUrlPlant]] (byte-identical planted strings). */
  private def urlPlantCol: org.apache.spark.sql.Column =
    when(col("doc_id") % 5 === 0,
      concat(col("text"), lit(" see HTTPS://News.Site"),
        (col("doc_id") % 20).cast("string"), lit(".Example.COM:443/Article/a"),
        col("doc_id").cast("string"), lit("?utm_source=feed&id="),
        col("doc_id").cast("string"), lit("&utm_campaign=x#frag")))
      .when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" ref http://cdn.mirror"),
          (col("doc_id") % 10).cast("string"), lit(".example.org/asset?id="),
          col("doc_id").cast("string"),
          lit(" also http://Blocked.Spam.example.net/x")))
      .otherwise(col("text"))

  /** The DuckDB replay of [[graft.operators.Urls.canonicalize]] /
    * `registeredDomain` over a `corpus(doc_id, text)` CTE — ends in a
    * `canon(doc_id, url_canon, domain)` CTE shared by q98 and q101. */
  private val sqlUrlCanonCtes: String =
    s"""u AS (SELECT doc_id,
       |             unnest(regexp_extract_all(text, '${Urls.UrlRe}', 0)) AS url
       |      FROM corpus),
       |c1 AS (SELECT doc_id, split_part(url, '#', 1) AS nofrag FROM u),
       |c2 AS (SELECT doc_id, nofrag,
       |              lower(split_part(nofrag, '://', 1)) AS scheme FROM c1),
       |c3 AS (SELECT doc_id, scheme,
       |              substr(nofrag, length(scheme) + 4) AS rest FROM c2),
       |c4 AS (SELECT doc_id, scheme, rest,
       |              split_part(split_part(rest, '/', 1), '?', 1) AS hostport
       |       FROM c3),
       |c5 AS (SELECT doc_id, scheme,
       |              lower(split_part(hostport, ':', 1)) AS host,
       |              substr(rest, length(hostport) + 1) AS tail FROM c4),
       |c6 AS (SELECT doc_id, scheme, host, tail,
       |              split_part(tail, '?', 1) AS path FROM c5),
       |c7 AS (SELECT doc_id, scheme, host, path,
       |              CASE WHEN contains(tail, '?')
       |                   THEN substr(tail, length(path) + 2) ELSE '' END AS q
       |       FROM c6),
       |c8 AS (SELECT doc_id, scheme, host, path,
       |              array_to_string(list_filter(str_split(q, '&'),
       |                p -> substr(p, 1, 4) <> 'utm_' AND p <> ''), '&') AS cq
       |       FROM c7),
       |canon AS (SELECT doc_id,
       |       scheme || '://' || host || path ||
       |         CASE WHEN cq <> '' THEN '?' || cq ELSE '' END AS url_canon,
       |       CASE WHEN len(str_split(host, '.')) < 2 THEN host
       |            ELSE str_split(host, '.')[-2] || '.' || str_split(host, '.')[-1]
       |            END AS domain
       |       FROM c8)""".stripMargin

  val q98 = Q(
    "q98_url_canonicalize",
    s"""WITH corpus AS (
       |  SELECT doc_id, $sqlUrlPlant AS text FROM documents),
       |$sqlUrlCanonCtes
       |SELECT doc_id, url_canon, domain
       |FROM canon ORDER BY doc_id, url_canon""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), urlPlantCol.as("text"))
    Urls.canonicalUrls(planted, "doc_id", "text")
      .orderBy("doc_id", "url_canon")
  }

  /** q101: per-document link statistics ([[graft.operators.Urls
    * .linkStats]]) over q98's planted corpus — URL count, DISTINCT
    * canonical count (the utm-variant collapse), distinct registered
    * domains, and exact integer-milli link density (the link-farm
    * signal). The oracle replays the canonicalization chain, both
    * DISTINCT rollups, the whitespace token count, and the integer
    * division. */
  val q101 = Q(
    "q101_link_stats",
    s"""WITH corpus AS (
       |  SELECT doc_id, $sqlUrlPlant AS text FROM documents),
       |$sqlUrlCanonCtes,
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_urls,
       |               CAST(COUNT(DISTINCT url_canon) AS BIGINT) AS n_canon,
       |               CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains
       |        FROM canon GROUP BY doc_id),
       |tok AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS nt FROM corpus)
       |SELECT t.doc_id,
       |       COALESCE(a.n_urls, 0) AS n_urls,
       |       COALESCE(a.n_canon, 0) AS n_canon,
       |       COALESCE(a.n_domains, 0) AS n_domains,
       |       CAST(CASE WHEN t.nt = 0 THEN 0
       |            ELSE COALESCE(a.n_urls, 0) * 1000 // t.nt END AS BIGINT)
       |         AS link_density_milli
       |FROM tok t LEFT JOIN agg a ON t.doc_id = a.doc_id
       |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), urlPlantCol.as("text"))
    Urls.linkStats(planted, "doc_id", "text").orderBy("doc_id")
  }

  /** DuckDB list literal from a Scala suffix table — the q104/q106
    * oracles consume the SAME [[graft.operators.PublicSuffix]]
    * constants the Spark expression ships, so the two dialects cannot
    * drift. */
  private def sqlStrList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** The PSL precedence CASE over prepared (host, p, np, l2, l3)
    * columns — the DuckDB twin of [[graft.operators.Urls
    * .registeredDomain]], shared by the q104 rollup and the q106
    * per-domain cap so the eTLD+1 replay is written once. */
  private val sqlPslCase: String =
    s"""CASE WHEN np < 2 THEN host
       |        WHEN list_contains(${sqlStrList(graft.operators.PublicSuffix.Exceptions)}, l2)
       |             THEN l2
       |        WHEN np >= 4 AND list_contains(${sqlStrList(graft.operators.PublicSuffix.ThreeLabel)}, l3)
       |             THEN p[-4] || '.' || l3
       |        WHEN np >= 3 AND (list_contains(${sqlStrList(graft.operators.PublicSuffix.TwoLabel)}, l2)
       |                          OR list_contains(${sqlStrList(graft.operators.PublicSuffix.WildcardTlds)}, p[-1]))
       |             THEN p[-3] || '.' || l2
       |        ELSE l2 END""".stripMargin

  /** q104: PSL-backed registered-domain rollup ([[graft.operators.Urls
    * .domainStats]]) — the planted-recovery audit for the eTLD+1 logic
    * itself: both dialects plant hosts that exercise every PSL branch
    * (ccTLD 2-label registries under extra subdomains, private
    * registries, a 3-label suffix, the `*.ck` wildcard, the `!www.ck`
    * exception, mixed case), and the oracle replays extraction, host
    * derivation, and the full precedence CASE against the SAME
    * snapshot tables inlined as list literals. */
  private val sqlPslPlant: String =
    "CASE WHEN doc_id % 5 = 0 THEN text || ' see http://WWW.BBC.co.uk/news/a' || " +
      "CAST(doc_id AS VARCHAR) || ' and https://Shop' || " +
      "CAST(doc_id % 3 AS VARCHAR) || '.Example.COM.AU/x' " +
      "WHEN doc_id % 7 = 0 THEN text || ' ref http://user' || " +
      "CAST(doc_id % 3 AS VARCHAR) || '.github.io/r also " +
      "http://sub.foo.ck/z plus http://www.ck/x' " +
      "WHEN doc_id % 11 = 0 THEN text || ' data http://b' || " +
      "CAST(doc_id % 2 AS VARCHAR) || '.s3.amazonaws.com/key' || " +
      "CAST(doc_id AS VARCHAR) ELSE text END"

  /** Spark twin of [[sqlPslPlant]] (byte-identical planted strings). */
  private def pslPlantCol: org.apache.spark.sql.Column =
    when(col("doc_id") % 5 === 0,
      concat(col("text"), lit(" see http://WWW.BBC.co.uk/news/a"),
        col("doc_id").cast("string"), lit(" and https://Shop"),
        (col("doc_id") % 3).cast("string"), lit(".Example.COM.AU/x")))
      .when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" ref http://user"),
          (col("doc_id") % 3).cast("string"),
          lit(".github.io/r also http://sub.foo.ck/z plus http://www.ck/x")))
      .when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" data http://b"),
          (col("doc_id") % 2).cast("string"), lit(".s3.amazonaws.com/key"),
          col("doc_id").cast("string")))
      .otherwise(col("text"))

  val q104 = Q(
    "q104_psl_domain_rollup",
    s"""WITH corpus AS (
       |  SELECT doc_id, $sqlPslPlant AS text FROM documents),
       |u AS (SELECT doc_id,
       |             unnest(regexp_extract_all(text, '${graft.operators.Urls.UrlRe}', 0)) AS url
       |      FROM corpus),
       |h AS (SELECT doc_id,
       |             lower(split_part(split_part(split_part(split_part(
       |               url, '://', 2), '/', 1), '?', 1), ':', 1)) AS host
       |      FROM u),
       |parts AS (SELECT doc_id, host, str_split(host, '.') AS p FROM h),
       |lbl AS (SELECT doc_id, host, p, len(p) AS np,
       |               p[-2] || '.' || p[-1] AS l2,
       |               p[-3] || '.' || p[-2] || '.' || p[-1] AS l3
       |        FROM parts),
       |dom AS (SELECT doc_id, $sqlPslCase AS domain
       |   FROM lbl)
       |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
       |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM dom GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), pslPlantCol.as("text"))
    graft.operators.Urls.domainStats(planted, "doc_id", "text")
      .orderBy("domain")
  }

  /** q106: per-domain document cap ([[graft.operators.Urls
    * .perDomainCap]]) — the host-level crowding control (≤ cap docs
    * per registered domain, content-addressed survivor choice). The
    * oracle replays first-URL extraction, the full PSL precedence
    * ([[sqlPslCase]] — same planted hosts as q104, so every eTLD+1
    * branch feeds the cap key), the q53 hash order, and the window
    * rank; no-URL docs come back EXEMPT with NULL domain/pick. The
    * Spark side serves the same selection through the bounded
    * [[graft.operators.TopKAgg]] shape (map-side ≤ cap rows per domain
    * per partition), so the green row pins that the skew-proof
    * aggregator IS the window semantics. */
  val q106 = Q(
    "q106_domain_cap",
    s"""WITH corpus AS (SELECT doc_id, $sqlPslPlant AS text FROM documents),
       |f AS (SELECT doc_id,
       |             regexp_extract(text, '${graft.operators.Urls.UrlRe}', 0) AS url
       |      FROM corpus),
       |h AS (SELECT doc_id,
       |             lower(split_part(split_part(split_part(split_part(
       |               url, '://', 2), '/', 1), '?', 1), ':', 1)) AS host
       |      FROM f WHERE url IS NOT NULL AND url <> ''),
       |lbl AS (SELECT doc_id, host, p, len(p) AS np,
       |               p[-2] || '.' || p[-1] AS l2,
       |               p[-3] || '.' || p[-2] || '.' || p[-1] AS l3
       |        FROM (SELECT doc_id, host, str_split(host, '.') AS p FROM h)),
       |dom AS (SELECT doc_id, $sqlPslCase AS domain FROM lbl),
       |hv AS (SELECT doc_id, domain,
       |              ${sqlHash("CAST(doc_id AS VARCHAR)")} AS hv
       |       FROM dom),
       |r AS (SELECT doc_id, domain, ROW_NUMBER() OVER (
       |        PARTITION BY domain ORDER BY hv, doc_id) AS rn
       |      FROM hv),
       |kept AS (SELECT doc_id, domain, CAST(rn AS BIGINT) AS pick
       |         FROM r WHERE rn <= 3),
       |exempt AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS domain,
       |                  CAST(NULL AS BIGINT) AS pick
       |           FROM f WHERE url IS NULL OR url = '')
       |SELECT doc_id, domain, pick FROM kept
       |UNION ALL SELECT doc_id, domain, pick FROM exempt
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir)
      .select(col("doc_id"), pslPlantCol.as("text"))
    Urls.perDomainCap(planted, "doc_id", "text", cap = 3)
      .orderBy("doc_id")
  }

  /** q107: hashed linear quality-classifier inference
    * ([[graft.operators.Classify]]) — the fastText-shaped gate: a
    * count-derived integer evidence table (per-bucket
    * `pos_ppm − neg_ppm`, trained on the lang='en' slice vs the rest)
    * scored as one in-scan fold per document. The oracle re-derives
    * BOTH class distributions, the 1024-entry weight list, and every
    * per-token lookup-sum — transcendental-free, integer end to end,
    * so train + inference hash-match exactly. The Spark plan scores
    * with zero joins (the weight table rides as a literal); the
    * oracle's join formulation is the same arithmetic. */
  val q107 = Q(
    "q107_quality_classifier",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |posb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
       |post AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM posb),
       |negb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang <> 'en' GROUP BY b),
       |negt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM negb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |wt AS (SELECT grid.b,
       |              CAST(COALESCE(posb.c, 0) * 1000000 // post.t AS BIGINT)
       |            - CAST(COALESCE(negb.c, 0) * 1000000 // negt.t AS BIGINT)
       |              AS w
       |       FROM grid
       |       LEFT JOIN posb ON posb.b = grid.b
       |       LEFT JOIN negb ON negb.b = grid.b, post, negt),
       |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
       |              CAST(SUM(wt.w) AS BIGINT) AS score_ppm
       |       FROM tw JOIN wt ON wt.b = tw.b GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(COALESCE(sc.n_feat, 0) AS BIGINT) AS n_feat,
       |       CAST(COALESCE(sc.score_ppm, 0) AS BIGINT) AS score_ppm,
       |       CAST(CASE WHEN COALESCE(sc.score_ppm, 0) >= 0
       |            THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val w = graft.operators.Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 1024)
    graft.operators.Classify.linearScore(docs, "doc_id", "text", w)
      .orderBy("doc_id")
  }

  /** q108: per-source classifier quality rollup ([[graft.operators
    * .Classify.sourceReport]]) — the data-card audit over the q107
    * model: same evidence derivation, then per-source counts and
    * integer evidence TOTALS (sums, never means — division-sign-free,
    * so the whole table hash-matches). Feature-free docs count in
    * n_docs but not n_scored/n_pos. */
  val q108 = Q(
    "q108_classifier_sources",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |posb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
       |post AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM posb),
       |negb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang <> 'en' GROUP BY b),
       |negt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM negb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |wt AS (SELECT grid.b,
       |              CAST(COALESCE(posb.c, 0) * 1000000 // post.t AS BIGINT)
       |            - CAST(COALESCE(negb.c, 0) * 1000000 // negt.t AS BIGINT)
       |              AS w
       |       FROM grid
       |       LEFT JOIN posb ON posb.b = grid.b
       |       LEFT JOIN negb ON negb.b = grid.b, post, negt),
       |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
       |              CAST(SUM(wt.w) AS BIGINT) AS score_ppm
       |       FROM tw JOIN wt ON wt.b = tw.b GROUP BY doc_id)
       |SELECT d.source,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN COALESCE(sc.n_feat, 0) > 0
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       |       CAST(SUM(CASE WHEN COALESCE(sc.n_feat, 0) > 0
       |                     AND COALESCE(sc.score_ppm, 0) >= 0
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |       CAST(SUM(COALESCE(sc.score_ppm, 0)) AS BIGINT) AS sum_score_ppm,
       |       CAST(SUM(COALESCE(sc.n_feat, 0)) AS BIGINT) AS sum_feat
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val w = graft.operators.Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 1024)
    graft.operators.Classify.sourceReport(docs, "doc_id", "text",
      "source", w)
      .orderBy("source")
  }

  /** q109: classifier threshold-calibration sweep ([[graft.operators
    * .Classify.thresholdSweep]]) — the q107 model swept over a ladder
    * of per-feature thresholds with the gate's own
    * multiplication-form predicate; per threshold, the scoreable
    * survivor count and integer-milli kept fraction. Counts and floor
    * divisions of non-negatives only — hash-exact. */
  val q109 = Q(
    "q109_classifier_sweep",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |posb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
       |post AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM posb),
       |negb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang <> 'en' GROUP BY b),
       |negt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM negb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |wt AS (SELECT grid.b,
       |              CAST(COALESCE(posb.c, 0) * 1000000 // post.t AS BIGINT)
       |            - CAST(COALESCE(negb.c, 0) * 1000000 // negt.t AS BIGINT)
       |              AS w
       |       FROM grid
       |       LEFT JOIN posb ON posb.b = grid.b
       |       LEFT JOIN negb ON negb.b = grid.b, post, negt),
       |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
       |              CAST(SUM(wt.w) AS BIGINT) AS score_ppm
       |       FROM tw JOIN wt ON wt.b = tw.b GROUP BY doc_id),
       |thr AS (SELECT CAST(unnest([-500, -400, -300, -200, -100, 0,
       |                            100, 200, 300, 400, 500]) AS BIGINT)
       |               AS thr_ppm)
       |SELECT thr_ppm,
       |       CAST(COUNT(*) AS BIGINT) AS n_scored,
       |       CAST(SUM(CASE WHEN score_ppm >= thr_ppm * n_feat
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN score_ppm >= thr_ppm * n_feat
       |                THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
       |         AS kept_milli
       |FROM sc, thr
       |GROUP BY thr_ppm
       |ORDER BY thr_ppm""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val w = graft.operators.Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 1024)
    graft.operators.Classify.thresholdSweep(docs, "doc_id", "text", w,
      thresholds = (-5L to 5L).map(_ * 100))
      .orderBy("thr_ppm")
  }

  /** q99: DSIR-style importance weights ([[graft.operators.Mixing
    * .dsirWeights]]) — hashed-unigram bucket ppm of the RAW corpus vs
    * the TARGET slice (lang = 'en'), per-bucket ratio `(t_ppm + 1) /
    * (r_ppm + 1)` as one double division, per-doc weight = the
    * ascending-bucket product fold over ≤ 64 distinct feature buckets.
    * The oracle re-derives both integer-ppm distributions, the ratio
    * list, and the exact `list_reduce` product — transcendental-free,
    * so the weights hash-match bitwise at 6 dp. */
  val q99 = Q(
    "q99_dsir_weights",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |rawb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw GROUP BY b),
       |rawt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM rawb),
       |ttok AS (SELECT unnest($sqlToks) AS w FROM documents WHERE lang = 'en'),
       |ttw AS (SELECT ${sqlHash("w")} % 1024 AS b FROM ttok WHERE w <> ''),
       |tgtb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ttw GROUP BY b),
       |tgtt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tgtb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |ratio AS (SELECT grid.b,
       |                 CAST(COALESCE(tgtb.c, 0) * 1000000 // tgtt.t + 1 AS DOUBLE)
       |               / CAST(COALESCE(rawb.c, 0) * 1000000 // rawt.t + 1 AS DOUBLE)
       |                 AS rr
       |          FROM grid
       |          LEFT JOIN rawb ON rawb.b = grid.b
       |          LEFT JOIN tgtb ON tgtb.b = grid.b, rawt, tgtt),
       |rlist AS (SELECT list(rr ORDER BY b) AS arr FROM ratio),
       |feats AS (SELECT doc_id, list_sort(list(DISTINCT b)) AS fb
       |          FROM tw GROUP BY doc_id),
       |capped AS (SELECT doc_id, fb[1:64] AS fb FROM feats),
       |scored AS (SELECT doc_id, CAST(len(fb) AS BIGINT) AS n_feat,
       |                  ROUND(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
       |                    list_transform(fb, x -> arr[CAST(x AS INTEGER) + 1])),
       |                    (p, q) -> p * q), 6) AS weight_r
       |           FROM capped, rlist)
       |SELECT d.doc_id,
       |       CAST(COALESCE(scored.n_feat, 0) AS BIGINT) AS n_feat,
       |       COALESCE(scored.weight_r, 1.0) AS weight_r
       |FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Mixing.dsirWeights(docs, "doc_id", "text",
      docs.filter(col("lang") === "en"), "text",
      buckets = 1024, maxFeatures = 64)
      .orderBy("doc_id")
  }

  /** q100: deterministic EPOCH SHUFFLE ([[graft.operators.Mixing
    * .epochShuffle]]) — the dataloader-ordering artifact: content-hash
    * key over `seed:id`, contiguous-key-range shards (one GLOBAL
    * permutation sliced into files), per-shard rank. The oracle replays
    * the hash, the integer shard arithmetic, and the window rank. */
  val q100 = Q(
    "q100_epoch_shuffle",
    s"""WITH k AS (SELECT doc_id,
       |                 (${sqlHash("'7:' || CAST(doc_id AS VARCHAR)")}
       |                  * 2654435761) % 2147483647 AS ek
       |           FROM documents),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard FROM k)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |       CAST(ROW_NUMBER() OVER (
       |         PARTITION BY shard ORDER BY ek, doc_id) AS BIGINT) AS pos
       |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Mixing.epochShuffle(Tables.documents(s, dir).select(col("doc_id")),
      "doc_id", seed = 7L, nShards = 8)
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  /** q103: DSIR-WEIGHTED SAMPLING ([[graft.operators.Mixing
    * .dsirRateMix]]) — q99's importance weights composed with the
    * mixers' content-addressed ppm gate: keep probability proportional
    * to the clipped weight, normalized to an expected `budget` of 100
    * documents. The oracle re-derives the full q99 weight pipeline,
    * the integer clip/sum/base arithmetic, the per-doc rate, and the
    * Knuth-mixed membership hash — every decision replayed bitwise. */
  val q103 = Q(
    "q103_dsir_rate_mix",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |rawb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw GROUP BY b),
       |rawt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM rawb),
       |ttok AS (SELECT unnest($sqlToks) AS w FROM documents WHERE lang = 'en'),
       |ttw AS (SELECT ${sqlHash("w")} % 1024 AS b FROM ttok WHERE w <> ''),
       |tgtb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ttw GROUP BY b),
       |tgtt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tgtb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |ratio AS (SELECT grid.b,
       |                 CAST(COALESCE(tgtb.c, 0) * 1000000 // tgtt.t + 1 AS DOUBLE)
       |               / CAST(COALESCE(rawb.c, 0) * 1000000 // rawt.t + 1 AS DOUBLE)
       |                 AS rr
       |          FROM grid
       |          LEFT JOIN rawb ON rawb.b = grid.b
       |          LEFT JOIN tgtb ON tgtb.b = grid.b, rawt, tgtt),
       |rlist AS (SELECT list(rr ORDER BY b) AS arr FROM ratio),
       |feats AS (SELECT doc_id, list_sort(list(DISTINCT b)) AS fb
       |          FROM tw GROUP BY doc_id),
       |capped AS (SELECT doc_id, fb[1:64] AS fb FROM feats),
       |scored AS (SELECT doc_id, CAST(len(fb) AS BIGINT) AS n_feat,
       |                  ROUND(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
       |                    list_transform(fb, x -> arr[CAST(x AS INTEGER) + 1])),
       |                    (p, q) -> p * q), 6) AS weight_r
       |           FROM capped, rlist),
       |allw AS (SELECT d.doc_id,
       |                CAST(COALESCE(scored.n_feat, 0) AS BIGINT) AS n_feat,
       |                COALESCE(scored.weight_r, 1.0) AS weight_r
       |         FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id),
       |wm AS (SELECT doc_id, n_feat, weight_r,
       |              CAST(floor(least(weight_r, 1000.0) * 1000) AS BIGINT)
       |                AS wmilli
       |       FROM allw),
       |tot AS (SELECT CAST(SUM(wmilli) AS BIGINT) AS w FROM wm),
       |base AS (SELECT CAST(100000000000 AS BIGINT) // w AS bp FROM tot)
       |SELECT doc_id, n_feat, weight_r,
       |       CAST(least(1000000, base.bp * wm.wmilli // 1000) AS BIGINT)
       |         AS rate_ppm
       |FROM wm, base
       |WHERE ((${sqlHash("CAST(doc_id AS VARCHAR)")} * 2654435761)
       |       % $P) % 1000000
       |      < least(1000000, base.bp * wm.wmilli // 1000)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Mixing.dsirRateMix(docs, "doc_id", "text",
      docs.filter(col("lang") === "en"), "text", budget = 100L,
      buckets = 1024, maxFeatures = 64)
      .select("doc_id", "n_feat", "weight_r", "rate_ppm")
      .orderBy("doc_id")
  }

  /** q105: DSIR resampling in TOKEN units ([[graft.operators.Mixing
    * .dsirRateMixTokens]]) — q103's weight-proportional gate normalized
    * to an expected kept-TOKEN total (the doc/token duality q74/q81
    * established for temperature mixing): `base = budget·10⁹ div
    * Σ(w_milli·n_tok)`. The oracle replays the q99 weight chain, the
    * whitespace token counts, the weighted token mass, and the gate. */
  val q105 = Q(
    "q105_dsir_token_mix",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |rawb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw GROUP BY b),
       |rawt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM rawb),
       |ttok AS (SELECT unnest($sqlToks) AS w FROM documents WHERE lang = 'en'),
       |ttw AS (SELECT ${sqlHash("w")} % 1024 AS b FROM ttok WHERE w <> ''),
       |tgtb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ttw GROUP BY b),
       |tgtt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tgtb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |ratio AS (SELECT grid.b,
       |                 CAST(COALESCE(tgtb.c, 0) * 1000000 // tgtt.t + 1 AS DOUBLE)
       |               / CAST(COALESCE(rawb.c, 0) * 1000000 // rawt.t + 1 AS DOUBLE)
       |                 AS rr
       |          FROM grid
       |          LEFT JOIN rawb ON rawb.b = grid.b
       |          LEFT JOIN tgtb ON tgtb.b = grid.b, rawt, tgtt),
       |rlist AS (SELECT list(rr ORDER BY b) AS arr FROM ratio),
       |feats AS (SELECT doc_id, list_sort(list(DISTINCT b)) AS fb
       |          FROM tw GROUP BY doc_id),
       |capped AS (SELECT doc_id, fb[1:64] AS fb FROM feats),
       |scored AS (SELECT doc_id, CAST(len(fb) AS BIGINT) AS n_feat,
       |                  ROUND(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
       |                    list_transform(fb, x -> arr[CAST(x AS INTEGER) + 1])),
       |                    (p, q) -> p * q), 6) AS weight_r
       |           FROM capped, rlist),
       |tk AS (SELECT doc_id, CAST(COALESCE(len($sqlToks), 0) AS BIGINT) AS nt
       |       FROM documents),
       |allw AS (SELECT d.doc_id, tk.nt,
       |                CAST(COALESCE(scored.n_feat, 0) AS BIGINT) AS n_feat,
       |                COALESCE(scored.weight_r, 1.0) AS weight_r
       |         FROM documents d
       |         JOIN tk ON tk.doc_id = d.doc_id
       |         LEFT JOIN scored ON d.doc_id = scored.doc_id),
       |wm AS (SELECT doc_id, n_feat, weight_r, nt,
       |              CAST(floor(least(weight_r, 1000.0) * 1000) AS BIGINT)
       |                AS wmilli
       |       FROM allw),
       |tot AS (SELECT CAST(SUM(wmilli * nt) AS BIGINT) AS w FROM wm),
       |base AS (SELECT CAST(5000000000000 AS BIGINT) // w AS bp FROM tot)
       |SELECT doc_id, n_feat, weight_r,
       |       CAST(least(1000000, base.bp * wm.wmilli // 1000) AS BIGINT)
       |         AS rate_ppm
       |FROM wm, base
       |WHERE ((${sqlHash("CAST(doc_id AS VARCHAR)")} * 2654435761)
       |       % $P) % 1000000
       |      < least(1000000, base.bp * wm.wmilli // 1000)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Mixing.dsirRateMixTokens(docs, "doc_id", "text",
      docs.filter(col("lang") === "en"), "text", budgetTokens = 5000L,
      buckets = 1024, maxFeatures = 64)
      .select("doc_id", "n_feat", "weight_r", "rate_ppm")
      .orderBy("doc_id")
  }

  /** q110: GRADIENT-trained classifier under the oracle gate
    * ([[graft.operators.Classify.perceptronWeights]]) — the averaged
    * integer perceptron's training LOOP replayed bitwise in DuckDB via
    * a RECURSIVE CTE that carries the weight vector and its running
    * sum as integer lists and steps ONE training example per
    * iteration, exactly the trainer's arithmetic: ascending-id sample
    * of ≤ 64 docs per class, epochs × n sequential mistake-driven
    * `w += y·x` updates (x = the doc's per-bucket feature counts),
    * `acc += w` after EVERY example, final artifact = the unnormalized
    * sum. The q97/q102 exact-replay discipline extended from
    * round-synchronous Lloyd iterations to a PER-EXAMPLE sequential
    * learner — the state row is the whole model. Knobs are small
    * (B=128, 2 epochs, 64/class → 256 steps) because the replay cost
    * is the oracle's, not Spark's: the Spark trainer collects the same
    * bounded sample regardless of corpus scale. Inference is q107's
    * zero-join in-scan fold against the trained literal. */
  val q110 = Q(
    "q110_perceptron_replay",
    s"""WITH RECURSIVE
       |tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS MATERIALIZED (SELECT doc_id, w, ${sqlHash("w")} % 128 AS b
       |      FROM tok WHERE w <> ''),
       |samp AS MATERIALIZED (
       |  (SELECT doc_id, CAST(1 AS BIGINT) AS yy FROM documents
       |   WHERE lang = 'en' ORDER BY doc_id LIMIT 64)
       |  UNION ALL
       |  (SELECT doc_id, CAST(-1 AS BIGINT) AS yy FROM documents
       |   WHERE lang <> 'en' ORDER BY doc_id LIMIT 64)),
       |ex AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY s.doc_id) - 1 AS rn, s.yy,
       |         COALESCE(g.bsl, []) AS bsl,
       |         list_transform(range(128),
       |           j -> CAST(COALESCE(len(list_filter(g.bsl, b -> b = j)), 0)
       |                AS BIGINT)) AS cnt
       |  FROM samp s LEFT JOIN (SELECT doc_id, list(b) AS bsl FROM tw
       |                         JOIN samp USING (doc_id) GROUP BY doc_id) g
       |    ON s.doc_id = g.doc_id),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM ex),
       |steps AS (
       |  SELECT CAST(0 AS BIGINT) AS i,
       |         list_transform(range(128), j -> CAST(0 AS BIGINT)) AS w,
       |         list_transform(range(128), j -> CAST(0 AS BIGINT)) AS acc
       |  UNION ALL
       |  SELECT s.i + 1,
       |         list_transform(range(128), j -> s.w[j+1] +
       |           CASE WHEN COALESCE(list_sum(
       |                  list_transform(e.bsl, b -> s.w[b+1])), 0) * e.yy <= 0
       |                THEN e.yy * e.cnt[j+1] ELSE 0 END),
       |         list_transform(range(128), j -> s.acc[j+1] + s.w[j+1] +
       |           CASE WHEN COALESCE(list_sum(
       |                  list_transform(e.bsl, b -> s.w[b+1])), 0) * e.yy <= 0
       |                THEN e.yy * e.cnt[j+1] ELSE 0 END)
       |  FROM steps s, nn JOIN ex e ON e.rn = s.i % nn.n
       |  WHERE s.i < 2 * nn.n),
       |fin AS (SELECT acc FROM steps, nn WHERE i = 2 * nn.n),
       |wt AS (SELECT CAST(g.j AS BIGINT) AS b, f.acc[g.j + 1] AS w
       |       FROM fin f, range(0, 128) g(j)),
       |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
       |              CAST(SUM(wt.w) AS BIGINT) AS score_ppm
       |       FROM tw JOIN wt ON wt.b = tw.b GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(COALESCE(sc.n_feat, 0) AS BIGINT) AS n_feat,
       |       CAST(COALESCE(sc.score_ppm, 0) AS BIGINT) AS score_ppm,
       |       CAST(CASE WHEN COALESCE(sc.score_ppm, 0) >= 0
       |            THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val w = graft.operators.Classify.perceptronWeights(docs, "doc_id",
      "text", positive = col("lang") === "en", buckets = 128, ngram = 1,
      epochs = 2, maxPerClass = 64)
    graft.operators.Classify.linearScore(docs, "doc_id", "text", w)
      .orderBy("doc_id")
  }

  /** q112: CURRICULUM schedule ([[graft.operators.Mixing
    * .curriculumOrder]]) — the classifier tier composed with the epoch
    * shuffle: tier = rungs of the threshold ladder cleared
    * (multiplication-form, q109's semantics on q107's evidence model),
    * order within a tier = the Knuth-mixed shuffle key sliced into
    * contiguous-key-range shards (q100's artifact, per tier). The
    * oracle re-derives the weight table, every rung predicate, the
    * mixed key, the shard arithmetic, and the (tier, shard) window
    * rank. */
  /** q112/q123's shared curriculum CTE chain: the q107 evidence model
    * re-derived, the 3-rung ladder tier, the seed-5 mixed key, the
    * 8-shard slice — ends at `s(doc_id, tier, ek, shard)`. */
  private val curriculumChainCte: String =
    s"""tok AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |tw AS (SELECT doc_id, w, ${sqlHash("w")} % 1024 AS b
       |       FROM tok WHERE w <> ''),
       |posb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
       |post AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM posb),
       |negb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tw
       |         JOIN documents USING (doc_id) WHERE lang <> 'en' GROUP BY b),
       |negt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM negb),
       |grid AS (SELECT CAST(g.b AS BIGINT) AS b FROM range(0, 1024) g(b)),
       |wt AS (SELECT grid.b,
       |              CAST(COALESCE(posb.c, 0) * 1000000 // post.t AS BIGINT)
       |            - CAST(COALESCE(negb.c, 0) * 1000000 // negt.t AS BIGINT)
       |              AS w
       |       FROM grid
       |       LEFT JOIN posb ON posb.b = grid.b
       |       LEFT JOIN negb ON negb.b = grid.b, post, negt),
       |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
       |              CAST(SUM(wt.w) AS BIGINT) AS score_ppm
       |       FROM tw JOIN wt ON wt.b = tw.b GROUP BY doc_id),
       |alld AS (SELECT d.doc_id,
       |                CAST(COALESCE(sc.n_feat, 0) AS BIGINT) AS nf,
       |                CAST(COALESCE(sc.score_ppm, 0) AS BIGINT) AS s
       |         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
       |t AS (SELECT doc_id,
       |             CAST(CASE WHEN s >= -1000 * nf THEN 1 ELSE 0 END
       |                + CASE WHEN s >= 0 THEN 1 ELSE 0 END
       |                + CASE WHEN s >= 1000 * nf THEN 1 ELSE 0 END
       |               AS BIGINT) AS tier,
       |             (${sqlHash("'5:' || CAST(doc_id AS VARCHAR)")}
       |              * 2654435761) % 2147483647 AS ek
       |      FROM alld),
       |s AS (SELECT doc_id, tier, ek,
       |             (ek * 8) // 2147483647 AS shard FROM t)""".stripMargin

  /** The q112/q123 Spark-side curriculum frame: the trained evidence
    * model + [[graft.operators.Mixing.curriculumOrder]] at the fixture
    * knobs. */
  private def curriculumFrame(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = graft.operators.Classify.evidenceWeights(
      docs.filter(col("lang") === "en"), "text",
      docs.filter(col("lang") =!= "en"), "text", buckets = 1024)
    graft.operators.Mixing.curriculumOrder(docs, "doc_id", "text", w,
      thresholds = Seq(-1000L, 0L, 1000L), seed = 5L, nShards = 8)
  }

  val q112 = Q(
    "q112_curriculum",
    s"""WITH $curriculumChainCte
       |SELECT doc_id, tier, CAST(shard AS BIGINT) AS shard,
       |       CAST(ROW_NUMBER() OVER (
       |         PARTITION BY tier, shard ORDER BY ek, doc_id) AS BIGINT)
       |         AS pos
       |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    curriculumFrame(s, dir)
      .select("doc_id", "tier", "shard", "pos")
      .orderBy("doc_id")
  }

  /** The q113 recipe: an explicit target mixture over the fixture's 20
    * sources — src0/src1 deliberately oversubscribed (40%/30% of the
    * budget against ~1.4k-token stocks at sf0.01) so the water-filling
    * redistribution actually fires in the oracle-checked run. */
  private val MixRecipe: Seq[(String, Long)] =
    Seq("src0" -> 400000L, "src1" -> 300000L) ++
      (2 to 19).map(i => s"src$i" -> 16667L)

  /** One water-filling round as materialized CTEs (the q102 unrolling
    * discipline — DuckDB inlines plain CTEs per reference, exponential
    * in rounds): from `r{k-1}` derive the pool aggregates, the offers,
    * the any-new-saturation flag, and `r{k}`. */
  private def sqlMixRound(k: Int, budget: Long): String =
    s"""agg$k AS MATERIALIZED (
       |  SELECT CAST($budget - COALESCE(SUM(take), 0) AS BIGINT) AS remb,
       |         CAST(COALESCE(SUM(CASE WHEN take IS NULL THEN w END), 0)
       |              AS BIGINT) AS sumw
       |  FROM r${k - 1}),
       |des$k AS MATERIALIZED (
       |  SELECT source, avail, w, take, rnd,
       |         CASE WHEN take IS NOT NULL THEN NULL
       |              WHEN sumw = 0 THEN 0
       |              ELSE remb * w // sumw END AS des
       |  FROM r${k - 1}, agg$k),
       |sat$k AS MATERIALIZED (
       |  SELECT COALESCE(MAX(CASE WHEN take IS NULL AND des >= avail
       |                       THEN 1 ELSE 0 END), 0) AS anysat
       |  FROM des$k),
       |r$k AS MATERIALIZED (
       |  SELECT source, avail, w,
       |         CASE WHEN take IS NOT NULL THEN take
       |              WHEN des >= avail THEN avail
       |              WHEN anysat = 0 THEN des
       |              ELSE NULL END AS take,
       |         CASE WHEN take IS NOT NULL THEN rnd
       |              WHEN des >= avail OR anysat = 0 THEN $k
       |              ELSE NULL END AS rnd
       |  FROM des$k, sat$k)""".stripMargin

  /** q113: WATER-FILLING mixture plan ([[graft.operators.Mixing
    * .mixturePlan]]) — an explicit target recipe honored against
    * per-source token availability under a global budget, with
    * saturated sources' unfilled shares REDISTRIBUTED (where the
    * temperature mixers just clip). The oracle unrolls every
    * round-synchronous water-filling iteration as materialized CTEs
    * (21 = |sources|+1, always enough: each non-final round saturates
    * at least one source) and replays the offers, the saturation set,
    * the fixing round, and the final rates — integer end to end. */
  val q113 = Q(
    "q113_mixture_plan",
    s"""WITH tok AS (SELECT source, CAST(len($sqlToks) AS BIGINT) AS nt
       |            FROM documents),
       |n AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS avail
       |      FROM tok GROUP BY source),
       |wmap(source, w) AS (VALUES ${MixRecipe.map { case (s, w) =>
          s"('$s', CAST($w AS BIGINT))" }.mkString(", ")}),
       |r0 AS (SELECT n.source, n.avail, wmap.w,
       |              CAST(NULL AS BIGINT) AS take,
       |              CAST(NULL AS BIGINT) AS rnd
       |       FROM n JOIN wmap USING (source)),
       |${(1 to 21).map(sqlMixRound(_, 10000L)).mkString(",\n")}
       |SELECT source, avail AS avail_tokens, w AS weight_ppm,
       |       CAST(take AS BIGINT) AS take_tokens,
       |       CAST(CASE WHEN avail = 0 THEN 0
       |            ELSE take * 1000000 // avail END AS BIGINT) AS rate_ppm,
       |       rnd AS round_fixed
       |FROM r21 ORDER BY source""".stripMargin) { (s, dir) =>
    graft.operators.Mixing.mixturePlan(Tables.documents(s, dir),
      "doc_id", "source", "text", MixRecipe.toMap, budget = 10000L)
      .orderBy("source")
  }

  /** q114: REPETITION-EXPANDED mixture corpus ([[graft.operators.Mixing
    * .mixtureEpochsDocs]]) — the data-constrained plan made consumable:
    * at budget 30000 over ~27k available tokens with maxEpochs = 3, the
    * oversubscribed src0/src1 saturate at THREE full micro-epochs
    * (every doc emitted 3×) while the rest land on a sub-1.0 rate
    * (partial epoch only, ppm-gated per doc). The oracle re-derives the
    * epoch-capped water-filling plan (21 unrolled rounds on the
    * tripled stocks), the per-source micro-epoch rates, the full-epoch
    * expansion, and the partial-epoch hash gate. */
  val q114 = Q(
    "q114_mixture_epochs",
    s"""WITH tok AS (SELECT source, CAST(len($sqlToks) AS BIGINT) AS nt
       |            FROM documents),
       |n AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS avail
       |      FROM tok GROUP BY source),
       |wmap(source, w) AS (VALUES ${MixRecipe.map { case (s, w) =>
          s"('$s', CAST($w AS BIGINT))" }.mkString(", ")}),
       |r0 AS (SELECT n.source, n.avail * 3 AS avail, wmap.w,
       |              CAST(NULL AS BIGINT) AS take,
       |              CAST(NULL AS BIGINT) AS rnd
       |       FROM n JOIN wmap USING (source)),
       |${(1 to 21).map(sqlMixRound(_, 30000L)).mkString(",\n")},
       |rate AS (SELECT n.source,
       |                CAST(r.take * 1000000 // n.avail AS BIGINT)
       |                  AS rate_ppm
       |         FROM n JOIN r21 r USING (source)),
       |sel AS (SELECT d.doc_id,
       |               CAST(r.rate_ppm // 1000000 AS BIGINT) AS nfull,
       |               CASE WHEN ((${sqlHash("CAST(doc_id AS VARCHAR)")}
       |                          * 2654435761) % $P) % 1000000
       |                         < r.rate_ppm % 1000000
       |                    THEN 1 ELSE 0 END AS part
       |        FROM documents d JOIN rate r USING (source))
       |SELECT doc_id, CAST(epoch_no AS BIGINT) AS epoch_no FROM (
       |  SELECT doc_id,
       |         unnest(range(1, CAST(nfull + part AS INTEGER) + 1))
       |           AS epoch_no
       |  FROM sel)
       |ORDER BY doc_id, epoch_no""".stripMargin) { (s, dir) =>
    graft.operators.Mixing.mixtureEpochsDocs(Tables.documents(s, dir),
      "doc_id", "source", "text", MixRecipe.toMap, budget = 30000L,
      maxEpochs = 3L)
      .select(col("doc_id"), col("epoch_no"))
      .orderBy("doc_id", "epoch_no")
  }

  /** q115/q116's shared MULTI-LINE fixture: the synthetic corpus is
    * single-line, so both line-dedup queries first re-chunk each document
    * into 3-word lines (the q90 planted-fixture discipline — derive the
    * shape the operator needs DETERMINISTICALLY from the real table, with
    * the identical expression on both sides). Width 3 is the measured
    * sweet spot at sf0.01: ~9.2k lines / ~7.5k distinct — ~19% duplicated
    * mass for keep-first, a small ≥8-occurrence head for the frequency
    * scrub, and plenty of untouched docs to pin byte-identity. */
  private def lineFixture(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        when(size(col("w")) === lit(0), lit(""))
          .otherwise(concat_ws("\n",
            transform(sequence(lit(1), size(col("w")), lit(3)),
              i => concat_ws(" ", slice(col("w"), i, lit(3))))))
          .as("text"))

  private val lineFixtureCte: String =
    s"""toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |rel AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN '' ELSE
       |          array_to_string(list_transform(range(1, len(w) + 1, 3),
       |            i -> array_to_string(w[i:i+2], ' ')), chr(10)) END AS text
       |        FROM toks),
       |ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM rel),
       |lines AS (SELECT doc_id, CAST(t.i - 1 AS INT) AS p, ls[t.i] AS l
       |          FROM ls, UNNEST(range(1, len(ls) + 1)) AS t(i)),
       |ne AS (SELECT doc_id, p, ${sqlWideHash("trim(l)")} AS k
       |       FROM lines WHERE trim(l) <> '')""".stripMargin

  /** The shared rebuild tail: every line except the flagged positions,
    * position-ordered, untouched docs verbatim — mirrors
    * [[graft.operators.Dedup.dedupLinesKeepFirst]]'s rewrite half. */
  private val lineRebuildSql: String =
    s"""kept AS (SELECT lines.doc_id, lines.p, lines.l FROM lines
       |         LEFT JOIN rem ON lines.doc_id = rem.doc_id
       |           AND lines.p = rem.p
       |         WHERE rem.doc_id IS NULL),
       |agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY p)
       |          AS clean_text FROM kept GROUP BY doc_id),
       |nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM rem
       |         GROUP BY doc_id)
       |SELECT rel.doc_id,
       |       CASE WHEN nrem.doc_id IS NULL THEN rel.text
       |            ELSE COALESCE(agg.clean_text, '') END AS clean_text,
       |       CAST(COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_removed
       |FROM rel
       |LEFT JOIN agg ON rel.doc_id = agg.doc_id
       |LEFT JOIN nrem ON rel.doc_id = nrem.doc_id
       |ORDER BY rel.doc_id""".stripMargin

  /** q115: CORPUS-WIDE LINE DEDUP, keep-first
    * ([[graft.operators.Dedup.dedupLinesKeepFirst]]) — the CCNet/Dolma
    * paragraph-dedup primitive: a (trimmed) line occurring ≥ 2 times
    * across the corpus keeps only its global first occurrence (smallest
    * `(doc_id, position)`), every later copy is deleted and each document
    * reassembles from its surviving lines. The oracle re-derives the
    * trimmed-line hash with the operator's exact 62-bit polynomial,
    * replays the keep-first window (`ROW_NUMBER` over the hash ordered by
    * `(doc_id, p)`), and rebuilds the STRINGS — so the rewritten texts
    * hash-match, not just the counts. */
  val q115 = Q(
    "q115_line_dedup",
    s"""WITH $lineFixtureCte,
       |wnd AS (SELECT doc_id, p,
       |          ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id, p)
       |            AS rn,
       |          COUNT(*) OVER (PARTITION BY k) AS cnt
       |        FROM ne),
       |rem AS (SELECT doc_id, p FROM wnd WHERE cnt >= 2 AND rn > 1),
       |$lineRebuildSql""".stripMargin) { (s, dir) =>
    Dedup.dedupLinesKeepFirst(lineFixture(s, dir), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q116: HIGH-FREQUENCY LINE SCRUB
    * ([[graft.operators.Dedup.scrubFreqLines]]) — the boilerplate policy:
    * a line occurring ≥ 8 times corpus-wide is deleted EVERYWHERE (no
    * copy survives — nav/footer chrome where even the first occurrence is
    * noise). Same fixture, hash, and string-rebuild oracle as q115; the
    * verdict differs (count threshold, no keep-first window). */
  val q116 = Q(
    "q116_line_freq_scrub",
    s"""WITH $lineFixtureCte,
       |cnts AS (SELECT doc_id, p,
       |           COUNT(*) OVER (PARTITION BY k) AS cnt FROM ne),
       |rem AS (SELECT doc_id, p FROM cnts WHERE cnt >= 8),
       |$lineRebuildSql""".stripMargin) { (s, dir) =>
    Dedup.scrubFreqLines(lineFixture(s, dir), "doc_id", "text", minReps = 8)
      .orderBy("doc_id")
  }

  /** q117: GLOBAL TOKEN-BALANCED TRAINING FILES
    * ([[graft.operators.Packing.packGlobalByBudget]] over
    * [[graft.operators.Mixing.epochShuffle]]) — the shard-writer plan: the
    * q100 global permutation cut into fixed-500-token packs whose ids run
    * GLOBALLY across shard boundaries (per-partition packing would end
    * every shard on an underfull file). The Spark side computes the global
    * prefix sum as bounded per-shard subtotals prefixed on the driver plus
    * a per-shard window (never a single-partition sort); the oracle states
    * the SAME quantity as one global window over `(shard, ek, doc_id)` —
    * hash-matching pack ids prove the two-pass decomposition exact. */
  val q117 = Q(
    "q117_global_token_packs",
    s"""WITH k AS (SELECT doc_id, text,
       |                 (${sqlHash("'7:' || CAST(doc_id AS VARCHAR)")}
       |                  * 2654435761) % 2147483647 AS ek FROM documents),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard,
       |             CAST(len($sqlToks) AS BIGINT) AS n_tok FROM k),
       |w AS (SELECT doc_id, shard, n_tok,
       |        SUM(n_tok) OVER (ORDER BY shard, ek, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM s)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tok,
       |       CAST((cum - n_tok) // 500 AS BIGINT) AS pack_id
       |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val e = Mixing.epochShuffle(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "doc_id", seed = 7L, nShards = 8)
      .withColumn("n_tok", graft.functions.TokenStats(col("text"))
        .getField("n_tokens").cast("long"))
    graft.operators.Packing
      .packGlobalByBudget(e, "shard", "pos", "n_tok", budget = 500L)
      .select(col("doc_id"), col("shard"), col("n_tok"), col("pack_id"))
      .orderBy("doc_id")
  }

  /** q118: EXACT TOKEN-COUNT QUANTILES by distribution compression
    * ([[graft.operators.Sketches.exactQuantiles]]) — the corpus
    * length-distribution telemetry every curation run publishes, computed
    * EXACTLY at histogram cost: one value-keyed groupBy bounded by
    * distinct token counts, then rank arithmetic over that bounded table
    * (type-1 lower quantile in multiplication form — `100·cum ≥ pct·n`,
    * integer-exact on both engines). The oracle states the identical
    * histogram-rank derivation. */
  val q118 = Q(
    "q118_token_quantiles",
    s"""WITH t AS (SELECT CAST(len($sqlToks) AS BIGINT) AS v FROM documents),
       |h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY v),
       |cum AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS cc FROM h),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
       |p AS (SELECT * FROM (VALUES (10),(25),(50),(75),(90),(99))
       |      AS p(pct))
       |SELECT pct, CAST(MIN(v) AS BIGINT) AS value
       |FROM p, cum, n WHERE cc * 100 >= pct * n
       |GROUP BY pct ORDER BY pct""".stripMargin) { (s, dir) =>
    graft.operators.Sketches.exactQuantiles(
      Tables.documents(s, dir).select(
        graft.functions.TokenStats(col("text")).getField("n_tokens")
          .cast("long").as("n_tok")),
      "n_tok", Seq(10, 25, 50, 75, 90, 99))
      .orderBy("pct")
  }

  /** q119: WINNOWING FINGERPRINTS ([[graft.operators.Winnow
    * .fingerprints]], Schleimer et al. 2003 / MOSS) — min-of-each-window
    * selection over token 3-gram hashes at w = 4, ties to the rightmost
    * minimal hash via the integer pack (`h·2²⁴ + (2²⁴−1−p)`, plain MIN,
    * no sort). The oracle replays the gram hash, the pack, the windowed
    * MIN with the full-window/short-doc rule, and the unpack — every
    * selected (pos, fp) hash-matched. */
  /** q119/q120's shared winnowing CTE chain: token 3-grams hashed with
    * the 62-BIT wide family (the operator's default since round 12 — a
    * 31-bit gram key false-aligns by birthday at corpus scale), the
    * h·2²⁴+(2²⁴−1−p) pack carried in HUGEINT (62+24 bits overflow
    * BIGINT; the Spark side carries the equivalent lexicographic
    * (h, 2²⁴−1−p) struct), the w = 4 windowed MIN with the
    * full-window/short-doc rule — ends at `sel(doc_id, mk)`. */
  private val winnowSelCte: String =
    s"""toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |g AS (SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS p,
       |             ${sqlWideHash("array_to_string(w[t.i:t.i + 2], ' ')")} AS h
       |      FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
       |      WHERE len(w) >= 3),
       |pk AS (SELECT doc_id, p,
       |              CAST(h AS HUGEINT) * 16777216 + (16777215 - p)
       |                AS pkv FROM g),
       |wnd AS (SELECT doc_id, p,
       |          MIN(pkv) OVER (PARTITION BY doc_id ORDER BY p
       |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
       |          COUNT(*) OVER (PARTITION BY doc_id ORDER BY p
       |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
       |        FROM pk),
       |sel AS (SELECT DISTINCT doc_id, mk FROM wnd
       |        WHERE cnt = 4 OR (p = 0 AND cnt < 4))""".stripMargin

  val q119 = Q(
    "q119_winnow_fingerprints",
    s"""WITH $winnowSelCte
       |SELECT doc_id,
       |       CAST(16777215 - (mk % 16777216) AS BIGINT) AS pos,
       |       CAST(mk // 16777216 AS BIGINT) AS fp
       |FROM sel ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    graft.operators.Winnow.fingerprints(
      Tables.documents(s, dir), "doc_id", "text", k = 3, w = 4)
      .orderBy("doc_id", "pos")
  }

  /** q120: WINNOW-GATED OVERLAP FLAGGING ([[graft.operators.Winnow
    * .flaggedOverlap]]) — local-overlap decontamination at ~2/(w+1) of
    * the shingle probe's join volume with the selection guarantee as the
    * detection floor: train docs (doc_id % 97 ≠ 0, the q58 split
    * convention) sharing ≥ 2 distinct selected fingerprints with the
    * eval slice (doc_id % 97 = 0). The oracle replays the whole
    * selection chain for BOTH sides and the distinct-fp overlap count. */
  val q120 = Q(
    "q120_winnow_decontam",
    s"""WITH $winnowSelCte,
       |fps AS (SELECT doc_id, mk // 16777216 AS fp FROM sel),
       |ev AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
       |tr AS (SELECT doc_id, fp FROM fps WHERE doc_id % 97 <> 0)
       |SELECT tr.doc_id,
       |       CAST(COUNT(DISTINCT tr.fp) AS BIGINT) AS n_shared
       |FROM tr JOIN ev ON tr.fp = ev.fp
       |GROUP BY tr.doc_id HAVING COUNT(DISTINCT tr.fp) >= 2
       |ORDER BY tr.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Winnow.flaggedOverlap(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", k = 3, w = 4, minShared = 2)
      .orderBy("doc_id")
  }

  /** q121: PER-SOURCE token-count quartiles ([[graft.operators.Sketches
    * .exactGroupQuantiles]]) — q118's distribution compression
    * partitioned by group: the rank windows partition by source, so
    * nothing is single-partition at any group count. The per-source
    * length profile a mixing recipe is tuned against. */
  val q121 = Q(
    "q121_source_quantiles",
    s"""WITH t AS (SELECT source, CAST(len($sqlToks) AS BIGINT) AS v
       |           FROM documents),
       |h AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
       |      FROM t GROUP BY source, v),
       |cum AS (SELECT source, v,
       |          CAST(SUM(c) OVER (PARTITION BY source ORDER BY v
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |            AS BIGINT) AS cc,
       |          CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
       |        FROM h),
       |p AS (SELECT * FROM (VALUES (25),(50),(75)) AS p(pct))
       |SELECT source, pct, CAST(MIN(v) AS BIGINT) AS value
       |FROM p, cum WHERE cc * 100 >= pct * n
       |GROUP BY source, pct ORDER BY source, pct""".stripMargin) { (s, dir) =>
    graft.operators.Sketches.exactGroupQuantiles(
      Tables.documents(s, dir).select(col("source"),
        graft.functions.TokenStats(col("text")).getField("n_tokens")
          .cast("long").as("n_tok")),
      "source", "n_tok", Seq(25, 50, 75))
      .orderBy("source", "pct")
  }

  /** q122: GLOBAL CONCAT-CHUNK INDEX ([[graft.operators.Packing
    * .concatChunkIndexGlobal]]) — q117's two-pass global prefix sum
    * serving the OTHER loader policy: the q100 permutation conceptually
    * concatenated, token offsets and 512-token chunk ids running across
    * shard boundaries (straddling sequences included). The oracle states
    * the offsets as one global window; zero-token docs take the NULL
    * first/last chunk contract. */
  val q122 = Q(
    "q122_global_chunk_index",
    s"""WITH k AS (SELECT doc_id, text,
       |                 (${sqlHash("'7:' || CAST(doc_id AS VARCHAR)")}
       |                  * 2654435761) % 2147483647 AS ek FROM documents),
       |s AS (SELECT doc_id, ek, (ek * 8) // 2147483647 AS shard,
       |             CAST(len($sqlToks) AS BIGINT) AS n_tok FROM k),
       |w AS (SELECT doc_id, n_tok,
       |        CAST(SUM(n_tok) OVER (ORDER BY shard, ek, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS end_off
       |      FROM s)
       |SELECT doc_id, end_off - n_tok AS start_off, end_off,
       |       CASE WHEN n_tok > 0
       |            THEN CAST((end_off - n_tok) // 512 AS BIGINT) END
       |         AS first_chunk,
       |       CASE WHEN n_tok > 0
       |            THEN CAST((end_off - 1) // 512 AS BIGINT) END
       |         AS last_chunk,
       |       CASE WHEN n_tok > 0
       |            THEN CAST((end_off - 1) // 512 - (end_off - n_tok) // 512
       |                      + 1 AS BIGINT)
       |            ELSE CAST(0 AS BIGINT) END AS n_chunks
       |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val e = Mixing.epochShuffle(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "doc_id", seed = 7L, nShards = 8)
      .withColumn("n_tok", graft.functions.TokenStats(col("text"))
        .getField("n_tokens").cast("long"))
    graft.operators.Packing
      .concatChunkIndexGlobal(e, "shard", "pos", "n_tok", chunkTokens = 512L)
      .select(col("doc_id"), col("start_off"), col("end_off"),
        col("first_chunk"), col("last_chunk"), col("n_chunks"))
      .orderBy("doc_id")
  }

  /** q123: CURRICULUM-ORDERED GLOBAL TRAINING FILES — the full artifact
    * a quality-curriculum run consumes: the q112 order (tier DESC, then
    * the per-tier global permutation) folded into ONE total order via the
    * composite shard key `(maxTier − tier)·nShards + shard`, then cut
    * into 500-token packs whose ids run globally ([[graft.operators
    * .Packing.packGlobalByBudget]]) — so file 0 starts with the
    * highest-quality tier and no tier boundary strands an underfull
    * file. The oracle re-derives the whole q112 chain and states the
    * packing as one global window over the composite order. */
  val q123 = Q(
    "q123_curriculum_packs",
    s"""WITH $curriculumChainCte,
       |ntok AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tok
       |         FROM documents),
       |w2 AS (SELECT s.doc_id, s.tier,
       |              CAST((3 - s.tier) * 8 + s.shard AS BIGINT) AS gshard,
       |              ntok.n_tok,
       |              SUM(ntok.n_tok) OVER (
       |                ORDER BY (3 - s.tier) * 8 + s.shard, s.ek, s.doc_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |                AS cum
       |       FROM s JOIN ntok USING (doc_id))
       |SELECT doc_id, tier, gshard, n_tok,
       |       CAST((cum - n_tok) // 500 AS BIGINT) AS pack_id
       |FROM w2 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val cur = curriculumFrame(s, dir)
      .withColumn("gshard", (lit(3L) - col("tier")) * 8 + col("shard"))
      .withColumn("n_tok", graft.functions.TokenStats(col("text"))
        .getField("n_tokens").cast("long"))
    graft.operators.Packing
      .packGlobalByBudget(cur, "gshard", "pos", "n_tok", budget = 500L)
      .select(col("doc_id"), col("tier"), col("gshard"), col("n_tok"),
        col("pack_id"))
      .orderBy("doc_id")
  }

  /** q124: OVERLAP ALIGNMENT ([[graft.operators.Winnow.overlapSpans]]) —
    * the MOSS match step on the q120 split: for every (train, eval) pair
    * sharing ≥ 2 distinct selected fingerprints, one row per shared
    * fingerprint with BOTH token offsets — the reviewer-readable
    * evidence of WHERE the overlap sits. The oracle replays the
    * selection chain for both sides, the pair gate, and the aligned
    * offsets. */
  val q124 = Q(
    "q124_winnow_alignment",
    s"""WITH $winnowSelCte,
       |fps AS (SELECT doc_id,
       |               CAST(16777215 - (mk % 16777216) AS BIGINT) AS pos,
       |               CAST(mk // 16777216 AS BIGINT) AS fp FROM sel),
       |ev AS (SELECT doc_id AS eval_id, pos AS e_pos, fp FROM fps
       |       WHERE doc_id % 97 = 0),
       |tr AS (SELECT doc_id AS train_id, pos AS t_pos, fp FROM fps
       |       WHERE doc_id % 97 <> 0),
       |al AS (SELECT train_id, eval_id, tr.fp AS fp, t_pos, e_pos
       |       FROM tr JOIN ev ON tr.fp = ev.fp),
       |pr AS (SELECT train_id, eval_id FROM al
       |       GROUP BY train_id, eval_id
       |       HAVING COUNT(DISTINCT fp) >= 2)
       |SELECT al.train_id, al.eval_id, al.fp, al.t_pos, al.e_pos
       |FROM al JOIN pr USING (train_id, eval_id)
       |ORDER BY train_id, eval_id, fp, t_pos, e_pos""".stripMargin) {
    (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Winnow.overlapSpans(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", k = 3, w = 4, minShared = 2)
      .orderBy("train_id", "eval_id", "fp", "t_pos", "e_pos")
  }

  /** q125: MATCHED SPANS ([[graft.operators.Winnow.matchedSpans]]) — the
    * MOSS report line: q124's alignment collapsed per (pair, offset
    * delta) into `[min(t_pos), max(t_pos)+k−1]` train-coordinate spans
    * with their supporting-fingerprint counts. */
  val q125 = Q(
    "q125_winnow_spans",
    s"""WITH $winnowSelCte,
       |fps AS (SELECT doc_id,
       |               CAST(16777215 - (mk % 16777216) AS BIGINT) AS pos,
       |               CAST(mk // 16777216 AS BIGINT) AS fp FROM sel),
       |ev AS (SELECT doc_id AS eval_id, pos AS e_pos, fp FROM fps
       |       WHERE doc_id % 97 = 0),
       |tr AS (SELECT doc_id AS train_id, pos AS t_pos, fp FROM fps
       |       WHERE doc_id % 97 <> 0),
       |al AS (SELECT train_id, eval_id, tr.fp AS fp, t_pos, e_pos
       |       FROM tr JOIN ev ON tr.fp = ev.fp),
       |pr AS (SELECT train_id, eval_id FROM al
       |       GROUP BY train_id, eval_id
       |       HAVING COUNT(DISTINCT fp) >= 2)
       |SELECT al.train_id, al.eval_id, t_pos - e_pos AS delta,
       |       MIN(t_pos) AS t_start, MAX(t_pos) + 2 AS t_end,
       |       CAST(COUNT(DISTINCT al.fp) AS BIGINT) AS n_fps
       |FROM al JOIN pr USING (train_id, eval_id)
       |GROUP BY al.train_id, al.eval_id, delta
       |ORDER BY train_id, eval_id, delta""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Winnow.matchedSpans(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", k = 3, w = 4, minShared = 2)
      .orderBy("train_id", "eval_id", "delta")
  }

  /** q128: DECONTAMINATION BY REWRITE at winnow cost
    * ([[graft.operators.Winnow.scrubMatchedSpans]]) — q125's matched
    * spans masked OUT of the train documents instead of dropping them
    * (the RefinedWeb policy at the winnow tier's join volume). The
    * oracle rebuilds the STRINGS (the q89/q115 discipline): per-token
    * union coverage over the span table, surviving tokens reassembled
    * in order; train documents with no span keep their text verbatim
    * (BYTE-identical, whitespace included). */
  val q128 = Q(
    "q128_winnow_scrub",
    s"""WITH $winnowSelCte,
       |fps AS (SELECT doc_id,
       |               CAST(16777215 - (mk % 16777216) AS BIGINT) AS pos,
       |               CAST(mk // 16777216 AS BIGINT) AS fp FROM sel),
       |ev AS (SELECT doc_id AS eval_id, pos AS e_pos, fp FROM fps
       |       WHERE doc_id % 97 = 0),
       |tr AS (SELECT doc_id AS train_id, pos AS t_pos, fp FROM fps
       |       WHERE doc_id % 97 <> 0),
       |al AS (SELECT train_id, eval_id, tr.fp AS fp, t_pos, e_pos
       |       FROM tr JOIN ev ON tr.fp = ev.fp),
       |pr AS (SELECT train_id, eval_id FROM al
       |       GROUP BY train_id, eval_id
       |       HAVING COUNT(DISTINCT fp) >= 2),
       |sp AS (SELECT al.train_id, al.eval_id, t_pos - e_pos AS delta,
       |              MIN(t_pos) AS t_start, MAX(t_pos) + 2 AS t_end
       |       FROM al JOIN pr USING (train_id, eval_id)
       |       GROUP BY al.train_id, al.eval_id, delta),
       |nsp AS (SELECT train_id AS doc_id,
       |               CAST(COUNT(*) AS BIGINT) AS n_spans
       |        FROM sp GROUP BY train_id),
       |ttok AS (SELECT doc_id, unnest($sqlToks) AS wd,
       |                unnest(range(1, len($sqlToks) + 1)) AS p
       |         FROM documents WHERE doc_id % 97 <> 0),
       |cov AS (SELECT DISTINCT t.doc_id, t.p FROM ttok t
       |        JOIN sp ON sp.train_id = t.doc_id
       |               AND t.p - 1 BETWEEN sp.t_start AND sp.t_end),
       |reb AS (SELECT t.doc_id,
       |               array_to_string(list(t.wd ORDER BY t.p), ' ') AS ct,
       |               CAST(COUNT(*) AS BIGINT) AS kept
       |        FROM ttok t LEFT JOIN cov c
       |          ON c.doc_id = t.doc_id AND c.p = t.p
       |        WHERE c.p IS NULL GROUP BY t.doc_id),
       |ntk AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens
       |        FROM documents WHERE doc_id % 97 <> 0)
       |SELECT d.doc_id,
       |       CASE WHEN n.n_spans IS NULL THEN d.text
       |            ELSE COALESCE(r.ct, '') END AS clean_text,
       |       k.n_tokens,
       |       CAST(CASE WHEN n.n_spans IS NULL THEN 0
       |            ELSE k.n_tokens - COALESCE(r.kept, 0) END AS BIGINT)
       |         AS removed_tokens,
       |       CAST(COALESCE(n.n_spans, 0) AS BIGINT) AS n_spans
       |FROM documents d
       |JOIN ntk k ON k.doc_id = d.doc_id
       |LEFT JOIN nsp n ON n.doc_id = d.doc_id
       |LEFT JOIN reb r ON r.doc_id = d.doc_id
       |WHERE d.doc_id % 97 <> 0
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Winnow.scrubMatchedSpans(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", k = 3, w = 4, minShared = 2)
      .select(col("doc_id"), col("text").as("clean_text"),
        col("n_tokens"), col("removed_tokens"), col("n_spans"))
      .orderBy("doc_id")
  }

  /** q130: EVAL-SIDE contamination governance
    * ([[graft.operators.Winnow.evalContamination]]) — q125's matched
    * spans rolled up per EVAL document: how many train documents carry
    * a copy, and what fraction of the eval document's tokens the span
    * UNION covers (exact token-position coverage, integer per-mille).
    * The report an eval-set owner reads before trusting a benchmark
    * number. */
  val q130 = Q(
    "q130_eval_contamination",
    s"""WITH $winnowSelCte,
       |fps AS (SELECT doc_id,
       |               CAST(16777215 - (mk % 16777216) AS BIGINT) AS pos,
       |               CAST(mk // 16777216 AS BIGINT) AS fp FROM sel),
       |ev AS (SELECT doc_id AS eval_id, pos AS e_pos, fp FROM fps
       |       WHERE doc_id % 97 = 0),
       |tr AS (SELECT doc_id AS train_id, pos AS t_pos, fp FROM fps
       |       WHERE doc_id % 97 <> 0),
       |al AS (SELECT train_id, eval_id, tr.fp AS fp, t_pos, e_pos
       |       FROM tr JOIN ev ON tr.fp = ev.fp),
       |pr AS (SELECT train_id, eval_id FROM al
       |       GROUP BY train_id, eval_id
       |       HAVING COUNT(DISTINCT fp) >= 2),
       |sp AS (SELECT al.train_id, al.eval_id, t_pos - e_pos AS delta,
       |              MIN(t_pos) AS t_start, MAX(t_pos) + 2 AS t_end
       |       FROM al JOIN pr USING (train_id, eval_id)
       |       GROUP BY al.train_id, al.eval_id, delta),
       |spe AS (SELECT train_id, eval_id, t_start - delta AS e_start,
       |               t_end - delta AS e_end FROM sp),
       |pd AS (SELECT eval_id,
       |              CAST(COUNT(DISTINCT train_id) AS BIGINT)
       |                AS n_train_docs,
       |              CAST(COUNT(*) AS BIGINT) AS n_spans
       |       FROM spe GROUP BY eval_id),
       |etok AS (SELECT doc_id AS eval_id,
       |                unnest(range(0, len($sqlToks))) AS p
       |         FROM documents WHERE doc_id % 97 = 0),
       |cov AS (SELECT DISTINCT t.eval_id, t.p FROM etok t
       |        JOIN spe s ON s.eval_id = t.eval_id
       |               AND t.p BETWEEN s.e_start AND s.e_end),
       |cv AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS covered_tokens
       |       FROM cov GROUP BY eval_id),
       |en AS (SELECT doc_id AS eval_id, CAST(len($sqlToks) AS BIGINT)
       |         AS n_tokens
       |       FROM documents WHERE doc_id % 97 = 0)
       |SELECT pd.eval_id, pd.n_train_docs, pd.n_spans, cv.covered_tokens,
       |       en.n_tokens,
       |       CAST(cv.covered_tokens * 1000 // en.n_tokens AS BIGINT)
       |         AS covered_milli
       |FROM pd JOIN cv USING (eval_id) JOIN en USING (eval_id)
       |ORDER BY eval_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.Winnow.evalContamination(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", k = 3, w = 4, minShared = 2)
      .orderBy("eval_id")
  }

  /** q138: BM25 STANDING-INDEX DELETION under the oracle gate — the
    * round-14 deletion contract ("exactly as if the documents had never
    * been indexed") hash-checked cross-engine: each run bootstraps a
    * REAL standing index in owned scratch (odd corpus ids), APPENDS the
    * even half as a tokened delta, DELETES every third corpus document
    * (with the delta still outstanding — deletion doubles as a
    * compaction), queries the index, then eagerly materializes the
    * result and removes the scratch (no leaked state between reps).
    * The oracle is q78's exact-integer BM25 replay over the SURVIVING
    * corpus — df, idf, N and avgdl all re-derived, so a decrement bug
    * anywhere in the delete path breaks the hash. The indexed corpus is
    * the `% 4 = 1` quarter, and the post-delete index is MEMOIZED per
    * (JVM, sfDir): the lifecycle is deterministic (same corpus → same
    * stores bit for bit), so re-running it per bench rep would time
    * scratch-store I/O five times over; the correctness gate's fresh
    * JVM always exercises the full bootstrap/append/delete path once,
    * and the bench's timed reps measure the indexed QUERY — the plan. */
  private val q138IdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q138 = Q(
    "q138_bm25_delete",
    s"""WITH toks AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl
       |      FROM toks WHERE doc_id % 89 <> 0 AND doc_id % 4 = 1
       |        AND doc_id % 3 <> 0),
       |ct AS (SELECT doc_id, dl, unnest(w) AS t FROM c),
       |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf,
       |              MIN(dl) AS dl
       |       FROM ct GROUP BY doc_id, t),
       |dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |              CAST(SUM(dl) AS BIGINT) AS s FROM c),
       |qt AS (SELECT DISTINCT doc_id AS qid, unnest(w) AS t
       |       FROM toks WHERE doc_id % 89 = 0),
       |term AS (SELECT qt.qid, tf.doc_id,
       |                ((2*n - 2*df + 1)*1000) // (2*df + 1) AS idf_milli,
       |                (22*tf.tf*s*1000) // (10*tf.tf*s + 3*s + 9*tf.dl*n)
       |                  AS part_permille
       |         FROM qt JOIN tf ON tf.t = qt.t
       |                 JOIN dfreq ON dfreq.t = qt.t, st),
       |sc AS (SELECT qid, doc_id,
       |              CAST(SUM(idf_milli * part_permille) AS BIGINT) AS score
       |       FROM term GROUP BY qid, doc_id),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |         PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |       FROM sc)
       |SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
       |FROM rk WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val idx = q138IdxCache.computeIfAbsent(dir, { d: String =>
      val corpus = docs.filter(col("doc_id") % 89 =!= 0 &&
        col("doc_id") % 4 === 1)
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-q138-idx").toString
      graft.operators.Retrieval.bm25WriteIndex(
        corpus.filter(col("doc_id") % 8 === 1), "doc_id", "text",
        scratch, buckets = 8)
      graft.operators.Retrieval.bm25AppendIndex(
        corpus.filter(col("doc_id") % 8 === 5), "doc_id", "text",
        scratch, batchId = 1L)
      val dead = corpus.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").cast("long"))
        .collect().map(_.getLong(0)).toSeq
      graft.operators.Retrieval.bm25DeleteIndex(s, scratch, dead)
      scratch
    })
    graft.operators.Retrieval.bm25TopKIndexed(s, idx,
      docs.filter(col("doc_id") % 89 === 0), "doc_id", "text", k = 3)
      .orderBy("query_id", "rank")
  }

  /** Shared CTE chain for the CDC tier (q143/q144): boundaries where
    * the 8-token window hash ≡ 0 mod 32, spans between consecutive
    * boundaries plus the trailing chunk, 62-bit chunk identity. Ends at
    * `cdc(doc_id, cno, s, e, n, h)`. */
  private def cdcCtes: String =
    s"""toks AS (SELECT doc_id, $sqlToks AS w FROM documents
       |         WHERE text IS NOT NULL),
       |bnd AS (SELECT doc_id, i + 7 AS e
       |        FROM (SELECT doc_id, i,
       |                ${sqlHash("array_to_string(w[i:i+7], ' ')")} AS h
       |              FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i))
       |        WHERE h % 32 = 0),
       |bn AS (SELECT doc_id, e,
       |              LAG(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e)
       |                AS pe,
       |              row_number() OVER (PARTITION BY doc_id ORDER BY e)
       |                - 1 AS cno
       |       FROM bnd),
       |tails AS (SELECT t.doc_id, COALESCE(b.n, 0) AS cno,
       |                 COALESCE(b.me, 0) + 1 AS s, len(t.w) AS e
       |          FROM toks t LEFT JOIN (
       |            SELECT doc_id, MAX(e) AS me, COUNT(*) AS n
       |            FROM bnd GROUP BY doc_id) b USING (doc_id)
       |          WHERE COALESCE(b.me, 0) < len(t.w)),
       |spans AS (SELECT doc_id, cno, pe + 1 AS s, e FROM bn
       |          UNION ALL SELECT doc_id, cno, s, e FROM tails),
       |cdc AS (SELECT sp.doc_id, sp.cno, sp.s, sp.e,
       |               sp.e - sp.s + 1 AS n,
       |               ${sqlWideHash("array_to_string(t.w[sp.s:sp.e], ' ')")}
       |                 AS h
       |        FROM spans sp JOIN toks t USING (doc_id))"""
      .stripMargin

  /** q143: CONTENT-DEFINED CHUNK inventory ([[graft.operators.Dedup
    * .cdcChunks]] / the codegen'd [[graft.functions.CdcChunks]]) — the
    * shift-robust chunking tier: boundaries fall where the 8-token
    * window's 31-bit hash ≡ 0 mod 32 (expected chunk ≈ 32 tokens), so
    * an edit invalidates only the chunk it lands in. Every chunk's
    * (position, length, 62-bit identity) hash-checked against the SQL
    * replay — boundary rule, span assembly, trailing-chunk policy and
    * the wide hash all re-derived. */
  val q143 = Q(
    "q143_cdc_chunks",
    s"""WITH $cdcCtes
       |SELECT doc_id, CAST(cno AS BIGINT) AS chunk_no,
       |       CAST(s AS BIGINT) AS tok_start,
       |       CAST(n AS BIGINT) AS n_tokens, h
       |FROM cdc ORDER BY doc_id, chunk_no""".stripMargin) { (s, dir) =>
    graft.operators.Dedup.cdcChunks(
      Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("chunk_no"),
        col("start").as("tok_start"), col("n_tokens"), col("h"))
      .orderBy("doc_id", "chunk_no")
  }

  /** q144: per-document CDC DUPLICATION stats ([[graft.operators.Dedup
    * .cdcDupStats]]) — how much of each document is chunks shared with
    * OTHER documents (distinct-doc count ≥ 2 on the 62-bit identity):
    * the shifted-boilerplate signal exact dedup misses. Integer-ppm
    * exact division; the oracle replays the global distinct-doc count
    * and the per-document rollup. */
  /** q145: CDC near-dup PAIR edges ([[graft.operators.Dedup.cdcPairs]])
    * — the partial-overlap tier under the engine-wide pre-collapse
    * discipline: per shared chunk hash, min-id star edges (m carriers
    * cost m−1 edges, connectivity-exact for keep-one). One lifted
    * paragraph connects two documents the whole-doc MinHash tier never
    * pairs; sharing is exact content identity, nothing to verify. The
    * oracle replays the chunk chain, the per-hash min-id election and
    * the star emission. */
  val q145 = Q(
    "q145_cdc_pairs",
    s"""WITH $cdcCtes,
       |dh AS (SELECT DISTINCT doc_id, h FROM cdc),
       |rep AS (SELECT h, MIN(doc_id) AS a FROM dh GROUP BY h)
       |SELECT DISTINCT rep.a, dh.doc_id AS b, dh.h
       |FROM dh JOIN rep USING (h)
       |WHERE dh.doc_id <> rep.a
       |ORDER BY a, b, h""".stripMargin) { (s, dir) =>
    graft.operators.Dedup.cdcPairs(
      Tables.documents(s, dir), "doc_id", "text")
      .orderBy("a", "b", "h")
  }

  /** q146: CDC SCRUB ([[graft.operators.Dedup.scrubCdcChunks]]) — the
    * boilerplate policy at content-defined granularity: chunks carried
    * by ≥ 2 distinct documents die in EVERY carrier; rewritten docs
    * come back whitespace-normalized ([[graft.functions.ScrubTokens]]),
    * untouched docs BYTE-identical (the oracle's CASE keeps the raw
    * text for n_removed = 0, so an odd-whitespace bystander that was
    * wrongly rewritten breaks the hash). The oracle replays the chunk
    * chain, the global dup set, and the token-index rebuild. */
  val q146 = Q(
    "q146_cdc_scrub",
    s"""WITH $cdcCtes,
       |g AS (SELECT h FROM (
       |        SELECT h, COUNT(DISTINCT doc_id) AS nd FROM cdc GROUP BY h)
       |      WHERE nd >= 2),
       |rs AS (SELECT c.doc_id,
       |              list({'s': c.s, 'e': c.e} ORDER BY c.s) AS rs,
       |              CAST(COUNT(*) AS BIGINT) AS n_removed,
       |              CAST(SUM(c.n) AS BIGINT) AS removed_tokens
       |       FROM cdc c JOIN g USING (h) GROUP BY c.doc_id),
       |kept AS (SELECT t.doc_id,
       |                list_filter(t.w, (tok, i) -> NOT COALESCE(
       |                  list_aggregate(list_transform(r.rs,
       |                    x -> i BETWEEN x.s AND x.e), 'bool_or'),
       |                  FALSE)) AS kw,
       |                COALESCE(r.n_removed, 0) AS n_removed,
       |                COALESCE(r.removed_tokens, 0) AS removed_tokens
       |         FROM toks t LEFT JOIN rs r USING (doc_id))
       |SELECT k.doc_id,
       |       CASE WHEN k.n_removed = 0 THEN d.text
       |            ELSE COALESCE(array_to_string(k.kw, ' '), '')
       |       END AS clean_text,
       |       k.n_removed, k.removed_tokens
       |FROM kept k JOIN documents d USING (doc_id)
       |ORDER BY k.doc_id""".stripMargin) { (s, dir) =>
    graft.operators.Dedup.scrubCdcChunks(
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  val q144 = Q(
    "q144_cdc_dup",
    s"""WITH $cdcCtes,
       |g AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM cdc GROUP BY h),
       |agg AS (SELECT c.doc_id,
       |               CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |               CAST(SUM(c.n) AS BIGINT) AS n_tokens,
       |               CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END)
       |                 AS BIGINT) AS dup_chunks,
       |               CAST(SUM(CASE WHEN g.nd >= 2 THEN c.n ELSE 0 END)
       |                 AS BIGINT) AS dup_tokens
       |        FROM cdc c JOIN g USING (h) GROUP BY c.doc_id)
       |SELECT doc_id, n_chunks, n_tokens, dup_chunks, dup_tokens,
       |       CAST(dup_tokens * 1000000 // n_tokens AS BIGINT) AS dup_ppm
       |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.operators.Dedup.cdcDupStats(
      Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q41, q46, q47,
    q48, q49, q53, q56, q58, q59, q60, q62, q63, q64, q65, q66, q68, q69, q72,
    q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q89, q90, q91, q92, q95,
    q96, q98, q99, q100, q101, q103, q104, q105, q106, q107, q108, q109, q110,
    q112, q113, q114, q115, q116, q117, q118, q119, q120, q121, q122, q123,
    q124, q125, q128, q130, q138, q143, q144, q145, q146)
}
