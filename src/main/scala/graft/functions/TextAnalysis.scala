package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators
  * (tokenization, deterministic hashing, language-ID heuristic, quality
  * metrics). Everything is built from codegen'd Catalyst built-ins and is
  * arithmetically reproducible in ANSI SQL, so every derived operator stays
  * DuckDB-oracle-checkable.
  */
object TextAnalysis {

  /** Modulus for all polynomial hashes: 2^31-1 (Mersenne prime). Keeps every
    * intermediate product < 2^63 (acc < 2^31, ×31 + 127), so both Spark and
    * DuckDB evaluate the identical BIGINT arithmetic with no overflow.
    */
  val P: Long = 2147483647L

  /** Whitespace tokenization, the reference point for all token-level ops. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** JVM twin of [[tokens]] with EXACT Spark/DuckDB semantics, shared by
    * every codegen'd expression that tokenizes. Two traps make the obvious
    * `s.trim.split("\\s+")` wrong: Java trim strips all chars ≤ U+0020
    * while Spark/DuckDB trim strip only spaces, and Java split's default
    * limit drops trailing empty tokens while Spark/DuckDB keep them — so
    * `"foo bar\n"` must tokenize as `[foo, bar, ""]`, not `[foo, bar]`.
    */
  def jvmTokens(s: String): Array[String] = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi).split("\\s+", -1)
  }

  /** Deterministic Java-style 31-polynomial string hash mod [[P]], computed
    * over code points — the native codegen'd [[PolyHash]] expression.
    * Oracle twin: DuckDB `list_reduce` (see `graft.queries.TextQ.sqlHash`).
    */
  def strHash(s: Column): Column =
    if (sys.env.get("GRAFT_PORTABLE_HASH").contains("1")) strHashPortable(s)
    else PolyHash(s)

  /** Built-ins-only twin of [[strHash]] (regex scan + interpreted fold);
    * kept as the cross-implementation check for the codegen'd expression.
    * `(?s)` so '.' matches newlines, like PolyHash's code-point loop.
    */
  def strHashPortable(s: Column): Column =
    aggregate(regexp_extract_all(s, lit("(?s)."), lit(0)), lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % P)

  /** 62-bit WIDE string hash for GLOBAL-scope join keys — the codegen'd
    * [[WidePolyHash]] (`poly31 · P + poly37`; see its scaladoc for the
    * birthday-regime rationale). Use this, not [[strHash]], whenever the
    * hash keys a corpus-wide equi-join: the 31-bit space saturates around
    * ~50k distinct values. Oracle twin: `graft.queries.TextQ.sqlWideHash`.
    */
  def wideStrHash(s: Column): Column =
    if (sys.env.get("GRAFT_PORTABLE_HASH").contains("1")) wideStrHashPortable(s)
    else WidePolyHash(s)

  /** Built-ins-only twin of [[wideStrHash]] — the composed two-polynomial
    * form the single-loop expression replaces (cross-implementation check).
    */
  def wideStrHashPortable(s: Column): Column = {
    def poly(mult: Long): Column =
      aggregate(regexp_extract_all(s, lit("(?s)."), lit(0)), lit(0L),
        (acc, c) => (acc * mult + ascii(c)) % P)
    poly(31L) * P + poly(WideWindowHashes.Mult2)
  }

  /** The k-th universal hash over an already-hashed value: (a_k·x + b_k) mod P. */
  def rehash(x: Column, k: Int): Column =
    (lit(MinhashA(k)) * x + lit(MinhashB(k))) % P

  /** Fixed MinHash family (16 functions → 4 bands × 4 rows). Arbitrary but
    * immutable constants < 2^30, so a_k·x < 2^61. */
  val MinhashA: Array[Long] = Array(
    387420489L, 129140163L, 43046721L, 14348907L,
    478296900L, 159432300L, 53144100L, 17714700L,
    362797056L, 120932352L, 40310784L, 13436928L,
    244140625L, 48828125L, 9765625L, 1953125L)
  val MinhashB: Array[Long] = Array(
    12345L, 67890L, 13579L, 24680L,
    11111L, 22222L, 33333L, 44444L,
    55555L, 66666L, 77777L, 88888L,
    99999L, 10101L, 20202L, 30303L)

  /** 32-plane random-hyperplane family for [[HyperplaneSig]]: planes
    * 0-15 ARE [[MinhashA]]/[[MinhashB]] (so the signature's low byte is
    * bitwise [[HyperplaneBucket]]'s 8-plane bucket — spec-pinned), planes
    * 16-31 are 16 more arbitrary immutable constants < 2^30 (a_j·i stays
    * < 2^36 for any realistic dimension). */
  val HplaneA: Array[Long] = MinhashA ++ Array(
    282475249L, 40353607L, 5764801L, 823543L,
    594823321L, 85766121L, 12252303L, 1750329L,
    410338673L, 24137569L, 1419857L, 83521L,
    148035889L, 28398241L, 5452801L, 1046527L)
  val HplaneB: Array[Long] = MinhashB ++ Array(
    40404L, 50505L, 60606L, 70707L,
    80808L, 90909L, 12321L, 23432L,
    34543L, 45654L, 56765L, 67876L,
    78987L, 89098L, 90109L, 11211L)

  /** Stopword lists for the language-ID heuristic (real-world lists; the
    * driver corpus is synthetic so most docs score 'en' or 'und' — the
    * operator, not the corpus, is what's under test). Kept sorted so the
    * generated SQL is stable.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "of", "and", "a", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))
}
