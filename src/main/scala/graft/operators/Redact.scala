package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation — the scrub step every corpus
  * takes before packing: emails, North-American phone numbers, and IPv4
  * addresses are replaced with typed placeholder tokens, and per-document
  * match counts are emitted for the curation funnel's observability tier
  * (counts decide whether a SOURCE is dropped wholesale; the rewrite
  * handles the long tail).
  *
  * Patterns are deliberately RE2-safe (no backreferences, no lookaround)
  * so the SAME pattern text runs under Spark's Java regex and the
  * oracle's RE2 with identical match sets — greedy leftmost semantics
  * coincide for these character-class/quantifier-only patterns.
  * Replacement is sequential (email → phone → IPv4) on non-overlapping
  * pattern families; counts are measured on the ORIGINAL text, so they
  * are replacement-order independent.
  *
  * Scale shape: one in-scan projection — no shuffle, no explode; regex
  * evaluation is codegen'd `RegExpReplace`/`RegExpExtractAll` per row.
  * At 100 TB this runs as a map-only stage fused into whatever scan
  * precedes it (reference scrub behavior: hnarchive.py has no PII tier —
  * this is part of the LLM-pipeline extension surface).
  */
object Redact {

  /** Email: local@domain.tld, ASCII. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 3-3-4 digit groups, dash-separated, word-bounded. */
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — octet range not enforced). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailTok = "<EMAIL>"
  val PhoneTok = "<PHONE>"
  val Ipv4Tok = "<IP>"

  private def redExpr(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, EmailTok),
        PhoneRe, PhoneTok),
      Ipv4Re, Ipv4Tok)

  /** In-place form for pipeline composition: rewrites `textCol` with the
    * redacted text, preserving every other column — the shape a curation
    * funnel stage needs (stateless, map-only, drops nothing; use
    * [[redactPii]] when the per-category counts matter). */
  def redactText(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, redExpr(col(textCol)))

  /** The SOURCE-level decision table the per-document counts feed: per
    * source, document count, PII-carrying document count and rate
    * (exact integer milli), and per-family match totals. A curation
    * policy drops or quarantines a whole source when its PII rate says
    * the scrape is systematically dirty — the long tail goes through
    * [[redactText]] row-by-row. One in-scan projection + one
    * source-keyed map-side-combined aggregate; at 100 TB the exchange
    * carries one row per source. Output: (sourceCol, n_docs,
    * n_pii_docs, pii_rate_milli, n_emails, n_phones, n_ips). */
  def piiSourceStats(df: DataFrame, sourceCol: String,
                     textCol: String): DataFrame = {
    val t = col(textCol)
    val ne = size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long")
    val np = size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long")
    val ni = size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long")
    df.select(col(sourceCol), ne.as("_ne"), np.as("_np"), ni.as("_ni"))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_ne") + col("_np") + col("_ni") > 0, 1L)
          .otherwise(0L)).as("n_pii_docs"),
        sum(col("_ne")).as("n_emails"),
        sum(col("_np")).as("n_phones"),
        sum(col("_ni")).as("n_ips"))
      .withColumn("pii_rate_milli",
        expr("n_pii_docs * 1000 div n_docs"))
      .select(col(sourceCol), col("n_docs"), col("n_pii_docs"),
        col("pii_rate_milli"), col("n_emails"), col("n_phones"),
        col("n_ips"))
  }

  /** Output: (idCol, red_text, n_emails, n_phones, n_ips) — one row per
    * input document; documents with no PII pass through verbatim. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      redExpr(t).as("red_text"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"))
  }
}
