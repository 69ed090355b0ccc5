package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function family from the reference's rendering/formatting layer
  * (SURVEY.md §2.7, F1-F9) — all composed from codegen'd Catalyst built-ins,
  * deliberately no UDFs.
  */
object TextFuncs {

  /** F1 `_fix_ptags` (`/root/reference/hnarchive.py:294-304`): HN comment
    * HTML arrives as "a<p>b<p>c"; repair to "<p>a</p><p>b</p>…". User-typed
    * literal `<p>` is pre-escaped (`&lt;p&gt;`) by the API, so a blind
    * replace is safe (F9 invariant, hnarchive.py:299-300).
    */
  def fixPtags(text: Column): Column =
    concat(lit("<p>"), regexp_replace(text, "<p>", "</p><p>"), lit("</p>"))

  /** F2 timestamp format parity with `strftime('%Y %b %d %H:%M:%S')`
    * (`/root/reference/hnarchive.py:336-337`); session TZ is pinned UTC.
    */
  def hnTimestamp(ts: Column): Column =
    date_format(ts, "yyyy MMM dd HH:mm:ss")

  /** F5 null default (`author or '[deleted]'`, hnarchive.py:329,342). */
  def deletedDefault(c: Column): Column = coalesce(c, lit("[deleted]"))

  /** F6 URL templating (hnarchive.py:330,338). */
  def itemUrl(id: Column): Column =
    concat(lit("https://news.ycombinator.com/item?id="), id.cast("string"))

  /** F7 score label (hnarchive.py:385,426). */
  def scoreLabel(score: Column): Column =
    concat(score.cast("string"), lit(" points"))
}
