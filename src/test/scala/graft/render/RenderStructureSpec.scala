package graft.render

import org.scalatest.funsuite.AnyFunSuite

/** Structural parity with the reference renderer: each page type is parsed
  * into a (tag, attributes, text) tree and compared against an expected
  * tree built by replaying the reference's bs4 append sequence
  * (`/root/reference/hnarchive.py:292-488`) node by node. The reference
  * renderer itself cannot execute in this container (bs4/voussoirkit are
  * absent in the zero-egress build), so the expected trees are derived
  * from its source, one `new_tag`/`append` at a time — tag/attribute/text
  * EQUIVALENCE, not byte equality: bs4 serialization legitimately differs
  * in attribute ordering and whitespace.
  */
class RenderStructureSpec extends AnyFunSuite {

  // ---- minimal DOM for both sides of the comparison ----

  sealed trait N
  final case class El(tag: String, attrs: Map[String, String], children: Vector[N]) extends N
  final case class Txt(s: String) extends N

  private def el(tag: String, attrs: (String, String)*)(children: N*): El =
    El(tag, attrs.toMap, children.toVector)
  private def txt(s: String): Txt = Txt(s)

  /** Parses the renderer's output subset (nested elements, double-quoted
    * attributes, text with entities; no self-closing tags). */
  private def parse(html: String): El = {
    var i = 0
    def decode(s: String): String = s
      .replace("&quot;", "\"").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&amp;", "&")
    def parseAttrs(s: String): Map[String, String] =
      """([\w-]+)="([^"]*)"""".r.findAllMatchIn(s)
        .map(m => m.group(1) -> decode(m.group(2))).toMap
    def parseElement(): El = {
      assert(html(i) == '<', s"expected tag at $i: ${html.drop(i).take(40)}")
      val close = html.indexOf('>', i)
      val inside = html.substring(i + 1, close)
      val tag = inside.takeWhile(c => c != ' ')
      i = close + 1
      val children = Vector.newBuilder[N]
      while (!html.startsWith(s"</$tag>", i)) {
        if (html(i) == '<') children += parseElement()
        else {
          val next = html.indexOf('<', i)
          children += Txt(decode(html.substring(i, next)))
          i = next
        }
      }
      i += tag.length + 3
      El(tag, parseAttrs(inside.drop(tag.length)), children.result())
    }
    parseElement()
  }

  /** Equivalence normalization: collapse whitespace runs in text, drop
    * whitespace-only nodes (bs4 pretty-printing freedom). */
  private def norm(n: N): Option[N] = n match {
    case Txt(s) =>
      val c = s.replaceAll("\\s+", " ").trim
      if (c.isEmpty) None else Some(Txt(c))
    case El(t, a, ch) => Some(El(t, a, ch.flatMap(norm)))
  }

  // ---- the reference's append sequence, replayed (hnarchive.py:292-488) ----

  /** `_fix_ptags` output parsed as markup, exactly as bs4 does with the
    * fragment (hnarchive.py:294-304,343-344). */
  private def refFixPtags(text: String): Vector[N] =
    parse("<frag>" + "<p>" + text.replace("<p>", "</p><p>") + "</p>" + "</frag>").children

  private val refDate = "2024 Jan 05 07:28:09" // utcfromtimestamp(1704439689)

  private def refUserLink(author: String): El =
    el("a", "href" -> s"https://news.ycombinator.com/user?id=$author")(txt(author))
  private def refTimeLink(id: Long, date: String): El =
    el("a", "href" -> s"https://news.ycombinator.com/item?id=$id")(txt(date))

  /** html_render_comment (hnarchive.py:321-345). */
  private def refComment(id: Long, author: String, date: String, text: String,
                         children: Vector[N] = Vector.empty): El =
    El("div", Map("class" -> "comment", "id" -> id.toString),
      Vector(el("p")(refUserLink(author), txt(" | "), refTimeLink(id, date))) ++
        refFixPtags(text) ++ children)

  /** html_render_story (hnarchive.py:390-428) — `div['class'] =
    * item['type']`, so a poll rendered through the story shell keeps
    * class "poll". */
  private def refStory(id: Long, author: String, date: String, title: String,
                       url: String, score: Long, cls: String = "story"): El =
    El("div", Map("class" -> cls, "id" -> id.toString), Vector(
      el("h1")(el("a", "href" -> url)(txt(title))),
      el("p")(refUserLink(author), txt(" | "), refTimeLink(id, date), txt(" | "),
        el("span")(txt(s"$score points")))))

  /** html_render_page skeleton (hnarchive.py:430-488). */
  private def refPage(bodyChildren: N*): El = {
    val css = """
    .comment,
    .job,
    .poll,
    .pollopt,
    .story
    {
        padding-left: 20px;
        margin-top: 4px;
        margin-right: 4px;
        margin-bottom: 4px;
    }
    .job, .poll, .story
    {
        border: 2px solid blue;
    }
    body > .story + .comment,
    body > .comment + .comment
    {
        margin-top: 10px;
    }
    .comment, .pollopt
    {
        border: 1px solid black;
    }
    """
    el("html")(el("head")(el("style")(txt(css))), el("body")(bodyChildren: _*))
  }

  private def assertEquivalent(rendered: String, expected: El): Unit =
    assert(norm(parse(rendered)) == norm(expected))

  // ---- fixtures shared with RenderSpec's mini-set ----

  private val story = Render.RItem(1L, "story", Some("alice"), 1704439689L,
    None, Some("https://example.com"), Some(42L), Some("Big <News>"), None)
  private val c2 = Render.RItem(2L, "comment", Some("bob"), 1704450000L,
    Some("later<p>thoughts"), None, None, None, Some(1L))
  private val c3 = Render.RItem(3L, "comment", None, 1704440000L,
    None, None, None, None, Some(1L))

  test("story page structurally equals the reference append sequence") {
    val tree = Render.Node(story, Seq(
      Render.Node(c3, Nil), Render.Node(c2, Nil))) // time order, as buildTree sorts
    val expected = refPage(
      refStory(1L, "alice", refDate, "Big <News>", "https://example.com", 42L),
      refComment(3L, "[deleted]", "2024 Jan 05 07:33:20", "[deleted]"),
      refComment(2L, "bob", "2024 Jan 05 10:20:00", "later<p>thoughts"))
    assertEquivalent(Render.renderPage(tree), expected)
  }

  test("comment page nests replies inside the parent div, reference-style") {
    val tree = Render.Node(c3, Seq(Render.Node(c2, Nil)))
    val expected = refPage(
      refComment(3L, "[deleted]", "2024 Jan 05 07:33:20", "[deleted]",
        children = Vector(
          refComment(2L, "bob", "2024 Jan 05 10:20:00", "later<p>thoughts"))))
    assertEquivalent(Render.renderPage(tree), expected)
  }

  test("job page structurally equals the reference append sequence") {
    val job = Render.RItem(5L, "job", None, 1704439689L,
      Some("Apply<p>now"), None, None, Some("Hiring"), None)
    // html_render_job (hnarchive.py:355-368): h1 title, optional text, no userinfo
    val expected = refPage(
      El("div", Map("class" -> "job", "id" -> "5"),
        Vector(el("h1")(txt("Hiring"))) ++ refFixPtags("Apply<p>now")))
    assertEquivalent(Render.renderPage(Render.Node(job, Nil)), expected)
  }

  test("poll page appends options inside the story shell, then comment trees") {
    val poll = Render.RItem(9L, "poll", Some("pat"), 1704439689L, None,
      Some("https://example.com"), Some(5L), Some("Which?"), None)
    val optA = Render.RItem(10L, "pollopt", None, 0L, Some("opt A"), None,
      Some(3L), None, Some(9L))
    val tree = Render.Node(poll, Seq(Render.Node(c2, Nil)))
    // html_render_poll (hnarchive.py:370-375): story render + pollopt divs
    // inside it; page then appends child comment trees after the poll div
    val refPollopt = El("div", Map("class" -> "pollopt"),
      refFixPtags("opt A") :+ el("p")(txt("3 points")))
    val storyShell = refStory(9L, "pat", refDate, "Which?", "https://example.com",
      5L, cls = "poll")
    val expected = refPage(
      storyShell.copy(children = storyShell.children :+ refPollopt),
      refComment(2L, "bob", "2024 Jan 05 10:20:00", "later<p>thoughts"))
    assertEquivalent(Render.renderPage(tree, Seq(optA)), expected)
  }
}
