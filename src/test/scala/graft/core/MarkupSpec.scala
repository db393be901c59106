package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's markup transform tests
  * (tests/django_project/processors/tests/transformation.py with the
  * MOCK_HTML / MOCK_XML / MOCK_SCRAPE_DATA fixtures from
  * tests/django_project/project/mocks/data.py:39-92). */
class MarkupSpec extends AnyFunSuite {

  // tests/django_project/project/mocks/data.py:39-64 (not well-formed
  // XML: lowercase doctype — exercises the tolerant parser)
  val MockHtml: String =
    """
      |<!doctype html>
      |<html>
      |
      |<head>
      |    <title>Test</title>
      |</head>
      |
      |<body>
      |
      |</body>
      |
      |<div id="content">
      |    <p>
      |        A list with links:
      |        <ul>
      |            <li><a href="/test">test</a></li>
      |            <li><a href="/test2">test 2</a></li>
      |            <li><a href="/test3">test 3</a></li>
      |            <li>That's it!</li>
      |        </ul>
      |    </p>
      |</div>
      |
      |</html>
      |""".stripMargin

  // tests/django_project/project/mocks/data.py:65-87 (well-formed —
  // exercises the strict JDK XML path)
  val MockXml: String =
    """
      |<xml>
      |    <meta>
      |        <title>Test</title>
      |    </meta>
      |
      |    <results>
      |        <result>
      |            <label>test</label>
      |            <url>/test</url>
      |        </result>
      |        <result>
      |            <label>test 2</label>
      |            <url>/test2</url>
      |        </result>
      |        <result>
      |            <label>test 3</label>
      |            <url>/test3</url>
      |        </result>
      |    </results>
      |
      |</xml>
      |""".stripMargin

  // data.py:88-92 MOCK_SCRAPE_DATA — expected output for both fixtures
  val expected = Seq(
    ("test", "/test", "Test"),
    ("test 2", "/test2", "Test"),
    ("test 3", "/test3", "Test"))

  def htmlObjective: MarkupObjective = MarkupObjective.fromJson(
    """{"@": "soup.find_all('a')", "text": "el.text", "link": "el['href']",
      | "#page": "soup.find('title').text"}""".stripMargin)

  def xmlObjective: MarkupObjective = MarkupObjective.fromJson(
    """{"@": "soup.find_all('result')", "text": "el.find('label').text",
      | "link": "el.find('url').text", "#page": "soup.find('title').text"}""".stripMargin)

  private def parse(rows: Array[String]): Seq[(String, String, String)] =
    rows.toSeq.map { json =>
      val n = PyJson.parse(json)
      (n.get("text").asText, n.get("link").asText, n.get("page").asText)
    }

  test("text/html extraction matches MOCK_SCRAPE_DATA (transformation.py text_html)") {
    assert(parse(htmlObjective.extractMarkup("text/html", MockHtml)) === expected)
  }

  test("text/xml and application/xml extraction match MOCK_SCRAPE_DATA") {
    assert(parse(xmlObjective.extractMarkup("text/xml", MockXml)) === expected)
    assert(parse(xmlObjective.extractMarkup("application/xml", MockXml)) === expected)
  }

  test("callable objectives (transformation.py callables=True)") {
    val obj = MarkupObjective(
      at = null,
      fields = Seq("text" -> "el.find('label').text"),
      atFunction = Some((soup: Markup.Elem) => soup.findAll("result")),
      fieldFunctions = Seq(
        "link" -> ((_: Markup.Elem, el: Markup.Elem) =>
          el.find("url").map(_.text).getOrElse(null)),
        "page" -> ((soup: Markup.Elem, _: Markup.Elem) =>
          soup.find("title").map(_.text).getOrElse(null))))
    assert(parse(obj.extractMarkup("text/xml", MockXml)) === expected)
  }

  test("single-element '@' wraps to a one-element list (extraction.py:170-172)") {
    val obj = MarkupObjective.fromJson(
      """{"@": "soup.find('title')", "t": "el.text"}""")
    val out = obj.extractMarkup("text/xml", MockXml)
    assert(out.length === 1)
    assert(PyJson.parse(out(0)).get("t").asText === "Test")
  }

  test("unknown content type raises; missing values go null; empty objectives skipped") {
    intercept[IllegalArgumentException] {
      htmlObjective.extractMarkup("application/pdf", "x")
    }
    val obj = MarkupObjective.fromJson(
      """{"@": "soup.find_all('a')", "missing": "el['nope']", "skipped": "", "t": "el.text"}""")
    val out = obj.extractMarkup("text/html", "<p><a href='/x'>hi</a></p>")
    val n = PyJson.parse(out(0))
    assert(n.get("missing").isNull)
    assert(!n.has("skipped"))
    assert(n.get("t").asText === "hi")
  }

  test("tolerant parser: void elements, unclosed tags, attributes, entities") {
    val html =
      """<html><body><img src="a.png"><br>
        |<ul><li>one<li>two &amp; three</ul>
        |<a class="btn primary" href=/plain>go</a></body></html>""".stripMargin
    val root = Markup.parseHtml(html)
    assert(root.findAll("img").head.attr("src") === Some("a.png"))
    assert(root.findAll("li").map(_.text.trim.replaceAll("\\s+", " ")) ===
      Seq("one", "two & three"))
    assert(root.findAll("a.btn").head.attr("href") === Some("/plain"))
    assert(root.findAll("a[href=/plain]").length === 1)
    assert(root.find("script").isEmpty)
  }

  test("raw-text elements close only at a TAG-BOUNDARY close tag (</scripts> is payload, not a close)") {
    // a bare prefix match would close <script> at "</scripts>" and
    // leak script payload into the page text
    val root = Markup.parseHtml(
      "<html><body><p>before</p><script>var a = '</scripts>' + 1;</script><p>after</p></body></html>")
    // the whole payload INCLUDING "</scripts>'" stays inside the
    // script element; "' + 1;" must not leak out as page text
    assert(root.findAll("script").head.text === "var a = '</scripts>' + 1;")
    assert(root.findAll("p").map(_.text) === Seq("before", "after"))
    // whitespace and '/' boundaries still close
    val ws = Markup.parseHtml("<body><style>x{}</style ><p>ok</p></body>")
    assert(ws.findAll("p").map(_.text) === Seq("ok"))
  }

  test("strict XML security: doctype/external entities do not resolve") {
    // An external-entity payload must not read files; tolerant fallback
    // keeps the element structure with the entity unresolved.
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE r [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<r><v>&xxe;</v></r>""".stripMargin
    val root = Markup.parseXml(evil)
    val v = root.find("v").map(_.text).getOrElse("")
    assert(!v.contains("\n") && (v.isEmpty || v == "&xxe;"),
      s"external entity must not be resolved, got: '$v'")
  }

  test("tolerant parser is total: never throws on arbitrary input") {
    val rnd = new scala.util.Random(42)
    val alphabet = "<>/=\"' abc&;!-#".toCharArray
    (1 to 500).foreach { _ =>
      val s = Array.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val root = Markup.parseHtml(s) // must not throw
      root.text // traversal must not throw either
    }
    // pathological-but-real shapes
    Seq("", "<", "</", "<a", "<a href", "<a href=", "<a href='x", "<!--", "<!-- -->x",
      "<!doctype", "<?xml", "</unopened>", "<b><i></b></i>", "<script>if (a<b) x();</script>",
      "&unknown; &#xZZ; &#99999999999;", "<p>" * 50).foreach { s =>
      Markup.parseHtml(s).text
    }
  }

  test("raw-text close-tag scan survives length-changing case mappings") {
    // U+0130 'İ' lowercases to TWO chars — offsets computed on a
    // lowercased copy would overshoot the original and throw (or
    // silently corrupt the script slice and swallow following content).
    val html = "İİİİİİİİİİ<p>önce</p><SCRIPT>var x = 1;</SCRIPT><p>sonra</p>"
    val root = Markup.parseHtml(html)
    assert(root.find("script").map(_.text) === Some("var x = 1;"))
    assert(root.findAll("p").map(_.text) === Seq("önce", "sonra"))
  }

  test("uppercase and mixed-case raw-text close tags match") {
    val root = Markup.parseHtml("<script>a<b</ScRiPt><i>x</i>")
    assert(root.find("script").map(_.text) === Some("a<b"))
    assert(root.find("i").map(_.text) === Some("x"))
  }

  test("inline DTD entity definitions are not expanded") {
    // disallow-doctype-decl rejects the strict parse; the tolerant
    // fallback keeps structure with entity references unexpanded — no
    // entity-expansion amplification from scraped XML.
    val xml = """<?xml version="1.0"?>
      |<!DOCTYPE r [<!ENTITY a "aaaa"><!ENTITY b "&a;&a;&a;&a;">]>
      |<r><v>&b;</v></r>""".stripMargin
    val root = Markup.parseXml(xml)
    assert(root.find("v").map(_.text) === Some("&b;"))
  }

  test("tag case-folding is locale-independent") {
    val saved = java.util.Locale.getDefault
    try {
      // Turkish locale: default-locale lowercase maps 'I' to dotless 'ı',
      // so <DIV>/<SCRIPT> would stop matching without Locale.ROOT.
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val root = Markup.parseHtml("<DIV id=x>t</DIV><SCRIPT>s()</SCRIPT>")
      assert(root.find("div").map(_.text) === Some("t"))
      assert(root.find("script").map(_.text) === Some("s()"))
      val strict = Markup.parseXml("<ROOT><ITEM>v</ITEM></ROOT>")
      assert(strict.find("item").map(_.text) === Some("v"))
    } finally java.util.Locale.setDefault(saved)
  }

  test("tolerant parser is total on non-ASCII input too") {
    val rnd = new scala.util.Random(7)
    val alphabet = "<>/=\"' abc&;!-#İıŞğÜßİı".toCharArray
    (1 to 300).foreach { _ =>
      val s = Array.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))).mkString
      Markup.parseHtml(s).text // must not throw
    }
  }

  test("mismatched-nesting recovery keeps content reachable") {
    val root = Markup.parseHtml("<div><b>bold <i>both</b> italic</i></div>")
    assert(root.text === "bold both italic")
    assert(root.find("b").isDefined && root.find("i").isDefined)
  }

  test("Objective.extractByContentType routes markup when configured, raises otherwise") {
    val json = Objective("$.items", Seq("id" -> "$.id"))
    val viaDispatch = Objective.extractByContentType(
      json, "text/html", MockHtml, markup = Some(htmlObjective))
    assert(parse(viaDispatch) === expected)
    intercept[IllegalArgumentException] {
      Objective.extractByContentType(json, "text/html", MockHtml)
    }
  }

  // ---- mainContent: block scoring over the tolerant DOM ------------

  test("mainContent: drops nav/footer/aside/script structurally, keeps content paragraphs in order") {
    val html = """<html><head><script>x()</script><style>p{}</style></head>
      |<body><nav><a>Home</a> <a>About us here</a></nav>
      |<p>First paragraph with enough characters to clear the floor.</p>
      |<aside>A sidebar note long enough to pass the length floor.</aside>
      |<p>Second paragraph also long enough to clear the floor.</p>
      |<footer>Copyright boilerplate footer text long enough to count.</footer>
      |</body></html>""".stripMargin
    assert(Markup.mainContent(html) ===
      "First paragraph with enough characters to clear the floor.\n" +
      "Second paragraph also long enough to clear the floor.")
  }

  test("mainContent: boilerplate-named classes and ids die whatever their tag") {
    val html = """<body>
      |<div class="sidebar left">Sidebar prose long enough to pass the length floor.</div>
      |<div id="main-menu">Menu prose long enough to pass the length floor too.</div>
      |<div class="content">Real content prose long enough to clear the floor.</div>
      |</body>"""
      .stripMargin
    assert(Markup.mainContent(html) ===
      "Real content prose long enough to clear the floor.")
  }

  test("mainContent: link-dense blocks die; low-density blocks with some links survive") {
    val html = """<body>
      |<p><a>Related link one here</a> <a>Related link two here</a> <a>Related link three</a></p>
      |<p>Prose sentence that cites <a>one link</a> among plenty of ordinary words around it.</p>
      |</body>""".stripMargin
    assert(Markup.mainContent(html) ===
      "Prose sentence that cites one link among plenty of ordinary words around it.")
  }

  test("mainContent: short blocks die; whitespace normalizes; blocks join with newline") {
    val html = "<body><p>Too short.</p><p>  A   kept\tparagraph\n with messy   " +
      "whitespace inside it. </p><div>Another kept block with plenty of " +
      "characters.</div></body>"
    assert(Markup.mainContent(html) ===
      "A kept paragraph with messy whitespace inside it.\n" +
      "Another kept block with plenty of characters.")
  }

  test("mainContent: an <article> landmark scopes extraction; outside-article prose is ignored") {
    val html = """<body>
      |<p>Body-level teaser prose long enough to clear the floor.</p>
      |<article><p>The declared article body text long enough to keep.</p></article>
      |</body>""".stripMargin
    assert(Markup.mainContent(html) ===
      "The declared article body text long enough to keep.")
  }

  test("mainContent: a dropped subtree INSIDE a kept block costs only itself") {
    val html = "<body><p>Leading prose with enough characters to pass" +
      "<script>tracker()</script> and trailing prose after the script.</p></body>"
    assert(Markup.mainContent(html) ===
      "Leading prose with enough characters to pass and trailing prose after the script.")
  }

  test("mainContent: entities decode; null and junk input degrade to empty") {
    val html = "<body><p>Fish &amp; chips cost &lt;5 groats in this long sentence.</p></body>"
    assert(Markup.mainContent(html) ===
      "Fish & chips cost <5 groats in this long sentence.")
    assert(Markup.mainContent(null) === "")
    assert(Markup.mainContent("no tags at all") === "") // short stray text
  }
}
