package graft.core

import java.util.Locale

import scala.collection.mutable.ArrayBuffer

/** Markup (HTML/XML) extraction support — the engine behind the
  * reference's `text_html` / `text_xml` / `application_xml` transform
  * dispatch (reference: datagrowth/processors/input/extraction.py:
  * 156-200). The reference evaluates BeautifulSoup expressions with
  * Python `eval`; this module instead PARSES the same soup-path
  * micro-syntax (`soup.find_all('a')`, `el['href']`,
  * `el.find('url').text`) into a safe, eval-free accessor chain, so
  * reference objectives port verbatim without arbitrary code execution.
  *
  * Parsing: XML goes through the JDK's namespace-unaware
  * `DocumentBuilder` (external entities and DTD loading disabled);
  * HTML — and any malformed XML — falls back to a tolerant stack-based
  * tokenizer that handles doctypes, comments, void elements, unmatched
  * end tags and bare ampersands, the way lenient HTML parsers do.
  */
object Markup {

  /** One element node: lower-cased tag, document-order attributes, and
    * children (elements interleaved with text runs). */
  final case class Elem(tag: String, attrs: Seq[(String, String)],
                        children: Seq[Either[Elem, String]]) {

    def attr(name: String): Option[String] =
      attrs.collectFirst { case (k, v) if k == name => v }

    /** All text content, concatenated in document order (BeautifulSoup
      * `.text` / `get_text()` — no separators, no stripping). */
    def text: String = {
      val sb = new java.lang.StringBuilder
      def walk(e: Elem): Unit = e.children.foreach {
        case Left(child) => walk(child)
        case Right(s) => sb.append(s)
      }
      walk(this)
      sb.toString
    }

    def childElems: Seq[Elem] = children.collect { case Left(e) => e }

    /** Descendants (document order, self excluded). */
    def descendants: Iterator[Elem] =
      childElems.iterator.flatMap(c => Iterator(c) ++ c.descendants)

    def findAll(selector: String): Seq[Elem] = {
      val sel = Selector.parse(selector)
      descendants.filter(sel.matches).toSeq
    }

    def find(selector: String): Option[Elem] = {
      val sel = Selector.parse(selector)
      descendants.find(sel.matches)
    }
  }

  /** A compound simple selector: `tag`, `#id`, `.class`, `[attr]`,
    * `[attr=value]`, or combinations (`a.btn#x[rel=nofollow]`). */
  final case class Selector(tag: Option[String], id: Option[String],
                            classes: Seq[String], attrs: Seq[(String, Option[String])]) {
    def matches(e: Elem): Boolean =
      tag.forall(_ == e.tag) &&
        id.forall(i => e.attr("id").contains(i)) &&
        classes.forall(c => e.attr("class").exists(_.split("\\s+").contains(c))) &&
        attrs.forall { case (k, v) =>
          e.attr(k).exists(actual => v.forall(_ == actual))
        }
  }

  object Selector {
    def parse(s: String): Selector = {
      var tag: Option[String] = None
      var id: Option[String] = None
      val classes = Seq.newBuilder[String]
      val attrs = Seq.newBuilder[(String, Option[String])]
      var i = 0
      val n = s.length
      def readName(): String = {
        val start = i
        while (i < n && s.charAt(i) != '#' && s.charAt(i) != '.' && s.charAt(i) != '[') i += 1
        s.substring(start, i)
      }
      if (i < n && s.charAt(i) != '#' && s.charAt(i) != '.' && s.charAt(i) != '[')
        tag = Some(readName().toLowerCase(Locale.ROOT))
      while (i < n) {
        s.charAt(i) match {
          case '#' => i += 1; id = Some(readName())
          case '.' => i += 1; classes += readName()
          case '[' =>
            val close = s.indexOf(']', i)
            require(close > i, s"Unclosed [attr] in selector: $s")
            val inner = s.substring(i + 1, close)
            i = close + 1
            inner.split("=", 2) match {
              case Array(k) => attrs += (k.trim -> None)
              case Array(k, v) => attrs += (k.trim -> Some(stripQuotes(v.trim)))
            }
          case c => throw new IllegalArgumentException(s"Bad selector char '$c' in: $s")
        }
      }
      Selector(tag, id, classes.result(), attrs.result())
    }
    private def stripQuotes(v: String): String =
      if (v.length >= 2 && (v.head == '"' || v.head == '\'') && v.last == v.head)
        v.substring(1, v.length - 1)
      else v
  }

  // ---------------------------------------------------------------- parsing

  /** Strict XML through the JDK parser (secure: no DTD loading, no
    * external entities); malformed input falls back to the tolerant
    * parser, like lxml-backed soup would recover. */
  def parseXml(input: String): Elem =
    try parseStrictXml(input)
    catch { case _: Exception => parseTolerant(input) }

  /** HTML: always the tolerant parser (real HTML is rarely well-formed
    * XML — void elements, unclosed tags, bare ampersands). */
  def parseHtml(input: String): Elem = parseTolerant(input)

  private def parseStrictXml(input: String): Elem = {
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(false)
    // Doctype declarations rejected outright: an inline DTD with internal
    // entity definitions enables entity-expansion amplification from
    // untrusted scraped XML. Doctyped-but-well-formed input falls through
    // to the tolerant parser, which leaves entity references unexpanded.
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    factory.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    factory.setXIncludeAware(false)
    factory.setExpandEntityReferences(false)
    val builder = factory.newDocumentBuilder()
    builder.setErrorHandler(null) // quiet; errors surface as exceptions
    val doc = builder.parse(new org.xml.sax.InputSource(new java.io.StringReader(input)))
    fromDom(doc.getDocumentElement)
  }

  private def fromDom(node: org.w3c.dom.Element): Elem = {
    val attrs = Seq.newBuilder[(String, String)]
    val nm = node.getAttributes
    (0 until nm.getLength).foreach { i =>
      val a = nm.item(i)
      attrs += (a.getNodeName.toLowerCase(Locale.ROOT) -> a.getNodeValue)
    }
    val children = Seq.newBuilder[Either[Elem, String]]
    val kids = node.getChildNodes
    (0 until kids.getLength).foreach { i =>
      kids.item(i) match {
        case e: org.w3c.dom.Element => children += Left(fromDom(e))
        case t: org.w3c.dom.Text => children += Right(t.getData)
        case c: org.w3c.dom.CDATASection => children += Right(c.getData)
        case _ => ()
      }
    }
    Elem(node.getTagName.toLowerCase(Locale.ROOT), attrs.result(), children.result())
  }

  /** HTML void elements — never have children, `<br>` needs no close. */
  private val VoidElements = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Content of these is raw text until the matching close tag. */
  private val RawTextElements = Set("script", "style")

  /** HTML implicit-close pairs: opening the key tag first closes any of
    * the value tags sitting on top of the stack (`<li>one<li>two` is two
    * siblings, not nesting). */
  private val ImplicitClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"), "p" -> Set("p"), "option" -> Set("option"),
    "tr" -> Set("tr", "td", "th"), "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "dd" -> Set("dd", "dt"), "dt" -> Set("dd", "dt"))

  private final class OpenElem(val tag: String, val attrs: Seq[(String, String)]) {
    val children = new ArrayBuffer[Either[Elem, String]]
    def close(): Elem = Elem(tag, attrs, children.toSeq)
  }

  /** Tolerant stack-based tokenizer: skips doctype/comments/processing
    * instructions, lower-cases tags, treats void elements as self-
    * closing, pops to the nearest matching open tag on an end tag
    * (ignoring unmatched ones), and decodes entities leniently. Multiple
    * roots (or stray top-level text) are wrapped in a synthetic
    * `[document]` root, like soup's document node. */
  def parseTolerant(input: String): Elem = {
    val root = new OpenElem("[document]", Nil)
    var stack = List(root)
    var i = 0
    val n = input.length
    val text = new java.lang.StringBuilder

    def flushText(): Unit = {
      if (text.length > 0) {
        stack.head.children += Right(decodeEntities(text.toString))
        text.setLength(0)
      }
    }

    while (i < n) {
      val c = input.charAt(i)
      if (c == '<' && i + 1 < n) {
        val next = input.charAt(i + 1)
        if (next == '!') {
          flushText()
          if (input.startsWith("<!--", i)) {
            val end = input.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else { // doctype or other declaration
            val end = input.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (next == '?') { // processing instruction
          flushText()
          val end = input.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (next == '/') { // end tag
          flushText()
          val end = input.indexOf('>', i)
          val name = (if (end < 0) input.substring(i + 2)
                      else input.substring(i + 2, end)).trim.toLowerCase(Locale.ROOT)
          i = if (end < 0) n else end + 1
          if (stack.exists(_.tag == name)) {
            while (stack.head.tag != name) {
              val closed = stack.head.close()
              stack = stack.tail
              stack.head.children += Left(closed)
            }
            if (stack.head ne root) {
              val closed = stack.head.close()
              stack = stack.tail
              stack.head.children += Left(closed)
            }
          } // unmatched end tag: ignored
        } else if (next.isLetter) { // start tag
          flushText()
          val (elem, selfClosed, after) = parseStartTag(input, i)
          i = after
          ImplicitClose.get(elem.tag).foreach { closes =>
            while ((stack.head ne root) && closes.contains(stack.head.tag)) {
              val closed = stack.head.close()
              stack = stack.tail
              stack.head.children += Left(closed)
            }
          }
          if (VoidElements.contains(elem.tag) || selfClosed) {
            stack.head.children += Left(Elem(elem.tag, elem.attrs, Nil))
          } else if (RawTextElements.contains(elem.tag)) {
            val closeTag = s"</${elem.tag}"
            // the close tag must end at a TAG BOUNDARY (whitespace,
            // '/', '>' or EOF) — a bare prefix match would let
            // "</scripts>" terminate a <script> early and leak script
            // payload into the page text (the html.parser rule)
            var end = indexOfIgnoreCase(input, closeTag, i)
            while (end >= 0 && end + closeTag.length < n && {
              val after = input.charAt(end + closeTag.length)
              !(after == '>' || after == '/' || Character.isWhitespace(after))
            }) end = indexOfIgnoreCase(input, closeTag, end + 1)
            val raw = if (end < 0) input.substring(i) else input.substring(i, end)
            stack.head.children += Left(Elem(elem.tag, elem.attrs, Seq(Right(raw))))
            if (end < 0) i = n
            else i = math.min(n, input.indexOf('>', end).max(end) + 1)
          } else {
            stack = elem :: stack
          }
        } else { // stray '<'
          text.append(c); i += 1
        }
      } else {
        text.append(c); i += 1
      }
    }
    flushText()
    while (stack.head ne root) {
      val closed = stack.head.close()
      stack = stack.tail
      stack.head.children += Left(closed)
    }
    // single element root (plus whitespace-only text) unwraps to it
    val rootElem = root.close()
    rootElem.children.collect { case Left(e) => e } match {
      case Seq(only) if rootElem.children.forall {
            case Right(s) => s.trim.isEmpty
            case _ => true
          } => only
      case _ => rootElem
    }
  }

  /** First index of `needle` in `haystack` at/after `from`, compared
    * case-insensitively WITHOUT materializing a case-mapped copy. Unicode
    * case mapping can change string length (U+0130 'İ' lowercases to two
    * chars), so offsets computed on a lowercased copy do not line up
    * with `input` — never index one string with offsets from the other.
    */
  private def indexOfIgnoreCase(haystack: String, needle: String, from: Int): Int = {
    val max = haystack.length - needle.length
    var i = math.max(from, 0)
    while (i <= max) {
      if (haystack.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def parseStartTag(input: String, start: Int): (OpenElem, Boolean, Int) = {
    var i = start + 1
    val n = input.length
    val nameStart = i
    while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '-'
      || input.charAt(i) == ':' || input.charAt(i) == '_')) i += 1
    val tag = input.substring(nameStart, i).toLowerCase(Locale.ROOT)
    val attrs = Seq.newBuilder[(String, String)]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && input.charAt(i).isWhitespace) i += 1
      if (i < n && input.charAt(i) == '>') { i += 1; done = true }
      else if (i < n && input.charAt(i) == '/') {
        i += 1
        if (i < n && input.charAt(i) == '>') { i += 1; selfClosed = true; done = true }
      } else if (i < n) {
        val aStart = i
        while (i < n && !input.charAt(i).isWhitespace && input.charAt(i) != '='
          && input.charAt(i) != '>' && input.charAt(i) != '/') i += 1
        val name = input.substring(aStart, i).toLowerCase(Locale.ROOT)
        while (i < n && input.charAt(i).isWhitespace) i += 1
        var value = ""
        if (i < n && input.charAt(i) == '=') {
          i += 1
          while (i < n && input.charAt(i).isWhitespace) i += 1
          if (i < n && (input.charAt(i) == '"' || input.charAt(i) == '\'')) {
            val quote = input.charAt(i)
            i += 1
            val vStart = i
            while (i < n && input.charAt(i) != quote) i += 1
            value = input.substring(vStart, i)
            if (i < n) i += 1
          } else {
            val vStart = i
            while (i < n && !input.charAt(i).isWhitespace && input.charAt(i) != '>') i += 1
            value = input.substring(vStart, i)
          }
        }
        if (name.nonEmpty) attrs += (name -> decodeEntities(value))
      }
    }
    (new OpenElem(tag, attrs.result()), selfClosed, i)
  }

  /** Lenient entity decoding: the five XML entities, a few common HTML
    * ones, numeric references; anything unrecognized passes through. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        val decoded: Option[String] =
          if (semi < 0 || semi - i > 10) None
          else s.substring(i + 1, semi) match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case ref if ref.startsWith("#x") || ref.startsWith("#X") =>
              try Some(Character.toString(Integer.parseInt(ref.substring(2), 16)))
              catch { case _: Exception => None }
            case ref if ref.startsWith("#") =>
              try Some(Character.toString(Integer.parseInt(ref.substring(1))))
              catch { case _: Exception => None }
            case _ => None
          }
        decoded match {
          case Some(d) => sb.append(d); i = semi + 1
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------- soup paths

  /** A parsed soup-path: the reference's objective strings
    * (`soup.find_all('a')`, `el.find('url').text`, `el['href']`,
    * `el.text`) interpreted WITHOUT eval. The receiver names mirror the
    * reference's eval scope: `soup` is the document root, `el` the
    * current node (extraction.py:156-181). */
  final case class SoupPath(receiver: String, steps: Seq[SoupPath.Step]) {
    import SoupPath._

    /** Evaluate against (root, element). Returns either a node list
      * (selection paths) or a string (value paths); None when any step
      * finds nothing. */
    def eval(soup: Elem, el: Option[Elem]): Option[Either[Seq[Elem], String]] = {
      val start: Elem = receiver match {
        case "soup" => soup
        case "el" => el.getOrElse(return None)
        case other => throw new IllegalArgumentException(s"Unknown receiver '$other'")
      }
      var current: Either[Seq[Elem], String] = Left(Seq(start))
      steps.foreach { step =>
        val elems = current match {
          case Left(es) => es
          case Right(_) =>
            throw new IllegalArgumentException("Cannot navigate past a value step")
        }
        step match {
          case FindAll(sel) => current = Left(elems.flatMap(_.findAll(sel)))
          case Find(sel) =>
            elems.headOption.flatMap(_.find(sel)) match {
              case Some(e) => current = Left(Seq(e))
              case None => return None
            }
          case Attr(name) =>
            elems.headOption.flatMap(_.attr(name)) match {
              case Some(v) => current = Right(v)
              case None => return None
            }
          case Text =>
            elems.headOption match {
              case Some(e) => current = Right(e.text)
              case None => return None
            }
        }
      }
      Some(current)
    }

    /** Value form: a string or nothing (for field/context objectives). */
    def evalValue(soup: Elem, el: Option[Elem]): Option[String] =
      eval(soup, el).map {
        case Right(s) => s
        case Left(es) => es.map(_.text).mkString
      }

    /** Selection form: the node list (for `@` objectives). */
    def evalNodes(soup: Elem, el: Option[Elem]): Seq[Elem] =
      eval(soup, el) match {
        case Some(Left(es)) => es
        case Some(Right(_)) =>
          throw new IllegalArgumentException("'@' objective must select elements, not a value")
        case None => Seq.empty
      }
  }

  object SoupPath {
    sealed trait Step
    final case class FindAll(selector: String) extends Step
    final case class Find(selector: String) extends Step
    final case class Attr(name: String) extends Step
    case object Text extends Step

    /** Parse `receiver(.find_all('sel')|.find('sel')|['attr']|.text)*`. */
    def parse(expr: String): SoupPath = {
      val s = expr.trim
      var i = 0
      val n = s.length
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"Can't parse soup path '$expr': $msg")
      val recStart = i
      while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      val receiver = s.substring(recStart, i)
      if (receiver != "soup" && receiver != "el") fail("receiver must be 'soup' or 'el'")
      val steps = Seq.newBuilder[Step]
      while (i < n) {
        s.charAt(i) match {
          case '.' =>
            i += 1
            val mStart = i
            while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            val method = s.substring(mStart, i)
            method match {
              case "text" => steps += Text
              case "find" | "find_all" =>
                if (i >= n || s.charAt(i) != '(') fail(s"expected ( after $method")
                i += 1
                val arg = readQuoted(s, i).getOrElse(fail(s"expected quoted selector in $method()"))
                i += arg._2
                while (i < n && s.charAt(i).isWhitespace) i += 1
                if (i >= n || s.charAt(i) != ')') fail(s"expected ) closing $method()")
                i += 1
                steps += (if (method == "find") Find(arg._1) else FindAll(arg._1))
              case other => fail(s"unsupported method .$other (use find/find_all/text)")
            }
          case '[' =>
            i += 1
            val arg = readQuoted(s, i).getOrElse(fail("expected quoted attribute in [...]"))
            i += arg._2
            while (i < n && s.charAt(i).isWhitespace) i += 1
            if (i >= n || s.charAt(i) != ']') fail("expected ] closing attribute access")
            i += 1
            steps += Attr(arg._1)
          case c if c.isWhitespace => i += 1
          case c => fail(s"unexpected '$c'")
        }
      }
      SoupPath(receiver, steps.result())
    }

    /** Reads a quoted string at position i (skipping leading spaces);
      * returns (content, charsConsumed). */
    private def readQuoted(s: String, start: Int): Option[(String, Int)] = {
      var i = start
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i >= s.length || (s.charAt(i) != '\'' && s.charAt(i) != '"')) return None
      val quote = s.charAt(i)
      val close = s.indexOf(quote, i + 1)
      if (close < 0) return None
      Some((s.substring(i + 1, close), close + 1 - start))
    }
  }

  // ---- Main-content extraction (boilerplate removal) ----------------
  // The trafilatura/boilerpipe move over this parser's DOM: drop the
  // structurally-non-content subtrees (script/nav/footer/... tags and
  // boilerplate-named id/class values), split what remains into LEAF
  // BLOCKS (elements with only inline children), and keep a block when
  // it carries enough text at a low enough LINK DENSITY — navigation
  // and "related links" read as text too, but their text lives inside
  // anchors, which is exactly what the density threshold sees. The
  // corpus-level complement is the shingle-frequency boilerplate
  // operator (q41): that one finds REPEATED boilerplate across a
  // crawl; this one finds STRUCTURAL boilerplate inside one page,
  // with no second pass over the corpus.

  /** Subtrees that are never main content, whatever their text. */
  val DroppedTags: Set[String] = Set("script", "style", "noscript",
    "nav", "header", "footer", "aside", "form", "iframe", "svg",
    "button", "select", "option", "template", "head", "figure",
    "figcaption", "label")

  /** Tags that do NOT break a text block (flow-inline content). */
  val InlineTags: Set[String] = Set("a", "b", "i", "em", "strong",
    "span", "code", "u", "s", "small", "sup", "sub", "abbr", "time",
    "mark", "br", "img", "wbr", "q", "cite", "kbd", "var", "samp")

  private val BoilerAttrPattern = java.util.regex.Pattern.compile(
    "(?i)(?:^|[\\s_-])(nav|menu|sidebar|footer|comment|comments|share|" +
      "social|ad|ads|advert|banner|promo|related|breadcrumb|widget)" +
      "(?:$|[\\s_-])")

  private def isBoilerAttr(e: Elem): Boolean =
    Seq("id", "class").exists(a =>
      e.attr(a).exists(v => BoilerAttrPattern.matcher(v).find()))

  /** Whitespace-collapse: runs of whitespace → one space, trimmed. */
  def normalizeSpace(s: String): String = {
    val sb = new java.lang.StringBuilder
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = sb.length > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Text and anchor-text length of a subtree, skipping dropped /
    * boilerplate-named descendants. Link length is counted on
    * normalized runs so density compares like with like. */
  private def textAndLink(e: Elem): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var link = 0
    def go(x: Elem, inA: Boolean): Unit =
      if (!DroppedTags(x.tag) && !isBoilerAttr(x))
        x.children.foreach {
          case Right(s) =>
            sb.append(s)
            if (inA) link += normalizeSpace(s).length
          case Left(c) => go(c, inA || c.tag == "a")
        }
    go(e, e.tag == "a")
    (sb.toString, link)
  }

  /** MAIN-CONTENT text of an HTML page — the body text a training
    * pipeline wants, with navigation/ads/footers removed. Scope:
    * `<article>` or `<main>` when present (the page declared its
    * content), else `<body>`, else the whole tree. Kept blocks join
    * with a newline, each whitespace-normalized. A block survives
    * when its text is at least `minBlockChars` AND its link density
    * (anchor chars / total chars) is at most `maxLinkDensity` — a
    * "related articles" list is mostly anchor text and dies here even
    * when its classes look innocent. Deterministic and per-row local:
    * as a column op this is one UDF projection, no shuffle. */
  def mainContent(html: String, minBlockChars: Int = 25,
                  maxLinkDensity: Double = 0.33): String = {
    if (html == null) return ""
    val root = parseHtml(html)
    val scope = root.find("article").orElse(root.find("main"))
      .orElse(root.find("body")).getOrElse(root)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def isLeafBlock(e: Elem): Boolean =
      e.childElems.forall(c =>
        InlineTags(c.tag) || DroppedTags(c.tag) || isBoilerAttr(c))
    def collect(e: Elem): Unit =
      if (!DroppedTags(e.tag) && !isBoilerAttr(e)) {
        if (isLeafBlock(e)) {
          val (txt, link) = textAndLink(e)
          val norm = normalizeSpace(txt)
          if (norm.length >= minBlockChars &&
              link.toDouble <= maxLinkDensity * norm.length)
            out += norm
        } else e.childElems.foreach(collect)
      }
    collect(scope)
    out.mkString("\n")
  }
}
