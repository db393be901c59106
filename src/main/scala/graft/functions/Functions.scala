package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

import graft.core.{Hashing, Reach}

/** `reach(json, path)` as a native Catalyst expression — a scalar string
  * getter with the reference's dotted-key-fallback semantics (reference:
  * datagrowth/utils/data.py:10-76), which `get_json_object` cannot
  * express. Strings render raw, other values as JSON text (so it is
  * comparable with `get_json_object`/DuckDB `json_extract_string` for
  * standard paths).
  */
case class ReachExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_reach"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("reachExpr", this)
    // a missing path yields NULL — propagate it, not just child nulls
    nullSafeCodeGen(ctx, ev, (j, p) => {
      val r = ctx.freshName("reach")
      s"""
         |Object $r = $ref.compute($j, $p);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $r; }
       """.stripMargin
    })
  }
  def compute(json: UTF8String, path: UTF8String): AnyRef =
    nullSafeEval(json, path).asInstanceOf[AnyRef]
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val out = Reach.reachString(path.toString, json.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `reach_array(json, path, objectValues)`: resolves the path and returns
  * the elements of the resulting array (or the values of the resulting
  * object when objectValues — reference `extract_from_object_values`,
  * extraction.py:143-144) as JSON-rendered strings. The node-selection
  * step of the extraction objective (`"@"`).
  */
case class ReachArrayExpression(left: Expression, right: Expression, objectValues: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_reach_array"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("reachArrExpr", this)
    nullSafeCodeGen(ctx, ev, (j, p) => {
      val r = ctx.freshName("reachArr")
      s"""
         |Object $r = $ref.compute($j, $p);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $r; }
       """.stripMargin
    })
  }
  def compute(json: UTF8String, path: UTF8String): AnyRef =
    nullSafeEval(json, path).asInstanceOf[AnyRef]
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val out = Reach.reachArray(path.toString, json.toString, objectValues)
    if (out == null) null
    else new GenericArrayData(out.map(s => if (s == null) null else UTF8String.fromString(s)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `doc_content(properties, derivatives, id)` — the reference's
  * `Document.content` projection (document.py:113-126): `_`-keys
  * stripped, `_id` injected, flattened derivatives overlaid (first base
  * wins per key). Null id renders `_id: null` (unsaved doc).
  */
case class DocContentExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_doc_content"
  def computeNullable(props: AnyRef, derivs: AnyRef, id: AnyRef): AnyRef = {
    if (props == null) return null
    UTF8String.fromString(graft.core.DocOps.content(
      props.toString,
      if (derivs == null) null else derivs.toString,
      if (id == null) null else java.lang.Long.valueOf(id.asInstanceOf[java.lang.Number].longValue())))
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    computeNullable(first.eval(input).asInstanceOf[AnyRef],
      second.eval(input).asInstanceOf[AnyRef],
      third.eval(input).asInstanceOf[AnyRef])
  // manual codegen — derivatives and id are independently nullable
  // (null id renders `_id: null`), see JsonMergeExpression
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("docContentExpr", this)
    val p = first.genCode(ctx)
    val d = second.genCode(ctx)
    val i = third.genCode(ctx)
    val res = ctx.freshName("content")
    ev.copy(code =
      code"""
        ${p.code}
        ${d.code}
        ${i.code}
        Object $res = $ref.computeNullable(
          ${p.isNull} ? null : ((Object) ${p.value}),
          ${d.isNull} ? null : ((Object) ${d.value}),
          ${i.isNull} ? null : ((Object) java.lang.Long.valueOf(${i.value})));
        boolean ${ev.isNull} = ($res == null);
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${ev.isNull}
          ? null : (org.apache.spark.unsafe.types.UTF8String) $res;
      """)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** `json_merge(parent, child)` — shallow dict merge, child wins
  * (reference `override_dict`, utils/data.py:79-89 / Python
  * `dict.update` in `Document.update`, document.py:94). */
case class JsonMergeExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_merge"
  def computeNullable(a: AnyRef, b: AnyRef): AnyRef = {
    if (a == null && b == null) return null
    UTF8String.fromString(graft.core.DocOps.mergeShallow(
      if (a == null) null else a.toString,
      if (b == null) null else b.toString))
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    computeNullable(left.eval(input).asInstanceOf[AnyRef],
      right.eval(input).asInstanceOf[AnyRef])
  // manual codegen: the children are INDEPENDENTLY nullable (one null
  // side still merges), so nullSafeCodeGen's all-or-nothing null check
  // does not fit — boxed values pass through a reference call instead
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("jsonMergeExpr", this)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val res = ctx.freshName("merged")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        Object $res = $ref.computeNullable(
          ${l.isNull} ? null : ((Object) ${l.value}),
          ${r.isNull} ? null : ((Object) ${r.value}));
        boolean ${ev.isNull} = ($res == null);
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${ev.isNull}
          ? null : (org.apache.spark.unsafe.types.UTF8String) $res;
      """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `simhash(text)` — 64-bit SimHash in ONE pass over the token stream:
  * tokenize (shared CJK-aware definition, [[Tokenize]]), per-token
  * 64-bit hash = the first 8 bytes of
  * `md5(token)` read big-endian (i.e. the first 16 hex chars of the md5
  * digest as an unsigned 64-bit value — DuckDB's
  * `('0x' || substr(md5(tk), 1, 16))::UBIGINT`, bit-for-bit), ±1 votes
  * per bit position over the token STREAM (multiplicity counts), sign →
  * bit. A native expression because the composed-built-ins form needs 64
  * higher-order aggregate passes per row; the md5 bit definition keeps
  * the operator oracle-portable.
  */
case class SimHashExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  def compute(text: UTF8String): Long = nullSafeEval(text).asInstanceOf[Long]
  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private def tokenHash(tok: String): Long = {
    val d = digest.get()
    d.update(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bytes = d.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
    h
  }
  override protected def nullSafeEval(text: Any): Any = {
    val tokens = Tokenize.split(text.toString)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = tokenHash(tokens(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `graft_bpe_segment(word, merges)` — BPE subword segmentation of ONE
  * word under a LITERAL merge table, as a native kernel: the composed
  * form (`Bpe.subwordTokensComposed`) folds the table into `merges`
  * nested `replace` calls, which blows up the expression tree and the
  * generated code at real vocabulary sizes (32k merges ≈ 32k-deep
  * Catalyst tree — unrepresentable); this kernel carries the table as
  * plain data (constructor param — ships with the task binary like a
  * broadcast, ~600 KB at 32k merges) and loops it at eval.
  *
  * Semantics are EXACTLY the rank-order cascade (apply merge 0, then
  * 1, …, each pass merging all its occurrences left-to-right
  * non-overlapping — BpeSpec pins kernel ≡ composed):
  *  - WELL-FORMED tables (every side is a base symbol — one code
  *    point or the end mark — or the result of an earlier merge; all
  *    trained tables are, by construction) run the standard
  *    min-rank-first loop: O(len²) per word, INDEPENDENT of table
  *    size — the property a 32k-merge vocabulary needs. Equivalence
  *    with the cascade for well-formed tables is the textbook BPE
  *    result: a pair of rank i cannot appear before every lower rank
  *    that builds its sides has fired.
  *  - Arbitrary tables (adversarial ranks referencing symbols built
  *    LATER) fall back to the literal rank scan: O(merges) presence
  *    checks per word — still no string-replace passes and no
  *    expression-tree blowup, just slower per word.
  */
case class BpeSegmentExpression(child: Expression,
                                merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_segment"
  private val EndMark = "</w>"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // first rank wins on duplicate pairs (the cascade would have
      // merged every occurrence at the lower rank already).
      // Delimiter is SPACE deliberately: the tokenizer strips all
      // whitespace from symbols but passes U+0000 through, so a NUL
      // delimiter could collide two distinct pairs into one rank key
      // (("a", "\u0000b") vs ("a\u0000", "b")) while the wellFormed
      // guard (space-keyed) waves them past — space cannot appear in
      // any symbol, NUL can.
      m.putIfAbsent(l + " " + r, i)
    }
    m
  }
  @transient private lazy val wellFormed: Boolean = {
    val producible = new java.util.HashSet[String]()
    val seen = new java.util.HashSet[String]()
    def atomic(s: String): Boolean =
      s == EndMark || (s.nonEmpty && s.codePointCount(0, s.length) == 1)
    merges.forall { case (l, r) =>
      // a DUPLICATE pair is also disqualifying: the cascade would fire
      // the recreated occurrence at the duplicate's LATER rank, the
      // min-rank loop at the first — only the rank scan replays that
      val ok = seen.add(l + " " + r) &&
        (atomic(l) || producible.contains(l)) &&
        (atomic(r) || producible.contains(r))
      producible.add(l + r)
      ok
    }
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeSegmentExpr", this)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.compute($w);")
  }
  def compute(word: UTF8String): GenericArrayData =
    nullSafeEval(word).asInstanceOf[GenericArrayData]

  private def mergeAll(syms: java.util.ArrayList[String], l: String, r: String): Unit = {
    // one left-to-right non-overlapping pass, in place
    var read = 0
    var write = 0
    while (read < syms.size) {
      if (read + 1 < syms.size && syms.get(read) == l && syms.get(read + 1) == r) {
        syms.set(write, l + r); read += 2
      } else { syms.set(write, syms.get(read)); read += 1 }
      write += 1
    }
    while (syms.size > write) syms.remove(syms.size - 1)
  }

  override protected def nullSafeEval(wordAny: Any): Any = {
    val word = wordAny.toString
    val syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    syms.add(EndMark)
    if (wellFormed) {
      // min-rank-first: cost bounded by the word, not the table
      var done = false
      while (!done && syms.size > 1) {
        var best = -1
        var bestL: String = null
        var bestR: String = null
        var j = 0
        while (j + 1 < syms.size) {
          val rk = rank.get(syms.get(j) + " " + syms.get(j + 1))
          if (rk != null && (best < 0 || rk < best)) {
            best = rk; bestL = syms.get(j); bestR = syms.get(j + 1)
          }
          j += 1
        }
        if (best < 0) done = true
        else mergeAll(syms, bestL, bestR)
      }
    } else {
      // literal rank scan — correct for ANY table
      var r = 0
      while (r < merges.length && syms.size > 1) {
        val (l, rr) = merges(r)
        var present = false
        var j = 0
        while (!present && j + 1 < syms.size) {
          if (syms.get(j) == l && syms.get(j + 1) == rr) present = true
          j += 1
        }
        if (present) mergeAll(syms, l, rr)
        r += 1
      }
    }
    val out = new Array[AnyRef](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `tokens(text)` — THE tokenizer as a native expression: one pass of
  * [[Tokenize.split]] (CJK-aware, ASCII-whitespace + U+3000
  * separators), no regex. The composed column form
  * (regexp_replace-segment + regexp-split + filter) costs two full
  * regex passes per row with a Unicode script class — measured 2-5× on
  * the token-counting family at 600 k docs. Empty input yields an
  * empty array (never null elements), matching the filtered split.
  */
case class TokensExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tokens"
  def compute(text: UTF8String): GenericArrayData = {
    val toks = Tokenize.split(text.toString)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])
  // reference call, not CodegenFallback: the fallback path materializes
  // the whole input row per evaluation and severs the surrounding
  // whole-stage codegen span; a reference call keeps child columns as
  // generated variables (same pattern for the other string kernels)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("tokensExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** RFC 3986 §6.2.2 percent-encoding normalization, shared by
  * [[PctNormExpression]] and the URL-canonicalization spec twins:
  * `%XX` escapes of UNRESERVED characters (ALPHA / DIGIT / `-` `.`
  * `_` `~`) are decoded (`%41` → `A`, `%7e` → `~`); every other valid
  * escape keeps its percent form but with UPPERCASE hex (`%2f` →
  * `%2F`); a `%` not followed by two hex digits is copied verbatim
  * (crawl URLs are full of bare percent signs — normalization must
  * never throw). Decoding an unreserved escape can never introduce a
  * URL delimiter, so the pass is safe to run on the WHOLE url before
  * any structural parsing, and it is idempotent (decoded output has
  * no unreserved escapes left; surviving escapes are already
  * uppercase). */
object PctNorm {
  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1
  private def unreserved(code: Int): Boolean =
    (code >= '0' && code <= '9') || (code >= 'A' && code <= 'Z') ||
      (code >= 'a' && code <= 'z') ||
      code == '-' || code == '.' || code == '_' || code == '~'
  def normalize(s: String): String = {
    if (s.indexOf('%') < 0) return s // common case: no escapes at all
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h = hexVal(s.charAt(i + 1))
        val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val code = (h << 4) | l
          if (unreserved(code)) sb.append(code.toChar)
          else sb.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

/** `graft_pct_norm(url)` — [[PctNorm.normalize]] as a native
  * single-pass expression. Exists because the composed form (tokenize
  * on `%[0-9A-Fa-f]{2}|%|[^%]+` + `transform` + `array_join`) pays a
  * regex scan plus an array allocation per URL on the hottest dedup
  * path a crawl corpus runs (q115's canonicalizer is pure column
  * composition otherwise); the DuckDB oracle replays the composed
  * form rule for rule. */
case class PctNormExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pct_norm"
  def compute(url: UTF8String): UTF8String = {
    val s = url.toString
    val out = PctNorm.normalize(s)
    if (out eq s) url else UTF8String.fromString(out)
  }
  override protected def nullSafeEval(url: Any): Any =
    compute(url.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pctNormExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IDN host → ASCII (punycode) normalization shared by
  * [[IdnAsciiExpression]]: an all-ASCII host (the overwhelmingly
  * common case, checked in one char scan) is returned UNCHANGED —
  * byte-identical, so ASCII-only oracles never observe this rule; a
  * host with non-ASCII labels goes through `java.net.IDN.toASCII`
  * (RFC 3490 ToASCII with Nameprep) and is lowercased, so
  * `BÜCHER.example` and `xn--bcher-kva.example` key identically. A
  * trailing `:port` is split off first (IDN rejects `:`), and a host
  * IDN cannot encode (empty labels, overlong) falls back to the input
  * — canonicalization must never throw on crawl garbage. */
object IdnAscii {
  def toAscii(hostPort: String): String = {
    var i = 0
    val n = hostPort.length
    var ascii = true
    while (ascii && i < n) {
      if (hostPort.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return hostPort
    val colon = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0) (hostPort.substring(0, colon), hostPort.substring(colon))
      else (hostPort, "")
    try java.net.IDN.toASCII(host).toLowerCase(java.util.Locale.ROOT) + port
    catch { case scala.util.control.NonFatal(_) => hostPort }
  }
}

/** The URL-canonicalization kernel shared by
  * [[CanonicalUrlExpression]]: the full rule chain of
  * `graft.ops.TextOps.canonicalUrl` (percent-escape normalization,
  * scheme/host lowering, userinfo/default-port/www/fragment
  * stripping, IDN punycoding, trailing-slash trim, tracking-param
  * drop + bytewise param sort) in ONE string pass per URL. Semantics
  * are pinned equal to the composed regexp/split/array twin
  * (`TextOps.canonicalUrlComposed`, the shape the q115 DuckDB oracle
  * replays) by CorpusOpsSpec — every branch below cites the composed
  * rule it mirrors. */
object CanonicalUrl {
  /** `array_sort` on strings is UTF8String order = unsigned UTF-8
    * byte order (code-point order), NOT java's UTF-16 `compareTo` —
    * they diverge for supplementary characters vs U+E000–U+FFFF. */
  private val Utf8Order = new java.util.Comparator[String] {
    override def compare(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
  private def schemeChar(c: Char, first: Boolean): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (!first && ((c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))
  /** Spark's `lower()` (UTF8String.toLowerCase): an ASCII fast path,
    * default-locale `String.toLowerCase` otherwise. Mirrored here —
    * NOT a bare `s.toLowerCase` — because on a tr/az-locale JVM the
    * latter maps ASCII 'I' to dotless 'ı' while the composed twin's
    * `lower()` takes the ASCII path and yields 'i': the pinned
    * native == composed == oracle equivalence would split on every
    * host containing 'I'. */
  private def lowerLikeSpark(s: String): String = {
    var i = 0
    val n = s.length
    var ascii = true
    var anyUpper = false
    while (ascii && i < n) {
      val c = s.charAt(i)
      if (c >= 0x80) ascii = false
      else if (c >= 'A' && c <= 'Z') anyUpper = true
      i += 1
    }
    if (!ascii) s.toLowerCase // non-ASCII: same fallback Spark takes
    else if (!anyUpper) s
    else {
      val a = s.toCharArray
      var j = 0
      while (j < a.length) {
        val c = a(j)
        if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
        j += 1
      }
      new String(a)
    }
  }
  def canonicalize(url: String, drop: Array[String]): String = {
    val u = PctNorm.normalize(url)
    // scheme: ^[A-Za-z][A-Za-z0-9+.-]*:// — the class excludes ':'
    // and '/', so a regex match always ends at the FIRST "://";
    // validating every char before that occurrence is equivalent
    val si = u.indexOf("://")
    var schemeOk = si > 0
    var i = 0
    while (schemeOk && i < si) {
      schemeOk = schemeChar(u.charAt(i), i == 0); i += 1
    }
    val scheme = if (schemeOk) lowerLikeSpark(u.substring(0, si)) else ""
    val rest = if (schemeOk) u.substring(si + 3) else u
    val hi = rest.indexOf('#') // substring_index(rest, "#", 1)
    val noFrag = if (hi >= 0) rest.substring(0, hi) else rest
    val qi = noFrag.indexOf('?') // split at the FIRST '?'
    val base = if (qi >= 0) noFrag.substring(0, qi) else noFrag
    val query = if (qi >= 0) noFrag.substring(qi + 1) else ""
    val slash = base.indexOf('/')
    val auth = if (slash >= 0) base.substring(0, slash) else base
    val path = if (slash >= 0) base.substring(slash) else ""
    val at = auth.indexOf('@') // ^[^@]*@ strips to the FIRST '@'
    val hostPort = lowerLikeSpark(if (at >= 0) auth.substring(at + 1) else auth)
    val noPort =
      if (scheme == "http" && hostPort.endsWith(":80"))
        hostPort.substring(0, hostPort.length - 3)
      else if (scheme == "https" && hostPort.endsWith(":443"))
        hostPort.substring(0, hostPort.length - 4)
      else hostPort
    val host = IdnAscii.toAscii(
      if (noPort.startsWith("www.")) noPort.substring(4) else noPort)
    var pe = path.length // regexp_replace(path, "/+$", "")
    while (pe > 0 && path.charAt(pe - 1) == '/') pe -= 1
    val sb = new java.lang.StringBuilder(u.length + 8)
    sb.append(scheme).append("://").append(host)
    if (pe == 0) sb.append('/') else sb.append(path, 0, pe)
    if (query.nonEmpty) {
      val parts = new java.util.ArrayList[String](8)
      var s0 = 0
      var j = 0
      val qn = query.length
      while (j <= qn) {
        if (j == qn || query.charAt(j) == '&') {
          if (j > s0) { // empty params are filtered, like the twin
            val p = query.substring(s0, j)
            var keep = true
            var k = 0
            while (keep && k < drop.length) {
              if (p.startsWith(drop(k))) keep = false
              k += 1
            }
            if (keep) parts.add(p)
          }
          s0 = j + 1
        }
        j += 1
      }
      if (!parts.isEmpty) {
        val arr = parts.toArray(new Array[String](parts.size))
        java.util.Arrays.sort(arr, Utf8Order)
        sb.append('?')
        var k = 0
        while (k < arr.length) {
          if (k > 0) sb.append('&')
          sb.append(arr(k)); k += 1
        }
      }
    }
    sb.toString
  }
}

/** `graft_canonical_url(url, prefixes)` — [[CanonicalUrl.canonicalize]]
  * as a native expression; `prefixes` (the tracking-param drop list)
  * must be a literal array<string>, parsed once at plan time. Exists
  * because the composed twin duplicates its host/path/query subtrees
  * at every conditional branch — a ~60-node tree per URL column whose
  * analysis + codegen floor q115 measured; this is one call. */
case class CanonicalUrlExpression(child: Expression, dropPrefixes: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_canonical_url"
  private lazy val drop = dropPrefixes.toArray
  def compute(url: UTF8String): UTF8String =
    UTF8String.fromString(CanonicalUrl.canonicalize(url.toString, drop))
  override protected def nullSafeEval(url: Any): Any =
    compute(url.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("canonicalUrlExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `graft_idn_ascii(host)` — [[IdnAscii.toAscii]] as a native
  * expression (self-fast-pathing on ASCII, so callers apply it
  * unconditionally without an `rlike` pre-filter re-scanning the
  * host). */
case class IdnAsciiExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_idn_ascii"
  def compute(host: UTF8String): UTF8String = {
    val s = host.toString
    val out = IdnAscii.toAscii(s)
    if (out eq s) host else UTF8String.fromString(out)
  }
  override protected def nullSafeEval(host: Any): Any =
    compute(host.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("idnAsciiExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `script_counts(text)` — code points per script class in ONE walk:
  * `[kana, hangul, thai, han]` (kana = Hiragana + Katakana). The
  * composed form spends four full `regexp_replace` passes per row
  * (removal-length trick, one per script class); this is the same
  * per-code-point `Character.UnicodeScript` classification in a single
  * scan, with [[Tokenize.isCjk]]'s `< 0x0E00` ASCII/Latin fast path
  * (Thai is the lowest per-character script, Hangul Jamo sits above
  * it). Counts are CODE POINTS, matching Spark's and DuckDB's
  * code-point `length` so the removal-length oracle reproduces them.
  */
object ScriptCounts {
  /** The one-pass [kana, hangul, thai, han] counting walk shared by
    * [[ScriptCountsExpression]] and [[ScriptLangExpression]]. */
  def count(s: String): Array[Int] = {
    var kana = 0; var hangul = 0; var thai = 0; var han = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x0E00) i += 1 // below every counted script
      else {
        val cp = s.codePointAt(i)
        val sc = Character.UnicodeScript.of(cp)
        if (sc == Character.UnicodeScript.HIRAGANA ||
          sc == Character.UnicodeScript.KATAKANA) kana += 1
        else if (sc == Character.UnicodeScript.HANGUL) hangul += 1
        else if (sc == Character.UnicodeScript.THAI) thai += 1
        else if (sc == Character.UnicodeScript.HAN) han += 1
        i += Character.charCount(cp)
      }
    }
    Array(kana, hangul, thai, han)
  }
}

case class ScriptCountsExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_script_counts"
  def compute(text: UTF8String): GenericArrayData =
    new GenericArrayData(ScriptCounts.count(text.toString))
  override protected def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("scriptCountsExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `script_lang(text, minChars)` — the script-precedence decision of
  * scripted language ID fused into the counting walk: ja if ≥ minChars
  * kana, else ko (hangul) / th (thai) / zh (han), else NULL (caller
  * falls back to stopword profiles via coalesce). Exists because a
  * CaseWhen over `graft_script_counts` elements re-evaluates the
  * counting scan per condition — codegen subexpression elimination
  * only hoists a conditional expression's FIRST condition, so Latin
  * text (which falls through all four) would pay four walks. One
  * expression, one walk, by construction. */
case class ScriptLangExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_script_lang"
  def compute(text: UTF8String, minChars: Int): UTF8String = {
    val a = ScriptCounts.count(text.toString)
    if (a(0) >= minChars) UTF8String.fromString("ja")
    else if (a(1) >= minChars) UTF8String.fromString("ko")
    else if (a(2) >= minChars) UTF8String.fromString("th")
    else if (a(3) >= minChars) UTF8String.fromString("zh")
    else null
  }
  override protected def nullSafeEval(text: Any, minChars: Any): Any =
    compute(text.asInstanceOf[UTF8String], minChars.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("scriptLangExpr", this)
    nullSafeCodeGen(ctx, ev, (t, m) => s"""
      ${ev.value} = $ref.compute($t, $m);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `shingles(text, n)` — distinct word n-gram shingles in ONE pass
  * (first-occurrence order). The composed-built-ins form
  * (`transform`+`slice`+`array_join`+`array_distinct`) allocates an
  * array per shingle and evaluates interpreted lambdas per token — this
  * is the hot inner loop of every text-dedup operator, so it gets a
  * native expression.
  */
case class ShinglesExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this)
    nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $ref.compute($t, $n);")
  }
  def compute(text: UTF8String, n: Int): GenericArrayData =
    nullSafeEval(text, n).asInstanceOf[GenericArrayData]
  override protected def nullSafeEval(text: Any, nAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val tokens = Tokenize.split(text.toString)
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    val sb = new java.lang.StringBuilder(64)
    while (j + n <= tokens.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var ix = 0
    while (it.hasNext) { out(ix) = UTF8String.fromString(it.next()); ix += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `minhash(text, k, shingleSize)` — the full k-wide MinHash signature
  * in ONE pass: tokenize, build distinct shingles, and for each shingle
  * compute k salted md5 digests tracking the lexicographic min per
  * salt. Values are EXACTLY `min(md5("i|shingle"))` — the portable
  * definition the DuckDB oracle reproduces — but with no explode, no
  * shuffle, and one signature array per row.
  */
case class MinHashExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this)
    // a short doc (no shingles) yields a NULL signature — the generated
    // code must propagate it, not just child nulls
    nullSafeCodeGen(ctx, ev, (t, k, n) => {
      val r = ctx.freshName("mh")
      s"""
         |Object $r = $ref.compute($t, $k, $n);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $r; }
       """.stripMargin
    })
  }
  def compute(text: UTF8String, k: Int, n: Int): AnyRef =
    nullSafeEval(text, k, n).asInstanceOf[AnyRef]
  // One digest per thread: expression instances can be shared across
  // tasks in local mode; MessageDigest.digest() self-resets.
  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  // "0|".."63|" prefixes precomputed — the hot loop digests
  // prefix-bytes + shingle-bytes without building a String per salt.
  @transient private lazy val saltPrefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i|".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private val HexChars = "0123456789abcdef".toCharArray
  // Minima track RAW digest bytes: lowercase-hex lexicographic order IS
  // unsigned byte order, so the k winners hex-encode once at the end —
  // the hex-per-candidate form allocated a 32-char String per
  // (shingle, salt), ~10⁹ allocations per 600 k-doc pass.
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }
  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HexChars((bytes(i) >> 4) & 0xF)
      out(i * 2 + 1) = HexChars(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }
  override protected def nullSafeEval(text: Any, kAny: Any, nAny: Any): Any = {
    val k = kAny.asInstanceOf[Int]
    val n = nAny.asInstanceOf[Int]
    // named validation, not a bare ArrayIndexOutOfBounds from mins(0)
    // on the first shingly row (the CdcChunksExpression pattern)
    require(k >= 1, s"graft_minhash k must be >= 1, got $k")
    require(n >= 1, s"graft_minhash shingle size must be >= 1, got $n")
    // tokenize (shared CJK-aware definition) + sliding distinct shingles
    val tokens = Tokenize.split(text.toString)
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill[Array[Byte]](k)(null)
    val d = digest.get()
    val scratch = new Array[Byte](16)
    var j = 0
    val sb = new java.lang.StringBuilder(64)
    while (j + n <= tokens.length) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(tokens(j + t))
        t += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        val shingleBytes = shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var salt = 0
        while (salt < k) {
          d.update(if (salt < 64) saltPrefixes(salt)
            else s"$salt|".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          d.update(shingleBytes)
          // digest into the scratch buffer; copy only when it wins the
          // running min (O(log m) wins per salt over m shingles)
          d.digest(scratch, 0, 16)
          if (mins(salt) == null || unsignedLess(scratch, mins(salt)))
            mins(salt) = scratch.clone()
          salt += 1
        }
      }
      j += 1
    }
    if (mins(0) == null) null // no shingles (short doc) → null signature
    else new GenericArrayData(mins.map(m => UTF8String.fromString(toHex(m)): AnyRef))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** `srp_bucket(emb, planes, planeOffset)` — sign-random-projection LSH
  * bucket key over an `array<float>` embedding: `planes` hyperplane sign
  * bits packed into a long, plane `offset+p`'s component d = the first
  * 8 md5 hex chars of "p|d" as u32, mod 1e6, into [-0.5, 0.5) — the
  * exact values of the composed-built-ins form in
  * [[graft.ops.Similarity]] (and of the DuckDB oracle), but with the
  * plane matrix memoized per (planes, offset, dims) instead of one
  * interpreted `aggregate(zip_with(...))` pass per plane per row (the
  * HOF form costs planes × dims lambda evals + md5s PER ROW; this is a
  * primitive dot loop over a cached table).
  */
case class SrpBucketExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_bucket"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("srpExpr", this)
    nullSafeCodeGen(ctx, ev, (e, p, o) => s"${ev.value} = $ref.compute($e, $p, $o);")
  }
  def compute(emb: org.apache.spark.sql.catalyst.util.ArrayData,
              planes: Int, offset: Int): Long =
    nullSafeEval(emb, planes, offset).asInstanceOf[Long]
  // Reject non-float embeddings at analysis: reading doubles through
  // ArrayData.getFloat returns garbage SILENTLY, not an error.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftFunctions.requireFloatArray(prettyName, first.dataType)
  // Per-thread: expression instances can be shared across local tasks.
  @transient private lazy val tables =
    ThreadLocal.withInitial[java.util.HashMap[Long, Array[Array[Double]]]](() =>
      new java.util.HashMap[Long, Array[Array[Double]]]())
  private def componentTable(planes: Int, offset: Int, dims: Int): Array[Array[Double]] = {
    // planes > 63 would silently ALIAS onto planes - 64 (1L << p is a
    // mod-64 shift), merging unrelated LSH buckets with no error — the
    // same [1, 63] bound SrpIndexStore enforces, checked here so the
    // raw SQL function can't bypass it
    require(planes >= 1 && planes <= 63,
      s"graft_srp_bucket planes must be in [1, 63], got $planes")
    require(offset >= 0, s"graft_srp_bucket offset must be >= 0, got $offset")
    require(dims < (1 << 24), s"graft_srp_bucket supports < 2^24 dims, got $dims")
    // disjoint bit fields (offset:32 | planes:8 | dims:24) — the old
    // XOR packing collided e.g. (planes=3, offset=1048576) with
    // (planes=2, offset=0), returning a memoized table for the WRONG
    // construction
    val key = (offset.toLong << 32) | (planes.toLong << 24) | dims.toLong
    val cache = tables.get()
    var t = cache.get(key)
    if (t == null) {
      val md = java.security.MessageDigest.getInstance("MD5")
      t = Array.tabulate(planes, dims) { (p, d) =>
        md.update(s"${offset + p}|$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val bytes = md.digest()
        // first 8 hex chars = first 4 digest bytes, big-endian u32
        var h = 0L
        var i = 0
        while (i < 4) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
        (h % 1000000L).toDouble / 1000000.0 - 0.5
      }
      cache.put(key, t)
    }
    t
  }
  override protected def nullSafeEval(emb: Any, planesAny: Any, offsetAny: Any): Any = {
    val arr = emb.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val planes = planesAny.asInstanceOf[Int]
    val offset = offsetAny.asInstanceOf[Int]
    val dims = arr.numElements()
    val comp = componentTable(planes, offset, dims)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val row = comp(p)
      var s = 0.0
      var d = 0
      while (d < dims) { s += arr.getFloat(d).toDouble * row(d); d += 1 }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** `graft_ivf_nearest(emb, n, cids, cembs)` — ids of the `n` nearest
  * codebook centroids for one embedding, ordered by squared euclidean
  * distance (`‖v‖² − 2·v·c + ‖c‖²`, sequential double dots — the exact
  * arithmetic of the joined form it replaces), ties by centroid id.
  * The codebook rides the plan as foldable literals (task binaries are
  * themselves torrent-broadcast, so the table ships once per executor)
  * and is decoded into primitive arrays once per expression instance —
  * one row in, one row out, no corpus×codebook join, no shuffle, no
  * window. This is the IVF coarse-assignment kernel: the joined form
  * materializes |corpus|×|codebook| rows to compute what is a pure
  * per-row function of a broadcast table (×4096 at a real codebook).
  */
case class IvfNearestExpression(first: Expression, second: Expression,
                                third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ivf_nearest"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("ivfExpr", this)
    nullSafeCodeGen(ctx, ev,
      (e, n, c3, c4) => s"${ev.value} = $ref.compute($e, $n, $c3, $c4);")
  }
  def compute(emb: org.apache.spark.sql.catalyst.util.ArrayData, n: Int,
              c3: org.apache.spark.sql.catalyst.util.ArrayData,
              c4: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    nullSafeEval(emb, n, c3, c4).asInstanceOf[GenericArrayData]
  // the codebook children are read through typed ArrayData accessors
  // (getLong / getArray.toFloatArray) — a mistyped column reads garbage
  // SILENTLY, and a non-foldable child NPEs at eval(null) on the
  // executor with no analysis-time trace; both die here instead (the
  // requireFloatArray doctrine)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val emb = GraftFunctions.requireFloatArray(prettyName, first.dataType)
    if (emb != TypeCheckResult.TypeCheckSuccess) return emb
    if (!third.foldable || !fourth.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebook args (cids, cembs) must be foldable " +
          "literals — the codebook rides the plan, never a per-row column")
    (third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t3, t4) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects cids array<bigint> and cembs " +
          s"array<array<float>>, got ${t3.simpleString} / ${t4.simpleString}")
    }
  }

  /** (cid, centroid components, ‖c‖²) sorted by cid — decoded once from
    * the foldable literal children. */
  @transient private lazy val codebook: (Array[Long], Array[Array[Float]], Array[Double]) = {
    val cidData = third.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cembData = fourth.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val k = cidData.numElements()
    val order = Array.range(0, k).sortBy(cidData.getLong)
    val cids = new Array[Long](k)
    val cembs = new Array[Array[Float]](k)
    val norms2 = new Array[Double](k)
    var i = 0
    while (i < k) {
      val src = order(i)
      cids(i) = cidData.getLong(src)
      cembs(i) = cembData.getArray(src).toFloatArray()
      var s = 0.0
      val c = cembs(i)
      var d = 0
      while (d < c.length) { s += c(d).toDouble * c(d).toDouble; d += 1 }
      norms2(i) = s
      i += 1
    }
    (cids, cembs, norms2)
  }

  override protected def nullSafeEval(embAny: Any, nAny: Any, c3: Any, c4: Any): Any = {
    val arr = embAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (cids, cembs, norms2) = codebook
    val n = math.min(nAny.asInstanceOf[Int], cids.length)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val dims = arr.numElements()
    var vv = 0.0
    var d = 0
    while (d < dims) { val v = arr.getFloat(d).toDouble; vv += v * v; d += 1 }
    // top-n by (d2 asc, cid asc): centroids iterate cid-ascending, and
    // insertion is strict-less, so equal distances keep cid order
    val bestD = new Array[Double](n)
    val bestC = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < cids.length) {
      val c = cembs(i)
      var vc = 0.0
      d = 0
      val len = math.min(dims, c.length)
      while (d < len) { vc += arr.getFloat(d).toDouble * c(d).toDouble; d += 1 }
      val d2 = vv - 2.0 * vc + norms2(i)
      if (m < n || d2 < bestD(m - 1)) {
        var j = if (m < n) m else m - 1
        while (j > 0 && d2 < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(j) = d2; bestC(j) = cids(i)
        if (m < n) m += 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = bestC(i); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression, q: Expression) =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `pairs(ids)` — all (a, b) pairs with a < b from a SORTED long-id
  * array, as `array<struct<a,b>>`. The local pair-generation step of
  * every blocking dedup operator (shared-shingle, LSH band buckets, SRP
  * buckets): groups emit their pairs in place of a self-join. Native
  * because the composed form (`flatten(transform(ids, (a,i) =>
  * transform(slice(...), ...)))`) runs interpreted lambdas + allocates
  * a slice per element per group — and blocking keys number in the
  * millions. */
case class PairsExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pairs"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pairsExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  def compute(ids: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    nullSafeEval(ids).asInstanceOf[GenericArrayData]
  override protected def nullSafeEval(idsAny: Any): Any = {
    val ids = idsAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = ids.numElements()
    // n*(n-1)/2 in Int overflows past ~65k ids (NegativeArraySizeException
    // with no hint of the cause). Degenerate buckets deserve a nameable
    // error instead: the fix is always more bands/planes or a bucket cap.
    val pairCount = n.toLong * (n - 1) / 2
    if (pairCount > PairsExpression.MaxPairs)
      throw new IllegalStateException(
        s"graft_pairs: bucket of $n ids would emit $pairCount pairs " +
          s"(max ${PairsExpression.MaxPairs}) — raise bands/planes or cap " +
          "bucket size (maxBucketSize)")
    // a == b pairs are skipped: DUPLICATE ids in a bucket (a caller
    // with a non-unique id column) must not emit self-pairs — a
    // self-pair survives any downstream verification (jaccard 1.0,
    // hamming 0) and poisons dedup clusters
    val out = new scala.collection.mutable.ArrayBuffer[Any](pairCount.toInt)
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = ids.getLong(j)
        if (a != b) out += org.apache.spark.sql.catalyst.InternalRow(a, b)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PairsExpression {
  /** Hard ceiling on pairs emitted per bucket (64M structs ≈ 1 GiB row
    * data — already far past any sane blocking-key design). */
  val MaxPairs: Long = 64L * 1024 * 1024
}

/** `hamming_pairs(members, maxDistance)` — verified SimHash pairs
  * emitted IN the bucket: `members` is a (id-sorted) array of
  * `struct<id long, sim long>`; output is `(a, b, hamming)` for every
  * a < b pair whose XOR popcount ≤ maxDistance. The f²/2 hamming
  * checks are two machine instructions each, so running them where the
  * bucket lives beats materializing the candidate pairs: at corpus ≫
  * 2¹⁶ the 16-bit blocks collide structurally (n²/2¹⁶ pairs per
  * block — 11 M rows at 600 k docs) and the emit-then-join form
  * shuffles all of them through a distinct plus two signature joins to
  * keep a few thousand survivors. Only survivors leave the bucket. */
case class HammingPairsExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming_pairs"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hammingPairsExpr", this)
    nullSafeCodeGen(ctx, ev, (m, d) => s"${ev.value} = $ref.compute($m, $d);")
  }
  def compute(members: org.apache.spark.sql.catalyst.util.ArrayData,
              maxDist: Int): GenericArrayData =
    nullSafeEval(members, maxDist).asInstanceOf[GenericArrayData]
  override protected def nullSafeEval(membersAny: Any, maxDistAny: Any): Any = {
    val members = membersAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val maxDist = maxDistAny.asInstanceOf[Int]
    val n = members.numElements()
    val ids = new Array[Long](n)
    val sims = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sims(i) = row.getLong(1)
      i += 1
    }
    // ids(i) == ids(j) skipped — see PairsExpression: duplicate ids
    // must not emit hamming-0 self-pairs
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j)) {
          val h = java.lang.Long.bitCount(sims(i) ^ sims(j))
          if (h <= maxDist) {
            // guard SURVIVOR growth, not the candidate count: a large
            // sparse bucket is cheap CPU, but a dup-heavy bucket where
            // most pairs pass would materialize n²/2 rows — same
            // ceiling + remedy message as graft_pairs
            if (out.length >= PairsExpression.MaxPairs)
              throw new IllegalStateException(
                s"graft_hamming_pairs: bucket of $n members emits more than " +
                  s"${PairsExpression.MaxPairs} surviving pairs — run exact " +
                  "dedup first or cap bucket size (maxBucketSize)")
            out += org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j), h)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `cosine_pairs(members, threshold)` — verified cosine near-dup pairs
  * emitted IN the cluster group: `members` is an (id-sorted) array of
  * `struct<id long, emb array<float>>`; output is `(a, b, cosine)` for
  * every a < b pair whose round(cosine, 6) ≥ threshold. The
  * emit-then-join form materializes every candidate pair TWICE through
  * embedding re-joins (f²/2 rows each carrying two float vectors); this
  * kernel computes norms once per member and dots where the group
  * lives, so only survivors leave. Callers MUST cap the group size
  * (maxClusterSize) — group payload is members × dims floats. */
case class CosinePairsExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_pairs"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cosinePairsExpr", this)
    nullSafeCodeGen(ctx, ev, (m, t) => s"${ev.value} = $ref.compute($m, $t);")
  }
  def compute(members: org.apache.spark.sql.catalyst.util.ArrayData,
              threshold: Double): GenericArrayData =
    nullSafeEval(members, threshold).asInstanceOf[GenericArrayData]
  override protected def nullSafeEval(membersAny: Any, thresholdAny: Any): Any = {
    val members = membersAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val threshold = thresholdAny.asInstanceOf[Double]
    val n = members.numElements()
    val ids = new Array[Long](n)
    val embs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      ids(i) = row.getLong(0)
      embs(i) = row.getArray(1).toFloatArray()
      norms(i) = math.sqrt(dot(embs(i), embs(i)))
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        // duplicate ids must not emit cosine-1 self-pairs (see
        // graft_pairs)
        if (ids(i) != ids(j) && norms(i) > 0.0 && norms(j) > 0.0) {
          // same arithmetic as the composed form the oracle replays:
          // sequential double dot, one division, HALF_UP round 6
          val cos = BigDecimal(dot(embs(i), embs(j)) / (norms(i) * norms(j)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (cos >= threshold) {
            if (out.length >= PairsExpression.MaxPairs)
              throw new IllegalStateException(
                s"graft_cosine_pairs: cluster of $n members emits more than " +
                  s"${PairsExpression.MaxPairs} surviving pairs — run exact " +
                  "dedup first or cap cluster size (maxClusterSize)")
            out += org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j), cos)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `float_dot(a, b)` — sequential double-precision dot product over two
  * `array<float>` columns, reading primitives straight from ArrayData
  * (a Scala UDF boxes every element — ~100× slower on all-pairs
  * similarity workloads). Operation order matches DuckDB's
  * `list_dot_product` over a DOUBLE list, so oracle hashes agree.
  * Implements `doGenCode` (a real generated loop, not CodegenFallback):
  * the dot is the inner loop of every scoring join, and a fallback
  * expression would sever the surrounding whole-stage codegen span.
  */
case class FloatDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_float_dot"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftFunctions.requireFloatArray(prettyName, left.dataType) match {
      case org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess =>
        GraftFunctions.requireFloatArray(prettyName, right.dataType)
      case fail => fail
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var s = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `int8_dot(a, b)` — integer dot product over two `array<tinyint>`
  * code columns (the quantized-search kernel): products and the sum
  * stay in Long arithmetic, so the value is EXACT and any engine
  * reproduces it bit-for-bit (|Σ| ≤ 127²·dims ≪ 2⁶³). Per-vector
  * quantization scales cancel in cosine, so ranking quantized vectors
  * needs ONLY this integer kernel — no float dequantization on the
  * search path, 4× less data through the join. */
case class Int8DotExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_dot"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftFunctions.requireByteArray(prettyName, left.dataType) match {
      case org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess =>
        GraftFunctions.requireByteArray(prettyName, right.dataType)
      case fail => fail
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var s = 0L
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    s
  }
  // generated loop, same rationale as FloatDotExpression
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `multi_reach(json, path1..pathN)` — N reach walks over ONE parse of
  * the JSON column, returning a struct of N strings. The fusion target
  * for [[graft.plans.CollapseReachRule]]: projections that reach into
  * the same JSON column k times would otherwise parse it k times.
  */
case class MultiReachExpression(json: Expression, paths: Seq[String])
    extends Expression {
  override def children: Seq[Expression] = Seq(json)
  override def dataType: DataType = StructType(
    paths.zipWithIndex.map { case (_, i) => StructField(s"c$i", StringType, nullable = true) })
  override def nullable: Boolean = true
  def compute(j: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val tree = graft.core.PyJson.tryParse(j.toString).orNull
    val out = new Array[Any](paths.length)
    if (tree != null) {
      var i = 0
      while (i < paths.length) {
        val v = graft.core.Reach.reach(paths(i), tree).map(graft.core.Reach.render).orNull
        out(i) = if (v == null) null else UTF8String.fromString(v)
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow.fromSeq(out.toIndexedSeq)
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = json.eval(input)
    if (j == null) null else compute(j.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("multiReachExpr", this)
    val j = json.genCode(ctx)
    ev.copy(code =
      code"""
        ${j.code}
        boolean ${ev.isNull} = ${j.isNull};
        InternalRow ${ev.value} = ${ev.isNull}
          ? null : $ref.compute(${j.value});
      """)
  }
  override def prettyName: String = "graft_multi_reach"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(json = c(0))
}

/** Content-defined chunking: split `text` at positions where the hash
  * of the trailing `window` characters lands in a 1/divisor bucket —
  * boundaries follow CONTENT, so inserting a prefix shifts every
  * fixed-size chunk but leaves most CDC chunk hashes intact (the
  * storage-dedup property fixed chunking cannot give). Boundary
  * function: u32(first 8 md5 hex chars of the window) % divisor == 0 —
  * md5-per-window keeps the boundary engine-portable for the oracle
  * (same philosophy as MinHashExpression); a production cluster would
  * swap in an O(1)-per-step Rabin fingerprint behind the same
  * expression without changing the operator surface. Expected chunk
  * length ≈ divisor characters. Empty text → empty array; chunks
  * always concatenate back to the input.
  */
case class CdcChunksExpression(first: Expression, second: Expression,
                               third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cdcExpr", this)
    nullSafeCodeGen(ctx, ev, (t, w, d) => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  $ref.compute($t, $w, $d);""".stripMargin
    })
  }
  def compute(text: UTF8String, w: Int, d: Int): AnyRef =
    nullSafeEval(text, w, d).asInstanceOf[AnyRef]
  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  override protected def nullSafeEval(textAny: Any, wAny: Any, dAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String]
    val w = wAny.asInstanceOf[Int]
    val d = dAny.asInstanceOf[Int]
    require(w >= 1 && d >= 1, "graft_cdc_chunks needs window >= 1, divisor >= 1")
    val n = text.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val scratch = new Array[Byte](16)
    val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
    // boundary positions i (1-based char index of the window's END),
    // w <= i < n: hash the trailing w chars; i == n is always a cut.
    // ASCII fast path: byte index == char index, so each window
    // digests a slice of ONE materialized byte array — the per-window
    // substring+getBytes pair allocates twice per character otherwise.
    val ascii = text.numBytes() == n
    val allBytes = if (ascii) text.getBytes else null
    var i = w
    while (i < n) {
      if (ascii) md.update(allBytes, i - w, w)
      else md.update(text.substring(i - w, i).getBytes)
      md.digest(scratch, 0, 16)
      val u32 = ((scratch(0) & 0xFFL) << 24) | ((scratch(1) & 0xFFL) << 16) |
        ((scratch(2) & 0xFFL) << 8) | (scratch(3) & 0xFFL)
      if (u32 % d == 0) cuts += i
      i += 1
    }
    cuts += n
    val out = new Array[Any](cuts.length - 1)
    var j = 0
    while (j < out.length) {
      out(j) = text.substring(cuts(j), cuts(j + 1))
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** KMV k-minimum-values sketch as a TRUE aggregate
  * (TypedImperativeAggregate): tracks the k smallest DISTINCT 60-bit
  * hashes in a bounded TreeSet, merging partial sketches across
  * partitions. This is the scale form of the sketch — the relational
  * `distinct().orderBy().limit(k)` formulation shuffles every distinct
  * hash in the corpus (billions of rows for a k=64 answer), while this
  * aggregate ships exactly one ≤k-entry buffer per partition through
  * map-side partial aggregation. Input: the LONG hash column (keep the
  * md5-derived hashing in the plan — the sketch stays oracle-checkable).
  * Output: struct(n_mins, kth_hash); the estimate arithmetic lives in
  * [[graft.ops.Sketches.kmvDistinct]] so both formulations share it.
  */
case class KmvMinsAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "KMV needs k >= 2")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_mins expects a LONG hash column, got ${other.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_mins", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true),
    // the full ≤k-entry min-set, ascending: what makes the sketch
    // MERGEABLE downstream (k smallest of a union of per-group
    // min-sets = the union's k smallest — re-aggregate exploded mins
    // to combine sketches built shard-by-shard)
    StructField("mins", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_mins"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) buf.add(v)
    // TreeSet.add is false on duplicates — only trim when v displaced one
    else if (v < buf.last && buf.add(v)) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(
      buf.size.toLong, if (buf.isEmpty) null else buf.last,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvMinsAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinsAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : Expression = copy(child = c(0))
}

/** Element-wise embedding sum in exact integer MICRO-units
  * (TypedImperativeAggregate): each float component converts to
  * `round(v · scale)` (round-half-away-from-zero on the IEEE double
  * product — the same rule DuckDB's `round()` applies, so an oracle
  * replays the conversion exactly) and accumulates into one long per
  * dimension. Buffer = dims+1 longs (count + sums) regardless of group
  * size — the centroid primitive that would otherwise need a ×dims
  * posexplode of the corpus before its aggregation. Integer sums make
  * the result partitioning-invariant where a float SUM is
  * order-nondeterministic (the repo-wide pico/micro doctrine).
  * Output: struct(n long, sums array<long>); empty group → (0, null).
  * Mismatched dims within a group throw — a corrupt-embedding guard. */
case class VecSumAggregate(
    child: Expression,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]] {

  require(scale > 0, "graft_vec_sum scale must be positive")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftFunctions.requireFloatArray("graft_vec_sum", child.dataType)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vec_sum"

  // buffer layout: [count, sum_0, ..., sum_{dims-1}]; dims fixed by the
  // first non-null row seen
  override def createAggregationBuffer(): Array[Long] = Array(0L)

  private def micro(v: Float): Long = {
    val x = v.toDouble * scale
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
  }

  override def update(buf: Array[Long],
                      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    val out = if (buf.length == 1) new Array[Long](d + 1) else buf
    if (buf.length == 1) out(0) = buf(0)
    require(out.length == d + 1,
      s"graft_vec_sum: mismatched embedding dims in one group (${out.length - 1} vs $d)")
    out(0) += 1L
    var i = 0
    while (i < d) { out(i + 1) += micro(arr.getFloat(i)); i += 1 }
    out
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length == 1) { b1(0) += b2(0); return b1 }
    if (b1.length == 1) { b2(0) += b1(0); return b2 }
    require(b1.length == b2.length,
      s"graft_vec_sum: mismatched embedding dims across partitions " +
        s"(${b1.length - 1} vs ${b2.length - 1})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.InternalRow(buf(0),
      if (buf.length == 1) null else new GenericArrayData(buf.drop(1)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSumAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSumAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : Expression = copy(child = c(0))
}

/** `SparkSessionExtensions` injector — the idiomatic way to get every
  * graft expression into a session at build time:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.expressions.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          (exprs: Seq[Expression]) => builder(exprs)))
    }
    ext.injectOptimizerRule(_ => graft.plans.CollapseReachRule)
  }
}

/** Column-level API + one-time session registration. All graft entry
  * points call [[register]] (idempotent) so the functions are usable both
  * from the Scala DSL (via `call_function`) and in `spark.sql` text.
  */
object GraftFunctions {

  /** Shared analysis-time gate for the float-embedding expressions:
    * `ArrayData.getFloat` over an `array<double>` column reads garbage
    * without erroring, so the type mistake must die at analysis. */
  private[functions] def requireFloatArray(name: String, dt: DataType)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name expects array<float> embeddings, got ${other.simpleString} — " +
            "cast each component to float upstream")
    }

  /** Analysis-time gate for the int8-code expressions — same rationale
    * as [[requireFloatArray]]: ArrayData.getByte over a wider element
    * type reads garbage silently. */
  private[functions] def requireByteArray(name: String, dt: DataType)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    dt match {
      case ArrayType(ByteType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name expects array<tinyint> codes (quantize's output), got " +
            s"${other.simpleString}")
    }

  /** Name → expression builder for every native graft expression. */
  val expressions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_reach" -> (e => ReachExpression(e(0), e(1))),
    "graft_reach_array" -> (e => ReachArrayExpression(e(0), e(1), objectValues = false)),
    "graft_reach_values" -> (e => ReachArrayExpression(e(0), e(1), objectValues = true)),
    "graft_doc_content" -> (e => DocContentExpression(e(0), e(1), e(2))),
    "graft_json_merge" -> (e => JsonMergeExpression(e(0), e(1))),
    "graft_simhash" -> (e => SimHashExpression(e(0))),
    "graft_float_dot" -> (e => FloatDotExpression(e(0), e(1))),
    "graft_int8_dot" -> (e => Int8DotExpression(e(0), e(1))),
    "graft_srp_bucket" -> (e => SrpBucketExpression(e(0), e(1), e(2))),
    "graft_pairs" -> (e => PairsExpression(e(0))),
    "graft_hamming_pairs" -> (e => HammingPairsExpression(e(0), e(1))),
    "graft_cosine_pairs" -> (e => CosinePairsExpression(e(0), e(1))),
    "graft_ivf_nearest" -> (e => IvfNearestExpression(e(0), e(1), e(2), e(3))),
    "graft_tokens" -> (e => TokensExpression(e(0))),
    "graft_pct_norm" -> (e => PctNormExpression(e(0))),
    "graft_idn_ascii" -> (e => IdnAsciiExpression(e(0))),
    "graft_canonical_url" -> (e => CanonicalUrlExpression(e(0), {
      require(e(1).foldable,
        "graft_canonical_url prefixes must be a literal array<string>")
      import org.apache.spark.sql.catalyst.util.ArrayData
      e(1).eval() match {
        case a: ArrayData =>
          (0 until a.numElements()).map { i =>
            require(!a.isNullAt(i),
              s"graft_canonical_url prefixes must not contain NULL (element $i)")
            a.getUTF8String(i).toString
          }
        case other => throw new IllegalArgumentException(
          s"graft_canonical_url prefixes must be an array literal, got $other")
      }
    })),
    "graft_script_counts" -> (e => ScriptCountsExpression(e(0))),
    "graft_script_lang" -> (e => ScriptLangExpression(e(0), e(1))),
    "graft_shingles" -> (e => ShinglesExpression(e(0), e(1))),
    "graft_minhash" -> (e => MinHashExpression(e(0), e(1), e(2))),
    "graft_cdc_chunks" -> (e => CdcChunksExpression(e(0), e(1), e(2))),
    "graft_bpe_segment" -> (e => BpeSegmentExpression(e(0), {
      require(e(1).foldable,
        "graft_bpe_segment merges must be a literal array<array<string>>")
      import org.apache.spark.sql.catalyst.util.ArrayData
      e(1).eval() match {
        case a: ArrayData =>
          (0 until a.numElements()).map { i =>
            require(!a.isNullAt(i),
              s"graft_bpe_segment merges must not contain NULL (element $i)")
            val p = a.getArray(i)
            require(p.numElements() == 2 && !p.isNullAt(0) && !p.isNullAt(1),
              "each merge must be a 2-element non-null [lhs, rhs] array")
            (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
          }
        case other => throw new IllegalArgumentException(
          s"graft_bpe_segment merges must be an array literal, got $other")
      }
    })),
    "graft_kmv_mins" -> (e => KmvMinsAggregate(e(0), e(1) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"graft_kmv_mins k must be an int literal, got $other")
    })),
    "graft_vec_sum" -> (e => VecSumAggregate(e(0), e(1) match {
      case Literal(l: Long, LongType) => l
      case Literal(i: Int, IntegerType) => i.toLong
      case other => throw new IllegalArgumentException(
        s"graft_vec_sum scale must be an integer literal, got $other")
    })))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Idempotent: re-registering floods logs with "replaced a previously
    // registered function" warnings (every entry point calls this, and
    // sessions built with GraftExtensions already carry the native
    // expressions but not the UDFs).
    def missing(name: String): Boolean =
      !reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    expressions.foreach { case (name, builder) =>
      if (missing(name)) reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // Cache-key canonicalization (cold path — plain UDFs are fine here).
    if (missing("graft_sha1")) {
      spark.udf.register("graft_hash_from_data", (json: String) => Hashing.hashFromData(json))
      spark.udf.register("graft_signature_hash",
        (uri: String, data: String) => Hashing.signatureHash(uri, data))
      spark.udf.register("graft_uri_from_url", (url: String) => Hashing.uriFromUrl(url))
      spark.udf.register("graft_sha1", (s: String) => Hashing.sha1Hex(s))
    }
  }

  def reach(json: Column, path: String): Column =
    call_function("graft_reach", json, lit(path))
  def reachArray(json: Column, path: String): Column =
    call_function("graft_reach_array", json, lit(path))
  def reachValues(json: Column, path: String): Column =
    call_function("graft_reach_values", json, lit(path))
  def docContent(properties: Column, derivatives: Column, id: Column): Column =
    call_function("graft_doc_content", properties, derivatives, id)
  def jsonMerge(parent: Column, child: Column): Column =
    call_function("graft_json_merge", parent, child)
  def hashFromData(json: Column): Column = call_function("graft_hash_from_data", json)
  def signatureHash(uri: Column, data: Column): Column =
    call_function("graft_signature_hash", uri, data)
  def uriFromUrl(url: Column): Column = call_function("graft_uri_from_url", url)
}
