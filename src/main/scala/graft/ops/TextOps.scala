package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language identification and fingerprinting — all
  * composed from codegen'd built-ins (no UDFs on the hot path), so they
  * stay inside whole-stage codegen at 100 TB.
  */
object TextOps {

  import graft.functions.Tokenize

  /** Space-pad Han/Hiragana/Katakana/Thai code points so a whitespace
    * split yields one token per CJK character — the composed-regex
    * reference form of the native scanner (kept as the
    * [[TextOpsSpec]]-pinned equivalence twin and the shape the DuckDB
    * oracle replays). Identity on ASCII/Latin text. */
  def segmentCjk(text: Column): Column =
    regexp_replace(text, s"(${Tokenize.CjkCharClass})", " $1 ")

  /** [[tokens]] as composed built-ins — two regex passes per row; the
    * native expression below is 2-5× faster on the token-counting
    * family, so this exists only as the independent reference
    * implementation. */
  private[ops] def tokensComposed(text: Column): Column =
    filter(split(segmentCjk(text), s"${Tokenize.SeparatorClass}+"), t => t =!= "")

  /** THE tokenizer (empties dropped): one native pass of
    * [[graft.functions.Tokenize.split]] — CJK per-character, ASCII
    * whitespace + U+3000 separators, no regex. One definition for the
    * whole text family: [[graft.ops.Curation]] and the native
    * shingle/minhash/simhash kernels share the same scanner. */
  def tokens(text: Column): Column = call_function("graft_tokens", text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count upper bound: whitespace tokens plus extra
    * units for long tokens (every 4 chars beyond the first 4 starts a
    * new unit — a cheap, deterministic proxy for subword tokenizers). */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + lit(1) + greatest(ceil((length(t) - 4) / 4.0).cast("int"), lit(0)))

  /** Word n-gram shingles of size n (ordered, with duplicates). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          array_join(slice(toks, i + 1, lit(n)), " "))),
      s => s.isNotNull)
  }

  /** Distinct shingles, first-occurrence order — native one-pass
    * expression (graft.functions.ShinglesExpression): this is the inner
    * loop of the dedup family. */
  def distinctShingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the MOSS
    * algorithm): hash every ORDERED `n`-gram shingle to a u32 (first 8
    * md5 hex chars — engine-portable), slide a window of `w`
    * consecutive hashes and keep each window's minimum; the distinct
    * selected hashes are the document's fingerprint set, returned
    * sorted. Guarantees of the scheme: any shared run of `w + n − 1`
    * tokens between two documents yields at least one SHARED
    * fingerprint, while expected density is only 2/(w+1) of the
    * shingle count — the index over fingerprints is ~4× smaller than
    * the full shingle index at w=4 and still cannot miss a
    * sufficiently long clone. Documents with fewer than `w` shingles
    * contribute the minimum of what they have (one window over all);
    * documents with no shingles (< `n` tokens) return null.
    *
    * Pure column composition (md5 / slice / array_min built-ins) —
    * stays inside whole-stage codegen; cost O(shingles × w) per row.
    * The hash array binds ONCE through a single-element `transform`
    * lambda: higher-order functions get no subexpression elimination,
    * so feeding [[winnowFromHashes]] the raw [[shingleHashes]]
    * expression would re-run the whole md5 transform at every window
    * position — the O(shingles²) trap the split pipeline form
    * ([[shingleHashesFromTokens]] → [[winnowFromHashes]]) exists to
    * avoid; the lambda binding gives the convenience form the same
    * O(shingles) md5 cost. */
  def winnowingFingerprints(text: Column, n: Int = 3, w: Int = 4): Column =
    element_at(transform(array(shingleHashes(text, n)),
      hs => winnowFromHashes(hs, w)), 1)

  /** [[shingleHashes]] over an ALREADY MATERIALIZED token array —
    * the pipeline form. The composed [[shingles]] re-evaluates its
    * captured `tokens(text)` expression inside the per-element lambda
    * (higher-order functions get no subexpression elimination), an
    * O(tokens²) scanner cost the q112 bench measured; referencing a
    * materialized ATTRIBUTE instead makes each element O(n). Empty
    * array when the doc has fewer than `n` tokens (the [[shingles]]
    * contract). */
  def shingleHashesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => conv(substring(md5(array_join(slice(toks, i, lit(n)), " ")),
          1, 8), 16, 10).cast("long")))
      .otherwise(array().cast("array<long>"))

  /** The u32 hash array over ORDERED `n`-gram shingles — the
    * winnowing input, exposed separately so pipelines can MATERIALIZE
    * it as its own column before the window-min pass. This matters:
    * feeding [[winnowFromHashes]] the unmaterialized expression makes
    * every window position re-evaluate the whole md5 array inside the
    * lambda (no common-subexpression elimination across higher-order
    * functions) — O(shingles²) md5 calls per doc, measured 8.6×
    * SLOWER than the DuckDB replay at sf0.1; split into two
    * projections it is O(shingles) md5 + O(shingles × w) mins and
    * 20× faster than before. CollapseProject keeps the split: the
    * alias is referenced more than once, so the optimizer does not
    * inline it back. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(text, n),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast("long"))

  /** Window-min selection over an ALREADY MATERIALIZED hash array —
    * see [[shingleHashes]] for why the split exists. */
  def winnowFromHashes(hs: Column, w: Int): Column = {
    val m = size(hs)
    when(m >= 1,
      sort_array(array_distinct(
        transform(sequence(lit(0), greatest(m - w, lit(0))),
          i => array_min(slice(hs, i + 1, lit(w)))))))
  }

  /** Quality metrics (length / punctuation / stopword ratios — the
    * standard pre-training quality heuristics). `stopwords` doubles as
    * the language profile. */
  def qualityMetrics(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTokens = size(toks)
    val punct = nChars - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))
    val stopHits = size(array_intersect(toks, array(stopwords.map(lit): _*)))
    struct(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      round(punct.cast("double") / greatest(nChars, lit(1)), 6).as("punct_ratio"),
      round(stopHits.cast("double") / greatest(size(array_distinct(toks)), lit(1)), 6)
        .as("stopword_ratio"),
      round((nChars - size(toks) + 1).cast("double") / greatest(nTokens, lit(1)), 6)
        .as("avg_token_len"))
  }

  /** Language profiles: distinctive high-frequency words per language.
    * The n-gram-heuristic classifier scores each profile by distinct-hit
    * count; ties break on profile order. */
  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "para", "en", "que"))

  /** Profile-scored language ID: the profile with the most distinct
    * token hits wins (ties → earliest profile); below `minHits` →
    * "und" (undetermined).
    *
    * Expression SHAPE matters here: each profile's score subtree
    * appears exactly ONCE, with the winner picked by `array_max` over
    * (score, -index) structs. A when/otherwise fold would nest each
    * comparison inside the previous one — the first score's subtree
    * gets textually duplicated ~2^profiles times, and whenever this
    * column sits in a CONDITIONAL context (e.g. the fallback branch of
    * [[languageIdScripted]]'s coalesce) codegen subexpression
    * elimination is off, so every duplicate re-tokenizes the row
    * (measured 3.6× on q49 before this shape). */
  def languageId(text: Column, profiles: Seq[(String, Seq[String])] = DefaultProfiles,
                 minHits: Int = 1): Column = {
    val toks = array_distinct(tokens(text))
    val scored = profiles.zipWithIndex.map { case ((_, words), i) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("s"),
        lit(-i).as("ni"))
    }
    val best = array_max(array(scored: _*))
    val langs = array(profiles.map(p => lit(p._1)): _*)
    when(best.getField("s") >= minHits,
      element_at(langs, -best.getField("ni") + 1)).otherwise(lit("und"))
  }

  /** Characters of `text` matching a regex character class — the
    * removal-length trick (`len(text) − len(text without the class)`),
    * identical in any engine whose `length` counts code points (Spark
    * and DuckDB both do). */
  def scriptCharCount(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  /** Script-aware language ID: non-space-delimited scripts identify by
    * CHARACTER evidence (stopword profiles need word boundaries, so CJK
    * text scores "und" under [[languageId]]): ≥ `minScriptChars` kana →
    * ja (Japanese always carries kana; Chinese never does), hangul →
    * ko, thai → th, han → zh — in that precedence order (kanji-bearing
    * Japanese must check kana before han). Latin-script text falls back
    * to the stopword profiles. Script evidence + precedence run as ONE
    * native pass (`graft_script_lang` — a CaseWhen over
    * `graft_script_counts` elements would re-run the counting scan per
    * condition, since codegen subexpression elimination hoists only a
    * conditional's first condition); [[languageIdScriptedComposed]] is
    * the four-regex removal-length twin the DuckDB oracle replays. */
  def languageIdScripted(text: Column,
                         profiles: Seq[(String, Seq[String])] = DefaultProfiles,
                         minHits: Int = 1, minScriptChars: Int = 3): Column =
    coalesce(call_function("graft_script_lang", text, lit(minScriptChars)),
      languageId(text, profiles, minHits))

  /** [[languageIdScripted]] as composed built-ins — four regexp_replace
    * passes via [[scriptCharCount]]; kept as the independent reference
    * implementation (TextOpsSpec pins equivalence) and the shape the
    * DuckDB oracle reproduces. */
  private[ops] def languageIdScriptedComposed(
      text: Column, profiles: Seq[(String, Seq[String])] = DefaultProfiles,
      minHits: Int = 1, minScriptChars: Int = 3): Column = {
    val kana = scriptCharCount(text, "[\\p{IsHiragana}\\p{IsKatakana}]")
    val hangul = scriptCharCount(text, "\\p{IsHangul}")
    val thai = scriptCharCount(text, "\\p{IsThai}")
    val han = scriptCharCount(text, "\\p{IsHan}")
    when(kana >= minScriptChars, lit("ja"))
      .when(hangul >= minScriptChars, lit("ko"))
      .when(thai >= minScriptChars, lit("th"))
      .when(han >= minScriptChars, lit("zh"))
      .otherwise(languageId(text, profiles, minHits))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set (Broder-style canonicalization — word order and duplication
    * insensitive). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Polynomial rolling hash over the token stream (order-sensitive):
    * h = Σ h*31 + crc32(token), in 64-bit arithmetic. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc * 31L + crc32(t))

  /** RFC 3986 §6.2.2 percent-encoding normalization as a native
    * single-pass kernel ([[graft.functions.PctNormExpression]]):
    * unreserved escapes decoded, surviving escapes' hex uppercased,
    * malformed escapes copied verbatim. Idempotent; identity on
    * percent-free input. */
  def pctNormalize(s: Column): Column =
    call_function("graft_pct_norm", s)

  /** IDN host (optionally `host:port`) → lowercase punycode ASCII via
    * `java.net.IDN.toASCII` ([[graft.functions.IdnAsciiExpression]]);
    * all-ASCII input is returned byte-identical, un-encodable hosts
    * fall back to the input (never throws on crawl garbage). */
  def idnHost(host: Column): Column =
    call_function("graft_idn_ascii", host)

  /** URL canonicalization — the key-normalization step of URL-level
    * dedup (the cheapest dedup a web corpus runs, before any content
    * hashing: the same page crawled via `HTTP://WWW.Site.com:80/a/?utm_
    * source=feed#top` and `http://site.com/a` must collide). Rules, in
    * order:
    *  - percent-encoding normalized FIRST, over the whole URL (RFC
    *    3986 §6.2.2, [[graft.functions.PctNorm]]): unreserved escapes
    *    decoded (`%41` → `A`, `%7e` → `~`), surviving escapes'
    *    hex uppercased (`%2f` → `%2F`) — safe before parsing because
    *    unreserved characters are never delimiters;
    *  - scheme and host lowercase; userinfo (`user@`) stripped;
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - leading `www.` stripped;
    *  - IDN hosts punycoded ([[graft.functions.IdnAscii]]): a host
    *    with non-ASCII labels goes through `java.net.IDN.toASCII`, so
    *    `bücher.example` keys as `xn--bcher-kva.example`; all-ASCII
    *    hosts are returned byte-identical (one-scan fast path);
    *  - fragment (`#…`) stripped;
    *  - trailing slashes trimmed from the path; empty path → `/`;
    *  - query parameters: tracking params dropped (any param matching
    *    a `dropParamPrefixes` prefix — `utm_*`, `fbclid=…`, `gclid=…`,
    *    `ref=…` by default), the rest SORTED bytewise and rejoined, so
    *    parameter order never splits a dup group.
    *
    * ONE native expression call per row
    * ([[graft.functions.CanonicalUrlExpression]]) — the composed
    * regexp/split/array form below textually duplicates its
    * host/path/query subtrees at every `when` branch (a ~60-node
    * expression tree per URL column that q115's bench measured as
    * plan-compile floor, not row work), while the native kernel is
    * one string pass; [[canonicalUrlComposed]] stays as the
    * independent spec-pinned twin whose rules the DuckDB oracle
    * replays. Non-URL input degrades gracefully (no scheme → empty
    * scheme, the rest of the rules still apply). */
  def canonicalUrl(rawUrl: Column,
                   dropParamPrefixes: Seq[String] =
                     Seq("utm_", "fbclid=", "gclid=", "ref=")): Column =
    call_function("graft_canonical_url", rawUrl,
      array(dropParamPrefixes.map(lit): _*))

  /** [[canonicalUrl]] as composed built-ins — the reference twin the
    * equivalence spec pins against the native kernel and the shape
    * the q115 DuckDB oracle replays rule for rule. */
  private[ops] def canonicalUrlComposed(
      rawUrl: Column,
      dropParamPrefixes: Seq[String] =
        Seq("utm_", "fbclid=", "gclid=", "ref=")): Column = {
    val url = pctNormalize(rawUrl)
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = substring_index(rest, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    // \z (end of TEXT), not $: Java's non-MULTILINE $ also matches
    // before a trailing newline, so 'http://x/a/?b=1\n' would quietly
    // drop the \n from the query (and trim the slash of '/a/\n')
    // while the native kernel's substring pass keeps garbage verbatim
    // — \z + (?s) makes twin, native and the RE2 oracle agree on
    // newline-bearing crawl garbage
    val query = regexp_extract(noFrag, "(?s)\\?(.*)\\z", 1)
    val auth = substring_index(base, "/", 1)
    val path = base.substr(length(auth) + 1, length(base))
    val hostPort = lower(regexp_replace(auth, "^[^@]*@", ""))
    val noPort =
      when(scheme === "http", regexp_replace(hostPort, ":80\\z", ""))
        .when(scheme === "https", regexp_replace(hostPort, ":443\\z", ""))
        .otherwise(hostPort)
    val host = idnHost(regexp_replace(noPort, "^www\\.", ""))
    val trimmed = regexp_replace(path, "/+\\z", "")
    val cPath = when(trimmed === "", lit("/")).otherwise(trimmed)
    val params = filter(split(query, "&"), p =>
      p =!= "" && dropParamPrefixes.map(pre => !p.startsWith(pre)).reduce(_ && _))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, cPath,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** DOM-aware MAIN-CONTENT extraction as a column op
    * ([[graft.core.Markup.mainContent]]): parse the HTML, drop
    * structural boilerplate (script/nav/footer/... subtrees and
    * boilerplate-named classes), keep leaf text blocks that clear the
    * length floor at low link density, join with newlines. A UDF,
    * deliberately — the DOM walk is irreducibly JVM-object work, and
    * one projection keeps the scan codegen-fused with no shuffle
    * (the [[graft.ops.ImageHash.dHashUdf]] rationale). The
    * corpus-frequency complement is the shingle-df boilerplate
    * operator (q41); this one needs no second corpus pass. */
  def mainContent(html: Column, minBlockChars: Int = 25,
                  maxLinkDensity: Double = 0.33): Column = {
    val u = udf((s: String) =>
      graft.core.Markup.mainContent(s, minBlockChars, maxLinkDensity))
    u(html)
  }
}
