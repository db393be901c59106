package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Specs for the corpus-audit / incremental-ingestion operator batch:
  * URL canonicalization, source-balance (Lorenz/Gini/entropy),
  * incremental dedup against a published MinHash index, tokenizer
  * fertility, and quantile-ensemble quality scoring.
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("canonicalUrl: case, default ports, www, userinfo, fragment, trailing slash, tracking params, param order") {
    val cases = Seq(
      // every rule at once: scheme/host case, :80, www, trailing /,
      // fragment, utm_* dropped, params sorted
      "HTTP://WWW.Example.COM:80/a/b/?b=2&utm_source=x&a=1#top" ->
        "http://example.com/a/b?a=1&b=2",
      // https default port + userinfo stripped; root path survives
      "https://User:pw@Site.org:443/" -> "https://site.org/",
      // NON-default port is kept
      "https://site.org:8443/x" -> "https://site.org:8443/x",
      // :80 is only default for http, not https
      "https://site.org:80/x" -> "https://site.org:80/x",
      // empty path canonicalizes to /
      "http://site.org" -> "http://site.org/",
      // all params tracking -> query dropped entirely
      "http://site.org/?utm_source=a&fbclid=b&gclid=c&ref=d" ->
        "http://site.org/",
      // param order never splits a group
      "http://a.com/p?z=1&y=2&x=3" -> "http://a.com/p?x=3&y=2&z=1",
      // non-URL input degrades gracefully, never throws
      "oops" -> "://oops/")
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
    // the two crawl-variant spellings of one page collide
    val pair = Seq(
      "HTTP://WWW.Site.com:80/a/?utm_source=feed&x=1#top",
      "http://site.com/a?x=1").toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c"))
      .distinct().count()
    assert(pair === 1L)
  }

  test("canonicalUrl: a NULL element in the prefixes literal is a diagnostic error, not an NPE") {
    val e = intercept[Exception] {
      Seq("http://a.com/p").toDF("url")
        .select(call_function("graft_canonical_url", col("url"),
          array(lit("utm_"), lit(null).cast("string"))).as("c"))
        .collect()
    }
    // the build-time require names the function and the offending
    // element (the error may arrive wrapped in an analysis exception)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("graft_canonical_url") && m.contains("NULL")),
      s"got: ${messages(e)}")
  }

  test("canonicalUrl: percent-escape normalization — unreserved decode, hex uppercase, malformed verbatim") {
    val cases = Seq(
      // unreserved decode (%61 -> a) + reserved escape hex uppercased
      "http://ex.com/p%61th?z=%2f" -> "http://ex.com/path?z=%2F",
      // both hex cases of an unreserved escape decode identically
      "http://ex.com/a%7E" -> "http://ex.com/a~",
      "http://ex.com/a%7e" -> "http://ex.com/a~",
      // reserved escapes stay ENCODED: %2F is data, not a separator
      "http://ex.com/a%2Fb" -> "http://ex.com/a%2Fb",
      // %25 (escaped percent) must never decode — decoding it would
      // break idempotence (a second pass would see new escapes)
      "http://ex.com/x%25y" -> "http://ex.com/x%25y",
      // escapes in the HOST decode, then the host lowercases
      "http://EX%41MPLE.com/" -> "http://example.com/",
      // bare % / truncated / non-hex escapes copied verbatim, no throw
      "http://ex.com/100%?x=%zz&y=%1" -> "http://ex.com/100%?x=%zz&y=%1")
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
    // the two escape spellings of one page collide
    val pair = Seq("http://ex.com/p%61th?z=%2f", "http://ex.com/path?z=%2F")
      .toDF("url").select(TextOps.canonicalUrl(col("url")).as("c"))
      .distinct().count()
    assert(pair === 1L)
  }

  test("pctNormalize native kernel == composed oracle-replay twin") {
    // the DuckDB q115 replay tokenizes on escape|%|run and rebuilds;
    // the same composition in Spark built-ins must agree with the
    // native single-pass expression on every input shape
    def composed(c: org.apache.spark.sql.Column) = {
      val toks = regexp_extract_all(c, lit("%[0-9A-Fa-f]{2}|%|[^%]+"), lit(0))
      array_join(transform(toks, t => {
        val code = conv(substring(t, 2, 2), 16, 10).cast("int")
        val isEsc = substring(t, 1, 1) === "%" && length(t) === 3
        when(!isEsc, t)
          .when(code.between(48, 57) || code.between(65, 90) ||
            code.between(97, 122) || code.isin(45, 46, 95, 126),
            call_function("char", code))
          .otherwise(concat(lit("%"), upper(substring(t, 2, 2))))
      }), "")
    }
    val atoms = Seq("%61", "%7E", "%7e", "%2f", "%2F", "%25", "%zz", "%",
      "%1", "a", "path", "100%", "ü", "/", "?x=", "%41%42", "%%41")
    val inputs = atoms ++ (for (a <- atoms; b <- atoms) yield a + b)
    val bad = inputs.toDF("s")
      .select(TextOps.pctNormalize(col("s")).as("native"),
        composed(col("s")).as("twin"))
      .filter(col("native") =!= col("twin")).collect()
    assert(bad.isEmpty, s"diverging cases: ${bad.take(5).mkString(", ")}")
  }

  test("canonicalUrl: IDN hosts punycode via IDN.toASCII; ASCII hosts byte-identical") {
    val got = Seq(
      "http://BÜCHER.example/x",            // uppercase unicode host
      "http://xn--bcher-kva.example/x",     // its already-punycode twin
      "https://пример.испытание/",          // multi-label IDN
      "http://bücher.example:8080/x")       // non-default port kept
      .toDF("url").select(TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(got(0) === "http://xn--bcher-kva.example/x")
    assert(got(0) === got(1)) // unicode and punycode spellings collide
    assert(got(2) === "https://xn--e1afmkfd.xn--80akhbyknj4f/")
    assert(got(3) === "http://xn--bcher-kva.example:8080/x")
    // a host IDN cannot encode falls back to the input (never throws);
    // empty labels are the canonical un-encodable shape
    val garbage = Seq("http://ü..example/x").toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c")).collect()
    assert(garbage.length === 1)
  }

  test("canonicalUrl is idempotent over generated URL variants") {
    // a canonical form must be a fixed point: canonical(canonical(u))
    // == canonical(u), else the same page keys differently depending
    // on how many normalization passes it went through
    val schemes = Seq("http", "HTTPS", "ftp")
    val hosts = Seq("WWW.Ex.COM", "ex.com", "User@ex.com:80", "ex.com:443",
      "BÜCHER.example", "ex%41.com")
    val paths = Seq("", "/", "/a/b/", "/a//", "/p%61th%2Fq%7e%25/")
    val queries = Seq("", "?b=2&a=1", "?utm_source=x", "?z=1&utm_a=2&y=3#f",
      "?z=%2f&a=%61")
    val urls = for (s <- schemes; h <- hosts; p <- paths; q <- queries)
      yield s"$s://$h$p$q"
    val once = urls.toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c"))
    val twice = once.select(col("c").as("orig"),
        TextOps.canonicalUrl(col("c")).as("again"))
      .filter(col("orig") =!= col("again"))
      .collect()
    assert(twice.isEmpty,
      s"non-idempotent cases: ${twice.take(5).mkString(", ")}")
    // the native kernel IS the composed oracle-replay twin, over the
    // variant matrix PLUS degenerate non-URL inputs (which are not
    // idempotency fixed points — garbage in, stable-garbage out —
    // but on which both forms must still agree byte for byte)
    val twinInputs = urls ++
      Seq("oops", "", "100%", "a$b://x", "a//b://x", "ab:x://y",
        "http://ex.com?", "http://#f", "HTTP://ex.com/?&&a=1&",
        // trailing-newline crawl garbage: Java's non-MULTILINE '$'
        // matches BEFORE a final \n, so composed regexes must anchor
        // with \z to agree with the native substring pass
        "http://ex.com/a/?b=1\n", "http://ex.com:80\n",
        "https://ex.com:443/x/\n", "http://ex.com/a/\n?b=1")
    val diverged = twinInputs.toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("native"),
        TextOps.canonicalUrlComposed(col("url")).as("twin"))
      .filter(col("native") =!= col("twin"))
      .collect()
    assert(diverged.isEmpty,
      s"native != composed: ${diverged.take(5).mkString(", ")}")
  }

  test("balanceAudit: hand-computed Lorenz curve, Gini and micro-nat entropy; partition-invariant") {
    // per-source masses 10/30/60 arrive as split rows so the corpus
    // aggregation is exercised
    val df = Seq(("s1", 4L), ("s1", 6L), ("s2", 30L), ("s3", 25L), ("s3", 35L))
      .toDF("src", "w").repartition(5)
    val rows = Stats.balanceAudit(df, "src", "w").orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq === Seq("s1", "s2", "s3"))
    assert(rows.map(_._3).toSeq === Seq(0.1, 0.3, 0.6), "shares")
    assert(rows.map(_._4).toSeq === Seq(0.1, 0.4, 1.0), "Lorenz cum shares")
    // g_num = 1*10 + 3*30 + 5*60 = 400; gini = (400 - 3*100)/(3*100)
    assert(rows.forall(_._6 === 0.333333), "gini")
    // entropy micro-nat terms: 230259 + 361192 + 306495 = 897946
    assert(rows.forall(_._7 === 0.897946), "entropy")
    // equal weights -> gini 0
    val eq = Seq(("a", 5L), ("b", 5L)).toDF("src", "w")
    assert(Stats.balanceAudit(eq, "src", "w").head.getDouble(5) === 0.0)
  }

  test("dedupAgainstIndex: exact dup flagged via signatures only, min old id wins, clean doc untouched") {
    val t = "the quick brown fox jumps over the lazy dog again and again for good measure"
    val u = "completely different content with nothing shared at all among these many words"
    val old = Seq((5L, t), (2L, t), (3L, u)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, t),
      (11L, "unrelated fresh text never seen before with plenty of novel tokens inside")
    ).toDF("doc_id", "text")
    val idx = Dedup.minhashBandIndex(old, "doc_id", "text")
    // index stores bands x docs rows, signature riding along
    assert(idx.count() === 3L * 4L)
    val got = Dedup.dedupAgainstIndex(batch, idx, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getBoolean(4))).toMap
    // both old copies matched at estimated J=1.0; dup_of is the SMALLEST
    assert(got(10L) === ((2L, Some(2L), Some(1.0), true)))
    // the clean doc is present with zero matches (absence is not silence)
    assert(got(11L) === ((0L, None, None, false)))
  }

  test("fertilityAudit: hand-computed subword/byte accounting, CJK bytes as UTF-8 octets") {
    val docs = Seq(("g", "ab ab cd"), ("h", "机")).toDF("src", "text")
    val got = Bpe.fertilityAudit(docs, "src", "text", Seq(("a", "b")))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // g: ab x2 (merged -> [ab, </w>] = 2 subwords), cd x1 ([c, d, </w>] = 3)
    // bytes = 2*2 + 2 = 6; subwords = 2*2 + 3 = 7
    assert(got(0) === (("g", 3L, 2L, 6L, 7L, 0.857143, 2.333333)))
    // h: one CJK char = 3 UTF-8 bytes, segments to [机, </w>]
    assert(got(1) === (("h", 1L, 1L, 3L, 2L, 1.5, 2.0)))
  }

  test("datasetCard: hand-computed per-source card; cross-source exact dup shows in BOTH sources") {
    val docs = Seq(
      (1L, "sa", "the quick fox"),          // en (1 stopword of 3)
      (2L, "sa", "shared boiler text"),     // dup partner in sb
      (3L, "sb", "shared boiler text"),
      (4L, "sb", "zzz qqq")                 // und, no stopwords
    ).toDF("doc_id", "src", "text")
    val got = Stats.datasetCard(docs, "src", "doc_id", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8), r.getLong(9)))
    // sa: 2 docs, 3+3=6 tokens, min/max 3/3, stop_milli (333+0)/2=166,
    //     1 dup doc (the cross-source copy), 2 en?  "shared boiler text"
    //     has no stopwords -> und; so n_en = 1
    assert(got(0) === (("sa", 2L, 6L, 3L, 3L, 166L, 1L, 0.5, 1L)))
    // sb: 2 docs, 3+2=5 tokens, min 2 max 3, stop 0, 1 dup, 0 en
    assert(got(1) === (("sb", 2L, 5L, 2L, 3L, 0L, 1L, 0.5, 0L)))
  }

  test("crossSourceDupMatrix: shared texts and per-side doc mass, multiplicity counted") {
    val docs = Seq(
      ("a", "t one"), ("a", "t one"), ("b", "t one"), ("c", "t one"),
      ("a", "t two"), ("b", "t two"),
      ("c", "only c has this")).toDF("src", "text")
    val got = Dedup.crossSourceDupMatrix(docs, "src", "text")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("a", "b", 2L, 3L, 2L),  // t-one (a has TWO copies) + t-two
      ("a", "c", 1L, 2L, 1L),
      ("b", "c", 1L, 1L, 1L)))
  }

  test("noveltyScores: corpus-unique shingle fraction; shingle-less doc gets null novelty") {
    val docs = Seq((1L, "a b c d"), (2L, "x b c d"), (3L, "q"))
      .toDF("doc_id", "text")
    val got = Relevance.noveltyScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    // shingles: d1 {a b c, b c d}, d2 {x b c, b c d}; "b c d" df=2
    assert(got(0) === ((1L, 2L, 1L, Some(0.5))))
    assert(got(1) === ((2L, 2L, 1L, Some(0.5))))
    assert(got(2) === ((3L, 0L, 0L, None)))
  }

  test("psi: zero for an identical batch, large for a shifted one, driver-replica exact") {
    val ref = (1L to 400L).map(i => i % 40).toDF("v")
    // identical distribution -> every per-bin term is exactly 0
    assert(Stats.psi(ref, ref, "v", binWidth = 8L).head.getDouble(3) === 0.0)
    // shifted by two bins -> way past the 0.25 investigate threshold
    val shifted = (1L to 400L).map(i => i % 40 + 16).toDF("v")
    val drift = Stats.psi(ref, shifted, "v", binWidth = 8L).head
    assert(drift.getDouble(3) > 0.25, s"shifted psi: ${drift.getDouble(3)}")
    assert(drift.getLong(0) === 400L && drift.getLong(1) === 400L)
    // driver-side replica of the smoothed formula on a small case
    val a = Seq(0L, 1L, 9L, 17L).toDF("v")
    val b = Seq(0L, 8L, 8L, 25L).toDF("v")
    val got = Stats.psi(a, b, "v", binWidth = 8L).head
    val ra = Map(0L -> 2L, 1L -> 1L, 2L -> 1L)
    val rb = Map(0L -> 1L, 1L -> 2L, 3L -> 1L)
    val dom = (ra.keySet ++ rb.keySet).toSeq.sorted
    val nb = dom.size
    val expect = dom.map { bin =>
      val pr = (ra.getOrElse(bin, 0L) + 1.0) / (4 + nb)
      val pn = (rb.getOrElse(bin, 0L) + 1.0) / (4 + nb)
      math.round((pn - pr) * math.log(pn / pr) * 1e12)
    }.sum / 1e12
    assert(got.getDouble(3) === BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getLong(2) === nb.toLong)
    // null values are excluded from BOTH masses: an un-filtered null
    // would bin to a null key that inflates totals and the bin count
    // while its mass never matches the domain join (Σp < 1)
    val aN = Seq(Some(0L), Some(1L), Some(9L), Some(17L), None).toDF("v")
    val bN = Seq(Some(0L), Some(8L), Some(8L), Some(25L), None, None).toDF("v")
    val gotN = Stats.psi(aN, bN, "v", binWidth = 8L).head
    assert(gotN.getLong(0) === 4L && gotN.getLong(1) === 4L &&
      gotN.getLong(2) === nb.toLong && gotN.getDouble(3) === got.getDouble(3),
      "nulls contribute nothing to counts, bins, or the PSI")
  }

  test("crossSourceNearDupMatrix: cross-source pair lands off-diagonal, within-source on the diagonal") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, "sa", base), (2L, "sb", base + " nu"),          // cross near-dup
      (3L, "sc", "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "sc", "one two three four five six seven eight nine ten eleven twelve thirteen"),
      (5L, "sa", "totally unrelated content with nothing shared here at all today")
    ).toDF("doc_id", "src", "text")
    val got = Dedup.crossSourceNearDupMatrix(docs, "doc_id", "src", "text")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 2)
    assert(got(0)._1 === "sa" && got(0)._2 === "sb" && got(0)._3 === 1L)
    assert(got(0)._4 > 0.8 && got(0)._4 < 1.0)
    assert(got(1) === (("sc", "sc", 1L, got(1)._4)), "within-source diagonal")
  }

  test("resolveClustersByQuality: keep goes to the highest-quality member, not the smallest id") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base), (2L, base + " nu"), (3L, base),
      (9L, "a singleton document with its very own content and words"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val scored = Seq((1L, 10L), (2L, 99L), (3L, 50L), (9L, 1L))
      .toDF("doc_id", "q")
    val got = Dedup.resolveClustersByQuality(scored, "doc_id", "q", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))).toMap
    assert(got(1L) === ((1L, false)), "smallest id loses to quality")
    assert(got(2L) === ((1L, true)), "highest quality kept")
    assert(got(3L) === ((1L, false)))
    assert(got(9L) === ((9L, true)), "singleton keeps itself")
  }

  test("sourceDriftKl matches a driver-side replica; atypical source scores higher; KL >= 0") {
    val docs = Seq(
      ("mixed", "aa bb cc dd aa bb cc dd aa bb"),
      ("mixed", "cc dd aa bb cc dd"),
      ("skew", "zz zz zz zz zz zz zz zz")).toDF("src", "text")
    val B = 16
    val got = Selection.sourceDriftKl(docs, "src", "text", buckets = B)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // driver-side replica of the exact formula (same md5 buckets,
    // add-1 smoothing, pico-nat rounding)
    def bucket(tk: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16) % B
    }
    val toks = Seq(
      "mixed" -> "aa bb cc dd aa bb cc dd aa bb cc dd aa bb cc dd".split(" ").toSeq,
      "skew" -> Seq.fill(8)("zz"))
    val all = toks.flatMap(_._2)
    val nTot = all.size
    val cb = all.groupBy(bucket).map { case (b, l) => b -> l.size }
    val expect = toks.map { case (s, tks) =>
      val nS = tks.size
      val sb = tks.groupBy(bucket).map { case (b, l) => b -> l.size }
      val kl = (0 until B).map { b =>
        val p = (sb.getOrElse(b.toLong, 0) + 1.0) / (nS + B)
        val q = (cb.getOrElse(b.toLong, 0) + 1.0) / (nTot + B)
        math.round(p * math.log(p / q) * 1e12)
      }.sum / 1e12
      s -> (nS.toLong, BigDecimal(kl).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got === expect)
    assert(got("skew")._2 > got("mixed")._2, "concentrated source drifts more")
    assert(got("mixed")._2 >= 0.0 && got("skew")._2 >= 0.0, "KL is non-negative")
  }

  test("clusterPurity: majority label per cluster, smallest label wins ties") {
    val assigned = Seq(
      (0L, 1), (0L, 1), (0L, 2),          // cluster 0: majority label 1
      (1L, 5), (1L, 7),                   // cluster 1: tie -> label 5
      (2L, 9)).toDF("cluster", "label")
    val got = Similarity.clusterPurity(assigned, "cluster", "label")
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq((0L, 3L, 1, 2L, 0.666667),
      (1L, 2L, 5, 1L, 0.5), (2L, 1L, 9, 1L, 1.0)))
  }

  test("labelCentroidMatrix: orthogonal labels cosine 0, parallel labels cosine 1") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 1), (2L, Array(3f, 0f), 1),   // label 1 -> +x
      (3L, Array(0f, 2f), 2),                            // label 2 -> +y
      (4L, Array(5f, 0f), 3))                            // label 3 -> +x
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidMatrix(vecs, "label", "embedding")
      .orderBy("label_a", "label_b").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got((1, 2)) === ((2L, 1L, 0.0)))
    assert(got((1, 3)) === ((2L, 1L, 1.0)))
    assert(got((2, 3)) === ((1L, 1L, 0.0)))
  }

  test("ensembleCumeDist equals the mean of window CUME_DISTs, tie-correct; cume frames broadcast") {
    val df = Seq((1L, 10L, 5L), (2L, 10L, 7L), (3L, 20L, 5L), (4L, 30L, 9L))
      .toDF("id", "s1", "s2").repartition(3)
    val out = Selection.ensembleCumeDist(df, Seq("s1", "s2"))
    val got = out.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("q_s1"), r.getAs[Double]("q_s2"),
          r.getAs[Double]("ensemble_score"))).toMap
    val ref = df.selectExpr("id",
        "round(CUME_DIST() OVER (ORDER BY s1), 6) AS q1",
        "round(CUME_DIST() OVER (ORDER BY s2), 6) AS q2")
      .selectExpr("id", "q1", "q2", "round((q1 + q2) / 2, 6) AS e")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got === ref)
    // ties: ids 1 and 2 share s1=10 -> same q_s1
    assert(got(1L)._1 === got(2L)._1)
    // plan shape: per-signal cume frames come back via broadcast joins,
    // never a corpus-wide window sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("ensembleCumeDist rejects fractional signal columns (long-keyed histograms would truncate)") {
    val df = Seq((1L, 0.2, 5L), (2L, 0.9, 7L)).toDF("id", "s1", "s2")
    // 0.2 and 0.9 would silently collapse into one quantile bucket —
    // the integral-signals contract must fail fast, not truncate
    val e = intercept[IllegalArgumentException] {
      Selection.ensembleCumeDist(df, Seq("s1", "s2"))
    }
    assert(e.getMessage.contains("s1") && e.getMessage.contains("integral"))
  }

  test("ensembleCumeDist keeps NULL-signal rows (nulls-first quantile, null-safe join back)") {
    val df = Seq((1L, Some(10L), Some(5L)), (2L, None, Some(7L)),
        (3L, Some(20L), Some(5L)), (4L, Some(30L), None))
      .toDF("id", "s1", "s2")
    val out = Selection.ensembleCumeDist(df, Seq("s1", "s2")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("q_s1"), r.getAs[Double]("q_s2"))).toMap
    assert(out.size === 4, "no input row may drop on a NULL signal")
    // SQL CUME_DIST convention: the null group orders first
    assert(out(2L)._1 === 0.25, "one null of four -> lowest quantile")
    assert(out(4L)._2 === 0.25)
    // non-null values rank above the null group
    assert(out(1L)._1 === 0.5 && out(3L)._1 === 0.75)
  }

  test("ensembleCumeDist evaluates the input lineage exactly once (fused histograms)") {
    val acc = spark.sparkContext.longAccumulator("signal-evals")
    val bump = udf((x: Long) => { acc.add(1L); x })
    val n = 64L
    val scored = spark.range(n).select(col("id"),
      bump(col("id") % 7).as("s1"), (col("id") % 5).as("s2"),
      (col("id") % 3).as("s3"))
    Selection.ensembleCumeDist(scored, Seq("s1", "s2", "s3")).collect()
    // before the fuse: k histogram passes + the join-back re-ran the
    // signal expressions (k + 1 = 4 evaluations per row); the
    // checkpointed stack aggregation runs them once
    assert(acc.value === n,
      s"input must be scored once, not re-derived per signal (got ${acc.value})")
  }
}
