package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MixturePrivacySpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = ((0 until 900).map(i => (i.toLong, "big")) ++
    (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "dom")

  test("mixtureSample: alpha=1 preserves the natural mix, alpha=0 flattens toward uniform") {
    def mix(alpha: Double): Map[String, Long] =
      Curation.mixtureSample(corpus, "dom", "id", alpha, targetRows = 200)
        .groupBy("dom").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
    val natural = mix(1.0)
    // alpha=1: rate identical for every domain (target/n) -> ~9:1 mix
    assert(natural("big").toDouble / natural("small") > 4.0,
      s"natural mix should stay big-heavy, got $natural")
    val flat = mix(0.0)
    // alpha=0: expected 100 rows per domain; small (100 rows) keeps ~all
    assert(flat("small") > 60, s"flattened mix should lift the rare domain, got $flat")
    assert(math.abs(flat("big") - flat("small")) < flat("big"),
      s"flattened mix should be far from 9:1, got $flat")
  }

  test("mixtureSample is a pure function of the id: repeatable under repartition") {
    val a = Curation.mixtureSample(corpus, "dom", "id", 0.5, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.mixtureSample(corpus.repartition(13), "dom", "id", 0.5, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("cdcChunks: chunks concatenate back to the text; brute-force boundary parity") {
    def u32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
        ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
    }
    val text = (1 to 120).map(i => s"tok${(i * 7919) % 97}").mkString(" ")
    val df = Seq((1L, text), (2L, ""), (3L, "short")).toDF("doc_id", "text")
    val out = Curation.cdcChunks(df, "doc_id", "text", window = 8, divisor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(!out.exists(_._1 == 2L), "empty text yields no chunks")
    assert(out.filter(_._1 == 3L).map(_._3).toSeq === Seq("short"),
      "below-window text is one whole chunk")
    val chunks1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(chunks1.mkString === text, "chunks must concatenate to the input")
    // brute-force the same boundary rule
    val expected = {
      val cuts = (8 until text.length)
        .filter(i => u32(text.substring(i - 8, i)) % 16 == 0)
      (0 +: cuts :+ text.length).sliding(2)
        .map { case Seq(a, b) => text.substring(a, b) }.toSeq
    }
    assert(chunks1.toSeq === expected)
    assert(chunks1.length > 3, s"divisor 16 over 600+ chars should cut several times")
  }

  test("cdcChunks: a prefix insertion preserves most chunk hashes (the CDC property)") {
    val base = (1 to 200).map(i => s"w${(i * 6007) % 89}").mkString(" ")
    val df = Seq((1L, base), (2L, "INSERTED PREFIX " + base)).toDF("doc_id", "text")
    val chunks = Curation.cdcChunks(df, "doc_id", "text", window = 8, divisor = 32)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = (a intersect b).size.toDouble / a.size
    assert(shared > 0.5,
      f"content-defined boundaries should survive a prefix shift, shared=$shared%.2f")
  }

  test("kAnonymize: drops quasi-groups smaller than k, keeps payload rows intact") {
    val df = Seq(
      ("a", 1, "p1"), ("a", 1, "p2"), ("a", 1, "p3"),
      ("b", 2, "p4"), ("b", 2, "p5"),
      ("c", 3, "p6")).toDF("q1", "q2", "payload")
    val kept = Curation.kAnonymize(df, Seq("q1", "q2"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(kept === Set(("a", "p1"), ("a", "p2"), ("a", "p3"),
      ("b", "p4"), ("b", "p5")))
    val all = Curation.kAnonymize(df, Seq("q1"), k = 1).count()
    assert(all === 6L, "k=1 suppresses nothing")
  }

  test("mixtureEpochs: targets follow the weight table, epochs flag upsampling, unknown domains weight 0") {
    // en: 100 docs x 4 tokens = 400; fr: 10 x 4 = 40; xx: 5 x 4 = 20
    val docs = ((0 until 100).map(i => (s"d$i", "en", "one two three four")) ++
      (0 until 10).map(i => (s"e$i", "fr", "un deux trois quatre")) ++
      (0 until 5).map(i => (s"x$i", "xx", "a b c d")))
      .toDF("id", "lang", "text")
    val out = Curation.mixtureEpochs(docs, "lang", "text",
        weights = Map("en" -> 0.75, "fr" -> 0.25), budgetTokens = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Boolean])))).toMap
    assert(out.keySet === Set("en", "fr", "xx"), "every domain reported")
    assert(out("en") === ((400L, 0.75, 750L, Some(1.875), Some(true))),
      s"en: 750-token slice over 400 actual -> 1.875 epochs (upsampled), got ${out("en")}")
    assert(out("fr") === ((40L, 0.25, 250L, Some(6.25), Some(true))))
    assert(out("xx") === ((20L, 0.0, 0L, Some(0.0), Some(false))),
      "domain absent from the mix: weight 0, zero slice, not upsampled")
  }

  test("expandEpochs: floor copies for everyone, md5-gated fractional copy, zero drops") {
    import org.apache.spark.sql.functions.col
    val docs = (0L until 400L).map(i => (s"d$i", if (i < 300) "a" else "b"))
      .toDF("id", "dom")
    val epochs = Seq(("a", 2.5), ("b", 0.0)).toDF("dom", "epochs")
    // join puts the domain key first: (dom, id, epoch_ix)
    val out = Curation.expandEpochs(docs, "dom", "id", epochs)
      .collect().map(r => (r.getString(1), r.getString(0), r.getInt(2)))
    assert(out.forall(_._2 == "a"), "epochs <= 0 drops the domain entirely")
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(perDoc.size === 300, "every doc of an admitted domain appears")
    assert(perDoc.values.forall(ixs => ixs == (0 until ixs.length)),
      "epoch_ix is contiguous from 0 per doc")
    val copies = perDoc.values.map(_.length).toSeq
    assert(copies.forall(c => c == 2 || c == 3), "floor(2.5)=2 plus at most one more")
    val three = copies.count(_ == 3)
    // frac = 0.5: expect ~150 of 300; binomial 3-sigma ≈ 26
    assert(three > 110 && three < 190, s"~half get the fractional copy, got $three")
    val again = Curation.expandEpochs(docs.repartition(7), "dom", "id", epochs)
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(again === out.map(t => (t._1, t._3)).toSet, "pure function of the id")
  }
}
