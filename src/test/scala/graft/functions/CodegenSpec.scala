package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the codegen property of the native-expression family: the hot
  * kernels must live INSIDE a whole-stage codegen span (a
  * CodegenFallback expression severs the span and drops the projection
  * into interpreted evaluation — a silent 2-5× regression if it ever
  * comes back), and the generated code must actually COMPILE and
  * produce correct values: every frame here is executed with
  * `spark.sql.codegen.fallback=false`, so a Janino failure in any
  * doGenCode fails the test instead of silently reverting to
  * interpreted evaluation. Frames build on `spark.range`: a local
  * relation would be constant-folded by ConvertToLocalRelation before
  * any codegen.
  */
class CodegenSpec extends SparkTestBase {
  import spark.implicits._

  private def withStrictCodegen[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  /** Assert the marker expression sits in a whole-stage span AND run the
    * frame through the generated path, returning the rows. */
  private def spanRows(df: org.apache.spark.sql.DataFrame, marker: String)
      : Array[org.apache.spark.sql.Row] = withStrictCodegen {
    assert(df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.toString.contains(marker) => w
    }.nonEmpty, s"$marker not inside a WholeStageCodegen span:\n" +
      df.queryExecution.executedPlan)
    df.collect()
  }

  private def textFrame = spark.range(4)
    .select($"id", concat(lit("alpha beta gamma delta w"), $"id".cast("string")).as("text"))

  test("string kernels compile and run inside whole-stage codegen spans") {
    val toks = spanRows(textFrame.select(call_function("graft_tokens", $"text")), "graft_tokens")
    assert(toks(0).getSeq[String](0).take(2) === Seq("alpha", "beta"))
    val sh = spanRows(
      textFrame.select(call_function("graft_shingles", $"text", lit(3))), "graft_shingles")
    assert(sh(0).getSeq[String](0).head === "alpha beta gamma")
    spanRows(textFrame.select(call_function("graft_simhash", $"text")), "graft_simhash")
    val cdc = spanRows(textFrame.select(
      call_function("graft_cdc_chunks", $"text", lit(4), lit(8)).as("c")),
      "graft_cdc_chunks")
    assert(cdc(0).getSeq[String](0).mkString === "alpha beta gamma delta w0",
      "chunks concatenate to the input through the generated path")
    // script counts: column-dependent CJK text through the generated path
    val cjk = spark.range(2).select($"id",
      concat(lit("mixed 机器 ひらが ไทย 한글 x"), $"id".cast("string")).as("text"))
    val sc = spanRows(
      cjk.select(call_function("graft_script_counts", $"text")), "graft_script_counts")
    assert(sc(0).getSeq[Int](0) === Seq(3, 2, 3, 2), "kana/hangul/thai/han counts")
    // script_lang: non-null (kana precedence) and NULL (Latin) both
    // propagate through the generated path
    val langFrame = spark.range(2).select($"id",
      when($"id" === 0, lit("ひらがな混じり 汉字 text")).otherwise(lit("plain latin text")).as("text"))
    val sl = spanRows(langFrame.select($"id",
      call_function("graft_script_lang", $"text", lit(3)).as("l")), "graft_script_lang")
      .sortBy(_.getLong(0))
    assert(sl(0).getString(1) === "ja")
    assert(sl(1).isNullAt(1), "below-threshold text must be NULL for the profile fallback")
    val mh = spanRows(
      textFrame.select(call_function("graft_minhash", $"text", lit(4), lit(2))), "graft_minhash")
    assert(mh(0).getSeq[String](0).length === 4)
    // minhash NULL (no shingles) propagates through the generated path
    val shortDoc = spark.range(1).select(lit("one").as("text"))
    val nullSig = spanRows(
      shortDoc.select(call_function("graft_minhash", $"text", lit(4), lit(2))), "graft_minhash")
    assert(nullSig(0).isNullAt(0), "short doc must yield a NULL signature")
  }

  test("similarity kernels compile and run inside whole-stage codegen spans") {
    val vecs = spark.range(4).select($"id",
      array($"id".cast("float"), lit(1f)).as("a"),
      array(lit(0.5f), $"id".cast("float")).as("b"))
    val dots = spanRows(
      vecs.select($"id", call_function("graft_float_dot", $"a", $"b")), "graft_float_dot")
    assert(dots.find(_.getLong(0) == 2L).get.getDouble(1) === 2 * 0.5 + 1 * 2.0)
    spanRows(vecs.select(call_function("graft_srp_bucket", $"a", lit(4), lit(0))),
      "graft_srp_bucket")
    val codes = spark.range(4).select($"id",
      array($"id".cast("byte"), lit(2).cast("byte")).as("a"),
      array(lit(3).cast("byte"), $"id".cast("byte")).as("b"))
    val idots = spanRows(
      codes.select($"id", call_function("graft_int8_dot", $"a", $"b")), "graft_int8_dot")
    assert(idots.find(_.getLong(0) == 2L).get.getLong(1) === 2 * 3 + 2 * 2)
    // pairs kernel through the generated path (the array must depend on
    // a column or constant folding evaluates it before codegen)
    val pairs = spanRows(spark.range(1)
      .select(array($"id", lit(5L), lit(9L)).as("ids"))
      .select(call_function("graft_pairs", $"ids").as("p")), "graft_pairs")
    assert(pairs(0).getSeq[org.apache.spark.sql.Row](0).length === 3)
    // in-group cosine verification through the generated path: members
    // 0 and 5 are parallel (cosine 1), 9 is orthogonal
    val cp = spanRows(spark.range(1)
      .select(array(
        struct($"id".as("id"), array(lit(1f), lit(0f)).as("emb")),
        struct(lit(5L).as("id"), array(lit(2f), lit(0f)).as("emb")),
        struct(lit(9L).as("id"), array(lit(0f), lit(3f)).as("emb"))).as("members"))
      .select(call_function("graft_cosine_pairs", $"members", lit(0.9)).as("p")),
      "graft_cosine_pairs")
    val survivors = cp(0).getSeq[org.apache.spark.sql.Row](0)
    assert(survivors.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ===
      Seq((0L, 5L, 1.0)), "only the parallel pair survives, scored 1.0")
  }

  test("reach family compiles, runs, and null-propagates through generated code") {
    val js = spark.range(2).select($"id",
      when($"id" === 0, lit("""{"a":1,"arr":[1,2]}""")).otherwise(lit("""{"b":2}""")).as("json"))
    val reached = js.select($"id", call_function("graft_reach", $"json", lit("$.a")).as("v"))
    val rows = spanRows(reached, "graft_reach").sortBy(_.getLong(0))
    assert(rows(0).getString(1) === "1")
    assert(rows(1).isNullAt(1), "missing path must be NULL through the generated path")
    val arr = spanRows(js.select($"id",
      call_function("graft_reach_array", $"json", lit("$.arr")).as("v")), "graft_reach_array")
      .sortBy(_.getLong(0))
    assert(arr(0).getSeq[String](1) === Seq("1", "2"))
    assert(arr(1).isNullAt(1))
  }

  test("JSON-document expressions honor independent child nulls through generated code") {
    // id 0: left only; id 1: both null; id 2: right only; id 3: both
    val frames = spark.range(4).select($"id",
      when($"id" === 0 || $"id" === 3, lit("""{"x":1}""")).as("left"),
      when($"id" === 2 || $"id" === 3, lit("""{"y":2}""")).as("right"))
    // json_merge: one-sided null still merges; both-null is NULL
    val merged = spanRows(frames.select($"id",
      call_function("graft_json_merge", $"left", $"right").as("m")), "graft_json_merge")
      .sortBy(_.getLong(0)).map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(merged(0).contains("\"x\":1") && !merged(0).contains("y"),
      s"left-only merge must keep left: ${merged(0)}")
    assert(merged(1) === null, "both-null must be NULL")
    assert(merged(2).contains("\"y\":2"), s"right-only merge must keep right: ${merged(2)}")
    assert(merged(3).contains("\"x\":1") && merged(3).contains("\"y\":2"), merged(3))
    // doc_content: null id renders "_id": null; null properties → NULL
    val docs = spark.range(2).select(
      when($"id" === 0, lit("""{"t":"v"}""")).as("properties"),
      lit(null).cast("string").as("derivatives"),
      lit(null).cast("long").as("doc_id"))
    val content = spanRows(docs.select(call_function("graft_doc_content",
      $"properties", $"derivatives", $"doc_id").as("c")), "graft_doc_content")
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(content.exists(c => c != null && c.contains("\"_id\":null")),
      s"null id must render _id: null, got ${content.mkString("|")}")
    assert(content.contains(null), "null properties must yield NULL content")
  }

  test("expression parameter guards refuse bad constructions with NAMED errors") {
    import org.apache.spark.sql.AnalysisException
    // graft_minhash k=0 used to die as a bare ArrayIndexOutOfBounds
    val mh = intercept[Exception] {
      spark.range(1).select(call_function("graft_minhash",
        lit("alpha beta gamma"), lit(0), lit(2))).collect()
    }
    assert(mh.getMessage.contains("graft_minhash k must be >= 1"),
      s"got: ${mh.getMessage}")
    // graft_srp_bucket planes=65 would alias onto plane 1 (mod-64 shift)
    val srp = intercept[Exception] {
      spark.range(1).select(call_function("graft_srp_bucket",
        array(lit(1f), lit(2f)), lit(65), lit(0))).collect()
    }
    assert(srp.getMessage.contains("planes must be in [1, 63]"),
      s"got: ${srp.getMessage}")
    // graft_ivf_nearest with array<int> cids would read garbage through
    // ArrayData.getLong — refused at analysis
    val ivf = intercept[AnalysisException] {
      spark.range(1).select(call_function("graft_ivf_nearest",
        array(lit(1f), lit(2f)), lit(1),
        array(lit(1), lit(2)),
        array(array(lit(1f), lit(0f)), array(lit(0f), lit(1f))))).collect()
    }
    assert(ivf.getMessage.contains("array<bigint>"), s"got: ${ivf.getMessage}")
  }
}
