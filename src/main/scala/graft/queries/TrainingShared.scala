package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Helpers shared by the TrainingData domain files (split from the
  * monolithic TrainingData object in round 10): the table loader, the
  * planted-document fixtures, and the oracle-SQL building blocks. The
  * object is package-private — the public query surface stays
  * [[TrainingData.queries]] / [[TrainingData.oracles]]. */
private[queries] object TrainingShared {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Session-width round-robin repartition, gated on the scan actually
    * being NARROWER than the session (r16; one policy for every
    * "repartition before the kernel" accommodation in the query files).
    *
    * The testdata parquet is one row group per table, so locally every
    * kernel-dense first stage (shingle/minhash/BPE/regex/decode
    * explodes) would run serially on 1 of 32 cores without this — the
    * r15 "q130 doctrine". But an UNCONDITIONAL round-robin repartition
    * is a full extra shuffle of the text/bytes column: at 100 TB that
    * is a 100 TB shuffle write+read before any kernel runs, paid even
    * though a real table scans as thousands of splits already wider
    * than the session. So the repartition fires only when the scan's
    * planned partition count is materially below the session width
    * (≤ half of defaultParallelism); naturally-split inputs pass
    * through shuffle-free. The partition probe plans the (scan-only)
    * physical plan once — metadata work, no job. */
  def widenScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  /** [[widenScan]] as a chainable method — the call sites read as the
    * repartitions they replace. */
  implicit class WidenOps(private val df: DataFrame) {
    def widenedScan: DataFrame = widenScan(df)
  }

  /** Planted CJK documents for q47 — the regression fixture for the
    * CJK-aware tokenizer: a whitespace-only tokenizer sees each of these
    * as word_count ≈ 1 and `gopherMetrics.keep` silently discards whole
    * languages. Ids sit far above the parquet id range.
    *  - 1000001/1000002: Chinese near-dup pair (Thousand Character
    *    Classic opening — 40 DISTINCT Han chars; 1000002 appends one
    *    char, so trigram Jaccard = 38/39 ≈ 0.974);
    *  - 1000003: Japanese (iroha — all-distinct hiragana);
    *  - 1000004: Thai consonants (no word delimiters in Thai script);
    *  - 1000005: mixed Latin + Han tokenization;
    *  - 1000006: Korean (space-delimited Hangul — tokenizes by word,
    *    identifies by script). */
  /** Planted cross-source mirror documents for q121 — the synthetic
    * corpus has natural exact cross-source duplicates only at sf0.1,
    * so the dup matrix plants a known overlap pattern at every SF:
    * "mirror one" lives in mirror_a/b/c, "mirror two" in mirror_a/b,
    * and one unique text anchors mirror_c. Sources sit outside the
    * parquet source names (src0..src19). Expected planted pairs:
    * (a,b)=2 shared texts, (a,c)=1, (b,c)=1. */
  val MirrorDocs: Seq[(String, String)] = Seq(
    "mirror_a" -> "planted mirror text one crawled from several feeds verbatim",
    "mirror_b" -> "planted mirror text one crawled from several feeds verbatim",
    "mirror_c" -> "planted mirror text one crawled from several feeds verbatim",
    "mirror_a" -> "planted mirror text two syndicated article body here",
    "mirror_b" -> "planted mirror text two syndicated article body here",
    "mirror_c" -> "a unique anchor document only mirror c carries")
  def mirrorValuesSql: String =
    MirrorDocs.map { case (src, tx) => s"('$src', '$tx')" }.mkString(", ")

  /** [[graft.ops.ImageHash.fixtureGray]]'s un-perturbed pixel value as
    * DuckDB SQL over generate_series aliases x.x / y.y — one definition
    * shared by the q130/q131 oracles so the arithmetic cannot drift
    * from itself. */
  def fixtureGraySql(id: String): String =
    s"(($id % 97 + 1)*x.x*x.x + ($id % 89 + 2)*y.y*y.y + ($id % 83 + 3)*x.x*y.y" +
      s" + (($id // 97) % 101)*x.x + (($id // 89) % 103)*y.y) % 256"

  /** [[graft.ops.AudioHash.fixtureAmp]]'s PRE-SCALE frame value as
    * DuckDB SQL over a generate_series alias f.f — the q132/q133
    * oracles apply the perturbation CASE and the ×31 amplitude scale
    * on top (the scale never changes a comparison). */
  def fixtureAmpBaseSql(id: String): String =
    s"(($id % 97 + 1)*f.f*f.f + ($id % 89 + 2)*f.f*f.f*f.f" +
      s" + (($id // 97) % 101)*f.f) % 251"

  val CjkIdBase = 1000000L
  val CjkDocs: Seq[(Long, String)] = Seq(
    1000001L -> "天地玄黄宇宙洪荒日月盈昃辰宿列张寒来暑往秋收冬藏闰余成岁律吕调阳云腾致雨露结为霜",
    1000002L -> "天地玄黄宇宙洪荒日月盈昃辰宿列张寒来暑往秋收冬藏闰余成岁律吕调阳云腾致雨露结为霜金",
    1000003L -> "いろはにほへとちりぬるをわかよたれそつねならむ",
    1000004L -> "กขคงจฉชซญดตถทธนบปผฝพฟภมยรลวสหอ",
    1000005L -> "mixed script doc 机器学习 data 模型",
    1000006L -> "한국어 텍스트 처리 시스템 테스트 문서 예제 데이터")
  def cjkValuesSql: String =
    CjkDocs.map { case (id, text) => s"($id::BIGINT, '$text')" }.mkString(", ")



  // THE tokenizer's oracle twin (graft.functions.Tokenize): space-pad
  // Han/Hiragana/Katakana/Thai code points, split on ASCII \s + U+3000.
  // Identity on the ASCII test corpus — q19-q46 hashes are unchanged.
  val tokensSql =
    """list_filter(regexp_split_to_array(regexp_replace(text,
      | '([\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}])', ' \1 ', 'g'),
      | '[\s　]+'), tk -> tk <> '')""".stripMargin.replace("\n", "")

  /** SRP plane p as a DOUBLE list over the dims of `v` — component d =
    * first 8 md5 hex chars of "p|d" as u32, mod 1e6, into [-0.5, 0.5);
    * identical to Similarity.planeComponent. */
  def srpPlaneSql(p: Int): String =
    s"list_transform(range(len(v)), d -> ((('0x' || substr(md5('$p|' || d::VARCHAR), 1, 8))::UBIGINT % 1000000)::DOUBLE / 1000000 - 0.5))"

  /** Packed SRP bucket key over `planes` hyperplanes (sign bits) at a
    * plane-family offset — the SQL twin of Similarity.srpBucket.
    * `list_dot_product` accumulates left-to-right like Spark's
    * `aggregate(zip_with(...))`. */
  def srpBucketSql(planes: Int, planeOffset: Int = 0): String =
    (0 until planes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${srpPlaneSql(planeOffset + p)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
  /** q87's oracle: every BPE round replayed verbatim — pair counts
    * from a struct unnest over the split symbol string, a 1-row argmax
    * (count DESC, l, r), and the same sentinel `replace`. `v_i` /
    * `w_i` are MATERIALIZED: each is referenced twice (by `p_{i+1}`
    * and `v_{i+1}`) and DuckDB's default inlining would otherwise
    * recompute the whole chain exponentially (the q79 lesson). An
    * exhausted round (no pair ≥ minCount) empties every later CTE, so
    * the UNION shrinks exactly like the engine's early stop. */
  def bpeOracleSql(k: Int, minCount: Long): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH tok AS (SELECT unnest($tokensSql) AS w FROM documents),
wc AS (SELECT w, count(*) AS cnt FROM tok WHERE NOT contains(w, chr(1)) GROUP BY w),
v0 AS MATERIALIZED (SELECT chr(1) || array_to_string(list_append(regexp_split_to_array(w,''),'</w>'), chr(1)||chr(1)) || chr(1) AS st, cnt FROM wc)""")
    for (i <- 1 to k) sb.append(s""",
p$i AS (
  SELECT s.l AS l, s.r AS r, sum(cnt)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(len(sy)-1), j -> {'l': sy[j+1], 'r': sy[j+2]})) AS s, cnt
    FROM (SELECT string_split(trim(st, chr(1)), chr(1)||chr(1)) AS sy, cnt FROM v${i - 1}))
  GROUP BY l, r),
w$i AS MATERIALIZED (SELECT l, r, c FROM p$i WHERE c >= $minCount ORDER BY c DESC, l, r LIMIT 1),
v$i AS MATERIALIZED (SELECT replace(st, chr(1)||l||chr(1)||chr(1)||r||chr(1), chr(1)||l||r||chr(1)) AS st, cnt
        FROM v${i - 1} CROSS JOIN w$i)""")
    val union = (1 to k).map(i =>
      s"SELECT ${i - 1}::BIGINT AS rank, l AS lhs, r AS rhs, l||r AS merged, c AS pair_count FROM w$i")
      .mkString("\nUNION ALL ")
    sb.append(s"\nSELECT * FROM (\n$union) ORDER BY rank")
    sb.toString
  }

  /** q92's oracle: the q87 training replay extended one step — the
    * FINAL vocab state's symbols, unnested and weighted by word count.
    * The Spark side segments with the independent applier
    * (Bpe.subwordTokens), so the hash compare pins applier ≡ trainer. */
  def bpeApplyOracleSql(k: Int, minCount: Long): String = {
    val base = bpeOracleSql(k, minCount)
    // keep the CTE chain, swap the final merge-table SELECT for the
    // final-state token counts
    val cteEnd = base.lastIndexOf("\nSELECT * FROM (")
    base.substring(0, cteEnd) +
      s"""
         |SELECT sym AS token, sum(cnt)::BIGINT AS n FROM (
         |  SELECT unnest(string_split(trim(st, chr(1)), chr(1)||chr(1))) AS sym, cnt
         |  FROM v$k)
         |GROUP BY sym ORDER BY token""".stripMargin
  }

  /** q96's oracle: the q87 replay with the WORD carried through the
    * chain (the final state then maps word → symbol list directly —
    * no string surgery to recover the word), a frequency-ranked vocab
    * id table, and per-doc id sequences hashed in (word ix, symbol ix)
    * order — the exact order the engine's flattened applier emits. */
  def bpeDocIdsOracleSql(k: Int, minCount: Long): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH tok AS (SELECT unnest($tokensSql) AS w FROM documents),
wc AS (SELECT w, count(*) AS cnt FROM tok WHERE NOT contains(w, chr(1)) GROUP BY w),
v0 AS MATERIALIZED (SELECT w, chr(1) || array_to_string(list_append(regexp_split_to_array(w,''),'</w>'), chr(1)||chr(1)) || chr(1) AS st, cnt FROM wc)""")
    for (i <- 1 to k) sb.append(s""",
p$i AS (
  SELECT s.l AS l, s.r AS r, sum(cnt)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(len(sy)-1), j -> {'l': sy[j+1], 'r': sy[j+2]})) AS s, cnt
    FROM (SELECT string_split(trim(st, chr(1)), chr(1)||chr(1)) AS sy, cnt FROM v${i - 1}))
  GROUP BY l, r),
w$i AS MATERIALIZED (SELECT l, r, c FROM p$i WHERE c >= $minCount ORDER BY c DESC, l, r LIMIT 1),
v$i AS MATERIALIZED (SELECT w, replace(st, chr(1)||l||chr(1)||chr(1)||r||chr(1), chr(1)||l||r||chr(1)) AS st, cnt
        FROM v${i - 1} CROSS JOIN w$i)""")
    sb.append(s""",
wmap AS MATERIALIZED (
  SELECT w, string_split(trim(st, chr(1)), chr(1)||chr(1)) AS sy FROM v$k),
vc AS (SELECT sym AS token, sum(cnt)::BIGINT AS n FROM (
    SELECT unnest(m.sy) AS sym, cnt FROM wmap m JOIN wc USING (w))
  GROUP BY sym),
vid AS (SELECT token,
    (row_number() OVER (ORDER BY n DESC, token) - 1)::BIGINT AS token_id FROM vc),
dt AS (SELECT doc_id, unnest($tokensSql) AS tk,
    generate_subscripts($tokensSql, 1) AS wix FROM documents),
seq AS (
  SELECT d.doc_id, d.wix, generate_subscripts(m.sy, 1) AS six,
    unnest(m.sy) AS token
  FROM dt d JOIN wmap m ON d.tk = m.w),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
    md5(string_agg(token_id::VARCHAR, ' ' ORDER BY wix, six)) AS ids_hash
  FROM seq JOIN vid USING (token) GROUP BY doc_id)
SELECT doc_id, COALESCE(n_tokens, 0)::BIGINT AS n_tokens, ids_hash
FROM documents LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")
    sb.toString
  }

  /** SQL twin of Selection.mortonKey's magic-mask bit spread (16 → 32
    * bits, value in the even bit positions). Textually nested — ~500
    * chars per spread, constant-folded by the oracle engine. */
  def spreadSql(c: String): String = {
    val m = s"($c & 65535)"
    val a = s"(($m | ($m << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val d = s"(($b | ($b << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  def shinglesSql(alias: String) =
    s"""(SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(len($tokensSql)-2),
       |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
       |  FROM documents)) $alias""".stripMargin

  /** SQL twin of graft.functions.PctNorm (RFC 3986 §6.2.2): tokenize
    * on `%XX` escape | bare `%` | percent-free run, decode escapes of
    * UNRESERVED characters (ALPHA / DIGIT / - . _ ~), uppercase the
    * hex of every other escape, rejoin. The hex value is computed
    * arithmetically (strpos into the hex alphabet) so the replay
    * needs no blob casts; the code expression is repeated textually
    * per branch — constant work for the oracle engine, rule-for-rule
    * legibility for the reader. */
  def pctNormSql(col: String): String = {
    def code = "((strpos('0123456789abcdef', substr(lower(t), 2, 1)) - 1) * 16" +
      " + strpos('0123456789abcdef', substr(lower(t), 3, 1)) - 1)"
    s"""array_to_string(list_transform(
       |      regexp_extract_all($col, '%[0-9A-Fa-f]{2}|%|[^%]+'),
       |      t -> CASE
       |        WHEN NOT (starts_with(t, '%') AND length(t) = 3) THEN t
       |        WHEN $code BETWEEN 48 AND 57 OR $code BETWEEN 65 AND 90
       |          OR $code BETWEEN 97 AND 122 OR $code IN (45, 46, 95, 126)
       |          THEN chr(($code)::INT)
       |        ELSE '%' || upper(substr(t, 2, 2)) END), '')""".stripMargin
  }
}
