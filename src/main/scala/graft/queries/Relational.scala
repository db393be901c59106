package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions

/** Relational operator coverage (SURVEY.md §2.2-§2.8) expressed as
  * oracle-checkable queries over the driver testdata.
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB):
  *  - every aggregate over DOUBLE goes through DECIMAL(18,4) so the sum is
  *    exact and order-independent, then casts back to DOUBLE — identical
  *    bits on both engines regardless of partitioning;
  *  - every result gets a deterministic ORDER BY on a unique key;
  *  - counts stay BIGINT, ranks are cast to BIGINT to match DuckDB;
  *  - timestamps are rendered as strings (engine-neutral).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact, order-independent sum of a double column, as double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 aggregation — TPC-H Q1 shape: scan → filter → hash agg.
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1997-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // the products are exactly 4-decimal (2dp price × 2dp
          // discount complement): rounding the sum to scale 4 is
          // lossless AND keeps the scaled integer below 2^53, where a
          // scale-8 decimal→double cast is no longer exact (DuckDB's
          // int128/1e8 conversion drifted 3e-7 at sf0.1 — caught by
          // the sf0.1 oracle gate)
          round(sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 4)))), 4)
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.2 projection + predicate pushdown to the parquet scan.
    "q2_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") >= 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // §2.3 join — 3-way equi-join with small-side broadcast + agg.
    "q3_join_agg" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val nation = broadcast(t(s, d, "nation"))
      orders.join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(nation, customer("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("n_name"))
    }),

    // §2.3 semi-join (annotations-for-collection shape).
    "q4_semi_join" -> ((s, d) => {
      val customer = t(s, d, "customer")
      val orders = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      customer.join(orders, Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // §2.3 anti-join (not-yet-annotated candidates shape). The price
    // filter keeps the result non-empty at all SFs (every customer has
    // *some* order in the testdata).
    "q5_anti_join" -> ((s, d) => {
      val customer = t(s, d, "customer")
      val orders = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      customer.join(orders, Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // §2.5 window — top-3 orders per customer (harvest-numbering shape).
    "q6_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // §2.6 global top-k with unique tiebreak.
    "q7_topk" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    }),

    // §2.7 set ops — EXCEPT (upsert "insert side" shape).
    "q8_except" -> ((s, d) => {
      val building = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bigSpenders = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      building.except(bigSpenders).orderBy(col("c_custkey"))
    }),

    // §2.7 set ops — INTERSECT.
    "q9_intersect" -> ((s, d) => {
      val building = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val withOrders = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      building.intersect(withOrders).orderBy(col("c_custkey"))
    }),

    // §2.9 generator/UDTF shape — explode tokens, aggregate.
    "q10_explode_tokens" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("token"))
    }),

    // §1.3 reach — JSON path extraction over the props column.
    "q11_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          GraftFunctions.reach(col("props"), "$.k").as("k_str"),
          GraftFunctions.reach(col("props"), "$.k").cast("long").as("k_num"))
        .orderBy(col("event_id"))
    }),

    // §2.10 event-time windowed aggregation (batch form).
    "q12_time_window" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    }),

    // §2.3 upsert/MERGE — full-outer join with update/insert/keep lanes
    // (Collection.update_batches shape, collection.py:186-269).
    "q13_upsert_merge" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val target = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("text"), col("lang"))
      val updates = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), concat(lit("updated:"), col("doc_id")).as("new_text"))
      target.join(updates, Seq("doc_id"), "full_outer")
        .select(
          col("doc_id"),
          coalesce(col("new_text"), col("text")).as("text_final"),
          when(col("text").isNotNull && col("new_text").isNotNull, "updated")
            .when(col("text").isNull, "inserted").otherwise("kept").as("op"))
        .orderBy(col("doc_id"))
    }),

    // §2.4 group_by → member list (Collection.group_by shape).
    "q14_group_collect" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",", sort_array(collect_list(col("doc_id")))).as("doc_ids"))
        .orderBy(col("lang"))
    }),

    // §2.4 conditional counts (evaluate_dataset_version shape, version.py:42-70).
    "q15_task_counts" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("success"),
          count(when(col("o_orderstatus") === "O", 1)).as("fail"),
          count(when(col("o_orderstatus") === "P", 1)).as("skipped"))
        .orderBy(col("o_orderpriority"))
    }),

    // §2.6 deterministic train/validate/test assignment (split shape —
    // the seeded-random variant is covered in CollectionOps specs).
    "q16_split_assign" -> ((s, d) => {
      t(s, d, "documents")
        .withColumn("split",
          when(col("doc_id") % 10 < 7, "train")
            .when(col("doc_id") % 10 < 9, "validate").otherwise("test"))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"))
    }),

    // §2.3/§2.4 fact-dim join + agg over part (brand revenue).
    "q17_brand_revenue" -> ((s, d) => {
      // (a post-scan repartition was measured NO better here: the
      // serial parquet decode dominates and the shuffle only added
      // its own cost — the single-row-group layout is the floor)
      val li = t(s, d, "lineitem")
      val part = broadcast(t(s, d, "part"))
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          // scale-4 rounded sum: see q1's sum_disc_price note
          round(sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 4)))), 4)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // §2.4 exact dedup by content hash (dedupe-on-add shape).
    "q18_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-12-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_discount > 0.05 AND l_quantity >= 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q6_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q7_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q8_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
        |ORDER BY c_custkey""".stripMargin,
    "q9_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q10_explode_tokens" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> '' GROUP BY token ORDER BY token""".stripMargin,
    "q11_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin,
    "q12_time_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    "q13_upsert_merge" ->
      """SELECT COALESCE(t.doc_id, u.doc_id) AS doc_id,
        |  COALESCE(u.new_text, t.text) AS text_final,
        |  CASE WHEN t.doc_id IS NOT NULL AND u.doc_id IS NOT NULL THEN 'updated'
        |       WHEN t.doc_id IS NULL THEN 'inserted' ELSE 'kept' END AS op
        |FROM (SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 <> 0) t
        |FULL OUTER JOIN (SELECT doc_id, 'updated:' || doc_id AS new_text
        |                 FROM documents WHERE doc_id % 2 = 0) u
        |ON t.doc_id = u.doc_id ORDER BY doc_id""".stripMargin,
    "q14_group_collect" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q15_task_counts" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS success,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS fail,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS skipped
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q16_split_assign" ->
      """SELECT CASE WHEN doc_id % 10 < 7 THEN 'train'
        |            WHEN doc_id % 10 < 9 THEN 'validate' ELSE 'test' END AS split,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "q17_brand_revenue" ->
      """SELECT p_brand,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q18_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin
  )
}
