package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.core.DocOps
import graft.functions.GraftFunctions

/** A collection definition — the declarative part of the reference's
  * `Collection` model (reference: datagrowth/datatypes/documents/db/
  * collection.py:26-28): `identifier`/`referee` are `$`-paths (without
  * the `$.` prefix) into `properties` that stamp `identity`/`reference`.
  */
final case class CollectionSpec(
    name: String,
    identifier: Option[String] = None,
    referee: Option[String] = None)

/** Result struct of the upsert's merged-update application. Top-level
  * (not nested/private) so Janino-generated code can reach its
  * accessors — a `private` nested case class forces every evaluation
  * into interpreted mode ("Expr codegen error" fallback).
  */
final case class UpdateResult(properties: String, task_results: String,
                              derivatives: String, invalidated: Boolean)

/** Collection operators as distributed DataFrame transformations
  * (reference: collection.py). Scale notes: update/seed batches are
  * small (reference batch_size 100) and always broadcast; the target
  * documents frame is never shuffled or collected — upsert is two
  * broadcast joins + a union, add is a single pass.
  */
object CollectionOps {

  private val MaxIdentityLength = 255 // document.py:187-190

  /** `Collection.influence` (collection.py:344-357): stamp
    * identity/reference from the identifier/referee paths, identity
    * clipped to 255 chars (document.py:187-190).
    */
  def influence(df: DataFrame, spec: CollectionSpec): DataFrame = {
    val withIdentity = spec.identifier match {
      case Some(path) => df.withColumn("identity",
        substring(GraftFunctions.reach(col("properties"), "$." + path), 0, MaxIdentityLength))
      case None => df
    }
    spec.referee match {
      case Some(path) => withIdentity.withColumn("reference",
        GraftFunctions.reach(col("properties"), "$." + path))
      case None => withIdentity
    }
  }

  /** `Collection.add` (collection.py:103-184): dedupe the incoming batch
    * on canonical properties (the reference drops instances with
    * identical `__hash__`), influence, assign ids after the current max,
    * append. `reset` drops existing rows first. Distributed: additions
    * are deduped/id-stamped without driver collection; `maxId` is the
    * only action (an agg over the id column).
    */
  def add(existing: DataFrame, additions: DataFrame, spec: CollectionSpec,
          reset: Boolean = false, dedupe: Boolean = true): DataFrame = {
    val base = if (reset) existing.limit(0) else existing
    val maxId: Long = Option(base.agg(max(col("id"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    var batch = Documents.fromProperties(additions)
    if (dedupe) batch = batch.dropDuplicates("properties")
    batch = influence(batch, spec)
    batch = Documents.assignIds(batch, maxId)
    base.unionByName(batch)
  }

  /** `Collection.update_batches` (collection.py:211-269) — upsert by a
    * property value. Semantics preserved from the reference:
    *  - one update row may hit SEVERAL existing documents sharing the
    *    `by_property` value (multi-target);
    *  - several update rows for the same key apply in input order
    *    (successive `Document.update` = ordered shallow merges);
    *  - matched targets get task invalidation when a `$`-path task
    *    dependency value changes (document.py:85-92);
    *  - update rows whose key matches nothing become ADDITIONS (every
    *    source row separately, collection.py:257-263).
    *
    * Scale shape: the update batch is broadcast twice (merged-updates
    * join + anti-join key probe); the target frame streams through
    * without a shuffle.
    *
    * Same-key ORDER: by default, arrival order via
    * `monotonically_increasing_id` — PARTITION-LOCAL input order,
    * which matches the reference's list order for the single-partition
    * ≤100-row batches its contract describes, but is not guaranteed
    * for a multi-partition update frame whose partitioning isn't
    * deterministic. Callers who need airtight ordering at scale pass
    * `orderCol`: an explicit long-castable, NON-NULL column on the
    * update frame (a null order raises, naming the row — silently
    * sorting nulls first would reorder merges without a trace). */
  def upsert(target: DataFrame, updates: DataFrame, byProperty: String,
             spec: CollectionSpec, orderCol: Option[String] = None): DataFrame = {
    val spark = target.sparkSession
    import spark.implicits._
    val keyPath = "$." + byProperty

    // Updates with their per-key application order (see scaladoc).
    val uSrc = orderCol match {
      case Some(c) =>
        require(updates.columns.contains(c),
          s"upsert orderCol '$c' is not a column of the update frame")
        updates.withColumn("__ord",
          when(col(c).isNotNull, col(c).cast("long"))
            .otherwise(raise_error(concat(
              lit(s"upsert orderCol '$c' must be non-null; got null for "),
              col("properties")))))
      case None => updates.withColumn("__ord", monotonically_increasing_id())
    }
    val u = Documents.fromProperties(uSrc, keep = Seq("__ord"))
      .withColumn("__key", GraftFunctions.reach(col("properties"), keyPath))
      .filter(col("__key").isNotNull)

    // One merged update per key: ordered shallow merge of the batch.
    val mergeOrdered = udf { (props: Seq[Row]) =>
      props.sortBy(_.getLong(0)).map(_.getString(1))
        .reduceLeft((a, b) => DocOps.mergeShallow(a, b))
    }
    val mergedUpdates = u
      .groupBy(col("__key"))
      .agg(mergeOrdered(collect_list(struct(col("__ord"), col("properties")))).as("__upd"))

    val keyed = target.withColumn("__key",
      GraftFunctions.reach(col("properties"), keyPath))

    // Matched targets: apply the merged update (properties merge + task
    // invalidation + modified/pending stamps).
    val applyUpd = udf { (props: String, tasks: String, results: String, derivs: String, upd: String) =>
      val (p, r, d, inv) = DocOps.applyUpdate(props, tasks, results, derivs, upd)
      UpdateResult(p, r, d, inv)
    }
    val updated = keyed.join(broadcast(mergedUpdates), Seq("__key"), "inner")
      .withColumn("__res", applyUpd(col("properties"), col("tasks"),
        col("task_results"), col("derivatives"), col("__upd")))
      .withColumn("properties", col("__res.properties"))
      .withColumn("task_results", col("__res.task_results"))
      .withColumn("derivatives", col("__res.derivatives"))
      .withColumn("modified_at", current_timestamp())
      .withColumn("pending_at",
        when(col("__res.invalidated"), current_timestamp()).otherwise(col("pending_at")))
      .withColumn("finished_at",
        when(col("__res.invalidated"), lit(null).cast(TimestampType)).otherwise(col("finished_at")))
    val updatedDocs = influence(updated, spec).select(Documents.columns.map(col): _*)

    val untouched = keyed.join(broadcast(mergedUpdates.select("__key")), Seq("__key"), "left_anti")
      .select(Documents.columns.map(col): _*)

    // Additions: every update row whose key hit no existing doc.
    val targetKeys = keyed.select(col("__key")).distinct()
    val additionRows = u.join(targetKeys, Seq("__key"), "left_anti")
      .select(Documents.columns.map(col): _*)
    add(untouched.unionByName(updatedDocs), additionRows, spec, dedupe = false)
  }

  /** `Collection.group_by(key)` (collection.py:326-342): documents
    * grouped by a property value; every document must carry the key.
    * Returns (group value, member contents ordered by id).
    */
  def groupByProperty(df: DataFrame, key: String): DataFrame = {
    val value = GraftFunctions.reach(col("properties"), "$." + key)
    df.withColumn("__group", value)
      .withColumn("__content", Documents.contentCol(df))
      .groupBy(col("__group"))
      .agg(count(lit(1)).as("n_docs"),
        transform(array_sort(collect_list(struct(col("id"), col("__content")))),
          e => e.getField("__content")).as("contents"))
      .withColumnRenamed("__group", "group_value")
  }

  /** `Collection.split` (collection.py:289-308): randomized split with
    * EXACT ceil-sized test and validate sets taken off the top, the rest
    * train. Adds a `split` column. Distributed: global rank comes from
    * sortBy + zipWithIndex (no single-partition window).
    */
  def split(df: DataFrame, train: Double = 0.8, validate: Double = 0.1,
            test: Double = 0.1, seed: Long = 42L): DataFrame = {
    require(math.abs(train + validate + test - 1.0) < 1e-9,
      "Expected sum of train, validate and test to be 1")
    val spark = df.sparkSession
    val n = df.count()
    val testSize = math.ceil(n * test).toLong
    val validateSize = math.ceil(n * validate).toLong
    val shuffled = df.withColumn("__r", rand(seed))
    // one global sort only: .sort range-partitions and locally sorts
    // every partition itself, so a sortWithinPartitions before it is a
    // full wasted O(n log n) pass
    val ranked = shuffled
      .sort(col("__r")) // global range partitioning, stays distributed
      .rdd.zipWithIndex.map { case (row, ix) =>
        val label =
          if (ix < testSize) "test"
          else if (ix < testSize + validateSize) "validate"
          else "train"
        Row.fromSeq(row.toSeq :+ label)
      }
    spark.createDataFrame(ranked,
      StructType(shuffled.schema.fields :+ StructField("split", StringType, nullable = false)))
      .drop("__r")
  }

  /** `Collection.output(template)` (collection.py:310-324) — vectorized
    * template projection over all documents' content. */
  def output(df: DataFrame, templateJson: String, replacement: Char = '$'): DataFrame = {
    val content = Documents.contentCol(df)
    df.select(OutputTemplate.compileJson(content, templateJson, replacement).as("output"))
  }

  /** Content rows ordered by id (`Collection.content`, collection.py:271-278). */
  def content(df: DataFrame): DataFrame =
    df.orderBy(col("id")).select(Documents.contentCol(df).as("content"))
}
