package graft.model

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Dataset dump/load (reference: `Dataset.to_file`/`from_file`,
  * datasets/db/dataset.py:380-465 + utils/io.py:204-227, and
  * `Collection.to_file`, collection.py:359-361): whole datasets
  * round-trip as JSON-lines per entity plus a tiny manifest. Spark shape:
  * `df.write.json` — distributed, no driver collection; `from_file`
  * re-reads and (in `replace` mode) substitutes the target frame.
  */
object DumpIO {

  /** `Collection.to_file`: all collection CONTENT as a JSON array file
    * (driver-side single file — the reference writes one local file; use
    * [[dumpDocuments]] for the distributed form). */
  def collectionContentToFile(docs: DataFrame, path: String): Unit = {
    val contents = docs.orderBy(col("id"))
      .select(Documents.contentCol(docs).as("c"))
      .collect().map(_.getString(0))
    Files.writeString(Paths.get(path), contents.mkString("[", ", ", "]"))
  }

  /** Distributed dump: the full document frame as JSON lines under
    * `dir/documents/`. Timestamps render ISO; properties and the other
    * JSON-string columns stay verbatim. */
  def dumpDocuments(docs: DataFrame, dir: String): Unit =
    docs.write.mode("overwrite").json(s"$dir/documents")

  /** Reload a dump. `replace=true` drops the current frame (the
    * reference's delete-then-insert, dataset.py:392-465); otherwise the
    * dump upserts into the existing frame by identity. */
  def loadDocuments(spark: SparkSession, dir: String, current: Option[DataFrame] = None,
                    replace: Boolean = true, spec: CollectionSpec = CollectionSpec("load")): DataFrame = {
    val raw = spark.read.schema(Documents.schema).json(s"$dir/documents")
    current match {
      case Some(df) if !replace =>
        CollectionOps.upsert(df, raw.drop("id"), spec.identifier.getOrElse("id"), spec)
      case _ => raw
    }
  }

  /** Snapshot delta — what changed between two dataset versions (the
    * audit step of the reference's grow → promote lifecycle): one row
    * per id with status `added` (only in `next`), `removed` (only in
    * `prev`), `changed` (both, any compare column differs) or
    * `unchanged`. Rows compare by an md5 of their compare columns
    * (null-safe: U+0000 sentinel, U+0001 separator — engine-portable),
    * so wide payloads diff without shipping both copies past the join.
    * One full-outer shuffle join on the id; both sides reduce to
    * (id, hash) before it. `idCol` must be unique per snapshot (the
    * collection identifier contract) — duplicate ids would
    * cross-multiply through the outer join. */
  def diffSnapshots(prev: DataFrame, next: DataFrame, idCol: String,
                    compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    def keyed(df: DataFrame, hashName: String) =
      df.select(col(idCol).as("id"),
        md5(concat_ws("\u0001", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(hashName))
    keyed(prev, "__hp").join(keyed(next, "__hn"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__hp").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__hp") =!= col("__hn"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Resource-cache dump/load (management/commands/dump_resource.py:
    * 209-222 / load_resource.py:185-200). */
  def dumpResources(cache: DataFrame, dir: String): Unit =
    cache.write.mode("overwrite").json(s"$dir/resources")

  def loadResources(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(graft.sources.Resources.schema).json(s"$dir/resources")
}
