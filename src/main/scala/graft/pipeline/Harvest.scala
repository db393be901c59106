package graft.pipeline

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

import graft.core.Configuration

/** The processor registry + harvest phases (reference: datagrowth/
  * processors/base.py:29-95 + registry scanning apps.py:23-48; harvest
  * usage tests/django_project/datatypes/models/dataset.py:49-55).
  * Processors register by name and are invoked by dotted
  * `"Class.method"` strings — preserving the reference's string-
  * configured pipeline property — but resolve to plain
  * `(DataFrame, Configuration) => DataFrame` transformations.
  */
object ProcessorRegistry {

  type Transform = (DataFrame, Configuration) => DataFrame

  private val processors = TrieMap[String, Transform]()

  def register(dotted: String)(fn: Transform): Unit = processors(dotted) = fn

  /** `ProcessorFactory.build_with_callable` (base.py:64-95): resolve a
    * `"Class.method"` string. */
  def resolve(dotted: String): Transform =
    processors.getOrElse(dotted,
      throw new IllegalArgumentException(s"Processor not registered: $dotted"))

  def contains(dotted: String): Boolean = processors.contains(dotted)
  def clear(): Unit = processors.clear()
}

/** One harvest phase: a processor reference + its config (the
  * reference's `ProcessorFactory` entries in HARVEST_PHASES). */
final case class HarvestPhase(processor: String, config: Configuration = Configuration())

object Harvest {

  /** Run `HARVEST_PHASES` as an ordered chain of DataFrame
    * transformations over the harvest output (the reference streams
    * document iterators through processor methods — e.g. the numbering
    * processor tests/django_project/processors/processors/output.py:
    * 16-39; here each stage is a distributed transformation).
    */
  def run(docs: DataFrame, phases: Seq[HarvestPhase]): DataFrame =
    phases.foldLeft(docs) { (df, phase) =>
      ProcessorRegistry.resolve(phase.processor)(df, phase.config)
    }
}
