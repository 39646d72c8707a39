package graft.api

import org.apache.spark.sql.{Column, DataFrame}

import graft.core.{MetricConfig, ResolverSpec}
import graft.profile.DatasetProfileView

/** Top-level entry points mirroring the reference's `why.*` API surface
  * (`api/logger/__init__.py:42-157`): `log` → profile a DataFrame,
  * `logSegmented` → one profile per segment, `logMultiple` → several
  * datasets at once, plus read/write of profile binaries. Thin sugar
  * over [[Profiler]] / [[ProfileStore]] — each call is one Spark
  * aggregation job.
  */
object Graft {

  final case class ProfileResultSet(view: DatasetProfileView) {
    def merge(o: ProfileResultSet): ProfileResultSet = ProfileResultSet(view.merge(o.view))
  }

  final case class SegmentedResultSet(segments: Map[Seq[String], DatasetProfileView]) {
    /** Merge all segments into one dataset-level profile. */
    def merged: DatasetProfileView =
      segments.values.foldLeft(DatasetProfileView.empty)(_ merge _)
  }

  /** `why.log(df)`. */
  def log(df: DataFrame,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): ProfileResultSet =
    ProfileResultSet(new Profiler(config, resolver).profile(df))

  /** `why.log(multiple={...})` — profile several datasets, keyed results
    * (reference `api/logger/__init__.py:56-68`). */
  def logMultiple(dfs: Map[String, DataFrame],
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): Map[String, ProfileResultSet] =
    dfs.map { case (name, df) => name -> log(df, config, resolver) }

  /** Segmented logging (`segment_processing.py`): one profile per
    * stringified segment key, single shuffle. */
  def logSegmented(df: DataFrame, segmentColumns: Seq[String],
      filter: Option[Column] = None,
      config: MetricConfig = MetricConfig(),
      resolver: ResolverSpec = ResolverSpec.default): SegmentedResultSet =
    SegmentedResultSet(
      new Profiler(config, resolver).profileSegmented(df, segmentColumns, filter))

  /** `why.write` / `why.read` — local binary profile files. */
  def write(result: ProfileResultSet, path: String): Unit =
    graft.profile.ProfileSerde.writeTo(result.view, path)

  def read(path: String): ProfileResultSet =
    ProfileResultSet(graft.profile.ProfileSerde.readFrom(path))
}
