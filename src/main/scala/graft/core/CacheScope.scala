package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Tracks the intermediate `.cache()` handles an operator creates
  * while assembling its plan, so the operator can materialize its
  * (compact) result once and release every intermediate in one place.
  *
  * Contract adopted by the pair-generating operators in
  * [[graft.operators.Dedup]] / [[graft.operators.Similarity]]: the
  * heavyweight intermediates (sketch artifacts, posting lists, bucket
  * streams) are pinned into a scope; the final result is sealed via
  * [[sealResult]] — cached, eagerly materialized (so the
  * intermediates serve every consumer exactly once), then all
  * intermediates are unpersisted. The caller receives ONE cached
  * handle — the result itself — and owns its lifecycle
  * (`result.unpersist()` when done, or the session-wide
  * `spark.catalog.clearCache()` Verify/Bench already run between
  * jobs). Long-lived sessions composing several operators no longer
  * accrete hidden cache entries per invocation.
  */
final class CacheScope {
  private val handles = ArrayBuffer.empty[DataFrame]

  /** Cache `df` and remember the handle for release at seal time. */
  def pin(df: DataFrame): DataFrame = { handles += df; df.cache() }

  /** Cache + materialize `result`, then unpersist every pinned
    * intermediate. The returned (cached) frame is the one handle the
    * caller owns. */
  def sealResult(result: DataFrame): DataFrame = {
    val out = result.cache()
    out.count()
    release()
    out
  }

  /** Unpersist every pinned intermediate WITHOUT materializing a
    * result. Only correct when everything derived from the pins has
    * already been materialized (e.g. connectedComponents returns a
    * fully-materialized frame) — releasing under a still-lazy
    * consumer silently reverts the pins to recompute-per-consumer. */
  def release(): Unit = {
    handles.foreach(_.unpersist())
    handles.clear()
  }
}
