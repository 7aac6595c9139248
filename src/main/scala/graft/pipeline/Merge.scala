package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-writer-wins MERGE — the reference's single "query"
  * (O14): `INSERT … ON CONFLICT (shipment_id) DO UPDATE SET …`
  * (`cocoa_processing_dag.py:223-237`), i.e. last writer wins per key,
  * where "last" within one batch is the latest `processed_at` (ties
  * broken arbitrarily-but-deterministically).
  *
  * Implementation is two built-in operators — no custom Catalyst
  * needed (SURVEY.md §4):
  *
  *  1. within-batch dedup: `row_number()` over
  *     `partitionBy(key).orderBy(ord desc)` — one shuffle on the key;
  *  2. upsert: `target ANTI JOIN updates ON key` (keep target rows
  *     whose key is not updated) `UNION ALL` the deduped updates —
  *     semantically identical to a full-outer coalesce merge but
  *     cheaper: the anti join is a plain shuffled (or broadcast, when
  *     the update batch is small — AQE decides) hash join and the
  *     union is free.
  *
  * Scale: both steps shuffle on the merge key only. With a target
  * bucketed/pre-partitioned by key the anti join avoids re-shuffling
  * the big side; daily-batch-vs-100TB-target asymmetry makes the
  * broadcast-anti plan the expected one.
  */
object Merge {

  /** Keep exactly one row per key: the greatest by `ord`, then by
    * `tieBreakers` (all descending) so results are deterministic even
    * for equal-`ord` duplicates inside one batch. */
  def lastWriterWins(updates: DataFrame, key: String, ord: Column,
      tieBreakers: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy((ord.desc +: tieBreakers.map(_.desc)): _*)
    updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Align `df` to the authoritative column set by NAME: missing
    * columns fill with typed nulls (the additive-schema-evolution
    * contract — a batch written before a column existed merges with
    * nulls there), extra columns are dropped (the target schema is
    * authoritative; widening happens by reading the TARGET under the
    * widened schema, see [[Warehouse.read]]).
    *
    * Name matching follows the session's resolver
    * (`spark.sql.caseSensitive`, default case-INSENSITIVE) — an exact
    * `df.columns.contains` here would silently null-fill a column that
    * differs only in case while every other resolution path in the
    * query would have matched it, dropping the batch's data. A name
    * that matches more than one update column case-insensitively is
    * ambiguous and fails loudly. */
  private def alignTo(df: DataFrame, authoritative: org.apache.spark.sql.types.StructType): DataFrame = {
    val caseSensitive = df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def same(a: String, b: String) =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    df.select(authoritative.map { f =>
      df.columns.filter(same(_, f.name)) match {
        case Array() => lit(null).cast(f.dataType).as(f.name)
        case Array(one) => col(one).as(f.name)
        case many => throw new IllegalArgumentException(
          s"update columns ${many.mkString(", ")} all resolve to " +
            s"authoritative column '${f.name}' under the session's " +
            s"case-insensitive resolution")
      }
    }.toSeq: _*)
  }

  /** Upsert `updates` into `target` on `key`, last writer (by `ord`)
    * winning both within the batch and against the existing table.
    * Update columns align to the target's schema by name — missing
    * (pre-evolution) columns null-fill, extras drop ([[alignTo]]).
    *
    * `broadcastKeys = true` (default) broadcasts the deduped update
    * KEY SET into the anti join — the expected plan for the
    * batch-vs-warehouse asymmetry (a daily batch's key set is MBs
    * while the target is the 100 TB side; the big side then streams
    * with no shuffle). Pass false when a replayed mega-batch could
    * blow the driver's broadcast limit and let AQE decide instead. */
  def upsert(target: DataFrame, updates: DataFrame, key: String, ord: Column,
      tieBreakers: Seq[Column] = Seq.empty,
      broadcastKeys: Boolean = true): DataFrame = {
    val deduped = lastWriterWins(updates, key, ord, tieBreakers)
    val keys = deduped.select(col(key))
    target.join(if (broadcastKeys) broadcast(keys) else keys, Seq(key), "left_anti")
      .unionByName(alignTo(deduped, target.schema))
  }

  /** Order-based merge: the greatest-`ord` row wins across target AND
    * updates — one union + one keyed window (a single shuffle).
    * Unlike [[upsert]] (reference parity: the applied batch
    * unconditionally overwrites, like `ON CONFLICT DO UPDATE`), this
    * variant is commutative across batches and therefore the right
    * tool when batches can arrive out of order / late. */
  def mergeByOrd(target: DataFrame, updates: DataFrame, key: String, ord: Column,
      tieBreakers: Seq[Column] = Seq.empty): DataFrame =
    lastWriterWins(
      target.unionByName(alignTo(updates, target.schema)),
      key, ord, tieBreakers)

  /** The cocoa-specific instantiation: key = shipment_id, recency =
    * processed_at, deterministic tie-break on the event timestamp.
    * `broadcastKeys` reaches every pipeline entry (batch runBatch,
    * streaming foreachBatch) so a replay job feeding mega-batches can
    * opt out of the key-set broadcast and let AQE plan the anti join. */
  def upsertShipments(target: DataFrame, updates: DataFrame,
      broadcastKeys: Boolean = true): DataFrame =
    upsert(target, updates, CocoaSchema.mergeKey,
      col("processed_at"), Seq(col("timestamp")), broadcastKeys = broadcastKeys)
}
