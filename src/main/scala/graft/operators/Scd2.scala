package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — build VERSIONED dimension rows
  * (validity intervals) from a change stream, then resolve facts to
  * the version valid at their event time. The warehouse counterpart
  * of [[AsOfJoin]]: as-of answers "latest value at or before t" by
  * carrying values across a union; SCD2 MATERIALIZES the interval
  * table once so any number of fact scans join against it — the right
  * trade when the dimension is small relative to the facts (the
  * common case: user profiles vs events).
  *
  * Interval build: one window per key ordered by (ts, tiebreak) —
  * `vto` = next change's ts via `lead`, NULL for the open current
  * version. Two updates at the same ts make a zero-width [t, t)
  * interval that can never match — deterministic under the tiebreak.
  * Lookup: equi-join on the key (shuffle on key only) + the interval
  * predicate as a post-join filter; with few versions per key the
  * fan-out is bounded by version count, never |facts|·|versions|. */
object Scd2 {

  /** (key, attrs…, vfrom, vto): `vto` NULL = still current. `tieCol`
    * breaks equal-ts updates deterministically. `keepTie` stores the
    * tiebreak column too — required for a table that will be
    * incrementally maintained by [[applyChanges]] (rebuilding a key's
    * intervals needs the original per-update order, and equal-ts
    * updates are indistinguishable without it). */
  def versions(updates: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, attrs: Seq[String],
               keepTie: Boolean = false): DataFrame = {
    // order by the SAME cast-long value that is stored as vfrom — if
    // the window ordered by the raw tsCol, sub-unit timestamp
    // precision would order the build but be absent from the stored
    // interval, and applyChanges' rebuild-from-vfrom would diverge
    // from the one-shot build. Consequence: ts compares at long
    // precision; pre-convert upstream (e.g. unix_millis) when
    // sub-unit order matters.
    val tsL = col(tsCol).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(tsL, col(tieCol))
    val base = col(keyCol) +: attrs.map(col) :+
      tsL.as("vfrom") :+
      lead(tsL, 1).over(w).as("vto")
    updates.select((if (keepTie) base :+ col(tieCol) else base): _*)
  }

  /** Incremental SCD2 maintenance: fold a batch of new updates into an
    * existing versions table (built with `keepTie = true`), touching
    * ONLY the changed keys — the periodic dimension-maintenance job,
    * and the natural foreachBatch body for a streaming changelog.
    * Unchanged keys pass through as-is (anti-join slice, no window);
    * changed keys' intervals are rebuilt from their stored versions +
    * the new updates, so the windowed work is O(changed slice), never
    * O(dimension). Exactness (q90's oracle, Scd2Spec): because
    * intervals are a deterministic function of the per-key update
    * sequence and the tiebreak is stored,
    * `applyChanges(versions(u1), u2) == versions(u1 ∪ u2)` for ANY
    * split of the update stream, equal-ts ties included. */
  def applyChanges(current: DataFrame, updates: DataFrame, keyCol: String,
                   tsCol: String, tieCol: String,
                   attrs: Seq[String]): DataFrame = {
    // materialize the (small) changed-key set once — it drives both
    // the anti and the semi join, and recomputing it would re-scan
    // the updates batch and re-run the distinct shuffle twice
    val keys = updates.select(col(keyCol)).distinct().localCheckpoint()
    val untouched = current.join(keys, Seq(keyCol), "left_anti")
    val reconstructed = current.join(keys, Seq(keyCol), "left_semi")
      .select((col(keyCol) +: attrs.map(col) :+
        col("vfrom").as(tsCol) :+ col(tieCol)): _*)
    val fresh = updates.select((col(keyCol) +: attrs.map(col) :+
      col(tsCol).cast("long").as(tsCol) :+ col(tieCol)): _*)
    versions(reconstructed.unionByName(fresh), keyCol, tsCol, tieCol,
      attrs, keepTie = true)
      .unionByName(untouched)
  }

  /** Facts resolved to their point-in-time version: inner join, facts
    * before a key's first version drop (use a left join at the call
    * site when unresolved facts must survive). */
  def lookup(facts: DataFrame, versions: DataFrame, keyCol: String,
             factTs: Column): DataFrame =
    facts.join(versions, Seq(keyCol))
      .filter(factTs >= col("vfrom") &&
        (col("vto").isNull || factTs < col("vto")))
}
