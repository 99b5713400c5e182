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
    * breaks equal-ts updates deterministically. */
  def versions(updates: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    updates.select(
      (col(keyCol) +: attrs.map(col) :+
        col(tsCol).cast("long").as("vfrom") :+
        lead(col(tsCol).cast("long"), 1).over(w).as("vto")): _*)
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
