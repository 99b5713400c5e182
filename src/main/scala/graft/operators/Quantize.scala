package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension min/max) int8 quantization of embedding
  * columns — the memory lever for vector indexes at corpus scale: a
  * 64-dim float32 vector is 256 bytes, its uint8 codes are 64, so the
  * same cluster RAM holds a 4× larger searchable index (IVF cells,
  * ANN candidate pools). Asymmetric (min/max, not symmetric absmax):
  * embedding dims are rarely zero-centered after normalization.
  *
  * Plan shape: the stats pass is one tiny aggregation (dims × (min,
  * max) — 64 rows regardless of corpus size) that is broadcast back;
  * encoding is then a narrow per-row pass. Codes are
  * `floor((x − min) · 255 / (max − min))` clamped to [0, 255] —
  * deterministic across engines (identical IEEE ops on identical
  * doubles; floor agrees where double→int casts would not, see q39).
  * Constant dimensions (max = min) encode as 0.
  */
object Quantize {

  /** Per-dimension (d, mn, mx) stats table for an (id, v: array<double>)
    * frame — 1-based dimension index to match SQL array semantics. */
  def dimStats(vectors: DataFrame): DataFrame =
    vectors
      .select(posexplode(col("v")).as(Seq("d0", "x")))
      .select((col("d0") + 1).cast("long").as("d"), col("x"))
      .groupBy(col("d"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** uint8 code for one value given its dimension's range. */
  def code(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L))
      .otherwise(greatest(lit(0L), least(lit(255L),
        floor((x - mn) * 255.0 / (mx - mn)))))

  /** (id, d, code) long-form quantized table: explode + broadcast-join
    * the 64-row stats + narrow encode. (Long form keeps the encode
    * oracle-checkable; a production index would collect_list back to a
    * byte array per id — same dataflow.) */
  def encode(vectors: DataFrame, stats: DataFrame): DataFrame =
    vectors
      .select(col("id"), posexplode(col("v")).as(Seq("d0", "x")))
      .select(col("id"), (col("d0") + 1).cast("long").as("d"), col("x"))
      .join(broadcast(stats), Seq("d"))
      .select(col("id"), col("d"),
        code(col("x"), col("mn"), col("mx")).as("code"))

  /** Dequantized value for a code (bin lower edge + half step). */
  def dequantize(codeCol: Column, mn: Column, mx: Column): Column =
    when(mx === mn, mn)
      .otherwise(mn + (codeCol + 0.5) * (mx - mn) / 255.0)
}
