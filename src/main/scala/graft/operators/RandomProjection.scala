package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signed random projection (Achlioptas 2003 / the sign variant of
  * Johnson–Lindenstrauss): reduce a d-dim embedding to `outDims`
  * components, each the ±1-signed sum of the input coordinates,
  *
  *   proj_j(x) = Σ_i sign(i,j) · ⌊xᵢ·10⁶⌋            (BIGINT),
  *
  * with the sign matrix DERANDOMIZED — sign(i,j) = +1 iff the first
  * hex nibble of md5("rp:j:i") is below '8' — so every engine and
  * every run derives the same matrix from nothing but (i, j). The
  * inputs are quantized to fixed point BEFORE the fold, so the sum is
  * exact integer arithmetic: order-invariant, partitioning-invariant,
  * oracle-checkable (a double fold would differ in the last ulp per
  * accumulation order).
  *
  * Two physical shapes for the same math (parity spec-asserted):
  *
  *  - [[projectFp]]: explode × broadcast-sign-table join × re-group —
  *    the declarative form an oracle can replay; costs one shuffle of
  *    N·outDims rows.
  *  - [[projectFpInline]]: the sign matrix baked into the expression
  *    as outDims literal arrays, folded per row with zip_with /
  *    aggregate — NO shuffle, NO join, map-only. This is the 100 TB
  *    path: projection happens inside the scan, the way a production
  *    dimensionality-reduction pass should.
  */
object RandomProjection {

  /** The derandomized sign for matrix cell (i, j), i 1-based input
    * dim, j 0-based output dim — driver-side twin of the md5 the
    * DataFrame variants use (byte-identical inputs ⇒ same matrix). */
  def signAt(i: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8"))
    // first hex nibble < 8 ⇔ high bit of the first byte clear
    if ((d(0) & 0x80) == 0) 1L else -1L
  }

  /** The sign matrix as a (i, j, sign) frame — generated, never
    * stored: outDims·dims rows from a range. */
  def signMatrix(spark: SparkSession, dims: Int, outDims: Int): DataFrame = {
    val i = (col("id") / outDims).cast("long") + 1L
    val j = col("id") % outDims
    spark.range(dims.toLong * outDims).select(
      i.as("i"), j.as("j"),
      when(substring(md5(concat(lit("rp:"), j.cast("string"), lit(":"),
          i.cast("string"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
        .otherwise(-1L).as("sign"))
  }

  /** Fixed-point quantization of the input array: ⌊xᵢ·10⁶⌋ BIGINT. */
  private def quantize(v: Column): Column =
    transform(v, x => floor(x * lit(1e6)).cast("long"))

  /** Join-shaped projection: (id, v: array<double>) → (id, j, proj_fp).
    * Explode the vector, join the broadcast sign table, re-group by
    * (id, j). The shuffle carries N·outDims skinny rows. */
  def projectFp(vecs: DataFrame, signs: DataFrame): DataFrame =
    vecs.select(col("id"), posexplode(quantize(col("v"))).as(Seq("i0", "xfp")))
      .select(col("id"), (col("i0") + 1L).as("i"), col("xfp"))
      .join(broadcast(signs), Seq("i"))
      .groupBy(col("id"), col("j"))
      .agg(sum(col("sign") * col("xfp")).as("proj_fp"))

  /** Map-only projection: the sign matrix inlined as literals, one
    * zip_with/aggregate fold per output dim, unpivoted to the same
    * (id, j, proj_fp) contract as [[projectFp]]. No shuffle — the
    * projection runs inside the scan. */
  def projectFpInline(vecs: DataFrame, dims: Int, outDims: Int): DataFrame = {
    val q = vecs.select(col("id"), quantize(col("v")).as("vfp"))
    val projs = (0 until outDims).map { j =>
      val signs = typedLit((1 to dims).map(i => signAt(i, j)))
      val fold = aggregate(
        zip_with(col("vfp"), signs, (x, s) => x * s),
        lit(0L), (acc, x) => acc + x)
      // zip_with pads a length mismatch with nulls, which would turn
      // the fold (and every downstream census) into silent NULL/0
      // garbage — fail loudly instead, repo-wide convention
      coalesce(fold, raise_error(concat(
        lit(s"projectFpInline: expected $dims-dim non-null vector, got length "),
        size(col("vfp")).cast("string"))).cast("long"))
    }
    q.select(col("id"), posexplode(array(projs: _*)).as(Seq("j0", "proj_fp")))
      .select(col("id"), col("j0").cast("long").as("j"), col("proj_fp"))
  }

  /** Pack per-vector projection signs into the random-hyperplane LSH
    * bucket id: bit j set iff proj_fp(j) ≥ 0. Input is either
    * projection variant's (id, j, proj_fp) contract; output
    * (id, bucket). Lives here so the oracle-checked query (q133) and
    * the scale bench can never drift in packing/tie semantics. */
  def packSignBuckets(projected: DataFrame): DataFrame =
    projected.groupBy(col("id"))
      .agg(sum(expr("""CASE WHEN proj_fp >= 0
          THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))
          ELSE CAST(0 AS BIGINT) END""")).as("bucket"))
}
