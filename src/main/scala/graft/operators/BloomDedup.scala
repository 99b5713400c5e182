package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter dedup prefilter — THE pattern for incremental exact
  * dedup against a huge historical corpus: instead of semi-joining every
  * incoming batch against N billion historical content hashes (a shuffle
  * of the whole history), build a Bloom filter over the history ONCE,
  * broadcast its bytes (MBs, tunable FP rate), and let a narrow filter
  * discard the overwhelmingly-new majority; only the tiny might-contain
  * remainder pays the exact confirmation join. False positives are
  * eliminated by that confirm stage, false negatives don't exist — so
  * bloom→confirm is row-identical to the plain semi join (which is what
  * the q63 oracle checks).
  *
  * Built on Spark's own sketch machinery — the same
  * `BloomFilterAggregate`/`BloomFilterMightContain` expression pair the
  * optimizer injects for runtime row-level filtering — rather than a
  * hand-rolled UDF: the aggregate builds the filter DISTRIBUTED (partial
  * filters per partition, merged once), and the probe is a codegen'd
  * expression over a broadcast literal, so it fuses into the scan.
  */
object BloomDedup {

  /** Build a Bloom filter over `key` of `corpus`; returns the serialized
    * filter (~numBits/8 bytes). The `head()` fetches ONE row holding the
    * merged filter — a scalar-aggregate fetch like any count(), not a
    * data collect; the build itself is a distributed partial aggregation.
    *
    * `expectedItems`/`numBits` size the filter: FP rate ≈
    * (1-e^(-kn/m))^k; 8 bits/item ≈ 2% FPs. At 100 TB the history-side
    * build is one pass, and numBits is bounded by
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits (default 64 MB
    * of bits) — shard the filter by key range if the history outgrows
    * one filter's FP budget. */
  def buildFilter(corpus: DataFrame, key: Column,
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val hash = new XxHash64(Seq(GraftSqlBridge.expression(key)))
    val agg = new BloomFilterAggregate(
      hash, Literal(expectedItems), Literal(numBits))
    corpus.select(GraftSqlBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Narrow might-contain probe against a built filter. Never false
    * negative; may be false positive — callers MUST confirm positives
    * exactly (see q63) when exact semantics are required. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      new XxHash64(Seq(GraftSqlBridge.expression(key)))))

  /** Sharded build for histories beyond one filter's FP budget
    * (numBits caps at the conf'd 64 MB): keys route to
    * `pmod(xxhash64(key), shards)` and each shard builds its own filter
    * in ONE grouped aggregation pass. Shards with no data come back
    * None (their probe is constant-false). Total filter capacity scales
    * linearly with `shards` while each stays under the cap. */
  def buildShardedFilter(corpus: DataFrame, key: Column, shards: Int,
                         expectedItemsPerShard: Long,
                         numBitsPerShard: Long): IndexedSeq[Option[Array[Byte]]] = {
    import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit}
    val keyed = corpus.select(key.as("_k"),
      pmod(xxhash64(key), lit(shards)).as("_s"))
    val hash = new XxHash64(Seq(GraftSqlBridge.expression(col("_k"))))
    val agg = new BloomFilterAggregate(
      hash, Literal(expectedItemsPerShard), Literal(numBitsPerShard))
    val built = keyed.groupBy(col("_s"))
      .agg(GraftSqlBridge.column(agg.toAggregateExpression()).as("bf"))
      .collect()
      .map(r => r.getAs[Long]("_s").toInt -> r.getAs[Array[Byte]]("bf"))
      .toMap
    (0 until shards).map(built.get)
  }

  /** Probe against a sharded filter set: routes by the SAME shard hash
    * used at build time, then might-contains within the shard. Same
    * guarantee as [[mightContain]]: no false negatives, confirm FPs. */
  def mightContainSharded(filters: IndexedSeq[Option[Array[Byte]]],
                          key: Column): Column = {
    import org.apache.spark.sql.functions.{lit, pmod, when, xxhash64}
    val s = pmod(xxhash64(key), lit(filters.size))
    filters.zipWithIndex.foldLeft(lit(false)) { case (els, (fOpt, i)) =>
      fOpt.map(bytes =>
        when(s === i, mightContain(bytes, key)).otherwise(els)).getOrElse(els)
    }
  }
}
