package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract).
  * Current use (r13): within-one-JVM A/B of the r12 (OLD) vs r13 (NEW)
  * shapes of q193/q203/q205/q208 — interleaved rounds + min, the only
  * believable protocol under the host's CPU-throttle bursts. The OLD
  * shapes are re-spelled inline here (they no longer exist in
  * Queries*); the NEW shapes run via SparkEntry so this measures
  * exactly what the bench runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import graft.operators.{TextAnalysis, TrainPrep}

    // ---------- OLD shapes (r12, verbatim re-spellings) ----------
    def q193Old(): DataFrame = {
      val gd = SharedGrams.grams(s, dir)
        .select(col("h"), col("doc_id")).distinct()
        .withColumn("sp", TrainPrep.splitOf(col("doc_id")))
        .localCheckpoint()
      val byH = gd.groupBy(col("h")).agg(
        max(when(col("sp") === "train", 1L).otherwise(0L)).as("tr"),
        max(when(col("sp") === "test", 1L).otherwise(0L)).as("te"),
        max(when(col("sp") === "val", 1L).otherwise(0L)).as("va"))
        .filter(col("tr") === 1L && (col("te") === 1L || col("va") === 1L))
        .localCheckpoint()
      def z(c: org.apache.spark.sql.Column) = coalesce(c, lit(0L))
      val gramCen = byH.agg(
        z(sum(when(col("te") === 1L, 1L))).as("lg_te"),
        z(sum(when(col("va") === 1L, 1L))).as("lg_va"))
      val docFlags = gd
        .join(byH.select(col("h"), col("te"), col("va")), "h")
        .groupBy(col("doc_id"), col("sp"))
        .agg(max(col("te")).as("te"), max(col("va")).as("va"))
      val docCen = docFlags.agg(
        z(sum(when(col("sp") === "test" && col("te") === 1L, 1L)))
          .as("ed_te"),
        z(sum(when(col("sp") === "train" && col("te") === 1L, 1L)))
          .as("td_te"),
        z(sum(when(col("sp") === "val" && col("va") === 1L, 1L)))
          .as("ed_va"),
        z(sum(when(col("sp") === "train" && col("va") === 1L, 1L)))
          .as("td_va"))
      gramCen.crossJoin(docCen)
        .select(expr("""stack(2, 'test', lg_te, ed_te, td_te,
            'val', lg_va, ed_va, td_va)
          AS (eval_split, n_leaking_grams, n_eval_docs, n_train_docs)"""))
        .orderBy(col("eval_split"))
    }

    def q203Old(): DataFrame = {
      val a = Tables.lineitem(s, dir)
        .select(col("l_orderkey").cast("long").as("k"))
      val b = Tables.orders(s, dir)
        .select(col("o_orderkey").cast("long").as("k"))
      def bkt(n: Int) =
        conv(substring(md5(col("k").cast("string")), 1, 8), 16, 10)
          .cast("long") % n
      def est(n: Int) = {
        val ca = a.groupBy(bkt(n).as("b")).agg(count(lit(1)).as("ca"))
        val cb = b.groupBy(bkt(n).as("b")).agg(count(lit(1)).as("cb"))
        ca.join(broadcast(cb), "b")
          .agg(sum(col("ca") * col("cb")).as("est_rows"))
          .select(lit(n.toLong).as("buckets"), col("est_rows"))
      }
      val exact = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), "k")
        .agg(sum(col("ca") * col("cb")).as("exact_rows"))
      est(64).union(est(256)).union(est(1024))
        .crossJoin(broadcast(exact))
        .select(col("buckets"), col("est_rows"), col("exact_rows"),
          expr("(est_rows - exact_rows) * 1000000 div exact_rows")
            .as("overest_ppm"))
        .orderBy(col("buckets"))
    }

    def q205Old(): DataFrame = {
      val lab = Tables.documents(s, dir)
        .select(col("doc_id"),
          (TextAnalysis.qualityScore(col("text")) >= 0.5).as("hi"),
          col("text"))
        .select(col("doc_id"), col("hi"),
          when(col("hi") && col("doc_id") % 3 === 0,
            concat(col("text"), lit(" editorial citation verified")))
            .when(!col("hi") && col("doc_id") % 3 === 0,
              concat(col("text"), lit(" clickbait spam unsubscribe")))
            .otherwise(col("text")).as("txt"))
      val toks = lab.select(col("doc_id"), col("hi"),
        explode(filter(split(col("txt"), " "),
          t => length(t) > 0)).as("tok"))
      val vocab = toks
        .groupBy(md5(col("tok")).as("th"))
        .agg(sum(when(col("hi"), 1L).otherwise(0L)).as("ch"),
          sum(when(col("hi"), 0L).otherwise(1L)).as("cl"))
        .filter(col("ch") + col("cl") >= 5L)
      val tot = toks.agg(
        sum(when(col("hi"), 1L).otherwise(0L)).as("nh"),
        sum(when(col("hi"), 0L).otherwise(1L)).as("nl"))
      val dtok = toks.select(col("doc_id"), md5(col("tok")).as("th"))
        .distinct()
      val scored = dtok.join(vocab, Seq("th"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          when(col("ch") * col("nl") > lit(2L) * col("cl") * col("nh"), 1L)
            .when(col("cl") * col("nh") > lit(2L) * col("ch") * col("nl"),
              -1L)
            .otherwise(0L).as("v"))
        .groupBy(col("doc_id"))
        .agg(sum(col("v")).as("score"))
      lab.select(col("doc_id"), col("hi").cast("long").as("label_hi"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("label_hi"),
          coalesce(col("score"), lit(0L)).as("score"))
        .select(col("label_hi"),
          greatest(lit(-5L), least(lit(5L), col("score"))).as("bucket"),
          col("score"))
        .groupBy(col("bucket"), col("label_hi"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("bucket"), col("label_hi"))
    }

    def q208Old(): DataFrame = {
      val g = SharedGrams.grams(s, dir)
      val dup = g.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2L).select(col("h"))
      val per = g.join(dup, Seq("h"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
      Tables.documents(s, dir)
        .where(length(col("text")) >= SharedGrams.N)
        .select(col("doc_id"), col("source"),
          (length(col("text")) - (SharedGrams.N - 1)).cast("long")
            .as("n_pos"))
        .join(per, Seq("doc_id"), "left")
        .select(col("source"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"), col("n_pos"))
        .select(col("source"),
          least(lit(9L), expr("n_dup * 10 div n_pos")).as("decile"),
          col("n_dup"), col("n_pos"))
        .groupBy(col("source"), col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_dup")).as("dup_positions"),
          sum(col("n_pos")).as("total_positions"))
        .orderBy(col("source"), col("decile"))
    }

    // ---------- A/B driver ----------
    // batch-2 A/B: the kernel-input checkpoint fixes
    def q124Old(): DataFrame = {
      val first = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.operators.Dedup.charShingles(col("text"), 5))
            .as("sh"))
        .groupBy(col("sh")).agg(min(col("doc_id")).as("fd"))
      val census = first.groupBy(expr("fd div 50").as("bucket"))
        .agg(count(lit(1)).as("new_shingles"))
      graft.operators.WeightedSample
        .withCumWeight(census, "bucket", "new_shingles")
        .withColumnRenamed("cum", "vocab_size")
        .orderBy(col("bucket"))
    }
    def q194Old(): DataFrame = {
      import graft.operators.GroupedRank
      val lens = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("len"))
      val med = GroupedRank.withRank(lens, "source",
          Seq("len", "doc_id"))
        .filter(col("rn") === floor((col("cnt") + 1) / 2).cast("int"))
        .select(col("source"), col("len").as("med"))
      val dev = lens.join(med, "source")
        .withColumn("dev", abs(col("len") - col("med")))
      val mad = GroupedRank.withRank(dev
          .select(col("source"), col("doc_id"), col("dev")), "source",
          Seq("dev", "doc_id"))
        .filter(col("rn") === floor((col("cnt") + 1) / 2).cast("int"))
        .select(col("source"), col("dev").as("mad"))
      dev.join(mad, "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("med")).as("median_len"),
          max(col("mad")).as("mad"),
          sum(when(col("dev") > lit(3L) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("source"))
    }
    def q210Old(): DataFrame = {
      import graft.operators.{GroupedRank, TextAnalysis}
      val scored = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          floor(TextAnalysis.qualityScore(col("text")) * 1e6)
            .cast("long").as("s1"),
          floor(TextAnalysis.repetitionRatio(col("text")) * 1e6)
            .cast("long").as("s2"))
        .localCheckpoint()
      val ranked1 = GroupedRank.withRank(scored, "lang",
          Seq("s1", "doc_id"))
        .withColumnRenamed("rn", "r1").drop("cnt", "s1")
      GroupedRank.withRank(ranked1, "lang", Seq("s2", "doc_id"))
        .withColumnRenamed("rn", "r2").drop("cnt", "s2", "doc_id")
        .select(col("lang"),
          ((col("r1") - col("r2")) * (col("r1") - col("r2"))).as("d2"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("sum_d2"))
        .select(col("lang"), col("n"), col("sum_d2"),
          expr("""1000000 - CAST(CAST(sum_d2 AS DECIMAL(38,0)) * 6000000
            div (CAST(n AS DECIMAL(38,0)) * (n * n - 1)) AS BIGINT)""")
            .as("rho_ppm"))
        .orderBy(col("lang"))
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q124_OLD" -> (() => q124Old()),
      "q124_NEW" -> (() => SparkEntry.queries("q124_vocab_growth")(s, dir)),
      "q194_OLD" -> (() => q194Old()),
      "q194_NEW" -> (() => SparkEntry.queries("q194_length_outliers")(s, dir)),
      "q210_OLD" -> (() => q210Old()),
      "q210_NEW" -> (() => SparkEntry.queries("q210_rank_correlation")(s, dir)))
    // warmup (also builds shared artifacts once)
    variants.foreach { case (_, f) => f().count() }
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (round <- 1 to 4) {
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"round$round $n%-10s $dt%6.2f s")
        best.updateWith(n)(p => Some(p.fold(dt)(math.min(_, dt))))
      }
    }
    println("=== MIN of 4 interleaved rounds ===")
    best.foreach { case (n, v) => println(f"$n%-10s $v%6.2f s") }
    spark.stop()
  }
}
