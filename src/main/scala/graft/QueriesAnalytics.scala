package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, EventAnalytics, TextAnalysis}
import Queries.Q

/** Corpus-composition and event-behavior analytics: Gopher-family
  * quality-rule census, per-source distribution divergence, session
  * path / transition analysis, last-touch attribution, and rate
  * anomaly detection. All-integer (or decimal-cast) outputs per the
  * Queries determinism rules.
  */
object QueriesAnalytics {

  private val SessionGapMs = 1800000L

  /** GOPHER QUALITY-RULE CENSUS (TextAnalysis.gopherFlags; Rae et al.
    * 2021 §A.1.1 adapted so each rule splits the synthetic corpus):
    * per-rule pass counts + the kept count under the conjunction.
    * Every rule is a pure per-row array/integer expression fused into
    * the scan; the census is a single global agg of 0/1 columns — at
    * 100 TB this is one pass over text with a 1-row result. */
  private val q138 = Q(
    "q138_gopher_rules",
    (s, dir) => {
      val flags = TextAnalysis.gopherFlags(col("text"), 20, 80)
      val flagged = Tables.documents(s, dir).select(
        flags.map { case (n, c) => when(c, 1L).otherwise(0L).as(n) }: _*)
      flagged.agg(
        count(lit(1)).as("n_docs"),
        sum(col("r_wordcount")).as("pass_wordcount"),
        sum(col("r_meanwordlen")).as("pass_meanwordlen"),
        sum(col("r_stopwords")).as("pass_stopwords"),
        sum(col("r_repetition")).as("pass_repetition"),
        sum(col("r_wordcount") * col("r_meanwordlen") *
          col("r_stopwords") * col("r_repetition")).as("n_kept"))
    },
    Some("""WITH tk AS (SELECT doc_id, string_split(text,' ') AS ts,
        len(replace(text,' ','')) AS nchars FROM documents),
      m AS (SELECT doc_id, len(ts) AS nw, nchars,
        len(list_filter(list_distinct(ts),
          x -> x IN ('the','a','is','of','and','to','in'))) AS stophits,
        list_max(list_transform(list_distinct(ts),
          d -> len(list_filter(ts, x -> x = d)))) AS maxtf
       FROM tk),
      f AS (SELECT
        CASE WHEN nw BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS rwc,
        CASE WHEN nchars*10 >= nw*39 AND nchars*10 <= nw*51
             THEN 1 ELSE 0 END AS rmwl,
        CASE WHEN stophits >= 2 THEN 1 ELSE 0 END AS rstop,
        CASE WHEN maxtf*5 <= nw THEN 1 ELSE 0 END AS rrep
       FROM m)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(rwc) AS BIGINT) AS pass_wordcount,
        CAST(SUM(rmwl) AS BIGINT) AS pass_meanwordlen,
        CAST(SUM(rstop) AS BIGINT) AS pass_stopwords,
        CAST(SUM(rrep) AS BIGINT) AS pass_repetition,
        CAST(SUM(rwc*rmwl*rstop*rrep) AS BIGINT) AS n_kept
      FROM f"""))

  /** PER-SOURCE UNIGRAM TVD (CorpusStats.sourceUnigramTvd): total
    * -variation distance of each source's token distribution from the
    * corpus, exact cross-multiplied BIGINTs, one div at the end
    * (×10⁴ fixed point). The mixture-design readout: which sources
    * are distributionally redundant. */
  private val q139 = Q(
    "q139_source_divergence",
    (s, dir) => CorpusStats.sourceUnigramTvd(Tables.documents(s, dir)),
    Some("""WITH toks AS (
        SELECT source, UNNEST(string_split(text,' ')) AS term
        FROM documents),
      ost AS (SELECT source, term, COUNT(*) AS o FROM toks GROUP BY 1,2),
      ct AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
      srcs AS (SELECT source, CAST(SUM(o) AS BIGINT) AS s
        FROM ost GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM ct),
      grid AS (SELECT srcs.source, srcs.s, ct.term, ct.c, tot.t
        FROM srcs CROSS JOIN ct CROSS JOIN tot),
      j AS (SELECT g.source, g.s, g.t,
          ABS(COALESCE(o.o, 0)*g.t - g.c*g.s) AS ad
        FROM grid g LEFT JOIN ost o
          ON g.source = o.source AND g.term = o.term)
      SELECT source, s AS n_tokens,
        CAST(SUM(ad)*10000 // (2*s*t) AS BIGINT) AS tvd_x1e4
      FROM j GROUP BY source, s, t ORDER BY source"""))

  /** TOP SESSION PATHS (EventAnalytics.sessionPaths): the first 8
    * event types of each 30-min-gap session joined with '>', top 20
    * by frequency. Per-session state is capped (row_number ≤ 8 BEFORE
    * the collect); the census key is a short string. */
  private val q140 = Q(
    "q140_session_paths",
    (s, dir) => EventAnalytics.sessionPaths(
      Tables.events(s, dir).selectExpr(
        "user_id", "event_id", "event_type", "unix_millis(ts) as ms"),
      SessionGapMs, maxLen = 8, topK = 20),
    Some("""WITH t AS (SELECT user_id, event_id, event_type,
          epoch_ms(ts) AS ms FROM events),
      f AS (SELECT *, CASE
          WHEN ms - LAG(ms,1) OVER (PARTITION BY user_id
            ORDER BY ms, event_id) > 1800000 THEN 1
          WHEN LAG(ms,1) OVER (PARTITION BY user_id
            ORDER BY ms, event_id) IS NULL THEN 1
          ELSE 0 END AS new_s
        FROM t),
      sess AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
          ORDER BY ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
        FROM f),
      r AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, session_id
          ORDER BY ms, event_id) AS rn
        FROM sess),
      p AS (SELECT user_id, session_id,
          STRING_AGG(event_type, '>' ORDER BY ms, event_id) AS path
        FROM r WHERE rn <= 8 GROUP BY 1, 2)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM p GROUP BY 1
      ORDER BY n_sessions DESC, path LIMIT 20"""))

  /** SESSION TRANSITION MATRIX (EventAnalytics.transitionCensus):
    * first-order Markov (from → to) adjacent-pair counts within
    * sessions, conditional probability as integer ppm. |types|² rows. */
  private val q141 = Q(
    "q141_event_transitions",
    (s, dir) => EventAnalytics.transitionCensus(
      Tables.events(s, dir).selectExpr(
        "user_id", "event_id", "event_type", "unix_millis(ts) as ms"),
      SessionGapMs),
    Some("""WITH t AS (SELECT user_id, event_id, event_type,
          epoch_ms(ts) AS ms FROM events),
      f AS (SELECT *, CASE
          WHEN ms - LAG(ms,1) OVER (PARTITION BY user_id
            ORDER BY ms, event_id) > 1800000 THEN 1
          WHEN LAG(ms,1) OVER (PARTITION BY user_id
            ORDER BY ms, event_id) IS NULL THEN 1
          ELSE 0 END AS new_s
        FROM t),
      sess AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
          ORDER BY ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
        FROM f),
      pr AS (SELECT event_type AS from_type,
          LEAD(event_type) OVER (PARTITION BY user_id, session_id
            ORDER BY ms, event_id) AS to_type
        FROM sess),
      c AS (SELECT from_type, to_type, COUNT(*) AS n
        FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        CAST(n*1000000 // SUM(n) OVER (PARTITION BY from_type)
          AS BIGINT) AS p_ppm
      FROM c ORDER BY from_type, to_type"""))

  /** LAST-TOUCH ATTRIBUTION (EventAnalytics.lastTouchAttribution):
    * each purchase credited to the latest preceding view/click by the
    * same user within 7 days (running MAX of a packed ms·3+code — no
    * per-pair join; same-ms ties resolve to click, the higher code).
    * Census: conversions + decimal-exact revenue per touch type. */
  private val q142 = Q(
    "q142_attribution",
    (s, dir) => EventAnalytics.lastTouchAttribution(
      Tables.events(s, dir).selectExpr(
        "user_id", "event_id", "event_type", "value",
        "unix_millis(ts) as ms"),
      touchTypes = Seq("view", "click"), convType = "purchase",
      windowMs = 604800000L),
    Some("""WITH t AS (SELECT event_id, user_id, event_type, value,
          epoch_ms(ts) AS ms FROM events),
      pk AS (SELECT *, CASE
          WHEN event_type = 'view'  THEN ms*3 + 1
          WHEN event_type = 'click' THEN ms*3 + 2
          END AS pkd
        FROM t),
      lp AS (SELECT *, MAX(pkd) OVER (PARTITION BY user_id
          ORDER BY ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS last_packed
        FROM pk),
      conv AS (SELECT *, CASE
          WHEN last_packed IS NOT NULL AND last_packed % 3 = 2
            AND ms - last_packed // 3 <= 604800000 THEN 'click'
          WHEN last_packed IS NOT NULL AND last_packed % 3 = 1
            AND ms - last_packed // 3 <= 604800000 THEN 'view'
          ELSE 'none' END AS touch_type
        FROM lp WHERE event_type = 'purchase')
      SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM conv GROUP BY 1 ORDER BY 1"""))

  /** RATE-ANOMALY DETECTION (EventAnalytics.rateAnomalies): hourly
    * (event_type, hour) cells whose count exceeds 1.5× the trailing
    * -24h hourly mean (integer cross-multiplied, ≥12 trailing buckets
    * of coverage). RANGE window on the integer hour. */
  private val q143 = Q(
    "q143_rate_anomaly",
    (s, dir) => EventAnalytics.rateAnomalies(
      Tables.events(s, dir).selectExpr(
        "event_type", "unix_millis(ts) as ms")),
    Some("""WITH t AS (SELECT event_type,
          epoch_ms(ts) // 3600000 AS hr FROM events),
      c AS (SELECT event_type, hr, COUNT(*) AS n FROM t GROUP BY 1, 2),
      w AS (SELECT event_type, hr, n,
          SUM(n) OVER (PARTITION BY event_type ORDER BY hr
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
          COUNT(*) OVER (PARTITION BY event_type ORDER BY hr
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_buckets
        FROM c)
      SELECT event_type, CAST(hr AS BIGINT) AS hr, CAST(n AS BIGINT) AS n,
        CAST(trail_sum AS BIGINT) AS trail_sum,
        CAST(trail_buckets AS BIGINT) AS trail_buckets
      FROM w
      WHERE trail_buckets >= 12 AND n*trail_buckets*2 > trail_sum*3
      ORDER BY event_type, hr"""))

  val list: Seq[Q] = Seq(q138, q139, q140, q141, q142, q143)
}
