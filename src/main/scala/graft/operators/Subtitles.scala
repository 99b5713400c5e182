package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subtitle-track censuses — the TEXT leg of the video modality
  * ([[graft.operators.VideoContainer]] parses the container; subtitle
  * tracks are where a training pipeline actually harvests video-paired
  * text). Two public grammars:
  *
  *  - WebVTT (W3C): a `WEBVTT` header block, blank-line-separated cue
  *    blocks of `[id\n] start --> end [settings]\npayload…`, dot
  *    millisecond separator, NOTE/STYLE/REGION blocks legal and
  *    skipped.
  *  - SubRip (.srt): no header, numeric index line per cue, comma
  *    millisecond separator, nothing skippable.
  *
  * Per track the census reads: cue count, malformed-block count (the
  * log sources' tolerance discipline — junk is COUNTED, never thrown
  * on), payload chars after inline-tag stripping (`<i>`, `<c.cls>`,
  * `<v Name>` …), summed cue duration, track span, fixed-point
  * chars-per-second (the readability cut subtitle corpora filter on),
  * and overlap violations — cues whose start rewinds behind the
  * running max of ALL prior ends in file order, so a long cue
  * overlapping non-adjacent later cues is counted per overlapped cue
  * (a mux bug upstream).
  *
  * Everything is per-row array/regex expressions over the payload
  * string — codegen'd, no UDF, no shuffle: at 100 TB this runs
  * entirely inside the scan stage, and the census output is one row
  * per track. Timestamps become integer milliseconds; all ratios are
  * integer fixed-point. */
object Subtitles {

  /** Census over a string column holding one WebVTT payload per row.
    * Tracks without the `WEBVTT` header are `valid = false` with a
    * null census (never a throw); cue blocks lacking a timing line —
    * other than NOTE/STYLE/REGION — count as `n_malformed`. A cue
    * sharing the header block (no blank line after `WEBVTT`, tolerated
    * by real-world parsers) is recognized when it carries a timing
    * line; timing-less header remainder is header metadata (e.g.
    * `X-TIMESTAMP-MAP`), counted neither as cue nor malformed. */
  def withCueCensus(tracks: DataFrame, idCol: String,
                    vttCol: String): DataFrame =
    census(tracks, idCol, vttCol,
      ts = "(?:\\d+:)?\\d{2}:\\d{2}\\.\\d{3}", decSep = "\\.",
      vtt = true)

  /** Census over a string column holding one SubRip (.srt) payload per
    * row: `hh:mm:ss,mmm` timings (comma separator), numeric cue-index
    * lines, no header and no comment blocks. A track with zero
    * parseable cues is `valid = false` (SRT has no header to check);
    * blocks without a timing line count as `n_malformed`. Same census
    * columns as [[withCueCensus]]. */
  def withSrtCueCensus(tracks: DataFrame, idCol: String,
                       srtCol: String): DataFrame =
    census(tracks, idCol, srtCol,
      ts = "(?:\\d+:)?\\d{2}:\\d{2},\\d{3}", decSep = ",",
      vtt = false)

  /** Shared cue machinery. `vtt = true` gates validity on the WEBVTT
    * header and skips NOTE/STYLE/REGION blocks; `vtt = false` (SRT)
    * treats every block as a cue candidate and gates validity on
    * having at least one parseable cue. */
  private def census(tracks: DataFrame, idCol: String, srcCol: String,
                     ts: String, decSep: String, vtt: Boolean)
      : DataFrame = {
    val timing = s"(?m)^[ \\t]*($ts)[ \\t]*-->[ \\t]*($ts)[^\\n]*$$"
    // `(hh:)?mm:ss<sep>mmm` → integer milliseconds (callers pre-filter
    // blocks on the timing regex, so the cast never sees junk)
    def tsMs(c: Column): Column = {
      val parts = split(c, ":")
      val secs = regexp_replace(element_at(parts, -1), decSep, "")
        .cast("long")
      val mins = element_at(parts, -2).cast("long")
      val hrs = when(size(parts) >= 3, element_at(parts, -3).cast("long"))
        .otherwise(lit(0L))
      hrs * 3600000L + mins * 60000L + secs
    }
    val blocks = split(
      regexp_replace(col(srcCol), "\\r\\n?", "\n"), "\n{2,}")
    val headed = element_at(blocks, 1)
      .rlike("^\\x{FEFF}?WEBVTT(?:[ \\t][^\\n]*)?(?:\\n|$)")
    val body =
      if (vtt) {
        // real-world tolerance: a cue may share the header block (no
        // blank line after WEBVTT). The header LINE is stripped and the
        // remainder kept as a cue candidate iff it carries a timing
        // line; timing-less header metadata (X-TIMESTAMP-MAP …) stays
        // with the header — neither a cue nor malformed.
        val rest = expr("slice(_blocks, 2, greatest(size(_blocks) - 1, 0))")
        val headRest = regexp_replace(element_at(col("_blocks"), 1),
          "^\\x{FEFF}?WEBVTT[^\\n]*\\n?", "")
        when(headRest.rlike(timing), concat(array(headRest), rest))
          .otherwise(rest)
      }
      else coalesce(col("_blocks"), array().cast("array<string>"))
    val cues = filter(col("_body"), b => b.rlike(timing))
    val skippable = (b: Column) =>
      if (vtt) b.rlike("^[ \\t]*(NOTE|STYLE|REGION)(?:[ \\t\\n]|$)")
      else lit(false)
    val malformed = filter(col("_body"),
      b => !b.rlike(timing) && !skippable(b) && (trim(b) =!= ""))
    val starts = transform(col("_cues"),
      b => tsMs(regexp_extract(b, timing, 1)))
    val ends = transform(col("_cues"),
      b => tsMs(regexp_extract(b, timing, 2)))
    // payload = everything after the timing line, inline tags and
    // line breaks collapsed; a cue-id/index line above the timing
    // line is dropped with it
    val chars = transform(col("_cues"),
      b => length(trim(regexp_replace(regexp_replace(
        regexp_replace(b, "(?s)^.*?-->[^\\n]*\\n?", ""),
        "<[^>]*>", ""), "\\s+", " "))).cast("long"))
    val preGate = tracks
      .withColumn("_blocks", blocks)
    val gated =
      if (vtt) preGate
        .withColumn("_valid", coalesce(headed, lit(false)))
        .withColumn("_body", when(col("_valid"), body)
          .otherwise(array().cast("array<string>")))
        .withColumn("_cues", cues)
      else preGate
        .withColumn("_body", body)
        .withColumn("_cues", cues)
        .withColumn("_valid", size(col("_cues")) > 0)
    gated
      .withColumn("_n_mal", size(malformed).cast("long"))
      .withColumn("_starts", starts)
      .withColumn("_ends", ends)
      .withColumn("_nch", coalesce(aggregate(chars, lit(0L),
        (a, x) => a + x), lit(0L)))
      .withColumn("_sub", coalesce(aggregate(
        zip_with(col("_starts"), col("_ends"), (s, e) => e - s),
        lit(0L), (a, x) => a + greatest(x, lit(0L))), lit(0L)))
      .select(
        col(idCol),
        col("_valid").as("valid"),
        when(col("_valid"), size(col("_cues")).cast("long"))
          .as("n_cues"),
        when(col("_valid"), col("_n_mal")).as("n_malformed"),
        when(col("_valid"), col("_nch")).as("n_chars"),
        when(col("_valid"), col("_sub")).as("sub_ms"),
        when(col("_valid") && size(col("_cues")) > 0,
          array_max(col("_ends")) - array_min(col("_starts")))
          .as("span_ms"),
        // fixed-point chars/sec ×1000: chars·10⁶ div summed cue ms
        when(col("_valid"), expr("""CASE WHEN _sub > 0
            THEN _nch * 1000000 div _sub END""")).as("cps_milli"),
        // overlap = cue start rewinds behind the RUNNING max of all
        // prior ends (not just the adjacent cue — a long cue overlaps
        // later non-adjacent cues too): fold (maxEnd, count) over cue
        // index 2..n. Guarded: sequence(2, 1) would count DOWN, and
        // element_at past the array end throws under ANSI. _starts /
        // _ends are attributes — safe inside the lambda per the HOF
        // subexpression-elimination rule.
        when(col("_valid"), when(size(col("_cues")) >= 2,
          aggregate(sequence(lit(2), size(col("_cues"))),
            struct(element_at(col("_ends"), 1).as("mx"),
              lit(0L).as("cnt")),
            (acc, i) => struct(
              greatest(acc.getField("mx"),
                element_at(col("_ends"), i)).as("mx"),
              (acc.getField("cnt") +
                when(element_at(col("_starts"), i) < acc.getField("mx"),
                  lit(1L)).otherwise(lit(0L))).as("cnt")),
            acc => acc.getField("cnt")))
          .otherwise(lit(0L))).as("n_overlaps"))
  }
}
