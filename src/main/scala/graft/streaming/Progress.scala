package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ingestion progress reporting — the StreamingQueryListener rendering
  * of the reference's per-file progress callback
  * (`/root/reference/lib/maillogsentinel/parser.py:99-104`,
  * `progress.py:38-214`). Cosmetic/observability only: collects one
  * summary per micro-batch (rows, duration, per-source offsets) and
  * exposes them for logging, a metrics push, or a console renderer.
  */
object Progress {

  final case class BatchProgress(
      queryName: String, batchId: Long, numInputRows: Long,
      durationMs: Long, sources: Seq[String])

  final class Recorder extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchProgress]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      buf.add(BatchProgress(
        Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
        p.durationMs.asScala.values.map(_.longValue()).sum,
        p.sources.map(_.description).toSeq))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    def batches: Seq[BatchProgress] = buf.asScala.toSeq
    def totalRows: Long = batches.map(_.numInputRows).sum
  }

  /** Attach a recorder to the session; caller keeps the handle. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.streams.addListener(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.streams.removeListener(r)

  /** One-line run summary over the recorded batches — the streaming
    * analog of Pipeline.RunSummary (reference run footer,
    * bin/maillogsentinel.py:753-760). */
  def summaryLine(r: Recorder): String = {
    val bs = r.batches
    val sources = bs.flatMap(_.sources).distinct
    s"Streaming run completed: batches=${bs.size} rows=${r.totalRows} " +
      s"sources=${sources.size} duration_ms=${bs.map(_.durationMs).sum}"
  }
}
