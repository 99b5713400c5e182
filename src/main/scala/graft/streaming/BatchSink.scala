package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.SqlExport

/** foreachBatch delivery to transactional-file sinks with batch-id
  * idempotence — the streaming upgrade of the reference's export+import
  * handshake (`sql_exporter.py` offset files + `sql_importer.py`
  * imported-files log, SURVEY §3.3):
  *
  *  - each micro-batch renders to `batch_<id>.sql` via a temp file +
  *    atomic move — a replayed batch (at-least-once restart) overwrites
  *    its own file rather than duplicating rows, which is exactly the
  *    anti-join idempotence the reference gets from its imported-log;
  *  - the NOT-NULL abort policy applies per batch: a violating batch
  *    writes a `batch_<id>.rejected` marker instead of a partial file
  *    (delete-on-error parity, sql_exporter.py:621-639).
  */
object BatchSink {

  def sqlFiles(events: DataFrame, outDir: Path, table: String,
               specs: Seq[SqlExport.ColumnSpec],
               checkpoint: String): DataStreamWriter[Row] = {
    Files.createDirectories(outDir)
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SqlExport.export(batch, table, specs) match {
          case Right(lines) =>
            val tmp = outDir.resolve(s".batch_$batchId.tmp")
            val dst = outDir.resolve(s"batch_$batchId.sql")
            Files.write(tmp, String.join("\n",
              lines.collect().toSeq: _*).getBytes("UTF-8"))
            Files.move(tmp, dst,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          case Left(violations) =>
            Files.write(outDir.resolve(s"batch_$batchId.rejected"),
              s"$violations NOT NULL violations".getBytes("UTF-8"))
        }
        ()
      }
  }
}
