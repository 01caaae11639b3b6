package graft.pipeline

import graft.model.CheckpointRow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Durable partition-granular checkpoint/lineage store (SURVEY.md §2.7
  * J2, FIXTURES.md §3).
  *
  * One small JSON file per completed logical partition, written with
  * write-temp-then-atomic-rename so a mark either fully exists or
  * doesn't; task retries overwrite idempotently (same key, same
  * content). Reading dedups by (run_id, partition_id).
  *
  * Filesystem layout (works on any shared POSIX/NFS mount in the
  * sandbox; the production seam is an Iceberg `checkpoint` table with
  * the same row shape — swap `markCompleted`/`completedPids` only):
  *
  *   <dir>/run_id=<run>/pid=<n>.json
  */
final class CheckpointStore(dir: String) extends Serializable {

  private def runDir(runId: String): Path = Paths.get(dir, s"run_id=$runId")

  def markCompleted(row: CheckpointRow): Unit = {
    val d = runDir(row.run_id)
    Files.createDirectories(d)
    val json =
      s"""{"run_id":"${row.run_id}","partition_id":${row.partition_id},"doc_count":${row.doc_count},""" +
        s""""lines_segmented":${row.lines_segmented},"glyphs_classified":${row.glyphs_classified},""" +
        s""""ocr_spans":${row.ocr_spans},"direct_spans":${row.direct_spans},"failed_spans":${row.failed_spans},""" +
        s""""completed_at":${row.completed_at}}"""
    val tmp = d.resolve(s".pid=${row.partition_id}.json.tmp-${Thread.currentThread().getId}")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, d.resolve(s"pid=${row.partition_id}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def completedPids(runId: String): Set[Int] = {
    val d = runDir(runId)
    if (!Files.isDirectory(d)) return Set.empty
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("pid=") && s.endsWith(".json") =>
        s.stripPrefix("pid=").stripSuffix(".json").toInt
      }
      .toSet
  }

  /** All lineage rows of a run (driver-side roll-up A7). */
  def rows(runId: String): Seq[CheckpointRow] = {
    val d = runDir(runId)
    if (!Files.isDirectory(d)) return Nil
    Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("pid="))
      .map { p =>
        val j = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        def num(k: String): Long =
          s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).map(_.group(1).toLong).getOrElse(0L)
        def str(k: String): String =
          s""""$k":"([^"]*)"""".r.findFirstMatchIn(j).map(_.group(1)).getOrElse("")
        CheckpointRow(str("run_id"), num("partition_id").toInt, num("doc_count"),
          num("lines_segmented"), num("glyphs_classified"), num("ocr_spans"),
          num("direct_spans"), num("failed_spans"), num("completed_at"))
      }
      .toSeq
      .sortBy(_.partition_id)
  }
}
