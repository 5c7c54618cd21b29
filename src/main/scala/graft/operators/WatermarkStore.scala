package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

/** Watermark store with the reference's two-phase (PENDING → CONFIRMED)
  * semantics, keyed `project#table#column`
  * (utils/extract_data_v2/load/watermark_storage/dynamodb_watermark_storage.py:23-101,
  * transactional variant transactional_watermark_storage.py;
  * orchestration at core/orchestrator.py:588-627).
  *
  * Backed by a single TSV file of URL-encoded fields
  * `(key, value, status, updated_at)` — KB-scale driver-side metadata, so it
  * is read and written with plain filesystem IO (no Spark jobs; the
  * previous parquet-backed version ran a distributed read + collect +
  * re-parallelize per get/put). The Hadoop FileSystem API keeps it working
  * on file:// and object stores alike.
  *
  * Durability: writes go to `__tmp`, then `live → __bak`, `__tmp → live`,
  * delete `__bak` — the same order as the merge swap, so a crash at any
  * point leaves either the old or the new complete file recoverable, never
  * nothing ([[load]] self-heals). The 90-day TTL of the DynamoDB store
  * becomes an expiry filter on read. All mutations are serialized on the
  * store instance: [[graft.runner.Runner]] calls from concurrent per-table
  * threads (the DynamoDB original got atomicity from the database; a
  * driver-side lock is the single-JVM equivalent).
  */
final class WatermarkStore(spark: SparkSession, path: String, ttlDays: Int = 90) {
  import WatermarkStore._

  private val live = new Path(path)
  private val tmp = new Path(path + "__tmp")
  private val bak = new Path(path + "__bak")
  private def fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Composite watermark key. Components are URL-encoded BEFORE joining
    * so a '#' inside a name cannot make two distinct (project, table,
    * column) triples collide on one key — a collision would let one
    * table's confirm() advance the other's incremental cutoff and
    * silently skip rows on its next extract. Clean names (no '#', '%',
    * spaces) encode to themselves, so existing stores keep working.
    */
  def key(project: String, table: String, column: String): String =
    s"${enc(project)}#${enc(table)}#${enc(column)}"

  /** Last CONFIRMED, unexpired watermark value for a key. */
  def get(wmKey: String): Option[String] = this.synchronized {
    val cutoff = System.currentTimeMillis() - ttlDays * MillisPerDay
    load()
      .filter(e => e.key == wmKey && e.status == Confirmed && e.updatedAt >= cutoff)
      .sortBy(-_.updatedAt)
      .headOption
      .map(_.value)
  }

  /** Phase 1: record the candidate watermark as PENDING. */
  def saveProvisional(wmKey: String, value: String): Unit = this.synchronized {
    put(wmKey, value, Pending)
  }

  /** Phase 2: after a successful load, promote to CONFIRMED. */
  def confirm(wmKey: String): Unit = this.synchronized {
    load().filter(e => e.key == wmKey && e.status == Pending)
      .sortBy(-_.updatedAt).headOption
      .foreach(p => put(wmKey, p.value, Confirmed))
  }

  /** RESET load mode: drop the key entirely (models/load_mode.py:4-27). */
  def delete(wmKey: String): Unit = this.synchronized {
    save(load().filterNot(_.key == wmKey))
  }

  private def put(wmKey: String, value: String, status: String): Unit = {
    val kept = load().filterNot(e => e.key == wmKey && e.status == status)
    save(kept :+ Entry(wmKey, value, status, System.currentTimeMillis()))
  }

  private def load(): Seq[Entry] = {
    // self-heal an interrupted swap: a complete __tmp (live missing) or the
    // __bak from before the crash is always available
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) { fs.rename(tmp, live); fs.delete(bak, false) }
      else if (fs.exists(bak)) { fs.rename(bak, live); () }
    }
    if (!fs.exists(live)) return Nil
    val in = new BufferedReader(new InputStreamReader(fs.open(live), UTF_8))
    try {
      Iterator.continually(in.readLine()).takeWhile(_ != null).flatMap { line =>
        line.split("\t", -1) match {
          // a malformed timestamp skips the line like any other corrupt
          // row (the `case _` arm) instead of throwing and bricking
          // every store operation until a human repairs the file
          case Array(k, v, s, at) =>
            at.toLongOption.map(ts => Entry(dec(k), dec(v), dec(s), ts))
          case _ => None
        }
      }.toVector
    } finally in.close()
  }

  private def save(entries: Seq[Entry]): Unit = {
    val out = new OutputStreamWriter(fs.create(tmp, true), UTF_8)
    try entries.foreach(e =>
      out.write(s"${enc(e.key)}\t${enc(e.value)}\t${enc(e.status)}\t${e.updatedAt}\n"))
    finally out.close()
    // Hadoop FileSystem signals most failures by RETURNING FALSE, not
    // throwing — an unchecked swap would report a confirmed watermark
    // that never hit disk, and every later run would silently re-extract
    def must(ok: Boolean, step: String): Unit =
      if (!ok) throw new java.io.IOException(
        s"watermark store swap failed at $step ($live) — " +
          "watermark NOT saved; the prior store contents still stand")
    if (fs.exists(live)) {
      if (fs.exists(bak)) must(fs.delete(bak, false), "delete-backup")
      must(fs.rename(live, bak), "backup-live")
    }
    must(fs.rename(tmp, live), "publish")
    fs.delete(bak, false) // best-effort: a stale backup is inert
    ()
  }

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")
}

object WatermarkStore {
  val Pending = "PENDING"
  val Confirmed = "CONFIRMED"
  private val MillisPerDay = 24L * 3600 * 1000

  final case class Entry(key: String, value: String, status: String, updatedAt: Long)
}
