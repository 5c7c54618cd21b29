package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets.UTF_8

/** Single-writer lease for a table path: a lock file at `path + "__lock"`
  * holding owner id + acquire time, heartbeated (mtime refresh) between
  * merge phases. A second writer fails fast with
  * [[MergeUpsert.ConcurrentWriteException]] instead of fighting the first
  * over the staging/commit dirs — the plain-parquet stand-in for the writer
  * serialization Delta's transaction log provides.
  *
  * Acquisition is an atomic publish: the owner writes a uniquely-named
  * temp file and renames it onto `__lock`. On HDFS-semantics filesystems
  * `rename` refuses an existing destination, so of two racing writers
  * exactly one wins. POSIX-backed filesystems (RawLocalFileSystem,
  * LocalFileSystem, NFS) are weaker: their rename is `File.renameTo`,
  * which silently REPLACES an existing destination — a blind publish
  * there would steal a live lock. The protocol therefore never publishes
  * blind: it stats the lock first and only publishes when the lock is
  * absent (or was stale and this writer broke it), and after a winning
  * rename it reads the lock back and confirms it names this owner —
  * a racer whose publish was overwritten sees the other owner and loses.
  * A read-back that finds the lock *gone* (not held by someone else) is a
  * both-lose artifact — e.g. a stale-breaker renamed our fresh lock away
  * before deciding it was live and putting it back — so the publish is
  * retried a bounded number of times rather than treated as a lost race;
  * without the retry, such races can end with zero winners and an orphaned
  * lock.
  *
  * The one remaining POSIX hole (an overwrite landing after the read-back)
  * is caught at the next `heartbeat()`, which verifies ownership before
  * refreshing and throws on mismatch — and [[MergeUpsert]] heartbeats
  * after staging, BEFORE the destructive swap, so a displaced writer dies
  * loudly without corrupting the table. Each acquisition also carries a
  * unique [[token]]; [[MergeUpsert]] stages under `__staging.<token>`, so
  * even during the window where two writers both believe they hold the
  * lease, neither can write into — or swap in — the other's staged data.
  *
  * Staleness: a lock whose mtime is older than `staleMs` belongs to a
  * writer presumed dead (crashed mid-merge without `release()`); it is
  * broken by renaming it to a unique name (one breaker wins even when
  * several race) and then contested. Heartbeats bound the false-death
  * window — the
  * owner refreshes after the expensive staging write, so `staleMs` only
  * needs to cover one phase, not the whole merge. Object stores without
  * atomic rename (S3A) should use [[StoreLease]] over a [[LockStore]]
  * with real conditional writes instead — same lease semantics, CAS-
  * race-free, pluggable backend.
  */
final class WriterLease private (fs: FileSystem, lock: Path, owner: String,
    /** Unique per-acquisition id — safe as a filesystem-name component.
      * Writers derive private scratch paths (staging dirs) from it so
      * concurrent leaseholders during a POSIX displacement window can
      * never touch each other's staged data.
      */
    val token: String) extends TableLease {

  /** Refresh the lock's mtime so a long merge isn't mistaken for a dead
    * writer — after verifying the lock still names this owner. A mismatch
    * means another writer stole or broke the lease (POSIX rename overwrite,
    * or a stale-break while this process was paused past `staleMs`);
    * throwing here stops the displaced writer before its next (destructive)
    * phase. Call between phases; cheap (one read + one metadata op).
    */
  def heartbeat(): Unit = {
    WriterLease.readOwner(fs, lock) match {
      case Some(o) if o == owner =>
        // TOCTOU: a breaker can rename the lock away between the read and
        // the touch. That is still "lease lost" — surface it as the
        // advertised ConcurrentWriteException, not a raw FileNotFound.
        // (The converse race — a usurper publishing in the window so the
        // touch refreshes *their* lock's mtime — is benign: it only delays
        // the usurper's staleness clock.)
        try fs.setTimes(lock, System.currentTimeMillis(), -1)
        catch {
          case e: java.io.FileNotFoundException =>
            throw new MergeUpsert.ConcurrentWriteException(
              s"lease lost on $lock: lock vanished mid-heartbeat " +
                s"(broken by another writer); this writer is $owner; $e")
        }
        ()
      case other =>
        throw new MergeUpsert.ConcurrentWriteException(
          s"lease lost on $lock: held by ${other.getOrElse("<nobody>")}, " +
            s"this writer is $owner")
    }
  }

  /** Delete the lock — only if it still names this owner, so a displaced
    * writer's cleanup can't free the usurper's live lease.
    *
    * Acknowledged residual (no CAS primitive on [[FileSystem]]): the
    * check-then-delete pair is not atomic, so if this owner's lease went
    * stale and was usurped *between* the read and the delete, the delete
    * removes the usurper's live lock and a third writer may acquire
    * concurrently with the usurper. The usurper's next heartbeat detects
    * the loss and throws before its destructive swap, and per-token
    * staging keeps the writers' scratch data disjoint meanwhile — the
    * same containment as the post-read-back overwrite hole above.
    */
  def release(): Unit = {
    if (WriterLease.readOwner(fs, lock).contains(owner)) {
      fs.delete(lock, false)
    }
    ()
  }
}

object WriterLease {

  /** The lock protocol's correctness rests on single-file rename
    * atomicity, and a [[org.apache.hadoop.fs.ChecksumFileSystem]] (e.g.
    * `file://`'s LocalFileSystem) breaks that by construction: every
    * rename is two steps (data file, then `.crc` sidecar), so a racer
    * reading between them gets a ChecksumException, which would
    * masquerade as "lock vanished" and drain the re-contention budget to
    * a zero-winner race. Run the whole protocol on the raw filesystem —
    * lock files are ephemeral metadata; checksumming buys nothing here.
    */
  private def lockFs(fs: FileSystem): FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  /** First line of the lock file (the owner id): Some(owner) when the lock
    * exists and parses, None when it does not exist / vanished mid-read.
    * Reads to end-of-stream in a loop — a single InputStream.read may
    * legally return fewer bytes than available, and a truncated owner line
    * would masquerade as an ownership mismatch.
    */
  private def readOwner(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new java.io.ByteArrayOutputStream(256)
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0 && buf.size() < 65536) {
          buf.write(chunk, 0, n)
          n = in.read(chunk)
        }
        new String(buf.toByteArray, UTF_8).linesIterator.nextOption()
          .filter(_.nonEmpty)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Acquire the lease for `path`, breaking a stale lock if its mtime is
    * older than `staleMs`; throws [[MergeUpsert.ConcurrentWriteException]]
    * when a live writer holds it.
    */
  def acquire(rawOrChecksummed: FileSystem, path: String,
      staleMs: Long): WriterLease = {
    val fs = lockFs(rawOrChecksummed)
    val lock = new Path(path + "__lock")
    val token = java.util.UUID.randomUUID().toString
    val owner = s"${java.net.InetAddress.getLocalHost.getHostName}:" +
      s"${ProcessHandle.current().pid()}:$token"

    // Publish outcome: Won — the lock names us; Lost — it names someone
    // else (live holder, give up); Vanished — it is gone again (a breaker
    // raced us), worth re-contending.
    sealed trait Publish
    case object Won extends Publish
    case object Lost extends Publish
    case object Vanished extends Publish

    def tryPublish(): Publish = {
      val parent = lock.getParent
      if (parent != null) fs.mkdirs(parent)
      val tmp = new Path(s"${path}__lock.tmp.${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      out.write(s"$owner\n${System.currentTimeMillis()}\n".getBytes(UTF_8))
      out.close()
      val renamed = fs.rename(tmp, lock)
      if (!renamed) { fs.delete(tmp, false); return Lost }
      // On POSIX the rename may have replaced a racer's just-published lock
      // (or ours may be replaced an instant later): the lease belongs to
      // whoever the lock file names NOW. Read it back; seeing another owner
      // is losing the race, seeing nothing means a breaker renamed our lock
      // away (both-lose race) — contend again rather than orphan the lease.
      readOwner(fs, lock) match {
        case Some(o) if o == owner => Won
        case Some(_) => Lost
        case None => Vanished
      }
    }

    // Bounded re-contention: each pass stats first (never publish blind, so
    // a LIVE lock is never renamed over on filesystems whose rename
    // replaces the destination), then publishes into absence or a broken
    // stale lock. Only "the lock vanished under us" outcomes loop back.
    var attempt = 0
    while (attempt < 3) {
      attempt += 1
      val status =
        try Some(fs.getFileStatus(lock))
        catch { case _: java.io.FileNotFoundException => None }
      status match {
        case None =>
          tryPublish() match {
            case Won => return new WriterLease(fs, lock, owner, token)
            case Lost => throw concurrent(fs, path, lock, staleMs)
            case Vanished => // breaker raced us; contend again
          }
        case Some(s)
            if System.currentTimeMillis() - s.getModificationTime > staleMs =>
          // Stale break via rename to a unique name, NOT delete: of N racing
          // breakers exactly one rename succeeds (the source vanishes for the
          // rest), so two breakers can never both think they cleared the way.
          val broken = new Path(s"${path}__lock.broken.${java.util.UUID.randomUUID()}")
          val renamed =
            try fs.rename(lock, broken)
            catch { case scala.util.control.NonFatal(_) => false }
          if (renamed) {
            // verify we broke the lock we stat'd, not one freshly published
            // inside the stat window; if it's live, put it back and contend
            val brokenLive =
              try System.currentTimeMillis() -
                fs.getFileStatus(broken).getModificationTime <= staleMs
              catch { case _: java.io.FileNotFoundException => false }
            if (brokenLive) {
              fs.rename(broken, lock) // best effort; displaced holder's next
              throw concurrent(fs, path, lock, staleMs) // heartbeat catches a lost put-back
            } else {
              fs.delete(broken, false)
              tryPublish() match {
                case Won => return new WriterLease(fs, lock, owner, token)
                case Lost => throw concurrent(fs, path, lock, staleMs)
                case Vanished => // another breaker's rename landed mid-window
              }
            }
          }
          // rename failed: another breaker won the break; loop and contend
          // for the now-absent (or freshly republished) lock
        case _ =>
          // live holder — but it may be OUR OWN earlier publish: a breaker
          // that stat'd the old stale lock can rename our fresh lock away
          // (we read back None → Vanished → loop), then see it live and
          // restore it, leaving us contending against ourselves. Throwing
          // here would end the race with ZERO winners and an orphaned lock
          // naming a writer that gave up; reclaim instead.
          if (readOwner(fs, lock).contains(owner))
            return new WriterLease(fs, lock, owner, token)
          throw concurrent(fs, path, lock, staleMs)
      }
    }
    // re-contention budget exhausted — same self-check before giving up:
    // the last restore may have landed our lock after our final stat
    if (readOwner(fs, lock).contains(owner))
      return new WriterLease(fs, lock, owner, token)
    throw concurrent(fs, path, lock, staleMs)
  }

  private def concurrent(fs: FileSystem, path: String, lock: Path,
      staleMs: Long): MergeUpsert.ConcurrentWriteException = {
    val holder = readOwner(fs, lock).getOrElse("?")
    new MergeUpsert.ConcurrentWriteException(
      s"table $path is being written by $holder (lock ${lock}; " +
        s"stale after ${staleMs} ms)")
  }
}
