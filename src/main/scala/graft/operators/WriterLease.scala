package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets.UTF_8

/** Single-writer lease for a table path: a lock file at `path + "__lock"`
  * holding owner id + acquire time, heartbeated (mtime refresh) between
  * merge phases. A second writer fails fast with
  * [[MergeUpsert.ConcurrentWriteException]] instead of fighting the first
  * over `__staging`/`__commit` — the plain-parquet stand-in for the writer
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
  * The one remaining POSIX hole (an overwrite landing after the read-back)
  * is caught at the next `heartbeat()`, which verifies ownership before
  * refreshing and throws on mismatch — and [[MergeUpsert]] heartbeats
  * after staging, BEFORE the destructive swap, so a displaced writer dies
  * loudly without corrupting the table.
  *
  * Staleness: a lock whose mtime is older than `staleMs` belongs to a
  * writer presumed dead (crashed mid-merge without `release()`); it is
  * broken by renaming it to a unique name (one breaker wins even when
  * several race) and then contested. Heartbeats bound the false-death
  * window — the
  * owner refreshes after the expensive staging write, so `staleMs` only
  * needs to cover one phase, not the whole merge. Object stores without
  * atomic rename (S3A) need a real lock service instead.
  */
final class WriterLease private (fs: FileSystem, lock: Path, owner: String) {

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
        fs.setTimes(lock, System.currentTimeMillis(), -1)
        ()
      case other =>
        throw new MergeUpsert.ConcurrentWriteException(
          s"lease lost on $lock: held by ${other.getOrElse("<nobody>")}, " +
            s"this writer is $owner")
    }
  }

  /** Delete the lock — only if it still names this owner, so a displaced
    * writer's cleanup can't free the usurper's live lease.
    */
  def release(): Unit = {
    if (WriterLease.readOwner(fs, lock).contains(owner)) {
      fs.delete(lock, false)
    }
    ()
  }
}

object WriterLease {

  /** First line of the lock file (the owner id), or None if unreadable. */
  private def readOwner(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](4096)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), UTF_8).linesIterator.nextOption()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Acquire the lease for `path`, breaking a stale lock if its mtime is
    * older than `staleMs`; throws [[MergeUpsert.ConcurrentWriteException]]
    * when a live writer holds it.
    */
  def acquire(fs: FileSystem, path: String, staleMs: Long): WriterLease = {
    val lock = new Path(path + "__lock")
    val owner = s"${java.net.InetAddress.getLocalHost.getHostName}:" +
      s"${ProcessHandle.current().pid()}:${java.util.UUID.randomUUID()}"

    def tryPublish(): Boolean = {
      val parent = lock.getParent
      if (parent != null) fs.mkdirs(parent)
      val tmp = new Path(s"${path}__lock.tmp.${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      out.write(s"$owner\n${System.currentTimeMillis()}\n".getBytes(UTF_8))
      out.close()
      val won = fs.rename(tmp, lock)
      if (!won) { fs.delete(tmp, false); return false }
      // On POSIX the rename may have replaced a racer's just-published lock
      // (or ours may be replaced an instant later): the lease belongs to
      // whoever the lock file names NOW. Read it back; losing the read-back
      // is losing the race.
      readOwner(fs, lock).contains(owner)
    }

    // Never publish blind: stat first, so a LIVE lock is never renamed over
    // on filesystems whose rename replaces the destination.
    val status =
      try Some(fs.getFileStatus(lock))
      catch { case _: java.io.FileNotFoundException => None }
    status match {
      case None =>
        if (tryPublish()) return new WriterLease(fs, lock, owner)
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
            ()                      // heartbeat fails loudly if this loses
          } else {
            fs.delete(broken, false)
            if (tryPublish()) return new WriterLease(fs, lock, owner)
          }
        }
      case _ => // live holder
    }
    val holder = readOwner(fs, lock).getOrElse("?")
    throw new MergeUpsert.ConcurrentWriteException(
      s"table $path is being written by $holder (lock ${lock}; " +
        s"stale after ${staleMs} ms)")
  }
}
