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
  * temp file and renames it onto `__lock`. Hadoop `rename` refuses an
  * existing destination (HDFS and RawLocalFileSystem alike), so of two
  * racing writers exactly one wins — including after both decide the same
  * previous lock is stale: one breaker's rename lands first and the
  * loser's rename fails.
  *
  * Staleness: a lock whose mtime is older than `staleMs` belongs to a
  * writer presumed dead (crashed mid-merge without `release()`); it is
  * broken by renaming it to a unique name (one breaker wins even when
  * several race) and then contested. Heartbeats bound the false-death
  * window — the
  * owner refreshes after the expensive staging write, so `staleMs` only
  * needs to cover one phase, not the whole merge. Object stores without
  * atomic rename (S3A) need a real lock service instead; this protocol is
  * correct on HDFS-semantics filesystems.
  */
final class WriterLease private (fs: FileSystem, lock: Path) {

  /** Refresh the lock's mtime so a long merge isn't mistaken for a dead
    * writer. Call between phases; cheap (one metadata op).
    */
  def heartbeat(): Unit = {
    fs.setTimes(lock, System.currentTimeMillis(), -1)
    ()
  }

  def release(): Unit = {
    fs.delete(lock, false)
    ()
  }
}

object WriterLease {

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
      if (!won) fs.delete(tmp, false)
      won
    }

    if (tryPublish()) return new WriterLease(fs, lock)

    // lock exists: live or stale?
    val status =
      try Some(fs.getFileStatus(lock))
      catch { case _: java.io.FileNotFoundException => None }
    status match {
      case None =>
        // holder released between our publish and stat — contest again
        if (tryPublish()) return new WriterLease(fs, lock)
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
            if (tryPublish()) return new WriterLease(fs, lock)
          }
        }
      case _ => // live holder
    }
    val holder =
      try {
        val in = fs.open(lock)
        try {
          val buf = new Array[Byte](4096)
          val n = in.read(buf)
          new String(buf, 0, math.max(n, 0), UTF_8)
            .linesIterator.nextOption().getOrElse("?")
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => "?" }
    throw new MergeUpsert.ConcurrentWriteException(
      s"table $path is being written by $holder (lock ${lock}; " +
        s"stale after ${staleMs} ms)")
  }
}
