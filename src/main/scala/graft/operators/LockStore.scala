package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Conditional-write lock backend — the seam that lets [[WriterLease]]'s
  * single-writer guarantee ride a store with real compare-and-swap
  * primitives instead of filesystem rename games.
  *
  * [[WriterLease]]'s rename-based protocol is documented correct on
  * HDFS-semantics filesystems and *contained* (never corrupting, but with
  * acknowledged displacement windows) on POSIX. Object stores are worse:
  * S3A has no atomic rename at all. But modern object stores expose
  * something strictly stronger — conditional writes (S3 `If-None-Match`
  * / `If-Match`, GCS `ifGenerationMatch`, ABFS ETag preconditions) — and
  * against this four-op contract the lease protocol in [[StoreLease]] is
  * fully race-free: exactly one creator, CAS-fenced heartbeat and
  * release, no both-lose or displaced-writer windows.
  *
  * Implementations provided here: [[InMemoryLockStore]] (atomic; real
  * coordination for multi-threaded single-JVM writers — the local[n]
  * deployment — and the reference double for specs) and [[FsLockStore]]
  * (adapter over Hadoop [[org.apache.hadoop.fs.FileSystem]]; best-effort,
  * see its caveats). An S3/GCS-backed implementation plugs in without
  * touching the protocol.
  */
trait LockStore {

  /** Atomically create `key` with `content` iff it does not exist.
    * True = created (caller owns it); false = something already there.
    */
  def createIfAbsent(key: String, content: Array[Byte]): Boolean

  /** Current content plus an opaque change tag (generation / ETag): the
    * tag MUST change on every successful create/replace/delete of `key`.
    * None when absent.
    */
  def readTagged(key: String): Option[(Array[Byte], String)]

  /** Replace content iff the stored tag still equals `tag`.
    * True = replaced; false = the key changed or vanished since the read.
    */
  def replaceIfTag(key: String, tag: String, content: Array[Byte]): Boolean

  /** Delete iff the stored tag still equals `tag`. True = deleted. */
  def deleteIfTag(key: String, tag: String): Boolean
}

/** Single-writer lease over a [[LockStore]] — the CAS-native counterpart
  * of [[WriterLease]]. Lock content is two lines: owner id, then the
  * acquire/refresh timestamp (millis). Staleness is judged from the
  * embedded timestamp, not store metadata — object stores disagree about
  * mtime semantics, and the embedded form also makes doubles exact.
  *
  * Against an atomic store the full protocol is race-free:
  *   - acquisition: `createIfAbsent` admits exactly one writer; a stale
  *     lock is removed with `deleteIfTag`, so of N breakers exactly one
  *     delete lands and the others re-contend against the new state.
  *   - heartbeat: `replaceIfTag` fenced on the tag read under this owner;
  *     a displaced writer's CAS fails and surfaces as the advertised
  *     [[MergeUpsert.ConcurrentWriteException]] before any destructive
  *     phase.
  *   - release: `deleteIfTag` fenced the same way — cleanup can never
  *     free a usurper's live lease (the non-atomic check-then-delete
  *     residual [[WriterLease.release]] documents does not exist here).
  */
final class StoreLease private (store: LockStore, key: String, owner: String,
    /** Unique per-acquisition id, usable as a filesystem-name component
      * for private scratch paths (same role as [[WriterLease.token]]).
      */
    val token: String,
    now: () => Long) extends TableLease {

  /** Re-assert ownership and refresh the staleness clock. Throws
    * [[MergeUpsert.ConcurrentWriteException]] if the lease was lost.
    */
  def heartbeat(): Unit =
    store.readTagged(key) match {
      case Some((bytes, tag)) if StoreLease.ownerOf(bytes).contains(owner) =>
        if (!store.replaceIfTag(key, tag,
            StoreLease.content(owner, now())))
          throw new MergeUpsert.ConcurrentWriteException(
            s"lease lost on $key: displaced between read and refresh; " +
              s"this writer is $owner")
      case other =>
        throw new MergeUpsert.ConcurrentWriteException(
          s"lease lost on $key: held by " +
            s"${other.flatMap(o => StoreLease.ownerOf(o._1)).getOrElse("<nobody>")}, " +
            s"this writer is $owner")
    }

  /** Delete the lock iff still owned — CAS-fenced, so a displaced
    * writer's cleanup is a no-op.
    */
  def release(): Unit =
    store.readTagged(key) match {
      case Some((bytes, tag)) if StoreLease.ownerOf(bytes).contains(owner) =>
        store.deleteIfTag(key, tag)
        ()
      case _ => ()
    }
}

object StoreLease {

  private def content(owner: String, ts: Long): Array[Byte] =
    s"$owner\n$ts\n".getBytes(UTF_8)

  private def ownerOf(bytes: Array[Byte]): Option[String] =
    new String(bytes, UTF_8).linesIterator.nextOption().filter(_.nonEmpty)

  private def tsOf(bytes: Array[Byte]): Option[Long] =
    new String(bytes, UTF_8).linesIterator.drop(1).nextOption()
      .flatMap(_.trim.toLongOption)

  /** Acquire the lease at `key`, breaking locks whose embedded timestamp
    * is older than `staleMs`; throws
    * [[MergeUpsert.ConcurrentWriteException]] when a live writer holds it.
    * `now` is injectable for deterministic staleness tests.
    */
  def acquire(store: LockStore, key: String, staleMs: Long,
      now: () => Long = () => System.currentTimeMillis()): StoreLease = {
    val token = java.util.UUID.randomUUID().toString
    val owner = s"${java.net.InetAddress.getLocalHost.getHostName}:" +
      s"${ProcessHandle.current().pid()}:$token"
    var attempt = 0
    // bounded: each loop iteration follows an observed state change by
    // another writer (create/delete landing), never a blind spin
    while (attempt < 5) {
      attempt += 1
      if (store.createIfAbsent(key, content(owner, now()))) {
        return new StoreLease(store, key, owner, token, now)
      }
      store.readTagged(key) match {
        case None => // holder vanished between ops; contend again
        case Some((bytes, tag)) =>
          val stale = tsOf(bytes).forall(ts => now() - ts > staleMs)
          if (!stale)
            throw new MergeUpsert.ConcurrentWriteException(
              s"$key is held by ${ownerOf(bytes).getOrElse("?")} " +
                s"(stale after $staleMs ms)")
          // of N racing breakers exactly one delete lands; the rest see
          // a tag mismatch and re-contend against whatever replaced it
          store.deleteIfTag(key, tag)
      }
    }
    throw new MergeUpsert.ConcurrentWriteException(
      s"$key: lost $attempt consecutive acquisition races")
  }
}

/** Atomic in-memory [[LockStore]] — real coordination for writers that
  * share a JVM (the local[n] deployment where merge jobs run as threads)
  * and the reference double for protocol specs. Generation counter per
  * key is the tag.
  */
final class InMemoryLockStore extends LockStore {
  private case class Entry(content: Array[Byte], gen: Long)
  private val entries = new java.util.HashMap[String, Entry]
  private var nextGen = 0L

  override def createIfAbsent(key: String, content: Array[Byte]): Boolean =
    synchronized {
      if (entries.containsKey(key)) false
      else { nextGen += 1; entries.put(key, Entry(content.clone(), nextGen)); true }
    }

  override def readTagged(key: String): Option[(Array[Byte], String)] =
    synchronized {
      Option(entries.get(key)).map(e => (e.content.clone(), e.gen.toString))
    }

  override def replaceIfTag(key: String, tag: String,
      content: Array[Byte]): Boolean =
    synchronized {
      Option(entries.get(key)) match {
        case Some(e) if e.gen.toString == tag =>
          nextGen += 1
          entries.put(key, Entry(content.clone(), nextGen))
          true
        case _ => false
      }
    }

  override def deleteIfTag(key: String, tag: String): Boolean =
    synchronized {
      Option(entries.get(key)) match {
        case Some(e) if e.gen.toString == tag => entries.remove(key); true
        case _ => false
      }
    }
}

/** [[LockStore]] adapter over a Hadoop [[org.apache.hadoop.fs.FileSystem]].
  *
  * Best-effort only: `FileSystem` has no conditional-write primitive, so
  * `createIfAbsent` leans on `create(overwrite = false)` (atomic on HDFS,
  * check-then-create on RawLocal) and the tag is a content hash plus
  * mtime — replace/delete are read-verify-act, not CAS. That makes this
  * adapter's guarantees comparable to [[WriterLease]]'s rename protocol,
  * NOT to a true conditional store; it exists so code written against
  * [[LockStore]] runs everywhere today and upgrades to real CAS by
  * swapping in an object-store implementation, no protocol changes.
  */
final class FsLockStore(fs: org.apache.hadoop.fs.FileSystem) extends LockStore {
  import org.apache.hadoop.fs.Path

  private def readAll(p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream(256)
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0 && buf.size() < 65536) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  /** mtime + length alone collide when a same-length replace lands within
    * one mtime granule, so the tag also hashes the content.
    */
  private def tagOf(p: Path, content: Array[Byte]): Option[String] =
    try {
      val st = fs.getFileStatus(p)
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(content)
      Some(s"${st.getModificationTime}:${st.getLen}:" +
        md5.map("%02x".format(_)).mkString)
    } catch { case _: java.io.FileNotFoundException => None }

  private def currentTag(p: Path): Option[String] =
    try tagOf(p, readAll(p))
    catch { case scala.util.control.NonFatal(_) => None }

  override def createIfAbsent(key: String, content: Array[Byte]): Boolean =
    try {
      val p = new Path(key)
      val parent = p.getParent
      if (parent != null) fs.mkdirs(parent)
      val out = fs.create(p, false) // EEXIST -> throws
      try out.write(content) finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  override def readTagged(key: String): Option[(Array[Byte], String)] =
    try {
      val p = new Path(key)
      val content = readAll(p)
      tagOf(p, content).map(tag => (content, tag))
    } catch { case scala.util.control.NonFatal(_) => None }

  override def replaceIfTag(key: String, tag: String,
      content: Array[Byte]): Boolean = {
    val p = new Path(key)
    if (!currentTag(p).contains(tag)) return false
    try {
      val out = fs.create(p, true)
      try out.write(content) finally out.close()
      true
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  override def deleteIfTag(key: String, tag: String): Boolean = {
    val p = new Path(key)
    if (!currentTag(p).contains(tag)) return false
    try fs.delete(p, false)
    catch { case scala.util.control.NonFatal(_) => false }
  }
}
