package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Conditional-put commit-store double for [[DeltaLog.CommitStoreClassConf]]:
  * atomicity from a JVM-global monitor (standing in for S3 If-None-Match /
  * GCS ifGenerationMatch), durability by actually writing the bytes at the
  * key — the contract a real object-store LogStore provides. Zero-arg
  * constructor because the conf carries only a class name.
  */
final class TestCommitStore extends graft.operators.LockStore {
  import TestCommitStore._

  private def pathOf(key: String): java.nio.file.Path = {
    val uri = new java.net.URI(key)
    if (uri.getScheme == null) Paths.get(key) else Paths.get(uri)
  }

  override def createIfAbsent(key: String, content: Array[Byte]): Boolean =
    monitor.synchronized {
      val p = pathOf(key)
      if (Files.exists(p)) false
      else {
        Files.createDirectories(p.getParent)
        Files.write(p, content, StandardOpenOption.CREATE_NEW)
        puts.incrementAndGet()
        true
      }
    }

  override def readTagged(key: String): Option[(Array[Byte], String)] =
    monitor.synchronized {
      val p = pathOf(key)
      if (!Files.exists(p)) None
      else {
        val bytes = Files.readAllBytes(p)
        Some((bytes, java.util.Arrays.hashCode(bytes).toString))
      }
    }

  override def replaceIfTag(key: String, tag: String,
      content: Array[Byte]): Boolean =
    monitor.synchronized {
      readTagged(key) match {
        case Some((_, t)) if t == tag =>
          Files.write(pathOf(key), content); true
        case _ => false
      }
    }

  override def deleteIfTag(key: String, tag: String): Boolean =
    monitor.synchronized {
      readTagged(key) match {
        case Some((_, t)) if t == tag => Files.delete(pathOf(key)); true
        case _ => false
      }
    }
}

object TestCommitStore {
  val monitor = new Object
  /** Successful conditional puts — lets specs assert the commit actually
    * routed through the store rather than the filesystem protocol.
    */
  val puts = new java.util.concurrent.atomic.AtomicInteger(0)
}
