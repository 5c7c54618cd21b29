package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** [[StoreLease]] protocol against the atomic [[InMemoryLockStore]]
  * reference (race, staleness, displacement, CAS-fenced cleanup) plus the
  * [[FsLockStore]] adapter's operation semantics on the local filesystem.
  */
class LockStoreSpec extends AnyFunSuite {

  private val Stale = 60_000L

  test("exactly one of many racing writers acquires") {
    val store = new InMemoryLockStore
    val n = 16
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val wins = new AtomicInteger
    val losses = new AtomicInteger
    val pool = Executors.newFixedThreadPool(n)
    (1 to n).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          ready.countDown(); go.await()
          try { StoreLease.acquire(store, "k", Stale); wins.incrementAndGet() }
          catch { case _: MergeUpsert.ConcurrentWriteException => losses.incrementAndGet() }
          ()
        }
      })
    }
    ready.await(); go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() === 1)
    assert(losses.get() === n - 1)
  }

  test("stale lock is broken; the displaced holder's heartbeat throws") {
    val store = new InMemoryLockStore
    var clock = 1_000_000L
    val a = StoreLease.acquire(store, "k", Stale, () => clock)
    clock += Stale + 1 // a crashed / paused past staleness
    val b = StoreLease.acquire(store, "k", Stale, () => clock)
    b.heartbeat() // b's lease is live
    intercept[MergeUpsert.ConcurrentWriteException](a.heartbeat())
  }

  test("heartbeat refreshes the staleness clock") {
    val store = new InMemoryLockStore
    var clock = 1_000_000L
    val a = StoreLease.acquire(store, "k", Stale, () => clock)
    clock += Stale - 1
    a.heartbeat() // refresh just before staleness
    clock += Stale - 1
    // still live from the refresh -> a contender must lose, not break
    intercept[MergeUpsert.ConcurrentWriteException](
      StoreLease.acquire(store, "k", Stale, () => clock))
    a.heartbeat() // and the original holder is unharmed
  }

  test("displaced writer's release leaves the usurper's lock intact") {
    val store = new InMemoryLockStore
    var clock = 1_000_000L
    val a = StoreLease.acquire(store, "k", Stale, () => clock)
    clock += Stale + 1
    val b = StoreLease.acquire(store, "k", Stale, () => clock)
    a.release() // CAS-fenced: must not free b's lease
    b.heartbeat()
    intercept[MergeUpsert.ConcurrentWriteException](a.heartbeat())
  }

  test("release frees the lock for the next writer") {
    val store = new InMemoryLockStore
    val a = StoreLease.acquire(store, "k", Stale)
    a.release()
    val b = StoreLease.acquire(store, "k", Stale)
    b.release()
  }

  test("locks on different keys are independent") {
    val store = new InMemoryLockStore
    val a = StoreLease.acquire(store, "k1", Stale)
    val b = StoreLease.acquire(store, "k2", Stale)
    a.heartbeat(); b.heartbeat()
    a.release(); b.release()
  }

  test("FsLockStore operation semantics on the local filesystem") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val dir = java.nio.file.Files.createTempDirectory("graft-lockstore")
    val key = s"$dir/table__lock"
    val store = new FsLockStore(fs)

    assert(store.createIfAbsent(key, "owner-a\n1\n".getBytes))
    assert(!store.createIfAbsent(key, "owner-b\n2\n".getBytes)) // EEXIST
    val (bytes, tag) = store.readTagged(key).get
    assert(new String(bytes).startsWith("owner-a"))

    assert(!store.replaceIfTag(key, tag + "x", "owner-c\n3\n".getBytes))
    assert(store.replaceIfTag(key, tag, "owner-a\n4\n".getBytes))
    val (bytes2, tag2) = store.readTagged(key).get
    assert(new String(bytes2).endsWith("4\n"))

    assert(!store.deleteIfTag(key, tag)) // stale tag
    assert(store.deleteIfTag(key, tag2))
    assert(store.readTagged(key).isEmpty)
    assert(store.createIfAbsent(key, "owner-d\n5\n".getBytes)) // reusable
  }

  test("StoreLease rides FsLockStore end to end") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val dir = java.nio.file.Files.createTempDirectory("graft-storelease")
    val key = s"$dir/t__lock"
    val store = new FsLockStore(fs)
    val a = StoreLease.acquire(store, key, Stale)
    a.heartbeat()
    intercept[MergeUpsert.ConcurrentWriteException](
      StoreLease.acquire(store, key, Stale))
    a.release()
    val b = StoreLease.acquire(store, key, Stale)
    b.release()
  }
}
