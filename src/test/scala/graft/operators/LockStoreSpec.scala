package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** [[StoreLease]] protocol battery, parameterized over conforming stores
  * (the atomic [[InMemoryLockStore]] reference and the
  * [[AdversarialLockStore]] in benign mode), plus adversarial scenarios —
  * spurious conditional-write failures and bounded read staleness — where
  * the asserted property is fail-SAFETY: mutual exclusion always holds
  * and degradation is a loud [[MergeUpsert.ConcurrentWriteException]],
  * never a silent double-writer. [[FsLockStore]] adapter semantics are
  * covered on the local filesystem at the bottom.
  */
class LockStoreSpec extends AnyFunSuite {

  private val Stale = 60_000L

  // ------------------------------------------------------------------
  // Protocol battery — every conforming store must pass all of it
  // ------------------------------------------------------------------

  private def battery(storeName: String, mkStore: () => LockStore): Unit = {

    test(s"[$storeName] exactly one of many racing writers acquires") {
      val store = mkStore()
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

    test(s"[$storeName] stale lock is broken; the displaced holder's heartbeat throws") {
      val store = mkStore()
      var clock = 1_000_000L
      val a = StoreLease.acquire(store, "k", Stale, () => clock)
      clock += Stale + 1 // a crashed / paused past staleness
      val b = StoreLease.acquire(store, "k", Stale, () => clock)
      b.heartbeat() // b's lease is live
      intercept[MergeUpsert.ConcurrentWriteException](a.heartbeat())
    }

    test(s"[$storeName] heartbeat refreshes the staleness clock") {
      val store = mkStore()
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

    test(s"[$storeName] displaced writer's release leaves the usurper's lock intact") {
      val store = mkStore()
      var clock = 1_000_000L
      val a = StoreLease.acquire(store, "k", Stale, () => clock)
      clock += Stale + 1
      val b = StoreLease.acquire(store, "k", Stale, () => clock)
      a.release() // CAS-fenced: must not free b's lease
      b.heartbeat()
      intercept[MergeUpsert.ConcurrentWriteException](a.heartbeat())
    }

    test(s"[$storeName] release frees the lock for the next writer") {
      val store = mkStore()
      val a = StoreLease.acquire(store, "k", Stale)
      a.release()
      val b = StoreLease.acquire(store, "k", Stale)
      b.release()
    }

    test(s"[$storeName] locks on different keys are independent") {
      val store = mkStore()
      val a = StoreLease.acquire(store, "k1", Stale)
      val b = StoreLease.acquire(store, "k2", Stale)
      a.heartbeat(); b.heartbeat()
      a.release(); b.release()
    }
  }

  battery("in-memory", () => new InMemoryLockStore)
  // benign mode: no faults injected — proves the double's true-state
  // transitions implement the LockStore contract before faults are layered
  battery("adversarial-benign", () => new AdversarialLockStore())

  // ------------------------------------------------------------------
  // Adversarial scenarios — out-of-contract store behavior must degrade
  // to loud aborts, never to two writers
  // ------------------------------------------------------------------

  test("spurious create failures: racing writers still end with at most one owner") {
    // every 5th conditional op reports failure without applying
    val store = new AdversarialLockStore(failRate = 0.2, seed = 42L)
    val n = 16
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val acquired = new java.util.concurrent.ConcurrentLinkedQueue[StoreLease]()
    val pool = Executors.newFixedThreadPool(n)
    (1 to n).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          ready.countDown(); go.await()
          try acquired.add(StoreLease.acquire(store, "k", Stale))
          catch { case _: MergeUpsert.ConcurrentWriteException => () }
          ()
        }
      })
    }
    ready.await(); go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    // mutual exclusion: the store applies at most one create while the key
    // exists, spurious failures only hide successes — so never two owners
    assert(acquired.size <= 1,
      s"mutual exclusion violated: ${acquired.size} acquirers")
    // and with retry-absorbing acquisition, someone actually won
    assert(acquired.size === 1,
      "zero acquires: spurious failures should be retried away")
    assert(store.trueOwner("k").isDefined)
  }

  test("spurious heartbeat CAS failure aborts loudly; staleness recovers the lock") {
    // op 1 = a's create (succeeds); op 2 = a's heartbeat replace — injected
    // to fail without applying. Fail-safe contract: heartbeat throws (the
    // writer aborts before any destructive phase), the lock stays intact,
    // and a later writer recovers it via the staleness break.
    val store = new AdversarialLockStore(failAt = Set(2L))
    var clock = 1_000_000L
    val a = StoreLease.acquire(store, "k", Stale, () => clock)
    intercept[MergeUpsert.ConcurrentWriteException](a.heartbeat())
    assert(store.spuriousFailures.get() === 1)
    // the abort was loud, not destructive: a still truly owns the lock
    assert(store.trueOwner("k").exists(_.contains(a.token)))
    // liveness recovers through the normal staleness path
    clock += Stale + 1
    val b = StoreLease.acquire(store, "k", Stale, () => clock)
    b.heartbeat()
    assert(store.trueOwner("k").exists(_.contains(b.token)))
  }

  test("spurious release failure leaves the lock; staleness, not corruption, frees it") {
    // op 1 = create, op 2 = release's deleteIfTag — fails without applying
    val store = new AdversarialLockStore(failAt = Set(2L))
    var clock = 1_000_000L
    val a = StoreLease.acquire(store, "k", Stale, () => clock)
    a.release() // best-effort: reports nothing, lock actually stays
    assert(store.trueOwner("k").exists(_.contains(a.token)))
    // a live-looking leftover blocks new writers (fail-safe)...
    intercept[MergeUpsert.ConcurrentWriteException](
      StoreLease.acquire(store, "k", Stale, () => clock))
    // ...until staleness breaks it
    clock += Stale + 1
    val b = StoreLease.acquire(store, "k", Stale, () => clock)
    b.heartbeat()
  }

  test("read-after-delete visibility: create-first acquisition is immune to stale reads") {
    val store = new AdversarialLockStore(staleReadWindow = 3)
    val a = StoreLease.acquire(store, "k", Stale)
    a.release() // delete applied; reads now serve the dead lock for a while
    // the dead lock is still VISIBLE to reads...
    assert(store.readTagged("k").isDefined)
    assert(store.staleReadsServed.get() >= 1)
    // ...but acquisition goes conditional-create-first against true state,
    // so the next writer wins immediately — no stale-read deadlock
    val b = StoreLease.acquire(store, "k", Stale)
    assert(store.trueOwner("k").exists(_.contains(b.token)))
    b.release()
  }

  test("stale heartbeat read degrades to a loud abort, never a silent double-owner") {
    val store = new AdversarialLockStore(staleReadWindow = 1)
    val a = StoreLease.acquire(store, "k", Stale)
    a.heartbeat() // replace succeeds; superseded version enters the stale window
    // next heartbeat reads the SUPERSEDED version (own owner, old tag): the
    // CAS fenced on that tag fails against true state → loud lease-lost.
    // This is the documented degradation on not-strongly-consistent reads:
    // the writer stops, the table is untouched, nobody else was admitted.
    intercept[MergeUpsert.ConcurrentWriteException](a.heartbeat())
    assert(store.staleReadsServed.get() >= 1)
    assert(store.trueOwner("k").exists(_.contains(a.token)),
      "the abort must be fail-safe: no other writer was admitted")
    // no second owner could have slipped in at any point
    intercept[MergeUpsert.ConcurrentWriteException](
      StoreLease.acquire(store, "k", Stale))
  }

  test("combined faults under contention: at most one live leaseholder after arbitration") {
    val store = new AdversarialLockStore(
      failRate = 0.15, staleReadWindow = 1, seed = 1234L)
    var clock = 1_000_000L
    // a stale lock everyone wants to break
    StoreLease.acquire(store, "k", Stale, () => clock)
    clock += Stale + 1
    val frozen = clock // racers share a frozen clock
    val acquired = new java.util.concurrent.ConcurrentLinkedQueue[StoreLease]()
    val threads = (1 to 12).map { _ =>
      new Thread(() => {
        try acquired.add(StoreLease.acquire(store, "k", Stale, () => frozen))
        catch { case _: MergeUpsert.ConcurrentWriteException => () }
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30_000))
    // heartbeat arbitrates (the WriterLeaseSpec methodology): at most one
    // survivor; stale reads can also fail the true owner's arbitration
    // heartbeat, which is a liveness loss, not a safety one
    val survivors = acquired.toArray(Array.empty[StoreLease]).count { l =>
      try { l.heartbeat(); true }
      catch { case _: MergeUpsert.ConcurrentWriteException => false }
    }
    assert(acquired.size <= 1,
      s"mutual exclusion violated: ${acquired.size} acquirers")
    assert(survivors <= acquired.size,
      s"${acquired.size} acquirers, $survivors heartbeat survivors")
    assert(store.spuriousFailures.get() + store.staleReadsServed.get() > 0,
      "the scenario must actually have exercised faults")
  }

  // ------------------------------------------------------------------
  // FsLockStore adapter semantics
  // ------------------------------------------------------------------

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
