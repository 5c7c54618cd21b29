package graft.operators

/** Fault-injecting [[LockStore]] double modeling a real object store's
  * conditional-write plane at its worst:
  *
  *   - **tag churn**: every successful mutation changes the tag
  *     (generation counter — the ETag contract), so any CAS fenced on a
  *     pre-mutation read fails;
  *   - **spurious conditional-write failures**: a conditional op can
  *     report failure without applying (the observable client effect of
  *     a 412/409 race or a retried-timeout ambiguity where the caller
  *     must assume failure). Injected deterministically via `failAt`
  *     (global 1-based conditional-op indices) and/or a seeded `failRate`;
  *   - **bounded read staleness**: after a replace or delete, the
  *     superseded version keeps being served to `readTagged` for the next
  *     `staleReadWindow` reads of that key (read-after-delete visibility;
  *     pre-2020 S3 / multi-region semantics). Conditional ops always
  *     evaluate against the TRUE current state — that is what makes the
  *     store's writes "conditional" — only reads lie.
  *
  * True state transitions are atomic (synchronized), so the double tests
  * the protocol, not torn updates. Counters expose how many faults
  * actually fired so specs can assert the scenario was exercised.
  */
final class AdversarialLockStore(
    failAt: Set[Long] = Set.empty,
    failRate: Double = 0.0,
    staleReadWindow: Int = 0,
    seed: Long = 7L) extends LockStore {

  private case class Entry(content: Array[Byte], gen: Long)
  private val entries = new java.util.HashMap[String, Entry]
  // superseded version still visible for N more reads of the key; the
  // Option is None when the stale view is "key absent" (never used today:
  // creation is immediately visible — S3-strong create, stale overwrite)
  private val staleView = new java.util.HashMap[String, (Entry, Int)]
  private val rng = new java.util.Random(seed)
  private var nextGen = 0L
  private var condOps = 0L

  val spuriousFailures = new java.util.concurrent.atomic.AtomicInteger
  val staleReadsServed = new java.util.concurrent.atomic.AtomicInteger

  /** Must be called inside `synchronized` — decides whether THIS
    * conditional op (would-succeed) spuriously reports failure.
    */
  private def spurious(): Boolean = {
    condOps += 1
    val hit = failAt.contains(condOps) || rng.nextDouble() < failRate
    if (hit) spuriousFailures.incrementAndGet()
    hit
  }

  private def supersede(key: String, prev: Entry): Unit =
    if (staleReadWindow > 0) { staleView.put(key, (prev, staleReadWindow)); () }

  override def createIfAbsent(key: String, content: Array[Byte]): Boolean =
    synchronized {
      if (entries.containsKey(key)) { condOps += 1; false }
      else if (spurious()) false
      else {
        nextGen += 1
        entries.put(key, Entry(content.clone(), nextGen))
        true
      }
    }

  override def readTagged(key: String): Option[(Array[Byte], String)] =
    synchronized {
      Option(staleView.get(key)) match {
        case Some((e, n)) =>
          if (n <= 1) staleView.remove(key) else staleView.put(key, (e, n - 1))
          staleReadsServed.incrementAndGet()
          Some((e.content.clone(), e.gen.toString))
        case None =>
          Option(entries.get(key)).map(e => (e.content.clone(), e.gen.toString))
      }
    }

  override def replaceIfTag(key: String, tag: String,
      content: Array[Byte]): Boolean =
    synchronized {
      Option(entries.get(key)) match {
        case Some(e) if e.gen.toString == tag =>
          if (spurious()) false
          else {
            nextGen += 1
            entries.put(key, Entry(content.clone(), nextGen))
            supersede(key, e)
            true
          }
        case _ => condOps += 1; false
      }
    }

  override def deleteIfTag(key: String, tag: String): Boolean =
    synchronized {
      Option(entries.get(key)) match {
        case Some(e) if e.gen.toString == tag =>
          if (spurious()) false
          else { entries.remove(key); supersede(key, e); true }
        case _ => condOps += 1; false
      }
    }

  /** True current owner line, bypassing staleness — for spec assertions. */
  def trueOwner(key: String): Option[String] = synchronized {
    Option(entries.get(key)).flatMap(e =>
      new String(e.content, java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.nextOption())
  }
}
