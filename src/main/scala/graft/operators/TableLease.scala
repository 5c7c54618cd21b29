package graft.operators

/** What [[MergeUpsert]] needs from a single-writer table lease, whatever
  * backend enforces it: the rename-protocol [[WriterLease]] (HDFS-semantics
  * filesystems) or the CAS-native [[StoreLease]] (any [[LockStore]] —
  * in-memory for single-JVM thread coordination, conditional-write object
  * stores at scale).
  */
trait TableLease {

  /** Unique per-acquisition id, safe as a filesystem-name component —
    * writers derive private staging paths from it so concurrent
    * leaseholders in a displacement window can never touch each other's
    * staged data.
    */
  def token: String

  /** Re-assert ownership and refresh the staleness clock; throws
    * [[MergeUpsert.ConcurrentWriteException]] if the lease was lost.
    * Called between merge phases, always before the destructive swap.
    */
  def heartbeat(): Unit

  /** Free the lock iff still owned; a displaced writer's cleanup must
    * never release the usurper's live lease.
    */
  def release(): Unit
}
