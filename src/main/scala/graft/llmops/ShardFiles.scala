package graft.llmops

/** Shared failure-path discipline for the distributed shard writers
  * (tar / TFRecord / Avro / Arrow / ORC / Megatron / BGZF /
  * seekable-zstd / xz): a shard that fails mid-write must not survive
  * on disk as a structurally valid file missing rows. [[abort]] closes
  * the stream quietly and best-effort deletes the partial file; the
  * caller rethrows the ORIGINAL failure, which nothing here may mask.
  */
private[llmops] object ShardFiles {

  def abort(out: java.io.OutputStream,
      path: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    // Throwable, not Exception: the caller is already unwinding with the
    // ORIGINAL failure; anything close()/delete() throws here — including
    // non-Exception Errors (codec LinkageError, assertion failures) — must
    // not replace it, and must not skip the partial-file delete.
    if (out != null) {
      try out.close() catch { case _: Throwable => () }
    }
    if (path != null) {
      try path.getFileSystem(conf).delete(path, false)
      catch { case _: Throwable => () }
    }
  }
}
