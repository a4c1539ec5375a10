package graft.core

/** Throwaway scratch directories for replay harnesses (streaming
  * checkpoints, per-replay dedup state roots, staged stream chunks).
  *
  * Prefers tmpfs (`/dev/shm`) over `java.io.tmpdir`: the HDFS-backed
  * state store fsyncs a delta file per state partition per micro-batch,
  * and every per-batch parquet state write pays a FileOutputCommitter
  * listing + rename pass — on a DISK-backed /tmp those metadata syncs,
  * not the joins, dominate a multi-batch replay (measured in the
  * round-17 profile: ~100 ms of driver gap per job across the
  * stream-dedup replays, state roots on ext4). A real deployment puts
  * state and checkpoints on durable storage for recovery; these harness
  * dirs are discarded on stop, so durability buys nothing — the same
  * policy [[graft.streaming.Streams.runToMemory]] documented for its
  * checkpoints, now shared by every throwaway dir creator.
  *
  * Round-18 hardening (r17 advice):
  *  - `GRAFT_SCRATCH_DIR` (env) / `graft.scratch.dir` (sysprop) override
  *    the base outright — the escape hatch for hosts whose /dev/shm is
  *    too small for a replay's state trees;
  *  - tmpfs is only chosen when it reports comfortable FREE space
  *    ([[MinFreeBytes]]) — /dev/shm is typically capped at 50% of RAM
  *    and competes with the JVM heap, and a mid-stream ENOSPC where the
  *    disk path would have succeeded is strictly worse than slower
  *    metadata syncs;
  *  - every [[tempDir]] is registered with ONE JVM shutdown hook that
  *    recursively deletes it. `deleteOnExit()` on the top-level dir
  *    cannot remove the non-empty state tree Spark writes underneath,
  *    so each bench/verify run used to leak its full state+admitted
  *    tree into RAM-backed /dev/shm past JVM exit (accumulating until
  *    the host dropped caches). Callers that delete eagerly still win
  *    (the hook's deleteIfExists walk is a no-op on a gone dir).
  */
object Scratch {
  /** Don't pick tmpfs with less than this free — a replay's state trees
    * plus staged chunks are tens of MB at sf0.1 and GB-scale on the 30×
    * soak replays; 2 GiB of headroom keeps the heap and the harness from
    * fighting over the same RAM. */
  private val MinFreeBytes = 2L * 1024 * 1024 * 1024

  /** Scratch base, in priority order: explicit override
    * (GRAFT_SCRATCH_DIR env, then graft.scratch.dir sysprop) → tmpfs
    * `/dev/shm` when writable with ≥ [[MinFreeBytes]] free →
    * `java.io.tmpdir`. */
  def base: java.nio.file.Path = {
    val explicit = sys.env.get("GRAFT_SCRATCH_DIR")
      .orElse(sys.props.get("graft.scratch.dir"))
      .map(java.nio.file.Paths.get(_))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        java.nio.file.Files.isWritable(p))
    explicit.getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      val shmOk = java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm) &&
        (try shm.toFile.getUsableSpace >= MinFreeBytes
         catch { case _: Throwable => false })
      if (shmOk) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    }
  }

  // dirs this JVM created and still owes a recursive delete; one hook,
  // registered lazily on first use
  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(rmTree(_))
    }, "graft-scratch-cleanup"))
    true
  }

  /** Best-effort recursive delete (missing dir is fine). */
  def rmTree(dir: java.nio.file.Path): Unit = {
    try {
      if (java.nio.file.Files.exists(dir)) {
        val walk = java.nio.file.Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () }
    created.remove(dir); ()
  }

  /** Fresh throwaway directory under [[base]], recursively deleted at
    * JVM exit (callers that finish earlier should still [[rmTree]] or
    * delete explicitly — long-lived sessions shouldn't accumulate
    * finished replays in tmpfs). */
  def tempDir(prefix: String): java.nio.file.Path = {
    val _ = hookInstalled
    val d = java.nio.file.Files.createTempDirectory(base, prefix)
    created.add(d)
    d
  }
}
