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
  */
object Scratch {
  /** tmpfs base when present and writable, else `java.io.tmpdir`. */
  def base: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Fresh throwaway directory under [[base]]. Callers own deletion
    * (deleteOnExit or explicit walk) exactly as before. */
  def tempDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)
}
