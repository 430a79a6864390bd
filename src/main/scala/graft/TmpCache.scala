package graft

/** Naming + mutual exclusion for the tmp-dir caches (JSONL fixtures,
  * two-wave streamed states, persisted index builds) that the declared
  * queries build once per (source stamp, variant) and then only read.
  *
  * Two hazards these helpers close:
  *
  *  1. KEY COLLISION — the cache dirs used to be keyed by 32-bit
  *     `String.hashCode`, which collides at birthday rates (~77k distinct
  *     keys for a 50% collision); a collision would make a `_READY` marker
  *     silently serve the WRONG maintained state, with no error anywhere.
  *     [[dirKey]] keys by the first 16 hex chars of SHA-256 (64 bits,
  *     preimage-resistant) instead.
  *
  *  2. CONCURRENT BUILD — two JVMs that both miss the marker (Smoke and
  *     Verify deliberately SHARE several cache keys) would run the
  *     copy→stream chain concurrently against the same checkpoint and
  *     state dirs, corrupting the state. [[withBuildLock]] serializes
  *     builders per cache dir with an OS-level `FileLock` on a SIBLING
  *     lock file (sibling, not in-dir: some builders delete and recreate
  *     the dir itself mid-build). A file lock — unlike an exclusive-create
  *     sentinel — is released by the OS when the holder dies, so a crashed
  *     builder never wedges the next one; the crash-convergence of the
  *     build body itself is each caller's contract (deterministic landing
  *     names + checkpointed AvailableNow replays).
  *
  * All these caches live under `java.io.tmpdir` (local filesystem) by
  * construction — `FileLock` semantics are only assumed there.
  */
object TmpCache {

  /** 64-bit collision-resistant directory-name key for a cache-key string. */
  def dirKey(key: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  // FileLock is per-JVM-per-file: a second lock attempt from the SAME JVM
  // throws OverlappingFileLockException instead of blocking, so in-process
  // callers (parallel spec suites) serialize on a per-path monitor first.
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `body` holding an exclusive cross-process lock for `baseDir`.
    * Callers re-check their ready marker INSIDE the lock (the standard
    * double-checked build: the winner builds, waiters see the marker). */
  def withBuildLock[A](baseDir: String)(body: => A): A = {
    val monitor = jvmLocks.computeIfAbsent(baseDir, _ => new Object)
    monitor.synchronized {
      val lockPath = java.nio.file.Paths.get(baseDir + ".lock")
      Option(lockPath.getParent)
        .foreach(p => java.nio.file.Files.createDirectories(p))
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }
  }
}
