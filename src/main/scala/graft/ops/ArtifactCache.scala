package graft.ops

/** Cross-process BUILD-ONCE artifact cache under `java.io.tmpdir` —
  * the machinery behind the `_apply` bench cells: a stored bundle or
  * clustered fixture is built on the first call per (identity,
  * fingerprint) and every later call — any thread, any process —
  * reads the persisted copy, so the timed path measures read-stored +
  * work, never construction.
  *
  * Key discipline (the round-15 advisory fixes):
  *  - the directory name embeds the FULL identity and fingerprint
  *    strings (never a 32-bit hash) plus the caller's recipe tag, so
  *    a regenerated fixture, a changed build parameter, or a new
  *    recipe version can NEVER silently reuse a stale bundle — the
  *    key simply differs and a fresh root builds;
  *  - a JVM-wide lock serializes threads and a file lock serializes
  *    processes around the `_DONE` marker (without it, two processes
  *    interleave `mode("overwrite")` writes and cache a torn bundle
  *    forever);
  *  - `_OWNER_PID` records the building process, so the reaper can
  *    tell a TORN root (builder died mid-write — reaped once old and
  *    ownerless) from one still being built;
  *  - stale sibling GENERATIONS (same family+identity, different
  *    fingerprint — the regenerated-testdata case) reap best-effort
  *    once past a grace hour, so tmp does not accumulate one bundle
  *    per regeneration.
  */
object ArtifactCache {

  private val jvmLock = new Object
  private val graceMs = 3600L * 1000

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')

  /** Write the current pid into `dir/_OWNER_PID` (best-effort). */
  private[graft] def writeOwnerPid(dir: java.io.File): Unit =
    try
      java.nio.file.Files.write(new java.io.File(dir, "_OWNER_PID").toPath,
        ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    catch { case _: Exception => () }

  /** Is the process recorded in `dir/_OWNER_PID` still alive? False
    * when the pid file is missing or unreadable (legacy dirs fall
    * back to the age rule alone). */
  private[graft] def ownerAlive(dir: java.io.File): Boolean =
    try {
      val f = new java.io.File(dir, "_OWNER_PID")
      if (!f.exists()) false
      else {
        val pid = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
        ProcessHandle.of(pid).isPresent
      }
    } catch { case _: Exception => false }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Best-effort reap of `prefix`-siblings of `current` under `tmp`:
    * completed stale generations (have `_DONE`, different
    * fingerprint) go once past the grace hour; torn roots (no
    * `_DONE`) additionally require a DEAD recorded owner, so a
    * concurrent build in flight — however slow — is never deleted
    * from under its process. */
  private def reapStale(tmp: java.io.File, prefix: String, current: String): Unit =
    try {
      val cutoff = System.currentTimeMillis() - graceMs
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
          f.getName != current && f.lastModified < cutoff)
        .filter(f => new java.io.File(f, "_DONE").exists() || !ownerAlive(f))
        .foreach(deleteRecursively)
    } catch { case _: Exception => () } // reaping is best-effort only

  /** The cached root for (`family`, `identity`, `fingerprint`);
    * `build` runs EXACTLY ONCE per key across threads and processes
    * (later callers block on the file lock until `_DONE` lands, then
    * read). `identity` names WHAT is cached (testdata dir + variant);
    * `fingerprint` must change whenever the inputs or the build
    * recipe change (file length+mtime plus a recipe/params tag — the
    * caller's contract). */
  def getOrBuild(family: String, identity: String, fingerprint: String)
                (build: java.io.File => Unit): java.io.File = {
    val prefix = s"graft-$family-${sanitize(identity)}-"
    val name = prefix + sanitize(fingerprint)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val root = new java.io.File(tmp, name)
    jvmLock.synchronized {
      reapStale(tmp, prefix, name)
      if (!new java.io.File(root, "_DONE").exists()) {
        root.mkdirs()
        writeOwnerPid(root)
        val lockCh = java.nio.channels.FileChannel.open(
          new java.io.File(root, "_LOCK").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = lockCh.lock()
          try {
            if (!new java.io.File(root, "_DONE").exists()) {
              build(root)
              new java.io.File(root, "_DONE").createNewFile()
              ()
            }
          } finally lock.release()
        } finally lockCh.close()
      }
    }
    root
  }
}
