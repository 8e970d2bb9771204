package graft.ops

/** Cross-process BUILD-ONCE artifact cache under `java.io.tmpdir` —
  * the machinery behind the `_apply` bench cells: a stored bundle or
  * clustered fixture is built on the first call per (identity,
  * fingerprint) and every later call — any thread, any process —
  * reads the persisted copy, so the timed path measures read-stored +
  * work, never construction.
  *
  * Key discipline (the round-15 advisory fixes, tightened by the
  * round-16 review):
  *  - the directory name embeds the FULL identity and fingerprint
  *    strings (never a 32-bit hash) plus the caller's recipe tag, so
  *    a regenerated fixture, a changed build parameter, or a new
  *    recipe version can NEVER silently reuse a stale bundle — the
  *    key simply differs and a fresh root builds; `-` is reserved as
  *    the name separator (sanitize maps it to `_`), so one
  *    identity's reap can never prefix-match a different identity's
  *    directory;
  *  - a JVM-wide lock serializes threads and a file lock serializes
  *    processes around the `_DONE` marker (without it, two processes
  *    interleave `mode("overwrite")` writes and cache a torn bundle
  *    forever);
  *  - `_OWNER_PID` records the BUILDER and is written only while the
  *    file lock is held (a waiting process must not clobber it — a
  *    dead waiter would make a paused in-flight build look torn and
  *    reapable);
  *  - every `getOrBuild` touches the root's mtime, so a root any
  *    live process is still consulting keeps renewing itself;
  *  - the reaper deletes family siblings only when BOTH old (past
  *    the grace hour since last touch) AND ownerless (recorded
  *    builder dead) — that covers torn builds, stale generations
  *    from regenerated testdata, and the per-run scaled corpora the
  *    sf1 ledger creates, without ever deleting under a live
  *    process.
  */
object ArtifactCache {

  private val jvmLock = new Object
  private val graceMs = 3600L * 1000

  /** `-` maps to `_` like every other separator: the directory name
    * joins family/identity/fingerprint with `-`, and an identity
    * containing a literal dash could otherwise make one identity's
    * reap prefix-match another's directory. */
  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '.') c else '_')

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

  /** Best-effort reap of FAMILY siblings of `current` under `tmp`:
    * a sibling goes only when BOTH old (last touched before the
    * grace hour — `getOrBuild` refreshes mtime on every read, so a
    * root in active use keeps renewing) AND its recorded builder is
    * dead. Covers torn builds, stale fingerprint generations, and
    * never-again-reachable roots keyed to deleted temp corpora. */
  private def reapStale(tmp: java.io.File, familyPrefix: String,
                        current: String): Unit =
    try {
      val cutoff = System.currentTimeMillis() - graceMs
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith(familyPrefix) &&
          f.getName != current && f.lastModified < cutoff && !ownerAlive(f))
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
    val familyPrefix = s"graft-${sanitize(family)}-"
    val name = familyPrefix + sanitize(identity) + "-" + sanitize(fingerprint)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val root = new java.io.File(tmp, name)
    jvmLock.synchronized {
      reapStale(tmp, familyPrefix, name)
      if (!new java.io.File(root, "_DONE").exists()) {
        root.mkdirs()
        val lockCh = java.nio.channels.FileChannel.open(
          new java.io.File(root, "_LOCK").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = lockCh.lock()
          try {
            if (!new java.io.File(root, "_DONE").exists()) {
              // only the actual BUILDER records its pid — see scaladoc
              writeOwnerPid(root)
              build(root)
              new java.io.File(root, "_DONE").createNewFile()
              ()
            }
          } finally lock.release()
        } finally lockCh.close()
      }
      // a reader's touch renews the root against the reaper's age rule
      root.setLastModified(System.currentTimeMillis())
      ()
    }
    root
  }

  /** Fresh UNIQUE scratch dir for `tag`, reaping old same-tag dirs
    * whose recorded owner is dead — the shared spelling of the
    * zone-query scratch discipline (each invocation writes a derived
    * table; reruns would otherwise leak one copy per call; a paused
    * live suite's dir is never deleted from under it). */
  def scratchDir(tag: String): String = {
    try {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      val cutoff = System.currentTimeMillis() - graceMs
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith(s"graft-$tag-") &&
          f.lastModified < cutoff && !ownerAlive(f))
        .foreach(deleteRecursively)
    } catch { case _: Exception => () } // reaping is best-effort only
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
    writeOwnerPid(d.toFile)
    d.toString
  }
}
