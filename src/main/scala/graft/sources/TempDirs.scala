package graft.sources

/** Scratch directories for the driver-contract queries that build a
  * throwaway index per invocation (the self-contained form the driver
  * requires; a real deployment builds the index once and probes it —
  * see [[AnnIndex]]). Registered paths are deleted recursively at JVM
  * exit (shutdown hook) — within a long-lived session repeated
  * invocations DO accumulate scratch dirs until shutdown; callers that
  * loop index builds should delete their dir in a finally block and
  * treat the hook as a backstop.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        try deleteRecursively(p.toFile) catch { case _: Throwable => () }
      }
    }))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Create a temp directory and register it for deletion at JVM exit. */
  def scratch(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private val stableDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** One deterministic scratch dir per (prefix, key) for the lifetime
    * of this JVM — the cross-query artifact handoff (a train query
    * writes its frozen artifact here, the apply query loads it) without
    * a globally-shared path that could leak stale artifacts across
    * driver runs: the first call creates a fresh registered dir, later
    * calls with the same (prefix, key) return it.
    */
  def stable(prefix: String, key: String): String =
    stableDirs.computeIfAbsent(s"$prefix|$key", _ => scratch(prefix))
}
