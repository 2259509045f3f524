package graft.operators

/** Per-invocation scratch directories for queries whose semantics include
  * a sink→source round-trip (CSV/partitioned writes, persisted label
  * tables). A fresh `Files.createTempDirectory` per call — a fixed
  * hashCode-derived shared path lets two concurrent runs of the same
  * fixture (bench + spec) race on the overwrite/read. Staged files are
  * read lazily by the returned DataFrames, so deletion is deferred to a
  * JVM shutdown hook rather than performed inline.
  */
private[graft] object Scratch {
  // one dir per (prefix, JVM): repeat runs of the same query in one
  // process (bench reps, spec + gate) overwrite in place instead of
  // accumulating a staged copy per rep; distinct processes still get
  // distinct dirs, which is the race the fixed tmp path had
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dir(prefix: String): String = dirs.computeIfAbsent(prefix, { _ =>
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(): Unit
      }
      rm(d.toFile)
    }))
    // Spark's writer wants a non-existent or overwritable target; hand it
    // a child of the unique dir so mode("overwrite") semantics still hold
    d.resolve("data").toString
  })

  private val hooks = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register a best-effort JVM-shutdown cleanup exactly once per `key` —
    * repeat invocations in one process (bench reps, spec + gate) must not
    * pile up hooks. Failures are swallowed: the session a hook captured
    * may already be stopped at shutdown.
    */
  def once(key: String)(f: => Unit): Unit =
    if (hooks.add(key)) Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try f catch { case _: Throwable => () }
    }))
}
