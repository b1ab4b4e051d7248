package graft.queries

import java.io.File

/** Per-process scratch namespace under /tmp/graft_scratch.
  *
  * Scratch dirs are keyed by the JVM pid so concurrent runs (e.g.
  * scripts/check.py while Bench is running) cannot delete each other's
  * files mid-read; the whole run dir is removed on JVM exit. The shared
  * message-corpus cache ([[graft.pipeline.Messages.corpusDir]]) stays
  * process-independent on purpose — it is version-keyed and written
  * atomically, and regenerating it per process would defeat the cache.
  */
object Scratch {

  private def rm(f: File): Unit = {
    if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rm) }
    f.delete()
  }

  private lazy val base: File = {
    val d = new File(s"/tmp/graft_scratch/run_${ProcessHandle.current().pid()}")
    d.mkdirs()
    sys.addShutdownHook(rm(d))
    d
  }

  /** A fresh (emptied) scratch directory for `name`, created. */
  def fresh(name: String): String = {
    val d = new File(base, name)
    if (d.exists()) rm(d)
    d.mkdirs()
    d.getAbsolutePath
  }

  /** A scratch path for `name` whose parent exists but which is left to
    * the caller (e.g. DataFrameWriter mode("overwrite")) to create. */
  def path(name: String): String = new File(base, name).getAbsolutePath
}
