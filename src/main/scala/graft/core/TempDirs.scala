package graft.core

import java.nio.file.{Files, Path, Paths}

/** Process-lifetime temp directories with guaranteed exit-time cleanup.
  *
  * Most harness gates delete their scratch dirs eagerly in a `finally`;
  * the exception is state that must OUTLIVE its creating call — e.g. the
  * warehouse a [[graft.entry]] DAG charge writes is read by every later
  * DAG gate in the same JVM, so its root can only die at exit. Before
  * this hook existed, every Verify/Bench run leaked its DAG root
  * (1–14 GB each at sf0.1/×10) into the system temp dir on a perfectly
  * normal exit, eventually filling the disk.
  *
  * Deletion is best-effort (exceptions per-file swallowed): at JVM exit
  * Spark's own shutdown hooks may concurrently tear down streaming state
  * under these roots, and a half-deleted temp dir is still a win. */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => registered.forEach(deleteRecursively), "graft-tempdir-cleanup"))
  }

  /** Create a temp directory that is recursively deleted at JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  /** Eagerly delete a path (registered or not); idempotent. */
  def deleteNow(dir: String): Unit = {
    val p = Paths.get(dir)
    deleteRecursively(p)
    registered.remove(p)
    ()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[Path]()).forEach { f =>
        try { Files.deleteIfExists(f); () } catch { case _: Exception => () }
      } finally st.close()
    }
}
