package graft.core

import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer

/** Per-invocation temp directories that are cleaned up at JVM exit.
  *
  * Operators stage artifacts (format round-trips, stream file sinks,
  * saved indexes, binary-asset stores) into UNIQUE directories so a
  * re-run can never delete a store a still-held lazy frame points at
  * — but unique dirs accumulate, and nothing else ever deletes them.
  * One shutdown hook sweeps everything this JVM created; a directory
  * therefore lives exactly as long as any frame that can read it. */
object RunTemp {

  private val created = ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized { created.foreach(deleteRecursively) }))

  /** Create a unique directory under the JVM tmpdir, registered for
    * recursive deletion at JVM shutdown. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.synchronized { created += p }
    p.toString
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
      finally s.close()
    }
}
