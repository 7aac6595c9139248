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

  /** Most-recent directories kept per prefix; older siblings are
    * reaped on the next [[dir]] call with that prefix. Bounds the
    * disk a LONG-LIVED process accumulates (benchmark loops calling
    * the same stage/drain/save sites every round) while staying far
    * above the number of same-prefix artifacts any single round holds
    * live frames over — the old fixed-path design was effectively
    * keep=1 (overwrite in place), so keep=8 is strictly safer than
    * what it replaced. */
  private val keepPerPrefix = 8

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized { created.foreach(deleteRecursively) }))

  /** Create a unique directory under the JVM tmpdir, registered for
    * recursive deletion at JVM shutdown; reaps same-prefix dirs beyond
    * the [[keepPerPrefix]] newest. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    val toReap = created.synchronized {
      created += p
      val same = created.filter(_.getFileName.toString.startsWith(prefix))
      if (same.length > keepPerPrefix) {
        val old = same.dropRight(keepPerPrefix)
        created --= old
        old.toList
      } else Nil
    }
    toReap.foreach(deleteRecursively)
    p.toString
  }

  /** Explicitly delete a directory created by [[dir]] whose contents
    * the caller KNOWS are fully drained (every frame reading it has
    * been collected/materialized). No-op for paths this JVM didn't
    * create — never deletes arbitrary input. */
  def release(path: String): Unit = {
    val target = created.synchronized {
      val i = created.indexWhere(_.toString == path)
      if (i < 0) None else Some(created.remove(i))
    }
    target.foreach(deleteRecursively)
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
      finally s.close()
    }
}
