package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Temp-dir lifecycle: per-prefix reaping bounds long-lived-process
  * accumulation; explicit release deletes drained artifacts; foreign
  * paths are never touched. */
class RunTempSpec extends AnyFunSuite {

  test("per-prefix cap reaps the oldest dirs, keeps the newest") {
    val prefix = "graft_runtemp_spec_cap_"
    val dirs = (1 to 12).map(_ => RunTemp.dir(prefix))
    // 12 created, cap is 8: the 4 oldest are gone, the 8 newest live
    assert(dirs.takeRight(8).forall(d => Files.exists(Paths.get(d))),
      "newest dirs must survive")
    assert(dirs.take(4).forall(d => !Files.exists(Paths.get(d))),
      "oldest dirs past the cap must be reaped")
    dirs.foreach(RunTemp.release)
  }

  test("different prefixes do not reap each other") {
    val a = RunTemp.dir("graft_runtemp_spec_a_")
    val bs = (1 to 10).map(_ => RunTemp.dir("graft_runtemp_spec_b_"))
    assert(Files.exists(Paths.get(a)), "other-prefix dir reaped by mistake")
    (a +: bs).foreach(RunTemp.release)
  }

  test("release deletes a drained dir immediately; foreign paths are no-ops") {
    val d = RunTemp.dir("graft_runtemp_spec_rel_")
    Files.write(Paths.get(d, "artifact.bin"), Array[Byte](1, 2, 3))
    RunTemp.release(d)
    assert(!Files.exists(Paths.get(d)), "released dir must be deleted")

    val foreign = Files.createTempDirectory("graft_runtemp_foreign_")
    RunTemp.release(foreign.toString) // not RunTemp-created: must survive
    assert(Files.exists(foreign), "release must never delete foreign paths")
    Files.delete(foreign)
  }
}
