package graft

/** Scratch/staging directory naming for operators that stage fixture
  * data under `java.io.tmpdir` (partitioned/ORC/schema-merge staging,
  * streaming tranche replays, restart checkpoints).
  *
  * Keys combine the SANITIZED ABSOLUTE SOURCE PATH (not String
  * .hashCode, which can collide between fixture dirs) with a
  * PER-PROCESS token: two JVMs running the same query over the same
  * fixture concurrently — the parallel oracle checker's normal mode —
  * would otherwise race on a shared delete-then-recreate dir (or, for
  * the marker-gated staging sites, double-write it). Within one JVM
  * the name is stable, so marker-gated sites still stage once per
  * session; across JVMs the names are disjoint. Dirs are bounded (one
  * per operator × fixture × live process) and die with the tmpdir. */
object Scratch {
  /** Stable within the process, distinct across processes. */
  val processToken: String = java.lang.ProcessHandle.current().pid().toString

  /** `<sanitized absolute source path>_p<pid>` — the scratch-dir key. */
  def key(sourcePath: java.nio.file.Path): String =
    sourcePath.toAbsolutePath.toString.replaceAll("[^A-Za-z0-9._-]", "_") +
      s"_p$processToken"

  // Per-pid keys made the dirs collision-free across concurrent JVMs,
  // but also unshareable — nothing else will ever reuse (or clean)
  // them, so without this hook every process leaks one staged fixture
  // copy into java.io.tmpdir until the OS clears /tmp. All scratch
  // sites name their dirs `graft_*_<key>` directly under tmpdir, and
  // key ends with `_p<pid>`, so the sweep below can only ever match
  // dirs THIS process created.
  private val _cleanup: Unit = java.lang.Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val suffix = s"_p$processToken"
      val mine = java.nio.file.Files.list(tmp)
      try mine.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("graft_") && n.endsWith(suffix))
          deleteRecursively(p)
      } finally mine.close()
    }, "graft-scratch-cleanup"))

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val st = java.nio.file.Files.list(p)
      try st.forEach(deleteRecursively) finally st.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** Best-effort recursive delete for in-query scratch release
    * (LineageCut.BulkCut.release); failures are non-fatal — the
    * shutdown sweep is the backstop. */
  def deleteTree(p: java.nio.file.Path): Unit =
    try deleteRecursively(p)
    catch { case _: java.io.IOException => () }
}
