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
}
