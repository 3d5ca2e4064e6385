package graft

/** Per-run streaming checkpoint base for the battery mains (Verify / Bench /
  * probes): tmpfs when the machine has /dev/shm, plain /tmp otherwise. The
  * streaming entries are drained with AvailableNow and re-created per run
  * under UUID query names, so their checkpoints are pure scratch — what
  * costs time is the per-micro-batch offset/commit/state fsyncs, which
  * tmpfs makes memory-speed. Production deployments point
  * `spark.sql.streaming.checkpointLocation` at durable shared storage;
  * nothing in the engine depends on this scratch base.
  *
  * The previous run's base (same prefix) is deleted on creation, so
  * repeated battery runs cannot accumulate in RAM.
  */
object BatteryCheckpoints {
  def freshBase(prefix: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val root =
      if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm" else "/tmp"
    val base = Paths.get(s"$root/graft_ckpt_$prefix")
    if (Files.exists(base)) {
      Files.walk(base).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })
    }
    Files.createDirectories(base)
    base.toString
  }
}
