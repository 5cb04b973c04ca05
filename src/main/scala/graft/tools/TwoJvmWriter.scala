package graft.tools

/** Second-PROCESS writer for the cross-JVM lock/watermark fixtures
  * (reference: the exclusive lockfile arbitrates between operating-system
  * processes, src/lockfile.rs:121-196 — two threads in one JVM exercise
  * the same code but not the same guarantee). TwoJvmLockSpec forks this
  * main as a genuinely separate JVM: its own SparkSession, its own
  * FrameStore handle, contending on the SAME store directory.
  *
  * args: <storePath> [lockTimeoutMs] [uri]
  * exit 0 — put committed; stdout carries `TWOJVM_PUT id=<id>`
  * exit 3 — lock held by the other process past the timeout; stdout
  *          carries `TWOJVM_LOCKED <owner hint>`
  */
/** Second-PROCESS index maintainer for the cross-JVM atomic-refresh
  * fixture: attaches the (path-based, catalog-free) IVF index and runs
  * [[graft.api.Graft.refreshVecIndex]] against the shared store —
  * racing the test JVM's own refresh through the SAME cross-process
  * maintenance lockfile. Rendezvous via marker files so both refreshes
  * genuinely overlap: writes `<vecPath>/_TWOJVM_READY` once the session
  * is up, waits for `<vecPath>/_TWOJVM_GO`, then refreshes.
  *
  * args: <graftBaseDir> <vecPath>
  * stdout carries `TWOJVM_REFRESH <fresh|appended|rebuilt>`
  */
object TwoJvmVecRefresher {
  def main(args: Array[String]): Unit = {
    val Array(base, vecPath) = args
    val spark = graft.Sessions.builder("local[2]", "2")
      .appName("graft-two-jvm-vec-refresher").getOrCreate()
    val g = new graft.api.Graft(spark, base)
    g.attachVecIndex(vecPath, nprobe = 2)
    val ready = java.nio.file.Paths.get(vecPath, "_TWOJVM_READY")
    val go = java.nio.file.Paths.get(vecPath, "_TWOJVM_GO")
    java.nio.file.Files.write(ready, Array.empty[Byte])
    val deadline = System.currentTimeMillis() + 120000L
    while (!java.nio.file.Files.exists(go) &&
           System.currentTimeMillis() < deadline) Thread.sleep(20)
    val outcome = g.refreshVecIndex()
    println(s"TWOJVM_REFRESH $outcome")
    spark.stop()
    sys.exit(0)
  }
}

object TwoJvmWriter {
  def main(args: Array[String]): Unit = {
    val store = args(0)
    val timeoutMs = if (args.length > 1) args(1).toLong else 120000L
    val uri = if (args.length > 2) args(2) else "mv2://twojvm/doc"
    val spark = graft.Sessions.builder("local[2]", "2")
      .appName("graft-two-jvm-writer").getOrCreate()
    val code =
      try {
        val frames = new graft.store.FrameStore(spark, store,
          graft.store.StoreLock.Options(timeoutMs = timeoutMs,
            command = "two-jvm-writer"))
        val ids = frames.put(Seq((uri,
          "a spark joins document committed by a second process")))
        // stdout is the fixture's observable: the id this process minted
        // from the shared persisted watermark
        println(s"TWOJVM_PUT id=${ids.head}")
        0
      } catch {
        case e: graft.store.StoreLock.StoreLockedException =>
          println(s"TWOJVM_LOCKED ${e.getMessage}")
          3
      }
    spark.stop()
    sys.exit(code)
  }
}
