package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer discipline for a [[FrameStore]] directory — the Spark-side
  * form of the reference's exclusive lockfile (contract: src/lockfile.rs:121-196
  * acquire loop, src/lock.rs:10-67 exclusive mode; semantics reproduced, not
  * the fs2 implementation).
  *
  * Two `FrameStore` handles on one store path are each correct alone but
  * race each other: id minting is read-modify-write over the log's max
  * (id, commitSeq), and parquet appends from two drivers interleave. The
  * reference refuses that interleaving outright — every mutation takes an
  * exclusive lockfile first, and a second writer gets a structured
  * "locked by pid … since …" error with a staleness hint. This object is
  * that contract on Hadoop paths:
  *
  *   - the lock is `<storePath>.lock`, a SIBLING of the log directory
  *     (never inside it: `vacuum()` deletes and renames the directory
  *     wholesale, which must not destroy a held lock);
  *   - acquisition is an atomic exclusive create — `O_EXCL` via
  *     java.nio for `file:` paths (Hadoop's RawLocalFileSystem
  *     check-then-create is NOT atomic), `create(overwrite = false)` for
  *     cluster filesystems where the namenode arbitrates;
  *   - the owner record (pid, host, command, startedAt, heartbeat) is
  *     written INTO the lockfile; a contender that loses reads it back
  *     for the error hint, exactly the reference's `LockOwnerHint`;
  *   - acquire spins (10 ms) until `timeoutMs`, then throws
  *     [[StoreLockedException]] carrying the owner and whether the lock
  *     looks STALE (no heartbeat within `staleGraceMs`);
  *   - `forceStale = true` lets a caller take over a stale lock (crashed
  *     writer) by deleting it and retrying the create — the reference's
  *     `force_stale` recovery path (src/lockfile.rs:158-166);
  *   - [[StoreLock.heartbeat]] re-stamps the record so long-running
  *     writers stay visibly live; [[StoreLock.release]] deletes the file
  *     (the Drop impl in the reference).
  *
  * The record rewrite on heartbeat is not atomic with respect to a
  * concurrent reader (the reference's registry write has the same
  * window); a reader that catches a half-written record treats the owner
  * as unknown, which only ever REPORTS more conservatively — takeover
  * still requires `forceStale` plus an expired grace.
  *
  * Deliberate divergence: the reference also has a SHARED mode
  * (src/lock.rs:10-14 LockMode::Shared, downgrade/upgrade) because its
  * readers mmap one mutable container file and must fence a writer's
  * in-place byte rewrites. Parquet storage removes that need — data
  * files are immutable once written and every commit is new files plus
  * an atomic marker/rename, so readers here are LOCK-FREE by
  * construction (MVCC via the latest-active view, committed-delta
  * markers, generation pointers) and only writers ever contend.
  */
object StoreLock {

  /** parsed owner record of a held lock (reference LockRecord fields) */
  final case class Owner(pid: Long, host: String, cmd: String,
                         startedAtMs: Long, heartbeatMs: Long,
                         lastHeartbeatMs: Long) {
    def describe: String =
      s"store locked by pid $pid on $host (cmd: $cmd) since $startedAtMs"
  }

  final case class Options(timeoutMs: Long = 250L,
                           heartbeatMs: Long = 2000L,
                           staleGraceMs: Long = 10000L,
                           command: String = "graft",
                           forceStale: Boolean = false)

  final class StoreLockedException(msg: String, val owner: Option[Owner],
                                   val stale: Boolean)
      extends RuntimeException(msg)

  def lockPathFor(storePath: String): String =
    storePath.stripSuffix("/") + ".lock"

  private val SpinSleepMs = 10L

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def isLocalFs(fs: FileSystem): Boolean = {
    val s = fs.getUri.getScheme
    s == null || s == "file" || s == "local"
  }

  /** atomic exclusive create; true = we own the new file */
  private def tryCreate(fs: FileSystem, lockPath: String): Boolean =
    if (isLocalFs(fs)) {
      val p = java.nio.file.Paths.get(
        new Path(lockPath).toUri.getPath match { case "" => lockPath; case u => u })
      try { java.nio.file.Files.createFile(p); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      // HDFS-like: the namenode serializes create(overwrite = false)
      try { fs.create(new Path(lockPath), false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.FileNotFoundException => false // parent races
      }
    }

  private def writeRecord(fs: FileSystem, lockPath: String, o: Owner): Unit = {
    val out = fs.create(new Path(lockPath), true)
    try out.write(
      s"${o.pid}\t${o.host}\t${o.cmd}\t${o.startedAtMs}\t${o.heartbeatMs}\t${o.lastHeartbeatMs}\n"
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def readRecord(fs: FileSystem, lockPath: String): Option[Owner] =
    try {
      val in = fs.open(new Path(lockPath))
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      line.split('\t') match {
        case Array(pid, host, cmd, started, hb, last) =>
          Some(Owner(pid.toLong, host, cmd, started.toLong, hb.toLong,
            last.toLong))
        case _ => None // half-written record: owner unknown
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** no heartbeat within the grace (or record unreadable) ⇒ stale
    * (reference registry::is_stale; a missing record is stale there too,
    * src/lockfile.rs:155-157) */
  private def isStale(owner: Option[Owner], staleGraceMs: Long,
                      nowMs: Long): Boolean = owner match {
    case Some(o) => nowMs - o.lastHeartbeatMs > staleGraceMs
    case None => true
  }

  /** who holds the lock right now, if anyone (reference current_owner) */
  def currentOwner(spark: SparkSession, storePath: String): Option[Owner] = {
    val lockPath = lockPathFor(storePath)
    val fs = fsOf(spark, storePath)
    if (!fs.exists(new Path(lockPath))) None else readRecord(fs, lockPath)
  }

  /** Acquire the exclusive store lock or throw [[StoreLockedException]].
    * Spin-with-sleep up to `timeoutMs`; a stale holder is taken over only
    * when `forceStale` is set. */
  def acquire(spark: SparkSession, storePath: String,
              options: Options = Options()): StoreLock = {
    val lockPath = lockPathFor(storePath)
    val fs = fsOf(spark, storePath)
    val start = System.currentTimeMillis()
    val record = Owner(
      pid = ProcessHandle.current().pid(),
      host = java.net.InetAddress.getLocalHost.getHostName,
      cmd = options.command,
      startedAtMs = start,
      heartbeatMs = options.heartbeatMs,
      lastHeartbeatMs = start)
    while (true) {
      if (tryCreate(fs, lockPath)) {
        writeRecord(fs, lockPath, record)
        return new StoreLock(fs, lockPath, record)
      }
      val existing = readRecord(fs, lockPath)
      val now = System.currentTimeMillis()
      val stale = isStale(existing, options.staleGraceMs, now)
      if (options.forceStale && stale) {
        // crashed writer: sweep and retry the exclusive create (losing
        // the delete race to another contender is fine — the create
        // arbitrates)
        fs.delete(new Path(lockPath), false)
      } else if (now - start >= options.timeoutMs) {
        val msg = existing.map(_.describe)
          .getOrElse("store locked by another process")
        throw new StoreLockedException(msg, existing, stale)
      } else {
        Thread.sleep(SpinSleepMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** acquire → body → release, the shape every FrameStore mutation uses */
  def withLock[T](spark: SparkSession, storePath: String,
                  options: Options = Options())(body: => T): T = {
    val lock = acquire(spark, storePath, options)
    try body finally lock.release()
  }
}

/** A held exclusive lock; release deletes the lockfile (reference Drop). */
final class StoreLock private[store] (fs: FileSystem, lockPath: String,
                                      private var record: StoreLock.Owner) {
  /** re-stamp liveness so the stale-grace clock restarts (LockRecord::touch) */
  def heartbeat(): Unit = {
    record = record.copy(lastHeartbeatMs = System.currentTimeMillis())
    val out = fs.create(new Path(lockPath), true)
    try out.write(
      s"${record.pid}\t${record.host}\t${record.cmd}\t${record.startedAtMs}\t${record.heartbeatMs}\t${record.lastHeartbeatMs}\n"
        .getBytes("UTF-8"))
    finally out.close()
  }

  def owner: StoreLock.Owner = record

  def release(): Unit =
    fs.delete(new Path(lockPath), false): Unit
}
