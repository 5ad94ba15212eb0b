package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe, idempotent versioned parquet table: the engine's
  * answer to the reference's transactional sink writes — DuckDB
  * `MERGE INTO` (pattern_1_1.py:96-117) and the DELETE+INSERT
  * transaction (pattern_2.py:108-113) — without a lakehouse format.
  *
  * Layout: `root/v{version}/` parquet snapshots + `root/_current`
  * pointer file. A commit writes the new snapshot directory first,
  * then atomically swaps the pointer (write-temp + ATOMIC_MOVE).
  * Readers resolve the pointer and only ever see a fully-written
  * snapshot. Re-running a batch (streaming retry) rewrites the same
  * version directory and re-swaps the pointer — idempotent, which
  * together with the streaming checkpoint gives effectively-once
  * sink semantics (SURVEY.md §2.6 T5).
  *
  * Scale note: this is the local-filesystem stand-in for a real
  * table format's atomic commit (Delta/Iceberg snapshot commit, or
  * HDFS rename). The pattern code only depends on `read`/`transact`,
  * so swapping the store implementation does not touch the patterns.
  * Old versions are pruned, keeping the last [[keepVersions]].
  */
final class VersionedStore(spark: SparkSession, root: String, keepVersions: Int = 3) {

  private val rootPath = Paths.get(root)
  private val pointer = rootPath.resolve("_current")

  def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(new String(Files.readAllBytes(pointer), "UTF-8").trim.toLong)
    else None

  /** The committed table, if any commit has happened. */
  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$root/v$v"))

  /** Read-transform-commit: `f` maps the base snapshot to the next
    * table state, which becomes version `version` atomically.
    *
    * The base is the latest committed version STRICTLY BEFORE
    * `version` (None on first commit) — not simply the pointer. On a
    * streaming retry of batch n after a successful commit of n, the
    * pointer already names v_n; basing on v_{n-1} makes the retry
    * recompute the same v_n instead of double-applying the delta
    * (and avoids lazily reading the directory being overwritten).
    */
  def transact(version: Long)(f: Option[DataFrame] => DataFrame): Unit = {
    val next = f(baseSnapshot(version))
    next.write.mode("overwrite").parquet(s"$root/v$version")
    commitPointer(version)
    prune(version)
  }

  private def baseSnapshot(version: Long): Option[DataFrame] =
    currentVersion.flatMap { c =>
      val b = math.min(c, version - 1)
      if (b < 0) None
      else if (Files.exists(rootPath.resolve(s"v$b")))
        Some(spark.read.parquet(s"$root/v$b"))
      else Some(spark.read.parquet(s"$root/v$c"))
    }

  private def commitPointer(version: Long): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s"_current.tmp.$version")
    Files.write(tmp, version.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def prune(latest: Long): Unit = {
    val dir = rootPath.toFile
    if (dir.exists) {
      dir.listFiles().filter(_.getName.startsWith("v"))
        .flatMap(f => f.getName.drop(1).toLongOption.map(_ -> f))
        .filter { case (v, _) => v <= latest - keepVersions }
        .foreach { case (_, f) => deleteRecursively(f) }
    }
  }
}
