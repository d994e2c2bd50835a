package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal lakehouse transaction log — the versioned metadata layer
  * that turns a directory of parquet files into a TABLE with history:
  * every commit is an ordered JSON file of add/remove-file actions,
  * and any past state is reconstructed by replaying the log prefix
  * (`VERSION AS OF n`), without touching — or retaining longer than
  * the log says — a single data byte. This is the Delta/Iceberg core
  * idea in its smallest honest form:
  *
  *  - **O(versions + files) metadata, zero data movement.** Time
  *    travel, incremental consumption, and audit diffs are log
  *    replays; at 100 TB the log is KBs while the data is the lake.
  *  - **Optimistic concurrency.** A commit targets version
  *    `readVersion + 1` and must create that log file EXCLUSIVELY —
  *    if a concurrent writer got there first the create fails,
  *    surfacing a [[VersionConflictException]] for the caller to
  *    re-read, re-base and retry (the standard OCC loop). On HDFS
  *    `FileSystem.create(path, overwrite = false)` is the atomic
  *    primitive; on the LOCAL filesystem it is exists-then-create
  *    (TOCTOU), so commits there write a temp file and publish it
  *    with a POSIX hard link (`Files.createLink`), which atomically
  *    fails if the version slot is taken. Object stores substitute a
  *    conditional put — the protocol is unchanged.
  *  - **Copy-on-write deletes.** Removing rows = writing replacement
  *    files and logging remove(old)+add(new) in ONE commit; readers
  *    of older versions still see the old files (they are only
  *    unreferenced, not deleted — vacuum is a separate, explicitly
  *    destructive step, not implemented here by design).
  *
  * Log layout: `<base>/_graft_log/<%08d>.json`, one JSON object per
  * line: `{"action":"add","file":"<relative path>"}` or the same with
  * `"remove"`. File paths are stored RELATIVE to the table base so
  * the table is relocatable.
  */
object TxnLog {

  final class VersionConflictException(msg: String)
    extends RuntimeException(msg)

  private def logDir(base: String) = new Path(base, "_graft_log")

  private def fs(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionFile(base: String, v: Int): Path =
    new Path(logDir(base), f"$v%08d.json")

  /** Checkpoint file `<base>/_graft_log/<%08d>.checkpoint.json`: the
    * LIVE file set after replaying commits 0..v, one `add` action
    * line per file — the same line shape as the log, so the reader is
    * shared. Checkpoints are DERIVED, idempotent data: two racing
    * writers produce byte-identical content (the live set is a pure
    * function of the immutable log prefix), published atomically via
    * temp-file + rename so a concurrent reader never sees a torn
    * file, and deleting one only costs read-time replay, never
    * correctness. This is what bounds read cost on a long-lived
    * table: a real lake accretes thousands of commits, and without
    * checkpoints every read replays O(versions) log files (the Delta
    * `_last_checkpoint` idea in its smallest honest form).
    */
  private def checkpointFile(base: String, v: Int): Path =
    new Path(logDir(base), f"$v%08d.checkpoint.json")

  /** Latest committed version, or -1 for an empty/absent log.
    *
    * Only names shaped exactly `NNNNNNNN.json` count as commits: a
    * bare `endsWith(".json")` filter would also admit
    * `00000003.checkpoint.json` (and any foreign `.json` a tool drops
    * in the directory), and `"00000003.checkpoint".toInt` throws —
    * which would break every default-version read on a table that has
    * ever checkpointed. */
  def latestVersion(spark: SparkSession, base: String): Int = {
    val f = fs(spark, base)
    val d = logDir(base)
    if (!f.exists(d)) -1
    else f.listStatus(d).map(_.getPath.getName)
      .filter(_.matches("""\d{8}\.json"""))
      .map(_.stripSuffix(".json").toInt)
      .foldLeft(-1)(math.max)
  }

  /** Commit `adds`/`removes` (paths relative to `base`) on top of
    * `readVersion`. Returns the new version. Throws
    * [[VersionConflictException]] if another writer committed
    * `readVersion + 1` first — re-read the table and retry.
    *
    * `checkpointEvery = n > 0` writes a [[checkpoint]] after every
    * n-th commit (versions n−1, 2n−1, …) — the periodic snapshot that
    * keeps read-side metadata cost O(n) instead of O(versions) as the
    * table's history grows. The checkpoint rides AFTER the committed
    * version is published, so a crash between the two steps loses
    * only the optimization, never the commit.
    */
  def commit(spark: SparkSession, base: String, readVersion: Int,
             adds: Seq[String], removes: Seq[String] = Nil,
             checkpointEvery: Int = 0): Int = {
    val f = fs(spark, base)
    f.mkdirs(logDir(base))
    val target = versionFile(base, readVersion + 1)
    val payload = (
      removes.map(p => s"""{"action":"remove","file":"$p"}""") ++
      adds.map(p => s"""{"action":"add","file":"$p"}""")
    ).mkString("", "\n", "\n")
    def conflict(e: Exception): Nothing =
      throw new VersionConflictException(
        s"version ${readVersion + 1} already committed " +
          s"(${e.getMessage}) — re-read and retry")
    if ("file" == f.getUri.getScheme) {
      // Local FS: create(overwrite=false) is exists-then-create, not
      // atomic — two racing writers can both win the slot. Write a
      // temp file, publish via hard link: link(2) fails atomically
      // with EEXIST if a concurrent writer committed first.
      val dir = java.nio.file.Paths.get(
        f.makeQualified(logDir(base)).toUri)
      val tmp = dir.resolve(
        s".${target.getName}.${java.util.UUID.randomUUID}.tmp")
      java.nio.file.Files.write(tmp, payload.getBytes("UTF-8"))
      try java.nio.file.Files.createLink(
        dir.resolve(target.getName), tmp)
      catch {
        case e: java.nio.file.FileAlreadyExistsException => conflict(e)
        case _: UnsupportedOperationException =>
          // Filesystem without hard-link support (some overlay /
          // network mounts): degrade to exclusive-create. CREATE_NEW
          // still fails on an existing target, so the losing writer
          // conflicts correctly; what we give up vs link(2) is only
          // the write-then-publish atomicity (a reader could glimpse
          // a partially-written file), the same exposure the generic
          // HDFS branch below accepts.
          try java.nio.file.Files.write(dir.resolve(target.getName),
            payload.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          catch {
            case e: java.nio.file.FileAlreadyExistsException =>
              conflict(e)
          }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val out =
        try f.create(target, /* overwrite = */ false)
        catch { case e: java.io.IOException => conflict(e) }
      try out.write(payload.getBytes("UTF-8")) finally out.close()
    }
    val v = readVersion + 1
    if (checkpointEvery > 0 && (v + 1) % checkpointEvery == 0)
      checkpoint(spark, base, v)
    v
  }

  /** Parse one action file (log version OR checkpoint — same line
    * shape), calling `apply(isAdd, relativeFile)` per action. */
  private def readActions(spark: SparkSession, base: String, p: Path)
                         (apply: (Boolean, String) => Unit): Unit = {
    val f = fs(spark, base)
    require(f.exists(p), s"log is missing ${p.getName}")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString finally in.close()
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      // the two fixed shapes above — a full JSON parser would be
      // noise for a two-field line we also wrote
      val file = line.split("\"file\":\"")(1).stripSuffix("\"}")
      apply(line.contains("\"action\":\"add\""), file)
    }
  }

  /** Replay log files from..to in order — the shared reader under
    * both the checkpoint-seeded fast path ([[filesAsOf]]) and the
    * full-history scans ([[unreferencedFiles]]). */
  private def replayRange(spark: SparkSession, base: String,
                          from: Int, to: Int)
                         (apply: (Boolean, String) => Unit): Unit =
    (from to to).foreach { v =>
      readActions(spark, base, versionFile(base, v))(apply)
    }

  /** Replay the FULL log prefix 0..version. Deliberately checkpoint-
    * blind: [[unreferencedFiles]] needs every add that ever happened
    * (a file added at v2 and removed at v5 is invisible to any
    * checkpoint ≥ 5 — it is exactly the vacuum candidate), so the
    * maintenance scans stay O(versions) by design while the hot read
    * path below is O(suffix). */
  private def replay(spark: SparkSession, base: String, version: Int)
                    (apply: (Boolean, String) => Unit): Unit = {
    val upTo = if (version >= 0) version
      else latestVersion(spark, base)
    require(upTo >= 0, s"no committed version in $base")
    replayRange(spark, base, 0, upTo)(apply)
  }

  /** Latest checkpoint version ≤ `atOrBefore`, or None. Same strict
    * name shape as [[latestVersion]]: a foreign or partially-written
    * file whose name merely ends in `.checkpoint.json` (editor
    * backup, tmp artifact) is skipped, not a `NumberFormatException`
    * that takes down every read of the table. */
  def latestCheckpoint(spark: SparkSession, base: String,
                       atOrBefore: Int): Option[Int] = {
    val f = fs(spark, base)
    val d = logDir(base)
    if (!f.exists(d)) None
    else f.listStatus(d).map(_.getPath.getName)
      .filter(_.matches("""\d{8}\.checkpoint\.json"""))
      .map(_.stripSuffix(".checkpoint.json").toInt)
      .filter(_ <= atOrBefore)
      .reduceOption(math.max)
  }

  /** Write a checkpoint of the live file set as of `version` (latest
    * when negative). Returns the checkpointed version.
    *
    * Writer-writer races are safe because content is a pure function
    * of the immutable log prefix (two racing writers produce
    * byte-identical files) — but a READER concurrent with a rewrite
    * must never glimpse a torn file, or [[filesAsOfRel]] silently
    * seeds a WRONG live set (worse than the loud failures everywhere
    * else in this log). So publication is write-temp-then-rename: on
    * the local filesystem `Files.move(ATOMIC_MOVE)` (rename(2) — a
    * reader sees either the old complete file or the new complete
    * file, never bytes in between); on HDFS-like filesystems
    * `FileSystem.rename`, which is atomic on HDFS by contract.
    */
  def checkpoint(spark: SparkSession, base: String,
                 version: Int = -1): Int = {
    val upTo = if (version >= 0) version
      else latestVersion(spark, base)
    require(upTo >= 0, s"no committed version in $base")
    val payload = filesAsOfRel(spark, base, upTo)
      .map(p => s"""{"action":"add","file":"$p"}""")
      .mkString("", "\n", "\n")
    val f = fs(spark, base)
    val target = checkpointFile(base, upTo)
    if ("file" == f.getUri.getScheme) {
      val dir = java.nio.file.Paths.get(
        f.makeQualified(logDir(base)).toUri)
      val tmp = dir.resolve(
        s".${target.getName}.${java.util.UUID.randomUUID}.tmp")
      java.nio.file.Files.write(tmp, payload.getBytes("UTF-8"))
      try java.nio.file.Files.move(tmp, dir.resolve(target.getName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val tmp = new Path(logDir(base),
        s".${target.getName}.${java.util.UUID.randomUUID}.tmp")
      val out = f.create(tmp, /* overwrite = */ false)
      try out.write(payload.getBytes("UTF-8")) finally out.close()
      // HDFS rename does not replace an existing destination; the
      // content is idempotent, so losing the race to an identical
      // file is success, not failure.
      try { f.delete(target, false); f.rename(tmp, target) }
      finally f.delete(tmp, false)
    }
    upTo
  }

  /** Live RELATIVE file set at `version`: seed from the nearest
    * checkpoint ≤ version, then replay only the commit SUFFIX — the
    * read cost is O(commits since last checkpoint), not O(versions),
    * which is the difference between a millisecond and a minute of
    * metadata work on a table with thousands of commits. */
  private def filesAsOfRel(spark: SparkSession, base: String,
                           version: Int): Seq[String] = {
    val upTo = if (version >= 0) version
      else latestVersion(spark, base)
    require(upTo >= 0, s"no committed version in $base")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    val cp = latestCheckpoint(spark, base, upTo)
    cp.foreach { v =>
      readActions(spark, base, checkpointFile(base, v)) {
        (isAdd, file) => if (isAdd) live += file else live -= file
      }
    }
    replayRange(spark, base, cp.map(_ + 1).getOrElse(0), upTo) {
      (isAdd, file) => if (isAdd) live += file else live -= file
    }
    live.toSeq
  }

  /** The live file set at `version` (or the latest when negative):
    * nearest checkpoint + suffix replay (see [[filesAsOfRel]]). */
  def filesAsOf(spark: SparkSession, base: String,
                version: Int = -1): Seq[String] =
    filesAsOfRel(spark, base, version).map(rel => s"$base/$rel")

  /** Vacuum candidates (DRY RUN): files some version added that are
    * no longer live at `version` (latest when negative) — exactly
    * what a retention-0 VACUUM would delete. Listing is all this
    * layer offers by design: the delete itself is the caller's
    * explicitly destructive step, and the moment these files go,
    * every older version that references them stops being
    * reconstructible (that trade — history vs storage — belongs to a
    * human-owned retention policy, not a library default).
    */
  def unreferencedFiles(spark: SparkSession, base: String,
                        version: Int = -1): Seq[String] = {
    val everAdded = scala.collection.mutable.LinkedHashSet.empty[String]
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    replay(spark, base, version) { (isAdd, file) =>
      if (isAdd) { everAdded += file; live += file } else live -= file
    }
    (everAdded -- live).toSeq.map(rel => s"$base/$rel")
  }

  /** `SELECT ... VERSION AS OF version`: read exactly the files the
    * log says were live at that version. */
  def readAsOf(spark: SparkSession, base: String,
               version: Int = -1): DataFrame =
    spark.read.parquet(filesAsOf(spark, base, version): _*)

  /** Relative paths of the parquet part files a just-finished write
    * landed in `subdir` (how callers build a commit's `adds`). */
  def partFiles(spark: SparkSession, base: String,
                subdir: String): Seq[String] = {
    val f = fs(spark, base)
    f.listStatus(new Path(base, subdir)).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted
      .map(n => s"$subdir/$n").toSeq
  }
}
