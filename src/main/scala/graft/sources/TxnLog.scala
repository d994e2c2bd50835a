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

  /** Latest committed version, or -1 for an empty/absent log. */
  def latestVersion(spark: SparkSession, base: String): Int = {
    val f = fs(spark, base)
    val d = logDir(base)
    if (!f.exists(d)) -1
    else f.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt)
      .foldLeft(-1)(math.max)
  }

  /** Commit `adds`/`removes` (paths relative to `base`) on top of
    * `readVersion`. Returns the new version. Throws
    * [[VersionConflictException]] if another writer committed
    * `readVersion + 1` first — re-read the table and retry.
    */
  def commit(spark: SparkSession, base: String, readVersion: Int,
             adds: Seq[String], removes: Seq[String] = Nil): Int = {
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
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val out =
        try f.create(target, /* overwrite = */ false)
        catch { case e: java.io.IOException => conflict(e) }
      try out.write(payload.getBytes("UTF-8")) finally out.close()
    }
    readVersion + 1
  }

  /** Replay log files 0..version in order, calling `apply(isAdd,
    * relativeFile)` per action — the one reader both [[filesAsOf]]
    * and [[unreferencedFiles]] share. */
  private def replay(spark: SparkSession, base: String, version: Int)
                    (apply: (Boolean, String) => Unit): Unit = {
    val f = fs(spark, base)
    val upTo = if (version >= 0) version
      else latestVersion(spark, base)
    require(upTo >= 0, s"no committed version in $base")
    (0 to upTo).foreach { v =>
      val p = versionFile(base, v)
      require(f.exists(p), s"log is missing version $v")
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
  }

  /** The live file set at `version` (or the latest when negative):
    * replay adds/removes over log files 0..version in order. */
  def filesAsOf(spark: SparkSession, base: String,
                version: Int = -1): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    replay(spark, base, version) { (isAdd, file) =>
      if (isAdd) live += file else live -= file
    }
    live.toSeq.map(rel => s"$base/$rel")
  }

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
