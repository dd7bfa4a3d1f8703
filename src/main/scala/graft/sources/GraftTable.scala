package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with an atomic manifest commit — the
  * transaction-log idiom of a lakehouse table format (Delta/Iceberg have
  * no jars in this offline sandbox; this is the testable core of their
  * semantics, built on plain Hadoop FS primitives). Layout under `dir`:
  *
  *   <prefix><N>/          immutable data versions (parquet)
  *   manifest/commit_<N>   one file per committed version; its content
  *                         is the commit's metadata string
  *
  * Guarantees:
  *  - **Atomic visibility**: a version becomes visible in exactly one
  *    file create+rename. A half-staged data dir is unreachable — every
  *    sanctioned read resolves the manifest first.
  *  - **Snapshot isolation**: data dirs are immutable once committed, so
  *    a reader that resolved version N keeps reading N's files even
  *    while N+1 commits (retention permitting — see `retain`).
  *  - **Time travel**: any retained committed version is readable by
  *    number; its metadata string rides along.
  *  - **Crash safety**: staging is side-effect-idempotent (overwrite of
  *    an orphaned dir); a crash between stage and commit leaves the
  *    previous version current and the retry converges (Round11Spec
  *    proves this for the watermark loader built on these primitives).
  *
  * Single writer assumed (an orchestrator-scheduled job); the manifest
  * serializes readers against the writer, not writers against each
  * other. `Round10Ops.incrementalDailyLoad` is the watermark-specialized
  * instance (prefix "daily_v", metadata = the event-time frontier,
  * retain = 1).
  */
object GraftTable {

  def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed (version, metadata), if any commit exists. */
  def readManifest(fs: FileSystem, dir: String): Option[(Int, String)] = {
    val vs = versions(fs, dir)
    if (vs.isEmpty) None else Some((vs.max, meta(fs, dir, vs.max)))
  }

  /** All committed version numbers, ascending (retention may have
    * removed the DATA of old versions; their commit files remain as
    * history — `readVersion` is what enforces data retention). */
  def versions(fs: FileSystem, dir: String): Seq[Int] = {
    val mdir = new Path(s"$dir/manifest")
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).iterator.map(_.getPath.getName)
      .filter(_.startsWith("commit_"))
      .flatMap(_.stripPrefix("commit_").toIntOption).toSeq.sorted
  }

  /** Metadata string of committed version `v`. */
  def meta(fs: FileSystem, dir: String, v: Int): String = {
    val in = fs.open(new Path(s"$dir/manifest/commit_$v"))
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
  }

  /** Stage `df` as the data of version `v` WITHOUT committing. Overwrite
    * semantics make a retry after a crash idempotent — but only for an
    * UNCOMMITTED version: a committed version's data is immutable (it
    * is what snapshot isolation hands to in-flight readers), so staging
    * over it is refused loudly. */
  def stage(df: DataFrame, dir: String, v: Int,
      prefix: String = "v"): Unit = {
    val fs = fsOf(df.sparkSession, dir)
    require(!fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v is already committed under $dir — committed data is " +
        "immutable; stage the NEXT version instead")
    df.write.mode("overwrite").parquet(s"$dir/$prefix$v")
  }

  /** Atomically commit staged version `v`: one file create + rename
    * makes it (and its metadata) visible in a single step. The rename
    * doubles as OPTIMISTIC CONCURRENCY CONTROL — on HDFS rename onto an
    * existing destination atomically fails (local POSIX rename
    * overwrites, so an exists-check approximates the same contract
    * there), so of two writers racing to commit the same version number
    * exactly one wins and the loser gets a
    * ConcurrentModificationException (re-stage against the new current
    * version and retry — the lakehouse commit-loop protocol; silent
    * last-writer-wins would let the loser's reader see data the
    * manifest never named). Then data dirs of versions older than
    * `v - retain` are garbage-collected — `retain` prior versions stay
    * readable for time travel and as a grace window for in-flight
    * readers (production would add time-based retention). GC failure
    * leaves garbage, never corruption. */
  def commit(fs: FileSystem, dir: String, v: Int, metadata: String,
      retain: Int = Int.MaxValue, prefix: String = "v"): Unit = {
    val mdir = new Path(s"$dir/manifest")
    fs.mkdirs(mdir)
    val tmp = new Path(mdir, s".tmp_$v")
    val out = fs.create(tmp, true)
    try out.write(metadata.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(mdir, s"commit_$v")
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"version $v was committed by a concurrent writer under $dir — " +
          "re-stage against the current version and retry")
    }
    if (retain != Int.MaxValue)
      fs.listStatus(new Path(dir)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) &&
            n.stripPrefix(prefix).toIntOption.exists(_ < v - retain))
          fs.delete(st.getPath, true)
      }
  }

  /** Stage + commit `df` as the next version; returns its number. */
  def commitNext(spark: SparkSession, dir: String, df: DataFrame,
      metadata: String = "", retain: Int = Int.MaxValue,
      prefix: String = "v"): Int = {
    val fs = fsOf(spark, dir)
    val v = readManifest(fs, dir).map(_._1 + 1).getOrElse(0)
    stage(df, dir, v, prefix)
    commit(fs, dir, v, metadata, retain, prefix)
    v
  }

  /** The manifest-resolved CURRENT snapshot — the only sanctioned latest
    * read; never point a reader at a data dir directly. */
  def read(spark: SparkSession, dir: String, prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    val (v, _) = readManifest(fs, dir)
      .getOrElse(sys.error(s"no committed version under $dir"))
    readVersion(spark, dir, v, prefix)
  }

  /** Time travel: read committed version `v`. Fails loudly for a version
    * that was never committed or whose data retention has expired. */
  def readVersion(spark: SparkSession, dir: String, v: Int,
      prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    require(fs.exists(new Path(s"$dir/$prefix$v")),
      s"version $v's data has been garbage-collected (retention)")
    spark.read.parquet(s"$dir/$prefix$v")
  }
}
