package graft.sources

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}
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
  * Writer concurrency, precisely: the COMMIT point arbitrates racing
  * writers atomically (exactly one wins a version number, the loser
  * throws). The convention-path `stage`/`commit` pair additionally
  * assumes a single writer for DATA, because concurrent stagers share
  * `$prefix$v`; `commitNextIsolated` removes that assumption with
  * writer-private data dirs named in the commit file, and `vacuum`
  * reclaims the orphans losers leave. `Round10Ops.incrementalDailyLoad`
  * is the watermark-specialized instance (prefix "daily_v", metadata =
  * the event-time frontier, retain = 1).
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

  /** Raw content of version `v`'s commit file: either the metadata
    * alone (convention-path commits: data lives at `$prefix$v`) or a
    * leading `data=<dirname>` line naming a writer-private data dir
    * (isolated commits — see `commitNextIsolated`) followed by the
    * metadata. */
  private def commitContent(fs: FileSystem, dir: String, v: Int): String = {
    val in = fs.open(new Path(s"$dir/manifest/commit_$v"))
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Metadata string of committed version `v`. */
  def meta(fs: FileSystem, dir: String, v: Int): String = {
    val c = commitContent(fs, dir, v)
    (if (c.startsWith("data=")) c.dropWhile(_ != '\n') else c).trim
  }

  /** Name of the data dir version `v`'s commit references — the
    * manifest is the source of truth for WHERE a version's data lives,
    * not a path convention (an isolated commit's writer-private dir is
    * recorded in its commit file; convention-path commits default to
    * `$prefix$v`). */
  def dataDirOf(fs: FileSystem, dir: String, v: Int,
      prefix: String = "v"): String = {
    val c = commitContent(fs, dir, v)
    if (c.startsWith("data=")) c.takeWhile(_ != '\n').stripPrefix("data=").trim
    else s"$prefix$v"
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

  /** Atomically commit staged version `v`: the metadata is written to a
    * writer-private temp file and PUBLISHED to `commit_v` in one atomic
    * create-no-overwrite step, which doubles as OPTIMISTIC CONCURRENCY
    * CONTROL: of two writers racing to commit the same version number
    * exactly one's publish succeeds and the loser gets a
    * ConcurrentModificationException (re-stage against the new current
    * version and retry — the lakehouse commit-loop protocol; silent
    * last-writer-wins would let the loser's reader see data the
    * manifest never named). The publish primitive per filesystem:
    *
    *  - local FS: a HARD LINK (`link(2)`) — EEXIST on an existing
    *    destination is arbitrated by the kernel inode layer, and the
    *    destination appears with its content already complete. This is
    *    the only local primitive that is both atomic-no-overwrite AND
    *    content-atomic; Hadoop's local `rename` overwrites and its
    *    `create(f, false)` is itself an exists-check + open (the
    *    check-then-act window a previous round's commit had).
    *  - elsewhere (HDFS et al.): `FileContext.rename(src, dst,
    *    Options.Rename.NONE)` — atomic no-overwrite arbitrated
    *    server-side by the namenode.
    *
    * A FileAlreadyExists outcome maps to ConcurrentModificationException;
    * any OTHER IO failure propagates as itself — an unrelated disk error
    * must never masquerade as a commit conflict (it would send the
    * caller into a futile re-stage loop). Then data dirs of versions
    * older than `v - retain` are garbage-collected — `retain` prior
    * versions stay readable for time travel and as a grace window for
    * in-flight readers (production would add time-based retention). GC
    * failure leaves garbage, never corruption. */
  def commit(fs: FileSystem, dir: String, v: Int, metadata: String,
      retain: Int = Int.MaxValue, prefix: String = "v",
      dataDir: Option[String] = None): Unit = {
    val mdir = new Path(s"$dir/manifest")
    fs.mkdirs(mdir)
    // writer-PRIVATE temp name: two racing writers must not clobber each
    // other's staged metadata before the publish step decides the winner
    val tmp = new Path(mdir, s".tmp_${v}_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    val content = dataDir.map(n => s"data=$n\n").getOrElse("") + metadata
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(mdir, s"commit_$v")
    val won =
      try { publishNoOverwrite(fs, tmp, dest); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    fs.delete(tmp, false)
    if (!won)
      throw new java.util.ConcurrentModificationException(
        s"version $v was committed by a concurrent writer under $dir — " +
          "re-stage against the current version and retry")
    if (retain != Int.MaxValue) {
      // GC by the version encoded in the dir NAME (covers both naming
      // forms) — but never a dir a retained commit still references
      val keep = versions(fs, dir).filter(_ >= v - retain)
        .map(kv => dataDirOf(fs, dir, kv, prefix)).toSet
      fs.listStatus(new Path(dir)).foreach { st =>
        val n = st.getPath.getName
        if (!keep.contains(n) &&
            dirVersion(n, prefix).exists(_ < v - retain))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Version encoded in a data-dir name: `$prefix$N` (convention) or
    * `$prefix${N}_<uuid>` (isolated). None for anything else. */
  private def dirVersion(name: String, prefix: String): Option[Int] =
    if (!name.startsWith(prefix)) None
    else {
      val tail = name.stripPrefix(prefix)
      val digits = tail.takeWhile(_.isDigit)
      val rest = tail.drop(digits.length)
      if (digits.nonEmpty && (rest.isEmpty || rest.startsWith("_")))
        digits.toIntOption
      else None
    }

  /** Atomic no-overwrite publish of a fully-written `src` to `dest`
    * (see `commit` for the per-FS rationale). Throws
    * [java.nio.file|hadoop.fs].FileAlreadyExistsException when `dest`
    * exists — losing a race and an IO failure are distinct outcomes. */
  private def publishNoOverwrite(fs: FileSystem, src: Path, dest: Path): Unit =
    fs match {
      case _: LocalFileSystem | _: RawLocalFileSystem =>
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(src).toUri.getPath))
      case _ =>
        org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
          .rename(src, dest, org.apache.hadoop.fs.Options.Rename.NONE)
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
    * that was never committed or whose data retention has expired. The
    * data location resolves THROUGH the commit file (dataDirOf), so
    * isolated-commit versions read transparently. */
  def readVersion(spark: SparkSession, dir: String, v: Int,
      prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    val data = dataDirOf(fs, dir, v, prefix)
    require(fs.exists(new Path(s"$dir/$data")),
      s"version $v's data has been garbage-collected (retention)")
    spark.read.parquet(s"$dir/$data")
  }

  /** Stage + commit `df` as the next version with a WRITER-PRIVATE data
    * dir — the multi-writer-safe commit path. The convention-path
    * `stage`/`commit` pair is safe under the documented single-writer
    * assumption, but two CONCURRENT writers staging the same version
    * number share `$prefix$v`, so the commit winner could publish a dir
    * the loser half-overwrote. Here each writer stages to
    * `$prefix${v}_<uuid>` (nobody else ever writes there) and the
    * commit file NAMES the dir — manifest-as-source-of-truth, the way
    * Delta/Iceberg name data files rather than trusting a path
    * convention. The loser's commit throws
    * ConcurrentModificationException; its private dir becomes an orphan
    * (never readable — no commit references it) that `vacuum` reclaims.
    * Re-staging on retry is the caller's job: a merge's content depends
    * on the snapshot it lost against. */
  def commitNextIsolated(spark: SparkSession, dir: String, df: DataFrame,
      metadata: String = "", retain: Int = Int.MaxValue,
      prefix: String = "v"): Int = {
    val fs = fsOf(spark, dir)
    val v = readManifest(fs, dir).map(_._1 + 1).getOrElse(0)
    val data = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists").parquet(s"$dir/$data")
    commit(fs, dir, v, metadata, retain, prefix, dataDir = Some(data))
    v
  }

  /** TIMESTAMP AS OF resolution: the latest version whose commit file
    * was published at or before `asOfMs` (epoch millis). The publish
    * instant is the commit file's FS modification time — set when the
    * writer finished writing the metadata, carried through the
    * hard-link/rename publish unchanged — so "what did the table look
    * like at T" resolves without any content change to the manifest.
    * (A production deployment would ALSO record wall-time inside the
    * commit metadata to survive FS migrations; mtime is the right local
    * semantics and keeps old manifests compatible.) None when no commit
    * existed yet at `asOfMs`. */
  def versionAsOf(fs: FileSystem, dir: String, asOfMs: Long): Option[Int] =
    versions(fs, dir).filter { v =>
      fs.getFileStatus(new Path(s"$dir/manifest/commit_$v"))
        .getModificationTime <= asOfMs
    }.maxOption

  /** Time travel by timestamp: read the snapshot current at `asOfMs`.
    * Fails loudly when the table did not exist yet at that instant. */
  def readAsOf(spark: SparkSession, dir: String, asOfMs: Long,
      prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    val v = versionAsOf(fs, dir, asOfMs).getOrElse(sys.error(
      s"no version of $dir existed at epoch-ms $asOfMs"))
    readVersion(spark, dir, v, prefix)
  }

  /** Write-time contract enforcement: evaluate named expectation rules
    * (each a boolean Column; a row violates a rule when the predicate is
    * FALSE or NULL) in ONE aggregation pass over `df`, and only if every
    * rule has zero violations commit `df` through the isolated path. A
    * violating frame throws IllegalStateException naming each failed
    * rule and its violation count, and NO version is created — the
    * constraint gate every table format bolts on (Delta CHECK
    * constraints / NOT NULL): bad data is refused at the write boundary
    * instead of poisoning every reader downstream. The validation scan
    * is one extra pass over the input — at 100 TB that pass is the
    * price of the contract, and it shares the cluster-friendly shape of
    * dq_expectation_suite (one agg, no shuffle beyond the partial
    * merge). */
  def checkedCommit(spark: SparkSession, dir: String, df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      metadata: String = "", retain: Int = Int.MaxValue,
      prefix: String = "v"): Int = {
    require(rules.nonEmpty, "checkedCommit without rules is commitNextIsolated")
    import org.apache.spark.sql.functions.{count, lit, sum, when}
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(name)
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    val bad = rules.map(_._1).map(n => n -> row.getAs[Long](n))
      .filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalStateException("commit refused — expectation " +
        "violations: " + bad.map { case (n, c) => s"$n=$c" }.mkString(", "))
    commitNextIsolated(spark, dir, df, metadata, retain, prefix)
  }

  /** Reclaim ORPHANED data dirs: dirs carrying a version number at or
    * below the current committed maximum that no commit file references
    * — the left-behind staging of crashed or race-losing writers.
    * Dirs numbered ABOVE the current max are someone's in-progress next
    * version and are never touched; referenced dirs (including
    * retention-retained history) are never touched. Returns the deleted
    * names. Safe to run any time — it deletes only what no reader can
    * ever resolve. */
  def vacuum(fs: FileSystem, dir: String, prefix: String = "v"): Seq[String] = {
    val committed = versions(fs, dir)
    if (committed.isEmpty) return Seq.empty
    val cur = committed.max
    val referenced = committed.map(v => dataDirOf(fs, dir, v, prefix)).toSet
    fs.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName)
      .filter(n => !referenced.contains(n) &&
        dirVersion(n, prefix).exists(_ <= cur))
      .map { n => fs.delete(new Path(s"$dir/$n"), true); n }
  }

  // ---- change-data feed ---------------------------------------------------

  /** CDC delta of committed version `v`: the rows `v` ADDED relative to
    * `v - 1` (multiset semantics via exceptAll, so duplicate rows that
    * gained a copy are reported once per gained copy). Version 0's delta
    * is its full content. This is the change-query primitive over a
    * grow-by-append table history — both versions must still be within
    * retention. At scale the exceptAll is one hash-partitioned shuffle of
    * the two snapshots; an append-ONLY writer can skip it entirely by
    * reading just the files version v added, which `cdcSubscribe`'s
    * per-version batch handler is free to do instead. */
  def versionDelta(spark: SparkSession, dir: String, v: Int,
      prefix: String = "v"): DataFrame = {
    val cur = readVersion(spark, dir, v, prefix)
    if (v == 0) cur else cur.exceptAll(readVersion(spark, dir, v - 1, prefix))
  }

  /** Streaming CDC feed of the table's COMMITS: one row
    * (version INT, metadata STRING) per newly committed version, exactly
    * once. Built on Spark's file-stream source over the manifest
    * directory — the source's checkpointed processed-files log is what
    * makes delivery exactly-once across restarts (a restarted query
    * resumes from the checkpoint and never re-emits an already-processed
    * commit file). Writer-side temp files are dot-prefixed, so the
    * source's hidden-file convention ignores them; a commit file is
    * hard-linked/renamed into place with complete content, so a half
    * -written manifest row can never be observed. Subscribers turn
    * versions into data via foreachBatch + `versionDelta` (see
    * `cdcSubscribe`). */
  def commitFeed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .option("maxFilesPerTrigger", 1) // one commit per micro-batch: a
      // subscriber's foreachBatch sees version boundaries, not a coalesced
      // blob of several commits
      .text(s"$dir/manifest")
      .select(
        regexp_extract(input_file_name(), "commit_(\\d+)", 1)
          .cast("int").as("version"),
        col("value").as("metadata"))
  }

  /** Subscribe to the table: a started streaming query that, for every
    * newly committed version, loads that version's delta rows and hands
    * them to `onDelta(version, metadata, deltaRows)` exactly once. The
    * returned query owns a checkpoint at `checkpointDir`; restarting with
    * the same checkpoint resumes without replay. This closes the
    * ingest → serve → subscribe loop: downstream consumers follow the
    * table without polling or re-reading history. */
  def cdcSubscribe(spark: SparkSession, dir: String, checkpointDir: String,
      onDelta: (Int, String, DataFrame) => Unit,
      prefix: String = "v"): org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        // commit files are tiny; the per-batch row set is bounded by
        // maxFilesPerTrigger — driver-side collect here is collecting
        // VERSION NUMBERS, never data
        batch.collect().sortBy(_.getAs[Int]("version")).foreach { r =>
          val v = r.getAs[Int]("version")
          onDelta(v, r.getAs[String]("metadata"),
            versionDelta(spark, dir, v, prefix))
        }
      }
    commitFeed(spark, dir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(fn)
      .start()
  }
}
