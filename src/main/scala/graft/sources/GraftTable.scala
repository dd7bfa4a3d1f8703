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

  /** Declared stat columns: name → long-valued ordinal expression (see
    * `computeStats`); one alias so the four write-path signatures that
    * accept it cannot drift. */
  type StatsCols =
    Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)]

  /** Latest committed (version, metadata), if any commit exists. */
  def readManifest(fs: FileSystem, dir: String): Option[(Int, String)] =
    currentVersion(fs, dir).map(v => (v, meta(fs, dir, v)))

  /** CURRENT-version resolution in O(1 + commits-since-hint) existence
    * probes — the manifest-checkpoint lever: at 10⁵ commits, listing
    * the manifest dir on every snapshot read IS the read-path
    * bottleneck on an object store. `_last` is a best-effort POINTER
    * (Delta's `_last_checkpoint` idiom) each commit overwrites after
    * publishing; it is a HINT, never truth — always ≤ the real current
    * version (written post-publish; a crash between publish and hint
    * just leaves it stale), so the reader verifies it and probes
    * FORWARD until the first missing commit file. A missing, corrupt
    * or torn hint falls back to the full listing. The underscore name
    * keeps the file invisible to Spark's file sources (hidden-file
    * rule), so `commitFeed`'s stream over the manifest dir never sees
    * it. */
  def currentVersion(fs: FileSystem, dir: String): Option[Int] = {
    def probeFrom(v0: Int): Int = {
      var v = v0
      while (fs.exists(new Path(s"$dir/manifest/commit_${v + 1}"))) v += 1
      v
    }
    val hint =
      try {
        val p = new Path(s"$dir/manifest/_last")
        if (!fs.exists(p)) None
        else readSmallFile(fs, p).trim.toIntOption
      } catch { case _: java.io.IOException => None }
    val resolved = hint match {
      case Some(h) if h >= 0 &&
          fs.exists(new Path(s"$dir/manifest/commit_$h")) =>
        Some(probeFrom(h))
      case _ =>
        // no usable hint: one listing, then probe forward anyway (the
        // listing and a concurrent commit can race — forward probing
        // makes the result the same one the hint path would return)
        versions(fs, dir).maxOption.map(probeFrom)
    }
    // READER-side hint repair: if this resolution had to probe (or
    // list) far past the hint — e.g. a writer whose hint writes keep
    // failing — rewrite it best-effort so the cost does not recur on
    // every read. Threshold keeps the common read pure.
    // repair only when a (stale) hint EXISTS: a hint-less table may be
    // a read-only mount or a pre-hint manifest — plain reads must never
    // attempt writes there; its first successful commit plants the hint
    resolved.foreach { v =>
      hint.foreach(h => if (v.toLong - h.toLong > 4L) writeHint(fs, dir, v))
    }
    resolved
  }

  /** Best-effort `_last` write — failure degrades reads to the listing
    * fallback, never correctness. */
  private def writeHint(fs: FileSystem, dir: String, v: Int): Unit =
    try {
      val out = fs.create(new Path(s"$dir/manifest/_last"), true)
      try out.write(v.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch { case _: java.io.IOException => () }

  /** Whole small file as UTF-8 (commit files, the `_last` hint). */
  private def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
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

  /** Reserved commit-file HEADER keys. A commit file is zero or more
    * leading `key=value` header lines drawn from this set, followed by
    * the caller's metadata (one line — `commit` enforces it). Headers
    * carry the table format's own record keeping:
    *
    *   data=<dirname>   writer-private data dir (isolated commits)
    *   ts=<epochMillis> wall-clock commit time, recorded by the WRITER
    *                    at publish — TIMESTAMP AS OF resolves from this,
    *                    not from FS mtime, so time travel survives FS
    *                    migrations and coarse-mtime filesystems
    *   stats=<encoded>  per-file column statistics (see `TableStats`)
    *   dv=<dir>;<keys>  deletion vector: a tombstone-key dir + the
    *                    comma-separated key columns, applied as a
    *                    broadcast anti-join at read (merge-on-read
    *                    DELETE — see `commitDeleteVector`)
    *
    * Keeping headers line-oriented keeps old manifests readable: a
    * round-12 commit file with no ts= line still parses (mtime fallback
    * in `versionAsOf`). */
  private val headerKeys = Seq("data=", "ts=", "stats=", "dv=")

  private def isHeaderLine(l: String): Boolean = headerKeys.exists(l.startsWith)

  /** Raw content of version `v`'s commit file. */
  private def commitContent(fs: FileSystem, dir: String, v: Int): String =
    readSmallFile(fs, new Path(s"$dir/manifest/commit_$v"))

  /** (headers, metadata) split of a commit file's content: leading
    * reserved `key=value` lines are headers, the remainder is the
    * caller's metadata. `commit` rejects metadata that COULD be read
    * back as a header line, so the split is unambiguous. */
  private[graft] def parseCommit(c: String): (Map[String, String], String) = {
    val lines = c.split("\n", -1)
    val hdr = lines.takeWhile(isHeaderLine)
    val headers = hdr.map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1).trim)
    }.toMap
    (headers, lines.drop(hdr.length).mkString("\n").trim)
  }

  /** Metadata string of committed version `v`. */
  def meta(fs: FileSystem, dir: String, v: Int): String =
    parseCommit(commitContent(fs, dir, v))._2

  /** Name of the data dir version `v`'s commit references — the
    * manifest is the source of truth for WHERE a version's data lives,
    * not a path convention (an isolated commit's writer-private dir is
    * recorded in its commit file; convention-path commits default to
    * `$prefix$v`). */
  def dataDirOf(fs: FileSystem, dir: String, v: Int,
      prefix: String = "v"): String =
    parseCommit(commitContent(fs, dir, v))._1.getOrElse("data", s"$prefix$v")

  // ---- manifest-level file statistics ---------------------------------------

  /** Per-file column statistics of one committed version — the
    * data-skipping index Delta/Iceberg keep in the transaction log. At
    * 10⁴–10⁶ files per table, pruning from parquet FOOTERS still pays a
    * full listing plus one open per file; pruning from the manifest pays
    * O(stats-line) and never touches a skipped file. Stat values are
    * ORDINAL LONGS: the committer declares each stat column as a
    * long-valued expression (timestamps via unix_micros, numerics via
    * cast) so range overlap is a plain integer comparison — the testable
    * core of the typed min/max JSON the production formats store.
    * `mins(i)`/`maxs(i)` align with `cols(i)`; `file` is the data-file
    * path RELATIVE to the version's data dir — a bare name for a flat
    * layout, `p=a/part-….parquet` under partitionBy (basenames collide
    * across partition subdirs). The data dir itself comes from the
    * commit's data= header, so stats survive a data-dir rename only the
    * manifest knows about. */
  final case class FileStats(file: String, rows: Long,
      mins: Seq[Long], maxs: Seq[Long])

  final case class TableStats(cols: Seq[String], files: Seq[FileStats]) {
    /** One-line encoding for the stats= commit header:
      * `c1,c2;f|rows|min1|max1|min2|max2;...` — file names are
      * URL-encoded so the delimiters can never collide. */
    def encoded: String = {
      def enc(s: String) =
        java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      cols.map(enc).mkString(",") + ";" + files.map { f =>
        (Seq(enc(f.file), f.rows.toString) ++
          f.mins.zip(f.maxs).flatMap { case (a, b) => Seq(a.toString, b.toString) })
          .mkString("|")
      }.mkString(";")
    }

    /** Files whose [min,max] range on `col` intersects [lo,hi] — the
      * read set of a band predicate; everything else is skippable
      * WITHOUT being listed or opened. */
    def overlapping(col: String, lo: Long, hi: Long): Seq[FileStats] =
      overlappingRect(Seq((col, lo, hi)))

    /** Files whose per-column [min,max] HYPER-RECTANGLE intersects every
      * band in `bands` — the multi-dimensional read set. Conjunctive by
      * construction: a file survives only if it can hold a row matching
      * ALL bands, which is exactly the guarantee a z-ordered layout
      * makes tight (Round13Ops.zorderLayout) and a 1-D sort leaves
      * full-width on every non-sort column. */
    def overlappingRect(bands: Seq[(String, Long, Long)]): Seq[FileStats] = {
      val idx = bands.map { case (c, lo, hi) =>
        val i = cols.indexOf(c)
        require(i >= 0, s"no stats recorded for column '$c' (have $cols)")
        (i, lo, hi)
      }
      files.filter(f => idx.forall { case (i, lo, hi) =>
        f.maxs(i) >= lo && f.mins(i) <= hi
      })
    }
  }

  object TableStats {
    def decode(s: String): TableStats = {
      def dec(x: String) =
        java.net.URLDecoder.decode(x, java.nio.charset.StandardCharsets.UTF_8)
      val parts = s.split(";", -1)
      val cols = parts.head.split(",").map(dec).toSeq
      val files = parts.tail.filter(_.nonEmpty).map { fe =>
        val xs = fe.split("\\|", -1)
        val vals = xs.drop(2).map(_.toLong)
        FileStats(dec(xs(0)), xs(1).toLong,
          vals.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }.toSeq,
          vals.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v }.toSeq)
      }.toSeq
      TableStats(cols, files)
    }
  }

  /** Stats of committed version `v`, when its commit recorded any. */
  def statsOf(fs: FileSystem, dir: String, v: Int): Option[TableStats] =
    parseCommit(commitContent(fs, dir, v))._1.get("stats").map(TableStats.decode)

  /** Compute per-file (rows, min/max) stats over a just-written data
    * dir. `statsCols` maps column name → long-valued Column (the
    * ordinal encoding above). One grouped pass over the written files —
    * at write time the files are hot, and this replaces the
    * per-READ listing+footer pass with a once-per-commit cost, exactly
    * the trade the transaction-log formats make. */
  private def computeStats(spark: SparkSession, dataPath: String,
      statsCols: StatsCols): TableStats = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(dataPath)
    // the declared ordinal must land as a LONG whatever width the
    // caller's expression returns (an int32 stat column would otherwise
    // surface Integer rows here) — the cast is exact for any integral
    val aggs = statsCols.flatMap { case (name, ord) =>
      val l = ord(col(name)).cast(org.apache.spark.sql.types.LongType)
      Seq(min(l).as(s"__min_$name"), max(l).as(s"__max_$name"))
    }
    // key by the path RELATIVE to the data dir, not the basename: a
    // partitionBy layout reuses one task's part-file name across every
    // partition subdir, so basenames collide (merging distinct files
    // into one bogus stats row) and lose the subdir a reader needs to
    // rebuild the path. The relative path survives both.
    val dataName = new Path(dataPath).getName
    val rows = df
      .groupBy(regexp_replace(input_file_name(),
        "^.*?/" + java.util.regex.Pattern.quote(dataName) + "/", "")
        .as("__file"))
      .agg(count(lit(1)).as("__rows"), aggs: _*)
      .orderBy("__file")
      .collect() // one small row per FILE — never data
    TableStats(statsCols.map(_._1),
      rows.toSeq.map { r =>
        // a file whose stat column is entirely null has NO range: min/
        // max aggregate to null, and a naive getAs would unbox that to
        // a fabricated 0. Record the EMPTY range (min=MaxValue,
        // max=MinValue) instead — it intersects no band, which is
        // correct (null never matches a band predicate), and a
        // graft_stats consumer sees an unmistakable sentinel rather
        // than data that was never there.
        def longOr(name: String, empty: Long): Long = {
          val i = r.fieldIndex(name)
          if (r.isNullAt(i)) empty else r.getLong(i)
        }
        FileStats(r.getAs[String]("__file"), r.getAs[Long]("__rows"),
          statsCols.map(c => longOr(s"__min_${c._1}", Long.MaxValue)),
          statsCols.map(c => longOr(s"__max_${c._1}", Long.MinValue)))
      })
  }

  /** The log-skipping read: resolve version `v`'s data files whose
    * recorded [min,max] on `col` intersects [lo,hi] FROM THE MANIFEST
    * and read exactly those — the skipped files are never listed, never
    * opened, their footers never fetched. Returns (DataFrame over the
    * overlapping files, paths read, total file count in the version) so
    * callers — and the spec — can see the skip ratio. The band predicate
    * still needs re-applying by the caller (file granularity ≠ row
    * granularity), same as partition pruning. An empty read set yields
    * an empty frame with the version's schema. */
  def readStatsBand(spark: SparkSession, dir: String, v: Int, col: String,
      lo: Long, hi: Long, prefix: String = "v"): (DataFrame, Seq[String], Int) =
    readStatsRect(spark, dir, v, Seq((col, lo, hi)), prefix)

  /** Version `v`'s parsed commit headers + stats, with guarded
    * failures a SQL user can act on: a clear error for a version that
    * was never committed, and another for one whose commit recorded no
    * statistics. ONE commit-file read serves both the stats and the
    * data-dir resolution of the caller. */
  private def headersAndStats(fs: FileSystem, dir: String,
      v: Int): (Map[String, String], TableStats) = {
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    val hdrs = parseCommit(commitContent(fs, dir, v))._1
    (hdrs, hdrs.get("stats").map(TableStats.decode).getOrElse(sys.error(
      s"version $v of $dir carries no file statistics in its commit")))
  }

  /** Multi-dimensional log skipping: resolve version `v`'s files whose
    * stats hyper-rectangle intersects EVERY band, from the manifest
    * alone (see `readStatsBand`). With a z-ordered layout the per-file
    * rectangles are tight in all clustered dimensions, so a 2-D band
    * read prunes multiplicatively — the log-based serve path of
    * `sink_zorder_clustered`'s footer-based proof. One commit-file
    * read resolves stats AND data dir. */
  def readStatsRect(spark: SparkSession, dir: String, v: Int,
      bands: Seq[(String, Long, Long)], prefix: String = "v")
      : (DataFrame, Seq[String], Int) = {
    val fs = fsOf(spark, dir)
    val (hdrs, st) = headersAndStats(fs, dir, v)
    val data = hdrs.getOrElse("data", s"$prefix$v")
    val hit = st.overlappingRect(bands).map(f => s"$dir/$data/${f.file}")
    val df =
      // basePath pins partition discovery to the DATA DIR: without it,
      // leaf files under p=.../ would each anchor their own base and
      // the partition columns would silently vanish from the schema
      // (diverging from the empty-set branch, which serves
      // readVersion's full schema)
      if (hit.nonEmpty)
        spark.read.option("basePath", s"$dir/$data").parquet(hit: _*)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        readVersion(spark, dir, v, prefix).schema)
    (df, hit, st.files.size)
  }

  /** Total row count of version `v` answered FROM THE MANIFEST — the
    * metadata-only COUNT(*) every transaction-log format serves without
    * touching a data file (the stats line already sums the per-file
    * parquet row counts at commit time). None when the commit carries
    * no stats. O(one commit-file read); works even with the version's
    * data offline. */
  def rowCountOf(fs: FileSystem, dir: String, v: Int): Option[Long] =
    statsOf(fs, dir, v).map(_.files.map(_.rows).sum)

  /** SHALLOW CLONE: make `dstDir` a new table whose version 0 is a
    * METADATA-ONLY reference to `srcDir`'s current data — no data file
    * is copied or written; the clone's commit file simply NAMES the
    * source's data dir through the same data= indirection every
    * isolated commit uses (a relative path out of the clone's dir, the
    * way Delta's shallow clone records the source's file paths in its
    * own log). Stats travel with the reference, so log-based skipping
    * and metadata-only counts serve on the clone immediately. The clone
    * then evolves INDEPENDENTLY — its next versions commit into its own
    * dir and the source never sees them. Standard shallow-clone hazard,
    * inherited deliberately: vacuuming/retention-expiring the SOURCE
    * can orphan the clone's v0 reference (the clone's own vacuum never
    * reaches outside its dir — `dirVersion` ignores `../` names). */
  def cloneShallow(spark: SparkSession, srcDir: String, dstDir: String,
      metadata: String = "shallow clone"): Unit = {
    val fs = fsOf(spark, srcDir)
    val sv = currentVersion(fs, srcDir).getOrElse(
      sys.error(s"nothing to clone: no committed version under $srcDir"))
    require(currentVersion(fs, dstDir).isEmpty,
      s"clone target $dstDir already has a committed version")
    require(fs.makeQualified(new Path(srcDir)).getParent ==
      fs.makeQualified(new Path(dstDir)).getParent,
      "shallow clone requires src and dst to be sibling table dirs " +
        "(the clone records a ../<src> relative data reference)")
    val srcName = new Path(srcDir).getName
    val hdrs = parseCommit(commitContent(fs, srcDir, sv))._1
    val rel = s"../$srcName/${hdrs.getOrElse("data", s"v$sv")}"
    // a dv-bearing source snapshot clones WITH its deletion vector —
    // the tombstone dir re-referenced through the same ../ indirection
    // as the data (dropping it would silently resurrect deleted rows
    // in the clone)
    val dvRel = hdrs.get("dv").map { spec =>
      val Array(dvDir, keys) = spec.split(";", 2)
      s"../$srcName/$dvDir;$keys"
    }
    commit(fs, dstDir, 0, metadata, dataDir = Some(rel),
      stats = hdrs.get("stats").map(TableStats.decode), dv = dvRel)
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
      dataDir: Option[String] = None, stats: Option[TableStats] = None,
      dv: Option[String] = None): Unit = {
    // metadata is ONE line that must not masquerade as a header: an
    // embedded newline would split it across feed rows / future header
    // parses, and a leading reserved key=` prefix would be read back as
    // a header (a convention-path commit whose metadata started with
    // `data=` used to break readVersion for that version). Reject both
    // loudly at the write boundary — the manifest is the table's source
    // of truth and never gets to hold ambiguous bytes.
    require(!metadata.contains('\n') && !metadata.contains('\r'),
      s"commit metadata must be a single line (got ${metadata.length} chars " +
        "with a line break) — encode structured metadata before committing")
    require(!isHeaderLine(metadata),
      s"commit metadata must not start with a reserved header key " +
        s"(${headerKeys.mkString(", ")}): '${metadata.take(40)}'")
    // stats describe the RAW files; under a deletion vector every
    // stats-served read (readStatsBand/Rect, rowCountOf) would count
    // tombstoned rows and disagree with readVersion. Refuse the
    // combination rather than serve half-true statistics.
    require(stats.isEmpty || dv.isEmpty,
      "a commit cannot carry both stats= and dv=: file statistics " +
        "describe raw files and would serve deleted rows — purge the " +
        "deletion vector before committing statistics")
    // validate the dv spec at the WRITE boundary (<dir>;<keys>) — a
    // malformed header would otherwise surface as a MatchError in some
    // later readVersion/cloneShallow, far from the faulty writer
    dv.foreach { spec =>
      val parts = spec.split(";", 2)
      require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
        s"dv= header must be '<tombstoneDir>;<keyCol[,keyCol…]>': '$spec'")
    }
    // version numbers are GAP-FREE by contract — `currentVersion`'s
    // probe-forward resolution depends on it (a commit beyond cur+1
    // would be invisible until the gap filled). v <= cur is allowed
    // through: that is the racing-writers state, and the atomic publish
    // below resolves it with a ConcurrentModificationException rather
    // than a validation error (commitWithRetry relies on the CME).
    require(v == 0 || fs.exists(new Path(s"$dir/manifest/commit_${v - 1}")),
      s"version $v would leave a gap in $dir's dense version sequence " +
        "(commit the next version instead)")
    val mdir = new Path(s"$dir/manifest")
    fs.mkdirs(mdir)
    // writer-PRIVATE temp name: two racing writers must not clobber each
    // other's staged metadata before the publish step decides the winner
    val tmp = new Path(mdir, s".tmp_${v}_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    // ts= is always recorded (versionAsOf prefers it over FS mtime) and
    // incidentally guarantees a commit file is never zero-byte, so the
    // streaming manifest feed can never silently skip an empty-metadata
    // version.
    val content = dataDir.map(n => s"data=$n\n").getOrElse("") +
      s"ts=${System.currentTimeMillis()}\n" +
      stats.map(st => s"stats=${st.encoded}\n").getOrElse("") +
      dv.map(d => s"dv=$d\n").getOrElse("") +
      metadata
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
    // best-effort current-version hint for `currentVersion`'s
    // probe-forward read path: written only AFTER the publish won, so
    // it can lag but never lead the truth; last-writer-wins overwrite
    // is fine (versions are gap-free, so any committed version is a
    // valid probe start)
    writeHint(fs, dir, v)
    if (retain != Int.MaxValue) {
      // GC by the version encoded in the dir NAME (covers data dirs in
      // both naming forms AND dvN_ tombstone dirs) — but never a dir a
      // retained commit still references
      val keep = versions(fs, dir).filter(_ >= v - retain).flatMap { kv =>
        val hdrs = parseCommit(commitContent(fs, dir, kv))._1
        hdrs.getOrElse("data", s"$prefix$kv") ::
          hdrs.get("dv").map(_.split(";", 2)(0)).toList
      }.toSet
      fs.listStatus(new Path(dir)).foreach { st =>
        val n = st.getPath.getName
        if (!keep.contains(n) &&
            (dirVersion(n, prefix).exists(_ < v - retain) ||
              dirVersion(n, "dv").exists(_ < v - retain)))
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
    val v = currentVersion(fs, dir).map(_ + 1).getOrElse(0)
    stage(df, dir, v, prefix)
    commit(fs, dir, v, metadata, retain, prefix)
    v
  }

  /** The manifest-resolved CURRENT snapshot — the only sanctioned latest
    * read; never point a reader at a data dir directly. */
  def read(spark: SparkSession, dir: String, prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    val v = currentVersion(fs, dir)
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
    val hdrs = parseCommit(commitContent(fs, dir, v))._1
    val data = hdrs.getOrElse("data", s"$prefix$v")
    require(fs.exists(new Path(s"$dir/$data")),
      s"version $v's data has been garbage-collected (retention)")
    val base = spark.read.parquet(s"$dir/$data")
    // merge-on-read: a dv= header names the version's tombstone keys;
    // the read subtracts them with a BROADCAST anti-join — the DV is
    // small by construction (deleted keys only), so at 100 TB the base
    // scan stays shuffle-free and no data file is rewritten
    hdrs.get("dv") match {
      case Some(spec) =>
        val Array(dvDir, keys) = spec.split(";", 2)
        val keyCols = keys.split(",").toSeq
        base.join(
          org.apache.spark.sql.functions.broadcast(
            spark.read.parquet(s"$dir/$dvDir")),
          keyCols, "left_anti")
      case None => base
    }
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
      prefix: String = "v", partitionBy: Seq[String] = Nil,
      statsCols: StatsCols = Nil): Int = {
    val fs = fsOf(spark, dir)
    val v = currentVersion(fs, dir).map(_ + 1).getOrElse(0)
    val data = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    val w = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$dir/$data")
    val st =
      if (statsCols.isEmpty) None
      else Some(computeStats(spark, s"$dir/$data", statsCols))
    commit(fs, dir, v, metadata, retain, prefix, dataDir = Some(data), stats = st)
    v
  }

  /** DESCRIBE HISTORY: one row per committed version — (version,
    * metadata, commit wall-clock ms, has_stats, has_dv, n_rows from the
    * stats line when recorded). O(versions) commit-file reads, never
    * data; the audit surface every table format exposes, also served to
    * SQL as the `graft_history('<dir>')` TVF. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, dir)
    versions(fs, dir).map { v =>
      val (hdrs, md) = parseCommit(commitContent(fs, dir, v))
      (v, md, commitTimeFrom(hdrs, fs, dir, v),
        hdrs.contains("stats"), hdrs.contains("dv"),
        hdrs.get("stats").map(TableStats.decode(_).files.map(_.rows).sum))
    }.toDF("version", "metadata", "commit_ms", "has_stats", "has_dv",
      "n_rows")
  }

  /** The skipping index as a RELATION: one row per (file, stat column)
    * of version `v`'s recorded statistics — (file, rows, col, min,
    * max), min/max in the committer's ordinal-long encoding. Served to
    * SQL as `graft_stats('<dir>', v)`, so a planner-less consumer (an
    * ops notebook, a data-layout audit) can compute overlap sets,
    * clustering quality or row counts with plain SQL instead of the
    * Scala API. O(one commit-file read), never data. */
  def statsTable(spark: SparkSession, dir: String, v: Int): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, dir)
    val st = headersAndStats(fs, dir, v)._2
    st.files.flatMap { f =>
      st.cols.indices.map(i =>
        (f.file, f.rows, st.cols(i), f.mins(i), f.maxs(i)))
    }.toDF("file", "rows", "col", "min", "max")
  }

  /** MERGE-ON-READ delete: commit a new version that shares the current
    * version's data dir UNCHANGED and carries a DELETION VECTOR — the
    * distinct `keyCols` of `tombstones` written as a small parquet dir,
    * applied by `readVersion` as a broadcast anti-join. This is the
    * other half of the delete trade `table_delete_rows` (copy-on-write)
    * demonstrates: CoW pays a full rewrite at delete time and nothing at
    * read; MoR pays ~nothing at delete time (the tombstone keys + one
    * O(manifest) commit — rewriting a 1 TB file to drop 10 rows is
    * exactly what this avoids) and one broadcast anti-join per read.
    * DVs are CUMULATIVE: deleting on a version that already carries a
    * DV unions the old tombstones in, so each version's dv= header is
    * self-contained and time travel to any version sees exactly its
    * deletes. Stats do NOT carry over (a DV invalidates the row counts;
    * min/max would stay sound but a half-true stats line is worse than
    * none). `purgeDeleteVector` materializes the survivors as a plain
    * copy-on-write version — Delta's REORG PURGE — returning the table
    * to DV-free reads. */
  def commitDeleteVector(spark: SparkSession, dir: String,
      tombstones: DataFrame, keyCols: Seq[String], metadata: String = "",
      prefix: String = "v"): Int = {
    require(keyCols.nonEmpty, "deletion vector needs at least one key column")
    require(keyCols.forall(c => !c.contains(",") && !c.contains(";")),
      s"key column names must not contain the dv= header delimiters: $keyCols")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to delete from"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    val data = hdrs.getOrElse("data", s"$prefix$cur")
    val v = cur + 1
    val dvDir = s"dv${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    import org.apache.spark.sql.functions.col
    val fresh = tombstones.select(keyCols.map(col): _*).distinct()
    val full = hdrs.get("dv") match {
      case Some(spec) =>
        val prev = spark.read.parquet(s"$dir/${spec.split(";", 2)(0)}")
        prev.unionByName(fresh).distinct()
      case None => fresh
    }
    full.write.mode("errorifexists").parquet(s"$dir/$dvDir")
    commit(fs, dir, v, metadata, prefix = prefix, dataDir = Some(data),
      dv = Some(s"$dvDir;${keyCols.mkString(",")}"))
    v
  }

  /** Materialize the current version's DV into a plain rewrite (Delta's
    * REORG … APPLY (PURGE)): survivors become a fresh isolated data dir,
    * the new version carries no dv= header, and reads are anti-join-free
    * again. The moment to pay the CoW cost — once, when DVs have
    * accumulated — instead of at every delete. */
  def purgeDeleteVector(spark: SparkSession, dir: String,
      metadata: String = "purge deletion vector", prefix: String = "v"): Int =
    commitNextIsolated(spark, dir, read(spark, dir, prefix), metadata,
      prefix = prefix)

  /** The OCC commit LOOP the commit doc prescribes: read the current
    * snapshot, apply the caller's `transform` to it (None when the table
    * has no version yet), stage writer-private, attempt the commit; on
    * losing the race (ConcurrentModificationException) re-read the NEW
    * current snapshot, re-apply, re-stage, retry — so two writers with
    * COMMUTING changes (e.g. merges of disjoint changelogs) BOTH land
    * instead of the loser failing outright. This is Delta's
    * write-conflict retry in its simplest honest form: re-execution of
    * the transform against the fresh snapshot is what makes the retry
    * semantically safe (a blind re-publish of the stale staged data
    * would silently drop the winner's changes). Bounded attempts; the
    * loser's abandoned staging dirs are vacuum-reclaimable orphans.
    * Returns the committed version number. */
  def commitWithRetry(spark: SparkSession, dir: String,
      transform: Option[DataFrame] => DataFrame, metadata: String = "",
      maxAttempts: Int = 10, retain: Int = Int.MaxValue,
      prefix: String = "v"): Int = {
    var attempt = 0
    while (true) {
      attempt += 1
      val fs = fsOf(spark, dir)
      val cur = currentVersion(fs, dir)
      val out = transform(cur.map(v => readVersion(spark, dir, v, prefix)))
      val v = cur.map(_ + 1).getOrElse(0)
      val data = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
      out.write.mode("errorifexists").parquet(s"$dir/$data")
      try {
        commit(fs, dir, v, metadata, retain, prefix, dataDir = Some(data))
        return v
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxAttempts) throw e
        // anything else (disk failure etc.) propagates — only a genuine
        // commit conflict justifies another loop
      }
    }
    -1 // unreachable
  }

  // ---- exactly-once streaming ingest ----------------------------------------

  /** Commit one micro-batch as a table version, idempotently keyed by
    * the streaming `epochId`: the epoch is recorded in the commit
    * metadata (`epoch=<id>`), and a batch whose epoch some committed
    * version already carries is a NO-OP — Structured Streaming replays
    * the last un-checkpointed batch after a restart, and replay must not
    * mint a duplicate version (the foreachBatch half of exactly-once;
    * the source checkpoint is the other half). Detection compares
    * against the NEWEST epoch-tagged commit only (epochs arrive
    * monotonically from the engine), so the per-batch manifest cost is
    * O(non-epoch suffix), never a full history scan — and never data.
    * Returns the committed version, or None for a detected replay. */
  def commitEpoch(spark: SparkSession, dir: String, epochId: Long,
      retain: Int = Int.MaxValue, prefix: String = "v",
      statsCols: StatsCols = Nil)
      (df: => DataFrame): Option[Int] = {
    val fs = fsOf(spark, dir)
    // Replay detection in O(1) for the common case: walk versions
    // NEWEST-first and compare against the most recent epoch-tagged
    // commit. Structured Streaming delivers batch ids monotonically, so
    // epochId <= the newest committed epoch ⇔ replay — without reading
    // every historical commit file per micro-batch (each carries its
    // full stats= line when statsCols is set; a forward scan would be
    // O(versions × stats-bytes) per batch). Interleaved NON-epoch
    // commits (manual maintenance on the same table) are walked past;
    // out-of-order manual epoch use is outside the contract.
    val newestEpoch = versions(fs, dir).sorted(Ordering[Int].reverse)
      .iterator
      .map(v => meta(fs, dir, v))
      .filter(_.startsWith("epoch="))
      .flatMap(_.stripPrefix("epoch=").toLongOption)
      .nextOption()
    if (newestEpoch.exists(epochId <= _)) None
    else Some(commitNextIsolated(spark, dir, df, s"epoch=$epochId", retain,
      prefix, statsCols = statsCols))
  }

  /** Streaming writer INTO the versioned store: every micro-batch of
    * `stream` becomes one atomically committed GraftTable version, with
    * `commitEpoch`'s replay detection making the version history immune
    * to restarts. `transform(currentSnapshot, batch)` decides what each
    * version holds — the default commits the raw batch (a
    * per-micro-batch version log); a MERGE-style sink passes a fold of
    * snapshot × batch (see `stream_table_sink`'s latest-per-key state),
    * and the by-name plumbing means a detected replay evaluates NOTHING:
    * no snapshot read, no fold, no write. This closes the ingest half of
    * the lakehouse loop — `cdcSubscribe` (the read half) can follow the
    * same table the stream writes. The batch body runs on the driver
    * like every foreachBatch sink; the WRITE inside it is a distributed
    * parquet write plus an O(manifest) commit. */
  def streamingSink(dir: String, checkpointDir: String, stream: DataFrame,
      retain: Int = Int.MaxValue, prefix: String = "v",
      transform: (Option[DataFrame], DataFrame) => DataFrame = (_, b) => b,
      statsCols: StatsCols = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, epochId) => {
        val s = batch.sparkSession
        commitEpoch(s, dir, epochId, retain, prefix, statsCols) {
          val fs = fsOf(s, dir)
          transform(currentVersion(fs, dir).map(_ => read(s, dir, prefix)),
            batch.toDF())
        }
        ()
      }
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(fn)
      .start()
  }

  /** TIMESTAMP AS OF resolution: the latest version committed at or
    * before `asOfMs` (epoch millis). The commit instant is the ts=
    * header the WRITER recorded at publish (millisecond wall clock,
    * inside the commit file's content — survives FS migrations and
    * filesystems with coarse mtime granularity); manifests from before
    * the header existed fall back to the commit file's FS modification
    * time. None when no commit existed yet at `asOfMs`. */
  def versionAsOf(fs: FileSystem, dir: String, asOfMs: Long): Option[Int] =
    versions(fs, dir).filter { v =>
      commitTimeMs(fs, dir, v) <= asOfMs
    }.maxOption

  /** Wall-clock commit time of version `v`: the ts= header when present
    * (every commit since it was introduced writes one), else FS mtime. */
  def commitTimeMs(fs: FileSystem, dir: String, v: Int): Long =
    commitTimeFrom(parseCommit(commitContent(fs, dir, v))._1, fs, dir, v)

  /** The ts-header-else-mtime rule over ALREADY-PARSED headers — the
    * single implementation `commitTimeMs` and `history` share, so a
    * caller that holds the headers (history reads every commit file
    * once) never re-opens the file and the fallback rule cannot
    * diverge between TIMESTAMP AS OF and DESCRIBE HISTORY. */
  private def commitTimeFrom(hdrs: Map[String, String], fs: FileSystem,
      dir: String, v: Int): Long =
    hdrs.get("ts").flatMap(_.toLongOption)
      .getOrElse(fs.getFileStatus(new Path(s"$dir/manifest/commit_$v"))
        .getModificationTime)

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
    * names.
    *
    * `graceMs` is the safety window for a dir carrying the CURRENT
    * version number: an OCC retry writer stages `$prefix${cur+1}_…`
    * (never reclaimable here), but a writer racing for version `cur`
    * ITSELF — staged just before the winner published — looks exactly
    * like an orphan the instant it loses. A dir modified within the last
    * `graceMs` is therefore skipped, so a slow in-flight writer's
    * staging is never yanked out from under it between its write and its
    * (failing) commit; once the window passes the loser is provably
    * abandoned (its commit attempt has long since thrown) and is
    * reclaimed by the next vacuum. graceMs = 0 keeps the old eager
    * semantics for tests that construct their orphans synchronously. */
  def vacuum(fs: FileSystem, dir: String, prefix: String = "v",
      graceMs: Long = 0L): Seq[String] = {
    val committed = versions(fs, dir)
    if (committed.isEmpty) return Seq.empty
    val cur = committed.max
    val cutoff = System.currentTimeMillis() - graceMs
    // referenced = every retained commit's data dir AND deletion-vector
    // dir — a dv dir stays live as long as ANY commit names it (time
    // travel to a dv-bearing version still applies its tombstones); an
    // orphan dv dir (a race-losing commitDeleteVector's staging) is
    // reclaimable garbage like any other unreferenced staging dir
    val referenced = committed.flatMap { v =>
      val hdrs = parseCommit(commitContent(fs, dir, v))._1
      hdrs.getOrElse("data", s"$prefix$v") ::
        hdrs.get("dv").map(_.split(";", 2)(0)).toList
    }.toSet
    fs.listStatus(new Path(dir)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        !referenced.contains(n) &&
          (dirVersion(n, prefix).exists(_ <= cur) ||
            dirVersion(n, "dv").exists(_ <= cur)) &&
          st.getModificationTime <= cutoff
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
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
    * `cdcSubscribe`).
    *
    * The file is read WHOLE (`wholetext`) — one row per commit FILE, not
    * per line: an isolated commit's file is `data=` + `ts=` (+ `stats=`)
    * header lines plus the metadata, and a line-based read would emit
    * one feed row per line, firing a subscriber once per header for the
    * same version (double-applied deltas — the round-12 advisory).
    * Header lines are stripped here with the same reserved-prefix rule
    * `meta()` uses, so the feed carries exactly the caller's metadata;
    * and because every commit writes a ts= header, a commit file is
    * never zero-byte, so no committed version can vanish from the feed. */
  def commitFeed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .option("maxFilesPerTrigger", 1) // one commit per micro-batch: a
      // subscriber's foreachBatch sees version boundaries, not a coalesced
      // blob of several commits
      .option("wholetext", true)
      .text(s"$dir/manifest")
      .select(
        regexp_extract(input_file_name(), "commit_(\\d+)", 1)
          .cast("int").as("version"),
        // the strip pattern is DERIVED from headerKeys — a second
        // hardcoded list here once lagged it (the dv= header leaked
        // into subscribers' metadata when deletion vectors landed)
        trim(regexp_replace(col("value"),
          s"(?s)^((?:${headerKeys.map(_.stripSuffix("=")).mkString("|")})" +
            "=[^\\n]*\\n)*", "")).as("metadata"))
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
