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

  /** REGISTERED stat-column ordinal encodings — the statenc= header's
    * vocabulary. A plain `statsCols` lambda is opaque code: only the
    * writer that declared it can build sound band bounds, so the
    * manifest's skipping index is invisible to a generic reader. A
    * column declared through this registry instead records its encoding
    * NAME in the commit (`statenc=`), and any reader — the DSv2 scan's
    * pushed-filter pruning in particular — can re-encode a query
    * literal driver-side with `literalOrdinal` and prune files against
    * the recorded [min,max] bands soundly. Both sides of each encoding
    * are defined HERE, together, so they can never drift:
    *
    *   id   — integral column, ordinal = the value itself
    *   us   — timestamp/date column, ordinal = epoch MICROS (UTC
    *          session — the suite-wide canon `T.epochUs` mirrors)
    *   days — date column, ordinal = epoch DAYS
    */
  object StatsEnc {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{unix_date, unix_micros}
    import org.apache.spark.sql.types.{DateType, LongType, TimestampType}

    val names: Set[String] = Set("id", "us", "days")

    /** The write-side ordinal expression of a registered encoding. */
    def ordinal(enc: String): Column => Column = enc match {
      case "id"   => c => c.cast(LongType)
      case "us"   => c => unix_micros(c.cast(TimestampType))
      case "days" => c => unix_date(c.cast(DateType))
      case other  => sys.error(
        s"unknown stats encoding '$other' (registered: $names)")
    }

    /** INVERSE of the ordinal encoding: a recorded min/max ordinal back
      * to the column's CATALYST-INTERNAL value (what Catalyst column
      * statistics carry — micros Long for timestamps, epoch-day Int for
      * dates, the numeric itself for `id`). None when the encoding
      * cannot represent the column's type — the caller then reports no
      * min/max for that column (never a guess). */
    def ordinalValue(enc: String, ordinal: Long,
        dt: org.apache.spark.sql.types.DataType): Option[Any] = {
      import org.apache.spark.sql.types._
      (enc, dt) match {
        case ("id", LongType)    => Some(ordinal)
        case ("id", IntegerType) => Some(ordinal.toInt)
        case ("id", ShortType)   => Some(ordinal.toShort)
        case ("id", ByteType)    => Some(ordinal.toByte)
        // TimestampType only — NOT TimestampNTZType: Spark's
        // FilterEstimation has no case for ntz (MatchError at
        // evaluateBinary), so advertising an ntz min/max would CRASH
        // any CBO-enabled query filtering on the column. An absent
        // stat is merely conservative.
        case ("us", TimestampType) => Some(ordinal)
        case ("days", DateType)  => Some(ordinal.toInt)
        case _ => None
      }
    }

    /** Driver-side ordinal of a pushed-filter LITERAL under a registered
      * encoding — the exact long the write-side expression would produce
      * for the same value (UTC session canon for the temporal ones).
      * None for a literal type the encoding does not cover: the caller
      * must then skip pruning on that predicate (never guess). */
    def literalOrdinal(enc: String, v: Any): Option[Long] = {
      val utc = java.time.ZoneOffset.UTC
      def dateOf(x: Any): Option[java.time.LocalDate] = x match {
        case d: java.sql.Date      => Some(d.toLocalDate)
        case d: java.time.LocalDate => Some(d)
        case _                     => None
      }
      def micros(x: Any): Option[Long] = x match {
        case t: java.sql.Timestamp =>
          // floorDiv, not truncation: a PRE-EPOCH sub-second instant
          // (getTime < 0) truncates toward zero one second too high,
          // which would shift a band bound by a full second
          Some(math.multiplyExact(
            Math.floorDiv(t.getTime, 1000L), 1000000L) +
            t.getNanos / 1000L)
        case i: java.time.Instant =>
          Some(math.addExact(
            math.multiplyExact(i.getEpochSecond, 1000000L),
            i.getNano / 1000L))
        // TIMESTAMP_NTZ literals surface as LocalDateTime; the write
        // side's ntz→timestamp cast binds the UTC session zone, so the
        // literal twin does the same
        case l: java.time.LocalDateTime => micros(l.toInstant(utc))
        case other =>
          dateOf(other).map(d =>
            math.multiplyExact(d.atStartOfDay(utc).toEpochSecond, 1000000L))
      }
      enc match {
        case "id" => v match {
          case l: java.lang.Long    => Some(l)
          case i: java.lang.Integer => Some(i.longValue)
          case s: java.lang.Short   => Some(s.longValue)
          case b: java.lang.Byte    => Some(b.longValue)
          case _                    => None
        }
        case "us"   => micros(v)
        case "days" => dateOf(v).map(_.toEpochDay)
        case _      => None
      }
    }

    /** The temporal encodings bind the writer's session zone through
      * the ntz/date → timestamp cast, while `literalOrdinal` re-encodes
      * at UTC — the registry's whole promise is that the two sides can
      * never disagree, so a non-UTC writer session is REFUSED at
      * declaration time rather than silently recording bands a generic
      * reader would mis-prune against. */
    private[graft] def requireUtcSession(spark: SparkSession,
        statsEnc: Seq[(String, String)]): Unit =
      if (statsEnc.exists(e => e._2 == "us" || e._2 == "days")) {
        val tz = spark.sessionState.conf.sessionLocalTimeZone
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
          s"statsEnc temporal encodings are defined at UTC, but the " +
            s"writer session zone is '$tz' — set " +
            "spark.sql.session.timeZone=UTC (the suite-wide canon) or " +
            "declare a lambda statsCols ordinal instead")
      }

    /** The one statsEnc declaration gate every committer shares:
      * registered names only, no statsCols overlap, UTC session for
      * temporal encodings — returning the effective StatsCols (caller
      * lambdas plus registry ordinals). */
    private[graft] def validateAndMerge(spark: SparkSession,
        statsCols: StatsCols,
        statsEnc: Seq[(String, String)]): StatsCols = {
      statsEnc.foreach { case (c, e) =>
        require(names.contains(e),
          s"unknown stats encoding '$e' for column '$c' " +
            s"(registered: $names)")
        require(!statsCols.exists(_._1 == c),
          s"column '$c' is declared in both statsCols and statsEnc — " +
            "pick one declaration")
      }
      requireUtcSession(spark, statsEnc)
      statsCols ++ statsEnc.map { case (c, e) => (c, ordinal(e)) }
    }

    private[graft] def encode(specs: Seq[(String, String)]): String =
      specs.map { case (c, e) => s"${urlEnc(c)}:$e" }.mkString(",")

    private[graft] def decode(s: String): Seq[(String, String)] =
      s.split(",", -1).toSeq.filter(_.nonEmpty).map { p =>
        val i = p.lastIndexOf(':'); (urlDec(p.take(i)), p.drop(i + 1))
      }
  }

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
    var hintExisted = false
    val hint =
      try {
        val p = new Path(s"$dir/manifest/_last")
        if (!fs.exists(p)) None
        else { hintExisted = true; readSmallFile(fs, p).trim.toIntOption }
      } catch { case _: java.io.IOException => None }
    val usable = hint.filter(h => h >= 0 &&
      fs.exists(new Path(s"$dir/manifest/commit_$h")))
    val resolved = usable match {
      case Some(h) => Some(probeFrom(h))
      case None =>
        // no usable hint: one listing, then probe forward anyway (the
        // listing and a concurrent commit can race — forward probing
        // makes the result the same one the hint path would return)
        listVersions(fs, dir).maxOption.map(probeFrom)
    }
    // READER-side hint repair: if this resolution had to probe far past
    // the hint (a writer whose hint writes keep failing), or the hint
    // EXISTED but was unusable — corrupt bytes, or ahead of truth as in
    // a restored/partially-copied table dir — rewrite it best-effort so
    // the listing cost does not recur on every subsequent read (a
    // leading hint never self-heals otherwise: no commit may ever
    // overwrite it). The lag threshold keeps the common read pure.
    // Repair only when a hint file EXISTS: a hint-less table may be a
    // read-only mount or a pre-hint manifest — plain reads must never
    // attempt writes there; its first successful commit plants the hint
    resolved.foreach { v =>
      if (hintExisted && (usable.isEmpty || v.toLong - hint.get.toLong > 4L))
        writeHint(fs, dir, v)
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

  /** All committed version numbers, ascending. Version numbers are
    * DENSE by `commit`'s gap-free contract (v requires commit_{v-1},
    * and commit files are never deleted — retention removes only DATA),
    * so the committed set is exactly 0..currentVersion, resolved
    * through the `_last` hint in O(1 + commits-since-hint) existence
    * probes — no directory listing when the hint is fresh. This is what
    * keeps `commitEpoch`'s per-micro-batch replay probe off the
    * full-manifest listing a long-lived streaming table would otherwise
    * pay every batch (the round-13 advisory). `readVersion` is what
    * enforces data retention for old versions. */
  def versions(fs: FileSystem, dir: String): Seq[Int] =
    currentVersion(fs, dir).map(v => (0 to v): Seq[Int]).getOrElse(Seq.empty)

  /** The full manifest-directory listing — `currentVersion`'s fallback
    * when the `_last` hint is missing or unusable; every other reader
    * goes through the dense-range resolution above. */
  private def listVersions(fs: FileSystem, dir: String): Seq[Int] = {
    val mdir = new Path(s"$dir/manifest")
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).iterator.map(_.getPath.getName)
      .filter(_.startsWith("commit_"))
      .flatMap(_.stripPrefix("commit_").toIntOption).toSeq.sorted
  }

  // ---- manifest checkpoint --------------------------------------------------

  private def urlEnc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
  private def urlDec(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** CHECKPOINT the manifest: consolidate every committed version's
    * commit-file content (headers, stats lines, metadata — the whole
    * file, URL-encoded per line) into ONE atomically-replaced file,
    * `manifest/_checkpoint`. Delta's parquet checkpoint in its testable
    * core: after 10⁵ commits, a full-history consumer — DESCRIBE
    * HISTORY, TIMESTAMP AS OF — would otherwise pay one open per commit
    * file on every call; with a checkpoint it pays ONE read plus the
    * commits-since-checkpoint suffix (`allCommitContents`). The file is
    * a HINT like `_last`, never truth: it is derived data rebuilt from
    * the commit files it summarizes, a torn or stale copy is detected
    * (head/terminator version match, dense line check) and degrades the
    * reader to per-file resolution, and the underscore name hides it
    * from Spark's file sources so `commitFeed` never sees it. Run it on
    * demand or wire `checkpointEvery` into the streaming ingest path.
    * Returns the checkpointed version. */
  def checkpoint(fs: FileSystem, dir: String): Int = {
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"nothing to checkpoint: no committed version under $dir"))
    // never REGRESS the published checkpoint: a slow concurrent
    // checkpoint() that resolved an older cur must not replace a newer
    // file with one covering a shorter prefix — readers would silently
    // degrade to more per-file suffix reads until the next pass. The
    // guard is best-effort (two writers can still interleave between
    // this read and the rename below) but closes the slow-loser case;
    // an interleaved regression remains self-healing derived data.
    readCheckpoint(fs, dir).map(_._1).filter(_ >= cur) match {
      case Some(covered) => return covered
      case None => ()
    }
    // resolve the prefix through the PREVIOUS checkpoint (same path the
    // readers use): periodic checkpointing stays O(suffix) per call —
    // re-reading all commit files each time would make a streaming
    // table's total checkpoint I/O quadratic in its version count.
    // Pinned to the ONE `cur` read above: a commit racing in between
    // would otherwise add body lines the v=/end= head doesn't claim,
    // and readCheckpoint would reject the file as torn
    val contents = commitContentsUpTo(fs, dir, cur)
    val body = (s"v=$cur" +:
      contents.map { case (v, c) => s"$v\t${urlEnc(c)}" } :+
      s"end=$cur").mkString("\n")
    val mdir = new Path(s"$dir/manifest")
    val tmp = new Path(mdir, s"._cptmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    replaceAtomic(fs, tmp, new Path(mdir, "_checkpoint"))
    cur
  }

  /** Atomic REPLACE of `dest` with a fully-written `src` — the
    * checkpoint publish. Unlike `publishNoOverwrite`, last-writer-wins
    * is correct here: every checkpoint of the same table is equivalent
    * derived data (a newer one merely covers a longer prefix). */
  private def replaceAtomic(fs: FileSystem, src: Path, dest: Path): Unit =
    fs match {
      case cfs: org.apache.hadoop.fs.ChecksumFileSystem =>
        def local(p: Path) =
          java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
        java.nio.file.Files.move(local(src), local(dest),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // the raw NIO move bypasses the checksum layer: relocate the
        // sidecar .crc alongside (identical bytes → checksum stays
        // valid for the new name) so repeated checkpoints don't litter
        // the manifest dir with one orphaned crc per call
        try {
          val (sc, dc) = (cfs.getChecksumFile(src), cfs.getChecksumFile(dest))
          if (java.nio.file.Files.exists(local(sc)))
            java.nio.file.Files.move(local(sc), local(dc),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } catch { case _: java.io.IOException => () }
      case _ =>
        org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
          .rename(src, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

  /** (checkpointed version N, commit contents for 0..N) when a
    * readable, untorn, self-consistent checkpoint exists; None degrades
    * the consumer to per-file reads — same contract as `_last`. */
  private[graft] def readCheckpoint(fs: FileSystem,
      dir: String): Option[(Int, IndexedSeq[String])] =
    try {
      val p = new Path(s"$dir/manifest/_checkpoint")
      if (!fs.exists(p)) None
      else {
        val lines = readSmallFile(fs, p).split("\n", -1)
        val head = lines.headOption.filter(_.startsWith("v="))
          .flatMap(_.stripPrefix("v=").toIntOption)
        head match {
          case Some(n) if lines.lastOption.contains(s"end=$n") &&
              lines.length == n + 3 =>
            val body = lines.slice(1, lines.length - 1)
            val dense = body.zipWithIndex.forall { case (l, i) =>
              val t = l.indexOf('\t'); t > 0 && l.take(t) == i.toString
            }
            if (dense)
              Some((n, body.map(l => urlDec(l.drop(l.indexOf('\t') + 1)))
                .toIndexedSeq))
            else None
          case _ => None // torn, corrupt, or foreign — fall back
        }
      }
    } catch { case _: Exception => None }

  /** Commit contents of every version 0..current, ascending — resolved
    * from the checkpoint for its prefix and from individual commit
    * files only for the suffix: the O(1 + suffix) full-history scan
    * `history` and `versionAsOf` run on. Without a checkpoint this is
    * the plain O(versions) per-file walk it always was. */
  private def allCommitContents(fs: FileSystem,
      dir: String): Seq[(Int, String)] =
    currentVersion(fs, dir) match {
      case None => Seq.empty
      case Some(cur) => commitContentsUpTo(fs, dir, cur)
    }

  /** Contents of commits 0..`cur` — checkpoint-resolved prefix plus
    * per-file suffix. Taking `cur` from the caller (instead of
    * re-resolving) lets `checkpoint()` pin one consistent snapshot: a
    * commit racing between two currentVersion reads would otherwise
    * yield a body longer than its v=/end= head claims — a checkpoint
    * every reader rejects as torn. */
  private def commitContentsUpTo(fs: FileSystem, dir: String,
      cur: Int): Seq[(Int, String)] = {
    val cp = readCheckpoint(fs, dir)
    (0 to cur).map { v =>
      v -> cp.collect { case (cv, cs) if v <= cv => cs(v) }
        .getOrElse(commitContent(fs, dir, v))
    }
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
    *                    DELETE — see `commitDeleteVector`). A THIRD
    *                    field `;scoped` marks DIR-SCOPED tombstones:
    *                    the dv dir then carries a `__dir` column (chain
    *                    dir BASENAME) and each pair kills its key only
    *                    in that dir — what merge-on-read UPDATE needs,
    *                    where the same key's replacement lives in a
    *                    LATER dir that must survive (`commitUpdate`)
    *   update=<dir>     marks a MoR UPDATE commit and names the dir
    *                    carrying the replacement rows — the typed-CDF
    *                    fast path reads post-images from it and
    *                    pre-images from the newly-tombstoned rows,
    *                    never a full-outer diff
    *   pmap=<col>|<v>:<e>,…  PARTITION-MAPPED table: the snapshot is
    *                    the union of one entry dir per partition VALUE
    *                    of <col> (entries are `<stagedRoot>/__p=<v>`
    *                    subdir paths inside data=). The map is what
    *                    `replacePartitionsWithRetry` recomputes on a
    *                    lost race — untouched values keep the winner's
    *                    entries, replaced ones point at the loser's
    *                    already-staged dirs
    *   wset=<v>,…       the partition values THIS commit replaced —
    *                    the conflict vocabulary: a race loser whose
    *                    wset is disjoint from every winner's re-commits
    *                    its staged result WITHOUT re-executing
    *   statrel=1        the stats= line's file keys are TABLE-relative
    *                    (the tail-compaction commit shape: multiple
    *                    data dirs, one spanning stats line, no append
    *                    marker — `compactChainTail`)
    *   append=<dir>     marks an APPEND commit and names the one data
    *                    dir this version added on top of its
    *                    predecessor's (whose dirs the data= list
    *                    repeats) — the marker `versionDelta`'s CDC fast
    *                    path reads instead of diffing two snapshots
    *   schema=<cols>    the committed DataFrame's schema (URL-encoded
    *                    name:type list) — what the write-time schema
    *                    compatibility gate validates the NEXT commit
    *                    against (see `schemaGate`)
    *   partby=<cols>    the version's data dir is a partitionBy layout
    *                    on these columns — what `commitAppend*` refuses
    *                    to append onto (a flat appended dir beside a
    *                    partitioned one makes the union unreadable:
    *                    Spark rejects conflicting directory structures)
    *   bloom=<col>|m|k  the version's data dir carries a per-file Bloom
    *                    filter sidecar (`_bloom`, invisible to scans —
    *                    Spark ignores underscore-prefixed files) on the
    *                    URL-encoded column, m bits per file, k probes —
    *                    the point-lookup skipping index `readBloomEq`
    *                    serves (min/max bands can't prune an equality
    *                    probe on an unclustered high-cardinality key)
    *   constraints=<s>  comma-separated URL-encoded constraint specs
    *                    (`notnull:<col>` / `check:<sql>` /
    *                    `unique:<col[+col…]>`) the table DECLARED —
    *                    every subsequent write re-enforces them before
    *                    staging and carries the header forward (see
    *                    `enforceConstraints`)
    *   statenc=<s>      comma-separated `<urlEnc col>:<encName>` pairs
    *                    naming the REGISTERED ordinal encoding
    *                    (`StatsEnc`) the stats line used for each listed
    *                    column. A lambda-declared `statsCols` ordinal is
    *                    code the manifest cannot describe; a statenc
    *                    column's ordinal comes from the registry, so a
    *                    GENERIC reader — the DSv2 scan's filter-pushdown
    *                    pruning — can re-encode a query literal
    *                    driver-side and prune files soundly. Only
    *                    registry-declared columns are scan-prunable.
    *
    * Keeping headers line-oriented keeps old manifests readable: a
    * round-12 commit file with no ts= line still parses (mtime fallback
    * in `versionAsOf`), and one with no schema= line simply skips the
    * write gate for its successor. */
  private val headerKeys =
    Seq("data=", "ts=", "stats=", "dv=", "pdv=", "append=", "schema=",
      "partby=", "bloom=", "constraints=", "statenc=", "update=", "pmap=",
      "wset=", "statrel=", "colmap=", "bucketfn=", "sortw=")

  private def isHeaderLine(l: String): Boolean = headerKeys.exists(l.startsWith)

  /** Raw content of version `v`'s commit file. */
  private def commitContent(fs: FileSystem, dir: String, v: Int): String =
    readSmallFile(fs, new Path(s"$dir/manifest/commit_$v"))

  /** Parsed headers of version `v`'s commit, with the standard loud
    * failure for a never-committed version — the resolution step every
    * out-of-object reader (the DSv2 table) starts from. */
  private[graft] def headersOf(fs: FileSystem, dir: String,
      v: Int): Map[String, String] = {
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    parseCommit(commitContent(fs, dir, v))._1
  }

  /** `dataDirsFrom` against parsed headers, for out-of-object readers. */
  private[graft] def dataDirsOfHeaders(hdrs: Map[String, String], v: Int,
      prefix: String = "v"): Seq[String] = dataDirsFrom(hdrs, v, prefix)

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
      prefix: String = "v"): String = {
    val dirs = dataDirsOf(fs, dir, v, prefix)
    // an append version references a dir LIST; returning the raw
    // comma-joined header here would hand callers a nonexistent path
    // that fails far from the cause — refuse loudly instead
    require(dirs.size == 1,
      s"version $v references ${dirs.size} data dirs (append chain) — " +
        "use dataDirsOf")
    dirs.head
  }

  /** Data dirs (≥1) version `v`'s commit references, in commit order:
    * the data= header as a comma-separated list — APPEND commits
    * reference every predecessor dir plus the one they added, so a
    * version stays one self-contained file set — defaulting to the
    * conventional `$prefix$v`. Dir names never contain a comma (they
    * are this format's own `$prefix${n}[_uuid]` / `dvN_uuid` /
    * `../sibling/...` forms). */
  private def dataDirsFrom(hdrs: Map[String, String], v: Int,
      prefix: String): Seq[String] =
    hdrs.get("data").map(_.split(",").toSeq).getOrElse(Seq(s"$prefix$v"))

  /** Public view of `dataDirsFrom` for version `v`. */
  def dataDirsOf(fs: FileSystem, dir: String, v: Int,
      prefix: String = "v"): Seq[String] =
    dataDirsFrom(parseCommit(commitContent(fs, dir, v))._1, v, prefix)

  // ---- write-time schema compatibility --------------------------------------

  /** One-line schema encoding for the schema= commit header: URL-encoded
    * `name:type` pairs, comma-joined (catalogString types, so nested
    * types round-trip; encoding keeps `,`/`:` inside struct types from
    * colliding with the delimiters). */
  private[graft] def schemaEncode(
      schema: org.apache.spark.sql.types.StructType): String =
    schema.fields.map(f =>
      s"${urlEnc(f.name)}:${urlEnc(f.dataType.catalogString)}").mkString(",")

  private[graft] def schemaDecode(s: String): Seq[(String, String)] =
    s.split(",", -1).toSeq.filter(_.nonEmpty).map { f =>
      val i = f.indexOf(':'); (urlDec(f.take(i)), urlDec(f.drop(i + 1)))
    }

  /** The DECLARED schema of a version, parsed from its schema= header —
    * the one decode `readVersion` and the MoR update engine share for
    * conformance reads (so the two can never diverge on what the
    * header means). */
  private def declaredSchemaOf(hdrs: Map[String, String])
      : Option[org.apache.spark.sql.types.StructType] =
    hdrs.get("schema").map(enc =>
      org.apache.spark.sql.types.StructType(schemaDecode(enc).map {
        case (n, t) => org.apache.spark.sql.types.StructField(
          n, org.apache.spark.sql.types.DataType.fromDDL(t))
      }))

  /** WRITE-TIME schema compatibility gate: compare the next commit's
    * schema against the current version's recorded schema= header BY
    * NAME (column order and nullability are not schema identity here —
    * a repartition or select reorder must not refuse) and throw BEFORE
    * anything is staged when they differ — so a typo'd column name
    * fails at the faulty writer naming the offending field, instead of
    * committing fine and surfacing as a reader-side analysis error N
    * versions later. Additions, drops and retypes are EVOLUTION: legal
    * only when the caller declares intent with `allowEvolution = true`
    * (the change is then recorded implicitly — the new version's own
    * schema= header is the evolution record, diffable via `history`'s
    * commit files). Append commits never evolve (their reader unions
    * the predecessor's files by physical schema). A predecessor with no
    * schema= header (pre-gate manifests, raw `commit()` callers) skips
    * validation — the gate is best-effort over recorded schemas, never
    * a reader. */
  // ---- declared table constraints -------------------------------------------

  /** Split a `constraints=` header back into specs. */
  private[graft] def constraintsDecode(s: String): Seq[String] =
    s.split(",").toSeq.filter(_.nonEmpty).map(urlDec)

  private[graft] def constraintsEncode(specs: Seq[String]): String =
    specs.map(urlEnc).mkString(",")

  /** The predecessor's declared constraints, decoded from
    * already-parsed current headers — what every write path enforces
    * and carries. */
  private def carriedConstraints(
      cur: Option[(Int, Map[String, String])]): Seq[String] =
    cur.flatMap(_._2.get("constraints")).map(constraintsDecode)
      .getOrElse(Nil)

  /** Syntax-validate a constraint spec at DECLARATION time — a typo'd
    * kind or an unparseable CHECK expression must fail the declaring
    * commit, not some later writer's enforcement pass. */
  private def validateConstraintSpec(spec: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val (kind, arg) = spec.span(_ != ':') match {
      case (k, a) if a.startsWith(":") && a.length > 1 => (k, a.tail)
      case _ => throw new IllegalArgumentException(
        s"malformed constraint '$spec' — expected kind:arg with kind in " +
          "{notnull, check, unique}")
    }
    kind match {
      case "notnull" =>
        require(schema.fieldNames.contains(arg),
          s"notnull constraint names unknown column '$arg' " +
            s"(have ${schema.fieldNames.toSeq})")
      case "unique" =>
        val cols = arg.split('+').toSeq
        cols.foreach(c => require(schema.fieldNames.contains(c),
          s"unique constraint names unknown column '$c' " +
            s"(have ${schema.fieldNames.toSeq})"))
      case "check" =>
        // parse now (throws on bad SQL); resolution against the schema
        // happens at enforcement
        org.apache.spark.sql.functions.expr(arg)
        ()
      case other => throw new IllegalArgumentException(
        s"unknown constraint kind '$other' in '$spec' — expected " +
          "notnull, check or unique")
    }
  }

  /** Enforce declared constraints on rows about to be committed —
    * BEFORE anything stages, so a violation creates no version and no
    * orphan dir. Semantics follow SQL/Delta:
    *
    *  - `notnull:c` — no row may hold NULL in c;
    *  - `check:<sql>` — no row may evaluate the predicate to FALSE
    *    (NULL passes, the ANSI unknown-is-not-a-violation rule — use
    *    notnull to forbid the null itself);
    *  - `unique:c1+c2` — no two rows share a key. For an APPEND,
    *    `existing` carries the current snapshot's keys and the new rows
    *    are checked against themselves AND against it — the honest
    *    O(snapshot keys) price of uniqueness without a global key
    *    index, which is why Delta supports only NOT NULL and CHECK;
    *    here it is opt-in.
    *
    * notnull + check fold into ONE aggregation pass over `df`; each
    * unique spec costs one more (a groupBy on its key). */
  private def enforceConstraints(df: DataFrame,
      specs: Seq[String], context: String,
      existing: Option[DataFrame] = None): Unit = {
    import org.apache.spark.sql.functions._
    if (specs.isEmpty) return
    val rowRules = specs.flatMap { spec =>
      val Array(kind, arg) = spec.split(":", 2)
      kind match {
        case "notnull" =>
          Some(spec -> sum(when(col(arg).isNull, 1L).otherwise(0L)))
        case "check" =>
          val p = expr(arg)
          Some(spec -> sum(when(p.isNull || p, 0L).otherwise(1L)))
        case _ => None
      }
    }
    if (rowRules.nonEmpty) {
      val row = df.agg(rowRules.head._2.as("c0"),
        rowRules.tail.zipWithIndex.map { case ((_, a), i) =>
          a.as(s"c${i + 1}") }: _*).collect()(0) // one row — never data
      val bad = rowRules.zipWithIndex.collect {
        case ((spec, _), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
          s"$spec (${row.getLong(i)} rows)"
      }
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"$context refused — constraint violations: ${bad.mkString("; ")}")
    }
    specs.filter(_.startsWith("unique:")).foreach { spec =>
      val keys = spec.stripPrefix("unique:").split('+').toSeq
      val dups = df.groupBy(keys.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count()
      if (dups > 0)
        throw new IllegalStateException(
          s"$context refused — constraint violation: $spec " +
            "(duplicate keys in the written rows)")
      existing.foreach { ex =>
        val clash = df.select(keys.map(col): _*)
          .join(ex.select(keys.map(col): _*), keys, "left_semi")
          .limit(1).count()
        if (clash > 0)
          throw new IllegalStateException(
            s"$context refused — constraint violation: $spec " +
              "(appended keys already exist in the table)")
      }
    }
  }

  /** Same-scale precision growth — the one retype whose value domain
    * only grows (shared by the schema gate's undeclared-widen carve-out
    * and `changeFeed`'s preimage cast guard). */
  private def losslessDecimalWiden(from: String, to: String): Boolean = {
    val decRe = """decimal\((\d+),(\d+)\)""".r
    (from, to) match {
      case (decRe(p1, s1), decRe(p2, s2)) => s1 == s2 && p2.toInt >= p1.toInt
      case _ => false
    }
  }

  private[graft] def schemaGate(prevEncoded: Option[String],
      next: org.apache.spark.sql.types.StructType, allowEvolution: Boolean,
      context: String = "commit"): Unit =
    prevEncoded.foreach { pe =>
      val prev = schemaDecode(pe).toMap
      val nxt = next.fields.map(f => f.name -> f.dataType.catalogString).toMap
      val added = (nxt.keySet -- prev.keySet).toSeq.sorted
      val dropped = (prev.keySet -- nxt.keySet).toSeq.sorted
      // LOSSLESS decimal widening (same scale, precision grows) passes
      // without a declaration: decimal arithmetic widens precision by
      // construction (sum/add of decimal(12,2) is decimal(22,2)+), so a
      // MERGE-style read-modify-write would otherwise need
      // allowEvolution on every commit — the value domain only grows,
      // which is the type-widening carve-out Delta makes too. The
      // carve-out does NOT extend to appends: an append version's
      // reader unions PHYSICAL parquet schemas across dirs, and a
      // widened decimal can change the physical encoding (INT64 →
      // FIXED_LEN_BYTE_ARRAY), making the committed version unreadable
      // — appends are exact, full stop.
      def losslessWiden(from: String, to: String): Boolean =
        context != "append" && losslessDecimalWiden(from, to)
      val retyped = prev.keySet.intersect(nxt.keySet).toSeq.sorted
        .filter(k => prev(k) != nxt(k) && !losslessWiden(prev(k), nxt(k)))
        .map(k => s"$k: ${prev(k)} -> ${nxt(k)}")
      if (added.nonEmpty || dropped.nonEmpty || retyped.nonEmpty) {
        val diff = Seq(
          if (added.nonEmpty) Some(s"added=${added.mkString("[", ", ", "]")}")
          else None,
          if (dropped.nonEmpty)
            Some(s"dropped=${dropped.mkString("[", ", ", "]")}")
          else None,
          if (retyped.nonEmpty)
            Some(s"retyped=${retyped.mkString("[", ", ", "]")}")
          else None).flatten.mkString(", ")
        if (context == "append")
          throw new IllegalArgumentException(
            s"append refused — an append commit must match the current " +
              s"version's schema exactly ($diff); commit a full version " +
              "with allowEvolution = true to change the schema. " +
              "NO version was created")
        if (!allowEvolution)
          throw new IllegalArgumentException(
            s"schema change refused ($diff) — pass allowEvolution = true " +
              "to commit a schema evolution. NO version was created")
      }
    }

  /** The current version's recorded schema= header (None when no commit
    * or no recorded schema), plus its headers — one commit-file read
    * shared by the gate and the caller's data-dir resolution. */
  private def currentHeaders(fs: FileSystem, dir: String)
      : Option[(Int, Map[String, String])] =
    currentVersion(fs, dir).map(v =>
      (v, parseCommit(commitContent(fs, dir, v))._1))

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
      mins: Seq[Long], maxs: Seq[Long], nulls: Seq[Long] = Nil)

  /** A per-file skipping predicate over the recorded statistics: either
    * a [lo,hi] range on a stat column's ordinal encoding, or an
    * IS NULL / IS NOT NULL nullability test against the recorded null
    * counts. Bands conjoin — a file survives only if it can hold a row
    * matching ALL of them. */
  sealed trait Band
  final case class RangeBand(col: String, lo: Long, hi: Long) extends Band
  final case class NullBand(col: String, isNull: Boolean) extends Band

  final case class TableStats(cols: Seq[String], files: Seq[FileStats]) {
    /** One-line encoding for the stats= commit header:
      * `c1,c2;f|rows|min1|max1|min2|max2|null1|null2;...` — file names
      * are URL-encoded so the delimiters can never collide; per-column
      * null counts ride at the end of each file entry so a pre-null
      * stats line (2+2k fields instead of 2+3k) still decodes. */
    def encoded: String = {
      cols.map(urlEnc).mkString(",") + ";" + files.map { f =>
        (Seq(urlEnc(f.file), f.rows.toString) ++
          f.mins.zip(f.maxs).flatMap { case (a, b) => Seq(a.toString, b.toString) } ++
          f.nulls.map(_.toString))
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
    def overlappingRect(bands: Seq[(String, Long, Long)]): Seq[FileStats] =
      matching(bands.map { case (c, lo, hi) => RangeBand(c, lo, hi) })

    /** The general conjunctive read set over range AND nullability
      * bands. IS NULL skips a file whose recorded null count is 0;
      * IS NOT NULL skips one whose nulls == rows (an all-null file has
      * nothing non-null to serve). A file from a stats line recorded
      * before null counts existed is conservatively KEPT by null bands
      * — skipping is an optimization and must never drop a row. */
    def matching(bands: Seq[Band]): Seq[FileStats] = {
      def idx(c: String): Int = {
        val i = cols.indexOf(c)
        require(i >= 0, s"no stats recorded for column '$c' (have $cols)")
        i
      }
      val resolved = bands.map {
        case RangeBand(c, lo, hi) => (idx(c), Some((lo, hi)), false)
        case NullBand(c, isNull) => (idx(c), None, isNull)
      }
      files.filter(f => resolved.forall {
        case (i, Some((lo, hi)), _) => f.maxs(i) >= lo && f.mins(i) <= hi
        case (i, None, isNull) =>
          if (f.nulls.isEmpty) true // pre-null-count stats: keep
          else if (isNull) f.nulls(i) > 0
          else f.nulls(i) < f.rows
      })
    }
  }

  object TableStats {
    def decode(s: String): TableStats = {
      val parts = s.split(";", -1)
      val cols = parts.head.split(",").map(urlDec).toSeq
      val k = cols.size
      val files = parts.tail.filter(_.nonEmpty).map { fe =>
        val xs = fe.split("\\|", -1)
        val vals = xs.drop(2).map(_.toLong)
        // 2k values = min/max pairs only (pre-null encoding); 3k = the
        // per-column null counts ride after the pairs
        FileStats(urlDec(xs(0)), xs(1).toLong,
          (0 until k).map(i => vals(2 * i)),
          (0 until k).map(i => vals(2 * i + 1)),
          if (vals.length >= 3 * k && k > 0)
            (0 until k).map(i => vals(2 * k + i))
          else Nil)
      }.toSeq
      TableStats(cols, files)
    }
  }

  /** Stats of committed version `v`, when its commit recorded any. */
  def statsOf(fs: FileSystem, dir: String, v: Int): Option[TableStats] =
    parseCommit(commitContent(fs, dir, v))._1.get("stats").map(TableStats.decode)

  /** Typed read of a key-tombstone (dv=) sidecar: its columns are the
    * recorded key columns of the DECLARED schema (plus a string `__dir`
    * for scoped DVs), so binding that schema skips the 1-task
    * schema-inference Spark job every dv read otherwise pays (round-21
    * — the pdv sidecars got the same treatment). Falls back to plain
    * inference when the head records no schema, carries colmap
    * indirection (physical names differ), or a key column is missing
    * from the declared schema — inference is always correct, just one
    * job slower. */
  private def readDvSidecar(spark: SparkSession, path: String,
      declared: Option[org.apache.spark.sql.types.StructType],
      keyCols: Seq[String], scoped: Boolean,
      colmapped: Boolean): DataFrame = {
    val typed = declared.filter(_ => !colmapped).flatMap { st =>
      val fields = keyCols.map(k => st.fields.find(_.name == k))
      if (fields.exists(_.isEmpty)) None
      else Some(org.apache.spark.sql.types.StructType(
        fields.map(_.get.copy(nullable = true)) ++
          (if (scoped) Seq(org.apache.spark.sql.types.StructField("__dir",
            org.apache.spark.sql.types.StringType)) else Nil)))
    }
    typed match {
      case Some(st) => spark.read.schema(st).parquet(path)
      case None => spark.read.parquet(path)
    }
  }

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
      // null count = rows − non-null count OF THE ORDINAL — the value
      // the band predicates actually test (an ordinal expression maps
      // null to null, so this matches the column for every declared
      // encoding in the suite)
      Seq(min(l).as(s"__min_$name"), max(l).as(s"__max_$name"),
        count(l).as(s"__cnt_$name"))
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
    // input_file_name() serves the URL-ENCODED path (a space in a
    // partition value reads %20) while every consumer of the recorded
    // names — canonPath matching against the index listing, band-read
    // path reconstruction, the meta-agg coverage gate — works in RAW
    // on-disk names: record the DECODED form, or a special-character
    // partition dir's bands would silently match no planned file.
    // %XX only — URLDecoder's form-decoding would additionally turn a
    // literal '+' (legal in a URI path, left as-is by the encoder)
    // into a space.
    def dec(str: String): String =
      try java.net.URLDecoder.decode(str.replace("+", "%2B"),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: IllegalArgumentException => str }
    val covered = rows.toSeq.map { r =>
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
        val rows = r.getAs[Long]("__rows")
        FileStats(dec(r.getAs[String]("__file")), rows,
          statsCols.map(c => longOr(s"__min_${c._1}", Long.MaxValue)),
          statsCols.map(c => longOr(s"__max_${c._1}", Long.MinValue)),
          statsCols.map(c => rows - r.getAs[Long](s"__cnt_${c._1}")))
      }
    // a ZERO-row file never surfaces through the groupBy (no rows, no
    // group) but it IS part of the version — record it with the empty
    // range so the stats line covers the file set EXACTLY. Consumers
    // that demand set-equal coverage (the metadata-only aggregate
    // pushdown) would otherwise refuse a layout whose hash repartition
    // left an empty task, and band pruning correctly skips it (an
    // empty file matches no predicate). inputFiles serves URI-encoded
    // strings exactly like input_file_name — decode them the same way,
    // so both sides land in the raw on-disk form the covered entries
    // now record.
    val seen = covered.map(_.file).toSet
    val empties = df.inputFiles.toSeq
      .map(_.replaceFirst(
        "^.*?/" + java.util.regex.Pattern.quote(dataName) + "/", ""))
      .map(dec)
      .filterNot(seen)
      .map(f => FileStats(f, 0L,
        statsCols.map(_ => Long.MaxValue),
        statsCols.map(_ => Long.MinValue),
        statsCols.map(_ => 0L)))
    TableStats(statsCols.map(_._1), (covered ++ empties).sortBy(_.file))
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
      : (DataFrame, Seq[String], Int) =
    readStatsBands(spark, dir, v,
      bands.map { case (c, lo, hi) => RangeBand(c, lo, hi) }, prefix)

  /** The general log-skipping read: range bands AND nullability bands
    * (`IS NULL` / `IS NOT NULL` resolved from the recorded per-file
    * null counts — a file with zero nulls in the column is skippable
    * for IS NULL, one that is all-null for IS NOT NULL), conjunctive,
    * resolved entirely from the manifest. File paths come from the
    * version's data= header: one dir for plain versions (stats paths
    * relative to it), the full dir list for APPEND versions (whose
    * stats paths are table-relative — see `commitAppend`). As with
    * every file-granularity skip, the caller re-applies the predicate
    * row-level. */
  def readStatsBands(spark: SparkSession, dir: String, v: Int,
      bands: Seq[Band], prefix: String = "v")
      : (DataFrame, Seq[String], Int) = {
    val fs = fsOf(spark, dir)
    val (hdrs, st) = headersAndStats(fs, dir, v)
    val dataDirs = dataDirsFrom(hdrs, v, prefix)
    // plain commits key stats by path RELATIVE to their one data dir;
    // append commits key by path relative to the TABLE dir, since one
    // stats line spans files from several data dirs (the marker header
    // decides — a v0 append is single-dir but already table-relative)
    // table-relative keys: append commits AND tail-compaction commits
    // (statrel= — multi-dir by construction, one stats line spanning
    // both dirs); plain commits key relative to their one data dir
    val toPath =
      if (hdrs.contains("append") || hdrs.contains("statrel"))
        (f: FileStats) => s"$dir/${f.file}"
      else (f: FileStats) => s"$dir/${dataDirs.head}/${f.file}"
    val hit = st.matching(bands).map(toPath)
    val df =
      if (hit.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          readVersion(spark, dir, v, prefix).schema)
      else if (hdrs.contains("append") || hdrs.contains("statrel"))
        // append chains are FLAT by construction (the gate refuses
        // partitionBy predecessors), so no basePath is needed — and the
        // table dir would not even be an ancestor when the chain starts
        // from a shallow clone's ../src reference
        spark.read.parquet(hit: _*)
      else
        // basePath pins partition discovery to the DATA DIR: without
        // it, leaf files under p=.../ would each anchor their own base
        // and the partition columns would silently vanish from the
        // schema (diverging from the empty-set branch, which serves
        // readVersion's full schema)
        spark.read.option("basePath", s"$dir/${dataDirs.head}")
          .parquet(hit: _*)
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
      metadata: String = "shallow clone"): Int = {
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
    // every data dir the source's current version references (an append
    // version references its whole chain), each re-pointed through ../
    val rel = dataDirsFrom(hdrs, sv, "v")
      .map(d => s"../$srcName/$d").mkString(",")
    // a dv-bearing source snapshot clones WITH its deletion vector —
    // the tombstone dir re-referenced through the same ../ indirection
    // as the data (dropping it would silently resurrect deleted rows
    // in the clone)
    val dvRel = hdrs.get("dv").map { spec =>
      val Array(dvDir, keys) = spec.split(";", 2)
      s"../$srcName/$dvDir;$keys"
    }
    // a positional sidecar travels the same way: its dir re-points
    // through ../ and its contents key on file BASENAMES, which the
    // re-pointing never changes
    val pdvRel = hdrs.get("pdv").map(pd => s"../$srcName/$pd")
    // stats travel with a single-dir reference (paths stay relative to
    // that dir). An APPEND source's stats are keyed relative to the
    // SOURCE table dir — unrepresentable from the clone without an
    // out-of-table base — so the clone drops them (re-derivable by a
    // stats-bearing rewrite; skipping is an optimization, never truth)
    val st =
      if (hdrs.contains("append") || hdrs.contains("statrel")) None
      else hdrs.get("stats").map(TableStats.decode)
    // the Bloom index travels with EVERY clone flavor: its sidecars are
    // self-contained per data dir (file names relative to their own
    // dir, m/k self-described), so the clone's re-pointed dir list
    // resolves them unchanged — append chains included
    commit(fs, dstDir, 0, metadata, dataDir = Some(rel),
      stats = st, dv = dvRel, pdvHdr = pdvRel, schema = hdrs.get("schema"),
      partBy = hdrs.get("partby"), bloom = hdrs.get("bloom"),
      // the clone inherits the source's declared constraints — its
      // future commits enforce them independently
      constraintsHdr = hdrs.get("constraints"),
      // the encoding names travel with the stats line they describe
      // (and are dropped with it when an append source's stats are)
      statenc = st.flatMap(_ => hdrs.get("statenc")),
      // a renamed/dropped-column source serves its logical names
      // through the same mapping in the clone (the re-pointed dirs
      // carry the same physical names)
      colmap = hdrs.get("colmap"),
      // the bucket declaration describes the re-pointed dirs verbatim
      bucketFnHdr = hdrs.get("bucketfn"))
    // the version this clone actually captured — the ONE resolution
    // above, so a concurrent writer on src cannot skew the provenance
    sv
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
      dv: Option[String] = None, appendDir: Option[String] = None,
      schema: Option[String] = None, tsMs: Option[Long] = None,
      retainMs: Long = Long.MaxValue, partBy: Option[String] = None,
      prevTs: Option[Long] = None, bloom: Option[String] = None,
      constraintsHdr: Option[String] = None,
      statenc: Option[String] = None,
      updateDir: Option[String] = None,
      pmap: Option[String] = None, wset: Option[String] = None,
      statrel: Boolean = false, colmap: Option[String] = None,
      bucketFnHdr: Option[String] = None,
      sortw: Option[String] = None,
      pdvHdr: Option[String] = None): Unit = {
    // a version carries AT MOST ONE deletion-vector regime: key
    // tombstones (dv=) and positional sidecars (pdv=) have different
    // merge semantics, and a reader honoring one would silently ignore
    // the other
    require(dv.isEmpty || pdvHdr.isEmpty,
      "a commit cannot carry both dv= and pdv= — the two deletion-vector " +
        "regimes cannot merge on one read")
    // like dv=: stats/bloom describe RAW files and would serve
    // position-tombstoned rows
    require(stats.isEmpty || pdvHdr.isEmpty,
      "a commit cannot carry both stats= and pdv=: statistics describe " +
        "raw files and would serve deleted rows — purge the positional " +
        "deletion vector before committing statistics")
    require(bloom.isEmpty || pdvHdr.isEmpty,
      "a commit cannot carry both bloom= and pdv=: the Bloom index " +
        "describes raw files and would serve deleted rows — purge the " +
        "positional deletion vector before committing a Bloom index")
    // sortw DESCRIBES the partby layout's within-file row order (one
    // file per partition dir, rows sorted by these columns) — only the
    // engine-sorted write path (commitNextIsolated sortWithin) and the
    // data-verbatim doors (restore) may assert it; a declaration
    // without the layout is a planner promise with nothing behind it
    require(sortw.isEmpty || partBy.nonEmpty,
      "sortw= declares the partby= layout's within-file sort and " +
        "cannot be committed without one")
    // colmap DESCRIBES the declared schema (logical→physical names) —
    // meaningless without one
    require(colmap.isEmpty || schema.nonEmpty,
      "colmap= maps the schema= header's names and cannot be committed " +
        "without one")
    // bucketfn DESCRIBES the partby dir layout (bucketCol = bucket(n,
    // keyCol)) — a bucket declaration without the layout is a promise
    // the planner would act on with nothing behind it
    require(bucketFnHdr.isEmpty || partBy.nonEmpty,
      "bucketfn= declares the partby= layout's bucket transform and " +
        "cannot be committed without one")
    require(!statrel || stats.nonEmpty,
      "statrel= qualifies the stats= line and cannot be committed alone")
    require(wset.isEmpty || pmap.nonEmpty,
      "wset= is the partition-mapped conflict vocabulary and cannot be " +
        "committed without pmap=")
    // statenc DESCRIBES the stats line — one never travels without the
    // other (a dangling encoding header would promise prunability the
    // manifest cannot honor)
    require(statenc.isEmpty || stats.nonEmpty,
      "statenc= describes the stats= line and cannot be committed alone")
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
    // same exclusion for the Bloom index: it describes RAW files, and a
    // bloom-served point lookup under a deletion vector would surface
    // tombstoned rows
    require(bloom.isEmpty || dv.isEmpty,
      "a commit cannot carry both bloom= and dv=: the Bloom index " +
        "describes raw files and would serve deleted rows — purge the " +
        "deletion vector before committing a Bloom index")
    // validate the dv spec at the WRITE boundary (<dir>;<keys>) — a
    // malformed header would otherwise surface as a MatchError in some
    // later readVersion/cloneShallow, far from the faulty writer
    dv.foreach { spec =>
      val parts = spec.split(";", -1)
      require((parts.length == 2 ||
          (parts.length == 3 && parts(2) == "scoped")) &&
          parts(0).nonEmpty && parts(1).nonEmpty,
        s"dv= header must be '<tombstoneDir>;<keyCol[,keyCol…]>[;scoped]': " +
          s"'$spec'")
    }
    // an update marker needs its replacement dir in the data list and a
    // SCOPED dv (plain tombstones would kill the replacements too)
    updateDir.foreach { u =>
      require(dataDir.exists(_.split(",").contains(u)),
        s"update= dir '$u' is not among the commit's data dirs " +
          s"(${dataDir.getOrElse("<none>")})")
      require(dv.exists(_.endsWith(";scoped")),
        "an update commit requires dir-scoped tombstones (dv=…;scoped)")
      require(appendDir.isEmpty,
        "a commit cannot be both an append and an update")
    }
    // an append marker must name one of the version's own data dirs —
    // versionDelta's fast path reads exactly that dir as the delta —
    // and an append version never carries a deletion vector (tombstones
    // would silently subtract rows from the marker dir's "added" set)
    appendDir.foreach { a =>
      require(dataDir.exists(_.split(",").contains(a)),
        s"append= dir '$a' is not among the commit's data dirs " +
          s"(${dataDir.getOrElse("<none>")})")
      require(dv.isEmpty,
        "an append commit cannot carry a deletion vector — purge first")
      require(pdvHdr.isEmpty,
        "an append commit cannot carry a positional deletion vector — " +
          "purge first")
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
    // version. The written instant is CLAMPED to the predecessor's
    // ts + 1: under multi-writer clock skew or an NTP step-back a raw
    // wall clock can decrease with version, and then versionAsOf (max
    // version with ts <= asOf) resolves a snapshot that was never
    // current at the queried instant — Delta's in-commit timestamps
    // clamp to parent+1 for exactly this reason. One extra header read
    // per commit buys TIMESTAMP AS OF monotonicity. An explicit `tsMs`
    // (history imports, retention tests) is written verbatim — the
    // monotonicity guarantee is the clock path's. A caller that already
    // holds the predecessor's headers passes `prevTs` so the clamp
    // costs no second commit-file read on the hot write path.
    val ts = tsMs.getOrElse {
      val pts = prevTs.getOrElse {
        if (v == 0) Long.MinValue
        else parseCommit(commitContent(fs, dir, v - 1))._1
          .get("ts").flatMap(_.toLongOption).getOrElse(Long.MinValue)
      }
      math.max(System.currentTimeMillis(),
        if (pts == Long.MinValue) Long.MinValue else pts + 1)
    }
    val content = dataDir.map(n => s"data=$n\n").getOrElse("") +
      appendDir.map(n => s"append=$n\n").getOrElse("") +
      updateDir.map(n => s"update=$n\n").getOrElse("") +
      s"ts=$ts\n" +
      schema.map(sc => s"schema=$sc\n").getOrElse("") +
      partBy.map(p => s"partby=$p\n").getOrElse("") +
      stats.map(st => s"stats=${st.encoded}\n").getOrElse("") +
      dv.map(d => s"dv=$d\n").getOrElse("") +
      pdvHdr.map(d => s"pdv=$d\n").getOrElse("") +
      bloom.map(b => s"bloom=$b\n").getOrElse("") +
      constraintsHdr.map(c => s"constraints=$c\n").getOrElse("") +
      statenc.map(e => s"statenc=$e\n").getOrElse("") +
      pmap.map(p => s"pmap=$p\n").getOrElse("") +
      wset.map(ws => s"wset=$ws\n").getOrElse("") +
      (if (statrel) "statrel=1\n" else "") +
      colmap.map(cm => s"colmap=$cm\n").getOrElse("") +
      bucketFnHdr.map(bf => s"bucketfn=$bf\n").getOrElse("") +
      sortw.map(sw => s"sortw=$sw\n").getOrElse("") +
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
      // retained commit still references (an append CHAIN keeps its
      // predecessors' dirs referenced by every live successor)
      // keep at TOP-LEVEL granularity: a partition-mapped commit's
      // entries are `<root>/__p=<v>` subdir paths, and GC walks the
      // table root — one referenced subdir must protect its whole root
      val keep = versions(fs, dir).filter(_ >= v - retain).flatMap { kv =>
        val hdrs = parseCommit(commitContent(fs, dir, kv))._1
        (dataDirsFrom(hdrs, kv, prefix) ++
          hdrs.get("dv").map(_.split(";", 2)(0)).toList ++
          hdrs.get("pdv").toList)
          .map(_.split('/').head)
      }.toSet
      fs.listStatus(new Path(dir)).foreach { st =>
        val n = st.getPath.getName
        if (!keep.contains(n) &&
            (dirVersion(n, prefix).exists(_ < v - retain) ||
              dirVersion(n, "dv").exists(_ < v - retain) ||
              dirVersion(n, "pdv").exists(_ < v - retain)))
          fs.delete(st.getPath, true)
      }
    }
    // time-based retention composes with (or replaces) the count-based
    // window: reclaim the data of versions whose commit instant has
    // aged out, never the just-committed current version's. The expiry
    // walk resolves headers through the manifest checkpoint when one
    // exists — a long-lived table committing with retainMs should also
    // checkpoint periodically (commitEpoch's checkpointEvery, or
    // maintain()) or this per-commit walk degrades to O(versions) opens
    if (retainMs != Long.MaxValue)
      expireVersions(fs, dir, retainMs, prefix = prefix)
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

  /** Stage + commit `df` as the next version; returns its number. The
    * schema gate runs BEFORE staging (see `schemaGate`) — a refused
    * write creates neither a version nor an orphan dir. */
  def commitNext(spark: SparkSession, dir: String, df: DataFrame,
      metadata: String = "", retain: Int = Int.MaxValue,
      prefix: String = "v", allowEvolution: Boolean = false): Int = {
    val fs = fsOf(spark, dir)
    val cur = currentHeaders(fs, dir)
    schemaGate(cur.flatMap(_._2.get("schema")), df.schema, allowEvolution)
    // carried constraints enforce on EVERY write path, convention-dir
    // commits included — a path that skipped them would both let
    // violations through and strip the header for all future writers
    val carried = carriedConstraints(cur)
    enforceConstraints(df, carried, "commit")
    val v = cur.map(_._1 + 1).getOrElse(0)
    stage(df, dir, v, prefix)
    commit(fs, dir, v, metadata, retain, prefix,
      schema = Some(schemaEncode(df.schema)), prevTs = prevTsOf(cur),
      constraintsHdr =
        if (carried.isEmpty) None else Some(constraintsEncode(carried)))
    v
  }

  /** The predecessor's ts= from ALREADY-PARSED current headers — what
    * the write paths hand to `commit`'s clamp so it never re-opens the
    * commit file they just read (MinValue = "known absent", still no
    * re-read). */
  private def prevTsOf(cur: Option[(Int, Map[String, String])]): Option[Long] =
    cur.map(_._2.get("ts").flatMap(_.toLongOption).getOrElse(Long.MinValue))

  /** The manifest-resolved CURRENT snapshot — the only sanctioned latest
    * read; never point a reader at a data dir directly. */
  def read(spark: SparkSession, dir: String, prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    val v = currentVersion(fs, dir)
      .getOrElse(sys.error(s"no committed version under $dir"))
    readVersion(spark, dir, v, prefix)
  }

  /** Tombstone row count of a DV dir from its parquet FOOTERS —
    * O(dv files) metadata reads, no data, no job. Shared by the DSv2
    * scan's scale gate and the API read path's broadcast-hint decision
    * so the two doors can never disagree on what "large" means.
    * MEMOIZED per qualified dv path: a committed version's DV dir is
    * immutable (vacuum deletes it whole, never rewrites), and the API
    * door re-reads the same version many times per session — each
    * repeat would otherwise pay the same footer opens again. */
  private val dvRowsCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def dvFooterRows(spark: SparkSession,
      fs: FileSystem, dir: String, dvDir: String): Long = {
    val key = fs.makeQualified(new Path(s"$dir/$dvDir")).toString
    dvRowsCache.computeIfAbsent(key, _ => {
      val conf = spark.sessionState.newHadoopConf()
      fs.listStatus(new Path(s"$dir/$dvDir"))
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .map { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
    })
  }

  /** The driver-materialization ceiling for deletion vectors: at most
    * this many tombstones may be collected/broadcast through a single
    * node (the DSv2 set probe, or a HINTED anti-join build side —
    * BroadcastExchange collects on the driver first). */
  private[graft] def dvBroadcastMaxKeys(spark: SparkSession): Long =
    spark.conf.get("spark.graft.dv.broadcastMaxKeys", "1000000").toLong

  /** Time travel: read committed version `v`. Fails loudly for a version
    * that was never committed or whose data retention has expired. The
    * data location resolves THROUGH the commit file (dataDirOf), so
    * isolated-commit versions read transparently.
    *
    * The DV anti-join's build side is broadcast-HINTED only while the
    * footer-counted tombstone total sits under the
    * `spark.graft.dv.broadcastMaxKeys` gate: the hint forces a DRIVER
    * materialization (BroadcastExchange collects first), which is
    * exactly the ceiling the large-DV tier exists to avoid — past the
    * gate the join stays shuffle-eligible and AQE picks from runtime
    * sizes. `dvBroadcastHint=false` (the DSv2 rewrite rule, which has
    * already decided largeness) skips both the hint and the footer
    * probe. */
  def readVersion(spark: SparkSession, dir: String, v: Int,
      prefix: String = "v", dvBroadcastHint: Boolean = true): DataFrame = {
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    val hdrs = parseCommit(commitContent(fs, dir, v))._1
    // one dir for plain versions; an append version's full dir list —
    // every dir must still exist for the version to be readable
    val dataDirs = dataDirsFrom(hdrs, v, prefix)
    dataDirs.foreach(data =>
      require(fs.exists(new Path(s"$dir/$data")),
        s"version $v's data has been garbage-collected (retention)"))
    // merge-on-read: a dv= header names the version's tombstone keys;
    // the read subtracts them with a BROADCAST anti-join — the DV is
    // small by construction (deleted keys only), so at 100 TB the base
    // scan stays shuffle-free and no data file is rewritten
    // After a metadata-only ADD COLUMN (`commitAddColumns`), a chain's
    // dirs can differ PHYSICALLY (old dirs lack the new column), and
    // parquet schema inference over such a union would pick one file's
    // shape arbitrarily — multi-dir reads therefore bind the DECLARED
    // schema, so every file null-fills exactly its missing columns.
    // Multi-dir versions are flat by construction (the append/update
    // gates refuse partitionBy), so no partition-column ordering is at
    // stake; single-dir reads keep plain inference (partitionBy layouts
    // surface partition columns last, the convention every door shares).
    val declared = declaredSchemaOf(hdrs)
    val partByCols = hdrs.get("partby").map(_.split(",").toSeq)
      .getOrElse(Nil)
    val colmap = hdrs.get("colmap").map(colmapDecode)
    def readDirs(paths: Seq[String]): DataFrame = (declared, colmap) match {
      case (Some(st), Some(cm)) =>
        // a RENAME/DROP COLUMN predecessor: the files carry PHYSICAL
        // names (and possibly extra, dropped columns) — request the
        // declared schema under its physical names, never infer, and
        // serve the frame under the logical ones
        val phys = physicalRequest(st, cm)
        val df =
          if (paths.length > 1 && partByCols.nonEmpty)
            paths.map(p => spark.read.schema(phys).parquet(p))
              .reduce(_ unionByName _)
          else spark.read.schema(phys).parquet(paths: _*)
        df.toDF(st.fieldNames.toSeq: _*)
      case (Some(st), None) if paths.length > 1 && partByCols.nonEmpty =>
        // a multi-dir PARTITIONED chain (partby append through the
        // DSv2/SQL door): read per dir — partition discovery anchors
        // to each chain dir itself — and union by name, since
        // partition columns surface last per dir
        paths.map(p => spark.read.schema(st).parquet(p))
          .reduce(_ unionByName _)
      case (Some(st), None) if partByCols.isEmpty =>
        // FLAT dirs (any count): bind the declared schema — inference
        // costs a 1-task Spark job per read and can add nothing on a
        // flat layout (no partition columns to surface last; declared
        // fields are nullable like inference's, so the served schema is
        // identical — round-21). Single-dir partitionBy reads keep
        // inference through the case below.
        spark.read.schema(st).parquet(paths: _*)
      case _ => spark.read.parquet(paths: _*)
    }
    // METADATA-ONLY evolution backfill, applied BEFORE any DV
    // subtraction: a column the schema= header declares but a file set
    // doesn't carry yet (ALTER TABLE ADD COLUMN) surfaces as a typed
    // NULL — and a full-row tombstone minted AFTER the alter keys on
    // that column, so the anti-join must already see it. For every
    // un-evolved version this is a no-op.
    def conform(df: DataFrame): DataFrame =
      hdrs.get("schema").map(schemaDecode).getOrElse(Nil)
        .filterNot { case (n, _) => df.columns.contains(n) }
        .foldLeft(df) { case (d, (n, t)) =>
          d.withColumn(n, org.apache.spark.sql.functions.lit(null).cast(t))
        }
    hdrs.get("pdv") match {
      case Some(pdvDir) =>
        // POSITIONAL deletion vector: per-file row-position sidecars,
        // merged IN the scan by a static probe expression — no join
        // node (key- or position-), no shuffle, no driver collect. Two
        // tiers: (1) files the sidecar's _skips manifest marks fully
        // deleted never enter the file list (never opened, never
        // split); (2) every other file's rows flow through a
        // codegen'd `NOT graft_pos_deleted(file, _metadata.row_index)`
        // filter whose per-file position set loads lazily on whichever
        // executor scans the file. This is the Iceberg-v2/Delta-DV
        // read shape: MoR cost is one sorted-array probe per row, not
        // an anti-join.
        import org.apache.spark.sql.functions.{col, element_at, not, split => fsplit}
        val sidecarPath = s"$dir/$pdvDir"
        val skips = pdvSkips(fs, sidecarPath)
        val files = dataDirs.flatMap { dd =>
          fs.listStatus(new Path(s"$dir/$dd"))
            .filter { st =>
              val n = st.getPath.getName
              st.isFile && !n.startsWith("_") && !n.startsWith(".")
            }.map(_.getPath)
        }
        val live = files.filterNot(p => skips.contains(p.getName))
          .map(_.toString)
        if (live.isEmpty) {
          // everything tombstoned: an empty frame under the declared
          // schema (pdv commits always record schema=)
          val st = declared.getOrElse(sys.error(
            s"version $v of $dir is fully deleted and records no " +
              "schema= header to type the empty read"))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
        } else {
          val base = conform(declared match {
            case Some(st) => spark.read.schema(st).parquet(live: _*)
            case None => spark.read.parquet(live: _*)
          })
          val qualifiedSidecar =
            fs.makeQualified(new Path(sidecarPath)).toString
          val fileName =
            element_at(fsplit(col("_metadata.file_path"), "/"), -1)
          import org.apache.spark.sql.graft.GraftSqlBridge
          base.where(not(GraftSqlBridge.column(graft.expr.PosDvProbe(
            GraftSqlBridge.expression(fileName),
            GraftSqlBridge.expression(col("_metadata.row_index")),
            qualifiedSidecar))))
        }
      case None => hdrs.get("dv") match {
      case Some(spec) if spec.endsWith(";scoped") =>
        // DIR-SCOPED tombstones (MoR UPDATE): each (key, __dir) pair
        // kills its key only in that chain dir, so a later dir's
        // replacement row survives. Attribution = one literal column
        // per dir scan (dir BASENAME, so shallow clones' ../src
        // references keep matching); the union is per-dir but the
        // anti-join is still ONE broadcast
        import org.apache.spark.sql.functions.{broadcast, lit}
        val parts = spec.split(";", 3)
        val (dvDir, keyCols) = (parts(0), parts(1).split(",").toSeq)
        val withDir = dataDirs.map { dd =>
          (declared match {
            case Some(st) => spark.read.schema(st).parquet(s"$dir/$dd")
            case None => spark.read.parquet(s"$dir/$dd")
          }).withColumn("__gdir", lit(dirBasename(dd)))
        }.reduce(_ unionByName _)
        val dvDf = readDvSidecar(spark, s"$dir/$dvDir", declared, keyCols,
            scoped = true, colmapped = colmap.isDefined)
          .withColumnRenamed("__dir", "__gdir")
        val hint = dvBroadcastHint &&
          dvFooterRows(spark, fs, dir, dvDir) <= dvBroadcastMaxKeys(spark)
        // NULL-SAFE key equality: a tombstone whose key tuple holds a
        // NULL (full-row SQL DML over nullable columns) must still kill
        // its row — plain `=` would never match it, silently
        // resurrecting deleted rows (and diverging from the DSv2
        // reader's set probe, where null == null)
        withDir.join(if (hint) broadcast(dvDf) else dvDf,
          (keyCols :+ "__gdir").map(k => withDir(k) <=> dvDf(k))
            .reduce(_ && _),
          "left_anti")
          .drop("__gdir")
      case Some(spec) =>
        val Array(dvDir, keys) = spec.split(";", 2)
        val keyCols = keys.split(",").toSeq
        val dataDf = conform(readDirs(dataDirs.map(d => s"$dir/$d")))
        val dvDf = readDvSidecar(spark, s"$dir/$dvDir", declared, keyCols,
          scoped = false, colmapped = colmap.isDefined)
        val hint = dvBroadcastHint &&
          dvFooterRows(spark, fs, dir, dvDir) <= dvBroadcastMaxKeys(spark)
        dataDf.join(
          if (hint)
            org.apache.spark.sql.functions.broadcast(dvDf)
          else dvDf,
          keyCols.map(k => dataDf(k) <=> dvDf(k)).reduce(_ && _),
          "left_anti")
      case None =>
        conform(readDirs(dataDirs.map(d => s"$dir/$d")))
    }
    }
  }

  /** The pdv sidecar's fully-deleted-file manifest: basenames of data
    * files whose EVERY row is tombstoned (one per line in `_skips`) —
    * the read path drops them from the file list without opening them. */
  private[graft] def pdvSkips(fs: FileSystem, sidecar: String): Set[String] = {
    val p = new Path(s"$sidecar/_skips")
    if (!fs.exists(p)) Set.empty
    else readSmallFile(fs, p).split("\n").filter(_.nonEmpty).toSet
  }

  /** Chain-dir BASENAME — the dir identity scoped tombstones record.
    * A shallow clone re-points entries through `../src/<dir>`, so the
    * basename (uuid-suffixed, unique within a chain) is the only name
    * that survives the re-pointing. */
  private def dirBasename(entry: String): String =
    entry.substring(entry.lastIndexOf('/') + 1)

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
      statsCols: StatsCols = Nil, allowEvolution: Boolean = false,
      bloomCol: Option[String] = None, constraints: Seq[String] = Nil,
      dropConstraints: Boolean = false,
      statsEnc: Seq[(String, String)] = Nil,
      bloomCols: Seq[String] = Nil,
      expectVersion: Option[Int] = None,
      bucketFn: Option[(Int, String)] = None,
      sortWithin: Seq[String] = Nil): Int = {
    val fs = fsOf(spark, dir)
    val cur = currentHeaders(fs, dir)
    // OCC pin for callers whose snapshot/headers were resolved earlier
    // (the SQL CoW DML and MERGE doors): the commit below targets
    // exactly expectVersion + 1, so an interleaved commit either fails
    // this check or loses the atomic publish — a lost update can never
    // be silent
    expectVersion.foreach(ev =>
      if (!cur.map(_._1).contains(ev))
        throw new java.util.ConcurrentModificationException(
          s"snapshot was resolved at version $ev of $dir but the head " +
            s"is now ${cur.map(_._1).getOrElse(-1)} — re-read and retry"))
    // registry-declared stat columns: the ordinal comes FROM the
    // registry (never a caller lambda), so the recorded statenc= name
    // and the computed bands can never disagree
    val effStatsCols: StatsCols =
      StatsEnc.validateAndMerge(spark, statsCols, statsEnc)
    // gate BEFORE the write: a refused schema creates no version and no
    // orphan staging dir
    schemaGate(cur.flatMap(_._2.get("schema")), df.schema, allowEvolution)
    // declared constraints: the predecessor's carry forward (unless the
    // caller DECLARES the drop) and new ones add; the combined set is
    // enforced on the full rows being committed — still before staging
    constraints.foreach(validateConstraintSpec(_, df.schema))
    val carried = if (dropConstraints) Nil else carriedConstraints(cur)
    val allConstraints = (carried ++ constraints).distinct
    enforceConstraints(df, allConstraints, "commit")
    // a declared bucket layout: the partitionBy column must BE the
    // bucket transform of the key, row for row — validated here at
    // every data-writing commit, so the bucketfn= header the planner's
    // key-group alignment trusts can never drift from the bytes
    bucketFn.foreach { case (n, keyCol) =>
      import org.apache.spark.sql.functions.{col, lit, not, pmod}
      require(n > 0, s"bucket count must be positive (got $n)")
      require(partitionBy.length == 1,
        s"a bucket layout partitions by exactly its bucket column " +
          s"(got partitionBy=$partitionBy)")
      val bCol = partitionBy.head
      Seq(keyCol, bCol).foreach(c =>
        require(df.schema.fieldNames.contains(c),
          s"bucketFn column '$c' is not in the schema " +
            s"${df.schema.fieldNames.mkString("[", ",", "]")}"))
      val kt = df.schema(keyCol).dataType
      require(kt == org.apache.spark.sql.types.LongType ||
        kt == org.apache.spark.sql.types.IntegerType,
        s"bucketFn key column must be integral (got ${kt.simpleString})")
      // the bucket column must be exactly INT: the reported transform's
      // result type is Integer, and the planner compares partition-key
      // rows under that type — a long bucket column would make the
      // grouped keys unreadable
      require(df.schema(bCol).dataType ==
        org.apache.spark.sql.types.IntegerType,
        s"bucket column '$bCol' must be INT (the bucket transform's " +
          s"result type); got ${df.schema(bCol).dataType.simpleString}")
      validateBucketInvariant(df, n, keyCol, bCol)
    }
    // SORTED LAYOUT BY CONSTRUCTION (`sortWithin`): the ENGINE reshapes
    // the rows — one task per partition value (repartition on the
    // partition columns), rows sorted inside each task by (partCols ++
    // sortWithin) — so every partition dir receives exactly ONE file
    // whose rows are sorted by the declared columns. The sortw= header
    // this mints is therefore true by construction, never a caller
    // claim; the scan's SupportsReportOrdering trusts it to elide the
    // Sort under storage-partitioned sort-merge joins. The reshape is
    // one extra exchange at WRITE time — the classic write-once /
    // read-many trade every clustered layout makes.
    sortWithin.foreach { c =>
      require(df.schema.fieldNames.contains(c),
        s"sortWithin column '$c' is not in the schema " +
          s"${df.schema.fieldNames.mkString("[", ",", "]")}")
      require(partitionBy.nonEmpty,
        "sortWithin declares a within-file order of a partitionBy " +
          "layout — pass partitionBy as well")
    }
    val effDf =
      if (sortWithin.isEmpty) df
      else {
        import org.apache.spark.sql.functions.col
        df.repartition(partitionBy.map(col): _*)
          .sortWithinPartitions((partitionBy ++ sortWithin).map(col): _*)
      }
    val v = cur.map(_._1 + 1).getOrElse(0)
    val data = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    val w = effDf.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$dir/$data")
    val st =
      if (effStatsCols.isEmpty) None
      else Some(computeStats(spark, s"$dir/$data", effStatsCols))
    // the Bloom sidecar is written INTO the data dir (underscore prefix
    // keeps it invisible to every parquet scan) so it travels with the
    // files it describes — through clones, retention, and data= renames;
    // built and written EXECUTOR-side (buildBloomSidecar), one section
    // per indexed column
    val effBloom = (bloomCol.toSeq ++ bloomCols).distinct
    val bl =
      if (effBloom.isEmpty) None
      else Some(bloomHeader(buildBloomSidecar(spark, s"$dir/$data", effBloom)))
    commit(fs, dir, v, metadata, retain, prefix, dataDir = Some(data),
      stats = st, schema = Some(schemaEncode(df.schema)),
      partBy =
        if (partitionBy.nonEmpty) Some(partitionBy.mkString(",")) else None,
      prevTs = prevTsOf(cur), bloom = bl,
      constraintsHdr =
        if (allConstraints.isEmpty) None
        else Some(constraintsEncode(allConstraints)),
      statenc =
        if (statsEnc.isEmpty) None else Some(StatsEnc.encode(statsEnc)),
      bucketFnHdr = bucketFn.map { case (n, k) =>
        bucketFnEncode(n, k, partitionBy.head) },
      sortw =
        if (sortWithin.isEmpty) None else Some(sortWithin.mkString(",")))
    v
  }

  /** DESCRIBE HISTORY: one row per committed version — (version,
    * metadata, commit wall-clock ms, has_stats, has_dv, n_rows from the
    * stats line when recorded). O(versions) commit-file reads, never
    * data; the audit surface every table format exposes, also served to
    * SQL as the `graft_history('<dir>')` TVF. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    historyRows(fsOf(spark, dir), dir)
      .toDF("version", "metadata", "commit_ms", "has_stats", "has_dv",
        "n_rows")
  }

  /** `history`'s row set against an explicit FileSystem — resolved
    * through the manifest checkpoint when one exists (one checkpoint
    * read + the post-checkpoint suffix of commit files, instead of one
    * open per version; the probe-counting spec drives this split). */
  private[graft] def historyRows(fs: FileSystem, dir: String)
      : Seq[(Int, String, Long, Boolean, Boolean, Option[Long])] =
    allCommitContents(fs, dir).map { case (v, c) =>
      val (hdrs, md) = parseCommit(c)
      (v, md, commitTimeFrom(hdrs, fs, dir, v),
        hdrs.contains("stats"),
        hdrs.contains("dv") || hdrs.contains("pdv"),
        hdrs.get("stats").map(TableStats.decode(_).files.map(_.rows).sum))
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
        (f.file, f.rows, st.cols(i), f.mins(i), f.maxs(i),
          // NULL for a pre-null-count stats line — a SQL auditor can
          // tell "conservatively kept by null bands" (no counts
          // recorded) from "null-free file" (nulls = 0)
          if (f.nulls.isEmpty) Option.empty[Long] else Some(f.nulls(i))))
    }.toDF("file", "rows", "col", "min", "max", "nulls")
  }

  /** Delta's `RESTORE TABLE … VERSION AS OF`: mint a NEW version that
    * re-references version `v`'s data VERBATIM — a metadata-only
    * commit, no file copied or rewritten; history is preserved for
    * forensics and the restore is itself a commit that can be restored
    * away. Every one of v's layout/index headers carries (schema,
    * partby, dv, stats/statenc, bloom, pmap, constraints), so the
    * restored head serves exactly what `readVersion(v)` serves; the
    * append= marker deliberately does NOT carry — a restore is a
    * rewrite-shaped change, and a streaming reader of the table
    * refuses it loudly rather than misreading it as added files.
    * Refuses when v's data has been retention-reclaimed. Served to SQL
    * as `graft_restore('<dir>', v)`. Returns the new version. */
  def restoreVersion(spark: SparkSession, dir: String, v: Int,
      metadata: String = "", prefix: String = "v"): Int = {
    val fs = fsOf(spark, dir)
    val (cur, curHdrs) = currentHeaders(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to restore"))
    val hdrs = headersOf(fs, dir, v)
    val dirs = dataDirsFrom(hdrs, v, prefix)
    dirs.foreach(dd => require(fs.exists(new Path(s"$dir/$dd")),
      s"version $v's data dir $dd has been garbage-collected " +
        "(retention) — it can no longer be restored"))
    hdrs.get("dv").map(_.split(";", 2)(0)).foreach(dvd =>
      require(fs.exists(new Path(s"$dir/$dvd")),
        s"version $v's deletion vector $dvd has been garbage-collected " +
          "(retention) — it can no longer be restored"))
    hdrs.get("pdv").foreach(pd =>
      require(fs.exists(new Path(s"$dir/$pd")),
        s"version $v's positional deletion vector $pd has been " +
          "garbage-collected (retention) — it can no longer be restored"))
    val nv = cur + 1
    commit(fs, dir, nv,
      if (metadata.isEmpty) s"RESTORE VERSION AS OF $v" else metadata,
      prefix = prefix,
      dataDir = Some(dirs.mkString(",")),
      dv = hdrs.get("dv"),
      pdvHdr = hdrs.get("pdv"),
      schema = hdrs.get("schema"),
      partBy = hdrs.get("partby"),
      prevTs = prevTsOf(Some((cur, curHdrs))),
      stats = hdrs.get("stats").map(TableStats.decode),
      statrel = hdrs.contains("stats") &&
        (hdrs.contains("append") || hdrs.contains("statrel")),
      bloom = hdrs.get("bloom"),
      statenc = hdrs.get("statenc"),
      pmap = hdrs.get("pmap"),
      constraintsHdr = hdrs.get("constraints"),
      colmap = hdrs.get("colmap"),
      bucketFnHdr = hdrs.get("bucketfn"),
      // the restored data is v's files VERBATIM, so v's within-file
      // sort declaration stays true
      sortw = hdrs.get("sortw"))
    nv
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
      prefix: String = "v", expectVersion: Option[Int] = None): Int = {
    require(keyCols.nonEmpty, "deletion vector needs at least one key column")
    require(keyCols.forall(c => !c.contains(",") && !c.contains(";")),
      s"key column names must not contain the dv= header delimiters: $keyCols")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to delete from"))
    // OCC pin for callers whose tombstones were computed on a specific
    // snapshot (the SQL DELETE door): a commit that interleaved between
    // their read and this call would make the tombstone set stale —
    // refuse like every lost race instead of applying old-snapshot
    // tombstones to the new head
    expectVersion.foreach(ev =>
      if (ev != cur) throw new java.util.ConcurrentModificationException(
        s"delete computed its tombstones on version $ev of $dir but the " +
          s"head is now $cur — re-read and retry"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    require(!hdrs.contains("pmap"),
      "this table is partition-mapped — delete by replacing its " +
        "partitions through replacePartitionsWithRetry (a MoR delete " +
        "would drop the value→dir map)")
    require(!hdrs.contains("colmap"),
      "a merge-on-read delete cannot target a renamed/dropped-column " +
        "head (tombstone keys would name logical columns the files " +
        "don't carry) — SQL DELETE rewrites copy-on-write, or rewrite " +
        "via commitNextIsolated first")
    // the index refusal lives HERE (not only in the SQL door), so the
    // gate and the commit read the SAME headers and no door — present
    // or future — can strip a just-attached skipping index silently:
    // this commit carries no stats=/bloom= forward by design (a dv
    // invalidates per-file row counts)
    if (hdrs.contains("stats") || hdrs.contains("bloom"))
      throw new IndexRedeclarationRequired(
        "a merge-on-read delete cannot carry this table's skipping " +
          "index (the deletion vector invalidates the per-file " +
          "statistics) — delete through the copy-on-write door " +
          "(deleteRowsIndexed / SQL DELETE re-indexes automatically), " +
          "or drop the index deliberately via commitNextIsolated first")
    // resolve through the ONE sanctioned multi-dir accessor (not a raw
    // header read): round-trips byte-identically today, and keeps this
    // path correct if the data= encoding ever changes
    val data = dataDirsFrom(hdrs, cur, prefix).mkString(",")
    // a predecessor DV must share this delete's key identity (the
    // tombstone sets union) — refuse pointedly instead of surfacing a
    // union schema error from deep inside the write
    require(!hdrs.contains("pdv"),
      "the current version carries a POSITIONAL deletion vector — " +
        "continue through commitPositionalDelete, or purgePositionalDv " +
        "first: one version cannot merge two deletion-vector regimes")
    hdrs.get("dv").foreach { spec =>
      val prevKeys = spec.split(";", -1)(1).split(",").toSeq
      require(prevKeys == keyCols,
        s"the current version's deletion vector is keyed by $prevKeys " +
          s"but this delete keys by $keyCols — purgeDeleteVector first, " +
          "or delete through the door whose keys match the recorded ones")
    }
    val v = cur + 1
    val dvDir = s"dv${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    import org.apache.spark.sql.functions.col
    val fresh = tombstones.select(keyCols.map(col): _*).distinct()
    val (full, scoped) = hdrs.get("dv") match {
      case Some(spec) if spec.endsWith(";scoped") =>
        // continuing a MoR-update chain: a DELETE kills its keys
        // EVERYWHERE, so the fresh keys expand across every current
        // dir basename and union into the scoped pair set
        import spark.implicits._
        val basenamesDf = dataDirsFrom(hdrs, cur, prefix)
          .map(dirBasename).toDF("__dir")
        val prev = readDvSidecar(spark, s"$dir/${spec.split(";", 3)(0)}",
          declaredSchemaOf(hdrs), keyCols, scoped = true,
          colmapped = hdrs.contains("colmap"))
        (prev.unionByName(fresh.crossJoin(basenamesDf)).distinct(), true)
      case Some(spec) =>
        val prev = readDvSidecar(spark, s"$dir/${spec.split(";", 2)(0)}",
          declaredSchemaOf(hdrs), keyCols, scoped = false,
          colmapped = hdrs.contains("colmap"))
        (prev.unionByName(fresh).distinct(), false)
      case None => (fresh, false)
    }
    full.write.mode("errorifexists").parquet(s"$dir/$dvDir")
    // the data is untouched, so the predecessor's recorded schema (and
    // layout marker) ride along — without them the NEXT commit would
    // skip the gate / a later append would miss the partition refusal
    commit(fs, dir, v, metadata, prefix = prefix, dataDir = Some(data),
      dv = Some(s"$dvDir;${keyCols.mkString(",")}" +
        (if (scoped) ";scoped" else "")),
      schema = hdrs.get("schema"), partBy = hdrs.get("partby"),
      prevTs = prevTsOf(Some((cur, hdrs))),
      // a delete only SHRINKS the row set, and every declared
      // constraint is subset-closed — carry, don't re-validate
      constraintsHdr = hdrs.get("constraints"),
      // subset-closed too: untouched files keep the bucket invariant
      // (the SPJ read side already stands down under a dv)
      bucketFnHdr = hdrs.get("bucketfn"))
    v
  }

  /** POSITIONAL merge-on-read delete (the Iceberg-v2 / Delta-DV sidecar
    * shape, VERDICT r18 "Next round" item 3): commit a new version that
    * shares the current data dirs UNCHANGED and carries a PER-FILE
    * ROW-POSITION sidecar (`pdv=` header) — the rows matching
    * `predicate`, recorded as `(file basename, _metadata.row_index)`
    * and written as a parquet dir partitioned by file. `readVersion`
    * merges it WITHOUT ANY JOIN: a codegen'd probe expression
    * (`graft.expr.PosDvProbe`) drops tombstoned positions inside the
    * scan stage from an executor-cached sorted array, and files the
    * sidecar's `_skips` manifest marks fully deleted never enter the
    * file list at all. vs the key-tombstone door (`commitDeleteVector`):
    * positions cost no key equality work per row, need no key identity
    * declaration, and kill exactly physical rows (duplicate-keyed rows
    * delete independently); the price is that positions pin FILES — any
    * rewrite (compaction, CoW update) invalidates them, so those doors
    * refuse a pdv head until `purgePositionalDv`.
    *
    * Cumulative like `commitDeleteVector`: deleting on a pdv head unions
    * the previous sidecar in, so each version's sidecar is self-contained
    * and time travel sees exactly its deletes. Stats/bloom cannot ride
    * (positions invalidate per-file counts — same rule as dv=). The
    * sidecar write is DISTRIBUTED (a partitioned parquet write of the
    * position frame); only the per-file skip reconciliation touches the
    * driver, and that is O(files) footer metadata — manifest-scale, the
    * dvFooterRows class of work, never row data. */
  def commitPositionalDelete(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column, metadata: String = "",
      prefix: String = "v", expectVersion: Option[Int] = None): Int = {
    import org.apache.spark.sql.functions.{col, element_at, split => fsplit}
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to delete from"))
    expectVersion.foreach(ev =>
      if (ev != cur) throw new java.util.ConcurrentModificationException(
        s"delete computed its positions on version $ev of $dir but the " +
          s"head is now $cur — re-read and retry"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    require(!hdrs.contains("pmap"),
      "this table is partition-mapped — delete by replacing its " +
        "partitions through replacePartitionsWithRetry")
    require(!hdrs.contains("colmap"),
      "a positional delete cannot target a renamed/dropped-column head " +
        "— rewrite via commitNextIsolated (normalizing the names) first")
    require(!hdrs.contains("partby"),
      "a positional delete reads explicit files, which cannot rebind a " +
        "partitionBy layout's dir-name columns — delete copy-on-write " +
        "(SQL DELETE) or through the key-tombstone door instead")
    require(!hdrs.contains("dv"),
      "the current version carries KEY tombstones (dv=) — continue " +
        "through commitDeleteVector, or purgeDeleteVector first: one " +
        "version cannot merge two deletion-vector regimes")
    require(hdrs.contains("schema"),
      s"version $cur of $dir predates schema= headers — re-commit once " +
        "through any write path to record the schema, then delete")
    if (hdrs.contains("stats") || hdrs.contains("bloom"))
      throw new IndexRedeclarationRequired(
        "a positional delete cannot carry this table's skipping index " +
          "(the sidecar invalidates the per-file statistics) — delete " +
          "through the copy-on-write door, or drop the index " +
          "deliberately via commitNextIsolated first")
    val dataDirs = dataDirsFrom(hdrs, cur, prefix)
    val declared = declaredSchemaOf(hdrs)
    // files the previous sidecar's _skips manifest marks FULLY deleted
    // never enter the predicate scan (round-21): every one of their
    // positions is already in the cumulative sidecar, so re-matching
    // them can only produce duplicates `distinct()` removes — reading
    // them is pure wasted I/O. Partially-tombstoned files still scan
    // raw (a re-matched dead row re-tombstones idempotently).
    val prevSkipSet = hdrs.get("pdv")
      .map(pd => pdvSkips(fs, s"$dir/$pd")).getOrElse(Set.empty[String])
    val scanTargets: Seq[String] =
      if (prevSkipSet.isEmpty) dataDirs.map(d => s"$dir/$d")
      else dataDirs.flatMap { dd =>
        fs.listStatus(new Path(s"$dir/$dd"))
          .filter { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
              !prevSkipSet.contains(n)
          }.map(_.getPath.toString)
      }
    // explicit declared-schema read: add-column predecessors' files
    // null-fill the missing columns, so the predicate may reference them
    val freshOpt: Option[DataFrame] =
      if (scanTargets.isEmpty) None // every file fully dead: no new match
      else {
        val base = declared match {
          case Some(st) => spark.read.schema(st).parquet(scanTargets: _*)
          case None => spark.read.parquet(scanTargets: _*)
        }
        Some(base.filter(predicate).select(
          element_at(fsplit(col("_metadata.file_path"), "/"), -1).as("__file"),
          col("_metadata.row_index").as("__pos")))
      }
    val prevOpt: Option[DataFrame] = hdrs.get("pdv") match {
      // cumulative: the previous sidecar's (file, pos) pairs union in
      // (partition-column read recovers __file as a string). A sidecar
      // minted by a matched-nothing delete has no __file= dirs at all —
      // parquet cannot infer its schema, so guard on the layout
      case Some(prevDir) if fs.listStatus(new Path(s"$dir/$prevDir"))
          .exists(_.getPath.getName.startsWith("__file=")) =>
        // explicit schema: the sidecar layout is fixed (__pos data
        // column, __file partition dir) — schema inference is a 1-task
        // Spark job per commit, pure overhead
        Some(spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__pos",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("__file",
              org.apache.spark.sql.types.StringType))))
          .parquet(s"$dir/$prevDir")
          .select(col("__file"), col("__pos")))
      case _ => None
    }
    val full = (prevOpt, freshOpt) match {
      case (Some(prev), Some(fresh)) => prev.unionByName(fresh).distinct()
      case (Some(prev), None) => prev // already distinct by construction
      case (None, Some(fresh)) => fresh.distinct()
      case (None, None) => sys.error(
        s"version $cur of $dir has no live file and no sidecar — " +
          "nothing to delete from")
    }
    val v = cur + 1
    val pdvDir = s"pdv${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    full.write.partitionBy("__file").mode("errorifexists")
      .parquet(s"$dir/$pdvDir")
    // skip reconciliation inputs FROM THE WRITTEN SIDECAR, never from a
    // second evaluation of `full`: with a non-deterministic predicate
    // (rand()-sampled deletes) a re-run of the frame can disagree with
    // what was written, marking a file fully deleted while the sidecar
    // holds fewer positions — the read path would then drop live rows.
    // Reading back what was actually committed is exact by construction.
    // One bounded read of tombstones only; a matched-nothing sidecar has
    // no __file= dirs (parquet cannot infer its schema), so guard first.
    val deadCounts: Map[String, Long] =
      if (!fs.listStatus(new Path(s"$dir/$pdvDir"))
          .exists(_.getPath.getName.startsWith("__file="))) Map.empty
      // explicit schema (fixed sidecar layout): skips the 1-task schema
      // inference job every delete commit otherwise pays (round-21)
      else spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__pos",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__file",
            org.apache.spark.sql.types.StringType))))
        .parquet(s"$dir/$pdvDir")
        .select(col("__file").cast("string").as("__file"))
        .groupBy(col("__file")).count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
    // DELTA-restricted reconciliation (round-20 advice): a file can only
    // become NEWLY fully-dead if this commit grew its tombstone count,
    // so footer-check only files whose cumulative count moved vs the
    // previous sidecar; prior _skips carry forward verbatim (files are
    // immutable). The footer pass is O(files touched by this delete),
    // not O(all ever-tombstoned files) per commit of a long MoR chain.
    val prevCounts: Map[String, Long] = prevOpt match {
      case Some(prev) => prev.groupBy(col("__file")).count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      case None => Map.empty
    }
    // a file whose tombstone count equals its footer row count is fully
    // deleted — record it in _skips so reads never open it. O(changed
    // files) footer METADATA on the driver, the dvFooterRows class.
    val conf = spark.sessionState.newHadoopConf()
    val newlyDead = dataDirs.flatMap { dd =>
      fs.listStatus(new Path(s"$dir/$dd"))
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            deadCounts.contains(n) && !prevSkipSet.contains(n) &&
            deadCounts(n) != prevCounts.getOrElse(n, 0L)
        }
        .filter { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val total = try r.getRecordCount finally r.close()
          deadCounts(st.getPath.getName) == total
        }
        .map(_.getPath.getName)
    }
    val skips = (prevSkipSet ++ newlyDead).toSeq.sorted
    if (skips.nonEmpty) {
      val out = fs.create(new Path(s"$dir/$pdvDir/_skips"), true)
      try out.write(skips.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    commit(fs, dir, v, metadata, prefix = prefix,
      dataDir = Some(dataDirs.mkString(",")),
      pdvHdr = Some(pdvDir),
      schema = hdrs.get("schema"),
      prevTs = prevTsOf(Some((cur, hdrs))),
      // a delete only SHRINKS the row set — constraints carry
      constraintsHdr = hdrs.get("constraints"))
    v
  }

  /** Materialize a pdv head's survivors as a plain copy-on-write version
    * (Delta's REORG PURGE twin for positional sidecars), returning the
    * table to probe-free reads and re-opening the rewrite doors
    * (compaction, appends, indexes) that refuse a pdv head. */
  def purgePositionalDv(spark: SparkSession, dir: String,
      metadata: String = "PURGE POSITIONAL DELETION VECTOR",
      prefix: String = "v"): Int = {
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to purge"))
    require(headersOf(fs, dir, cur).contains("pdv"),
      s"version $cur of $dir carries no positional deletion vector")
    commitNextIsolated(spark, dir, readVersion(spark, dir, cur, prefix),
      metadata, prefix = prefix)
  }

  /** POSITIONAL merge-on-read UPDATE (VERDICT r19 item 4): tombstone the
    * matched rows by (file, row position) and stage their replacements
    * as a NEW data dir — the Iceberg-v2 MoR update shape — instead of
    * rewriting the whole snapshot copy-on-write. The commit shares the
    * current data dirs UNCHANGED, adds the replacement dir, and carries
    * a cumulative `pdv=` sidecar; `readVersion` then serves old files
    * minus the tombstoned positions plus the replacement rows, still
    * with NO join in the plan. At scale this is the arm a busy MoR
    * table wants: an UPDATE touching 0.1% of rows writes 0.1% of the
    * data, not 100%.
    *
    * Identity is PHYSICAL (file + position), so — unlike the key-scoped
    * dv= update — duplicate-valued rows update independently and no key
    * declaration is needed. Both `condition` and every SET value must
    * be deterministic: the matched set is evaluated twice (positions,
    * then replacements) over the same immutable files, and a
    * non-deterministic expression could disagree between the passes
    * (the SQL door's `portable` already refuses those). Rows already
    * tombstoned by the current sidecar are dead and can NEITHER
    * re-match NOR resurrect: the probe filters them before the
    * condition evaluates. A NULL condition leaves the row unmodified,
    * like every other UPDATE arm. Declared notnull/check constraints
    * re-enforce on the replacement rows (updates can mint violations);
    * unique constraints check replacements against the un-matched
    * survivors, the commitUpdateImpl recipe. */
  def commitPositionalUpdate(spark: SparkSession, dir: String,
      condition: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      metadata: String = "", prefix: String = "v",
      expectVersion: Option[Int] = None): Int = {
    import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, not, split => fsplit}
    require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to update"))
    // OCC pin BEFORE the layout gates (the commitDeleteVector rule)
    expectVersion.foreach(ev =>
      if (ev != cur) throw new java.util.ConcurrentModificationException(
        s"update resolved its snapshot at version $ev of $dir but the " +
          s"head is now $cur — re-read and retry"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    require(!hdrs.contains("pmap"),
      "this table is partition-mapped — update by replacing its " +
        "partitions through replacePartitionsWithRetry")
    require(!hdrs.contains("colmap"),
      "a positional update cannot target a renamed/dropped-column head " +
        "— rewrite via commitNextIsolated (normalizing the names) first")
    require(!hdrs.contains("partby"),
      "a positional update reads explicit files, which cannot rebind a " +
        "partitionBy layout's dir-name columns — update copy-on-write " +
        "(SQL UPDATE) instead")
    require(!hdrs.contains("dv"),
      "the current version carries KEY tombstones (dv=) — update " +
        "through commitUpdateImpl, or purgeDeleteVector first: one " +
        "version cannot merge two deletion-vector regimes")
    require(hdrs.contains("schema"),
      s"version $cur of $dir predates schema= headers — re-commit once " +
        "through any write path to record the schema, then update")
    if (hdrs.contains("stats") || hdrs.contains("bloom"))
      throw new IndexRedeclarationRequired(
        "a positional update cannot carry this table's skipping index " +
          "(the sidecar invalidates the per-file statistics) — update " +
          "through the copy-on-write door, or drop the index " +
          "deliberately via commitNextIsolated first")
    val dataDirs = dataDirsFrom(hdrs, cur, prefix)
    val declared = declaredSchemaOf(hdrs)
    // LIVE rows with physical identity: skip-tier files never open, the
    // probe drops already-tombstoned positions IN the scan — a dead row
    // must neither re-match nor resurrect through a fresh replacement
    val allFiles = dataDirs.flatMap { dd =>
      fs.listStatus(new Path(s"$dir/$dd"))
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.map(_.getPath)
    }
    val prevSidecar = hdrs.get("pdv")
    val skips = prevSidecar.map(pd => pdvSkips(fs, s"$dir/$pd"))
      .getOrElse(Set.empty[String])
    val liveFiles = allFiles.filterNot(p => skips.contains(p.getName))
      .map(_.toString)
    val fileName = element_at(fsplit(col("_metadata.file_path"), "/"), -1)
    val base =
      if (liveFiles.isEmpty) {
        val st = declared.getOrElse(sys.error(
          s"version $cur of $dir is fully deleted and records no " +
            "schema= header to type the empty read"))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      } else declared match {
        case Some(st) => spark.read.schema(st).parquet(liveFiles: _*)
        case None => spark.read.parquet(liveFiles: _*)
      }
    import org.apache.spark.sql.graft.GraftSqlBridge
    val live = (prevSidecar, liveFiles.isEmpty) match {
      case (Some(pd), false) =>
        val qualified = fs.makeQualified(new Path(s"$dir/$pd")).toString
        base.where(not(GraftSqlBridge.column(graft.expr.PosDvProbe(
          GraftSqlBridge.expression(fileName),
          GraftSqlBridge.expression(col("_metadata.row_index")),
          qualified))))
      case _ => base
    }
    val condT = coalesce(condition, lit(false))
    val matched = live.where(condT)
    // SIMULTANEOUS assignment (the SQL rule): one select, every SET
    // expression reads the PRE-update row
    val outCols = base.columns.toSeq
    val resolver = spark.sessionState.conf.resolver
    sets.foreach { case (c, _) =>
      require(outCols.exists(resolver(_, c)),
        s"SET column '$c' is not a column of the table ($outCols)") }
    // ONE PASS over the matched set (VERDICT r20 "Next round" item 3):
    // a single projection carries the tombstone identity (file, pos)
    // BESIDE the replacement row, persisted so the sidecar write, the
    // replacement write and the dead-count aggregation all serve from
    // the same materialized rows. The old shape ran two predicate-
    // pushed scans of the base files (positions, then replacements)
    // plus a parquet read-back of the written sidecar — three data
    // jobs where one scan suffices. Meta columns use collision-proof
    // names; the sidecar frame aliases them back to the __file/__pos
    // layout contract.
    val matchedAll = matched.select(
      fileName.as("__graft_pdv_file") +:
        col("_metadata.row_index").as("__graft_pdv_pos") +:
        outCols.map { c =>
          sets.find { case (sc, _) => resolver(sc, c) } match {
            case Some((_, v)) => v.cast(matched.schema(c).dataType).as(c)
            case None => col(c)
          }
        }: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val replacements = matchedAll.select(outCols.map(col): _*)
    // the matched set feeds TWO dependent writes (positions, then
    // replacements): even served from the persisted pass, a lost cache
    // partition RECOMPUTES from lineage, so a non-deterministic
    // condition or SET value could still disagree between consumers —
    // tombstoning a row without staging its replacement (row loss) or
    // staging a replacement for an untombstoned row (duplication).
    // The SQL door refuses through `portable`; the API door must
    // refuse just as loudly (the delete door is immune — its single
    // write is the only evaluation that matters). Checked on the
    // ANALYZED plan: an unresolved rand() reports deterministic until
    // resolution.
    locally {
      val bad = replacements.queryExecution.analyzed
        .collect { case p => p.expressions
          .flatMap(_.collect { case e if !e.deterministic => e }) }
        .flatten
      require(bad.isEmpty,
        "a positional update requires a DETERMINISTIC condition and " +
          "SET values (the matched set is evaluated once for positions " +
          "and once for replacements, which must agree) — " +
          s"non-deterministic: ${bad.mkString(", ")}; update " +
          "copy-on-write (purgePositionalDv first) instead")
    }
    val carried = carriedConstraints(Some((cur, hdrs)))
    if (carried.nonEmpty)
      enforceConstraints(replacements, carried, "update",
        existing =
          if (carried.exists(_.startsWith("unique:")))
            Some(live.where(!condT).select(outCols.map(col): _*))
          else None)
    val v = cur + 1
    // cumulative sidecar: previous positions union the matched ones
    // (file identity is the BASENAME — part-file names carry a
    // write-job UUID, so basenames never collide across data dirs).
    // NO distinct(): matched rows are LIVE (the probe already dropped
    // every previously-tombstoned position), so fresh ∩ prev = ∅, and
    // fresh itself is unique by physical identity (one row index per
    // row). The union is disjoint by construction — the old distinct()
    // bought nothing and cost the write its only shuffle (plus the AQE
    // stage-jobs that came with it). The delete door KEEPS its
    // distinct(): a raw-file delete may re-match tombstoned rows.
    val fresh = matchedAll.select(
      col("__graft_pdv_file").as("__file"),
      col("__graft_pdv_pos").as("__pos"))
    // explicit schema: the sidecar layout is fixed (__pos data column,
    // __file partition dir), so schema inference — a 1-task Spark job
    // per commit — is pure overhead
    val sidecarSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pos",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__file",
        org.apache.spark.sql.types.StringType)))
    val full = prevSidecar match {
      case Some(prevDir) if fs.listStatus(new Path(s"$dir/$prevDir"))
          .exists(_.getPath.getName.startsWith("__file=")) =>
        spark.read.schema(sidecarSchema).parquet(s"$dir/$prevDir")
          .select(col("__file"), col("__pos"))
          .unionByName(fresh)
      case _ => fresh
    }
    val pdvDir = s"pdv${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    full.write.partitionBy("__file").mode("errorifexists")
      .parquet(s"$dir/$pdvDir")
    // replacements stage as their OWN dir beside the shared ones —
    // a distributed write sized by the matched rows, never the table
    // (commitUpdateImpl's naming convention, so GC/vacuum track it);
    // served from the persisted pass, not a re-scan
    val repl = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    replacements.write.mode("errorifexists").parquet(s"$dir/$repl")
    // DELTA-restricted skip reconciliation (round-20 advice + VERDICT
    // r20 item 3): only files touched by THIS update can change
    // fully-dead status (every fresh position is NEW — see the
    // disjointness argument above), and prev _skips carry forward
    // verbatim (files are immutable; a fully-dead file stays dead).
    // One tiny aggregation over the persisted matched pass yields the
    // touched set AND the fresh per-file counts; the cumulative count
    // adds the previous sidecar's per-file rows read as parquet FOOTER
    // metadata (no Spark job), so the whole pass is O(files touched by
    // this update), not O(all ever-tombstoned files).
    val freshCounts: Map[String, Long] =
      matchedAll.groupBy(col("__graft_pdv_file")).count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
    val conf = spark.sessionState.newHadoopConf()
    def footerRows(sts: Seq[org.apache.hadoop.fs.FileStatus]): Long =
      sts.map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    def prevTombstones(file: String): Long = prevSidecar match {
      case Some(pd) => footerRows(dataFiles(new Path(s"$dir/$pd/__file=$file")))
      case None => 0L
    }
    val newlyDead = dataDirs.flatMap { dd =>
      fs.listStatus(new Path(s"$dir/$dd"))
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
            freshCounts.contains(n)
        }
        .filter { st =>
          val n = st.getPath.getName
          freshCounts(n) + prevTombstones(n) == footerRows(Seq(st))
        }
        .map(_.getPath.getName)
    }
    val skipNames = (skips ++ newlyDead).toSeq.sorted
    if (skipNames.nonEmpty) {
      val out = fs.create(new Path(s"$dir/$pdvDir/_skips"), true)
      try out.write(skipNames.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    commit(fs, dir, v, metadata, prefix = prefix,
      dataDir = Some((dataDirs :+ repl).mkString(",")),
      pdvHdr = Some(pdvDir),
      schema = hdrs.get("schema"),
      prevTs = prevTsOf(Some((cur, hdrs))),
      constraintsHdr = hdrs.get("constraints"))
    v
    } finally {
      matchedAll.unpersist(false)
    }
  }

  /** METADATA-ONLY `ADD COLUMN`: mint a version that re-references the
    * current data dirs VERBATIM and records a wider schema= — no file
    * is listed, opened or rewritten (the empty-delta commit every lake
    * format uses for ADD COLUMN). Readers backfill the new columns as
    * typed NULLs (`readVersion` / the DSv2 schema-header path); the
    * write gate then demands the new column from the next commit on.
    * New columns must be nullable by construction (every existing row
    * reads NULL) and must not collide with declared ones. Layout and
    * index headers carry through unchanged — the files they describe
    * are untouched (a predecessor append chain's table-relative stats
    * keys are preserved via statrel=). Serves the SQL door
    * (`ALTER TABLE gt.t ADD COLUMNS …`, GraftCatalog.alterTable).
    * Returns the new version. */
  def commitAddColumns(spark: SparkSession, dir: String,
      cols: Seq[(String, String)],
      metadata: String = "ALTER TABLE ADD COLUMNS",
      prefix: String = "v"): Int = {
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to alter"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    val prev = hdrs.get("schema").map(schemaDecode).getOrElse(sys.error(
      s"version $cur of $dir predates schema= headers — re-commit once " +
        "through any write path to record the schema, then alter"))
    val resolver = spark.sessionState.conf.resolver
    cols.foreach { case (n, t) =>
      require(!prev.exists(p => resolver(p._1, n)),
        s"column '$n' already exists in the table's schema")
      require(cols.count(c => resolver(c._1, n)) == 1,
        s"column '$n' is added twice")
      // parse-validate the type NOW — a bad DDL string must refuse the
      // alter, not poison every future read
      org.apache.spark.sql.types.DataType.fromDDL(t)
    }
    val v = cur + 1
    commit(fs, dir, v, metadata, prefix = prefix,
      // resolve through the ONE sanctioned accessor, not a raw header
      // copy: a convention-path predecessor (commitNext) has no data=
      // header, and copying None would point this version at a
      // nonexistent conventional dir — the commitDeleteVector rule
      dataDir = Some(dataDirsFrom(hdrs, cur, prefix).mkString(",")),
      dv = hdrs.get("dv"),
      pdvHdr = hdrs.get("pdv"),
      // new columns land BEFORE the partition columns: every reader
      // serves partition columns LAST (the file-table convention), so a
      // declared order with data columns after them would make the next
      // full rewrite's schema gate see a phantom "retype" and refuse
      schema = Some({
        val partSet =
          hdrs.get("partby").map(_.split(",").toSet).getOrElse(Set.empty)
        val (dataPrev, partPrev) = prev.partition(p => !partSet(p._1))
        (dataPrev ++ cols ++ partPrev).map { case (n, t) =>
          s"${urlEnc(n)}:${urlEnc(t)}" }.mkString(",")
      }),
      partBy = hdrs.get("partby"),
      prevTs = prevTsOf(Some((cur, hdrs))),
      stats = hdrs.get("stats").map(TableStats.decode),
      // an append predecessor's STATS keys are table-relative; this
      // commit carries no append= marker, so declare the key shape —
      // only when a stats line actually rides along (a bare statrel=
      // is refused by commit())
      statrel = hdrs.contains("stats") &&
        (hdrs.contains("append") || hdrs.contains("statrel")),
      bloom = hdrs.get("bloom"),
      statenc = hdrs.get("statenc"),
      pmap = hdrs.get("pmap"),
      constraintsHdr = hdrs.get("constraints"),
      // on a colmap head, a just-added column maps to a FRESH physical
      // name no file can carry: after DROP x / ADD COLUMN x, binding
      // the physical request to the literal name would RESURRECT the
      // dropped column's old bytes instead of backfilling NULL — the
      // absent mapping makes parquet null-fill it by construction
      colmap = hdrs.get("colmap").map { enc =>
        val prevMap = colmapDecode(enc)
        val withNew = prev.map { case (n, _) =>
          (n, prevMap.getOrElse(n, n)) } ++ cols.map { case (n, _) =>
          (n, s"__gadd${v}_${urlEnc(n)}") }
        colmapEncode(withNew)
      },
      // adding a column cannot disturb the bucket invariant — carry
      bucketFnHdr = hdrs.get("bucketfn"))
    v
  }

  /** colmap= codec: the logical→physical name mapping of a version
    * whose files were written BEFORE a metadata-only RENAME/DROP
    * COLUMN. The header's PRESENCE is itself load-bearing — it tells
    * every reader "bind the declared schema mapped to physical names,
    * never infer" (after a DROP the files carry more columns than the
    * schema declares, and inference would resurrect them) — so an
    * all-identity mapping encodes as the `-` sentinel rather than
    * disappearing. */
  private[graft] def colmapEncode(m: Seq[(String, String)]): String = {
    val diff = m.filter { case (l, p) => l != p }
    if (diff.isEmpty) "-"
    else diff.map { case (l, p) => s"${urlEnc(l)}:${urlEnc(p)}" }
      .mkString(",")
  }

  private[graft] def colmapDecode(s: String): Map[String, String] =
    if (s == "-") Map.empty
    else s.split(",").filter(_.nonEmpty).map { e =>
      val i = e.lastIndexOf(':')
      (urlDec(e.take(i)), urlDec(e.drop(i + 1)))
    }.toMap

  /** The one bucket-invariant check every bucket-writing door shares:
    * refuse unless `bucketCol = floorMod(keyCol, n)` holds on every row
    * of `df` (one column-pruned distributed pass, short-circuited at
    * the first violation). */
  private[graft] def validateBucketInvariant(df: DataFrame, n: Int,
      keyCol: String, bCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit, not, pmod}
    val bad = df.filter(not(col(bCol).cast("int") <=>
        pmod(col(keyCol).cast("long"), lit(n.toLong)).cast("int")))
      .limit(1).count()
    require(bad == 0,
      s"bucket invariant violated: '$bCol' must equal " +
        s"floorMod($keyCol, $n) on every row — fix the bucket column " +
        "or drop the bucketFn declaration")
  }

  /** bucketfn= codec: `<n>,<keyCol>,<bucketCol>` — the declared bucket
    * transform of a partby layout (bucketCol = floorMod(keyCol, n),
    * validated row-for-row at every commit that writes data). */
  private[graft] def bucketFnEncode(n: Int, keyCol: String,
      bucketCol: String): String =
    s"$n,${urlEnc(keyCol)},${urlEnc(bucketCol)}"

  private[graft] def bucketFnOf(hdrs: Map[String, String])
      : Option[(Int, String, String)] =
    hdrs.get("bucketfn").map { s =>
      val parts = s.split(",", 3)
      (parts(0).toInt, urlDec(parts(1)), urlDec(parts(2)))
    }

  /** The physical-name request schema of a colmap-bearing version: the
    * declared (logical) schema with each mapped field renamed to the
    * name the files actually carry. Readers request THIS from parquet,
    * then serve the frame under the logical names. */
  private def physicalRequest(declared: org.apache.spark.sql.types.StructType,
      colmap: Map[String, String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(declared.map(f =>
      f.copy(name = colmap.getOrElse(f.name, f.name))))

  /** Shared refusal gate of the metadata-only RENAME/DROP commits: the
    * combinations whose readers or maintainers would need PER-FILE name
    * resolution the manifest doesn't model refuse loudly — rewrite
    * (OPTIMIZE / commitNextIsolated) first, which normalizes physical
    * names to logical and clears the mapping. */
  private def alterNamesGate(hdrs: Map[String, String], what: String): Unit = {
    require(!hdrs.contains("dv"),
      s"$what on a table carrying a deletion vector is not supported — " +
        "the tombstone keys name columns; purgeDeleteVector first")
    require(!hdrs.contains("pdv"),
      s"$what on a table carrying a positional deletion vector is not " +
        "supported — the colmap read path and the sidecar probe cannot " +
        "compose; purgePositionalDv first")
    require(!hdrs.contains("pmap"),
      s"$what on a partition-mapped table is not supported")
    require(!hdrs.contains("stats") && !hdrs.contains("bloom"),
      s"$what on an index-bearing table is not supported — the stats/" +
        "Bloom sidecars name physical columns and their probe frames " +
        "serve physical names; OPTIMIZE (re-indexing the rewrite) first")
    require(!hdrs.contains("constraints"),
      s"$what under declared constraints is not supported — constraint " +
        "expressions name columns; drop and re-declare them around the " +
        "alter")
  }

  /** METADATA-ONLY `RENAME COLUMN`: mint a version that re-references
    * the current data dirs VERBATIM, records the schema under the NEW
    * names and carries a colmap= header (new logical name → the
    * physical name the existing files still use) — the Iceberg
    * field-mapping idea expressed as names. No file is listed, opened
    * or rewritten; old versions keep serving their own names. Readers
    * (API and DSv2) bind the physical request schema and serve logical
    * names; appends/MoR DML refuse on a mapped head (per-dir name
    * resolution is not modeled — any full rewrite normalizes and clears
    * the map). Partition columns cannot rename (dir names ARE the
    * values). Returns the new version. */
  def commitRenameColumns(spark: SparkSession, dir: String,
      renames: Seq[(String, String)],
      metadata: String = "ALTER TABLE RENAME COLUMN",
      prefix: String = "v"): Int = {
    require(renames.nonEmpty, "RENAME COLUMN needs at least one rename")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to alter"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    alterNamesGate(hdrs, "RENAME COLUMN")
    val prev = hdrs.get("schema").map(schemaDecode).getOrElse(sys.error(
      s"version $cur of $dir predates schema= headers — re-commit once " +
        "through any write path to record the schema, then alter"))
    val resolver = spark.sessionState.conf.resolver
    val partCols = hdrs.get("partby").map(_.split(",").toSeq).getOrElse(Nil)
    val prevMap = hdrs.get("colmap").map(colmapDecode).getOrElse(Map.empty)
    renames.foreach { case (o, n) =>
      require(prev.exists(p => resolver(p._1, o)),
        s"column '$o' does not exist in the table's schema")
      require(!partCols.exists(resolver(_, o)),
        s"cannot rename partition column '$o' — the directory names ARE " +
          "its values; re-layout via commitNextIsolated(partitionBy = …)")
      require(renames.count(r => resolver(r._1, o)) == 1,
        s"column '$o' is renamed twice")
      require(!n.contains(",") && !n.contains(";") && !n.contains(":"),
        s"new column name '$n' contains a reserved delimiter")
    }
    val newSchema = prev.map { case (name, t) =>
      renames.find(r => resolver(r._1, name)) match {
        case Some((_, n)) => (n, t)
        case None => (name, t)
      }
    }
    // collision detection under the SESSION resolver (not a hard-coded
    // case fold): a case-sensitive session may legally hold names that
    // differ only in case
    newSchema.map(_._1).combinations(2).foreach { case Seq(n1, n2) =>
      require(!resolver(n1, n2),
        s"renames collide: resulting schema ${newSchema.map(_._1)}")
    }
    // a declared bucket transform names its key column: renaming that
    // column would orphan the declaration the planner trusts
    bucketFnOf(hdrs).foreach { case (_, keyCol, _) =>
      require(!renames.exists(r => resolver(r._1, keyCol)),
        s"cannot rename '$keyCol': it is the declared bucket key " +
          "(bucketfn=) — re-layout via commitNextIsolated(bucketFn = …)")
    }
    // new logical name → the files' PHYSICAL name (resolving through a
    // predecessor mapping, so chained renames stay one hop deep)
    val newMap: Seq[(String, String)] = prev.zip(newSchema).map {
      case ((oldName, _), (newName, _)) =>
        (newName, prevMap.getOrElse(oldName, oldName))
    }
    val v = cur + 1
    commit(fs, dir, v, metadata, prefix = prefix,
      dataDir = Some(dataDirsFrom(hdrs, cur, prefix).mkString(",")),
      schema = Some(newSchema.map { case (n, t) =>
        s"${urlEnc(n)}:${urlEnc(t)}" }.mkString(",")),
      partBy = hdrs.get("partby"),
      prevTs = prevTsOf(Some((cur, hdrs))),
      colmap = Some(colmapEncode(newMap)),
      bucketFnHdr = hdrs.get("bucketfn"))
    v
  }

  /** METADATA-ONLY `DROP COLUMN`: the schema= header simply loses the
    * columns — files are untouched (they still carry the bytes; readers
    * bound to the declared schema never request them), so the drop is
    * O(one commit file) however large the table, exactly Delta's
    * column-mapping drop. Same refusal envelope as RENAME; partition
    * columns cannot drop. Returns the new version. */
  def commitDropColumns(spark: SparkSession, dir: String,
      cols: Seq[String], metadata: String = "ALTER TABLE DROP COLUMN",
      prefix: String = "v"): Int = {
    require(cols.nonEmpty, "DROP COLUMN needs at least one column")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to alter"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    alterNamesGate(hdrs, "DROP COLUMN")
    val prev = hdrs.get("schema").map(schemaDecode).getOrElse(sys.error(
      s"version $cur of $dir predates schema= headers — re-commit once " +
        "through any write path to record the schema, then alter"))
    val resolver = spark.sessionState.conf.resolver
    val partCols = hdrs.get("partby").map(_.split(",").toSeq).getOrElse(Nil)
    cols.foreach { c =>
      require(prev.exists(p => resolver(p._1, c)),
        s"column '$c' does not exist in the table's schema")
      require(!partCols.exists(resolver(_, c)),
        s"cannot drop partition column '$c' — the layout stands on it; " +
          "re-layout via commitNextIsolated(partitionBy = …)")
    }
    val newSchema = prev.filterNot(p => cols.exists(resolver(_, p._1)))
    require(newSchema.nonEmpty, "cannot drop every column of the table")
    // the bucket key column cannot drop out from under its declaration
    bucketFnOf(hdrs).foreach { case (_, keyCol, _) =>
      require(!cols.exists(resolver(_, keyCol)),
        s"cannot drop '$keyCol': it is the declared bucket key " +
          "(bucketfn=) — re-layout via commitNextIsolated(bucketFn = …)")
    }
    val prevMap = hdrs.get("colmap").map(colmapDecode).getOrElse(Map.empty)
    val newMap = newSchema.map { case (n, _) =>
      (n, prevMap.getOrElse(n, n)) }
    val v = cur + 1
    commit(fs, dir, v, metadata, prefix = prefix,
      dataDir = Some(dataDirsFrom(hdrs, cur, prefix).mkString(",")),
      schema = Some(newSchema.map { case (n, t) =>
        s"${urlEnc(n)}:${urlEnc(t)}" }.mkString(",")),
      partBy = hdrs.get("partby"),
      prevTs = prevTsOf(Some((cur, hdrs))),
      colmap = Some(colmapEncode(newMap)),
      bucketFnHdr = hdrs.get("bucketfn"))
    v
  }

  /** MERGE-ON-READ UPDATE: one atomic commit = dir-scoped tombstones
    * for the matched rows' old versions PLUS a replacement dir carrying
    * the updated rows — no base file is rewritten (the CoW/MoR trade of
    * `commitDeleteVector`, extended to UPDATE). The commit's headers:
    * data= lists every predecessor dir plus the replacement dir;
    * dv=…;scoped carries (key, __dir) pairs that kill each old row only
    * in ITS chain dir, so the replacement rows — same keys, later dir —
    * survive the read's one broadcast anti-join; update= names the
    * replacement dir, which is what the typed change feed serves
    * post-images from without a full-outer diff.
    *
    * Contracts: `keyCols` must uniquely key the snapshot (the tombstone
    * kills every row sharing the matched row's key within its dir);
    * `sets` must not assign a key column (identity is what scoping
    * stands on — rewrite via `commitWithRetry` to re-key); partitionBy
    * layouts refuse (a flat replacement dir beside a partitioned one
    * breaks the union — same contract as appends); consecutive updates
    * compose (each round's tombstones union in, old replacement dirs
    * tombstone like any other dir), and an UNSCOPED predecessor DV is
    * absorbed by expanding its keys across every current dir. Declared
    * constraints re-enforce on the REPLACEMENT rows (updates can mint
    * fresh values; `unique:` checks them against the untouched
    * survivors). Set values cast to the column's committed type, so
    * the schema is stable across the update. Returns the version. */
  def commitUpdate(spark: SparkSession, dir: String, keyCols: Seq[String],
      cond: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      metadata: String = "", prefix: String = "v"): Int = {
    require(keyCols.nonEmpty, "commitUpdate needs at least one key column")
    require(sets.nonEmpty, "commitUpdate needs at least one SET column")
    sets.foreach { case (c, _) => require(!keyCols.contains(c),
      s"cannot SET key column '$c' — keys are the update's identity; " +
        "re-key via a rewrite commit instead") }
    commitUpdateImpl(spark, dir, Some(keyCols), cond, sets, metadata, prefix)
  }

  /** The MoR-update engine behind both doors. `keyColsOpt = None` is
    * the SQL `UPDATE` door's FULL-ROW identity: every column keys the
    * tombstone, so the matched OLD rows die by exact value within their
    * dir and the replacement rows (whose SET columns differ) survive in
    * theirs — semantically exact with NO uniqueness contract (identical
    * duplicate rows all match the same deterministic condition, and
    * each contributes its own replacement). The trade: a full-row DV
    * forces the scan to read every column until the DV is purged, so
    * declared-key updates (the API door) stay the narrow-probe path. */
  private[graft] def commitUpdateImpl(spark: SparkSession, dir: String,
      keyColsOpt: Option[Seq[String]],
      cond: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      metadata: String = "", prefix: String = "v",
      expectVersion: Option[Int] = None): Int = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val fs = fsOf(spark, dir)
    val cur = currentVersion(fs, dir).getOrElse(
      sys.error(s"no committed version under $dir to update"))
    // OCC pin BEFORE the layout gates (the commitDeleteVector rule): a
    // caller whose arm decision was made on an older head must see
    // ConcurrentModificationException — the retryable conflict — not a
    // layout refusal computed from headers it never read (a racer
    // attaching an index mid-flight would otherwise surface as
    // IndexRedeclarationRequired and defeat the SQL door's retry)
    expectVersion.foreach(ev =>
      if (ev != cur) throw new java.util.ConcurrentModificationException(
        s"update resolved its snapshot at version $ev of $dir but the " +
          s"head is now $cur — re-read and retry"))
    val hdrs = parseCommit(commitContent(fs, dir, cur))._1
    require(!hdrs.contains("partby"),
      s"cannot update a partitionBy layout (${hdrs.getOrElse("partby", "")})" +
        ": a flat replacement dir beside a partitioned one makes the " +
        "union unreadable — rewrite via commitWithRetry instead")
    require(!hdrs.contains("pmap"),
      "this table is partition-mapped — update by replacing its " +
        "partitions through replacePartitionsWithRetry (a MoR update " +
        "would drop the value→dir map)")
    require(!hdrs.contains("colmap"),
      "a merge-on-read update cannot target a renamed/dropped-column " +
        "head — SQL UPDATE rewrites copy-on-write, or rewrite via " +
        "commitNextIsolated first")
    require(!hdrs.contains("pdv"),
      "a merge-on-read update cannot target a positional-deletion-" +
        "vector head (the update mints key-scoped tombstones, and one " +
        "version cannot merge two DV regimes) — purgePositionalDv first")
    // same posture as every other index-dropping path: REFUSE rather
    // than silently strip the skipping indexes (stats/bloom cannot
    // coexist with the dv this commit mints — see commit()'s exclusion)
    if (hdrs.contains("stats") || hdrs.contains("bloom"))
      throw new IndexRedeclarationRequired(
        "merge-on-read UPDATE cannot carry the table's skipping index " +
          "(file statistics/Bloom describe raw files and would serve " +
          "pre-update rows) — drop the index deliberately via " +
          "commitNextIsolated, update, then re-index with compactChain")
    val dataDirs = dataDirsFrom(hdrs, cur, prefix)
    import spark.implicits._
    val basenamesDf = dataDirs.map(dirBasename).toDF("__dir")

    // the live snapshot WITH dir attribution (existing tombstones
    // applied first — a dead row must neither re-match nor resurrect
    // through a fresh replacement). Each dir reads under the DECLARED
    // schema when the manifest records one: after a metadata-only ADD
    // COLUMN the old dirs lack the new column physically, and both the
    // condition and the SET expressions must still see it (as NULL) —
    // same conformance rule as readVersion's multi-dir reads.
    val declared = declaredSchemaOf(hdrs)
    val withDir = dataDirs.map { dd =>
      (declared match {
        case Some(st) => spark.read.schema(st).parquet(s"$dir/$dd")
        case None => spark.read.parquet(s"$dir/$dd")
      }).withColumn("__gdir", lit(dirBasename(dd)))
    }.reduce(_ unionByName _)
    val outCols = withDir.columns.filterNot(_ == "__gdir").toSeq
    val keyCols = keyColsOpt.getOrElse(outCols)
    require(keyCols.forall(c => !c.contains(",") && !c.contains(";")),
      s"key column names must not contain the dv= header delimiters: $keyCols")
    // a predecessor DV must share this update's key identity (tombstone
    // sets UNION across versions) — a mismatch would otherwise surface
    // as a schema error deep inside the union; refuse pointedly instead
    hdrs.get("dv").foreach { spec =>
      val prevKeys = spec.split(";", -1)(1).split(",").toSeq
      require(prevKeys == keyCols,
        s"the current version's deletion vector is keyed by $prevKeys " +
          s"but this update keys by $keyCols — purgeDeleteVector first, " +
          "or update through the door whose keys match the recorded ones")
    }
    val prevTombs: Option[DataFrame] = hdrs.get("dv").map { spec =>
      val parts = spec.split(";", -1)
      val dvd = readDvSidecar(spark, s"$dir/${parts(0)}",
        declaredSchemaOf(hdrs), keyCols, scoped = parts.length == 3,
        colmapped = hdrs.contains("colmap"))
      if (parts.length == 3) dvd
      // an unscoped DV kills its keys everywhere — the scoped
      // equivalent is the key set crossed with every current dir
      else dvd.crossJoin(basenamesDf)
    }
    val live = prevTombs.fold(withDir) { tb =>
      val tbR = tb.withColumnRenamed("__dir", "__gdir")
      // null-safe, matching readVersion: a NULL-bearing tombstone key
      // (full-row SQL DML) must kill its row here too — otherwise a
      // dead row re-matches the condition and resurrects through a
      // fresh replacement
      withDir.join(broadcast(tbR),
        (keyCols :+ "__gdir").map(k => withDir(k) <=> tbR(k))
          .reduce(_ && _),
        "left_anti")
    }

    val matched = live.filter(cond)
    // SIMULTANEOUS assignment (the SQL rule): every SET expression
    // evaluates against the PRE-update row — one select, not a
    // sequential fold (a fold would make `SET a = b, b = a` read a's
    // already-replaced value when computing b)
    val resolver = spark.sessionState.conf.resolver
    sets.foreach { case (c, _) =>
      require(outCols.exists(resolver(_, c)),
        s"SET column '$c' is not a column of the table ($outCols)") }
    val replacements = matched.select(outCols.map { c =>
      sets.find { case (sc, _) => resolver(sc, c) } match {
        case Some((_, v)) => v.cast(matched.schema(c).dataType).as(c)
        case None => col(c)
      }
    }: _*)

    val carried = carriedConstraints(Some((cur, hdrs)))
    if (carried.nonEmpty) {
      val newTombKeys = matched.select(keyCols.map(col): _*).distinct()
      enforceConstraints(replacements, carried, "update",
        existing =
          if (carried.exists(_.startsWith("unique:")))
            // null-safe like every DV subtraction in this file
            Some(live.join(broadcast(newTombKeys),
              keyCols.map(k => live(k) <=> newTombKeys(k)).reduce(_ && _),
              "left_anti")
              .select(outCols.map(col): _*))
          else None)
    }

    val v = cur + 1
    val newTombs = matched
      .select((keyCols.map(col) :+ col("__gdir").as("__dir")): _*).distinct()
    val fullTombs = prevTombs.fold(newTombs)(p =>
      p.select((keyCols :+ "__dir").map(col): _*)
        .unionByName(newTombs).distinct())
    val dvDir = s"dv${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    fullTombs.write.mode("errorifexists").parquet(s"$dir/$dvDir")
    val upd = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    replacements.write.mode("errorifexists").parquet(s"$dir/$upd")

    commit(fs, dir, v, metadata, prefix = prefix,
      dataDir = Some((dataDirs :+ upd).mkString(",")),
      dv = Some(s"$dvDir;${keyCols.mkString(",")};scoped"),
      updateDir = Some(upd),
      schema = hdrs.get("schema")
        .orElse(Some(schemaEncode(replacements.schema))),
      prevTs = prevTsOf(Some((cur, hdrs))),
      constraintsHdr = hdrs.get("constraints"))
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

  /** Bounded serializable-OCC retry shared by EVERY commit door. Runs
    * `body` with the 1-based attempt number; a lost race
    * (ConcurrentModificationException — the ONLY retryable failure;
    * anything else, disk failure included, propagates immediately)
    * re-runs it up to `maxAttempts` times, then rethrows. Conflict
    * SAFETY lives in the body, not here: each attempt must re-read the
    * head and re-derive everything that depends on it (gate,
    * constraints, index derivation, version number) — the helper
    * standardizes only the bounding and the retry trigger, so the
    * doors' loop semantics cannot drift apart (they had, six hand-rolled
    * copies deep, by round 17). `onConflict` runs after a lost attempt
    * (never after the last, which rethrows); returning Some(a) ends the
    * loop with `a` instead of retrying — the streaming doors use it to
    * detect their own restarted twin (replay ⇒ drop the staged dir,
    * report no-op), the partition-replace door to re-stage when the
    * winner's write set didn't commute with its own. */
  private[graft] def retryOnConflict[A](maxAttempts: Int,
      onConflict: (Int, java.util.ConcurrentModificationException)
        => Option[A] = (_: Int,
          _: java.util.ConcurrentModificationException) => None)
      (body: Int => A): A = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return body(attempt)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxAttempts) throw e
          onConflict(attempt, e) match {
            case Some(a) => return a
            case None => ()
          }
      }
    }
    sys.error("unreachable")
  }

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
      prefix: String = "v", allowEvolution: Boolean = false): Int =
    retryOnConflict(maxAttempts) { _ =>
      val fs = fsOf(spark, dir)
      val cur = currentHeaders(fs, dir)
      val out = transform(cur.map { case (v, _) =>
        readVersion(spark, dir, v, prefix)
      })
      // gate against the snapshot this attempt read — before the write,
      // so a refused schema stages nothing; declared constraints
      // likewise (re-read per attempt: the race winner may have
      // declared or dropped them)
      schemaGate(cur.flatMap(_._2.get("schema")), out.schema, allowEvolution)
      val carried = carriedConstraints(cur)
      enforceConstraints(out, carried, "commit")
      val v = cur.map(_._1 + 1).getOrElse(0)
      val data = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
      out.write.mode("errorifexists").parquet(s"$dir/$data")
      commit(fs, dir, v, metadata, retain, prefix, dataDir = Some(data),
        schema = Some(schemaEncode(out.schema)), prevTs = prevTsOf(cur),
        constraintsHdr =
          if (carried.isEmpty) None else Some(constraintsEncode(carried)))
      v
    }

  /** APPEND-ONLY OCC commit: write `df`'s rows ONCE to a writer-private
    * dir, then commit a version whose data= list is the current
    * version's dirs PLUS the new one, retrying ONLY the (cheap,
    * O(manifest)) commit step on a lost race — an append reads no
    * snapshot, so unlike `commitWithRetry` there is nothing to
    * re-execute and the already-staged files are re-referenced verbatim
    * under the next version number (Delta's conflict checker lets blind
    * appends land for the same reason; here the loser pays one more
    * commit-file publish, never a second write of the data). The
    * staged dir is named at first resolution and REUSED across
    * attempts, so a lost race leaves no orphan for `vacuum`.
    *
    * Contracts: the appended schema must match the current version's
    * exactly (the reader unions the dir list — see `schemaGate`'s
    * append context, re-checked per attempt against the fresh winner);
    * the current version must not carry a deletion vector (tombstones
    * would subtract from the marker dir's "added" set — purge first);
    * `statsCols` extends the table's skipping index incrementally —
    * stats are computed over the NEW files only (they are the hot ones)
    * and merged with the predecessor's line, re-keyed table-relative,
    * which requires the predecessor to carry stats on the same columns.
    * `versionDelta` serves this version's delta from the marker dir
    * alone — the append-only CDC fast path.
    *
    * Metadata posture, deliberately Iceberg-shaped: every commit file
    * is a SELF-CONTAINED snapshot (the full dir list + the full merged
    * stats line), so resolving any version costs ONE commit-file read —
    * no log replay, ever (Delta's opposite trade: O(1) commit files,
    * O(log) replay bounded by checkpoints). The cost is that an append
    * commit's size grows with the chain (O(dirs) + O(files) stats),
    * exactly like an Iceberg snapshot's manifest list — so long append
    * chains are expected to be COMPACTED periodically into one statted
    * dir (`commitNextIsolated(read(dir), statsCols = …)`, the
    * table_compact_version OPTIMIZE pattern), which resets the chain
    * and the commit-file size in one atomic version. At a
    * compact-every-100-appends cadence the commit file stays KB-scale
    * while appends stay O(new data). Returns the version. */
  def commitAppendWithRetry(spark: SparkSession, dir: String, df: DataFrame,
      metadata: String = "", maxAttempts: Int = 10,
      retain: Int = Int.MaxValue, prefix: String = "v",
      statsCols: StatsCols = Nil, bloomCol: Option[String] = None,
      bloomCols: Seq[String] = Nil,
      statsEnc: Seq[(String, String)] = Nil): Int = {
    val effBloom = (bloomCol.toSeq ++ bloomCols).distinct
    val effStats: StatsCols =
      StatsEnc.validateAndMerge(spark, statsCols, statsEnc)
    val fs = fsOf(spark, dir)
    // pre-flight gate against the CURRENT version so a refused append
    // writes NOTHING — every contract violation below fails before the
    // distributed write, like schemaGate everywhere else; re-checked
    // per attempt in case the winner evolved
    def gate(cur: Option[(Int, Map[String, String])]): Unit =
      cur.foreach { case (_, h) =>
        require(!h.contains("dv"),
          "cannot append onto a version carrying a deletion vector — " +
            "purgeDeleteVector first")
        require(!h.contains("pdv"),
          "cannot append onto a version carrying a positional deletion " +
            "vector — purgePositionalDv first")
        require(!h.contains("partby"),
          s"cannot append onto a partitionBy layout (${h("partby")}): a " +
            "flat appended dir beside a partitioned one makes the union " +
            "unreadable — commit a full version instead")
        require(!h.contains("pmap"),
          "this table is partition-mapped — append by replacing (or " +
            "adding) partitions through replacePartitionsWithRetry (a " +
            "plain append would drop the value→dir map)")
        require(!h.contains("colmap"),
          "cannot append onto a renamed/dropped-column head: the new " +
            "dir's physical names would differ from the chain's — " +
            "rewrite via commitNextIsolated (normalizing the names) " +
            "first")
        val prevStatCols = h.get("stats")
          .map(_.split(";", 2)(0).split(",").toSeq.map(urlDec))
        (prevStatCols, effStats.map(_._1)) match {
          case (None, mine) if mine.nonEmpty =>
            throw new IllegalArgumentException(
              "append with statsCols requires the current version to " +
                "carry stats (partial statistics would under-count " +
                "every stats-served read)")
          case (Some(theirs), mine) if mine.isEmpty =>
            throw new IllegalArgumentException(
              s"appending WITHOUT statsCols onto a stats-bearing table " +
                s"would silently drop the skipping index for the whole " +
                s"chain — pass statsCols on $theirs to extend it (or " +
                "rewrite via commitNextIsolated to drop stats " +
                "deliberately)")
          case (Some(theirs), mine) if mine.nonEmpty && theirs != mine =>
            throw new IllegalArgumentException(
              s"append statsCols $mine must match the table's recorded " +
                s"stat columns $theirs")
          case _ => ()
        }
        // ENCODING continuity: the chain's one stats line must stay one
        // ordinal domain end-to-end — a registry-declared (statenc)
        // column must be re-declared with the SAME encoding, and a
        // column the predecessor recorded WITHOUT an encoding name
        // cannot gain one (its existing entries' encoding is
        // unverifiable; a mixed line would mis-prune DSv2 band reads)
        val prevEnc = h.get("statenc").map(StatsEnc.decode(_).toMap)
          .getOrElse(Map.empty[String, String])
        val mineEnc = statsEnc.toMap
        (prevEnc.keySet ++ mineEnc.keySet).foreach { c =>
          if (h.contains("stats"))
            require(prevEnc.get(c) == mineEnc.get(c),
              s"append stats encoding for '$c' must match the chain's " +
                s"recorded statenc (${prevEnc.get(c)} vs " +
                s"${mineEnc.get(c)}) — one stats line, one ordinal " +
                "domain; rewrite via compactChain to re-encode")
        }
        // same contract for the Bloom index: a chain is probed dir by
        // dir, so every dir must carry sidecar sections on the SAME
        // column SET — a bloom-less append would silently blind the
        // point lookups
        (h.get("bloom").map(b => bloomColsOf(b).toSet),
            effBloom.toSet) match {
          case (None, mine) if mine.nonEmpty =>
            throw new IllegalArgumentException(
              "append with bloomCol requires the current version to " +
                "carry a Bloom index (a partially indexed chain would " +
                "under-serve every point lookup)")
          case (Some(theirs), mine) if mine.isEmpty =>
            throw new IllegalArgumentException(
              s"appending WITHOUT bloomCol onto a Bloom-indexed table " +
                s"would silently drop the point-lookup index for the " +
                s"whole chain — pass bloomCol on $theirs to extend it " +
                "(or rewrite via commitNextIsolated)")
          case (Some(theirs), mine) if mine.nonEmpty && theirs != mine =>
            throw new IllegalArgumentException(
              s"append bloomCol $mine must match the table's indexed " +
                s"columns $theirs")
          case _ => ()
        }
        schemaGate(h.get("schema"), df.schema, allowEvolution = false,
          context = "append")
      }
    // declared constraints enforce on the NEW rows (the chain's old
    // rows were validated by their own commits); `unique:` additionally
    // checks the new keys against the CURRENT snapshot — re-run per OCC
    // attempt, since a racing append may have landed clashing keys
    def enforceOn(cur: Option[(Int, Map[String, String])]): Seq[String] =
      carriedConstraints(cur) match {
        case Nil => Nil
        case specs =>
          enforceConstraints(df, specs, "append",
            existing =
              if (specs.exists(_.startsWith("unique:")))
                cur.map { case (c, _) => readVersion(spark, dir, c, prefix) }
              else None)
          specs
      }
    val cur0 = currentHeaders(fs, dir)
    gate(cur0)
    var constraintsCarried = enforceOn(cur0)
    // stage ONCE: the dir name carries the version seen at stage time;
    // on a lost race the same dir is re-referenced under the winner's
    // successor number (dirVersion still parses it for vacuum/GC — and
    // the name can never collide with the live chain, which only grows)
    val added = s"$prefix${cur0.map(_._1 + 1).getOrElse(0)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("errorifexists").parquet(s"$dir/$added")
    val newStats =
      if (effStats.isEmpty) None
      else Some(computeStats(spark, s"$dir/$added", effStats))
    // the appended dir gets its OWN sidecar (sized to its own files —
    // each sidecar self-describes m/k per section, so chain dirs may
    // differ); staged once, reused verbatim on a lost race
    val newBloom =
      if (effBloom.isEmpty) None
      else Some(bloomHeader(
        buildBloomSidecar(spark, s"$dir/$added", effBloom)))
    retryOnConflict(maxAttempts) { attempt =>
      // the staged dir is reused VERBATIM across attempts (an append
      // reads no snapshot, so there is nothing to re-execute) — only
      // the gate, constraints and manifest math re-run on the new head
      val cur = if (attempt == 1) cur0 else currentHeaders(fs, dir)
      if (attempt > 1) { gate(cur); constraintsCarried = enforceOn(cur) }
      val prevDirs = cur.map { case (c, h) => dataDirsFrom(h, c, prefix) }
        .getOrElse(Seq.empty)
      val v = cur.map(_._1 + 1).getOrElse(0)
      val mergedStats = newStats.map(mergeAppendStats(_, added, cur, prefix))
      commit(fs, dir, v, metadata, retain, prefix,
        dataDir = Some((prevDirs :+ added).mkString(",")),
        stats = mergedStats, appendDir = Some(added),
        schema = Some(schemaEncode(df.schema)), prevTs = prevTsOf(cur),
        bloom = newBloom,
        constraintsHdr =
          if (constraintsCarried.isEmpty) None
          else Some(constraintsEncode(constraintsCarried)),
        statenc =
          if (statsEnc.isEmpty || mergedStats.isEmpty) None
          else Some(StatsEnc.encode(statsEnc)))
      v
    }
  }

  /** Merged stats line for an append commit, table-relative keys: the
    * new dir's files prefixed with their dir; the predecessor's entries
    * re-keyed by ITS dir unless it was an append version (already
    * table-relative). Shared by the API append and the DSv2 staged
    * append so the re-keying rule cannot diverge. */
  private def mergeAppendStats(ns: TableStats, added: String,
      cur: Option[(Int, Map[String, String])], prefix: String)
      : TableStats = {
    val mine = ns.files.map(f => f.copy(file = s"$added/${f.file}"))
    cur match {
      case Some((c, h)) =>
        val prev = TableStats.decode(h.getOrElse("stats", sys.error(
          "append statsCols require predecessor stats")))
        require(prev.cols == ns.cols,
          s"append statsCols ${ns.cols} must match the table's " +
            s"recorded stat columns ${prev.cols}")
        val prevRel =
          if (h.contains("append") || h.contains("statrel")) prev.files
          else {
            val pd = dataDirsFrom(h, c, prefix).head
            prev.files.map(f => f.copy(file = s"$pd/${f.file}"))
          }
        TableStats(ns.cols, prevRel ++ mine)
      case None => TableStats(ns.cols, mine)
    }
  }

  /** Single-attempt `commitAppendWithRetry` — the plain append commit
    * (a lost race surfaces as ConcurrentModificationException for the
    * caller's own loop). */
  def commitAppend(spark: SparkSession, dir: String, df: DataFrame,
      metadata: String = "", retain: Int = Int.MaxValue,
      prefix: String = "v", statsCols: StatsCols = Nil,
      bloomCol: Option[String] = None, bloomCols: Seq[String] = Nil,
      statsEnc: Seq[(String, String)] = Nil): Int =
    commitAppendWithRetry(spark, dir, df, metadata, maxAttempts = 1,
      retain, prefix, statsCols, bloomCol, bloomCols, statsEnc)

  /** The DSv2 write door's PRE-JOB gate (see `GraftWriteBuilder`):
    * everything that can refuse must refuse before the distributed
    * write runs. Appends demand the same chain invariants as
    * `commitAppendWithRetry` — plus index-bearing chains refuse
    * outright, because SQL/DataFrame writers cannot re-declare the
    * stats/Bloom ordinals (code, not headers). */
  private[graft] def dsv2WriteGate(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      append: Boolean, stagedPartBy: Seq[String] = Nil): Unit = {
    val fs = fsOf(spark, dir)
    currentHeaders(fs, dir).foreach { case (_, h) =>
      schemaGate(h.get("schema"), schema, allowEvolution = false,
        context = if (append) "append" else "commit")
      require(!h.contains("pmap"),
        "this table is partition-mapped — write through " +
          "replacePartitionsWithRetry (a plain DSv2 write would drop " +
          "the value→dir map)")
      // a partitionBy layout is PRESERVED: the write door re-stages the
      // flat parquet job's output partitionBy-shaped from the RECORDED
      // columns and carries the partby header (`commitStagedDsv2`'s
      // relayout), so both modes serve it. Only a shape MISMATCH
      // refuses — a racing writer re-laying out the table between the
      // relayout and this attempt's gate — because the already-staged
      // dirs no longer match the head's layout.
      val declaredPartBy =
        h.get("partby").map(_.split(",").toSeq).getOrElse(Nil)
      require(declaredPartBy == stagedPartBy,
        s"this table's partitionBy layout ($declaredPartBy) changed " +
          s"after the write staged its dirs ($stagedPartBy) — re-run " +
          "the write against the new layout")
      // a BUCKET-declared layout is served by both DSv2 modes: the
      // staged rows are validated against the bucket invariant before
      // any version mints (commitStagedDsv2), and the declaration
      // carries — so the planner's key-group alignment stays truthful
      // through DSv2 ingest too
      // a statenc-declared stats line and a bloom= line are
      // SELF-DESCRIBED by the manifest (registry encoding names /
      // col|m|k sections), so BOTH DSv2 modes re-derive them
      // (`commitStagedDsv2`): an append extends the chain's index, an
      // overwrite re-indexes its replacement snapshot — the index is
      // never silently stripped. Only a stats line whose columns are
      // not fully registry-declared refuses: its lambda ordinals are
      // code a DataFrame writer cannot re-derive, and a mixed line
      // would mis-prune band reads.
      if (!statencCovers(h))
        throw new IndexRedeclarationRequired(
          "a DSv2 write cannot re-derive this table's stats index: its " +
            s"stat columns ${h.get("stats").map(TableStats.decode(_).cols)
              .getOrElse(Nil)} are not fully registry-declared " +
            s"(statenc covers ${h.get("statenc")
              .map(StatsEnc.decode(_).map(_._1)).getOrElse(Nil)}) — " +
            "write through the API with the original statsCols, or " +
            "re-commit the chain with statsEnc registry encodings")
      if (append) {
        require(!h.contains("dv"),
          "cannot append onto a version carrying a deletion vector — " +
            "purgeDeleteVector first")
        require(!h.contains("pdv"),
          "cannot append onto a version carrying a positional deletion " +
            "vector — purgePositionalDv first")
        require(!h.contains("colmap"),
          "cannot append onto a renamed/dropped-column head through " +
            "the DSv2 door — overwrite (which normalizes the physical " +
            "names) or rewrite via commitNextIsolated first")
        // a partitioned APPEND composes with everything EXCEPT a
        // band/Bloom index: the point-probe and band readers open hit
        // files directly and a multi-dir partitioned chain has no
        // single basePath to re-anchor the partition columns under —
        // serving it would silently drop those columns from pruned
        // reads. Loud refusal until the chain compacts back to one dir.
        require(!h.contains("partby") ||
            !(h.contains("stats") || h.contains("bloom")),
          "cannot append onto an index-bearing partitionBy chain " +
            "through the DSv2 door (band/Bloom reads cannot re-anchor " +
            "partition columns across chain dirs) — OPTIMIZE the chain " +
            "to one dir first, or extend it through the API")
      }
    }
  }

  /** The DSv2 write door's MANIFEST half: after the inner parquet job
    * committed its files into `$dir/$staged`, enforce the declared
    * constraints over the staged rows and publish the version — an
    * append commit (chain re-reference + append= marker; a lost OCC
    * race re-publishes the SAME staged dir under the next number,
    * never re-writes) or a full overwrite. A refusal deletes the
    * staging dir: the failed write is invisible to readers. */
  private[graft] def commitStagedDsv2(spark: SparkSession, dir: String,
      staged: String, schema: org.apache.spark.sql.types.StructType,
      append: Boolean, maxAttempts: Int = 10): Unit = {
    val fs = fsOf(spark, dir)
    // PARTITION RELAYOUT: a partitionBy target re-stages the flat
    // parquet job's output partitionBy-shaped from the RECORDED columns
    // — the commit then carries the partby header and readers keep
    // their partition pruning (the round-16 refusal becomes the
    // capability). One extra distributed pass over the NEW rows only,
    // never the table; the flat dir is dropped the moment the shaped
    // one lands. The shaped name stays version-prefixed so a failed
    // commit's leftover is ordinary vacuum-reclaimable staging.
    val partBy = currentHeaders(fs, dir)
      .flatMap(_._2.get("partby")).map(_.split(",").toSeq).getOrElse(Nil)
    val effStaged =
      if (partBy.isEmpty) staged
      else {
        val shaped = s"${staged}p"
        spark.read.schema(schema).parquet(s"$dir/$staged")
          .write.mode("errorifexists").partitionBy(partBy: _*)
          .parquet(s"$dir/$shaped")
        try fs.delete(new Path(s"$dir/$staged"), true)
        catch { case _: java.io.IOException => () }
        shaped
      }
    try {
      val stagedDf = spark.read.parquet(s"$dir/$effStaged")
      retryOnConflict(maxAttempts) { _ =>
        val cur = currentHeaders(fs, dir)
        // re-gate per attempt: the race winner may have evolved the
        // schema, declared constraints, or attached an index — or
        // re-laid out the partition shape, which refuses (the staged
        // dirs no longer match)
        dsv2WriteGate(spark, dir, schema, append, stagedPartBy = partBy)
        // per-ATTEMPT index derivation, from the SAME headers the gate
        // just passed: an OCC winner that attached (or dropped) the
        // chain's index mid-race must be reflected — a pre-loop
        // snapshot would silently commit an index-less version onto a
        // freshly indexed chain
        val (newStats, statsEncDecl, newBloom) =
          dsv2IndexExtension(spark, dir, effStaged, cur.map(_._2))
        // a bucket-declared target validates the STAGED rows against
        // the invariant before any version mints (append: old files
        // were validated at their own commits; overwrite: the staged
        // rows ARE the new snapshot) — re-read per attempt like the
        // index, in case the race winner declared bucketing mid-race
        cur.map(_._2).flatMap(bucketFnOf).foreach {
          case (n, keyCol, bCol) =>
            validateBucketInvariant(stagedDf, n, keyCol, bCol)
        }
        val carried = carriedConstraints(cur)
        if (carried.nonEmpty)
          enforceConstraints(stagedDf, carried,
            if (append) "append" else "commit",
            existing =
              if (append && carried.exists(_.startsWith("unique:")))
                cur.map { case (v, _) => readVersion(spark, dir, v) }
              else None)
        val v = cur.map(_._1 + 1).getOrElse(0)
        val prevDirs = cur.map { case (c, h) => dataDirsFrom(h, c, "v") }
          .getOrElse(Seq.empty)
        commit(fs, dir, v, if (append) "dsv2 append" else "dsv2 overwrite",
          prefix = "v",
          dataDir = Some(
            (if (append) prevDirs :+ effStaged else Seq(effStaged))
              .mkString(",")),
          appendDir = if (append && cur.isDefined) Some(effStaged) else None,
          schema = Some(schemaEncode(schema)), prevTs = prevTsOf(cur),
          partBy =
            if (partBy.isEmpty) None else Some(partBy.mkString(",")),
          // append: the chain's merged line; overwrite: the staged
          // dir's own entries (dir-relative — it IS the new version)
          stats =
            if (append) newStats.map(mergeAppendStats(_, effStaged, cur, "v"))
            else newStats,
          bloom = newBloom,
          statenc =
            if (statsEncDecl.isEmpty || newStats.isEmpty) None
            else Some(StatsEnc.encode(statsEncDecl)),
          constraintsHdr =
            if (carried.isEmpty) None else Some(constraintsEncode(carried)),
          bucketFnHdr = cur.flatMap(_._2.get("bucketfn")))
      }
    } catch {
      case e: Throwable =>
        // a refused or exhausted write must not leave the staged files
        // where a reader could mistake them for data (they are outside
        // every manifest, but vacuum hygiene beats waiting for it)
        try fs.delete(new Path(s"$dir/$staged"), true)
        catch { case _: java.io.IOException => () }
        try fs.delete(new Path(s"$dir/$effStaged"), true)
        catch { case _: java.io.IOException => () }
        throw e
    }
  }

  /** The current version's recorded partitionBy columns (empty for flat
    * tables and empty dirs) — the shape the DSv2 write door's relayout
    * stages toward. */
  private[graft] def declaredPartBy(spark: SparkSession,
      dir: String): Seq[String] =
    currentHeaders(fsOf(spark, dir), dir)
      .flatMap(_._2.get("partby")).map(_.split(",").toSeq).getOrElse(Nil)

  /** Whether a version's stats= line is FULLY described by its statenc=
    * registry declaration (same columns, same order) — the shared
    * predicate of every self-described re-indexing door (DSv2 append
    * gate, SQL MERGE re-index, SQL OPTIMIZE/maintain). One
    * implementation so the doors can never diverge on what "covered"
    * means: a lambda-ordinal stats line refuses everywhere, a
    * registry-declared one re-derives everywhere. */
  private[graft] def statencCovers(h: Map[String, String]): Boolean =
    h.get("stats").forall(st => TableStats.decode(st).cols ==
      h.get("statenc").map(StatsEnc.decode(_).map(_._1)).getOrElse(Nil))

  /** SELF-DESCRIBED index derivation for a staged DSv2/streaming
    * write: a predecessor whose stats line is fully statenc-declared
    * re-derives its ordinals from the REGISTRY (manifest names, not
    * caller code) and the staged dir gets its own stats entries; a
    * bloom= predecessor gets a fresh sidecar built on the staged dir
    * for the same column set. Called PER OCC ATTEMPT with the headers
    * that attempt's gate passed, so a mid-race index attach/drop is
    * always reflected. Returns (staged dir's stats, statenc declaration
    * to carry, staged dir's bloom header). */
  private def dsv2IndexExtension(spark: SparkSession,
      dir: String, staged: String, curHeaders: Option[Map[String, String]])
      : (Option[TableStats], Seq[(String, String)], Option[String]) =
    curHeaders match {
      case Some(h) =>
        val encDecl = h.get("statenc").map(StatsEnc.decode).getOrElse(Nil)
        val effStats: StatsCols =
          if (!h.contains("stats")) Nil
          else StatsEnc.validateAndMerge(spark, Nil, encDecl)
        val effBloom = h.get("bloom").map(bloomColsOf).getOrElse(Nil)
        (if (effStats.isEmpty) None
         else Some(computeStats(spark, s"$dir/$staged", effStats)),
          if (effStats.isEmpty) Nil else encDecl,
          if (effBloom.isEmpty) None
          else Some(bloomHeader(
            buildBloomSidecar(spark, s"$dir/$staged", effBloom))))
      case None => (None, Nil, None)
    }

  /** Parsed pmap= header: (partition column, value → entry dir). */
  private[graft] def pmapDecode(s: String): (String, Map[String, String]) = {
    val i = s.indexOf('|')
    (urlDec(s.take(i)),
      s.drop(i + 1).split(",").filter(_.nonEmpty).map { kv =>
        val j = kv.indexOf(':')
        (urlDec(kv.take(j)), urlDec(kv.drop(j + 1)))
      }.toMap)
  }

  private def pmapEncode(partCol: String, m: Map[String, String]): String =
    s"${urlEnc(partCol)}|" + m.toSeq.sortBy(_._1)
      .map { case (v, e) => s"${urlEnc(v)}:${urlEnc(e)}" }.mkString(",")

  /** DISJOINT-WRITE OCC — WriteSerializable for partition-scoped
    * rewrites. The table is PARTITION-MAPPED (pmap= header: one entry
    * dir per value of `partCol`; the snapshot is their union, served by
    * the ordinary data= list). `transform` receives the current
    * snapshot and returns the REPLACEMENT rows for the partitions it
    * rewrites (new values insert, omitted values stay untouched); the
    * result is staged ONCE as one `partitionBy`-shaped root — one spark
    * job however many partitions — and the commit maps each written
    * value to its staged subdir.
    *
    * The WriteSerializable part: on a lost race, the loser compares its
    * WRITE SET (the partition values it replaced, recorded by every
    * pmap commit in its wset= header) against every interleaved
    * winner's. All-disjoint → the loser's already-staged result is
    * re-mapped over the winner's pmap and re-committed under the next
    * version WITHOUT re-executing the transform (generalizing
    * `commitAppendWithRetry`'s no-re-execution posture from "blind
    * appends commute" to "disjoint partition rewrites commute"); any
    * overlap — or any interleaved non-pmap commit, whose effect the
    * loser cannot reason about — re-executes against the fresh
    * snapshot, exactly like `commitWithRetry`. A declared `unique:`
    * constraint also forces re-execution on conflict (uniqueness spans
    * partitions, so commuting is no longer provable).
    *
    * Contracts: partition values must be non-null and filesystem-plain
    * (`[A-Za-z0-9_.-]`, the values' OWN string forms name the staged
    * subdirs); the table must be pmap-born (first commit through this
    * API) — a plain table's rows aren't value-mapped, so partial
    * replacement would be undefined. Returns the committed version. */
  def replacePartitionsWithRetry(spark: SparkSession, dir: String,
      partCol: String, transform: Option[DataFrame] => DataFrame,
      metadata: String = "", maxAttempts: Int = 10,
      prefix: String = "v"): Int = {
    import org.apache.spark.sql.functions.col
    val fs = fsOf(spark, dir)
    val safe = "[A-Za-z0-9_.-]+".r

    def pmapOf(cur: Option[(Int, Map[String, String])])
        : Map[String, String] = cur match {
      case None => Map.empty
      case Some((v, h)) => h.get("pmap") match {
        case Some(enc) =>
          val (pc, m) = pmapDecode(enc)
          require(pc == partCol,
            s"table is partition-mapped on '$pc', not '$partCol'")
          m
        case None => sys.error(
          s"version $v of $dir is not partition-mapped — " +
            "replacePartitionsWithRetry manages tables born through it")
      }
    }

    /** Evaluate + stage once: (written values, staged root, schema). */
    def stageOnce(cur: Option[(Int, Map[String, String])])
        : (Seq[String], String, org.apache.spark.sql.types.StructType) = {
      val snap = cur.map { case (v, _) => readVersion(spark, dir, v, prefix) }
      val df = transform(snap)
      require(df.columns.contains(partCol),
        s"replacement rows must carry the partition column '$partCol'")
      schemaGate(cur.flatMap(_._2.get("schema")), df.schema,
        allowEvolution = false)
      val carried = carriedConstraints(cur)
      val w = df.select(col(partCol)).distinct().collect().map { r =>
        require(!r.isNullAt(0),
          s"partition column '$partCol' must be non-null")
        String.valueOf(r.get(0))
      }.toSeq.sorted
      require(w.nonEmpty, "transform produced no partitions to replace")
      w.foreach(v => require(safe.pattern.matcher(v).matches(),
        s"partition value '$v' is not filesystem-plain ([A-Za-z0-9_.-])"))
      if (carried.nonEmpty) {
        // unique: checks the new rows against the UNTOUCHED partitions
        val existing =
          if (carried.exists(_.startsWith("unique:")) && snap.isDefined)
            Some(snap.get.filter(
              !col(partCol).cast("string").isin(w: _*)))
          else None
        enforceConstraints(df, carried, "replacePartitions", existing)
      }
      val v0 = cur.map(_._1 + 1).getOrElse(0)
      val root = s"$prefix${v0}_${java.util.UUID.randomUUID().toString.take(8)}"
      // ONE job whatever the partition count: the duplicate __p column
      // drives the subdir layout and is excluded from the files, so
      // every entry dir reads back with the original schema intact
      df.withColumn("__p", col(partCol).cast("string"))
        .write.partitionBy("__p").mode("errorifexists")
        .parquet(s"$dir/$root")
      (w, root, df.schema)
    }

    var cur = currentHeaders(fs, dir)
    var (w, root, schema) = stageOnce(cur)
    retryOnConflict[Int](maxAttempts, onConflict = (_, _) => {
      val base = cur.map(_._1).getOrElse(-1)
      val newCur = currentHeaders(fs, dir)
      val carried = carriedConstraints(newCur)
      // every interleaved commit must be pmap-shaped AND disjoint
      // from our write set for the staged result to commute past it
      val commutes = !carried.exists(_.startsWith("unique:")) &&
        ((base + 1) to newCur.map(_._1).getOrElse(-1)).forall { vv =>
          val h = parseCommit(commitContent(fs, dir, vv))._1
          h.contains("pmap") && h.get("wset").exists(ws =>
            ws.split(",").filter(_.nonEmpty).map(urlDec)
              .toSet.intersect(w.toSet).isEmpty)
        }
      // a NON-pmap interleaved commit rewrote the table's shape out
      // from under this API (pmapOf would refuse it anyway) — fail
      // loudly BEFORE wasting a re-execution on a doomed retry
      ((base + 1) to newCur.map(_._1).getOrElse(-1)).foreach { vv =>
        if (!parseCommit(commitContent(fs, dir, vv))._1.contains("pmap"))
          throw new IllegalStateException(
            s"version $vv of $dir was committed outside the " +
              "partition-mapped protocol mid-retry — the table is " +
              "no longer value-mapped; rebuild it through " +
              "replacePartitionsWithRetry")
      }
      cur = newCur
      if (!commutes) {
        // overlapping write set (or a declared unique: constraint):
        // re-execute against the fresh snapshot; the abandoned
        // staging root is a vacuum-reclaimable orphan
        val s2 = stageOnce(cur)
        w = s2._1; root = s2._2; schema = s2._3
      }
      None
    }) { _ =>
      val prevMap = pmapOf(cur)
      val newMap = (prevMap -- w) ++ w.map(v => v -> s"$root/__p=$v")
      val entries = newMap.toSeq.sortBy(_._1).map(_._2)
      val v = cur.map(_._1 + 1).getOrElse(0)
      commit(fs, dir, v, metadata, prefix = prefix,
        dataDir = Some(entries.mkString(",")),
        schema = Some(schemaEncode(schema)), prevTs = prevTsOf(cur),
        constraintsHdr = cur.flatMap(_._2.get("constraints")),
        pmap = Some(pmapEncode(partCol, newMap)),
        wset = Some(w.map(urlEnc).mkString(",")))
      v
    }
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
      statsCols: StatsCols = Nil, checkpointEvery: Int = 0)
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
    else {
      val v = commitNextIsolated(spark, dir, df, s"epoch=$epochId", retain,
        prefix, statsCols = statsCols)
      // periodic manifest checkpoint (Delta's every-N-commits cadence):
      // keeps the long-lived streaming table's full-history consumers —
      // history(), versionAsOf — at O(1 + suffix) commit-file reads.
      // Best-effort like the _last hint: a failed checkpoint write
      // degrades readers to per-file resolution, never correctness.
      if (checkpointEvery > 0 && v > 0 && v % checkpointEvery == 0)
        try checkpoint(fs, dir)
        catch { case _: java.io.IOException => () }
      Some(v)
    }
  }

  /** The STREAMING write door's manifest half: publish an
    * already-staged epoch dir as the next version, idempotently keyed
    * by `epochId` — `commitEpoch`'s replay detection applied to the
    * DSv2 path, where the distributed parquet write has ALREADY
    * happened (executor-side, through the epoch writer factory) by the
    * time the engine calls the sink's commit. A detected replay deletes
    * the freshly-staged duplicate dir and mints nothing (the previous
    * run's version already holds these rows); an empty epoch (no data
    * files staged) likewise publishes nothing — an empty dir in the
    * data= union would break every reader. Append semantics: the new
    * version re-references the current chain plus the staged dir (CDC
    * fast path, streaming READS of the sink table, versionDelta all
    * apply), v0 is the create. Same per-attempt re-gating as
    * `commitStagedDsv2` under OCC races. */
  /** Stable 8-hex tag of a streaming queryId — embedded in epoch
    * staging-dir names (`ep<epoch>_<tag>-<run>`) so `vacuum` can tell
    * an IN-FLIGHT epoch (staged ahead of its own query's committed
    * history — its commit may still publish, however stalled) from
    * replay/crash garbage (at or behind the committed history —
    * provably never publishing, reclaimable after the grace window).
    * Without the tag, a commit stalled past the grace could have its
    * staging vacuumed between `commitEpochStaged`'s final re-verify
    * and the manifest publish, minting a dangling data= entry. */
  private[graft] def queryTag(queryId: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(queryId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString

  /** The query tag of an `ep<epoch>_<tag>-<run>` staging name — None
    * for tag-less legacy names (pre-tag stagings fall back to the
    * plain grace-window rule in `vacuum`). */
  private def epStagingTag(name: String): Option[String] = {
    val i = name.indexOf('_')
    if (i < 0) None
    else {
      val rest = name.substring(i + 1)
      val j = rest.indexOf('-')
      if (j == 8 && rest.take(8).forall(c => c.isDigit ||
          (c >= 'a' && c <= 'f'))) Some(rest.take(8))
      else None
    }
  }

  /** Newest committed streaming epoch of `queryId` — the (query, epoch)
    * replay-identity probe shared by the append and upsert streaming
    * doors (Delta's (txnAppId, version) rule). The walk stops at THIS
    * query's newest epoch commit; other writers' interleaved commits
    * are walked past. Legacy bare `epoch=N` metadata (the foreachBatch
    * streamingSink door) never matches a query-tagged probe and vice
    * versa — independent idempotence namespaces. */
  private def newestEpochFor(fs: FileSystem, dir: String,
      queryId: String): Option[Long] =
    versions(fs, dir).sorted(Ordering[Int].reverse).iterator
      .map(v => meta(fs, dir, v))
      .filter(_.startsWith("epoch="))
      .map { m =>
        val parts = m.stripPrefix("epoch=").split(";query=", 2)
        (parts(0).toLongOption,
          if (parts.length == 2) Some(parts(1)) else None)
      }
      .collectFirst { case (Some(e), Some(q)) if q == queryId => e }

  private[graft] def commitEpochStaged(spark: SparkSession, dir: String,
      epochId: Long, staged: String,
      schema: org.apache.spark.sql.types.StructType,
      queryId: String, maxAttempts: Int = 10,
      expectedFiles: Seq[String] = Nil): Option[Int] = {
    val fs = fsOf(spark, dir)
    val stagedPath = new Path(s"$dir/$staged")
    require(!queryId.contains("\n") && queryId.nonEmpty,
      s"queryId must be a non-empty single-line token (got '$queryId')")
    // Replay detection is keyed by (QUERY, epoch), never the bare epoch
    // — batch ids restart from 0 for every distinct query (a fresh
    // checkpoint, a second pipeline into the same sink), and a
    // bare-epoch probe would silently discard a new query's entire
    // early history as "replays" of the old one. See `newestEpochFor`.
    def newestEpoch: Option[Long] = newestEpochFor(fs, dir, queryId)
    def dropStaged(): Unit =
      try fs.delete(stagedPath, true)
      catch { case _: java.io.IOException => () }
    if (newestEpoch.exists(epochId <= _)) { dropStaged(); return None }
    val hasData = fs.exists(stagedPath) && fs.listStatus(stagedPath)
      .exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    if (!hasData) { dropStaged(); return None }
    // the task writers' commit messages name every published file —
    // audit them against the dir BEFORE publishing, so a lost partition
    // file (torn rename, external interference) fails the epoch loudly
    // instead of committing whatever the listing happens to show
    expectedFiles.foreach { f =>
      require(fs.exists(new Path(f)),
        s"epoch $epochId staged file missing before publish: $f — " +
          "failing the epoch so the engine can retry it")
    }
    try {
      val stagedDf = spark.read.parquet(s"$dir/$staged")
      retryOnConflict[Option[Int]](maxAttempts, onConflict = (_, _) =>
        // the race winner could be this very epoch's twin from a
        // concurrently-restarted run — re-probe before re-gating
        if (newestEpoch.exists(epochId <= _)) { dropStaged(); Some(None) }
        else None
      ) { _ =>
        val cur = currentHeaders(fs, dir)
        // streaming epochs stage FLAT (one parquet file per task, no
        // relayout pass inside an epoch's latency budget) — a
        // partitionBy sink refuses with its own message rather than
        // surfacing the gate's shape-mismatch wording
        cur.foreach { case (_, h) => require(!h.contains("partby"),
          "streaming appends cannot target a partitionBy layout — " +
            "epochs stage flat; sink to a flat table (or fold through " +
            "GraftTable.streamingSink, which writes through the API)") }
        dsv2WriteGate(spark, dir, schema, append = true)
        // a statenc/bloom-indexed sink chain extends per epoch — the
        // streamed versions stay band/Bloom-skippable (same
        // self-described, per-attempt derivation as the batch door)
        val (newStats, statsEncDecl, newBloom) =
          dsv2IndexExtension(spark, dir, staged, cur.map(_._2))
        val carried = carriedConstraints(cur)
        if (carried.nonEmpty)
          enforceConstraints(stagedDf, carried, "append",
            existing =
              if (carried.exists(_.startsWith("unique:")))
                cur.map { case (v, _) => readVersion(spark, dir, v) }
              else None)
        val v = cur.map(_._1 + 1).getOrElse(0)
        val prevDirs = cur.map { case (c, h) => dataDirsFrom(h, c, "v") }
          .getOrElse(Seq.empty)
        // re-verify the staged dir right before publish: a concurrent
        // vacuum racing a LONG-stalled commit (>10-min grace) could
        // have reclaimed it as an orphan, and committing a dangling
        // data= reference would poison every subsequent read
        require(fs.exists(stagedPath),
          s"staged epoch dir $staged vanished before publish " +
            "(concurrent vacuum?) — failing the epoch for engine retry")
        commit(fs, dir, v, s"epoch=$epochId;query=$queryId",
          prefix = "v",
          dataDir = Some((prevDirs :+ staged).mkString(",")),
          appendDir = if (cur.isDefined) Some(staged) else None,
          schema = Some(schemaEncode(schema)), prevTs = prevTsOf(cur),
          stats = newStats.map(mergeAppendStats(_, staged, cur, "v")),
          bloom = newBloom,
          statenc =
            if (statsEncDecl.isEmpty || newStats.isEmpty) None
            else Some(StatsEnc.encode(statsEncDecl)),
          constraintsHdr =
            if (carried.isEmpty) None else Some(constraintsEncode(carried)))
        Some(v)
      }
    } catch {
      case e: Throwable =>
        // a refused or exhausted publish must not leave staged files
        // where a reader could mistake them for data
        dropStaged()
        throw e
    }
  }

  /** The UPSERT half of the streaming write door (OutputMode.Update →
    * `SupportsStreamingUpdateAsAppend`): each epoch's staged rows are
    * the LATEST state per key — fold them into the table MERGE-ON-READ,
    * exactly like `commitUpdateImpl`: dir-scoped tombstones kill the
    * old images of the batch's keys, the staged dir appends as their
    * replacement, no base file is rewritten. Per-epoch WRITE cost is
    * O(batch + dv); the tombstone-scoping pass reads the chain's KEY
    * COLUMNS only (the semi-join plan below column-prunes the per-dir
    * scans down to the keys — never the full rows), so trigger latency
    * grows with key-column bytes, not table width; a full-width pass
    * happens only under a declared `unique:` constraint. A per-epoch
    * snapshot REWRITE would be O(table · width) each trigger — this
    * shape is what survives a 10⁵-epoch sink; `purgeDeleteVector` /
    * OPTIMIZE fold the accumulated chain back when wanted. Exactly-once
    * across restarts via the same (queryId, epoch) identity as the
    * append door. Refusals mirror the MoR update engine: partitionBy,
    * pmap and index-bearing heads refuse loudly (indexes cannot ride a
    * dv); a predecessor DV must be keyed by the SAME upsert keys. */
  /** The upsert door's shared refusal gate — run once by the write
    * builder BEFORE any distributed job (fail-early, like every write
    * door) and re-run per commit attempt with that attempt's headers
    * (the chain can change between epochs). */
  private[graft] def upsertWriteGate(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType, keyCols: Seq[String],
      curOpt: Option[(Int, Map[String, String])]): Unit = {
    require(keyCols.nonEmpty, "streaming upsert needs upsertKeys")
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"upsert key '$k' is not a column of the stream (${
        schema.fieldNames.toSeq})"))
    curOpt.foreach { case (_, h) =>
      schemaGate(h.get("schema"), schema, allowEvolution = false,
        context = "append")
      require(!h.contains("partby"),
        "streaming upsert cannot target a partitionBy layout — " +
          "a flat replacement dir beside a partitioned one makes " +
          "the union unreadable")
      require(!h.contains("pmap"),
        "this table is partition-mapped — upsert through " +
          "replacePartitionsWithRetry")
      require(!h.contains("colmap"),
        "a streaming upsert cannot target a renamed/dropped-column " +
          "head — rewrite via commitNextIsolated first")
      if (h.contains("stats") || h.contains("bloom"))
        throw new IndexRedeclarationRequired(
          "a streaming upsert cannot carry the table's skipping " +
            "index (its merge-on-read tombstones invalidate the " +
            "per-file statistics) — drop the index deliberately, " +
            "stream, then re-index with OPTIMIZE")
      h.get("dv").foreach { spec =>
        val prevKeys = spec.split(";", -1)(1).split(",").toSeq
        require(prevKeys == keyCols,
          s"the current version's deletion vector is keyed by " +
            s"$prevKeys but this upsert keys by $keyCols")
      }
    }
  }

  private[graft] def commitEpochUpsert(spark: SparkSession, dir: String,
      epochId: Long, staged: String,
      schema: org.apache.spark.sql.types.StructType,
      queryId: String, keyCols: Seq[String], maxAttempts: Int = 10,
      expectedFiles: Seq[String] = Nil): Option[Int] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val fs = fsOf(spark, dir)
    val stagedPath = new Path(s"$dir/$staged")
    require(keyCols.nonEmpty, "streaming upsert needs upsertKeys")
    require(keyCols.forall(c => !c.contains(",") && !c.contains(";")),
      s"key column names must not contain the dv= header delimiters: $keyCols")
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"upsert key '$k' is not a column of the stream (${
        schema.fieldNames.toSeq})"))
    def dropStaged(): Unit =
      try fs.delete(stagedPath, true)
      catch { case _: java.io.IOException => () }
    if (newestEpochFor(fs, dir, queryId).exists(epochId <= _)) {
      dropStaged(); return None
    }
    val hasData = fs.exists(stagedPath) && fs.listStatus(stagedPath)
      .exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    if (!hasData) { dropStaged(); return None }
    expectedFiles.foreach { f =>
      require(fs.exists(new Path(f)),
        s"epoch $epochId staged file missing before publish: $f — " +
          "failing the epoch so the engine can retry it")
    }
    try {
      retryOnConflict[Option[Int]](maxAttempts, onConflict = (_, _) =>
        // replay probe, as in the append door: the race winner could be
        // this epoch's twin from a concurrently-restarted run
        if (newestEpochFor(fs, dir, queryId).exists(epochId <= _)) {
          dropStaged(); Some(None)
        } else None
      ) { _ =>
        val cur = currentHeaders(fs, dir)
        // re-gated per attempt; the write builder runs the same gate
        // BEFORE the first distributed job (upsertWriteGate)
        upsertWriteGate(spark, dir, schema, keyCols, cur)
        val v = cur.map(_._1 + 1).getOrElse(0)
        require(fs.exists(stagedPath),
          s"staged epoch dir $staged vanished before publish " +
            "(concurrent vacuum?) — failing the epoch for engine retry")
        val batch = spark.read.schema(schema).parquet(s"$dir/$staged")
        cur match {
            case None =>
              // first epoch IS the table — a plain full version
              commit(fs, dir, v, s"epoch=$epochId;query=$queryId",
                prefix = "v", dataDir = Some(staged),
                schema = Some(schemaEncode(schema)), prevTs = prevTsOf(cur))
            case Some((c, hdrs)) =>
              import spark.implicits._
              val dataDirs = dataDirsFrom(hdrs, c, "v")
              val basenamesDf = dataDirs.map(dirBasename).toDF("__dir")
              val declared = declaredSchemaOf(hdrs)
              val withDir = dataDirs.map { dd =>
                (declared match {
                  case Some(st) => spark.read.schema(st).parquet(s"$dir/$dd")
                  case None => spark.read.parquet(s"$dir/$dd")
                }).withColumn("__gdir", lit(dirBasename(dd)))
              }.reduce(_ unionByName _)
              val prevTombs: Option[DataFrame] = hdrs.get("dv").map { sp =>
                val parts = sp.split(";", -1)
                val dvd = readDvSidecar(spark, s"$dir/${parts(0)}",
                  declared, keyCols, scoped = parts.length == 3,
                  colmapped = hdrs.contains("colmap"))
                if (parts.length == 3) dvd
                else dvd.crossJoin(basenamesDf)
              }
              val live = prevTombs.fold(withDir) { tb =>
                val tbR = tb.withColumnRenamed("__dir", "__gdir")
                withDir.join(broadcast(tbR),
                  (keyCols :+ "__gdir").map(k => withDir(k) <=> tbR(k))
                    .reduce(_ && _),
                  "left_anti")
              }
              // old images of the batch's keys die in THEIR dirs; the
              // staged dir (appended last) carries the replacements
              val batchKeys = batch.select(keyCols.map(col): _*).distinct()
              val matched = live.join(broadcast(batchKeys),
                keyCols.map(k => live(k) <=> batchKeys(k)).reduce(_ && _),
                "left_semi")
              val newTombs = matched
                .select((keyCols.map(col) :+ col("__gdir").as("__dir")): _*)
                .distinct()
              val fullTombs = prevTombs.fold(newTombs)(p =>
                p.select((keyCols :+ "__dir").map(col): _*)
                  .unionByName(newTombs).distinct())
              val dvDir =
                s"dv${v}_${java.util.UUID.randomUUID().toString.take(8)}"
              fullTombs.write.mode("errorifexists").parquet(s"$dir/$dvDir")
              val carried = carriedConstraints(cur)
              if (carried.nonEmpty)
                enforceConstraints(batch, carried, "append",
                  existing =
                    if (carried.exists(_.startsWith("unique:")))
                      // survivors after this epoch's tombstones — the
                      // uniqueness universe the batch inserts into
                      Some(live.join(broadcast(batchKeys),
                        keyCols.map(k =>
                          live(k) <=> batchKeys(k)).reduce(_ && _),
                        "left_anti").drop("__gdir"))
                    else None)
              commit(fs, dir, v, s"epoch=$epochId;query=$queryId",
                prefix = "v",
                dataDir = Some((dataDirs :+ staged).mkString(",")),
                dv = Some(s"$dvDir;${keyCols.mkString(",")};scoped"),
                updateDir = Some(staged),
                schema = hdrs.get("schema")
                  .orElse(Some(schemaEncode(schema))),
                prevTs = prevTsOf(cur),
                constraintsHdr = hdrs.get("constraints"))
          }
        Some(v)
      }
    } catch {
      case e: Throwable =>
        dropStaged()
        throw e
    }
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
      statsCols: StatsCols = Nil, checkpointEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, epochId) => {
        val s = batch.sparkSession
        commitEpoch(s, dir, epochId, retain, prefix, statsCols,
          checkpointEvery) {
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
    // full-history scan through the checkpoint when one exists (one
    // read + suffix), else per-file — ts headers are clamped monotone
    // by `commit`, so the max-version filter is a prefix test
    allCommitContents(fs, dir).filter { case (v, c) =>
      commitTimeFrom(parseCommit(c)._1, fs, dir, v) <= asOfMs
    }.map(_._1).maxOption

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
      prefix: String = "v", allowEvolution: Boolean = false): Int = {
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
    commitNextIsolated(spark, dir, df, metadata, retain, prefix,
      allowEvolution = allowEvolution)
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
    // referenced = every retained commit's data dirs AND deletion-vector
    // dir — a dv dir stays live as long as ANY commit names it (time
    // travel to a dv-bearing version still applies its tombstones); an
    // orphan dv dir (a race-losing commitDeleteVector's staging) is
    // reclaimable garbage like any other unreferenced staging dir
    // TOP-LEVEL granularity: a partition-mapped entry `<root>/__p=<v>`
    // must protect its root from the whole-dir delete below
    val parsed = committed.map(v =>
      (v, parseCommit(commitContent(fs, dir, v))))
    val referenced = parsed.flatMap { case (v, (hdrs, _)) =>
      (dataDirsFrom(hdrs, v, prefix) ++
        hdrs.get("dv").map(_.split(";", 2)(0)).toList ++
        hdrs.get("pdv").toList)
        .map(_.split('/').head)
    }.toSet
    // per-query newest committed streaming epoch, keyed by the query
    // tag the staging names carry — the in-flight test below
    val epochNewest: Map[String, Long] = parsed
      .flatMap { case (_, (_, md)) =>
        if (!md.startsWith("epoch=")) None
        else {
          val parts = md.stripPrefix("epoch=").split(";query=", 2)
          if (parts.length == 2)
            parts(0).toLongOption.map(e => (queryTag(parts(1)), e))
          else None
        }
      }
      .groupBy(_._1).map { case (t, es) => (t, es.map(_._2).max) }
    val reclaimed = fs.listStatus(new Path(dir)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        !referenced.contains(n) &&
          (dirVersion(n, prefix).exists(_ <= cur) ||
            dirVersion(n, "dv").exists(_ <= cur) ||
            dirVersion(n, "pdv").exists(_ <= cur)) &&
          // the grace age is the NEWEST FILE mtime anywhere under the
          // dir (recursive — a partitionBy staging dir nests its files
          // two levels down), not the dir's own: on object stores
          // directory mtimes are synthetic or zero, so a just-staged
          // in-flight writer's dir could look ancient and be yanked
          // despite the grace window. A file-less or unreadable dir
          // falls back to the dir entry's own mtime.
          (graceMs == 0L || newestMtimeUnder(fs, st) <= cutoff)
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
    // manifest-dir litter: a checkpoint() crash between fs.create of the
    // ._cptmp_<uuid> temp and its atomic rename leaks the temp (and its
    // .crc sidecar) forever — the version-named walk above never reaches
    // inside manifest/. Reclaim stale temps here, with the grace floored
    // at 10 minutes so an IN-FLIGHT checkpoint's temp (created seconds
    // ago) is never yanked between create and rename even under an
    // aggressive graceMs=0 vacuum.
    val tmpCutoff = System.currentTimeMillis() - math.max(graceMs, 600000L)
    val litter =
      try fs.listStatus(new Path(s"$dir/manifest")).toSeq
        .filter(st => st.getPath.getName.startsWith("._cptmp_") &&
          st.getModificationTime <= tmpCutoff)
        .map { st => fs.delete(st.getPath, false)
          s"manifest/${st.getPath.getName}" }
      catch { case _: java.io.IOException => Seq.empty }
    // Bloom-temp litter: a buildBloomSidecar attempt that crashed
    // between its temp create and the atomic rename (or a speculative
    // loser) leaks `._bloomtmp_<uuid>` inside a LIVE data dir —
    // invisible to scans (dot prefix) but garbage nonetheless, and the
    // version-named walk above never looks inside referenced dirs. Same
    // 10-minute floor as the checkpoint temps, so an in-flight build is
    // never yanked mid-publish.
    // streaming-epoch staging orphans: a crashed (or replay-discarded)
    // DSv2 streaming epoch leaves its `ep<id>_<qtag>-<run>` dir
    // unreferenced; the version-numbered walk above never matches the
    // `ep` prefix. 10-minute floor again — an IN-FLIGHT epoch stages
    // its files seconds before its commit publishes. Additionally, a
    // staged epoch AHEAD of its own query's newest committed epoch is
    // never reclaimed, HOWEVER old: its commit may still be in flight
    // (a stall past any grace window is indistinguishable from a slow
    // commit, and deleting the dir between commitEpochStaged's final
    // re-verify and the manifest publish would mint a dangling data=
    // entry). The moment the query commits that epoch — including after
    // a restart, queryIds being checkpoint-stable — the dir falls at or
    // behind the committed history and reclaims normally. A query that
    // dies before ITS FIRST commit leaks its staging until then: the
    // deliberate leak-over-data-loss trade. Tag-less legacy names keep
    // the plain grace rule.
    val epOrphans = fs.listStatus(new Path(dir)).toSeq
      .filter { st =>
        val n = st.getPath.getName
        val inflight = (dirVersion(n, "ep"), epStagingTag(n)) match {
          case (Some(e), Some(tag)) =>
            epochNewest.get(tag).forall(e > _)
          case _ => false
        }
        st.isDirectory && !referenced.contains(n) &&
          dirVersion(n, "ep").isDefined && !inflight &&
          // recursive newest-FILE mtime like the main walk — object
          // stores' synthetic dir mtimes would let an in-flight epoch's
          // staging look ancient and be yanked mid-write
          newestMtimeUnder(fs, st) <= tmpCutoff
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
    val bloomLitter =
      try referenced.toSeq.sorted.flatMap { dd =>
        val p = new Path(s"$dir/$dd")
        if (!fs.exists(p)) Seq.empty
        else fs.listStatus(p).toSeq
          .filter(st => st.getPath.getName.startsWith("._bloomtmp_") &&
            st.getModificationTime <= tmpCutoff)
          .map { st => fs.delete(st.getPath, false)
            s"$dd/${st.getPath.getName}" }
      } catch { case _: java.io.IOException => Seq.empty }
    reclaimed ++ litter ++ epOrphans ++ bloomLitter
  }

  /** NEWEST file mtime anywhere under a dir (recursive) — the vacuum
    * grace-age truth: on object stores directory mtimes are synthetic
    * or zero, so a just-staged in-flight writer's dir could look
    * ancient by its own entry. A file-less or unreadable dir falls back
    * to the dir entry's own mtime. */
  private def newestMtimeUnder(fs: FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Long =
    try {
      val it = fs.listFiles(st.getPath, true)
      var m = Long.MinValue
      while (it.hasNext) m = math.max(m, it.next().getModificationTime)
      if (m == Long.MinValue) st.getModificationTime else m
    } catch { case _: java.io.IOException => st.getModificationTime }

  /** TIME-BASED retention — the wall-clock companion of `commit`'s
    * count-based `retain`: reclaim the data (and dv) dirs of every
    * version whose commit instant (the ts= header, clamped monotone at
    * write) is older than `nowMs - retainMs` — EXCEPT the current
    * version, and except dirs a live (non-expired) version still
    * references: an append chain's early dirs stay as long as any live
    * successor lists them, exactly like count-based GC. Commit files
    * always remain (history is forever); `readVersion`/`readAsOf` on an
    * expired version keep failing loudly with the retention message.
    * `nowMs` is a parameter so retention horizons are testable against
    * back-dated histories. Returns the versions whose data was actually
    * reclaimed (an expired version fully shadowed by live references
    * stays readable and is not reported). */
  def expireVersions(fs: FileSystem, dir: String, retainMs: Long,
      nowMs: Long = System.currentTimeMillis(),
      prefix: String = "v"): Seq[Int] =
    currentVersion(fs, dir) match {
      case None => Seq.empty
      case Some(cur) =>
        val cutoff = nowMs - retainMs
        // checkpoint-resolved walk: commit(retainMs=) runs this after
        // EVERY commit, so on a long checkpointed history the headers
        // must come from one checkpoint read + the suffix, not
        // O(versions) per-file opens
        val all = commitContentsUpTo(fs, dir, cur).map { case (v, c) =>
          val hdrs = parseCommit(c)._1
          (v, hdrs, commitTimeFrom(hdrs, fs, dir, v))
        }
        def refs(v: Int, hdrs: Map[String, String]): Seq[String] =
          dataDirsFrom(hdrs, v, prefix) ++
            hdrs.get("dv").map(_.split(";", 2)(0)).toList ++
            hdrs.get("pdv").toList
        val expired = all.filter { case (v, _, ts) => v != cur && ts < cutoff }
        val expiredSet = expired.map(_._1).toSet
        val keep = all.collect {
          case (v, h, _) if !expiredSet.contains(v) => refs(v, h)
        }.flatten.toSet
        // only dirs still PRESENT count — a re-run over an already
        // expired history is a no-op, not a re-report (idempotent
        // maintenance, like vacuum)
        val doomed = expired.flatMap { case (v, h, _) => refs(v, h) }
          .distinct.filterNot(keep)
          .filter(d => fs.exists(new Path(s"$dir/$d")))
        doomed.foreach(d => fs.delete(new Path(s"$dir/$d"), true))
        val doomedSet = doomed.toSet
        expired.collect {
          case (v, h, _) if refs(v, h).exists(doomedSet) => v
        }
    }

  // ---- change-data feed ---------------------------------------------------

  /** CDC delta of committed version `v`: the rows `v` ADDED relative to
    * `v - 1` (multiset semantics via exceptAll, so duplicate rows that
    * gained a copy are reported once per gained copy). Version 0's delta
    * is its full content.
    *
    * APPEND fast path: a version committed through `commitAppend*`
    * carries an append= marker naming the one dir it added, and its
    * delta is exactly that dir's contents — a plain scan of the NEW
    * files, no exchange, no read of the previous snapshot (the multiset
    * identity is structural: v's file set = v-1's ⊎ the marker dir, and
    * append versions never carry a dv, so cur.exceptAll(prev) ≡ the
    * marker dir row-for-row). Every other version pays the general
    * path: one hash-partitioned shuffle of the two snapshots. At 10⁵
    * append commits this is what turns a `cdcSubscribe` consumer from
    * O(2 × snapshot) per version into O(files added). */
  def versionDelta(spark: SparkSession, dir: String, v: Int,
      prefix: String = "v"): DataFrame = {
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    val hdrs = parseCommit(commitContent(fs, dir, v))._1
    hdrs.get("append").filter(_ => v > 0) match {
      case Some(added) =>
        require(fs.exists(new Path(s"$dir/$added")),
          s"version $v's data has been garbage-collected (retention)")
        spark.read.parquet(s"$dir/$added")
      case None =>
        val cur = readVersion(spark, dir, v, prefix)
        if (v == 0) cur
        else cur.exceptAll(readVersion(spark, dir, v - 1, prefix))
    }
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
  def commitFeed(spark: SparkSession, dir: String,
      maxVersionsPerTrigger: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxVersionsPerTrigger >= 1,
      s"maxVersionsPerTrigger must be >= 1 (got $maxVersionsPerTrigger)")
    spark.readStream
      // RATE CONTROL: at most this many commits per micro-batch (one
      // commit = one manifest file, so the file-source limit IS the
      // version limit). The default keeps the one-version-per-batch
      // contract subscribers see boundaries by; a BACKLOGGED consumer
      // raises it to catch up in bounded batches instead of one
      // version at a time — Delta's maxFilesPerTrigger surface. The
      // checkpointed processed-files log keeps delivery exactly-once
      // across restarts at ANY setting, mid-backlog included.
      .option("maxFilesPerTrigger", maxVersionsPerTrigger)
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
      prefix: String = "v", maxVersionsPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
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
    commitFeed(spark, dir, maxVersionsPerTrigger).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(fn)
      .start()
  }

  // ---- per-file Bloom index (point-lookup skipping) -------------------------

  /** Sidecar file name inside a data dir. The underscore prefix is
    * load-bearing: Spark's file sources skip `_`/`.`-prefixed files, so
    * the sidecar is invisible to every parquet scan of the dir. */
  private[graft] val bloomSidecarName = "_bloom"

  /** A version's per-file Bloom index on one column: `m` bits and `k`
    * probe positions per file, bits packed into longs. Min/max bands
    * prune RANGES; on an unclustered high-cardinality key an equality
    * probe overlaps every file's [min,max] and the stats line prunes
    * nothing — the Bloom index is the point-lookup lever: a file whose
    * k probed bits are not all set provably does not contain the value
    * and is skipped without being listed or opened. False positives
    * only ever OPEN an extra file; the row-level predicate still
    * decides membership, so results never depend on the index. */
  final case class TableBloom(col: String, m: Int, k: Int,
      files: Seq[(String, Array[Long])]) {
    /** Files that MIGHT contain a value probing at `positions` — the
      * equality read set. A file missing any probed bit is skipped. */
    def mightContain(positions: Seq[Int]): Seq[String] =
      files.collect {
        case (f, bits) if positions.forall(p => (bits(p >> 6) >>> (p & 63) & 1L) == 1L) => f
      }
    def encoded: String =
      s"${urlEnc(col)}|$m|$k\n" + files.map { case (f, bits) =>
        s"${urlEnc(f)}|${bits.map(l => f"$l%016x").mkString}"
      }.mkString("\n")
  }

  private[graft] object TableBloom {
    /** Parse a sidecar: one SECTION per indexed column (a header line
      * `col|m|k` followed by its file lines `file|hex`). The
      * single-section form is the round-13 format unchanged, so old
      * sidecars read back as a one-element result. */
    def decodeAll(s: String): Seq[TableBloom] = {
      val lines = s.split("\n", -1).filter(_.nonEmpty)
      val sections = collection.mutable.ArrayBuffer.empty[TableBloom]
      var i = 0
      while (i < lines.length) {
        val Array(c, mS, kS) = lines(i).split('|')
        i += 1
        val files = collection.mutable.ArrayBuffer.empty[(String, Array[Long])]
        while (i < lines.length && lines(i).split('|').length == 2) {
          val Array(f, hex) = lines(i).split('|')
          files += ((urlDec(f), hex.grouped(16)
            .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray))
          i += 1
        }
        sections += TableBloom(urlDec(c), mS.toInt, kS.toInt, files.toSeq)
      }
      sections.toSeq
    }

    def decode(s: String): TableBloom = decodeAll(s).head
  }

  /** The k probe positions of `value` in an m-bit filter — evaluated
    * with the SAME hash the distributed build uses (Catalyst's XxHash64
    * over (value, seed_ordinal) at Spark's fixed seed), so a driver-side
    * probe and an executor-side build can never disagree. `value` must
    * be the Spark-runtime type of the indexed column (Long for a bigint
    * column, String for a string one): xxhash64 hashes type-tagged
    * bytes, and an Int probe of a bigint column would hash differently
    * and miss. */
  private[graft] def bloomPositions(value: Any, m: Int, k: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    (1 to k).map { s =>
      val h = XxHash64(Seq(Literal(value), Literal(s)), 42L)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Long]
      (((h % m) + m) % m).toInt // pmod, matching the build expression
    }
  }

  /** Hadoop Configuration that survives a task closure — the standard
    * write-the-props pattern (Configuration itself is not
    * serializable). */
  private[graft] class SerializableHadoopConf(
      @transient var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** Distributed Bloom build with an EXECUTOR-SIDE sidecar write: ONE
    * pass over the just-written files per indexed column — per row, k
    * probe positions from `xxhash64(col, seed)`; per (file, word) a
    * `bit_or` of the shifted bits; per file a sorted sparse word list —
    * and the sidecar streams out of the final single task directly.
    * The DRIVER never materializes a word row: at 10⁴ files × m=2²⁴
    * the former collect() held gigabytes of filter words in driver
    * memory for the initial load; here the driver handles only the
    * file-NAME list (for the all-null-file entries) and the returned
    * per-column (col, m, k) metadata that goes into the bloom= header.
    *
    * Multi-column: one pass and one sidecar SECTION per column (see
    * `TableBloom.decodeAll`), so a table can serve point lookups on
    * several keys. `m` is sized per column from the LARGEST file's row
    * count at ~12 bits/key (k=4 → ~0.6% false positives) — one skewed
    * file would otherwise saturate toward opening everything. Nulls
    * probe nothing; an all-null file gets an empty filter every probe
    * correctly skips. */
  private def buildBloomSidecar(spark: SparkSession, dataPath: String,
      bloomCols: Seq[String], bitsPerKey: Int = 12, k: Int = 4)
      : Seq[(String, Int, Int)] = {
    import org.apache.spark.sql.functions._
    require(bloomCols.nonEmpty)
    val df = spark.read.parquet(dataPath)
    val dataName = new Path(dataPath).getName
    val relFile = regexp_replace(input_file_name(),
      "^.*?/" + java.util.regex.Pattern.quote(dataName) + "/", "")
    // one cheap column-pruned counting pass, shared by every column
    val rowsPerFile = math.max(1L,
      df.groupBy(relFile.as("__f")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)) // 1 row
    val m = math.min(1L << 24,
      math.max(1024L, ((rowsPerFile * bitsPerKey + 63) / 64) * 64)).toInt
    // complete file list — NAMES only (a file with no non-null value
    // still gets its correctly-empty entry), never filter words
    val relPattern = ("^.*?/" +
      java.util.regex.Pattern.quote(dataName) + "/").r
    val allFiles = df.inputFiles.toSeq
      .map(u => relPattern.replaceFirstIn(u, "")).sorted
    import spark.implicits._
    val filesDf = allFiles.toDF("__file")
    // per (column, file): the sorted sparse (word, bits) list — built
    // distributed, UNIONED across columns, never collected
    val perCol = bloomCols.zipWithIndex.map { case (c, ci) =>
      val words = df.select(relFile.as("__file"), col(c).as("__x"))
        .where(col("__x").isNotNull)
        .select(col("__file"), explode(array((1 to k).map(s =>
          pmod(xxhash64(col("__x"), lit(s)), lit(m.toLong))): _*)).as("__p"))
        .groupBy(col("__file"), (col("__p") / 64).cast("int").as("__w"))
        .agg(expr("bit_or(shiftleft(1L, cast(__p % 64 as int)))").as("__bits"))
        .groupBy(col("__file"))
        .agg(sort_array(collect_list(struct(col("__w"), col("__bits"))))
          .as("__ws"))
      filesDf.join(words, Seq("__file"), "left")
        .select(lit(ci).as("__ci"), col("__file"), col("__ws"))
    }.reduce(_ unionByName _)
    // qualify the target on the DRIVER (the task needs no default-FS
    // context), ship the conf the standard serializable way
    val sidecar = new Path(s"$dataPath/$bloomSidecarName")
    val target = sidecar
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(sidecar)
    val confSer =
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val colsEnc = bloomCols.map(urlEnc)
    val (mL, kL) = (m, k)
    // ONE writing task, rows streaming through in section order — the
    // sidecar is written where the words live, not where the driver is
    perCol.repartition(1).sortWithinPartitions(col("__ci"), col("__file"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val fs = target.getFileSystem(confSer.conf)
        // ATOMIC publish: stream into an attempt-unique temp, then
        // rename into place. The former `fs.create(target, true)` wrote
        // the landing path directly, so a task retry or speculative
        // duplicate racing the winner — or any reader arriving inside
        // the write window — could observe a TRUNCATED sidecar, whose
        // missing file lines decode as Bloom false negatives that
        // silently drop rows from pruned reads. With temp + rename,
        // attempts never interleave (each owns its temp), the rename is
        // all-or-nothing, and last-complete-writer-wins is correct
        // because every attempt writes identical bytes.
        val tmp = new Path(target.getParent,
          s"._bloomtmp_${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          out, java.nio.charset.StandardCharsets.UTF_8), 1 << 20)
        try {
          var curCi = -1
          it.foreach { r =>
            val ci = r.getAs[Int]("__ci")
            if (ci != curCi) {
              w.write(s"${colsEnc(ci)}|$mL|$kL\n"); curCi = ci
            }
            val bits = new Array[Long](mL / 64)
            val ws = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("__ws")
            if (ws != null) ws.foreach { wr =>
              bits(wr.getAs[Int](0)) = wr.getAs[Long](1)
            }
            w.write(urlEnc(r.getAs[String]("__file")))
            w.write('|')
            bits.foreach(l => w.write(f"$l%016x"))
            w.write('\n')
          }
        } finally w.close()
        replaceAtomic(fs, tmp, target)
      }
    // POST-BUILD READ-BACK GATE: decode the published sidecar and
    // require exactly the expected shape — one section per indexed
    // column in declaration order, every data file present in every
    // section, full-width bit arrays — BEFORE the caller mints a
    // version whose bloom= header would vouch for it. An incomplete or
    // torn sidecar is the one defect the probe path cannot detect (a
    // missing file line reads as "provably absent" = a silent false
    // negative), so it must be impossible to commit one.
    auditBloomSidecar(
      target.getFileSystem(spark.sparkContext.hadoopConfiguration),
      target, bloomCols, m, k, allFiles.toSet)
    bloomCols.map(c => (c, m, k))
  }

  /** The read-back audit itself: decode the published sidecar and
    * require exactly the expected shape, throwing (so no version mints)
    * on any deviation. Factored out of `buildBloomSidecar` so the
    * torn-file refusals are directly testable. */
  private[graft] def auditBloomSidecar(fs: FileSystem, target: Path,
      bloomCols: Seq[String], m: Int, k: Int,
      expectFiles: Set[String]): Unit = {
    val decoded = TableBloom.decodeAll(readSmallFile(fs, target))
    require(decoded.map(_.col) == bloomCols,
      s"bloom sidecar read-back: decoded sections ${decoded.map(_.col)} " +
        s"!= declared columns $bloomCols — refusing to publish a " +
        "version over an incomplete sidecar")
    decoded.foreach { tb =>
      require(tb.m == m && tb.k == k,
        s"bloom sidecar read-back: section '${tb.col}' decoded " +
          s"(m=${tb.m}, k=${tb.k}), expected (m=$m, k=$k)")
      val got = tb.files.map(_._1)
      require(got.size == expectFiles.size && got.toSet == expectFiles,
        s"bloom sidecar read-back: section '${tb.col}' covers " +
          s"${got.size} of ${expectFiles.size} data files " +
          s"(missing: ${(expectFiles -- got.toSet).take(3).mkString(", ")}…)" +
          " — a missing line would be a silent false negative")
      require(tb.files.forall(_._2.length == m / 64),
        s"bloom sidecar read-back: section '${tb.col}' has a " +
          "short-width bit array (truncated hex line)")
    }
  }

  /** The bloom= header value for just-built sidecar sections. */
  private def bloomHeader(metas: Seq[(String, Int, Int)]): String =
    metas.map { case (c, m, k) => s"${urlEnc(c)}|$m|$k" }.mkString(";")

  /** Indexed column names recorded in a bloom= header (one `col|m|k`
    * section per column, ;-joined). */
  private[graft] def bloomColsOf(header: String): Seq[String] =
    header.split(";").toSeq.map(sec => urlDec(sec.split('|')(0)))

  /** Point-lookup read through the Bloom index: resolve version `v`'s
    * files that might contain `col = value` from the sidecars and read
    * exactly those — skipped files are never listed or opened. An
    * APPEND chain is probed dir by dir (every chain dir carries its own
    * self-described sidecar — the append gate guarantees it — so the
    * per-dir filters stay sized to their own files and an old dir's
    * index is never rebuilt by a new append). Returns (DataFrame over
    * candidate files, paths read, total files) like `readStatsBands`;
    * the caller re-applies the equality row-level (file granularity
    * admits false positives, never false negatives). An empty candidate
    * set — the common case probing for an absent key, and the whole
    * point at 10⁵ files — reads NOTHING. */
  def readBloomEq(spark: SparkSession, dir: String, v: Int, col: String,
      value: Any, prefix: String = "v"): (DataFrame, Seq[String], Int) = {
    val fs = fsOf(spark, dir)
    val (perDir, dataDirs) = perDirBlooms(fs, dir, v, prefix)
    val sections = perDir.map { case (dd, tbs) =>
      (dd, tbs.find(_.col == col).getOrElse(sys.error(
        s"chain dir $dd carries Bloom sections on " +
          s"${tbs.map(_.col)}, not '$col'")))
    }
    val hit = sections.flatMap { case (dd, tb) =>
      tb.mightContain(bloomPositions(value, tb.m, tb.k))
        .map(f => s"$dir/$dd/$f")
    }
    val total = sections.map(_._2.files.size).sum
    val df =
      if (hit.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          readVersion(spark, dir, v, prefix).schema)
      else if (dataDirs.size == 1)
        // anchor partition discovery to the one dir (partitionBy
        // layouts need the ancestor basePath to keep their partition
        // columns); works for `../src/…` clone references too — the
        // anchor shares the files' own prefix
        spark.read.option("basePath", s"$dir/${dataDirs.head}")
          .parquet(hit: _*)
      else
        // append chains are FLAT by construction (the append gate
        // refuses partitionBy predecessors), so no basePath is needed —
        // and none would be an ancestor of a cloned chain's re-pointed
        // `../src/…` dirs
        spark.read.parquet(hit: _*)
    (df, hit, total)
  }

  /** Version `v`'s Bloom sidecars, one per chain dir, resolved through
    * the manifest with the same loud failures every reader gives: a
    * never-committed version, an unindexed commit, and a
    * retention-expired chain dir each name their cause (a raw sidecar
    * FileNotFoundException would point at a path, not at retention).
    * Shared by the probe (`readBloomEq`) and the audit (`bloomTable`)
    * so their resolution can never diverge. */
  private[graft] def perDirBlooms(fs: FileSystem, dir: String, v: Int,
      prefix: String): (Seq[(String, Seq[TableBloom])], Seq[String]) = {
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    val hdrs = parseCommit(commitContent(fs, dir, v))._1
    require(hdrs.contains("bloom"),
      s"version $v of $dir carries no Bloom index in its commit")
    val dataDirs = dataDirsFrom(hdrs, v, prefix)
    val perDir = dataDirs.map { dd =>
      require(fs.exists(new Path(s"$dir/$dd")),
        s"version $v's data dir $dd has been garbage-collected (retention)")
      (dd, TableBloom.decodeAll(
        readSmallFile(fs, new Path(s"$dir/$dd/$bloomSidecarName"))))
    }
    (perDir, dataDirs)
  }

  /** The Bloom index as a RELATION — one row per indexed file (chain
    * dirs included): (dir_name, file, col, m, k, bits_set, saturation).
    * The observability surface `graft_stats` gives the min/max index:
    * saturation approaching 1.0 means the filter has degraded toward
    * opening everything and the table wants a re-indexing compaction.
    * Resolved from the manifest + sidecars alone — no data file is
    * listed or opened. Served to SQL as `graft_bloom('<dir>', v)`. */
  def bloomTable(spark: SparkSession, dir: String, v: Int,
      prefix: String = "v"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val fs = fsOf(spark, dir)
    val rows = perDirBlooms(fs, dir, v, prefix)._1.flatMap {
      case (dd, tbs) => tbs.flatMap { tb =>
        tb.files.map { case (f, bits) =>
          val set = bits.map(java.lang.Long.bitCount).sum
          (dd, f, tb.col, tb.m, tb.k, set, set.toDouble / tb.m)
        }
      }
    }
    import spark.implicits._
    rows.toDF("dir_name", "file", "col", "m", "k", "bits_set", "saturation")
      .orderBy(col("dir_name"), col("file"), col("col"))
  }

  // ---- chain compaction (OPTIMIZE) ------------------------------------------

  /** Compact the CURRENT version into a single fresh data dir of at
    * most `targetFiles` files, committed as the next version — the
    * OPTIMIZE half of the append trade: `commitAppend` keeps the write
    * path O(new data) but each append adds a dir, and a 10⁵-append
    * chain pays per-dir listing + per-small-file open on every read.
    * Compaction folds the chain back to one dir; the rewrite is
    * `coalesce` (a NARROW dependency — no shuffle: files merge within
    * partitions, the right plan when the goal is fewer files, not a new
    * distribution). Predecessor versions keep serving unchanged (their
    * dirs are untouched), so time travel works across the compaction
    * boundary, and once retention ages them out the old chain dirs are
    * reclaimable. A deletion vector on the predecessor is APPLIED by
    * the rewrite — compaction doubles as the purge, and the compacted
    * commit carries no dv. The skipping indexes are NOT silently
    * dropped: compacting a stats-bearing (or Bloom-indexed) version
    * requires re-declaring `statsCols` (`bloomCol`) — same contract as
    * the append gate — because index ordinals are code, not headers,
    * and a fresh layout needs freshly computed file ranges anyway.
    * A partitionBy layout compacts to ONE file per partition value —
    * the snapshot is hash-repartitioned on the partition columns so
    * each value's rows land in a single task (the per-partition
    * bin-pack OPTIMIZE does); `targetFiles` is the flat-layout knob
    * and is not consulted under partitionBy. Declared constraints carry
    * through (the rewrite re-enforces them — one extra pass; a rewrite
    * of already-valid rows always passes). */
  def compactChain(spark: SparkSession, dir: String, targetFiles: Int = 1,
      metadata: String = "compact", prefix: String = "v",
      statsCols: StatsCols = Nil, bloomCol: Option[String] = None,
      clusterBy: StatsCols = Nil,
      statsEnc: Seq[(String, String)] = Nil,
      bloomCols: Seq[String] = Nil): Int = {
    require(targetFiles >= 1, s"targetFiles must be >= 1 (got $targetFiles)")
    val fs = fsOf(spark, dir)
    val (c, h) = currentHeaders(fs, dir).getOrElse(sys.error(
      s"nothing to compact: no version committed under $dir"))
    if (h.contains("stats") && statsCols.isEmpty && statsEnc.isEmpty)
      throw new IndexRedeclarationRequired(
        "compacting a stats-bearing table without statsCols would " +
          "silently drop the skipping index for the rewritten layout — " +
          "re-declare the stat columns (or rewrite via " +
          "commitNextIsolated to drop stats deliberately)")
    if (h.contains("bloom") && bloomCol.isEmpty && bloomCols.isEmpty)
      throw new IndexRedeclarationRequired(
        "compacting a Bloom-indexed table without bloomCol would " +
          "silently drop the point-lookup index — re-declare the " +
          "indexed column (or rewrite via commitNextIsolated)")
    val partBy = h.get("partby").map(_.split(",").toSeq).getOrElse(Nil)
    // a declared within-file sort (sortw=) is PRESERVED: the rewrite
    // routes through commitNextIsolated's sortWithin reshape (one task
    // per partition value, rows re-sorted inside), so the compacted
    // layout re-earns the header instead of silently losing the
    // ordering-aware SPJ tier — a compaction that degraded the read
    // plan would betray what OPTIMIZE is for
    val sortW = h.get("sortw").map(_.split(",").toSeq).getOrElse(Nil)
    val snap = readVersion(spark, dir, c, prefix)
    val compacted =
      if (clusterBy.nonEmpty) {
        require(partBy.isEmpty, "clustered compaction applies to flat " +
          "layouts — a partitionBy table is already dir-clustered on " +
          "its partition columns")
        clusteredLayout(spark, snap, clusterBy, targetFiles)
      }
      else if (partBy.isEmpty) snap.coalesce(targetFiles)
      // sortw layouts: commitNextIsolated(sortWithin) does its own
      // repartition + in-task sort — pre-shaping here would be a
      // second redundant exchange
      else if (sortW.nonEmpty) snap
      // hash-repartition on the partition columns: every partition
      // value's rows reach one task, so each partition dir gets exactly
      // one file — without this the rewrite would fan each value across
      // every read task and could WIDEN the layout it claims to compact
      else snap.repartition(partBy.map(org.apache.spark.sql.functions.col): _*)
    commitNextIsolated(spark, dir, compacted, metadata, prefix = prefix,
      partitionBy = partBy, statsCols = statsCols, bloomCol = bloomCol,
      statsEnc = statsEnc, bloomCols = bloomCols,
      // a compaction rewrites the same rows: the bucket declaration
      // carries through and commitNextIsolated re-validates it
      bucketFn = bucketFnOf(h).map { case (n, k, _) => (n, k) },
      sortWithin = sortW)
  }

  /** OPTIMIZE ZORDER BY — the clustering rewrite `compactChain` applies
    * when `clusterBy` names 1 or 2 long-ordinal dimensions (the same
    * `StatsCols` encoding the skipping index declares, so the clustered
    * dimensions and the statted ones compose naturally). Each ordinal
    * is range-normalized to 16 bits from its OBSERVED min/max (one
    * 1-row aggregate — production z-order's range normalization, which
    * keeps a wide dimension from monopolizing the interleave's high
    * bits); two dimensions Morton-interleave bit by bit. The rewrite
    * then range-partitions into `targetFiles` z-runs and sorts within
    * each — ONE shuffle, paid deliberately: an append chain's
    * arrival-order files have full-width min/max rectangles that skip
    * nothing, and re-clustering is what makes the manifest's per-file
    * stats tight again. Nulls order first (ordinal 0). The bucket-width
    * division (never a multiply) cannot overflow epoch-micro ordinals. */
  private def clusteredLayout(spark: SparkSession, snap: DataFrame,
      clusterBy: StatsCols, targetFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(clusterBy.size <= 2,
      s"clusterBy supports 1 or 2 dimensions (got ${clusterBy.size}) — " +
        "a Morton interleave beyond 2 needs wider keys than the 16-bit " +
        "normalization provides")
    val ords = clusterBy.map { case (n, f) =>
      f(col(n)).cast(org.apache.spark.sql.types.LongType) }
    val aggs = ords.zipWithIndex.flatMap { case (o, i) =>
      Seq(min(o).as(s"__lo$i"), max(o).as(s"__hi$i")) }
    val r = snap.agg(aggs.head, aggs.tail: _*).collect()(0) // 1 row
    // INTEGER bucket math end-to-end: Column `/` is double division,
    // which above ~2^53 mis-normalizes the z-key and can round the top
    // boundary to 65536 (a bit morton16 drops). IntegralDivide keeps the
    // whole computation in the long domain; the bucket width is computed
    // in BigInt so hi-lo can never overflow (the result always fits: it
    // is at most 2^64/65536 + 1).
    def idiv(a: org.apache.spark.sql.Column,
        b: Long): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.graft.GraftSqlBridge
      GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          GraftSqlBridge.expression(a), GraftSqlBridge.expression(lit(b))))
    }
    val scaled = ords.zipWithIndex.map { case (o, i) =>
      val lo = if (r.isNullAt(2 * i)) 0L else r.getLong(2 * i)
      val hi = if (r.isNullAt(2 * i + 1)) lo else r.getLong(2 * i + 1)
      val span = BigInt(hi) - BigInt(lo)
      val bucket = ((span / 65536) + 1).max(1).toLong
      val z =
        if (span <= BigInt(Long.MaxValue))
          // o - lo fits a long (o ∈ [lo, hi]); integer division then
          // guarantees the result lands in [0, 65535] exactly
          coalesce(idiv(o - lit(lo), bucket), lit(0L))
        else
          // the observed span itself overflows a long: shift AFTER the
          // divide — each term fits, truncating division is monotone so
          // ordering is preserved, and the index is off by at most one
          // bucket (clamped below 65536; layout quality is the only
          // stake — query results never depend on the z-key)
          least(coalesce(idiv(o, bucket) - lit(lo / bucket), lit(0L)),
            lit(65535L))
      z.cast(org.apache.spark.sql.types.LongType)
    }
    val z =
      if (scaled.size == 1) scaled.head
      else graft.T.morton16(scaled(0), scaled(1))
    snap.withColumn("__graft_z", z)
      .repartitionByRange(targetFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** INCREMENTAL re-clustering — the liquid tier of OPTIMIZE: fold (and
    * optionally z-order) ONLY the chain's arrival-order TAIL, leaving
    * the clustered head dir byte-identical. A full `compactChain` costs
    * O(table) however little arrived since the last pass; this costs
    * O(new data): the head — typically the last full OPTIMIZE's output,
    * already tight in the clustered dimensions — is re-referenced
    * verbatim (its stats entries and Bloom sidecar ride along
    * untouched), while the tail dirs' arrival-order files, whose
    * full-width rectangles skip nothing, are rewritten into
    * `targetFiles` clustered files with freshly computed stats.
    *
    * The commit shape is new: multiple data dirs with ONE spanning
    * table-relative stats line and NO append marker (CDC must not
    * re-emit rewritten rows as inserts) — flagged statrel=1 for the
    * stats-serving readers. Index redeclaration contracts match
    * `compactChain` (stats/Bloom must be re-declared, not silently
    * dropped); the head keeps serving its own sidecar, the folded tail
    * gets a fresh one. Declared constraints carry WITHOUT re-running:
    * the fold is row-preserving, and notnull/check/unique are all
    * invariant under a row-preserving rewrite. Predecessor versions
    * keep serving (their dirs are untouched); once retention ages them
    * out, the old tail dirs are reclaimable. Returns the version. */
  def compactChainTail(spark: SparkSession, dir: String,
      targetFiles: Int = 1, metadata: String = "compact tail",
      prefix: String = "v", statsCols: StatsCols = Nil,
      bloomCol: Option[String] = None, clusterBy: StatsCols = Nil,
      statsEnc: Seq[(String, String)] = Nil,
      bloomCols: Seq[String] = Nil): Int = {
    require(targetFiles >= 1, s"targetFiles must be >= 1 (got $targetFiles)")
    val fs = fsOf(spark, dir)
    val (c, h) = currentHeaders(fs, dir).getOrElse(sys.error(
      s"nothing to compact: no version committed under $dir"))
    require(!h.contains("dv"),
      "cannot tail-compact a version carrying a deletion vector — the " +
        "tombstones span the whole chain; purge first (or compactChain, " +
        "which applies them)")
    require(!h.contains("pdv"),
      "cannot tail-compact a version carrying a positional deletion " +
        "vector — positions pin files the fold would rewrite; " +
        "purgePositionalDv first (or compactChain, which applies them)")
    require(!h.contains("partby"),
      "tail compaction applies to flat chains — a partitionBy layout " +
        "is already dir-clustered")
    require(!h.contains("pmap"),
      "this table is partition-mapped — its entry dirs ARE the layout " +
        "(folding them would drop the value→dir map); re-cluster a " +
        "partition by replacing it through replacePartitionsWithRetry")
    val dirs = dataDirsFrom(h, c, prefix)
    require(dirs.size >= 2,
      s"version $c has no tail to fold (${dirs.size} data dir)")
    val (head, tail) = (dirs.head, dirs.tail)
    if (h.contains("stats") && statsCols.isEmpty && statsEnc.isEmpty)
      throw new IndexRedeclarationRequired(
        "tail-compacting a stats-bearing table without statsCols/" +
          "statsEnc would silently drop the folded files' skipping " +
          "index — re-declare the stat columns")
    val effBloom = (bloomCol.toSeq ++ bloomCols).distinct
    if (h.contains("bloom") && effBloom.isEmpty)
      throw new IndexRedeclarationRequired(
        "tail-compacting a Bloom-indexed table without bloomCol would " +
          "leave the folded dir unprobeable — re-declare the indexed " +
          "columns")
    require(effBloom.isEmpty || h.contains("bloom"),
      "bloomCol on a chain whose head carries no sidecar would leave " +
        "the head unprobeable — index via compactChain instead")
    // the folded dir must carry sections on the SAME column set as the
    // untouched head — a shrunken set would silently blind point
    // lookups on the dropped column (the append gate's invariant)
    h.get("bloom").map(b => bloomColsOf(b).toSet).foreach { theirs =>
      require(theirs == effBloom.toSet,
        s"tail compaction bloom columns ${effBloom.toSet} must match " +
          s"the chain's indexed set $theirs — every chain dir is " +
          "probed on every section")
    }
    // ENCODING continuity for the carried head entries: they were
    // computed under the predecessor's statenc — the declaration here
    // must be IDENTICAL for the spanning line to stay one ordinal
    // domain (and a lambda-statted chain cannot gain a statenc claim:
    // its head entries' encoding is unverifiable — re-encode through
    // compactChain, which recomputes every file)
    val prevEnc = h.get("statenc").map(StatsEnc.decode(_).toMap)
      .getOrElse(Map.empty[String, String])
    require(prevEnc == statsEnc.toMap,
      s"tail compaction statsEnc ${statsEnc.toMap} must match the " +
        s"chain's recorded statenc $prevEnc — the head's carried " +
        "entries keep their ordinal domain; re-encode via compactChain")
    val effStats: StatsCols =
      StatsEnc.validateAndMerge(spark, statsCols, statsEnc)

    val tailDf = spark.read.parquet(tail.map(d => s"$dir/$d"): _*)
    val folded =
      if (clusterBy.nonEmpty) clusteredLayout(spark, tailDf, clusterBy,
        targetFiles)
      else tailDf.coalesce(targetFiles)
    val v = c + 1
    val tDir = s"$prefix${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    folded.write.mode("errorifexists").parquet(s"$dir/$tDir")

    // spanning stats: the head's entries carry over UNREAD (their files
    // are untouched — that is the whole point); the folded dir's are
    // computed fresh and re-keyed table-relative
    val mergedStats = if (effStats.isEmpty) None else {
      val fresh = computeStats(spark, s"$dir/$tDir", effStats)
      val mine = fresh.files.map(f => f.copy(file = s"$tDir/${f.file}"))
      val prev = TableStats.decode(h.getOrElse("stats", sys.error(
        "tail compaction with statsCols requires predecessor stats — " +
          "the head's entries carry over unread")))
      require(prev.cols == fresh.cols,
        s"statsCols ${fresh.cols} must match the table's recorded " +
          s"stat columns ${prev.cols}")
      // predecessor keys are table-relative (append chains and statrel
      // commits both are — the only shapes with a tail to fold)
      val headEntries = prev.files.filter(_.file.startsWith(s"$head/"))
      Some(TableStats(fresh.cols, headEntries ++ mine))
    }
    val bl =
      if (effBloom.isEmpty) None
      else Some(bloomHeader(buildBloomSidecar(spark, s"$dir/$tDir",
        effBloom)))
    commit(fs, dir, v, metadata, prefix = prefix,
      dataDir = Some(s"$head,$tDir"), stats = mergedStats,
      schema = h.get("schema"), prevTs = prevTsOf(Some((c, h))),
      bloom = bl, constraintsHdr = h.get("constraints"),
      statenc =
        if (statsEnc.isEmpty) None else Some(StatsEnc.encode(statsEnc)),
      statrel = mergedStats.nonEmpty)
    v
  }

  /** `compactChain`'s refusal when a declared skipping index would be
    * silently dropped (statsCols/bloomCol not re-declared). A SUBTYPE
    * of IllegalArgumentException so callers matching the general type
    * keep working — and so `maintain` can swallow exactly this refusal
    * (an operator-fixable misdeclaration) while genuine programmer
    * errors (clusterBy on a partitionBy layout, >2 dims, targetFiles<1)
    * still propagate out of the nightly pass. */
  final class IndexRedeclarationRequired(msg: String)
    extends IllegalArgumentException(msg)

  /** What one `maintain` pass did: the compacted version it minted (if
    * the chain was long enough to fold), the version the manifest
    * checkpoint now covers, the versions whose data retention expired,
    * the orphan dirs vacuum reclaimed — and, when the compaction step
    * was REFUSED by an index-redeclaration gate, the refusal message
    * (the pass continues; see `maintain`). */
  final case class MaintenanceReport(compacted: Option[Int],
      checkpointedTo: Int, expired: Seq[Int], vacuumed: Seq[String],
      compactionRefused: Option[String] = None,
      checkpointFailed: Option[String] = None)

  /** One-call table maintenance — the nightly OPTIMIZE job every
    * lakehouse schedules, composed from the audited primitives in the
    * order an operator wants them: (1) fold the append chain back to
    * one dir when it exceeds `maxChainDirs` (re-declaring the skipping
    * indexes via `statsCols`/`bloomCol`, optionally re-clustering via
    * `clusterBy`); (2) checkpoint the manifest so every full-history
    * read stays O(1 + suffix); (3) expire data older than `retainMs`
    * (compaction FIRST means the just-unreferenced chain dirs age out
    * as soon as their horizon passes); (4) vacuum crash orphans older
    * than `vacuumGraceMs`. Each step is independently idempotent, so a
    * maintenance job that dies mid-pass just runs again. Readers are
    * never blocked: compaction is one more OCC commit, the checkpoint
    * is an atomic replace, and retention/vacuum only ever touch
    * unreferenced dirs.
    *
    * A compaction REFUSED by the index-redeclaration gates (a stats- or
    * Bloom-bearing table whose caller forgot `statsCols`/`bloomCol`)
    * does NOT abort the pass: checkpoint, retention and vacuum are
    * independent steps a nightly job must keep running, so the refusal
    * is carried in the report (`compactionRefused`) for the operator
    * instead of silently stopping retention fleet-wide the night the
    * chain first trips the threshold. */
  def maintain(spark: SparkSession, dir: String, maxChainDirs: Int = 4,
      targetFiles: Int = 1, statsCols: StatsCols = Nil,
      bloomCol: Option[String] = None, clusterBy: StatsCols = Nil,
      retainMs: Long = Long.MaxValue, vacuumGraceMs: Long = 3600000L,
      prefix: String = "v", statsEnc: Seq[(String, String)] = Nil,
      incremental: Boolean = false,
      bloomCols: Seq[String] = Nil): MaintenanceReport = {
    val fs = fsOf(spark, dir)
    val (c, h) = currentHeaders(fs, dir).getOrElse(sys.error(
      s"nothing to maintain: no version committed under $dir"))
    // compact when the chain outgrew the bound, or whenever the caller
    // asked for re-clustering (OPTIMIZE ZORDER re-runs by request, like
    // Delta's — arrival-order churn since the last pass is exactly what
    // it exists to fold back in). One extra commit-file read vs
    // threading headers into compactChain — negligible next to the
    // rewrite itself.
    val (compacted, refused) =
      if (dataDirsFrom(h, c, prefix).size > maxChainDirs ||
          (clusterBy.nonEmpty && !incremental))
        try (Some(
          // incremental = the LIQUID tier: fold only the arrival-order
          // tail (head stays byte-identical, cost ∝ new data) — the
          // nightly cadence for a table whose head was fully clustered
          // once; a full re-cluster stays available by leaving
          // incremental off
          if (incremental && dataDirsFrom(h, c, prefix).size >= 2)
            compactChainTail(spark, dir, targetFiles,
              "maintenance compact (tail)", prefix, statsCols, bloomCol,
              clusterBy, statsEnc, bloomCols)
          else compactChain(spark, dir, targetFiles,
            "maintenance compact", prefix, statsCols, bloomCol, clusterBy,
            statsEnc, bloomCols)),
          None)
        catch {
          // ONLY an index-redeclaration refusal is survivable config
          // the pass must out-live (report it, keep maintaining);
          // genuine misuse — clusterBy on partitionBy, >2 dims —
          // propagates like any programmer error
          case e: IndexRedeclarationRequired => (None, Some(e.getMessage))
        }
      else (None, None)
    // the checkpoint is best-effort DERIVED data, and the scaladoc sells
    // the steps as independent: one transient IOException on its write
    // must not abort the retention and vacuum steps of the nightly pass
    // (commitEpoch wraps its checkpointEvery call the same way). The
    // failure is carried in the report like compactionRefused;
    // checkpointedTo = -1 marks "no coverage claimed this pass".
    val (cpTo, cpFailed) =
      try (checkpoint(fs, dir), Option.empty[String])
      catch { case e: java.io.IOException =>
        (-1, Some(Option(e.getMessage).getOrElse(e.getClass.getName))) }
    val expired =
      if (retainMs == Long.MaxValue) Seq.empty
      else expireVersions(fs, dir, retainMs, prefix = prefix)
    val vacuumed = vacuum(fs, dir, prefix, graceMs = vacuumGraceMs)
    MaintenanceReport(compacted, cpTo, expired, vacuumed, refused, cpFailed)
  }

  // ---- typed change-data feed -----------------------------------------------

  /** CHANGE DATA FEED between versions v-1 and v, typed the way Delta's
    * CDF types it: every emitted row is a table row plus a
    * `change_type` ∈ insert / delete / update_preimage /
    * update_postimage. Two cost tiers, resolved from the commit header:
    *
    *  - an APPEND version (and v=0) emits its added rows as inserts via
    *    the CDC fast path — a plain scan of the marker dir, no join, no
    *    read of the previous snapshot;
    *  - any other version (merge rewrites, MoR deletes, …) derives the
    *    typed diff from ONE full-outer join of the two snapshots on
    *    `keyCols`: key only in v → insert, only in v-1 → delete, in
    *    both with ANY column changed (null-safely compared) → pre+post
    *    image pair, unchanged → nothing.
    *
    * Contract: `keyCols` must be NON-NULL and uniquely key both
    * snapshots (the CDF notion of identity — a null key never joins and
    * would misread as delete+insert; duplicate keys would
    * cross-multiply), and both versions must share a schema (diff an
    * evolved version by rewrite instead). The general tier costs one hash
    * shuffle of both snapshots — exactly `versionDelta`'s exceptAll
    * cost but with TYPED output; the append tier costs O(files added),
    * which is why high-churn ingest should append. */
  def changeFeed(spark: SparkSession, dir: String, v: Int,
      keyCols: Seq[String], prefix: String = "v"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "changeFeed needs at least one key column")
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/manifest/commit_$v")),
      s"version $v was never committed under $dir")
    val hdrs = parseCommit(commitContent(fs, dir, v))._1
    if (v == 0 || hdrs.contains("append"))
      versionDelta(spark, dir, v, prefix)
        .withColumn("change_type", lit("insert"))
    else if (hdrs.contains("update")) {
      // MoR-UPDATE fast path: post-images are a plain scan of the
      // replacement dir; pre-images are the rows THIS commit's new
      // tombstones killed — one broadcast semi-join against the small
      // (key, dir) delta, never a full-outer snapshot diff. keyCols
      // must match the commit's recorded dv keys (the identity the
      // update was keyed on).
      val dvParts = hdrs("dv").split(";", 3)
      val dvKeys = dvParts(1).split(",").toSeq
      require(dvKeys == keyCols,
        s"version $v was updated keyed on $dvKeys — changeFeed must use " +
          s"the same keys (got $keyCols)")
      val upd = hdrs("update")
      require(fs.exists(new Path(s"$dir/$upd")),
        s"version $v's data has been garbage-collected (retention)")
      val curTombs = readDvSidecar(spark, s"$dir/${dvParts(0)}",
        declaredSchemaOf(hdrs), keyCols, scoped = dvParts.length == 3,
        colmapped = hdrs.contains("colmap"))
      val prevHdrs = parseCommit(commitContent(fs, dir, v - 1))._1
      val prevDirs = dataDirsFrom(prevHdrs, v - 1, prefix)
      import spark.implicits._
      val prevTombs = prevHdrs.get("dv").map { spec =>
        val parts = spec.split(";", -1)
        val dvd = readDvSidecar(spark, s"$dir/${parts(0)}",
          declaredSchemaOf(prevHdrs), keyCols, scoped = parts.length == 3,
          colmapped = prevHdrs.contains("colmap"))
        if (parts.length == 3) dvd
        else dvd.crossJoin(prevDirs.map(dirBasename).toDF("__dir"))
      }
      val newTombs = prevTombs.fold(curTombs)(p =>
        curTombs.exceptAll(p.select(curTombs.columns.map(col): _*)))
      val preSrc = prevDirs.map { dd =>
        spark.read.parquet(s"$dir/$dd")
          .withColumn("__gdir", lit(dirBasename(dd)))
      }.reduce(_ unionByName _)
      val cols = preSrc.columns.filterNot(_ == "__gdir").toSeq
      val pre = preSrc.join(
        broadcast(newTombs.withColumnRenamed("__dir", "__gdir")),
        keyCols :+ "__gdir", "left_semi")
        .select(cols.map(col): _*)
        .withColumn("change_type", lit("update_preimage"))
      val post = spark.read.parquet(s"$dir/$upd")
        .select(cols.map(col): _*)
        .withColumn("change_type", lit("update_postimage"))
      pre.unionByName(post)
    }
    else {
      val prev0 = readVersion(spark, dir, v - 1, prefix)
      val cur = readVersion(spark, dir, v, prefix)
      val cols = cur.columns.toSeq
      // by NAME, order-blind — the same identity the schema gate draws
      // (an undeclared reorder commits fine and must diff fine); the
      // aligning select below puts the preimage side in v's order
      require(prev0.columns.toSet == cols.toSet,
        s"changeFeed requires both versions to share a schema " +
          s"(v${v - 1}: ${prev0.columns.toSeq}, v$v: $cols)")
      // types may differ ONLY by lossless decimal widening (what the
      // gate admits undeclared — a merge's arithmetic widens by
      // construction). Anything else — a DECLARED retype/narrowing —
      // refuses loudly: blindly casting the preimage would turn an
      // overflowing value into NULL and fabricate update rows, silently
      // wrong CDF output. Diff an evolved version by rewrite instead.
      val retyped = cols.filter { c =>
        val from = prev0.schema(c).dataType.catalogString
        val to = cur.schema(c).dataType.catalogString
        from != to && !losslessDecimalWiden(from, to)
      }
      require(retyped.isEmpty,
        s"changeFeed cannot diff across a retype of ${retyped.sorted} " +
          s"(v${v - 1} vs v$v) — only lossless decimal widening aligns; " +
          "compute an evolved version's changes by rewrite")
      // align the preimage side to v's (equal-or-wider) column types:
      // the struct comparison below needs one common type — preimages
      // surface at v's widths
      val prev = prev0.select(cols.map(c =>
        prev0(c).cast(cur.schema(c).dataType).as(c)): _*)
      def pack(df: DataFrame, tag: String) =
        df.select(keyCols.map(df(_)) :+ struct(cols.map(df(_)): _*).as(tag): _*)
      val j = pack(prev, "pr").join(pack(cur, "cu"), keyCols, "full_outer")
      val e = col("e")
      j.select(explode(
        when(col("pr").isNull,
          array(struct(col("cu").as("r"), lit("insert").as("t"))))
        .when(col("cu").isNull,
          array(struct(col("pr").as("r"), lit("delete").as("t"))))
        .when(!(col("pr") <=> col("cu")), array(
          struct(col("pr").as("r"), lit("update_preimage").as("t")),
          struct(col("cu").as("r"), lit("update_postimage").as("t"))))
        // unchanged key: a null array explodes to NOTHING — the
        // untouched arm emits no feed row
        .otherwise(lit(null))).as("e"))
        .select(cols.map(c => e.getField("r").getField(c).as(c)) :+
          e.getField("t").as("change_type"): _*)
    }
  }

  /** `cdcSubscribe` at TYPED-ROW granularity: for every newly committed
    * version the subscriber receives `changeFeed(v)` — inserts ride the
    * append fast path, rewrites arrive as typed diffs — exactly once
    * across restarts (the commit-feed checkpoint dedupes versions). */
  def cdcSubscribeTyped(spark: SparkSession, dir: String,
      checkpointDir: String, keyCols: Seq[String],
      onChanges: (Int, String, DataFrame) => Unit,
      prefix: String = "v", maxVersionsPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        batch.collect().sortBy(_.getAs[Int]("version")).foreach { r =>
          val v = r.getAs[Int]("version")
          onChanges(v, r.getAs[String]("metadata"),
            changeFeed(spark, dir, v, keyCols, prefix))
        }
      }
    commitFeed(spark, dir, maxVersionsPerTrigger).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(fn)
      .start()
  }
}
