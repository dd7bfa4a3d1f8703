package graft

import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.functions._

import graft.expr.PosDvSidecar
import graft.plans.GraftMergeCommand
import graft.sources.GraftTable

/** Round-20 (final, VERDICT r19 "Next round" items): bounded pdv
  * sidecar cache (items 3/8), positional merge-on-read UPDATE (item 4),
  * partby-additive MERGE rebase (item 5), plus the ADVICE findings —
  * non-deterministic positional-delete consistency and the qualified
  * self-source comparison. */
class Round20Spec extends SparkSpec {

  private def fresh(tag: String): String = {
    val dir = s"target/tmp/r20spec_$tag"
    GraftTable.fsOf(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    dir
  }

  private def analyzedMerge(sql: String): GraftMergeCommand = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    spark.sessionState.analyzer
      .executeAndCheck(parsed, new QueryPlanningTracker()) match {
      case c: GraftMergeCommand => c
      case other => fail(s"expected GraftMergeCommand, got $other")
    }
  }

  // ---- partby-additive MERGE rebase (item 5) -------------------------------

  test("a raced MERGE rebases across an ADDITIVE racer on a partitionBy " +
      "table: the added column lands BEFORE the partition column and " +
      "the rebase still absorbs it") {
    import spark.implicits._
    val dir = fresh("partbyrace")
    GraftTable.commitNextIsolated(spark, dir,
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "a"))
        .toDF("key", "v", "p"),
      "base", partitionBy = Seq("p"))
    spark.conf.set("spark.sql.catalog.gt20",
      classOf[graft.sources.GraftCatalog].getName)
    val abs = new java.io.File(dir).getAbsolutePath
    Seq((2L, 200L), (4L, 400L)).toDF("ckey", "delta")
      .createOrReplaceTempView("r20_src")
    // pin the statement at v0 …
    val cmd = analyzedMerge(
      s"""MERGE INTO gt20.`$abs` t USING r20_src s ON t.key = s.ckey
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |WHEN NOT MATCHED THEN INSERT (key, v, p) VALUES (s.ckey, s.delta, 'c')
         |""".stripMargin)
    // … then race with a metadata-only widen. On a partitionBy head the
    // widened declared order is (key, v, tag, p) — partition columns
    // stay LAST, so the addition is NOT a suffix of the old schema (the
    // shape r19's suffix-only rebase check refused)
    GraftTable.commitAddColumns(spark, abs, Seq(("tag", "string")),
      "racer adds a column")
    val fs = GraftTable.fsOf(spark, abs)
    assert(GraftTable.headersOf(fs, abs, 1)("schema")
      .split(",").map(_.split(":")(0)).toSeq == Seq("key", "v", "tag", "p"),
      "fixture must exhibit the extras-before-partition-columns shape")
    cmd.run(spark)
    assert(GraftTable.versions(fs, abs).size == 3,
      "base + ADD COLUMN + exactly one merge commit")
    val headHdrs = GraftTable.headersOf(fs, abs, 2)
    assert(headHdrs.get("partby").contains("p"),
      "the merge commit must preserve the partitionBy layout")
    val got = GraftTable.read(spark, abs).orderBy("key").collect()
      .map { r =>
        val cols = GraftTable.read(spark, abs).columns
        (r.getLong(cols.indexOf("key")), r.getLong(cols.indexOf("v")),
          if (r.isNullAt(cols.indexOf("tag"))) "NULL"
          else r.getString(cols.indexOf("tag")),
          r.getString(cols.indexOf("p")))
      }.toSeq
    assert(got == Seq((1L, 10L, "NULL", "a"), (2L, 220L, "NULL", "b"),
      (3L, 30L, "NULL", "a"), (4L, 400L, "NULL", "c")))
  }

  test("the partby data-REWRITE racer still refuses to rebase (the " +
      "additive carve-out requires untouched data dirs)") {
    import spark.implicits._
    val dir = fresh("partbyrewrite")
    GraftTable.commitNextIsolated(spark, dir,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("key", "v", "p"),
      "base", partitionBy = Seq("p"))
    spark.conf.set("spark.sql.catalog.gt20",
      classOf[graft.sources.GraftCatalog].getName)
    val abs = new java.io.File(dir).getAbsolutePath
    Seq((2L, 200L)).toDF("ckey", "delta")
      .createOrReplaceTempView("r20_src2")
    val cmd = analyzedMerge(
      s"""MERGE INTO gt20.`$abs` t USING r20_src2 s ON t.key = s.ckey
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.delta
         |""".stripMargin)
    GraftTable.commitAddColumns(spark, abs, Seq(("tag", "string")),
      "racer adds a column")
    GraftTable.commitNextIsolated(spark, abs,
      GraftTable.read(spark, abs).withColumn("tag", lit("real")),
      "racer writes real values", partitionBy = Seq("p"))
    val e = intercept[java.util.ConcurrentModificationException](
      cmd.run(spark))
    assert(e.getMessage.contains("cannot absorb"))
    assert(GraftTable.versions(GraftTable.fsOf(spark, abs), abs).size == 3)
  }

  // ---- bounded pdv sidecar cache (items 3 and 8) ---------------------------

  test("PosDvSidecar cache evicts the coldest entry past the cap and a " +
      "re-probe of the evicted file still answers correctly") {
    import spark.implicits._
    PosDvSidecar.resetForTest()
    val sc = new java.io.File(fresh("pdvcache")).getAbsolutePath
    Seq(0L, 2L).toDF("__pos").write.parquet(s"$sc/__file=f1")
    Seq(1L).toDF("__pos").write.parquet(s"$sc/__file=f2")
    Seq(3L).toDF("__pos").write.parquet(s"$sc/__file=f3")
    try {
      // each entry weighs max(arr.length, 16) = 16 → two entries fit,
      // the third load must evict the coldest (f1)
      PosDvSidecar.maxLongs = 40L
      assert(PosDvSidecar.deleted(sc, "f1", 0L))
      assert(!PosDvSidecar.deleted(sc, "f1", 1L))
      assert(PosDvSidecar.deleted(sc, "f2", 1L))
      assert(PosDvSidecar.cached(sc, "f1") && PosDvSidecar.cached(sc, "f2"))
      assert(PosDvSidecar.deleted(sc, "f3", 3L))
      assert(!PosDvSidecar.cached(sc, "f1"),
        "loading past the cap must evict the coldest entry (f1)")
      assert(PosDvSidecar.cached(sc, "f2") && PosDvSidecar.cached(sc, "f3"))
      assert(PosDvSidecar.cachedLongs <= 40L)
      // the evicted file transparently re-loads and answers identically
      assert(PosDvSidecar.deleted(sc, "f1", 2L))
      assert(!PosDvSidecar.deleted(sc, "f1", 3L))
      assert(PosDvSidecar.cachedLongs <= 40L,
        "the re-load must evict again, never exceed the cap")
    } finally PosDvSidecar.resetForTest()
  }

  test("a many-file pdv read stays under the sidecar cache cap while " +
      "the merged result stays exact (50 tombstoned files)") {
    PosDvSidecar.resetForTest()
    val dir = fresh("pdvmany")
    val df = spark.range(500).select(col("id").as("k"),
      (col("id") * 10L).as("v"))
    GraftTable.commitNextIsolated(spark, dir, df.repartition(50), "base")
    GraftTable.commitPositionalDelete(spark, dir,
      col("k") % 5L === 0L, "tombstone every fifth row across all files")
    try {
      // 50 sidecar entries × weight 16 = 800 — a 200-long cap forces
      // eviction DURING the scan; the read must stay exact regardless
      PosDvSidecar.maxLongs = 200L
      val got = GraftTable.read(spark, dir)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (0L until 500L).filterNot(_ % 5 == 0),
        "eviction/re-load under memory pressure must not change results")
      assert(PosDvSidecar.cachedLongs <= 200L,
        s"cache must hold under the cap (got ${PosDvSidecar.cachedLongs})")
      assert(PosDvSidecar.cachedEntries < 50,
        "eviction must actually have run across the 50 sidecar files")
    } finally PosDvSidecar.resetForTest()
  }

  test("PosDvSidecar stays correct under concurrent probes with the cap " +
      "forcing constant eviction (8 threads x 6 files)") {
    import spark.implicits._
    PosDvSidecar.resetForTest()
    val sc = new java.io.File(fresh("pdvcachestress")).getAbsolutePath
    // file fN tombstones positions { n, n+10 }
    (1 to 6).foreach { n =>
      Seq(n.toLong, n + 10L).toDF("__pos").write.parquet(s"$sc/__file=f$n")
    }
    try {
      PosDvSidecar.maxLongs = 40L // two entries fit; six files contend
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (1 to 8).map { t =>
        new Thread(() => {
          val rnd = new java.util.Random(t)
          var i = 0
          while (i < 2000) {
            val n = rnd.nextInt(6) + 1
            val pos = rnd.nextInt(24).toLong
            val got = PosDvSidecar.deleted(sc, s"f$n", pos)
            val want = pos == n || pos == n + 10
            if (got != want)
              errs.add(s"f$n pos=$pos got=$got want=$want")
            i += 1
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty,
        s"eviction races corrupted answers: ${errs.peek()}")
      assert(PosDvSidecar.cachedLongs <= 40L + 16L,
        "total may transiently hold one over-cap insert, never grow")
    } finally PosDvSidecar.resetForTest()
  }

  test("a positional UPDATE matching NOTHING commits an empty sidecar " +
      "version and the table reads unchanged") {
    val dir = updBase("pdvupdnone")
    try {
      spark.conf.set("spark.graft.update.mode", "positional")
      spark.conf.set("spark.sql.catalog.gt20n",
        classOf[graft.sources.GraftCatalog].getName)
      val abs = new java.io.File(dir).getAbsolutePath
      spark.sql(s"UPDATE gt20n.`$abs` SET v = 0 WHERE k > 999")
    } finally spark.conf.unset("spark.graft.update.mode")
    val fs = GraftTable.fsOf(spark, dir)
    assert(GraftTable.headersOf(fs, dir, 2).contains("pdv"))
    assert(GraftTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1L to 12L).map(k => (k, k * 10L)))
    // and the chain stays usable: a real update lands on top
    GraftTable.commitPositionalUpdate(spark, dir, col("k") === 1L,
      Seq("v" -> lit(11L)), "real bump")
    assert(GraftTable.read(spark, dir).where(col("k") === 1L)
      .select("v").collect().map(_.getLong(0)).toSeq == Seq(11L))
  }

  // ---- Avro bridge (VERDICT r19 "What's missing" 4, un-blocked) ------------

  test("AvroBridge round-trips every mapped type exactly, nulls " +
      "included, and refuses an unmapped type loudly") {
    import org.apache.spark.sql.types._
    val dir = new java.io.File(fresh("avrotypes")).getAbsolutePath
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(12, 2))))
    val ts = java.sql.Timestamp.valueOf("2001-07-30 12:34:56")
    ts.setNanos(123456000) // micro precision must survive
    val rows = Seq(
      org.apache.spark.sql.Row(true, 7, 77L, 1.5f, 2.25, "héllo",
        Array[Byte](1, 2, 3), java.sql.Date.valueOf("1997-02-28"), ts,
        new java.math.BigDecimal("12345.67")),
      org.apache.spark.sql.Row(null, null, null, null, null, null,
        null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    sources.AvroBridge.write(df, dir)
    val back = sources.AvroBridge.read(spark, dir, schema)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (0 until r.length).map(i => r.get(i) match {
        case a: Array[Byte] => a.toSeq
        case v => v
      })).toSet
    assert(canon(back) == canon(df))
    // a type outside the mapped subset refuses with the column named
    val e = intercept[RuntimeException] {
      sources.AvroBridge.toAvro(StructType(Seq(
        StructField("arr", ArrayType(LongType)))))
    }
    assert(e.getMessage.contains("arr"))
  }

  test("AvroBridge deflate-compressed containers round-trip exactly " +
      "and compress a repetitive payload") {
    import spark.implicits._
    val plainDir = new java.io.File(fresh("avroplain")).getAbsolutePath
    val defDir = new java.io.File(fresh("avrodeflate")).getAbsolutePath
    val df = (1L to 5000L)
      .map(i => (i, "the same highly repetitive payload " * 3))
      .toDF("k", "s").coalesce(1)
    sources.AvroBridge.write(df, plainDir)
    sources.AvroBridge.write(df, defDir, codec = Some("deflate"))
    val back = sources.AvroBridge.read(spark, defDir, df.schema)
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)
    def bytes(d: String): Long = {
      val fs = GraftTable.fsOf(spark, d)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(d)).getLength
    }
    assert(bytes(defDir) * 5 < bytes(plainDir),
      s"deflate must compress the repetitive payload ≥5x " +
        s"(${bytes(defDir)} vs ${bytes(plainDir)})")
  }

  // ---- non-deterministic positional delete (ADVICE r19, medium) -----------

  test("positional DELETE with a NON-deterministic predicate stays " +
      "self-consistent: survivors = raw - sidecar, and every _skips " +
      "file's sidecar holds ALL its rows") {
    import spark.implicits._
    val dir = fresh("pdvrand")
    GraftTable.commitNextIsolated(spark, dir,
      (1L to 40L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1), "lo")
    GraftTable.commitAppend(spark, dir,
      (41L to 80L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1), "hi")
    // rand() re-evaluates arbitrarily between jobs — the commit must
    // record _skips from what it WROTE, never from a second evaluation
    GraftTable.commitPositionalDelete(spark, dir, rand() < 0.5,
      "random sample delete")
    val fs = GraftTable.fsOf(spark, dir)
    val hdrs = GraftTable.headersOf(fs, dir, 2)
    val pdvDir = hdrs("pdv")
    val sidecar = spark.read.parquet(s"$dir/$pdvDir")
      .select(col("__file").cast("string").as("__file"),
        col("__pos").cast("long").as("__pos"))
    val positions = sidecar.count()
    val served = GraftTable.readVersion(spark, dir, 2).count()
    assert(served == 80L - positions,
      s"served $served rows but the sidecar tombstones $positions of 80 " +
        "— the committed skip manifest disagrees with the written sidecar")
    // every skip-listed file must be FULLY covered by written positions
    val perFile = sidecar.groupBy("__file").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    GraftTable.pdvSkips(fs, s"$dir/$pdvDir").foreach { f =>
      assert(perFile.getOrElse(f, 0L) == 40L,
        s"file $f is skip-listed but the sidecar holds only " +
          s"${perFile.getOrElse(f, 0L)} of its 40 positions — over-delete")
    }
  }

  // ---- positional UPDATE guards (item 4 companions) ------------------------

  test("positional UPDATE enforces declared check constraints on the " +
      "replacement rows and refuses atomically") {
    import spark.implicits._
    val dir = fresh("pdvupdcons")
    GraftTable.commitNextIsolated(spark, dir,
      (1L to 6L).map(k => (k, k * 10L)).toDF("k", "v"),
      "base", constraints = Seq("check:v < 1000"))
    GraftTable.commitPositionalDelete(spark, dir, col("k") === 1L, "mor")
    val e = intercept[IllegalStateException] {
      GraftTable.commitPositionalUpdate(spark, dir, col("k") === 2L,
        Seq("v" -> lit(5000L)), "violating bump")
    }
    assert(e.getMessage.contains("constraint"))
    assert(GraftTable.versions(GraftTable.fsOf(spark, dir), dir).size == 2,
      "a refused update must create no version")
    // a compliant update on the same head lands and carries the pdv
    GraftTable.commitPositionalUpdate(spark, dir, col("k") === 2L,
      Seq("v" -> lit(999L)), "compliant bump")
    assert(GraftTable.read(spark, dir).where(col("k") === 2L)
      .select("v").collect().map(_.getLong(0)).toSeq == Seq(999L))
  }

  /** Two-file pdv-update fixture: v0 holds keys 1..4 (the 'lo' file),
    * the appended v1 holds 5..12 ('hi'). */
  private def updBase(tag: String): String = {
    import spark.implicits._
    val dir = fresh(tag)
    GraftTable.commitNextIsolated(spark, dir,
      (1L to 4L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1), "lo")
    GraftTable.commitAppend(spark, dir,
      (5L to 12L).map(k => (k, k * 10L)).toDF("k", "v").coalesce(1), "hi")
    dir
  }

  test("a positional UPDATE matching EVERY row of one file lands that " +
      "file in _skips: the read serves replacements only, never opens it") {
    val dir = updBase("pdvupdskip")
    GraftTable.commitPositionalUpdate(spark, dir, col("k") <= 4L,
      Seq("v" -> (col("v") * 100L)), "rewrite the whole lo file")
    val fs = GraftTable.fsOf(spark, dir)
    val pdvDir = GraftTable.headersOf(fs, dir, 2)("pdv")
    assert(GraftTable.pdvSkips(fs, s"$dir/$pdvDir").size == 1,
      "the fully-tombstoned lo file must be skip-listed")
    val read = GraftTable.readVersion(spark, dir, 2)
    val skipped = GraftTable.pdvSkips(fs, s"$dir/$pdvDir").head
    assert(!read.inputFiles.exists(_.endsWith(skipped)),
      "the fully-tombstoned lo file must never enter the file list")
    assert(GraftTable.readVersion(spark, dir, 1).inputFiles
      .exists(_.endsWith(skipped)),
      "…and the skip-listed name must be a real v1 data file")
    assert(read.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1L to 12L).map(k => (k, if (k <= 4) k * 1000L else k * 10L)))
  }

  test("lifecycle across a delete→positional-update chain: shallow " +
      "clone serves merged, compaction mints a pdv-free rewrite, " +
      "changeFeed types the update as pre+post images") {
    val dir = updBase("pdvupdlife")
    GraftTable.commitPositionalDelete(spark, dir, col("k") === 3L, "mor")
    GraftTable.commitPositionalUpdate(spark, dir, col("k") === 7L,
      Seq("v" -> lit(777L)), "positional bump")
    val expect = (1L to 12L).filterNot(_ == 3L)
      .map(k => (k, if (k == 7L) 777L else k * 10L))
    // clone: the destination's v0 serves the MERGED update chain
    val dst = fresh("pdvupdclone")
    GraftTable.cloneShallow(spark, dir, dst)
    assert(GraftTable.readVersion(spark, dst, 0).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == expect)
    // changeFeed across the update version: exactly one pre+post pair
    val feed = GraftTable.changeFeed(spark, dir, 3, Seq("k"))
      .select("change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(feed == Set(("update_preimage", 7L, 70L),
      ("update_postimage", 7L, 777L)),
      s"the typed diff must be the one updated row, got $feed")
    // compaction folds the chain into a probe-free rewrite
    val cv = GraftTable.compactChain(spark, dir)
    val fs = GraftTable.fsOf(spark, dir)
    assert(!GraftTable.headersOf(fs, dir, cv).contains("pdv"))
    assert(GraftTable.readVersion(spark, dir, cv).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == expect)
  }

  test("retention across a positional-update chain: expire + vacuum " +
      "reclaim the superseded sidecar, the head stays exact") {
    val dir = updBase("pdvupdgc")
    GraftTable.commitPositionalDelete(spark, dir, col("k") === 3L, "mor")
    GraftTable.commitPositionalUpdate(spark, dir, col("k") === 7L,
      Seq("v" -> lit(777L)), "positional bump")
    val fs = GraftTable.fsOf(spark, dir)
    val oldSidecar = GraftTable.headersOf(fs, dir, 2)("pdv")
    val headSidecar = GraftTable.headersOf(fs, dir, 3)("pdv")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$oldSidecar")))
    // expire everything but the head (far-future now), then vacuum
    val expired = GraftTable.expireVersions(fs, dir, retainMs = 0L,
      nowMs = System.currentTimeMillis() + 86400000L)
    GraftTable.vacuum(fs, dir)
    assert(expired.contains(2),
      s"the superseded delete version must expire, got $expired")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$oldSidecar")),
      "v2's sidecar is referenced by no retained version — reclaim it")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$headSidecar")),
      "the head's cumulative sidecar must survive")
    assert(GraftTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1L to 12L).filterNot(_ == 3L)
        .map(k => (k, if (k == 7L) 777L else k * 10L)))
  }

  test("positional UPDATE refuses non-deterministic conditions and SET " +
      "values (two-pass evaluation must agree)") {
    val dir = updBase("pdvupdrand")
    GraftTable.commitPositionalDelete(spark, dir, col("k") === 3L, "mor")
    val e1 = intercept[IllegalArgumentException] {
      GraftTable.commitPositionalUpdate(spark, dir, rand() < 0.5,
        Seq("v" -> lit(0L)), "random cond")
    }
    assert(e1.getMessage.toLowerCase.contains("deterministic"))
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.commitPositionalUpdate(spark, dir, col("k") === 5L,
        Seq("v" -> (rand() * 100).cast("long")), "random value")
    }
    assert(e2.getMessage.toLowerCase.contains("non-deterministic"))
    assert(GraftTable.versions(GraftTable.fsOf(spark, dir), dir).size == 3,
      "a refused update must create no version")
  }

  test("positional UPDATE refuses a key-tombstone (dv=) head and the " +
      "opt-in mode conf mints a pdv chain from a plain head") {
    import spark.implicits._
    val dir = fresh("pdvupdguards")
    GraftTable.commitNextIsolated(spark, dir,
      (1L to 6L).map(k => (k, k * 10L)).toDF("k", "v"), "base")
    GraftTable.commitDeleteVector(spark, dir,
      GraftTable.read(spark, dir).where(col("k") === 1L), Seq("k"), "dv")
    val e = intercept[IllegalArgumentException] {
      GraftTable.commitPositionalUpdate(spark, dir, col("k") === 2L,
        Seq("v" -> lit(0L)), "two regimes")
    }
    assert(e.getMessage.contains("dv="))
    // SQL door opt-in on a PLAIN head routes positionally
    val dir2 = fresh("pdvupdoptin")
    GraftTable.commitNextIsolated(spark, dir2,
      (1L to 6L).map(k => (k, k * 10L)).toDF("k", "v"), "base")
    spark.conf.set("spark.sql.catalog.gt20u",
      classOf[graft.sources.GraftCatalog].getName)
    val abs2 = new java.io.File(dir2).getAbsolutePath
    try {
      spark.conf.set("spark.graft.update.mode", "positional")
      spark.sql(s"UPDATE gt20u.`$abs2` SET v = v + 1 WHERE k <= 2")
    } finally spark.conf.unset("spark.graft.update.mode")
    val fs2 = GraftTable.fsOf(spark, dir2)
    assert(GraftTable.headersOf(fs2, dir2, 1).contains("pdv"),
      "the opt-in UPDATE must mint a positional sidecar, not CoW")
    assert(GraftTable.read(spark, dir2).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1L to 6L).map(k => (k, if (k <= 2) k * 10L + 1 else k * 10L)))
  }

  // ---- round-21 one-pass positional UPDATE fold ----------------------------

  test("positional UPDATE one-pass fold (r21): the cumulative sidecar " +
      "stays duplicate-free without a distinct, prior _skips carry " +
      "forward, and an update that kills a file's last live rows lands " +
      "it in _skips via the delta reconciliation") {
    import spark.implicits._
    val dir = fresh("pdvfold")
    // hash-repartition by k%3 lands class 0 alone in one file and
    // classes 1+2 together in another (plus one empty file) — the mix
    // is the point: fully-dead needs BOTH classes of the shared file
    val base = (0L until 12L).toDF("k").withColumn("v", col("k") * 10L)
      .repartition(3, pmod(col("k"), lit(3)))
    GraftTable.commitNextIsolated(spark, dir, base, "base")
    val fs = GraftTable.fsOf(spark, dir)
    // v1: delete EVERY row of the k%3==0 file — it becomes fully dead
    GraftTable.commitPositionalDelete(spark, dir,
      pmod(col("k"), lit(3)) === 0L, "kill the k%3==0 file")
    val skips1 = GraftTable.pdvSkips(fs,
      s"$dir/${GraftTable.headersOf(fs, dir, 1)("pdv")}")
    assert(skips1.size == 1, s"one fully-dead file expected, got $skips1")
    // v2: point UPDATE (k=1 lives in the shared k%3∈{1,2} file)
    GraftTable.commitPositionalUpdate(spark, dir, col("k") === 1L,
      Seq("v" -> lit(111L)), "bump k=1")
    val h2 = GraftTable.headersOf(fs, dir, 2)
    val skips2 = GraftTable.pdvSkips(fs, s"$dir/${h2("pdv")}")
    assert(skips2 == skips1,
      "prior fully-dead files must carry into the new _skips verbatim")
    val sc2 = spark.read.parquet(s"$dir/${h2("pdv")}")
    assert(sc2.count() == sc2.distinct().count(),
      "the no-distinct sidecar union must stay duplicate-free " +
        "(fresh positions are probe-filtered live rows)")
    // v3: update every k%3==1 row — half of the shared base file dies
    // (not fully dead yet) and v2's one-row replacement file IS fully
    // tombstoned: the delta reconciliation must catch a replacement
    // dir's file
    GraftTable.commitPositionalUpdate(spark, dir,
      pmod(col("k"), lit(3)) === 1L, Seq("v" -> lit(999L)), "retire class 1")
    val h3 = GraftTable.headersOf(fs, dir, 3)
    val skips3 = GraftTable.pdvSkips(fs, s"$dir/${h3("pdv")}")
    assert(skips1.subsetOf(skips3) && skips3.size == 2,
      s"expected prior skip + v2's fully-tombstoned replacement file, " +
        s"got $skips3")
    val sc3 = spark.read.parquet(s"$dir/${h3("pdv")}")
    assert(sc3.count() == sc3.distinct().count())
    // v4: update every k%3==2 row — the shared base file's remaining
    // half dies, so it goes fully dead ACROSS two commits (cumulative
    // count = prev sidecar footers + this update's fresh positions)
    GraftTable.commitPositionalUpdate(spark, dir,
      pmod(col("k"), lit(3)) === 2L, Seq("v" -> lit(222L)), "retire class 2")
    val h4 = GraftTable.headersOf(fs, dir, 4)
    val skips4 = GraftTable.pdvSkips(fs, s"$dir/${h4("pdv")}")
    assert(skips3.subsetOf(skips4) && skips4.size == 3,
      s"the shared base file must go fully dead across two updates, " +
        s"got $skips4")
    val sc4 = spark.read.parquet(s"$dir/${h4("pdv")}")
    assert(sc4.count() == sc4.distinct().count())
    // the merged head serves exactly the surviving images
    val got = GraftTable.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = Seq(1L -> 999L, 2L -> 222L, 4L -> 999L, 5L -> 222L,
      7L -> 999L, 8L -> 222L, 10L -> 999L, 11L -> 222L)
    assert(got == expect, s"got $got")
  }
}
