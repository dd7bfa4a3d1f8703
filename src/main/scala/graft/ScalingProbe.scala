package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Scale-up evidence (PERF.md): amplify the sf0.1 tables 10× in-plan
  * (crossJoin with a replica index, keys shifted so join fanout and
  * per-key group sizes are preserved exactly) and measure the core plan
  * shapes at 1× and 10×. A plan whose cost is dominated by fixed
  * overhead shows ratio ≪ 10; a plan that blows up super-linearly shows
  * ratio ≫ 10. This does NOT create new fixture data on disk — the
  * amplification is a deterministic Spark plan over the driver-provided
  * parquet, used only for timing.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val N = 10

    // replicate n× with a shifted key so join fanout / group sizes are
    // IDENTICAL per replica (no artificial skew, no cross-replica joins)
    def amp(df: DataFrame, keys: Seq[String]): DataFrame = {
      val rep = spark.range(N).toDF("rep_idx")
      keys.foldLeft(df.crossJoin(rep)) { (d, k) =>
        d.withColumn(k, col(k) * N + col("rep_idx"))
      }.drop("rep_idx")
    }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val li = T.t(spark, sfDir, "lineitem")
    val ord = T.t(spark, sfDir, "orders")
    val ev = T.events(spark, sfDir)
    val docs = T.t(spark, sfDir, "documents")

    def q1(l: DataFrame): Long = l.groupBy("l_returnflag", "l_linestatus")
      .agg(T.money(sum(T.dec(col("l_quantity")))).as("sq"),
        T.money(sum(T.dec(col("l_extendedprice")))).as("sp"),
        count(lit(1)).as("n")).count()

    def joinAgg(o: DataFrame, l: DataFrame): Long =
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          T.money(sum(T.dec(col("l_extendedprice")))).as("rev")).count()

    def winLatest(e: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }

    def minhash(d: DataFrame): Long =
      ops.MinHashDedup.dedupAssign(d).count()

    // the round-3 rewrites whose claims need empirical backing: both are
    // keyed on (user/type, time-or-value bucket), so candidates per key
    // stay constant under replica amplification — time should scale ~with
    // output rows, never quadratically.
    def asof(e: DataFrame): Long = {
      val merged = e.filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1))
            .as("kind"), col("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("t"), col("kind"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      merged.withColumn("best", max(when(col("kind") === 0,
          struct(col("t").as("c_us"), col("event_id").as("click_id")))).over(w))
        .filter(col("kind") === 1 && col("best").isNotNull).count()
    }

    def intervalJoin(e: DataFrame): Long = {
      val W = 300000000L
      val p = e.filter(col("event_type") === "purchase").select(
        col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
        .withColumn("tb", expr(s"p_us div $W"))
      val c = e.filter(col("event_type") === "click").select(
        col("event_id").as("click_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
        .withColumn("tb", explode(array(expr(s"c_us div $W"),
          expr(s"c_us div $W") + 1)))
      p.join(c, col("user_id") === col("c_user") &&
        p("tb") === c("tb") &&
        col("c_us") >= col("p_us") - lit(W) &&
        col("c_us") <= col("p_us")).count()
    }

    // round-6 shapes: the grid-bucketed spatial join amplifies the probe
    // (customer) side only — output grows ~10×, and the cell equi-join
    // should track it linearly; the triangle edge-build measures the
    // DISTINCT reduction over 10× pair instances (same edge set).
    // same geometry/edge definitions as the operator and the parity spec
    // (ops.Round6Ops helpers) — the probe must measure the same fixture
    val cust = T.t(spark, sfDir, "customer")
    val supp = T.t(spark, sfDir, "supplier")
    import ops.Round6Ops.{custPoints, suppPoints, gridCell, gridRadius2, coPurchaseEdges}
    def gridJoin(c: DataFrame): Long = {
      val cc = custPoints(c)
        .withColumn("cx", gridCell(col("x")))
        .withColumn("cy", gridCell(col("y")))
      val sp = suppPoints(supp)
        .withColumn("di", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dj", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("s_suppkey"), col("sx"), col("sy"),
          (gridCell(col("sx")) + col("di")).as("cx"),
          (gridCell(col("sy")) + col("dj")).as("cy"))
      val dx = col("x") - col("sx"); val dy = col("y") - col("sy")
      cc.join(sp, Seq("cx", "cy"))
        .filter(dx * dx + dy * dy <= gridRadius2).count()
    }
    def triEdges(l: DataFrame): Long = coPurchaseEdges(l).count()

    // round-8 shape: topKPerKey on a NEAR-UNIQUE key (l_orderkey:
    // ~4 lineitems per order, 150k keys at sf0.1 → 1.5M at 10×) with
    // the tracked-key bound forced low enough that every partition
    // takes the degraded path — partial epoch-flush + final
    // external-sort spill. The claim under test: the fallback scales
    // ~linearly like the external-sort window formulation it degrades
    // to, instead of OOMing (the pre-round-8 behavior at this
    // cardinality was unbounded heap growth).
    def topkSpill(l: DataFrame): Long = {
      spark.conf.set("spark.graft.topk.maxKeysPerPartition", "1024")
      try Graft.topKPerKey(l.select("l_orderkey", "l_extendedprice",
          "l_linenumber"),
        Seq(col("l_orderkey")),
        Seq(col("l_extendedprice").desc, col("l_linenumber")), 2).count()
      finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
    }

    // round-9 shape: the k-means training loop at a FIXED 5 iterations
    // (minIters pins the count — the amp'd corpus would otherwise hit
    // the assignment fixpoint immediately) so 1× and 10× run identical
    // work shapes. The claim under test: per-iteration cost is one
    // treeAggregate over the corpus — linear in rows, constant driver
    // state (k×64 decimals) — so 10× data ⇒ ≈10× time, no driver-side
    // blowup. (After amp the 8 seed ids collapse to replicas of one
    // vector — degenerate clustering, identical per-row compute.)
    val emb = T.t(spark, sfDir, "embeddings")
    def kmeans(e: DataFrame): Long =
      ops.Round9Ops.kmeansTrain(e, maxIters = 5, minIters = 5)._1.size.toLong

    // round-10 shape: the LSH ingest path (signature build). The claim
    // under test: one 64-row broadcast nested-loop + one narrow
    // map-side-combinable groupBy — linear in vectors, so 10× corpus ⇒
    // ≈10× time; the shuffle carries (vec_id, tid, bucket) triples only,
    // never the 64-float vectors. (Amplified hyperplane rows are replica
    // mixes — irrelevant to cost shape, which is what this measures.)
    def lshSig(e: DataFrame): Long = {
      Graft.registerFunctions(spark)
      ops.Round10Ops.lshSignatures(e, ops.Round10Ops.lshHyperplanes(e)).count()
    }

    // round-11 shape: the composed corpus-build pipeline. The claim
    // under test: every stage is linear — map-only gate, dedup shuffle
    // of (sha256, doc_id), broadcast bench-shingle anti-join (the bench
    // side is ~1/97 of docs; amp keeps that fraction), per-source
    // packing windows — so 10× docs ⇒ ≈10× time, no stage quadratic in
    // the corpus.
    def corpus(docs: DataFrame): Long =
      ops.Round11Ops.corpusPipeline(docs).count()
    // text must VARY per replica: identical replicas would collapse in
    // the dedup stage and the downstream stages would run at 1×, hiding
    // their scaling. One appended replica token changes sha256 and adds
    // one word — cost shape preserved.
    def ampDocs(docs: DataFrame): DataFrame =
      docs.crossJoin(spark.range(N).toDF("rep_idx"))
        .withColumn("doc_id", col("doc_id") * N + col("rep_idx"))
        .withColumn("text", concat(col("text"), lit(" rep"), col("rep_idx")))
        .drop("rep_idx")

    // round-12 shape: the MERGE write path's COMPUTE (table_merge_upsert
    // minus the store IO). The claim under test: merge = one
    // key-partitioned FULL OUTER join of snapshot × pre-aggregated
    // changelog + a map-only coalesce projection — linear in keys, no
    // per-row re-read of either side. (The omitted parquet write is
    // trivially linear in output bytes; timing the plan isolates the
    // join shape the claim is about.)
    val cust12 = T.t(spark, sfDir, "customer")
    def mergeShape(c: DataFrame, o: DataFrame): Long = {
      val base = c.select(col("c_custkey").as("key"),
        T.dec(col("c_acctbal")).as("bal"))
      val chg = o.groupBy("o_custkey")
        .agg(sum(T.dec(col("o_totalprice"))).as("delta"))
      base.join(chg, col("key") === col("o_custkey"), "full")
        .select(coalesce(col("key"), col("o_custkey")).as("key"),
          (coalesce(col("bal"), lit(0)) + coalesce(col("delta"), lit(0)))
            .as("bal")).count()
    }

    // round-12 shape: the CDC delta (versionDelta's exceptAll of
    // adjacent snapshots). The claim under test: exceptAll is one hash
    // repartition of each side + a per-key counter — linear in rows,
    // never a pairwise compare.
    def cdcDelta(o: DataFrame): Long =
      o.exceptAll(o.filter(col("o_orderdate") <
        to_timestamp(lit("1997-01-01")))).count()

    // round-14 shape: the typed CDF general tier (changeFeed minus the
    // store IO): ONE full-outer key join of two snapshots, a null-safe
    // struct compare, and an explode emitting 0/1/2 rows per key. The
    // claim under test: linear in keys — the diff never pairs beyond
    // the key join, and the explode is map-side.
    def typedCdf(c: DataFrame, o: DataFrame): Long = {
      val prev = c.select(col("c_custkey").as("key"),
        T.dec(col("c_acctbal")).as("bal"))
      val curr = prev.join(o.groupBy("o_custkey")
          .agg(sum(T.dec(col("o_totalprice"))).as("d")),
          col("key") === col("o_custkey"), "left")
        .select(col("key"),
          (col("bal") + coalesce(col("d"), lit(0))).as("bal"))
      def pack(df: DataFrame, tag: String) =
        // cast-align both images to the widened decimal, as changeFeed
        // aligns the preimage side to the new version's types
        df.select(col("key"), struct(col("key"),
          col("bal").cast(org.apache.spark.sql.types.DecimalType(23, 2))
            .as("bal")).as(tag))
      pack(prev, "pr").join(pack(curr, "cu"), Seq("key"), "full_outer")
        .select(explode(
          when(col("pr").isNull,
            array(struct(col("cu").as("r"), lit("insert").as("t"))))
          .when(col("cu").isNull,
            array(struct(col("pr").as("r"), lit("delete").as("t"))))
          .when(!(col("pr") <=> col("cu")), array(
            struct(col("pr").as("r"), lit("update_preimage").as("t")),
            struct(col("cu").as("r"), lit("update_postimage").as("t"))))
          .otherwise(lit(null))).as("e")).count()
    }

    // round-14 shape: the Bloom index build (computeBloom's aggregation
    // with partition id standing in for the file name — the probe
    // writes nothing). The claim under test: k hash positions per row
    // then a per-(file, word) bit_or — the shuffle carries
    // |files × m/64| words, never rows, so 10× rows ⇒ ≈10× map work
    // over an unchanged reduce.
    def bloomBuild(o: DataFrame): Long = {
      val m = 65536L
      o.select(spark_partition_id().as("f"), col("o_custkey").as("x"))
        .where(col("x").isNotNull)
        .select(col("f"), explode(array((1 to 4).map(s =>
          pmod(xxhash64(col("x"), lit(s)), lit(m))): _*)).as("p"))
        .groupBy(col("f"), (col("p") / 64).cast("int").as("w"))
        .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("b"))
        .count()
    }

    // round-9 shape: pointer-jumping list rank. Amplifying BOTH keys
    // keeps every chain's length (and therefore the round count —
    // ceil(log2(maxChain)) — ) identical while each round processes 10×
    // rows. The claim under test: per-round cost is one key-partitioned
    // join over the frontier — linear in rows — so the loop is bounded
    // by log2(chain) × linear work, never by chain length itself.
    def listRank(o: DataFrame): Long =
      ops.Round9cOps.listRank(spark, o).count()

    // warm up IO + codegen once so both measurements are steady-state
    // (incl. first read of customer/supplier + the grid-join codegen and
    // the triangle edge-build, so their 1× rows are not cold-read IO)
    q1(li); joinAgg(ord, li); winLatest(ev); gridJoin(cust); triEdges(li)
    topkSpill(li); kmeans(emb); listRank(ord); lshSig(emb); corpus(docs)
    mergeShape(cust12, ord); cdcDelta(ord); typedCdf(cust12, ord)
    bloomBuild(ord); ()

    val results = Seq(
      ("agg_q1_shape", time(q1(li)), time(q1(amp(li, Seq("l_orderkey"))))),
      ("join_shuffle_agg", time(joinAgg(ord, li)),
        time(joinAgg(amp(ord, Seq("o_orderkey")), amp(li, Seq("l_orderkey"))))),
      ("win_latest", time(winLatest(ev)),
        time(winLatest(amp(ev, Seq("user_id", "event_id"))))),
      ("minhash_dedup", time(minhash(docs)),
        time(minhash(amp(docs, Seq("doc_id"))))),
      ("asof_merged_window", time(asof(ev)),
        time(asof(amp(ev, Seq("user_id", "event_id"))))),
      ("interval_bucketed_join", time(intervalJoin(ev)),
        time(intervalJoin(amp(ev, Seq("user_id", "event_id"))))),
      ("grid_spatial_join", time(gridJoin(cust)),
        time(gridJoin(amp(cust, Seq("c_custkey"))))),
      ("triangle_edge_distinct", time(triEdges(li)),
        time(triEdges(amp(li, Seq("l_orderkey"))))),
      ("topk_per_key_spill", time(topkSpill(li)),
        time(topkSpill(amp(li, Seq("l_orderkey"))))),
      ("kmeans_train_5iter", time(kmeans(emb)),
        time(kmeans(amp(emb, Seq("vec_id"))))),
      ("list_rank_pointer_jump", time(listRank(ord)),
        time(listRank(amp(ord, Seq("o_orderkey", "o_custkey"))))),
      ("lsh_signature_build", time(lshSig(emb)),
        time(lshSig(amp(emb, Seq("vec_id"))))),
      ("corpus_pipeline", time(corpus(docs)),
        time(corpus(ampDocs(docs)))),
      ("merge_upsert_shape", time(mergeShape(cust12, ord)),
        time(mergeShape(amp(cust12, Seq("c_custkey")),
          amp(ord, Seq("o_custkey"))))),
      ("cdc_delta_exceptall", time(cdcDelta(ord)),
        time(cdcDelta(amp(ord, Seq("o_orderkey"))))),
      ("typed_cdf_shape", time(typedCdf(cust12, ord)),
        time(typedCdf(amp(cust12, Seq("c_custkey")),
          amp(ord, Seq("o_custkey"))))),
      ("bloom_index_build", time(bloomBuild(ord)),
        time(bloomBuild(amp(ord, Seq("o_orderkey")))))
    )
    def r(v: Double): Double = math.rint(v * 1000) / 1000
    val json = results.map { case (k, t1, t10) =>
      s"""{"op":"$k","t1x":${r(t1)},"t10x":${r(t10)},"ratio":${r(t10 / t1)}}"""
    }.mkString("[", ",", "]")
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/scaling.json"), json)
    println(json)
    spark.stop()
  }
}
