package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query executes its full plan
  * (count() action) once untimed (whole-stage codegen compile + JIT of that
  * query's operators) and then THREE timed runs; the reported number is the
  * MEDIAN, with per-entry min/max kept in the JSON for variance visibility.
  * Round-3 investigation (graft.tools.ProfQ02, SCALE.md) showed single-shot
  * numbers are dominated by per-query codegen (q02: 3.4-6.4 s single-shot vs
  * 1.15 s steady-state median) — a constant that amortizes to zero on a
  * long-running cluster, which is the regime the bench is meant to predict.
  * Round-4 showed a second contamination mode: the graded snapshot was
  * captured on a loaded machine and overstated heavy entries 2-7x versus a
  * quiet-box rerun. The median-of-3 absorbs a transient spike hitting one
  * run, and the record is stamped with the OS load average at start and end
  * (OperatingSystemMXBean.getSystemLoadAverage) so a contaminated run is
  * self-identifying — a load average far above the core count means the
  * numbers measure the machine, not the engine. Cross-round comparisons
  * start from round 3 (single-shot r1/r2 numbers are not comparable).
  */
object Bench {
  private val TimedRuns = 3

  /** Per-entry contamination gate (round 8, VERDICT r7 task 1): the r7
    * record shipped with q03_bucketed_join 2.6× SLOWER than q03_flat_join
    * because a foreign process loaded the box mid-run — and the global
    * load-average stamps could not attribute the damage to an entry. The
    * 1-minute OS load is also too slow-moving to gate ~1 s entries, so the
    * per-entry sentinel measures EXTERNAL CPU SHARE directly: /proc/stat
    * busy ticks across the entry's timed window minus this JVM's own
    * process CPU time (Spark local mode is single-JVM, so own == the
    * bench). If more than [[MaxExternalShare]] of the machine's cycles in
    * the window went to someone else, the entry re-runs after a settle
    * (bounded retries); an entry still contaminated after the retries is
    * flagged in the JSON's "untrusted" map — a polluted number can no
    * longer ship silently as the round record.
    */
  private val MaxExternalShare = 0.10
  private val SentinelAttempts = 3

  /** Internal-spread gate (round 9, VERDICT r8 task 1): the external-CPU
    * sentinel is blind to I/O and page-cache contention — the filed r8
    * record shipped q03_flat_join with median 3.77 s over min 0.86 s and
    * `untrusted: {}` because the interloper was stealing disk, not
    * cycles. An entry whose own three runs disagree by more than
    * [[MaxSpread]]× is measuring the machine regardless of WHAT the
    * contention was, so it re-runs after a settle and ships flagged if
    * still spread. The [[SpreadFloorSec]] absolute floor keeps sub-second
    * entries from flapping on JIT/GC jitter — a 0.10 s vs 0.16 s pair is
    * a 1.6× ratio and entirely healthy; 0.86 s vs 3.77 s is not.
    */
  private val MaxSpread = 1.5
  private val SpreadFloorSec = 0.25

  /** Pair-ratio sentinel (round 11, VERDICT r10 task 8): entries that
    * exist as fast/slow DEMONSTRATION PAIRS (flat vs bucketed join,
    * append vs rebuild) are trusted for their RELATIONSHIP, and the r10
    * driver run showed both per-entry gates are blind to the failure mode
    * that breaks it — three uniformly-slow reps (q03_flat_join at 9.4×
    * its quiet value, zero spread, zero external CPU). The ratio is
    * immune to uniform slowdowns only when BOTH entries are hit, so gate
    * the measured ratio of each pair against the filed quiet-box record:
    * divergence beyond [[PairRatioTolerance]]× in either direction lands
    * in the JSON's "pair_alerts" map (and the compact line), flagging the
    * pair's STORY as contaminated even when each entry passed its own
    * gates. Update the record ratios when a code change legitimately
    * moves a pair (noted in SCALE.md alongside the record).
    */
  private val RecordPairRatios = Map(
    ("q03_flat_join", "q03_bucketed_join") -> 2.2,
    // round 11: the append's neighbor search now takes the driver-hosted
    // twin — quiet-box runs measure the pair at 0.84-1.10 (append 6.4-8.2
    // vs rebuild 7.5-7.7 s; r10 shipped 17.8 vs 7.6): the hop-latency
    // penalty is gone and the two are within host noise of each other at
    // the fixture; the durable argument stays commit volume (SCALE.md)
    ("graph_store_append", "graph_store_rebuild") -> 1.0,
    // round 12: the ring-stitched insert vs the plain one — the measured
    // price of never needing the O(corpus) rebuild (quiet-box ~15.9 vs
    // ~8.4 s at the 32k fixture: the stitch's roster jobs + delta commit)
    ("graph_store_append_ring", "graph_store_append") -> 1.9,
    // round 12: the warm serving cache where it bites — 5 sequential
    // batch-1 serves, cold re-reads seeds/adjacency/vectors per call,
    // warm pays once per store version (quiet-box ~9.4 vs ~0.86 s)
    ("graph_serve5_seq", "graph_serve5_seq_warm") -> 10.9,
    // round 12: the INSERT loop pair is commit-dominated at the fixture —
    // three delta commits + stitch + prune per batch dwarf the reads the
    // cache saves, so the honest ratio is ~1.1, not the serve pair's 11x
    ("streaming_graph_4b", "streaming_graph_4b_warm") -> 1.1)
  private val PairRatioTolerance = 3.0

  private final case class Stat(
      median: Double, min: Double, max: Double, failures: Int, error: String,
      externalShare: Double, untrusted: Boolean)
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup, then per-query warm+measure
    try SparkEntry.queries("q12_distinct_counts")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val loadAvgStart = systemLoadAverage()

    // GC + pause so an entry doesn't inherit the previous entry's heap/page-
    // cache debris — r5's streaming_dedup_trigger median (4.83 s vs min
    // 1.34 s) was contamination from running cold right after the 4batches
    // store build, not a plan regression.
    def settle(): Unit = {
      System.gc()
      Thread.sleep(1500)
    }

    def timed(name: String)(run: => Unit): (String, Stat) = {
      try run // warmup: codegen compile + JIT, untimed
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name warmup failed: ${e.getMessage}")
      }
      // a failed run records success=false, NOT a near-zero wall time — a
      // query broken in all three runs must surface as an error entry in
      // the JSON, never as a tiny median that reads as a performance win
      def attempt(): Stat = {
        var failures = 0
        var lastError = ""
        val ticks0 = procStatTicks()
        val ownNs0 = processCpuNs()
        val times = (0 until TimedRuns).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { run; true }
            catch { case e: Throwable =>
              failures += 1
              lastError = String.valueOf(e.getMessage)
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
            }
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }.sorted
        val ext = externalCpuShare(ticks0, procStatTicks(), ownNs0, processCpuNs())
        if (times.isEmpty)
          Stat(-1.0, -1.0, -1.0, failures, lastError, ext, untrusted = false)
        else {
          // two independent contamination detectors: external CPU share
          // (cycle theft) and internal run spread (I/O / page-cache theft
          // the tick counters cannot see — the r8 failure mode)
          val spread = times.last / math.max(times.head, 1e-9) > MaxSpread &&
            times.last - times.head > SpreadFloorSec
          Stat(median = times(times.length / 2), min = times.head,
            max = times.last, failures = failures, error = lastError,
            externalShare = ext,
            untrusted = ext > MaxExternalShare || spread)
        }
      }
      var stat = attempt()
      var tries = 1
      while (stat.untrusted && stat.failures == 0 && tries < SentinelAttempts) {
        System.err.println(f"[bench] $name contaminated window (external CPU " +
          f"share ${stat.externalShare}%.3f, spread min ${stat.min}%.3f s / " +
          f"max ${stat.max}%.3f s) — retrying after settle")
        settle()
        stat = attempt()
        tries += 1
      }
      name -> stat
    }

    // SPARK_GRAFT_BENCH_ONLY=prefix1,prefix2 runs only matching entries —
    // the Verify SPARK_GRAFT_ONLY twin for fast single-entry iteration.
    // Iteration aid only: a filtered record is NOT a round artifact.
    val onlyPrefixes = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      onlyPrefixes.forall(_.exists(name.startsWith))

    val headlineResults = SparkEntry.headline.filter(selected).map { name =>
      timed(name)(SparkEntry.queries(name)(spark, sfDir).count(): Unit)
    }
    // non-query benches: incremental streaming dedup (the accumulated-store
    // join cost must be tracked across rounds like q37) and amortized BM25
    // (precomputed lens table vs q38's inline corpus scan). The lens
    // materialization is the amortized, once-per-snapshot cost — written
    // here, OUTSIDE the timed region, by design.
    val lensDir = java.nio.file.Files.createTempDirectory("graft-bench-lens")
    val lensPath = lensDir.resolve("lens").toString
    // guarded like every timed entry: a failed lens write must cost only
    // the one extra that depends on it (timed() catches the read failure),
    // never the whole bench record
    try graft.operators.KeywordSearch.docLengths(
      Tables(spark, sfDir, "documents"), "doc_id", "text").write.parquet(lensPath)
    catch { case e: Throwable =>
      System.err.println(s"[bench] lens materialization failed: ${e.getMessage}")
    }
    val sdedupRoot = java.nio.file.Files.createTempDirectory("graft-bench-sdedup")
    // bucketed warehouse layout, built ONCE per bench run outside the timed
    // region (like the BM25 lens table): the write-side shuffle is the
    // amortized once-per-snapshot cost, the per-query win is the
    // exchange-free fact-fact join measured by q03_bucketed_join below
    // (against q03_flat_join, the same query over plain parquet).
    val bucketRoot = java.nio.file.Files.createTempDirectory("graft-bench-bucketed")
    try {
      spark.sql("DROP TABLE IF EXISTS bench_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS bench_o_bucketed")
      graft.sources.Warehouse.writeBucketed(
        Tables(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        "bench_li_bucketed", "l_orderkey", nBuckets = 32,
        path = Some(bucketRoot.resolve("li").toString))
      graft.sources.Warehouse.writeBucketed(
        Tables(spark, sfDir, "orders").select("o_orderkey", "o_orderstatus"),
        "bench_o_bucketed", "o_orderkey", nBuckets = 32,
        path = Some(bucketRoot.resolve("o").toString))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bucketed layout build failed: ${e.getMessage}")
    }
    // ANN setup, untimed (the amortized once-per-snapshot costs): the
    // frozen coarse index, the append entry's base store (90% of the
    // corpus — the timed append commits the remaining 10% delta), and the
    // graph-ANN neighbor graph the traversal entry searches over. The
    // store entries run over a ×16 id-remapped replication of the
    // embeddings table (32k vectors at sf0.1) — at fixture size both
    // rebuild and append are fixed-overhead-dominated and the delta-vs-
    // corpus cost gap the entries exist to measure would be invisible.
    val ivfRoot = java.nio.file.Files.createTempDirectory("graft-bench-ivf")
    try {
      import org.apache.spark.sql.functions.col
      val emb = Tables(spark, sfDir, "embeddings")
      val reps = spark.range(16).select(col("id").as("__rep"))
      emb.select(col("vec_id"), col("embedding")).crossJoin(reps)
        .withColumn("vec_id", col("vec_id") + col("__rep") * 100000000L)
        .drop("__rep")
        .write.mode("overwrite").parquet(ivfRoot.resolve("corpus").toString)
      val big = spark.read.parquet(ivfRoot.resolve("corpus").toString)
      benchIvfIndex = Some(graft.operators.IvfIndex.centroidsByDraw(
        big, "vec_id", "embedding", nCells = 16))
      graft.operators.IvfIndex.buildStoreVersioned(
        spark, ivfRoot.resolve("append").toString,
        big.filter(col("vec_id") % 10 =!= 0), "embedding", benchIvfIndex.get)
      benchGraph = Some(graft.operators.GraphAnn.buildGraph(
        emb, "vec_id", "embedding", m = 16).localCheckpoint())
      // round 10: the SERVING layout twin of graph_ann_search5 — the same
      // graph committed as a 64-bucket SnapshotStore so the traversal's
      // per-hop partition pruning (and its overhead) gets a tracked number
      graft.operators.GraphAnn.writeGraphStore(
        spark, ivfRoot.resolve("gserve").toString, benchGraph.get, nBuckets = 64)
      // round 10: the delta-append base — a graph over the ×16 corpus
      // minus an 8-node delta, stored at 512 buckets (bucket count well
      // above the delta's touched-src count, the sizing rule the append
      // savings depend on). Built untimed; the timed entries measure a
      // full rebuild of the 32k graph vs appending the 8 nodes.
      // graph-maintenance pair runs on the full ×16 corpus (32k nodes):
      // measured at ×4 (8k) the append's constant hop-latency floor
      // (~16 s) already exceeds the rebuild (~15 s), and the codegen
      // HyperplaneBucket rebuild (7.6 s at ×16) pushed the wall-time
      // crossover beyond the fixture entirely — locally the append
      // entry demos the hop-latency cost ceiling; the durable scale
      // argument is commit volume (O(delta) vs O(graph) bytes), not
      // local seconds. Both measured points and the honesty update
      // live in SCALE.md.
      val gBase = big.filter(col("vec_id") % 4096 =!= 0)
      graft.operators.GraphAnn.writeGraphStore(
        spark, ivfRoot.resolve("gappend").toString,
        graft.operators.GraphAnn.buildGraph(
          gBase, "vec_id", "embedding", m = 16, nBits = 12, nTables = 4),
        nBuckets = 512)
      // round 12: the ring roster for the stitched-append entry (built
      // untimed beside the graph, like any (re)build)
      graft.operators.RingRoster.write(
        spark, ivfRoot.resolve("gappend_ring").toString,
        gBase.select(col("vec_id")), "vec_id", nBuckets = 64)
      // round 12 (VERDICT r11 task 3): the streaming-insert store pairs —
      // one per cache regime so the cold and warm entries mutate disjoint
      // state. Small corpus and small layouts on purpose: the entries
      // measure the per-batch INSERT floor (driver-hosted beam + three
      // delta commits), which is read-latency-bound, not data-bound.
      val sgiBase = emb.filter(col("vec_id") < 1600)
        .select(col("vec_id"), col("embedding"))
      Seq("sgi_cold", "sgi_warm").foreach { tag =>
        graft.operators.GraphAnn.writeVectorStore(
          spark, ivfRoot.resolve(s"$tag/v").toString, sgiBase, "vec_id",
          nBuckets = 16)
        graft.operators.GraphAnn.writeGraphStore(
          spark, ivfRoot.resolve(s"$tag/g").toString,
          graft.operators.GraphAnn.buildGraph(
            sgiBase, "vec_id", "embedding", m = 8, nBits = 5),
          nBuckets = 16)
        graft.operators.RingRoster.write(
          spark, ivfRoot.resolve(s"$tag/r").toString,
          sgiBase.select(col("vec_id")), "vec_id", nBuckets = 32)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ANN setup failed: ${e.getMessage}")
    }
    val extras = Seq(
      "streaming_dedup_4batches" -> (() => streamingDedup4Batches(spark, sfDir, sdedupRoot)),
      // steady-state trigger regime: a small re-ingest batch against the
      // store accumulated above — the bucket-pruned read is what a
      // long-running stream pays per trigger (the 4batches entry is the
      // bootstrap regime where every batch covers all buckets)
      "streaming_dedup_trigger" -> (() => streamingDedupTrigger(spark, sfDir)),
      // same 4-batch loop under the round-9 commit-every-N knob (one store
      // flush instead of four): the delta vs 4batches is the measured
      // commit-overhead saving of StreamingDedup.run(commitEveryN = 4)
      "streaming_dedup_4batches_batchedcommit" ->
        (() => streamingDedup4BatchesBatchedCommit(spark, sfDir, sdedupRoot)),
      // q3m runs the oracled default stage set; this tracks the FULL
      // seven-stage pipeline (adds transitive MinHash near-dup CC + the
      // LM surprisal band) so the complete curation cost moves per round
      "q3m_full_curation" -> (() => curateFull(spark, sfDir)),
      "q38_bm25_precomputed" -> (() => bm25Precomputed(spark, sfDir, lensPath)),
      // the classifier's serving split: q5a times featurize+train+score;
      // this times the SCORE-ONLY pass under a model trained once outside
      // the timed region — the per-corpus-pass cost a 100 TB pipeline
      // actually pays after training on its labeled slice
      "q5a_score_precomputed" -> (() => classifierScoreOnly(spark, sfDir)),
      // same q03-shaped fact-fact revenue join twice: over plain parquet
      // (shuffles both sides) and over the bucketed layout (exchange-free
      // below the SMJ) — the measured delta IS the bucketing win
      "q03_flat_join" -> (() => factJoinRevenue(spark,
        Tables(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        Tables(spark, sfDir, "orders").select("o_orderkey", "o_orderstatus"))),
      "q03_bucketed_join" -> (() => factJoinRevenue(spark,
        spark.table("bench_li_bucketed"), spark.table("bench_o_bucketed"))),
      // versioned ANN store lifecycle (round 9): a full rebuild commits the
      // whole corpus re-quantized; an incremental append commits only a 10%
      // delta assigned with frozen centroids — the measured gap is why the
      // upsert path exists (reference parity: continuous vector upserts)
      "ivf_store_rebuild" -> (() => ivfStoreRebuild(spark, sfDir, ivfRoot)),
      "ivf_store_append" -> (() => ivfStoreAppend(spark, sfDir, ivfRoot)),
      // round 10: the drift-repair loop over the append store — localize
      // (one cellQuality pass over the full store) + repair (Lloyd over
      // ONLY the 4 worst cells' members, partition-level replace commit).
      // Sits between append (delta-only) and rebuild (everything): the
      // measured cost of acting on the assignQuality alarm without a
      // rebuild
      "ivf_store_refresh" -> (() => ivfStoreRefresh(spark, ivfRoot)),
      // graph-ANN beam tier (round 9): the per-query-batch traversal cost
      // over a pre-built neighbor graph (build is the amortized
      // once-per-snapshot cost, paid outside the timed region like the
      // BM25 lens table)
      "graph_ann_search5" -> (() => graphAnnSearch(spark, sfDir)),
      // round 10 (VERDICT r9 task 8): the same 5-query traversal over the
      // bucketed SnapshotStore layout with per-hop partition pruning —
      // the layout a deployment actually serves from; the delta vs
      // graph_ann_search5 is the store read + prune overhead
      "graph_ann_search5_store" -> (() => graphAnnSearchStore(spark, sfDir, ivfRoot)),
      // round 11 (VERDICT r10 task 4): the DRIVER-HOSTED small-batch twin
      // over the same store — identical results (GraphAnnSpec-gated), but
      // per hop two bounded collects instead of the distributed loop's
      // window/checkpoint DAGs. batch-1 is the latency floor the task
      // named (~12 s distributed); batch-5 is the direct comparison
      // against graph_ann_search5_store
      "graph_ann_search1_local" -> (() => graphAnnSearchLocal(spark, sfDir, ivfRoot, 1)),
      "graph_ann_search5_local" -> (() => graphAnnSearchLocal(spark, sfDir, ivfRoot, 5)),
      // round 12 (VERDICT r11 task 3): the warm serving cache where it
      // bites — a SERVING loop (5 sequential batch-1 searches against an
      // unchanged store). Cold pays the seed job + per-hop adjacency and
      // vector fetches on every call; warm pays them once per store
      // version (the handle survives calls AND runs: the store never
      // changes, so even the untimed warmup leaves it hot — the measured
      // number IS the steady serve floor)
      "graph_serve5_seq" -> (() => graphAnnServeLoop(spark, sfDir, ivfRoot, warm = false)),
      "graph_serve5_seq_warm" -> (() => graphAnnServeLoop(spark, sfDir, ivfRoot, warm = true)),
      // round 10 (VERDICT r9 task 1): graph-index maintenance — a full
      // rebuild re-runs the LSH build over all 32k vectors and commits the
      // whole edge table; the append beam-searches an 8-node delta
      // (corpus-size-independent hop cost) and commits only the touched
      // src_bucket partitions via replacePartitions
      "graph_store_rebuild" -> (() => graphStoreRebuild(spark, ivfRoot)),
      "graph_store_append" -> (() => graphStoreAppend(spark, ivfRoot)),
      // round 12 (VERDICT r11 task 1): the SAME 8-node insert with ring
      // maintenance armed — finger stitch against the 32k roster + the
      // roster delta commit ride along; the delta vs graph_store_append
      // is the measured price of never needing the O(corpus) rebuild
      // (which graph_store_rebuild prices directly above)
      "graph_store_append_ring" -> (() => graphStoreAppendRing(spark, ivfRoot)),
      // round 12 (VERDICT r11 task 3): a 4-batch streaming graph insert
      // loop (three delta commits per batch: corpus upsert + graph append
      // + roster) cold vs with the store-version-keyed warm serving cache
      // — the delta is the adjacency/vector/seed re-read a steady-state
      // insert loop no longer pays per batch
      "streaming_graph_4b" -> (() => streamingGraphInsert(spark, sfDir, ivfRoot, warm = false)),
      "streaming_graph_4b_warm" -> (() => streamingGraphInsert(spark, sfDir, ivfRoot, warm = true)))
    val extraResults = extras.filter(e => selected(e._1))
      .map { case (name, fn) => settle(); timed(name)(fn()) }
    // repeated per-round runs must not accumulate /tmp parquet
    try {
      spark.sql("DROP TABLE IF EXISTS bench_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS bench_o_bucketed")
    } catch { case _: Throwable => () }
    deleteRecursively(lensDir)
    deleteRecursively(sdedupRoot)
    deleteRecursively(bucketRoot)
    deleteRecursively(ivfRoot)
    val results = headlineResults ++ extraResults
    // Measured scaling curvature (round 8, VERDICT r7 task 4): answer
    // "survives 100×?" with data. Six representative kernels timed at
    // 1×/2×/4×/8× of sf0.1 (synthetic replication with key-space
    // remapping, built untimed), per-entry log-log exponent fitted over
    // the four points. SPARK_GRAFT_SCALING=0 skips while iterating.
    val scalingJson =
      if (sys.env.get("SPARK_GRAFT_SCALING").contains("0")) "{}"
      else
        try scalingPhase(spark, sfDir, settle _)
        catch { case e: Throwable =>
          System.err.println(s"[bench] scaling phase failed: ${e.getMessage}")
          "{}"
        }
    val loadAvgEnd = systemLoadAverage()
    // "queries" stays the driver-contract map name→seconds (now the median);
    // min/max and the load sentinel are appended keys so any round-over-round
    // comparison can tell a plan regression from a loaded machine. Entries
    // whose every timed run failed are EXCLUDED from the timing maps and
    // reported under "errors" instead — a broken query must never read as a
    // fast one; partially-failed entries keep their surviving-run median but
    // are flagged in "errors" too.
    val (okResults, deadResults) = results.partition(_._2.median >= 0)
    def statMap(f: Stat => Double): String = okResults
      .map { case (k, s) => "\"" + k + "\":" + f(s) }.mkString("{", ",", "}")
    val qs = statMap(_.median)
    val total = okResults.map(_._2.median).sum
    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errs = (deadResults ++ okResults.filter(_._2.failures > 0))
      .map { case (k, s) =>
        "\"" + k + "\":" + jsonStr(s"${s.failures}/$TimedRuns runs failed: ${s.error}")
      }.mkString("{", ",", "}")
    // per-entry sentinel verdicts: external CPU share of each entry's final
    // timed window, plus the entries still contaminated after the bounded
    // retries — an empty "untrusted" map is the quiet-box certificate
    val extShares = okResults
      .map { case (k, s) => "\"" + k + "\":" + f"${s.externalShare}%.4f" }
      .mkString("{", ",", "}")
    val untrusted = okResults.filter(_._2.untrusted)
      .map { case (k, s) => "\"" + k + "\":" + f"${s.externalShare}%.4f" }
      .mkString("{", ",", "}")
    // pair-ratio sentinel: measured ratio of each demonstration pair vs
    // the filed record; divergence past the tolerance is an alert even
    // when both entries passed their own per-entry gates
    val medians = okResults.map { case (k, s) => k -> s.median }.toMap
    val pairChecks = RecordPairRatios.toSeq
      .sortBy { case ((a, _), _) => a }
      .flatMap { case ((a, b), rec) =>
        for (ma <- medians.get(a); mb <- medians.get(b) if ma > 0 && mb > 0)
          yield {
            val ratio = ma / mb
            val bad = ratio > rec * PairRatioTolerance ||
              ratio < rec / PairRatioTolerance
            (s"$a/$b", ratio, bad)
          }
      }
    val pairRatios = pairChecks
      .map { case (k, r, _) => "\"" + k + "\":" + f"$r%.3f" }
      .mkString("{", ",", "}")
    val pairAlerts = pairChecks.filter(_._3)
      .map { case (k, r, _) => "\"" + k + "\":" + f"$r%.3f" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""runs_per_entry":$TimedRuns,"queries_min":${statMap(_.min)},""" +
        s""""queries_max":${statMap(_.max)},"errors":$errs,""" +
        s""""external_cpu_share":$extShares,"untrusted":$untrusted,""" +
        s""""pair_ratios":$pairRatios,"pair_alerts":$pairAlerts,""" +
        s""""max_external_share":$MaxExternalShare,""" +
        s""""max_spread":$MaxSpread,"spread_floor_sec":$SpreadFloorSec,""" +
        s""""scaling":$scalingJson,""" +
        s""""load_avg_start":$loadAvgStart,""" +
        s""""load_avg_end":$loadAvgEnd,"cpus":"$cpus","sf":"$sfDir"}"""
    // Also write the JSON to a file so the driver gets a machine-parseable
    // record even when stdout is wrapped in sbt [info] log noise.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // The driver's BENCH_r{N}.json keeps only the LAST 2000 stdout chars
    // and parses them — rounds 5-7 shipped "parsed": null because the full
    // record outgrew that window (the detail lives in bench_out.json, but
    // the round artifact went machine-unreadable). The stdout line is
    // therefore a COMPACT driver-contract record: medians at ms precision
    // plus the two contamination stamps; min/max/shares/scaling stay in
    // bench_out.json. A guard degrades precision rather than ever
    // exceeding the window again.
    def compactLine(decimals: Int): String = {
      def fmt(v: Double): String = {
        val s = java.math.BigDecimal.valueOf(v)
          .setScale(decimals, java.math.RoundingMode.HALF_UP)
        s.toPlainString
      }
      val qsC = okResults
        .map { case (k, s) => "\"" + k + "\":" + fmt(s.median) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""queries":$qsC,"errors":$errs,"untrusted":$untrusted,""" +
        s""""pair_alerts":$pairAlerts,""" +
        f""""load_avg_start":$loadAvgStart%.2f,""" +
        f""""load_avg_end":$loadAvgEnd%.2f,"sf":"$sfDir"}"""
    }
    val compact = Seq(3, 2, 1).map(compactLine).find(_.length <= 1950)
      .getOrElse(compactLine(1))
    if (compact.length > 1950)
      System.err.println(s"[bench] compact line still ${compact.length} " +
        "chars — exceeds the driver's 2000-char stdout tail window")
    // run_verify.sh re-emits the bench record as the true final stdout
    // line (after JVM shutdown noise) — it must re-emit the COMPACT form,
    // so that lands in its own file beside the full record.
    val linePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_LINE",
      "bench_line.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(linePath),
      (compact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $linePath: ${e.getMessage}")
    }
    spark.stop()
    // Print LAST, after spark.stop(), so the JSON is the final stdout line
    // (Spark shutdown logs go to stderr; sbt passes stdout through bare via
    // outputStrategy := StdoutOutput in build.sbt).
    println(compact)
  }

  /** The documents corpus split into 4 micro-batches driven through
    * StreamingDedup.processBatch against an accumulating parquet signature
    * store — the foreachBatch body without the stream harness, so the
    * store-scan + broadcast-join cost per batch is what's measured.
    */
  /** Store path of the most recent 4-batch run — the accumulated-store
    * fixture for the trigger-regime entry below.
    */
  private var lastStorePath: Option[String] = None
  // ANN setup built once, untimed, in main (see the ivfRoot block)
  private var benchIvfIndex: Option[graft.operators.IvfIndex.Index] = None
  private var benchGraph: Option[org.apache.spark.sql.DataFrame] = None

  /** Full versioned rebuild of the int8 IVF store over the ×16 replicated
    * corpus: re-quantize + re-assign everything and commit. The cost
    * baseline the append entry is measured against.
    */
  private def ivfStoreRebuild(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path): Unit = {
    val idx = benchIvfIndex.getOrElse(
      throw new IllegalStateException("ANN setup failed — no index"))
    graft.operators.IvfIndex.buildStoreVersioned(
      spark, root.resolve("rebuild").toString,
      spark.read.parquet(root.resolve("corpus").toString), "embedding", idx)
    ()
  }

  /** Incremental append of a 10% delta (frozen centroids) into the base
    * store built at setup — the continuous-upsert path. Each timed run
    * commits one more delta version; per-run work is delta-sized and
    * constant (append never rewrites committed dirs).
    */
  private def ivfStoreAppend(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path): Unit = {
    val idx = benchIvfIndex.getOrElse(
      throw new IllegalStateException("ANN setup failed — no index"))
    graft.operators.IvfIndex.appendToStore(
      spark, root.resolve("append").toString,
      spark.read.parquet(root.resolve("corpus").toString)
        .filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0),
      "embedding", idx)
    ()
  }

  /** The drift-repair loop (alarm → localize → repair) on the append
    * store: one full-store [[graft.operators.IvfIndex.cellQuality]] scan
    * names the 4 least-cohesive cells, then
    * [[graft.operators.IvfIndex.refreshCells]] re-fits ONLY their members
    * (2 Lloyd rounds) and commits a partition-level replace. The entry's
    * cost is localize + repair; the repair leg alone is delta-sized.
    *
    * Cumulative-run convention (round-10 ADVICE, noted not "fixed"): each
    * execution — warm-up and the three timed runs alike — commits its
    * repair to the shared store, so successive runs score a progressively
    * repaired store against the UNCHANGED benchIvfIndex centroids and the
    * "4 worst cells" target drifts toward already-repaired cells. That is
    * the same cumulative convention the append entry uses (every run
    * commits one more delta); the measured shape — one full-store
    * localize pass + a 4-cell partition-pruned repair — is identical run
    * over run, which is what the entry tracks. Refreshing a per-run store
    * copy would add a store-sized untimed copy per rep for no shape
    * change.
    */
  private def ivfStoreRefresh(
      spark: SparkSession, root: java.nio.file.Path): Unit = {
    val idx = benchIvfIndex.getOrElse(
      throw new IllegalStateException("ANN setup failed — no index"))
    val sroot = root.resolve("append").toString
    val live = graft.operators.IvfIndex.readStoreLatest(spark, sroot, "vec_id")
    val worst = graft.operators.IvfIndex.worstCells(
      graft.operators.IvfIndex.cellQuality(live, "q8", "scale", idx), k = 4)
    val (_, v) = graft.operators.IvfIndex.refreshCells(
      spark, sroot, idx, worst, "vec_id")
    // steady state (round 12, VERDICT r11 task 4 / r11 ADVICE A2): discard
    // the repair commit, so EVERY execution — warm, timed, and every later
    // round — localizes and repairs the SAME store image (the same worst
    // cells, the same member volume) instead of progressively healing it;
    // the measured region still includes the full localize + Lloyd +
    // partition-replace commit cost (the discard itself is two file ops)
    graft.sources.SnapshotStore.discardVersion(spark, sroot, v)
    ()
  }

  /** Batch beam traversal over the pre-built neighbor graph: 5 queries
    * traverse simultaneously through the iterative frontier loop — the
    * measured per-batch serving cost of the graph tier (the 0.95+-recall
    * configuration RecallSpec gates at sf0.1).
    */
  private def graphAnnSearch(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val g = benchGraph.getOrElse(
      throw new IllegalStateException("ANN setup failed — no graph"))
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    graft.operators.GraphAnn.searchMany(
      g, emb, queries, "q_id", "qv", "vec_id", "embedding",
      k = 10, beamWidth = 96, maxHops = 24, nSeeds = 4, expandPerHop = 8)
      .count()
    ()
  }

  /** The graph_ann_search5 batch over the bucketed SnapshotStore layout:
    * every hop restricts the edge scan to the frontier's src_bucket
    * partitions (plan-gated PartitionFilter) before the equality join.
    */
  private def graphAnnSearchStore(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions.col
    val g = graft.operators.GraphAnn.readGraphStore(
      spark, root.resolve("gserve").toString)
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    graft.operators.GraphAnn.searchMany(
      g, emb, queries, "q_id", "qv", "vec_id", "embedding",
      k = 10, beamWidth = 96, maxHops = 24, nSeeds = 4, expandPerHop = 8,
      srcBuckets = Some(64))
      .count()
    ()
  }

  /** The SAME store traversal through the driver-hosted twin
    * (searchManyLocal, round 11): per hop one bucket-pruned adjacency
    * collect + one candidate-vector collect, beam bookkeeping on the
    * driver. Search parameters identical to graph_ann_search5_store, so
    * the entry pair measures exactly the distributed loop's fixed per-hop
    * cost.
    */
  private val gserveWarmCache = new graft.operators.GraphAnn.ServingCache

  /** Five SEQUENTIAL batch-1 searches against the unchanged `gserve`
    * store — the steady-state serving loop. `warm = true` routes all five
    * through the shared version-keyed handle (seed image + adjacency +
    * vectors reused across calls; the raw embeddings table is keyed as a
    * constant pseudo-version since nothing rewrites it during a bench
    * run); `warm = false` lets each call rebuild its caches from scratch,
    * which is what serving paid every call before round 12.
    */
  private def graphAnnServeLoop(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path,
      warm: Boolean): Unit = {
    import org.apache.spark.sql.functions.col
    val groot = root.resolve("gserve").toString
    val g = graft.operators.GraphAnn.readGraphStore(spark, groot)
    val emb = Tables(spark, sfDir, "embeddings")
    val cache = if (warm) {
      gserveWarmCache.ensure(
        s"raw:$sfDir/embeddings", 0, groot,
        graft.sources.SnapshotStore.currentVersion(spark, groot).getOrElse(0))
      Some(gserveWarmCache)
    } else None
    (0 until 5).foreach { q =>
      val queries = emb.filter(col("vec_id") === q)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      graft.operators.GraphAnn.searchManyLocal(
        g, emb, queries, "q_id", "qv", "vec_id", "embedding",
        k = 10, beamWidth = 96, maxHops = 24, nSeeds = 4, expandPerHop = 8,
        srcBuckets = Some(64), cache = cache)
        .count()
    }
  }

  private def graphAnnSearchLocal(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path,
      nQueries: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val g = graft.operators.GraphAnn.readGraphStore(
      spark, root.resolve("gserve").toString)
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    graft.operators.GraphAnn.searchManyLocal(
      g, emb, queries, "q_id", "qv", "vec_id", "embedding",
      k = 10, beamWidth = 96, maxHops = 24, nSeeds = 4, expandPerHop = 8,
      srcBuckets = Some(64))
      .count()
    ()
  }

  /** Full graph-index rebuild over the ×16 replicated corpus: re-run the
    * LSH-banded build and commit the complete edge table — the cost
    * baseline graph_store_append is measured against (it scales with the
    * CORPUS; the append scales with the DELTA).
    */
  private def graphStoreRebuild(
      spark: SparkSession, root: java.nio.file.Path): Unit = {
    val gBig = spark.read.parquet(root.resolve("corpus").toString)
    graft.operators.GraphAnn.writeGraphStore(
      spark, root.resolve("grebuild").toString,
      graft.operators.GraphAnn.buildGraph(
        gBig, "vec_id", "embedding", m = 16, nBits = 12, nTables = 4),
      nBuckets = 512)
    ()
  }

  /** Incremental 8-node insert into the pre-built 32k-node graph store:
    * the delta finds its neighbors by the graph's own beam search (hop
    * cost independent of corpus size) and the commit rewrites only the
    * touched src_bucket partitions, re-referencing the rest.
    */
  private def graphStoreAppend(
      spark: SparkSession, root: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions.col
    val gBig = spark.read.parquet(root.resolve("corpus").toString)
    graft.operators.GraphAnn.appendNodesToStore(
      spark, root.resolve("gappend").toString,
      gBig.filter(col("vec_id") % 4096 =!= 0),
      gBig.filter(col("vec_id") % 4096 === 0),
      "vec_id", "embedding", m = 16, maxDegree = 48, nBuckets = 512)
    ()
  }

  /** The [[graphStoreAppend]] delta with ring maintenance armed: fingers
    * stitched against the pre-built 32k roster + the roster delta commit.
    * Shares the gappend store with the plain entry (cumulative-append
    * convention), so the per-invocation work shape stays the 8-node
    * insert ± the stitch.
    */
  private def graphStoreAppendRing(
      spark: SparkSession, root: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions.col
    val gBig = spark.read.parquet(root.resolve("corpus").toString)
    graft.operators.GraphAnn.appendNodesToStore(
      spark, root.resolve("gappend").toString,
      gBig.filter(col("vec_id") % 4096 =!= 0),
      gBig.filter(col("vec_id") % 4096 === 0),
      "vec_id", "embedding", m = 16, maxDegree = 48, nBuckets = 512,
      ringRoot = Some(root.resolve("gappend_ring").toString),
      rosterBuckets = 64)
    ()
  }

  // monotonic epoch counter shared by both streaming-insert entries: every
  // run's batch ids are globally fresh, so the durable `_tags` replay
  // guards (which survive the end-of-run version discard) never suppress a
  // later run's work
  private var sgiEpoch = 0
  private val sgiWarmCache = new graft.operators.GraphAnn.ServingCache

  /** A 4-batch streaming graph insert through the REAL
    * `StreamingGraphIndex.processBatch` (corpus upsert + graph append +
    * roster join per batch), cold or with the warm serving-cache handle.
    * The warm entry's first batch fills the cache; batches 2-4 measure
    * the steady state the handle exists for.
    *
    * STEADY-STATE by construction (the ivf_store_refresh discipline, r11
    * ADVICE A2 generalized): the run's 12 delta commits are discarded at
    * the end (cheap file ops inside the timed window), so every rep — and
    * every later round — inserts into the IDENTICAL store image instead
    * of a monotonically growing one. The first artifact shipped without
    * the discard and measured exactly that failure: reps slowed 59 →
    * 103 → 135 s as `readVectorStoreLatest` unioned one scan per
    * accumulated commit dir. Batch ids stay monotonically fresh across
    * runs via `sgiEpoch`; node ids can repeat because the stores reset.
    */
  private def streamingGraphInsert(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path,
      warm: Boolean): Unit = {
    import org.apache.spark.sql.functions.col
    val tag = if (warm) "sgi_warm" else "sgi_cold"
    val k = sgiEpoch
    sgiEpoch += 1
    val emb = Tables(spark, sfDir, "embeddings")
    val (groot, vroot, rroot) = (root.resolve(s"$tag/g").toString,
      root.resolve(s"$tag/v").toString, root.resolve(s"$tag/r").toString)
    val cfg = graft.streaming.StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 16,
      beamWidth = 16, maxHops = 6,
      ringRoot = Some(rroot), rosterBuckets = 32)
    val cache = if (warm) Some(sgiWarmCache) else None
    def v0(r: String) =
      graft.sources.SnapshotStore.currentVersion(spark, r).getOrElse(0)
    val bases = Seq(groot, vroot, rroot).map(r => r -> v0(r))
    (0 until 4).foreach { j =>
      val lo = 1600 + j * 8
      val batch = emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 8)
        .select(col("vec_id"), col("embedding"))
      graft.streaming.StreamingGraphIndex.processBatch(
        spark, batch, (k * 4 + j).toLong, groot, vroot,
        "vec_id", "embedding", cfg, cache)
    }
    bases.foreach { case (r, base) =>
      while (v0(r) > base)
        graft.sources.SnapshotStore.discardVersion(spark, r, v0(r))
    }
  }

  private def streamingDedup4Batches(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory(root, "run")
    val storePath = tmp.resolve("store").toString
    val outPath = tmp.resolve("out").toString
    val docs = Tables(spark, sfDir, "documents")
    (0 until 4).foreach { b =>
      val batch = docs.filter(col("doc_id") % 4 === b)
      val store = graft.streaming.StreamingDedup.readStore(
        spark, storePath, excludeBatchId = Some(b.toLong))
      val (survivors, survivorRows) = graft.streaming.StreamingDedup
        .processBatch(batch, store, "doc_id", "text")
      survivors.withColumn("batch_id", lit(b.toLong))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(outPath)
      survivorRows.withColumn("batch_id", lit(b.toLong))
        .repartition(col("band_bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "band_bucket").parquet(storePath)
    }
    lastStorePath = Some(storePath) // root is deleted by main after all entries
  }

  /** The same 4-batch drive with survivor band rows buffered and ONE
    * store flush at the end — the `commitEveryN = 4` trigger path,
    * executed through [[graft.streaming.StreamingDedup.processBatchDeferred]]
    * and [[graft.streaming.StreamingDedup.flushPending]] — the EXACT
    * helpers `run()` drives, so the measured delta vs the per-batch entry
    * is production's commit-overhead saving, not a reimplementation's.
    */
  private def streamingDedup4BatchesBatchedCommit(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory(root, "runN")
    val storePath = tmp.resolve("store").toString
    val outPath = tmp.resolve("out").toString
    val docs = Tables(spark, sfDir, "documents")
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    (0 until 4).foreach { b =>
      graft.streaming.StreamingDedup.processBatchDeferred(
        spark, docs.filter(col("doc_id") % 4 === b), b.toLong,
        storePath, outPath, "doc_id", "text", minEstJaccard = 0.8, pending)
    }
    graft.streaming.StreamingDedup.flushPending(pending, storePath)
  }

  /** A 2-doc re-ingest trigger against the accumulated store: measures the
    * per-trigger cost a long-running stream pays — the band_bucket-pruned
    * store read plus the broadcast band join (no writes; the write cost is
    * covered by the 4batches entry).
    */
  private def streamingDedupTrigger(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val storePath = lastStorePath.getOrElse(
      throw new IllegalStateException("4batches entry must run first"))
    val batch = Tables(spark, sfDir, "documents").filter(col("doc_id") < 2)
    val store = graft.streaming.StreamingDedup.readStore(spark, storePath)
    val (survivors, _) = graft.streaming.StreamingDedup
      .processBatch(batch, store, "doc_id", "text")
    survivors.count()
    ()
  }

  /** The q03-shaped fact-fact revenue join (lineitem ⋈ orders on orderkey,
    * revenue per order). Broadcast and AQE are pinned OFF for the run so
    * both the flat and the bucketed entry execute a sort-merge join — the
    * measured difference between them is then exactly the two shuffle
    * exchanges the bucketed layout removes, which is the comparison that
    * predicts the 100 TB fact-fact join (where neither side broadcasts).
    */
  private def factJoinRevenue(
      spark: SparkSession,
      li: org.apache.spark.sql.DataFrame,
      o: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
        .count()
      ()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** The measured-scaling phase: replicate lineitem/orders/events/documents
    * ×{2,4,8} with key-space remapping (replica r offsets every join/group
    * key, and perturbs document text, so result sizes scale linearly —
    * byte-identical replicas would near-dup quadratically and measure the
    * data, not the operator), write each scale to temp parquet UNTIMED so
    * scans are real file scans, then time six representative kernels per
    * scale: columnar scan+agg, SMJ fact join, per-user session window, the
    * two-pass global row number, MinHash banding, and iterative
    * connected components. Per entry: warm + 2 timed runs, min (exponent
    * fits want the noise floor), and the least-squares slope of
    * ln(time) over ln(scale) — ~1.0 = linear, >1.3 flags a plan for
    * investigation (SCALE.md carries the table).
    */
  private def scalingPhase(
      spark: SparkSession, sfDir: String, settle: () => Unit): String = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val scales = Seq(1, 2, 4, 8)
    val root = java.nio.file.Files.createTempDirectory("graft-bench-scaling")
    try {
      def replicate(df: DataFrame, k: Int, remap: (DataFrame, org.apache.spark.sql.Column) => DataFrame): DataFrame = {
        val reps = df.sparkSession.range(k).select(col("id").cast("int").as("__rep"))
        remap(df.crossJoin(reps), col("__rep")).drop("__rep")
      }
      val off = 100000000L
      def store(name: String, k: Int, df: DataFrame): String = {
        val p = root.resolve(s"$name-x$k").toString
        df.write.mode("overwrite").parquet(p)
        p
      }
      val li0 = Tables(spark, sfDir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice",
        "l_discount", "l_returnflag", "l_linestatus", "l_quantity")
      val o0 = Tables(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      val ev0 = Tables(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      val d0 = Tables(spark, sfDir, "documents").select("doc_id", "text")
      val paths: Map[(String, Int), String] = scales.flatMap { k =>
        val li = replicate(li0, k, (df, r) => df
          .withColumn("l_orderkey", col("l_orderkey") + r.cast("long") * off))
        val o = replicate(o0, k, (df, r) => df
          .withColumn("o_orderkey", col("o_orderkey") + r.cast("long") * off)
          .withColumn("o_custkey", col("o_custkey") + r.cast("long") * off))
        val ev = replicate(ev0, k, (df, r) => df
          .withColumn("user_id", col("user_id") + r.cast("long") * off)
          .withColumn("event_id", col("event_id") + r.cast("long") * off))
        val d = replicate(d0, k, (df, r) => df
          .withColumn("doc_id", col("doc_id") + r.cast("long") * off)
          // per-replica text perturbation: replica 0 stays original, others
          // get a distinct suffix so shingles differ across replicas
          .withColumn("text",
            when(r === 0, col("text"))
              .otherwise(concat(col("text"), lit(" zz"), r.cast("string")))))
        Seq(("li", k) -> store("li", k, li), ("o", k) -> store("o", k, o),
          ("ev", k) -> store("ev", k, ev), ("d", k) -> store("d", k, d))
      }.toMap
      def rd(name: String, k: Int): DataFrame = spark.read.parquet(paths((name, k)))

      val kernels: Seq[(String, Int => Unit)] = Seq(
        "scan_agg" -> { k =>
          rd("li", k).groupBy("l_returnflag", "l_linestatus")
            .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
              avg(col("l_extendedprice")).as("ap"), count(lit(1)).as("n"))
            .count(): Unit
        },
        "fact_join" -> { k =>
          factJoinRevenue(spark,
            rd("li", k).select("l_orderkey", "l_extendedprice", "l_discount"),
            rd("o", k))
        },
        "session_window" -> { k =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts_ms", "event_id")
          rd("ev", k)
            .withColumn("gap", col("ts_ms") - lag("ts_ms", 1).over(w))
            .withColumn("new_s",
              when(col("gap").isNull || col("gap") > 1800000L, 1).otherwise(0))
            .withColumn("sid", sum("new_s").over(w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
            .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
            .count(): Unit
        },
        "global_rownum" -> { k =>
          graft.operators.ScaleOps.globalRowNumber(
            rd("li", k),
            Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")))
            .filter(col("rn") <= 100).count(): Unit
        },
        "minhash_pairs" -> { k =>
          graft.operators.Dedup.minhashCandidatePairs(
            rd("d", k), "doc_id", "text", minEstJaccard = 0.4).count(): Unit
        },
        "dedup_cc" -> { k =>
          graft.operators.Dedup.connectedComponents(
            graft.operators.Dedup.minhashCandidatePairs(
              rd("d", k), "doc_id", "text", minEstJaccard = 0.4)).count(): Unit
        })

      def lite(run: => Unit): Double = {
        try run catch { case _: Throwable => () } // warm
        var best = Double.MaxValue
        var attempt = 0
        var tries = 0
        while (attempt < 2 && tries < 4) {
          val t0p = procStatTicks(); val o0p = processCpuNs()
          val t0 = System.nanoTime()
          run
          val dt = (System.nanoTime() - t0) / 1e9
          val ext = externalCpuShare(t0p, procStatTicks(), o0p, processCpuNs())
          tries += 1
          if (ext <= MaxExternalShare || ext < 0) { best = math.min(best, dt); attempt += 1 }
          else settle() // contaminated window: don't count it
        }
        if (best == Double.MaxValue) -1.0 else best
      }

      val entries = kernels.map { case (name, fn) =>
        settle()
        val times = scales.map(k => lite(fn(k)))
        val pts = scales.zip(times).filter(_._2 > 0)
          .map { case (k, t) => (math.log(k.toDouble), math.log(t)) }
        val exponent =
          if (pts.size < 2) Double.NaN
          else {
            val mx = pts.map(_._1).sum / pts.size
            val my = pts.map(_._2).sum / pts.size
            pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
              pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
          }
        val ts = times.map(t => f"$t%.3f").mkString("[", ",", "]")
        val e = if (exponent.isNaN) "null" else f"$exponent%.3f"
        s""""$name":{"times":$ts,"exponent":$e}"""
      }
      s"""{"scales":[1,2,4,8],"entries":{${entries.mkString(",")}}}"""
    } finally deleteRecursively(root)
  }

  /** OS 1-minute load average, or -1.0 where the platform doesn't report one
    * (the JMX contract's sentinel). Recorded at bench start and end so a
    * record captured on a loaded machine is self-identifying.
    */
  private def systemLoadAverage(): Double =
    try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** First /proc/stat cpu line as (busyTicks, totalTicks) across all CPUs;
    * idle + iowait count as not-busy. None off-Linux — the sentinel then
    * degrades to "unknown" (share -1.0) instead of guessing.
    */
  private def procStatTicks(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val line = try src.getLines().next() finally src.close()
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      if (f.length < 5) None
      else {
        val idle = f(3) + f(4) // idle + iowait
        Some((f.sum - idle, f.sum))
      }
    } catch { case _: Throwable => None }

  /** Cumulative CPU time of THIS JVM in ns (com.sun.management extension;
    * Spark local mode is single-JVM so this is the whole bench), -1 when
    * unavailable.
    */
  private def processCpuNs(): Long =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    } catch { case _: Throwable => -1L }

  /** Fraction of the machine's CPU ticks in the window that went to OTHER
    * processes: (system busy − own busy) / total. A tick is 10 ms (USER_HZ
    * 100, the Linux ABI constant). -1.0 when either probe is unavailable.
    * Kernel writeback threads triggered by our own writes land on the
    * "external" side — [[MaxExternalShare]] leaves ≈3 cores of headroom on
    * a 32-core box so that attribution noise can't flag a quiet run.
    */
  private def externalCpuShare(
      t0: Option[(Long, Long)], t1: Option[(Long, Long)],
      own0: Long, own1: Long): Double = (t0, t1) match {
    case (Some((b0, tot0)), Some((b1, tot1)))
        if tot1 > tot0 && own0 >= 0 && own1 >= own0 =>
      val ownTicks = (own1 - own0) / 1e7
      math.max(0.0, ((b1 - b0) - ownTicks) / (tot1 - tot0).toDouble)
    case _ => -1.0
  }

  /** Best-effort recursive delete of a bench temp tree (cleanup must never
    * fail the bench record).
    */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    try {
      val stream = Files.walk(root)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally stream.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] temp cleanup of $root failed: ${e.getMessage}")
    }
  }

  /** All eight curation stages enabled (q3m keeps the near-dup CC and the
    * surprisal band off because they're oracled separately): repetition
    * filter → exact dedup → MinHash near-dup clusters → decontamination →
    * LM band (wide: the cost is the scoring, not the selectivity) → PII
    * scrub → domain cap → deterministic sample.
    */
  private def curateFull(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = Tables(spark, sfDir, "documents")
    graft.operators.Curate.run(
      d.filter(col("doc_id") >= 20), "doc_id", "text", "source",
      benchmarks = Some(d.filter(col("doc_id") < 20)),
      cfg = graft.operators.Curate.Config(
        nearDupMinJaccard = Some(0.5),
        surprisalBand = Some((0.0, 100.0)),
        capPerSource = Some(15),
        sampleRate = 0.8,
        salt = "curate",
        repetitionMaxDup5gram = Some(0.9),
        // canonicalize tracked (NFC UDF scan cost); C4 page rules stay off
        // HERE only because the fixture is unpunctuated word salad — the
        // stage would empty the corpus and zero out every later stage's
        // cost, making the bench line meaningless
        canonicalize = true)).count()
    ()
  }

  /** Score-only classifier pass under a model trained once (lazily, outside
    * the timed runs): featurize + one margin shuffle — the amortized
    * inference cost, vs q5a's full featurize+train+score.
    */
  private var cachedClfModel: Option[graft.operators.TextClassifier.Model] = None

  private def classifierScoreOnly(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = Tables(spark, sfDir, "documents")
      .withColumn("y", (col("n_chars") >= 250).cast("int"))
    val model = cachedClfModel.getOrElse {
      val m = graft.operators.TextClassifier.train(
        graft.operators.TextClassifier.hashedFeatures(d, "doc_id", "text", "y", dim = 32),
        dim = 32, iters = 2, lr = 0.5)
      cachedClfModel = Some(m)
      m
    }
    graft.operators.TextClassifier.score(
      graft.operators.TextClassifier.hashedFeatures(d, "doc_id", "text", "y", dim = 32),
      model).count()
    ()
  }

  /** q38's BM25 with the per-doc length table read from a pre-materialized
    * parquet instead of the inline corpus scan — the amortized retrieval
    * path (the lens write happens untimed in main).
    */
  private def bm25Precomputed(spark: SparkSession, sfDir: String, lensPath: String): Unit = {
    graft.operators.KeywordSearch.bm25(
      Tables(spark, sfDir, "documents"), "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10,
      lens = Some(spark.read.parquet(lensPath))).count()
    ()
  }
}
