package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization contracts: encode = local argmin replay, ADC ≡ exact
  * distance to the reconstructed vector, degenerate exactness (full-corpus
  * shortlist re-rank == exact top-k; IVF-PQ with nProbe = nCells likewise),
  * and partition invariance. Recall gates live in RecallSpec; driver-level
  * hash-exactness is q3p/q3q.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"

  private def emb = Tables(spark, sf, "embeddings")

  private def collected: Array[(Long, Array[Float])] =
    emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)

  private def cb = PqIndex.codebookByDraw(emb, "vec_id", "embedding", m = 8, nCodes = 16)

  private def l2sqLocal(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
    d
  }

  test("codebook draw is deterministic with the IVF (md5(id), id) ordering") {
    val c1 = cb; val c2 = cb
    assert(c1.m === 8); assert(c1.nCodes === 16); assert(c1.subDim === 8)
    for (j <- 0 until 8; k <- 0 until 16)
      assert(c1.codewords(j)(k).toSeq === c2.codewords(j)(k).toSeq)
    // subspace j's codewords are the j-th slices of the IVF draw rows
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    for ((cell, v) <- ivf.centroids; j <- 0 until 8)
      assert(c1.codewords(j)(cell).toSeq === v.slice(j * 8, (j + 1) * 8).toSeq)
  }

  test("encode equals the local argmin by (round(d2,6) asc, code asc)") {
    val book = cb
    val got = PqIndex.encode(emb, "embedding", book)
      .select(col("vec_id"), col("pq")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Byte]](1).toArray).toMap
    for ((id, v) <- collected; j <- 0 until book.m) {
      val sub = v.slice(j * book.subDim, (j + 1) * book.subDim)
      val best = book.codewords(j).zipWithIndex.map { case (cw, c) =>
        (IvfIndex.roundHalfUp(l2sqLocal(sub, cw), 6), c)
      }.minBy { case (d, c) => (d, c) }._2
      assert(got(id)(j) === best.toByte, s"vec $id subspace $j")
    }
  }

  test("ADC distance equals exact distance to the reconstructed vector") {
    val book = cb
    val qv = collected.find(_._1 == 0L).get._2
    val table = PqIndex.lut(book, qv)
    val rows = PqIndex.encode(emb, "embedding", book)
      .withColumn("adist", PqIndex.adcDistExpr(col("pq"), table))
      .select(col("vec_id"), col("pq"), col("adist")).collect()
    for (r <- rows) {
      val codes = r.getAs[scala.collection.Seq[Byte]]("pq")
      val recon = (0 until book.m).flatMap(j => book.codewords(j)(codes(j).toInt)).toArray
      val exact = l2sqLocal(qv, recon)
      // adist is rounded to 6 decimals (oracle contract) — up to 5e-7 off
      assert(math.abs(r.getDouble(2) - exact) < 1e-6,
        s"vec ${r.getLong(0)}: adc ${r.getDouble(2)} vs recon $exact")
    }
  }

  test("full-corpus shortlist re-rank reproduces the exact top-k") {
    val book = cb
    val e = emb
    val n = e.count().toInt
    val qv = collected.find(_._1 == 0L).get._2
    val encoded = PqIndex.encode(e, "embedding", book).filter(col("vec_id") =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rerank = rows(PqIndex.searchRerank(encoded, "vec_id", "embedding", "pq",
      qv, book, r = n, k = 10))
    val exact = rows(VectorSearch.topK(e.filter(col("vec_id") =!= 0),
      "embedding", qv, k = 10, scoreScale = Some(6), tiebreak = Some("vec_id")))
    assert(rerank === exact)
  }

  test("IVF-PQ with nProbe = nCells and a full shortlist is exact") {
    val book = cb
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val n = emb.count().toInt
    val store = PqIndex.ivfPqStore(emb, "embedding", ivf, book)
    val qv = collected.find(_._1 == 0L).get._2
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = rows(PqIndex.searchIvfPq(store.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, ivf, book, nProbe = 16, r = n, k = 10))
    val exact = rows(VectorSearch.topK(emb.filter(col("vec_id") =!= 0),
      "embedding", qv, k = 10, scoreScale = Some(6), tiebreak = Some("vec_id")))
    assert(got === exact)
  }

  test("IVF-PQ search stays inside the probed cells and shortlist bound") {
    val book = cb
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val store = PqIndex.ivfPqStore(emb, "embedding", ivf, book)
    val qv = collected.find(_._1 == 0L).get._2
    val probes = IvfIndex.probeCells(ivf, qv, nProbe = 4).toSet
    val out = PqIndex.searchIvfPq(store.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, ivf, book, nProbe = 4, r = 50, k = 10)
      .select(col("vec_id"), col("cell"), col("score")).collect()
    assert(out.length <= 10)
    assert(out.forall(r => probes.contains(r.getInt(1))))
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted(Ordering[Double].reverse))
  }

  test("adaptive shortlist: gated at small pools, tracks r/N, overflow-safe") {
    import PqIndex.adaptiveShortlist
    assert(adaptiveShortlist(500, k = 10) === 50)   // sf0.01 pool: exactly the gated r=50
    assert(adaptiveShortlist(2000, k = 10) === 200) // sf0.1 pool: same 10% operating point
    assert(adaptiveShortlist(0, k = 10) === 50)     // empty pool: the r0 floor
    assert(adaptiveShortlist(100, k = 80) === 80)   // never below k
    assert(adaptiveShortlist(Long.MaxValue, k = 10) === Int.MaxValue) // no Int overflow
    intercept[IllegalArgumentException](adaptiveShortlist(100, k = 0))
    intercept[IllegalArgumentException](adaptiveShortlist(100, k = 10, frac = 1.5))
  }

  test("IVF-PQ default (adaptive) shortlist reproduces the explicit-r result") {
    val book = cb
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val store = PqIndex.ivfPqStore(emb, "embedding", ivf, book)
    val qv = collected.find(_._1 == 0L).get._2
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // probed pool at nProbe=4 is ≤ 499 rows → adaptive r = max(50, ceil(.1·pool)) = 50,
    // so omitting r must reproduce the r=50 result exactly
    val adaptive = rows(PqIndex.searchIvfPq(store.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, ivf, book, nProbe = 4, k = 10))
    val explicit = rows(PqIndex.searchIvfPq(store.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, ivf, book, nProbe = 4, r = 50, k = 10))
    assert(adaptive === explicit)
  }

  test("build-time cellCounts sizes the shortlist with zero query-time jobs " +
      "and reproduces the count-job result") {
    val book = cb
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val store = PqIndex.ivfPqStore(emb, "embedding", ivf, book).localCheckpoint()
    val counts = PqIndex.cellCounts(store)
    assert(counts.values.sum === emb.count())
    val qv = collected.find(_._1 == 0L).get._2
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val spark = graft.SparkTestBase.spark
    // the amortized path must launch strictly fewer jobs than the
    // per-query-count path: count the jobs each sizing mode runs
    // measure inside a DEDICATED job group: counting the default group
    // races with stray async jobs from earlier suites in the shared
    // session (observed as a full-suite-only flake)
    var groupSeq = 0
    def jobsDuring(f: => Seq[(Long, Double)]): (Int, Seq[(Long, Double)]) = {
      val sc = spark.sparkContext
      groupSeq += 1
      val group = s"pqspec-jobcount-$groupSeq"
      sc.setJobGroup(group, "PqSpec job-count window")
      val out = try f finally sc.clearJobGroup()
      (sc.statusTracker.getJobIdsForGroup(group).length, out)
    }
    val (jobsAmortized, amortized) = jobsDuring(rows(
      PqIndex.searchIvfPq(store, "vec_id", "embedding", qv, ivf, book,
        nProbe = 4, k = 10, counts = Some(counts))))
    val (jobsCounting, counting) = jobsDuring(rows(
      PqIndex.searchIvfPq(store, "vec_id", "embedding", qv, ivf, book,
        nProbe = 4, k = 10)))
    assert(amortized === counting)
    assert(jobsAmortized < jobsCounting,
      s"expected fewer jobs with precomputed counts: $jobsAmortized vs $jobsCounting")
    // a probed cell absent from the counts map contributes 0 (e.g. an
    // empty cell never written) — sizing then floors at r0, never throws
    val sparse = counts -- IvfIndex.probeCells(ivf, qv, nProbe = 4)
    val floored = rows(PqIndex.searchIvfPq(store, "vec_id", "embedding", qv,
      ivf, book, nProbe = 4, k = 10, counts = Some(sparse)))
    assert(floored === counting)
  }

  test("k-means refinement preserves shape; zero iters is the identity") {
    val book = cb
    val same = PqIndex.refineCodebook(emb, "embedding", book, iters = 0)
    for (j <- 0 until book.m; c <- 0 until book.nCodes)
      assert(same.codewords(j)(c).toSeq === book.codewords(j)(c).toSeq)
    val refined = PqIndex.refineCodebook(emb, "embedding", book, iters = 2)
    assert(refined.m === book.m)
    assert(refined.nCodes === book.nCodes)
    assert(refined.subDim === book.subDim)
    // refined codewords still encode to valid byte codes
    val codes = PqIndex.encode(emb, "embedding", refined)
      .select(col("pq")).collect()
      .flatMap(_.getAs[scala.collection.Seq[Byte]](0))
    assert(codes.forall(c => c >= 0 && c < book.nCodes))
  }

  test("encode is partition-invariant") {
    val book = cb
    def codes(df: org.apache.spark.sql.DataFrame) =
      PqIndex.encode(df, "embedding", book)
        .select(col("vec_id"), col("pq")).collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Byte]](1).toSeq)
        .sortBy(_._1).toSeq
    assert(codes(emb.repartition(1)) === codes(emb.repartition(13)))
  }

  test("ADC scan reads only the codes column (float vectors pruned)") {
    val book = cb
    val qv = collected.find(_._1 == 0L).get._2
    val dir = java.nio.file.Files.createTempDirectory("pq-store").toString
    PqIndex.encode(emb, "embedding", book)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val adc = stored
      .withColumn("adist", PqIndex.adcDistExpr(col("pq"), PqIndex.lut(book, qv)))
      .select(col("vec_id"), col("adist"))
    val explained = adc.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = explained.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("pq") && !readSchema.contains("embedding"),
      s"ADC scan should read codes only:\n$readSchema")
  }

  test("versioned IVF-PQ store: append with frozen quantizers equals the " +
      "monolithic build exactly; snapshot versions pin history") {
    // frozen coarse centroids + codebook make codes/cells a pure function
    // of the vector, so base-build + delta-append must reproduce the
    // one-shot store row-for-row — the incremental-upsert correctness
    // contract (round 9, VERDICT r8 task 4)
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 8)
    val book = cb
    val root = java.nio.file.Files.createTempDirectory("pq-vstore").toString
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val v1 = PqIndex.buildIvfPqStoreVersioned(spark, root, base, "embedding", ivf, book)
    val v2 = PqIndex.appendToIvfPqStore(spark, root, delta, "embedding", ivf, book)
    assert(v1 == 1 && v2 == 2)
    def img(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell").cast("int"), col("pq"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getAs[scala.collection.Seq[Byte]](2).toSeq))
        .sortBy(_._1)
    val appended = img(IvfIndex.readStoreVersioned(spark, root))
    val oneShot = img(PqIndex.ivfPqStore(emb, "embedding", ivf, book))
    assert(appended === oneShot,
      "append path must reproduce the monolithic build bit-for-bit")
    // version 1 still reads the pre-append base (snapshot isolation)
    assert(IvfIndex.readStoreVersioned(spark, root, Some(1)).count() == 400)
    // search over the versioned store: full probe + full shortlist = exact
    val qv = collected.find(_._1 == 0L).get._2
    val store = IvfIndex.readStoreVersioned(spark, root)
      .filter(col("vec_id") =!= 0L)
    val got = PqIndex.searchIvfPq(store, "vec_id", "embedding", qv, ivf, book,
      nProbe = 8, r = 499, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = collected.filter(_._1 != 0L).map { case (id, v) =>
      (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
    }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSeq
    assert(got == exact, "exhaustive IVF-PQ over the appended store is exact")
  }

  test("IVF-PQ cell repair (round 10): splitCell on an IVF-PQ root — raw " +
      "vector convention via vecColOpt — conserves membership, keeps every " +
      "PQ code byte-identical, and exhaustive search over the grown index " +
      "stays exact") {
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 4)
    val book = cb
    val root = java.nio.file.Files.createTempDirectory("pq-split").toString
    PqIndex.buildIvfPqStoreVersioned(spark, root, emb, "embedding", ivf, book)
    def codesImg(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("pq")).collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Byte]](1).toSeq)
        .toMap
    val live = IvfIndex.readStoreLatest(spark, root, "vec_id")
    val before = codesImg(live)
    // the PQ store assigns on the RAW float vector — the repair must too
    val target = IvfIndex.largestCells(
      IvfIndex.cellQuality(live, "q8", "scale", ivf,
        vecColOpt = Some("embedding")), k = 1).head
    val idsTarget = live.filter(col("cell") === target)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val (ivf2, _) = IvfIndex.splitCell(spark, root, ivf, target, "vec_id",
      vecColOpt = Some("embedding"))
    assert(ivf2.nCells == 5)
    val after = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(codesImg(after) == before,
      "PQ codes are codebook-only — a cell move must not re-encode")
    val halves = after.filter(col("cell").isin(target, 4))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(halves == idsTarget)
    assert(after.filter(col("cell") === 4).count() > 0)
    // exhaustive IVF-PQ over the grown index = exact brute force
    val qv = collected.find(_._1 == 0L).get._2
    val got = PqIndex.searchIvfPq(after.filter(col("vec_id") =!= 0L),
      "vec_id", "embedding", qv, ivf2, book, nProbe = 5, r = 499, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = collected.filter(_._1 != 0L).map { case (id, v) =>
      (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
    }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSeq
    assert(got == exact)
  }

  test("IVF-PQ id-level upsert/delete (round 10): an upserted id has ONE " +
      "live row re-encoded from the new vector; deletes fold; the shared " +
      "IvfIndex compaction folds tombstones physically; search over the " +
      "latest view serves the replacement") {
    import spark.implicits._
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 8)
    val book = cb
    val root = java.nio.file.Files.createTempDirectory("pq-upsert").toString
    PqIndex.buildIvfPqStoreVersioned(spark, root,
      emb.filter(col("vec_id") < 100), "embedding", ivf, book)
    // upsert id 5 with vec 400's embedding
    val newVec = emb.filter(col("vec_id") === 400)
      .select(lit(5L).as("vec_id"), col("embedding"), lit(99).as("label"))
    val v2 = PqIndex.upsertToIvfPqStore(spark, root, newVec,
      "vec_id", "embedding", ivf, book)
    assert(v2 == 2)
    val live = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(live.count() == 100, "upsert must replace, not add")
    val row5 = live.filter(col("vec_id") === 5).collect()
    assert(row5.length == 1)
    // the live codes equal a fresh encode of the NEW vector
    val wantCodes = PqIndex.ivfPqStore(
      emb.filter(col("vec_id") === 400), "embedding", ivf, book)
      .select("pq").head().getAs[scala.collection.Seq[Byte]](0)
    assert(row5.head.getAs[scala.collection.Seq[Byte]]("pq") == wantCodes)
    // delete id 7 via the SHARED quantization-agnostic path
    IvfIndex.deleteFromStore(spark, root, Seq(7L).toDF("vec_id"), "vec_id")
    assert(IvfIndex.readStoreLatest(spark, root, "vec_id").count() == 99)
    // search over the latest view: id 5 found at its NEW vector, 7 absent
    val qv = collected.find(_._1 == 400L).get._2
    val hits = PqIndex.searchIvfPq(
      IvfIndex.readStoreLatest(spark, root, "vec_id"),
      "vec_id", "embedding", qv, ivf, book, nProbe = 8, r = 99, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.contains(5L) && !hits.contains(7L))
    // shared physical compaction
    val v4 = IvfIndex.compactStore(spark, root, "vec_id")
    val raw = graft.sources.SnapshotStore.read(spark, root, Some(v4))
    assert(raw.filter(col("cell") === -1).isEmpty)
    assert(IvfIndex.readStoreLatest(spark, root, "vec_id").count() == 99)
  }

  test("tenant purge works verbatim on IVF-PQ roots (the shared " +
      "quantization-agnostic tombstone mechanics)") {
    val ivf = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 8)
    val withOrg = emb.filter(col("vec_id") < 120)
      .withColumn("org", pmod(col("vec_id"), lit(3L)).cast("int"))
    val root = java.nio.file.Files.createTempDirectory("pq-purge").toString
    PqIndex.buildIvfPqStoreVersioned(spark, root, withOrg, "embedding",
      ivf, cb, extraPartitionCols = Seq("org"))
    IvfIndex.purgeTenantFromStore(spark, root, "org", 0)
    val live = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(live.filter(col("org") === 0).isEmpty, "purged tenant gone")
    assert(live.count() == withOrg.filter(col("org") =!= 0).count())
    // physical fold with the tenant layout preserved
    val vC = IvfIndex.compactStore(spark, root, "vec_id",
      extraPartitionCols = Seq("org"))
    val raw = graft.sources.SnapshotStore.read(spark, root, Some(vC))
    assert(raw.filter(col("__op") =!= "U").isEmpty)
    assert(raw.count() == withOrg.filter(col("org") =!= 0).count())
  }
}
