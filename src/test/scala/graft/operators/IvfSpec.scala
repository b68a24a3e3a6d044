package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF index contracts: deterministic centroid draw, assignment = argmax of
  * the ranking contract, exactness at nProbe = nCells, probe containment, and
  * k-means refinement shape. Recall gates live in RecallSpec; driver-level
  * hash-exactness is q3g_ivf_topk.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"

  private def emb = Tables(spark, sf, "embeddings")

  private def collected: Array[(Long, Array[Float])] =
    emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)

  test("centroid draw is deterministic and matches driver-side md5 ranking") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val idx2 = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    assert(idx.nCells === 16)
    assert(idx.centroids.map(_._1).toSeq === (0 until 16))
    // same draw on a second build (determinism across jobs)
    for (((c1, v1), (c2, v2)) <- idx.centroids.zip(idx2.centroids)) {
      assert(c1 === c2); assert(v1.toSeq === v2.toSeq)
    }
    // replay the draw locally: md5 hex of the decimal id string, then id
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = collected.map { case (id, v) => (hex(id.toString), id, v) }
      .sortBy { case (d, id, _) => (d, id) }.take(16)
    for (((_, _, ev), (_, av)) <- expect.zip(idx.centroids))
      assert(ev.toSeq === av.toSeq)
  }

  test("assignment equals the local argmax by (round(cosine,6) desc, cell asc)") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val got = IvfIndex.assign(emb, "embedding", idx)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, v) <- collected) {
      val best = idx.centroids.map { case (cell, cv) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, cv), 6), cell)
      }.minBy { case (s, cell) => (-s, cell) }._2
      assert(got(id) === best, s"vec $id assigned ${got(id)}, expected $best")
    }
  }

  test("nProbe = nCells reproduces the exact top-k") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val assigned = IvfIndex.assign(emb, "embedding", idx)
    val qv = collected.find(_._1 == 0L).get._2
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = rows(IvfIndex.search(assigned.filter(col("vec_id") =!= 0),
      "embedding", qv, idx, nProbe = 16, k = 10, tiebreak = Some("vec_id")))
    val exact = rows(VectorSearch.topK(emb.filter(col("vec_id") =!= 0),
      "embedding", qv, k = 10, scoreScale = Some(6), tiebreak = Some("vec_id")))
    assert(ivf === exact)
  }

  test("probed search stays inside the probed cells, ranked and bounded") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val assigned = IvfIndex.assign(emb, "embedding", idx)
    val qv = collected.find(_._1 == 0L).get._2
    val probes = IvfIndex.probeCells(idx, qv, nProbe = 4).toSet
    assert(probes.size === 4)
    val out = IvfIndex.search(assigned.filter(col("vec_id") =!= 0),
      "embedding", qv, idx, nProbe = 4, k = 10, tiebreak = Some("vec_id"))
      .select(col("vec_id"), col("cell"), col("score")).collect()
    assert(out.length <= 10)
    assert(out.forall(r => probes.contains(r.getInt(1))))
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted(Ordering[Double].reverse))
  }

  test("cell-partitioned storage prunes probes at the source") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf-part").toString
    IvfIndex.assign(emb, "embedding", idx)
      .write.partitionBy("cell").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val qv = collected.find(_._1 == 0L).get._2
    val probes = IvfIndex.probeCells(idx, qv, nProbe = 4)
    val pruned = stored.filter(col("cell").isin(probes: _*))
    // the probe predicate must land as a PartitionFilter on the scan node —
    // that is the mechanism by which Spark prunes the cell= directory
    // listing at the source (inputFiles reports the pre-pruning listing,
    // so the plan is the honest evidence)
    val explained = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters"),
      s"probe filter did not reach the scan:\n$explained")
    val pfLine = explained.linesIterator
      .find(_.contains("PartitionFilters")).get
    assert(pfLine.contains("cell"), s"partition filter not on cell: $pfLine")
    assert(probes.forall(c => pfLine.contains(c.toString)),
      s"probe cells $probes not all in: $pfLine")
    // and the pruned scan returns exactly the probed cells' rows
    val expect = IvfIndex.assign(emb, "embedding", idx)
      .filter(col("cell").isin(probes: _*)).count()
    assert(pruned.count() === expect)
  }

  test("quantized store: cell partitions prune AND only probed rows dequantize") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf-quant").toString
    IvfIndex.quantizedStore(emb, "embedding", idx)
      .write.partitionBy("cell").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    assert(!stored.columns.contains("embedding")) // floats really discarded
    val qv = collected.find(_._1 == 0L).get._2
    val res = IvfIndex.searchQuantized(
      stored.filter(col("vec_id") =!= 0L), "q8", "scale", qv, idx,
      nProbe = 4, k = 10, tiebreak = Some("vec_id"))
    // the probe predicate must reach the scan as a PartitionFilter — the
    // dequant projection sits ABOVE the filter, so unprobed cells are
    // neither read nor dequantized
    val explained = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pfLine = explained.linesIterator.find(_.contains("PartitionFilters"))
    assert(pfLine.isDefined, s"no PartitionFilters:\n$explained")
    assert(pfLine.get.contains("cell"), s"filter not on cell: ${pfLine.get}")
    // and the partitioned read returns exactly the in-memory composition
    val expect = IvfIndex.searchQuantized(
      IvfIndex.quantizedStore(emb, "embedding", idx).filter(col("vec_id") =!= 0L),
      "q8", "scale", qv, idx, nProbe = 4, k = 10, tiebreak = Some("vec_id"))
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = res.select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
  }

  test("k-means refine moves occupied centroids to cell means, keeps empty ones") {
    import spark.implicits._
    // all data in the +x/+y quadrant: cell 2's centroid (-1, 0) attracts
    // nothing and must survive refinement unchanged
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val idx = IvfIndex.Index(Array(
      0 -> Array(1.0f, 0.0f), 1 -> Array(0.0f, 1.0f), 2 -> Array(-1.0f, 0.0f)))
    val refined = IvfIndex.refine(vecs, "embedding", idx, iters = 1)
    assert(refined.nCells === idx.nCells)
    assert(refined.centroids.forall(_._2.length === 2))
    // cell 0 ← mean{(1,0),(0.8,0.2)}; cell 1 ← mean{(0,1),(0.2,0.8)}; 2 kept
    assert(refined.centroids(0)._2.map(_.toDouble).toSeq
      .zip(Seq(0.9, 0.1)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(refined.centroids(1)._2.map(_.toDouble).toSeq
      .zip(Seq(0.1, 0.9)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(refined.centroids(2)._2.toSeq === idx.centroids(2)._2.toSeq)
    // refined index still assigns every vector to a declared cell
    val assigned = IvfIndex.assign(vecs, "embedding", refined)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(assigned.subsetOf(refined.centroids.map(_._1).toSet))
  }

  test("refineExact: snapped means, empty-cell inheritance, grid membership") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val idx = IvfIndex.Index(Array(
      0 -> Array(1.0f, 0.0f), 1 -> Array(0.0f, 1.0f), 2 -> Array(-1.0f, 0.0f)))
    val refined = IvfIndex.refineExact(vecs, "embedding", idx, iters = 1)
    // occupied cells: components sum through DECIMAL(28,12), divide in
    // double, snap to 9 decimals, store as float — replicated exactly here
    def mean12(xs: Double*): Float = {
      val s = xs.map(x => BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      IvfIndex.roundHalfUp(s.toDouble / xs.size, 9).toFloat
    }
    assert(refined.centroids(0)._2.toSeq ===
      Seq(mean12(1.0f.toDouble, 0.8f.toDouble), mean12(0.0f.toDouble, 0.2f.toDouble)))
    assert(refined.centroids(1)._2.toSeq ===
      Seq(mean12(0.0f.toDouble, 0.2f.toDouble), mean12(1.0f.toDouble, 0.8f.toDouble)))
    // the empty cell inherits its previous centroid bit-identically
    assert(refined.centroids(2)._2.toSeq === idx.centroids(2)._2.toSeq)
  }

  test("refineExact is bit-identical across partitionings (refine is not contracted to be)") {
    val e = emb
    val idx0 = IvfIndex.centroidsByDraw(e, "vec_id", "embedding", nCells = 8)
    val r1 = IvfIndex.refineExact(e.repartition(1), "embedding", idx0, iters = 2)
    val r13 = IvfIndex.refineExact(e.repartition(13), "embedding", idx0, iters = 2)
    for (((c1, v1), (c2, v2)) <- r1.centroids.zip(r13.centroids)) {
      assert(c1 === c2)
      assert(v1.toSeq === v2.toSeq, s"cell $c1 centroids diverge across partitionings")
    }
    // and every refined component sits on the 9-decimal grid (as a float)
    for ((_, v) <- r1.centroids; x <- v)
      assert(x === IvfIndex.roundHalfUp(x.toDouble, 9).toFloat)
  }

  test("assignCellScore agrees with assignCell and carries the winning score") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val both = emb.withColumn("cs", IvfIndex.assignCellScore(col("embedding"), idx))
      .withColumn("cell2", IvfIndex.assignCell(col("embedding"), idx))
      .select(col("vec_id"), col("cs.cell").as("cell"), col("cs.score").as("sc"),
        col("cell2"))
      .collect()
    for ((id, v) <- collected) {
      val r = both.find(_.getLong(0) == id).get
      assert(r.getInt(1) === r.getInt(3))
      val best = idx.centroids.map { case (cell, cv) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, cv), 6), cell)
      }.minBy { case (s, cell) => (-s, cell) }
      assert(r.getDouble(2) === best._1, s"vec $id score")
    }
  }

  test("assignQuality: the staleness probe falls when the corpus moves " +
      "off the frozen centroids, and handles the empty delta") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val (n1, mean1, min1) = IvfIndex.assignQuality(emb, "embedding", idx)
    assert(n1 == emb.count() && mean1 >= min1)
    // synthetic distribution shift: negate every vector — each row's best
    // centroid cosine flips sign, so the mean MUST fall hard
    val drifted = emb.withColumn("neg",
      org.apache.spark.sql.functions.transform(col("embedding"), x => -x))
    val (_, mean2, _) = IvfIndex.assignQuality(drifted, "neg", idx)
    info(f"assign quality: baseline mean $mean1%.4f, drifted mean $mean2%.4f")
    assert(mean2 < mean1, "drifted corpus must score below the baseline")
    val (n0, m0, _) = IvfIndex.assignQuality(emb.limit(0), "embedding", idx)
    assert(n0 == 0L && m0.isNaN)
  }

  test("id-level upsert/delete lifecycle (round 10): re-appending an id " +
      "returns ONE row with the new vector even across a cell move; a " +
      "deleted id is absent at the new version while a pinned old version " +
      "still serves it; compaction folds tombstones physically; a later " +
      "upsert resurrects a deleted id") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val root = java.nio.file.Files.createTempDirectory("ivf-upsert").toString
    val v1 = IvfIndex.buildStoreVersioned(spark, root,
      emb.filter(col("vec_id") < 100), "embedding", idx)
    assert(v1 == 1)
    // upsert id 5 with vec 400's embedding — a different cell (checked
    // below), so the kill must be cell-agnostic
    val newVec = emb.filter(col("vec_id") === 400)
      .select(lit(5L).as("vec_id"), col("embedding"),
        lit(99).as("label"))
    assert(!newVec.isEmpty, "fixture must contain vec 400")
    val v2 = IvfIndex.upsertToStore(spark, root, newVec, "vec_id", "embedding", idx)
    assert(v2 == 2)
    val live2 = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(live2.count() == 100, "upsert must replace, not add")
    val row5 = live2.filter(col("vec_id") === 5).collect()
    assert(row5.length == 1, s"exactly one live copy of id 5, got ${row5.length}")
    assert(row5.head.getAs[Int]("label") == 99, "the NEW row must win")
    // the new copy sits in the cell of the NEW vector (frozen centroids)
    val cell400 = IvfIndex.quantizedStore(
      emb.filter(col("vec_id") === 400), "embedding", idx)
      .select("cell").head().getInt(0)
    assert(row5.head.getAs[Int]("cell") == cell400)
    // delete id 7
    import spark.implicits._
    val v3 = IvfIndex.deleteFromStore(spark, root, Seq(7L).toDF("vec_id"), "vec_id")
    assert(v3 == 3)
    assert(IvfIndex.readStoreLatest(spark, root, "vec_id").count() == 99)
    assert(IvfIndex.readStoreLatest(spark, root, "vec_id")
      .filter(col("vec_id") === 7).isEmpty)
    // pinned older versions still serve both the old id-5 row and id 7
    val pinned1 = IvfIndex.readStoreLatest(spark, root, "vec_id", version = Some(1))
    assert(pinned1.filter(col("vec_id") === 7).count() == 1)
    assert(pinned1.filter(col("vec_id") === 5).head().getAs[Int]("label") != 99)
    // search: deleted id absent, upserted id found near its NEW vector
    val qv = emb.filter(col("vec_id") === 400).select("embedding")
      .head().getAs[scala.collection.Seq[Float]](0).toArray
    val hits = IvfIndex.searchQuantizedLatest(spark, root, "q8", "scale", qv,
      idx, nProbe = 16, k = 5, idCol = "vec_id", tiebreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.contains(5L), "upserted id must be served from its new cell")
    assert(!hits.contains(7L), "deleted id must not be served")
    // physical fold: after compactStore no tombstone partition remains and
    // the resolved state is unchanged
    val v4 = IvfIndex.compactStore(spark, root, "vec_id")
    assert(v4 == 4)
    val raw4 = graft.sources.SnapshotStore.read(spark, root, Some(4))
    assert(raw4.filter(col("cell") === -1).isEmpty, "tombstones folded away")
    assert(raw4.filter(col("__op") === "D").isEmpty)
    val live4 = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(live4.count() == 99 && live4.filter(col("vec_id") === 7).isEmpty)
    // resurrection: upserting id 7 after its delete makes it live again
    val v5 = IvfIndex.upsertToStore(spark, root,
      emb.filter(col("vec_id") === 7), "vec_id", "embedding", idx)
    assert(v5 == 5)
    assert(IvfIndex.readStoreLatest(spark, root, "vec_id")
      .filter(col("vec_id") === 7).count() == 1)
  }

  test("drift repair (round 10): cellQuality localizes the drifted cells, " +
      "refreshCells improves their cohesion via a partition-level commit " +
      "that rewrites no untouched file, membership stays inside the " +
      "touched set, full-probe search over the refreshed store is exact, " +
      "and a pre-refresh delete stays folded") {
    import spark.implicits._
    // index + store fit to the FIRST 100 vectors only, then append 200
    // UNSEEN vectors: the frozen centroids were never fit to them, so
    // cohesion falls in the cells they land on — the drift regime the
    // alarm → localize → repair loop exists for
    val base = emb.filter(col("vec_id") < 100)
    val idx = IvfIndex.centroidsByDraw(base, "vec_id", "embedding", nCells = 8)
    val root = java.nio.file.Files.createTempDirectory("ivf-refresh").toString
    IvfIndex.buildStoreVersioned(spark, root, base, "embedding", idx)
    IvfIndex.appendToStore(spark, root,
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 500), "embedding", idx)
    val v3 = IvfIndex.deleteFromStore(spark, root, Seq(450L).toDF("vec_id"), "vec_id")

    def liveAt(v: Option[Int] = None) =
      IvfIndex.readStoreLatest(spark, root, "vec_id", version = v)
    def cohesion(index: IvfIndex.Index, cells: Seq[Int]): Double = {
      val r = IvfIndex.cellQuality(liveAt(), "q8", "scale", index)
        .filter(col("cell").isin(cells: _*))
        .agg((sum(col("n") * col("mean_score")) / sum(col("n"))).as("m"))
        .head()
      r.getDouble(0)
    }
    def allFiles(): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val b = new java.io.File(root)
      walk(b).map(f => b.toPath.relativize(f.toPath).toString -> f.length()).toSet
    }

    val worst = IvfIndex.worstCells(
      IvfIndex.cellQuality(liveAt(), "q8", "scale", idx), k = 3)
    assert(worst.size == 3)
    val before = liveAt()
    val nBefore = before.count()
    val touchedIdsBefore = before.filter(col("cell").isin(worst: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(touchedIdsBefore.nonEmpty)
    val cohBefore = cohesion(idx, worst)
    val filesBefore = allFiles()

    val (idx2, v4) = IvfIndex.refreshCells(spark, root, idx, worst, "vec_id")
    assert(v4 == v3 + 1)
    // untouched centroids carried verbatim, touched ones moved
    for ((c, v) <- idx.centroids if !worst.contains(c))
      assert(idx2.centroids.find(_._1 == c).get._2.toSeq == v.toSeq)
    // the commit ADDED a dir; no pre-existing file was rewritten, and
    // every new parquet leaf lives in a touched cell's partition
    val filesAfter = allFiles()
    assert(filesBefore.subsetOf(filesAfter), "refresh must not rewrite old files")
    val newParquet = (filesAfter -- filesBefore).map(_._1)
      .filter(p => p.endsWith(".parquet") && !p.contains("cell=-1"))
    assert(newParquet.nonEmpty)
    val touchedLeaves = worst.map(c => s"cell=$c").toSet
    assert(newParquet.forall(p => p.split('/').exists(touchedLeaves.contains)),
      s"new files outside touched cells: ${newParquet.mkString(", ")}")
    // membership: same live rows, every touched member still in a touched
    // cell (reassignment cannot leave the refreshed subset), delete folded
    val after = liveAt()
    assert(after.count() == nBefore)
    val touchedIdsAfter = after.filter(col("cell").isin(worst: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(touchedIdsAfter == touchedIdsBefore)
    assert(after.filter(col("vec_id") === 450).isEmpty)
    // the repair's point: touched-cell cohesion strictly improves
    val cohAfter = cohesion(idx2, worst)
    assert(cohAfter > cohBefore,
      s"cohesion must improve: before $cohBefore, after $cohAfter")
    // full-probe search with the refreshed index stays EXACT
    val qv = emb.filter(col("vec_id") === 400).select("embedding")
      .head().getAs[scala.collection.Seq[Float]](0).toArray
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = rows(IvfIndex.searchQuantizedLatest(spark, root, "q8", "scale",
      qv, idx2, nProbe = 8, k = 10, idCol = "vec_id", tiebreak = Some("vec_id")))
    val exact = rows(VectorSearch.topK(
      after.withColumn("__dv",
        graft.functions.VectorFunctions.int8Dequant(col("q8"), col("scale"))),
      "__dv", qv, k = 10, scoreScale = Some(6), tiebreak = Some("vec_id")))
    assert(got == exact)
    // pinned pre-refresh version replays the pre-refresh state
    assert(liveAt(Some(v3)).count() == nBefore)
    assert(liveAt(Some(v3)).filter(col("cell").isin(worst: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet == touchedIdsBefore)
    // the repair's member read is partition-pruned: the cell predicate
    // reaches every snapshot dir's scan as a PartitionFilter (the
    // delta-sized-read half of the delta-sized claim)
    val memberPlan = liveAt().filter(col("cell").isin(worst: _*))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(memberPlan.contains("PartitionFilters: [") &&
      memberPlan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cell")),
      s"cell predicate did not prune the member read:\n$memberPlan")
  }

  test("skew repair (round 10): splitCell divides the fullest cell's " +
      "members between the old id and a fresh one, rewrites only that " +
      "cell's dir plus the new one, grows the index by one centroid, " +
      "keeps full-probe search exact, and leaves the pinned version " +
      "split-free") {
    val idx = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 4)
    val root = java.nio.file.Files.createTempDirectory("ivf-split").toString
    IvfIndex.buildStoreVersioned(spark, root, emb, "embedding", idx)
    def liveAt(v: Option[Int] = None) =
      IvfIndex.readStoreLatest(spark, root, "vec_id", version = v)
    def allFiles(): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val b = new java.io.File(root)
      walk(b).map(f => b.toPath.relativize(f.toPath).toString -> f.length()).toSet
    }
    val target = IvfIndex.largestCells(
      IvfIndex.cellQuality(liveAt(), "q8", "scale", idx), k = 1).head
    val before = liveAt()
    val nAll = before.count()
    val idsTarget = before.filter(col("cell") === target)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(idsTarget.size >= 2)
    val filesBefore = allFiles()

    val (idx2, v2) = IvfIndex.splitCell(spark, root, idx, target, "vec_id")
    assert(v2 == 2)
    assert(idx2.nCells == 5)
    val newCell = idx.centroids.map(_._1).max + 1
    assert(idx2.centroids.map(_._1).toSet ==
      idx.centroids.map(_._1).toSet + newCell)
    for ((c, v) <- idx.centroids if c != target)
      assert(idx2.centroids.find(_._1 == c).get._2.toSeq == v.toSeq,
        s"untouched centroid $c must carry verbatim")
    // no pre-existing file rewritten; new parquet only under the split
    // pair's partitions
    val filesAfter = allFiles()
    assert(filesBefore.subsetOf(filesAfter))
    val newParquet = (filesAfter -- filesBefore).map(_._1)
      .filter(_.endsWith(".parquet"))
    assert(newParquet.nonEmpty)
    val pair = Set(s"cell=$target", s"cell=$newCell")
    assert(newParquet.forall(p => p.split('/').exists(pair.contains)),
      s"new files outside the split pair: ${newParquet.mkString(", ")}")
    // membership conservation: the target's members partition EXACTLY
    // into the two halves, both non-empty on real data
    val after = liveAt()
    assert(after.count() == nAll)
    val half1 = after.filter(col("cell") === target)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val half2 = after.filter(col("cell") === newCell)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(half1.nonEmpty && half2.nonEmpty, "split must not be degenerate")
    assert((half1 & half2).isEmpty)
    assert((half1 | half2) == idsTarget)
    assert(math.max(half1.size, half2.size) < idsTarget.size,
      "skew must strictly decrease")
    // full-probe search over the grown index stays exact
    val qv = emb.filter(col("vec_id") === 42).select("embedding")
      .head().getAs[scala.collection.Seq[Float]](0).toArray
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("score")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = rows(IvfIndex.searchQuantizedLatest(spark, root, "q8", "scale",
      qv, idx2, nProbe = 5, k = 10, idCol = "vec_id", tiebreak = Some("vec_id")))
    val exact = rows(VectorSearch.topK(
      after.withColumn("__dv",
        graft.functions.VectorFunctions.int8Dequant(col("q8"), col("scale"))),
      "__dv", qv, k = 10, scoreScale = Some(6), tiebreak = Some("vec_id")))
    assert(got == exact)
    // the pinned pre-split version has no new cell and the full old cell
    assert(liveAt(Some(1)).filter(col("cell") === newCell).isEmpty)
    assert(liveAt(Some(1)).filter(col("cell") === target)
      .select("vec_id").collect().map(_.getLong(0)).toSet == idsTarget)
    // unknown cell refuses loudly before touching the store
    val err = intercept[IllegalArgumentException] {
      IvfIndex.splitCell(spark, root, idx2, cell = 99, idCol = "vec_id")
    }
    assert(err.getMessage.contains("unknown cell"))
  }

  test("tenant-partitioned store (round 10): the (cell, org) predicate " +
      "prunes BOTH partition dimensions and per-tenant top-k equals the " +
      "in-memory composition") {
    val withOrg = emb.withColumn("org", pmod(col("vec_id"), lit(4L)).cast("int"))
    val idx = IvfIndex.centroidsByDraw(withOrg, "vec_id", "embedding", nCells = 16)
    val root = java.nio.file.Files.createTempDirectory("ivf-tenant").toString
    IvfIndex.buildStoreVersioned(spark, root, withOrg, "embedding", idx,
      extraPartitionCols = Seq("org"))
    val stored = IvfIndex.readStoreVersioned(spark, root)
    val qv = collected.find(_._1 == 0L).get._2
    val probes = IvfIndex.probeCells(idx, qv, nProbe = 4)
    val pruned = stored.where(col("cell").isin(probes: _*) && col("org") === 2)
    val explained = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pfLine = explained.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pfLine.nonEmpty, s"no PartitionFilters:\n$explained")
    assert(pfLine.forall(l => l.contains("cell") && l.contains("org")),
      s"both dimensions must prune: $pfLine")
    // per-tenant search over the store == in-memory per-tenant composition
    val got = IvfIndex.searchQuantized(
      stored.where(col("org") === 2 && col("vec_id") =!= 0), "q8", "scale",
      qv, idx, nProbe = 4, k = 10, tiebreak = Some("vec_id"))
      .select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expect = IvfIndex.searchQuantized(
      IvfIndex.quantizedStore(withOrg, "embedding", idx)
        .where(col("org") === 2 && col("vec_id") =!= 0), "q8", "scale",
      qv, idx, nProbe = 4, k = 10, tiebreak = Some("vec_id"))
      .select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
    assert(got.length == 10, "small tenant still gets k rows at index cost")
    assert(got.forall(_._1 % 4 == 2), "only tenant rows returned")
  }

  test("tenant purge (round 10): ONE marker row logically purges every " +
      "older row of the org; a pinned version still serves it; a later " +
      "upsert resurrects exactly the re-ingested ids; compaction folds the " +
      "purge physically AND preserves the (cell, org) partition layout") {
    val withOrg = emb.filter(col("vec_id") < 200)
      .withColumn("org", pmod(col("vec_id"), lit(4L)).cast("int"))
    val idx = IvfIndex.centroidsByDraw(withOrg, "vec_id", "embedding", nCells = 8)
    val root = java.nio.file.Files.createTempDirectory("ivf-purge").toString
    val v1 = IvfIndex.buildStoreVersioned(spark, root, withOrg, "embedding", idx,
      extraPartitionCols = Seq("org"))
    val n = withOrg.count()
    val nOrg1 = withOrg.filter(col("org") === 1).count()
    assert(nOrg1 > 0, "fixture must populate the purged tenant")

    val v2 = IvfIndex.purgeTenantFromStore(spark, root, "org", 1)
    assert(v2 == v1 + 1)
    // delta-sized: the purge commit added exactly ONE raw row
    val raw2 = graft.sources.SnapshotStore.read(spark, root, Some(v2),
      absentDefaults = Seq("__op" -> lit("U")))
    assert(raw2.count() == n + 1, "a tenant purge must commit one marker row")
    // logical purge at the new version; pinned old version untouched
    val live2 = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(live2.count() == n - nOrg1)
    assert(live2.filter(col("org") === 1).isEmpty, "purged tenant must be gone")
    assert(IvfIndex.readStoreLatest(spark, root, "vec_id", version = Some(v1))
      .filter(col("org") === 1).count() == nOrg1, "pinned version still serves")

    // re-ingest two of the tenant's ids — newer commit wins over the purge
    val back = withOrg.filter(col("vec_id").isin(1L, 5L))
    val v3 = IvfIndex.upsertToStore(spark, root, back, "vec_id", "embedding",
      idx, extraPartitionCols = Seq("org"))
    val live3 = IvfIndex.readStoreLatest(spark, root, "vec_id")
    assert(live3.filter(col("org") === 1).count() == 2,
      "exactly the re-ingested ids resurrect")
    assert(live3.count() == n - nOrg1 + 2)

    // physical fold preserving the tenant layout
    val v4 = IvfIndex.compactStore(spark, root, "vec_id",
      extraPartitionCols = Seq("org"))
    assert(v4 == v3 + 1)
    val raw4 = graft.sources.SnapshotStore.read(spark, root, Some(v4))
    assert(raw4.filter(col("cell") === -1).isEmpty, "purge marker folded away")
    assert(raw4.filter(col("__op") =!= "U").isEmpty)
    assert(raw4.count() == n - nOrg1 + 2)
    // the compacted dir keeps org as the SECOND partition level (pruning
    // survives compaction) — check the hive structure on disk
    val dataDirs = new java.io.File(root, "data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"s$v4-"))
    assert(dataDirs.length == 1)
    val cellDirs = dataDirs.head.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "compacted dir must stay cell-partitioned")
    assert(cellDirs.forall(_.listFiles().exists(_.getName.startsWith("org="))),
      "compaction must preserve the org partition dimension")
    // and the post-compaction tenant predicate still prunes both dimensions
    val pruned = IvfIndex.readStoreVersioned(spark, root)
      .where(col("cell").isin(0, 1) && col("org") === 2)
    val explained = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = explained.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.nonEmpty && pf.forall(l => l.contains("cell") && l.contains("org")),
      s"post-compaction pruning lost: $pf")
  }

  test("tenant-aware refresh (round 11, VERDICT r10 task 1): refreshCells " +
      "on a (cell, org) store preserves BOTH prune dimensions, rewrites no " +
      "untouched file, moves members identically to the cell-only twin, " +
      "and the layout guard refuses an undeclared tenant dimension loudly") {
    val withOrg = emb.withColumn("org", pmod(col("vec_id"), lit(4L)).cast("int"))
    val base = withOrg.filter(col("vec_id") < 100)
    val idx = IvfIndex.centroidsByDraw(base, "vec_id", "embedding", nCells = 8)
    val root = java.nio.file.Files.createTempDirectory("ivf-trefresh").toString
    IvfIndex.buildStoreVersioned(spark, root, base, "embedding", idx,
      extraPartitionCols = Seq("org"))
    IvfIndex.appendToStore(spark, root,
      withOrg.filter(col("vec_id") >= 300 && col("vec_id") < 500),
      "embedding", idx, extraPartitionCols = Seq("org"))
    // the guard: an undeclared tenant dimension must refuse, not demote
    val guard = intercept[IllegalArgumentException] {
      IvfIndex.refreshCells(spark, root, idx, Seq(0), "vec_id")
    }
    assert(guard.getMessage.contains("prune dimension"),
      s"unexpected guard message: ${guard.getMessage}")
    // same guard on compactStore's foot-gun default
    val guardC = intercept[IllegalArgumentException] {
      IvfIndex.compactStore(spark, root, "vec_id")
    }
    assert(guardC.getMessage.contains("prune dimension"))

    def liveAt() = IvfIndex.readStoreLatest(spark, root, "vec_id")
    val worst = IvfIndex.worstCells(
      IvfIndex.cellQuality(liveAt(), "q8", "scale", idx), k = 3)
    val before = liveAt()
    val nBefore = before.count()
    def fileSig(): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val b = new java.io.File(root)
      walk(b).filter(_.getName.endsWith(".parquet"))
        .map(f => b.toPath.relativize(f.toPath).toString -> f.length()).toSet
    }
    val filesBefore = fileSig()
    val (idx2, v3) = IvfIndex.refreshCells(spark, root, idx, worst, "vec_id",
      extraPartitionCols = Seq("org"))
    assert(filesBefore.subsetOf(fileSig()),
      "tenant refresh must rewrite no pre-existing file")
    // the store keeps its full nested layout after the repair
    assert(graft.sources.SnapshotStore.partitionLayout(spark, root)
      == Seq("cell", "org"), "refresh must preserve the (cell, org) layout")
    val after = liveAt()
    assert(after.count() == nBefore, "refresh must not lose or duplicate rows")
    // both dimensions still prune on the CURRENT version (rewrite dir incl.;
    // raw read with the documented absentDefaults — the rewrite dir carries
    // the upsert-era __op marker, pre-era dirs synthesize it)
    val explained2 = graft.sources.SnapshotStore.read(spark, root,
        absentDefaults = Seq("__op" -> lit("U")))
      .where(col("cell").isin(worst: _*) && col("org") === 2)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf2 = explained2.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf2.nonEmpty && pf2.forall(l => l.contains("cell") && l.contains("org")),
      s"post-refresh pruning lost: $pf2")
    // the repair math is tenant-agnostic: the same refresh on a cell-only
    // twin store produces the IDENTICAL final (vec_id, cell) assignment
    val root2 = java.nio.file.Files.createTempDirectory("ivf-trefresh2").toString
    IvfIndex.buildStoreVersioned(spark, root2,
      base.drop("org"), "embedding", idx)
    IvfIndex.appendToStore(spark, root2,
      withOrg.filter(col("vec_id") >= 300 && col("vec_id") < 500).drop("org"),
      "embedding", idx)
    val (idx2b, _) = IvfIndex.refreshCells(spark, root2, idx, worst, "vec_id")
    assert(idx2.centroids.map { case (c, v) => c -> v.toSeq }.toSeq
      == idx2b.centroids.map { case (c, v) => c -> v.toSeq }.toSeq,
      "refreshed centroids must not depend on the tenant layout")
    def assignments(r: String) = IvfIndex.readStoreLatest(spark, r, "vec_id")
      .select("vec_id", "cell").collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(assignments(root) == assignments(root2),
      "tenant and cell-only refresh must land identical assignments")
  }

  test("size-guarded tombstone fold (round 11, VERDICT r10 task 3): a bulk " +
      "delete past the broadcast bound degrades the fold to an unhinted " +
      "(shuffle-capable) join with IDENTICAL results") {
    import spark.implicits._
    val idx = IvfIndex.centroidsByDraw(
      emb.filter(col("vec_id") < 200), "vec_id", "embedding", nCells = 8)
    val root = java.nio.file.Files.createTempDirectory("ivf-guard").toString
    IvfIndex.buildStoreVersioned(spark, root,
      emb.filter(col("vec_id") < 200), "embedding", idx)
    // bulk delete: 60 ids — force the guard by setting the bound to 0
    IvfIndex.deleteFromStore(spark, root,
      (0L until 60L).map(_ * 3).toDF("vec_id"), "vec_id")
    def rows(maxB: Long) = IvfIndex
      .readStoreLatest(spark, root, "vec_id", maxBroadcastTombstones = maxB)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // pin auto-broadcast off so the PLAN shape proves the guard (not AQE)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val guarded = IvfIndex.readStoreLatest(
        spark, root, "vec_id", maxBroadcastTombstones = 0L)
      val plan = guarded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"guarded fold must not plan a broadcast:\n$plan")
      val hinted = IvfIndex.readStoreLatest(spark, root, "vec_id")
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "small-tombstone fold must keep the broadcast fast path")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(rows(0L) == rows(IvfIndex.DefaultMaxBroadcastTombstones),
      "guarded and broadcast folds must return identical live rows")
    assert(rows(0L).size == 200 - 60 + (0 until 60).count(i => i * 3 >= 200))
  }
}
