package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) ANN over an embedding column — the compression
  * rung below int8 on this engine's scaling ladder (FLOAT 4 B/dim → int8
  * 1 B/dim → PQ m bytes per VECTOR). With dim=64 and m=8 subspaces a vector
  * costs 8 bytes instead of 256: a 100 TB float corpus's search structure
  * fits in ~3 TB of codes, and an ADC scan reads ONLY the narrow `pq` column
  * (columnar projection does the 32× I/O cut; the float vectors stay in
  * their own column, touched just for the shortlist re-rank).
  *
  * The pipeline mirrors the reference's brute-force serving capability
  * (/root/reference/internal/vectordb/vectordb.go:94-104 scores every vector
  * per query) re-expressed as index + pruned scan, and composes with
  * [[IvfIndex]] into the standard IVF-PQ two-stage retrieval: coarse cells
  * prune partitions, ADC over codes ranks cheaply, exact cosine re-ranks a
  * bounded shortlist.
  *
  * Determinism contract (what makes q3p/q3q oracle-able in DuckDB): the
  * codebook draw orders by (md5(id), id) — the [[IvfIndex.centroidsByDraw]]
  * technique — and every distance is a left-to-right double fold over float
  * inputs ([[graft.functions.L2SquaredDistance]]); encode ranks codewords by
  * (round(d², 6) ASC, code ASC), ADC sums per-subspace LUT terms in subspace
  * order and rounds the total to 6. DuckDB replays all of it with
  * `list_slice` + the identical (x−y)·(x−y) fold.
  */
object PqIndex {

  /** A trained codebook: `codewords(j)(c)` is codeword c of subspace j.
    * Index metadata by contract (m × nCodes × subDim floats — a few KB),
    * shipped to executors as inlined literals, never joined.
    */
  final case class Codebook(subDim: Int, codewords: Array[Array[Array[Float]]]) {
    def m: Int = codewords.length
    def nCodes: Int = codewords.head.length
    require(m > 0 && nCodes > 0 && subDim > 0, "empty PQ codebook")
  }

  /** Deterministic codebook: the `nCodes` corpus vectors with the smallest
    * (md5(id), id) provide subspace j's codewords via their j-th sub-vector —
    * one bounded TakeOrderedAndProject scan, no RNG state, replayable in SQL.
    * (A k-means-refined codebook would cut quantization error further but —
    * like [[IvfIndex.refine]] — trades bit-exact replayability for recall;
    * the draw keeps the oracle gate on the full pipeline.)
    */
  def codebookByDraw(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, nCodes: Int): Codebook = {
    require(m > 0, s"m must be positive, got $m")
    require(nCodes > 0 && nCodes <= 127, s"nCodes must fit a byte code, got $nCodes")
    val rows = corpus
      .select(md5(col(idCol).cast("string")).as("__d"),
        col(idCol).cast("string").as("__id"),
        VectorFunctions.asFloatArray(col(vecCol)).as("__v"))
      .orderBy(col("__d"), col("__id"))
      .limit(nCodes)
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("__v").toArray)
    require(rows.nonEmpty, "PQ codebook draw over an empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    Codebook(subDim, Array.tabulate(m) { j =>
      rows.map(v => v.slice(j * subDim, (j + 1) * subDim))
    })
  }

  /** Lloyd's k-means refinement of a codebook — PQ training proper: `iters`
    * rounds of encode → per-(subspace, code) mean of the assigned
    * sub-vectors. Each round is one narrow encode pass plus one
    * partial-aggregated shuffle keyed on (dim-position, code); the driver
    * collect per round is m × nCodes × subDim doubles — index metadata.
    * Codes with no assigned vectors keep their previous codeword. Like
    * [[IvfIndex.refine]], distributed float means trade the draw's bit-exact
    * SQL replayability for reconstruction error (RecallSpec gates the lift);
    * keep [[codebookByDraw]] output where oracle parity matters.
    */
  def refineCodebook(
      corpus: DataFrame, vecCol: String, cb: Codebook, iters: Int = 3): Codebook = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var book = cb
    var round = 0
    while (round < iters) {
      val sums = encode(corpus, vecCol, book, codesCol = "__pq")
        .select(col("__pq"),
          posexplode(VectorFunctions.asFloatArray(col(vecCol))).as(Seq("__i", "__x")))
        .withColumn("__j", (col("__i") / book.subDim).cast("int"))
        .select(col("__j"),
          element_at(col("__pq"), col("__j") + 1).cast("int").as("__c"),
          (col("__i") % book.subDim).as("__p"),
          col("__x").cast("double"))
        .groupBy("__j", "__c", "__p")
        .agg(avg(col("__x")).as("__m"))
        .collect()
      val byJc = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      val next = Array.tabulate(book.m) { j =>
        Array.tabulate(book.nCodes) { c =>
          byJc.get((j, c)) match {
            case Some(rows) =>
              val v = book.codewords(j)(c).clone()
              rows.foreach(r => v(r.getInt(2)) = r.getDouble(3).toFloat)
              v
            case None => book.codewords(j)(c)
          }
        }
      }
      book = Codebook(book.subDim, next)
      round += 1
    }
    book
  }

  /** PQ codes for a vector column: `ARRAY<TINYINT>` of length m, one codegen
    * pass, zero shuffle. Subspace j's code is the argmin codeword by
    * (round(d², 6) ASC, code ASC), encoded as the struct-ordering min of
    * (d, code) — the [[IvfIndex.assignCell]] trick with min instead of max.
    */
  def encodeExpr(vec: Column, cb: Codebook): Column = {
    val perSub = (0 until cb.m).map { j =>
      val sub = slice(vec, j * cb.subDim + 1, cb.subDim)
      val scored = cb.codewords(j).zipWithIndex.map { case (cw, c) =>
        struct(
          round(VectorFunctions.l2Sq(sub, typedLit(cw)), 6).as("d"),
          lit(c).as("c"))
      }
      array_min(array(scored.toIndexedSeq: _*)).getField("c").cast("byte")
    }
    array(perSub: _*)
  }

  /** Corpus with a `codesCol` PQ-codes column appended (the index build's
    * data pass). At scale, persist with the codes and the float vector as
    * separate columns of one table: ADC scans prune to the codes column.
    */
  def encode(
      corpus: DataFrame, vecCol: String, cb: Codebook,
      codesCol: String = "pq"): DataFrame =
    corpus.withColumn(codesCol, encodeExpr(col(vecCol), cb))

  /** The asymmetric-distance lookup table for one query: `lut(j)(c)` is the
    * exact squared L2 distance from the query's j-th sub-vector to codeword
    * (j, c), accumulated left-to-right in double — the same arithmetic as
    * [[graft.functions.L2SquaredDistance]] so the inlined literals agree
    * with what the oracle recomputes in SQL.
    */
  def lut(cb: Codebook, queryVec: Array[Float]): Array[Array[Double]] = {
    require(queryVec.length == cb.m * cb.subDim,
      s"query dim ${queryVec.length} != ${cb.m} x ${cb.subDim}")
    Array.tabulate(cb.m) { j =>
      cb.codewords(j).map { cw =>
        var d = 0.0
        var i = 0
        while (i < cb.subDim) {
          val t = queryVec(j * cb.subDim + i).toDouble - cw(i).toDouble
          d += t * t
          i += 1
        }
        d
      }
    }
  }

  /** ADC distance of a codes column to the query: m literal-array lookups
    * summed in subspace order, rounded to `scoreScale` — no vector column is
    * read at all. Lowers to pure codegen (element_at over literals).
    */
  def adcDistExpr(codes: Column, table: Array[Array[Double]],
      scoreScale: Int = 6): Column = {
    val terms = table.zipWithIndex.map { case (row, j) =>
      element_at(typedLit(row), codes.getItem(j).cast("int") + 1)
    }
    round(terms.reduceLeft(_ + _), scoreScale)
  }

  /** PQ ADC top-k: rank the encoded corpus by approximate distance ascending
    * (tiebreak id), reading only the codes column. Lowers to
    * TakeOrderedAndProject like the exact path.
    */
  def search(
      encoded: DataFrame, codesCol: String, queryVec: Array[Float],
      cb: Codebook, k: Int, tiebreak: String,
      distCol: String = "adist"): DataFrame =
    encoded
      .withColumn(distCol, adcDistExpr(col(codesCol), lut(cb, queryVec)))
      .orderBy(col(distCol).asc, col(tiebreak).asc)
      .limit(k)

  /** Adaptive shortlist size: `max(r0, ceil(frac × poolSize))`, never below
    * k. A FIXED shortlist's recall decays as the candidate pool grows (the
    * measured r=50 cliff: PQ k-means rerank 0.94 → 0.81 and 16-dim
    * Matryoshka 0.545 → 0.255 from 500 to 2000 vectors) because r/N is the
    * actual knob. `frac` defaults to 0.10 — the ratio the sf0.01 recall
    * gates were pinned at (r0=50 over N=500) — so growing corpora keep the
    * gated operating point. Cost is linear and bounded: the ADC top-r heap
    * plus an r-row exact re-rank, and under IVF-PQ `poolSize` is the PROBED
    * rows (post partition-pruning), not the corpus.
    */
  def adaptiveShortlist(
      poolSize: Long, k: Int, r0: Int = 50, frac: Double = 0.10): Int = {
    require(poolSize >= 0, s"negative poolSize $poolSize")
    require(k > 0, s"k must be positive, got $k")
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val scaled = math.min(math.ceil(frac * poolSize), Int.MaxValue.toDouble).toInt
    math.max(k, math.max(r0, scaled))
  }

  /** Two-stage PQ retrieval: ADC shortlists `r` candidates from codes alone,
    * exact cosine re-ranks just those `r` rows to the final top-k. The
    * shortlist (ids only) broadcasts back onto the corpus, so the expensive
    * float column is fetched for r rows, not the corpus.
    */
  def searchRerank(
      encoded: DataFrame, idCol: String, vecCol: String, codesCol: String,
      queryVec: Array[Float], cb: Codebook, r: Int, k: Int,
      scoreScale: Int = 6): DataFrame = {
    require(r >= k, s"shortlist r=$r smaller than k=$k")
    val shortlist = search(encoded, codesCol, queryVec, cb, r, tiebreak = idCol)
      .select(col(idCol))
    encoded.join(broadcast(shortlist), Seq(idCol))
      .withColumn("score",
        round(VectorFunctions.cosine(col(vecCol), typedLit(queryVec)), scoreScale))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .drop(codesCol)
  }

  /** The IVF × PQ store: coarse cell for partition pruning + PQ codes for
    * the cheap in-cell scan, float vector kept as a sibling column for the
    * re-rank fetch. Write partitioned by `cellCol`.
    */
  def ivfPqStore(
      corpus: DataFrame, vecCol: String, ivf: IvfIndex.Index, cb: Codebook,
      cellCol: String = "cell", codesCol: String = "pq"): DataFrame =
    encode(IvfIndex.assign(corpus, vecCol, ivf, cellCol), vecCol, cb, codesCol)

  /** The IVF-PQ store as a snapshot commit (round 9, VERDICT r8 task 4 —
    * the codes-store twin of `IvfIndex.buildStoreVersioned`): one full
    * (re)build published cell-partitioned under `root`. Returns the
    * committed version.
    */
  def buildIvfPqStoreVersioned(
      spark: org.apache.spark.sql.SparkSession, root: String,
      corpus: DataFrame, vecCol: String, ivf: IvfIndex.Index, cb: Codebook,
      cellCol: String = "cell", codesCol: String = "pq",
      extraPartitionCols: Seq[String] = Seq.empty): Int =
    graft.sources.SnapshotStore.overwrite(
      spark, root, ivfPqStore(corpus, vecCol, ivf, cb, cellCol, codesCol),
      partitionBy = cellCol +: extraPartitionCols)

  /** Incrementally add `newVecs` to an IVF-PQ store: encode with the
    * FROZEN codebook, assign with the FROZEN coarse centroids, commit one
    * cell-partitioned delta dir (reference parity:
    * internal/vectordb/vectordb.go:117-193 continuous upsert). Recall
    * drift of the frozen quantizers vs a fresh rebuild is the RecallSpec
    * gate; past tolerance, rebuild via [[buildIvfPqStoreVersioned]].
    */
  def appendToIvfPqStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newVecs: DataFrame, vecCol: String, ivf: IvfIndex.Index, cb: Codebook,
      cellCol: String = "cell", codesCol: String = "pq",
      expectedBase: Option[Int] = None,
      extraPartitionCols: Seq[String] = Seq.empty): Int =
    graft.sources.SnapshotStore.append(
      spark, root, ivfPqStore(newVecs, vecCol, ivf, cb, cellCol, codesCol),
      expectedBase, partitionBy = cellCol +: extraPartitionCols)

  /** Id-level UPSERT into an IVF-PQ store (round 10 — the codes-store twin
    * of `IvfIndex.upsertToStore`; reference parity vectordb.go:117-193):
    * one commit carrying a tombstone per incoming id (kills every
    * strictly-older copy, cell-agnostic — an update can move cells) plus
    * the re-encoded replacement rows. Deletes, latest-wins reads and
    * physical compaction are the SHARED quantization-agnostic mechanics:
    * use `IvfIndex.deleteFromStore` / `IvfIndex.readStoreLatest` /
    * `IvfIndex.compactStore` on the same root, and feed
    * `readStoreLatest`'s output to [[searchIvfPq]].
    */
  def upsertToIvfPqStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newVecs: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex.Index, cb: Codebook,
      cellCol: String = "cell", codesCol: String = "pq",
      expectedBase: Option[Int] = None, dirTag: Option[String] = None,
      extraPartitionCols: Seq[String] = Seq.empty): Int = {
    val data = ivfPqStore(newVecs, vecCol, ivf, cb, cellCol, codesCol)
      .withColumn(IvfIndex.OpCol, lit("U"))
    val df = data.unionByName(IvfIndex.tombstonesLike(
      data, newVecs.select(col(idCol)), idCol, cellCol))
    graft.sources.SnapshotStore.append(
      spark, root, df, expectedBase, partitionBy = cellCol +: extraPartitionCols,
      dirTag = dirTag)
  }

  /** Per-cell row counts of an IVF(-PQ) store, materialized ONCE at build
    * time: the map is bounded by nCells (index metadata scale, like the
    * centroids themselves), and lets every subsequent query size its
    * adaptive shortlist by summing the probed cells' counts instead of
    * running a per-query `count()` job over the pruned partitions.
    */
  def cellCounts(store: DataFrame, cellCol: String = "cell"): Map[Int, Long] =
    store.groupBy(col(cellCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(row => row.get(0).asInstanceOf[Number].intValue -> row.getLong(1))
      .toMap

  /** One measured point of the rerank-shortlist trade-off: recall@k of the
    * two-stage search at shortlist `r`, and the rerank cost as r over the
    * candidate pool (the fraction of the pool whose FLOAT vectors are
    * fetched — the stage the shortlist exists to bound).
    */
  final case class ShortlistPoint(r: Int, recall: Double, rerankFrac: Double)

  /** [[tuneShortlistForRecall]] output: the measured curve and the cheapest
    * (smallest r) point meeting the target, None when even the widest grid
    * point misses it.
    */
  final case class ShortlistTune(
      best: Option[ShortlistPoint], curve: Seq[ShortlistPoint])

  /** The shortlist leg of the recall auto-tuner (VERDICT r7 task 2): sweep
    * the two-stage rerank shortlist `r` over a fraction ladder of the pool
    * and return the smallest r meeting `targetRecall` at k. Runs the REAL
    * distributed [[searchRerank]] path per (query, r) against the exact
    * local cosine ranking (the RecallHarness arithmetic). Same audit-sample
    * contract as `IvfIndex.tuneForRecall`; the chosen r transfers to the
    * full corpus as the ratio r/N via [[adaptiveShortlist]]'s `frac` knob
    * (r/N is the real operating point — the measured r=50 recall cliff).
    */
  def tuneShortlistForRecall(
      corpus: DataFrame, idCol: String, vecCol: String, cb: Codebook,
      targetRecall: Double, k: Int,
      fracGrid: Seq[Double] = Seq(0.02, 0.05, 0.10, 0.20, 0.40),
      nQueries: Int = 10): ShortlistTune = {
    require(targetRecall > 0 && targetRecall <= 1, s"bad target $targetRecall")
    require(fracGrid.nonEmpty && fracGrid.forall(f => f > 0 && f <= 1),
      s"bad shortlist fraction grid $fracGrid")
    val encoded = encode(corpus, vecCol, cb).localCheckpoint()
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"),
        VectorFunctions.asFloatArray(col(vecCol)).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    require(vecs.length > k, s"audit sample smaller than k=$k")
    val queries = vecs.take(nQueries)
    val exactByQ = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid).map { case (id, v) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
      }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
    }.toMap
    val pool = vecs.length - 1 // each query excludes itself
    val rLadder = fracGrid.map(f =>
      math.max(k, math.ceil(f * pool).toInt)).distinct.sorted
    val curve = rLadder.map { r =>
      val per = queries.map { case (qid, qv) =>
        val got = searchRerank(
          encoded.filter(col(idCol).cast("long") =!= qid),
          idCol, vecCol, "pq", qv, cb, r, k)
          .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
        (exactByQ(qid) intersect got).size.toDouble / k
      }
      ShortlistPoint(r, per.sum / per.length, r.toDouble / pool)
    }
    ShortlistTune(curve.filter(_.recall >= targetRecall).headOption, curve)
  }

  /** Full IVF-PQ search: probe nProbe cells (partition pruning), ADC over
    * the probed cells' codes, exact re-rank of the r-shortlist — the
    * three-tier cost shape (nProbe/nCells of the data → m-byte codes →
    * r float vectors) that survives 100 TB.
    *
    * `r ≤ 0` (the default) sizes the shortlist adaptively via
    * [[adaptiveShortlist]] over the PROBED row count — recall then tracks
    * the sf0.01-gated r/N operating point at any scale instead of decaying
    * as the pool outgrows a fixed r. Pass `counts` (the [[cellCounts]] map
    * materialized at store-build time) and the probed size is the sum of
    * the probed cells' entries — zero extra jobs at query time; without it
    * the sizing falls back to one codes-column-free count job over the
    * pruned partitions. An explicit `r > 0` skips sizing entirely
    * (oracle-pinned queries like q3q do).
    */
  def searchIvfPq(
      store: DataFrame, idCol: String, vecCol: String, queryVec: Array[Float],
      ivf: IvfIndex.Index, cb: Codebook, nProbe: Int, r: Int = -1, k: Int,
      cellCol: String = "cell", codesCol: String = "pq",
      counts: Option[Map[Int, Long]] = None): DataFrame = {
    val cells = IvfIndex.probeCells(ivf, queryVec, nProbe)
    val probed = store.where(col(cellCol).isin(cells: _*))
    val rr =
      if (r > 0) r
      else {
        val pool = counts match {
          case Some(m) => cells.map(c => m.getOrElse(c, 0L)).sum
          case None => probed.count()
        }
        adaptiveShortlist(pool, k)
      }
    searchRerank(probed, idCol, vecCol, codesCol, queryVec, cb, rr, k)
  }
}
