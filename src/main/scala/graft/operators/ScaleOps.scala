package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Skew-resilient aggregation building blocks for 100 TB runs. */
object ScaleOps {

  private def requireNoScratchClash(df: DataFrame, reserved: String*): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has reserved scratch column(s) ${clash.mkString(", ")}")
  }

  /** Range-partition `df` on `sortCols` and stamp each row with its shuffle
    * partition id. The caller MUST pass a TOTAL order (include a unique
    * tiebreak column): range boundaries come from sampling and may place
    * equal sort keys on either side of a cut, so only a total order makes
    * the downstream global numbering deterministic. Partition sizes are
    * balanced by the range sampler regardless of key skew — no single
    * reducer ever holds the whole table, unlike `Window.orderBy` with no
    * `partitionBy` (one-partition window, the classic global-rank
    * scale-killer this primitive exists to replace).
    */
  private def rangeWithPid(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint pins ONE materialization of the range partitioning:
    // RangePartitioner samples boundaries with an RDD-id-dependent seed, so
    // the offset-count job and the numbering job would otherwise each plan
    // their own exchange and disagree on where the cuts fall. Lineage
    // truncation makes a lost block a loud job failure, never a silent
    // renumbering — and a distributed global rank materializes its sorted
    // runs in any engine, so this is the inherent cost, not overhead.
    df.repartitionByRange(n, sortCols: _*).localCheckpoint()
      .withColumn("__pid", spark_partition_id())
  }

  /** Per-range-partition scalar images (one row per partition — bounded by
    * the partition count, never by data) and their exclusive prefix, as
    * strings so DECIMAL images survive the driver round-trip exactly.
    */
  private def partitionPrefix(part: DataFrame,
      image: Column): Seq[(Int, String, String)] = {
    val rows = part.groupBy(col("__pid")).agg(image.as("__img"))
      .collect().map(r => (r.getInt(0), r.get(1))).sortBy(_._1)
    var acc = BigDecimal(0)
    rows.toSeq.map { case (pid, img) =>
      val v = img match {
        case null => BigDecimal(0)
        case b: java.math.BigDecimal => BigDecimal(b)
        case l: java.lang.Long => BigDecimal(l.longValue)
        case i: java.lang.Integer => BigDecimal(i.intValue)
        case other => BigDecimal(other.toString)
      }
      val out = (pid, acc.bigDecimal.toPlainString, v.bigDecimal.toPlainString)
      acc += v
      out
    }
  }

  /** Deterministic global `row_number` without a single-partition window:
    * range-repartition on the sort key, count rows per partition (a
    * partition-count-sized driver image), broadcast the exclusive prefix
    * offsets back, and number within each partition. `sortCols` must be a
    * total order (unique tiebreak) — see [[rangeWithPid]]. Output column is
    * LONG (global counts exceed INT at scale). Two jobs over one shuffle:
    * the count pass and the window pass reuse the same exchange output.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      as: String = "rn", numPartitions: Int = 0): DataFrame = {
    requireNoScratchClash(df, "__pid", "__off", as)
    val part = rangeWithPid(df, sortCols, numPartitions)
    val offs = partitionPrefix(part, count(lit(1)).cast("decimal(20,0)"))
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      offs.map { case (pid, off, _) => (pid, off.toLong) }).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    part.join(broadcast(offDf), "__pid")
      .withColumn(as, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** Deterministic global NTILE(k) with SQL semantics (first `n % k`
    * buckets get the extra row) built on [[globalRowNumber]]'s machinery —
    * the scale-safe quantile scorer behind RFM-style segmentation. The
    * bucket is a closed-form expression over the global row number, so the
    * only driver state is the per-partition count image. Output is INT,
    * matching `ntile()`. `sortCols` must be a total order.
    */
  def globalNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
      as: String = "bucket", numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireNoScratchClash(df, "__pid", "__off", "__grn", as)
    val part = rangeWithPid(df, sortCols, numPartitions)
    val offs = partitionPrefix(part, count(lit(1)).cast("decimal(20,0)"))
    val n = offs.map(_._3.toLong).sum
    val base = if (n >= k) n / k else 0L
    val rem = n % k
    val cut = rem * (base + 1)
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      offs.map { case (pid, off, _) => (pid, off.toLong) }).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    // SQL NTILE: rows 1..cut fall in the rem wide buckets of base+1 rows;
    // the rest in buckets of base rows. base==0 (n<k) never reaches the
    // else branch (cut==n), but keep its denominator positive anyway.
    // SQL `div` keeps the arithmetic in exact BIGINT (Column./ is double).
    part.join(broadcast(offDf), "__pid")
      .withColumn("__grn", row_number().over(w).cast("long") + col("__off"))
      .withColumn(as, expr(
        s"""CAST(CASE WHEN __grn <= $cut THEN (__grn - 1) div ${base + 1} + 1
           |ELSE $rem + (__grn - 1 - $cut) div ${math.max(base, 1L)} + 1
           |END AS INT)""".stripMargin))
      .drop("__pid", "__off", "__grn")
  }

  /** Deterministic global running sum (total-ordered cumulative sum)
    * without a single-partition window: per-partition sums form a bounded
    * driver image whose exclusive prefix is broadcast back and added to
    * each partition's local running sum — algebraically identical to the
    * one-partition window, exact when `valueCol` is DECIMAL (offsets ride
    * as strings and re-enter through an exact decimal parse at the window
    * sum's own type). `sortCols` must be a total order.
    */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      as: String = "running", numPartitions: Int = 0): DataFrame = {
    requireNoScratchClash(df, "__pid", "__off", as)
    val part = rangeWithPid(df, sortCols, numPartitions)
    val sumType: DataType = part.select(sum(valueCol).as("__s")).schema.head.dataType
    val offs = partitionPrefix(part, sum(valueCol))
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      offs.map { case (pid, off, _) => (pid, off) }).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part.join(broadcast(offDf), "__pid")
      .withColumn(as, col("__off").cast(sumType) + sum(valueCol).over(w))
      .drop("__pid", "__off")
  }

  /** Per-GROUP total-ordered running sum that survives few-huge-groups
    * skew: `Window.partitionBy(group)` would hold an entire group in one
    * reducer, so instead the table range-repartitions on (group ++
    * innerSort) — groups land contiguous, partition sizes stay balanced by
    * the range sampler — and the driver image is one row per (partition,
    * group-slice): ≤ numPartitions + distinct-groups-spanning-cuts rows.
    * Exclusive per-group prefixes broadcast back and add to each
    * partition's local per-group running sum. `innerSort` must totally
    * order rows within a group; group values must be NON-NULL (the offset
    * re-attach is an equi-join — filter null groups first). Exact for
    * DECIMAL `valueCol`.
    */
  def groupedGlobalRunningSum(df: DataFrame, groupCols: Seq[String],
      innerSort: Seq[Column], valueCol: Column, as: String = "running",
      numPartitions: Int = 0): DataFrame = {
    requireNoScratchClash(df, "__pid", "__off", as)
    require(groupCols.nonEmpty, "need at least one group column")
    val sortAll = groupCols.map(col) ++ innerSort
    val part = rangeWithPid(df, sortAll, numPartitions)
    val sumType: DataType = part.select(sum(valueCol).as("__s")).schema.head.dataType
    val imgDf = part.groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(sum(valueCol).as("__s"))
    // the image is one row per (partition, group-slice): right for FEW huge
    // groups (the regime that kills Window.partitionBy(group)); with MANY
    // small groups use the plain per-group window instead — no group is big
    // enough to skew, and this driver image would approach the group count.
    val imgRows = imgDf.count()
    require(imgRows <= 1000000L,
      s"offset image has $imgRows rows — group cardinality is high, so " +
        "per-group windows are already skew-free; use those instead")
    val img = imgDf.collect()
    // exclusive prefix per group across partitions, pid-ascending
    val byGroup = img.map { r =>
      val gk = groupCols.indices.map(i => r.get(i + 1))
      (gk, r.getInt(0), r.get(groupCols.length + 1))
    }.groupBy(_._1)
    val offRows = byGroup.toSeq.flatMap { case (_, slices) =>
      var acc = BigDecimal(0)
      slices.sortBy(_._2).map { case (gk, pid, s) =>
        val v = s match {
          case null => BigDecimal(0)
          case b: java.math.BigDecimal => BigDecimal(b)
          case l: java.lang.Long => BigDecimal(l.longValue)
          case other => BigDecimal(other.toString)
        }
        val row = org.apache.spark.sql.Row.fromSeq(
          pid +: gk :+ acc.bigDecimal.toPlainString)
        acc += v
        row
      }
    }
    val spark = df.sparkSession
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
        groupCols.map(g => part.schema(g)) :+
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.StringType))
    val offDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(offRows).asJava), offSchema)
    val w = Window.partitionBy((col("__pid") +: groupCols.map(col)): _*)
      .orderBy(innerSort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part.join(broadcast(offDf), "__pid" +: groupCols)
      .withColumn(as, col("__off").cast(sumType) + sum(valueCol).over(w))
      .drop("__pid", "__off")
  }

  /** Exact distinct count per key without per-key distinct-set state:
    * phase 1 collapses (key, value) pairs (map-side combine sheds
    * duplicates early), phase 2 counts survivors per key. Unlike
    * `countDistinct`, no task ever holds a large distinct set for a hot key.
    */
  def exactDistinctCount(
      df: DataFrame, keyCols: Seq[String], valueCol: Column,
      as: String = "n_distinct"): DataFrame =
    df.select((keyCols.map(col) :+ valueCol.as("__v")): _*)
      .groupBy((keyCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__dup"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(as))

  /** Two-phase salted sum for pathologically hot keys: phase 1 aggregates
    * (key, salt) — spreading one hot key over `salts` reducers — phase 2
    * combines partials. Results are identical to a direct sum for any salt
    * assignment; `spark_partition_id` needs no extra column or randomness.
    */
  def saltedSum(
      df: DataFrame, keyCols: Seq[String], valueCol: Column,
      salts: Int = 32, as: String = "sum"): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(as))
}
