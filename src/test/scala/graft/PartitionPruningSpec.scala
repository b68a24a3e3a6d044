package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout query pruning — the other half of the 100 TB scan
  * story next to BucketingSpec and the Manifest skipping tier: a
  * day-partitioned fact directory must be pruned STATICALLY by literal
  * partition predicates, and DYNAMICALLY (DPP) when the partition keys
  * arrive only through a selective dimension join.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writePartitioned(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("pp_facts").toString
    val facts = Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", expr("unix_millis(ts) div 86400000"))
    facts.write.partitionBy("day").mode("overwrite").parquet(dir)
    (dir, facts)
  }

  private def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute THIS df's own QueryExecution so its metrics populate
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collectWithSubqueries { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  test("static pruning: a literal day predicate reaches PartitionFilters and drops files") {
    val (dir, facts) = writePartitioned()
    val someDay = facts.select(min(col("day"))).collect()(0).getLong(0)
    val read = spark.read.parquet(dir).filter(col("day") === someDay)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"partition filter missing:\n$plan")
    // the pruned scan must READ strictly fewer files than the full table
    val allFiles = filesScanned(spark.read.parquet(dir))
    val pruned = filesScanned(read)
    assert(pruned < allFiles, s"pruning read $pruned of $allFiles files")
    assert(read.count() == facts.filter(col("day") === someDay).count())
  }

  test("dynamic partition pruning: partition keys arriving via a selective dim join") {
    val (dir, facts) = writePartitioned()
    import spark.implicits._
    // fixture tables are tiny, so disable the stats-based benefit estimate
    // (on a 100 TB fact table the default heuristics fire on their own)
    val prevStats = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prevRatio = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100000")
    try {
    val days = facts.select(col("day")).distinct()
      .orderBy(col("day")).collect().map(_.getLong(0))
    // a dimension whose filter selects ONE partition — the DPP shape.
    // Two traps this spec pins: (a) d_day must carry the READ-side
    // partition type (a cast on the partition attribute defeats DPP);
    // (b) the dim must be FILE-backed — a local Seq collapses its Filter
    // into a LocalTableScan (ConvertToLocalRelation), and DPP requires a
    // surviving selective Filter on the filtering side.
    val read = spark.read.parquet(dir)
    val dayType = read.schema("day").dataType
    val dimDir = java.nio.file.Files.createTempDirectory("pp_dim").toString
    days.zipWithIndex
      .map { case (d, i) => (d, if (i == 0) "keep" else "drop") }
      .toSeq.toDF("d_day", "flag")
      .withColumn("d_day", col("d_day").cast(dayType))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = read
      .join(broadcast(dim.filter(col("flag") === "keep")),
        col("day") === col("d_day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP subquery in plan:\n$plan")
    // DPP must actually drop partitions at run time, not just plan them
    val pruned = filesScanned(joined)
    val allFiles = filesScanned(read)
    assert(pruned < allFiles, s"DPP read $pruned of $allFiles files")
    assert(joined.count() ==
      facts.filter(col("day") === days.head).count())
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", prevRatio)
    }
  }
}
