package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage pinning for iterative operators (VERDICT r7 task 7): every
  * loop (PageRank, LPA, connected components, Lloyd, GD, Jenks, boosting)
  * must truncate its lineage per round or the plan grows without bound.
  * Two modes behind one helper:
  *
  *   - default: `localCheckpoint` — executor-local blocks, zero external
  *     storage, the right trade on a single machine or for short loops.
  *     The blocks are UNREPLICATED: on a real cluster, losing an executor
  *     mid-loop kills the job instead of recomputing (truncated lineage
  *     has nothing to recompute from).
  *   - reliable (opt-in): real `checkpoint` to the configured
  *     `SparkContext.setCheckpointDir` — each round's state lands on
  *     reliable storage (HDFS/object store), so executor loss costs one
  *     re-read, not the job. Flip it for long iterative jobs on clusters
  *     where preemption/spot loss is routine; cost is one write+read of
  *     the iteration state per round.
  *
  * Mode is a session conf so deployments flip it without code changes:
  * `spark.conf.set(IterCheckpoint.ConfKey, "true")` (plus
  * `sc.setCheckpointDir(...)`). Both modes are value-identical —
  * IterCheckpointSpec runs the graph/ML loops under each and compares
  * results row-for-row.
  */
object IterCheckpoint {

  /** Session conf key: "true" switches every iterative pin in the engine
    * to reliable checkpoints.
    */
  val ConfKey = "spark.graft.reliableIterationCheckpoints"

  /** Pin `df` for the next iteration round in the configured mode. */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    // no try/catch: getOption on a plain string key does not throw, and a
    // swallow-everything guard here would silently downgrade a REQUESTED
    // reliable checkpoint to localCheckpoint — the opposite of the knob's
    // loud-refusal design (round-9 ADVICE)
    val reliable =
      spark.conf.getOption(ConfKey).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ConfKey=true requires SparkContext.setCheckpointDir " +
          "(a reliable-storage path) before running iterative operators")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  /** Enrichment so call sites read like the built-in:
    * `state.iterCheckpoint()` instead of `state.localCheckpoint()`.
    */
  implicit final class Pinnable(private val df: DataFrame) extends AnyVal {
    def iterCheckpoint(): DataFrame = pin(df)
    def iterCheckpoint(eager: Boolean): DataFrame = pin(df, eager)
  }
}
