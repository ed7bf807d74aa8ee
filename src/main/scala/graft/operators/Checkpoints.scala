package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for the iterative operators (PageRank, label
  * propagation, connected components, near-dup components).
  *
  * Why truncation at all: a k-iteration loop that only `persist()`s grows a
  * plan tree linearly in k, and every action re-analyzes the WHOLE tree on
  * the driver — a measured multi-second pure-planning tax per action at
  * sf0.1 (see Graph.pageRank's scaladoc). Checkpointing swaps the tree for
  * a flat scan leaf each round.
  *
  * Why two modes: `localCheckpoint()` keeps blocks on executors — fast, no
  * shared storage needed, but NON-RELIABLE: losing an executor loses
  * blocks and, because lineage was truncated, the job cannot recompute
  * them. Fine on local[n] and for short jobs; fatal for a long run on a
  * real cluster. Passing `checkpointDir` switches to reliable
  * `checkpoint()` on that directory (use a shared filesystem — HDFS/object
  * store — on a cluster): each round's state is persisted storage-side, so
  * executor loss costs a re-read, not the job. Results are bit-identical
  * either way — the mode changes WHERE the truncated state lives, never
  * its contents — and the plan keeps the same truncated scan-leaf shape.
  */
object Checkpoints {

  /** Truncate `df`'s lineage: reliable `checkpoint()` into `checkpointDir`
    * when given, executor-local `localCheckpoint()` otherwise. */
  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
