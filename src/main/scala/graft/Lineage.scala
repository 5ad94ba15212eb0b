package graft

import org.apache.spark.sql.DataFrame

/** Block lifecycle for eagerly-localCheckpointed loop state (the
  * k-center greedy, the BPE merge loop): each round's state frame is
  * an eager DISK_ONLY `localCheckpoint`, and the PREVIOUS round's
  * blocks must be released explicitly once the new state
  * materializes.
  */
private[graft] object Lineage {

  /** Release the blocks of a localCheckpointed frame. Checkpointed
    * RDDs live outside the SQL cache manager, so `Dataset.unpersist`
    * cannot free them and the ContextCleaner only reclaims them at
    * some later GC — too lazy for an iterative loop holding one
    * corpus-sized state per round. The checkpointed RDD is the leaf
    * of the frame's analyzed plan (a LogicalRDD).
    *
    * A checkpointed plan with NO LogicalRDD leaf means a Spark
    * version changed the checkpoint plan shape; a silent no-op
    * closure would reintroduce unbounded per-round block
    * accumulation, so that fails loudly here instead (caught by the
    * loop specs, not in production at 3 a.m.).
    */
  def checkpointRelease(chk: DataFrame): () => Unit = {
    val rdds = chk.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    require(rdds.nonEmpty, "localCheckpointed frame has no LogicalRDD " +
      "leaf — the checkpoint plan shape drifted and block release would " +
      "silently no-op, leaking one checkpointed state per loop round")
    () => rdds.foreach(_.unpersist(blocking = false))
  }
}
