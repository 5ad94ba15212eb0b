package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store backend selection for the stateful operators
  * ([[Sessionize]]'s flatMapGroupsWithState, [[StreamJoin]]'s
  * dual-watermark buffers, [[WindowedAgg]]).
  *
  * The default HDFS-backed provider keeps every key's state as JVM
  * heap objects and writes full snapshots per commit — fine while
  * state fits in executor memory, which local tests and modest
  * deployments satisfy. At 100 TB-stream scale the bound flips:
  * session state for hundreds of millions of concurrently-active keys
  * exceeds any heap, and the RocksDB provider (shipped in Spark,
  * `rocksdbjni` on every cluster classpath) keeps state off-heap in
  * native memory + local SSD with incremental changelog commits — the
  * standard backend for state that outgrows memory. Flip rule of
  * thumb: move to RocksDB when per-executor state approaches ~1-2 GiB
  * or checkpoint commits start dominating micro-batch latency.
  *
  * The provider is captured when a query STARTS (from the session
  * conf), so wrapping query construction + start is sufficient; the
  * operator code is backend-agnostic and identical either way —
  * pinned by SessionizeSpec running the same scenario on both
  * backends.
  */
object StateBackend {
  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` (build + start + drain a streaming query) with the
    * RocksDB state-store provider, restoring the previous backend
    * afterwards.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
