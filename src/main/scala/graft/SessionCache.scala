package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization for expensive-to-build frames (source
  * tables, shingle/minhash frames, ANN indexes).
  *
  * Keyed on `spark.sessionUUID` — unique by construction, where an
  * `identityHashCode` key is not: identity hashes can collide between
  * two LIVE sessions, which would hand one session DataFrames bound to
  * the other. Entries whose session's SparkContext has stopped are
  * evicted lazily on every access, so a long-lived JVM that cycles
  * sessions does not retain their DataFrames (and persisted-block
  * bookkeeping) forever — the blocks themselves die with the context,
  * so eviction here only needs to release the references.
  */
private[graft] final class SessionCache[V] {

  /** Memoizing holder: TrieMap.getOrElseUpdate may evaluate the
    * insertion value more than once under contention, so the map
    * stores an UNEVALUATED lazy holder — racing first callers insert
    * competing holders, exactly one wins the key, and everyone then
    * forces the WINNER's `lazy val` (which the JVM evaluates exactly
    * once, losers' holders are discarded unevaluated). Without this,
    * two concurrent index builders first-touching the same artifact
    * (the Bench wave pattern) could run one side-effecting build —
    * persist or saveAsTable — twice.
    */
  private final class Lazy(thunk: () => V) {
    lazy val value: V = thunk()
  }

  private val entries =
    scala.collection.concurrent.TrieMap.empty[(String, String), (SparkSession, Lazy)]

  /** `sessionUUID` lives on the classic implementation in Spark 4's
    * split API and is `private[sql]` at the Scala level (public in
    * bytecode, so plain reflection reaches it — no setAccessible);
    * any non-classic session (none in this deployment) falls back to
    * identity, scoped by a marker so the two keyspaces cannot collide.
    */
  private def uuid(spark: SparkSession): String = spark match {
    case c: org.apache.spark.sql.classic.SparkSession =>
      classOf[org.apache.spark.sql.classic.SparkSession]
        .getMethod("sessionUUID").invoke(c).asInstanceOf[String]
    case other => s"idhash:${System.identityHashCode(other)}"
  }

  def getOrElseUpdate(spark: SparkSession, tag: String)(build: => V): V = {
    entries.filterInPlace { case (_, (s, _)) => !s.sparkContext.isStopped }
    entries.getOrElseUpdate((uuid(spark), tag),
      (spark, new Lazy(() => build)))._2.value
  }

  /** Test hook: number of live entries. */
  private[graft] def size: Int = entries.size
}
