package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive shared plans (the coarse k-means
  * quantizer, the dedup-cluster CC run): a concurrent map keyed by
  * (SparkSession, caller key) whose entries are EVICTED when the owning
  * session's context ends — without eviction a stopped session's entries
  * would pin the SparkSession, its DataFrame plans, and their
  * localCheckpoint blocks for the JVM lifetime.
  *
  * Callers must pass the [[Tables]]-memoized DataFrame (or another
  * object-identity-stable key component): the memo keys on identity, so a
  * re-created logical plan misses and recomputes. */
class SessionMemo[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]
  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCompute(spark: SparkSession, key: K)(f: => V): V = {
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          m.keySet.removeIf(_._1 eq spark)
          hooked.remove(spark)
        }
      })
    m.computeIfAbsent((spark, key), _ => f)
  }

  /** Visible for tests: live entry count for one session. */
  def sizeFor(spark: SparkSession): Int = {
    val it = m.keySet.iterator
    var n = 0
    while (it.hasNext) if (it.next()._1 eq spark) n += 1
    n
  }
}
