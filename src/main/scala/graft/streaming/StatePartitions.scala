package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming queries pin `spark.sql.shuffle.partitions` when they
  * start, and every stateful operator keeps one or more state stores
  * PER PARTITION whose per-micro-batch lifecycle (load, commit,
  * snapshot) is pure overhead while the state itself is small — a
  * stream-stream join keeps four stores per partition, so a session
  * default of 32 means 128 store lifecycles every batch. Scope
  * stateful query starts to at most 8 partitions (never raising the
  * session value). On a real cluster this knob is sized to state
  * volume and input rate, not to the core count a batch session
  * wants; 8 partitions comfortably hold the fixtures' state while
  * keeping the drain parallel. */
private[streaming] object StatePartitions {
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, math.min(prev.toInt, 8).toString)
    try body finally spark.conf.set(key, prev)
  }
}
