package graft

import org.apache.spark.sql.SparkSession

/** Runs `body` with `spark.sql.shuffle.partitions` capped (never
  * raised) at `maxPartitions`, restoring the previous value after.
  *
  * Used where a stage's cost is per-partition FIXED overhead on tiny
  * data: stateful streaming starts (state stores per partition — a
  * stream-stream join keeps four, so 32 partitions means 128 store
  * lifecycles per micro-batch) and iterative label-propagation rounds
  * (pair-bounded frames, 4+ exchanges per round mostly launching
  * empty tasks). On a real cluster this knob is sized to state/pair
  * volume, not the core count a batch session wants.
  *
  * Scopes are serialized by a process-wide lock: the save/set/restore
  * pattern is otherwise not safe under overlap (scope B could capture
  * scope A's temporary value as its "previous" and restore the
  * session to the scoped value permanently). Queries issued OUTSIDE
  * any scope while one is active still plan at the scoped value — a
  * parallelism (never correctness) effect, accepted for the
  * sequential Verify/Bench drivers this library ships with. */
private[graft] object ScopedShufflePartitions {
  private val lock = new Object
  private val KEY = "spark.sql.shuffle.partitions"

  def apply[T](spark: SparkSession, maxPartitions: Int = 8)(body: => T): T =
    lock.synchronized {
      val prev = spark.conf.get(KEY)
      val scoped = scala.util.Try(prev.trim.toInt).toOption match {
        case Some(p) => math.min(p, maxPartitions)
        case None => maxPartitions
      }
      spark.conf.set(KEY, scoped.toString)
      try body finally spark.conf.set(KEY, prev)
    }
}
