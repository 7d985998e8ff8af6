package graft.operators

import org.apache.spark.sql.{DataFrame, graftbridge}

/** Fused local-checkpoint pins (optimization guide §1.2 — don't pay
  * two driver actions for one pass): `Dataset.localCheckpoint(eager)`
  * materializes the frame with an internal full count and throws the
  * number away, and callers that need a count (total, conditional, or
  * per-key) then pay a SECOND action over rows they just pinned. The
  * helpers here mark the frame's RDD for local checkpointing and
  * materialize it with ONE job that also computes the caller's
  * number; the returned frame wraps the pinned rows exactly like
  * `localCheckpoint` would (a leaf over the checkpointed RDD).
  *
  * Executor-memory pins only — operators offering a RELIABLE
  * checkpoint mode keep `Dataset.checkpoint` there (fault tolerance
  * is that seam's point, not action count). */
private[graft] object Pin {

  private def pinnedRdd(df: DataFrame)
      : org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow] = {
    // rows are reused buffers — copy before caching, exactly as
    // Dataset.localCheckpoint does
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd
  }

  private def wrap(df: DataFrame,
                   rdd: org.apache.spark.rdd.RDD[
                     org.apache.spark.sql.catalyst.InternalRow]): DataFrame =
    graftbridge.fromInternalRdd(df.sparkSession, rdd, df.schema)

  /** localCheckpoint(eager) + row count, one job. */
  def count(df: DataFrame): (DataFrame, Long) = {
    val rdd = pinnedRdd(df)
    val n = rdd.mapPartitions { it =>
      var c = 0L
      while (it.hasNext) { it.next(); c += 1 }
      Iterator.single(c)
    }.fold(0L)(_ + _)
    (wrap(df, rdd), n)
  }

  /** localCheckpoint(eager) + count of TRUE values of a boolean
    * column, one job. */
  def countWhere(df: DataFrame, boolCol: String): (DataFrame, Long) = {
    val idx = df.schema.fieldIndex(boolCol)
    val rdd = pinnedRdd(df)
    val n = rdd.mapPartitions { it =>
      var c = 0L
      it.foreach(r => if (!r.isNullAt(idx) && r.getBoolean(idx)) c += 1)
      Iterator.single(c)
    }.fold(0L)(_ + _)
    (wrap(df, rdd), n)
  }

  /** localCheckpoint(eager) + per-key row counts of a string column,
    * one job. Keys are collected to the driver — callers use this for
    * FILE-grained counts (bounded by the table's file count), never
    * data-grained ones. Null keys are not counted. */
  def countByKey(df: DataFrame, keyCol: String)
      : (DataFrame, Map[String, Long]) = {
    val idx = df.schema.fieldIndex(keyCol)
    val rdd = pinnedRdd(df)
    val parts = rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { r =>
        if (!r.isNullAt(idx)) {
          val k = r.getUTF8String(idx).toString
          m.update(k, m.getOrElse(k, 0L) + 1L)
        }
      }
      Iterator.single(m.toMap)
    }.collect()
    val merged = parts.foldLeft(Map.empty[String, Long]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0L) + v) }
    }
    (wrap(df, rdd), merged)
  }
}
