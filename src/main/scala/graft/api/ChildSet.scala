package graft.api

import graft.operators.Writes
import org.apache.spark.sql.{DataFrame, functions => F}

/** The reference's `Hive_Container` (`classes/hive/container.php`)
  * table-at-a-time: an ordered, keyed collection of child rows that
  * tracks removals (`container.php:64-67,150-158`) so a later flush
  * can delete exactly what was removed (the anti-join input of S7).
  *
  * Where the reference holds child model objects and back-writes the
  * parent pointer on insert (`container.php:131-140`), this holds a
  * lazy child frame plus pending added/removed sets; `result()` is
  * the current view and `removedKeys()` feeds `Writes.delete`.
  */
final case class ChildSet(
    children: DataFrame,
    keyCol: String,
    added: Option[DataFrame] = None,
    removed: Option[DataFrame] = None) {

  /** Add child rows (must carry the child schema); the parent FK is
    * expected to be set by the caller/join, as in the reference's
    * `offsetSet` back-pointer write. */
  def add(rows: DataFrame): ChildSet =
    copy(added = Some(added.fold(rows)(_.unionByName(rows))))

  /** Remove children by key — remembered, not applied to storage. */
  def remove(keys: Seq[Long]): ChildSet = {
    val spark = children.sparkSession
    import spark.implicits._
    val k = keys.toDF(keyCol)
    copy(removed = Some(removed.fold(k)(_.unionByName(k))))
  }

  /** Current view: children ∪ added, minus removed. */
  def result(): DataFrame = {
    val base = added.fold(children)(children.unionByName(_))
    removed.fold(base)(r => Writes.delete(base, r, Seq(keyCol)))
  }

  /** The removal set — the anti-join input for a storage flush (S7):
    * `Writes.delete(storedChildren, childSet.removedKeys(), Seq(key))`. */
  def removedKeys(): DataFrame =
    removed.getOrElse(children.sparkSession.emptyDataFrame
      .withColumn(keyCol, F.lit(null).cast("long")).limit(0))
}
