package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** North-star extension queries (BASELINE.json): dedup, similarity
  * search, text analysis, windowed events, streaming, multimodal —
  * each with a DuckDB oracle where ANSI SQL can express it.
  *
  * Everything hash-portable is md5-based (`Text.hash60`), so MinHash
  * and SimHash oracles reproduce bit-identical signatures in DuckDB.
  */
object Extensions {

  /** Concatenation of the per-family wiring objects — the single
    * registry [[SparkEntry]] exposes to the driver. Keys are globally
    * unique (ConsistencySpec pins oracle coverage over this union).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExtRelational.queries ++ ExtDedup.queries ++ ExtSimilarity.queries ++
      ExtText.queries ++ ExtCuration.queries ++ ExtStreaming.queries ++
      ExtTemporal.queries ++ ExtLayout.queries ++ ExtAnalytics.queries

  def oracleSql: Map[String, String] =
    ExtRelational.oracleSql ++ ExtDedup.oracleSql ++ ExtSimilarity.oracleSql ++
      ExtText.oracleSql ++ ExtCuration.oracleSql ++ ExtStreaming.oracleSql ++
      ExtTemporal.oracleSql ++ ExtLayout.oracleSql ++ ExtAnalytics.oracleSql
}
