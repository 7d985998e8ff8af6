package graft.util

/** The project's ONE logging seam: SLF4J through the log4j2 backend
  * Spark ships. Library (and tool) code logs here, never straight to
  * stderr — a raw stderr write bypasses level control and the
  * log collectors a cluster deployment aggregates, and cannot be
  * silenced by configuration when a degraded-but-bounded path (e.g.
  * the bloom-sidecar backoff) fires once per minute on a large
  * table. Messages are by-name, so an unlogged level costs nothing. */
object Log {
  private val logger = org.slf4j.LoggerFactory.getLogger("graft")
  def info(msg: => String): Unit = if (logger.isInfoEnabled) logger.info(msg)
  def warn(msg: => String): Unit = if (logger.isWarnEnabled) logger.warn(msg)
  def error(msg: => String): Unit =
    if (logger.isErrorEnabled) logger.error(msg)
}
