package graft

/** The engine's log seam — ONE place that owns the logger so operational
  * warnings land in the driver's log-aggregation (log4j via Spark's
  * [[org.apache.spark.internal.Logging]]) instead of bare stderr, which
  * cluster managers may not capture or order. Logger name: `graft.GraftLog`
  * — filter/route the whole engine with one log4j rule. */
private[graft] object GraftLog extends org.apache.spark.internal.Logging {
  def warn(msg: => String): Unit = logWarning(msg)
  def info(msg: => String): Unit = logInfo(msg)
}
