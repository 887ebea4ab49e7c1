package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.write.RowLevelOperationTable

/** Unwraps Spark's `private[sql]` [[RowLevelOperationTable]] — the
  * wrapper the row-level rewrites put around the target table — so
  * rules living outside the sql package can reach the connector's own
  * Table underneath. */
object RowLevelBridge {
  def underlying(t: Table): Table = t match {
    case rl: RowLevelOperationTable => rl.table
    case other => other
  }
}
