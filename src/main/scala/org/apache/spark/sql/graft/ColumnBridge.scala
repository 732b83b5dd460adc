/*
 * Lives under org.apache.spark.sql ONLY to reach the sql-private
 * Column-from-Expression constructor — the standard bridge pattern for
 * Spark extensions that build Columns from custom Catalyst expressions
 * without registering them as SQL-callable functions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Wrap a Catalyst expression as a Column WITHOUT a function-registry
  * entry. Used for [[graft.functions.SecretKeyBytes]]: registering the
  * key accessor as a SQL function would let any SELECT-level principal
  * exfiltrate raw key bytes (`SELECT graft_secret_key(1)`), so the
  * encryption path constructs the Column directly instead. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
