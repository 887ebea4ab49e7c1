package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Column &lt;-&gt; catalyst Expression bridge for Spark 4's column-node API.
 *
 * <p>Spark 4 moved the classic {@code new Column(expr)} constructor behind
 * {@code org.apache.spark.sql.classic.ExpressionUtils}, which is
 * {@code private[sql]} at the Scala level. Custom catalyst expressions (the
 * sanctioned extension point for scalar logic that must stay inside
 * whole-stage codegen — see {@link AsOfSearch}) still need to become
 * {@code Column}s to participate in the DataFrame API. Scala access
 * modifiers are not class-file access flags, so this one-file Java bridge
 * calls the public-in-bytecode static forwarders directly; it is the whole
 * surface we borrow.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }
}
