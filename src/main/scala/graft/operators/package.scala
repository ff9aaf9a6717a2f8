package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Shared operator-level helpers. */
package object operators {

  /** The full-table dump operators take `ordered = true` only on the
    * verify path (driver oracle compare needs a deterministic row
    * order): a deploy plan must not pay a global sort — a full range
    * exchange + per-partition sort of the whole output — for a
    * row-delivery query whose consumers don't care about order.
    */
  private[operators] def maybeSort(df: DataFrame, ordered: Boolean)(cols: Column*): DataFrame =
    if (ordered) df.orderBy(cols: _*) else df
}
