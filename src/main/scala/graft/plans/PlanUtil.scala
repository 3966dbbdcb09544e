package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, BaseOrdering, BoundReference, RowOrdering, SortOrder}
import org.apache.spark.sql.types.DataType

private[plans] object PlanUtil {

  /** Natural ascending ordering over rows of the given column types,
    * codegen'd (with Spark's interpreted fallback) — the as-of
    * operators compare keys/timestamps millions of times per partition
    * and on the driver-side broadcast sort, where
    * `createNaturalAscendingOrdering`'s always-interpreted comparator
    * is measurable overhead. */
  def naturalOrdering(types: Seq[DataType]): BaseOrdering =
    RowOrdering.create(
      types.zipWithIndex.map { case (dt, i) =>
        SortOrder(BoundReference(i, dt, nullable = true), Ascending)
      },
      Nil)
}
