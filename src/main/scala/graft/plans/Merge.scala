package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta-style MERGE expressed relationally — the batch-table form of the
  * reference's idempotent upsert sink (`action: "upsert"`, last write wins
  * on id, push_to_typesense.py:49-51; SURVEY.md §2.9 "Upsert sink").
  *
  * A table format's MERGE INTO is, at its relational core, exactly this:
  * full-outer join target×source on the key, then a per-column projection
  * that picks the source value when matched or inserting and the target
  * value when the row is untouched. The format layer only adds copy-on-
  * write of the touched files — at 100 TB the join is a shuffle on the key
  * (or a broadcast when the source delta is small, the common CDC case),
  * and file-level rewrite amplification is bounded by partitioning the
  * target on the merge key's prefix.
  */
object Merge {

  /** Full-outer MERGE: `out` defines every output column as an expression
    * over the aliases `t` (target) and `s` (source). Row classes:
    *  - matched  (both sides present): update exprs see both aliases;
    *  - insert   (source-only): `t.*` columns are null;
    *  - untouched (target-only): `s.*` columns are null.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String])
           (out: (String, Column)*): DataFrame = {
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    target.alias("t").join(source.alias("s"), cond, "full_outer")
      .select(out.map { case (n, c) => c.as(n) }: _*)
  }

  /** The common upsert shape: same schema on both sides, source wins on
    * match, all source rows insert, target rows pass through. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    merge(target, source, keys)(cols.map { c =>
      c -> coalesce(col(s"s.$c"), col(s"t.$c"))
    }: _*)
  }
}
