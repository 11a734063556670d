package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S1 `get_movie_ids` (/root/reference/src/movie_etl/tasks/etl_task.py:24-76):
  * the reference's paginated /discover/movie scan with pushed-down
  * predicates. Declaratively: scan + filter + project (+ optional sort).
  * Catalyst pushes the filters into the parquet scan (`PushedFilters` in
  * explain) — the exact analog of the reference sending them as API query
  * params, and what keeps a 100 TB scan from reading cold partitions.
  */
object Discover {

  /** Predicates mirrored from the reference: release window (inclusive),
    * vote-count floor, adult exclusion, optional original-language.
    */
  def scan(movies: DataFrame, dateCol: String, start: String, end: String,
           voteCountCol: String, voteCountMin: Long,
           extraFilter: Option[Column] = None): DataFrame = {
    val base = movies
      .filter(col(dateCol) >= lit(start) && col(dateCol) <= lit(end))
      .filter(col(voteCountCol) >= voteCountMin)
    extraFilter.fold(base)(base.filter)
  }

  /** The reference additionally sorts by release date ascending and keeps
    * only ids (etl_task.py:52,68). Whole-result sort is only meaningful
    * for bounded output; at scale prefer sortWithinPartitions or no sort.
    */
  def idsSorted(scanned: DataFrame, idCol: String, dateCol: String): DataFrame =
    scanned.orderBy(col(dateCol), col(idCol)).select(col(idCol), col(dateCol))
}
