package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 re-creation of the reference's /discover/movie scan (S1,
  * /root/reference/src/movie_etl/tasks/etl_task.py:24-76): a paginated
  * source where predicates travel WITH the request instead of filtering
  * after the fetch.
  *
  *  - pagination -> one InputPartition per page (parallel, not a loop)
  *  - API query params (release window, vote_count.gte, include_adult,
  *    with_original_language) -> SupportsPushDownFilters: those filters
  *    are absorbed into the scan and evaluated at generation time; any
  *    other predicate is left for Spark to apply post-scan
  *  - the reference keeping only results[].id -> SupportsPushDownRequiredColumns
  *
  * Data is synthesized deterministically from (page, offset) so tests can
  * predict exact results. Usage:
  *   spark.read.format("graft.sources.DiscoverDataSource")
  *     .option("pages", 5).option("pageSize", 20).load()
  */
class DiscoverDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DiscoverDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives reader options with their original case preserved;
    // re-wrap so the documented .option("pageSize", N) spelling works
    val opts = new CaseInsensitiveStringMap(properties)
    new DiscoverTable(opts.getInt("pages", 5), opts.getInt("pageSize", 20),
      opts.getInt("maxRowsPerSec", 0))
  }
}

object DiscoverDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("release_date", DateType, nullable = false),
    StructField("vote_count", LongType, nullable = false),
    StructField("vote_average", DoubleType, nullable = false),
    StructField("adult", BooleanType, nullable = false),
    StructField("original_language", StringType, nullable = false)))

  private val epochDay0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt
  private val langs = Array("en", "fr", "de", "es", "ja")

  /** Deterministic synthetic movie summary for global row index i. */
  def row(i: Long): (Long, String, Int, Long, Double, Boolean, String) = (
    1000L + i,
    s"Movie ${1000L + i}",
    epochDay0 + (i % 365).toInt,
    (i * 37) % 5000,
    (i % 100) / 10.0,
    i % 50 == 49,
    langs((i % langs.length).toInt))
}

private class DiscoverTable(pages: Int, pageSize: Int, maxRowsPerSec: Int)
    extends Table with SupportsRead {
  override def name(): String = s"discover(pages=$pages, pageSize=$pageSize)"
  override def schema(): StructType = DiscoverDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DiscoverScanBuilder(pages, pageSize, maxRowsPerSec)
}

private class DiscoverScanBuilder(pages: Int, pageSize: Int, maxRowsPerSec: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownTopN with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = DiscoverDataSource.schema
  private var topN: Option[(Array[SortOrder], Int)] = None
  private var pushedLimit: Int = -1
  private var countPushed = false

  /** The API accepts exactly these predicate shapes as query params. */
  private def supported(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("vote_count", _: Long)   => true
    case GreaterThan("vote_count", _: Long)          => true
    case GreaterThanOrEqual("release_date", _)       => true
    case LessThanOrEqual("release_date", _)          => true
    case EqualTo("adult", _: java.lang.Boolean)      => true
    case EqualTo("original_language", _: String)     => true
    case _                                           => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, reject) = filters.partition(supported)
    pushed = accept
    reject // Spark evaluates the rest post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit = { requiredSchema = required }

  /** S1's sort_by=...&page=N contract (etl_task.py:44-72): ORDER BY +
    * LIMIT travels with the request. Partially pushed: each page returns
    * its own sorted top-N and Spark does the final merge, which is
    * exactly the shape a paginated API gives a distributed reader.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val ok = orders.nonEmpty && orders.forall(_.expression() match {
      case nr: NamedReference => nr.fieldNames.length == 1 &&
        DiscoverDataSource.schema.fieldNames.contains(nr.fieldNames()(0))
      case _ => false
    })
    if (ok) topN = Some((orders, limit))
    ok
  }

  /** Plain LIMIT without a sort: stop generating after `limit` matches
    * per page; Spark applies the global limit on top.
    */
  override def pushLimit(limit: Int): Boolean = { pushedLimit = limit; true }
  override def isPartiallyPushed: Boolean = true

  /** COUNT(*) pushdown — the engine twin of the API's `total_results`
    * field (the reference reads it at etl_task.py:44-76 instead of
    * paging through everything): each page answers its matching-row
    * count as ONE row and Spark sums the partials — no movie rows are
    * ever materialized or moved. Spark only offers the aggregate when
    * every filter was absorbed by the scan, so the counts are exact.
    */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = topN.isEmpty && pushedLimit < 0 &&
      aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) {
      countPushed = true
      requiredSchema = StructType(Seq(StructField("count_star", LongType, nullable = false)))
    }
    ok
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      (0 until pages).map(p => DiscoverPartition(p, pageSize): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new DiscoverReaderFactory(pushed, requiredSchema, topN, pushedLimit,
        maxRowsPerSec, countPushed)
    override def description(): String = {
      val tn = topN.map { case (o, n) =>
        s" pushedTopN=[${o.map(_.describe).mkString(", ")} LIMIT $n]" }.getOrElse("")
      val lim = if (pushedLimit >= 0 && topN.isEmpty) s" pushedLimit=$pushedLimit" else ""
      val agg = if (countPushed) " pushedAggregate=[COUNT(*)]" else ""
      s"DiscoverScan pushed=[${pushed.mkString(", ")}]$tn$lim$agg"
    }
  }
}

private case class DiscoverPartition(page: Int, pageSize: Int) extends InputPartition

private class DiscoverReaderFactory(pushed: Array[Filter], required: StructType,
                                    topN: Option[(Array[SortOrder], Int)],
                                    pushedLimit: Int, maxRowsPerSec: Int,
                                    countPushed: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DiscoverPartition]
    if (countPushed) new DiscoverCountReader(p.page, p.pageSize, pushed)
    else new DiscoverReader(p.page, p.pageSize, pushed, required, topN, pushedLimit,
      maxRowsPerSec)
  }
}

/** COUNT(*)-pushed reader: one row per page carrying the page's matching
  * count (the per-page `total_results` answer) — no movie rows built.
  */
private class DiscoverCountReader(page: Int, pageSize: Int, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private var done = false
  private var count = 0L
  override def next(): Boolean =
    if (done) false
    else {
      val probe = new DiscoverReader(page, pageSize, pushed,
        DiscoverDataSource.schema, None, -1, 0)
      while (probe.next()) count += 1
      done = true
      true
    }
  override def get(): InternalRow = InternalRow(count)
  override def close(): Unit = ()
}

private class DiscoverReader(page: Int, pageSize: Int, pushed: Array[Filter],
                             required: StructType,
                             topN: Option[(Array[SortOrder], Int)],
                             pushedLimit: Int,
                             maxRowsPerSec: Int) extends PartitionReader[InternalRow] {
  private type R = (Long, String, Int, Long, Double, Boolean, String)
  private var i = -1
  private var emitted = 0
  private var current: R = _
  // topN path: the page's matching rows, sorted and truncated up front
  // (the "server" answering sort_by + page in one response)
  private var sortedRows: Iterator[R] = _

  private def dateDays(v: Any): Int = v match {
    case d: java.sql.Date       => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case other => throw new IllegalArgumentException(s"date filter value: $other")
  }

  /** "Server-side" filter evaluation — this is the work the pushdown saves
    * Spark from doing (and at 100 TB, the bytes it saves from moving).
    */
  private def matches(r: (Long, String, Int, Long, Double, Boolean, String)): Boolean =
    pushed.forall {
      case GreaterThanOrEqual("vote_count", v: Long)   => r._4 >= v
      case GreaterThan("vote_count", v: Long)          => r._4 > v
      case GreaterThanOrEqual("release_date", v)       => r._3 >= dateDays(v)
      case LessThanOrEqual("release_date", v)          => r._3 <= dateDays(v)
      case EqualTo("adult", v: java.lang.Boolean)      => r._6 == v.booleanValue()
      case EqualTo("original_language", v: String)     => r._7 == v
      case _ => true
    }

  private def fieldCmp(name: String)(a: R, b: R): Int = name match {
    case "id"                => java.lang.Long.compare(a._1, b._1)
    case "title"             => a._2.compareTo(b._2)
    case "release_date"      => Integer.compare(a._3, b._3)
    case "vote_count"        => java.lang.Long.compare(a._4, b._4)
    case "vote_average"      => java.lang.Double.compare(a._5, b._5)
    case "adult"             => java.lang.Boolean.compare(a._6, b._6)
    case "original_language" => a._7.compareTo(b._7)
  }

  private def ordering(orders: Array[SortOrder]): Ordering[R] = new Ordering[R] {
    def compare(a: R, b: R): Int = {
      orders.foreach { o =>
        val name = o.expression().asInstanceOf[NamedReference].fieldNames()(0)
        val c = fieldCmp(name)(a, b)
        if (c != 0)
          return if (o.direction() == SortDirection.ASCENDING) c else -c
      }
      0
    }
  }

  // token-bucket throttle, the engine-side analog of the reference's
  // sleep-per-request politeness (etl_task.py:75,108,143): emission is
  // paced so this PARTITION never exceeds maxRowsPerSec; with one
  // partition per API page, the per-endpoint budget is rate x pages
  private val throttleStartNs = System.nanoTime()
  private var throttled = 0L
  private def throttle(): Unit = if (maxRowsPerSec > 0) {
    throttled += 1
    val dueNs = throttleStartNs + throttled * 1000000000L / maxRowsPerSec
    val waitNs = dueNs - System.nanoTime()
    if (waitNs > 0) Thread.sleep(waitNs / 1000000, (waitNs % 1000000).toInt)
  }

  override def next(): Boolean = { throttle(); nextUnthrottled() }

  private def nextUnthrottled(): Boolean = topN match {
    case Some((orders, limit)) =>
      if (sortedRows == null) {
        val all = (0 until pageSize).iterator
          .map(j => DiscoverDataSource.row(page.toLong * pageSize + j))
          .filter(matches).toArray
        sortedRows = all.sorted(ordering(orders)).iterator.take(limit)
      }
      val has = sortedRows.hasNext
      if (has) current = sortedRows.next()
      has
    case None =>
      if (pushedLimit >= 0 && emitted >= pushedLimit) return false
      while (i < pageSize - 1) {
        i += 1
        val r = DiscoverDataSource.row(page.toLong * pageSize + i)
        if (matches(r)) { current = r; emitted += 1; return true }
      }
      false
  }

  override def get(): InternalRow = {
    val full: Map[String, Any] = Map(
      "id" -> current._1, "title" -> UTF8String.fromString(current._2),
      "release_date" -> current._3, "vote_count" -> current._4,
      "vote_average" -> current._5, "adult" -> current._6,
      "original_language" -> UTF8String.fromString(current._7))
    InternalRow.fromSeq(required.fields.map(f => full(f.name)).toIndexedSeq)
  }

  override def close(): Unit = ()
}
