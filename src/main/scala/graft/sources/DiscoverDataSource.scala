package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
                        properties: util.Map[String, String]): Table =
    new DiscoverTable(
      Option(properties.get("pages")).map(_.toInt).getOrElse(5),
      Option(properties.get("pagesize")).map(_.toInt).getOrElse(20))
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

private class DiscoverTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"discover(pages=$pages, pageSize=$pageSize)"
  override def schema(): StructType = DiscoverDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DiscoverScanBuilder(pages, pageSize)
}

private class DiscoverScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = DiscoverDataSource.schema

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

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      (0 until pages).map(p => DiscoverPartition(p, pageSize): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new DiscoverReaderFactory(pushed, requiredSchema)
    override def description(): String =
      s"DiscoverScan pushed=[${pushed.mkString(", ")}]"
  }
}

private case class DiscoverPartition(page: Int, pageSize: Int) extends InputPartition

private class DiscoverReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DiscoverPartition]
    new DiscoverReader(p.page, p.pageSize, pushed, required)
  }
}

private class DiscoverReader(page: Int, pageSize: Int, pushed: Array[Filter],
                             required: StructType) extends PartitionReader[InternalRow] {
  private var i = -1
  private var current: (Long, String, Int, Long, Double, Boolean, String) = _

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

  override def next(): Boolean = {
    while (i < pageSize - 1) {
      i += 1
      val r = DiscoverDataSource.row(page.toLong * pageSize + i)
      if (matches(r)) { current = r; return true }
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
