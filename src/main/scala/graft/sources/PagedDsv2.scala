package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 form of the reference's paginated scans (S1/S5: the
  * `$offset/$limit` SPARQL pagination loop, wikidata_index.py:291-319, and
  * the REST page iterator, get_data_from_apis_instance.py:11-75).
  *
  * The reference fetches pages serially on one worker; the Spark-native
  * shape is one InputPartition PER PAGE so the cluster pulls all pages in
  * parallel and batching stays a source concern (SURVEY.md §2.1 S5, §4.1
  * "Batching"). Page content here is a deterministic generator (id, page,
  * payload) standing in for the HTTP body — the fetch call is the only
  * line that changes for a real endpoint; everything else (schema,
  * partition planning, per-page readers) is the production plumbing.
  *
  * Usage: `spark.read.format("graft.sources.PagedSourceProvider")
  *   .option("pages", 8).option("pageSize", 250).load()`
  */
class PagedSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedGen.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // Reader options arrive with their original case — normalize.
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedTable(opts.getInt("pages", 4), opts.getInt("pageSize", 100))
  }
}

object PagedGen {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("row_in_page", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Deterministic page body: md5 of "page:row" — both engines can
    * regenerate it, so the source is oracle-checkable end-to-end. */
  def payload(page: Int, row: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$page:$row".getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}

private class PagedTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged($pages x $pageSize)"
  override def schema(): StructType = PagedGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedGen.schema
      override def toBatch: Batch = this
      // One partition per page — the reference's serial page loop becomes
      // cluster-parallel ingest; a real endpoint would put the HTTP GET in
      // the reader below and rate-limit via a per-executor token bucket.
      override def planInputPartitions(): Array[InputPartition] =
        (0 until pages).map(p => PagePartition(p, pageSize): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new PagedReaderFactory
      // Streaming form: the page cursor becomes the stream offset — one
      // page per micro-batch, which is exactly the reference's temporal
      // behavior (one HTTP page per loop iteration, wikidata_index.py:
      // 291-319) with checkpointable progress instead of a driver loop.
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PagedMicroBatchStream(pages, pageSize)
    }
}

private case class PageOffset(page: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = page.toString
}

/** Micro-batch stream over the page space: offsets are page indices,
  * latestOffset advances one page per trigger (the paging cadence), each
  * batch plans the pages in (start, end]. Restart-safe: the committed
  * offset replays from the deterministic generator — a real endpoint
  * needs pages to be immutable-once-read, the same assumption the
  * reference's offset loop makes. */
private class PagedMicroBatchStream(pages: Int, pageSize: Int)
    extends MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private var cursor = 0

  // A restarted stream constructs a FRESH instance (cursor = 0) but the
  // engine replays checkpointed offsets through deserializeOffset /
  // planInputPartitions / commit — sync the cursor from every offset we
  // see so latestOffset can never regress behind the committed page and
  // re-deliver it.
  private def sync(page: Int): Unit = { cursor = math.max(cursor, page); () }

  override def initialOffset(): Offset = PageOffset(0)

  override def latestOffset(): Offset = {
    if (cursor < pages) cursor += 1
    PageOffset(cursor)
  }

  override def deserializeOffset(json: String): Offset = {
    val p = json.trim.toInt
    sync(p)
    PageOffset(p)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    sync(e)
    (s until e).map(p => PagePartition(p, pageSize): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PagedReaderFactory

  override def commit(end: Offset): Unit = sync(end.asInstanceOf[PageOffset].page)
  override def stop(): Unit = ()
}

private case class PagePartition(page: Int, pageSize: Int) extends InputPartition

private class PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val PagePartition(page, pageSize) = partition
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < pageSize }
      override def get(): InternalRow =
        InternalRow(
          page.toLong * pageSize + i,
          page,
          i,
          UTF8String.fromString(PagedGen.payload(page, i)))
      override def close(): Unit = ()
    }
  }
}
