package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500) source — the wire format web-crawl
  * corpora ship in (Common Crawl segments are gzipped WARCs), i.e. the
  * ingest format of a web-scale training-data pipeline. Records parse by
  * the spec's framing: a `WARC/1.0` version line, named header lines up
  * to a blank line, exactly `Content-Length` payload bytes, then the
  * `\r\n\r\n` record separator.
  *
  * Partitioning: one WARC FILE = one InputPartition. That is the honest
  * production shape — records inside a file frame sequentially via
  * Content-Length (a mid-file split cannot find a record boundary
  * without scanning), while crawl archives ship as many ~1 GB segment
  * files, so file-granular parallelism is exactly how the format is
  * consumed at scale. The reader streams records off the open file one
  * at a time — memory holds one record, never one file.
  *
  * Schema: record_id, warc_type, target_uri, warc_date, content_type
  * (strings; absent headers → NULL), content_length (long), body
  * (binary — downstream decides decode, the multimodal binary-column
  * convention).
  */
class WarcSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcIO.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new WarcTable(Option(opts.get("dir")).getOrElse(
      sys.error("WarcSourceProvider requires a 'dir' option")))
  }
}

private class WarcTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"warc($dir)"
  override def schema(): StructType = WarcIO.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = WarcIO.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        WarcIO.listFiles(dir)
          .map(p => WarcFilePartition(p): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new WarcReaderFactory(
          new org.apache.spark.util.SerializableConfiguration(
            graft.util.Fs.hadoopConf()))
      // Streaming form: a crawl KEEPS landing segment files — the
      // stream offset is the count of the name-sorted file listing, so
      // each trigger picks up exactly the newly-arrived segments (one
      // partition per new file). Assumes the archive convention the
      // batch side sorts by anyway: segment names are monotone
      // (segment-000.warc, -001, …) and files are immutable once
      // written. Restart replays from the checkpointed count.
      override def toMicroBatchStream(
          checkpointLocation: String): streaming.MicroBatchStream =
        new WarcMicroBatchStream(dir)
    }
}

private case class WarcFileCountOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

private class WarcMicroBatchStream(dir: String)
    extends streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = WarcFileCountOffset(0)
  override def latestOffset(): Offset =
    WarcFileCountOffset(WarcIO.listFiles(dir).size)
  override def deserializeOffset(json: String): Offset =
    WarcFileCountOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcFileCountOffset].n
    val e = end.asInstanceOf[WarcFileCountOffset].n
    WarcIO.listFiles(dir).slice(s, e)
      .map(p => WarcFilePartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        graft.util.Fs.hadoopConf()))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class WarcFilePartition(path: String) extends InputPartition

/** The conf is captured driver-side at scan build (so `spark.hadoop.*`
  * reaches executors) and ships with the factory. */
private class WarcReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val WarcFilePartition(path) = partition
    new PartitionReader[InternalRow] {
      private val p = new org.apache.hadoop.fs.Path(path)
      private val in = p.getFileSystem(conf.value).open(p)
      private var row: InternalRow = _

      override def next(): Boolean = {
        row = WarcIO.readRecord(in, path).orNull
        row != null
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

object WarcIO {

  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** Bindings entry point. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(classOf[WarcSourceProvider].getName)
      .option("dir", dir).load()

  /** Streaming entry point: one micro-batch per newly-landed segment
    * set (see the MicroBatchStream notes on the naming assumption). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format(classOf[WarcSourceProvider].getName)
      .option("dir", dir).load()

  private[sources] def listFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(graft.util.Fs.hadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".warc"))
      .map(_.getPath.toString).sorted
  }

  /** Read one CRLF-terminated header line (returns without the CRLF);
    * None at EOF before any byte. */
  private def readLine(in: java.io.DataInputStream): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream()
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') {
      if (b != '\r') buf.write(b)
      b = in.read()
    }
    Some(buf.toString("UTF-8"))
  }

  /** Parse the next record off the stream: version line, headers to the
    * blank line, Content-Length payload bytes, trailing CRLF CRLF. */
  private[sources] def readRecord(in: org.apache.hadoop.fs.FSDataInputStream,
                                  path: String): Option[InternalRow] = {
    val din = new java.io.DataInputStream(in)
    // skip blank separator lines between records, find the version line
    var line = readLine(din)
    while (line.exists(_.isEmpty)) line = readLine(din)
    line match {
      case None => None
      case Some(v) if !v.startsWith("WARC/") =>
        sys.error(s"malformed WARC $path: expected version line, got '$v'")
      case Some(_) =>
        val headers = scala.collection.mutable.Map[String, String]()
        var h = readLine(din)
        while (h.exists(_.nonEmpty)) {
          val s = h.get
          val idx = s.indexOf(':')
          if (idx < 0) sys.error(s"malformed WARC header in $path: '$s'")
          headers(s.substring(0, idx).trim.toLowerCase) =
            s.substring(idx + 1).trim
          h = readLine(din)
        }
        val len = headers.getOrElse("content-length",
          sys.error(s"WARC record without Content-Length in $path")).toLong
        // One record = one JVM byte[]; a payload past Int.MaxValue cannot
        // be framed that way, and len.toInt would silently mis-frame the
        // rest of the file — refuse explicitly instead.
        if (len < 0 || len > Int.MaxValue - 16)
          sys.error(s"WARC record in $path has unsupported Content-Length $len")
        val body = new Array[Byte](len.toInt)
        din.readFully(body)
        def hs(k: String) = headers.get(k)
          .map(UTF8String.fromString).orNull
        Some(new GenericInternalRow(Array[Any](
          hs("warc-record-id"), hs("warc-type"), hs("warc-target-uri"),
          hs("warc-date"), hs("content-type"), len, body)))
    }
  }

  /** One record for the fixture writer. */
  final case class WarcRecord(warcType: String, recordId: String,
                              targetUri: Option[String], date: String,
                              contentType: Option[String], body: Array[Byte])

  /** Write records as a spec-framed .warc file (the disk stand-in for a
    * crawl segment; a live pipeline reads the same framing over the
    * fetched archive). */
  def writeWarc(path: String, records: Seq[WarcRecord]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(graft.util.Fs.hadoopConf())
    val os = fs.create(p, true)
    try records.foreach { r =>
      val sb = new StringBuilder()
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: ${r.warcType}\r\n")
      sb.append(s"WARC-Record-ID: ${r.recordId}\r\n")
      sb.append(s"WARC-Date: ${r.date}\r\n")
      r.targetUri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
      r.contentType.foreach(c => sb.append(s"Content-Type: $c\r\n"))
      sb.append(s"Content-Length: ${r.body.length}\r\n\r\n")
      os.write(sb.toString.getBytes("UTF-8"))
      os.write(r.body)
      os.write("\r\n\r\n".getBytes("UTF-8"))
    } finally os.close()
  }
}
