package graft.sinks

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE path for the K1 document sink
  * (push_to_typesense.py:39-53): JSONL part files written through the full
  * BatchWrite commit protocol — executors stream rows into per-task
  * staging files, the driver's commit() atomically publishes them (rename
  * into place + _SUCCESS), abort() discards the staging dir. Task retries
  * therefore never produce duplicate or partial output — the same
  * all-or-nothing contract the reference gets from Typesense's bulk
  * import being idempotent per id.
  *
  * Usage: `df.write.format("graft.sinks.JsonlSinkProvider")
  *   .option("path", dir).mode("append").save()`
  *
  * Supported field types: the document-schema types of §1 (string, long,
  * int, double, boolean); anything else fails fast at write planning.
  */
class JsonlSinkProvider extends TableProvider {
  // Write-only source: schema comes from the DataFrame being written.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(new CaseInsensitiveStringMap(properties).get("path"))
      .getOrElse(throw new IllegalArgumentException("option 'path' is required"))
    new JsonlTable(path, schema)
  }
}

private class JsonlTable(path: String, tableSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"jsonl($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new JsonlBatchWrite(path, info.schema())
      }
    }
}

private case class JsonlCommitMessage(stagedFile: String) extends WriterCommitMessage

private class JsonlBatchWrite(path: String, schema: StructType) extends BatchWrite {
  schema.fields.foreach { f =>
    f.dataType match {
      case StringType | LongType | IntegerType | DoubleType | BooleanType => ()
      case t => throw new IllegalArgumentException(
        s"jsonl sink supports string/long/int/double/boolean, got ${f.name}: ${t.simpleString}")
    }
  }
  private val staging = new File(path, "_staging")
  // Per-write-job id in every part-file name: partitionId/taskId restart
  // from 0 in a fresh application, so without this a later append would
  // rename over a previous run's committed files.
  private val writeId = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    staging.mkdirs()
    new JsonlWriterFactory(staging.getAbsolutePath, schema, writeId)
  }

  /** Driver-side publish: staged part files rename into the table dir,
    * then _SUCCESS. Rename is atomic per file on a real FS; a cloud
    * deployment swaps this for a manifest commit. Leftovers carrying THIS
    * job's writeId are garbage from dead task attempts (their abort()
    * never ran) — deleted so they cannot accumulate; files from a
    * CONCURRENT append job (different writeId) are left untouched. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    messages.foreach { case JsonlCommitMessage(staged) =>
      val f = new File(staged)
      if (!f.renameTo(new File(dir, f.getName)))
        throw new IllegalStateException(s"commit failed renaming $staged")
    }
    cleanupStaging()
    new File(dir, "_SUCCESS").createNewFile()
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanupStaging()

  private def cleanupStaging(): Unit = {
    Option(staging.listFiles()).foreach(_.filter(_.getName.contains(s"-$writeId."))
      .foreach(_.delete()))
    // Removes the dir only when no other job is mid-write (delete on a
    // non-empty directory is a no-op).
    staging.delete()
    ()
  }
}

private class JsonlWriterFactory(stagingPath: String, schema: StructType,
                                 writeId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = new File(stagingPath,
        f"part-$partitionId%05d-$taskId-$writeId.jsonl")
      private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(file), java.nio.charset.StandardCharsets.UTF_8))
      // Hoisted out of the per-row loop: prefixes and field metadata.
      private val fieldMeta: Array[(String, DataType)] =
        schema.fields.map(f => ("\"" + f.name + "\":", f.dataType))
      private val sb = new java.lang.StringBuilder(128)

      private def appendJsonValue(row: InternalRow, i: Int, t: DataType): Unit = t match {
        case StringType =>
          // minimal JSON string escaping for the document fields
          val s = row.getUTF8String(i).toString
          sb.append('"')
          s.foreach {
            case '"' => sb.append("\\\"")
            case '\\' => sb.append("\\\\")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case '\t' => sb.append("\\t")
            case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
            case c => sb.append(c)
          }
          sb.append('"')
          ()
        case LongType => sb.append(row.getLong(i)); ()
        case IntegerType => sb.append(row.getInt(i)); ()
        case DoubleType =>
          // NaN/Infinity are not legal JSON numbers (RFC 8259) — a strict
          // bulk-import consumer would reject the line. Emit null.
          val d = row.getDouble(i)
          if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
          ()
        case BooleanType => sb.append(row.getBoolean(i)); ()
        case t => throw new IllegalStateException(s"unsupported $t")
      }

      override def write(row: InternalRow): Unit = {
        sb.setLength(0)
        sb.append('{')
        var i = 0
        var first = true
        while (i < fieldMeta.length) {
          if (!row.isNullAt(i)) {
            if (!first) sb.append(',')
            first = false
            sb.append(fieldMeta(i)._1)
            appendJsonValue(row, i, fieldMeta(i)._2)
          }
          i += 1
        }
        sb.append('}')
        out.write(sb.toString)
        out.newLine()
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        JsonlCommitMessage(file.getAbsolutePath)
      }

      override def abort(): Unit = { out.close(); file.delete(); () }
      override def close(): Unit = ()
    }
}
