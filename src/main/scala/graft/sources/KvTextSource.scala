package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference engine's native output format:
  * one `"key value"` line per record, key and value separated by the
  * LAST space (`/root/reference/src/mr/coordinator.go` emits `%v %v`;
  * keys are tokens without spaces, but last-space parsing also survives
  * keys that contain them). A line with no space yields (line, "") — the
  * reference's missing-value convention.
  *
  * This is the full Spark-native source surface, not a `textFile` +
  * `split` convenience: TableProvider → ScanBuilder → Batch →
  * PartitionReader, with `SupportsPushDownRequiredColumns` honored — a
  * `SELECT key` never materializes value strings (SourcesSpec pins the
  * pruned scan output). Registered as `kvtext` via DataSourceRegister,
  * so `spark.read.format("kvtext").load(path)` works anywhere the jar
  * is on the classpath.
  *
  * Scale shape: files split into byte ranges (default 128 MB,
  * `maxSplitBytes` option) with the standard line-boundary rule — a
  * split owns exactly the lines that BEGIN inside it: every reader but
  * the first skips to the first line start past its offset, and every
  * reader finishes the line that straddles its end — so a single huge
  * file parallelizes like the built-in text source, no line is read
  * twice, and none is dropped (SourcesSpec asserts exact-row parity
  * across split sizes). Paths resolve through the Hadoop FS API
  * (hdfs:/s3a:/file: all work).
  */
class KvTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kvtext"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvTextSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTextTable(properties.asScala.toMap)
}

object KvTextSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Expand the `path`/`paths` option through Hadoop glob resolution;
    * returns (file, byte length) so the scan can plan range splits.
    */
  private[sources] def resolveFiles(
      props: Map[String, String],
      requireNonEmpty: Boolean = true): Seq[(String, Long)] = {
    val raw = props.get("path").map(Seq(_))
      .orElse(props.get("paths").map(_.split(",").toSeq))
      .getOrElse(throw new IllegalArgumentException(
        "kvtext source requires a path"))
    val conf = new Configuration()
    raw.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      require(matches.nonEmpty || !requireNonEmpty, s"kvtext: no files match $p")
      matches.flatMap { st =>
        if (st.isDirectory)
          // the standard Hadoop convention: _SUCCESS markers and hidden
          // files are metadata, not data
          fs.listStatus(st.getPath).toSeq.filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
        else Seq(st)
      }.map(st => (st.getPath.toString, st.getLen))
    }
  }
}

private class KvTextTable(props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kvtext(${props.getOrElse("path", "?")})"
  override def schema(): StructType = KvTextSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvTextScanBuilder(props,
      Option(options.get("maxSplitBytes")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvTextWriteBuilder(
      props.getOrElse("path", throw new IllegalArgumentException(
        "kvtext write requires a path")),
      info)
}

/** V2 write path with the reference engine's commit protocol
  * (`/root/reference/src/mr/worker.go`: write to a temp file, rename
  * into place on commit): every task attempt writes
  * `<path>/_temporary/<queryId>/attempt-<partition>-<task>`, the DRIVER
  * renames exactly the attempts whose commit messages it accepted to
  * `mr-out-<partition>` (the reference's shard naming), and abort
  * deletes the temp tree — so a straggler's duplicate attempt or a
  * crashed job never leaves a partial shard visible. Rename is the
  * atomicity primitive, exactly as in the reference.
  */
private class KvTextWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    val fields = info.schema().fieldNames.toSeq
    require(fields == Seq("key", "value") &&
      info.schema().fields.forall(_.dataType == StringType),
      s"kvtext writes (key string, value string), got ${info.schema().simpleString}")
    new Write {
      override def toBatch: BatchWrite =
        new KvTextBatchWrite(path, info.queryId(), truncateFirst)
    }
  }
}

private case class KvTextCommitMessage(partition: Int, tempFile: String)
    extends WriterCommitMessage

private class KvTextBatchWrite(path: String, queryId: String, truncate: Boolean)
    extends BatchWrite {
  private def fs = new Path(path).getFileSystem(new Configuration())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvTextWriterFactory(path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    val out = new Path(path)
    f.mkdirs(out)
    if (truncate) {
      Option(f.globStatus(new Path(out, "mr-out-*")))
        .foreach(_.foreach(st => f.delete(st.getPath, false)))
    }
    messages.foreach { case KvTextCommitMessage(pid, temp) =>
      val target = new Path(out, s"mr-out-$pid")
      f.delete(target, false) // re-run of an idempotent job overwrites
      require(f.rename(new Path(temp), target),
        s"kvtext commit: rename $temp -> $target failed")
    }
    f.delete(new Path(out, s"_temporary/$queryId"), true)
    // tidy the shared _temporary parent when this was its last tenant
    // (non-recursive delete only succeeds on an empty dir — safe if a
    // concurrent writer is mid-flight)
    f.delete(new Path(out, "_temporary"), false)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs.delete(new Path(new Path(path), s"_temporary/$queryId"), true)
}

private class KvTextWriterFactory(path: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvTextDataWriter(path, queryId, partitionId, taskId)
}

private class KvTextDataWriter(
    path: String, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val temp =
    new Path(new Path(path), s"_temporary/$queryId/attempt-$partitionId-$taskId")
  private val fs = temp.getFileSystem(new Configuration())
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(temp, true), java.nio.charset.StandardCharsets.UTF_8))

  override def write(row: InternalRow): Unit = {
    out.write(row.getUTF8String(0).toString)
    out.write(' ')
    out.write(row.getUTF8String(1).toString)
    out.write('\n')
  }
  // task commit only FINISHES the temp file; visibility is the driver's
  // rename — a speculative duplicate of this attempt leaves a stray temp
  // that job commit/abort sweeps, never a visible shard
  override def commit(): WriterCommitMessage = {
    out.close()
    KvTextCommitMessage(partitionId, temp.toString)
  }
  override def abort(): Unit = { out.close(); fs.delete(temp, false) }
  override def close(): Unit = ()
}

private class KvTextScanBuilder(props: Map[String, String], maxSplitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = KvTextSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new KvTextScan(props, required, maxSplitBytes)
}

/** A byte range of one file; owns the lines that BEGIN in
  * [start, start+length). */
private case class KvTextInputPartition(file: String, start: Long, length: Long)
    extends InputPartition

private class KvTextScan(
    props: Map[String, String], required: StructType, maxSplitBytes: Long)
    extends Scan with Batch {
  private lazy val files = KvTextSource.resolveFiles(props)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kvtext ${files.length} files, schema ${required.simpleString}"
  private def rangesOf(fs: Seq[(String, Long)]): Array[InputPartition] =
    fs.flatMap { case (file, len) =>
      if (len <= maxSplitBytes) Seq(KvTextInputPartition(file, 0L, math.max(len, 1L)))
      else (0L until len by maxSplitBytes).map(off =>
        KvTextInputPartition(file, off, math.min(maxSplitBytes, len - off)))
    }.toArray
  override def planInputPartitions(): Array[InputPartition] = rangesOf(files)
  override def createReaderFactory(): PartitionReaderFactory =
    new KvTextReaderFactory(required.fieldNames.toSeq)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KvTextMicroBatchStream(props, required, maxSplitBytes, rangesOf)
}

/** Micro-batch tail of a kvtext directory: each batch reads the shard
  * files that APPEARED since the last offset — "follow the reference
  * engine's output as its reducers commit". The offset is the explicit
  * SET of paths already processed (serialized as a sorted JSON array):
  * shard names are NOT lexicographically monotone in commit order
  * (`mr-out-10` < `mr-out-9`, and reducers commit in arbitrary order),
  * so a high-watermark-by-name offset would silently skip any shard
  * that appears after a higher-sorting one. Set-difference against the
  * directory listing has no such ordering assumption: every visible
  * file is read exactly once no matter when its producer's rename lands.
  * This is deterministic under re-listing and checkpoint recovery
  * because shard files are IMMUTABLE once visible (the kvtext write
  * protocol guarantees exactly that; in-progress attempts live under
  * `_temporary` and are filtered as metadata). Offset size is one path
  * string per shard ever seen — bounded by reducer count per job, the
  * same order as Spark's own FileStreamSource seen-map.
  */
private class KvTextMicroBatchStream(
    props: Map[String, String],
    required: StructType,
    maxSplitBytes: Long,
    rangesOf: Seq[(String, Long)] => Array[InputPartition])
    extends MicroBatchStream {

  // a tail may begin before the first shard commits — empty is normal
  private def listAll(): Seq[(String, Long)] =
    KvTextSource.resolveFiles(props, requireNonEmpty = false).sortBy(_._1)

  override def initialOffset(): Offset = KvTextOffset(Set.empty)
  override def latestOffset(): Offset =
    KvTextOffset(listAll().map(_._1).toSet)
  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.isEmpty) KvTextOffset(Set.empty)
    else if (t.startsWith("[")) KvTextOffset(KvTextOffset.parse(t))
    // legacy high-watermark offset from a pre-set-offset checkpoint:
    // its contract was "everything sorting <= watermark was processed"
    else KvTextOffset(listAll().map(_._1).filter(_ <= t).toSet)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KvTextOffset].seen
    val hi = end.asInstanceOf[KvTextOffset].seen
    rangesOf(listAll().filter { case (f, _) => hi.contains(f) && !lo.contains(f) })
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KvTextReaderFactory(required.fieldNames.toSeq)
}

/** Offset = set of processed paths; serialized as a sorted JSON string
  * array so checkpoint bytes are deterministic for a given set. */
private case class KvTextOffset(seen: Set[String]) extends Offset {
  override def json(): String =
    seen.toSeq.sorted.map(KvTextOffset.quote).mkString("[", ",", "]")
}

private object KvTextOffset {
  private[sources] def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
  /** Parse the array form produced by [[quote]]. */
  private[sources] def parse(json: String): Set[String] = {
    val out = Set.newBuilder[String]
    var i = 0
    while (i < json.length) {
      if (json.charAt(i) == '"') {
        val b = new StringBuilder
        i += 1
        while (json.charAt(i) != '"') {
          if (json.charAt(i) == '\\') {
            json.charAt(i + 1) match {
              case 'u' =>
                b.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
                i += 5
              case c => b.append(c); i += 1
            }
          } else b.append(json.charAt(i))
          i += 1
        }
        out += b.toString
      }
      i += 1
    }
    out.result()
  }
}

private class KvTextReaderFactory(fields: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvTextReader(partition.asInstanceOf[KvTextInputPartition], fields)
}

private class KvTextReader(split: KvTextInputPartition, fields: Seq[String])
    extends PartitionReader[InternalRow] {
  private val path = new Path(split.file)
  private val stream = path.getFileSystem(new Configuration()).open(path)
  // a split owns the lines BEGINNING inside it: any split not at byte 0
  // seeks one byte early and discards through the first newline — the
  // previous split finishes that straddling line
  private var remaining = split.length
  if (split.start > 0) {
    stream.seek(split.start - 1)
    var b = stream.read()
    remaining += 1 // account for the lookback byte
    while (b != -1 && b != '\n') { b = stream.read(); remaining -= 1 }
    remaining -= 1 // the newline itself
  }
  private val in = new java.io.BufferedInputStream(stream, 64 * 1024)
  private val wantKey = fields.contains("key")
  private val wantValue = fields.contains("value")
  private var row: InternalRow = _
  private val lineBuf = new java.io.ByteArrayOutputStream(256)

  // Byte-exact line read: returns the line (terminator stripped, a
  // trailing '\r' before '\n' included in the strip) and decrements
  // `remaining` by the RAW bytes consumed — terminator included — so
  // split accounting is correct for both LF and CRLF files. A
  // BufferedReader.readLine would consume 2 bytes per CRLF terminator
  // while the old accounting assumed 1, letting a split run past its
  // end into lines the next split also reads (duplicates).
  private def readLineCounted(): String = {
    lineBuf.reset()
    var b = in.read()
    if (b == -1) return null
    var consumed = 0L
    while (b != -1 && b != '\n') { lineBuf.write(b); consumed += 1; b = in.read() }
    if (b == '\n') consumed += 1
    remaining -= consumed
    val raw = lineBuf.toByteArray
    val len = if (raw.nonEmpty && raw(raw.length - 1) == '\r') raw.length - 1
              else raw.length
    new String(raw, 0, len, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def next(): Boolean = {
    // read while the line STARTS inside the range; the final straddling
    // line is read whole (the byte loop crosses the boundary naturally)
    val line = if (remaining <= 0) null else readLineCounted()
    if (line == null) false
    else {
      // column pruning is real work avoided, not cosmetics: an unwanted
      // side is never substring'd into existence
      val cut = line.lastIndexOf(' ')
      val key =
        if (!wantKey) null
        else UTF8String.fromString(if (cut < 0) line else line.substring(0, cut))
      val value =
        if (!wantValue) null
        else UTF8String.fromString(if (cut < 0) "" else line.substring(cut + 1))
      row = InternalRow.fromSeq(fields.map {
        case "key" => key
        case "value" => value
      })
      true
    }
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
