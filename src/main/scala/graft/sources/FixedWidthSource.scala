package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for header-less fixed-width binary records — the
  * GraySort format (100-byte records, 10-byte keys:
  * `FixedSizeKVPairFormatReader.cc:11-80`, `gensort.c:58`) generalized to
  * any `record.length`/`key.length`.
  *
  * {{{
  * spark.read.format("graft-fixed")
  *   .option("record.length", 100).option("key.length", 10)
  *   .load(dir)   // => (key: binary, value: binary)
  * }}}
  *
  * Paths go through the Hadoop FileSystem API ([[HadoopIO]]): any
  * configured scheme (`file://`, `hdfs://`, `s3a://`), globs, and
  * comma-separated lists all work — the reference's
  * `MultiProtocolReader.cc` scheme dispatch. Files split into
  * record-aligned chunks of ~`split.size` bytes, so a 1000-executor
  * cluster scans one 100 TB directory fully in parallel — the record
  * alignment replaces the reference's partial-tuple handling across chunk
  * boundaries. */
class FixedWidthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fixed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FixedWidthTable(properties.asScala.toMap)
}

object FixedWidthSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false)))
}

class FixedWidthTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-fixed(${props.getOrElse("path", "?")})"
  override def schema(): StructType = FixedWidthSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path"))
      .getOrElse(props.getOrElse("path", sys.error("path option required")))
    val recordLen = options.getInt("record.length", 100)
    val keyLen = options.getInt("key.length", 10)
    val splitSize = options.getLong("split.size", 32L * 1024 * 1024)
    val conf = new HadoopIO.SerializableConf(
      HadoopIO.sessionConf(SparkSession.active))
    new FixedWidthScan(path, recordLen, keyLen, splitSize, conf)
  }
}

case class FixedWidthChunk(file: String, start: Long, length: Long)
  extends InputPartition

class FixedWidthScan(path: String, recordLen: Int, keyLen: Int,
    splitSize: Long, conf: HadoopIO.SerializableConf)
    extends ScanBuilder with Scan with Batch {
  require(keyLen > 0 && keyLen <= recordLen, "need 0 < key.length <= record.length")
  override def build(): Scan = this
  override def readSchema(): StructType = FixedWidthSource.SCHEMA
  override def toBatch: Batch = this

  /** Record-aligned splits: chunk boundaries always land on a multiple of
    * the record length, so no record ever straddles two partitions. */
  override def planInputPartitions(): Array[InputPartition] = {
    val recordsPerSplit = math.max(1L, splitSize / recordLen)
    val bytesPerSplit = recordsPerSplit * recordLen
    HadoopIO.listFiles(path, conf.value).flatMap { st =>
      require(st.getLen % recordLen == 0,
        s"${st.getPath}: length ${st.getLen} not a multiple of record.length=$recordLen")
      (0L until st.getLen by bytesPerSplit).map { start =>
        FixedWidthChunk(st.getPath.toString, start,
          math.min(bytesPerSplit, st.getLen - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val rl = recordLen; val kl = keyLen; val c = conf
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new FixedWidthReader(p.asInstanceOf[FixedWidthChunk], rl, kl, c)
    }
  }
}

class FixedWidthReader(chunk: FixedWidthChunk, recordLen: Int, keyLen: Int,
    conf: HadoopIO.SerializableConf)
    extends PartitionReader[InternalRow] {
  private val in = {
    val s = HadoopIO.open(chunk.file, conf.value)
    s.seek(chunk.start)
    new java.io.DataInputStream(new java.io.BufferedInputStream(s, 1 << 20))
  }
  private var remaining = chunk.length / recordLen
  private val buf = new Array[Byte](recordLen)
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (remaining <= 0) return false
    in.readFully(buf)
    remaining -= 1
    val key = util.Arrays.copyOfRange(buf, 0, keyLen)
    val value = util.Arrays.copyOfRange(buf, keyLen, recordLen)
    row = new GenericInternalRow(Array[Any](key, value))
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
