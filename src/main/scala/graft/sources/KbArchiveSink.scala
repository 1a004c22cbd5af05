package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector modeling the reference's verified archive
  * upload (SURVEY §2.1 S7/S9: per-file md5 verify after upload,
  * /root/reference/src/01-scrape-images.py:126-129, and staging-rename
  * commit, :462-475) as a real Spark commit protocol instead of a
  * driver-side loop:
  *
  *  - each task writes its partition to a STAGING file, digesting md5 as
  *    it streams (no second pass), and reports (file, md5, rows, bytes) in
  *    its [[WriterCommitMessage]];
  *  - the driver commits by re-verifying each staged file's md5 against
  *    the task's digest, renaming into the target, and writing a
  *    `_manifest.json` of committed files — so readers (and reruns) see
  *    either the whole write or none of it;
  *  - speculative/retried task attempts are naturally fenced: the commit
  *    coordinator admits one attempt per partition, only files named in
  *    admitted messages are renamed, and `abort` deletes the staging dir.
  *
  * Scale notes: the verify pass re-reads what was just written (the
  * reference's download-and-check, done here with one streaming read per
  * file at commit); a 100 TB deployment would swap it for the FS's own
  * checksum facility but keep the same message/manifest flow. Appends
  * MERGE into the manifest; `mode("overwrite")` maps to
  * [[SupportsTruncate]] and replaces it. The archive row shape is
  * deliberately opaque — `key STRING, payload STRING` — the connector
  * archives keyed blobs (the reference archives files by name), it does
  * not interpret them.
  */
class KbArchiveSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KbArchive.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KbArchiveTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object KbArchive {
  val schema: StructType = StructType.fromDDL("key STRING, payload STRING")
  val ManifestName = "_manifest.json"

  case class Entry(name: String, md5: String, rows: Long, bytes: Long)

  private val entryRe =
    """\{"name":"([^"]+)","md5":"([0-9a-f]{32})","rows":(\d+),"bytes":(\d+)\}""".r

  def renderManifest(entries: Seq[Entry]): String =
    entries.sortBy(_.name)
      .map(e => s"""{"name":"${e.name}","md5":"${e.md5}","rows":${e.rows},"bytes":${e.bytes}}""")
      .mkString("{\"files\":[", ",", "]}")

  def parseManifest(s: String): Seq[Entry] =
    entryRe.findAllMatchIn(s)
      .map(m => Entry(m.group(1), m.group(2), m.group(3).toLong, m.group(4).toLong))
      .toSeq

  /** Committed manifest of `dir`, empty if none. */
  def readManifest(dir: String): Seq[Entry] = {
    val fs = FileSystem.get(new java.net.URI(dir), new Configuration())
    val p = new Path(dir, ManifestName)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      try parseManifest(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private[graft] def md5Of(fs: FileSystem, p: Path): String = {
    val digest = MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) digest.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    digest.digest().map("%02x".format(_)).mkString
  }

  /** Shared commit path for batch and per-epoch streaming commits: verify
    * every admitted file's md5 against its task digest (all-or-nothing,
    * BEFORE any rename), optionally clear the previous archive (truncate),
    * rename admitted files in, publish the merged manifest, drop staging. */
  private[sources] def publish(
      fs: FileSystem,
      path: String,
      staging: Path,
      admitted: Seq[KbArchiveCommitMessage],
      truncate: Boolean): Unit = {
    admitted.foreach { m =>
      val actual = md5Of(fs, new Path(staging, m.file))
      if (actual != m.md5)
        throw new java.io.IOException(
          s"kb_archive verify failed for ${m.file}: task digest ${m.md5}, stored $actual")
    }
    val existing = if (truncate) {
      readManifest(path).foreach(e => fs.delete(new Path(path, e.name), false))
      Nil
    } else readManifest(path)
    admitted.foreach(m => fs.rename(new Path(staging, m.file), new Path(path, m.file)))
    // names are collision-free by construction (queryId fragment); if one
    // ever repeats anyway, the rename above replaced the file, so the new
    // entry must replace the old one rather than double-count
    val admittedNames = admitted.map(_.file).toSet
    val entries = existing.filterNot(e => admittedNames(e.name)) ++
      admitted.map(m => Entry(m.file, m.md5, m.rows, m.bytes))
    val out = fs.create(new Path(path, ManifestName), true)
    try out.write(renderManifest(entries).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(staging, true): Unit
  }
}

class KbArchiveTable(path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "kb_archive requires a 'path' option")
  override def name(): String = s"kb_archive($path)"
  override def schema(): StructType = KbArchive.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(Array("key", "payload")),
      s"kb_archive expects (key, payload), got ${info.schema().fieldNames.mkString(",")}")
    new KbArchiveWriteBuilder(path, info.queryId(), truncate = false)
  }
}

class KbArchiveWriteBuilder(path: String, queryId: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new KbArchiveWriteBuilder(path, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new KbArchiveBatchWrite(path, queryId, truncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new KbArchiveStreamingWrite(path, queryId)
    override def description(): String =
      s"kb_archive path=$path ${if (truncate) "truncate" else "append"}"
  }
}

class KbArchiveBatchWrite(path: String, queryId: String, truncate: Boolean)
    extends BatchWrite {

  private def stagingDir = new Path(path, s"_staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KbArchiveWriterFactory(path, queryId)

  /** Driver-side commit: verify each admitted file's md5 against the
    * digest its writer computed while streaming, then rename into the
    * target and publish the merged manifest. Any mismatch fails the whole
    * job BEFORE anything is renamed — the archive never holds a corrupt
    * file (reference :126-129 deletes and retries on mismatch). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    val admitted = messages.collect {
      case m: KbArchiveCommitMessage if m.rows > 0 => m
    }
    KbArchive.publish(fs, path, stagingDir, admitted.toSeq, truncate)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    fs.delete(stagingDir, true): Unit
  }
}

/** Streaming (per-epoch) writes into the archive — the reference pipeline's
  * steady state: each micro-batch of harvested issues lands as one verified,
  * manifest-tracked commit. Exactly-once across engine restarts: a marker
  * file per committed epoch makes the commit IDEMPOTENT — when a failed-
  * before-checkpoint batch is replayed, its re-staged files are discarded
  * instead of re-published, so the archive never double-counts (the
  * connector-level analog of the reference's skip-if-exists state file,
  * :462-465). */
class KbArchiveStreamingWrite(path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def fs = FileSystem.get(new java.net.URI(path), new Configuration())
  private def stagingParent = new Path(path, s"_staging-$queryId")
  private def epochStaging(epochId: Long) =
    new Path(stagingParent, s"epoch-$epochId")
  private def epochMarker(epochId: Long) =
    new Path(path, s"_epochs/$queryId/$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new KbArchiveStreamingWriterFactory(path, queryId)

  /** Drop the per-query `_staging-<queryId>` parent (the same dir for
    * every epoch) once it is empty: a long-lived archive must not
    * accumulate one empty staging dir per stream that ever wrote it
    * (micro-batches are serial within a query, so nothing can be staging
    * here concurrently). Runs on BOTH the publish and the replayed-epoch
    * path — a replay of a stream's last epoch is exactly the case where
    * nobody comes back to clean up. Caught by the ChaosRetry stream
    * scenario's no-staging-left invariant. */
  private def dropEmptyStagingParent(f: FileSystem): Unit = {
    if (f.exists(stagingParent) && f.listStatus(stagingParent).isEmpty)
      f.delete(stagingParent, false): Unit
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    if (f.exists(epochMarker(epochId))) {
      // replayed epoch (failure after commit, before checkpoint advance):
      // already published — drop the duplicate staging, change nothing
      f.delete(epochStaging(epochId), true)
      dropEmptyStagingParent(f)
      return
    }
    val admitted = messages.collect {
      case m: KbArchiveCommitMessage if m.rows > 0 => m
    }
    KbArchive.publish(f, path, epochStaging(epochId), admitted.toSeq, truncate = false)
    f.mkdirs(epochMarker(epochId).getParent)
    f.create(epochMarker(epochId), true).close()
    // publish dropped this epoch's staging subdir
    dropEmptyStagingParent(f)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    fs.delete(epochStaging(epochId), true): Unit
  }
}

class KbArchiveStreamingWriterFactory(path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new KbArchiveWriter(path, s"_staging-$queryId/epoch-$epochId",
      f"part-${queryId.take(8)}-$epochId-$partitionId%05d-$taskId.kbar")
}

class KbArchiveWriterFactory(path: String, queryId: String) extends DataWriterFactory {
  // the queryId fragment makes names collision-free across writes from
  // DIFFERENT drivers appending to one archive: task ids are only unique
  // within a SparkContext, so without it a later append could rename over
  // an earlier file while the manifest lists the name twice
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KbArchiveWriter(path, s"_staging-$queryId",
      f"part-${queryId.take(8)}-$partitionId%05d-$taskId.kbar")
}

/** Task-side writer: streams `key\tpayload\n` lines into one staging file,
  * updating the md5 digest per buffer — the digest the driver verifies at
  * commit. The attempt-unique taskId in the file name fences concurrent
  * speculative attempts writing the same partition. */
class KbArchiveWriter(path: String, stagingSubdir: String, fileName: String)
    extends DataWriter[InternalRow] {

  private val filePath = new Path(new Path(path, stagingSubdir), fileName)
  private val fs = FileSystem.get(new java.net.URI(path), new Configuration())
  private val out = fs.create(filePath, true)
  private val digest = MessageDigest.getInstance("MD5")
  private val chaosAfter = WriteChaos.thresholdNow() // -1 unless chaos-armed
  private val chaosSlowMs = WriteChaos.slowPerRowNow() // -1 unless armed
  private var rows = 0L
  private var bytes = 0L

  override def write(row: InternalRow): Unit = {
    val line = s"${row.getUTF8String(0)}\t${row.getUTF8String(1)}\n"
      .getBytes(StandardCharsets.UTF_8)
    digest.update(line)
    out.write(line)
    rows += 1
    bytes += line.length
    WriteChaos.maybeFail(chaosAfter, rows)
    WriteChaos.maybeSlow(chaosSlowMs)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (rows == 0) fs.delete(filePath, false) // empty partitions leave no file
    KbArchiveCommitMessage(fileName, digest.digest().map("%02x".format(_)).mkString,
      rows, bytes)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(filePath, false): Unit
  }

  override def close(): Unit = ()
}

case class KbArchiveCommitMessage(file: String, md5: String, rows: Long, bytes: Long)
    extends WriterCommitMessage
