package graft.sources

import java.time.LocalDate
import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's KB search endpoint
  * (SURVEY §2.1 S1 → `SupportsPushDownFilters`; reference encodes the date
  * range + publication id into the search URL so the SERVER filters,
  * /root/reference/src/01-scrape-images.py:482-522,:487-491). The "endpoint"
  * serves one issue row per (publication, day) over a fixed quarter, with
  * per-day ingest status joined in from the committed `state.json` fixture
  * (scraper_state.json:1, main.yml:70-74).
  *
  * Scale design — the part that matters at 100 TB:
  *  - Day-range and publication predicates are FULLY consumed by the source
  *    (`pushFilters` keeps them out of the post-scan set), and day bounds
  *    prune whole [[InputPartition]]s at planning time, exactly like the
  *    server-side URL filter: work that is never fetched, not work fetched
  *    then dropped. Unsupported predicates are returned to Spark and
  *    evaluated post-scan, so correctness never depends on the pushdown.
  *  - Column pruning (`SupportsPushDownRequiredColumns`) reaches the row
  *    emitter: unprojected columns are never materialized (a pushed-out
  *    `pub` filter leaves `pub` absent from the read schema entirely).
  *  - Partitions are day-chunks, independent and evenly sized, so a
  *    1000-executor cluster fans the quarter out without coordination; the
  *    tiny status map rides along in the serialized partition (a broadcast
  *    dim, not a join).
  */
class KbSearchSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KbSearchTable.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = new KbSearchTable

  override def supportsExternalMetadata(): Boolean = false
}

object KbSearchTable {
  val schema: StructType = StructType.fromDDL(
    "pub STRING, day DATE, issue_id STRING, n_pages INT, status STRING")

  /** The served domain: 4 publication codes x Q1 2024 (91 days). */
  val pubs: Seq[String] = Seq("AB", "DN", "GP", "SVD")
  val firstDay: Int = LocalDate.parse("2024-01-01").toEpochDay.toInt
  val lastDay: Int = LocalDate.parse("2024-03-31").toEpochDay.toInt
  /** Days per input partition (12 partitions over the quarter). */
  val chunkDays: Int = 8

  /** Deterministic page count — reproducible in ANSI SQL for the oracle:
    * (epochDay + length(pub)) % 8 + 4. */
  def nPages(epochDay: Int, pub: String): Int = (epochDay + pub.length) % 8 + 4

  /** Day→status from the committed state fixture; absent days are pending.
    * Parsed leniently (the fixture is a flat {"yyyy-MM-dd": "status"} map)
    * to keep this file free of JSON deps. */
  lazy val statusByDay: Map[Int, String] = {
    val raw = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${graft.queries.Sources.fixtureDir}/state.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    "\"([0-9]{4}-[0-9]{2}-[0-9]{2})\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(raw)
      .map(m => LocalDate.parse(m.group(1)).toEpochDay.toInt -> m.group(2))
      .toMap
  }
}

class KbSearchTable extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = "kb_search"
  override def schema(): StructType = KbSearchTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KbSearchScanBuilder(options.getInt("maxDaysPerTrigger", 7))

  /** Provenance metadata (`_chunk` = the day-chunk an issue was served
    * from — the connector analog of `_metadata.file_path` on file sources):
    * hidden from `SELECT *`, materialized only when explicitly selected,
    * and derived arithmetically in the row emitter (no storage). */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_chunk"
      override def dataType(): org.apache.spark.sql.types.DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "planning-time day-chunk index this row was served from"
    })
}

class KbSearchScanBuilder(maxDaysPerTrigger: Int = 7)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var loDay: Int = KbSearchTable.firstDay
  private var hiDay: Int = KbSearchTable.lastDay
  private var selectedPubs: Seq[String] = KbSearchTable.pubs
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = KbSearchTable.schema
  private var aggCols: Seq[String] = Nil
  private var pushedLimit: Int = -1
  private var topNDesc: Boolean = false

  private def toEpochDay(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: LocalDate => Some(d.toEpochDay.toInt)
    case s: String => scala.util.Try(LocalDate.parse(s).toEpochDay.toInt).toOption
    case _ => None
  }

  /** Consume what the endpoint can evaluate server-side; everything else
    * goes back to Spark. A filter is only consumed when its value converts
    * cleanly — a surprising literal type falls back to post-scan rather
    * than silently mis-filtering. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val postScan = filters.filterNot {
      // every served column is non-null, so IsNotNull is vacuously true —
      // consuming it matters: a leftover post-scan filter would block
      // aggregate pushdown entirely
      case IsNotNull(col) if KbSearchTable.schema.fieldNames.contains(col) => true
      case GreaterThanOrEqual("day", v) =>
        toEpochDay(v).exists { d => loDay = math.max(loDay, d); true }
      case GreaterThan("day", v) =>
        toEpochDay(v).exists { d => loDay = math.max(loDay, d + 1); true }
      case LessThanOrEqual("day", v) =>
        toEpochDay(v).exists { d => hiDay = math.min(hiDay, d); true }
      case LessThan("day", v) =>
        toEpochDay(v).exists { d => hiDay = math.min(hiDay, d - 1); true }
      case EqualTo("day", v) =>
        toEpochDay(v).exists { d => loDay = math.max(loDay, d); hiDay = math.min(hiDay, d); true }
      case EqualTo("pub", v: String) =>
        selectedPubs = selectedPubs.filter(_ == v); true
      case In("pub", vs) if vs.forall(_.isInstanceOf[String]) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        selectedPubs = selectedPubs.filter(set); true
      case _ => false
    }
    pushed = filters.diff(postScan)
    postScan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** PARTIAL aggregate pushdown (the endpoint's "result count" responses:
    * the server reports counts without shipping rows). Each day-chunk
    * partition answers COUNT(*)/MIN(day)/MAX(day) — optionally grouped by
    * pub — ARITHMETICALLY from its bounds; Spark's final aggregate merges
    * the per-partition partials, so overlapping groups across partitions
    * stay correct. Complete pushdown is declined: partials are always safe
    * under AQE/speculation, and the merge cost is one tiny row per chunk. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  private def isDayRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case fr: NamedReference => fr.fieldNames.sameElements(Array("day"))
      case _ => false
    }

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groupOk = aggregation.groupByExpressions.toSeq match {
      case Nil => true
      case Seq(fr: NamedReference) if fr.fieldNames.sameElements(Array("pub")) => true
      case _ => false
    }
    if (!groupOk) return false
    val cols = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      // every served column is non-null, so COUNT(col) == COUNT(*) here
      case c: Count if !c.isDistinct => Some("count")
      case m: Min if isDayRef(m.column) => Some("min_day")
      case m: Max if isDayRef(m.column) => Some("max_day")
      case _ => None
    }
    if (cols.exists(_.isEmpty)) return false
    val grouped = aggregation.groupByExpressions.nonEmpty
    aggCols = (if (grouped) Seq("pub") else Nil) ++ cols.flatten
    // readSchema must mirror groupBy columns ++ aggregate columns, in order
    required = StructType(aggCols.map {
      case "pub" => StructField("pub", StringType)
      case "count" => StructField("count", LongType)
      case c => StructField(c, DateType)
    })
    true
  }

  /** PARTIAL limit pushdown (the endpoint's page-size parameter: ask the
    * server for the first N results instead of all of them). The scan plans
    * only enough day-chunks to supply `limit` rows — work never fetched —
    * and Spark's retained GlobalLimit makes the final cut, so correctness
    * never depends on the cap. Declined under aggregate pushdown: the
    * limit sits above the aggregate there, and capping partials would be
    * wrong. */
  override def pushLimit(limit: Int): Boolean = {
    if (aggCols.nonEmpty) return false
    pushedLimit = limit
    true
  }

  /** PARTIAL top-N pushdown, honored when the PRIMARY sort key is `day`:
    * rows are generated day-major, and every day contributes exactly
    * |pubs| rows, so the global top-N by (day, …) lives inside the
    * ceil(N / |pubs|) extreme days — the scan keeps whole days from the
    * sorted end and Spark's retained Sort+Limit resolves any tie-break
    * keys. The server-side analog is `sort=date&max=N` on the search URL. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (aggCols.nonEmpty) return false
    orders.headOption match {
      case Some(o) if isDayRef(o.expression) =>
        topNDesc = o.direction == SortDirection.DESCENDING
        pushedLimit = limit
        true
      case _ => false
    }
  }

  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new KbSearchScan(loDay, hiDay, selectedPubs, required, pushed, aggCols,
      pushedLimit, topNDesc, maxDaysPerTrigger)
}

class KbSearchScan(
    loDay: Int,
    hiDay: Int,
    selectedPubs: Seq[String],
    required: StructType,
    val pushed: Array[Filter],
    val aggCols: Seq[String] = Nil,
    val pushedLimit: Int = -1,
    topNDesc: Boolean = false,
    maxDaysPerTrigger: Int = 7)
    extends Scan
    with Batch
    with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (join-driven) pruning state — the DSv2 analog of dynamic
    * partition pruning: when this scan joins a small dimension on day/pub,
    * Spark executes the dimension first and hands the distinct join keys
    * here; [[planInputPartitions]] then skips whole day-chunks. Pruning is
    * best-effort by contract (the join still filters rows), so an
    * unconvertible value simply leaves the scan unpruned, never wrong. */
  @volatile private var runtimeDayWhitelist: Option[Set[Int]] = None

  /** Day-chunks actually planned after runtime filtering (for tests). */
  def runtimeDays: Option[Set[Int]] = runtimeDayWhitelist

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("day"))

  private def runtimeEpochDay(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: LocalDate => Some(d.toEpochDay.toInt)
    case i: java.lang.Integer => Some(i.intValue) // internal DATE encoding
    case _ => None
  }

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("day", vs) =>
      val days = vs.toSeq.map(runtimeEpochDay)
      if (days.forall(_.isDefined))
        runtimeDayWhitelist = Some(days.flatten.toSet)
    case EqualTo("day", v) =>
      runtimeEpochDay(v).foreach(d => runtimeDayWhitelist = Some(Set(d)))
    case _ => () // best-effort: unrecognized runtime filters prune nothing
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KbSearchMicroBatchStream(loDay, hiDay, selectedPubs, required, maxDaysPerTrigger)

  override def description(): String =
    s"kb_search PushedFilters: [${pushed.mkString(", ")}], " +
      (if (aggCols.nonEmpty) s"PushedAggregation: [${aggCols.mkString(", ")}], " else "") +
      (if (pushedLimit >= 0)
        s"PushedLimit: $pushedLimit (${if (topNDesc) "day DESC" else "day ASC"}), "
      else "") +
      s"days [$loDay,$hiDay], pubs ${selectedPubs.mkString("/")}"

  /** Planning-time partition pruning: only day-chunks intersecting the
    * pushed bounds are planned. */
  override def planInputPartitions(): Array[InputPartition] = {
    val chunk = KbSearchTable.chunkDays
    val first = KbSearchTable.firstDay
    if (loDay > hiDay || selectedPubs.isEmpty) {
      // a GLOBAL pushed aggregate must still see one empty partial (count
      // 0, null min/max) — zero partitions would make the final agg return
      // null for a count; a grouped agg over nothing correctly has no rows
      return if (aggCols.nonEmpty && !aggCols.contains("pub"))
        Array(KbSearchPartition(Seq.empty, selectedPubs, Map.empty))
      else Array.empty
    }
    val loChunk = (loDay - first) / chunk
    val hiChunk = (hiDay - first) / chunk
    // runtime join-key pruning narrows each chunk to EXACTLY its matching
    // days (the partition carries the kept-day set, so days between two
    // whitelist hits are never materialized) and drops chunks with none;
    // NOT applied under aggregate pushdown, where partials are terminal
    // (no join re-filters them downstream)
    val whitelist = if (aggCols.isEmpty) runtimeDayWhitelist else None
    val chunkDaysKept: Seq[Seq[Int]] = (loChunk to hiChunk).map { c =>
      val chunkLo = math.max(loDay, first + c * chunk)
      val chunkHi = math.min(hiDay, first + (c + 1) * chunk - 1)
      whitelist match {
        case Some(keep) => (chunkLo to chunkHi).filter(keep)
        case None => chunkLo to chunkHi
      }
    }
    // limit/top-N pushdown: keep whole days from the sorted end until the
    // kept days can supply `limit` rows (each day yields |pubs| rows, so
    // ceil(limit/|pubs|) days suffice and full-day granularity leaves any
    // secondary tie-break keys to Spark's retained Sort+Limit). Chunks that
    // cannot contribute are never planned — the pushdown's scale point.
    val capped: Seq[Seq[Int]] =
      if (pushedLimit < 0 || aggCols.nonEmpty) chunkDaysKept
      else {
        var need = (pushedLimit + selectedPubs.size - 1) / selectedPubs.size
        val ordered = if (topNDesc) chunkDaysKept.reverse.map(_.reverse) else chunkDaysKept
        val kept = ordered.map { ds =>
          val take = ds.take(need); need -= take.size; take
        }
        if (topNDesc) kept.reverse.map(_.reverse) else kept
      }
    capped.flatMap { days =>
      if (days.isEmpty) None
      else Some(KbSearchPartition(days, selectedPubs,
        days.flatMap(d => KbSearchTable.statusByDay.get(d).map(d -> _)).toMap)
        : InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KbSearchReaderFactory(required, aggCols)

  /** Exact row count from the pruned bounds — lets Catalyst/AQE size the
    * scan (and pick broadcast sides) without reading anything. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows: Long =
      math.max(0, hiDay - loDay + 1).toLong * selectedPubs.size
    override def sizeInBytes(): OptionalLong = OptionalLong.of(rows * 64L)
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }
}

/** Exclusive-end day offset for the incremental read: `untilDay` is the
  * first epoch day NOT yet served. */
case class KbDayOffset(untilDay: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"untilDay":$untilDay}"""
}

object KbDayOffset {
  private val re = """\{"untilDay":(-?\d+)\}""".r
  def fromJson(s: String): KbDayOffset = s.trim match {
    case re(d) => KbDayOffset(d.toInt)
    case other => throw new IllegalArgumentException(s"bad kb_search offset: $other")
  }
}

/** Incremental (micro-batch) read of the search endpoint — the reference's
  * daily-harvest mode: its workflow processes a bounded day-window per run
  * and records progress in a state file (main.yml:77-95, :70-74). Here the
  * day cursor IS the streaming offset, so progress tracking, restart, and
  * exactly-once hand-off to the sink ride Spark's checkpoint machinery
  * instead of a hand-rolled state file.
  *
  *  - Admission control: at most `maxDaysPerTrigger` days per micro-batch
  *    (the workflow's per-run window). `Trigger.AvailableNow` drains the
  *    pushed day-range batch-by-batch and terminates — the "catch up the
  *    backlog tonight" run.
  *  - Pushdown carries over: the day bounds and pub set consumed by
  *    [[KbSearchScanBuilder]] bound the stream, and column pruning reaches
  *    the row emitter — a streaming read fetches no more than the batch
  *    read would.
  *  - Partitions within a batch are the same grid-aligned day-chunks as
  *    the batch scan, so a 1000-executor cluster fans each micro-batch out
  *    identically. Offsets are day-granular, deterministic and replayable:
  *    re-planning [start, end) yields identical rows, which is what makes
  *    a failed batch safely re-runnable. */
class KbSearchMicroBatchStream(
    loDay: Int,
    hiDay: Int,
    selectedPubs: Seq[String],
    required: StructType,
    maxDaysPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  require(maxDaysPerTrigger >= 1, "maxDaysPerTrigger must be >= 1")

  override def initialOffset(): Offset = KbDayOffset(loDay)
  override def deserializeOffset(json: String): Offset = KbDayOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Rate control is day-granular via `maxDaysPerTrigger`; row/file limits
    * don't map to the domain, so the default is all-available. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def prepareForTriggerAvailableNow(): Unit = () // domain already bounded

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "kb_search is admission-controlled; latestOffset(start, limit) is used")

  /** The true end of available data — how the engine knows batches remain
    * even though each admission-controlled batch stops short of it. */
  override def reportLatestOffset(): Offset = KbDayOffset(hiDay + 1)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KbDayOffset].untilDay
    KbDayOffset(math.min(hiDay + 1, from + maxDaysPerTrigger))
  }

  /** Serve days [start, end) as the batch scan's grid-aligned chunks. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[KbDayOffset].untilDay
    val until = end.asInstanceOf[KbDayOffset].untilDay
    if (from >= until || selectedPubs.isEmpty) return Array.empty
    (from until until)
      .groupBy(d => (d - KbSearchTable.firstDay) / KbSearchTable.chunkDays)
      .toSeq.sortBy(_._1)
      .map { case (_, days) =>
        KbSearchPartition(days, selectedPubs,
          days.flatMap(d => KbSearchTable.statusByDay.get(d).map(d -> _)).toMap)
          : InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KbSearchReaderFactory(required, Nil)
}

/** One day-chunk; carries the EXPLICIT day set (≤ chunkDays entries, so
  * runtime-pruned chunks serialize only their kept days — no range
  * re-inflation) and the (tiny) status-fixture slice for those days so
  * executors never touch the driver filesystem. */
case class KbSearchPartition(
    days: Seq[Int],
    pubs: Seq[String],
    status: Map[Int, String])
    extends InputPartition

class KbSearchReaderFactory(required: StructType, aggCols: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    if (aggCols.nonEmpty)
      new KbSearchAggReader(partition.asInstanceOf[KbSearchPartition], aggCols)
    else new KbSearchReader(partition.asInstanceOf[KbSearchPartition], required)
}

/** Pushed-aggregate reader: answers the chunk's partials from arithmetic on
  * its day bounds — zero rows materialized, the scale point of aggregate
  * pushdown (the 100 TB analog: the server counts, the engine merges). */
class KbSearchAggReader(part: KbSearchPartition, aggCols: Seq[String])
    extends PartitionReader[InternalRow] {

  private val nDays: Long = part.days.size.toLong
  private val groups: Iterator[InternalRow] =
    if (aggCols.head == "pub")
      part.pubs.iterator.map { pub =>
        InternalRow.fromSeq(aggCols.map {
          case "pub" => UTF8String.fromString(pub)
          case "count" => nDays
          case "min_day" => part.days.min
          case "max_day" => part.days.max
        })
      }
    else Iterator.single(InternalRow.fromSeq(aggCols.map {
      case "count" => nDays * part.pubs.size
      case "min_day" => if (nDays == 0) null else part.days.min
      case "max_day" => if (nDays == 0) null else part.days.max
    }))

  private var current: InternalRow = _
  override def next(): Boolean = { val has = groups.hasNext; if (has) current = groups.next(); has }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class KbSearchReader(part: KbSearchPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = for {
    day <- part.days.iterator
    pub <- part.pubs.iterator
  } yield {
    val date = LocalDate.ofEpochDay(day.toLong)
    // only materialize what the pruned schema asks for
    InternalRow.fromSeq(required.fieldNames.toSeq.map {
      case "pub" => UTF8String.fromString(pub)
      case "day" => day
      case "issue_id" => UTF8String.fromString(
        f"${pub}_${date.getYear}%04d${date.getMonthValue}%02d${date.getDayOfMonth}%02d")
      case "n_pages" => KbSearchTable.nPages(day, pub)
      case "status" => UTF8String.fromString(part.status.getOrElse(day, "pending"))
      case "_chunk" => (day - KbSearchTable.firstDay) / KbSearchTable.chunkDays
    })
  }

  private var current: InternalRow = _
  override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
