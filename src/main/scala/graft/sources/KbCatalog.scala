package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` plugin exposing the search connector to plain SQL:
  * every engine session registers it as `spark.sql.catalog.kb`
  * ([[graft.Engine.session]]), so `SELECT … FROM kb.search` resolves
  * through the full DSv2 pushdown stack (filters, columns, aggregates,
  * limit/top-N, runtime pruning) with no DataFrame-API ceremony — the SQL
  * entry point a warehouse user expects from a connector (SURVEY §2.1 S8
  * maps the drive-catalog analog to a DSv2 catalog surface).
  *
  * `kb.search` is read-only by design (the served domain is the
  * endpoint's, not the engine's); `kb.dim` is the WRITABLE counterpart —
  * a [[SupportsRowLevelOperations]] dimension table giving SQL users
  * INSERT / INSERT OVERWRITE / DELETE / UPDATE / MERGE INTO (see
  * [[KbDimTable]]). DDL (create/alter/drop/rename) stays rejected: the
  * catalog serves a fixed domain. The archive sink stays on the DataFrame
  * API — it is path-parameterized per job, which a static catalog
  * identifier cannot express.
  */
class KbCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = "kb"
  private var dimDir: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // `spark.sql.catalog.kb.dimDir` overrides; default is per-JVM temp
    dimDir = Option(options.get("dimDir")).getOrElse(KbDim.defaultDir)
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "search"),
      Identifier.of(Array.empty, "dim"))

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.isEmpty && ident.name == "search") new KbSearchTable
    else if (ident.namespace.isEmpty && ident.name == "dim") new KbDimTable(dimDir)
    else throw new NoSuchTableException(ident)

  /** Time travel: `SELECT … FROM kb.dim VERSION AS OF n` pins the table
    * to immutable snapshot manifest `_files.vn` (read-only). */
  override def loadTable(ident: Identifier, version: String): Table =
    if (ident.namespace.isEmpty && ident.name == "dim")
      new KbDimTable(dimDir, Some(version.toLong))
    else throw new NoSuchTableException(ident)

  override def createTable(
      ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException("kb catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("kb catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("kb catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("kb catalog is read-only")

  // ------------------------------------------------- FunctionCatalog half
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "cosine"),
      Identifier.of(Array.empty, "sum_sq"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == "cosine") CosineUnbound
    else if (ident.namespace.isEmpty && ident.name == "sum_sq") SumSqUnbound
    else throw new NoSuchFunctionException(ident)
}

/** `kb.cosine(a, b)` — cosine similarity of two float vectors, callable
  * from plain SQL via the V2 FunctionCatalog. The bound function carries
  * the MAGIC-METHOD fast path (`invoke(ArrayData, ArrayData)`): Spark
  * compiles the call to a direct StaticInvoke-style dispatch inside
  * whole-stage codegen — no row boxing, the same performance class as the
  * engine's native [[graft.functions.CosineSimilarityExpr]], but reachable
  * by a SQL-only user. Accumulation is index-ordered over per-element
  * float→double widenings, matching the DuckDB oracle's
  * `list_dot_product(CAST(.. AS DOUBLE[]))` bit-for-bit. */
object CosineUnbound extends UnboundFunction {
  override def name(): String = "cosine"
  override def description(): String =
    "cosine(a ARRAY<FLOAT>, b ARRAY<FLOAT>): cosine similarity in [-1, 1]"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 2 && inputType.fields.forall { f =>
      f.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    }
    if (!ok) throw new UnsupportedOperationException(
      s"kb.cosine expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got $inputType")
    CosineBound
  }
}

object CosineBound extends ScalarFunction[java.lang.Double] {
  override def name(): String = "cosine"
  override def canonicalName(): String = "kb.cosine"
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(FloatType), ArrayType(FloatType))
  override def resultType(): DataType = DoubleType
  override def isResultNullable: Boolean = true

  /** Magic-method fast path; null (not an exception) on length mismatch,
    * consistent with the engine's null-on-bad-row posture. */
  def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null || a.numElements() != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    invoke(input.getArray(0), input.getArray(1))
}

/** `kb.sum_sq(x BIGINT)` — sum of squares as a V2 catalog AGGREGATE
  * function: the UnboundFunction binds to an
  * [[org.apache.spark.sql.connector.catalog.functions.AggregateFunction]]
  * whose update/merge/produceResult contract Spark wraps in a partial +
  * final hash aggregate — the state is combined map-side per partition and
  * merged across the shuffle exactly like a built-in agg, so a SQL-only
  * user gets a distributed custom aggregation with no UDAF class on the
  * session. Integer arithmetic end to end: bit-identical in any engine. */
object SumSqUnbound extends UnboundFunction {
  override def name(): String = "sum_sq"
  override def description(): String =
    "sum_sq(x BIGINT): sum of x*x over the group, nulls skipped"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 1 &&
      inputType.fields.head.dataType == LongType
    if (!ok) throw new UnsupportedOperationException(
      s"kb.sum_sq expects (BIGINT), got $inputType")
    SumSqBound
  }
}

object SumSqBound extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def name(): String = "sum_sq"
  override def canonicalName(): String = "kb.sum_sq"
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false

  override def newAggregationState(): java.lang.Long = 0L

  // Math.*Exact so a domain wide enough to overflow 64-bit sum-of-squares
  // fails loudly (ArithmeticException) instead of silently wrapping where
  // an oracle engine would promote to a wider type.
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state
    else {
      val v = input.getLong(0)
      Math.addExact(state, Math.multiplyExact(v, v))
    }

  override def merge(left: java.lang.Long, right: java.lang.Long): java.lang.Long =
    Math.addExact(left, right)

  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
