package graft.sources

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` plugin exposing the search connector to plain SQL:
  * every engine session registers it as `spark.sql.catalog.kb`
  * ([[graft.Engine.session]]), so `SELECT … FROM kb.search` resolves
  * through the full DSv2 pushdown stack (filters, columns, aggregates,
  * limit/top-N, runtime pruning) with no DataFrame-API ceremony — the SQL
  * entry point a warehouse user expects from a connector (SURVEY §2.1 S8
  * maps the drive-catalog analog to a DSv2 catalog surface).
  *
  * Read-only by design: the served domain is the endpoint's, not the
  * engine's, so DDL (create/alter/drop/rename) is rejected rather than
  * silently accepted. The archive sink stays on the DataFrame API — it is
  * path-parameterized per job, which a static catalog identifier cannot
  * express.
  */
class KbCatalog extends TableCatalog {
  private var catalogName: String = "kb"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "search"))

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.isEmpty && ident.name == "search") new KbSearchTable
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
}
