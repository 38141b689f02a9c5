package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.types.{DataType, StructType}

/** The repo's ONLY touchpoint for non-public Catalyst catalog APIs
  * (`sessionState.catalog`, `TableIdentifier`) — isolated here per
  * ADVICE r07 so a Spark upgrade that moves them breaks one small file
  * with an obvious name, not a correctness query.
  *
  * Version note: written against Spark 4.1.2. `SessionCatalog
  * .getTableMetadata` / `.alterTableDataSchema` and
  * `catalyst.TableIdentifier` have been source-stable since 2.x but are
  * `private[sql]`-adjacent internals with no compatibility promise. The
  * retype path exists because Spark's public SQL surface refuses Hive
  * column-type changes (`ALTER TABLE ... CHANGE COLUMN` with a new type
  * throws); rewriting the metastore data schema is exactly what Hive's
  * own CHANGE COLUMN performs.
  */
object MetastoreInternal {

  /** Catalog metadata for `table` in `hs`'s (hive) session catalog. */
  def tableMetadata(hs: SparkSession, table: String): CatalogTable =
    hs.sessionState.catalog.getTableMetadata(TableIdentifier(table))

  /** Apply column retypes to `table`'s metastore data schema in place
    * (no data rewrite — the Hive CHANGE COLUMN semantics). Returns the
    * migrated schema as stored. */
  def retypeColumns(hs: SparkSession, table: String,
                    retypes: Map[String, DataType]): StructType = {
    val cat = hs.sessionState.catalog
    val ident = TableIdentifier(table)
    val migrated = StructType(
      cat.getTableMetadata(ident).dataSchema.map { f =>
        retypes.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f)
      })
    cat.alterTableDataSchema(ident, migrated)
    migrated
  }
}
