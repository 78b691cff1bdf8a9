package graft.catalog

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

import graft.cdc.TypeMapper

/** One discovered source column (reference `ColInfo.scala:10`): name, the
  * lower-cased MySQL type string, enum labels when the type is an enum
  * (scraped via `SHOW COLUMNS` in the reference, `ColInfo.scala:72-95`),
  * and the PK flag. */
case class SourceColumn(
    name: String,
    mysqlType: String,
    enumValues: Seq[String] = Nil,
    isPrimaryKey: Boolean = false)

/** Schema discovery (SURVEY.md §2.1 S3). The reference discovers schemas at
  * runtime per table from JDBC `DatabaseMetaData` because the binlog carries
  * no column names (`ColInfo.scala:17-46`). The rebuild keeps the same flow
  * behind an interface; no MySQL exists in this environment, so the shipped
  * implementation is deterministic/synthetic — the production implementation
  * would back [[columns]] with `DatabaseMetaData.getColumns` /
  * `getPrimaryKeys` and a `SHOW COLUMNS ... LIKE` enum scrape, unchanged in
  * spirit.
  */
trait SchemaDiscovery {
  /** Ordered column list for `db.table` (ordinal order, like the
    * reference's JDBC `ORDINAL_POSITION` sort). */
  def columns(db: String, table: String): Seq[SourceColumn]

  /** PK column ordinals — the reference's `BitSet` over column positions
    * (`ColInfo.scala:26-68`). */
  final def pkOrdinals(db: String, table: String): Seq[Int] =
    columns(db, table).zipWithIndex.collect { case (c, i) if c.isPrimaryKey => i }

  /** Discovered schema as a Spark `StructType`. `compat = true` applies the
    * reference's narrow mapping table, `false` the full-fidelity lattice
    * (SURVEY §1.2); PK flag and enum labels ride along as field metadata. */
  final def structType(db: String, table: String, compat: Boolean = false): StructType =
    StructType(columns(db, table).map { c =>
      val md = new MetadataBuilder()
        .putBoolean("isPrimaryKey", c.isPrimaryKey)
        .putString("mysqlType", c.mysqlType)
      if (c.enumValues.nonEmpty) md.putStringArray("enumValues", c.enumValues.toArray)
      StructField(c.name,
        if (compat) TypeMapper.compat(c.mysqlType) else TypeMapper.full(c.mysqlType),
        nullable = !c.isPrimaryKey,
        metadata = md.build())
    })

  /** Generate a catalog [[TableMapping]] from a discovered schema — the
    * flow the reference drives by hand-written CLI JSON. */
  final def toMapping(db: String, table: String, sparkTableName: String): TableMapping =
    TableMapping(
      dbName = db, dbTableName = table,
      hbaseTableName = s"$db:$table", hbaseNameSpace = db,
      sparkTableName = sparkTableName, bytesUtils = "Binary",
      cols = columns(db, table).map(c => ColMapping(
        dbColumnName = c.name, dbColumnType = c.mysqlType,
        hbaseColumnName = c.name,
        hbaseColumnType = TypeMapper.compat(c.mysqlType).toString,
        isPrimaryKey = c.isPrimaryKey)))
}

/** Deterministic in-memory discovery, keyed by `db.table`. */
class SyntheticDiscovery(tables: Map[String, Seq[SourceColumn]]) extends SchemaDiscovery {
  override def columns(db: String, table: String): Seq[SourceColumn] =
    tables.getOrElse(s"$db.$table",
      throw new NoSuchElementException(s"unknown table $db.$table"))
}
