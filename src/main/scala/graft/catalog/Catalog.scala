package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{CdcApplier, TypeMapper}

/** Source-column → sink-column mapping entry. JSON-compatible with the
  * reference's `HbaseCollInfo` (`HbaseTableInfo.scala:195-196`). */
case class ColMapping(
    dbColumnName: String,
    dbColumnType: String,
    hbaseColumnName: String,
    hbaseColumnType: String,
    isPrimaryKey: Boolean,
    family: String = "cf")

/** Table mapping — the unit of the catalog. JSON-compatible with the
  * reference's `HbaseTableInfo` (`HbaseTableInfo.scala:28-35`, the CLI's
  * `student` example at `Mysql2HbaseCliDriver.scala:41-48` = FIXTURES.md F1).
  * The HBase-specific fields (`hbaseTableName`, namespace, `bytesUtils`)
  * are carried for round-trip fidelity; the Spark-side identity is
  * `sparkTableName` and the column rename map. */
case class TableMapping(
    dbName: String,
    dbTableName: String,
    hbaseTableName: String,
    hbaseNameSpace: String,
    sparkTableName: String,
    bytesUtils: String,
    cols: Seq[ColMapping]) {
  def qualifiedName: String = s"$dbName.$dbTableName"
  def pkCols: Seq[String] = cols.filter(_.isPrimaryKey).map(_.dbColumnName)
}

/** Mapping catalog (SURVEY.md §2.1 S15/S16): add / list / delete persist
  * JSON mapping docs (one file per `db.table`, mirroring the reference's
  * one-HBase-row-per-table meta store, `HBaseTableUtils.scala:12-16`) with
  * an in-memory cache and reload-on-miss (`HBaseTableUtils.scala:16,73-78`);
  * map / unmap register the mapped table into the Spark session catalog
  * (`Hbase2CataLog.scala:19-27`) so it is queryable by `sparkTableName`.
  *
  * JSON (de)serialization runs through Spark's own `from_json`/`to_json`
  * against a fixed schema — replacing the reference's lift-json
  * (`HbaseTableInfo.scala:14-17,49-52`) with engine-native, codegen'd
  * parsing that would also work distributed over millions of mapping docs.
  */
class Catalog(spark: SparkSession, storeDir: String) {
  import Catalog._

  private val cache = TrieMap.empty[String, TableMapping]
  private val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  fs.mkdirs(new Path(storeDir))

  // Names are case-insensitive like the reference's lower-cased membership
  // test (`HBaseTableUtils.scala:25-28`): normalize once for the store key,
  // the cache key, and every lookup.
  private def norm(name: String): String = name.toLowerCase

  private def docPath(qualifiedName: String) = new Path(storeDir, s"${norm(qualifiedName)}.json")

  /** Validate + persist a mapping given raw JSON (the CLI `add` verb,
    * `Mysql2HbaseCliDriver.scala:73-79`). Rejects duplicates. */
  def add(json: String): TableMapping = {
    val m = parse(spark, json)
    validate(m)
    if (exists(m.qualifiedName))
      throw new IllegalArgumentException(s"mapping ${m.qualifiedName} already exists")
    // tmp + rename, mirroring the bucket-swap discipline: a crash mid-write
    // must not leave a truncated live doc that FAILFAST-parse would throw
    // on forever (wedging the name for get/list/re-add alike). The rename
    // goes through FileContext WITHOUT the OVERWRITE option — FileContext
    // enforces destination-not-exists on every FS (FileSystem.rename on the
    // local FS maps to POSIX rename(2), which silently replaces), so two
    // racing add()s cannot silently clobber each other.
    val live = docPath(m.qualifiedName)
    val tmp = new Path(storeDir, s".${norm(m.qualifiedName)}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(toJson(spark, m).getBytes("UTF-8")) finally out.close()
    try org.apache.hadoop.fs.FileContext
      .getFileContext(fs.makeQualified(live).toUri, spark.sparkContext.hadoopConfiguration)
      .rename(fs.makeQualified(tmp), fs.makeQualified(live))
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        throw new IllegalArgumentException(s"mapping ${m.qualifiedName} already exists")
    }
    cache.put(norm(m.qualifiedName), m)
    m
  }

  def exists(name: String): Boolean =
    cache.contains(norm(name)) || fs.exists(docPath(name))

  /** Reload-on-miss lookup (reference cache semantics). */
  def get(name: String): Option[TableMapping] =
    cache.get(norm(name)).orElse {
      val p = docPath(name)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        val m = parse(spark, json)
        cache.put(norm(name), m)
        Some(m)
      }
    }

  /** All mappings, from the store (the CLI `list` verb). */
  def list(): Seq[TableMapping] =
    fs.listStatus(new Path(storeDir))
      .filter(_.getPath.getName.endsWith(".json"))
      .map(_.getPath.getName.stripSuffix(".json"))
      .sorted
      .flatMap(get(_))
      .toSeq

  def delete(name: String): Boolean = {
    cache.remove(norm(name))
    fs.delete(docPath(name), false)
  }

  /** S5 membership test: is `db.table` replicated? (case-insensitive, like
    * `HBaseTableUtils.isTableNeedReplicated`, `HBaseTableUtils.scala:25-28`) */
  def isReplicated(db: String, table: String): Boolean =
    exists(s"$db.$table")

  /** The `map` verb: register the mapping's table (backed by a CdcApplier
    * target directory) into the session catalog under `sparkTableName`,
    * with columns renamed source→sink.
    *
    * The relation is the [[graft.sources.GraftDataSource]] connector, not a
    * raw parquet read: tombstones are filtered inside the scan, a
    * merge-on-read target resolves latest-per-key (a plain parquet view
    * would leak every superseded version), and PK predicates bucket-prune
    * exactly as `pointLookup`/`rangeLookup` do — the engine's layouts,
    * available to plain SQL under the mapped name. Staleness is a non-issue
    * by construction: the view's plan holds only the V2 table handle, and
    * the connector lists buckets at each query's scan build, so an
    * `applyBatch` swap is visible to the very next query. (A schema
    * EVOLUTION still needs a re-`map` to surface the new column — the view
    * schema is resolved here.) */
  def map(name: String, targetDir: String): Unit = {
    val m = get(name).getOrElse(throw new NoSuchElementException(s"no mapping $name"))
    spark.read.format("graft").load(targetDir)
      .select(m.cols.map(c =>
        col(s"`${c.dbColumnName}`").as(c.hbaseColumnName)).toIndexedSeq: _*)
      .createOrReplaceTempView(m.sparkTableName)
  }

  /** The `unmap` verb. */
  def unmap(name: String): Unit =
    get(name).foreach(m => spark.catalog.dropTempView(m.sparkTableName))
}

object Catalog {
  /** Fixed schema of the mapping JSON — field-compatible with F1. */
  val mappingSchema: StructType = StructType(Seq(
    StructField("dbName", StringType),
    StructField("dbTableName", StringType),
    StructField("hbaseTableName", StringType),
    StructField("hbaseNameSpace", StringType),
    StructField("sparkTableName", StringType),
    StructField("bytesUtils", StringType),
    StructField("cols", ArrayType(StructType(Seq(
      StructField("dbColumnName", StringType),
      StructField("dbColumnType", StringType),
      StructField("hbaseColumnName", StringType),
      StructField("hbaseColumnType", StringType),
      StructField("isPrimaryKey", BooleanType),
      StructField("family", StringType)))))))

  /** Parse a mapping JSON doc via `from_json` (FAILFAST: malformed docs
    * throw instead of nulling out). */
  def parse(spark: SparkSession, json: String): TableMapping = {
    import spark.implicits._
    val row = Seq(json).toDF("j")
      .select(from_json($"j", mappingSchema, Map("mode" -> "FAILFAST")).as("m"))
      .select($"m.*")
      .first()
    val cols = row.getSeq[org.apache.spark.sql.Row](6).map { c =>
      ColMapping(c.getString(0), c.getString(1), c.getString(2), c.getString(3),
        c.getBoolean(4), Option(c.getString(5)).getOrElse("cf"))
    }
    TableMapping(row.getString(0), row.getString(1), row.getString(2),
      row.getString(3), row.getString(4), row.getString(5), cols)
  }

  /** Serialize via `to_json` — the inverse of [[parse]]. */
  def toJson(spark: SparkSession, m: TableMapping): String = {
    import spark.implicits._
    Seq(m).toDS().select(to_json(struct(col("*")))).first().getString(0)
  }

  /** Structural validation (the reference validates on `add`,
    * `HBaseTableUtils.scala:43-64`): at least one column, at least one PK,
    * and every declared sink type must equal the compat mapping of the
    * source type. */
  def validate(m: TableMapping): Unit = {
    require(m.cols.nonEmpty, s"${m.qualifiedName}: mapping has no columns")
    require(m.cols.exists(_.isPrimaryKey), s"${m.qualifiedName}: mapping has no primary key")
    m.cols.foreach { c =>
      val expected = TypeMapper.compat(c.dbColumnType).toString
      require(expected == c.hbaseColumnType,
        s"${m.qualifiedName}.${c.dbColumnName}: declared type ${c.hbaseColumnType} " +
          s"but '${c.dbColumnType}' maps to $expected")
    }
  }

  /** Spark-side schema of a mapping (sink column names + compat types). */
  def structType(m: TableMapping): StructType =
    StructType(m.cols.map(c =>
      StructField(c.hbaseColumnName, TypeMapper.compat(c.dbColumnType),
        nullable = !c.isPrimaryKey)))
}
