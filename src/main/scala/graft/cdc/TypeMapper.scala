package graft.cdc

import org.apache.spark.sql.types._

/** MySQL → Spark type mapping (SURVEY.md §1.2).
  *
  * Two modes:
  *  - [[compat]] reproduces the reference's regex table
  *    (`HbaseTableInfo.scala:158-182`): narrow lattice, `StringType` catch-all.
  *  - [[full]] maps to the full Spark lattice (`DecimalType(p,s)`, `DateType`,
  *    `TimestampType`, `BinaryType`, unsigned-bigint-safe `DecimalType(20,0)`),
  *    which is what a 100 TB lake actually wants: no stringly-typed decimals.
  */
object TypeMapper {

  /** Port of the reference's *intended* mapping table (not its code, and
    * deliberately not its regex-order bugs: the reference's `int.*` case
    * precedes `integer.*unsigned` so 'integer unsigned' lands on IntegerType,
    * and its `r"bit(1)"` pattern — paren is a capture group — never matches
    * the literal 'bit(1)'. We implement the documented table; ordered
    * first-match rules over the lower-cased MySQL type string. */
  def compat(mysqlType: String): DataType = {
    val t = mysqlType.trim.toLowerCase
    if (t == "bit(1)" || t == "bool" || t == "boolean") BooleanType
    else if (t.startsWith("bit(")) StringType
    else if (t.startsWith("integer unsigned")) LongType
    else if (t.startsWith("bigint")) LongType
    else if (t.startsWith("tinyint") || t.startsWith("smallint") ||
      t.startsWith("mediumint") || t.startsWith("int")) IntegerType
    else if (t.startsWith("float")) FloatType
    else if (t.startsWith("double")) DoubleType
    else StringType
  }

  private val BitRe = """bit\((\d+)\)""".r
  private val DecimalRe = """decimal\((\d+)\s*,\s*(\d+)\).*""".r
  private val DecimalNoScaleRe = """decimal\((\d+)\).*""".r

  /** Full-fidelity mapping for the modern engine. */
  def full(mysqlType: String): DataType = {
    val t = mysqlType.trim.toLowerCase
    t match {
      case "bit(1)" | "bool" | "boolean"        => BooleanType
      case BitRe(n) if n.toInt > 63             => DecimalType(20, 0) // bit(64) overflows signed long
      case _ if t.startsWith("bit(")            => LongType // bit(2..63)
      case _ if t.startsWith("tinyint unsig")   => ShortType // 0..255 overflows signed byte
      case _ if t.startsWith("tinyint")         => ByteType
      case _ if t.startsWith("smallint unsig")  => IntegerType
      case _ if t.startsWith("smallint")        => ShortType
      case _ if t.startsWith("mediumint")       => IntegerType
      case _ if t.startsWith("integer unsig") ||
                t.startsWith("int unsig")       => LongType
      case _ if t.startsWith("bigint unsig")    => DecimalType(20, 0) // full u64 range
      case _ if t.startsWith("bigint")          => LongType
      case _ if t.startsWith("int") ||
                t.startsWith("integer")         => IntegerType
      case _ if t.startsWith("float")           => FloatType
      case _ if t.startsWith("double") ||
                t.startsWith("real")            => DoubleType
      case DecimalRe(p, s)                      => DecimalType(p.toInt, s.toInt)
      case DecimalNoScaleRe(p)                  => DecimalType(p.toInt, 0)
      case "date"                               => DateType
      case _ if t.startsWith("datetime") ||
                t.startsWith("timestamp")       => TimestampType
      case "year"                               => IntegerType
      case _ if t.contains("blob") ||
                t.startsWith("binary") ||
                t.startsWith("varbinary")       => BinaryType
      case _                                    => StringType // char/text/enum/set/json/time/…
    }
  }

  /** Enum ordinal → label. MySQL enum ordinals are 1-based; 0 is the
    * invalid/empty sentinel and NULL-encodes (reference:
    * `MongoDBApplier.scala:100-104`, CHANGELOG #9 AIOOBE regression). */
  def decodeEnum(ordinal: Int, labels: IndexedSeq[String]): Option[String] =
    if (ordinal <= 0 || ordinal > labels.size) None else Some(labels(ordinal - 1))
}
