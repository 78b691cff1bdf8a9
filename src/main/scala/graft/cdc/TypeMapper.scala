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
  // decimal / numeric / dec are synonymous MySQL spellings; bare forms
  // (no parens) default to DECIMAL(10,0)
  private val DecimalRe = """(?:decimal|numeric|dec)\((\d+)\s*,\s*(\d+)\).*""".r
  private val DecimalNoScaleRe = """(?:decimal|numeric|dec)\((\d+)\).*""".r

  /** Full-fidelity mapping for the modern engine. Integer display widths —
    * `tinyint(3) unsigned` — are presentation-only in MySQL and are stripped
    * before matching, so the unsigned widening applies regardless of
    * spelling (bit/decimal keep their parens: handled first). */
  def full(mysqlType: String): DataType = {
    val t = mysqlType.trim.toLowerCase
    t match {
      case "bit(1)" | "bool" | "boolean"        => BooleanType
      case BitRe(n) if n.toInt > 63             => DecimalType(20, 0) // bit(64) overflows signed long
      case _ if t.startsWith("bit(") || t == "bit" => LongType // bit(2..63)
      case DecimalRe(p, s)                      => DecimalType(p.toInt, s.toInt)
      case DecimalNoScaleRe(p)                  => DecimalType(p.toInt, 0)
      case _ =>
        val base = t.replaceFirst("""\(\d+\)""", "")
        val unsigned = base.contains("unsign")
        base match {
          case _ if base.startsWith("decimal") ||
                    base.startsWith("numeric") ||
                    base == "dec" || base.startsWith("dec ") =>
            DecimalType(10, 0) // bare spelling: MySQL's default precision
          case _ if base.startsWith("tinyint")   => if (unsigned) ShortType else ByteType
          case _ if base.startsWith("smallint")  => if (unsigned) IntegerType else ShortType
          case _ if base.startsWith("mediumint") => IntegerType // u24 still fits int
          case _ if base.startsWith("bigint")    =>
            if (unsigned) DecimalType(20, 0) else LongType // full u64 range
          case _ if base.startsWith("int") ||
                    base.startsWith("integer")   => if (unsigned) LongType else IntegerType
          case _ if base.startsWith("float")     => FloatType
          case _ if base.startsWith("double") ||
                    base.startsWith("real")      => DoubleType
          case "date"                            => DateType
          case _ if base.startsWith("datetime") ||
                    base.startsWith("timestamp") => TimestampType
          case "year"                            => IntegerType
          case _ if base.contains("blob") ||
                    base.startsWith("binary") ||
                    base.startsWith("varbinary") => BinaryType
          case _                                 => StringType // char/text/enum/set/json/time/…
        }
    }
  }

  /** Enum ordinal → label. MySQL enum ordinals are 1-based; 0 is the
    * invalid/empty sentinel and NULL-encodes (reference:
    * `MongoDBApplier.scala:100-104`, CHANGELOG #9 AIOOBE regression). */
  def decodeEnum(ordinal: Int, labels: IndexedSeq[String]): Option[String] =
    if (ordinal <= 0 || ordinal > labels.size) None else Some(labels(ordinal - 1))
}
