package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md F2 `typezoo`: every row of the reference mapping table
  * (`HbaseTableInfo.scala:163-181`) in compat mode, plus full-mode upgrades. */
class TypeMapperSpec extends AnyFunSuite {

  val compatTable: Seq[(String, DataType)] = Seq(
    "bigint" -> LongType,
    "bit(1)" -> BooleanType,
    "bit(8)" -> StringType,
    "tinyint" -> IntegerType,
    "boolean" -> BooleanType,
    "bool" -> BooleanType,
    "smallint unsigned" -> IntegerType,
    "mediumint" -> IntegerType,
    "int(11)" -> IntegerType,
    "integer unsigned" -> LongType,
    "bigint unsigned" -> LongType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "varchar(255)" -> StringType,
    "decimal(18,4)" -> StringType,
    "datetime" -> StringType,
    "text" -> StringType,
    "enum('pending','verified')" -> StringType)

  test("compat mode reproduces the reference mapping table") {
    compatTable.foreach { case (mysql, expected) =>
      assert(TypeMapper.compat(mysql) == expected, s"for $mysql")
    }
  }

  test("full mode upgrades the catch-alls") {
    assert(TypeMapper.full("decimal(18,4)") == DecimalType(18, 4))
    assert(TypeMapper.full("decimal(10)") == DecimalType(10, 0))
    assert(TypeMapper.full("date") == DateType)
    assert(TypeMapper.full("datetime") == TimestampType)
    assert(TypeMapper.full("timestamp") == TimestampType)
    assert(TypeMapper.full("bigint unsigned") == DecimalType(20, 0))
    assert(TypeMapper.full("mediumblob") == BinaryType)
    assert(TypeMapper.full("varbinary(16)") == BinaryType)
    assert(TypeMapper.full("tinyint") == ByteType)
    assert(TypeMapper.full("tinyint unsigned") == ShortType) // 0..255 overflows ByteType
    assert(TypeMapper.full("smallint") == ShortType)
    assert(TypeMapper.full("bit(8)") == LongType)
    assert(TypeMapper.full("bit(64)") == DecimalType(20, 0)) // u64 bitfield
    // display widths are presentation-only and must not defeat the widening
    assert(TypeMapper.full("tinyint(3) unsigned") == ShortType)
    assert(TypeMapper.full("smallint(5) unsigned") == IntegerType)
    assert(TypeMapper.full("int(10) unsigned") == LongType)
    assert(TypeMapper.full("bigint(20) unsigned") == DecimalType(20, 0))
    assert(TypeMapper.full("int(11)") == IntegerType)
    assert(TypeMapper.full("varchar(10)") == StringType)
    assert(TypeMapper.full("json") == StringType)
    // bare / synonym decimal spellings (legal MySQL, default DECIMAL(10,0))
    assert(TypeMapper.full("decimal") == DecimalType(10, 0))
    assert(TypeMapper.full("numeric") == DecimalType(10, 0))
    assert(TypeMapper.full("dec") == DecimalType(10, 0))
    assert(TypeMapper.full("numeric(12,3)") == DecimalType(12, 3))
    assert(TypeMapper.full("dec(8,2)") == DecimalType(8, 2))
  }

  test("enum decode: 1-based ordinals, 0 encodes NULL (CHANGELOG #9)") {
    val labels = IndexedSeq("pending", "verified")
    assert(TypeMapper.decodeEnum(1, labels).contains("pending"))
    assert(TypeMapper.decodeEnum(2, labels).contains("verified"))
    assert(TypeMapper.decodeEnum(0, labels).isEmpty)
    assert(TypeMapper.decodeEnum(3, labels).isEmpty) // out of range, no AIOOBE
  }
}
