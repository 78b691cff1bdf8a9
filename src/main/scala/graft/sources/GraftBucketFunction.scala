package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

/** The layout's bucket assignment as a Spark V2 catalog FUNCTION — the piece
  * that turns the connector's per-bucket partitions into STORAGE-PARTITIONED
  * JOINS (public design point: Iceberg's `SupportsReportPartitioning` +
  * FunctionCatalog `bucket` function; SPARK-37375). The resolution chain:
  * [[GraftTable.partitioning]] reports `bucket(numBuckets, pkCols...)`;
  * [[GraftBatchScan]] reports a `KeyGroupedPartitioning` over the same
  * transform with one `HasPartitionKey` partition per bucket directory;
  * Spark's `V2ScanPartitioningAndOrdering` rule resolves the transform by
  * loading `bucket` FROM THE TABLE'S CATALOG ([[graft.catalog.GraftCatalog]]
  * `loadFunction`) — which lands here. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, a join of two graft
  * tables with the SAME key types and modulus then shuffles NEITHER side:
  * at 100 TB this is the difference between re-shuffling two fact tables
  * and a zero-exchange co-located merge — the layout already paid the
  * shuffle at write time, every join of the tables reuses it.
  *
  * Correctness hinges on one identity: this function must agree, bit for
  * bit, with the WRITER's bucket assignment (`CdcApplier.bucketExprCols` —
  * `pmod(hash(cols...), n)`, Spark's Murmur3 with seed 42). It therefore
  * computes the same fold over [[Murmur3HashFunction]] — Spark's own
  * interpreted form of the `hash()` expression — rather than any private
  * re-implementation. Two graft tables keyed with DIFFERENT types never
  * co-locate spuriously: Spark inserts a cast on the narrower join key,
  * which stops the raw attribute from matching the transform's child, so
  * SPJ simply declines (falls back to shuffle) instead of joining on
  * incompatible hashes. Range layouts (`rangeBounds`) do not report this
  * transform at all — their assignment is split-point arithmetic, not a
  * hash, and misreporting it as `bucket` would co-locate wrong.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): the graft layout's pmod(murmur3(cols), n) assignment"

  /** Hashable key types — the types the writer's `hash()` accepts AND whose
    * Murmur3 layout this interpreted fold reproduces exactly. Anything else
    * refuses to bind (Spark treats it as "function not available" and keeps
    * the shuffle — never a wrong co-location). */
  private def hashable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Spark binds transforms as (numBuckets literal, key refs...): the rule
    * passes `Literal(numBuckets) +: refs` (V2ExpressionUtils), so the input
    * row at evaluation time carries the modulus in ordinal 0. */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket expects (numBuckets INT, key columns...); got $inputType")
    val keyTypes = inputType.fields.tail.map(_.dataType)
    keyTypes.foreach(t => if (!hashable(t))
      throw new UnsupportedOperationException(
        s"graft bucket: unsupported key type $t"))
    new GraftBucketBound(inputType.fields.map(_.dataType))
  }
}

/** The bound form: `pmod(foldLeft(42)(murmur3), numBuckets)` — byte-for-byte
  * the writer's `pmod(hash(cols...), lit(n))`. `hash()` chains the seed
  * through the columns and truncates to Int; `pmod` maps negatives into
  * [0, n). Deterministic, null-tolerant exactly like the writer (a null
  * column leaves the running seed unchanged — `Murmur3Hash.eval`'s rule). */
class GraftBucketBound(types: Array[DataType]) extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] = types
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    var h = 42L
    var i = 1
    while (i < types.length) {
      if (!input.isNullAt(i)) {
        val v = types(i) match {
          case dt: DecimalType => input.getDecimal(i, dt.precision, dt.scale)
          case dt => input.get(i, dt)
        }
        h = Murmur3HashFunction.hash(v, types(i), h)
      }
      i += 1
    }
    val hi = h.toInt
    ((hi % n) + n) % n
  }
}
