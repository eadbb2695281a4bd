package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 function surface (Iceberg's `SparkFunctions` shape):
  * `bucket(n, col)` resolvable by SPARK ITSELF through the catalog's
  * FunctionCatalog, which is what makes the bucket transform a first-class
  * SQL citizen — (a) a bucket-partitioned write can declare its
  * distribution/ordering AS the bucket transform (Spark resolves the
  * transform expression to this function and shuffles/sorts by it), and
  * (b) two bucket-partitioned scans report compatible
  * `KeyGroupedPartitioning(bucket(n, col))`s and storage-partition-join
  * with ZERO exchange. The hash is the repo-standard md5 bucket (first 8
  * hex nibbles as a long, mod n) over the CAST-AS-STRING form of the key —
  * bit-identical to [[graft.spark.BucketTransform.literal]], the writer's
  * value-rolling pin, and the DuckDB oracle's nibble replay.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): md5-derived hash bucket in [0, n) over the string form of col"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket needs (n, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: n must be INT, got ${inputType.fields(0).dataType.simpleString}")
    val keyType = inputType.fields(1).dataType
    require(Set[DataType](StringType, LongType, IntegerType)(keyType),
      s"bucket: unsupported key type ${keyType.simpleString} (string/bigint/int)")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      // canonical identity is (function, key type) — what SPJ compares
      // across the two sides of a join
      override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        // a NULL key maps to bucket 0 here so the shuffle never NPEs; the
        // value-rolling WRITER is the load-bearing null gate (refuses with
        // the named-column error before anything commits)
        if (input.isNullAt(1)) return Integer.valueOf(0)
        val raw = keyType match {
          case StringType => input.getUTF8String(1).toString
          case LongType => input.getLong(1).toString
          case IntegerType => input.getInt(1).toString
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        Integer.valueOf(graft.spark.BucketTransform(n, "k").literal(raw).toInt)
      }
    }
  }
}
