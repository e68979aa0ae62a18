package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The lake's CANONICAL bucket function, exposed through the catalog's
  * `FunctionCatalog` so Spark's STORAGE-PARTITIONED JOIN machinery can
  * recognize that two manifest tables share a layout: the connector
  * reports `KeyGroupedPartitioning(bucket(n, key...))`, the analyzer
  * resolves `bucket` here, and `EnsureRequirements` then matches the two
  * sides by the function's `canonicalName` + bucket count + join keys —
  * a lake⋈lake join on the bucket key plans with ZERO shuffle (each
  * task reads both sides' files of one bucket), the Iceberg SPJ model.
  *
  * `produceResult` evaluates the EXACT write-path assignment —
  * `pmod(xxhash64(components..., seed 42), n)` — so the optional
  * one-side-shuffle / partition-value-filling modes
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled` etc.), which DO
  * evaluate the function, route rows to the same buckets the files hold. */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "graft-manifest bucket assignment: pmod(xxhash64(key...), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket(numBuckets, key...) needs at least 2 arguments, got ${inputType.length}")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is the bucket count (int), got ${inputType.fields.head.dataType}")
    new Bound(inputType)
  }

  private final class Bound(inputType: StructType)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // the identity EnsureRequirements compares across the join's two
    // sides — both scans' partitionings must name the same function
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false

    @transient private lazy val hash = new XxHash64(
      inputType.fields.toSeq.zipWithIndex.drop(1).map { case (f, i) =>
        BoundReference(i, f.dataType, nullable = true)
      }, 42L)

    override def produceResult(input: InternalRow): java.lang.Integer = {
      val n = input.getInt(0)
      val h = hash.eval(input).asInstanceOf[Long]
      (((h % n) + n) % n).toInt
    }
  }
}
