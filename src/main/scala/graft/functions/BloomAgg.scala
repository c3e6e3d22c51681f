package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.seen.BloomFilter

/** Catalyst-native Bloom-filter build: `TypedImperativeAggregate` with the
  * filter itself as the aggregation buffer — the idiomatic home for the
  * URL-seen build (SURVEY.md §4 "a custom TypedImperativeAggregate is the
  * idiomatic home for the partitioned Bloom-filter build"). Runs as a
  * regular two-phase aggregate (partial filters built where the data is,
  * merged by OR), so it composes with any DataFrame plan — e.g. one filter
  * per key-range via groupBy(bucket).agg(bloom_agg(key)).
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.sized(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter =
    buffer.mergeInPlace(other)

  override def eval(buffer: BloomFilter): Any = buffer.toBytes

  override def serialize(buffer: BloomFilter): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_bloom"
}

object BloomAgg {

  /** Register `graft_bloom(key [, expectedItems, fpp])` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_bloom",
      exprs => {
        def num(e: Expression): Double = e.eval() match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
          case other => other.toString.toDouble
        }
        val n = exprs.lift(1).map(e => num(e).toLong).getOrElse(1000000L)
        val f = exprs.lift(2).map(num).getOrElse(0.01)
        BloomAgg(exprs.head, n, f).toAggregateExpression()
      }, "scala_udf")

  /** Build one Bloom filter over a column of `df` via the Catalyst
    * aggregate (partial filters built on executors, OR-merged). */
  def buildFilter(df: DataFrame, column: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter = {
    register(df.sparkSession)
    val bytes = df
      .selectExpr(s"graft_bloom(cast(`$column` AS string), ${expectedItems}L, $fpp) AS bloom")
      .collect().head.getAs[Array[Byte]]("bloom")
    BloomFilter.fromBytes(bytes)
  }
}
