package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * the bottom-k family behind DataSketches' theta sketch). The sketch
  * state is the k SMALLEST DISTINCT hash values seen — bounded at k
  * longs per group no matter how many rows stream through, mergeable by
  * union-and-trim, so Spark runs it as a map-side partial aggregate: at
  * 100 TB each executor ships k longs per group instead of a distinct
  * shuffle of the full key set (the exact-count plan's cost).
  *
  * Estimator: with the hash space normalized to [0,1], the k-th smallest
  * of n distinct uniform draws sits at ≈ k/(n+1), so
  * `n̂ = (k-1) / u_k` (the unbiased variant); below saturation the held
  * count IS the exact distinct count. The declared a9 query feeds it
  * md5-prefix hashes, making every held value — and therefore the
  * estimate's single IEEE division — reproducible in the DuckDB oracle.
  */
object Sketches {

  /** `TypedImperativeAggregate` holding the k smallest distinct longs.
    * Buffer = sorted set capped at k: insert, then trim the largest —
    * O(log k) per row, k longs serialized between partial and final. */
  case class KmvMinHashes(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        buf.add(v.asInstanceOf[Long])
        if (buf.size > k) buf.pollLast()
      }
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) {
        b1.add(it.next())
        if (b1.size > k) b1.pollLast()
      }
      b1
    }

    /** Ascending array of the held hashes (length = min(k, distinct)). */
    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val buf = createAggregationBuffer()
      val bb = java.nio.ByteBuffer.wrap(bytes)
      while (bb.hasRemaining) buf.add(bb.getLong())
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): KmvMinHashes =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvMinHashes =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KmvMinHashes =
      copy(child = c)
    override def prettyName: String = "kmv_min_hashes"
  }

  /** Column API: ascending array of the k smallest distinct values of a
    * LONG hash column (aggregate — use inside `agg`). */
  def kmvMinHashes(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvMinHashes(ExpressionUtils.expression(hash), k).toAggregateExpression())

  /** Oracle-parity hash: first 15 hex digits of md5 as a long ∈
    * [0, 16^15) — DuckDB rebuilds it verbatim as
    * `('0x' || substr(md5(v), 1, 15))::BIGINT`. */
  def md5Hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  private val HashSpace: Double = 1152921504606846976.0 // 16^15 = 2^60, exact

  /** Distinct-count estimate per group: `(groupCols…, n_held, h_k,
    * kmv_estimate)`. `n_held < k` means the sketch saw every distinct
    * value and the estimate is exact; at saturation the estimate is
    * `(k-1) · 16^15 / h_k` — exact integers until ONE final IEEE
    * division, so the whole report hash-matches the SQL oracle. */
  def kmvDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val mins = df
      .groupBy(groupCols.map(col): _*)
      .agg(kmvMinHashes(md5Hash60(col(valueCol)), k).as("mins"))
    mins.select(
      groupCols.map(col) ++ Seq(
        size(col("mins")).cast("long").as("n_held"),
        when(size(col("mins")) === k, element_at(col("mins"), k)).as("h_k"),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(
            lit((k - 1).toDouble * HashSpace) /
              element_at(col("mins"), k).cast("double"))
          .as("kmv_estimate")): _*)
  }
}
