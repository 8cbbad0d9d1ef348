package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
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

  /** Bottom-k uniform row SAMPLE keyed by a hash — the KMV idea pointed
    * at QUANTILES: keep the (hash, value) pairs whose hashes are the k
    * smallest over a UNIQUE row key. The held values are a uniform
    * without-replacement sample of k rows that is ORDER-INDEPENDENT and
    * MERGEABLE (union, trim to k smallest) — properties classic
    * reservoir sampling lacks (encounter-order-dependent) and t-digest
    * trades away (merge-order-dependent centroids). Bounded at k
    * (hash, value) pairs per group with map-side partials, so a
    * 100 TB group ships k·16 bytes per executor instead of a sort;
    * quantile estimates read off the sorted sample with the usual
    * √k-class sampling error. Deterministic given the data → the whole
    * report is hash-checkable against a SQL oracle. */
  case class BottomKPairs(
      hashChild: Expression, valueChild: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
    with BinaryLike[Expression] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def left: Expression = hashChild
    override def right: Expression = valueChild

    override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
      new java.util.TreeMap[java.lang.Long, java.lang.Double]()

    override def update(
        buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
        input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
      val h = hashChild.eval(input)
      val v = valueChild.eval(input)
      if (h != null && v != null) {
        buf.put(h.asInstanceOf[Long], v.asInstanceOf[Double])
        if (buf.size > k) buf.pollLastEntry()
      }
      buf
    }

    override def merge(
        b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
        b2: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
      val it = b2.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b1.put(e.getKey, e.getValue)
        if (b1.size > k) b1.pollLastEntry()
      }
      b1
    }

    /** The sampled VALUES, ordered by their hash (ascending). */
    override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
      val out = new Array[Any](buf.size)
      val it = buf.values().iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.getKey).putDouble(e.getValue)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
      val buf = createAggregationBuffer()
      val bb = java.nio.ByteBuffer.wrap(bytes)
      while (bb.hasRemaining) buf.put(bb.getLong(), bb.getDouble())
      buf
    }

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): BottomKPairs =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomKPairs =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BottomKPairs =
      copy(hashChild = l, valueChild = r)
    override def prettyName: String = "bottom_k_pairs"
  }

  /** Column API: uniform hash-sample of up to k `value`s, keyed by a
    * LONG hash of a unique row key (aggregate — use inside `agg`). */
  def bottomKSampleValues(hash: Column, value: Column, k: Int): Column =
    ExpressionUtils.column(
      BottomKPairs(
        ExpressionUtils.expression(hash),
        ExpressionUtils.expression(value.cast("double")), k).toAggregateExpression())

  /** Bounded-memory per-group quantiles from the bottom-k hash sample:
    * `(groupCols…, n_sample, p<q·100>…)`. Below saturation (group ≤ k
    * rows) the sample IS the group and the quantiles are exact; above,
    * they carry √k-class sampling error. The rank rule is
    * `ceil(q · n)` over the value-sorted sample (1-based) — mirrored
    * verbatim in the oracle. */
  def sampledQuantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      keyCol: String, k: Int, qs: Seq[Double]): DataFrame = {
    val base = df
      .groupBy(groupCols.map(col): _*)
      .agg(bottomKSampleValues(md5Hash60(col(keyCol)), col(valueCol), k).as("sample"))
      .withColumn("__vals", array_sort(col("sample")))
      .withColumn("n_sample", size(col("sample")).cast("long"))
    val qCols = qs.map { q =>
      when(col("n_sample") > 0,
        element_at(col("__vals"),
          greatest(lit(1), ceil(lit(q) * col("n_sample"))).cast("int")))
        .as(s"p${math.round(q * 100)}")
    }
    base.select(groupCols.map(col) ++ (col("n_sample") +: qCols): _*)
  }

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

  /** Pairwise corpus-overlap estimates from bounded KMV sketches —
    * sketch ALGEBRA (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD 2007): the Jaccard
    * of two corpora is estimated from their k-min-hash sketches alone,
    * so cross-corpus overlap costs O(k) per corpus and NO cross-corpus
    * join — at 100 TB the per-corpus sketches are tiny standing
    * artifacts and every pair comparison is driver-side set arithmetic.
    * Estimator: with `U` = the k smallest of `sketch(A) ∪ sketch(B)`
    * (the valid KMV sketch of A∪B), `est_jaccard` =
    * `|U ∩ A_k ∩ B_k| / |U|` — exact integers, ONE final IEEE division
    * per pair, so the whole report is oracle-checkable. One row per
    * unordered group pair, groups in lexicographic order. The collect is
    * bounded: one k-array per GROUP (corpus/source), not per row. */
  def kmvPairwiseOverlap(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketches = df
      .groupBy(col(groupCol))
      .agg(kmvMinHashes(md5Hash60(col(valueCol)), k).as("mins"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ga, ka) = sketches(i)
      val (gb, kb) = sketches(j)
      val setA = ka.toSet
      val setB = kb.toSet
      val unionHeld = (setA ++ setB).toArray.sorted.take(k)
      val shared = unionHeld.count(h => setA.contains(h) && setB.contains(h))
      (ga, gb, unionHeld.length.toLong, shared.toLong,
        shared.toDouble / unionHeld.length)
    }
    rows.toDF(s"${groupCol}_a", s"${groupCol}_b",
      "n_union_held", "est_shared", "est_jaccard")
  }

  /** Misra-Gries heavy-hitters summary (Misra & Gries 1982; merge rule
    * from Agarwal et al., "Mergeable Summaries", PODS 2012) — the
    * bounded-memory answer to "top frequent tokens" that an exact
    * GROUP BY can't give at 100 TB without shuffling the full key set.
    * State is ≤ `capacity` (token, count) pairs per group regardless of
    * stream length; merge sums the maps and, when over capacity,
    * subtracts the (capacity+1)-th largest count from every entry and
    * drops the non-positive — the classic error-preserving trim. Held
    * counts are LOWER bounds with error ≤ n/(capacity+1); when the
    * distinct key count never exceeds capacity the summary is EXACT
    * (what the declared t23 query exploits for its oracle). */
  case class MisraGries(
      child: Expression, capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    private type Buf = java.util.HashMap[String, java.lang.Long]

    override def createAggregationBuffer(): Buf = new java.util.HashMap()

    /** Subtract the (capacity+1)-th largest count from all entries and
      * drop the non-positive, leaving ≤ capacity entries. */
    private def trim(buf: Buf): Buf = {
      if (buf.size() <= capacity) return buf
      val counts = new Array[Long](buf.size())
      val it0 = buf.values().iterator()
      var i = 0
      while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // (capacity+1)-th largest = index size-capacity-1 in ascending order
      val dec = counts(buf.size() - capacity - 1)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue - dec
        if (c <= 0) it.remove() else e.setValue(c)
      }
      buf
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.toString
        val cur = buf.get(key)
        if (cur != null) buf.put(key, cur + 1L)
        else {
          buf.put(key, 1L)
          trim(buf)
        }
      }
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val it = b2.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = b1.get(e.getKey)
        b1.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
      }
      trim(b1)
    }

    /** Array of (token, count) structs, count desc then token asc — a
      * deterministic order whatever the hash-map iteration did. */
    override def eval(buf: Buf): Any = {
      val entries = new Array[(String, Long)](buf.size())
      val it = buf.entrySet().iterator()
      var i = 0
      while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
      val sorted = entries.sortBy { case (t, c) => (-c, t) }
      new GenericArrayData(sorted.map { case (t, c) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t), c)
      }: Array[Any])
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeUTF(e.getKey)
        out.writeLong(e.getValue)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("token", StringType, nullable = false),
        StructField("count", LongType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MisraGries =
      copy(child = c)
    override def prettyName: String = "misra_gries"
  }

  /** Column API: Misra-Gries heavy-hitters summary of a string column
    * (aggregate — use inside `agg`): array of (token, count) structs,
    * count desc. */
  def misraGries(value: Column, capacity: Int): Column =
    ExpressionUtils.column(
      MisraGries(ExpressionUtils.expression(value), capacity).toAggregateExpression())

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — the point-query
    * frequency table in O(d·w) space: counter[r][h_r(x)] += 1 per row,
    * estimate(x) = min_r counter[r][h_r(x)], an OVERESTIMATE with error
    * ≤ e·n/w at confidence 1−e^−d. Complements [[MisraGries]] (which
    * keeps only the heavy entries): CM answers frequency queries for ANY
    * key after the fact, which is what repetition-aware samplers and
    * per-token frequency features want.
    *
    * The child is the row's PRE-HASHED position vector (d longs in
    * [0,w), from [[cmPositions]]' md5-salted family) — hashing stays
    * scan-side and engine-reproducible, the aggregate is pure integer
    * vector adds. State is a fixed d·w long array per group: map-side
    * partials ship one bounded vector per executor instead of a
    * token-keyed shuffle, and merge is elementwise add — at 100 TB the
    * frequency table costs one aggregation of constant-size state. */
  case class CountMinCounters(
      child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
    require(depth >= 1 && width >= 1, s"bad CM shape: $depth x $width")

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(arr.numElements() >= depth,
          s"count_min_counters: position vector has ${arr.numElements()} " +
            s"elements, expected >= depth=$depth (width=$width) — " +
            "cmPositions(depth, width) must match the aggregate's shape")
        var r = 0
        while (r < depth) {
          val pos = arr.getLong(r)
          require(pos >= 0L && pos < width,
            s"count_min_counters: position $pos out of [0, $width) at row " +
              s"$r — cmPositions width must match the aggregate's width=$width")
          buf(r * width + pos.toInt) += 1L
          r += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any =
      new GenericArrayData(buf.clone())

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      bb.asLongBuffer().put(buf)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val buf = new Array[Long](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): CountMinCounters =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinCounters =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CountMinCounters =
      copy(child = c)
    override def prettyName: String = "count_min_counters"
  }

  /** The CM hash family as a scan-side position vector: row r's position
    * is the md5 of `"r#" || value`'s first 60 bits mod `width` — the
    * salted-md5 construction every sketch in this file uses, replayable
    * verbatim in the SQL oracle. */
  def cmPositions(value: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      md5Hash60(concat(lit(s"$r#"), value.cast("string"))) % width.toLong
    }: _*)

  /** Column API: build the flattened row-major d×w Count-Min counter
    * array over [[cmPositions]] vectors (aggregate — use inside `agg`). */
  def countMinCounters(positions: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinCounters(ExpressionUtils.expression(positions), depth, width)
        .toAggregateExpression())

  /** Point-query estimate against a built sketch column: min over the d
    * rows of the counter at this value's position (1-based element_at
    * into the flattened array). */
  def cmEstimate(sketch: Column, value: Column, depth: Int, width: Int): Column = {
    val pos = cmPositions(value, depth, width)
    (0 until depth).map { r =>
      element_at(sketch,
        (lit(r.toLong * width) + element_at(pos, r + 1) + lit(1L)).cast("int"))
    }.reduce(least(_, _))
  }

  /** Heavy hitters per group: explode the per-group summary to
    * `(groupCols…, token, count_lb, rnk)`, top `k` by the summary's
    * lower-bound counts. Exact when the per-group vocabulary fits
    * `capacity`. */
  def heavyHitters(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      capacity: Int, k: Int): DataFrame =
    df
      .groupBy(groupCols.map(col): _*)
      .agg(misraGries(col(valueCol), capacity).as("hh"))
      .select(groupCols.map(col) :+ posexplode(col("hh")): _*)
      .filter(col("pos") < k)
      .select(groupCols.map(col) ++ Seq(
        col("col.token").as("token"),
        col("col.count").as("count_lb"),
        (col("pos") + 1).cast("int").as("rnk")): _*)

  /** HyperLogLog registers over a 60-bit hash (Flajolet et al. 2007) —
    * the FIXED-SIZE cousin of KMV: state is `m = 2^p` one-byte
    * registers (64 B at p=6) regardless of cardinality, merge is
    * elementwise max (commutative, idempotent — re-merging a sketch is
    * harmless, which KMV's union-and-trim also has but counters don't).
    * Register j holds the max over hashes landing in bucket
    * `h & (m−1)` of the leading-zero rank of the remaining
    * `60−p` bits — every step integer-exact, so the register ARRAY
    * (not just an estimate) is oracle-reproducible. */
  case class HllRegisters(
      child: Expression, p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {
    require(p >= 2 && p <= 16, s"p must be in [2,16], got $p")
    private val m = 1 << p
    private val restBits = 60 - p // child hashes live in [0, 2^60)

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        val bucket = (h & (m - 1)).toInt
        val rest = h >>> p
        val rho =
          if (rest == 0L) restBits + 1
          else restBits - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
        if (rho > buf(bucket)) buf(bucket) = rho.toByte
      }
      buf
    }

    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

    /** The m registers as longs, bucket order. */
    override def eval(buf: Array[Byte]): Any = {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = buf(i).toLong; i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllRegisters =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): HllRegisters =
      copy(child = c)
    override def prettyName: String = "hll_registers"
  }

  /** Column API: HLL register array (length 2^p) of a LONG hash column
    * (aggregate — use inside `agg`). */
  def hllRegisters(hash: Column, p: Int): Column =
    ExpressionUtils.column(
      HllRegisters(ExpressionUtils.expression(hash), p).toAggregateExpression())

  /** α₆₄ (bias constant for m = 64): 0.7213/(1 + 1.079/64) ≈ 0.709. */
  private val Alpha64 = 0.709

  /** HLL distinct-count report per group at p = 6 (64 registers, ~13%
    * standard error): `(groupCols…, n_nonzero, s_scaled, hll_estimate)`.
    * The harmonic sum Σ 2^−r is kept EXACT by scaling to the integer
    * `s_scaled = Σ 2^(55−r)` (max 64·2^55 < 2^63 — no overflow, no
    * float-order dependence), so the estimate
    * `α·m²·2^55 / s_scaled` costs ONE IEEE division after exact-integer
    * and power-of-two-exact constant folding — the whole report
    * hash-matches a SQL oracle. Production estimators layer linear
    * counting below 2.5m via [[hllEstimate]] (log — accurate, not
    * bitwise-portable). */
  def hllDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val regs = df
      .groupBy(groupCols.map(col): _*)
      .agg(hllRegisters(md5Hash60(col(valueCol)), 6).as("regs"))
    regs
      .withColumn("n_nonzero",
        expr("size(filter(regs, x -> x > 0))").cast("long"))
      .withColumn("s_scaled",
        expr("aggregate(regs, CAST(0 AS BIGINT), " +
          "(acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), CAST(55 - x AS INT)))"))
      .withColumn("hll_estimate",
        lit(Alpha64) * lit(4096.0) * lit(36028797018963968.0) /
          col("s_scaled").cast("double"))
      .select(groupCols.map(col) ++ Seq(
        col("n_nonzero"), col("s_scaled"), col("hll_estimate")): _*)
  }

  /** Bias-corrected HLL estimate with the small-range linear-counting
    * branch (`m·ln(m/V)` when the raw estimate ≤ 2.5m and empty
    * registers remain) — the estimator to USE; numerically accurate but
    * not bitwise-oracle-portable (ln), hence split from
    * [[hllDistinct]]'s raw report. */
  def hllEstimate(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllDistinct(df, groupCols, valueCol)
      .withColumn("n_zero", lit(64L) - col("n_nonzero"))
      .withColumn("estimate",
        when(col("hll_estimate") <= 2.5 * 64 && col("n_zero") > 0,
          lit(64.0) * log(lit(64.0) / col("n_zero").cast("double")))
          .otherwise(col("hll_estimate")))
      .drop("n_zero")
}
