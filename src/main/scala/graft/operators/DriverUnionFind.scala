package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Driver-side union-find over a BOUNDED edge list — the shared kernel
  * behind the small-graph shortcuts in [[Dedup.connectedComponents]],
  * [[Graph.connectedComponents]] and `Similarity.dbscanLabels`.
  *
  * Scale-safety shape (r17): node ids are remapped through ONE sorted
  * primitive long array (binary search), parents live in an Int array,
  * and find uses path halving — ~16 bytes/node total instead of the
  * ~100 bytes/entry a boxed `mutable.Map[Long, Long]` costs, so the
  * 1M-edge ceiling is ~30 MB of driver heap, not ~0.5 GB, and the
  * allocation count is O(1) instead of O(E) boxed tuples. Roots are
  * always the component's MIN node id: ids are sorted, so index order
  * == id order, and every union links the larger root under the
  * smaller.
  */
private[operators] object DriverUnionFind {

  /** Distinct node ids, sorted ascending, from the flattened pair list. */
  def sortedIds(pairs: Array[(Long, Long)]): Array[Long] = {
    val all = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      all(2 * i) = pairs(i)._1
      all(2 * i + 1) = pairs(i)._2
      i += 1
    }
    java.util.Arrays.sort(all)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || all(n - 1) != all(i)) { all(n) = all(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(all, n)
  }

  /** Index of id `x` in the sorted id array (ids always contain x here). */
  @inline def indexOf(ids: Array[Long], x: Long): Int =
    java.util.Arrays.binarySearch(ids, x)

  /** Union every pair whose BOTH endpoints satisfy `keep` (by index);
    * returns the fully-compressed parent array: `parent(i)` IS the root
    * index of node `ids(i)`, and `ids(parent(i))` is the component's min
    * member id among kept nodes (an un-kept node stays its own root). */
  def unionAll(ids: Array[Long], pairs: Array[(Long, Long)],
      keep: Int => Boolean = _ => true): Array[Int] = {
    val parent = Array.tabulate(ids.length)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    var i = 0
    while (i < pairs.length) {
      val a = indexOf(ids, pairs(i)._1)
      val b = indexOf(ids, pairs(i)._2)
      if (keep(a) && keep(b)) {
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      i += 1
    }
    i = 0
    while (i < parent.length) { parent(i) = find(i); i += 1 }
    parent
  }

  /** Lift driver-computed label rows into a Dataset WITHOUT embedding a
    * giant LocalRelation in the plan: up to `localRelationMax` rows stay
    * a LocalRelation (constant-folds, broadcasts, and keeps the
    * LocalTableScan plan shape the small case wants); above it the rows
    * ship through an RDD (`ExternalRDD` scan) so the analyzer/optimizer
    * never walk a multi-million-row literal and the driver never pays a
    * second copy inside the plan tree. */
  def datasetOf[T: Encoder: scala.reflect.ClassTag](
      spark: SparkSession, rows: Seq[T],
      localRelationMax: Int = 10000): Dataset[T] =
    if (rows.length <= localRelationMax) spark.createDataset(rows)
    else {
      val slices = math.max(1, math.min(
        spark.sparkContext.defaultParallelism, rows.length / 100000 + 1))
      spark.createDataset(spark.sparkContext.parallelize(rows, slices))
    }

  /** The clamped `limit(n)` for "collect at most threshold + 1 rows":
    * `(threshold + 1).toInt` overflows negative for thresholds ≥ 2³¹. */
  @inline def probeLimit(threshold: Long): Int =
    math.min(threshold + 1L, Int.MaxValue.toLong).toInt
}
