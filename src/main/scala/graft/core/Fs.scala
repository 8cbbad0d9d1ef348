package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem probes through the Hadoop FileSystem API — java.io.File only
  * sees the local disk, which would make ledgers/catalogs on hdfs:// or
  * s3a:// read as empty (silently re-ingesting the world). Every path
  * check in the engine goes through here.
  */
object Fs {
  private def fs(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** Recursive delete of a directory (month-partition cleanup). */
  def deleteDir(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p) && f.delete(p, true)
  }

  /** Immediate child directory names. */
  def listDirNames(spark: SparkSession, path: String): Seq[String] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Does the tree under `path` contain any parquet data file? (An
    * all-empty-table write leaves only _SUCCESS.) */
  def hasParquetFiles(spark: SparkSession, path: String): Boolean = {
    var found = false
    walkDataFiles(spark, path) { _ => found = true; false }
    found
  }

  /** (count, total bytes) of committed parquet data files under `path` —
    * the compaction planner's small-file probe. */
  def dataFileStats(spark: SparkSession, path: String): (Int, Long) = {
    var n = 0
    var bytes = 0L
    walkDataFiles(spark, path) { st => n += 1; bytes += st.getLen; true }
    (n, bytes)
  }

  /** Walk committed parquet data files under `path`, invoking `visit` per
    * file until it returns false. Skips uncommitted staging output
    * (_temporary, .spark-staging-*): Spark's own file index ignores
    * '_'/'.'-prefixed path components BELOW the table root. The root is
    * qualified and the ancestor walk stops at PATH equality — a
    * string-length comparison against the unqualified input walks past
    * (or includes) the table root when listings come back fully
    * qualified, so a '_'/'.'-prefixed component in the root's own name
    * or its ancestors would mark every file uncommitted. */
  private def walkDataFiles(spark: SparkSession, path: String)(
      visit: org.apache.hadoop.fs.FileStatus => Boolean): Unit = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) return
    val root = f.makeQualified(p)
    val it = f.listFiles(root, true)
    var continue = true
    while (continue && it.hasNext) {
      val st = it.next()
      val fp = st.getPath
      val committed = Iterator.iterate(fp)(_.getParent)
        .takeWhile(q => q != null && q != root)
        .forall(q => !q.getName.startsWith("_") && !q.getName.startsWith("."))
      val isData = fp.getName.endsWith(".parquet") && !fp.getName.startsWith(".")
      if (committed && isData) continue = visit(st)
    }
  }

  /** Rename `src` → `dst`, creating dst's parent first (HDFS rename does
    * not mkdir). A same-filesystem directory rename is the one atomic
    * primitive parquet storage offers — the compaction swap is built on
    * it. Returns false if src is missing or the filesystem refuses. */
  def rename(spark: SparkSession, src: String, dst: String): Boolean = {
    val (f, s) = fs(spark, src)
    val d = new Path(dst)
    if (!f.exists(s)) return false
    val parent = d.getParent
    if (parent != null && !f.exists(parent)) f.mkdirs(parent)
    f.rename(s, d)
  }
}
