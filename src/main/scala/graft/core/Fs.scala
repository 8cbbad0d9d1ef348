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
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) return false
    // qualify the root and stop the ancestor walk at PATH equality — a
    // string-length comparison against the unqualified input walks past
    // (or includes) the table root when listings come back fully
    // qualified, so a '_'/'.'-prefixed component in the root's own name
    // or its ancestors would mark every file uncommitted
    val root = f.makeQualified(p)
    val it = f.listFiles(root, true)
    while (it.hasNext) {
      val fp = it.next().getPath
      // skip uncommitted staging output (_temporary, .spark-staging-*):
      // Spark's own file index ignores '_'/'.'-prefixed path components
      // BELOW the table root
      val committed = Iterator.iterate(fp)(_.getParent)
        .takeWhile(q => q != null && q != root)
        .forall(q => !q.getName.startsWith("_") && !q.getName.startsWith("."))
      val isData = fp.getName.endsWith(".parquet") && !fp.getName.startsWith(".")
      if (committed && isData) return true
    }
    false
  }
}
