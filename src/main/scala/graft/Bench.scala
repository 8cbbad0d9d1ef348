package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warmup so the first timed query isn't charged for it
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    // a failing query must surface in the JSON, not time as a fast no-op —
    // the bench keeps running (one broken query must not void the round's
    // numbers) but the error is named in an "errors" field
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        // ops that persist their result (LSH pair frames) must not feed a
        // later run from cache, and a prior query's cache must not skew
        // this one — every run starts cache-clean
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // noop sink forces evaluation of EVERY output column — .count()
        // would let Catalyst prune projection-only compute to nothing
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // one warmup (plan compile + JIT + page cache) then median-of-3 so a
      // single noisy run can't swing the per-query signal ±20%
      once()
      val timed = Seq(once(), once(), once()).sorted
      name -> timed(1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errJson = errors.map { case (k, v) =>
      s"\"" + k + "\":\"" + v.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_errors":${errors.size},"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
