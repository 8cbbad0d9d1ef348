package graft
// TEMPORARY dev scratch for r16 profiling — deleted before commit.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/lineitem.parquet").limit(1000).count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def run(name: String): Unit = {
      spark.catalog.clearCache()
      val fn = SparkEntry.queries(name)
      fn(spark, d).write.format("noop").mode("overwrite").save() // warmup
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        t(s"$name #$i") {
          fn(spark, d).write.format("noop").mode("overwrite").save()
        }
      }
    }
    val names = Seq("s23_dbscan", "g5_common_neighbors", "t25_curate_funnel",
      "a2_pricing_summary", "j2_integrity_check", "d5_minhash_lsh")
    println("[scratch] ===== parallelismFirst=true (default) =====")
    names.foreach(run)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    println("[scratch] ===== parallelismFirst=false, advisory 64m (default) =====")
    names.foreach(run)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    println("[scratch] ===== parallelismFirst=false, advisory 8m =====")
    names.foreach(run)
    spark.stop()
  }
}
