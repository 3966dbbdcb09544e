package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc isolated query timer: `Test/runMain graft.IsoTimeMain <q> [n]`. */
object IsoTimeMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("minhash_neardup")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("iso").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
