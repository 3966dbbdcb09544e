package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan dumper for iterating on query plan shape:
  * `Test/runMain graft.PlanDumpMain <query> [sfDir]`. Not a spec. */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("line_dedup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    println("== EXCHANGES: " + "Exchange hashpartitioning".r.findAllIn(p).length)
    println("== BROADCAST: " + "BroadcastExchange".r.findAllIn(p).length)
    println(p.take(12000))
    spark.stop()
  }
}
