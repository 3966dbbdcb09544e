package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary profiling scratchpad for the optimization round — NOT
  * part of the driver contract; timings via the noop sink (guide
  * §1.4). */
object Scratch {
  def time(label: String)(df: => DataFrame): Unit = {
    val d = df
    d.sparkSession.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    d.write.format("noop").mode("overwrite").save()
    println(f"### $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    d.sparkSession.sparkContext.setJobDescription(null)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.customer(spark, sfDir).select($"c_custkey", $"c_name")
    val probes = base.filter($"c_custkey" % 37 === 5)
      .select((-$"c_custkey").as("c_custkey"),
        concat($"c_name".substr(1, 9), lit("X"),
          $"c_name".substr(lit(11), length($"c_name") - 10)).as("c_name"))
    val df = base.unionByName(probes)

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val neighborhood = graft.operators.FuzzyMatch.deletionVariants($"c_name")
      val vars = df.select($"c_custkey".as("__k"), explode(neighborhood).as("__v"))
        .select($"__k", graft.functions.GraftFunctions.fnv1a($"__v").as("__vh"))
      time("1 vars explode")(vars)
      time("2 vars repartition+agg")(
        vars.repartition($"__vh").groupBy($"__vh")
          .agg(graft.functions.GraftFunctions.bounded_min_set($"__k", 1024).as("s")))
      val pairs = graft.operators.CandidatePairs.fromBuckets(
        vars, Seq("__vh"), "__k", "key_a", "key_b")
      time("3 pairs")(pairs)
      val names = df.select($"c_custkey", $"c_name")
      val full = pairs
        .join(names.select($"c_custkey".as("key_a"), $"c_name".as("name_a")), Seq("key_a"))
        .join(names.select($"c_custkey".as("key_b"), $"c_name".as("name_b")), Seq("key_b"))
        .withColumn("dist", levenshtein($"name_a", $"name_b", 1))
        .filter($"dist" >= 0)
      time("4 full")(full)
      val sel = full.select($"key_a", $"key_b", $"dist".cast("long").as("dist"))
      time("5a orderBy (declared)")(sel.orderBy($"key_a", $"key_b"))
      time("5b repartition(1)+sortWithin")(
        sel.repartition(1).sortWithinPartitions($"key_a", $"key_b"))
      time("5c localCheckpoint+orderBy")(
        sel.localCheckpoint().orderBy($"key_a", $"key_b"))
    }
    spark.stop()
  }
}
