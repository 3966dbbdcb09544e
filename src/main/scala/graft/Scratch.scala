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

    val base = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text".substr(1, 20).as("k"))
    val probes = base.filter($"doc_id" % 37 === 5)
      .select((-$"doc_id" - 1L).as("doc_id"),
        concat($"k".substr(1, 8), lit("XY"),
          $"k".substr(lit(11), length($"k") - 10)).as("k"))
    val df = base.unionByName(probes)

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val neighborhood = graft.operators.FuzzyMatch.deletionVariants2($"k")
      val vars = df.select($"doc_id".as("__k"), explode(neighborhood).as("__v"))
        .select($"__k", graft.functions.GraftFunctions.fnv1a($"__v").as("__vh"))
      time("1 vars explode+hash")(vars)
      time("2 vars shuffle+boundedset")(
        vars.repartition($"__vh").groupBy($"__vh")
          .agg(graft.functions.GraftFunctions.bounded_min_set($"__k", 1024).as("s")))
      val pairs = graft.operators.CandidatePairs.fromBuckets(
        vars, Seq("__vh"), "__k", "key_a", "key_b")
      time("3 pairs+distinct")(pairs)
      val names = df.select($"doc_id", $"k")
      val full = pairs
        .join(names.select($"doc_id".as("key_a"), $"k".as("name_a")), Seq("key_a"))
        .join(names.select($"doc_id".as("key_b"), $"k".as("name_b")), Seq("key_b"))
        .withColumn("dist", levenshtein($"name_a", $"name_b", 2))
        .filter($"dist" >= 0)
      time("4 verify joins")(full)
      time("5 declared")(SparkEntry.queries("fuzzy_match2")(spark, sfDir))
    }
    spark.stop()
  }
}
