package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    def probeOf(mod: Int, keepNum: Int, keepDen: Int) =
      base.filter($"doc_id" % 31 === mod)
        .select(($"doc_id" + lit(20000000L) * mod).as("doc_id"),
          concat_ws(" ", slice(split($"text", " "), lit(1),
            greatest(expr(s"(size(split(text, ' ')) * $keepNum) DIV $keepDen"),
              lit(3)).cast("int"))).as("text"))
    val docs = base
      .unionByName(probeOf(1, 3, 4))
      .unionByName(probeOf(2, 11, 20))
      .unionByName(probeOf(3, 7, 20))

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val d = docs.select($"doc_id",
        graft.functions.GraftFunctions.shingle_hash_set($"text").as("hs"))
      val sets0 = d.localCheckpoint()
      time("1 sets0 read")(sets0)
      val (num, den) = (3, 10)
      val elems = sets0.select($"doc_id",
        size($"hs").cast("long").as("__n"), explode($"hs").as("__e"))
      val freq = elems.groupBy($"__e").agg(count(lit(1)).as("__cnt"))
      time("2 freq")(freq)
      val ceilTauN = ($"__n" * lit(num.toLong) + lit(den.toLong - 1L)) / lit(den.toLong)
      val w = Window.partitionBy($"doc_id").orderBy($"__cnt", $"__e")
      val prefix = elems.join(freq, "__e")
        .withColumn("__rn", row_number().over(w).cast("long"))
        .filter($"__rn" <= $"__n" - ceilTauN.cast("long") + lit(1L))
        .select($"doc_id", $"__e")
      time("3 prefix")(prefix)
      val pairs = graft.operators.CandidatePairs.fromBuckets(
        prefix, Seq("__e"), "doc_id", "a", "b")
      time("4 pairs")(pairs)
      val left = sets0.select($"doc_id".as("a"), $"hs".as("__sa"))
      val right = sets0.select($"doc_id".as("b"), $"hs".as("__sb"))
      val ver = pairs.join(left, "a").join(right, "b")
        .select($"a", $"b",
          size($"__sa").cast("long").as("n_a"),
          size($"__sb").cast("long").as("n_b"),
          size(array_intersect($"__sa", $"__sb")).cast("long").as("n_inter"))
        .filter($"n_inter" * lit(den.toLong + num.toLong) >=
          ($"n_a" + $"n_b") * lit(num.toLong))
      time("5 verify")(ver)
      time("6 declared")(SparkEntry.queries("neardup_threshold_curve")(spark, sfDir))
      pairs.agg(count(lit(1))).show()
      prefix.agg(count(lit(1))).show()
    }
    spark.stop()
  }
}
