package graft

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.functions._

/** The SQL registration surface: every custom kernel reachable from
  * `spark.sql` text must build the SAME expression the Column API
  * builds — checked by value parity on fixture data. */
class SqlFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("scalar kernels: SQL text equals the Column API") {
    F.registerSql(spark)
    Tables.documents(spark, sf).limit(100)
      .select($"doc_id", $"text").createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, fnv1a(text) AS h,
        |  fnv1a_seeded(CAST(7 AS BIGINT), text) AS hs,
        |  simhash64(shingle_hash_set(text)) AS sh
        |FROM sqlfn_docs""".stripMargin)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaCol = Tables.documents(spark, sf).limit(100)
      .select($"doc_id", F.fnv1a($"text").as("h"),
        F.fnv1a_seeded(7L, $"text").as("hs"),
        F.simhash64(F.shingle_hash_set($"text")).as("sh"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaSql == viaCol)
  }

  test("hilbert2: SQL text equals the Column API and the core") {
    F.registerSql(spark)
    Tables.orders(spark, sf).limit(200)
      .select($"o_orderkey", $"o_custkey",
        (pmod($"o_orderkey", lit(1024))).as("y"))
      .createOrReplaceTempView("sqlfn_hilbert")
    val viaSql = spark.sql(
      "SELECT o_orderkey, hilbert2(o_custkey, y, 16) AS h FROM sqlfn_hilbert")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val viaCol = spark.table("sqlfn_hilbert")
      .select($"o_orderkey",
        graft.operators.Hilbert.hvalue($"o_custkey", $"y", 16).as("h"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("typed aggregates: SQL text equals the Column API") {
    F.registerSql(spark)
    Tables.documents(spark, sf).limit(200)
      .select(explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .createOrReplaceTempView("sqlfn_terms")
    val viaSql = spark.sql(
      "SELECT misra_gries(term, 32).n AS n FROM sqlfn_terms")
      .as[Long].head()
    val viaCol = spark.table("sqlfn_terms")
      .agg(F.misra_gries($"term", 32).getField("n").as("n"))
      .as[Long].head()
    assert(viaSql == viaCol)
    spark.range(100).select(($"id" % 7).as("g"), $"id")
      .createOrReplaceTempView("sqlfn_ids")
    val bms = spark.sql(
      """SELECT g, bounded_min_set(id, 4).cnt AS cnt,
        |  bounded_min_set(id, 4).ids AS ids
        |FROM sqlfn_ids GROUP BY g ORDER BY g""".stripMargin)
      .as[(Long, Long, Seq[Long])].collect()
    bms.foreach { case (g, cnt, ids) =>
      assert(cnt >= 14 && ids.length == 4 && ids == ids.sorted, s"g=$g")
    }
    // non-literal cap fails loudly, not silently
    val e = intercept[Exception] {
      spark.sql("SELECT misra_gries(term, length(term)) FROM sqlfn_terms")
        .collect()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("gram_matrix: SQL text equals the Column API") {
    F.registerSql(spark)
    Tables.embeddings(spark, sf).limit(100)
      .createOrReplaceTempView("sqlfn_emb")
    val viaSql = spark.sql(
      "SELECT gram_matrix(embedding, 64).cells AS c FROM sqlfn_emb")
      .as[Seq[Long]].head()
    val viaCol = spark.table("sqlfn_emb")
      .agg(F.gram_matrix($"embedding", 64).getField("cells").as("c"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.length == 64 * 65 / 2)
  }
}
