package graft

import graft.functions.{GraftFunctions => F}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The multimodal byte-feature contract: the Catalyst-expression path
  * (production, codegen) and the mapPartitions decoder extension point
  * (stub) must agree value-for-value — including non-ASCII bytes,
  * payloads shorter than the 4-byte header, and empty payloads. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val payloads: Seq[(Long, Array[Byte])] = Seq(
    1L -> Array[Byte](1, 2, 3, 4, 5),
    2L -> Array[Byte](-1, 0, 127, -128, 65), // non-ASCII byte values
    3L -> Array[Byte](7, 8),                 // shorter than the header
    4L -> Array[Byte](),                     // empty
    5L -> "plain ascii text payload".getBytes("UTF-8"))

  test("featureColumns == decodeStub on crafted payloads") {
    val df = payloads.toDF("doc_id", "payload")
    val exprRows = Multimodal.featureColumns(df).orderBy($"doc_id").collect()
    val stubRows = payloads.sortBy(_._1)
      .map { case (id, b) => Multimodal.decodeStub(id, b) }
    exprRows.zip(stubRows).foreach { case (e, s) =>
      assert(e.getLong(0) == s.getLong(0))
      assert(e.getLong(1) == s.getLong(1), s"n_bytes for doc ${e.getLong(0)}")
      assert(e.getString(2) == s.getString(2), s"header_hex for doc ${e.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(e.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(s.getDouble(3)),
        s"byte_mean for doc ${e.getLong(0)}")
    }
  }

  test("featureColumns == extractFeatures (RDD extension point) on the fixture") {
    val docs = Tables.documents(spark, sf).limit(100)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val a = Multimodal.featureColumns(docs).orderBy($"doc_id").collect()
    val b = Multimodal.extractFeatures(docs).orderBy($"doc_id").collect()
    assert(a.length == 100)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("byte_sum codegen matches interpreted eval; null in -> null out") {
    val df = payloads.toDF("doc_id", "payload")
    val cg = df.select(F.byte_sum($"payload")).collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(F.byte_sum($"payload")).collect().map(_.getLong(0))
      assert(cg.toSeq == interp.toSeq)
    }
    assert(cg.toSeq == payloads.map(_._2.map(b => (b & 0xff).toLong).sum))
    val withNull = spark.sql("SELECT CAST(NULL AS BINARY) AS payload")
    assert(withNull.select(F.byte_sum($"payload")).collect()(0).isNullAt(0))
  }
}
