package graft

import graft.functions.{Fnv1aCore, GraftFunctions => F}
import org.apache.spark.sql.functions._

/** The streaming shingle generator must agree with the array-based
  * HOF spelling (positional 3-gram chain hashes over split tokens)
  * and honor the <3-token / null contracts. */
class ShingleHashesSpec extends SparkSuite {
  import spark.implicits._

  test("generator output equals hand-chained token hashes") {
    val rows = Seq("one two three four").toDF("text")
      .select(F.shingle_hashes($"text").as(Seq("gram_no", "gram_hash")))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    def th(w: String) =
      Fnv1aCore.hashBytes(w.getBytes("UTF-8"), Fnv1aCore.OffsetBasis)
    def chain(a: String, b: String, c: String) =
      Fnv1aCore.hashLong(th(c), Fnv1aCore.hashLong(th(b),
        Fnv1aCore.hashLong(th(a), Fnv1aCore.OffsetBasis)))
    assert(rows.toSeq == Seq(
      (1, chain("one", "two", "three")), (2, chain("two", "three", "four"))))
  }

  test("generator equals the HOF spelling on fixture documents") {
    val viaGen = Tables.documents(spark, sf)
      .select($"doc_id", F.shingle_hashes($"text").as(Seq("gram_no", "gram_hash")))
    val th = transform(split($"text", " "), w => F.fnv1a(w))
    val viaHof = Tables.documents(spark, sf)
      .select($"doc_id", th.as("th"))
      .select($"doc_id", posexplode(
        transform(sequence(lit(1), size($"th") - 2), i =>
          F.fnv1a(element_at($"th", i), element_at($"th", i + 1),
            element_at($"th", i + 2)))).as(Seq("pos0", "gram_hash")))
      .select($"doc_id", ($"pos0" + 1).as("gram_no"), $"gram_hash")
    assert(viaGen.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaGen).isEmpty)
  }

  test("short and null texts emit no rows") {
    val df = Seq(Some("just two"), Some("one"), None, Some("a b c"))
      .toDF("text")
    val n = df.select(F.shingle_hashes($"text").as(Seq("g", "h"))).count()
    assert(n == 1, "only the 3-token text emits (exactly one gram)")
  }

  test("shingle_hash_set equals the HOF spelling incl. the short-doc fallback") {
    // the one-pass array kernel vs the three-stage HOF pipeline it
    // replaced: token-hash transform -> 3-gram chains -> distinct,
    // with the whole-text chain fallback under 3 tokens
    def hofSpelling(text: org.apache.spark.sql.Column) = {
      val th = transform(split(text, " "), w => F.fnv1a(w))
      when(size(th) >= 3,
        array_distinct(transform(sequence(lit(1), size(th) - 2), i =>
          F.fnv1a(element_at(th, i), element_at(th, i + 1),
            element_at(th, i + 2)))))
        .otherwise(array(aggregate(th, lit(Fnv1aCore.OffsetBasis),
          (acc, h) => F.fnv1a_seeded_dyn(acc, h))))
    }
    val fixture = Tables.documents(spark, sf).limit(200).select($"text")
    val synthetic = Seq("one", "just two", "a b c", "a b c a b c",
      "", "repeat repeat repeat repeat").toDF("text")
    Seq(fixture, synthetic).foreach { df =>
      val rows = df.select(F.shingle_hash_set($"text").as("fast"),
        hofSpelling($"text").as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      }
    }
    // null in -> null out
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(F.shingle_hash_set($"text")).head()
    assert(nullRow.isNullAt(0))
  }
}
