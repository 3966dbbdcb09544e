package graft

import graft.operators.Fingerprints
import org.apache.spark.sql.functions._

/** The M14 replication-integrity contract: fingerprints are
  * partitioning-invariant, a single flipped row flips EXACTLY its
  * bucket, and identical replicas fingerprint identically. */
class FingerprintsSpec extends SparkSuite {
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    Fingerprints.bucketFingerprints(df, "o_orderkey",
      Seq($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_orderpriority", date_format($"o_orderdate", "yyyy-MM-dd")),
      16)
      .orderBy($"bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("partitioning-invariant; replica == original; one flipped row " +
      "flips exactly its bucket") {
    val o = Tables.orders(spark, sf)
    val base = fp(o)
    assert(base.size == 16 && base.map(_._2).sum == o.count())
    // any repartitioning fingerprints identically (the XOR fold is
    // order- and partition-free)
    assert(fp(o.repartition(7, $"o_custkey")) == base)
    // an exact replica agrees
    assert(fp(o.select(o.columns.map(col): _*)) == base)
    // flip one row's status: exactly that key's bucket diverges, with
    // unchanged row counts (the corruption-not-loss signature)
    val victim = o.orderBy($"o_orderkey").select($"o_orderkey")
      .as[Long].head()
    val mutated = o.withColumn("o_orderstatus",
      when($"o_orderkey" === victim, lit("?"))
        .otherwise($"o_orderstatus"))
    val diff = fp(mutated).zip(base).filter { case (m, b) => m != b }
    assert(diff.size == 1)
    val (m, b) = diff.head
    assert(m._1 == victim % 16 && m._2 == b._2 && m._3 != b._3)
  }

  test("canonicalization is injective: NULL position, separator " +
      "injection and the literal sentinel all diverge") {
    // genuinely divergent replicas MUST fingerprint differently — the
    // exact miss the audit exists to prevent. A bare concat_ws skips
    // NULLs (('a', NULL, 'b') ≡ ('a', 'b', NULL)) and lets an embedded
    // '|' forge a field boundary (('a|b', 'c') ≡ ('a', 'b|c')).
    def fp1(rows: Seq[(Long, Option[String], Option[String])]): Seq[Long] =
      Fingerprints.bucketFingerprints(
        rows.toDF("k", "x", "y"), "k", Seq($"x", $"y"), 1)
        .select($"xor_fp").as[Long].collect().toSeq
    val a = fp1(Seq((1L, Some("a"), None)))
    val b = fp1(Seq((1L, None, Some("a"))))
    val c = fp1(Seq((1L, Some("a"), Some("a"))))
    assert(a != b && a != c && b != c,
      s"NULL position must matter: $a $b $c")
    // the NULL sentinel is distinguishable from the literal string "N"
    assert(fp1(Seq((1L, None, None))) !=
      fp1(Seq((1L, Some("N"), Some("N")))))
    // separator injection cannot shift the field parse
    assert(fp1(Seq((1L, Some("a|b"), Some("c")))) !=
      fp1(Seq((1L, Some("a"), Some("b|c")))))
    // an embedded length-prefix lookalike cannot forge a boundary
    assert(fp1(Seq((1L, Some("1:a|1:b"), Some("c")))) !=
      fp1(Seq((1L, Some("a"), Some("b|1:c")))))
  }
}
