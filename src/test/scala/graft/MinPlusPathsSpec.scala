package graft

import org.apache.spark.sql.functions._
import graft.operators.MinPlusPaths

/** MinPlusPaths — brute bounded Bellman–Ford parity, the weighted-vs-
  * hop distinction, and reliable-checkpoint equality. */
class MinPlusPathsSpec extends SparkSuite {
  import spark.implicits._

  // undirected weighted graph: direct weak tie 0–9 (cost 10) vs the
  // strong-tie chain 0–1–9 (cost 2+2=4); a spur 9–5 (cost 1); an
  // unreachable island 7–8
  private val edges = Seq(
    (0L, 9L, 10L), (0L, 1L, 2L), (1L, 9L, 2L), (9L, 5L, 1L),
    (7L, 8L, 3L))

  private def brute(rounds: Int, seeds: Set[Long]): Map[Long, Long] = {
    val sym = edges.flatMap { case (u, v, c) => Seq((u, v, c), (v, u, c)) }
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = sym.flatMap { case (u, v, c) =>
        dist.get(u).map(d => v -> (d + c))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  test("matches brute bounded Bellman-Ford at every horizon") {
    val df = edges.toDF("u", "v", "c")
    for (r <- 1 to 4) {
      val got = MinPlusPaths.distances(df, "u", "v", "c",
        n => n === 0L, r).as[(Long, Long)].collect().toMap
      assert(got == brute(r, Set(0L)), s"rounds=$r")
    }
  }

  test("a cheap 2-edge path beats the expensive direct tie") {
    val got = MinPlusPaths.distances(edges.toDF("u", "v", "c"),
      "u", "v", "c", n => n === 0L, 3).as[(Long, Long)].collect().toMap
    assert(got(9L) == 4L, "0-1-9 at cost 4 must beat direct cost 10")
    assert(got(5L) == 5L, "the spur rides the improved path")
    assert(!got.contains(7L) && !got.contains(8L), "island unreached")
  }

  test("reliable checkpointDir mode is bitwise-equal") {
    val dir = java.nio.file.Files.createTempDirectory("mpp-ckpt").toString
    val df = edges.toDF("u", "v", "c")
    val a = MinPlusPaths.distances(df, "u", "v", "c", n => n === 0L, 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = MinPlusPaths.distances(df, "u", "v", "c", n => n === 0L, 3,
      checkpointDir = Some(dir)).as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
