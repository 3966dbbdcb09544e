package graft

import graft.queries.Pipeline
import org.apache.spark.sql.functions._

/** Property tests for the non-SQL-expressible pipeline operators
  * (SimHash, LSH ANN) and an independent in-Spark ground-truth check
  * for the MinHash/LSH near-dedup (its DuckDB oracle runs at sf0.01;
  * this pins the same result against a brute-force all-pairs Jaccard
  * computed by Spark itself). */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("perplexity filter: a junk source cannot launder itself — the " +
      "reference-trained LM tails it, a self-trained LM heads it (L102)") {
    val clean = (0L until 20L).map(i => (i,
      if (i % 2 == 0) "refA" else "refB",
      "the quick brown fox jumps over the lazy dog again and again"))
    val junk = (100L until 110L).map(i => (i, "junk",
      "zzq zzq zzq zzq zzq zzq zzq zzq zzq zzq zzq zzq"))
    val docs = (clean ++ junk).toDF("doc_id", "source", "text")
    // reference model = the clean sources only: every junk doc scores
    // strictly worse than every clean doc (its tokens take the
    // smoothed floor)
    val ref = Pipeline.perplexityBuckets(docs, Seq("refA", "refB"))
    val maxClean = ref.filter($"source" =!= "junk")
      .agg(max($"mean_nll")).head.getDouble(0)
    val minJunk = ref.filter($"source" === "junk")
      .agg(min($"mean_nll")).head.getDouble(0)
    assert(minJunk > maxClean,
      s"reference model must tail junk: junk=$minJunk clean=$maxClean")
    // the contrast the CCNet design exists for: train the model on
    // EVERYTHING (junk included — the L5 self-scoring shape) and the
    // junk flips to the BEST scores, because its one token dominates
    // its own corpus
    val self = Pipeline.perplexityBuckets(docs,
      Seq("refA", "refB", "junk"))
    val maxJunkSelf = self.filter($"source" === "junk")
      .agg(max($"mean_nll")).head.getDouble(0)
    val minCleanSelf = self.filter($"source" =!= "junk")
      .agg(min($"mean_nll")).head.getDouble(0)
    assert(maxJunkSelf < minCleanSelf,
      s"self model launders junk: junk=$maxJunkSelf clean=$minCleanSelf")
  }

  test("minhash_neardup equals brute-force all-pairs Jaccard at sf0.001") {
    val lsh = Pipeline.queries("minhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val t = split($"text", " ")
    val sh = Tables.documents(spark, sf).select($"doc_id",
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))).as("s"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s")))).as("j"))
      .filter($"j" >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == brute, s"LSH ${lsh.size} pairs vs brute ${brute.size}")
  }

  test("minhash near-dedup handles short docs via the whole-text fallback") {
    // Docs under the 3-token shingle width fall back to one whole-text
    // shingle (advisor round-2 finding): identical short docs must
    // pair with Jaccard 1.0; distinct short docs must not pair; and
    // long near-dups keep working alongside them. Randomized corpus,
    // fixed seed.
    val rnd = new scala.util.Random(42)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def sentence(n: Int) =
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    val longBase = sentence(40)
    val docs = Seq(
      1L -> "solo",                      // 1 token, unique
      2L -> "twin tokens",               // 2 tokens
      3L -> "twin tokens",               // exact short duplicate of 2
      4L -> "twin words",                // near-but-distinct short doc
      5L -> longBase,                    // long doc
      6L -> (longBase + " extra"),       // near-dup of 5 (J >> 0.5)
      7L -> sentence(40)                 // unrelated long doc
    ) ++ (8L to 30L).map(i => i -> sentence(20 + rnd.nextInt(20)))
    val df = docs.toDF("doc_id", "text")
    val pairs = Pipeline.minhashNearDupPairs(df, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((2L, 3L)), s"short exact dup missed: $pairSet")
    assert(pairs.find(p => (p._1, p._2) == (2L, 3L)).get._3 == 1.0)
    assert(pairSet.contains((5L, 6L)), s"long near-dup missed: $pairSet")
    assert(!pairSet.exists(p => Set(p._1, p._2).contains(4L)),
      "distinct short doc must not pair")
    assert(!pairSet.exists(p => Set(p._1, p._2).contains(1L)))
  }

  test("decontaminate is exactly the cross-split slice of the near-dup pairs") {
    val pairs = Pipeline.queries("minhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val split = Tables.documents(spark, sf)
      .select($"doc_id",
        graft.operators.Sampling.splitLabel($"doc_id", 0.8, 0.1).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = pairs.flatMap { case (a, b) =>
      (split(a) == "train", split(b) == "train") match {
        case (true, false) => Some((a, b, split(b)))
        case (false, true) => Some((b, a, split(a)))
        case _ => None
      }
    }.toSet
    val got = Pipeline.queries("decontaminate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want, s"${got.size} vs ${want.size} leaked pairs")
    // same-split near-dups must never be reported
    assert(got.forall { case (t, e, _) =>
      split(t) == "train" && split(e) != "train" })
  }

  test("dup_spans equals the direct span group-by (fp gating is invisible)") {
    val got = Pipeline.queries("dup_spans")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // direct spelling: group the span strings themselves, no
    // fingerprint candidate pass
    val t = split($"text", " ")
    val want = Tables.documents(spark, sf)
      .select($"doc_id", t.as("ws")).filter(size($"ws") >= 8)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"ws") - 7),
        i => concat_ws(" ", slice($"ws", i, lit(8))))).as("span_text"))
      .groupBy($"span_text")
      .agg(count_distinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min($"doc_id").as("first_doc"))
      .filter($"n_docs" >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(want.nonEmpty, "fixture near-dups must share 8-token spans")
    assert(got == want, s"${got.size} vs ${want.size} repeated spans")
  }

  test("embed_quantize: int8 range, half-scale error bound, exact hand vector") {
    val rows = Pipeline.queries("embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getString(2).split(",").map(_.toInt)
      val maxErr = r.getDouble(3)
      assert(q.forall(v => v >= -127 && v <= 127), s"int8 range: ${q.toSeq}")
      // round-to-nearest: |x - q*scale| <= scale/2 (+ q6 rounding slack)
      assert(maxErr <= scale / 2 + 1e-6, s"err $maxErr vs scale $scale")
    }
    // hand vector through the same operator expression path
    val hand = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
    val emb = hand.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val mx = aggregate(transform($"v", x => abs(x)), lit(0.0),
      (a, x) => greatest(a, x))
    val got = emb.select(transform($"v",
        x => floor(x * 127.0 / mx + 0.5).cast("int")).as("q"))
      .head().getSeq[Int](0)
    // mx = 1.0: q = floor(x*127 + 0.5) = round-half-up
    assert(got == Seq(64, -127, 32, 0), s"hand quantization: $got")
  }

  test("simhash separates near-dups from random pairs by Hamming distance") {
    val fps = Pipeline.simhashFrame(spark, sf)
      .filter(col("doc_id") >= 0) // corpus docs only (probes ride along)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupPairs = Pipeline.queries("minhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.nonEmpty)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupDist = dupPairs.map { case (a, b) => hamming(fps(a), fps(b)) }
    val ids = fps.keys.toArray.sorted
    val randDist = ids.take(40).flatMap(a => ids.takeRight(40).map(b =>
      hamming(fps(a), fps(b))))
    val dupAvg = dupDist.sum.toDouble / dupDist.length
    val randAvg = randDist.sum.toDouble / randDist.length
    assert(dupAvg < 8, s"near-dup avg Hamming $dupAvg should be small")
    assert(randAvg > 16, s"random avg Hamming $randAvg should be large")
  }

  test("ann_lsh returns at most k multi-probe neighbors per probe, ranked") {
    val rows = Pipeline.queries("ann_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val rns = rs.map(_.getLong(1)).sorted
      assert(rns.sameElements(1L to rns.length), "ranks must be 1..n")
      // scores are non-increasing in rank
      val byRn = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(byRn.zip(byRn.tail).forall { case (x, y) => x >= y })
    }
    // Multi-probe samples ~9/256 of the corpus; on this weakly
    // structured fixture (max cos ≈ 0.5) expect partial but real
    // recall of the exact top-5.
    val exact = Pipeline.queries("cosine_knn")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        p -> rs.map(_.getLong(2)).toSet }
    val hit = byProbe.toSeq.map { case (p, rs) =>
      rs.map(_.getLong(2)).count(exact(p).contains).toDouble / 5 }
    assert(hit.sum / hit.size > 0.05,
      s"multi-probe recall too low: ${hit.sum / hit.size}")
  }

  test("learned IVF: deterministic k-means, monotone objective, real recall") {
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val c1 = IvfIndex.learnCentroids(emb, 16, 3)
    val c2 = IvfIndex.learnCentroids(emb, 16, 3)
    // bitwise deterministic across runs
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // Lloyd's objective is non-increasing: sum of best scores
    // (= -(L2 objective - sum|v|^2)/2) must not decrease vs init
    val init = IvfIndex.learnCentroids(emb, 16, 0)
    def sumBestScore(cents: Array[Array[Double]]): Double =
      emb.select(array_max(IvfIndex.scoresCol($"v", cents)).as("s"))
        .agg(sum($"s")).collect().head.getDouble(0)
    assert(sumBestScore(c1) >= sumBestScore(init) - 1e-9,
      "k-means objective regressed")
    // learned cells are non-degenerate (more than one populated)
    val nCells = IvfIndex.assignCells(emb, c1)
      .select($"cell").distinct().count()
    assert(nCells > 4, s"k-means collapsed to $nCells cells")
    // recall floor vs the exact scan on the same probes
    val exact = Pipeline.queries("cosine_knn")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (p, rs) => p -> rs.map(_.getLong(2)).toSet }
    val approx = Pipeline.queries("ivf_ann_learned")(spark, sf)
      .collect().groupBy(_.getLong(0))
    assert(approx.nonEmpty)
    val hit = approx.toSeq.map { case (p, rs) =>
      rs.map(_.getLong(2)).count(exact(p).contains).toDouble / 5 }
    assert(hit.sum / hit.size > 0.2,
      s"learned-IVF recall too low: ${hit.sum / hit.size}")
  }

  test("exact_dedup 128-bit fingerprint keeps all distinct docs") {
    val n = Tables.documents(spark, sf).select($"text").distinct().count()
    assert(Pipeline.queries("exact_dedup")(spark, sf).count() == n)
  }

  test("banded LSH candidates stay near-linear in corpus size") {
    // Regression net for hyperplane quality: FNV-1a's bit 0 has no
    // avalanche, and deriving plane signs from it collapsed all 96
    // planes to 2 patterns -> 2 buckets/band -> O(n²) candidates
    // (~1M pairs from 2000 vectors). With parity-derived planes the
    // τ=-1 candidate count (every bucket pair, no cosine cut) must
    // stay near-linear.
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val n = emb.count()
    val cands = Pipeline.embedNearDupPairs(emb, -1.0).count()
    assert(cands < n * 20, s"LSH candidate blowup: $cands pairs from $n vectors")
  }

  test("embed_neardup detects planted near-identical vectors, no extras") {
    // Base corpus from the fixture (pairwise cosine ≤ ~0.51 — below
    // τ) + two planted copies of vectors 0 and 7 with one component
    // nudged 0.1% — cosine ≈ 1. The detector must find exactly the
    // two planted pairs through the banded-LSH candidate path.
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val planted = emb.filter($"vec_id" === 0 || $"vec_id" === 7)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"v", (x, i) => when(i === 0, x * 1.001).otherwise(x))
          .as("v"))
    val pairs = Pipeline.embedNearDupPairs(emb.unionByName(planted), 0.99)
      .select($"va", $"vb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 10000L), (7L, 10007L)), pairs.toSeq)
  }

  test("ivf_ann: cells partition the corpus; top-k ranked and plausible") {
    val rows = Pipeline.queries("ivf_ann")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rs) =>
      assert(rs.length == 5, "4-of-16-cell probe must fill k=5 here")
      val byRn = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRn.zip(byRn.tail).forall { case (x, y) => x >= y })
    }
    // IVF recall vs the exact brute-force top-5 (cosine_knn): with
    // nprobe=4/16 on near-orthogonal random vectors recall is partial
    // by design, but the top-1 neighborhood should overlap markedly.
    val exact = Pipeline.queries("cosine_knn")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        p -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSet }
    val hit = byProbe.toSeq.map { case (p, rs) =>
      rs.map(_.getLong(2)).count(exact(p).contains).toDouble / 5 }
    assert(hit.sum / hit.size > 0.3,
      s"mean IVF recall vs exact top-5 too low: ${hit.sum / hit.size}")
  }

  test("source_length_quantiles: discrete quantiles hit real elements in order") {
    val rows = SparkEntry.queries("source_length_quantiles")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val lengths = Tables.documents(spark, sf)
      .select($"source", size(split($"text", " ")).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (src, n, p50, p90, p99) =>
      val xs = lengths(src).map(_._2).sorted
      assert(n == xs.length)
      assert(p50 <= p90 && p90 <= p99)
      // each quantile is an actual element at its ceil index
      assert(p50 == xs(math.max(1, math.ceil(0.5 * n).toLong).toInt - 1))
      assert(p99 == xs(math.max(1, math.ceil(0.99 * n).toLong).toInt - 1))
    }
  }

  test("session_gaps: buckets partition all adjacent pairs exactly") {
    val rows = SparkEntry.queries("session_gaps")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, _, lo, hi) =>
      if (b == -1L) assert(lo == 0L && hi == 0L)
      else assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b range [$lo,$hi] outside [2^$b, 2^${b + 1})")
    }
    val ev = Tables.events(spark, sf)
    val want = ev.count() - ev.select($"user_id").distinct().count()
    assert(rows.map(_._2).sum == want, "every adjacent pair bucketed once")
  }

  test("novelty_score: ratios in range; exact-dup probes score zero-ish") {
    val rows = SparkEntry.queries("novelty_score")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { case (id, n, u, s) =>
      assert(u >= 0 && u <= n && s >= 0.0 && s <= 1.0, s"doc $id")
    }
    assert(rows.exists(_._4 > 0.5), "some docs should be mostly novel")
  }

  test("rolling_7d: trailing window equals the brute per-user scan") {
    val rows = SparkEntry.queries("rolling_7d")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val daily = rows.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    rows.foreach { case (u, d, _, n7) =>
      val want = (d - 6 to d).map(daily(u).getOrElse(_, 0L)).sum
      assert(n7 == want, s"user $u day $d")
    }
  }

  test("rolling_anomaly: flags equal the brute trailing-baseline scan") {
    val rows = SparkEntry.queries("rolling_anomaly")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // brute: per type, daily counts over OBSERVED days in day order
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type",
        datediff($"ts".cast("date"), to_date(lit("2024-01-01")))
          .cast("long").as("day"))
      .count().as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3))).toMap
    val expect = daily.toSeq.flatMap { case (t, series) =>
      series.zipWithIndex.drop(7).map { case ((d, x), i) =>
        val base = series.slice(i - 7, i).map(_._2)
        val s1 = base.sum; val s2 = base.map(b => b * b).sum
        val flag = if ((7 * x - s1) * (7 * x - s1) > 4 * (7 * s2 - s1 * s1))
          1L else 0L
        (t, d) -> ((x, s1, flag))
      }
    }.toMap
    assert(rows.length == expect.size, "row count = days with full baseline")
    rows.foreach { case (t, d, n, s, fl) =>
      assert(expect((t, d)) == ((n, s, fl)), s"$t day $d")
    }
  }

  test("time_interpolate: equals the brute bracketing scan; edges withheld") {
    val got = SparkEntry.queries("time_interpolate")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type",
        expr("unix_micros(ts) DIV 1000000").as("t"), $"value",
        unix_micros($"ts").as("tus"))
      .as[(Long, Long, String, Long, Double, Long)]
      .collect()
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val seq = rows.sortBy(r => (r._6, r._1))
      seq.zipWithIndex.foreach { case ((id, _, typ, t, _, _), i) =>
        if (typ == "click") {
          val before = seq.take(i + 1).filter(_._3 == "purchase").lastOption
          val after = seq.drop(i + 1).filter(_._3 == "purchase").headOption
          (before, after) match {
            case (Some(b), Some(a)) =>
              val (v0, t0) = (math.floor(b._5 * 1e6 + 0.5).toLong, b._4)
              val (v1, t1) = (math.floor(a._5 * 1e6 + 0.5).toLong, a._4)
              val im = if (t1 == t0) v0
                else (v0 * (t1 - t) + v1 * (t - t0)) / (t1 - t0)
              assert(got(id)._2 == im.toDouble / 1e6, s"event $id")
            case _ =>
              assert(!got.contains(id), s"unbracketed probe $id must be withheld")
          }
        }
      }
    }
  }

  test("split_repair: applying the migration makes every cluster one-split") {
    val pairs = graft.queries.Pipeline.minhashNearDupPairs(
      Tables.documents(spark, sf).select($"doc_id", $"text"), 0.5)
    val comp = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val split = Tables.documents(spark, sf).select($"doc_id",
        graft.operators.Sampling.splitLabel($"doc_id", 0.8, 0.1))
      .as[(Long, String)].collect().toMap
    // after repair: final split = canonical's split
    val finalSplit = comp.map { case (node, c) => node -> split(c) }.toMap
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(m => finalSplit(m._1)).distinct.length == 1,
        s"cluster $c straddles splits after repair")
    }
    // the reported matrix counts exactly the moved docs
    val moved = comp.count { case (node, c) => split(node) != split(c) }
    val matrixTotal = SparkEntry.queries("split_repair")(spark, sf)
      .agg(coalesce(sum($"n_moved"), lit(0L))).as[Long].collect().head
    assert(matrixTotal == moved.toLong, "migration matrix mass")
  }

  test("decayed_activity: monotone in recency, bounded by count") {
    val rows = SparkEntry.queries("decayed_activity")(spark, sf)
      .as[(Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, score, n) =>
      assert(score > 0.0 && score <= n.toDouble + 1e-9, s"user $u")
    }
  }

  test("length_outliers: every flagged doc really is > 2 sigma off") {
    val rows = SparkEntry.queries("length_outliers")(spark, sf)
      .as[(Long, String, Long, Double)].collect()
    assert(rows.nonEmpty, "fixture should contain some outliers")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("nt"))
      .as[(Long, String, Long)].collect()
    val bySource = docs.groupBy(_._2)
    rows.foreach { case (id, src, nt, z) =>
      val xs = bySource(src).map(_._3.toDouble)
      val mean = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => x * x).sum / xs.length - mean * mean)
      val want = (nt - mean) / sd
      assert(math.abs(z - want) < 1e-4, s"doc $id z=$z want=$want")
      assert(math.abs(z) > 2.0)
    }
  }

  test("event_transitions: rows are a stochastic matrix over real pairs") {
    val rows = SparkEntry.queries("event_transitions")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // per from_type the probabilities sum to ~1 (quantization slack)
    rows.groupBy(_._1).foreach { case (from, grp) =>
      val psum = grp.map(_._4).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$from probabilities sum to $psum")
    }
    // total transition count = events - one per user with >= 1 event
    val ev = Tables.events(spark, sf)
    val want = ev.count() - ev.select($"user_id").distinct().count()
    assert(rows.map(_._3).sum == want)
  }

  test("bpe_pairs: 50 two-char pairs, descending, counts conserve") {
    val rows = SparkEntry.queries("bpe_pairs")(spark, sf)
      .as[(String, Long)].collect()
    assert(rows.length == 50)
    assert(rows.forall(_._1.length == 2))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    // the top pair count can never exceed total adjacent positions
    val totalPos = Tables.documents(spark, sf)
      .select(sum(greatest(length($"text") - 1, lit(0)))).as[Long].head()
    assert(rows.head._2 <= totalPos)
  }

  test("dup_span_runs: equals brute maximal-run coalescing in memory") {
    val W = 8
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val spans: Seq[(Long, Long, String)] = docs.toSeq.flatMap {
      case (id, text) =>
        val ws = text.split(" ")
        if (ws.length < W) Seq.empty[(Long, Long, String)]
        else (0 to ws.length - W).map(i =>
          (id, (i + 1).toLong, ws.slice(i, i + W).mkString(" ")))
    }
    val dfBySpan = spans.groupBy(_._3)
      .map { case (sp, occ) => sp -> occ.map(_._1).distinct.size }
    val eligible =
      dfBySpan.filter { case (_, d) => d >= 2 && d <= 16 }.keySet
    val shared = spans.filter(s => eligible(s._3)).groupBy(_._3)
      .values.flatMap { occ =>
        for (a <- occ; b <- occ if a._1 < b._1)
          yield (a._1, b._1, a._2, b._2)
      }.toSeq
    val want = shared.groupBy(r => (r._1, r._2, r._3 - r._4))
      .flatMap { case ((da, db, diag), rows) =>
        val ps = rows.map(_._3).sorted
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- ps) {
          if (runs.nonEmpty && runs.last._1 + runs.last._2 == p)
            runs(runs.size - 1) = (runs.last._1, runs.last._2 + 1)
          else runs += ((p, 1L))
        }
        runs.map { case (st, n) =>
          (da, db, st, st - diag, n, n + W - 1) }
      }.toSet
    val got = SparkEntry.queries("dup_span_runs")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.exists(_._5 > 1), "expected a coalesced multi-window run")
  }

  test("neardup_threshold_curve: monotone and resolves the planted " +
      "mid-band") {
    val rows = SparkEntry.queries("neardup_threshold_curve")(spark, sf)
      .as[(Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
    assert(rows.sliding(2).forall(p => p.head._2 >= p.last._2),
      s"pair counts must be non-increasing in tau: $rows")
    assert(rows.head._2 > rows.last._2,
      "truncation probes must populate the mid-similarity band " +
        "(otherwise the curve is flat and audits nothing)")
    assert(rows.last._2 > 0, "the native >= 0.9 pairs must survive")
  }

  test("neardup_threshold_curve_sampled: subset of the exact curve, " +
      "band covers the point estimate, curve tracks") {
    val exact = SparkEntry.queries("neardup_threshold_curve")(spark, sf)
      .as[(Double, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val rows = SparkEntry
      .queries("neardup_threshold_curve_sampled")(spark, sf)
      .as[(Double, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
    assert(rows.sliding(2).forall(p => p.head._2 >= p.last._2),
      s"sampled pair counts must be non-increasing in tau: $rows")
    for ((tau, n, micro, lo, hi) <- rows) {
      val (en, emicro) = exact(tau)
      // the sampled pair relation is a strict SUBSET of the exact
      // one (same probe rule applied to sampled ids), so both totals
      // are bounded by the exact row's
      assert(n > 0 && n <= en, s"tau=$tau: sampled n=$n vs exact=$en")
      assert(micro <= emicro, s"tau=$tau: micro=$micro vs $emicro")
      // the Poisson band straddles its own point estimate
      assert(lo <= n && n <= hi, s"tau=$tau: band [$lo,$hi] misses $n")
      assert(lo > 0, s"tau=$tau: degenerate band [$lo,$hi]")
      // tracking: per-pair mean similarity of the sample stays within
      // 15% of the exact curve's (the sample is a thinning, so the
      // mean — unlike the count — needs no design-effect scaling)
      val meanS = micro.toDouble / n
      val meanE = emicro.toDouble / en
      assert(math.abs(meanS - meanE) / meanE < 0.15,
        s"tau=$tau: sampled mean $meanS drifted from exact $meanE")
      // thinning rate in the plausible (p^2, p) bracket for the
      // k=60-per-lang sample of the fixture corpus
      val ratio = n.toDouble / en
      assert(ratio > 0.2 && ratio < 0.8,
        s"tau=$tau: thinning ratio $ratio outside (0.2, 0.8)")
    }
  }

  test("lang_id_trigram: identifies the stopword-free probes the " +
      "stopword tier cannot") {
    val stops = Set("the", "a", "of", "el", "la", "de", "der", "die",
      "das")
    // the probes genuinely carry zero stopword signal (whole tokens)
    for ((_, _, tx) <- Pipeline.trigramScoreProbes)
      assert(tx.split(" ").forall(w => !stops(w)),
        s"scoring probe leaks a stopword: $tx")
    val got = SparkEntry.queries("lang_id_trigram")(spark, sf)
      .select($"doc_id", $"lang", $"predicted_lang")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // every planted scoring probe is identified by its trigrams —
    // including the four the stopword vote would tiebreak to en
    for ((id, lang, _) <- Pipeline.trigramScoreProbes)
      assert(got(id) == ((lang, lang)),
        s"probe $id: expected $lang, got ${got(id)}")
    // the training probes classify to their own class too
    for ((id, lang, _) <- Pipeline.trigramTrainProbes)
      assert(got(id)._2 == lang,
        s"train probe $id: expected $lang, got ${got(id)}")
  }

  test("bpe_train: equals a sequential in-memory BPE trainer") {
    // independent reference: classic greedy BPE — word-frequency
    // table, per-round pair count, argmax (count desc, pair asc),
    // left-to-right non-overlapping merge application
    val wordFreq = Tables.documents(spark, sf).select("text").as[String]
      .collect().flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toList -> ws.length.toLong }
    var cur: Map[List[String], Long] = wordFreq
    val want = (1 to graft.queries.Pipeline.BpeRounds).map { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      cur.foreach { case (syms, cnt) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) += cnt)
      }
      val ((a, b), c) = pc.minBy { case ((pa, pb), pcnt) => (-pcnt, pa, pb) }
      def applyMerge(syms: List[String]): List[String] = {
        val v = syms.toVector
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < v.length) {
          if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += v(i); i += 1 }
        }
        out.toList
      }
      cur = cur.groupMapReduce(kv => applyMerge(kv._1))(_._2)(_ + _)
      val vocab = cur.keysIterator.flatten.toSet.size.toLong
      (r.toLong, a, b, c, vocab)
    }
    val got = SparkEntry.queries("bpe_train")(spark, sf)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == want, s"got=$got\nwant=$want")
    // merged symbols must win at least one later round on the fixture
    assert(got.exists(r => r._2.length > 1 || r._3.length > 1),
      "expected a multi-symbol merge within the round budget")
  }

  test("bpe_apply: per-source census equals sequential encoding with " +
      "the trained merges") {
    val merges = SparkEntry.queries("bpe_train")(spark, sf)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
      .map(r => (r._2, r._3)).toSeq
    val memo = scala.collection.mutable.Map.empty[String, Long]
    def encode(w: String): Long = memo.getOrElseUpdate(w, {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    })
    val want = Tables.documents(spark, sf).select($"source", $"text")
      .as[(String, String)].collect()
      .flatMap { case (srcName, t) =>
        t.split(" ").filter(_.nonEmpty).map(w => (srcName, w)) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (srcName, ws) =>
        val words = ws.map(_._2)
        val nC = words.map(_.length.toLong).sum
        val nT = words.map(encode).sum
        (srcName, words.length.toLong, nC, nT,
          math.floor(nC.toDouble / nT.toDouble * 1e6 + 0.5) / 1e6)
      }
    val got = SparkEntry.queries("bpe_apply")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == want, s"got=$got\nwant=$want")
    // the merges must actually compress: fewer tokens than chars
    assert(got.forall(r => r._4 < r._3))
  }

  test("incremental_curation: every stage fires and the funnel conserves") {
    val rows = SparkEntry.queries("incremental_curation")(spark, sf)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._2) == Seq("arrived", "after_exact",
      "after_corpus_neardup", "admitted", "corpus_after"))
    val n = rows.map(r => r._2 -> r._3).toMap
    assert(n("arrived") > n("after_exact"),
      "planted exact copies must die at stage 1")
    assert(n("after_exact") > n("after_corpus_neardup"),
      "planted appended-token near-twins must die at stage 2")
    assert(n("after_corpus_neardup") > n("admitted"),
      "planted within-batch twins must collapse at stage 3")
    assert(n("admitted") > 0, "genuine fresh docs must survive")
    val corpusCount = Tables.documents(spark, sf)
      .filter($"doc_id" % 10 =!= 0).count()
    assert(n("corpus_after") == corpusCount + n("admitted"),
      "corpus_after = corpus + admitted, exactly")
    // the exact-copy family is at least the planted count (natural
    // batch/corpus text dups may add to it)
    val nExactProbes = Tables.documents(spark, sf)
      .filter($"doc_id" % 10 =!= 0 && $"doc_id" % 17 === 2).count()
    assert(n("arrived") - n("after_exact") >= nExactProbes)
  }

  test("neardup_dedup_quality keeps exactly one member per cluster, the best") {
    val kept = SparkEntry.queries("neardup_dedup_quality")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val minId = SparkEntry.queries("neardup_dedup")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    // same survivor COUNT (one per cluster + all singletons), possibly
    // different member choice
    assert(kept.size == minId.size)
    val pairs = SparkEntry.queries("minhash_neardup")(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    // no two kept docs may still be near-dups of each other
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"near-dup pair ($a, $b) both kept")
    }
  }

  test("cluster_stats: sizes and pair counts are consistent with the closure") {
    val rows = SparkEntry.queries("cluster_stats")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, size, nPairs, minJ, meanJ) =>
      assert(size >= 2, "a cluster needs at least one pair")
      // pair count bounded by C(size, 2); jaccards ordered and in range
      assert(nPairs >= size - 1 && nPairs <= size * (size - 1) / 2)
      assert(minJ >= 0.5 && minJ <= meanJ + 1e-9 && meanJ <= 1.0)
    }
    // cluster membership total equals the nodes of the pair graph
    val pairs = SparkEntry.queries("minhash_neardup")(spark, sf)
    val nodes = pairs.select($"doc_a").union(pairs.select($"doc_b"))
      .distinct().count()
    assert(rows.map(_._2).sum == nodes)
  }

  test("embed_project: JL norm estimate tracks the true norm") {
    val rows = SparkEntry.queries("embed_project")(spark, sf)
      .as[(Long, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, csv, _, _) =>
      assert(csv.split(",").length == 16, "16 projection lanes expected")
    }
    // random projection is unbiased: the mean norm ratio is ~1 with
    // per-vector spread; a generous band still catches a wrong scale
    // factor (√(d/k) off by √2 would land at 0.7 or 1.4)
    val ratios = rows.map { case (_, _, est, tru) => est / tru }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean off")
  }

  test("incremental_neardup: probes recovered; corpus bands semi-pruned") {
    val df = SparkEntry.queries("incremental_neardup")(spark, sf)
    val rows = df.as[(Long, Long, Double)].collect()
    // every planted appended-token twin (id = source + 10^7) matches
    // its source corpus doc above tau
    val probeSrcs = Tables.documents(spark, sf)
      .filter($"doc_id" % 10 =!= 0 && $"doc_id" % 23 === 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(probeSrcs.nonEmpty)
    val recovered = probeSrcs.count(src =>
      rows.exists(r => r._1 == src + 10000000L && r._2 == src && r._3 >= 0.5))
    // short docs can fall under tau legitimately; most must recover
    assert(recovered * 2 > probeSrcs.size,
      s"only $recovered of ${probeSrcs.size} planted twins recovered")
    // the scale claim: corpus bands pass through a semi-join against
    // the batch's bands before pair generation (work ∝ increment)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"corpus side not semi-pruned by batch bands:\n${plan.take(1200)}")
    assert(plan.contains("bounded_min_set"),
      "pair generation bypasses CandidatePairs")
  }

  test("key_skew_spectrum: mass conservation and spectrum shape") {
    val rows = SparkEntry.queries("key_skew_spectrum")(spark, sf)
      .as[(Long, Long)].collect()
    val li = Tables.lineitem(spark, sf)
    // sum(mult * n_keys) = corpus rows; sum(n_keys) = distinct keys
    assert(rows.map(r => r._1 * r._2).sum == li.count())
    assert(rows.map(_._2).sum ==
      li.select($"l_orderkey").distinct().count())
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("winnow_containment candidates route through CandidatePairs") {
    // the gram self-join guard: candidate generation must use the
    // bounded bucket aggregation, so a boilerplate 6-gram in m docs
    // is hash-chunked instead of one task owning C(m,2) pairs
    val plan = SparkEntry.queries("winnow_containment")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bounded_min_set"),
      s"gram candidates bypass CandidatePairs:\n${plan.take(1200)}")
  }

  test("winnowing: shared ≥6-token run ⇒ shared fingerprint; density < grams") {
    // The winnowing guarantee, on planted docs: doc 1 and doc 2 share
    // a 10-token run inside otherwise-disjoint text ⇒ at least one
    // common fingerprint. Doc 3 is disjoint from both ⇒ no overlap
    // (hash collisions aside, ~2^-64).
    val run = (0 until 10).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"one two three four five $run six seven"),
      (3L, "completely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = Pipeline.winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)

    // Fixture-wide: fingerprint density stays below the gram count
    // (that is the point of winnowing) and the operator is
    // deterministic. (The driver row is `winnow_containment`, which
    // oracle-gates the guarantee corpus-wide; these are the
    // hash-valued properties that stay engine-side.)
    def fixtureFps() = Pipeline.winnowFingerprints(
        Tables.documents(spark, sf).select($"doc_id", $"text"))
      .select($"doc_id", size($"fps").cast("long").as("n_fp"),
        aggregate($"fps", lit(0L), (acc, x) => acc.bitwiseXOR(x))
          .as("fp_xor"))
      .orderBy($"doc_id").collect()
    val out = fixtureFps()
    assert(out.length == Tables.documents(spark, sf).count())
    val grams = Tables.documents(spark, sf)
      .select($"doc_id", (size(split($"text", " ")) - 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val g = grams(r.getLong(0))
      if (g >= 4) assert(r.getLong(1) <= g - 3,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} fingerprints from $g grams")
    }
    val again = fixtureFps().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(2)).toMap == again)
  }

  test("lang_id probes separate the scores and predict their language") {
    // the es/de probe rows exist precisely so the heuristic's scores
    // are not all-zero ties: each probe must be predicted as its own
    // language WITH a strictly dominant score (mechanism, not tiebreak)
    val rows = Pipeline.queries("lang_id_heuristic")(spark, sf)
      .filter($"doc_id" < 0)
      .collect().map(r => r.getString(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getString(5))).toMap
    val (_, es2, de2, predEs) = rows("es")
    assert(predEs == "es" && es2 > 0 && es2 > de2)
    val (en3, es3, de3, predDe) = rows("de")
    assert(predDe == "de" && de3 > 0 && de3 > es3 && de3 > en3)
  }

  test("bootstrap_means: replicates bracket the true mean, Poisson-ish n_eff") {
    val rows = Pipeline.queries("bootstrap_means")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 32 && rows.map(_._1).toSet == (1L to 32L).toSet)
    val stats = Tables.documents(spark, sf)
      .agg(count(lit(1)), avg($"n_chars")).first()
    val (n, trueMean) = (stats.getLong(0), stats.getDouble(1))
    rows.foreach { case (rep, nEff, m) =>
      // Poisson(1) total weight concentrates at n (sd √n): ±20% is >6σ
      assert(math.abs(nEff - n) <= 0.2 * n, s"rep $rep n_eff=$nEff vs n=$n")
      assert(math.abs(m - trueMean) <= 0.2 * trueMean,
        s"rep $rep mean=$m vs true=$trueMean")
    }
    // replicates genuinely vary (the CI is not degenerate)
    assert(rows.map(_._3).distinct.length > 10)
  }

  test("padding_waste: buckets are tight powers of two, sums conserve") {
    val rows = Pipeline.queries("padding_waste")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, _, _, _) =>
      assert((bucket & (bucket - 1)) == 0L, s"bucket $bucket not a pow2")
    }
    val total = Tables.documents(spark, sf)
      .select(explode(split($"text", " "))).count()
    assert(rows.map(_._3).sum == total, "token mass must conserve")
    // tightness: a doc in bucket b has b/2 < n_tokens <= b, so
    // per-bucket padding < tokens_in_bucket (except the 1-bucket)
    rows.filter(_._1 > 1).foreach { case (b, nd, toks, pad) =>
      assert(pad < toks + nd, s"bucket $b padding $pad too large")
    }
  }

  test("cumulative_uniques: monotone and lands on the true distinct count") {
    val got = graft.SparkEntry.queries("cumulative_uniques")(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    got.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0)._4 <= p(1)._4, "cum_users must be monotone")
    }
    val totalUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(got.last._4 == totalUsers)
    assert(got.map(_._3).sum == totalUsers, "first touches partition users")
  }

  test("source_entropy: bounded by ln(types) and equals the direct sum") {
    val rows = Pipeline.queries("source_entropy")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, types, h) =>
      assert(h >= 0.0, s"$src negative entropy")
      assert(h <= math.log(types.toDouble) + 1e-6,
        s"$src entropy $h above ln($types)")
      assert(n >= types)
    }
    // exact micro-nat recomputation for one source from the raw text
    val (src0, n0, _, h0) = rows.minBy(_._1)
    val counts = Tables.documents(spark, sf)
      .filter($"source" === src0)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").count().collect().map(_.getLong(1))
    val n = counts.sum
    assert(n == n0)
    val micro = counts.map { c =>
      math.floor((c.toDouble / n) * math.log(n.toDouble / c) * 1e6 + 0.5).toLong
    }.sum
    assert(h0 == micro.toDouble / 1e6, s"$src0 entropy mismatch")
  }

  test("mixture_apportion: sum is exactly K, each alloc within 1 of quota") {
    val rows = Pipeline.queries("mixture_apportion")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val k = 300L
    assert(rows.map(_._3).sum === k, "largest remainder must hit K exactly")
    val n = rows.map(_._2).sum
    rows.foreach { case (src, ni, alloc) =>
      val base = k * ni / n
      assert(alloc == base || alloc == base + 1,
        s"$src alloc $alloc outside [floor, floor+1] of quota $base")
    }
  }

  test("phrase_search: counts equal an independent sliding-window scan") {
    val got = Pipeline.queries("phrase_search")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        r.getLong(0) -> toks.sliding(2).count(w =>
          w.length == 2 && w(0) == "table" && w(1) == "hash").toLong
      }.filter(_._2 > 0).toMap
    assert(got === want)
    assert(want.nonEmpty)
  }
}
