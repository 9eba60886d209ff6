package graft

import graft.operators.{BpeTrainer, DupGraph, TextDedup}
import scala.util.Random

/** Randomized equivalence fuzz for the round-5 operators: each
  * distributed implementation is replayed against an obviously-correct
  * sequential reference over many small random inputs (fixed seeds —
  * deterministic CI). The same discipline as the union-find CC fuzz.
  */
class Round5FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("BPE merges match the sequential reference on random corpora") {
    for (seed <- 1 to 12) {
      val rnd = new Random(seed)
      val alphabet = "abcd"
      def word() = (0 until (1 + rnd.nextInt(5)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = Seq.tabulate(3)(i =>
        (i.toLong, Seq.fill(4 + rnd.nextInt(8))(word()).mkString(" ")))
      // sequential Sennrich reference
      var vocab = docs.flatMap(_._2.split("\\s+")).groupBy(identity)
        .map { case (w, ws) => w -> (ws.size.toLong, w.map(_.toString).toList) }
      val expect = Seq.newBuilder[(Long, String, String, Long)]
      var alive = true
      for (it <- 1 to 3 if alive) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((_, (f, syms)) <- vocab; i <- 0 until syms.length - 1)
          pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (pairs.isEmpty) alive = false
        else {
          val ((l, r), c) = pairs.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
          expect += ((it.toLong, l, r, c))
          vocab = vocab.map { case (w, (f, syms)) =>
            val out = List.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            w -> (f, out.result())
          }
        }
      }
      if (alive) {
        val got = BpeTrainer.merges(docs.toDF("doc_id", "text"), "text", iterations = 3)
          .filter($"it" <= 3).orderBy($"it")
          .as[(Long, String, String, Long)].collect().toSeq
        assert(got == expect.result(), s"seed=$seed")
      }
    }
  }

  test("triangleCounts matches brute force on random graphs") {
    for (seed <- 1 to 8) {
      val rnd = new Random(100 + seed)
      val n = 10
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.35
      } yield (a.toLong, b.toLong))
      if (edges.nonEmpty) {
        val adj = edges.toSet
        def connected(x: Long, y: Long) = adj(( x min y, x max y))
        val expect = (0L until n).flatMap { v =>
          val nbrs = edges.collect {
            case (a, b) if a == v => b
            case (a, b) if b == v => a
          }
          if (nbrs.isEmpty) None
          else {
            val tris = (for {
              i <- nbrs.indices; j <- i + 1 until nbrs.length
              if connected(nbrs(i), nbrs(j))
            } yield 1).size.toLong
            Some((v, nbrs.size.toLong, tris))
          }
        }
        val got = DupGraph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
          .orderBy($"node").select($"node", $"degree", $"triangles")
          .as[(Long, Long, Long)].collect().toSeq
        assert(got == expect.sortBy(_._1), s"seed=$seed")
      }
    }
  }

  test("kCore matches sequential peeling on random graphs") {
    for (seed <- 1 to 8; k <- Seq(2, 3)) {
      val rnd = new Random(200 + seed)
      val n = 12
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.3
      } yield (a.toLong, b.toLong))
      if (edges.nonEmpty) {
        var cur = edges.toSet
        var stable = false
        while (!stable && cur.nonEmpty) {
          val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (v, vs) => v -> vs.size }
          val keep = deg.filter(_._2 >= k).keySet
          val next = cur.filter(e => keep(e._1) && keep(e._2))
          stable = next == cur
          cur = next
        }
        val expect = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
          .filter(_._2 >= k).toSeq.sorted
        val got = DupGraph.kCore(edges.toDF("src", "dst"), "src", "dst", k, maxIters = 20)
          .orderBy($"node").as[(Long, Long)].collect().toSeq
        assert(got == expect, s"seed=$seed k=$k")
      }
    }
  }

  test("labelPropagate matches the synchronous-round reference") {
    for (seed <- 1 to 8) {
      val rnd = new Random(300 + seed)
      val n = 12
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.25
      } yield (a.toLong, b.toLong))
      val seeds = (0 until n).filter(_ => rnd.nextDouble() < 0.3)
        .map(v => (v.toLong, (rnd.nextInt(3) + 1).toLong))
      if (edges.nonEmpty && seeds.nonEmpty) {
        val nbrs = (0L until n).map { v =>
          v -> edges.collect {
            case (a, b) if a == v => b
            case (a, b) if b == v => a
          }
        }.toMap
        var labels = seeds.toMap.map { case (v, l) => v -> (l, 0L) }
        for (round <- 1L to 2L) {
          val newly = (0L until n)
            .filter(v => !labels.contains(v))
            .flatMap { v =>
              val votes = nbrs(v).flatMap(u => labels.get(u).map(_._1))
                .groupBy(identity).map { case (l, ls) => (l, ls.size) }
              if (votes.isEmpty) None
              else Some(v -> (votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1, round))
            }
          labels = labels ++ newly
        }
        val expect = labels.toSeq.map { case (v, (l, r)) => (v, l, r) }.sorted
        val got = DupGraph.labelPropagate(
          edges.toDF("src", "dst"), "src", "dst",
          seeds.toDF("node", "lbl"), "node", "lbl", iters = 2)
          .orderBy($"node").as[(Long, Long, Long)].collect().toSeq
        assert(got == expect, s"seed=$seed")
      }
    }
  }

  test("ewmaTrailing matches the sequential reference on random series") {
    import graft.operators.SeriesStats
    for (seed <- 1 to 6) {
      val rnd = new Random(500 + seed)
      val rows = (1 to 20).map(i =>
        (i % 3L, i.toLong, if (rnd.nextDouble() < 0.15) None else Some(rnd.nextInt(100).toDouble)))
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val ordered = es.sortBy(_._2)
        ordered.indices.map { i =>
          val lags = (0 until 8).flatMap { j =>
            if (i - j < 0) None else ordered(i - j)._3.map(v => (v, math.pow(0.5, j)))
          }
          val e = if (lags.isEmpty) None
            else Some(math.round(lags.map(l => l._1 * l._2).sum / lags.map(_._2).sum * 1e6) / 1e6)
          (u, ordered(i)._2, e)
        }
      }.sortBy(r => (r._1, r._2))
      val got = rows.toDF("u", "seq", "value")
        .select($"u", $"seq",
          SeriesStats.ewmaTrailing(Seq("u"), Seq("seq"), "value").as("e"))
        .orderBy($"u", $"seq").as[(Long, Long, Option[Double])].collect().toSeq
      assert(got == expect, s"seed=$seed")
    }
  }

  test("paddingWaste matches the sequential batch accounting") {
    import graft.operators.Curation
    for (seed <- 1 to 6; bs <- Seq(3, 4)) {
      val rnd = new Random(600 + seed)
      val rows = (1 to 25).map(i => ("g" + (i % 2), i.toLong, (1 + rnd.nextInt(50)).toLong))
      def bill(ordered: Seq[Long]) =
        ordered.grouped(bs).map(b => b.max * b.size).sum
      val expect = rows.groupBy(_._1).toSeq.map { case (g, es) =>
        (g, es.map(_._3).sum,
          bill(es.sortBy(_._2).map(_._3)),
          bill(es.sortBy(e => (e._3, e._2)).map(_._3)))
      }.sortBy(_._1)
      val got = Curation.paddingWaste(
        rows.toDF("g", "id", "len"), "g", "id", "len", batchSize = bs)
        .orderBy($"g").as[(String, Long, Long, Long)].collect().toSeq
      assert(got == expect, s"seed=$seed bs=$bs")
    }
  }

  test("minhash estimate equals the per-position signature agreement") {
    import graft.functions.TextFunctions
    for (seed <- 1 to 4) {
      val rnd = new Random(700 + seed)
      val words = Seq("aa", "bb", "cc", "dd", "ee")
      // near-dup docs: shared prefix, noisy tail — guarantees candidates
      val base = Seq.fill(12)(words(rnd.nextInt(words.length))).mkString(" ")
      val docs = Seq.tabulate(4)(i =>
        (i.toLong, base + " " + Seq.fill(2)(words(rnd.nextInt(words.length))).mkString(" ")))
        .toDF("doc_id", "text")
      val acc = TextDedup.minhashEstimateAccuracy(docs, "doc_id", "text")
        .as[(Long, Long, Double, Double, Double)].collect()
      // recompute both measures from first principles per pair
      val sigs = docs.select($"doc_id",
        TextFunctions.minhashSignature(
          TextFunctions.hash60Array(TextFunctions.shingles(TextFunctions.tokens($"text"), 2)), 12).as("sig"),
        TextFunctions.hash60Array(TextFunctions.shingles(TextFunctions.tokens($"text"), 2)).as("sh"))
        .as[(Long, Seq[Long], Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
      for ((a, b, est, jac, err) <- acc) {
        val (sa, ha) = sigs(a); val (sb, hb) = sigs(b)
        val expEst = math.round(sa.zip(sb).count(p => p._1 == p._2) / 12.0 * 1e4) / 1e4
        val inter = ha.toSet.intersect(hb.toSet).size.toDouble
        val expJac = math.round(inter / ha.toSet.union(hb.toSet).size * 1e4) / 1e4
        assert(est == expEst && jac == expJac &&
          err == math.round(math.abs(expEst - expJac) * 1e4) / 1e4, s"seed=$seed pair=($a,$b)")
      }
    }
  }

  test("ngramNovelty matches brute force on random corpora") {
    for (seed <- 1 to 6) {
      val rnd = new Random(400 + seed)
      val vocabW = Seq("aa", "bb", "cc", "dd")
      val docs = Seq.tabulate(4)(i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(6))(vocabW(rnd.nextInt(vocabW.length))).mkString(" ")))
      val n = 3
      val grams = docs.map { case (id, t) =>
        id -> t.split("\\s+").toSeq.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      }
      val docsPerGram = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expect = grams.collect { case (id, gs) if gs.nonEmpty =>
        val shared = gs.count(g => docsPerGram(g) > 1)
        (id, gs.size.toLong, shared.toLong,
          math.round((1.0 - shared.toDouble / gs.size) * 1e6) / 1e6)
      }.sortBy(_._1)
      val got = TextDedup.ngramNovelty(docs.toDF("doc_id", "text"), "doc_id", "text", n = n)
        .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect().toSeq
      assert(got == expect, s"seed=$seed")
    }
  }
}
