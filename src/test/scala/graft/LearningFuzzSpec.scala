package graft

import graft.operators.{Clustering, Curation, Learning, Retrieval}
import scala.math.BigDecimal.RoundingMode
import scala.util.Random

/** Randomized equivalence fuzz for the learned-scoring / placement /
  * evaluation operators: every distributed implementation replays
  * against an obviously-correct sequential reference over many small
  * random inputs (fixed seeds — deterministic CI). Same discipline as
  * Round5FuzzSpec.
  */
class LearningFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) = BigDecimal(x).setScale(4, RoundingMode.HALF_UP).toDouble

  test("logisticRegressionGD matches the sequential reference") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val nDims = 1 + rnd.nextInt(3)
      val n = 20 + rnd.nextInt(30)
      val data = Seq.tabulate(n) { _ =>
        (Array.fill(nDims)((rnd.nextDouble() * 4 - 2).toFloat), rnd.nextInt(2).toDouble)
      }
      val lr = 0.5 + rnd.nextInt(3) * 0.5
      // sequential reference: identical rounding schedule
      val xs = data.map { case (v, _) => v.map(_.toDouble) :+ 1.0 }
      val ys = data.map(_._2)
      var w = Array.fill(nDims + 1)(0.0)
      def probs() = xs.map { x =>
        val m = r6(x.zip(w).map { case (a, b) => a * b }.sum)
        1.0 / (1.0 + math.exp(-m))
      }
      for (_ <- 1 to 3) {
        val p = probs()
        val g = Array.tabulate(nDims + 1)(j =>
          xs.indices.map(i => (p(i) - ys(i)) * xs(i)(j)).sum / n)
        w = w.indices.map(j => r6(w(j) - lr * g(j))).toArray
      }
      val pFin = probs()
      val accRef = r4(xs.indices.count(i => (pFin(i) >= 0.5) == (ys(i) > 0.5)).toDouble / n)
      val got = Learning.logisticRegressionGD(
        data.toDF("vec", "y"), "vec", "y", nDims, iters = 3, lr = lr)
        .orderBy("dim").collect()
      assert(got.map(_.getAs[Double]("weight")).toSeq == w.toSeq, s"seed=$seed weights")
      assert(got.head.getAs[Double]("accuracy") == accRef, s"seed=$seed accuracy")
    }
  }

  test("aucRankSum matches brute-force pair counting with ties") {
    for (seed <- 1 to 10) {
      val rnd = new Random(10 + seed)
      val n = 10 + rnd.nextInt(40)
      // coarse scores force ties
      val data = Seq.fill(n)((rnd.nextInt(6) / 4.0, rnd.nextInt(2)))
      val nPos = data.count(_._2 == 1)
      if (nPos > 0 && nPos < n) {
        val pos = data.filter(_._2 == 1).map(_._1)
        val neg = data.filter(_._2 == 0).map(_._1)
        val wins = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val ref = r6(wins / (pos.size.toDouble * neg.size))
        val got = Learning.aucRankSum(data.toDF("s", "y"), "s", "y")
          .collect().head.getAs[Double]("auc")
        assert(got == ref, s"seed=$seed")
      }
    }
  }

  test("ksTwoSample matches the brute-force CDF scan") {
    for (seed <- 1 to 10) {
      val rnd = new Random(20 + seed)
      val a = Seq.fill(5 + rnd.nextInt(30))(rnd.nextInt(10) / 2.0)
      val b = Seq.fill(5 + rnd.nextInt(30))(rnd.nextInt(10) / 2.0 + rnd.nextInt(2))
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
      val ref = r6((a ++ b).distinct.map { v =>
        math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
      }.max)
      val got = Learning.ksTwoSample(df, "v", "g", "a", "b")
        .collect().head.getAs[Double]("ks_stat")
      assert(got == ref, s"seed=$seed")
    }
  }

  test("giniBySource matches the direct Lorenz computation") {
    for (seed <- 1 to 10) {
      val rnd = new Random(30 + seed)
      val xs = Seq.fill(3 + rnd.nextInt(25))(rnd.nextInt(100).toDouble)
      val sorted = xs.sorted
      val nn = xs.size
      val ref = r6(2.0 * sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum /
        (nn * sorted.sum) - (nn + 1.0) / nn)
      val got = Curation.giniBySource(xs.map(("s", _)).toDF("src", "x"), "src", "x")
        .collect().head.getAs[Double]("gini")
      assert(got == ref, s"seed=$seed")
    }
  }

  test("paretoFront2D matches the quadratic dominance filter") {
    for (seed <- 1 to 10) {
      val rnd = new Random(40 + seed)
      val pts = Seq.tabulate(5 + rnd.nextInt(40))(i =>
        (i.toLong, rnd.nextInt(8).toDouble, rnd.nextInt(8).toLong))
      val ref = pts.filter { case (id, x, y) =>
        !pts.exists { case (qid, qx, qy) =>
          (qx > x && qy >= y) || (qx == x && qy > y) ||
            (qx == x && qy == y && qid < id)
        }
      }.map(_._1).toSet
      val got = Curation.paretoFront2D(pts.toDF("id", "x", "y"), "x", "y", Seq("id"))
        .select("id").as[Long].collect().toSet
      assert(got == ref, s"seed=$seed")
    }
  }

  test("kCenterGreedy matches the sequential farthest-first traversal") {
    for (seed <- 1 to 6) {
      val rnd = new Random(50 + seed)
      val n = 8 + rnd.nextInt(20)
      val pts = Seq.tabulate(n)(i =>
        (i.toLong, Array.fill(2)((rnd.nextInt(20) - 10).toFloat)))
      val k = 2 + rnd.nextInt(3)
      def dist(a: Array[Float], b: Array[Float]) =
        r6(math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum))
      var centers = Vector(pts.minBy(_._1))
      var dmin = pts.map(p => p._1 -> dist(p._2, centers.head._2)).toMap
      var expect = Vector((1L, centers.head._1, dmin.values.max))
      for (step <- 2 to k) {
        val next = pts.filter(p => true).minBy(p => (-dmin(p._1), p._1))
        centers = centers :+ next
        dmin = pts.map(p => p._1 -> math.min(dmin(p._1), dist(p._2, next._2))).toMap
        expect = expect :+ ((step.toLong, next._1, dmin.values.max))
      }
      val got = Clustering.kCenterGreedy(pts.toDF("id", "v"), "id", "v", k)
        .orderBy("step").as[(Long, Long, Double)].collect().toVector
      assert(got == expect, s"seed=$seed")
    }
  }

  test("ndcg matches the direct computation on random gain lists") {
    for (seed <- 1 to 10) {
      val rnd = new Random(60 + seed)
      val rows = for {
        q <- 1 to 3; r <- 1 to (2 + rnd.nextInt(6))
      } yield (q.toLong, r.toLong, rnd.nextInt(3).toDouble)
      val got = Retrieval.ndcg(rows.toDF("query_id", "rank", "rel"))
        .orderBy("query_id").collect()
      for (row <- got) {
        val q = row.getAs[Long]("query_id")
        val mine = rows.filter(_._1 == q)
        val dcg = r6(mine.map { case (_, r, rel) => rel / (math.log(r + 1) / math.log(2)) }.sum)
        val ideal = mine.sortBy { case (_, r, rel) => (-rel, r) }.zipWithIndex
        val idcg = r6(ideal.map { case ((_, _, rel), i) =>
          rel / (math.log(i + 2) / math.log(2)) }.sum)
        val ndcgRef = if (idcg == 0.0) 0.0 else r6(dcg / idcg)
        assert(row.getAs[Double]("dcg") == dcg, s"seed=$seed q=$q dcg")
        assert(row.getAs[Double]("idcg") == idcg, s"seed=$seed q=$q idcg")
        assert(row.getAs[Double]("ndcg") == ndcgRef, s"seed=$seed q=$q ndcg")
      }
    }
  }

  test("mmrSelect matches the sequential greedy MMR") {
    for (seed <- 1 to 8) {
      val rnd = new Random(90 + seed)
      val nCand = 4 + rnd.nextInt(6)
      val cand = (0 until nCand).map(i => (1L, i.toLong, rnd.nextInt(1000) / 1000.0))
      val simMap = (for {
        a <- 0 until nCand; b <- 0 until nCand if a != b
      } yield {
        val key = (math.min(a, b), math.max(a, b))
        key -> key
      }).distinct.map { case (k, _) => k -> rnd.nextInt(1000) / 1000.0 }.toMap
      val sims = simMap.toSeq.flatMap { case ((a, b), s) =>
        Seq((1L, a.toLong, b.toLong, s), (1L, b.toLong, a.toLong, s)) }
      val k = 2 + rnd.nextInt(2)
      // sequential reference in micro-units
      val relU = cand.map { case (_, id, r) => id -> math.round(r * 1e6) }.toMap
      def simU(a: Long, b: Long) =
        math.round(simMap((math.min(a, b).toInt, math.max(a, b).toInt)) * 1e6)
      var sel = Vector.empty[(Long, Long)] // (id, score)
      var rem = cand.map(_._2).toSet
      for (step <- 1 to k) {
        val scored = rem.toSeq.map { id =>
          val ms = if (sel.isEmpty) 0L else sel.map(s => simU(id, s._1)).max
          id -> (7L * relU(id) - (if (sel.isEmpty) 0L else 3L * ms))
        }
        val (pickId, pickScore) = scored.minBy { case (id, sc) => (-sc, id) }
        sel = sel :+ ((pickId, pickScore))
        rem -= pickId
      }
      val got = graft.operators.Retrieval.mmrSelect(
        cand.toDF("query_id", "cand_id", "rel"),
        sims.toDF("query_id", "a", "b", "s"), k)
        .orderBy("step").select("cand_id", "score").as[(Long, Long)].collect().toVector
      assert(got == sel, s"seed=$seed")
    }
  }

  test("splitConformal matches the sequential order statistic and coverage") {
    for (seed <- 1 to 10) {
      val rnd = new Random(110 + seed)
      val cal = Seq.fill(5 + rnd.nextInt(40))(rnd.nextInt(500) / 10.0)
      val test = Seq.fill(5 + rnd.nextInt(40))(rnd.nextInt(500) / 10.0)
      val alpha = Seq(0.05, 0.1, 0.2)(rnd.nextInt(3))
      val n = cal.size
      val k = math.min(n, math.ceil((n + 1) * (1 - alpha)).toInt)
      val qhat = cal.sorted.apply(k - 1)
      val cov = r6(test.count(_ <= qhat).toDouble / test.size)
      val got = Learning.splitConformal(
        cal.toDF("s"), test.toDF("s"), "s", alpha).collect().head
      assert(got.getAs[Double]("qhat") == qhat, s"seed=$seed qhat")
      assert(got.getAs[Double]("coverage") == cov, s"seed=$seed coverage")
    }
  }

  test("mutualInfo matches the direct plug-in estimate") {
    for (seed <- 1 to 10) {
      val rnd = new Random(70 + seed)
      val rows = Seq.fill(20 + rnd.nextInt(60))(
        (s"a${rnd.nextInt(3)}", s"b${rnd.nextInt(3)}"))
      val n = rows.size.toDouble
      val joint = rows.groupBy(identity).view.mapValues(_.size).toMap
      val ma = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val mb = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val ref = r6(joint.map { case ((x, y), c) =>
        (c / n) * math.log(c * n / (ma(x).toDouble * mb(y))) }.sum)
      val got = Learning.mutualInfo(rows.toDF("a", "b"), "a", "b")
        .collect().head.getAs[Double]("mi")
      assert(got == ref, s"seed=$seed")
    }
  }

  test("bestStumpSplits matches the sequential threshold scan") {
    def h(p: Double) =
      if (p <= 0 || p >= 1) 0.0
      else -(p * math.log(p) + (1 - p) * math.log(1 - p))
    for (seed <- 1 to 8) {
      val rnd = new Random(140 + seed)
      val nDims = 1 + rnd.nextInt(3)
      val data = Seq.fill(15 + rnd.nextInt(40))(
        (Array.fill(nDims)((rnd.nextInt(40) - 20) / 10.0f), rnd.nextInt(2).toDouble))
      val ref = (0 until nDims).flatMap { dim =>
        // candidates = 1-dp-rounded values, exactly like the operator
        val pts = data.map { case (v, y) =>
          (BigDecimal(v(dim).toDouble).setScale(1, RoundingMode.HALF_UP).toDouble, y) }
        val n = pts.size; val post = pts.map(_._2).sum
        val hp = h(post / n)
        val cands = pts.map(_._1).distinct.sorted
        val splits = cands.map { t =>
          val left = pts.filter(_._1 <= t)
          val nl = left.size; val posl = left.map(_._2).sum
          (t, nl, n - nl,
            if (nl == n) Double.NaN
            else r6(hp - (nl.toDouble / n) * h(posl / nl)
              - ((n - nl).toDouble / n) * h((post - posl) / (n - nl))))
        }.filter(!_._4.isNaN)
        if (splits.isEmpty) None
        else {
          val best = splits.minBy { case (t, _, _, g) => (-g, t) }
          Some(dim.toLong -> best)
        }
      }.toMap
      val got = Learning.bestStumpSplits(data.toDF("vec", "y"), "vec", "y", nDims)
        .collect().map(r => r.getAs[Long]("dim") ->
          ((r.getAs[Double]("threshold"), r.getAs[Long]("n_left").toInt,
            r.getAs[Long]("n_right").toInt, r.getAs[Double]("gain")))).toMap
      assert(got == ref, s"seed=$seed")
    }
  }

  test("rendezvousShard matches the sequential HRW argmax") {
    def md5hex(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    for (seed <- 1 to 6) {
      val rnd = new Random(120 + seed)
      val n = 3 + rnd.nextInt(8)
      val keys = Seq.fill(30)(rnd.nextLong().abs % 100000)
      val ref = keys.distinct.map(k =>
        k -> (0 until n).maxBy(s => (md5hex(s"$k#$s"), s)).toLong).toMap
      val got = Curation.rendezvousShard(keys.distinct.toDF("k"), "k", n)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("shard")).toMap
      assert(got == ref, s"seed=$seed")
    }
  }

  test("bloomProbe matches the sequential bit-set simulation") {
    import graft.functions.TextFunctions.hash60Scala
    for (seed <- 1 to 6) {
      val rnd = new Random(130 + seed)
      val m = 256
      val kh = 3 + rnd.nextInt(3)
      val members = Seq.fill(40)(rnd.nextInt(10000).toLong).distinct
      val probes = Seq.fill(60)(rnd.nextInt(10000).toLong).distinct
      def bits(key: Long) = (0 until kh).map(j => hash60Scala(key.toString, j) % m).toSet
      val setBits = members.flatMap(bits).toSet
      val ref = probes.map(p => p -> bits(p).subsetOf(setBits)).toMap
      val bloom = graft.operators.Sketches.bloomBuild(members.toDF("key"), "key", kh, m)
      val got = graft.operators.Sketches.bloomProbe(bloom, probes.toDF("key"), "key", kh, m)
        .collect().map(r => r.getAs[Long]("key") -> r.getAs[Boolean]("bloom_pos")).toMap
      assert(got == ref, s"seed=$seed")
    }
  }

  test("chi2Presence matches the direct contingency computation") {
    for (seed <- 1 to 8) {
      val rnd = new Random(80 + seed)
      val classes = Seq("a", "b", "c")
      val nPerCls = classes.map(_ -> (4 + rnd.nextInt(8))).toMap
      val items = Seq("t1", "t2", "t3", "t4")
      // random presence: item i present in a doc with prob ~ classes-dependent
      val pairs = (for {
        cls <- classes; d <- 0 until nPerCls(cls); it <- items
        if rnd.nextDouble() < (if (cls == "a") 0.7 else 0.3)
      } yield (it, cls, d)) ++
        // classes absent from clsTotals (incl. null) never contribute;
        // an item seen ONLY under them emits no row (documented round-18
        // contract) — t5 must not appear, t1's chi2 must not move
        Seq(("t5", null, 0), ("t5", "zz", 1), ("t1", null, 0), ("t1", "zz", 2))
      val tot = nPerCls.toSeq.map { case (c, m) => (c, m.toLong) }
      val nn = nPerCls.values.sum.toDouble
      val ref = items.flatMap { it =>
        val o1 = classes.map(c => c -> pairs.count(p => p._1 == it && p._2 == c)).toMap
        val r1 = o1.values.sum.toDouble
        if (r1 == 0 || r1 >= nn) None
        else Some(it -> r6(classes.map { c =>
          val m = nPerCls(c).toDouble
          val e1 = m * r1 / nn; val e0 = m * (nn - r1) / nn
          math.pow(o1(c) - e1, 2) / e1 + math.pow(m - o1(c) - e0, 2) / e0
        }.sum))
      }.toMap
      val got = Learning.chi2Presence(
        pairs.map(p => (p._1, p._2)).toDF("item", "cls"), tot.toDF("cls", "n_cls"))
        .collect().map(r => r.getAs[String]("item") -> r.getAs[Double]("chi2")).toMap
      assert(got == ref, s"seed=$seed")
    }
  }
}
