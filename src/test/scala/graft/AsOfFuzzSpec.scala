package graft

import graft.operators.AsOfJoin
import scala.util.Random

/** Randomized equivalence fuzz for the as-of join: all three
  * directions replay against a sequential per-key reference over
  * seeded random inputs. Right timestamps are distinct per key (tied
  * right rows are nondeterministic-by-design in every as-of engine,
  * ours and DuckDB's alike); left timestamps duplicate freely and
  * intentionally collide with right timestamps to exercise the
  * inclusive boundary, and right value columns carry nulls to
  * exercise the atomic whole-row fill.
  */
class AsOfFuzzSpec extends SparkSpec {
  import spark.implicits._

  private case class R(k: Long, t: Long, rid: Long, rv: Option[Double])

  private def reference(
      lefts: Seq[(Long, Long, Long)], // (event_id, k, t)
      rights: Seq[R],
      direction: String): Map[Long, Option[Long]] = {
    val byKey = rights.groupBy(_.k)
    lefts.map { case (id, k, t) =>
      val rs = byKey.getOrElse(k, Nil)
      val b = rs.filter(_.t <= t).sortBy(_.t).lastOption
      val f = rs.filter(_.t >= t).sortBy(_.t).headOption
      val hit = direction match {
        case "backward" => b
        case "forward" => f
        case "nearest" => (b, f) match {
          case (Some(bb), Some(ff)) =>
            if (t - bb.t <= ff.t - t) Some(bb) else Some(ff)
          case (x, y) => x.orElse(y)
        }
      }
      id -> hit.map(_.rid)
    }.toMap
  }

  test("asofJoin matches the sequential reference in all three directions") {
    for (seed <- 1 to 10; direction <- Seq("backward", "forward", "nearest")) {
      val rnd = new Random(seed * 31 + direction.hashCode)
      val nKeys = 1 + rnd.nextInt(4)
      // distinct right times per key, drawn from a small grid so left
      // rows frequently land exactly on them
      val rights = (0 until nKeys).flatMap { k =>
        rnd.shuffle((0 until 40).toList).take(rnd.nextInt(6)).map { slot =>
          R(k.toLong, slot.toLong * 10, rnd.nextLong(1L << 40),
            if (rnd.nextInt(4) == 0) None else Some(rnd.nextDouble()))
        }
      }
      val lefts = Seq.tabulate(25) { i =>
        (i.toLong, rnd.nextInt(nKeys + 1).toLong, // +1 → keys with no rights
          (rnd.nextInt(41) * 10 - rnd.nextInt(2)).toLong) // on- and off-grid times
      }
      val want = reference(lefts, rights, direction)
      val got = AsOfJoin.asofJoin(
          lefts.toDF("event_id", "k", "t"),
          rights.map(r => (r.k, r.t, r.rid, r.rv)).toDF("k", "t", "rid", "rv"),
          Seq("k"), "t", Seq("rid", "rv"), direction)
        .select($"event_id", $"rid").as[(Long, Option[Long])].collect().toMap
      assert(got == want, s"seed=$seed direction=$direction")
    }
  }

  test("atomic fill holds under fuzz: matched rid and rv come from the same right row") {
    for (seed <- 50 to 55) {
      val rnd = new Random(seed)
      val rights = rnd.shuffle((0 until 30).toList).take(8).map { slot =>
        R(1L, slot.toLong * 10, slot.toLong,
          if (rnd.nextInt(2) == 0) None else Some(slot.toDouble))
      }
      val byRid = rights.map(r => r.rid -> r.rv).toMap
      val lefts = Seq.tabulate(15)(i => (i.toLong, 1L, rnd.nextInt(300).toLong))
      val got = AsOfJoin.asofJoin(
          lefts.toDF("event_id", "k", "t"),
          rights.map(r => (r.k, r.t, r.rid, r.rv)).toDF("k", "t", "rid", "rv"),
          Seq("k"), "t", Seq("rid", "rv"))
        .select($"rid", $"rv").as[(Option[Long], Option[Double])].collect()
      got.foreach {
        case (Some(rid), rv) => assert(rv == byRid(rid), s"seed=$seed rid=$rid")
        case (None, rv) => assert(rv.isEmpty, s"seed=$seed unmatched row carried a value")
      }
    }
  }
}
