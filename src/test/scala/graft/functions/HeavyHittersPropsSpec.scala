package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative properties of the Misra-Gries heavy-hitters aggregate:
  * random Zipf-ish streams under random partitionings must satisfy the
  * published guarantees whatever the merge order — exactness under
  * capacity, lower/upper count bounds, and frequent-item survival
  * above the N/capacity threshold. One Spark pass evaluates each
  * generated stream (per-sample jobs would be 1000× the cost).
  */
class HeavyHittersPropsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // skewed streams: a few hot items over a long randomized tail
  private val genStream: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(50, 400)
    hotShare <- Gen.chooseNum(10, 60)
    tailCard <- Gen.chooseNum(5, 120)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { _ =>
      if (rnd.nextInt(100) < hotShare) s"hot${rnd.nextInt(3)}"
      else s"t${rnd.nextInt(tailCard)}"
    }
  }

  test("property: exact when distinct <= capacity, any partitioning") {
    GraftFunctions.register(spark)
    for ((words, i) <- sample(genStream, 12).zipWithIndex) {
      val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }
      val cap = truth.size + 1 // always above distinct count
      val got = words.toDF("w").repartition(1 + i % 5)
        .agg(expr(s"graft_heavy_hitters(w, $cap, ${truth.size})").as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.cnt", $"e.max_err")
        .as[(String, Long, Long)].collect().toSeq
      assert(got.map(t => (t._1, t._2)) == truth, s"stream $i")
      assert(got.forall(_._3 == 0L), s"stream $i: exact regime max_err")
    }
  }

  test("property: under overflow, bounds and the frequency guarantee hold") {
    GraftFunctions.register(spark)
    for ((words, i) <- sample(genStream, 12).zipWithIndex) {
      val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cap = math.max(4, truth.size / 4) // force the approximate regime
      val got = words.toDF("w").repartition(1 + i % 5)
        .agg(expr(s"graft_heavy_hitters(w, $cap, $cap)").as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.cnt", $"e.max_err")
        .as[(String, Long, Long)].collect().toSeq
      assert(got.size <= cap, s"stream $i: state bound")
      got.foreach { case (w, cnt, err) =>
        assert(cnt <= truth(w), s"stream $i/$w: lower bound")
        assert(cnt + err >= truth(w), s"stream $i/$w: upper bound")
      }
      // Misra-Gries guarantee: every item above N/cap survives (the
      // batch-decrement update's bound). Partial buffers each satisfy
      // it per-slice and the truncating merge only removes items below
      // the (cap+1)-th count, so a globally-frequent item cannot vanish.
      val n = words.size.toLong
      val surv = got.map(_._1).toSet
      truth.collect { case (w, c) if c > n / cap => w }
        .foreach(w => assert(surv.contains(w),
          s"stream $i: frequent item $w (${truth(w)}/$n, cap $cap) dropped"))
    }
  }
}
