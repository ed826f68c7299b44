package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative properties of the sum-then-top-k aggregate: random
  * contribution arrays (including negative adds and empty arrays)
  * under random partitionings and random k must reproduce the
  * two-level reference (sum per id, rank by sum desc / id asc) exactly
  * whatever the merge order — integer sums are order-free, so any
  * divergence is a buffer-lifecycle bug. */
class SumTopKPropsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // rows of (group, contributions): few groups, clashing ids, signed adds
  private val genData: Gen[(Seq[(Long, Seq[(Long, Long)])], Int)] = for {
    nRows <- Gen.chooseNum(1, 60)
    nGroups <- Gen.chooseNum(1, 4)
    idCard <- Gen.chooseNum(1, 12)
    k <- Gen.chooseNum(1, 6)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val rows = Seq.tabulate(nRows) { _ =>
      val g = rnd.nextInt(nGroups).toLong
      val arr = Seq.fill(rnd.nextInt(5))(
        (rnd.nextInt(idCard).toLong, (rnd.nextInt(21) - 10).toLong))
      (g, arr)
    }
    (rows, k)
  }

  test("property: equals the two-level sum + rank reference under any partitioning") {
    GraftFunctions.register(spark)
    for (((rows, k), i) <- sample(genData, 12).zipWithIndex) {
      val want: Map[Long, Seq[(Long, Long)]] = rows.groupBy(_._1).map {
        case (g, rs) =>
          val sums = rs.flatMap(_._2).groupBy(_._1).view
            .mapValues(_.map(_._2).sum).toSeq
          g -> sums.sortBy { case (id, s) => (-s, id) }.take(k)
      }
      val got = rows.toDF("g", "contribs")
        .select(col("g"), expr(
          "transform(contribs, c -> named_struct('id', c._1, 'add', c._2))")
          .as("contribs"))
        .repartition(1 + i % 5)
        .groupBy(col("g"))
        .agg(call_udf("graft_sum_topk", col("contribs"), lit(k)).as("top"))
        .select(col("g"), col("top"))
        .as[(Long, Seq[(Long, Long)])].collect().toMap
      assert(got == want, s"sample $i (k=$k): got=$got want=$want")
    }
  }
}
