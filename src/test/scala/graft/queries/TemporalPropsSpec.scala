package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative equivalence for the temporal joins: random event frames
  * (small key space and coarse timestamps to force collisions and
  * boundary ties) run through the scalable Spark forms and an
  * INDEPENDENT sequential Scala implementation of each definition —
  * the CurationPropsSpec pattern. Catches boundary/tie/pruning drift
  * the fixed-example tests can't enumerate.
  */
/** Top-level for the Spark product encoder. */
case class Row3(key: Long, id: Long, ts: Long, v: Double)

class TemporalPropsSpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[Row3]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.chooseNum(1L, 3L)   // few keys -> dense per-key history
      id <- Gen.chooseNum(0L, 10000L)
      ts <- Gen.chooseNum(0L, 20L)   // coarse -> frequent exact ties
      v <- Gen.chooseNum(0, 9).map(_ / 2.0)
    } yield Row3(key, id, ts, v))
  } yield
    // unique ids across the frame (the operator contract's tie-break key)
    rows.zipWithIndex.map { case (r, i) => r.copy(id = r.id * 100 + i) }

  private def refAsof(lefts: Seq[Row3], rights: Seq[Row3]): Set[(Long, Long, Option[Long])] =
    lefts.map { l =>
      val cands = rights.filter(r => r.key == l.key && r.ts <= l.ts)
      val best =
        if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r.ts, r.id)).id)
      (l.id, l.ts, best)
    }.toSet

  private def refRange(lefts: Seq[Row3], rights: Seq[Row3],
      span: Long): Set[(Long, Long)] =
    (for {
      l <- lefts; r <- rights
      if r.key == l.key && r.ts > l.ts && r.ts <= l.ts + span
    } yield (l.id, r.id)).toSet

  test("asofJoin equals the sequential definition on random frames (ties included)") {
    val gen = for { l <- genRows; r <- genRows } yield (l, r)
    val cases = Gen.listOfN(25, gen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (ls, rs0) =>
      // re-unique right ids against the left frame (tie-break contract)
      val rs = rs0.map(r => r.copy(id = r.id + 1000000L))
      val lDf = ls.toDF("key", "id", "ts", "v")
      val rDf = rs.map(r => (r.key, r.ts, r.id, r.v))
        .toDF("key", "ts", "r_id", "r_v")
      val got = Temporal.asofJoin(lDf, rDf, Seq("key"), "ts", "r_id")
        .select(col("id"), col("ts"),
          col("r_id"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1),
          Option(x.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      assert(got == refAsof(ls, rs), s"asof drift:\nL=$ls\nR=$rs")
    }
  }

  test("rangeJoin equals the sequential definition across bin sizes") {
    val gen = for { l <- genRows; r <- genRows } yield (l, r)
    val cases = Gen.listOfN(15, gen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (ls, rs) =>
      val span = 5L
      val lDf = ls.toDF("key", "a_id", "a_ts", "v").drop("v")
      val rDf = rs.toDF("key", "b_id", "b_ts", "v").drop("v")
      val want = refRange(ls, rs, span)
      for (bin <- Seq(0L, 2L, 5L, 7L)) {
        val got = Temporal.rangeJoin(lDf, rDf, Seq("key"), "a_ts", "b_ts",
            span, bin)
          .select(col("a_id"), col("b_id")).collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        assert(got == want, s"range drift at bin=$bin:\nL=$ls\nR=$rs")
      }
    }
  }
}
