package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative equivalence for the round-5 per-row text operators:
  * random corpora (small token alphabet to force cross-document
  * collisions, lengths 0..30) run through the Spark plans and an
  * INDEPENDENT sequential Scala implementation of each definition —
  * the k-means-trainer pattern. Catches expression-level drift
  * (slice bounds, fallback hashing, empty-text edges) that the
  * fixed-example tests can't enumerate.
  */
class CurationPropsSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference implementations ------------------------------

  private def md5hash31(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 2147483647L
  }

  private def toks(text: String): Vector[String] =
    text.split(" ", -1).toVector // Spark split keeps trailing empties

  private def refShingleHashes(text: String): Vector[Long] = {
    val t = toks(text)
    if (t.length >= 3)
      (0 to t.length - 3).map(i => md5hash31(t.slice(i, i + 3).mkString(" "))).toVector
    else Vector(md5hash31(t.mkString(" ")))
  }

  private def refWinnow(text: String, w: Int = 4): Set[Long] = {
    val hs = refShingleHashes(text)
    if (hs.length >= w)
      (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
    else Set(hs.min)
  }

  private def refDupRuns(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> refShingleHashes(t) }
    val docsPerHash = sh.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    sh.map { case (id, hs) =>
      val dupPos = hs.zipWithIndex.collect {
        case (h, p) if docsPerHash(h) >= 2 => p
      }
      // gaps and islands over the dup positions
      val runs = dupPos.foldLeft(List.empty[Int]) {
        case (len :: rest, p) if dupPos.contains(p - 1) => (len + 1) :: rest
        case (acc, _) => 1 :: acc
      }
      id -> (hs.length.toLong, dupPos.length.toLong,
        (if (runs.isEmpty) 0 else runs.max).toLong)
    }.toMap
  }

  private def refChunks(text: String, size: Int = 500, stride: Int = 400)
      : Seq[(Long, Long, Long)] = {
    val n = text.length
    val starts = 0 to math.max(n - 1, 0) by stride
    starts.zipWithIndex.map { case (st, i) =>
      (i.toLong, st.toLong,
        text.substring(math.min(st, n), math.min(st + size, n)).length.toLong)
    }
  }

  private def refLm(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val tokLists = docs.map { case (id, t) => id -> toks(t) }
    val uni = tokLists.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val allPairs = tokLists.flatMap { case (_, t) => t.zip(t.drop(1)) }
    val bg = allPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    tokLists.collect { case (id, t) if t.length >= 2 =>
      val scores = t.zip(t.drop(1)).map(p => 1000000L * bg(p) / uni(p._1))
      id -> (scores.length.toLong, scores.sum, scores.sum / scores.length)
    }.toMap
  }

  // ---- generated corpus --------------------------------------------------

  // multi-byte BMP tokens included: chunking slices by CHARACTERS and
  // hashing by UTF-8 BYTES — both must agree with the reference across
  // 1-, 2-, and 3-byte encodings (astral plane excluded: Java string
  // ops count UTF-16 units there, a documented non-goal of the
  // whitespace-token model)
  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "eee", "f0",
      "é", "ü", "日本", "中"))
  } yield ws.mkString(" ")

  // seeded: the same corpus every run, so a failure is reproducible
  private val corpus: Seq[(Long, String)] = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until 60).map { i =>
      val t = genDoc.pureApply(params, seed)
      seed = seed.next
      (i.toLong, t)
    }
  }

  private lazy val corpusDf = corpus.toDF("doc_id", "text")

  // ---- properties --------------------------------------------------------

  test("winnowFingerprints equals the sequential reference on random corpora") {
    val got = TextAnalysis.winnowFingerprints(corpusDf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val want = corpus.map { case (id, t) => id -> refWinnow(t) }.toMap
    assert(got == want)
  }

  test("dupRuns equals the sequential reference on random corpora") {
    val got = TextDedup.dupRuns(corpusDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = refDupRuns(corpus).map { case (id, (n, nd, mr)) =>
      id -> (n, nd, mr)
    }
    assert(got == want)
  }

  test("chunkDocs tiles every text: stride starts, clamped lengths, full coverage") {
    val got = Curation.chunkDocs(corpusDf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    corpus.foreach { case (id, t) =>
      assert(got(id) == refChunks(t), s"doc $id '${t.take(30)}'")
      // coverage: with stride < size, chunks reach the final character
      val lastEnd = got(id).last match { case (_, st, len) => st + len }
      assert(lastEnd == t.length || (t.isEmpty && lastEnd == 0))
    }
  }

  test("lmScore equals the sequential reference on random corpora") {
    val got = TextAnalysis.lmScore(corpusDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == refLm(corpus))
  }

  test("spanOverlapPairs (count-then-cap) equals the sequential reference") {
    // trigram shingles + tiny alphabet ⇒ real hot buckets exist, so
    // the count-then-cap rewrite is exercised on actual over-cap keys
    // (the skew path the r6 fix exists for), not just tame ones
    val minShared = 2
    val maxBucket = 5
    val perDoc = corpus.map { case (id, t) => id -> refShingleHashes(t).toSet }
    val byHash = perDoc.flatMap { case (id, s) => s.toSeq.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toVector).toMap
    val pc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    var capped = 0
    byHash.values.foreach { ids =>
      if (ids.size > maxBucket) capped += 1
      else if (ids.size > 1)
        for (i <- ids.indices; j <- i + 1 until ids.size) {
          val k = (ids(i), ids(j))
          pc(k) = pc.getOrElse(k, 0L) + 1
        }
    }
    val want = pc.filter(_._2 >= minShared).toMap
    assert(capped > 0, "corpus must actually produce over-cap hot buckets")
    val got = TextDedup.spanOverlapPairs(corpusDf, n = 3,
      minShared = minShared, maxBucket = maxBucket).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want, s"got=${got.size} want=${want.size}")
  }

  test("corpusDrift equals the sequential ppm definition and is antisymmetric") {
    val v1 = corpus.filter(_._1 % 2 == 0)
    val v2 = corpus.filter(_._1 >= 20).map { case (id, t) =>
      (id, if (id % 3 == 0) t + " edited" else t)
    }
    def refPpm(c: Seq[(Long, String)]): Map[String, Long] = {
      val ws = c.flatMap { case (_, t) => toks(t) }
      val n = ws.size.toLong
      ws.groupBy(identity).view.mapValues(g => 1000000L * g.size / n).toMap
    }
    val p1 = refPpm(v1)
    val p2 = refPpm(v2)
    val want = (p1.keySet ++ p2.keySet).iterator.map { w =>
      w -> (p1.getOrElse(w, 0L), p2.getOrElse(w, 0L))
    }.collect { case (w, (a, b)) if a != b => w -> (a, b, b - a) }.toMap
    def run(a: Seq[(Long, String)], b: Seq[(Long, String)]) =
      TextAnalysis.corpusDrift(a.toDF("doc_id", "text"), b.toDF("doc_id", "text"))
        .collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = run(v1, v2)
    assert(want.nonEmpty, "fixture must actually produce movers")
    assert(got == want)
    // reversing the snapshots mirrors every row and negates every shift
    assert(run(v2, v1) ==
      got.map { case (w, (a, b, s)) => w -> (b, a, -s) })
  }

  test("dedupKeepBest equals a sequential union-find + argmax reference") {
    // exact-text pairs: the tiny alphabet guarantees real duplicate
    // texts, so real multi-member clusters exist
    val pairs = for {
      (i, ti) <- corpus; (j, tj) <- corpus if i < j && ti == tj
    } yield (i, j)
    assert(pairs.nonEmpty, "fixture must produce duplicate texts")
    val parent = scala.collection.mutable.Map(corpus.map(c => c._1 -> c._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val text = corpus.toMap
    val drop = corpus.map(_._1).groupBy(find).values
      .filter(_.size > 1)
      .flatMap { members =>
        val winner = members.maxBy(id => (text(id).length.toLong, -id))
        members.filterNot(_ == winner)
      }.toSet
    val want = corpus.map(_._1).toSet -- drop
    val got = TextDedup.dedupKeepBest(corpusDf,
      pairs.toDF("ida", "idb"), length(col("text")))
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("corpusDiff equals the sequential set definition on random snapshots") {
    // v1 = even-indexed docs, v2 = docs 20..59 with every 3rd text
    // perturbed — ids overlap, diverge, and appear on one side only
    val v1 = corpus.filter(_._1 % 2 == 0)
    val v2 = corpus.filter(_._1 >= 20).map { case (id, t) =>
      (id, if (id % 3 == 0) t + " edited" else t)
    }
    val got = Curation.corpusDiff(
      v1.toDF("doc_id", "text"), v2.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m1 = v1.toMap
    val m2 = v2.toMap
    val want = (m1.keySet ++ m2.keySet).map { id =>
      id -> ((m1.get(id), m2.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap
    assert(got == want)
  }
}
