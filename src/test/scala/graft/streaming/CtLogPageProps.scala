package graft.streaming

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Generative round-trip for the CT-log page serialization (A1): any
  * entry set — arbitrary bytes, empty and multi-cert chains, any page
  * size — must survive writePages → readRange byte-for-byte. Pure
  * JVM-side (no Spark session): the reader factory shares parseLine
  * with readRange, which this pins. */
class CtLogPageProps extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(1, 64)
    bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
  } yield bytes.toArray

  private val genEntry: Gen[(Long, String, Array[Byte], Seq[Array[Byte]])] = for {
    ts <- Gen.chooseNum(0L, 4102444800000L)
    url <- Gen.oneOf("log.example.com/2025", "a/b", "x")
    der <- genBytes
    chainLen <- Gen.chooseNum(0, 3)
    chain <- Gen.listOfN(chainLen, genBytes)
  } yield (ts, url, der, chain)

  test("writePages -> readRange round-trips entries, chains included") {
    for (pageSize <- Seq(1, 3, 7, 1000)) {
      val dir = Files.createTempDirectory("pageprops").toString
      val entries = sample(genEntry, 41).zipWithIndex.map { case ((ts, url, der, chain), i) =>
        CtLog.Entry(i.toLong, ts, url, der, chain)
      }
      CtLog.writePages(dir, entries, pageSize)
      assert(CtLog.treeSize(dir) == entries.length.toLong)
      val back = CtLog.readRange(dir, 0L, entries.length.toLong).toSeq
      assert(back.length == entries.length)
      entries.zip(back).foreach { case (e, b) =>
        assert(e.entryId == b.entryId && e.tsMs == b.tsMs && e.logUrl == b.logUrl)
        assert(java.util.Arrays.equals(e.der, b.der), s"der mismatch at ${e.entryId}")
        assert(e.chain.length == b.chain.length, s"chain arity at ${e.entryId}")
        e.chain.zip(b.chain).foreach { case (c1, c2) =>
          assert(java.util.Arrays.equals(c1, c2), s"chain bytes at ${e.entryId}")
        }
      }
      // sub-ranges honor [start, end)
      val mid = CtLog.readRange(dir, 10L, 20L).toSeq
      assert(mid.map(_.entryId) == (10L until 20L).toSeq)
    }
  }

  test("HTTP transport partition math: any [start,end) tiles exactly by pageSize") {
    // page-boundary fuzz over the fetch-parallel split
    // (HttpTransport.partitions): starts/ends straddling page
    // boundaries, empty ranges, ranges below one page
    val genCase = for {
      pageSize <- Gen.oneOf(1, 2, 3, 7, 256, 1000)
      start <- Gen.chooseNum(0L, 5000L)
      len <- Gen.chooseNum(0L, 4000L)
    } yield (pageSize, start, start + len)
    sample(genCase, 300).foreach { case (pageSize, start, end) =>
      val spec = HttpLogSpec("http://unused.invalid", pageSize,
        timeoutMs = 1, backoffBaseMs = 1L, maxRetries = 0)
      val parts = spec.transport.partitions(start, end)
      val label = s"pageSize=$pageSize [$start,$end): $parts"
      if (start == end) assert(parts.isEmpty, label)
      else {
        // contiguous, in-order, gapless tiling of exactly [start, end)
        assert(parts.head._1 == start && parts.last._2 == end, label)
        parts.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) => assert(e1 == s2, label)
          case _ =>
        }
        // every tile non-empty and at most one page
        assert(parts.forall(p => p._2 > p._1 && p._2 - p._1 <= pageSize), label)
        // all tiles except the last are FULL pages (no short fetches
        // in the middle of the range)
        assert(parts.dropRight(1).forall(p => p._2 - p._1 == pageSize), label)
      }
    }
  }

  test("RFC 6962 TLS codecs round-trip arbitrary certs and chains") {
    sample(genEntry, 60).foreach { case (ts, _, der, chain) =>
      val x = CtLogWire.decodeEntry(
        CtLogWire.encodeX509Leaf(ts, der), CtLogWire.encodeX509Extra(chain))
      assert(x.tsMs == ts && !x.precert)
      assert(java.util.Arrays.equals(x.der, der))
      assert(x.chain.length == chain.length &&
        x.chain.zip(chain).forall { case (a, b) => java.util.Arrays.equals(a, b) })
      val ikh = Array.fill[Byte](32)(7)
      val p = CtLogWire.decodeEntry(
        CtLogWire.encodePrecertLeaf(ts, ikh, Array[Byte](1)),
        CtLogWire.encodePrecertExtra(der, chain))
      assert(p.tsMs == ts && p.precert)
      assert(java.util.Arrays.equals(p.der, der), "submitted precert survives")
      assert(p.chain.length == chain.length)
    }
  }
}
