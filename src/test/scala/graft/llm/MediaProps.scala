package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the real media codecs: at 100 TB the payload
  * column is untrusted bytes, so every codec entry point must be
  * TOTAL — any input decodes to ok/not-ok, never a throw — and
  * every valid generated payload must round-trip its geometry
  * exactly. Upgrades MultimodalSpec's hand-picked cases to generated
  * ones (the DerProps stance).
  */
object MediaProps extends Properties("llm.MediaCodecs") {

  private val genJunk: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 300)
    bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
  } yield bytes.toArray

  /** Junk biased toward NEARLY-valid shapes: real magics with garbage
    * after — the inputs most likely to trip a sloppy parser. */
  private val genHostileJunk: Gen[Array[Byte]] = for {
    prefix <- Gen.oneOf("RIFF", "P6\n", "P5 ", "RIFFxxxxWAVE",
      "RIFFxxxxAVI ", "LIST")
    tail <- genJunk
  } yield prefix.getBytes("US-ASCII") ++ tail

  property("total on junk: decode/resize/embed never throw") =
    forAll(Gen.oneOf(genJunk, genHostileJunk)) { b =>
      val codecs = Seq(PpmCodec, WavCodec, AviCodec, ImageIoCodec)
      // a junk payload that happens to parse is fine; a THROW is the bug
      codecs.forall { c =>
        scala.util.Try {
          c.decode(1L, b)
          c.resize(1L, b, 4, 3)
          c.embed(1L, b, 8).length == 8
        }.getOrElse(false)
      } && scala.util.Try(AviCodec.sampledRaster(b, 2)).isSuccess
    }

  private val genWav: Gen[(Int, Int, Array[Byte])] = for {
    ch <- Gen.chooseNum(1, 4)
    frames <- Gen.chooseNum(1, 40)
    rate <- Gen.oneOf(8000, 16000, 44100)
    data <- Gen.listOfN(frames * ch * 2, Gen.chooseNum(0, 255).map(_.toByte))
  } yield (ch, rate, data.toArray)

  property("WAV: encode -> parse round-trips geometry, junk chunk transparent") =
    forAll(genWav) { case (ch, rate, data) =>
      val p = WavCodec.encode(ch, rate, data)
      val d = WavCodec.decode(1L, p)
      val dj = WavCodec.decode(1L, WavCodec.withJunkChunk(p))
      d.ok && d.width == ch && d.height == rate &&
        d.n_frames == data.length / (ch * 2) &&
        dj.ok && dj.width == ch && dj.n_frames == d.n_frames
    }

  property("WAV: resize emits a valid decodable WAV with the target geometry") =
    forAll(genWav, Gen.chooseNum(1, 10)) { case ((ch, rate, data), tf) =>
      val p = WavCodec.encode(ch, rate, data)
      val rs = WavCodec.resize(1L, p, ch, tf)
      val back = WavCodec.decode(1L, rs.payload)
      rs.ok && back.ok && back.width == ch && back.n_frames == tf &&
        back.height == rate
    }

  private val genAvi: Gen[(Int, Int, Seq[Array[Byte]])] = for {
    w <- Gen.chooseNum(1, 9)
    h <- Gen.chooseNum(1, 6)
    nf <- Gen.chooseNum(1, 6)
    frames <- Gen.listOfN(nf,
      Gen.listOfN(AviCodec.rowStride(w) * h,
        Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray))
  } yield (w, h, frames)

  property("AVI: encode -> parse round-trips geometry and frame count") =
    forAll(genAvi) { case (w, h, frames) =>
      val p = AviCodec.encode(w, h, 40000, frames)
      val d = AviCodec.decode(1L, p)
      d.ok && d.width == w && d.height == h && d.n_frames == frames.size
    }

  property("AVI: resize round-trips; sampledRaster = picked frames verbatim") =
    forAll(genAvi, Gen.chooseNum(1, 4)) { case ((w, h, frames), stride) =>
      val p = AviCodec.encode(w, h, 40000, frames)
      val rs = AviCodec.resize(1L, p, 3, 2)
      val back = AviCodec.decode(1L, rs.payload)
      val sampled = AviCodec.sampledRaster(p, stride)
      val picked = frames.zipWithIndex.collect {
        case (f, i) if i % stride == 0 => f
      }
      rs.ok && back.ok && back.width == 3 && back.height == 2 &&
        back.n_frames == frames.size &&
        java.util.Arrays.equals(sampled, picked.flatten.toArray)
    }

  property("truncation never parses: a torn tail is not-ok, never wrong-geometry") =
    forAll(genWav, Gen.chooseNum(1, 20)) { case ((ch, rate, data), cut) =>
      val p = WavCodec.encode(ch, rate, data)
      val torn = p.dropRight(math.min(cut, p.length - 1))
      !WavCodec.decode(1L, torn).ok
    }
}
