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

/** The compressed-codec family under the same contracts: total on
  * untrusted bytes, geometry round-trips on generated valid payloads,
  * and the decompression-specific invariants (companding identity,
  * adaptive-decoder sample bounds). */
object CompressedMediaProps extends Properties("llm.CompressedCodecs") {

  private val genJunk: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 300)
    bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
  } yield bytes.toArray

  private val genHostileJunk: Gen[Array[Byte]] = for {
    prefix <- Gen.oneOf("RIFF", "RIFFxxxxWAVE", "RIFFxxxxAVI ",
      "RIFFxxxxWAVEfmt ", "LIST", "ÿØ")
    tail <- genJunk
  } yield prefix.getBytes("ISO-8859-1") ++ tail

  property("total on junk: decode/resize/embed never throw") =
    forAll(Gen.oneOf(genJunk, genHostileJunk)) { b =>
      val codecs = Seq(MuLawCodec, AdpcmCodec, MjpegCodec)
      codecs.forall { c =>
        scala.util.Try {
          c.decode(1L, b)
          c.resize(1L, b, 1, 3)
          c.embed(1L, b, 8).length == 8
        }.getOrElse(false)
      } && scala.util.Try(MjpegCodec.sampledFrameMeans(b, 2)).isSuccess
    }

  private val genMuLaw: Gen[(Int, Int, Array[Byte])] = for {
    ch <- Gen.chooseNum(1, 4)
    frames <- Gen.chooseNum(1, 40)
    rate <- Gen.oneOf(8000, 16000, 44100)
    codes <- Gen.listOfN(frames * ch, Gen.chooseNum(0, 255).map(_.toByte))
  } yield (ch, rate, codes.toArray)

  property("mu-law: encode -> parse round-trips; junk chunk transparent") =
    forAll(genMuLaw) { case (ch, rate, codes) =>
      val p = MuLawCodec.encode(ch, rate, codes)
      val d = MuLawCodec.decode(1L, p)
      val dj = MuLawCodec.decode(1L, WavCodec.withJunkChunk(p))
      d.ok && d.width == ch && d.height == rate &&
        d.n_frames == codes.length / ch &&
        dj.ok && dj.n_frames == d.n_frames
    }

  property("mu-law: identity resample expands every code exactly") =
    forAll(genMuLaw) { case (ch, rate, codes) =>
      val frames = codes.length / ch
      val rs = MuLawCodec.resize(1L, MuLawCodec.encode(ch, rate, codes),
        ch, frames)
      val data = rs.payload.drop(44)
      val got = Array.tabulate(data.length / 2)(
        k => (data(2 * k) & 0xff) | (data(2 * k + 1) << 8))
      rs.ok && got.sameElements(codes.map(c => MuLawCodec.expand(c & 0xff))) &&
        WavCodec.decode(1L, rs.payload).ok
    }

  private val genAdpcm: Gen[(Int, Seq[(Int, Int, Array[Byte])])] = for {
    db <- Gen.chooseNum(1, 12)
    nb <- Gen.chooseNum(1, 5)
    blocks <- Gen.listOfN(nb, for {
      pred <- Gen.chooseNum(-32768, 32767)
      idx <- Gen.chooseNum(0, 88)
      data <- Gen.listOfN(db, Gen.chooseNum(0, 255).map(_.toByte))
    } yield (pred, idx, data.toArray))
  } yield (4 + db, blocks)

  property("adpcm: encodeRaw -> parse -> decode round-trips state and counts") =
    forAll(genAdpcm) { case (ba, blocks) =>
      val spb = (ba - 4) * 2 + 1
      val p = AdpcmCodec.encodeRaw(8000, ba, blocks)
      val d = AdpcmCodec.decode(1L, p)
      val (_, _, _, off, dl) = AdpcmCodec.parseHeader(p).get
      val s = AdpcmCodec.decodeSamples(p, ba, off, dl)
      d.ok && d.width == 1 && d.n_frames == blocks.size * spb &&
        s.length == d.n_frames &&
        // every block's first decoded sample IS its header predictor,
        // and every sample stays inside the clamp rails
        blocks.zipWithIndex.forall { case ((pred, _, _), b) =>
          s(b * spb) == pred
        } && s.forall(v => v >= -32768 && v <= 32767)
    }

  property("adpcm: lossy compress stays decodable with padded-block length") =
    forAll(Gen.chooseNum(5, 16), Gen.nonEmptyListOf(Gen.chooseNum(-32768, 32767))) {
      (ba, samples) =>
        val spb = (ba - 4) * 2 + 1
        val p = AdpcmCodec.compress(8000, ba, samples.toArray)
        val d = AdpcmCodec.decode(1L, p)
        d.ok && d.n_frames == ((samples.length + spb - 1) / spb) * spb
    }
}
