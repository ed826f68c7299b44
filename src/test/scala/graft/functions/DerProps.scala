package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the DER serial/SPKI reader (D1): the raw
  * serialNumber bytes — leading zeros and all — and the raw SPKI TLV
  * must survive extraction from any structurally-valid certificate
  * shape, version tag present or not, short- and long-form lengths.
  * Upgrades the reference's hand-picked cases (types_test.go:81-101)
  * to generated ones.
  */
object DerProps extends Properties("CertFuncs.derSerialAndSpki") {

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] = {
    val len = content.length
    val lenBytes =
      if (len < 128) Array(len.toByte)
      else {
        val bs = {
          val raw = BigInt(len).toByteArray
          if (raw.head == 0) raw.tail else raw
        }
        (0x80 | bs.length).toByte +: bs
      }
    tag.toByte +: (lenBytes ++ content)
  }

  private val genSerial: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(1, 24)
    bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte))
    forceLeadingZero <- Gen.oneOf(true, false)
  } yield {
    val a = bytes.toArray
    if (forceLeadingZero) a(0) = 0 // the conformance case: 0x00.. kept
    a
  }

  // content long enough to exercise long-form (0x81/0x82) lengths
  private val genBlob: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray))

  private val genSkip: Gen[Array[Byte]] = for {
    tag <- Gen.oneOf(0x30, 0x05, 0x06, 0x04)
    content <- Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.const(0x01.toByte)).map(_.toArray))
  } yield tlv(tag, content)

  private case class Synth(der: Array[Byte], serial: Array[Byte], spkiTlv: Array[Byte])

  private val genCert: Gen[Synth] = for {
    serial <- genSerial
    withVersion <- Gen.oneOf(true, false)
    sigAlg <- genSkip; issuer <- genSkip; validity <- genSkip; subject <- genSkip
    spkiContent <- genBlob
    trailing <- genBlob
  } yield {
    val spkiTlv = tlv(0x30, spkiContent)
    val version = if (withVersion) tlv(0xA0, Array(2, 1, 2).map(_.toByte)) else Array.empty[Byte]
    val tbs = tlv(0x30,
      version ++ tlv(0x02, serial) ++ sigAlg ++ issuer ++ validity ++ subject ++ spkiTlv)
    Synth(tlv(0x30, tbs ++ trailing), serial, spkiTlv)
  }

  property("raw serial and SPKI TLV round-trip") = forAll(genCert) { s =>
    val (serial, spki) = CertFuncs.derSerialAndSpki(s.der)
    Prop(java.util.Arrays.equals(serial, s.serial)) :| "serial bytes differ" &&
      Prop(java.util.Arrays.equals(spki, s.spkiTlv)) :| "spki TLV differs"
  }

  property("leading zeros never stripped") = forAll(genCert) { s =>
    val (serial, _) = CertFuncs.derSerialAndSpki(s.der)
    serial.length == s.serial.length
  }
}
