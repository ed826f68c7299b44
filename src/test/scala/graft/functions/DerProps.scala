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

  // ---- CRL-DP URI collection (C5's extraction machinery) -----------------
  // collectUris must find every [6] GeneralName URI nested at any depth
  // under constructed/OCTET/[0] wrappers, in document order, and must
  // NOT look inside primitives it does not recurse (a PrintableString
  // decoy containing URI-shaped bytes stays invisible).

  private val genUri: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "ldap")
    host <- Gen.alphaLowerStr.map(s => if (s.isEmpty) "x" else s.take(12))
  } yield s"$scheme://$host.example.com/crl"

  private case class UriTree(der: Array[Byte], uris: Seq[String])

  private def genTree(depth: Int): Gen[UriTree] =
    if (depth == 0)
      genUri.map(u => UriTree(tlv(0x86, u.getBytes("US-ASCII")), Seq(u)))
    else
      Gen.frequency(
        3 -> genUri.map(u => UriTree(tlv(0x86, u.getBytes("US-ASCII")), Seq(u))),
        // invisible decoy: primitive tag, never recursed into
        1 -> genUri.map(u => UriTree(tlv(0x13, tlv(0x86, u.getBytes("US-ASCII"))), Seq.empty)),
        3 -> (for {
          wrapper <- Gen.oneOf(0x30, 0xA0, 0x04)
          n <- Gen.chooseNum(0, 3)
          children <- Gen.listOfN(n, genTree(depth - 1))
        } yield UriTree(
          tlv(wrapper, children.toArray.flatMap(_.der)),
          children.flatMap(_.uris))))

  property("collectUris finds nested URIs in order, skips primitive decoys") =
    forAll(genTree(3)) { t =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      CertFuncs.collectUris(t.der, 0, t.der.length, acc)
      Prop(acc.toSeq == t.uris) :| s"got ${acc.toSeq}, want ${t.uris}"
    }
}
