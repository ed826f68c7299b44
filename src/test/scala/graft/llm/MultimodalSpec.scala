package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.toMedia(
    Seq((1L, "hello"), (2L, ""), (3L, "world")).toDF("id", "payload"),
    "id", "payload", "application/octet-stream")

  test("toMedia produces the canonical schema with exact metadata") {
    assert(media.schema == Multimodal.mediaSchema)
    val r = media.filter(col("media_id") === 1).select(col("meta.*")).collect()(0)
    assert(r.getString(0) == "application/octet-stream")
    assert(r.getLong(1) == 5L)
    // sha256("hello")
    assert(r.getString(2) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("decodeStub is deterministic and flags empty payloads") {
    implicit val s = spark
    val d1 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    val d2 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(d1.sameElements(d2))
    val empty = d1.find(_.getLong(0) == 2L).get
    assert(!empty.getBoolean(4) && empty.getInt(1) == 0)
    val ok = d1.find(_.getLong(0) == 1L).get
    assert(ok.getBoolean(4) && ok.getInt(1) >= 16 && ok.getInt(2) >= 16)
  }

  test("resizeStub rewrites dimensions, keeps payload shape, flags empties") {
    implicit val s = spark
    val out = Multimodal.resizeStub(media, 224, 224).orderBy("media_id").collect()
    val ok = out.find(_.getLong(0) == 1L).get
    assert(ok.getInt(1) == 224 && ok.getInt(2) == 224 && ok.getBoolean(4))
    assert(ok.getAs[Array[Byte]](3).nonEmpty)
    val empty = out.find(_.getLong(0) == 2L).get
    assert(!empty.getBoolean(4))
  }

  test("extractFeaturesStub yields deterministic unit-norm vectors feeding similarity ops") {
    implicit val s = spark
    val f1 = Multimodal.extractFeaturesStub(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeaturesStub(media).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
    val v = f1.head.getSeq[Float](1)
    assert(v.length == 16)
    assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-5, "unit norm")
    // the vectors plug into the similarity operators (cosine top-k)
    graft.functions.GraftFunctions.register(spark)
    val vecs = Multimodal.extractFeaturesStub(media)
      .select(col("media_id").as("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val top = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 1), k = 2)
    assert(top.count() == 2L)
  }

  test("MediaCodec seam: a second codec swaps in without touching the plumbing") {
    implicit val s = spark
    // trivial alternate codec: fixed geometry, constant-direction
    // embedding, payload reversed on resize — enough to prove every
    // surface dispatches through the seam (and that open/close run
    // per partition, counted via an accumulator)
    val opens = spark.sparkContext.longAccumulator("codec_opens")
    val closes = spark.sparkContext.longAccumulator("codec_closes")
    object FixedCodec extends MediaCodec {
      override def open(): Unit = opens.add(1)
      override def close(): Unit = closes.add(1)
      def decode(id: Long, p: Array[Byte]): Multimodal.DecodedMeta =
        Multimodal.DecodedMeta(id, 640, 480, 24, ok = true)
      def resize(id: Long, p: Array[Byte], w: Int, h: Int): Multimodal.ResizedMeta =
        Multimodal.ResizedMeta(id, w, h, p.reverse, ok = true)
      def embed(id: Long, p: Array[Byte], dim: Int): Array[Float] =
        Array.tabulate(dim)(d => if (d == 0) 1f else 0f)
    }
    val d = Multimodal.decodeWith(media, FixedCodec).orderBy("media_id").collect()
    val ok = d.find(_.getLong(0) == 1L).get
    assert(ok.getInt(1) == 640 && ok.getInt(2) == 480 && ok.getInt(3) == 24)
    // empty payload still short-circuits in the PLUMBING, not the codec
    val empty = d.find(_.getLong(0) == 2L).get
    assert(!empty.getBoolean(4) && empty.getInt(1) == 0)
    val r = Multimodal.resizeWith(media, 32, 32, FixedCodec)
      .orderBy("media_id").collect()
    assert(r.find(_.getLong(0) == 1L).get.getAs[Array[Byte]](3)
      .sameElements("hello".getBytes.reverse))
    val e = Multimodal.embedWith(media, FixedCodec).orderBy("media_id").collect()
    assert(e.head.getSeq[Float](1) == (1f +: Seq.fill(15)(0f)))
    assert(opens.value > 0 && closes.value > 0, "per-partition lifecycle ran")
    // and the default-stub entry points are unchanged by the refactor
    val stub = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(stub.find(_.getLong(0) == 1L).get.getInt(1) >= 16)
  }

  test("sampleFrameIdx picks every k-th frame") {
    val out = Seq(Tuple1(10)).toDF("n")
      .select(Multimodal.sampleFrameIdx(col("n"), 3).as("idx"))
      .collect()(0).getSeq[Int](0)
    assert(out == Seq(0, 3, 6, 9))
  }
}
