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

  test("sampleFrameIdx picks every k-th frame") {
    val out = Seq(Tuple1(10)).toDF("n")
      .select(Multimodal.sampleFrameIdx(col("n"), 3).as("idx"))
      .collect()(0).getSeq[Int](0)
    assert(out == Seq(0, 3, 6, 9))
  }
}
