package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("perceptron separates a linearly separable planted corpus") {
    // positives always contain 'goodword', negatives 'badword'; filler
    // tokens are shared noise
    val docs = ((0L until 20L).map(i =>
      (i, "en", s"goodword filler$i shared noise")) ++
      (20L until 40L).map(i =>
        (i, "de", s"badword filler$i shared noise")))
      .toDF("doc_id", "lang", "text")
    val out = Classifier.langClassifier(docs).collect()
    assert(out.length == 40)
    assert(out.forall(_.getAs[Boolean]("correct")),
      "separable data must classify perfectly after 2 batch passes: " +
        out.filterNot(_.getAs[Boolean]("correct")).mkString(","))
  }

  test("training is exact: weights match a sequential batch-perceptron reference") {
    val dims = 64
    val docs = ((0L until 6L).map(i => (i, "en", s"alpha beta t$i")) ++
      (6L until 12L).map(i => (i, "de", s"gamma delta t$i")))
      .toDF("doc_id", "lang", "text")
    val label = when(col("lang") === "en", 1L).otherwise(-1L)
    val feat = Classifier.featureFrame(docs, label, dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = feat.groupBy(_._1).map { case (d, rs) =>
      (d, rs.head._2, rs.map(_._3).toSet) }.toSeq.sortBy(_._1)
    // sequential reference: identical batch semantics
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 2) {
      val errs = byDoc.filter { case (_, y, fs) => y * fs.toSeq.map(w).sum <= 0 }
      val dw = errs.flatMap { case (_, y, fs) => fs.map(_ -> y) }
        .groupBy(_._1).map { case (f, ys) => f -> ys.map(_._2).sum }
      w = w ++ dw.map { case (f, d) => f -> (w(f) + d) }
    }
    val got = Classifier.train(docs, label, dims, passes = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filter(_._2 != 0L) == w.filter(_._2 != 0L).toMap,
      s"got=$got\nwant=$w")
  }

  test("multiclass one-vs-all separates three planted classes") {
    val docs = ((0L until 10L).map(i => (i, "en", s"redword fill$i shared")) ++
      (10L until 20L).map(i => (i, "de", s"blueword fill$i shared")) ++
      (20L until 30L).map(i => (i, "fr", s"greenword fill$i shared")))
      .toDF("doc_id", "lang", "text")
    val out = Classifier.langClassifierMulti(docs).collect()
    assert(out.length == 30)
    assert(out.forall(_.getAs[Boolean]("correct")),
      out.filterNot(_.getAs[Boolean]("correct")).mkString(","))
  }

  test("multiclass training is ANSI-safe (pass-1 empty-map pivot)") {
    // under ANSI, element_at on a missing map key throws instead of
    // returning null; pass 1's weight map is empty so EVERY slot
    // lookup misses — the try_element_at pivot must keep training whole
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val docs = ((0L until 5L).map(i => (i, "en", s"redword fill$i")) ++
        (5L until 10L).map(i => (i, "de", s"blueword fill$i")))
        .toDF("doc_id", "lang", "text")
      val out = Classifier.langClassifierMulti(docs).collect()
      assert(out.length == 10 && out.forall(_.getAs[Boolean]("correct")))
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  test("null class labels are excluded from multiclass training and output") {
    val labeled = ((0L until 10L).map(i => (i, "en", s"redword fill$i shared")) ++
      (10L until 20L).map(i => (i, "de", s"blueword fill$i shared")))
      .toDF("doc_id", "lang", "text")
    val withNull = labeled.unionByName(Seq(
      (99L, null.asInstanceOf[String], "redword blueword shared"))
      .toDF("doc_id", "lang", "text"))
    val out = Classifier.langClassifierMulti(withNull).collect()
    // the null-labeled doc neither appears in the scored output nor
    // perturbs the labeled docs' training (classesOne/docFeatures
    // exclusion contract)
    assert(out.length == 20 && out.forall(_.getAs[String]("lang") != null))
    assert(out.forall(_.getAs[Boolean]("correct")), out.mkString(","))
    val clean = Classifier.langClassifierMulti(labeled).collect()
      .map(r => (r.getLong(0), r.getAs[String]("pred"), r.getAs[Long]("margin")))
      .sortBy(_._1).toSeq
    val dirty = out
      .map(r => (r.getLong(0), r.getAs[String]("pred"), r.getAs[Long]("margin")))
      .sortBy(_._1).toSeq
    assert(clean == dirty, "a null-labeled doc must not shift any weight")
  }

  test("multiclass argmax tie breaks to the lexicographically smallest class") {
    // a fully class-symmetric corpus: docs 2 and 3 carry only the
    // shared token, whose per-class weight cancels to 0 by symmetry,
    // so BOTH their class margins are exactly 0 — a provable tie that
    // must resolve to 'aa' (< 'ab') for both
    val docs = Seq(
      (0L, "aa", "shared x0"),
      (1L, "ab", "shared x1"),
      (2L, "aa", "shared"),
      (3L, "ab", "shared")).toDF("doc_id", "lang", "text")
    val out = Classifier.langClassifierMulti(docs)
      .filter(col("doc_id") >= 2L).collect()
    assert(out.forall(r => r.getAs[String]("pred") == "aa" &&
      r.getAs[Long]("margin") == 0L), out.mkString(","))
  }

  test("streamingScore under a frozen w equals batch score (stateless, stream-legal)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = ((0L until 10L).map(i => (i, "en", s"goodword fill$i shared")) ++
      (10L until 20L).map(i => (i, "de", s"badword fill$i shared")))
      .toDF("doc_id", "lang", "text")
    val label = when(col("lang") === "en", 1L).otherwise(-1L)
    val w = Classifier.train(docs, label).localCheckpoint(true)
    val batch = Classifier.score(Classifier.featureFrame(docs, label), w)
      .select("doc_id", "margin", "pred")
      .collect().map(_.toSeq).toSet
    val rows = docs.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Classifier.streamingScore(
        in.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("sclf")
      .outputMode("append").start()
    try {
      in.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("sclf").collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("curateLang composition: predicted-language filter, min-id dedup " +
    "survivor, deterministic split") {
    // 'en' docs carry redword, 'de' docs blueword; docs 2 and 3 are
    // exact duplicates after normalization (case/whitespace damage)
    val docs = Seq(
      (1L, "en", "src0", "redword alpha beta"),
      (2L, "en", "src0", "redword GAMMA  delta"),
      (3L, "en", "src1", "redword gamma\tdelta"),
      (4L, "de", "src0", "blueword alpha beta"),
      (5L, "de", "src1", "blueword epsilon zeta"))
      .toDF("doc_id", "lang", "source", "text")
    val out = Classifier.curateLang(docs).orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L), s"en docs minus the duplicate: $ids")
    val splits = out.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // rerun-stable: content-hash split and margin are deterministic
    val again = Classifier.curateLang(docs).orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("feature hashing folds collisions identically in scoring and training") {
    // dims = 1 forces every token into feature 0: the model can only
    // learn the majority class
    val docs = ((0L until 3L).map(i => (i, "en", s"a$i")) ++
      (3L until 10L).map(i => (i, "de", s"b$i")))
      .toDF("doc_id", "lang", "text")
    val label = when(col("lang") === "en", 1L).otherwise(-1L)
    val w = Classifier.train(docs, label, dims = 1, passes = 2)
    val scored = Classifier.score(
      Classifier.featureFrame(docs, label, dims = 1), w).collect()
    val preds = scored.map(_.getAs[Long]("pred")).toSet
    assert(preds == Set(-1L), s"majority class is -1: ${preds}")
  }
}
