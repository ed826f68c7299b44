package graft.sources

import java.net.URI

import graft.SparkSpec
import graft.streaming.ManifestStore
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** An object-store-semantics filesystem fake: stores bytes on local
  * disk, but `rename` is a non-atomic COPY + DELETE (the S3 shape,
  * O(data), observable half-done) — a protocol whose correctness
  * leans on atomic rename misbehaves here, and any java.io.File
  * probe against its `graftfake:` paths sees nothing at all. */
class RenameIsCopyFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfake:///")
  override def rename(src: Path, dst: Path): Boolean = {
    RenameIsCopyFileSystem.renames.incrementAndGet()
    if (!exists(src)) false
    else {
      FileUtil.copy(this, src, this, dst, false, getConf)
      delete(src, true)
    }
  }
}
object RenameIsCopyFileSystem {
  val renames = new java.util.concurrent.atomic.AtomicLong
}

/** IndexStore's manifest-generation protocol driven over the
  * rename-is-copy fake: build-once/reuse, crash-orphan invisibility,
  * content-fingerprint keys, and the fresh-session REGISTRATION of an
  * existing bucketed table (metadata-only — the pre-pay paid once per
  * corpus, not once per session). */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fakeScheme: Unit =
    spark.sparkContext.hadoopConfiguration.set("fs.graftfake.impl",
      classOf[RenameIsCopyFileSystem].getName)

  private def fakeRoot(tag: String): String = {
    fakeScheme
    "graftfake:" +
      java.nio.file.Files.createTempDirectory(s"idxstore_$tag").toString
  }

  private def mkCorpus(tag: String, rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"corpus_$tag").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("parquet: promoted generations on a rename-is-copy store — " +
    "build once, reuse across calls, crash-orphan staging invisible") {
    val root = fakeRoot("pq")
    val sfDir = mkCorpus("pq", (0L until 8L).map(i => (i, s"doc $i")))
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), length(col("text")).as("len"))
    }
    val first = IndexStore.parquetAt(spark, root, sfDir, "seg/x")(build)
      .collect().map(_.toSeq).toSet
    assert(first.size == 8 && builds == 1)
    val again = IndexStore.parquetAt(spark, root, sfDir, "seg/x")(build)
      .collect().map(_.toSeq).toSet
    assert(again == first && builds == 1, "second call must reuse the store")

    // a crashed writer's never-promoted staging dir must stay invisible
    val artRoot = new Path(
      s"$root/${IndexStore.corpusKey(spark, sfDir)}/seg/x")
    val fs = artRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = ManifestStore.stagingPath(artRoot,
      ManifestStore.nextGen(fs, artRoot))
    fs.mkdirs(orphan)
    val after = IndexStore.parquetAt(spark, root, sfDir, "seg/x")(build)
      .collect().map(_.toSeq).toSet
    assert(after == first && builds == 1,
      "an unpromoted orphan must neither serve nor force a rebuild")
  }

  test("corpus key is a CONTENT fingerprint: same byte length + same " +
    "mtime, different bytes -> different key on a fresh-session probe") {
    val dir = java.nio.file.Files.createTempDirectory("fp").toString
    val f = new Path(s"$dir/documents.parquet")
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    def put(bytes: String, mtime: Long): Unit = {
      val out = fs.create(f, true)
      try out.write(bytes.getBytes("UTF-8")) finally out.close()
      fs.setTimes(f, mtime, -1)
    }
    val t = 1700000000000L
    put("corpus-generation-one!", t)
    val key1 = IndexStore.corpusKey(spark, dir)
    // the regeneration the size/mtime key could NOT see: identical
    // length, identical mtime tick, different bytes
    put("corpus-generation-two!", t)
    IndexStore.clearTagMemoForTests() // a fresh session has no memo
    val key2 = IndexStore.corpusKey(spark, dir)
    assert(key1 != key2, s"stale-content key reuse: $key1")
    // and the fingerprint is stable: same bytes -> same key
    put("corpus-generation-two!", t)
    IndexStore.clearTagMemoForTests()
    assert(IndexStore.corpusKey(spark, dir) == key2)
  }

  test("bucketedTable: a fresh session REGISTERS the promoted files " +
    "(no rewrite), serves identical rows, and the co-bucketed join " +
    "still plans with zero Exchange") {
    val root = fakeRoot("bt")
    val sfDir = mkCorpus("bt",
      (0L until 40L).map(i => (i, s"w${i % 7} w${i % 3}")))
    def post = (0L until 40L).map(i => (s"w${i % 7}", i, i % 5 + 1))
      .toDF("term", "doc_id", "tf")
    def dfT = (0 until 7).map(i => (s"w$i", i + 10L)).toDF("term", "df")
    val t1 = IndexStore.bucketedTableAt(spark, root, sfDir,
      "spec_post", "term", buckets = 4)(post)
    val d1 = IndexStore.bucketedTableAt(spark, root, sfDir,
      "spec_df", "term", buckets = 4)(dfT)
    val want = t1.join(d1, Seq("term")).collect().map(_.toSeq).toSet

    // record the promoted files, then simulate a fresh session by
    // dropping the catalog entries (external tables keep their files)
    val corpus = IndexStore.corpusKey(spark, sfDir)
    val names = Seq(s"graft_idx_spec_post_$corpus".toLowerCase,
      s"graft_idx_spec_df_$corpus".toLowerCase)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    def fileStamps(tbl: String): Set[(String, Long, Long)] = {
      val data = ManifestStore.currentDataPath(fs,
        new Path(s"$root/wh/$tbl")).get
      fs.listStatus(data).toSeq.map(s =>
        (s.getPath.getName, s.getLen, s.getModificationTime)).toSet
    }
    val stamps = names.map(fileStamps)
    names.foreach(t => spark.sql(s"DROP TABLE $t"))

    // the register path must never evaluate the build
    val t2 = IndexStore.bucketedTableAt(spark, root, sfDir,
      "spec_post", "term", buckets = 4)(sys.error("must not rebuild"))
    val d2 = IndexStore.bucketedTableAt(spark, root, sfDir,
      "spec_df", "term", buckets = 4)(sys.error("must not rebuild"))
    assert(t2.join(d2, Seq("term")).collect().map(_.toSeq).toSet == want)
    assert(names.map(fileStamps) == stamps,
      "registration must not rewrite a single byte")

    // bucket metadata survives registration: the term join of the two
    // re-registered tables plans exchange-free under forced SMJ
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = t2.join(d2, Seq("term")).queryExecution
        .explainString(FormattedMode)
      assert(!p.contains("Exchange"),
        s"registered bucketed tables must co-locate the join:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    // a drifted caller spec must FAIL the registration, not silently
    // hash rows mod N over files laid out mod M
    spark.sql(s"DROP TABLE ${names.head}")
    val ex = intercept[Exception] {
      IndexStore.bucketedTableAt(spark, root, sfDir,
        "spec_post", "term", buckets = 8)(sys.error("must not rebuild"))
    }
    assert(ex.getMessage.contains("bucket-spec drift"), ex.getMessage)
  }

  test("IndexMaintenance generations commit on the rename-is-copy " +
    "store (Hadoop-FS markers, not java.io.File)") {
    import graft.streaming.IndexMaintenance
    val root = fakeRoot("im")
    val docs = (0L until 6L).map(i => (i, s"w${i % 3} shared"))
    IndexMaintenance.mergeBatch(root)(
      docs.take(4).toDF("doc_id", "text"), 0L)
    IndexMaintenance.mergeBatch(root)(
      docs.drop(2).toDF("doc_id", "text"), 1L) // overlap 2,3 must drop
    assert(IndexMaintenance.committedGens(root) == Seq(0L, 1L))
    def dump(seg: graft.llm.IndexSegments) =
      graft.llm.Retrieval.segDenormalize(seg)
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("df"), array_join(col("positions"), ",").as("positions"))
        .orderBy("term", "doc_id").collect().map(_.toSeq).toSeq
    val want = dump(graft.llm.Retrieval.segBuildUnified(
      docs.toDF("doc_id", "text")))
    assert(dump(IndexMaintenance.read(spark, root).get) == want)
    IndexMaintenance.compact(spark, root, gcSuperseded = true)
    assert(IndexMaintenance.committedCgens(root) == Seq(1L) &&
      IndexMaintenance.committedGens(root).isEmpty)
    assert(dump(IndexMaintenance.read(spark, root).get) == want)
  }
}
