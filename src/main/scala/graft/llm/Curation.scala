package graft.llm

import graft.Tables
import graft.queries.QuerySpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline needs around the
  * dedup/similarity core: deterministic sampling, train/val/test
  * splitting, and PII-pattern redaction. All pure codegen'd expressions
  * (no UDFs, no shuffle except declared sorts), and all deterministic
  * BY CONTENT — the split a document lands in depends only on its
  * bytes, not on partitioning, row order, or a seed table, so reruns
  * and backfills at 100 TB assign identically without coordination
  * (the property `rand(seed)`-based sampling lacks: it is
  * partition-order dependent).
  */
object Curation {

  /** Deterministic content bucket in [0, buckets): the first 16 bits of
    * SHA256 as an integer, mod buckets. Engine-portable (hex-string
    * arithmetic only), uniform, stable. */
  def hashBucket(c: Column, buckets: Int = 100): Column =
    conv(substring(sha2(c.cast("binary"), 256), 1, 4), 16, 10)
      .cast("long") % buckets

  /** Keep a deterministic pct% sample by content hash. */
  def sampleByHash(df: DataFrame, c: Column, pct: Int): DataFrame =
    df.filter(hashBucket(c) < pct)

  /** Stable train/val/test assignment from the content bucket:
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val,
    * rest → test. */
  def splitByHash(c: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = hashBucket(c)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
  private val longNumRe = "[0-9]{6,}"

  /** PII-pattern scrub: emails and long digit runs replaced with typed
    * placeholder tokens; match counts ride along for audit. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), longNumRe, "<NUM>")

  /** URL canonicalization — the identity pass a crawl-frontier /
    * crawl-dedup pipeline runs before URL-keyed dedup (the same page
    * fetched as `HTTP://WWW.Site.COM:80/p/1?utm_source=feed&id=2#top`
    * and `http://site.com/p/1?id=2` must collapse to ONE key). Rules,
    * in order: strip the `#fragment`; lowercase scheme+authority
    * (path/query case is significant and kept); drop the scheme's
    * default port (`:80` http, `:443` https); drop a leading `www.`;
    * drop tracking query params (`utm_*`, `fbclid`, `gclid`) wherever
    * they sit, tidying the `?`/`&` separators; collapse a bare root
    * path `/` to the authority. Every rule is one regexp pass in the
    * java.regex∩RE2 portable subset (no lookarounds — the
    * follow-char alternation `(/|\?|#|$)` replays the lookahead), so
    * the chain is engine-portable and zero-shuffle. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val headRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val head = regexp_extract(noFrag, headRe, 0)
    val lowered =
      concat(lower(head), noFrag.substr(length(head) + 1, length(noFrag)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#:]+):80(/|\\?|#|$)", "$1$2"),
      "^(https://[^/?#:]+):443(/|\\?|#|$)", "$1$2")
    val noWww = regexp_replace(noPort, "^([a-z]+://)www\\.", "$1")
    val noAmpTrack =
      regexp_replace(noWww, "&(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*", "")
    val noQTrackMid = regexp_replace(noAmpTrack,
      "\\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&", "?")
    val noQTrackEnd = regexp_replace(noQTrackMid,
      "\\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*$", "")
    regexp_replace(noQTrackEnd, "^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
  }

  /** URL-keyed crawl dedup over a (doc_id, url) frame: canonicalize,
    * then one group per canonical URL with the variant count and the
    * kept (min-doc_id) fetch — the dedup a crawler runs BEFORE
    * content-based dedup ever sees the bytes.
    *
    * Scale shape: the canonical chain is per-row in the scan; the only
    * shuffle is one map-side-combinable groupBy on the canonical key
    * (count + min both combine). The kept corpus is a broadcast-able
    * semi join of `docs` on `keep_doc`. */
  def urlDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc"))

  /** The corpus is URL-less word salad, so the query seeds
    * deterministic synthetic URLs in-plan (the pii_report stance) built
    * to exercise EVERY canonical rule: mixed-case scheme/host, default
    * and absent ports, `www.`, tracking params in first / middle / only
    * position, fragments, and bare-root paths — constructed so distinct
    * doc_ids genuinely collapse. */
  val qUrlDedup = QuerySpec(
    "q_llm_url_dedup",
    (s, d) =>
      urlDedup(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, "HTTP://").otherwise("https://"),
            lit("WWW.Site"), col("doc_id") % 7, lit(".COM"),
            when(col("doc_id") % 3 === 0,
              when(col("doc_id") % 2 === 0, ":80").otherwise(":443"))
              .otherwise(""),
            when(col("doc_id") % 11 === 0, "/")
              .otherwise(concat(lit("/p/"), col("doc_id") % 5)),
            when(col("doc_id") % 4 === 1,
              concat(lit("?utm_source=feed&id="), col("doc_id") % 3))
              .when(col("doc_id") % 4 === 2,
                concat(lit("?id="), col("doc_id") % 3,
                  lit("&utm_campaign=x&gclid=abc")))
              .when(col("doc_id") % 4 === 3, "?utm_medium=mail")
              .otherwise(""),
            when(col("doc_id") % 5 === 0,
              concat(lit("#Sec"), col("doc_id") % 3)).otherwise(""))
            .as("url")))
        .orderBy(col("canonical_url")),
    Some("""WITH seeded AS (
           |  SELECT doc_id,
           |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END)
           |    || 'WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
           |    || (CASE WHEN doc_id % 3 = 0 THEN
           |          CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
           |        ELSE '' END)
           |    || (CASE WHEN doc_id % 11 = 0 THEN '/'
           |        ELSE '/p/' || CAST(doc_id % 5 AS VARCHAR) END)
           |    || (CASE WHEN doc_id % 4 = 1
           |          THEN '?utm_source=feed&id=' || CAST(doc_id % 3 AS VARCHAR)
           |        WHEN doc_id % 4 = 2
           |          THEN '?id=' || CAST(doc_id % 3 AS VARCHAR)
           |            || '&utm_campaign=x&gclid=abc'
           |        WHEN doc_id % 4 = 3 THEN '?utm_medium=mail'
           |        ELSE '' END)
           |    || (CASE WHEN doc_id % 5 = 0
           |          THEN '#Sec' || CAST(doc_id % 3 AS VARCHAR)
           |        ELSE '' END) AS url
           |  FROM documents
           |), s1 AS (
           |  SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM seeded
           |), s2 AS (
           |  SELECT doc_id,
           |    lower(regexp_extract(u,
           |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) ||
           |    substr(u, length(regexp_extract(u,
           |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1) AS u
           |  FROM s1
           |), s3 AS (
           |  SELECT doc_id, regexp_replace(regexp_replace(u,
           |      '^(http://[^/?#:]+):80(/|\?|#|$)', '\1\2'),
           |      '^(https://[^/?#:]+):443(/|\?|#|$)', '\1\2') AS u
           |  FROM s2
           |), s4 AS (
           |  SELECT doc_id, regexp_replace(u, '^([a-z]+://)www\.', '\1') AS u
           |  FROM s3
           |), s5 AS (
           |  SELECT doc_id, regexp_replace(u,
           |    '&(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*', '', 'g') AS u
           |  FROM s4
           |), s6 AS (
           |  SELECT doc_id, regexp_replace(regexp_replace(u,
           |      '\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&', '?'),
           |      '\?(utm_[a-zA-Z]+|fbclid|gclid)=[^&]*$', '') AS u
           |  FROM s5
           |), s7 AS (
           |  SELECT doc_id, regexp_replace(u,
           |    '^([a-z][a-z0-9+.-]*://[^/?#]+)/$', '\1') AS u
           |  FROM s6
           |)
           |SELECT u AS canonical_url, count(*) AS n_dups,
           |  min(doc_id) AS keep_doc
           |FROM s7 GROUP BY 1 ORDER BY 1""".stripMargin))

  val qSample = QuerySpec(
    "q_llm_sample",
    (s, d) =>
      sampleByHash(Tables.load(s, d, "documents"), col("text"), 10)
        .select(col("doc_id"), hashBucket(col("text")).as("bucket"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS bucket
           |FROM documents
           |WHERE CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 < 10
           |ORDER BY doc_id""".stripMargin))

  val qSplit = QuerySpec(
    "q_llm_split",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), splitByHash(col("text")).as("split"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id,
           |        CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS b
           |      FROM documents) t
           |ORDER BY doc_id""".stripMargin))

  /** Intra-document repetition removal: drop repeated
    * paragraphs/sentences within one document, keeping the first
    * occurrence — the classic boilerplate scrub. Pure per-row array
    * ops, no shuffle. */
  def dedupParagraphs(text: Column, sep: String = ". "): Column =
    array_join(
      array_distinct(split(text, java.util.regex.Pattern.quote(sep))), sep)

  /** Oracle'd on the sorted distinct-paragraph form (DuckDB's
    * list_distinct does not preserve first-occurrence order, Spark's
    * array_distinct does; the order-preserving operator itself is
    * pinned by ScalaTest). */
  val qParaDedup = QuerySpec(
    "q_llm_para_dedup",
    (s, d) => {
      val paras = split(col("text"), java.util.regex.Pattern.quote(". "))
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          size(paras).cast("long").as("n_paras"),
          size(array_distinct(paras)).cast("long").as("n_uniq"),
          array_join(sort_array(array_distinct(paras)), ". ").as("uniq_sorted"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  CAST(len(string_split(text, '. ')) AS BIGINT) AS n_paras,
           |  CAST(len(list_distinct(string_split(text, '. '))) AS BIGINT) AS n_uniq,
           |  array_to_string(list_sort(list_distinct(string_split(text, '. '))), '. ')
           |    AS uniq_sorted
           |FROM documents ORDER BY doc_id""".stripMargin))

  val qRedact = QuerySpec(
    "q_llm_redact",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          redact(col("text")).as("redacted"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(longNumRe), lit(0)))
            .cast("long").as("n_long_nums"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
            |  regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
            |                 '$longNumRe', '<NUM>', 'g') AS redacted,
            |  CAST(len(regexp_extract_all(text, '$emailRe', 0)) AS BIGINT) AS n_emails,
            |  CAST(len(regexp_extract_all(text, '$longNumRe', 0)) AS BIGINT) AS n_long_nums
            |FROM documents ORDER BY doc_id""".stripMargin))

  /** CROSS-corpus line dedup (the C4/CCNet boilerplate scrub): a line
    * appearing in many documents is kept only in the lowest-doc_id
    * owner and dropped everywhere else; each document is reassembled
    * from its surviving lines in original order.
    *
    * Scale shape: the corpus is exploded ONCE; owner election is a
    * `min(doc_id)` window over the line key (two independently-seeded
    * xxhash64s when `hashKey` — a 128-bit composite, so raw line
    * strings never cross the wire and collisions stay negligible even
    * at 10¹⁰ distinct lines, where a single 64-bit key would already
    * expect a few and silently delete the losing line), so the whole
    * op is two shuffles: one on the 16-byte key, one per-doc
    * re-aggregate. A join formulation would scan + explode the corpus
    * twice and shuffle the corpus-cardinality owner table a third
    * time. */
  def lineDedup(docs: DataFrame, sep: String = ". ",
      hashKey: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("col", "line")
      .withColumn("line_key",
        if (hashKey) struct(xxhash64(col("line")), xxhash64(col("line"), lit(1)))
        else struct(col("line"), lit(0L)))
    lines
      .withColumn("keep_doc",
        min(col("doc_id")).over(Window.partitionBy(col("line_key"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep_doc") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(   // nulls (dropped lines) never collect
              when(col("keep_doc") === col("doc_id"),
                struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          sep).as("cleaned"))
  }

  val qLineDedup = QuerySpec(
    "q_llm_line_dedup",
    (s, d) =>
      lineDedup(Tables.load(s, d, "documents")).orderBy(col("doc_id")),
    Some("""WITH lines AS (
           |  SELECT doc_id, i,
           |    list_extract(string_split(text, '. '), i) AS line
           |  FROM documents,
           |    LATERAL (SELECT unnest(generate_series(1,
           |      len(string_split(text, '. ')))) AS i) t
           |), owner AS (
           |  SELECT line, min(doc_id) AS keep_doc FROM lines GROUP BY line
           |)
           |SELECT l.doc_id,
           |  CAST(count(*) AS BIGINT) AS n_lines,
           |  CAST(sum(CASE WHEN o.keep_doc = l.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  coalesce(string_agg(CASE WHEN o.keep_doc = l.doc_id THEN l.line END,
           |                      '. ' ORDER BY l.i), '') AS cleaned
           |FROM lines l JOIN owner o ON l.line = o.line
           |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin))

  /** Token-budget sequence packing: assign documents to fixed-budget
    * training sequences by running token count within each source
    * stream, in deterministic doc_id order — the contiguous-chunking
    * form of sample packing (greedy first-fit needs sequential state;
    * contiguous packing is the distributed-friendly equivalent and is
    * what data loaders that concatenate-then-split do anyway). One
    * window shuffle per source partition; sources pack independently,
    * so skew in one source never serializes the others. */
  def packSequences(docs: DataFrame, budgetTokens: Long = 512L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("seq_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budgetTokens))
      .withColumn("offset_in_seq",
        (sum(col("n_tokens")).over(w) - col("n_tokens")) % budgetTokens)
  }

  val qPack = QuerySpec(
    "q_llm_pack",
    (s, d) =>
      packSequences(Tables.load(s, d, "documents"))
        .orderBy(col("source"), col("doc_id")),
    Some("""SELECT doc_id, source,
           |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |  CAST(floor((sum(len(string_split(text, ' ')))
           |      OVER (PARTITION BY source ORDER BY doc_id
           |            ROWS UNBOUNDED PRECEDING)
           |    - len(string_split(text, ' '))) / 512) AS BIGINT) AS seq_id,
           |  CAST((sum(len(string_split(text, ' ')))
           |      OVER (PARTITION BY source ORDER BY doc_id
           |            ROWS UNBOUNDED PRECEDING)
           |    - len(string_split(text, ' '))) % 512 AS BIGINT) AS offset_in_seq
           |FROM documents ORDER BY source, doc_id""".stripMargin))

  /** Domain mixing: per-source admission rates (per-10000, integer so
    * both the plan literal and the oracle stay float-free), applied via
    * the deterministic content bucket — the weighted form of
    * [[sampleByHash]]. This is how a pipeline hits a target corpus
    * composition ("2× web, 0.5× forums") without coordination: the
    * admission decision depends only on document bytes and the rate
    * table, so reruns, backfills, and late-arriving shards admit
    * identically. Rates ride the plan as a map literal (tiny);
    * `buckets` rows scan once with zero shuffle. */
  def mixSample(docs: DataFrame, ratesPer10k: Map[String, Int],
      defaultPer10k: Int, sourceCol: String = "source"): DataFrame = {
    val rateExpr = coalesce(
      element_at(typedLit(ratesPer10k), col(sourceCol)),
      lit(defaultPer10k))
    docs.filter(hashBucket(col("text"), 10000) < rateExpr)
  }

  val qMix = QuerySpec(
    "q_llm_mix",
    (s, d) =>
      mixSample(Tables.load(s, d, "documents"),
        Map("src0" -> 5000, "src1" -> 500), defaultPer10k = 1500)
        .select(col("doc_id"), col("source"),
          hashBucket(col("text"), 10000).as("bucket"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source,
           |  CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 10000 AS bucket
           |FROM documents
           |WHERE CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 10000 <
           |  CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 500
           |       ELSE 1500 END
           |ORDER BY doc_id""".stripMargin))

  /** Finer content bucket for fractional admission rates: first 8 hex
    * chars of SHA256 (32 bits) mod 1e6 — parts-per-million
    * granularity, same engine-portable construction as
    * [[hashBucket]]. */
  def ppmBucket(c: Column): Column =
    conv(substring(sha2(c.cast("binary"), 256), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Temperature-balanced source mixing — the multilingual-pretraining
    * rebalance (sample source s with probability ∝ n_s^α so
    * low-resource sources aren't drowned; the XLM/XLM-R convention,
    * α typically 0.3-0.7). Admitted counts here follow n_s^α with
    * α = 0.5 FIXED: the per-source admission threshold is
    * floor(1e6 · sqrt(min_n)/sqrt(n_s)), and IEEE-754 sqrt, divide,
    * and multiply are all correctly rounded — every engine computes
    * the identical thresholds bit-for-bit, which keeps this operator
    * fully DuckDB-oracle-checkable (a pow(n, α) for free α is not
    * guaranteed correctly rounded and could hash-diverge). The
    * smallest source's threshold is exactly 1e6 — kept whole; larger
    * sources admit ∝ 1/sqrt(n_s) of their documents, so admitted
    * counts equalize toward sqrt scale. Admission is per-document
    * content-hash vs threshold ([[mixSample]]'s determinism: rerun /
    * backfill stable, no seed table, partition-independent).
    *
    * Scale shape: one tiny groupBy(source) count, a single-row min
    * broadcast onto it, the ppm-threshold table broadcast back onto
    * one corpus scan — no corpus-wide shuffle at all. */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val minC = counts.agg(min(col("n_src")).as("min_n"))
    val rated = counts.crossJoin(broadcast(minC))
      .withColumn("rate_ppm",
        floor(lit(1000000.0) *
          (sqrt(col("min_n").cast("double")) / sqrt(col("n_src").cast("double"))))
          .cast("long"))
      .select(col("source"), col("rate_ppm"))
    docs.join(broadcast(rated), Seq("source"))
      .filter(ppmBucket(col("text")) < col("rate_ppm"))
  }

  val qTempMix = QuerySpec(
    "q_llm_temp_mix",
    (s, d) =>
      temperatureMix(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("source"), col("rate_ppm"))
        .orderBy(col("doc_id")),
    Some("""WITH counts AS (
           |  SELECT source, count(*) AS n_src FROM documents GROUP BY source
           |), m AS (
           |  SELECT min(n_src) AS min_n FROM counts
           |), rated AS (
           |  SELECT source,
           |    CAST(floor(1000000.0 * (sqrt(CAST(min_n AS DOUBLE)) /
           |      sqrt(CAST(n_src AS DOUBLE)))) AS BIGINT) AS rate_ppm
           |  FROM counts, m
           |)
           |SELECT d.doc_id, d.source, r.rate_ppm
           |FROM documents d JOIN rated r USING (source)
           |WHERE CAST(('0x' || substr(sha256(d.text), 1, 8)) AS BIGINT)
           |      % 1000000 < r.rate_ppm
           |ORDER BY d.doc_id""".stripMargin))

  /** Deterministic global shuffle for training order: a seeded
    * content-independent permutation key (md5 over seed:doc_id, first
    * 15 hex chars → 60-bit long). Ordering by (key, doc_id) IS the
    * shuffle — a range-partitioned distributed sort, NOT a
    * single-partition row_number window; data loaders consume the
    * sorted output sequentially. Reshuffling between epochs is a new
    * seed, not a new random state: every rerun of (seed, corpus)
    * yields byte-identical order. */
  def shuffleKey(idCol: Column, seed: Long): Column =
    conv(substring(md5(concat_ws(":", lit(seed), idCol.cast("string"))), 1, 15),
      16, 10).cast("long")

  val qShuffle = QuerySpec(
    "q_llm_shuffle",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), shuffleKey(col("doc_id"), seed = 7L).as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id")),
    Some("""SELECT doc_id,
           |  CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))
           |    AS BIGINT) AS shuffle_key
           |FROM documents
           |ORDER BY shuffle_key, doc_id""".stripMargin))

  /** Web-crawl markup scrub: drop script/style blocks wholesale, strip
    * remaining tags and entities, collapse whitespace. Pure codegen'd
    * regex chain (no UDF, no shuffle); patterns stay in the
    * backreference-free subset shared by java.util.regex and RE2, so
    * the operator is engine-portable by construction. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val noEnts = regexp_replace(noTags, "&[a-zA-Z#0-9]+;", " ")
    trim(regexp_replace(noEnts, "\\s+", " "))
  }

  /** The documents fixture is plain text, so the query manufactures the
    * markup it strips — wrapping every text in tags/script/entities
    * inside BOTH engines' plans — which makes the whole regex chain do
    * real work on every row and hash-match cross-engine. */
  val qStripMarkup = QuerySpec(
    "q_llm_strip_markup",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          stripMarkup(concat(
            lit("""<html><head><style type="text/css">body{x}</style></head>"""),
            lit("""<body onload="f()"><p class=t>"""), col("text"),
            lit("""</p>&nbsp;&amp;<script>var x = "<p>";</script></body></html>""")))
            .as("cleaned"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
           |  regexp_replace(regexp_replace(
           |    '<html><head><style type="text/css">body{x}</style></head>' ||
           |    '<body onload="f()"><p class=t>' || text ||
           |    '</p>&nbsp;&amp;<script>var x = "<p>";</script></body></html>',
           |    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
           |    '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
           |    '<[^>]*>', ' ', 'g'),
           |    '&[a-zA-Z#0-9]+;', ' ', 'g'),
           |    '\s+', ' ', 'g')) AS cleaned
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Canonical text normalization — the pass run before any
    * hash-keyed dedup so trivially-different copies (case, stray
    * control bytes, ragged whitespace) collapse to one identity:
    * control characters → space, whitespace runs collapsed, trimmed,
    * lowercased. Pure codegen'd per-row expressions (regexes in the
    * java.regex∩RE2 subset — explicit byte ranges, no \p classes),
    * ZERO shuffle. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), "\\s+", " ")))

  val qNormalize = QuerySpec(
    "q_llm_normalize",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          normalize(concat(lit("\tA  Messy\u0001 "), col("text"), lit("  \n")))
            .as("normalized"),
          (length(col("text")) -
            length(normalize(col("text")))).cast("long").as("n_removed"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  lower(trim(regexp_replace(regexp_replace(
           |    chr(9) || 'A  Messy' || chr(1) || ' ' || text || '  ' || chr(10),
           |    '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g'))) AS normalized,
           |  CAST(len(text) - len(lower(trim(regexp_replace(regexp_replace(
           |    text, '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g'))))
           |    AS BIGINT) AS n_removed
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Exact-quota stratified sample: the first `quota` documents per
    * source in deterministic content-hash order — "give me exactly N
    * per domain" with rerun/backfill stability (same property as
    * [[sampleByHash]]: the sample depends only on document bytes, not
    * partitioning or seeds).
    *
    * Scale shape: one window shuffle keyed on source — per-source
    * windows isolate skew exactly like sequence packing (q_llm_pack).
    * For a source with billions of rows the window input can first be
    * thinned with `hashBucket(text) < p` for any p that still admits
    * ≥ quota rows (the filter is a prefix of the sort order over a
    * uniform hash, so the surviving top-quota set is identical); the
    * operator's semantics don't change, which is why the thinning is
    * left to the caller. */
  def quotaSample(docs: DataFrame, quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(sha2(col("text").cast("binary"), 256), col("doc_id"))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
  }

  val qQuotaSample = QuerySpec(
    "q_llm_quota_sample",
    (s, d) =>
      quotaSample(Tables.load(s, d, "documents"), quota = 25)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy(col("source"), col("rk")),
    Some("""SELECT source, rk, doc_id FROM (
           |  SELECT source, doc_id,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY sha256(text), doc_id) AS BIGINT) AS rk
           |  FROM documents) t
           |WHERE rk <= 25
           |ORDER BY source, rk""".stripMargin))

  /** Fixed-size overlapping character chunking — the pre-embedding /
    * context-window split step of a RAG or training pipeline: each
    * document becomes ceil(n/stride) windows of `size` chars starting
    * every `stride` chars (empty text still yields one empty chunk, so
    * no document silently vanishes). Pure per-row array expressions
    * (sequence → posexplode → substr) with ZERO shuffle beyond the
    * declared output sort: chunking is embarrassingly parallel and
    * stays inside whole-stage codegen. Chunks are identified by
    * (doc_id, chunk_id) and carried as an md5 + length rather than
    * raw text, so downstream exchanges ship 40-byte rows. */
  def chunkDocs(docs: DataFrame, size: Int = 500, stride: Int = 400): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0),
          greatest(length(col("text")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start"),
        length(col("text").substr(col("col") + 1, lit(size)))
          .cast("long").as("chunk_len"),
        md5(col("text").substr(col("col") + 1, lit(size))).as("chunk_md5"))

  val qChunk = QuerySpec(
    "q_llm_chunk",
    (s, d) =>
      chunkDocs(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id"), col("chunk_id")),
    Some("""SELECT doc_id,
           |  CAST(st // 400 AS BIGINT) AS chunk_id,
           |  CAST(st AS BIGINT) AS "start",
           |  CAST(len(substr(text, st + 1, 500)) AS BIGINT) AS chunk_len,
           |  md5(substr(text, st + 1, 500)) AS chunk_md5
           |FROM documents, LATERAL (SELECT unnest(generate_series(0,
           |  greatest(len(text) - 1, 0), 400)) AS st) t
           |ORDER BY doc_id, chunk_id""".stripMargin))

  /** Boilerplate-line detection (the CCNet-style pass): a line is
    * boilerplate when it appears in >= minDf distinct documents of the
    * SAME source (nav bars, cookie banners, license footers repeat
    * within a crawl source, not across unrelated ones). Reports the
    * per-document line count, boilerplate-line count, and fraction.
    *
    * Scale shape: one scan exploded to lines, immediately narrowed to
    * a 128-bit (source, line) hash key — two seeded xxhash64s, the
    * lineDedup stance: 16 bytes cross the wire per line, never the
    * line text, and 64 bits alone would expect collisions at 10¹⁰
    * lines. The df aggregate is a groupBy + join back on that same
    * key — NOT `count(*) OVER (PARTITION BY ...)` — so both exchanges
    * share one shuffle key and AQE can split a skewed boilerplate
    * line (a window would pin the million-document cookie banner on
    * one task). The per-line distinct-doc count is map-side partially
    * aggregated. */
  def boilerplate(docs: DataFrame, minDf: Int = 3,
      sep: String = ". "): DataFrame = {
    val lines = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"),
        java.util.regex.Pattern.quote(sep))).as("line"))
      .select(col("doc_id"),
        struct(xxhash64(col("source"), col("line")),
          xxhash64(col("source"), col("line"), lit(1))).as("lk"))
    val dfs = lines.groupBy(col("lk"))
      .agg(count_distinct(col("doc_id")).as("line_df"))
    lines.join(dfs, Seq("lk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("line_df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac", col("n_boiler") / col("n_lines"))
  }

  val qBoilerplate = QuerySpec(
    "q_llm_boilerplate",
    (s, d) =>
      boilerplate(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH lines AS (
           |  SELECT doc_id, source, unnest(string_split(text, '. ')) AS line
           |  FROM documents
           |), dfs AS (
           |  SELECT source, line, count(DISTINCT doc_id) AS line_df
           |  FROM lines GROUP BY source, line
           |)
           |SELECT l.doc_id,
           |  CAST(count(*) AS BIGINT) AS n_lines,
           |  CAST(sum(CASE WHEN d.line_df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_boiler,
           |  sum(CASE WHEN d.line_df >= 3 THEN 1 ELSE 0 END) / count(*)
           |    AS boiler_frac
           |FROM lines l JOIN dfs d ON l.source = d.source AND l.line = d.line
           |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin))

  /** Materialize the curated corpus in the layout a training job
    * reads: parquet partitioned by (split, source), rows sorted by
    * doc_id within each file. The split is the content-hash
    * assignment, so a rerun or backfill writes byte-identical
    * partition memberships with zero coordination — the same
    * idempotent-sink stance as the cert store's partitioned write.
    * One shuffle (the repartition that co-locates each partition's
    * rows so a partition is `filesPerPartition` files, not
    * `shuffle.partitions` fragments — at 100 TB, small-file pressure
    * is the failure mode, same reasoning as IngestJob.compact).
    * `filesPerPartition` is also the skew valve: one hot (split,
    * source) pair would otherwise serialize on a single write task,
    * so the salt — itself a content hash, keeping rerun determinism —
    * spreads it over that many tasks/files. */
  def exportCorpus(docs: DataFrame, outDir: String,
      filesPerPartition: Int = 1): Unit =
    docs
      .withColumn("split", splitByHash(col("text")))
      .repartition(col("split"), col("source"),
        pmod(xxhash64(col("text")), lit(filesPerPartition.toLong)))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").partitionBy("split", "source").parquet(outDir)

  /** Corpus version diff — the dataset-release audit between two
    * snapshots: per doc_id, whether it was added, removed, changed
    * (same id, different content hash), or unchanged. What a data card
    * cites between v1 and v2, and what an incremental pipeline uses to
    * recompute only the changed slice.
    *
    * Scale shape: both snapshots narrow to (doc_id, 64-bit content
    * hash) in their scans — text never shuffles — then one full outer
    * join on doc_id; the status column is a null-pattern case over the
    * two hash columns. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def keyed(df: DataFrame, h: String) =
      df.select(col("doc_id"), xxhash64(col("text")).as(h))
    keyed(oldDocs, "old_h").join(keyed(newDocs, "new_h"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_h").isNull, "added")
          .when(col("new_h").isNull, "removed")
          .when(col("old_h") === col("new_h"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Oracle'd with the two snapshots carved from the documents table:
    * v1 = doc_id < 400 with the odd ids' text perturbed in-plan, v2 =
    * the table as shipped restricted to doc_id >= 100 — so all four
    * statuses occur. xxhash64 is Spark-only, but equality of hashes is
    * equality of text (mod collisions), which DuckDB states directly
    * on the text columns. */
  val qCorpusDiff = QuerySpec(
    "q_llm_corpus_diff",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val v1 = docs.filter(col("doc_id") < 400)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 1, concat(col("text"), lit(" v1-edit")))
            .otherwise(col("text")).as("text"))
      val v2 = docs.filter(col("doc_id") >= 100)
      corpusDiff(v1, v2).orderBy(col("doc_id"))
    },
    Some("""WITH v1 AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 2 = 1 THEN text || ' v1-edit'
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id < 400
           |), v2 AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id >= 100
           |)
           |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           |  CASE WHEN v1.doc_id IS NULL THEN 'added'
           |       WHEN v2.doc_id IS NULL THEN 'removed'
           |       WHEN v1.text = v2.text THEN 'unchanged'
           |       ELSE 'changed' END AS status
           |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
           |ORDER BY doc_id""".stripMargin))

  /** Topic-balanced (cluster-temperature) sampling: [[temperatureMix]]
    * with embedding-space CLUSTERS as the balancing key instead of the
    * source label. Source tags under-segment real crawls (one "web"
    * source hides a 100:1 topic imbalance); clustering the embedding
    * column and rebalancing cluster admission ∝ n_c^0.5 equalizes
    * topics the way XLM's n^α equalizes languages. Docs are assigned
    * to their nearest coarse centroid (the exact integer-domain
    * argmin chain shared with q_llm_ivf_stats — quantize + long-L2 +
    * lowest-id tiebreak, bit-replayable in SQL), then admitted by the
    * same floor(1e6·sqrt(min_n)/sqrt(n_c)) content-hash threshold as
    * [[temperatureMix]] — deterministic, rerun/backfill-stable.
    * Only documents WITH an embedding participate (inner join on id):
    * un-embedded docs have no topic signal to balance on.
    *
    * Scale shape: centroids broadcast + map-side argmin (no pairwise
    * shuffle); the doc↔embedding join is id-keyed (co-bucketable);
    * cluster counts are a k-row aggregate; thresholds broadcast back
    * onto that one joined scan. */
  def clusterTemperatureMix(docs: DataFrame, vecs: DataFrame,
      coarse: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val assigned = Similarity.assignCoarse(
        vecs.select(col("vec_id"),
          Similarity.quantize(col("embedding")).as("qfull")),
        coarse)
      .select(col("vec_id").as("doc_id"), col("list_id").as("cluster_id"))
    val member = docs.join(assigned, Seq("doc_id"))
    val counts = member.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_cl"))
    val minC = counts.agg(min(col("n_cl")).as("min_n"))
    val rated = counts.crossJoin(broadcast(minC))
      .withColumn("rate_ppm",
        floor(lit(1000000.0) *
          (sqrt(col("min_n").cast("double")) / sqrt(col("n_cl").cast("double"))))
          .cast("long"))
      .select(col("cluster_id"), col("rate_ppm"))
    member.join(broadcast(rated), Seq("cluster_id"))
      .filter(ppmBucket(col("text")) < col("rate_ppm"))
  }

  /** The assignment replay shared by the two cluster queries: the
    * q_llm_ivf_stats CTE chain (quantize → all-pairs centroid score →
    * rn=1 argmin with (dist, c_id) tiebreak) at the stride-100 seeds. */
  private val clusterAssignSql =
    """WITH q AS (
      |  SELECT vec_id,
      |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
      |      THEN list_transform(embedding, x -> 0)
      |      ELSE list_transform(embedding, x -> CAST(floor(
      |        CAST(x AS DOUBLE) /
      |        CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
      |        * 127.0 + 0.5) AS INTEGER))
      |    END AS qfull
      |  FROM embeddings
      |), coarse AS (
      |  SELECT vec_id AS c_id, qfull AS c_q FROM q WHERE vec_id % 100 = 0
      |), cscore AS (
      |  SELECT q.vec_id, c.c_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_zip(q.qfull, c.c_q),
      |        z -> CAST(z[1] - z[2] AS BIGINT) * (z[1] - z[2]))),
      |      (a, x) -> a + x) AS dist
      |  FROM q, coarse c
      |), assigned AS (
      |  SELECT vec_id, c_id AS cluster_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist, c_id) AS rn FROM cscore) WHERE rn = 1
      |), member AS (
      |  SELECT d.doc_id, d.source, d.text, a.cluster_id
      |  FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
      |)""".stripMargin

  /** Oracle'd end-to-end: the ivf_stats assignment CTE feeding the
    * temp_mix threshold arithmetic, every step bit-exact. */
  val qClusterMix = QuerySpec(
    "q_llm_cluster_mix",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val coarse = vs
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qfull"))
        .filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("c_id"), col("qfull").as("c_q"))
      clusterTemperatureMix(Tables.load(s, d, "documents"), vs, coarse)
        .select(col("doc_id"), col("cluster_id"), col("rate_ppm"))
        .orderBy(col("doc_id"))
    },
    Some(clusterAssignSql +
      """,
        |counts AS (
        |  SELECT cluster_id, count(*) AS n_cl FROM member GROUP BY cluster_id
        |), m AS (
        |  SELECT min(n_cl) AS min_n FROM counts
        |), rated AS (
        |  SELECT cluster_id,
        |    CAST(floor(1000000.0 * (sqrt(CAST(min_n AS DOUBLE)) /
        |      sqrt(CAST(n_cl AS DOUBLE)))) AS BIGINT) AS rate_ppm
        |  FROM counts, m
        |)
        |SELECT mem.doc_id, mem.cluster_id, r.rate_ppm
        |FROM member mem JOIN rated r USING (cluster_id)
        |WHERE CAST(('0x' || substr(sha256(mem.text), 1, 8)) AS BIGINT)
        |      % 1000000 < r.rate_ppm
        |ORDER BY mem.doc_id""".stripMargin))

  /** Cluster↔source composition data card: per embedding cluster, how
    * many docs it holds and which source dominates it (count, ties →
    * lexicographically smallest source) with its exact ppm share.
    * The "are my clusters just my sources?" diagnostic: top_ppm ≈ 1e6
    * everywhere means embedding topics mirror source labels (cluster
    * balancing adds nothing over [[temperatureMix]]); low top_ppm
    * means clusters cut across sources and cluster-level curation
    * genuinely differs from source-level.
    *
    * Scale shape: one id-keyed join, then every aggregate runs over
    * the k×S contingency (clusters × sources — tiny at any corpus
    * size); max-by reduces map-side; no window touches the corpus. */
  def clusterSourceCard(docs: DataFrame, vecs: DataFrame,
      coarse: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val assigned = Similarity.assignCoarse(
        vecs.select(col("vec_id"),
          Similarity.quantize(col("embedding")).as("qfull")),
        coarse)
      .select(col("vec_id").as("doc_id"), col("list_id").as("cluster_id"))
    val member = docs.join(assigned, Seq("doc_id"))
    val contingency = member.groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    contingency.groupBy(col("cluster_id"))
      .agg(sum(col("n")).as("n_docs"),
        min_by(struct(col("source"), col("n")),
          struct((-col("n")).as("neg_n"), col("source"))).as("w"))
      .select(col("cluster_id"), col("n_docs"),
        col("w.source").as("top_source"),
        expr("(1000000 * w.n) div n_docs").as("top_ppm"))
  }

  val qClusterCard = QuerySpec(
    "q_llm_cluster_card",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val vs = Tables.load(s, d, "embeddings")
      val coarse = vs
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qfull"))
        .filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("c_id"), col("qfull").as("c_q"))
      clusterSourceCard(Tables.load(s, d, "documents"), vs, coarse)
        .orderBy(col("cluster_id"))
    },
    Some(clusterAssignSql +
      """,
        |contingency AS (
        |  SELECT cluster_id, source, count(*) AS n
        |  FROM member GROUP BY cluster_id, source
        |), top AS (
        |  SELECT cluster_id, source, n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY n DESC, source) AS rn FROM contingency) WHERE rn = 1
        |)
        |SELECT c.cluster_id,
        |  (SELECT CAST(sum(n) AS BIGINT) FROM contingency x
        |    WHERE x.cluster_id = c.cluster_id) AS n_docs,
        |  c.source AS top_source,
        |  CAST((1000000 * c.n) // (SELECT sum(n) FROM contingency x
        |    WHERE x.cluster_id = c.cluster_id) AS BIGINT) AS top_ppm
        |FROM top c
        |ORDER BY c.cluster_id""".stripMargin))

  /** Per-source PII incidence data card — the release-audit view of
    * [[redact]]: how much PII the redaction pass would touch, per
    * source, BEFORE committing to it. Exact integer counts only (docs
    * scanned, docs with ≥1 hit per category, total hits, overall
    * ppm of PII-bearing docs) so the card hash-replays cross-engine.
    * The corpus is word-salad with no organic PII, so the query seeds
    * deterministic synthetic PII in-plan (the strip_markup stance:
    * wrap rows so the operator does real work on every row): doc_id %
    * 3 == 0 gains an email, doc_id % 5 == 0 a long account number.
    *
    * Scale shape: one corpus scan, per-row regex counts, one
    * map-side-combinable groupBy(source) — nothing else shuffles. */
  def piiReport(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("source"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
        .cast("long").as("n_em"),
      size(regexp_extract_all(col("text"), lit(longNumRe), lit(0)))
        .cast("long").as("n_num"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_em") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(col("n_em")).as("n_emails"),
        sum(when(col("n_num") > 0, 1L).otherwise(0L)).as("docs_with_long_num"),
        sum(col("n_num")).as("n_long_nums"),
        sum(when(col("n_em") > 0 || col("n_num") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"))
      .select(col("source"), col("n_docs"), col("docs_with_email"),
        col("n_emails"), col("docs_with_long_num"), col("n_long_nums"),
        expr("(1000000 * docs_with_pii) div n_docs").as("pii_docs_ppm"))
  }

  val qPiiReport = QuerySpec(
    "q_llm_pii_report",
    (s, d) =>
      piiReport(
        Tables.load(s, d, "documents")
          .select(col("source"),
            concat(col("text"),
              when(col("doc_id") % 3 === 0,
                concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
                .otherwise(lit("")),
              when(col("doc_id") % 5 === 0,
                concat(lit(" account 00"), col("doc_id") + 1234567))
                .otherwise(lit(""))).as("text")))
        .orderBy(col("source")),
    Some(s"""WITH seeded AS (
            |  SELECT source, text ||
            |    CASE WHEN doc_id % 3 = 0
            |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            |      ELSE '' END ||
            |    CASE WHEN doc_id % 5 = 0
            |      THEN ' account 00' || CAST(doc_id + 1234567 AS VARCHAR)
            |      ELSE '' END AS text
            |  FROM documents
            |), per_doc AS (
            |  SELECT source,
            |    CAST(len(regexp_extract_all(text, '$emailRe', 0)) AS BIGINT) AS n_em,
            |    CAST(len(regexp_extract_all(text, '$longNumRe', 0)) AS BIGINT) AS n_num
            |  FROM seeded
            |)
            |SELECT source, count(*) AS n_docs,
            |  CAST(sum(CASE WHEN n_em > 0 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS docs_with_email,
            |  CAST(sum(n_em) AS BIGINT) AS n_emails,
            |  CAST(sum(CASE WHEN n_num > 0 THEN 1 ELSE 0 END) AS BIGINT)
            |    AS docs_with_long_num,
            |  CAST(sum(n_num) AS BIGINT) AS n_long_nums,
            |  CAST((1000000 * sum(CASE WHEN n_em > 0 OR n_num > 0 THEN 1 ELSE 0 END))
            |    // count(*) AS BIGINT) AS pii_docs_ppm
            |FROM per_doc GROUP BY source ORDER BY source""".stripMargin))

  /** Release manifest: the per-(split, source) integrity card a
    * dataset release ships — doc count, exact char volume, and an
    * ORDER-INDEPENDENT content checksum (bit-XOR of 60-bit content
    * hashes). Two releases match iff their manifests match: any
    * added/removed/edited doc flips its group's xor, and xor — unlike
    * a sum — cannot overflow or depend on row order/partitioning, so
    * the checksum is reproducible on any engine and any cluster
    * layout. The consumer-side handshake for [[exportCorpus]], and
    * the cheap first diff before a full [[corpusDiff]].
    *
    * Scale shape: one corpus scan; count/sum/bit_xor all reduce
    * map-side into a splits×sources-row result; text never shuffles. */
  def releaseManifest(docs: DataFrame): DataFrame =
    docs.select(splitByHash(col("text")).as("split"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        bit_xor(col("h")).as("content_xor"))

  val qManifest = QuerySpec(
    "q_llm_manifest",
    (s, d) =>
      releaseManifest(Tables.load(s, d, "documents"))
        .orderBy(col("split"), col("source")),
    Some("""SELECT
           |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |       ELSE 'test' END AS split,
           |  source,
           |  count(*) AS n_docs,
           |  CAST(sum(len(text)) AS BIGINT) AS n_chars,
           |  CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
           |    AS BIGINT) AS content_xor
           |FROM (SELECT source, text,
           |        CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS b
           |      FROM documents) t
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Manifest diff: [[corpusDiff]] lifted to the release-group level —
    * compare two [[releaseManifest]]s and label every (split, source)
    * group added / removed / changed / unchanged. The consumer-side
    * handshake: manifests are k·s rows however big the corpora, so
    * this is the FREE first diff; only groups it flags as `changed`
    * need the per-doc [[corpusDiff]] pass. `changed` distinguishes
    * count drift from content drift (same n_docs, different xor =
    * in-place edits) via the n_delta column.
    *
    * Scale shape: two manifest scans (each map-side-reduced) into one
    * full outer join over the tiny group keyspace — nothing
    * corpus-sized moves. */
  def diffManifests(oldM: DataFrame, newM: DataFrame): DataFrame = {
    def keyed(df: DataFrame, p: String) =
      df.select(col("split"), col("source"),
        col("n_docs").as(s"${p}_n"), col("content_xor").as(s"${p}_x"))
    keyed(oldM, "old").join(keyed(newM, "new"),
        Seq("split", "source"), "full_outer")
      .select(col("split"), col("source"),
        when(col("old_n").isNull, "added")
          .when(col("new_n").isNull, "removed")
          .when(col("old_x") === col("new_x") && col("old_n") === col("new_n"),
            "unchanged")
          .otherwise("changed").as("status"),
        (coalesce(col("new_n"), lit(0L)) - coalesce(col("old_n"), lit(0L)))
          .as("n_delta"))
  }

  /** Oracle'd with the q_llm_corpus_diff snapshot carving: v1 =
    * doc_id < 400 with odd texts perturbed, v2 = doc_id >= 100 — so
    * every group pair exists in both but with edited content and
    * membership drift (all-`changed` statuses with varied n_delta),
    * plus the v1-only low-id slice exercising the outer sides. */
  val qManifestDiff = QuerySpec(
    "q_llm_manifest_diff",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val v1 = docs.filter(col("doc_id") < 400)
        .select(col("source"),
          when(col("doc_id") % 2 === 1, concat(col("text"), lit(" v1-edit")))
            .otherwise(col("text")).as("text"))
      val v2 = docs.filter(col("doc_id") >= 100)
        .select(col("source"), col("text"))
      diffManifests(releaseManifest(v1), releaseManifest(v2))
        .orderBy(col("split"), col("source"))
    },
    Some("""WITH v1 AS (
           |  SELECT source,
           |    CASE WHEN doc_id % 2 = 1 THEN text || ' v1-edit'
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id < 400
           |), v2 AS (
           |  SELECT source, text FROM documents WHERE doc_id >= 100
           |), m1 AS (
           |  SELECT CASE WHEN CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT)
           |           % 100 < 90 THEN 'train'
           |         WHEN CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT)
           |           % 100 < 95 THEN 'val' ELSE 'test' END AS split,
           |    source, count(*) AS n_docs,
           |    CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
           |      AS BIGINT) AS content_xor
           |  FROM v1 GROUP BY 1, 2
           |), m2 AS (
           |  SELECT CASE WHEN CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT)
           |           % 100 < 90 THEN 'train'
           |         WHEN CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT)
           |           % 100 < 95 THEN 'val' ELSE 'test' END AS split,
           |    source, count(*) AS n_docs,
           |    CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
           |      AS BIGINT) AS content_xor
           |  FROM v2 GROUP BY 1, 2
           |)
           |SELECT coalesce(m1.split, m2.split) AS split,
           |  coalesce(m1.source, m2.source) AS source,
           |  CASE WHEN m1.n_docs IS NULL THEN 'added'
           |       WHEN m2.n_docs IS NULL THEN 'removed'
           |       WHEN m1.content_xor = m2.content_xor
           |         AND m1.n_docs = m2.n_docs THEN 'unchanged'
           |       ELSE 'changed' END AS status,
           |  coalesce(m2.n_docs, 0) - coalesce(m1.n_docs, 0) AS n_delta
           |FROM m1 FULL OUTER JOIN m2
           |  ON m1.split = m2.split AND m1.source = m2.source
           |ORDER BY split, source""".stripMargin))

  // ---- leak-proof split (the FIX for what split_leak detects) -----------

  /** Train/val/test split where every near-dup CLUSTER lands in one
    * split: members inherit the split of their cluster representative
    * (the min-id member, the CC label), so a document can never sit in
    * train while its near-duplicate sits in the held-out set — the
    * leakage [[TextDedup.splitLeakage]] (q_llm_split_leak) detects,
    * prevented at assignment time instead of audited after. Unpaired
    * documents keep the plain [[splitByHash]] assignment, so the two
    * splits agree everywhere dedup found nothing.
    *
    * Still content-deterministic: the representative's split derives
    * from ITS text bytes, members follow the cluster structure — a
    * rerun or backfill assigns identically with no seed state.
    *
    * Scale shape: CC runs over graph MEMBERS only (the keep-list
    * stance); the representative-split frame is cluster-count-sized
    * and joins docs once on the id key to read the rep's text; the
    * corpus sees ONE narrow left join of (doc_id, rep_split). */
  def leakProofSplit(docs: DataFrame, pairs: DataFrame,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val cc = TextDedup.connectedComponents(pairs) // (id, cluster_id=min id)
    val repSplit = cc.select(col("cluster_id")).distinct()
      .join(docs.select(col("doc_id").as("cluster_id"), col("text")),
        Seq("cluster_id"))
      .select(col("cluster_id"),
        splitByHash(col("text"), trainPct, valPct).as("rep_split"))
    val memberSplit = cc.join(repSplit, Seq("cluster_id"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("rep_split"))
    docs.join(memberSplit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_id"),
        coalesce(col("rep_split"),
          splitByHash(col("text"), trainPct, valPct)).as("split"))
  }

  /** Oracle'd over the same bounded Jaccard block as the cluster
    * queries (recursive-CTE closure); the rep's split replays as the
    * sha256 bucket of the representative's text. */
  val qSplitSafe = QuerySpec(
    "q_llm_split_safe",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      leakProofSplit(docs, TextDedup.jaccardBlockPairs(docs))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE pairs AS (
           |  SELECT a.doc_id AS ida, b.doc_id AS idb
           |  FROM documents a JOIN documents b
           |    ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE a.doc_id < 200 AND b.doc_id < 200
           |    AND len(list_intersect(list_distinct(string_split(a.text, ' ')),
           |                           list_distinct(string_split(b.text, ' ')))) /
           |        len(list_distinct(list_concat(string_split(a.text, ' '),
           |                                      string_split(b.text, ' ')))) >= 0.5
           |), edges AS (
           |  SELECT ida AS a, idb AS b FROM pairs
           |  UNION SELECT idb, ida FROM pairs
           |), reach(a, b) AS (
           |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
           |), clusters AS (
           |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
           |), buckets AS (
           |  SELECT doc_id,
           |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |         ELSE 'test' END AS own_split
           |  FROM (SELECT doc_id,
           |          CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 100 AS b
           |        FROM documents) t
           |), member AS (
           |  SELECT cl.doc_id, cl.cluster_id, r.own_split AS rep_split
           |  FROM clusters cl JOIN buckets r ON r.doc_id = cl.cluster_id
           |)
           |SELECT d.doc_id,
           |  CAST(coalesce(m.cluster_id, d.doc_id) AS BIGINT) AS group_id,
           |  coalesce(m.rep_split, b.own_split) AS split
           |FROM documents d
           |LEFT JOIN member m USING (doc_id)
           |JOIN buckets b USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin))

  // ---- token-budget corpus selection --------------------------------------

  /** Select the best documents per source under a TOKEN budget — the
    * op every training run executes when the cleaned corpus still
    * exceeds the compute budget: rank by an exact integer
    * info-density score (distinct tokens per million tokens — repeats
    * and boilerplate rank last), admit in rank order while the
    * source's running token total stays within budget. Deterministic:
    * the rank order is (score desc, doc_id), so reruns admit
    * identically.
    *
    * Scale shape: one scan computes (n_tokens, score) per row; the
    * only shuffle is the per-SOURCE window (the q_llm_pack stance —
    * one hot source never serializes the rest, and a giant source
    * thins by hash prefix before ranking if a single window is too
    * long). */
  def budgetSelect(docs: DataFrame, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val scored = docs.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      // CAST before the multiply: int·1e6 wraps at ~2.1k tokens
      expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT) " +
        "* 1000000 div size(split(text, ' '))").as("score_ppm"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
  }

  val qBudgetSelect = QuerySpec(
    "q_llm_budget_select",
    (s, d) =>
      budgetSelect(Tables.load(s, d, "documents"), 10000L)
        .orderBy(col("source"), col("cum_tokens"), col("doc_id")),
    Some("""SELECT doc_id, source, n_tokens, score_ppm, cum_tokens
           |FROM (
           |  SELECT doc_id, source, n_tokens, score_ppm,
           |    CAST(sum(n_tokens) OVER (PARTITION BY source
           |      ORDER BY score_ppm DESC, doc_id
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           |  FROM (
           |    SELECT doc_id, source,
           |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |      CAST(len(list_distinct(string_split(text, ' '))) * 1000000 //
           |        len(string_split(text, ' ')) AS BIGINT) AS score_ppm
           |    FROM documents) t) w
           |WHERE cum_tokens <= 10000
           |ORDER BY source, cum_tokens, doc_id""".stripMargin))

  // ---- curriculum phase assignment ----------------------------------------

  /** Length-curriculum phase assignment (Bengio-style easy→hard
    * ordering, with token count as the difficulty proxy): documents
    * bucket into `qs.size + 1` phases at exact GLOBAL nearest-rank
    * quantile thresholds of n_tokens, so phase 1 is the shortest
    * quartile and training can schedule phases in order. Every
    * threshold is a length that actually occurs (nearest-rank, the
    * lenPercentiles stance) and the arithmetic is all integers —
    * bit-identical cross-engine and rerun-stable.
    *
    * Scale shape: a global sort would serialize the corpus, so the
    * quantiles compute in two cheap steps instead — one groupBy on
    * n_tokens (bounded-cardinality key: distinct document LENGTHS,
    * thousands at most, whatever the corpus size), then a running sum
    * over that tiny value frame (its SinglePartition window is k-row
    * by construction — the documented one-row-exchange stance). The
    * thresholds come back as ONE broadcast row and the phase label is
    * a pure per-row CASE; the corpus is scanned once and never
    * globally sorted. */
  def curriculumPhases(docs: DataFrame,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs == qs.sorted && qs.forall(q => q > 0 && q < 1))
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val byLen = lens.groupBy(col("n_tokens")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = byLen
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val thCols = qs.zipWithIndex.map { case (q, i) =>
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("n_tokens")))
        .as(s"t$i")
    }
    val thresholds = cum.agg(thCols.head, thCols.tail: _*)
    val labeled = lens.crossJoin(broadcast(thresholds))
    val phase = qs.indices.foldRight(lit(qs.size + 1)) { (i, rest) =>
      when(col("n_tokens") <= col(s"t$i"), lit(i + 1)).otherwise(rest)
    }
    labeled.select(col("doc_id"), col("n_tokens"),
      phase.cast("long").as("phase"))
  }

  val qCurriculum = QuerySpec(
    "q_llm_curriculum",
    (s, d) =>
      curriculumPhases(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH lens AS (
           |  SELECT doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |  FROM documents
           |), bylen AS (
           |  SELECT n_tokens, count(*) AS c FROM lens GROUP BY n_tokens
           |), cum AS (
           |  SELECT n_tokens,
           |    CAST(sum(c) OVER (ORDER BY n_tokens
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM bylen
           |), th AS (
           |  SELECT
           |    min(CASE WHEN cum >= ceil(0.25 * n) THEN n_tokens END) AS t0,
           |    min(CASE WHEN cum >= ceil(0.5 * n) THEN n_tokens END) AS t1,
           |    min(CASE WHEN cum >= ceil(0.75 * n) THEN n_tokens END) AS t2
           |  FROM cum
           |)
           |SELECT doc_id, n_tokens,
           |  CAST(CASE WHEN n_tokens <= t0 THEN 1
           |            WHEN n_tokens <= t1 THEN 2
           |            WHEN n_tokens <= t2 THEN 3
           |            ELSE 4 END AS BIGINT) AS phase
           |FROM lens CROSS JOIN th
           |ORDER BY doc_id""".stripMargin))

  val all: Seq[QuerySpec] =
    Seq(qSample, qSplit, qParaDedup, qRedact, qUrlDedup, qLineDedup, qPack,
      qMix, qTempMix, qShuffle, qStripMarkup, qNormalize, qQuotaSample,
      qChunk, qBoilerplate, qCorpusDiff, qClusterMix, qClusterCard,
      qPiiReport, qManifest, qManifestDiff, qSplitSafe, qBudgetSelect,
      qCurriculum)
}
