package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MAIN-CONTENT EXTRACTION — the first stage of a real crawl-curation
  * pipeline (trafilatura/boilerpipe-style line-density heuristics,
  * Kohlschütter et al. 2010, public): crawled pages are mostly
  * template — nav bars, ad units, footers — and every downstream
  * quality/dedup signal degrades if boilerplate reaches the corpus.
  * The extractor works per LINE of markup: strip tags, then keep a
  * line iff its visible text is long enough (≥ [[MinChars]] chars) AND
  * its link density is low (≤ 1 anchor per [[CharsPerLink]] visible
  * chars) — the two boilerpipe cues that do most of the work. Chrome
  * (nav/ads/footer: many anchors, little text) drops; prose paragraphs
  * (no anchors) survive; short fragments (titles, style leaks) drop on
  * length.
  *
  * The synthetic corpus is clean text, so the extractor runs on a
  * deterministically SYNTHESIZED page per document (the
  * qPiiScrub/plantedCodeView convention): doc text wrapped in `<p>`
  * lines between a nav (1 + doc_id % 4 repeats — variable boilerplate
  * share), an ad unit, and a footer; doc_id % 97 == 0 gets an EMPTY
  * body (the degenerate page the extractor must not crash on). Both
  * synthesis and extraction are pure string/regex expressions in the
  * RE2/Java-common subset (the qPiiScrub rule), so DuckDB replays the
  * whole pipeline and the driver hash-checks it end to end.
  *
  * Scale shape: zero-shuffle scan — synthesis, tag-strip, density
  * filter, fingerprint are all per-row expressions inside one
  * whole-stage-codegen span; only the presentation ORDER BY exchanges.
  * At 100 TB this runs at parquet-scan speed per executor. */
object HtmlExtract {

  /** Minimum visible chars for a line to be content. */
  private val MinChars = 30

  /** One anchor "spends" this many visible chars: a line with more
    * than one link per 25 chars of text is link-chrome, not prose. */
  private val CharsPerLink = 25

  /** The link marker counted by the replace-length trick (exact, no
    * regex engine divergence — the markerCount convention). */
  private val LinkMark = "<a href" // 7 chars

  /** Deterministic synthesized page for a `documents` row — one SQL
    * expression over (doc_id, text), dialect-shared with the oracle.
    * Lines: head/title+style leak, nav (variable repeats), ad unit,
    * one `<p>` line per sentence (or an empty body), footer. */
  private[graft] val htmlView: String =
    """concat(
      |  '<html><head><title>Doc ', cast(doc_id as string),
      |  '</title><style>.x{color:red}</style></head><body>', '\n',
      |  '<nav>', repeat('<a href="/home">home</a> <a href="/about">about</a> <a href="/tags">tags</a> ',
      |                  cast(1 + doc_id % 4 as int)), '</nav>', '\n',
      |  '<div class="ad"><a href="/buy">buy now</a> <a href="/offer">offer</a> sponsored</div>', '\n',
      |  case when doc_id % 97 = 0 then ''
      |       else array_join(transform(split(text, '\\. '),
      |                       s -> concat('<p>', s, '</p>')), '\n') end, '\n',
      |  '<footer><a href="/tos">terms</a> <a href="/privacy">privacy</a> (c) example.org</footer></body></html>')"""
      .stripMargin

  /** Adds the per-row extraction accounting columns (n_lines, n_kept,
    * total_chars, kept_chars + the internal __p/__k line arrays) to
    * any frame with a page-string column — ONE definition shared by
    * the batch query and the streaming monitor, so the dashboard and
    * the corpus job can never disagree on what "boilerplate" means.
    * All work is per-row HOFs over the split-line array. */
  private[graft] def withExtractCols(df: DataFrame,
      pageCol: String): DataFrame = {
    df.withColumn("__p", expr(
        s"""transform(split($pageCol, '\\n'), l -> named_struct(
           |  'txt', regexp_replace(l, '<[^>]*>', ''),
           |  'n_links', (length(l) - length(replace(l, '$LinkMark', ''))) div ${LinkMark.length}))"""
          .stripMargin))
      .withColumn("__k", expr(
        s"filter(__p, s -> length(s.txt) >= $MinChars AND s.n_links * $CharsPerLink <= length(s.txt))"))
      .withColumn("n_lines", size(col("__p")).cast("long"))
      .withColumn("n_kept", size(col("__k")).cast("long"))
      .withColumn("total_chars",
        expr("aggregate(__p, bigint(0), (a, s) -> a + length(s.txt))"))
      .withColumn("kept_chars",
        expr("aggregate(__k, bigint(0), (a, s) -> a + length(s.txt))"))
  }

  /** Extraction columns over a page-string column: line count, kept
    * count, visible-char accounting, boilerplate share (exact ppm) and
    * the kept-content md5 fingerprint downstream dedup would key on. */
  private[graft] def extract(df: DataFrame, idCol: String,
      pageCol: String): DataFrame = {
    withExtractCols(df, pageCol)
      .select(col(idCol),
        col("n_lines"), col("n_kept"),
        col("total_chars"), col("kept_chars"),
        expr("""case when total_chars > 0
               | then (total_chars - kept_chars) * 1000000 div total_chars
               | else bigint(0) end""".stripMargin).as("boilerplate_ppm"),
        md5(expr("array_join(transform(__k, s -> s.txt), ' ')"))
          .as("content_md5"))
  }

  /** STREAMING extraction-share monitor — the online arm of
    * [[qHtmlExtract]]: per event-time hour window, arriving documents'
    * extraction accounting (the SAME [[withExtractCols]] row
    * expressions as the batch query — synthesis included, so the
    * monitor watches the full stage) rolled into doc count, visible /
    * kept char sums, empty-extraction count, and the exact ppm
    * boilerplate share derived statelessly from the emitted sums. A
    * template rollout or extractor regression moves this dashboard
    * within the hour, while the corpus job is still queued. Append
    * mode, ONE watermarked aggregate: state is a single sum-tuple per
    * open window, evicted by the watermark. */
  def extractionShareHourly(docs: DataFrame, tsCol: String,
      watermark: String): DataFrame = {
    withExtractCols(docs.withColumn("page", expr(htmlView)), "page")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("total_chars")).as("total_chars"),
        sum(col("kept_chars")).as("kept_chars"),
        sum(when(col("n_kept") === 0L, 1L).otherwise(0L)).as("n_empty"))
      .withColumn("boilerplate_ppm",
        expr("""case when total_chars > 0
               | then (total_chars - kept_chars) * 1000000 div total_chars
               | else bigint(0) end""".stripMargin))
  }

  /** The synthesized-page frame: (doc_id, page). Shared by the direct
    * extraction query and the WARC-lite container pipeline (whose
    * payloads are these pages' bytes). */
  private[graft] def pages(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(htmlView).as("page"))

  def qHtmlExtract(spark: SparkSession, dir: String): DataFrame =
    extract(pages(spark, dir), "doc_id", "page").orderBy(col("doc_id"))

  /** Build-once WARC-lite container staging for a corpus dir: the
    * synthesized pages framed as crawl records (the ingest shape a
    * crawl pipeline actually starts from), one container per
    * partition under the session scratch dir. Marker-file protocol,
    * same once-per-(session, corpus) policy as SessionCache stages. */
  /** Once-per-(session, corpus) container staging shared by the plain
    * and gzip paths: the synthesized pages framed as crawl records,
    * written by `writeFn` under a keyed scratch dir with the marker-
    * file protocol (the SessionCache stage convention). */
  private def stageContainers(spark: SparkSession, dir: String,
      keyPrefix: String,
      writeFn: (org.apache.spark.sql.Dataset[graft.sources.WarcLite.WarcRecord], String) => Unit)
      : String = {
    import spark.implicits._
    val key = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val out = graft.SessionCache.scratchDir(spark, s"$keyPrefix-$key")
    this.synchronized {
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        writeFn(
          pages(spark, dir).select(col("doc_id"),
            concat(lit("https://example.org/doc/"), col("doc_id")).as("url"),
            encode(col("page"), "UTF-8").as("payload"))
            .as[graft.sources.WarcLite.WarcRecord], out)
        marker.createNewFile()
      }
    }
    out
  }

  private def stagedWarc(spark: SparkSession, dir: String): String =
    stageContainers(spark, dir, "warclite",
      (ds, out) => graft.sources.WarcLite.write(ds, out))

  /** The container-sourced twin of [[qHtmlExtract]]: pages framed into
    * WARC-lite containers (staged once per session), read back through
    * the binaryFile + linear-parse source, THEN extracted — the full
    * crawl ingest path (container → records → main content) with the
    * same hash-exact oracle as the direct query, so a framing or parse
    * defect anywhere in the container round trip fails the driver
    * hash. */
  def qWarcExtract(spark: SparkSession, dir: String): DataFrame = {
    val recs = graft.sources.WarcLite.read(spark, stagedWarc(spark, dir))
      .toDF()
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("page"))
    extract(recs, "doc_id", "page").orderBy(col("doc_id"))
  }

  /** Build-once GZIP-member container staging — the same records as
    * [[stagedWarc]] framed through the compressed path (one RFC 1952
    * member per record + the CDX sidecar, the layout real .warc.gz
    * archives ship in). */
  private def stagedWarcGz(spark: SparkSession, dir: String): String =
    stageContainers(spark, dir, "warclite-gz",
      (ds, out) => graft.sources.WarcLite.writeGz(ds, out))

  /** Build-once REAL-SYNTAX container staging — the same records framed
    * as genuine `WARC/1.0` response records (CRLF headers, HTTP
    * response block, CRLF CRLF separators), one per gzip member: the
    * closest shape to an actual Common Crawl archive. */
  private def stagedWarcRealGz(spark: SparkSession, dir: String): String =
    stageContainers(spark, dir, "warclite-real",
      (ds, out) => graft.sources.WarcLite.writeRealGz(ds, out))

  /** The COMPRESSED-container twin of [[qWarcExtract]]: pages framed
    * into per-record gzip members (ISO 28500 §6 — the shape a crawl
    * corpus from the wild actually arrives in), inflated + CRC-checked
    * member by member, parsed, THEN extracted — same hash-exact oracle
    * as the direct query, so a defect anywhere in the compression,
    * member framing, or parse flips the driver hash. */
  def qWarcExtractGz(spark: SparkSession, dir: String): DataFrame = {
    val recs = graft.sources.WarcLite.readGz(spark, stagedWarcGz(spark, dir))
      .toDF()
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("page"))
    extract(recs, "doc_id", "page").orderBy(col("doc_id"))
  }

  /** The INDEX-DRIVEN twin of [[qWarcExtractGz]]: members fetched
    * through the CDX-lite sidecar (seek → read one member's byte range
    * → inflate → parse), not by linear container scans — the Common
    * Crawl access pattern, where parallelism is member count and a
    * filtered index reads only the members it selects. Same hash-exact
    * oracle: the fan-out path must reproduce the linear path
    * bit-for-bit. */
  def qWarcExtractCdx(spark: SparkSession, dir: String): DataFrame = {
    val recs = graft.sources.WarcLite
      .readGzCdx(spark, stagedWarcGz(spark, dir))
      .toDF()
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("page"))
    extract(recs, "doc_id", "page").orderBy(col("doc_id"))
  }

  /** The REAL-RECORD-SYNTAX twin of [[qWarcExtractGz]] (VERDICT r14
    * item 1): genuine `WARC/1.0` response records — CRLF header lines,
    * mandatory `WARC-Record-ID`/`Content-Length` named fields, an
    * `application/http` block whose HTTP response header the reader
    * strips, CRLF CRLF separators — one per gzip member, the framing a
    * real Common Crawl `.warc.gz` ships. Same hash-exact oracle as the
    * direct extraction: a defect anywhere in the real-syntax framing,
    * HTTP-header strip, or the urn→doc_id mapping flips the driver
    * hash. */
  def qWarcExtractReal(spark: SparkSession, dir: String): DataFrame = {
    val recs = graft.sources.WarcLite
      .readGz(spark, stagedWarcRealGz(spark, dir))
      .toDF()
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("page"))
    extract(recs, "doc_id", "page").orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> qHtmlExtract,
    "q_warc_extract" -> qWarcExtract,
    "q_warc_extract_gz" -> qWarcExtractGz,
    "q_warc_extract_cdx" -> qWarcExtractCdx,
    "q_warc_extract_real" -> qWarcExtractReal
  )

  /** Dialect notes: DuckDB regexp_replace needs the 'g' flag (Spark's
    * is global by default); length() is chars in both; string_split is
    * literal where Spark split is regex (hence '\. ' vs '. '). */
  private[graft] val extractOracle: String =
    """WITH pg AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>.x{color:red}</style></head><body>' || chr(10) ||
      |    '<nav>' || repeat('<a href="/home">home</a> <a href="/about">about</a> <a href="/tags">tags</a> ',
      |                      CAST(1 + doc_id % 4 AS INT)) || '</nav>' || chr(10) ||
      |    '<div class="ad"><a href="/buy">buy now</a> <a href="/offer">offer</a> sponsored</div>' || chr(10) ||
      |    (CASE WHEN doc_id % 97 = 0 THEN ''
      |          ELSE array_to_string(list_transform(string_split(text, '. '),
      |                               s -> '<p>' || s || '</p>'), chr(10)) END) || chr(10) ||
      |    '<footer><a href="/tos">terms</a> <a href="/privacy">privacy</a> (c) example.org</footer></body></html>'
      |      AS page
      |  FROM documents),
      |ln AS (
      |  SELECT doc_id,
      |    list_transform(string_split(page, chr(10)), l -> struct_pack(
      |      txt := regexp_replace(l, '<[^>]*>', '', 'g'),
      |      n_links := (length(l) - length(replace(l, '<a href', ''))) // 7)) AS p
      |  FROM pg),
      |k AS (
      |  SELECT doc_id, p,
      |    list_filter(p, s -> length(s.txt) >= 30 AND s.n_links * 25 <= length(s.txt)) AS kept
      |  FROM ln),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(p) AS BIGINT) AS n_lines,
      |    CAST(len(kept) AS BIGINT) AS n_kept,
      |    CAST(coalesce(list_sum(list_transform(p, s -> length(s.txt))), 0) AS BIGINT) AS total_chars,
      |    CAST(coalesce(list_sum(list_transform(kept, s -> length(s.txt))), 0) AS BIGINT) AS kept_chars,
      |    md5(coalesce(array_to_string(list_transform(kept, s -> s.txt), ' '), ''))
      |      AS content_md5
      |  FROM k)
      |SELECT doc_id, n_lines, n_kept, total_chars, kept_chars,
      |  CAST(CASE WHEN total_chars > 0
      |       THEN (total_chars - kept_chars) * 1000000 // total_chars
      |       ELSE 0 END AS BIGINT) AS boilerplate_ppm,
      |  content_md5
      |FROM m ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_html_extract" -> extractOracle,
    // identical deterministic surface: the container round trip must
    // reproduce the direct extraction bit-for-bit — compressed or not
    "q_warc_extract" -> extractOracle,
    "q_warc_extract_gz" -> extractOracle,
    "q_warc_extract_cdx" -> extractOracle,
    "q_warc_extract_real" -> extractOracle
  )
}
