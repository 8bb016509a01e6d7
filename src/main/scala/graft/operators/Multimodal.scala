package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed media row: opaque `binary` payload + typed metadata columns —
  * the multimodal column model (SURVEY.md §2.12 X5). */
case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte],
                       width: Int, height: Int)

/** Decoded/feature-extracted row: fixed-width feature vector + provenance. */
case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                         histogram: Array[Double])

/** Resized media: new payload + target dims, original dims kept for
  * provenance. */
case class ResizedMedia(doc_id: Long, media_type: String, content: Array[Byte],
                        width: Int, height: Int,
                        orig_width: Int, orig_height: Int)

/** One sampled frame of a media payload. */
case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Int,
                      frame: Array[Byte])

/** ==== STUB ====
  * Media decoding (JPEG→pixels, PCM→frames, H.264→keyframes) requires
  * codec libraries this container does not ship. The decode step is
  * stubbed as the IDENTITY on the payload bytes; everything around it —
  * schema, typed Dataset plumbing, per-partition init-once batching,
  * feature shape — is real and tested. Swap [[StubDecoder.decode]] for a
  * real codec to productionize.
  */
object StubDecoder {
  /** Executor-side singleton: "load the model/codec once per JVM", the
    * twin of the reference's module-level Comprehend client
    * (`ProcessStreamData.py:8-9`). */
  @transient lazy val instance: StubDecoder = new StubDecoder
}

final class StubDecoder extends Serializable {
  /** STUB decode: identity — real impl would decode the codec stream. */
  def decode(content: Array[Byte]): Array[Byte] = content

  /** Deterministic 8-bucket byte-value histogram, L1-normalized — a real
    * feature computation over the (stub-)decoded payload. */
  def features(r: MediaRecord): MediaFeatures = {
    val decoded = decode(r.content)
    val buckets = new Array[Double](8)
    decoded.foreach { b => buckets((b & 0xff) >> 5) += 1.0 }
    val n = math.max(decoded.length, 1).toDouble
    MediaFeatures(r.doc_id, r.media_type, decoded.length.toLong,
      buckets.map(_ / n))
  }
}

/** Multimodal columns (SURVEY.md §2.12 X5): media as `binary` payload +
  * typed metadata, with decode/feature-extract as a typed per-partition
  * batch map — the Scala/Dataset equivalent of the mapInPandas batch
  * shape (iterator-of-rows per partition, codec initialized once per
  * partition, never per record).
  *
  * Scale posture: payloads stay opaque bytes end-to-end (no driver
  * collect, no base64 inflation); metadata predicates (`media_type`,
  * dimensions) are plain columns so Catalyst prunes/pushes them without
  * touching payload bytes — at 100 TB the scan skips the binary column
  * entirely for metadata-only queries (Parquet column projection).
  */
object Multimodal {

  /** Synthesize the media table from `documents` (the driver testdata has
    * no binary column, so payload = UTF-8 bytes of the text; deterministic
    * metadata derived from n_chars). Schema/partitioning match what a real
    * ingest would produce. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"),
      (lit(16) + col("n_chars") % 640).cast("int").as("width"),
      (lit(16) + (col("n_chars") * 7) % 480).cast("int").as("height"))

  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
  }

  /** Feature extraction over the typed Dataset: per-partition batch map
    * with init-once decoder — the multimodal hot path. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = StubDecoder.instance // once per partition/JVM, not per row
      it.map(dec.features)
    }
  }

  /** X5 resize: aspect-preserving fit into a (maxW, maxH) box. The
    * TARGET-DIMENSION math is real (integer floor scale, 1-pixel floor —
    * what any thumbnailer computes); the pixel rescale itself sits
    * behind the stub decode, so the payload passes through unchanged.
    * Never upscales (scale capped at 1). */
  def resize(media: Dataset[MediaRecord],
             maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    require(maxW > 0 && maxH > 0, "resize: target box must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = StubDecoder.instance
      it.map { r =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
        val w = math.max(1, (r.width * scale).toInt)
        val h = math.max(1, (r.height * scale).toInt)
        ResizedMedia(r.doc_id, r.media_type, dec.decode(r.content),
          w, h, r.width, r.height)
      }
    }
  }

  /** X5 frame sampling: the (stub-)decoded payload is treated as
    * consecutive fixed-size frames; every `everyN`-th frame is kept
    * (video keyframe-sampling shape). The chunk/stride slicing is real;
    * a real codec would replace the fixed-size chunking with container
    * frame boundaries. A short final chunk is kept (real decoders emit
    * partial trailing fragments too). */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int,
                  everyN: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && everyN > 0, "frameSample: positive params")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = StubDecoder.instance
      it.flatMap { r =>
        val bytes = dec.decode(r.content)
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % everyN == 0 =>
            MediaFrame(r.doc_id, i, chunk.length, chunk)
        }
      }
    }
  }

  /** Oracle-gated resize audit (q61): runs the REAL [[resize]] Dataset
    * operator, then summarizes the produced dimensions per media type.
    * The target-dimension math (IEEE-double scale, truncate-toward-zero,
    * 1-pixel floor, never-upscale cap) is pure arithmetic both engines
    * compute bit-identically; only the payload passes through the
    * disclosed codec stub. */
  def resizeSummary(spark: SparkSession, dir: String,
                    maxW: Int = 128, maxH: Int = 96): DataFrame =
    resize(mediaDataset(spark, dir), maxW, maxH)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(when(col("width") < col("orig_width") ||
          col("height") < col("orig_height"), 1L).otherwise(0L))
          .as("n_downscaled"))
      .orderBy(col("media_type"))

  def resizeSummarySql(maxW: Int = 128, maxH: Int = 96): String =
    s"""WITH m AS (
       |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |    (16 + n_chars % 640)::INT AS w,
       |    (16 + (n_chars * 7) % 480)::INT AS h
       |  FROM documents
       |), s AS (
       |  SELECT media_type, w, h,
       |    least(CAST(1 AS DOUBLE),
       |          CAST($maxW AS DOUBLE) / w,
       |          CAST($maxH AS DOUBLE) / h) AS scale
       |  FROM m
       |), r AS (
       |  SELECT media_type, w, h,
       |    greatest(1, trunc(w * scale)::INT) AS new_w,
       |    greatest(1, trunc(h * scale)::INT) AS new_h
       |  FROM s
       |)
       |SELECT media_type, count(*) AS n_items,
       |  sum(new_w)::BIGINT AS sum_width,
       |  sum(new_h)::BIGINT AS sum_height,
       |  sum(CASE WHEN new_w < w OR new_h < h THEN 1 ELSE 0 END)::BIGINT
       |    AS n_downscaled
       |FROM r GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Oracle-gated frame-sampling audit (q62): runs the REAL
    * [[frameSample]] operator (fixed-size chunking, keep every
    * `everyN`-th, short trailing chunk kept), then summarizes frames per
    * media type. The oracle reproduces the chunk/stride arithmetic in
    * closed form — kept = ⌈⌈len/fb⌉/n⌉, with the short-tail deficit
    * subtracted only when the last chunk's index lands on the stride. */
  def frameSummary(spark: SparkSession, dir: String,
                   frameBytes: Int = 64, everyN: Int = 3): DataFrame = {
    val mt = when(pmod(col("doc_id"), lit(3)) === 0, "image")
      .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
      .otherwise("video")
    frameSample(mediaDataset(spark, dir), frameBytes, everyN)
      .select(mt.as("media_type"), col("doc_id"), col("n_bytes"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("n_bytes").cast("long")).as("sum_frame_bytes"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("media_type"))
  }

  def frameSummarySql(frameBytes: Int = 64, everyN: Int = 3): String = {
    val fb = frameBytes; val n = everyN
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio'
       |         ELSE 'video' END AS media_type,
       |    octet_length(text::BLOB) AS len
       |  FROM documents
       |), c AS (
       |  SELECT media_type, doc_id, len,
       |    (len + ${fb - 1}) // $fb AS nchunks
       |  FROM d
       |), k AS (
       |  SELECT media_type, doc_id,
       |    (nchunks + ${n - 1}) // $n AS kept,
       |    CASE WHEN nchunks > 0 AND (nchunks - 1) % $n = 0
       |         THEN $fb * nchunks - len ELSE 0 END AS short_deficit
       |  FROM c
       |)
       |SELECT media_type,
       |  sum(kept)::BIGINT AS n_frames,
       |  sum(kept * $fb - short_deficit)::BIGINT AS sum_frame_bytes,
       |  (count(*) FILTER (WHERE kept > 0))::BIGINT AS n_docs
       |FROM k GROUP BY media_type ORDER BY media_type""".stripMargin
  }

  /** X5 query: metadata + payload-size profile per media type. Catalyst
    * reads only (doc_id, n_chars, text) here; a metadata-only variant
    * would skip `text` entirely. */
  def mediaSummary(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(octet_length(col("content"))).cast("long").as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"))
      .orderBy(col("media_type"))

  def mediaSummarySql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS media_type,
      |  count(*) AS n_items,
      |  sum(octet_length(text::BLOB))::BIGINT AS total_bytes,
      |  round(avg(16 + n_chars % 640), 4) AS avg_width,
      |  round(avg(16 + (n_chars * 7) % 480), 4) AS avg_height
      |FROM documents
      |GROUP BY 1 ORDER BY media_type""".stripMargin

  /** X91 media-payload dedup audit (q165): per media type — items,
    * distinct payloads by sha-256 content digest (the key a
    * content-addressable blob store dedups on), duplicate items, the
    * byte mass a CAS would NOT re-store ((copies−1)·size per digest
    * group) and that saving in basis points of the total. The X1 exact
    * dedup applied to the BINARY column family: at 100 TB of media the
    * cheapest storage win is not near-dup ML, it's refusing to store the
    * same bytes twice (re-uploads, mirrored scrapes, thumbnail reposts).
    *
    * Scale posture: digest and size are computed AT THE SCAN
    * (sha2/octet_length projections) so the payload bytes never shuffle
    * — only the 32-byte digest and a long travel; one (type, digest)
    * histogram with map-side combine, then a \|types\|-row rollup. All
    * BIGINT. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_type"), sha2(col("content"), 256).as("h"),
        octet_length(col("content")).cast("long").as("sz"))
      .groupBy(col("media_type"), col("h"))
      .agg(count(lit(1)).as("copies"), max(col("sz")).as("sz"))
      .groupBy(col("media_type"))
      .agg(sum(col("copies")).as("n_items"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") - 1).as("n_dup_items"),
        sum((col("copies") - 1) * col("sz")).as("dup_bytes"),
        sum(col("copies") * col("sz")).as("total_bytes"))
      .withColumn("savings_bp",
        expr("dup_bytes * 10000 div total_bytes"))
      .orderBy(col("media_type"))

  def mediaDedupSql: String =
    """WITH m AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_type,
      |    sha256(text) AS h, octet_length(text::BLOB)::BIGINT AS sz
      |  FROM documents
      |), g AS (
      |  SELECT media_type, h, count(*)::BIGINT AS copies, max(sz)::BIGINT AS sz
      |  FROM m GROUP BY 1, 2
      |)
      |SELECT media_type, sum(copies)::BIGINT AS n_items,
      |  count(*)::BIGINT AS n_distinct,
      |  sum(copies - 1)::BIGINT AS n_dup_items,
      |  sum((copies - 1) * sz)::BIGINT AS dup_bytes,
      |  sum(copies * sz)::BIGINT AS total_bytes,
      |  (sum((copies - 1) * sz)::BIGINT * 10000
      |    // sum(copies * sz))::BIGINT AS savings_bp
      |FROM g GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Payload-size percentile table (q146): per media type, the exact
    * p50/p90/p99 of the binary payload size in bytes — the shard- and
    * cache-sizing table a blob store is provisioned from (how big is a
    * typical image vs the video tail). The q132 histogram-election
    * device on `octet_length(content)`: the corpus collapses to a
    * (type, size) histogram with map-side combine; only histogram rows
    * (bounded by the distinct-size grid, not the item count) are ever
    * windowed; cutoffs are exact integer rank elections. The binary
    * column itself never shuffles — `octet_length` is computed at the
    * scan and only the size integer travels. */
  def mediaBytePercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy(col("media_type"))
    val cumW = byType.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mediaTable(spark, dir)
      .select(col("media_type"),
        octet_length(col("content")).cast("long").as("v"))
      .groupBy(col("media_type"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(byType))
      .select(col("media_type"), col("v"), col("cum"), col("n"),
        explode(array(Seq(50, 90, 99).map(p => lit(p.toLong)): _*)).as("pct"))
      .filter(col("cum") >= expr("(pct * n + 99) div 100"))
      .groupBy(col("media_type"), col("pct"))
      .agg(min(col("v")).as("cutoff_bytes"), max(col("n")).as("n_items"))
      .orderBy(col("media_type"), col("pct"))
  }

  def mediaBytePercentilesSql: String =
    """WITH m AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_type,
      |    octet_length(text::BLOB)::BIGINT AS v
      |  FROM documents
      |), h AS (
      |  SELECT media_type, v, count(*)::BIGINT AS cnt FROM m GROUP BY 1, 2
      |), c AS (
      |  SELECT media_type, v,
      |    sum(cnt) OVER (PARTITION BY media_type ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(cnt) OVER (PARTITION BY media_type) AS n
      |  FROM h
      |), x AS (
      |  SELECT c.media_type, c.v, c.cum, c.n, p.pct
      |  FROM c CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct) p
      |  WHERE c.cum >= (p.pct * c.n + 99) // 100
      |)
      |SELECT media_type, pct::BIGINT AS pct, min(v)::BIGINT AS cutoff_bytes,
      |  max(n)::BIGINT AS n_items
      |FROM x GROUP BY 1, 2 ORDER BY media_type, pct""".stripMargin

  // ---- X127: perceptual-hash media near-dup (q201) -------------------------

  /** Cells in the [[mediaAhashNearDup]] average-hash grid (16 → a
    * 16-bit hash, two 8-bit Hamming bands). */
  val AhashCells: Int = 16

  /** The 16-bit average-hash of one payload as a Column: the 16 BYTES
    * of md5(content digest) are the cell values (the STUB stand-in for
    * decoded pixel-block means — swap the cell source for real pixels
    * to productionize, exactly like [[StubDecoder.decode]]), each
    * compared against the grid mean. ONE hash per payload — an
    * earlier 16-md5-per-row formulation cost 1.6 s on the bench for
    * identical audit semantics. shiftright(sum, 4) ≡ sum // 16 on
    * non-negative values, exact in both engines (Column./ would
    * divide as doubles). */
  private def ahash(dg: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = md5(dg.cast("binary"))
    val cells = (0 until AhashCells).map { i =>
      conv(substring(h, 2 * i + 1, 2), 16, 10).cast("long")
    }
    val mean = shiftright(cells.reduce(_ + _), 4)
    cells.zipWithIndex.map { case (c, i) =>
      when(c > mean, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** X127 perceptual near-dup audit (q201): per media type — items,
    * distinct perceptual hashes, banded candidate pairs, pairs within
    * Hamming distance 1, exact-hash pairs, and the near share in bp.
    * The average-hash family (aHash/pHash — the public perceptual-
    * hashing recipe): hash the DECODED content into a small bit
    * signature, then find near pairs by Hamming distance with a banded
    * (pigeonhole) join — distance ≤ 1 over two 8-bit bands guarantees
    * at least one band matches exactly, so candidates come from an
    * EQUI-join, never an all-pairs scan. The decode is the documented
    * X5 stub (cell values derive from the content digest); the
    * banding, grouping, pair arithmetic and Hamming verify — the parts
    * Spark owns at 100 TB — are real and oracle-gated.
    *
    * Scale posture: payloads reduce to a 32-byte digest AT THE SCAN
    * (the q165 rule — bytes never shuffle); items collapse to
    * (type, ahash) GROUPS before any join (the q20 sigGroups rule), so
    * the band self-join sees one row per hash group per band and pair
    * MASS is computed arithmetically from group sizes (n_a·n_b,
    * C(n,2)) — copy inflation grows counts, never join input. */
  def mediaAhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    // persisted like Dedup.sigGroups: the band self-join reads this
    // aggregate TWICE (left and right leg) — uncached, both legs would
    // re-scan the corpus and re-digest every payload
    val groups = graft.PlanCache.cached(spark, s"multimodal.ahashGroups:$dir") {
      mediaTable(spark, dir)
        .select(col("media_type"), sha2(col("content"), 256).as("dg"))
        .withColumn("ahash", ahash(col("dg")))
        .groupBy(col("media_type"), col("ahash"))
        .agg(count(lit(1)).as("n"))
    }
    val banded = groups.select(col("media_type"), col("ahash"), col("n"),
      explode(array(
        struct(lit(0L).as("band"), (col("ahash") % 256L).as("bv")),
        struct(lit(1L).as("band"),
          shiftright(col("ahash"), 8).as("bv")))).as("b"))
      .select(col("media_type"), col("ahash"), col("n"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val l = banded.select(col("media_type"), col("band"), col("bv"),
      col("ahash").as("ha"), col("n").as("na"))
    val r = banded.select(col("media_type").as("mt_b"), col("band").as("band_b"),
      col("bv").as("bv_b"), col("ahash").as("hb"), col("n").as("nb"))
    val cross = l.join(r,
        col("media_type") === col("mt_b") && col("band") === col("band_b") &&
          col("bv") === col("bv_b") && col("ha") < col("hb"))
      .select(col("media_type"), col("ha"), col("hb"), col("na"), col("nb"))
      .distinct()
      .withColumn("hd", expr("cast(bit_count(ha ^ hb) as bigint)"))
      .groupBy(col("media_type"))
      .agg(sum(col("na") * col("nb")).as("cross_cand"),
        sum(when(col("hd") <= 1L, col("na") * col("nb")).otherwise(0L))
          .as("cross_near"))
    val within = groups.groupBy(col("media_type"))
      .agg(sum(col("n")).as("n_items"),
        count(lit(1)).as("n_hashes"),
        sum(expr("n * (n - 1) div 2")).as("exact_pairs"))
    within.join(cross, Seq("media_type"), "left")
      .select(col("media_type"), col("n_items"), col("n_hashes"),
        (coalesce(col("cross_cand"), lit(0L)) + col("exact_pairs"))
          .as("cand_pairs"),
        (coalesce(col("cross_near"), lit(0L)) + col("exact_pairs"))
          .as("near_pairs"),
        col("exact_pairs"))
      .withColumn("near_bp", expr("CASE WHEN cand_pairs = 0 THEN 0 " +
        "ELSE near_pairs * 10000 div cand_pairs END"))
      .orderBy(col("media_type"))
  }

  def mediaAhashNearDupSql: String = {
    val cells = (0 until AhashCells)
      .map(i => s"(('0x' || substr(hh, ${2 * i + 1}, 2))::BIGINT)")
    val mean = s"((${cells.mkString(" + ")}) // $AhashCells)"
    val bits = cells.zipWithIndex
      .map { case (c, i) =>
        s"CASE WHEN $c > m THEN ${1L << i} ELSE 0 END" }
      .mkString(" + ")
    s"""WITH m0 AS (
       |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |    md5(sha256(text)) AS hh
       |  FROM documents
       |), withmean AS (
       |  SELECT media_type, hh, $mean AS m FROM m0
       |), hashed AS (
       |  SELECT media_type, ($bits)::BIGINT AS ahash FROM withmean
       |), g AS (
       |  SELECT media_type, ahash, count(*)::BIGINT AS n
       |  FROM hashed GROUP BY 1, 2
       |), banded AS (
       |  SELECT media_type, ahash, n, 0::BIGINT AS band,
       |    (ahash % 256)::BIGINT AS bv FROM g
       |  UNION ALL
       |  SELECT media_type, ahash, n, 1, (ahash // 256)::BIGINT FROM g
       |), cp AS (
       |  SELECT DISTINCT a.media_type, a.ahash AS ha, b.ahash AS hb,
       |    a.n AS na, b.n AS nb
       |  FROM banded a JOIN banded b
       |    ON a.media_type = b.media_type AND a.band = b.band
       |    AND a.bv = b.bv AND a.ahash < b.ahash
       |), cr AS (
       |  SELECT media_type, sum(na * nb)::BIGINT AS cross_cand,
       |    sum(CASE WHEN bit_count(xor(ha, hb)) <= 1 THEN na * nb
       |        ELSE 0 END)::BIGINT AS cross_near
       |  FROM cp GROUP BY 1
       |), w AS (
       |  SELECT media_type, sum(n)::BIGINT AS n_items,
       |    count(*)::BIGINT AS n_hashes,
       |    sum(n * (n - 1) // 2)::BIGINT AS exact_pairs
       |  FROM g GROUP BY 1
       |)
       |SELECT w.media_type, w.n_items, w.n_hashes,
       |  (coalesce(cr.cross_cand, 0) + w.exact_pairs)::BIGINT AS cand_pairs,
       |  (coalesce(cr.cross_near, 0) + w.exact_pairs)::BIGINT AS near_pairs,
       |  w.exact_pairs,
       |  (CASE WHEN coalesce(cr.cross_cand, 0) + w.exact_pairs = 0 THEN 0
       |    ELSE (coalesce(cr.cross_near, 0) + w.exact_pairs) * 10000
       |      // (coalesce(cr.cross_cand, 0) + w.exact_pairs)
       |    END)::BIGINT AS near_bp
       |FROM w LEFT JOIN cr USING (media_type)
       |ORDER BY w.media_type""".stripMargin
  }
}
