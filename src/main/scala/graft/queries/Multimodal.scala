package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._

import Q.t

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * plus typed metadata. Decoding is two-tier: blobs with a recognized image
  * signature decode FOR REAL through `graft.media.MediaDecoder`
  * (`javax.imageio` — pure JVM, no native codecs), everything else falls
  * back to a clearly-marked deterministic STUB so mixed corpora keep
  * flowing. The Spark-side contract is real throughout: binary schema,
  * batched per-partition processing (`mapPartitions`, the Scala analog of
  * `mapInPandas` batches), typed output schema, and fingerprinting for
  * dedup of media blobs. The sf testdata corpus is text-only, so its
  * oracle rows exercise the stub tier; `media_decode` synthesizes real
  * PNGs in-executor to drive the `ImageIO` tier under the same oracle
  * regime, and `MultimodalSpec` unit-tests both tiers directly.
  */
object Multimodal {

  /** STUB decoder tier: deterministic fake for blobs that are not decodable
    * images — "decodes" a blob into (width, height, n_frames) derived from
    * its byte length, keeping the pipeline total over arbitrary payloads.
    */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, Int) =
    graft.media.MediaDecoder.stubDims(bytes)

  /** Real-first decode: `ImageIO` facts for genuine images (single frame),
    * stub arithmetic otherwise.
    */
  private def decodeOrStub(bytes: Array[Byte]): (Int, Int, Int) =
    graft.media.MediaDecoder.decode(bytes) match {
      case Some(d) => (d.width, d.height, 1)
      case None    => stubDecode(bytes)
    }

  private val featSchema = StructType(
    Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      // Scalar fingerprint of the 16-bucket byte histogram: the driver's
      // result-compare sorts column values in pandas, where array cells are
      // unhashable — scalar outputs only (same rule as the array functions).
      StructField("hist_fp", StringType, nullable = false)
    )
  )

  /** Family-keyed gradient PNG: ids in the same family of 4 render the
    * SAME gradient at the SAME dimensions; the per-id blue perturbation
    * shifts most pixels uniformly (which the cross-multiplied aHash
    * threshold is invariant to) but WRAPS the pixels near 255, flipping a
    * handful of hash bits — the planted perceptual near-dup whose bits
    * the SQL oracle can recompute exactly.
    */
  private def familyPng(id: Long): Array[Byte] = {
    val fam = id / 4
    val pert = (id % 4).toInt
    val w = (fam % 24 + 8).toInt
    val h = (fam % 16 + 8).toInt
    val img =
      new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rr = ((fam * 17 + 7L * x + 13L * y) % 256).toInt
        val gg = ((fam * 31 + 3L * x + 5L * y) % 256).toInt
        val bb = ((fam + x.toLong * y + pert) % 256).toInt
        img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private val phashSchema = StructType(
    Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", StringType, nullable = false)
    )
  )

  /** (doc_id, 16-hex aHash) through the production decode+hash path. */
  private def phashFrom(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents")
      .select(col("doc_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val hash = graft.media.MediaDecoder
            .aHash(familyPng(id))
            .getOrElse(sys.error(s"synthesized PNG for doc $id did not hash"))
          Row(id, f"$hash%016x")
        }
      }(Encoders.row(phashSchema))

  /** DuckDB CTE recomputing every aHash bit from the generation
    * arithmetic alone (shared by the hash and pairs oracles): per-pixel
    * scaled luma from the modular channel formulas, 8×8 block sums and
    * counts, cross-multiplied global-mean threshold, 16-bit bands packed
    * into the same `%04x`×4 hex layout the Scala side formats.
    */
  private val phashOracleCte: String = """
    WITH dims AS (
      SELECT doc_id,
             doc_id // 4 AS fam, doc_id % 4 AS pert,
             CAST((doc_id // 4) % 24 + 8 AS BIGINT) AS w,
             CAST((doc_id // 4) % 16 + 8 AS BIGINT) AS h
      FROM documents),
    blocks AS (
      SELECT doc_id, w, h,
        [ CAST(list_sum(list_transform(
            list_filter(range(0, w*h),
              p -> ((p // w) * 8 // h) * 8 + ((p % w) * 8 // w) = b),
            p -> 299*((fam*17 + 7*(p % w) + 13*(p // w)) % 256)
               + 587*((fam*31 + 3*(p % w) + 5*(p // w)) % 256)
               + 114*((fam + (p % w)*(p // w) + pert) % 256))) AS BIGINT)
          FOR b IN range(0, 64) ] AS bsum,
        [ CAST(len(list_filter(range(0, w*h),
              p -> ((p // w) * 8 // h) * 8 + ((p % w) * 8 // w) = b)) AS BIGINT)
          FOR b IN range(0, 64) ] AS bcnt
      FROM dims),
    totals AS (
      SELECT doc_id, w, h, bsum, bcnt, list_sum(bsum) AS tsum FROM blocks),
    bitsets AS (
      SELECT doc_id,
        [ CASE WHEN bcnt[b+1] > 0 AND bsum[b+1] * (w*h) > tsum * bcnt[b+1]
               THEN 1 ELSE 0 END
          FOR b IN range(0, 64) ] AS bit
      FROM totals),
    bands AS (
      SELECT doc_id,
        [ CAST(list_sum([ bit[16*k + j + 1] * (1 << j) FOR j IN range(0, 16) ])
               AS INTEGER)
          FOR k IN range(0, 4) ] AS band
      FROM bitsets),
    hashes AS (
      SELECT doc_id,
             printf('%04x%04x%04x%04x', band[4], band[3], band[2], band[1]) AS phash
      FROM bands)"""

  val all: Seq[Q] = Seq(
    // --- media metadata projection: binary length + content hash + stub dims ---
    Q(
      "media_meta",
      (s, d) => {
        val blob = col("text").cast("binary")
        t(s, d, "documents")
          .select(
            col("doc_id"),
            length(blob).as("n_bytes"),
            sha2(blob, 256).as("sha256"),
            (col("n_chars") % 640).cast("int").as("width"),
            ((col("n_chars") * 7) % 480).cast("int").as("height"),
            (col("n_chars") % 30).cast("int").as("n_frames")
          )
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               sha256(text) AS sha256,
               CAST(n_chars % 640 AS INTEGER) AS width,
               CAST((n_chars * 7) % 480 AS INTEGER) AS height,
               CAST(n_chars % 30 AS INTEGER) AS n_frames
        FROM documents ORDER BY doc_id
      """)
    ),

    // --- batched feature extraction over binary blobs (mapPartitions) ---
    Q(
      "media_features",
      (s, d) => {
        val rows = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
        val out = rows
          .mapPartitions { it =>
            // Batch-shaped processing: one decoder instance per partition,
            // records streamed through it — the mapInPandas execution shape.
            // Two-tier per blob: a recognized image routes through the REAL
            // pixel tier (decoded dims, 16-bin luma histogram over actual
            // pixels — media_pixel_features proves this tier oracle-exact
            // on synthesized images); anything else takes the deterministic
            // byte-histogram stub, keeping mixed corpora total.
            it.map { r =>
              val id = r.getLong(0)
              val blob = r.getAs[Array[Byte]](1)
              graft.media.MediaDecoder.features(blob) match {
                case Some(pf) =>
                  Row(id, blob.length, pf.width, pf.height, 1, pf.lumaHist.mkString(","))
                case None =>
                  val (w, h, f) = stubDecode(blob)
                  val hist = graft.media.MediaDecoder.byteHist(blob)
                  Row(id, if (blob == null) 0 else blob.length, w, h, f, hist.mkString(","))
              }
            }
          }(Encoders.row(featSchema))
          .orderBy("doc_id")
        out
      },
      // The stub decoder is deterministic arithmetic over the blob bytes,
      // so the whole mapPartitions output — byte histogram included — has
      // an exact SQL twin (the corpus is ASCII, so char positions ARE byte
      // positions; octet_length(encode(...)) keeps the byte semantics
      // honest either way).
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
               CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 30 AS INTEGER) AS n_frames,
               array_to_string(
                 [ len(list_filter(range(1, length(text)+1),
                                   i -> ord(substr(text, i, 1)) % 16 = b))
                   FOR b IN range(0, 16) ], ',') AS hist_fp
        FROM documents ORDER BY doc_id
      """)
    ),

    // --- aspect-preserving resize planning (stub decoder dims) ---
    Q(
      "media_resize",
      (s, d) => {
        val w = greatest((col("n_chars") % 640).cast("int"), lit(1))
        val h = greatest(((col("n_chars") * 7) % 480).cast("int"), lit(1))
        val scale = least(lit(224.0) / w, lit(224.0) / h)
        t(s, d, "documents")
          .select(
            col("doc_id"),
            w.as("in_w"),
            h.as("in_h"),
            floor(w * scale).cast("int").as("out_w"),
            floor(h * scale).cast("int").as("out_h")
          )
          .orderBy("doc_id")
      },
      Some("""
        WITH x AS (
          SELECT doc_id,
                 CAST(greatest(n_chars % 640, 1) AS INTEGER) AS in_w,
                 CAST(greatest((n_chars * 7) % 480, 1) AS INTEGER) AS in_h
          FROM documents)
        SELECT doc_id, in_w, in_h,
               CAST(floor(in_w * least(224.0 / in_w, 224.0 / in_h)) AS INTEGER) AS out_w,
               CAST(floor(in_h * least(224.0 / in_w, 224.0 / in_h)) AS INTEGER) AS out_h
        FROM x ORDER BY doc_id
      """)
    ),

    // --- frame sampling: every 5th frame of each clip ---
    Q(
      "media_frames",
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"), (col("n_chars") % 30).cast("int").as("n_frames"))
          .filter(col("n_frames") > 0)
          .select(
            col("doc_id"),
            explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx")
          )
          .orderBy("doc_id", "frame_idx")
      },
      Some("""
        SELECT doc_id, CAST(f AS INTEGER) AS frame_idx FROM (
          SELECT doc_id, unnest(range(0, CAST(n_chars % 30 AS BIGINT), 5)) AS f
          FROM documents WHERE n_chars % 30 > 0)
        ORDER BY doc_id, frame_idx
      """)
    ),

    // --- REAL ImageIO decode, end-to-end through the batch pipeline ---
    Q(
      "media_decode",
      (s, d) => {
        // Drives the real decoder tier under the oracle regime despite the
        // text-only corpus: each partition synthesizes a deterministic
        // solid-color PNG per doc_id (dims and color are pure functions of
        // the id), writes it with ImageIO, then round-trips it through the
        // SAME MediaDecoder the production path uses. The emitted facts —
        // decoded dims and the center pixel — must equal the generation
        // arithmetic, which the SQL oracle recomputes independently: a
        // decoder that mangles headers, strides, or color channels breaks
        // the hash-match. PNG is lossless, so pixel equality is exact.
        import org.apache.spark.sql.{Encoders, Row}
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("width", IntegerType, nullable = false),
          StructField("height", IntegerType, nullable = false),
          StructField("center_px", LongType, nullable = false)
        ))
        t(s, d, "documents")
          .select(col("doc_id"))
          .mapPartitions { it =>
            it.map { r =>
              val id = r.getLong(0)
              val w = (id % 48 + 8).toInt
              val h = (id % 32 + 8).toInt
              val rgb = ((id * 2654435761L) % 16777216L).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { img.setRGB(x, y, rgb); x += 1 }
                y += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              val blob = baos.toByteArray
              val dec = graft.media.MediaDecoder
                .decode(blob)
                .getOrElse(sys.error(s"synthesized PNG for doc $id did not decode"))
              val px = graft.media.MediaDecoder
                .pixelAt(blob, w / 2, h / 2)
                .getOrElse(sys.error(s"pixel read failed for doc $id"))
              Row(id, dec.width, dec.height, px.toLong)
            }
          }(Encoders.row(schema))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(doc_id % 48 + 8 AS INTEGER) AS width,
               CAST(doc_id % 32 + 8 AS INTEGER) AS height,
               CAST((doc_id * 2654435761) % 16777216 AS BIGINT) AS center_px
        FROM documents ORDER BY doc_id
      """)
    ),

    // --- REAL pixel features (luma histogram + aspect), oracle-exact ---
    Q(
      "media_pixel_features",
      (s, d) => {
        // The pixel tier of media_features under the oracle regime: each
        // partition synthesizes a deterministic GRADIENT PNG per doc_id
        // (channel values are integer functions of id and pixel position,
        // so the luma histogram is non-trivial), writes it with ImageIO,
        // then extracts features through the SAME MediaDecoder.features
        // the production path uses. The SQL oracle recomputes dims, the
        // integer-scaled aspect, and all 16 luma bins from the generation
        // arithmetic alone — a decoder that mangles strides, channels, or
        // gamma breaks the hash-match. PNG is lossless: equality is exact.
        val schema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("width", IntegerType, nullable = false),
          StructField("height", IntegerType, nullable = false),
          StructField("aspect_milli", LongType, nullable = false),
          StructField("luma_hist", StringType, nullable = false)
        ))
        t(s, d, "documents")
          .select(col("doc_id"))
          .mapPartitions { it =>
            it.map { r =>
              val id = r.getLong(0)
              val w = (id % 24 + 8).toInt
              val h = (id % 16 + 8).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rr = ((id + 7L * x + 13L * y) % 256).toInt
                  val gg = ((31L * id + 3L * x + 5L * y) % 256).toInt
                  val bb = ((id + 1L * x * y) % 256).toInt
                  img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
                  x += 1
                }
                y += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              val pf = graft.media.MediaDecoder
                .features(baos.toByteArray)
                .getOrElse(sys.error(s"synthesized PNG for doc $id did not decode"))
              Row(id, pf.width, pf.height, 1000L * pf.width / pf.height,
                pf.lumaHist.mkString(","))
            }
          }(Encoders.row(schema))
          .orderBy("doc_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id,
                 CAST(doc_id % 24 + 8 AS BIGINT) AS w,
                 CAST(doc_id % 16 + 8 AS BIGINT) AS h
          FROM documents)
        SELECT doc_id,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               1000 * w // h AS aspect_milli,
               array_to_string(
                 [ len(list_filter(range(0, w * h),
                     p -> (299 * ((doc_id + 7 * (p % w) + 13 * (p // w)) % 256)
                         + 587 * ((31 * doc_id + 3 * (p % w) + 5 * (p // w)) % 256)
                         + 114 * ((doc_id + (p % w) * (p // w)) % 256)) // 1000 // 16 = b))
                   FOR b IN range(0, 16) ], ',') AS luma_hist
        FROM dims ORDER BY doc_id
      """)
    ),

    // --- perceptual near-dup: aHash + banded Hamming pairs ---
    // Byte-exact dedup (media_dedup) misses re-encoded / slightly edited
    // copies of the same image — the visual analog of text near-dup. The
    // aHash tier closes it: every doc synthesizes a deterministic
    // FAMILY-keyed gradient PNG (ids in the same family of 4 render the
    // same gradient with a small per-id blue perturbation, so families
    // are planted perceptual near-dups whose wraparound pixels flip a
    // few hash bits), decodes through the production MediaDecoder, and
    // hashes via the integer-exact global-mean aHash. The SQL oracle
    // recomputes every bit from the generation arithmetic alone — a
    // decoder or hash regression breaks the match.
    Q(
      "media_phash",
      (s, d) => phashFrom(s, d).orderBy("doc_id"),
      Some(s"""
        $phashOracleCte
        SELECT doc_id, phash FROM hashes ORDER BY doc_id
      """)
    ),

    // Pairs within Hamming distance 3 via 4×16-bit banding — COMPLETE for
    // τ=3 by pigeonhole (3 flipped bits cannot touch all 4 bands), the
    // dedup_simhash_near recipe on the visual hash. Candidates meet only
    // inside a (band index, band value) bucket — O(n·k), never all-pairs
    // — with the explicit-count repartition pinning the pair shuffle.
    Q(
      "media_phash_pairs",
      (s, d) => {
        val hashed = Checkpoints.checkpoint(phashFrom(s, d))
        val bands = hashed.select(
          col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, 3),
                 k -> CAST(conv(substring(phash, 13 - 4*k, 4), 16, 10) AS INT))"""
          )).as(Seq("k", "band"))
          // Width from the session, not a literal 32: 2× total cores
          // floored at shuffle parallelism (the Dedup pair-join rule) —
          // a fixed count under-partitions the pair meet on wide clusters.
        ).repartition(Dedup.pairShufflePartitions(s), col("k"), col("band"))
        val cand = bands.select(col("doc_id").as("d1"), col("k"), col("band"))
          .join(bands.select(col("doc_id").as("d2"), col("k"), col("band")), Seq("k", "band"))
          .filter(col("d1") < col("d2"))
          .select("d1", "d2")
          .distinct()
        def bandInt(p: String, k: Int) =
          s"CAST(conv(substring($p, ${13 - 4 * k}, 4), 16, 10) AS INT)"
        val hamming = (0 until 4)
          .map(k => s"bit_count(${bandInt("p1", k)} ^ ${bandInt("p2", k)})")
          .mkString(" + ")
        cand
          .join(hashed.select(col("doc_id").as("d1"), col("phash").as("p1")), "d1")
          .join(hashed.select(col("doc_id").as("d2"), col("phash").as("p2")), "d2")
          .withColumn("hamming", expr(s"CAST($hamming AS INT)"))
          .filter(col("hamming") <= 3)
          .select("d1", "d2", "hamming")
          .orderBy("d1", "d2")
      },
      Some(s"""
        $phashOracleCte,
        b AS (
          SELECT doc_id, t.k,
                 ('0x' || substr(phash, 13 - 4*t.k, 4))::INTEGER AS band
          FROM hashes CROSS JOIN range(0, 4) t(k)),
        cand AS (
          SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2
          FROM b a JOIN b b2 ON a.k = b2.k AND a.band = b2.band AND a.doc_id < b2.doc_id),
        scored AS (
          SELECT c.d1, c.d2,
                 CAST(bit_count(xor(('0x' || substr(h1.phash, 1, 4))::INTEGER,  ('0x' || substr(h2.phash, 1, 4))::INTEGER))
                    + bit_count(xor(('0x' || substr(h1.phash, 5, 4))::INTEGER,  ('0x' || substr(h2.phash, 5, 4))::INTEGER))
                    + bit_count(xor(('0x' || substr(h1.phash, 9, 4))::INTEGER,  ('0x' || substr(h2.phash, 9, 4))::INTEGER))
                    + bit_count(xor(('0x' || substr(h1.phash, 13, 4))::INTEGER, ('0x' || substr(h2.phash, 13, 4))::INTEGER))
                   AS INTEGER) AS hamming
          FROM cand c
          JOIN hashes h1 ON c.d1 = h1.doc_id
          JOIN hashes h2 ON c.d2 = h2.doc_id)
        SELECT d1, d2, hamming FROM scored WHERE hamming <= 3 ORDER BY d1, d2
      """)
    ),

    // --- blob-level exact dedup (content-hash groupBy over binary) ---
    Q(
      "media_dedup",
      (s, d) => {
        t(s, d, "documents")
          .groupBy(sha2(col("text").cast("binary"), 256).as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("content_hash")
      },
      Some("""
        SELECT sha256(text) AS content_hash,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY content_hash
      """)
    )
  )
}
