package graft.operators

import graft.catalog.QueryDef
import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Windowed event analytics (same code batch & streaming — StreamOps) and
  * multimodal column plumbing over the driver testdata.
  */
object StreamMediaQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- tumbling window counts (streaming op in batch mode) ----
    QueryDef(
      "q35_tumbling_window",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
        |       event_type,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100, 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
      StreamOps.tumblingCounts(Tables.eventsTs(s, dir), "1 hour")
        .orderBy("win_start", "event_type")
    },

    // ---- sliding windows (2h width, 1h slide): each event lands in 2 ----
    QueryDef(
      "q49_sliding_window",
      """SELECT win_start, count(*) AS n
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
        |                 time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'])
        |           AS win_start
        |  FROM events) t
        |GROUP BY win_start
        |ORDER BY win_start""".stripMargin) { (s, dir) =>
      StreamOps.slidingCounts(Tables.eventsTs(s, dir), "2 hours", "1 hour")
        .select(col("win_start"), col("n"))
        .orderBy("win_start")
    },

    // ---- session windows per user (gap-based) ----
    QueryDef(
      "q36_session_window",
      """WITH e AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CASE WHEN pts IS NULL OR ts - pts >= INTERVAL '10 minutes'
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (
        |  SELECT user_id,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, count(DISTINCT sid) AS n_sessions, count(*) AS n_events
        |FROM g
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      StreamOps.sessionCounts(Tables.eventsTs(s, dir), "10 minutes")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .orderBy("user_id")
    }.copy(headline = true),

    // ---- as-of join: each event joined to the user's latest prior order ----
    QueryDef(
      "q48_asof_join",
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_totalprice) AS order_price
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.o_orderdate,
        |       round(o.order_price, 2) AS order_price
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val o = graft.tables.Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max("o_totalprice").as("order_price"))
      val e = graft.tables.Tables.eventsTs(s, dir)
        .select("event_id", "user_id", "ts")
      Temporal.asofJoin(e, o, "user_id", "ts", "o_orderdate",
          Seq("o_orderdate", "order_price"))
        .select(col("event_id"), col("user_id"), col("o_orderdate"),
          round(col("order_price"), 2).as("order_price"))
        .orderBy("event_id")
    },

    // ---- multimodal: schema/metadata plumbing (oracle-checked) ----
    QueryDef(
      "q37_media_meta",
      """SELECT doc_id AS media_id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(n_chars % 640 + 16 AS INT) AS width,
        |       CAST(n_chars % 480 + 16 AS INT) AS height,
        |       CAST(n_chars % 240 + 1  AS INT) AS n_frames,
        |       octet_length(encode(text)) AS payload_bytes
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.nFrames").as("n_frames"),
          length(col("payload")).as("payload_bytes"))
        .orderBy("media_id")
    },

    // ---- multimodal: batched decode + features + frame sampling
    //      (StubCodec — rows-only; values asserted in MultimodalSpec) ----
    // ---- map-typed columns: per-user event-type counts built as a map
    //      (map_from_entries over collected pairs), then keyed lookups +
    //      cardinality — the map stays internal; outputs are plain
    //      columns so any engine can check them. ----
    QueryDef(
      "q56_map_functions",
      """SELECT user_id,
        |       count(DISTINCT event_type)                         AS n_types,
        |       CAST(coalesce(sum(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS n_click,
        |       CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      counts.groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
          .as("type_counts"))
        .select(col("user_id"),
          size(map_keys(col("type_counts"))).cast("long").as("n_types"),
          coalesce(element_at(col("type_counts"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("n_purchase"))
        .orderBy("user_id")
    },

    // The stub decode treats payload (UTF-8 bytes of text) as samples, so
    // the oracle recomputes the identical features in SQL: bytes via
    // hex-pair extraction, mean as exact-int-sum / count (bit-identical),
    // frame sampling as the same stride arithmetic.
    QueryDef(
      "q38_media_features",
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         |         hex(encode(text)) AS hx,
         |         octet_length(encode(text)) AS nb,
         |         (n_chars % 240) + 1 AS n_frames
         |  FROM documents),
         |f AS (
         |  SELECT media_id, kind, nb, n_frames,
         |         CASE WHEN nb = 0 THEN 0.0
         |              ELSE CAST(list_sum(list_transform(range(1, CAST(nb AS INT) + 1),
         |                   i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS INT))) AS DOUBLE) / nb
         |         END AS mean_i
         |  FROM m)
         |SELECT media_id, kind,
         |       CAST(nb AS INT) AS payload_bytes,
         |       round(mean_i, 4) AS mean_intensity,
         |       CASE WHEN kind = 'video'
         |            THEN CAST(floor((n_frames - 1) / 4) AS INT) + 1
         |            ELSE 0 END AS n_sampled_frames
         |FROM f
         |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
      val feats = Multimodal.extractFeatures(s, media).toDF()
      val frames = Multimodal.sampleFrames(media, stride = 4)
        .select(col("media_id"), col("n_sampled"))
      feats.join(frames, Seq("media_id"), "left_outer")
        .select(col("media_id"), col("kind"), col("payload_bytes"),
          round(col("mean_intensity"), 4).as("mean_intensity"),
          coalesce(col("n_sampled"), lit(0)).as("n_sampled_frames"))
        .orderBy("media_id")
    },

    // ---- REAL media codec end-to-end: encode documents into genuine
    //      WAV (even ids) / BMP (odd ids) containers, decode them back
    //      with the chunk-walking/row-padded RealCodec parsers, emit
    //      features. The oracle recomputes every output from the SOURCE
    //      bytes + the container specs — payload_bytes checks the
    //      header/padding math (44+2·nb for WAV; 54 + 4-byte-padded row
    //      for BMP), dim checks the value decoded FROM the header
    //      (sample rate / width), mean checks the sample parse — so a
    //      wrong byte order, row direction, or pad would hash-fail. ----
    QueryDef(
      "q116_media_codec",
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(doc_id % 2 AS INT) AS odd,
        |         hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents),
        |f AS (
        |  SELECT media_id, odd, nb, nb // 3 AS w,
        |         CASE WHEN odd = 1 THEN 3 * (nb // 3) ELSE nb END AS nv,
        |         hx
        |  FROM m),
        |g AS (
        |  SELECT media_id, odd, nb, w, nv,
        |         CAST(list_sum(list_transform(range(1, CAST(nv AS INT) + 1),
        |              i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS INT))) AS DOUBLE)
        |           / nv AS mean_i
        |  FROM f)
        |SELECT media_id,
        |       CASE WHEN odd = 1 THEN 'image' ELSE 'audio' END AS kind,
        |       CAST(CASE WHEN odd = 1 THEN 54 + ((3*w + 3) // 4) * 4
        |            ELSE 44 + 2*nb END AS INT) AS payload_bytes,
        |       CAST(CASE WHEN odd = 1 THEN w ELSE 16000 END AS INT) AS dim,
        |       round(mean_i, 4) AS mean_intensity
        |FROM g
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.realMediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.extractRealFeatures(s, media)
        .select(col("media_id"), col("kind"), col("payload_bytes"),
          col("dim"), round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy("media_id")
    },

    // ---- PNG round-trip features: deterministic 1×w RGB PNGs are
    //      ENCODED from each document's bytes (filter-0 + JDK Deflater),
    //      then decoded by the full chunk-walk→inflate→unfilter path in
    //      extractRealFeatures. The oracle never decompresses — it
    //      recomputes width (nb div 3, from IHDR on the Spark side) and
    //      pixel mean from the SAME source bytes, so a wrong inflate,
    //      filter, or stride hash-fails. (Compressed payload size is
    //      deflate-dependent, so unlike q116 it is not oracle-predicted;
    //      the decode values are.) ----
    QueryDef(
      "q138_png_features",
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents
        |  WHERE octet_length(encode(text)) >= 3),
        |g AS (
        |  SELECT media_id, nb // 3 AS w,
        |         CAST(list_sum(list_transform(range(1, CAST(3 * (nb // 3) AS INT) + 1),
        |              i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS INT))) AS DOUBLE)
        |           / (3 * (nb // 3)) AS mean_i
        |  FROM m)
        |SELECT media_id, 'image' AS kind, CAST(w AS INT) AS dim,
        |       round(mean_i, 4) AS mean_intensity
        |FROM g
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val w = bytes.length / 3
          if (w == 0) None
          else Some((id, "image",
            graft.multimodal.RealCodec.encodePng(
              java.util.Arrays.copyOf(bytes, w * 3), w, 1, channels = 3)))
        }
        .toDF("media_id", "kind", "payload")
      Multimodal.extractRealFeatures(s, media)
        .select(col("media_id"), col("kind"), col("dim"),
          round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy("media_id")
    }.copy(headline = true),

    // ---- REAL compressed-container walk end-to-end: documents become
    //      genuine MP3 frame streams (even ids) / ISO-BMFF MP4 box
    //      trees (odd ids), then extractRealFeatures PARSES the
    //      containers back. The oracle recomputes every output from the
    //      SOURCE bytes + the specs: payload_bytes checks the frame
    //      math (⌈nb/413⌉ 417-byte frames) and the box layout
    //      (ftyp 20 + moov 216 + mdat 8+nb = nb+244), dim checks the
    //      value parsed FROM the headers (44.1 kHz; tkhd 16.16 width),
    //      mean checks the payload-region walk (source bytes
    //      zero-padded to the frame grid / raw mdat) — a wrong frame
    //      stride, box size, or fixed-point shift hash-fails. Only the
    //      entropy decode of those payload regions remains stubbed. ----
    QueryDef(
      "q139_container_walk",
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(doc_id % 2 AS INT) AS odd,
        |         hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb,
        |         n_chars
        |  FROM documents),
        |f AS (
        |  SELECT media_id, odd, nb, n_chars, hx,
        |         greatest(1, (nb + 412) // 413) AS nfr
        |  FROM m),
        |s AS (
        |  SELECT media_id, odd, nb, nfr, n_chars,
        |         coalesce(list_sum(list_transform(range(1, CAST(nb AS INT) + 1),
        |             i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS INT))), 0) AS bsum
        |  FROM f)
        |SELECT media_id,
        |       CASE WHEN odd = 0 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(CASE WHEN odd = 0 THEN nfr * 417 ELSE nb + 244 END AS INT)
        |         AS payload_bytes,
        |       CAST(CASE WHEN odd = 0 THEN 44100
        |            ELSE (n_chars % 640) + 16 END AS INT) AS dim,
        |       round(CASE WHEN odd = 0 THEN CAST(bsum AS DOUBLE) / (nfr * 413)
        |                  WHEN nb = 0 THEN 0.0
        |                  ELSE CAST(bsum AS DOUBLE) / nb END, 4) AS mean_intensity
        |FROM s
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.containerMediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.extractRealFeatures(s, media)
        .select(col("media_id"), col("kind"), col("payload_bytes"),
          col("dim"), round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy("media_id")
    },

    // ---- audio DSP triage over DECODED PCM: RMS level, mean-crossing
    //      rate, peak/trough, duration — the silence/clipping/tone gate
    //      of a multimodal pipeline, run on the output of the REAL WAV
    //      chunk-walk decoder. The oracle recomputes every value from
    //      the SOURCE bytes (samples are the text's UTF-8 bytes by
    //      construction), so any decode defect — endianness, chunk
    //      offset, sample stride — hash-fails. All integer except the
    //      single final sqrt over the exact (Σv², n) pair, identical
    //      IEEE ops on both engines. Mean crossings are sign tests on
    //      n·vᵢ − Σv (no float mean, no division). ----
    QueryDef(
      "q148_audio_stats",
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents WHERE doc_id % 2 = 0),
        |v AS (
        |  SELECT media_id, nb,
        |         list_transform(range(1, CAST(nb AS INT) + 1),
        |           i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS BIGINT)) AS vs
        |  FROM m),
        |s AS (
        |  SELECT media_id, nb, vs,
        |         CAST(list_sum(vs) AS BIGINT) AS sumv,
        |         CAST(list_sum(list_transform(vs, x -> x * x)) AS BIGINT) AS sumsq
        |  FROM v),
        |c AS (
        |  SELECT media_id, nb, sumv, sumsq,
        |         CAST(coalesce(list_sum(list_transform(range(1, CAST(nb AS INT)),
        |           i -> CASE WHEN (nb * vs[i] - sumv) * (nb * vs[i+1] - sumv) < 0
        |                     THEN 1 ELSE 0 END)), 0) AS BIGINT) AS mcr,
        |         CAST(list_max(vs) AS BIGINT) AS peak,
        |         CAST(list_min(vs) AS BIGINT) AS trough
        |  FROM s)
        |SELECT media_id, nb AS n_samples,
        |       CAST(round(1000000 * sqrt(CAST(sumsq AS DOUBLE) / nb)) AS BIGINT)
        |         AS rms_micro,
        |       CAST(CASE WHEN nb >= 2 THEN 1000000 * mcr // (nb - 1)
        |                 ELSE 0 END AS BIGINT) AS mcr_ppm,
        |       peak, trough,
        |       CAST(1000000 * nb // 16000 AS BIGINT) AS duration_us
        |FROM c ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.realMediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.audioStats(s, media)
        .orderBy("media_id")
    },

    // ---- audio energy-delta fingerprint (q180): frame the decoded PCM
    //      into 16-sample windows, exact integer energy per frame, one
    //      sign-of-delta bit per frame boundary packed into a long —
    //      the Shazam-family fingerprint's integer-exact core. The
    //      Spark side goes WAV bytes → real chunk-walk decode → frame
    //      energies; the oracle recomputes the same bits straight from
    //      the payload's hex, so a wrong decode, frame cut, or bit pack
    //      hash-fails. ----
    QueryDef(
      "q180_audio_fingerprint",
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents WHERE doc_id % 2 = 0),
        |v AS (
        |  SELECT media_id,
        |         list_transform(range(1, CAST(nb AS INT) + 1),
        |           i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS BIGINT)) AS vs,
        |         CAST(nb // 16 AS BIGINT) AS nf
        |  FROM m),
        |e AS (
        |  SELECT media_id, nf,
        |         list_transform(range(1, CAST(nf AS INT) + 1),
        |           f -> list_sum(list_transform(
        |                  range(16*(f-1) + 1, 16*f + 1),
        |                  i -> vs[CAST(i AS INT)] * vs[CAST(i AS INT)]))) AS es
        |  FROM v)
        |SELECT media_id, nf AS n_frames,
        |       CAST(coalesce(list_sum(list_transform(
        |         range(1, CAST(least(nf - 1, 60) AS INT) + 1),
        |         f -> CASE WHEN es[CAST(f AS INT) + 1] > es[CAST(f AS INT)]
        |              THEN CAST(1 AS BIGINT) << (f - 1) ELSE 0 END)), 0)
        |         AS BIGINT) AS fp
        |FROM e ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.realMediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.audioFingerprint(s, media)
        .orderBy("media_id")
    },

    // ---- audio near-dup join over the q180 fingerprints (q181): plant
    //      one-byte-perturbed twins (one sample → one 4-sample frame →
    //      ≤2 adjacent fingerprint bits), band the 60-bit fingerprint
    //      into 4×15-bit slices, and find Hamming ≤ 3 pairs by the SAME
    //      banded pigeonhole join as image dHash (exact for ≤3). The
    //      oracle brute-forces ALL-pairs Hamming from the payload hex,
    //      so the banding's completeness is value-checked, not
    //      assumed. 4-sample frames give full-width fingerprints on
    //      catalog-length clips. ----
    QueryDef(
      "q181_audio_neardup",
      """WITH base AS (SELECT doc_id, text FROM documents),
        |tw AS (SELECT doc_id + 4000000 AS doc_id,
        |              substring(text, 1, length(text) - 1) || 'Z' AS text
        |       FROM base WHERE doc_id < 40 AND doc_id % 2 = 0),
        |d AS (SELECT * FROM base UNION ALL SELECT * FROM tw),
        |m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM d WHERE doc_id % 2 = 0),
        |v AS (
        |  SELECT media_id,
        |         list_transform(range(1, CAST(nb AS INT) + 1),
        |           i -> CAST(('0x' || substring(hx, 2*i - 1, 2)) AS BIGINT)) AS vs,
        |         CAST(nb // 4 AS BIGINT) AS nf
        |  FROM m),
        |e AS (
        |  SELECT media_id, nf,
        |         list_transform(range(1, CAST(nf AS INT) + 1),
        |           f -> list_sum(list_transform(
        |                  range(4*(f-1) + 1, 4*f + 1),
        |                  i -> vs[CAST(i AS INT)] * vs[CAST(i AS INT)]))) AS es
        |  FROM v),
        |f AS (
        |  SELECT media_id,
        |         CAST(coalesce(list_sum(list_transform(
        |           range(1, CAST(least(nf - 1, 60) AS INT) + 1),
        |           f -> CASE WHEN es[CAST(f AS INT) + 1] > es[CAST(f AS INT)]
        |                THEN CAST(1 AS BIGINT) << (f - 1) ELSE 0 END)), 0)
        |           AS BIGINT) AS fp
        |  FROM e)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM f a JOIN f b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val base = Tables.documents(s, dir).select("doc_id", "text")
      val twins = base.filter(col("doc_id") < 40 && col("doc_id") % 2 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 1)"), lit("Z"))
            .as("text"))
      val media = Multimodal.realMediaFromDocuments(s, base.union(twins))
      val fp = Multimodal.audioFingerprint(s, media, frameSamples = 4)
      val bands = fp.select(col("media_id"),
        (col("fp").bitwiseAND(0x7fffL)).cast("int").as("b0"),
        shiftrightunsigned(col("fp"), 15).bitwiseAND(0x7fffL)
          .cast("int").as("b1"),
        shiftrightunsigned(col("fp"), 30).bitwiseAND(0x7fffL)
          .cast("int").as("b2"),
        shiftrightunsigned(col("fp"), 45).bitwiseAND(0x7fffL)
          .cast("int").as("b3"))
      Multimodal.bandedHammingPairs(s, bands, maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // ---- image near-dup detection by perceptual hash (q150): render
    //      deterministic grayscale BMPs (planted exact + near-dup
    //      groups), dHash the DECODED pixels, pair via banded Hamming
    //      join. The Spark side goes pixels → real BMP encode → real
    //      decode → hash → 4-band LSH join; the oracle recomputes the
    //      hash straight from the pixel formula and BRUTE-FORCES
    //      all-pairs Hamming — so both the decode path and the banded
    //      join's ≤3-bit pigeonhole completeness are value-checked, not
    //      assumed. ----
    QueryDef(
      "q150_image_phash",
      """WITH d AS (SELECT doc_id, doc_id % 40 AS base FROM documents
        |           WHERE doc_id < 200),
        |xs AS (SELECT unnest(range(0, 9)) AS x),
        |ys AS (SELECT unnest(range(0, 8)) AS y),
        |px AS (
        |  SELECT doc_id, x, y,
        |         ((x + 1) * (base + 2) + (y + 1) * (base + 5) +
        |          CASE WHEN doc_id % 3 = 0 AND x = doc_id % 9 AND y = doc_id % 8
        |               THEN 40 ELSE 0 END) % 256 AS g
        |  FROM d CROSS JOIN xs CROSS JOIN ys),
        |bits AS (
        |  SELECT a.doc_id, a.y * 8 + a.x AS bit,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS v
        |  FROM px a JOIN px b
        |    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |bands AS (
        |  SELECT doc_id, bit // 16 AS band,
        |         CAST(sum(v * (1 << (bit % 16))) AS INT) AS bv
        |  FROM bits GROUP BY 1, 2),
        |wide AS (
        |  SELECT doc_id,
        |         max(CASE WHEN band = 0 THEN bv END) AS b0,
        |         max(CASE WHEN band = 1 THEN bv END) AS b1,
        |         max(CASE WHEN band = 2 THEN bv END) AS b2,
        |         max(CASE WHEN band = 3 THEN bv END) AS b3
        |  FROM bands GROUP BY 1)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
        |              bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
        |           AS INT) AS hamming
        |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id) t
        |WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
      val media = Multimodal.syntheticImagesFromDocuments(s, docs)
      val hashes = Multimodal.imageDHash(s, media)
      Multimodal.imageNearDupPairs(s, hashes, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }
  )
}
