package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Multimodal
import graft.streaming.StreamOps
import Parity._

/** Multimodal plumbing + event-time session queries.
  *
  * m01/m02 drive the binary-column path (encode → binary → slice → hash)
  * with DuckDB oracles over the equivalent text operations (the payload is
  * ASCII, so byte slices == char slices; DuckDB's md5 is VARCHAR-only).
  * st01 is the batch form of the streaming sessionizer — session_window
  * semantics mirrored in SQL as a gap-island computation.
  */
object MediaStreamQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- the media column carries a REAL 54-byte BMP header (built
    //      in-plan from the doc's target dims) ahead of the payload, and
    //      the engine PARSES width/height back out of the header bytes
    //      (little-endian ints at offsets 18/22). The oracle computes the
    //      same dims from n_chars directly — a wrong byte anywhere in the
    //      build or parse arithmetic breaks the hash match. ----
    QueryDef("m01_media_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) + 54 AS INTEGER) AS byte_len,
        |  CAST(n_chars % 640 + 32 AS INTEGER) AS width,
        |  CAST((n_chars * 7) % 480 + 32 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val w = (col("n_chars") % 640 + 32).cast("int")
      val h = ((col("n_chars").cast("long") * 7) % 480 + 32).cast("int")
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.bmpHeader(w, h, length(payload)), payload))
      Multimodal.bmpMeta(withMedia, col("media"))
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"))
        .orderBy("doc_id")
    },

    // ---- same round-trip for audio: a REAL 44-byte canonical PCM WAV
    //      header built from doc-derived params, parsed back field by
    //      field; the oracle recomputes the params directly. ----
    QueryDef("m03_wav_meta",
      """SELECT doc_id,
        |  CAST(doc_id % 3 + 1 AS INTEGER) AS n_channels,
        |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 8000
        |       WHEN 1 THEN 16000 ELSE 44100 END AS INTEGER) AS sample_rate,
        |  CAST(16 AS INTEGER) AS bits_per_sample,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS data_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val ch = (col("doc_id") % 3 + 1).cast("int")
      val sr = when(col("doc_id") % 3 === 0, 8000)
        .when(col("doc_id") % 3 === 1, 16000).otherwise(44100)
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.wavHeader(sr, ch, lit(16), length(payload)), payload))
      Multimodal.wavMeta(withMedia, col("media"))
        .select(col("doc_id"), col("n_channels"), col("sample_rate"),
          col("bits_per_sample"), col("data_len"))
        .orderBy("doc_id")
    },

    QueryDef("m02_frame_hashes",
      """SELECT doc_id, CAST(t.frame_idx AS INTEGER) AS frame_idx,
        |  md5(substr(text, CAST(t.frame_idx * 100 + 1 AS BIGINT), 100)) AS frame_md5
        |FROM documents CROSS JOIN (SELECT unnest(range(4)) AS frame_idx) t
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Multimodal.frameSample(
          Multimodal.withMediaBytes(docs, col("text")),
          col("media"), n = 4, stride = 100)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    },

    // ---- content-addressed frame chunk dedup: the storage-dedup op a
    //      multimodal lake runs — identical frames (by digest) collapse
    //      to one stored chunk with a ref count and a deterministic
    //      canonical owner (lexicographic-min (doc, idx), encoded as
    //      doc·4+idx so the argmin is a plain integer MIN — portable and
    //      map-side combinable). One hash aggregate on the 16-byte
    //      digest: the t05 exact-dedup shape applied at CHUNK grain. ----
    QueryDef("m04_frame_chunk_dedup",
      """WITH f AS (
        |  SELECT doc_id, t.frame_idx,
        |    md5(substr(text, CAST(t.frame_idx * 100 + 1 AS BIGINT), 100)) AS frame_md5
        |  FROM documents CROSS JOIN (SELECT unnest(range(4)) AS frame_idx) t)
        |SELECT frame_md5, count(*) AS n_refs,
        |  CAST(min(doc_id * 4 + frame_idx) // 4 AS BIGINT) AS canonical_doc,
        |  CAST(min(doc_id * 4 + frame_idx) % 4 AS INTEGER) AS canonical_idx
        |FROM f GROUP BY 1 ORDER BY frame_md5""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val frames = Multimodal.frameSample(
          Multimodal.withMediaBytes(docs, col("text")),
          col("media"), n = 4, stride = 100)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))
      frames.groupBy("frame_md5")
        .agg(count(lit(1)).as("n_refs"),
          min(col("doc_id") * 4 + col("frame_idx")).as("__k"))
        .select(col("frame_md5"), col("n_refs"),
          // integer div — `/` on longs is DOUBLE division in Spark
          expr("__k div 4").as("canonical_doc"),
          (col("__k") % 4).cast("int").as("canonical_idx"))
        .orderBy("frame_md5")
    },

    // ---- m05: perceptual (aHash) near-dup pairs over media bytes — the
    //      IMAGE twin of t08's SimHash: 64 pixel bytes sampled at
    //      LENGTH-NORMALIZED positions (⌊i·len/64⌋ — the 8×8-resize grid
    //      of real aHash) past the real 54-byte BMP header,
    //      mean-thresholded into a 64-bit fingerprint as four 16-bit
    //      pigeonhole chunks (band equi-join candidates on an equal
    //      chunk — never all-pairs; complete ≤ 3 differing bits, an
    //      LSH-recall trade at the practical ≤ 8 bar used here — the
    //      oracle replicates the same blocking), verified by exact
    //      hamming. The engine reads REAL header-offset bytes from the
    //      binary column (hex/conv — no UDF); the oracle re-derives the
    //      same samples from the payload construction (m01's pattern)
    //      and embeds the SAME bit-pack formula strings
    //      (Multimodal.aHashChunkSql) — the pack cannot drift. ----
    QueryDef("m05_ahash_neardup", {
      val sampleArms = (0 until 64).map(i =>
        s"CASE WHEN len(text) >= 1 THEN ord(substr(text, ($i * len(text)) // 64 + 1, 1)) ELSE 0 END AS s$i")
        .mkString(", ")
      val meanExpr = (0 until 64).map(i => s"s$i").mkString("(", " + ", ") / 64.0")
      val chunkCols = (0 until 4).map(j => s"${Multimodal.aHashChunkSql(j)} AS c$j")
        .mkString(", ")
      val ham = (0 until 4).map(j => s"bit_count(xor(a.c$j, bb.c$j))")
        .mkString(" + ")
      s"""WITH s AS (SELECT doc_id, $sampleArms FROM documents),
         |m AS (SELECT *, $meanExpr AS mean FROM s),
         |h AS (SELECT doc_id, $chunkCols FROM m),
         |b AS (SELECT doc_id, 0 AS j, c0 AS v FROM h
         |      UNION ALL SELECT doc_id, 1, c1 FROM h
         |      UNION ALL SELECT doc_id, 2, c2 FROM h
         |      UNION ALL SELECT doc_id, 3, c3 FROM h),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM b x JOIN b y
         |           ON x.j = y.j AND x.v = y.v AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b, CAST($ham AS INTEGER) AS hamming
         |FROM cand JOIN h a ON a.doc_id = cand.id_a
         |JOIN h bb ON bb.doc_id = cand.id_b
         |WHERE $ham <= 8
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val payload = col("text").cast("binary")
      val w = (col("n_chars") % 640 + 32).cast("int")
      val h = ((col("n_chars").cast("long") * 7) % 480 + 32).cast("int")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.bmpHeader(w, h, length(payload)), payload))
      Multimodal.aHashNearDups(withMedia, col("doc_id"), col("media"))
        .orderBy("id_a", "id_b")
    },

    // ---- m07: ViT-style patch pooling — 4×4 patch grid means over the
    //      same length-normalized 8×8 sample grid m05's aHash thresholds
    //      (the patch-embedding front half of a vision transformer; byte
    //      reads stand in for decoded luma). Each mean is an exact
    //      quarter of a small int sum. Oracle re-derives every sample
    //      from the ASCII payload (the m01/m05 pattern). ----
    QueryDef("m07_patch_pool", {
      val sampleArms = (0 until 64).map(i =>
        s"CASE WHEN len(text) >= 1 THEN ord(substr(text, ($i * len(text)) // 64 + 1, 1)) ELSE 0 END AS s$i")
        .mkString(", ")
      val patchArms = (0 until 16).map { p =>
        val (r, c) = (p / 4, p % 4)
        val is = for { dr <- 0 to 1; dc <- 0 to 1 }
          yield (2 * r + dr) * 8 + (2 * c + dc)
        s"""SELECT doc_id, CAST($r AS INTEGER) AS pr, CAST($c AS INTEGER) AS pc,
           |  (${is.map(i => s"s$i").mkString(" + ")}) / 4.0 AS mean_byte FROM s""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH s AS (SELECT doc_id, $sampleArms FROM documents)
         |$patchArms
         |ORDER BY doc_id, pr, pc""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val w = (col("n_chars") % 640 + 32).cast("int")
      val h = ((col("n_chars").cast("long") * 7) % 480 + 32).cast("int")
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.bmpHeader(w, h, length(payload)), payload))
      Multimodal.patchPool(withMedia, col("doc_id"), col("media"))
        .orderBy("doc_id", "pr", "pc")
    },

    // ---- m06: per-frame RMS energy over REAL 16-bit PCM WAV streams —
    //      the audio twin of m02/m04's frame pipeline and the table
    //      silence-trim / VAD / loudness stages start from. The engine
    //      reads the data-section length out of the 44-byte header it
    //      built and decodes every little-endian int16 with codegen'd
    //      byte reads (sign via the two's-complement fold); the oracle
    //      re-derives the same samples from the ASCII payload directly
    //      (byte == char, the m01/m05 pattern), so one wrong byte offset
    //      anywhere in build or parse breaks the hash. Σs² stays integer
    //      → exact, order-independent; sqrt is one final double. ----
    QueryDef("m06_wav_frame_rms",
      s"""WITH f AS (SELECT doc_id, text, len(text) // 2 AS ns FROM documents),
         |i AS (SELECT doc_id, text, unnest(range(0, ns)) AS i FROM f WHERE ns > 0),
         |sm AS (SELECT doc_id, CAST(i // 64 AS INTEGER) AS frame,
         |    ord(substr(text, CAST(2 * i + 1 AS INTEGER), 1))
         |      + 256 * ord(substr(text, CAST(2 * i + 2 AS INTEGER), 1)) AS u
         |  FROM i),
         |sg AS (SELECT doc_id, frame,
         |    u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s FROM sm)
         |SELECT doc_id, frame, count(*) AS n_samples,
         |  ${graft.ops.Prep.floorToSql("sqrt(CAST(sum(s * s) AS DOUBLE) / count(*))", 6)} AS rms
         |FROM sg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val ch = (col("doc_id") % 3 + 1).cast("int")
      val sr = when(col("doc_id") % 3 === 0, 8000)
        .when(col("doc_id") % 3 === 1, 16000).otherwise(44100)
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.wavHeader(sr, ch, lit(16), length(payload)), payload))
      Multimodal.wavFrameRms(withMedia, col("doc_id"), col("media"))
        .select(col("id").as("doc_id"), col("frame"), col("n_samples"),
          graft.ops.Prep.floorTo(col("rms"), 6).as("rms"))
        .orderBy("doc_id", "frame")
    },

    // ---- m08: silence-run detection (VAD / silence-trim front end) —
    //      gaps-and-islands over m06's frame energies: frames under the
    //      threshold group into runs via the classic frame − row_number
    //      island key (consecutive silent frames share it); per clip:
    //      total frames, silent frames, run count, longest run. The rms
    //      doubles are bit-identical cross-engine (m06's parity), so the
    //      threshold comparison can't straddle engines. Everything after
    //      the frame decode is per-doc keyed windows + aggregates. ----
    QueryDef("m08_silence_runs",
      """WITH f AS (SELECT doc_id, text, len(text) // 2 AS ns FROM documents),
        |i AS (SELECT doc_id, text, unnest(range(0, ns)) AS i FROM f WHERE ns > 0),
        |sm AS (SELECT doc_id, CAST(i // 64 AS INTEGER) AS frame,
        |    ord(substr(text, CAST(2 * i + 1 AS INTEGER), 1))
        |      + 256 * ord(substr(text, CAST(2 * i + 2 AS INTEGER), 1)) AS u
        |  FROM i),
        |sg AS (SELECT doc_id, frame,
        |    u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s FROM sm),
        |fr AS (SELECT doc_id, frame,
        |    sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) AS rms
        |  FROM sg GROUP BY 1, 2),
        |sil AS (SELECT doc_id, frame,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS rn
        |  FROM fr WHERE rms < 25500.0),
        |isl AS (SELECT doc_id, frame - rn AS grp, count(*) AS run_len
        |        FROM sil GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*) AS n_runs, sum(run_len) AS n_silent,
        |          max(run_len) AS max_run
        |        FROM isl GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_frames FROM fr GROUP BY 1)
        |SELECT t.doc_id, t.n_frames,
        |  CAST(coalesce(a.n_silent, 0) AS BIGINT) AS n_silent,
        |  CAST(coalesce(a.n_runs, 0) AS BIGINT) AS n_runs,
        |  CAST(coalesce(a.max_run, 0) AS BIGINT) AS max_run
        |FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val ch = (col("doc_id") % 3 + 1).cast("int")
      val sr = when(col("doc_id") % 3 === 0, 8000)
        .when(col("doc_id") % 3 === 1, 16000).otherwise(44100)
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.wavHeader(sr, ch, lit(16), length(payload)), payload))
      val frames = Multimodal.wavFrameRms(withMedia, col("doc_id"), col("media"))
        .select(col("id").as("doc_id"), col("frame"), col("rms"))
      val wRun = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame")
      val isl = frames.filter(col("rms") < 25500.0)
        .withColumn("grp", col("frame") - row_number().over(wRun))
        .groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
      val agg = isl.groupBy("doc_id")
        .agg(count(lit(1)).as("n_runs"), sum(col("run_len")).as("n_silent"),
          max(col("run_len")).as("max_run"))
      frames.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("n_silent"), lit(0L)).as("n_silent"),
          coalesce(col("n_runs"), lit(0L)).as("n_runs"),
          coalesce(col("max_run"), lit(0L)).as("max_run"))
        .orderBy("doc_id")
    },

    // ---- m09: shot-boundary (scene-change) detection — the video twin
    //      of m08's audio silence runs: 8 equal payload spans, each
    //      span's brightness proxy = mean of 16 evenly-spaced byte
    //      reads, a shot boundary where consecutive means jump > 8.
    //      Everything is one codegen'd projection (the aHash grid
    //      idiom): integer byte sums / 2⁴ are exact doubles, so the
    //      oracle's ord()-rebuilt means match bit-for-bit. ----
    QueryDef("m09_scene_changes", {
      val sampleArms = (0 until 128).map(i =>
        s"""CASE WHEN len(text) >= 1
           | THEN ord(substr(text, ($i * len(text)) // 128 + 1, 1)) ELSE 0
           | END""".stripMargin.replace("\n", ""))
      val meanArms = (0 until 8).map { f =>
        val terms = (0 until 16).map(k => s"s${f * 16 + k}").mkString(" + ")
        s"(($terms) / 16.0) AS m$f"
      }.mkString(", ")
      val diffs = (1 to 7).map(f => s"abs(m$f - m${f - 1})")
      val shots = diffs.map(d => s"CASE WHEN $d > 8.0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH s AS (SELECT doc_id,
         |    ${(0 until 128).map(i => s"${sampleArms(i)} AS s$i").mkString(", ")}
         |  FROM documents),
         |m AS (SELECT doc_id, $meanArms FROM s)
         |SELECT doc_id, CAST(1 + $shots AS BIGINT) AS n_shots,
         |  greatest(${diffs.mkString(", ")}) AS max_jump
         |FROM m ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      Multimodal.sceneChanges(
          Multimodal.withMediaBytes(Tables.documents(s, dir), col("text")),
          col("doc_id"), col("media"))
        .orderBy("doc_id")
    },

    QueryDef("st01_session_agg",
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .transform(StreamOps.sessionAgg("ts", "user_id", "30 minutes"))
        .select(col("user_id"),
          tsStr(col("session_window.start")).as("session_start"),
          tsStr(col("session_window.end")).as("session_end"),
          col("n_events"),
          col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // ---- batch form of the 15-minute tumbling-window aggregate (same
    //      StreamOps.tumblingAgg code runs under readStream with a
    //      watermark — parity proven in StreamingSpec). Spark's window()
    //      buckets are epoch-aligned; DuckDB's time_bucket origin
    //      (2000-01-03) is a whole multiple of 15 min from the epoch, so
    //      the bucket edges coincide. ----
    QueryDef("st02_tumbling_agg",
      """SELECT strftime(time_bucket(INTERVAL '15 minutes', ts),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .transform(StreamOps.tumblingAgg("ts", "event_type", "15 minutes"))
        .select(tsStr(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // ---- sliding window aggregate (30-min width / 15-min slide): every
    //      event lands in exactly TWO windows — epoch-aligned starts
    //      trunc15(ts) and trunc15(ts)−15m — so the oracle is the UNION
    //      ALL of two shifted tumbling groupings. Same alignment note as
    //      st02 (time_bucket's origin is a whole multiple of 15 min from
    //      the epoch). StreamingSpec proves streaming==batch with a
    //      watermark. ----
    QueryDef("st04_sliding_agg",
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS ws, event_type, value
        |  FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes',
        |    event_type, value
        |  FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .transform(StreamOps.slidingAgg("ts", "event_type", "30 minutes", "15 minutes"))
        .select(tsStr(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // ---- stream-stream watermarked join, batch form: every click joined
    //      to the same user's views in the preceding 12 hours (attribution
    //      shape). Under readStream BOTH sides carry watermarks and the
    //      time-bound condition is what lets the engine expire join state
    //      (StreamOps.intervalJoin; StreamingSpec proves batch==stream AND
    //      that an event arriving behind the watermark no longer joins).
    //      Batch mode is the same range equi-join — fully oracled. ----
    QueryDef("st05_stream_stream_join",
      """SELECT c.user_id, c.event_id AS click_id, i.event_id AS view_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(i.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
        |FROM events c JOIN events i
        |  ON i.user_id = c.user_id
        |  AND c.event_type = 'click' AND i.event_type = 'view'
        |  AND i.ts >= c.ts - INTERVAL 12 HOUR AND i.ts <= c.ts
        |ORDER BY c.user_id, click_id, view_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))
      StreamOps.intervalJoin(clicks, views, "user_id", "click_ts", "view_ts",
          lookback = "12 hours", watermark = "1 hour")
        .select(col("user_id"), col("click_id"), col("view_id"),
          tsStr(col("click_ts")).as("click_ts"),
          tsStr(col("view_ts")).as("view_ts"))
        .orderBy("user_id", "click_id", "view_id")
    },

    // ---- stream-stream LEFT OUTER interval join, batch form: every
    //      click, with its preceding-2h views or null-padded if none.
    //      The outer variant is semantically heavier than st05 under
    //      streaming: an unmatched click can only be emitted once the
    //      watermark PROVES no view can still arrive — StreamingSpec pins
    //      exactly that deferred emission. Batch form fully oracled
    //      (~80% of clicks here have no view in window, so the null-pad
    //      path carries the hash). ----
    QueryDef("st06_stream_outer_join",
      """SELECT c.user_id, c.event_id AS click_id, i.event_id AS view_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(i.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') i
        |  ON i.user_id = c.user_id
        |  AND i.ts >= c.ts - INTERVAL 2 HOUR AND i.ts <= c.ts
        |ORDER BY c.user_id, click_id, view_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))
      StreamOps.intervalJoin(clicks, views, "user_id", "click_ts", "view_ts",
          lookback = "2 hours", watermark = "1 hour", joinType = "left_outer")
        .select(col("user_id"), col("click_id"), col("view_id"),
          tsStr(col("click_ts")).as("click_ts"),
          tsStr(col("view_ts")).as("view_ts"))
        .orderBy("user_id", "click_id", "view_id")
    },

    // ---- composed streaming pipeline, batch form: exact-re-delivery
    //      dedup → stream-static dimension enrichment → 15-min tumbling
    //      aggregate per market segment. The SAME three StreamOps
    //      transforms run under readStream (watermarked dedup state,
    //      per-micro-batch broadcast enrich, windowed agg) —
    //      StreamingSpec proves streaming==batch on this exact chain.
    //      Segment is coalesced to '(none)' on both engines so no NULL
    //      grouping/ordering divergence can bite. ----
    QueryDef("st03_dedup_enrich_agg",
      """WITH d AS (SELECT DISTINCT user_id, ts, value FROM events),
        |e AS (SELECT d.*, coalesce(c_mktsegment, '(none)') AS seg
        |      FROM d LEFT JOIN customer ON user_id = c_custkey)
        |SELECT strftime(time_bucket(INTERVAL '15 minutes', ts),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        |  seg, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      // Dedup key includes value: an exact re-delivery carries the same
      // payload, and (user_id, ts, value) makes the surviving set equal to
      // the oracle's DISTINCT — with (user_id, ts) alone, two events sharing
      // a key+timestamp but differing in value would keep one arbitrary row
      // here and both rows in DuckDB.
      Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))
        .transform(StreamOps.dedupStream(Seq("user_id", "value"), "ts", "1 hour"))
        .transform(StreamOps.enrich(dim, Seq("user_id")))
        .withColumn("seg", coalesce(col("c_mktsegment"), lit("(none)")))
        .transform(StreamOps.tumblingAgg("ts", "seg", "15 minutes"))
        .select(tsStr(col("window.start")).as("window_start"),
          col("seg"), col("n"), col("sum_value"))
        .orderBy("window_start", "seg")
    },

    // ---- st03's heavier sibling: THREE chained stateful operators —
    //      exact-re-delivery click dedup → stream-stream interval join
    //      (each click to the same user's views in the preceding 2h) →
    //      15-min tumbling aggregate over the joined pairs. Watermark
    //      propagation ACROSS stateful operators is where streaming
    //      engines break (the agg must see the join's delayed event-time
    //      domain, not the sources'); StreamingSpec runs this exact chain
    //      through MemoryStream in append mode and pins streaming==batch.
    //      Batch form below is fully oracled: dedup = DISTINCT (clicks
    //      carry no payload), the join a range equi-join, the window a
    //      time_bucket group. ----
    QueryDef("st07_funnel_chain",
      """WITH c AS (SELECT DISTINCT user_id, event_id, ts FROM events
        |           WHERE event_type = 'click'),
        |v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |j AS (SELECT c.ts AS cts, v.value
        |      FROM c JOIN v ON v.user_id = c.user_id
        |        AND v.ts >= c.ts - INTERVAL 2 HOUR AND v.ts <= c.ts)
        |SELECT strftime(time_bucket(INTERVAL '15 minutes', cts),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(*) AS n_pairs,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_view_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
        .transform(StreamOps.dedupStream(Seq("user_id", "click_id"),
          "click_ts", "1 hour"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("value"))
      StreamOps.intervalJoin(clicks, views, "user_id", "click_ts", "view_ts",
          lookback = "2 hours", watermark = "1 hour")
        .groupBy(window(col("click_ts"), "15 minutes"))
        .agg(count(lit(1)).as("n_pairs"),
          graft.core.Exact.decimalSum(col("value"), "sum_view_value"))
        .select(tsStr(col("window.start")).as("window_start"),
          col("n_pairs"), col("sum_view_value"))
        .orderBy("window_start")
    },

    // ---- key-only dedup, batch form: the event-time-FIRST event per
    //      user (event_id tie-break for equal timestamps). Under
    //      readStream the SAME StreamOps.firstPerKey runs as
    //      dropDuplicatesWithinWatermark — key-only matching with
    //      watermark-evicted state; StreamingSpec pins the in-order
    //      batch==stream equality and the deliberate beyond-horizon
    //      re-emission. Fully oracled window query. ----
    QueryDef("st08_first_per_key",
      """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .transform(StreamOps.firstPerKey("user_id", "ts", "30 minutes",
          tieBreak = Seq("event_id")))
        .select(col("user_id"), col("event_id"),
          tsStr(col("ts")).as("ts"), col("event_type"), col("value"))
        .orderBy("user_id")
    },

    // ---- st10: streaming near-dup screening — the in-stream admission
    //      gate joining each arriving doc's MinHash bands (expression-
    //      level shingles + the fused native band hash, zero stream
    //      state before the join) against the STATIC corpus band index.
    //      Batch twin graded here on the doc%10==7 "arrival" subset vs
    //      the full corpus; the oracle re-derives BOTH sides of the band
    //      join from the Verify-staged `_staged_lsh_bands` parquet — so
    //      the HOF shingle path must produce byte-identical buckets to
    //      the staged explode/collect path (order-invariant signature),
    //      or the join memberships diverge and the hash flips.
    //      StreamingSpec drives the same function through MemoryStream
    //      against a static index and pins stream == batch. ----
    QueryDef("st10_stream_neardup",
      s"""WITH b AS (SELECT doc, band, bucket
         |           FROM read_parquet('${ClimateQueries.OutToken}/_staged_lsh_bands/*.parquet')),
         |arr AS (SELECT * FROM b WHERE doc % 10 = 7)
         |SELECT arr.doc AS doc, s.doc AS partner, count(*) AS n_band_hits
         |FROM arr JOIN b s ON s.band = arr.band AND s.bucket = arr.bucket
         |  AND s.doc <> arr.doc
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val staticBands = graft.ext.Dedup.lshBandTable(
        docs, col("doc_id"), col("text"))
      StreamOps.streamNearDupScreen(docs.filter(col("doc_id") % 10 === 7),
          col("doc_id"), col("text"), staticBands)
        .orderBy("doc", "partner")
    },

    // ---- st12: streaming EXACT-τ dedup gate against the STORED stable
    //      prefix index — st10's admission-gate shape upgraded from a
    //      probabilistic band screen to the full exact-Jaccard-≥-τ
    //      guarantee, probing the SAME maintainable index t60/t61 grade
    //      (order-stable prefixes, so the stream needs zero corpus
    //      statistics and the index never recomputes per arrival). The
    //      batch twin graded here runs the doc%10==7 arrivals against
    //      the %10≠7 corpus side — exactly t58's semantics, so t58's
    //      UNCHANGED oracle grades it (prefix ORDER steers candidates
    //      only; the signature verify owns the answer). StreamingSpec
    //      drives the same function through MemoryStream and pins
    //      stream == batch plus agreement with the batch probe. ----
    QueryDef("st12_stream_index_probe",
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id AS doc, unnest(list_distinct(
        |    list_transform(range(1, len(w) - 1),
        |                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM docs),
        |dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        |sz AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY 1),
        |pref AS (
        |  SELECT doc, s, n_sh FROM (
        |    SELECT h.doc, h.s, z.n_sh,
        |      row_number() OVER (PARTITION BY h.doc ORDER BY d.df, h.s) AS pos
        |    FROM sh h JOIN dfq d USING (s) JOIN sz z USING (doc))
        |  WHERE pos <= n_sh - ((2 * n_sh + 4) // 5) + 1),
        |cand AS (
        |  SELECT DISTINCT b.doc AS id_a, p.doc AS id_b
        |  FROM sh b JOIN sz zb ON zb.doc = b.doc
        |  JOIN pref p ON p.s = b.s
        |  WHERE b.doc % 10 = 7 AND p.doc % 10 != 7
        |    AND zb.n_sh * 5 >= p.n_sh * 2 AND p.n_sh * 5 >= zb.n_sh * 2),
        |inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS n_inter
        |  FROM cand c
        |  JOIN sh a ON a.doc = c.id_a
        |  JOIN sh b ON b.doc = c.id_b AND b.s = a.s
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter, za.n_sh AS n_a, zb.n_sh AS n_b,
        |  round(CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter), 6)
        |    AS jaccard
        |FROM inter
        |JOIN sz za ON za.doc = id_a
        |JOIN sz zb ON zb.doc = id_b
        |WHERE 7 * n_inter >= 2 * (za.n_sh + zb.n_sh)
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val (pref, sigs, _) = TextQueries.storedStableIndex(s, dir)
      StreamOps.streamPrefixProbe(
          Tables.documents(s, dir).filter(col("doc_id") % 10 === 7),
          col("doc_id"), col("text"), pref, sigs, tauNum = 2, tauDen = 5)
        .select(col("doc").as("id_a"), col("partner").as("id_b"),
          col("n_inter"), col("n_a"), col("n_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // ---- st13: streaming ANN admission + occupancy telemetry — the
    //      VECTOR side of the streaming ingestion family (st10/st12
    //      gate arriving documents; this gates arriving vectors):
    //      arrivals take coarse cells from the SAME stored quantizer
    //      s35/s37 maintain, as a stateless map-only kernel projection,
    //      and one bounded grouped count (≤k rows of stream state — the
    //      st11 CMS discipline applied to the quantizer) emits per-cell
    //      arrival occupancy: the arrival-side half of s38's drift
    //      audit, i.e. the telemetry a deployment watches to decide
    //      when s42's warm retrain fires. Batch twin graded here on the
    //      s35 arrival slice; given the staged centroids the whole
    //      output is argmin + count, re-derived by DuckDB (s35's chain
    //      with a GROUP BY on top). StreamingSpec drives the same
    //      function through MemoryStream and pins stream == batch. ----
    QueryDef("st13_stream_cell_occupancy",
      s"""WITH cents AS (SELECT cell, list(value ORDER BY pos) AS c
         |               FROM read_parquet('${ClimateQueries.OutToken}/_staged_ivf_centroids/*.parquet')
         |               GROUP BY cell),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |      WHERE vec_id % 10 = 7),
         |a AS (SELECT vec_id, cell FROM (
         |  SELECT v.vec_id, cents.cell,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |      list_dot_product(v.e, v.e) - 2.0 * list_dot_product(v.e, cents.c)
         |        + list_dot_product(cents.c, cents.c), cents.cell) AS rn
         |  FROM v CROSS JOIN cents) WHERE rn = 1)
         |SELECT cell, count(*) AS n_arrivals FROM a
         |GROUP BY cell ORDER BY cell""".stripMargin) { (s, dir) =>
      val cents = SimilarityQueries.storedIvfCentroids(s, dir)
      StreamOps.streamCellOccupancy(
          Tables.embeddings(s, dir).filter(col("vec_id") % 10 === 7),
          col("vec_id"), col("embedding"), cents)
        .orderBy("cell")
    },

    // ---- st09: per-user RECORD-BREAKER detection — the Spark 4
    //      transformWithState surface (StatefulProcessor + typed
    //      ValueState, the arbitrary-state API that supersedes
    //      flatMapGroupsWithState). An event emits iff it strictly
    //      exceeds the user's best-so-far (first event emits with NULL
    //      prev_best). Batch twin graded here: the prior running max via
    //      an UNBOUNDED..1 PRECEDING window in deterministic
    //      (ts, event_id) order; StreamingSpec drives the
    //      RecordBreakProcessor through MemoryStream on RocksDB state and
    //      pins batch==stream plus cross-batch state carry. Raw doubles
    //      pass through both engines untouched → exact hash parity. ----
    QueryDef("st09_record_breakers",
      """WITH o AS (
        |  SELECT user_id, event_id, value,
        |    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
        |  FROM events)
        |SELECT user_id, event_id, value, prev_best
        |FROM o WHERE prev_best IS NULL OR value > prev_best
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      StreamOps.recordBreakersBatch(Tables.events(s, dir),
          "user_id", "ts", "event_id", "value")
        .select(col("user_id"), col("event_id"), col("value"), col("prev_best"))
        .orderBy("user_id", "event_id")
    },

    // ---- st11: streaming count-min sketch — per-day CMS partial cells
    //      (state = d·w integers per open day under a watermark,
    //      REGARDLESS of event volume; a per-key streaming count would
    //      hold key-cardinality state) merged cell-wise into one sketch
    //      and point-queried for the top-20 heaviest users next to their
    //      exact counts. q141's distributed-counting primitive in its
    //      INCREMENTAL form (q59 is the same move for distinct counts):
    //      store daily cells, re-merge any date range without rescanning
    //      history. Batch twin graded here; every cell, merge, and
    //      estimate is portableHash arithmetic the oracle re-derives
    //      exactly — cell-wise addition is exact, so merged estimates
    //      equal a one-shot sketch bit-for-bit (StreamingSpec pins that
    //      AND stream == batch through MemoryStream). ----
    QueryDef("st11_stream_cms", {
      def h(a: String, b: String) = graft.ops.Prep.portableHashSql(a, b)
      s"""WITH r AS (SELECT CAST(ts AS DATE) AS day, user_id AS k FROM events),
         |js AS (SELECT unnest(range(0, 4)) AS j),
         |daily AS (SELECT day, js.j, ${h("js.j", "r.k")} % 1024 AS bucket,
         |    count(*) AS c
         |  FROM r CROSS JOIN js GROUP BY 1, 2, 3),
         |merged AS (SELECT j, bucket, sum(c) AS c FROM daily GROUP BY 1, 2),
         |keys AS (SELECT DISTINCT k FROM r),
         |est AS (SELECT keys.k, min(m.c) AS est
         |  FROM keys CROSS JOIN js
         |  JOIN merged m ON m.j = js.j
         |    AND m.bucket = ${h("js.j", "keys.k")} % 1024
         |  GROUP BY 1),
         |ex AS (SELECT k, count(*) AS exact_count FROM r GROUP BY 1)
         |SELECT est.k AS user_id, CAST(ex.exact_count AS BIGINT) AS exact_count,
         |  CAST(est.est AS BIGINT) AS est_count,
         |  CAST(est.est - ex.exact_count AS BIGINT) AS overshoot,
         |  (SELECT CAST(count(DISTINCT day) AS BIGINT) FROM r) AS n_days
         |FROM est JOIN ex ON ex.k = est.k
         |ORDER BY est_count DESC, user_id LIMIT 20""".stripMargin
    }) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val daily = ev.transform(StreamOps.cmsDailyCells("ts", col("user_id")))
      val merged = StreamOps.cmsMergeCells(daily)
      val keys = ev.select(col("user_id").as("k"))
      val exact = keys.groupBy(col("k")).agg(count(lit(1)).as("exact_count"))
      val nDays = daily.select(col("day")).distinct()
        .agg(count(lit(1)).as("n_days"))
      graft.ops.Mining.cmsEstimates(merged, keys)
        .join(exact, "k")
        .crossJoin(broadcast(nDays))
        .select(col("k").as("user_id"), col("exact_count"),
          col("est").as("est_count"),
          (col("est") - col("exact_count")).as("overshoot"), col("n_days"))
        .orderBy(col("est_count").desc, col("user_id")).limit(20)
    },

    // ---- m10: per-clip zero-crossing rate after DC-offset removal —
    //      the voiced/unvoiced + noisiness feature next to m06's frame
    //      energy. Crossings are counted about the clip MEAN (raw PCM
    //      carries DC bias — structurally so here, where ASCII payloads
    //      never flip the raw sign bit); samples are two's-complement
    //      sign-converted FIRST (u - 65536 when u >= 0x8000, mirroring
    //      m11), then the exact integer test n·sᵢ > Σs runs on signed
    //      values — correct for real negative-sample PCM, identical on
    //      the ASCII fixtures. Each exploded row reads sample i AND i−1
    //      directly, so the comparison is a pure codegen'd projection —
    //      no lag window, no per-clip sort. The oracle re-derives the
    //      identical signed sample sequence from the ASCII payload. ----
    QueryDef("m10_zero_crossings",
      """WITH f AS (SELECT doc_id, text, len(text) // 2 AS ns FROM documents),
        |i AS (SELECT doc_id, text, ns, unnest(range(0, ns)) AS i FROM f WHERE ns > 1),
        |r AS (SELECT doc_id, ns, i,
        |    ord(substr(text, CAST(2 * i + 1 AS INTEGER), 1))
        |      + 256 * ord(substr(text, CAST(2 * i + 2 AS INTEGER), 1)) AS raw
        |  FROM i),
        |sm AS (SELECT doc_id, ns, i,
        |    raw - CASE WHEN raw >= 32768 THEN 65536 ELSE 0 END AS u
        |  FROM r),
        |tot AS (SELECT doc_id, CAST(sum(u) AS BIGINT) AS s_tot FROM sm GROUP BY 1),
        |p AS (SELECT doc_id, ns, i, u,
        |    lag(u) OVER (PARTITION BY doc_id ORDER BY i) AS v
        |  FROM sm),
        |c AS (SELECT p.doc_id,
        |    CASE WHEN (p.u * p.ns > t.s_tot) <> (p.v * p.ns > t.s_tot)
        |         THEN 1 ELSE 0 END AS c
        |  FROM p JOIN tot t ON t.doc_id = p.doc_id WHERE p.i >= 1)
        |SELECT doc_id, count(*) + 1 AS n_samples,
        |  CAST(sum(c) AS BIGINT) AS crossings,
        |  CAST(sum(c) AS DOUBLE) / count(*) AS zcr
        |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val ch = (col("doc_id") % 3 + 1).cast("int")
      val sr = when(col("doc_id") % 3 === 0, 8000)
        .when(col("doc_id") % 3 === 1, 16000).otherwise(44100)
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.wavHeader(sr, ch, lit(16), length(payload)), payload))
      Multimodal.wavZeroCrossings(withMedia, col("doc_id"), col("media"))
        .select(col("id").as("doc_id"), col("n_samples"),
          col("crossings"), col("zcr"))
        .orderBy("doc_id")
    },

    // ---- m11: delta-encoding feasibility audit — per clip, max/mean
    //      absolute successive sample difference and the bit width the
    //      deltas need (length(bin(max)): exact string arithmetic, no
    //      log2 float boundary). The compression-planning report next to
    //      m06 energy / m10 noisiness; same 4-byte-read projection, no
    //      lag window. ----
    QueryDef("m11_delta_audit",
      """WITH f AS (SELECT doc_id, text, len(text) // 2 AS ns FROM documents),
        |i AS (SELECT doc_id, text, unnest(range(1, ns)) AS i FROM f WHERE ns > 1),
        |sm AS (SELECT doc_id,
        |    ord(substr(text, CAST(2 * i + 1 AS INTEGER), 1))
        |      + 256 * ord(substr(text, CAST(2 * i + 2 AS INTEGER), 1)) AS u,
        |    ord(substr(text, CAST(2 * i - 1 AS INTEGER), 1))
        |      + 256 * ord(substr(text, CAST(2 * i AS INTEGER), 1)) AS v
        |  FROM i),
        |d AS (SELECT doc_id,
        |    abs((u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END) -
        |        (v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END)) AS d
        |  FROM sm)
        |SELECT doc_id, count(*) AS n_deltas,
        |  CAST(max(d) AS BIGINT) AS max_abs_delta,
        |  CAST(sum(d) AS DOUBLE) / count(*) AS mean_abs_delta,
        |  CAST(len(bin(CAST(max(d) AS BIGINT))) AS INTEGER) AS delta_bits
        |FROM d GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val ch = (col("doc_id") % 3 + 1).cast("int")
      val sr = when(col("doc_id") % 3 === 0, 8000)
        .when(col("doc_id") % 3 === 1, 16000).otherwise(44100)
      val payload = col("text").cast("binary")
      val withMedia = docs.withColumn("media",
        concat(Multimodal.wavHeader(sr, ch, lit(16), length(payload)), payload))
      Multimodal.wavDeltaAudit(withMedia, col("doc_id"), col("media"))
        .select(col("id").as("doc_id"), col("n_deltas"),
          col("max_abs_delta"), col("mean_abs_delta"), col("delta_bits"))
        .orderBy("doc_id")
    },
  )
}
