package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata — the LLM-pipeline pattern for media at 100 TB.
  *
  * The Spark-side plumbing is real: binary columns, typed metadata
  * structs, per-partition batch processing (`mapPartitions` over a
  * typed Dataset — the Scala analog of `mapInPandas` batches), and
  * oracle-checked metadata/frame arithmetic. Decode comes in two
  * tiers: `MediaCodecs` REALLY parses the codec-free containers (PCM
  * WAV and uncompressed BMP — mm4/mm5) AND compressed images through
  * the JDK's `javax.imageio` codecs (PNG/JPEG/GIF — mm7, exact
  * pixel-sum oracle on lossless PNG), every decoded field
  * hash-checked. `decodeMeta` remains the clearly-marked
  * deterministic stand-in only for formats with no JVM codec
  * (MP3/H.264) — a real deployment swaps its body for a JNI/javacv
  * binding without touching any schema, partitioning, or call-site.
  *
  * Payloads here are synthesized from `documents.text` bytes so the
  * DuckDB oracle can mirror every derived quantity exactly.
  */
object Multimodal {

  /** Typed media metadata (the schema a real decoder would fill). */
  case class MediaMeta(width: Int, height: Int, nFrames: Int, nBytes: Long)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  private val frameBytes = 64 // fake fixed frame size

  /** STUB DECODER — deterministic fake. A real implementation binds an
    * image/audio library here (and ONLY here); everything downstream
    * consumes the same MediaMeta.
    */
  def decodeMeta(payload: Array[Byte]): MediaMeta = {
    val w = 1 + (payload(0) & 0x7f)
    val h = 1 + (payload(Math.min(1, payload.length - 1)) & 0x7f)
    MediaMeta(w, h, payload.length / frameBytes, payload.length.toLong)
  }

  /** Batch feature extraction: 16-bin byte histogram per payload,
    * computed per-partition over the typed Dataset — the batch shape
    * (iterator-of-rows per partition) a vectorized decoder needs.
    */
  def byteHistograms(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.payload.length) { hist((r.payload(i) & 0xff) / 16) += 1; i += 1 }
        (r.media_id, hist.toSeq)
      }
    }.toDF("media_id", "hist16")
  }

  /** Frame sampling: every `stride`-th fixed-size window of the
    * payload, as (media_id, frame_no, frame binary) rows.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_frames", (length(col("payload")) / frameBytes).cast("int"))
      .withColumn("frame_no", explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .filter(col("n_frames") > 0)
      .withColumn("frame", expr(s"substring(payload, frame_no * $frameBytes + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_no"), col("frame"))

  /** The synthesized media table: text bytes as fake payloads. */
  def mediaTable(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** mm8's aHash near-dup pair pipeline (shared with ev5's
    * evaluation): two crawls (+1000 ids, +4 brightness), size-class
    * blocking, hamming <= 3 verify.
    */
  private def imageNeardupPairs(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val synth = udf((id: Long, delta: Int) => MediaCodecs.synthBmpShifted(id, delta))
    val ah = udf((p: Array[Byte]) => MediaCodecs.bmpAHash(p))
    val base = Tables.documents(s, dir).select(col("doc_id").as("media_id"))
      .filter(col("media_id") < 50)
    val imgs = base.select(col("media_id"), synth(col("media_id"), lit(0)).as("b"))
      .unionByName(base.select((col("media_id") + 1000L).as("media_id"),
        synth(col("media_id"), lit(4)).as("b")))
      .withColumn("h", ah(col("b")))
      .select(col("media_id"), col("h.width").as("w"), col("h.height").as("hh"),
        col("h.ahash").as("ahash"))
    imgs.as("x").join(imgs.as("y"),
        col("x.w") === col("y.w") && col("x.hh") === col("y.hh") &&
          col("x.media_id") < col("y.media_id"))
      .withColumn("hamming",
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        col("hamming"))
  }

  /** mm9's delta-energy near-dup pair pipeline (shared with ev6):
    * two crawls (+1000 ids, +3 amplitude), length blocking,
    * hamming <= 2 verify.
    */
  private def audioNeardupPairs(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val synth = udf((id: Long, delta: Int) => MediaCodecs.synthWavShifted(id, delta))
    val fp = udf((p: Array[Byte]) => MediaCodecs.wavFingerprint(p))
    val base = Tables.documents(s, dir).select(col("doc_id").as("media_id"))
      .filter(col("media_id") < 50)
    val clips = base.select(col("media_id"), synth(col("media_id"), lit(0)).as("b"))
      .unionByName(base.select((col("media_id") + 1000L).as("media_id"),
        synth(col("media_id"), lit(3)).as("b")))
      .withColumn("f", fp(col("b")))
      .select(col("media_id"), col("f.nSamples").cast("long").as("n_samples"),
        col("f.fp").as("fp"))
    clips.as("x").join(clips.as("y"),
        col("x.n_samples") === col("y.n_samples") &&
          col("x.media_id") < col("y.media_id"))
      .withColumn("hamming",
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long"))
      .filter(col("hamming") <= 2)
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        col("hamming"))
  }

  val defs: Map[String, Q] = Map(

    // Decoded-metadata rollup per media kind: the decode UDF runs over
    // the binary column; widths/heights/frame counts and payload
    // hashes are all oracle-checked.
    "mm1_media_metadata" -> ((s, dir) => {
      val decode = udf((p: Array[Byte]) => decodeMeta(p))
      mediaTable(s, dir)
        .withColumn("meta", decode(col("payload")))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("meta.nBytes")).as("total_bytes"),
          sum(col("meta.width").cast("long")).as("sum_width"),
          sum(col("meta.nFrames").cast("long")).as("sum_frames"),
          countDistinct(md5(col("payload"))).as("n_distinct_payloads"))
    }),

    // Feature-extract → similarity composition: per-partition byte
    // histograms become 16-dim feature vectors, searched brute-force
    // for the top-5 similar media per query (the decode→embed→ANN
    // pipeline shape; swap byteHistograms for a real encoder and ll7's
    // LSH for the candidate step at scale). Histogram dot products are
    // exact integers, so similarity ranks are deterministic.
    "mm3_media_similar" -> ((s, dir) => {
      import s.implicits._
      val media = mediaTable(s, dir).as[MediaRow]
      val feats = byteHistograms(media)
        .withColumn("nrm", expr(
          "aggregate(transform(hist16, x -> x * x), 0L, (acc, v) -> acc + v)"))
      val q = feats.filter(col("media_id") < 10)
        .select(col("media_id").as("query_id"), col("hist16").as("q_hist"),
          col("nrm").as("q_nrm"))
      val scored = feats.join(broadcast(q), col("media_id") =!= col("query_id"))
        .withColumn("dot", expr(
          "aggregate(zip_with(q_hist, hist16, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .withColumn("sim",
          col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("sim").desc, col("media_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("media_id").as("neighbor_id"))
    }),

    // REAL container decode, audio: synthesize well-formed PCM WAV
    // bytes per media id, parse them with MediaCodecs.decodeWav (RIFF
    // chunk walk + signed little-endian samples) on executors, and
    // check every decoded field against the closed-form oracle — a
    // header-offset, sign or alignment bug fails the hash.
    "mm4_wav_decode" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthWav(id))
      val dec = udf((p: Array[Byte]) => MediaCodecs.decodeWav(p))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .withColumn("m", dec(synth(col("media_id"))))
        .select(col("media_id"),
          col("m.sampleRate").cast("long").as("sample_rate"),
          col("m.nSamples").cast("long").as("n_samples"),
          col("m.sumSamples").as("sum_samples"),
          col("m.sumSquares").as("sum_squares"))
    }),

    // REAL container decode, image: uncompressed 24-bit BMP with
    // padded bottom-up rows, decoded by MediaCodecs.decodeBmp; widths
    // 4..7 exercise every row-padding case (stride 12,16,20,24→12).
    "mm5_bmp_decode" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthBmp(id))
      val dec = udf((p: Array[Byte]) => MediaCodecs.decodeBmp(p))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .withColumn("m", dec(synth(col("media_id"))))
        .select(col("media_id"),
          col("m.width").cast("long").as("width"),
          col("m.height").cast("long").as("height"),
          col("m.sumR").as("sum_r"), col("m.sumG").as("sum_g"),
          col("m.sumB").as("sum_b"))
    }),

    // Perceptual image hashing over REAL decoded pixels — the
    // near-duplicate-image fingerprint (average hash): integer
    // per-pixel gray, image-mean threshold, one bit per pixel. The
    // oracle replays synthBmp's closed-form pixels; the Spark side
    // decodes the actual BMP bytes, so a decoder regression breaks
    // the hash. Downstream matching is ll5's hamming machinery on a
    // 64-bit column; this query pins the fingerprint itself.
    "mm6_image_ahash" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthBmp(id))
      val ah = udf((p: Array[Byte]) => MediaCodecs.bmpAHash(p))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .withColumn("h", ah(synth(col("media_id"))))
        .select(col("media_id"),
          col("h.width").cast("long").as("width"),
          col("h.height").cast("long").as("height"),
          col("h.meanGray").as("mean_gray"),
          col("h.ahash").as("ahash"))
    }),

    // REAL compressed-image decode: deterministic PNGs (JDK encoder,
    // lossless) decoded back through javax.imageio's PNG codec on
    // executors — the decode path a real training pipeline's image
    // columns (PNG/JPEG, not BMP) take. Width/height and exact
    // per-channel pixel sums are hash-checked against the same closed
    // form as mm5 (channel sums are row-order independent, so the
    // arithmetic is shared); a codec binding that flips channels,
    // drops the last padded row, or gamma-shifts pixels fails here.
    "mm7_png_decode" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthPng(id))
      val dec = udf((p: Array[Byte]) => MediaCodecs.decodeImage(p))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .withColumn("m", dec(synth(col("media_id"))))
        .select(col("media_id"),
          col("m.width").cast("long").as("width"),
          col("m.height").cast("long").as("height"),
          col("m.sumR").as("sum_r"), col("m.sumG").as("sum_g"),
          col("m.sumB").as("sum_b"))
    }),

    // Audio DECIMATION over real decoded bytes — the resample step of
    // an audio pipeline, checked like mm12's resize: keep every even
    // PCM sample and hash the exact integer sums of kept samples and
    // magnitudes, so stride/sign-extension/offset regressions in the
    // byte-level resampler are all oracle-visible. Narrow map, no
    // shuffle.
    "mm13_audio_decimate" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthWav(id))
      val dec = udf((p: Array[Byte]) => MediaCodecs.wavDecimate(p))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .withColumn("m", dec(synth(col("media_id"))))
        .select(col("media_id"),
          col("m.nIn").cast("long").as("n_in"),
          col("m.nOut").cast("long").as("n_out"),
          col("m.sumKept").as("sum_kept"),
          col("m.sumAbsKept").as("sum_abs_kept"))
    }),

    // Image NEAR-DUPLICATE detection — the multimodal twin of ll5:
    // perceptual aHash fingerprints (REAL BMP decode), candidate pairs
    // blocked by size class (an equi-join on (width, height) — two
    // images of different dims are never compared, and at 100 TB each
    // size bucket shuffles independently), verified at hamming <= 3
    // via bit_count(xor). The second crawl (+1000 ids) re-renders each
    // image with a +4 brightness shift: most pixels keep their
    // relation to the shifted mean, wrap-around pixels flip a few hash
    // bits — exactly the fingerprint-stability property aHash is used
    // for. The oracle replays the closed-form pixels of BOTH crawls
    // and the same blocking + hamming verify.
    "mm8_image_neardup" -> ((s, dir) => imageNeardupPairs(s, dir)),

    // IMAGE near-dup EVALUATION against the planted brightness-shifted
    // second crawl — ev2/ev3/ev4's harness on the aHash pipeline,
    // extending the evaluation family to the image modality: recall =
    // planted (id, id+1000) pairs recovered at hamming <= 3, n_extra =
    // legitimate same-crawl collisions. Union-tagged single aggregate
    // over the shared pair pipeline.
    "ev5_image_neardup_eval" -> ((s, dir) => {
      val pairs = imageNeardupPairs(s, dir)
        .select(lit(1L).as("is_pair"), col("media_a"), col("media_b"))
      val base = Tables.documents(s, dir)
        .select(col("doc_id").as("media_a")).filter(col("media_a") < 50)
        .select(lit(0L).as("is_pair"), col("media_a"),
          lit(null).cast("long").as("media_b"))
      val hit = col("is_pair") === 1L && col("media_b") === col("media_a") + 1000L
      pairs.unionByName(base).agg(
          sum(lit(1L) - col("is_pair")).as("n_truth"),
          sum(col("is_pair")).as("n_found"),
          sum(when(hit, 1L).otherwise(0L)).as("n_hit"))
        .select(col("n_truth"), col("n_found"), col("n_hit"),
          (col("n_hit") / col("n_truth")).as("recall"),
          (col("n_found") - col("n_hit")).as("n_extra"))
    }),

    // Audio NEAR-DUPLICATE detection — completes the near-dup family
    // across text (ll2/ll5), image (mm8) and audio: delta-energy
    // fingerprints from REAL decoded PCM samples, blocked by clip
    // length (equi-join), verified at hamming <= 2. The second crawl
    // re-renders each clip with a +3 amplitude offset: energy DELTAS
    // cancel the shift, so fingerprints survive except at mod-wrap
    // samples — each length block holds exactly one (base, copy)
    // pair, and the oracle replays both crawls' closed-form samples
    // through the same windowing.
    "mm9_audio_neardup" -> ((s, dir) => audioNeardupPairs(s, dir)),

    // AUDIO near-dup EVALUATION against the planted amplitude-shifted
    // second crawl — the eval harness on mm9's delta-energy
    // fingerprints, completing the family across every near-dup
    // pipeline (text ev2/ev3/ev4, image ev5, audio here).
    "ev6_audio_neardup_eval" -> ((s, dir) => {
      val pairs = audioNeardupPairs(s, dir)
        .select(lit(1L).as("is_pair"), col("media_a"), col("media_b"))
      val base = Tables.documents(s, dir)
        .select(col("doc_id").as("media_a")).filter(col("media_a") < 50)
        .select(lit(0L).as("is_pair"), col("media_a"),
          lit(null).cast("long").as("media_b"))
      val hit = col("is_pair") === 1L && col("media_b") === col("media_a") + 1000L
      pairs.unionByName(base).agg(
          sum(lit(1L) - col("is_pair")).as("n_truth"),
          sum(col("is_pair")).as("n_found"),
          sum(when(hit, 1L).otherwise(0L)).as("n_hit"))
        .select(col("n_truth"), col("n_found"), col("n_hit"),
          (col("n_hit") / col("n_truth")).as("recall"),
          (col("n_found") - col("n_hit")).as("n_extra"))
    }),

    // Audio ENERGY SEGMENTATION — the VAD-shaped cut before
    // transcription/feature extraction: REAL WAV decode, 16-sample
    // frame energies, maximal active runs as segments (MediaCodecs.
    // wavSegments). Per-clip work explodes to one row per segment; no
    // cross-clip shuffle at all, so the 100 TB plan is a pure scan +
    // explode. The oracle replays frames and the gaps-and-islands run
    // grouping in closed form from the deterministic synth samples.
    "mm11_audio_segments" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthWav(id))
      val segs = udf((p: Array[Byte]) => MediaCodecs.wavSegments(p, 16, 8000L))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .select(col("media_id"), explode(segs(synth(col("media_id")))).as("g"))
        .select(col("media_id"),
          col("g.segNo").cast("long").as("seg_no"),
          col("g.startFrame").cast("long").as("start_frame"),
          col("g.nFrames").cast("long").as("n_frames"),
          col("g.energy").as("energy"))
    }),

    // Video NEAR-DUPLICATE detection — the last modality of the
    // near-dup family: a video is its SEQUENCE of frame fingerprints
    // (real BMP decode → aHash per frame), candidates are blocked by
    // frame count, frames align positionally, a frame matches when
    // dims agree and hamming(aHash) <= 3, and a pair is near-dup when
    // >= 3/4 of frames match. The second crawl re-renders every frame
    // +4 brighter (the re-encode analog); at 100 TB the frame table
    // shuffles fingerprints (one long per frame), never pixels, and
    // the (n_frames, frame_no) equi-join keeps cost linear in the
    // frame table. The oracle replays frames, hashes, alignment and
    // the 3/4 rule closed-form.
    "mm10_video_neardup" -> ((s, dir) => {
      val synth = udf((fid: Long, delta: Int) => MediaCodecs.synthBmpShifted(fid, delta))
      val ah = udf((p: Array[Byte]) => MediaCodecs.bmpAHash(p))
      val base = Tables.documents(s, dir).select(col("doc_id").as("bid"))
        .filter(col("bid") < 30)
        .withColumn("n_frames", (lit(3L) + col("bid") % 3L))
      val crawls = base.select(col("bid").as("video_id"), col("bid"),
          lit(0).as("d"), col("n_frames"))
        .unionByName(base.select((col("bid") + 1000L).as("video_id"), col("bid"),
          lit(4).as("d"), col("n_frames")))
      val frames = crawls
        .withColumn("f", explode(sequence(lit(0L), col("n_frames") - 1L)))
        .withColumn("h", ah(synth(col("bid") * 10L + col("f"), col("d"))))
        .select(col("video_id"), col("n_frames"), col("f"),
          col("h.width").as("w"), col("h.height").as("hh"), col("h.ahash").as("ahash"))
      val matched = frames.as("x").join(frames.as("y"),
          col("x.n_frames") === col("y.n_frames") && col("x.f") === col("y.f") &&
            col("x.video_id") < col("y.video_id") &&
            col("x.w") === col("y.w") && col("x.hh") === col("y.hh") &&
            bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))) <= 3)
        .groupBy(col("x.video_id").as("video_a"), col("y.video_id").as("video_b"),
          col("x.n_frames").as("n_frames"))
        .agg(count(lit(1)).as("n_matched"))
      matched.filter(col("n_matched") * 4 >= col("n_frames") * 3)
        .select(col("video_a"), col("video_b"), col("n_frames"), col("n_matched"))
    }),

    // Frame sampling arithmetic (stride 4) — the scan shape of video
    // frame extraction; counts per kind are exact.
    "mm2_frame_sample" -> ((s, dir) => {
      sampleFrames(mediaTable(s, dir), stride = 4)
        .join(mediaTable(s, dir).select(col("media_id"), col("kind")), "media_id")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_sampled_frames"),
          countDistinct(col("media_id")).as("n_media"),
          sum(length(col("frame")).cast("long")).as("sampled_bytes"))
    }),

    // MM14: SHOT-BOUNDARY DETECTION — the video-segmentation step a
    // multimodal pipeline runs before frame dedup/captioning: decode
    // each frame (real BMP bytes, mm10's synthesizer), aHash it, and
    // call a CUT wherever consecutive frames' dimensions change or
    // their 64-bit aHash hamming distance exceeds 10 (content
    // constant within a planted shot, only the small pixel-shift
    // delta varies — so within-shot distances stay tiny and every
    // true cut jumps). The planted truth (ceil(n_frames/shot_len))
    // rides alongside detected shots, making this its own eval. Per
    // video the lag window is frame-count-sized and media_id-keyed
    // (cardinality grows WITH the corpus — the scalable partitioning);
    // decode+hash is a narrow per-row map.
    "mm14_shot_boundary" -> ((s, dir) => {
      val synth = udf((fid: Long, delta: Int) => MediaCodecs.synthBmpShifted(fid, delta))
      val ah = udf((p: Array[Byte]) => MediaCodecs.bmpAHash(p))
      val base = Tables.documents(s, dir).select(col("doc_id").as("bid"))
        .filter(col("bid") < 30)
        .withColumn("n_frames", lit(8L) + col("bid") % 5L)
        .withColumn("shot_len", lit(3L) + col("bid") % 2L)
      val frames = base
        .withColumn("f", explode(sequence(lit(0L), col("n_frames") - 1L)))
        .withColumn("fid", col("bid") * 100L + expr("f DIV shot_len"))
        .withColumn("d", expr("CAST(f % shot_len AS INT)"))
        .withColumn("h", ah(synth(col("fid"), col("d"))))
        .select(col("bid"), col("n_frames"), col("shot_len"), col("f"),
          col("h.width").as("w"), col("h.height").as("hh"),
          col("h.ahash").as("ahash"))
      val wLag = Window.partitionBy(col("bid")).orderBy(col("f"))
      frames
        .withColumn("pw", lag(col("w"), 1).over(wLag))
        .withColumn("ph", lag(col("hh"), 1).over(wLag))
        .withColumn("pa", lag(col("ahash"), 1).over(wLag))
        .withColumn("cut", expr(
          "CASE WHEN pa IS NULL THEN 0L " +
            "WHEN w <> pw OR hh <> ph THEN 1L " +
            "WHEN bit_count(ahash ^ pa) > 10 THEN 1L ELSE 0L END"))
        .groupBy(col("bid").as("video_id"))
        .agg(max(col("n_frames")).as("n_frames"),
          max(col("shot_len")).as("shot_len"),
          sum(col("cut")).as("n_cuts"))
        .withColumn("n_shots_detected", col("n_cuts") + 1L)
        .withColumn("n_shots_true",
          expr("(n_frames + shot_len - 1) DIV shot_len"))
    }),

    // Image RESIZE over real decoded bytes — the preprocessing step a
    // multimodal training pipeline runs on every image: a 2×2
    // box-filter downsample (truncating integer mean, odd edges
    // dropped) executed against the actual BMP pixel rows on
    // executors. The check hashes the resized dimensions AND the
    // exact per-channel sums of the OUTPUT image, so any resampler
    // regression — offset, stride, channel order, rounding mode — is
    // caught, not just the metadata. The oracle replays synthBmp's
    // closed-form pixels through the same block arithmetic. Per-row
    // UDF cost is pixels-proportional; the plan is a narrow map with
    // no shuffle at all.
    "mm12_image_resize" -> ((s, dir) => {
      val synth = udf((id: Long) => MediaCodecs.synthBmp(id))
      val rz = udf((p: Array[Byte]) => MediaCodecs.bmpResizeBox(p))
      Tables.documents(s, dir).select(col("doc_id").as("media_id"))
        .filter(col("media_id") < 100)
        .withColumn("m", rz(synth(col("media_id"))))
        .select(col("media_id"),
          col("m.outWidth").cast("long").as("out_width"),
          col("m.outHeight").cast("long").as("out_height"),
          col("m.sumR").as("sum_r"), col("m.sumG").as("sum_g"),
          col("m.sumB").as("sum_b"))
    })
  )

  private val kindSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"""

  /** mm9's two-crawl delta-energy pipeline as shared oracle CTEs
    * (consumed by the mm9 listing and ev6's evaluation).
    */
  private val mm9Ctes = {
    def sTerm(iExpr: String) = s"((bid * 31 + 7 * ($iExpr) + d) % 2001 - 1000)"
    def eTerm(wExpr: String) =
      (0 until 4).map(j => sTerm(s"4 * ($wExpr) + $j")).mkString(" + ")
    s"""crawls AS (
           SELECT doc_id AS media_id, doc_id AS bid, 0 AS d
           FROM documents WHERE doc_id < 50
           UNION ALL
           SELECT doc_id + 1000, doc_id, 3 FROM documents WHERE doc_id < 50),
         base AS (SELECT media_id, bid, d,
                    CAST(64 + bid % 64 AS BIGINT) AS n FROM crawls),
         fps AS (
           SELECT media_id, n,
             CAST(COALESCE(SUM(CASE WHEN ${eTerm("wdx")} > ${eTerm("wdx - 1")}
                   THEN (CAST(1 AS BIGINT) << (wdx - 1)) ELSE 0 END), 0) AS BIGINT) AS fp
           FROM (SELECT media_id, bid, d, n,
                   unnest(range(1, CAST(least(32, n // 4) AS BIGINT))) AS wdx
                 FROM base)
           GROUP BY media_id, n)"""
  }

  /** mm8's two-crawl aHash pipeline as shared oracle CTEs (pairs
    * consumed by both the mm8 listing and ev5's evaluation).
    */
  private val mm8Ctes =
    """crawls AS (
           SELECT doc_id AS media_id, doc_id AS bid, 0 AS d
           FROM documents WHERE doc_id < 50
           UNION ALL
           SELECT doc_id + 1000, doc_id, 4 FROM documents WHERE doc_id < 50),
         px AS (
           SELECT media_id, bid, d,
             CAST(4 + bid % 4 AS BIGINT) AS w, CAST(2 + bid % 3 AS BIGINT) AS h,
             unnest(range(0, (4 + bid % 4) * (2 + bid % 3))) AS p
           FROM crawls),
         g AS (
           SELECT media_id, w, h, p,
             ((bid * 7 + 3 * p + d) % 256 + (bid * 7 + 3 * p + 1 + d) % 256 +
              (bid * 7 + 3 * p + 2 + d) % 256) // 3 AS gray
           FROM px),
         m AS (SELECT media_id, CAST(SUM(gray) // COUNT(*) AS BIGINT) AS mean_gray
               FROM g GROUP BY media_id),
         hsh AS (
           SELECT g.media_id, w, h,
             CAST(SUM(CASE WHEN gray > mean_gray
                           THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS ahash
           FROM g JOIN m ON g.media_id = m.media_id
           GROUP BY g.media_id, w, h)"""

  val oracles: Map[String, String] = Map(
    "mm1_media_metadata" ->
      s"""SELECT $kindSql AS kind, COUNT(*) AS n_media,
            CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
            CAST(SUM(1 + (ascii(substr(text, 1, 1)) & 127)) AS BIGINT) AS sum_width,
            CAST(SUM(length(text) // $frameBytes) AS BIGINT) AS sum_frames,
            COUNT(DISTINCT md5(text)) AS n_distinct_payloads
          FROM documents GROUP BY 1""",
    "mm3_media_similar" ->
      """WITH feats AS (
           SELECT doc_id AS media_id,
             list_transform(range(0, 16), b ->
               len(list_filter(
                 list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))),
                 c -> c // 16 = b))) AS hist
           FROM documents),
         normed AS (
           SELECT media_id, hist,
             list_sum(list_transform(hist, x -> x * x)) AS nrm
           FROM feats),
         q AS (SELECT media_id AS query_id, hist AS q_hist, nrm AS q_nrm
               FROM normed WHERE media_id < 10),
         p AS (
           SELECT query_id, media_id,
             list_sum(list_transform(range(1, 17), i -> q_hist[i] * hist[i])) AS dot,
             q_nrm, nrm
           FROM q, normed WHERE media_id <> query_id),
         r AS (SELECT query_id, media_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(nrm AS DOUBLE)) DESC,
                            media_id) AS rank
               FROM p)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, media_id AS neighbor_id
         FROM r WHERE rank <= 5""",
    "mm2_frame_sample" ->
      s"""SELECT $kindSql AS kind,
            CAST(SUM(n_sampled) AS BIGINT) AS n_sampled_frames,
            COUNT(*) AS n_media,
            CAST(SUM(bytes) AS BIGINT) AS sampled_bytes
          FROM (
            SELECT doc_id,
              CASE WHEN length(text) // $frameBytes > 0
                   THEN ((length(text) // $frameBytes - 1) // 4) + 1 ELSE 0 END AS n_sampled,
              -- every sampled frame is a full $frameBytes window except
              -- possibly none: substring is within payload by construction
              (CASE WHEN length(text) // $frameBytes > 0
                    THEN ((length(text) // $frameBytes - 1) // 4) + 1 ELSE 0 END) * $frameBytes AS bytes
            FROM documents) t
          WHERE n_sampled > 0
          GROUP BY 1""",
    // byteHistograms has no SQL mirror (binary loop): covered by
    // MultimodalSpec invariants instead.
    // frame energies from the synth formula, runs via gaps-and-islands
    "mm11_audio_segments" -> {
      val sample = "abs((doc_id * 31 + 7 * i) % 2001 - 1000)"
      s"""WITH clips AS (
            SELECT doc_id AS media_id, 64 + doc_id % 64 AS n
            FROM documents WHERE doc_id < 100),
          fr AS (
            SELECT media_id, f,
              CAST(list_sum(list_transform(
                range(f * 16, LEAST(f * 16 + 16, n)),
                i -> $sample)) AS BIGINT) AS energy
            FROM (SELECT media_id, media_id AS doc_id, n,
                    unnest(range(0, (n + 15) // 16)) AS f
                  FROM clips)),
          x AS (SELECT media_id, f, energy, energy >= 8000 AS active FROM fr),
          st AS (SELECT media_id, f, energy, active,
                   CASE WHEN active AND COALESCE(
                       LAG(active) OVER (PARTITION BY media_id ORDER BY f), FALSE)
                     = FALSE THEN 1 ELSE 0 END AS is_start
                 FROM x),
          g AS (SELECT media_id, f, energy, active,
                  SUM(is_start) OVER (PARTITION BY media_id ORDER BY f) AS seg_no
                FROM st)
          SELECT media_id, CAST(seg_no AS BIGINT) AS seg_no,
            CAST(MIN(f) AS BIGINT) AS start_frame,
            COUNT(*) AS n_frames, CAST(SUM(energy) AS BIGINT) AS energy
          FROM g WHERE active GROUP BY 1, 2"""
    },
    "mm4_wav_decode" -> {
      val sample = "(doc_id * 31 + 7 * i) % 2001 - 1000"
      s"""SELECT doc_id AS media_id,
            CAST(8000 AS BIGINT) AS sample_rate,
            CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
            CAST(list_sum(list_transform(range(0, 64 + doc_id % 64),
              i -> $sample)) AS BIGINT) AS sum_samples,
            CAST(list_sum(list_transform(range(0, 64 + doc_id % 64),
              i -> ($sample) * ($sample))) AS BIGINT) AS sum_squares
          FROM documents WHERE doc_id < 100"""
    },
    "mm6_image_ahash" ->
      """WITH px AS (
           SELECT doc_id,
             CAST(4 + doc_id % 4 AS BIGINT) AS w, CAST(2 + doc_id % 3 AS BIGINT) AS h,
             unnest(range(0, (4 + doc_id % 4) * (2 + doc_id % 3))) AS p
           FROM documents WHERE doc_id < 100),
         g AS (
           SELECT doc_id, w, h, p,
             ((doc_id * 7 + 3 * p) % 256 + (doc_id * 7 + 3 * p + 1) % 256 +
              (doc_id * 7 + 3 * p + 2) % 256) // 3 AS gray
           FROM px),
         m AS (
           SELECT doc_id, CAST(SUM(gray) // COUNT(*) AS BIGINT) AS mean_gray
           FROM g GROUP BY doc_id)
         SELECT g.doc_id AS media_id, w AS width, h AS height, mean_gray,
           CAST(SUM(CASE WHEN gray > mean_gray
                         THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS ahash
         FROM g JOIN m ON g.doc_id = m.doc_id
         GROUP BY g.doc_id, w, h, mean_gray""",
    // Same closed form as mm5: synthPng paints pixel p with the same
    // (id*7 + 3p) channel values, and channel sums don't depend on
    // row order (BMP bottom-up vs PNG top-down).
    "mm7_png_decode" ->
      """SELECT doc_id AS media_id,
           CAST(4 + doc_id % 4 AS BIGINT) AS width,
           CAST(2 + doc_id % 3 AS BIGINT) AS height,
           CAST(list_sum(list_transform(range(0, (4 + doc_id % 4) * (2 + doc_id % 3)),
             p -> (doc_id * 7 + 3 * p + 2) % 256)) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(0, (4 + doc_id % 4) * (2 + doc_id % 3)),
             p -> (doc_id * 7 + 3 * p + 1) % 256)) AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(0, (4 + doc_id % 4) * (2 + doc_id % 3)),
             p -> (doc_id * 7 + 3 * p) % 256)) AS BIGINT) AS sum_b
         FROM documents WHERE doc_id < 100""",
    // replays every frame's closed-form pixels (fid = bid*10 + f, +4
    // on the copy crawl), the per-frame aHash, positional alignment,
    // and the >= 3/4 matched-frames rule.
    "mm10_video_neardup" ->
      """WITH vids AS (
           SELECT doc_id AS bid, CAST(3 + doc_id % 3 AS BIGINT) AS n_frames
           FROM documents WHERE doc_id < 30),
         crawls AS (
           SELECT bid AS video_id, bid, 0 AS d, n_frames FROM vids
           UNION ALL
           SELECT bid + 1000, bid, 4, n_frames FROM vids),
         fr AS (
           SELECT video_id, n_frames, CAST(u.f AS BIGINT) AS f,
                  bid * 10 + u.f AS fid, d
           FROM crawls CROSS JOIN UNNEST(range(0, n_frames)) AS u(f)),
         px AS (
           SELECT video_id, n_frames, f, fid, d,
             CAST(4 + fid % 4 AS BIGINT) AS w, CAST(2 + fid % 3 AS BIGINT) AS h,
             unnest(range(0, (4 + fid % 4) * (2 + fid % 3))) AS p
           FROM fr),
         g AS (
           SELECT video_id, n_frames, f, w, h, p,
             ((fid * 7 + 3 * p + d) % 256 + (fid * 7 + 3 * p + 1 + d) % 256 +
              (fid * 7 + 3 * p + 2 + d) % 256) // 3 AS gray
           FROM px),
         m AS (SELECT video_id, f, CAST(SUM(gray) // COUNT(*) AS BIGINT) AS mean_gray
               FROM g GROUP BY video_id, f),
         hsh AS (
           SELECT g.video_id, n_frames, g.f, w, h,
             CAST(SUM(CASE WHEN gray > mean_gray
                           THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS ahash
           FROM g JOIN m ON g.video_id = m.video_id AND g.f = m.f
           GROUP BY g.video_id, n_frames, g.f, w, h),
         pairs AS (
           SELECT x.video_id AS video_a, y.video_id AS video_b,
                  x.n_frames AS n_frames, COUNT(*) AS n_matched
           FROM hsh x JOIN hsh y
             ON x.n_frames = y.n_frames AND x.f = y.f
            AND x.video_id < y.video_id
            AND x.w = y.w AND x.h = y.h
            AND bit_count(xor(x.ahash, y.ahash)) <= 3
           GROUP BY 1, 2, 3)
         SELECT video_a, video_b, n_frames, n_matched
         FROM pairs WHERE n_matched * 4 >= n_frames * 3""",
    // mm10's closed-form pixel/aHash replay with the shot-indexed
    // content id and within-shot delta, then one LAG pass per video
    "mm14_shot_boundary" ->
      """WITH vids AS (
           SELECT doc_id AS bid, CAST(8 + doc_id % 5 AS BIGINT) AS n_frames,
                  CAST(3 + doc_id % 2 AS BIGINT) AS shot_len
           FROM documents WHERE doc_id < 30),
         fr AS (
           SELECT bid, n_frames, shot_len, CAST(u.f AS BIGINT) AS f,
                  bid * 100 + u.f // shot_len AS fid,
                  u.f % shot_len AS d
           FROM vids CROSS JOIN UNNEST(range(0, n_frames)) AS u(f)),
         px AS (
           SELECT bid, n_frames, shot_len, f, fid, d,
             CAST(4 + fid % 4 AS BIGINT) AS w, CAST(2 + fid % 3 AS BIGINT) AS h,
             unnest(range(0, (4 + fid % 4) * (2 + fid % 3))) AS p
           FROM fr),
         g AS (
           SELECT bid, n_frames, shot_len, f, w, h, p,
             ((fid * 7 + 3 * p + d) % 256 + (fid * 7 + 3 * p + 1 + d) % 256 +
              (fid * 7 + 3 * p + 2 + d) % 256) // 3 AS gray
           FROM px),
         m AS (SELECT bid, f, CAST(SUM(gray) // COUNT(*) AS BIGINT) AS mean_gray
               FROM g GROUP BY bid, f),
         hsh AS (
           SELECT g.bid, n_frames, shot_len, g.f, w, h,
             CAST(SUM(CASE WHEN gray > mean_gray
                           THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS ahash
           FROM g JOIN m ON g.bid = m.bid AND g.f = m.f
           GROUP BY g.bid, n_frames, shot_len, g.f, w, h),
         lg AS (
           SELECT bid, n_frames, shot_len, f, w, h, ahash,
             LAG(w) OVER wv AS pw, LAG(h) OVER wv AS ph,
             LAG(ahash) OVER wv AS pa
           FROM hsh WINDOW wv AS (PARTITION BY bid ORDER BY f)),
         cuts AS (
           SELECT bid, n_frames, shot_len,
             CASE WHEN pa IS NULL THEN 0
                  WHEN w <> pw OR h <> ph THEN 1
                  WHEN bit_count(xor(ahash, pa)) > 10 THEN 1 ELSE 0 END AS cut
           FROM lg)
         SELECT bid AS video_id, MAX(n_frames) AS n_frames,
           MAX(shot_len) AS shot_len, CAST(SUM(cut) AS BIGINT) AS n_cuts,
           CAST(SUM(cut) + 1 AS BIGINT) AS n_shots_detected,
           CAST((MAX(n_frames) + MAX(shot_len) - 1) // MAX(shot_len) AS BIGINT)
             AS n_shots_true
         FROM cuts GROUP BY bid""",
    "mm9_audio_neardup" ->
      s"""WITH $mm9Ctes
         SELECT x.media_id AS media_a, y.media_id AS media_b,
           CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
         FROM fps x JOIN fps y
           ON x.n = y.n AND x.media_id < y.media_id
         WHERE bit_count(xor(x.fp, y.fp)) <= 2""",
    // the eval aggregate over mm9's closed-form pair pipeline
    "ev6_audio_neardup_eval" ->
      s"""WITH $mm9Ctes,
          pairs AS (SELECT x.media_id AS media_a, y.media_id AS media_b
                    FROM fps x JOIN fps y
                      ON x.n = y.n AND x.media_id < y.media_id
                    WHERE bit_count(xor(x.fp, y.fp)) <= 2),
          u AS (SELECT 1 AS is_pair, media_a, media_b FROM pairs
                UNION ALL SELECT 0, doc_id, NULL FROM documents WHERE doc_id < 50)
          SELECT CAST(SUM(1 - is_pair) AS BIGINT) AS n_truth,
            CAST(SUM(is_pair) AS BIGINT) AS n_found,
            CAST(SUM(CASE WHEN is_pair = 1 AND media_b = media_a + 1000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
            CAST(SUM(CASE WHEN is_pair = 1 AND media_b = media_a + 1000
                          THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(SUM(1 - is_pair) AS BIGINT) AS recall,
            CAST(SUM(is_pair) AS BIGINT)
              - CAST(SUM(CASE WHEN is_pair = 1 AND media_b = media_a + 1000
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_extra
          FROM u""",
    "mm8_image_neardup" ->
      s"""WITH $mm8Ctes
         SELECT x.media_id AS media_a, y.media_id AS media_b,
           CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
         FROM hsh x JOIN hsh y
           ON x.w = y.w AND x.h = y.h AND x.media_id < y.media_id
         WHERE bit_count(xor(x.ahash, y.ahash)) <= 3""",
    // ev2's union-tagged aggregate over mm8's closed-form pair pipeline
    "ev5_image_neardup_eval" ->
      s"""WITH $mm8Ctes,
          pairs AS (SELECT x.media_id AS media_a, y.media_id AS media_b
                    FROM hsh x JOIN hsh y
                      ON x.w = y.w AND x.h = y.h AND x.media_id < y.media_id
                    WHERE bit_count(xor(x.ahash, y.ahash)) <= 3),
          u AS (SELECT 1 AS is_pair, media_a, media_b FROM pairs
                UNION ALL SELECT 0, doc_id, NULL FROM documents WHERE doc_id < 50)
          SELECT CAST(SUM(1 - is_pair) AS BIGINT) AS n_truth,
            CAST(SUM(is_pair) AS BIGINT) AS n_found,
            CAST(SUM(CASE WHEN is_pair = 1 AND media_b = media_a + 1000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
            CAST(SUM(CASE WHEN is_pair = 1 AND media_b = media_a + 1000
                          THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(SUM(1 - is_pair) AS BIGINT) AS recall,
            CAST(SUM(is_pair) AS BIGINT)
              - CAST(SUM(CASE WHEN is_pair = 1 AND media_b = media_a + 1000
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_extra
          FROM u""",
    // synthBmp's closed-form pixels pushed through the same 2×2
    // truncating block mean as the engine's byte-level resampler
    "mm12_image_resize" -> {
      val W = "(4 + doc_id % 4)"
      val OW = s"($W // 2)"
      val OH = "((2 + doc_id % 3) // 2)"
      val p00 = s"((q // $OW) * 2 * $W + (q % $OW) * 2)"
      val p10 = s"(((q // $OW) * 2 + 1) * $W + (q % $OW) * 2)"
      def chan(k: Int) =
        s"""CAST(list_sum(list_transform(range(0, $OW * $OH), q ->
             (((doc_id * 7 + 3 * $p00 + $k) % 256)
            + ((doc_id * 7 + 3 * ($p00 + 1) + $k) % 256)
            + ((doc_id * 7 + 3 * $p10 + $k) % 256)
            + ((doc_id * 7 + 3 * ($p10 + 1) + $k) % 256)) // 4)) AS BIGINT)"""
      s"""SELECT doc_id AS media_id,
            CAST($OW AS BIGINT) AS out_width,
            CAST($OH AS BIGINT) AS out_height,
            ${chan(2)} AS sum_r,
            ${chan(1)} AS sum_g,
            ${chan(0)} AS sum_b
          FROM documents WHERE doc_id < 100"""
    },
    // synthWav's closed-form samples through the same even-index
    // decimation; all integer
    "mm13_audio_decimate" -> {
      val nOut = "((64 + doc_id % 64 + 1) // 2)"
      val samp = "((doc_id * 31 + 7 * (2 * j)) % 2001 - 1000)"
      s"""SELECT doc_id AS media_id,
            CAST(64 + doc_id % 64 AS BIGINT) AS n_in,
            CAST($nOut AS BIGINT) AS n_out,
            CAST(list_sum(list_transform(range(0, $nOut), j -> $samp)) AS BIGINT)
              AS sum_kept,
            CAST(list_sum(list_transform(range(0, $nOut), j -> abs($samp))) AS BIGINT)
              AS sum_abs_kept
          FROM documents WHERE doc_id < 100"""
    },
    "mm5_bmp_decode" ->
      """SELECT doc_id AS media_id,
           CAST(4 + doc_id % 4 AS BIGINT) AS width,
           CAST(2 + doc_id % 3 AS BIGINT) AS height,
           CAST(list_sum(list_transform(range(0, (4 + doc_id % 4) * (2 + doc_id % 3)),
             p -> (doc_id * 7 + 3 * p + 2) % 256)) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(0, (4 + doc_id % 4) * (2 + doc_id % 3)),
             p -> (doc_id * 7 + 3 * p + 1) % 256)) AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(0, (4 + doc_id % 4) * (2 + doc_id % 3)),
             p -> (doc_id * 7 + 3 * p) % 256)) AS BIGINT) AS sum_b
         FROM documents WHERE doc_id < 100"""
  )
}
