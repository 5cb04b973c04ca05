package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.{MediaInference, Multimodal, Png, Wav}
import org.apache.spark.sql.functions._

/** Oracle gates for the S12/S13 media batch paths: the REAL distributed
  * pipelines (mapPartitions, per-partition backend load, batched inference —
  * `MediaInference.transcribeWav` / `embedImages`) over binary-payload rows,
  * with the deterministic fake backends standing in for model weights (the
  * sanctioned stub boundary; reference src/whisper.rs:920-1090,
  * src/clip.rs:856-891).
  *
  * Fixture discipline: payload bytes are synthesized from `doc_id` alone
  * with integer arithmetic (doc_id < 40 exists identically at every gated
  * SF), so the pipeline output is a pure deterministic function of the row
  * id. The oracle is the golden output table (generated once by
  * `graft.tools.GoldenGen`, then frozen): WAV parse → resample → log-mel →
  * digest, and PNG decode → CLIP preprocess → fake embedding, are not
  * SQL-expressible, so the gate locks the batch path against drift the way
  * a golden file locks a codec.
  */
object MediaQueries {

  /** PCM16 mono WAV at 8 kHz (exercises the 2x resample path): length and
    * waveform vary per id, all-integer synthesis. */
  def synthWavBytes(id: Long): Array[Byte] = {
    val n = 4000 + (id % 40).toInt * 123
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952)            // "RIFF"
    bb.putInt(36 + 2 * n)
    bb.putInt(0x45564157)            // "WAVE"
    bb.putInt(0x20746d66)            // "fmt "
    bb.putInt(16)
    bb.putShort(1)                   // PCM
    bb.putShort(1)                   // mono
    bb.putInt(8000)
    bb.putInt(8000 * 2)
    bb.putShort(2)
    bb.putShort(16)
    bb.putInt(0x61746164)            // "data"
    bb.putInt(2 * n)
    var i = 0
    while (i < n) {
      bb.putShort(((((i * (2 * id + 3) + 17) % 1024) - 512) * 60).toShort)
      i += 1
    }
    bb.array()
  }

  /** 16x12 RGB PNG, gradient parameterized by id. */
  def synthPngBytes(id: Long): Array[Byte] = {
    val w = 16; val h = 12
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 3 * (y * w + x)
        rgb(o) = ((x * 17 + y * 31 + id * 7) % 256).toByte
        rgb(o + 1) = ((x * 5 + y * 13 + id * 11) % 256).toByte
        rgb(o + 2) = ((x * 29 + y * 3 + id * 23) % 256).toByte
        x += 1
      }
      y += 1
    }
    Png.encode(Png.Image(w, h, rgb))
  }

  /** "GVID" container of 6 + id%5 PNG frames, each a gradient varying by
    * (id, frame) — all-integer synthesis like the WAV/PNG fixtures. */
  def synthVideoBytes(id: Long): Array[Byte] = {
    val frames = (0 until 6 + (id % 5).toInt).map { f =>
      val w = 16; val h = 12
      val rgb = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = 3 * (y * w + x)
          rgb(o) = ((x * 17 + y * 31 + id * 7 + f * 41) % 256).toByte
          rgb(o + 1) = ((x * 5 + y * 13 + id * 11 + f * 19) % 256).toByte
          rgb(o + 2) = ((x * 29 + y * 3 + id * 23 + f * 53) % 256).toByte
          x += 1
        }
        y += 1
      }
      graft.multimodal.Png.encode(graft.multimodal.Png.Image(w, h, rgb))
    }
    graft.multimodal.Video.encode(frames)
  }

  /** Bursty PCM16 mono WAV at 8 kHz for the VAD gate: near-silence with
    * 2–4 loud tone bursts at id-keyed offsets — all-integer synthesis, so
    * the segment table is a pure function of the row id. */
  def synthBurstWavBytes(id: Long): Array[Byte] = {
    val n = 16000 // 2 s at 8 kHz
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952); bb.putInt(36 + 2 * n); bb.putInt(0x45564157)
    bb.putInt(0x20746d66); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(8000 * 2); bb.putShort(2); bb.putShort(16)
    bb.putInt(0x61746164); bb.putInt(2 * n)
    val nb = 2 + (id % 3).toInt
    var i = 0
    while (i < n) {
      val inBurst = (0 until nb).exists { k =>
        val st = (((id % 5) + k * 3).toInt) * 1600
        i >= st && i < st + 1200
      }
      val v =
        if (inBurst) ((((i * (id + 7) + 11) % 256) - 128) * 120).toShort
        else (((i * 3 + 1) % 17) - 8).toShort
      bb.putShort(v)
      i += 1
    }
    bb.array()
  }

  /** Deterministic NER fixture text (X11's golden-gate fixture, same
    * doc_id-only discipline as the WAV/PNG synthesizers): entity surface
    * forms drawn by id so every doc yields different spans. */
  def synthNerText(id: Long): String = {
    val pers = Array("Alice Smith", "Bob Stone", "Carol King", "Dan Swift")
    val orgs = Array("Acme Corp", "Globex Group", "Initech Labs")
    val locs = Array("Paris", "Berlin Area", "Tokyo")
    val p = pers((id % 4).toInt)
    val o = orgs((id % 3).toInt)
    val l = locs(((id / 3) % 3).toInt)
    s"Report $id filed: $p of $o visited $l and $p signed notes."
  }

  /** WordPiece vocab whose ids are chosen so the deterministic
    * FakeBackend (label = id mod 9 over NerInference.Labels) tags each
    * word with the BIO label its role needs: given names ≡ 1 (B-PER),
    * surnames ≡ 2 (I-PER), org heads ≡ 3 / tails ≡ 4, locations ≡ 5 / 6,
    * filler ≡ 0 (O). "Initech" = "Init" + "##ech" exercises the
    * first-subtoken label alignment; unknown words (ids, "signed") fall
    * to unkId 0 ≡ O. */
  val nerVocab: Map[String, Long] = Map(
    "Alice" -> 1L, "Bob" -> 10L, "Carol" -> 19L, "Dan" -> 28L,
    "Smith" -> 2L, "Stone" -> 11L, "King" -> 20L, "Swift" -> 29L,
    "Acme" -> 3L, "Globex" -> 12L, "Init" -> 21L,
    "Corp" -> 4L, "Group" -> 13L, "Labs" -> 22L,
    "Paris" -> 5L, "Berlin" -> 14L, "Tokyo" -> 23L,
    "Area" -> 6L,
    "Report" -> 9L, "of" -> 18L, "visited" -> 27L, "and" -> 36L,
    "filed" -> 45L, "notes" -> 54L,
    "##ech" -> 8L)

  private def mediaRows(s: org.apache.spark.sql.SparkSession, d: String,
                        kind: String, synth: Long => Array[Byte]) = {
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") < 40)
      .select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRow(id, s"mv2://media/$id", kind,
        synth(id), Map.empty))
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- S12 batch transcription: WAV parse → 16 kHz resample → log-mel
    // windows → per-partition speech backend. The fake backend's digest is
    // a pure function of the real mel features, so any drift in parsing,
    // resampling, windowing, or the mel filterbank breaks the hash.
    "media_transcribe_batch" -> QueryDef.sql(
      (s, d) => {
        MediaInference.transcribeWav(
            mediaRows(s, d, "audio", synthWavBytes),
            () => new MediaInference.FakeSpeechBackend)
          .toDF()
          .select(col("mediaId").as("media_id"), col("segmentIdx").as("seg"),
            col("startMs").as("start_ms"), col("endMs").as("end_ms"), col("text"))
          .orderBy(col("media_id"), col("seg"))
      },
      MediaGolden.transcribeSql),

    // ---- S13 batch image embedding: PNG decode → CLIP preprocess
    // (shortest-edge bilinear resize, center crop, [0,1] CHW) → batched
    // per-partition vision backend; embedding dims are emitted as exact
    // thousandths so the compare is integer-stable.
    "media_clip_embed_batch" -> QueryDef.sql(
      (s, d) => {
        val feats = MediaInference.embedImages(
            mediaRows(s, d, "image", synthPngBytes),
            () => new MediaInference.FakeVisionBackend(dim = 8),
            preprocess = Png.clipPreprocessor(size = 32))
          .toDF()
        val dims = (0 until 8).map(i =>
          round(element_at(col("feature"), i + 1) * 1000).cast("int").as(s"e$i"))
        feats.select(col("mediaId").as("media_id") +: dims: _*)
          .orderBy(col("media_id"))
      },
      MediaGolden.clipSql),

    // ---- S11+ video frame sampling: GVID demux → every-3rd-frame stride →
    // REAL per-frame PNG pixel decode → exact integer channel means. The
    // golden oracle locks demux, stride arithmetic, the PNG codec, and the
    // stats — the full batch path a real demuxer would drop into. ----
    "media_frame_sample" -> QueryDef.sql(
      (s, d) => {
        graft.multimodal.Video.sampleFrames(
            mediaRows(s, d, "video", synthVideoBytes), every = 3)
          .toDF()
          .select(col("mediaId").as("media_id"), col("frameIdx").as("frame"),
            col("width").as("w"), col("height").as("h"),
            col("meanR").as("mr"), col("meanG").as("mg"), col("meanB").as("mb"))
          .orderBy(col("media_id"), col("frame"))
      },
      MediaGolden.frameSampleSql),

    // ---- X11 batch NER: cased WordPiece tokenize → per-partition tagger
    // (one backend per partition, the ner.rs:249 session-amortization
    // shape) → first-subtoken label alignment → BIO span merge, over
    // deterministic fixture text. The fake backend's label is a pure
    // function of the token id, so the golden locks tokenization,
    // sub-token alignment, span merging, char offsets, and the
    // mapPartitions batch path — a real DistilBERT session drops in by
    // swapping the backend (reference src/analysis/ner.rs:249,494). ----
    "ner_extract_batch" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        import graft.graph.NerInference
        val docs = Tables.documents(s, d).filter(col("doc_id") < 40)
          .select(col("doc_id")).as[Long]
          .map(id => (id, synthNerText(id)))
          .toDF("doc_id", "text")
        NerInference.extractAll(docs, "doc_id", "text",
            () => new NerInference.Tagger(
              new NerInference.FakeBackend,
              new NerInference.CasedTokenizer(nerVocab, unkId = 0L)))
          .select(col("frameId").as("doc_id"), col("entity"), col("kind"),
            col("offset"))
          .orderBy(col("doc_id"), col("offset"))
      },
      MediaGolden.nerSql),

    // ---- perceptual image dedup: REAL PNG decode → 64-bit dHash →
    // hash-grouped duplicate clusters (the image-side exact dedup a
    // multimodal training pipeline runs; near-dup scales by banding the
    // same 64-bit hash like SimHash). Fixture: 40 media rows carrying
    // only 8 distinct images (bytes keyed by doc_id mod 8), so the
    // clusters are known — but the HASH values come from the real
    // decode+luma+bilinear pipeline, golden-locked, and the grouping
    // replays in SQL from those hashes. ----
    "media_image_dedup" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).filter(col("doc_id") < 40)
          .select(col("doc_id")).as[Long]
          .map(id => (id,
            graft.multimodal.Png.dHash64(synthPngBytes(id % 8))))
          .toDF("media_id", "dhash")
          .groupBy(col("dhash"))
          .agg(count(lit(1)).as("n"), min(col("media_id")).as("keep_id"),
            concat_ws(",", sort_array(collect_list(col("media_id"))))
              .as("member_ids"))
          .orderBy(col("keep_id"))
      },
      MediaGolden.dhashSql),

    // ---- energy VAD over the REAL WAV parse (the silence-skip pass a
    // speech pipeline runs before transcription): frame RMS energies →
    // mean-relative threshold → merged active segments. The fixture's
    // burst layout is a pure function of the row id, but the segment
    // boundaries come from the actual PCM parse + RMS arithmetic,
    // golden-locked per clip. ----
    "media_audio_vad" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).filter(col("doc_id") < 40)
          .select(col("doc_id")).as[Long]
          .flatMap { id =>
            val pcm = Wav.parse(synthBurstWavBytes(id))
            Wav.vadSegments(pcm).zipWithIndex.map { case ((a, b), k) =>
              (id, k, a, b)
            }
          }
          .toDF("media_id", "seg", "start_ms", "end_ms")
          .orderBy(col("media_id"), col("seg"))
      },
      MediaGolden.vadSql))
}
