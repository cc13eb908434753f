package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted by batched per-partition
  * functions (the Scala analog of arrow-batched UDFs — one iterator
  * per partition, no per-row driver round trips, no shuffle).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — the
  * binary schema, the partition-iterator batch shape, the frame
  * sampler, the metadata extraction — is real, tested, and
  * oracle-checked (q21/q21b derive the media column from
  * `documents.text` bytes so DuckDB can reproduce the numbers
  * independently via ascii()/octet_length()).
  */
object Multimodal {

  /** One extracted-metadata row per media blob. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, first_byte: Option[Int],
                       checksum: Long, n_frames: Long)

  /** One sampled frame per (blob, stride offset). */
  case class FrameSample(doc_id: Long, frame_idx: Long, byte_val: Int)

  /** Frame-sampling stride in bytes (stands in for e.g. every-Nth
    * video frame).
    */
  val frameStride = 32

  /** The media table: documents' text bytes as an opaque binary column
    * plus a typed metadata struct — the schema a real image/audio
    * table would carry (`media` would be JPEG/PCM bytes instead).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        col("text").cast("binary").as("media"),
        struct(lit("text/plain").as("mime"), col("lang").as("lang"),
          col("n_chars").cast("long").as("declared_len")).as("media_meta"))

  private def blobs(s: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    mediaTable(s, dir).select("doc_id", "media").as[(Long, Array[Byte])]
  }

  /** Q21 — batched metadata extraction over the binary column: length,
    * first byte, unsigned-byte checksum, sampled frame count. Runs as
    * one tight loop per partition (mapPartitions), the shape a real
    * decoder batch would use.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir).mapPartitions { it =>
      it.map { case (id, bytes) =>
        val n = bytes.length.toLong
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MediaMeta(
          doc_id = id,
          n_bytes = n,
          first_byte = if (n == 0) None else Some(bytes(0) & 0xff),
          checksum = sum,
          n_frames = if (n == 0) 0L else (n - 1) / frameStride + 1)
      }
    }.toDF()
  }

  /** Q21b — frame sampling: one row per stride-aligned byte (the
    * every-Nth-frame pattern for video/audio), exploded inside the
    * partition iterator so output batches stay columnar.
    */
  def frameSamples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        (0 until (if (bytes.isEmpty) 0 else (bytes.length - 1) / frameStride + 1))
          .iterator
          .map(f => FrameSample(id, f.toLong, bytes(f * frameStride) & 0xff))
      }
    }.toDF()
  }

  /** Q21c — resize: nearest-neighbor resampling of every blob to a
    * fixed `target` width (`out[i] = bytes[⌊i·n/target⌋]`) — the
    * image-thumbnail / audio-downsample plumbing shape: fixed-width
    * output per row, computed in the partition iterator. Empty blobs
    * produce no rows (nothing to resample).
    */
  def resizeSamples(s: SparkSession, dir: String, target: Int = 16): DataFrame = {
    import s.implicits._
    blobs(s, dir).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        if (bytes.isEmpty) Iterator.empty
        else (0 until target).iterator.map { i =>
          val src = (i.toLong * bytes.length / target).toInt
          (id, i.toLong, bytes(src) & 0xff)
        }
      }
    }.toDF("doc_id", "pos", "byte_val")
  }

  /** STUB — stands in for a real image/audio decoder (???: no codec
    * libraries in this environment). Deterministic fake features from
    * the raw bytes: (mean byte, max byte, length mod 256, first byte).
    * A real deployment swaps this body for JPEG/PCM decoding and keeps
    * the identical batch plumbing (mapPartitions signature, fixed-width
    * float output).
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array(0f, 0f, 0f, 0f)
    var sum = 0L; var max = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b; if (b > max) max = b
      i += 1
    }
    Array(sum.toFloat / bytes.length, max.toFloat,
      (bytes.length % 256).toFloat, (bytes(0) & 0xff).toFloat)
  }

  /** Feature extraction over the media column via the stub decoder —
    * the end-to-end "decode into fixed-width embedding" pipeline shape.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobs(s, dir).mapPartitions { it =>
      it.map { case (id, bytes) => (id, decodeStub(bytes)) }
    }.toDF("doc_id", "features")
  }

  /** Q139 — exact multimodal dedup by content checksum: group the
    * opaque media blobs by `md5(media)`, pick the min-doc_id survivor
    * per content group, and emit the per-blob keep/drop decision table
    * (the image/audio analog of Q15's text dedup — for media the
    * cryptographic checksum IS the dedup contract, the standard
    * CAS-style byte-identical image dedup).
    *
    * Scale shape: md5 is computed AT THE SCAN and only the 32-char
    * digest (plus doc_id and the byte length) ever enters an
    * exchange — media bytes never shuffle, the exact property that
    * makes checksum dedup viable when blobs are megabytes. One
    * digest-keyed aggregate, one digest-keyed join back.
    */
  def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    val h = mediaTable(s, dir).select(col("doc_id"),
      md5(col("media")).as("content_md5"),
      length(col("media")).cast("long").as("n_bytes"))
    val g = h.groupBy(col("content_md5"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("survivor_id"))
    h.join(g, Seq("content_md5"))
      .select(col("doc_id"), col("content_md5"), col("n_bytes"),
        col("n_copies"), col("survivor_id"),
        (col("doc_id") === col("survivor_id")).cast("long").as("keep"))
  }

  /** Q177 — perceptual near-dup hashing (dHash) over the media
    * column: each blob is nearest-neighbor-resized to `phashWidth`+1
    * samples (the q21c resize plumbing at width 65), and bit i of the
    * 64-bit signature is set iff sample i+1 > sample i — the
    * difference-hash every image-dedup pipeline computes on the 9×8
    * grayscale thumbnail (here the 1-D byte analog; a real deployment
    * swaps the byte sampler for the decoded-pixel grid and keeps the
    * identical packing/banding). The signature is carried as two
    * BIGINT-safe 32-bit halves like q15d's SimHash.
    *
    * Where q139 is the EXACT media dedup (cryptographic checksum),
    * this is the NEAR dedup: re-encoded/resized copies keep a close
    * dHash but change every byte of the file. The output is one row
    * per blob with its signature plus its banded-LSH neighborhood
    * stats — how many other blobs share a 16-bit band (the candidate
    * set a pair-join would verify; pigeonhole-exact for Hamming ≤ 3)
    * and the minimum Hamming distance among those candidates.
    *
    * Scale shape: signatures are one mapPartitions pass (media bytes
    * never shuffle — only (id, 2×long) rows enter the exchange); the
    * band self-join is the q15d blocked join (~n²/2^16 per band
    * expected candidates, never all-pairs); stats re-aggregate
    * doc-keyed. Empty blobs carry null signatures and skip banding.
    */
  def phashBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = 65
    val sigRaw = blobs(s, dir).mapPartitions { it =>
      it.map { case (id, bytes) =>
        if (bytes.isEmpty) (id, None: Option[Long], None: Option[Long])
        else {
          val out = new Array[Int](w)
          var i = 0
          while (i < w) {
            out(i) = bytes((i.toLong * bytes.length / w).toInt) & 0xff
            i += 1
          }
          var lo = 0L; var hi = 0L
          i = 0
          while (i < 32) { if (out(i + 1) > out(i)) lo |= (1L << i); i += 1 }
          while (i < 64) { if (out(i + 1) > out(i)) hi |= (1L << (i - 32)); i += 1 }
          (id, Some(lo), Some(hi))
        }
      }
    }.toDF("doc_id", "ph_lo", "ph_hi")
    // Eager checkpoint, not a lazy cache (round-18, the q217/C7
    // discipline): the signature table feeds three concurrent
    // branches (both band-join sides + the final left join), and
    // branches racing a lazy cache re-run the blob mapPartitions
    // pass per branch. CONSUME-ONCE (see Graph.hits).
    val sig = CheckpointOrphans.adopt(sigRaw.localCheckpoint())
    val blocks = sig.filter(col("ph_lo").isNotNull)
      .select(col("doc_id"), col("ph_lo"), col("ph_hi"),
        posexplode(array(
          col("ph_lo").bitwiseAND(lit(65535L)),
          shiftright(col("ph_lo"), 16),
          col("ph_hi").bitwiseAND(lit(65535L)),
          shiftright(col("ph_hi"), 16))).as(Seq("b", "bk")))
    val nbr = blocks.as("x").join(blocks.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("nbr_id"),
        (bit_count(col("x.ph_lo").bitwiseXOR(col("y.ph_lo"))) +
          bit_count(col("x.ph_hi").bitwiseXOR(col("y.ph_hi")))).as("hamming"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_band_neighbors"),
        min(col("hamming")).as("min_hamming"))
    sig.join(nbr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ph_lo"), col("ph_hi"),
        coalesce(col("n_band_neighbors"), lit(0L)).as("n_band_neighbors"),
        col("min_hamming").cast("long").as("min_hamming"))
  }

  /** Q176 — shot segmentation over the sampled frame stream: a CUT
    * wherever consecutive frame signatures jump by ≥ `threshold`, a
    * SHOT = the maximal run between cuts (running cut-count as shot
    * id — the gaps-and-islands discipline), rolled up to one row per
    * (blob, shot) with its frame span and exact signature sum. This
    * is the video shot-boundary detector every frame-level training
    * pipeline runs before per-shot sampling/captioning; the byte_val
    * stands in for a real frame embedding distance exactly as q21b's
    * frames stand in for decoded frames (no codecs in the container —
    * the WINDOWED detection plumbing is what is real and tested).
    *
    * Scale shape: one blob-keyed window pass (lag + running sum share
    * the exchange and sort; frames per blob are bounded by blob size
    * / stride) feeding a (blob, shot)-keyed partial+final aggregate.
    * Signature deltas and sums are exact integers.
    */
  /** Q195 — loudness normalization stats per audio-like blob: RMS
    * level, peak amplitude, crest factor, and the gain a normalizer
    * would apply to hit a target RMS — the per-clip pre-processing
    * table an audio ingest computes before resampling/augmentation.
    * Samples are bytes centered at 96 (the deterministic PCM stand-in
    * consistent with the Q186 framing; a real deployment decodes PCM
    * and keeps the identical per-partition reduction).
    *
    * Exactness: sum of squares and peak are exact longs accumulated
    * in the partition iterator; RMS/gain/crest are pinned
    * sqrt-and-divide doubles (sqrt is correctly-rounded IEEE).
    *
    * Scale shape: a NARROW one-pass per-partition reduction — one
    * output row per blob, media bytes never leave the scan.
    */
  def loudnessStats(s: SparkSession, dir: String,
                    targetRms: Double = 20.0): DataFrame = {
    import s.implicits._
    val center = 96
    blobs(s, dir).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        if (bytes.isEmpty) Iterator.empty
        else {
          var ss = 0L; var peak = 0L
          var i = 0
          while (i < bytes.length) {
            val v = ((bytes(i) & 0xff) - center).toLong
            ss += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          Iterator.single((id, bytes.length.toLong, ss, peak))
        }
      }
    }.toDF("doc_id", "n_samples", "sum_sq", "peak")
      .select(col("doc_id"), col("n_samples"), col("peak"),
        sqrt(col("sum_sq").cast("double") / col("n_samples")).as("rms"),
        (lit(targetRms) /
          sqrt(col("sum_sq").cast("double") / col("n_samples"))).as("gain"),
        (col("peak").cast("double") /
          sqrt(col("sum_sq").cast("double") / col("n_samples")))
          .as("crest"))
  }

  /** Q186 — voice-activity segmentation over the media byte stream
    * (the audio counterpart of Q176's video shot detection): 16-byte
    * PCM-like frames scored in the partition iterator, a frame is
    * ACTIVE when its per-frame score clears `minVoiced`, and maximal
    * runs of consecutive active frames become speech segments — the
    * trim-silence / split-on-pause pass every audio training pipeline
    * runs before transcription. The per-frame score here counts
    * "voiced" bytes (vowels — the same deterministic decode stand-in
    * as Q21's frames; a real deployment swaps in RMS energy over PCM
    * samples and keeps the identical frame/threshold/merge plumbing,
    * which is what is tested).
    *
    * Scale shape: frame scoring is a NARROW per-partition pass (blobs
    * never shuffle; only (doc_id, frame_idx, score) rows leave the
    * scan); segmentation is one blob-keyed window (row_number over
    * active frames; island key = frame_idx − rn, the gaps-and-islands
    * discipline with frames-per-blob bounded by blob size / 16)
    * feeding a (blob, segment)-keyed partial+final aggregate. All
    * integer arithmetic.
    */
  def speechSegments(s: SparkSession, dir: String,
                     minVoiced: Int = 5): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val frameLen = 16
    val voiced = "aeiou".getBytes.toSet
    val frames = blobs(s, dir).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        (0 until (if (bytes.isEmpty) 0 else (bytes.length - 1) / frameLen + 1))
          .iterator.map { f =>
            var v = 0
            var i = f * frameLen
            val end = math.min(i + frameLen, bytes.length)
            while (i < end) { if (voiced.contains(bytes(i))) v += 1; i += 1 }
            (id, f.toLong, v.toLong)
          }
      }
    }.toDF("doc_id", "frame_idx", "voiced")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.filter(col("voiced") >= minVoiced)
      .withColumn("seg_id",
        (col("frame_idx") - row_number().over(w)).cast("long"))
      .groupBy(col("doc_id"), col("seg_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("voiced")).as("sum_voiced"))
  }

  def sceneCuts(s: SparkSession, dir: String, threshold: Int = 48): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameSamples(s, dir)
      .withColumn("prev", lag(col("byte_val"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          abs(col("byte_val") - col("prev")) >= threshold, 1L).otherwise(0L))
      .withColumn("shot_id", sum(col("cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("shot_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("byte_val").cast("long")).as("sum_sig"))
  }
}
