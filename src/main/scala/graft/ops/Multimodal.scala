package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata structs alongside.
  *
  * The Spark-side contract — schema, partition-parallel decode via
  * mapPartitions over the binary column, stable output shape — is real
  * and tested. Metadata decode ([[decodeMeta]]) parses real PNG / JPEG /
  * GIF container headers in pure JVM byte arithmetic (no image
  * libraries in this container); payloads that are none of these fall
  * back to a clearly-marked deterministic stub ([[fakeDecode]]), which
  * is what the text-payload test corpus exercises. Frame sampling walks
  * real AVI/RIFF containers ([[parseAviFrames]] — splitting frames needs
  * only the container index, not a codec) and falls back to fixed-size
  * byte slicing for non-container payloads.
  *
  * Scale notes: decode runs inside mapPartitions — one task per input
  * split, no shuffle, no driver involvement; exactly how a 100 TB media
  * lake is feature-extracted.
  */
object Multimodal {

  /** Typed metadata produced by the (stub) decoder. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, format: String)

  /** STUB decoder: deterministic metadata from raw bytes, for payloads
    * that are not a recognized media container (the test corpus carries
    * UTF-8 text as its stand-in payload). */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(id, n, n % 640 + 1, n % 480 + 1, format)
  }

  private def u8(b: Byte): Int = b & 0xFF
  private def be16(b: Array[Byte], i: Int): Long = (u8(b(i)) << 8 | u8(b(i + 1))).toLong
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b(i)).toLong << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3)))
  private def le16(b: Array[Byte], i: Int): Long = (u8(b(i + 1)) << 8 | u8(b(i))).toLong

  /** PNG: 8-byte signature, then the IHDR chunk — width/height are the
    * big-endian u32s at offsets 16 and 20. */
  private[ops] def parsePng(b: Array[Byte]): Option[(Long, Long, String)] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (b.length >= 24 && b.take(8).sameElements(sig) &&
      new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      Some((be32(b, 16), be32(b, 20), "png"))
    else None
  }

  /** JPEG: SOI (FF D8) then marker segments; the frame header (SOF0/1/2/3
    * and the extended SOF5–15 family, excluding DHT C4 / JPG C8 / DAC CC)
    * carries height then width as big-endian u16s after the 1-byte
    * precision field. */
  private[ops] def parseJpeg(b: Array[Byte]): Option[(Long, Long, String)] = {
    if (b.length < 4 || u8(b(0)) != 0xFF || u8(b(1)) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length && u8(b(i)) == 0xFF) {
      val marker = u8(b(i + 1))
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        if (i + 8 >= b.length) return None
        return Some((be16(b, i + 7), be16(b, i + 5), "jpeg")) // (width, height)
      } else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) {
        i += 2 // standalone marker, no length field
      } else {
        i += 2 + be16(b, i + 2).toInt // skip segment by its length
      }
    }
    None
  }

  /** GIF87a/GIF89a: width/height are little-endian u16s at offsets 6/8.
    *
    * Unlike the PNG/JPEG signatures (unreachable in valid UTF-8 text),
    * "GIF87a" is plain ASCII, so a text payload could collide. Sanity
    * checks before accepting: nonzero dimensions, then a full
    * logical-screen-descriptor validation. GIFs with a GCT always pass
    * (packed ≥ 0x80, outside printable ASCII — the overwhelmingly common
    * case). A no-GCT GIF (packed < 0x80, possibly printable e.g. 0x70)
    * is accepted only when the rest of the descriptor is consistent with
    * the flag being clear: background-color index (offset 11) and pixel
    * aspect ratio (offset 12) both 0, as writers emit for no-GCT files.
    * A printable-text payload can't satisfy that (it would need two NUL
    * bytes), so precision is kept without rejecting real no-GCT GIFs. */
  private[ops] def parseGif(b: Array[Byte]): Option[(Long, Long, String)] = {
    if (b.length >= 13 && {
      val h = new String(b.take(6), "US-ASCII"); h == "GIF87a" || h == "GIF89a"
    } && le16(b, 6) > 0 && le16(b, 8) > 0
      && ((u8(b(10)) & 0x80) != 0 || u8(b(10)) < 0x20
        || (b(11) == 0 && b(12) == 0)))
      Some((le16(b, 6), le16(b, 8), "gif"))
    else None
  }

  /** Real header decode for PNG / JPEG / GIF payloads (pure JVM — byte
    * arithmetic only, no image libraries); any other payload falls back
    * to the deterministic stub. */
  def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta =
    parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseGif(bytes))
      .map { case (w, h, fmt) => MediaMeta(id, bytes.length.toLong, w, h, fmt) }
      .getOrElse(fakeDecode(id, bytes))

  /** Attach a binary payload column derived from text (UTF-8 bytes) —
    * stand-in for reading real media blobs from a lake. */
  def withBinaryPayload(df: DataFrame, text: String = "text",
                        out: String = "media"): DataFrame =
    df.withColumn(out, col(text).cast("binary"))

  /** Partition-parallel metadata extraction over the binary column. */
  def extractMeta(df: DataFrame, id: String = "doc_id",
                  bin: String = "media"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), col(bin)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (i, b) => decodeMeta(i, b) })
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b(i)).toLong | (u8(b(i + 1)).toLong << 8) |
      (u8(b(i + 2)).toLong << 16) | (u8(b(i + 3)).toLong << 24))

  /** AVI (RIFF) container walk: the video frame payloads — the
    * "NNdc"/"NNdb" chunks inside the 'movi' LIST (including ones nested
    * in 'rec ' LISTs) — or None if the bytes are not an AVI. Splitting
    * frames needs only the container's chunk index, not a codec, so this
    * path is REAL: pure JVM chunk arithmetic, robust to truncated files
    * (sizes are clamped to the buffer). Decoding the frame bytes to
    * pixels would need a codec and stays out of scope. */
  private[ops] def parseAviFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    def fourcc(i: Int) = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val frames = Vector.newBuilder[Array[Byte]]
    def isFrame(cc: String) = cc.length == 4 &&
      cc(0).isDigit && cc(1).isDigit &&
      (cc.endsWith("dc") || cc.endsWith("db"))
    // iterative walk with an explicit stack: recursing per nested LIST
    // would let a crafted deeply-nested payload blow the task's JVM
    // stack — the same one-bad-row-must-not-kill-the-task requirement
    // the size clamp below serves
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    var stack = List((12, riffEnd, false))
    while (stack.nonEmpty) {
      var (i, end, inMovi) = stack.head
      stack = stack.tail
      while (i + 8 <= end) {
        val cc = fourcc(i)
        val dataStart = i + 8
        // clamp the declared u32 size to the remaining buffer BEFORE
        // narrowing to Int: a corrupt/adversarial size ≥ 2^31 would
        // otherwise overflow negative and drive the walk index out of
        // bounds
        val sz = math.min(math.max(0L, le32(b, i + 4)), (end - dataStart).toLong).toInt
        val dataEnd = dataStart + sz
        if (cc == "LIST" && dataStart + 4 <= end) {
          // descend into the LIST first (LIFO pop order keeps frames in
          // document order), resuming this level after it
          stack = (dataStart + 4, dataEnd, inMovi || fourcc(dataStart) == "movi") ::
            (dataEnd + (sz & 1), end, inMovi) :: stack
          i = end // break inner loop; resume via the stack
        } else {
          if (inMovi && isFrame(cc)) frames += b.slice(dataStart, dataEnd)
          i = dataEnd + (sz & 1) // chunks pad to even length
        }
      }
    }
    Some(frames.result())
  }

  /** Frame sampler: every `stride`-th frame of a video payload. AVI/RIFF
    * payloads are split on their REAL container chunk index
    * ([[parseAviFrames]]); any other payload demonstrates the
    * 1-row → N-frame-rows generator shape via fixed-size byte slicing
    * (the declared stand-in for containers this parser doesn't know). */
  def sampleFrames(df: DataFrame, id: String = "doc_id", bin: String = "media",
                   frameSize: Int = 16, stride: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), col(bin)).as[(Long, Array[Byte])]
      .flatMap { case (i, b) =>
        val frames: Iterator[(Array[Byte], Int)] = parseAviFrames(b) match {
          case Some(fs) => fs.iterator.zipWithIndex
          case None => b.grouped(frameSize).zipWithIndex
        }
        frames.collect { case (frame, idx) if idx % stride == 0 =>
          (i, idx.toLong, frame)
        }
      }
      .toDF(id, "frame_idx", "frame_bytes")
  }

  // ── perceptual frame near-dup (dHash) ──────────────────────────────

  /** Difference hash over a frame's RAW bytes — the perceptual
    * companion to exact frame dedup (md5 catches bit-identical frames;
    * a one-pixel shift or a requantize escapes it). The classic dHash
    * recipe, applied to the byte stream the container walk already
    * yields: resample the frame into `bits`+1 contiguous cells, average
    * each, and set bit k iff cell k+1's average exceeds cell k's.
    * Averages are stable under small shifts (a few bytes moving across
    * a cell boundary barely moves its mean) and under monotone
    * requantization (order of means is preserved), which is exactly
    * what makes gradient-sign hashes perceptual.
    *
    * All INTEGER arithmetic — the average comparison cross-multiplies
    * (s₂·n₁ > s₁·n₂) instead of dividing, so there is no rounding to
    * disagree on and the DuckDB oracle replays the hash bit-for-bit.
    * Degenerate cells (frame shorter than bits+1 bytes → empty slots)
    * take the single byte at their clamped start position, keeping the
    * hash total and deterministic for any frame length; the empty frame
    * hashes to 0. */
  private[ops] def frameDHash(b: Array[Byte], bits: Int): Long = {
    val n = b.length
    if (n == 0) return 0L
    def cell(k: Int): (Long, Long) = {
      val lo = (k.toLong * n / (bits + 1)).toInt
      val hi = ((k + 1).toLong * n / (bits + 1)).toInt
      if (hi <= lo) ((b(math.min(lo, n - 1)) & 0xFF).toLong, 1L)
      else {
        var s = 0L; var i = lo
        while (i < hi) { s += (b(i) & 0xFF); i += 1 }
        (s, (hi - lo).toLong)
      }
    }
    var h = 0L
    var (ps, pl) = cell(0)
    var k = 0
    while (k < bits) {
      val (cs, cl) = cell(k + 1)
      if (cs * pl > ps * cl) h |= 1L << k
      ps = cs; pl = cl
      k += 1
    }
    h
  }

  /** (id, frame_idx, dhash) per frame — partition-parallel, no shuffle
    * (the [[extractMeta]] contract). */
  def frameDHashes(frames: DataFrame, id: String = "doc_id",
                   idxCol: String = "frame_idx", bin: String = "frame_bytes",
                   bits: Int = 32): DataFrame = {
    require(bits >= 4 && bits % 4 == 0 && bits <= 62,
      s"bits must be a multiple of 4 in [4, 62] (4-chunk bucketing on a signed long), got $bits")
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col(id), col(idxCol), col(bin)).as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (d, i, b) => (d, i, frameDHash(b, bits)) })
      .toDF(id, idxCol, "dhash")
  }

  private def dHashChunkBuckets(frames: DataFrame, id: String, idxCol: String,
                                bin: String, bits: Int): DataFrame = {
    val cb = bits / 4
    val cm = (1L << cb) - 1
    val chunks = array((0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(col("dhash"), i * cb).bitwiseAND(lit(cm)).as("bucket"))
    }: _*)
    frameDHashes(frames, id, idxCol, bin, bits)
      .select(col(id), col(idxCol), col("dhash"), explode(chunks).as("cb"))
      .select(col(id), col(idxCol), col("dhash"),
        col("cb.chunk").as("chunk"), col("cb.bucket").as("bucket"))
  }

  /** Scene-cut detection: a cut lands wherever CONSECUTIVE frames'
    * perceptual signatures diverge — Hamming([[frameDHash]]ᵢ₋₁,
    * dHashᵢ) ≥ `minBits` — the shot-boundary primitive behind
    * keyframe selection ("sample one frame per scene" beats "every
    * Nth frame" for training-data coverage of a video's content).
    *
    * All-integer: dHash, XOR, popcount, an integer threshold — nothing
    * to quantize, replayed bit-for-bit by the oracle's SQL dHash.
    * One key-hash window over the per-frame signature frame (the
    * signatures themselves are map-only); emits (id, cut_at, hamming)
    * where `cut_at` is the first frame index of the new scene. */
  def sceneCuts(frames: DataFrame, id: String = "doc_id",
                idxCol: String = "frame_idx", bin: String = "frame_bytes",
                bits: Int = 32, minBits: Int = 8): DataFrame = {
    require(minBits >= 1 && minBits <= bits,
      s"minBits must lie in [1, $bits], got $minBits")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col(idxCol))
    frameDHashes(frames, id, idxCol, bin, bits)
      .withColumn("__prev", lag(col("dhash"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("hamming",
        bit_count(col("dhash").bitwiseXOR(col("__prev"))).cast("long"))
      .filter(col("hamming") >= minBits)
      .select(col(id), col(idxCol).as("cut_at"), col("hamming"))
  }

  /** The chunk buckets [[framePerceptualNearDup]]'s `maxBucket` cap
    * EXCLUDES — the no-silent-caps observer (the
    * [[Dedup.simhashDroppedBuckets]] pattern): a capped run surfaces
    * this frame so dropped recall is measured, never assumed. */
  def frameDHashDroppedBuckets(frames: DataFrame, id: String = "doc_id",
                               idxCol: String = "frame_idx",
                               bin: String = "frame_bytes", bits: Int = 32,
                               maxBucket: Int = 10000): DataFrame =
    dHashChunkBuckets(frames, id, idxCol, bin, bits)
      .groupBy(col("chunk"), col("bucket"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucket)

  /** Perceptual near-duplicate frame pairs: dHash each frame, bucket
    * under the hash's four disjoint chunks, and verify candidates with
    * bit_count over XOR — [[Dedup.simhashNearDup]]'s 4-table scheme on
    * the visual signature. Pigeonhole guarantees recall at Hamming ≤ 3:
    * such a pair agrees exactly on at least one chunk. Join cost is
    * bounded per (chunk, bucket) with the `maxBucket` cap (observed by
    * [[frameDHashDroppedBuckets]]), never frames². Pairs are canonical
    * ((id, idx) lexicographically ascending) and deduped across the
    * chunks that co-bucket them. */
  def framePerceptualNearDup(frames: DataFrame, id: String = "doc_id",
                             idxCol: String = "frame_idx",
                             bin: String = "frame_bytes", bits: Int = 32,
                             maxBits: Int = 3,
                             maxBucket: Int = 10000): DataFrame = {
    require(maxBits <= 3,
      s"4-chunk pigeonhole recall only holds at maxBits <= 3, got $maxBits")
    val bucketed = dHashChunkBuckets(frames, id, idxCol, bin, bits)
    val sized = bucketed.withColumn("bsize",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("chunk"), col("bucket"))))
      .filter(col("bsize") <= maxBucket)
    val a = sized.select(col("chunk"), col("bucket"),
      col(id).as(s"${id}_a"), col(idxCol).as(s"${idxCol}_a"), col("dhash").as("h_a"))
    val b = sized.select(col("chunk"), col("bucket"),
      col(id).as(s"${id}_b"), col(idxCol).as(s"${idxCol}_b"), col("dhash").as("h_b"))
    a.join(b, Seq("chunk", "bucket"))
      .filter(struct(col(s"${id}_a"), col(s"${idxCol}_a")) <
        struct(col(s"${id}_b"), col(s"${idxCol}_b")))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxBits)
      .select(col(s"${id}_a"), col(s"${idxCol}_a"),
        col(s"${id}_b"), col(s"${idxCol}_b"),
        col("hamming").cast("long").as("hamming"))
      .distinct()
  }

  // ── audio modality (WAV / RIFF) ─────────────────────────────────────

  /** Typed audio metadata from a WAV header walk. */
  final case class AudioMeta(doc_id: Long, n_bytes: Long, channels: Long,
                             sample_rate: Long, bits: Long,
                             duration_ms: Long, format: String)

  private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    putLe16(b, i, v & 0xFFFF); putLe16(b, i + 2, (v >>> 16) & 0xFFFF)
  }

  /** Deterministic 16-bit PCM WAV wrapper around an arbitrary payload —
    * the audio stand-in for reading real recordings from a lake (the
    * 44-byte canonical header, then the payload as sample data). The
    * fmt parameters derive from the id so the parse round-trip is
    * oracle-checkable. */
  def synthWav(id: Long, payload: Array[Byte]): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val rate = (8000 + (id % 3) * 4000).toInt
    val bits = 16
    val blockAlign = channels * bits / 8
    // RIFF chunks are word-aligned: an odd-length data chunk carries one
    // zero pad byte NOT counted in the chunk's declared size but counted
    // in the RIFF extent — strict external readers reject files missing
    // it (our own parseWav merely tolerates them)
    val pad = payload.length & 1
    val b = new Array[Byte](44 + payload.length + pad)
    def ascii(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(b, i)
    ascii(0, "RIFF"); putLe32(b, 4, 36 + payload.length + pad); ascii(8, "WAVE")
    ascii(12, "fmt "); putLe32(b, 16, 16)
    putLe16(b, 20, 1) // PCM
    putLe16(b, 22, channels); putLe32(b, 24, rate)
    putLe32(b, 28, rate * blockAlign); putLe16(b, 32, blockAlign)
    putLe16(b, 34, bits)
    ascii(36, "data"); putLe32(b, 40, payload.length)
    payload.copyToArray(b, 44)
    b
  }

  private[ops] final case class WavFmt(tag: Long, channels: Long, rate: Long,
                                       byteRate: Long, bits: Long, dataLen: Long)

  /** WAV header walk, or None if the bytes are not RIFF/WAVE. Chunk-
    * order agnostic (fmt and data located by fourcc); both the per-chunk
    * sizes AND the walk itself are clamped — to the buffer and to the
    * declared RIFF extent — same robustness stance as
    * [[parseAviFrames]]: trailing garbage beyond the container can never
    * be misread as a chunk. The fmt chunk's STORED byte rate is carried
    * through rather than recomputed, so non-PCM encodings and
    * adversarial field values cannot push a derived product into
    * overflow. */
  private[ops] def parseWav(b: Array[Byte]): Option[WavFmt] = {
    def fourcc(i: Int) = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4))
    var i = 12
    var fmt: Option[(Long, Long, Long, Long, Long)] = None
    var dataLen: Option[Long] = None
    while (i + 8 <= riffEnd && (fmt.isEmpty || dataLen.isEmpty)) {
      val cc = fourcc(i)
      val size = math.min(le32(b, i + 4), riffEnd - i - 8)
      if (cc == "fmt " && size >= 16)
        fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12),
          le32(b, i + 16), le16(b, i + 22)))
      else if (cc == "data") dataLen = Some(size)
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((tag, ch, rate, br, bits) <- fmt; n <- dataLen)
      yield WavFmt(tag, ch, rate, br, bits, n)
  }

  /** Deterministic FLAC wrapper: the 4-byte "fLaC" magic, one STREAMINFO
    * metadata block (type 0, is-last, 34 bytes — the only mandatory
    * block), then the payload as opaque frame bytes. The stream
    * parameters derive from the id (channels 1+id%2, rate
    * 8000+(id%5)·4000 — all inside STREAMINFO's 20-bit rate field) and
    * total-samples is the payload length, so the parse round-trip is
    * pure (id, byte-length) arithmetic for the oracle — same stance as
    * [[synthWav]]. */
  def synthFlac(id: Long, payload: Array[Byte]): Array[Byte] = {
    val channels = 1L + id % 2
    val rate = 8000L + (id % 5) * 4000L
    val bits = 16L
    val samples = payload.length.toLong // 36-bit field; test payloads fit
    val b = new Array[Byte](4 + 4 + 34 + payload.length)
    "fLaC".getBytes("US-ASCII").copyToArray(b, 0)
    b(4) = 0x80.toByte // is-last=1, block type 0 = STREAMINFO
    b(5) = 0; b(6) = 0; b(7) = 34 // 24-bit BE block length
    // STREAMINFO: min/max block size (16 bits each) = 4096; min/max
    // frame size (24 bits each) = 0 (unknown)
    putBe16(b, 8, 4096); putBe16(b, 10, 4096)
    // bytes 18..25: rate(20) | channels-1(3) | bps-1(5) | samples(36),
    // packed big-endian into 64 bits
    val packed = (rate << 44) | ((channels - 1) << 41) |
      ((bits - 1) << 36) | samples
    (0 until 8).foreach(i => b(18 + i) = ((packed >>> (56 - 8 * i)) & 0xFF).toByte)
    // bytes 26..41: the 16-byte unencoded-audio md5 (zeros = unknown)
    payload.copyToArray(b, 42)
    b
  }

  private def putBe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >>> 8) & 0xFF).toByte; b(i + 1) = (v & 0xFF).toByte
  }

  private[ops] final case class FlacInfo(channels: Long, rate: Long,
                                         bits: Long, samples: Long)

  /** FLAC STREAMINFO walk, or None if the bytes are not a FLAC stream.
    * Walks the metadata-block chain (1-bit is-last, 7-bit type, 24-bit
    * BE length) to the STREAMINFO block rather than assuming it first;
    * every advance is clamped to the buffer, and a declared block that
    * overruns it aborts the walk — the [[parseWav]] robustness stance.
    * Rejects a zero sample rate (forbidden by the spec) so downstream
    * duration math can never divide by zero. */
  private[ops] def parseFlac(b: Array[Byte]): Option[FlacInfo] = {
    if (b.length < 8 || new String(b.slice(0, 4), "US-ASCII") != "fLaC")
      return None
    var i = 4
    while (i + 4 <= b.length) {
      val isLast = (u8(b(i)) & 0x80) != 0
      val btype = u8(b(i)) & 0x7F
      val len = ((u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))).toLong
      val body = i + 4
      if (body + len > b.length) return None // declared block overruns
      if (btype == 0 && len >= 34) {
        var packed = 0L
        (0 until 8).foreach(j => packed = (packed << 8) | u8(b(body + 10 + j)))
        val rate = packed >>> 44
        val channels = ((packed >>> 41) & 0x7L) + 1
        val bits = ((packed >>> 36) & 0x1FL) + 1
        val samples = packed & 0xFFFFFFFFFL
        return if (rate == 0) None else Some(FlacInfo(channels, rate, bits, samples))
      }
      if (isLast) return None // chain ended without STREAMINFO
      i = body + len.toInt
    }
    None
  }

  // MPEG-1 Layer III tables (header indices → kbps / Hz)
  private val Mp3Bitrates =
    Array(32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L, 128L, 160L, 192L, 224L, 256L, 320L)
  private val Mp3Rates = Array(44100L, 48000L, 32000L)

  /** Deterministic MPEG-1 Layer III stream: one valid 4-byte frame
    * header (sync + version/layer bits, TABLE-DRIVEN bitrate and
    * sample-rate indices derived from the id, channel mode id%4), then
    * the payload as opaque frame data — the third audio container, and
    * the first whose parse is index-table lookup rather than field
    * arithmetic. */
  def synthMp3(id: Long, payload: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](4 + payload.length)
    b(0) = 0xFF.toByte
    b(1) = 0xFB.toByte // sync + MPEG-1 + Layer III + no CRC
    val bitrateIdx = (1 + id % 14).toInt // 1..14 — 0 is "free", 15 invalid
    val rateIdx = (id % 3).toInt // 0..2 — 3 is reserved
    b(2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
    b(3) = ((id % 4) << 6).toByte // channel mode; mode 3 = mono
    payload.copyToArray(b, 4)
    b
  }

  private[ops] final case class Mp3Info(kbps: Long, rate: Long, channels: Long)

  /** MPEG-1 Layer III frame-header parse, or None when the bytes carry
    * no valid header: 11-bit sync, MPEG-1 version (11), Layer III (01),
    * and table-valid bitrate/sample-rate indices ("free" 0 and the two
    * reserved values reject — a duration computed from a free-format
    * bitrate would be a guess, and this module never reports guessed
    * metadata). */
  private[ops] def parseMp3(b: Array[Byte]): Option[Mp3Info] = {
    if (b.length < 4 || u8(b(0)) != 0xFF || (u8(b(1)) & 0xE0) != 0xE0)
      return None
    val version = (u8(b(1)) >> 3) & 0x3
    val layer = (u8(b(1)) >> 1) & 0x3
    if (version != 3 || layer != 1) return None // MPEG-1, Layer III only
    val bitrateIdx = (u8(b(2)) >> 4) & 0xF
    val rateIdx = (u8(b(2)) >> 2) & 0x3
    if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
    val mode = (u8(b(3)) >> 6) & 0x3
    Some(Mp3Info(Mp3Bitrates(bitrateIdx - 1), Mp3Rates(rateIdx),
      if (mode == 3) 1L else 2L))
  }

  /** Partition-parallel audio metadata extraction over WAV and FLAC
    * containers. Only PCM WAV (format tag 1) with a sane byte rate is
    * reported as "wav" — a non-PCM or corrupt fmt chunk would make any
    * duration derived from rate·channels·bits wrong, so such payloads
    * fall to "unknown" with zeroed fields instead of carrying
    * plausible-looking garbage; FLAC duration is floor milliseconds
    * from STREAMINFO's total-samples over its sample rate. */
  def extractAudioMeta(df: DataFrame, id: String = "doc_id",
                       bin: String = "media"): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), col(bin)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (i, b) =>
        parseWav(b) match {
          case Some(f) if f.tag == 1L && f.byteRate > 0 =>
            AudioMeta(i, b.length.toLong, f.channels, f.rate, f.bits,
              f.dataLen * 1000L / f.byteRate, "wav")
          case _ => parseFlac(b) match {
            case Some(f) =>
              AudioMeta(i, b.length.toLong, f.channels, f.rate, f.bits,
                f.samples * 1000L / f.rate, "flac")
            // mp3 last: its 11-bit sync is the weakest magic of the
            // three (0xFF is invalid UTF-8 though, so text payloads
            // can never collide). bits = 0 — not a PCM notion;
            // duration is the CBR estimate total_bits / bitrate
            case None => parseMp3(b) match {
              case Some(m) =>
                AudioMeta(i, b.length.toLong, m.channels, m.rate, 0L,
                  b.length.toLong * 8L / m.kbps, "mp3")
              case None =>
                AudioMeta(i, b.length.toLong, 0L, 0L, 0L, 0L, "unknown")
            }
          }
        }
      })
  }
}
