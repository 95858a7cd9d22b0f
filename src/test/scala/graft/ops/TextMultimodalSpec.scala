package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: chars, tokens, avg token length") {
    val df = Seq((1L, "ab cd efg")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenStats(df)
      .select("n_chars_calc", "n_tokens", "avg_token_len").rows.head
    out(0) shouldBe 9L
    out(1) shouldBe 3L
    out(2).asInstanceOf[Double] shouldBe 7.0 / 3.0 +- 1e-12
  }

  test("qualityScore: bounded in [0,1]; richer text scores higher than repetition") {
    val df = Seq(
      (1L, "the cat and the dog ran to the house in a field as it rained"),
      (2L, "spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.qualityScore(df).orderBy("doc_id")
      .select("quality_score").rows.map(_.head.asInstanceOf[Double])
    all(s) should (be >= 0.0 and be <= 1.0)
    s(0) should be > s(1)
  }

  test("repetitionScore: hand-computed dup-token and top-2-gram fractions") {
    val df = Seq(
      (1L, "a b a b a"),   // toks 5, distinct 2; grams: "a b"×2, "b a"×2 → 2/4
      (2L, "x y z w"),     // all distinct; each gram once → 1/3
      (3L, "solo")         // 1 token: no grams → 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(df).orderBy("doc_id")
      .select("dup_token_frac", "top_2gram_frac").rows
      .map(r => (r(0).asInstanceOf[Double], r(1).asInstanceOf[Double]))
    out(0)._1 shouldBe (1.0 - 2.0 / 5.0) +- 1e-12
    out(0)._2 shouldBe 0.5 +- 1e-12
    out(1)._1 shouldBe 0.0 +- 1e-12
    out(1)._2 shouldBe (1.0 / 3.0) +- 1e-12
    out(2) shouldBe ((0.0, 0.0))
  }

  test("chunk: empty text yields exactly one empty chunk (no row loss)") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, size = 4, stride = 2).rows
    out shouldBe Seq(Seq(1L, 0L, ""))
  }

  test("chunk: strided windows cover every token; short docs yield one chunk") {
    val df = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val overlapped = TextAnalysis.chunk(df, size = 2, stride = 1)
      .orderBy("doc_id", "chunk_idx").select("chunk_text").rows.map(_.head)
    overlapped shouldBe Seq("a b", "b c", "c d", "d e", "x")
    val tiled = TextAnalysis.chunk(df, size = 2, stride = 2)
      .orderBy("doc_id", "chunk_idx").select("chunk_text").rows.map(_.head)
    tiled shouldBe Seq("a b", "c d", "e", "x")
  }

  test("langId: stopword voting picks the right language") {
    val df = Seq(
      (1L, "the cat is in the house and it is big"),
      (2L, "le chat est dans la maison et les oiseaux"),
      (3L, "el gato es de la casa y los pajaros")
    ).toDF("doc_id", "text")
    TextAnalysis.langId(df).orderBy("doc_id").select("lang_pred").rows.map(_.head) shouldBe
      Seq("en", "fr", "es")
  }

  test("chunk + langId consensus flags a half-en/half-fr paste as mixed") {
    import org.apache.spark.sql.functions._
    // 64 en tokens then 64 fr tokens: chunk(64, 48) isolates at least
    // one pure-en and one pure-fr window, so the chunk langs disagree
    // even though the DOC-level vote (en ties broken first) says 'en'
    val en = Seq.fill(8)("the cat is in a house and it").mkString(" ")
    val fr = Seq.fill(8)("le chat est dans la maison et les").mkString(" ")
    val df = Seq((1L, s"$en $fr"), (2L, en)).toDF("doc_id", "text")
    val scored = TextAnalysis.langId(
      TextAnalysis.chunk(df, size = 64, stride = 48),
      text = "chunk_text", out = "chunk_lang")
    val langs = scored.groupBy(col("doc_id"))
      .agg(count_distinct(col("chunk_lang")).as("n_langs"))
      .orderBy(col("doc_id")).rows.map(_(1))
    langs shouldBe Seq(2L, 1L) // doc 1 mixed, doc 2 pure
    // the doc-level langId alone would have called doc 1 a single lang
    TextAnalysis.langId(df).filter(col("doc_id") === 1L)
      .select("lang_pred").rows.head.head shouldBe "en"
  }

  test("fingerprint: formatting-insensitive canonical hash") {
    val df = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "different")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df).orderBy("doc_id")
      .select("fingerprint").rows.map(_.head)
    fp(0) shouldBe fp(1)
    fp(0) should not be fp(2)
  }

  test("multimodal: binary payload round-trips; stub decode is deterministic") {
    val df = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.withBinaryPayload(df)).collect()
    meta.length shouldBe 1
    meta.head.n_bytes shouldBe 6L
    meta.head.format shouldBe "png"       // 6 % 3 == 0
    meta.head.width shouldBe 7L           // 6 % 640 + 1
  }

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)

  private val png640x480: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0)

  // SOI, APP0 (JFIF), SOF0 with height 480 / width 640
  private val jpeg640x480: Array[Byte] =
    Array(0xFF, 0xD8).map(_.toByte) ++
      (Array(0xFF, 0xE0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++ Array.fill[Byte](10)(0)) ++
      (Array(0xFF, 0xC0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(480) ++ be16(640) ++ Array.fill[Byte](10)(0))

  test("decodeMeta parses real PNG / JPEG / progressive JPEG / GIF headers") {
    val png = Multimodal.decodeMeta(1L, png640x480)
    (png.format, png.width, png.height, png.n_bytes) shouldBe
      ("png", 640L, 480L, png640x480.length.toLong)

    val jpg = Multimodal.decodeMeta(2L, jpeg640x480)
    (jpg.format, jpg.width, jpg.height) shouldBe ("jpeg", 640L, 480L)

    // progressive JPEG: SOF2 (0xC2) instead of SOF0
    val prog = jpeg640x480.clone()
    prog(jpeg640x480.indexOfSlice(Array(0xFF.toByte, 0xC0.toByte)) + 1) = 0xC2.toByte
    val p = Multimodal.decodeMeta(3L, prog)
    (p.format, p.width, p.height) shouldBe ("jpeg", 640L, 480L)

    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xC8.toByte, 0x00, 0, 0, 0, 0)
    val g = Multimodal.decodeMeta(4L, gif)
    (g.format, g.width, g.height) shouldBe ("gif", 320L, 200L)

    // non-media payload falls back to the deterministic stub
    val txt = Multimodal.decodeMeta(5L, "abcdef".getBytes("UTF-8"))
    (txt.format, txt.width) shouldBe ("png", 7L)
  }

  test("extractMeta decodes real media payloads through the Spark plumbing") {
    val df = Seq((1L, png640x480), (2L, jpeg640x480))
      .toDF("doc_id", "media")
    val out = Multimodal.extractMeta(df).collect().sortBy(_.doc_id)
    out.map(m => (m.doc_id, m.format, m.width, m.height)).toSeq shouldBe
      Seq((1L, "png", 640L, 480L), (2L, "jpeg", 640L, 480L))
  }

  test("multimodal sampleFrames: 1 row → strided frame rows") {
    val df = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.withBinaryPayload(df),
      frameSize = 16, stride = 4)
    // 100 bytes → 7 chunks (idx 0..6), stride 4 keeps idx 0 and 4
    frames.select("frame_idx").rows.map(_.head) should contain theSameElementsAs Seq(0L, 4L)
  }

  /** Minimal RIFF/AVI: header + 'movi' LIST holding video ('00dc'/'00db'),
    * audio ('01wb', skipped), odd-size padding, and a nested 'rec ' LIST. */
  private def craftedAvi: Array[Byte] = {
    def cc(s: String) = s.getBytes("US-ASCII")
    def le(n: Int) = Array[Byte]((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
      ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    def chunk(tag: String, data: Array[Byte]) =
      cc(tag) ++ le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val rec = cc("rec ") ++ chunk("00dc", cc("CC"))
    val movi = cc("movi") ++
      chunk("00dc", cc("AAAA")) ++    // video frame 0
      chunk("01wb", cc("ZZ")) ++      // audio — skipped
      chunk("00db", cc("BBB")) ++     // video frame 1, odd size → padded
      chunk("LIST", rec)              // video frame 2, nested in rec LIST
    val body = chunk("LIST", movi) ++ chunk("idx1", cc("XXXXXXXX"))
    cc("RIFF") ++ le(4 + body.length) ++ cc("AVI ") ++ body
  }

  test("parseAviFrames walks the real RIFF chunk index") {
    val frames = Multimodal.parseAviFrames(craftedAvi).get
    frames.map(new String(_, "US-ASCII")) shouldBe Vector("AAAA", "BBB", "CC")
    // non-AVI payloads are rejected, not mis-parsed
    Multimodal.parseAviFrames("RIFFxxxxWAVE".getBytes("US-ASCII")) shouldBe None
    Multimodal.parseAviFrames("plain text".getBytes("UTF-8")) shouldBe None
    // truncated file: sizes clamp, no crash, partial frame recovered
    val cut = craftedAvi.take(30)
    Multimodal.parseAviFrames(cut).get.length should be <= 1
    // adversarial chunk size >= 2^31: the u32 must clamp to the buffer
    // before narrowing to Int, not overflow negative and crash the walk
    val evil = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F) ++
      "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++
      Array[Byte](0x10, 0x00, 0x00, 0x80.toByte) ++   // size 0x80000010
      "movi".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0x41)
    noException should be thrownBy Multimodal.parseAviFrames(evil)
  }

  test("sampleFrames splits AVI payloads on container frames, others by slicing") {
    val df = Seq((1L, craftedAvi), (2L, ("x" * 40).getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val out = Multimodal.sampleFrames(df, frameSize = 16, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "US-ASCII"))).sortBy(t => (t._1, t._2))
    // doc 1: AVI frames 0,1,2 → stride 2 keeps 0 ("AAAA") and 2 ("CC");
    // doc 2: 40 bytes → slices 0,1,2 → stride 2 keeps 0 and 2 (8 bytes)
    out.toSeq shouldBe Seq((1L, 0L, "AAAA"), (1L, 2L, "CC"),
      (2L, 0L, "x" * 16), (2L, 2L, "x" * 8))
  }

  test("parseGif accepts no-GCT GIFs and still rejects GIF-prefixed text") {
    // no global color table: packed 0x70 (printable 'p'), bg=0, aspect=0
    val noGct = "GIF87a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xC8.toByte, 0x00, 0x70, 0, 0, 0)
    Multimodal.parseGif(noGct) shouldBe Some((320L, 200L, "gif"))
    // a printable-text payload starting "GIF87a" must fall to the stub:
    // bytes 11/12 of real text are never both NUL
    val txt = "GIF87a glorious interchange format".getBytes("US-ASCII")
    Multimodal.parseGif(txt) shouldBe None
    // GCT flag set (the common case) always passes
    val gct = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xC8.toByte, 0x00, 0xF7.toByte, 5, 1, 0)
    Multimodal.parseGif(gct) shouldBe Some((320L, 200L, "gif"))
  }

  test("frameDHash: shifted and requantized frames stay within Hamming 3; noise does not") {
    // a smooth ramp-ish "image row" of 64 bytes
    val base = Array.tabulate(64)(i => (40 + i * 3 % 180).toByte)
    val h0 = Multimodal.frameDHash(base, 32)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one-byte shift (the frame md5 canonical miss): cell averages move
    // by at most one byte's worth — the gradient signs barely change
    val shifted = (base.last +: base.init.toSeq).toArray
    ham(h0, Multimodal.frameDHash(shifted, 32)) should be <= 3
    // monotone requantize (halve every level): order of cell means is
    // preserved, so the hash is IDENTICAL
    val requant = base.map(b => ((b & 0xFF) / 2).toByte)
    Multimodal.frameDHash(requant, 32) shouldBe h0
    // an unrelated pattern lands far away
    val other = Array.tabulate(64)(i => (((i * 37) % 256) ^ 0x5A).toByte)
    ham(h0, Multimodal.frameDHash(other, 32)) should be > 3
    // degenerate lengths stay total and deterministic
    Multimodal.frameDHash(Array.emptyByteArray, 32) shouldBe 0L
    Multimodal.frameDHash(Array[Byte](7), 32) shouldBe 0L // constant frame: no gradients
  }

  test("sceneCuts: a cut lands only where consecutive signatures diverge") {
    // frames 0,1 constant (dhash 0 — no gradients), frame 2 an
    // ascending ramp (every gradient positive → all 32 bits set):
    // the only cut is at frame 2, Hamming 32. A shifted near-copy at
    // frame 3 stays within 3 bits of the ramp — below the threshold.
    val flat = Array.fill[Byte](64)(50)
    val ramp = Array.tabulate(64)(i => (i * 4).toByte)
    val shifted = (ramp.last +: ramp.init.toSeq).toArray
    val frames = Seq(
      (1L, 0L, flat), (1L, 1L, flat), (1L, 2L, ramp), (1L, 3L, shifted)
    ).toDF("doc_id", "frame_idx", "frame_bytes")
    val out = Multimodal.sceneCuts(frames, minBits = 8)
      .rows.map(r => (r.head, r(1), r(2)))
    out shouldBe Seq((1L, 2L, 32L))
  }

  test("framePerceptualNearDup pairs shifted frames md5 dedup misses; observer stays empty") {
    val base = Array.tabulate(64)(i => (40 + i * 3 % 180).toByte)
    val shifted = (base.last +: base.init.toSeq).toArray
    val other = Array.tabulate(64)(i => (((i * 37) % 256) ^ 0x5A).toByte)
    val frames = Seq((1L, 0L, base), (2L, 0L, shifted), (3L, 0L, other))
      .toDF("doc_id", "frame_idx", "frame_bytes")
    val pairs = Multimodal.framePerceptualNearDup(frames)
      .select("doc_id_a", "doc_id_b").rows.map(r => (r.head, r(1)))
    pairs shouldBe Seq((1L, 2L)) // base↔shifted only; `other` pairs with neither
    // exact-dedup would NOT have caught it: the bytes differ
    base.sameElements(shifted) shouldBe false
    Multimodal.frameDHashDroppedBuckets(frames).rows shouldBe empty
  }

  test("pmiCollocations: document-frequency PMI, support filter, repeats in a doc count once") {
    val docs = Seq((1L, "a b"), (2L, "a b b b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    // df: a=3 b=3 c=2; pair doc-freqs: (a,b)=2 (a,c)=1 (b,c)=1; N=4
    val out = TextAnalysis.pmiCollocations(docs, maxVocab = 10, minSupport = 2L)
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4), r(5).asInstanceOf[Float]))
    out should have size 1
    val (a, b, dfa, dfb, dfab, pmi) = out.head
    (a, b, dfa, dfb, dfab) shouldBe ("a", "b", 3L, 3L, 2L)
    pmi shouldBe math.log(2.0 * 4 / (3.0 * 3)).toFloat +- 1e-7f
  }

  test("rakeKeywords: stopword split, deg/freq word scores, decimal phrase ranking") {
    // df: x=3, a=2, b=2, c=2 → top-1 stopword is x. Doc 1 phrases:
    // "a b" (len 2) and "c" (len 1); scores a=b=deg2/freq1=2, c=1 →
    // phrase scores 4 and 1
    val docs = Seq((1L, "x a b x c"), (2L, "x a b"), (3L, "x c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(docs, nStopwords = 1, k = 3)
      .orderBy("doc_id", "rank")
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      (1L, "a b", 4.0, 1L, 1L), (1L, "c", 1.0, 1L, 2L),
      (2L, "a b", 4.0, 1L, 1L),
      (3L, "c", 1.0, 1L, 1L))
  }

  test("rakeKeywords: repeated phrase folds to one row with its occurrence count") {
    // "a b" twice in one doc: a and b each have freq 2, deg 4 → word
    // scores still 2, phrase score 4, n_occurrences 2; an all-stopword
    // doc emits nothing
    val docs = Seq((1L, "x a b x a b"), (2L, "x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(docs, nStopwords = 1, k = 3)
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4)))
    out shouldBe Seq((1L, "a b", 4.0, 2L, 1L))
  }

  test("zipfFit: an exact 1/r frequency law fits slope −1, intercept ln C") {
    // freqs 12, 6, 4, 3 = 12/r for ranks 1..4 → ln f = ln 12 − 1·ln r
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text"),
      topN = 100).rows.head
    out.head shouldBe 4L
    out(1).asInstanceOf[Float] shouldBe -1.0f +- 1e-5f
    out(2).asInstanceOf[Float] shouldBe math.log(12.0).toFloat +- 1e-5f
  }

  test("normalize folds accents, strips punctuation, collapses whitespace") {
    val df = Seq(
      (1L, "  Héllo,   Wörld! Ça va très bien — naïve façade №9  "),
      (2L, "ŠKODA žluťoučký")).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df).select("text_norm").rows.map(_.head)
    out.head shouldBe "hello world ca va tres bien naive facade 9"
    // š/ž fold; unmapped accents (ť, ů) are stripped by the [^a-z0-9 ]
    // pass, never silently deleted mid-word by translate
    out(1) shouldBe "skoda zluouky"
  }

  test("WAV synth/parse round-trips the fmt parameters exactly") {
    val payload = "0123456789abcdef".getBytes("US-ASCII") // 16 bytes
    // id=1: channels 2, rate 12000; id=0: channels 1, rate 8000
    Multimodal.parseWav(Multimodal.synthWav(1L, payload)) shouldBe
      Some(Multimodal.WavFmt(1L, 2L, 12000L, 48000L, 16L, 16L))
    Multimodal.parseWav(Multimodal.synthWav(0L, Array.empty[Byte])) shouldBe
      Some(Multimodal.WavFmt(1L, 1L, 8000L, 16000L, 16L, 0L))
    // odd payload: a zero pad byte closes the data chunk (RIFF word
    // alignment) — inside the RIFF extent, outside the declared size
    val odd = Multimodal.synthWav(0L, Array[Byte](7))
    odd.length shouldBe 46 // 44 header + 1 payload + 1 pad
    odd.last shouldBe 0.toByte
    val riffSize = (odd(4) & 0xFF) | ((odd(5) & 0xFF) << 8) |
      ((odd(6) & 0xFF) << 16) | ((odd(7) & 0xFF) << 24)
    8 + riffSize shouldBe odd.length // extent includes the pad
    Multimodal.parseWav(odd).map(_.dataLen) shouldBe Some(1L)
  }

  test("unigramLogProbAgainst: add-1 smoothing, OOV tokens score the unseen slot") {
    // model corpus tokens {a a b}: V = 2, total = 3, denom = 3+2+1 = 6
    // p(a) = (2+1)/6 = 1/2, p(b) = (1+1)/6 = 1/3, p(OOV) = 1/6
    val model = Seq((100L, "a a b")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a c"),      // ln(1/2) + ln(1/6) over 2 tokens
      (2L, "b b")).toDF("doc_id", "text")
    val out = Vocab.unigramLogProbAgainst(score, model)
      .orderBy("doc_id").rows
    out.head(1) shouldBe 2L
    out.head(2).asInstanceOf[Float].toDouble shouldBe
      ((math.log(0.5) + math.log(1.0 / 6)) / 2) +- 1e-6
    out(1)(2).asInstanceOf[Float].toDouble shouldBe math.log(1.0 / 3) +- 1e-6
    // self-scoring against the same corpus needs no smoothing and must
    // NOT equal the smoothed score (the +1 mass shifts every p)
    val self = Vocab.unigramLogProb(model).rows.head(2).asInstanceOf[Float]
    val smoothedSelf = Vocab.unigramLogProbAgainst(model, model)
      .rows.head(2).asInstanceOf[Float]
    self should not equal smoothedSelf
  }

  test("WAV walk: odd-chunk padding honored, RIFF extent clamps the walk") {
    // an odd-sized LIST chunk BEFORE fmt: only a correctly padded walk
    // lands on the fmt fourcc afterward
    val wav = Multimodal.synthWav(2L, Array[Byte](1, 2, 3))
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0) // 3+pad
    val withList = wav.take(12) ++ list ++ wav.drop(12)
    // patch the RIFF size for the inserted 12 bytes
    withList(4) = ((Multimodal.synthWav(2L, Array[Byte](1, 2, 3)).length - 8 + 12) & 0xFF).toByte
    Multimodal.parseWav(withList).map(f => (f.channels, f.rate, f.dataLen)) shouldBe
      Some((1L, 16000L, 3L))
    // trailing garbage past the declared RIFF extent is never read as a
    // chunk: a fake 'data' fourcc outside the container stays invisible
    val truncated = wav.clone()
    putRiffSize(truncated, 36 - 8) // container covers the header only...
    val garbage = truncated ++ Array[Byte]('d', 'a', 't', 'a', 8, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)
    Multimodal.parseWav(garbage) shouldBe None // fmt found, data outside extent
  }

  private def putRiffSize(b: Array[Byte], v: Int): Unit = {
    b(4) = (v & 0xFF).toByte; b(5) = ((v >> 8) & 0xFF).toByte
    b(6) = ((v >> 16) & 0xFF).toByte; b(7) = ((v >> 24) & 0xFF).toByte
  }

  test("extractAudioMeta: duration math and unknown-payload fallback") {
    val wavs = Seq(
      (1L, Multimodal.synthWav(1L, new Array[Byte](48000))), // 2ch·12kHz·16bit → 1s
      (2L, "not audio at all".getBytes("UTF-8"))
    ).toDF("doc_id", "media")
    val out = Multimodal.extractAudioMeta(wavs).toDF()
      .orderBy("doc_id").rows.map(r => (r(0), r(2), r(3), r(5), r(6)))
    out.head shouldBe ((1L, 2L, 12000L, 1000L, "wav"))
    out(1) shouldBe ((2L, 0L, 0L, 0L, "unknown"))
  }

  test("FLAC synth/parse round-trips STREAMINFO exactly") {
    // id=1: channels 2, rate 12000; samples = payload length
    Multimodal.parseFlac(Multimodal.synthFlac(1L, new Array[Byte](24000))) shouldBe
      Some(Multimodal.FlacInfo(2L, 12000L, 16L, 24000L))
    Multimodal.parseFlac(Multimodal.synthFlac(0L, Array.empty[Byte])) shouldBe
      Some(Multimodal.FlacInfo(1L, 8000L, 16L, 0L))
    // non-FLAC payloads and truncated streams reject cleanly
    Multimodal.parseFlac("fLaC".getBytes("US-ASCII")) shouldBe None
    Multimodal.parseFlac("not a flac stream".getBytes("UTF-8")) shouldBe None
    // a declared block length overrunning the buffer aborts the walk
    val torn = Multimodal.synthFlac(1L, new Array[Byte](10)).take(20)
    Multimodal.parseFlac(torn) shouldBe None
  }

  test("MP3 header: table lookups round-trip, invalid indices reject") {
    // id=5: bitrate idx 1+5%14=6 → 80 kbps, rate idx 5%3=2 → 32000,
    // mode 5%4=1 (joint stereo) → 2 channels
    Multimodal.parseMp3(Multimodal.synthMp3(5L, new Array[Byte](100))) shouldBe
      Some(Multimodal.Mp3Info(80L, 32000L, 2L))
    // id=3: mode 3 → mono
    Multimodal.parseMp3(Multimodal.synthMp3(3L, Array.empty[Byte])) shouldBe
      Some(Multimodal.Mp3Info(56L, 44100L, 1L))
    Multimodal.parseMp3("text never syncs".getBytes("UTF-8")) shouldBe None
    // free-format bitrate (idx 0) and reserved sample rate (idx 3) reject
    val free = Multimodal.synthMp3(1L, Array.empty[Byte])
    free(2) = 0x00.toByte // bitrate idx 0, rate idx 0
    Multimodal.parseMp3(free) shouldBe None
    val badRate = Multimodal.synthMp3(1L, Array.empty[Byte])
    badRate(2) = (badRate(2) | 0x0C).toByte // rate idx 3 (reserved)
    Multimodal.parseMp3(badRate) shouldBe None
    // MPEG-2 version bits reject (this parser is MPEG-1-only by design)
    val v2 = Multimodal.synthMp3(1L, Array.empty[Byte])
    v2(1) = 0xF3.toByte // version bits 10 = MPEG-2
    Multimodal.parseMp3(v2) shouldBe None
  }

  test("FLAC STREAMINFO found behind a leading padding block") {
    // real encoders often emit PADDING/VORBIS_COMMENT blocks around
    // STREAMINFO; the walk must follow the chain, not assume offset 8
    val flac = Multimodal.synthFlac(3L, Array[Byte](1, 2, 3, 4))
    val pad = Array[Byte](0x01, 0, 0, 2, 0, 0) // type 1 PADDING, len 2
    val streaminfo = flac.slice(4, 4 + 4 + 34)
    val moved = "fLaC".getBytes("US-ASCII") ++ pad ++ streaminfo ++ flac.drop(42)
    Multimodal.parseFlac(moved) shouldBe
      Some(Multimodal.FlacInfo(2L, 20000L, 16L, 4L))
    // extractAudioMeta surfaces flac rows next to wav and unknown
    val mixed = Seq(
      (1L, Multimodal.synthFlac(1L, new Array[Byte](12000))),
      (2L, Multimodal.synthWav(0L, new Array[Byte](16000)))
    ).toDF("doc_id", "media")
    val out = Multimodal.extractAudioMeta(mixed).toDF()
      .orderBy("doc_id").rows.map(r => (r(0), r(3), r(5), r(6)))
    out.head shouldBe ((1L, 12000L, 1000L, "flac"))
    out(1) shouldBe ((2L, 8000L, 1000L, "wav"))
  }
}
