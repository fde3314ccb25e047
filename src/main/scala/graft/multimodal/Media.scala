package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata riding
  * alongside — the 100 TB layout is parquet with the binary column *last*
  * (so metadata-only queries never touch the blob pages) and rows
  * size-bounded per file via `maxRecordsPerFile`.
  *
  * Decode / feature-extraction runs as a partition-mapped batch job
  * (`Dataset.mapPartitions` — the Scala analog of PySpark's
  * `mapInPandas`): one decoder init per partition, rows streamed through
  * it, output Arrow-friendly fixed-width features. IMAGE decode is REAL:
  * payloads whose magic marks them as PNG/JPEG/GIF/BMP get header-only
  * dimension extraction and full decode+rescale via JDK `javax.imageio`
  * ([[Media.imageDimensions]]/[[Media.resizeImage]] — no external jars).
  * ([[Media.imageMeta]] additionally reports true frame counts for
  * animated GIFs). AUDIO decode is REAL for WAV: payloads with the
  * RIFF/WAVE magic get header-only sample-rate/channels/frame-count
  * extraction via JDK `javax.sound.sampled` ([[Media.audioMeta]]).
  * VIDEO container metadata is REAL for MP4 (ISO-BMFF box walk: tkhd
  * dims, stsz frame count, mvhd duration, trak count) and AVI (RIFF
  * hdrl/avih header) — pure-JDK byte parsing, no codec needed
  * ([[Media.videoInfo]]). The IMAGE feature embedding is REAL and
  * content-derived: a 64-dim block-mean-color + low-frequency-DCT
  * descriptor from the decoded pixels ([[Media.imageEmbedding]] — the
  * classical perceptual-hash family), feeding the existing ANN
  * operators. VIDEO frame decode is REAL for intra-coded AVI (MPNG /
  * MJPEG: each `00dc` chunk is a complete PNG/JPEG bytestream
  * `javax.imageio` decodes — [[Media.extractAviFrames]]), and the
  * VIDEO embedding is the frame-sampled average of the image
  * descriptor ([[Media.videoEmbedding]] — classical keyframe
  * pooling). Only CODEC-COMPRESSED video (H.264 etc. — no JDK
  * decoder) and model-based learned embeddings remain STUBBED behind
  * [[Media.decodeStub]], a deterministic fake keyed on the payload
  * bytes, so the Spark-side contract (schema, batching, partitioning,
  * null handling) is real and tested while those codecs stay
  * swappable. */
object Media {

  /** A media row: opaque payload + typed metadata. */
  case class MediaFile(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta_source: String)

  /** Extracted features: fixed-width, Arrow/parquet friendly. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      sha256: String,
      width: Int, // image/video px; audio: sample rate
      height: Int, // image/video px; audio: channels
      n_frames: Int, // video frames / audio windows; image: 1
      features: Array[Float]) // fixed 8-dim embedding stub

  /** Deterministic synthetic media corpus derived from the documents table
    * (payload = utf-8 text bytes; kind round-robins) — stands in for real
    * blobs in tests and benches. */
  def synthesize(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("meta_source"))
      .as[MediaFile]
  }

  /** Deterministic REAL-pixel image corpus: one solid-color 24-bit BMP
    * per document, color keyed on doc_id residues
    * (`r = id%256, g = id·7%256, b = id·13%256`). BMP is lossless, so
    * decode returns the exact channels — and a solid image's
    * [[imageEmbedding]] has a CLOSED FORM (block means = channel/255,
    * DC = Rec.601 luma, AC = 0), which is what lets the
    * `media_embedding` query hash-check the full decode → descriptor
    * path against an engine that never decodes a pixel. */
  def synthesizeImages(docs: DataFrame, w: Int = 48, h: Int = 36): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          MediaFile(id, "image",
            solidBmp(w, h, (id % 256).toInt, (id * 7 % 256).toInt,
              (id * 13 % 256).toInt), src)
        }
      }
  }

  /** [[synthesizeImages]]' colors encoded through ImageIO's PNG writer
    * instead of the raw BMP template. PNG is lossless, so decode
    * returns the same exact channels and the solid-color descriptor
    * closed form carries over UNCHANGED — which is what lets one query
    * pin that the content descriptor is FORMAT-INDEPENDENT: the
    * magic-dispatch, the PNG decoder, and the descriptor must agree
    * with the BMP route value-for-value. (The PNG encoder costs ~10×
    * the BMP template per image — fine for coverage at corpus-bench
    * scale, and exactly why [[synthesizeImages]] keeps BMP as the
    * volume fixture.) */
  def synthesizePngs(docs: DataFrame, w: Int = 48, h: Int = 36): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          MediaFile(id, "image",
            solidPng(w, h, (id % 256).toInt, (id * 7 % 256).toInt,
              (id * 13 % 256).toInt), src)
        }
      }
  }

  private def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    val row = Array.fill(w)(rgb)
    var y = 0
    while (y < h) { img.setRGB(0, y, w, 1, row, 0, w); y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Like [[synthesizeImages]] but colors repeat on a `nColors`-cycle of
    * doc_id — so the corpus contains deliberate exact-duplicate IMAGES
    * under different ids (same decoded pixels ⇒ identical content
    * descriptors), the fixture an image near-dup pipeline needs. The
    * color table walks distinct RGB directions (`r` rising, `g`
    * falling, `b` scrambled) so different color groups stay measurably
    * apart in cosine — no two groups are scalar multiples. */
  def synthesizeImageGroups(docs: DataFrame, nColors: Int = 23,
      w: Int = 48, h: Int = 36): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          val k = (id % nColors).toInt
          MediaFile(id, "image",
            solidBmp(w, h, 40 + k * 9, 255 - k * 10, 30 + (k * 37) % 200),
            src)
        }
      }
  }

  /** Deterministic REAL-sample audio corpus: one PCM16 mono WAV per
    * document, a blockwise square wave whose per-block amplitude and
    * global half-period are closed-form functions of `doc_id` — so the
    * [[audioEmbedding]] descriptor of every payload is predictable
    * arithmetic (block mean-|x| = `A(id,b)/32768`, block ZCR =
    * `(256/H − 1)/255`), the audio analog of [[synthesizeImages]]'
    * solid-color BMPs. WAV is lossless PCM, so the decode returns the
    * exact samples the writer emitted. */
  def synthesizeWavs(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) => MediaFile(id, "audio", squareWav(id), src) }
      }
  }

  /** Like [[synthesizeWavs]] but the wave parameters repeat on an
    * `nGroups`-cycle of doc_id — deliberate exact-duplicate AUDIO under
    * different ids (same samples ⇒ identical descriptors), the fixture an
    * audio near-dup pipeline needs. The per-block amplitude table is a
    * modular scramble of `(group, block)` (not a monotone ramp), so group
    * descriptors point in genuinely different directions: max cross-group
    * cosine ≈ 0.990, comfortably outside a 0.999 verify threshold. */
  def synthesizeWavGroups(docs: DataFrame, nGroups: Int = 23): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          MediaFile(id, "audio", squareWav(id % nGroups), src)
        }
      }
  }

  /** Per-(key, block) square-wave amplitude: `500 + ((37k + 29b + 13kb)
    * mod 89) · 320` ∈ [500, 28660] — closed-form integer arithmetic an
    * external engine replays verbatim (the audio twin of the BMP color
    * residues). */
  private def wavAmp(k: Long, b: Int): Int =
    (500 + (k * 37 + b * 29 + k * b * 13) % 89 * 320).toInt

  /** Half-period in samples: `2^(1 + k mod 4)` ∈ {2,4,8,16} — each divides
    * the 256-sample block, so every block sees exactly `256/H − 1`
    * interior sign flips. */
  private def wavHalfPeriod(k: Long): Int = 1 << (1 + (k % 4).toInt)

  /** PCM16 mono WAV (8 kHz, 2048 samples) of the keyed square wave:
    * sample n in block `b = n/256` is `±A(k,b)`, sign = parity of `n/H`.
    * Canonical 44-byte RIFF header + little-endian samples, built
    * directly from the spec — same no-framework discipline as
    * [[solidBmp]]. */
  private def squareWav(k: Long): Array[Byte] = {
    val n = 2048; val rate = 8000
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + n * 2)
      .put("WAVE".getBytes("ISO-8859-1"))
    buf.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
    buf.put("data".getBytes("ISO-8859-1")).putInt(n * 2)
    val h = wavHalfPeriod(k)
    var i = 0
    while (i < n) {
      val a = wavAmp(k, i / 256)
      buf.putShort((if ((i / h) % 2 == 0) a else -a).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic PDF corpus: one minimal single-tree PDF per document
    * — catalog → root `/Pages` node carrying `/Count` → that many leaf
    * `/Page` objects — with version `1.(4 + id mod 3)` and
    * `1 + id mod 7` pages, so [[pdfInfo]]'s output is closed-form
    * arithmetic on doc_id. Uncompressed, unencrypted, no xref games:
    * the layout every PDF producer emits for trivial documents. */
  def synthesizePdfs(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          val minor = 4 + (id % 3).toInt
          val nPages = 1 + (id % 7).toInt
          val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
          val pages = (0 until nPages).map { i =>
            s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
              "/MediaBox [0 0 612 792] >> endobj\n"
          }.mkString
          val body =
            s"%PDF-1.$minor\n" +
              "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
              s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n" +
              pages +
              "trailer << /Root 1 0 R >>\n%%EOF\n"
          MediaFile(id, "document", body.getBytes("ISO-8859-1"), src)
        }
      }
  }

  /** Deterministic REAL-container video corpus: one minimal ISO-BMFF
    * (MP4) file per document — `ftyp` + `moov[mvhd + trak[tkhd +
    * mdia/minf/stbl/stsz]]`, the exact box skeleton [[mp4Info]] walks —
    * with pixel dims, frame count, and duration all closed-form in
    * doc_id (w = 160+16·(id%8), h = 120+8·(id%5), frames = 1+id%300 at
    * 30 fps / timescale 600). The stsz carries a real zeroed size table
    * so `sample_count` is read from where the spec puts it. */
  def synthesizeMp4s(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        def be32(v: Long): Array[Byte] = Array(
          ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
          val body = payload.flatten.toArray
          be32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
        }
        it.map { case (id, src) =>
          val w = 160 + 16 * (id % 8).toInt
          val h = 120 + 8 * (id % 5).toInt
          val frames = 1 + (id % 300).toInt
          val mvhd = { // v0: timescale@12, duration@16 (20 ticks/frame)
            val b = new Array[Byte](100)
            System.arraycopy(be32(600), 0, b, 12, 4)
            System.arraycopy(be32(frames * 20L), 0, b, 16, 4)
            b
          }
          val tkhd = { // v0: 16.16 fixed width/height at 76/80
            val b = new Array[Byte](84)
            System.arraycopy(be32(w.toLong << 16), 0, b, 76, 4)
            System.arraycopy(be32(h.toLong << 16), 0, b, 80, 4)
            b
          }
          val stsz = // version/flags, sample_size=0, count, zeroed table
            new Array[Byte](4) ++ be32(0) ++ be32(frames.toLong) ++
              new Array[Byte](4 * frames)
          val mp4 = box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++
            box("moov",
              box("mvhd", mvhd),
              box("trak",
                box("tkhd", tkhd),
                box("mdia", box("minf", box("stbl", box("stsz", stsz))))))
          MediaFile(id, "video", mp4, src)
        }
      }
  }

  // ---- AVI with intra-coded frames (MPNG / MJPEG) --------------------------

  private def le32b(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** RIFF chunk: fourcc + LE size + data, padded to even length. */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("ISO-8859-1") ++ le32b(data.length.toLong) ++ data ++ pad
  }

  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("ISO-8859-1") ++ children.flatten)

  /** One AVI container holding `frames` intra-coded video frames (each
    * element a complete still-image bytestream — PNG for the MPNG
    * codec, JPEG for MJPEG; both decode per-frame with `javax.imageio`,
    * no inter-frame codec state). Emits the standard RIFF layout the
    * [[aviInfo]] parser and any mainstream demuxer read: LIST hdrl
    * (avih main header + LIST strl with a 'vids' strh and a
    * BITMAPINFOHEADER strf) followed by LIST movi with one `00dc`
    * chunk per frame. */
  private[graft] def buildAvi(w: Int, h: Int, handler: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val usPerFrame = 33333L // ~30 fps
    val avih = le32b(usPerFrame) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(frames.length.toLong) ++ le32b(0) ++ le32b(1) ++ le32b(0) ++
      le32b(w.toLong) ++ le32b(h.toLong) ++ new Array[Byte](16)
    val strh = "vids".getBytes("ISO-8859-1") ++
      handler.getBytes("ISO-8859-1") ++ // fccHandler: "MPNG" | "MJPG"
      le32b(0) ++ le32b(0) ++ // flags, priority+language
      le32b(0) ++ le32b(usPerFrame) ++ le32b(1000000L) ++ // init, scale, rate
      le32b(0) ++ le32b(frames.length.toLong) ++ // start, length
      le32b(0) ++ le32b(0) ++ le32b(0) ++ // suggBuf, quality, sampleSize
      new Array[Byte](8) // rcFrame
    val strf = le32b(40) ++ le32b(w.toLong) ++ le32b(h.toLong) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ // planes, bitcount
      handler.getBytes("ISO-8859-1") ++ // biCompression
      new Array[Byte](20)
    val hdrl = riffList("hdrl", riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh), riffChunk("strf", strf)))
    val movi = riffList("movi",
      frames.map(fb => riffChunk("00dc", fb)): _*)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32b(body.length.toLong) ++ body
  }

  /** Deterministic REAL-frame video corpus: one Motion-PNG AVI per
    * document — `1 + doc_id % 4` solid-color PNG frames whose channels
    * are closed-form functions of `(doc_id, frame)`, inside a real RIFF
    * AVI container ([[buildAvi]]). PNG frames are lossless, so the
    * per-frame decode returns the exact synthesized channels and the
    * [[videoEmbedding]] descriptor of every payload is predictable
    * arithmetic — the video analog of [[synthesizeImages]]' solid BMPs
    * (MJPEG's lossy frames can't make that cross-engine promise; specs
    * pin that path against the MPNG descriptor instead). */
  def synthesizeMpngAvis(docs: DataFrame, w: Int = 48, h: Int = 36): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, src) =>
          val nf = 1 + (id % 4).toInt
          val frames = (0 until nf).map { f =>
            solidPng(w, h, ((id + 17 * f) % 256).toInt,
              ((id * 7 + 29 * f) % 256).toInt,
              ((id * 13 + 41 * f) % 256).toInt)
          }
          MediaFile(id, "video", buildAvi(w, h, "MPNG", frames), src)
        }
      }
  }

  /** REAL frame extraction for intra-coded AVI (MPNG / MJPEG): RIFF
    * walk to LIST movi, one element per `..dc`/`..db` video chunk in
    * stream order (recursing into `rec ` groups). Pure byte arithmetic
    * like the metadata parsers — each returned element is a complete
    * still-image bytestream for [[imageEmbedding]] / `javax.imageio`.
    * `None` when the payload isn't an AVI or has no movi list. */
  def extractAviFrames(payload: Array[Byte]): Option[Vector[Array[Byte]]] =
    try {
      if (!looksLikeAvi(payload)) None
      else {
        val out = Vector.newBuilder[Array[Byte]]
        var found = false
        def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
          var o = start
          while (o + 8 <= end) {
            val id = new String(payload, o, 4, "ISO-8859-1")
            val sz = le32(payload, o + 4)
            if (sz < 0 || sz > end - o - 8) return // malformed → stop
            if (id == "LIST" && sz >= 4) {
              val lt = new String(payload, o + 8, 4, "ISO-8859-1")
              if (lt == "movi") { found = true; walk(o + 12, o + 8 + sz.toInt, true) }
              else if (inMovi && lt == "rec ") walk(o + 12, o + 8 + sz.toInt, true)
            } else if (inMovi && id.length == 4 &&
                Character.isDigit(id.charAt(0)) && Character.isDigit(id.charAt(1)) &&
                (id.endsWith("dc") || id.endsWith("db"))) {
              out += java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + sz.toInt)
            }
            o += 8 + sz.toInt + (sz.toInt & 1)
          }
        }
        walk(12, payload.length, false)
        if (found) Some(out.result()) else None
      }
    } catch { case _: Exception => None }

  /** CONTENT-DERIVED 64-dim video descriptor from the real decoded
    * frame pixels: sample every `frameStride`-th frame of an
    * intra-coded AVI ([[extractAviFrames]]; MPNG or MJPEG — any frame
    * format `javax.imageio` decodes), push each sampled frame through
    * the SAME [[imageEmbedding]] block-mean+DCT descriptor, and average
    * per dimension — the classical keyframe-pooling video signature,
    * reusing the image descriptor's determinism contract wholesale.
    * `None` when the container has no frames or any sampled frame
    * fails to decode (a partially-decodable video is quarantine
    * material, not a silently-averaged-over-fewer-frames row).
    *
    * Determinism: per-dimension accumulation is an explicit
    * left-to-right double sum in frame order and ONE division by the
    * sampled-frame count — on lossless (MPNG) frames every output is
    * bit-reproducible in an external engine from the frame closed
    * forms, which is what lets `media_video_embedding` hash-check a
    * genuinely parsed-and-decoded video pipeline. Codec-compressed
    * payloads (H.264 etc.) have no JDK decoder and stay on the digest
    * stub. */
  def videoEmbedding(payload: Array[Byte],
      frameStride: Int = 2): Option[Array[Float]] = {
    require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")
    extractAviFrames(payload).flatMap { frames =>
      if (frames.isEmpty) None
      else {
        val sampled = frames.indices.by(frameStride).map(frames)
        val embs = sampled.map(imageEmbedding)
        if (embs.exists(_.isEmpty)) None
        else {
          val mats = embs.map(_.get)
          val n = mats.length
          val out = new Array[Float](64)
          var d = 0
          while (d < 64) {
            var acc = 0.0
            var i = 0
            while (i < n) { acc += mats(i)(d).toDouble; i += 1 }
            out(d) = (acc / n).toFloat
            d += 1
          }
          Some(out)
        }
      }
    }
  }

  /** Metadata table for a PDF corpus: `(media_id, pdf_version, n_pages)`
    * via [[pdfInfo]]; rows whose payload doesn't parse are dropped
    * (callers quarantine by anti-join if they need the failures). */
  def pdfMetaTable(files: Dataset[MediaFile]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        pdfInfo(f.payload).map { case (maj, min, n) =>
          (f.media_id, s"$maj.$min", n.toLong)
        }
      }
    }.toDF("media_id", "pdf_version", "n_pages")
  }

  /** 24-bit uncompressed BMP of one solid color, built directly from the
    * spec (14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up
    * BGR rows padded to 4 bytes) — no AWT on the write side. Per-pixel
    * `BufferedImage.setRGB` + an ImageIO writer per row cost ~10× more
    * than the whole downstream decode at corpus scale; here one row
    * template is built and repeated. `ImageIO.read` decodes this layout
    * exactly (lossless), which is what the media_embedding oracle
    * depends on. */
  private def solidBmp(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowLen = (w * 3 + 3) / 4 * 4 // 4-byte-aligned BGR row
    val size = 54 + rowLen * h
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(w).putInt(h) // header size, dims (bottom-up)
      .putShort(1).putShort(24).putInt(0) // planes, bpp, no compression
      .putInt(rowLen * h).putInt(2835).putInt(2835) // image size, 72 dpi
      .putInt(0).putInt(0) // palette: none
    val row = new Array[Byte](rowLen)
    var x = 0
    while (x < w) {
      row(x * 3) = b.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
      x += 1
    }
    var y = 0
    while (y < h) { buf.put(row); y += 1 }
    buf.array()
  }

  /** STUB decoder — deterministic pseudo-decode keyed on payload bytes.
    * Swap for a real codec (javacv / soundlibs) in production; the
    * signature is the contract: bytes in, fixed-width features out. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    decodeFromDigest(kind, MessageDigest.getInstance("SHA-256").digest(payload))

  // real codecs never need a display; keep AWT headless before any
  // ImageIO class initializes
  System.setProperty("java.awt.headless", "true")

  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||          // GIF
      (p(0) == 'B' && p(1) == 'M'))                                          // BMP

  private def looksLikeGif(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'

  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL image metadata including frame count: `(width, height,
    * n_frames)` — `getNumImages(allowSearch = true)` walks the stream, so
    * animated GIFs report their true frame count (PNG/JPEG/BMP report 1).
    * Costlier than [[imageDimensions]] (the walk reads every frame
    * header); use this in feature extraction where n_frames is wanted,
    * and the header-only dims probe in the resize path. */
  def imageMeta(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (!looksLikeImage(payload)) None
    else {
      var iis: javax.imageio.stream.ImageInputStream = null
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          // seekForwardOnly=false so getNumImages may search the stream
          try {
            r.setInput(iis, false)
            Some((r.getWidth(0), r.getHeight(0),
              math.max(1, r.getNumImages(true))))
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally if (iis != null) iis.close()
    }

  private def looksLikeFlac(p: Array[Byte]): Boolean =
    p.length >= 42 &&
      p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C'

  /** FLAC STREAMINFO parse — the mandatory first metadata block right
    * after the `fLaC` magic: sample rate (20 bits), channels (3 bits),
    * and total samples (36 bits) unpacked from the fixed 34-byte layout.
    * Pure byte arithmetic, no decode — the same header-only discipline as
    * the MP4/AVI walks. */
  private def flacInfo(p: Array[Byte]): Option[(Int, Int, Int)] = {
    // metadata block header at 4: 1 byte (last-flag | type), u24 length;
    // STREAMINFO is type 0 and always first per the spec
    if ((p(4) & 0x7f) != 0) return None
    val s = 8 // STREAMINFO payload start
    def u(i: Int): Int = p(s + i) & 0xff
    val rate = (u(10) << 12) | (u(11) << 4) | (u(12) >> 4)
    val channels = ((u(12) >> 1) & 0x7) + 1
    val totalSamples = ((u(13) & 0x0fL) << 32) | (u(14).toLong << 24) |
      (u(15).toLong << 16) | (u(16).toLong << 8) | u(17).toLong
    if (rate <= 0) None
    else Some((rate, channels,
      math.min(totalSamples, Int.MaxValue.toLong).toInt))
  }

  /** REAL audio metadata — WAV via JDK `javax.sound.sampled` (no extra
    * jars, same trick as [[imageDimensions]]), FLAC via the pure-byte
    * STREAMINFO parse ([[flacInfo]]) — dispatched on the RIFF/WAVE vs
    * `fLaC` magic; `None` when the bytes are neither, in which case
    * callers fall back to the deterministic stub. Header-only: the fmt/
    * data chunks and STREAMINFO block are parsed without decoding
    * samples, so metadata extraction stays cheap for multi-MB payloads.
    * Returns `(sampleRate, channels, frames)` — the audio analog of
    * image `(width, height, n_frames)`. */
  private def looksLikeMp3(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xe0) == 0xe0

  /** MPEG-1 Layer III frame walk, pure byte arithmetic: each frame
    * header carries its own bitrate/sample-rate indices, and the frame
    * length follows from the public formula
    * `144 · bitrate / sampleRate + padding` — so the walker hops
    * header-to-header without decoding a sample, counting frames. One
    * frame = 1152 samples per channel, so the returned third element
    * is `frames · 1152` — the same per-channel sample-count contract
    * as the WAV and FLAC branches. The walk stops at the first
    * non-sync byte (trailing tags); returns
    * `(sampleRate, channels, samples)`, or
    * `None` when the leading sync is not a valid MPEG-1 Layer III
    * header (free-format and reserved indices refuse rather than
    * guess). Channel count is 1 for mono mode (0b11), else 2. */
  private def mp3Info(p: Array[Byte]): Option[(Int, Int, Int)] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320, 0)
    val rates = Array(44100, 48000, 32000, 0)
    var i = 0
    var frames = 0
    var rate = 0
    var ch = 0
    while (i + 4 <= p.length && (p(i) & 0xff) == 0xff &&
        (p(i + 1) & 0xe0) == 0xe0) {
      val versionId = (p(i + 1) >> 3) & 3 // 3 = MPEG-1
      val layer = (p(i + 1) >> 1) & 3 // 1 = Layer III
      val br = (p(i + 2) >> 4) & 0xf
      val sr = (p(i + 2) >> 2) & 3
      val pad = (p(i + 2) >> 1) & 1
      if (versionId != 3 || layer != 1 || kbps(br) == 0 || rates(sr) == 0)
        return None
      rate = rates(sr)
      ch = if (((p(i + 3) >> 6) & 3) == 3) 1 else 2
      frames += 1
      i += 144 * kbps(br) * 1000 / rates(sr) + pad
    }
    if (frames > 0)
      Some((rate, ch,
        math.min(frames.toLong * 1152, Int.MaxValue.toLong).toInt))
    else None
  }

  def audioMeta(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (looksLikeFlac(payload)) flacInfo(payload)
    else if (looksLikeMp3(payload)) mp3Info(payload)
    else if (!looksLikeWav(payload)) None
    else {
      var in: javax.sound.sampled.AudioInputStream = null
      try {
        in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (fmt.getSampleRate <= 0 || frames < 0) None
        else Some((fmt.getSampleRate.toInt, fmt.getChannels,
          math.min(frames, Int.MaxValue.toLong).toInt))
      } catch { case _: Exception => None }
      finally if (in != null) in.close()
    }

  private def looksLikePdf(p: Array[Byte]): Boolean =
    p.length >= 8 && p(0) == '%' && p(1) == 'P' && p(2) == 'D' &&
      p(3) == 'F' && p(4) == '-'

  /** PDF header + page-tree metadata: `(major, minor, nPages)` — version
    * digits straight from the `%PDF-x.y` magic, page count from the
    * page TREE's `/Type /Pages … /Count N` nodes (the root node's Count
    * is the document's total page count per the spec — counting leaf
    * `/Page` objects instead would double-count under object streams
    * and miss inherited kids). A linear byte scan, no object-graph
    * walk: for unencrypted, non-objstm documents the root Pages node is
    * the one with the LARGEST Count (intermediate nodes count subsets),
    * so `max` over the scan is the total. Header-only discipline like
    * the other parsers — no decompression, no xref resolution; `None`
    * for encrypted/exotic layouts rather than a guess. */
  def pdfInfo(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!looksLikePdf(p)) return None
    if (p(5) < '0' || p(5) > '9' || p(6) != '.' || p(7) < '0' || p(7) > '9')
      return None
    val major = p(5) - '0'; val minor = p(7) - '0'
    // scan for "/Type /Pages" (any whitespace run between the tokens),
    // then the nearest following "/Count" integer within the same dict
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def matchesAt(i: Int, s: String): Boolean =
      i + s.length <= p.length &&
        s.indices.forall(j => p(i + j) == s.charAt(j).toByte)
    var best = -1
    var i = 0
    while (i < p.length - 6) {
      if (matchesAt(i, "/Type")) {
        var j = i + 5
        while (j < p.length && isWs(p(j))) j += 1
        // "/Pages" and not a longer name ("/PagesX" would be exotic)
        if (matchesAt(j, "/Pages") &&
            (j + 6 >= p.length || !java.lang.Character
              .isLetterOrDigit(p(j + 6).toChar))) {
          // find /Count before the dict closes
          var k = j + 6
          var count = -1
          while (k < p.length - 2 && count < 0 &&
              !(p(k) == '>' && p(k + 1) == '>')) {
            if (matchesAt(k, "/Count")) {
              var m = k + 6
              while (m < p.length && isWs(p(m))) m += 1
              var v = 0; var any = false
              while (m < p.length && p(m) >= '0' && p(m) <= '9') {
                v = v * 10 + (p(m) - '0'); any = true; m += 1
              }
              if (any) count = v
            }
            k += 1
          }
          if (count > best) best = count
        }
      }
      i += 1
    }
    if (best < 0) None else Some((major, minor, best))
  }

  /** Parsed video container header: pixel dims, frame count of the video
    * track, total track count, and duration in milliseconds. */
  case class VideoInfo(width: Int, height: Int, nFrames: Int,
      nTracks: Int, durationMs: Long)

  private def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def looksLikeAvi(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  private def be64(p: Array[Byte], o: Int): Long =
    (be32(p, o) << 32) | be32(p, o + 4)

  private def le32(p: Array[Byte], o: Int): Long =
    (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

  /** Walk ISO-BMFF boxes in `[start, end)`, calling `f(type, payloadStart,
    * payloadEnd)` per box. Handles 64-bit `largesize` (size==1) and
    * to-end-of-enclosing (size==0); stops at the first malformed box
    * instead of throwing — callers treat a partial walk as best-effort. */
  private def walkBoxes(p: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var o = start
    var ok = true
    while (ok && o + 8 <= end) {
      var size = be32(p, o)
      var hdr = 8
      if (size == 1 && o + 16 <= end) { size = be64(p, o + 8); hdr = 16 }
      else if (size == 0) size = (end - o).toLong
      if (size < hdr || size > end - o) ok = false
      else {
        f(new String(p, o + 4, 4, "ISO-8859-1"), o + hdr, o + size.toInt)
        o += size.toInt
      }
    }
  }

  /** MP4 (ISO-BMFF) header parse: moov → mvhd (timescale/duration), trak
    * count, per-trak tkhd dims (16.16 fixed-point), and the video trak's
    * stsz sample count as the frame count. Header-only byte walk — the
    * mdat payload is never touched, so this stays cheap inside a 100 TB
    * scan regardless of clip size. */
  private def mp4Info(p: Array[Byte]): Option[VideoInfo] =
    try {
      var timescale = 0L; var duration = 0L
      var nTracks = 0
      var width = 0; var height = 0; var frames = 0
      walkBoxes(p, 0, p.length) {
        case ("moov", ms, me) =>
          walkBoxes(p, ms, me) {
            case ("mvhd", bs, be) =>
              val v = p(bs) & 0xff
              if (v == 1 && be - bs >= 32) {
                timescale = be32(p, bs + 20); duration = be64(p, bs + 24)
              } else if (be - bs >= 20) {
                timescale = be32(p, bs + 12); duration = be32(p, bs + 16)
              }
            case ("trak", ts, te) =>
              nTracks += 1
              var w = 0; var h = 0; var fc = 0
              walkBoxes(p, ts, te) {
                case ("tkhd", bs, be) =>
                  val v = p(bs) & 0xff
                  val wOff = if (v == 1) 88 else 76 // width after matrix
                  if (be - bs >= wOff + 8) {
                    w = (be32(p, bs + wOff) >> 16).toInt // 16.16 fixed → px
                    h = (be32(p, bs + wOff + 4) >> 16).toInt
                  }
                case ("mdia", ds, de) =>
                  walkBoxes(p, ds, de) {
                    case ("minf", fs, fe) =>
                      walkBoxes(p, fs, fe) {
                        case ("stbl", ss, se) =>
                          walkBoxes(p, ss, se) {
                            case ("stsz", bs, be) if be - bs >= 12 =>
                              fc = be32(p, bs + 8).toInt // sample_count
                            case _ =>
                          }
                        case _ =>
                      }
                    case _ =>
                  }
                case _ =>
              }
              // the video trak is the one with pixel dims (audio tkhd
              // reports 0×0); first match wins
              if (w > 0 && width == 0) { width = w; height = h; frames = fc }
            case _ =>
          }
        case _ =>
      }
      if (width <= 0 || nTracks == 0) None
      else Some(VideoInfo(width, height, frames, nTracks,
        if (timescale > 0) duration * 1000L / timescale else 0L))
    } catch { case _: Exception => None }

  /** AVI (RIFF) header parse: LIST/hdrl → avih main header — dims, total
    * frames, stream count, per-frame micro-seconds → duration. All fields
    * little-endian; header-only like [[mp4Info]]. */
  private def aviInfo(p: Array[Byte]): Option[VideoInfo] =
    try {
      var out: Option[VideoInfo] = None
      var o = 12 // past RIFF....AVI<sp>
      while (out.isEmpty && o + 8 <= p.length) {
        val fourcc = new String(p, o, 4, "ISO-8859-1")
        val size = le32(p, o + 4)
        if (size < 0 || size > p.length - o - 8) o = p.length // malformed → stop
        else {
          if (fourcc == "LIST" && size >= 4 &&
              new String(p, o + 8, 4, "ISO-8859-1") == "hdrl") {
            var c = o + 12
            val end = o + 8 + size.toInt
            while (out.isEmpty && c + 8 <= end) {
              val cc = new String(p, c, 4, "ISO-8859-1")
              val cs = le32(p, c + 4)
              if (cc == "avih" && cs >= 40 && c + 8 + 40 <= p.length) {
                val usPerFrame = le32(p, c + 8)
                val totalFrames = le32(p, c + 8 + 16)
                val streams = le32(p, c + 8 + 24)
                val w = le32(p, c + 8 + 32)
                val h = le32(p, c + 8 + 36)
                out = Some(VideoInfo(w.toInt, h.toInt, totalFrames.toInt,
                  streams.toInt, usPerFrame * totalFrames / 1000L))
              }
              c += 8 + cs.toInt + (cs.toInt & 1) // chunks pad to even
            }
          }
          o += 8 + size.toInt + (size.toInt & 1)
        }
      }
      out
    } catch { case _: Exception => None }

  /** REAL video container metadata — MP4 or AVI dispatched on magic, like
    * [[audioMeta]]; `None` when the bytes are neither (callers fall back
    * to the deterministic stub). */
  def videoInfo(payload: Array[Byte]): Option[VideoInfo] =
    if (looksLikeMp4(payload)) mp4Info(payload)
    else if (looksLikeAvi(payload)) aviInfo(payload)
    else None

  /** [[videoInfo]] in the `(width, height, n_frames)` shape
    * [[extractFeatures]] slots into [[MediaFeatures]]. */
  def videoMeta(payload: Array[Byte]): Option[(Int, Int, Int)] =
    videoInfo(payload).map(v => (v.width, v.height, v.nFrames))

  /** REAL image dimensions via JDK `javax.imageio` — no extra jars.
    * Dispatched on the payload magic (PNG/JPEG/GIF/BMP); `None` when the
    * bytes are not a recognizable image, in which case callers fall back
    * to the deterministic stub. Header-only: `ImageReader.getWidth/
    * getHeight` parse the format header without decoding pixels, so
    * metadata extraction stays cheap even for multi-MB payloads — the
    * property that matters when this runs inside a 100 TB scan. */
  def imageDimensions(payload: Array[Byte]): Option[(Int, Int)] =
    if (!looksLikeImage(payload)) None
    else {
      var iis: javax.imageio.stream.ImageInputStream = null
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally if (iis != null) iis.close()
    }

  /** REAL image resize via JDK imaging: full decode → bilinear scale →
    * PNG re-encode. `None` when the payload isn't decodable (caller falls
    * back to the stub). Returns the payload unchanged when it already
    * fits `maxSide`. */
  def resizeImage(payload: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
        if (scale >= 1.0) Some(payload)
        else {
          val w = math.max(1, math.round(img.getWidth * scale).toInt)
          val h = math.max(1, math.round(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      }
    } catch { case _: Exception => None }

  /** CONTENT-DERIVED 64-dim image descriptor from the real decoded
    * pixels — the classical public-knowledge embedding (block-mean color
    * + low-frequency DCT, the pHash family) feeding the existing ANN
    * operators; `None` when the payload doesn't decode (caller falls
    * back to the digest stub).
    *
    * Layout: dims 0–47 are the 4×4 grid's per-cell mean (R, G, B) in
    * [0,1], cell-major (`(cellY·4+cellX)·3 + channel`); dims 48–63 are
    * the orthonormal 2-D DCT-II of a 32×32 area-averaged luma plane,
    * coefficients (u,v) ∈ [0,4)², `48 + u·4 + v`, each scaled by 1/32.
    * Near-identical images (crops, small edits) land near in cosine;
    * the DCT block is the classical perceptual-hash signal.
    *
    * Determinism contract (what makes a `media_embedding` oracle
    * possible): every pixel statistic accumulates in EXACT integer
    * arithmetic (Long sums of 8-bit channels / mil-scaled luma), each
    * cell mean is ONE division of exact integers (correctly-rounded,
    * engine-independent), and the DC coefficient is a pairwise tree sum
    * of the 1024 identical-shaped bin means (exact when bins agree, no
    * left-fold drift) — so on closed-form inputs (solid colors) every
    * dimension is bit-reproducible in an external engine. AC
    * coefficients use plain double cosine sums (their closed-form value
    * on solid inputs is exactly 0; rounding absorbs the ~1e-14
    * residue). */
  def imageEmbedding(payload: Array[Byte]): Option[Array[Float]] =
    try {
      decodeBmp24(payload) match {
        // pure-byte fast path: 24-bit uncompressed BMP rows are raw BGR
        // triples — no inflate, no color model, no ImageIO plumbing. The
        // packed-sRGB ints are bit-identical to ImageIO's for this format
        // (BMP carries no color profile; spec-pinned), so the descriptor
        // is unchanged; everything else (PNG/JPEG/GIF, palette/RLE/32-bit
        // BMP) takes the ImageIO path below. At corpus scale the ImageIO
        // reader-dispatch + buffered-stream machinery was most of the
        // thumbnail decode budget.
        case Some((w, h, px)) => Some(descriptorFromPixels(px, w, h))
        case None =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            // ONE bulk getRGB per image: the per-pixel accessor routes
            // every call through the ColorModel virtual dispatch — at
            // corpus scale (10^8 pixels per 100k thumbnails) that was the
            // whole decode budget; the bulk form fills an int[] in one
            // pass with identical sRGB values
            Some(descriptorFromPixels(img.getRGB(0, 0, w, h, null, 0, w), w, h))
          }
      }
    } catch { case _: Exception => None }

  /** Decode a 24-bit uncompressed (BI_RGB) BMP straight from its bytes
    * into packed opaque sRGB ints — the one raster format simple enough
    * that a pure-byte walk beats a pluggable decoder framework. Handles
    * bottom-up (positive height) and top-down (negative) layouts and the
    * 4-byte row padding; returns None for anything else (palette, RLE,
    * 16/32-bit, short buffers), which falls back to ImageIO. */
  private[graft] def decodeBmp24(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def le32i(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    def le16i(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val off = le32i(10)
    if (le32i(14) < 40) return None // pre-BITMAPINFOHEADER variants
    val w = le32i(18); val hRaw = le32i(22)
    if (le16i(26) != 1 || le16i(28) != 24 || le32i(30) != 0) return None
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || w.toLong * h > Int.MaxValue / 8) return None
    val stride = (w * 3 + 3) & ~3
    if (off < 54 || off.toLong + stride.toLong * h > p.length) return None
    val topDown = hRaw < 0
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var o = off + (if (topDown) y else h - 1 - y) * stride
      val row = y * w
      var x = 0
      while (x < w) {
        px(row + x) = 0xff000000 | ((p(o + 2) & 0xff) << 16) |
          ((p(o + 1) & 0xff) << 8) | (p(o) & 0xff)
        x += 1; o += 3
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** The 64-dim descriptor body over decoded pixels (shared by the BMP
    * fast path and the ImageIO route — identical input ints, identical
    * output floats). */
  private def descriptorFromPixels(px: Array[Int], w: Int, h: Int): Array[Float] = {
        val out = new Array[Float](64)
        // --- dims 0..47: 4x4 block-mean RGB, exact integer sums -------
        val sr = new Array[Long](16); val sg = new Array[Long](16)
        val sb = new Array[Long](16); val cn = new Array[Long](16)
        var y = 0
        while (y < h) {
          val cy = y * 4 / h
          val row = y * w
          var x = 0
          while (x < w) {
            val cell = cy * 4 + x * 4 / w
            val rgb = px(row + x)
            sr(cell) += (rgb >> 16) & 0xff
            sg(cell) += (rgb >> 8) & 0xff
            sb(cell) += rgb & 0xff
            cn(cell) += 1
            x += 1
          }
          y += 1
        }
        var c = 0
        while (c < 16) {
          // one division of exact integers per dim: correctly rounded
          out(c * 3) = (sr(c).toDouble / (cn(c) * 255.0)).toFloat
          out(c * 3 + 1) = (sg(c).toDouble / (cn(c) * 255.0)).toFloat
          out(c * 3 + 2) = (sb(c).toDouble / (cn(c) * 255.0)).toFloat
          c += 1
        }
        // --- dims 48..63: 32x32 area-averaged luma plane → DCT --------
        // per-bin Rec.601 luma in integer mils (299r+587g+114b ∈
        // [0, 255000]); bins sample [gx·w/32, max(+1, (gx+1)·w/32)) so
        // every bin sees ≥1 pixel at any source size
        val p = new Array[Double](1024)
        var gy = 0
        while (gy < 32) {
          val y0 = gy * h / 32; val y1 = math.max(y0 + 1, (gy + 1) * h / 32)
          var gx = 0
          while (gx < 32) {
            val x0 = gx * w / 32; val x1 = math.max(x0 + 1, (gx + 1) * w / 32)
            var sl = 0L; var n = 0L
            var yy = y0
            while (yy < y1) {
              val row = yy * w
              var xx = x0
              while (xx < x1) {
                val rgb = px(row + xx)
                sl += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)
                n += 1
                xx += 1
              }
              yy += 1
            }
            p(gy * 32 + gx) = sl.toDouble / (n * 255000.0)
            gx += 1
          }
          gy += 1
        }
        // DC: pairwise tree sum (exact for identical bins) / 1024
        def treeSum(a: Array[Double], lo: Int, hi: Int): Double =
          if (hi - lo == 1) a(lo)
          else { val mid = (lo + hi) >>> 1; treeSum(a, lo, mid) + treeSum(a, mid, hi) }
        out(48) = (treeSum(p, 0, 1024) / 1024.0).toFloat
        // AC (u,v) ≠ (0,0): direct orthonormal cosine sums, /32 scale
        val cosT = Array.tabulate(4, 32)((u, i) =>
          math.cos(math.Pi * u * (2 * i + 1) / 64.0))
        def a(u: Int): Double =
          if (u == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)
        var u = 0
        while (u < 4) {
          var v = 0
          while (v < 4) {
            if (u != 0 || v != 0) {
              var acc = 0.0
              var yy = 0
              while (yy < 32) {
                var xx = 0
                while (xx < 32) {
                  acc += p(yy * 32 + xx) * cosT(u)(xx) * cosT(v)(yy)
                  xx += 1
                }
                yy += 1
              }
              val coeff = a(u) * a(v) * acc / 32.0
              // snap sub-noise residue to EXACT zero: a mathematically-
              // zero AC coefficient (solid input) accumulates ~±1e-14 of
              // cosine-table float error, and downstream integer
              // quantization (floor(x·1000) in the LSH bucket algebra)
              // would turn that sign noise into a bucket-bit flip vs the
              // closed form; real image AC magnitudes sit orders above
              // this threshold
              out(48 + u * 4 + v) =
                if (math.abs(coeff) < 1e-9) 0.0f else coeff.toFloat
            }
            v += 1
          }
          u += 1
        }
        out
  }

  /** CONTENT-DERIVED 16-dim audio descriptor from the real PCM samples —
    * the classical signal-feature embedding (framed mean amplitude +
    * zero-crossing rate, the public-knowledge front end of every speech/
    * audio fingerprint since before learned models) feeding the existing
    * ANN operators; `None` when the payload isn't PCM16 WAV (caller
    * falls back to the digest stub).
    *
    * Layout: dims 0–7 are per-block mean |x|/32768 over 8 equal sample
    * blocks (energy envelope); dims 8–15 are per-block zero-crossing
    * rates (interior sign flips / (block − 1) pairs — ZCR tracks
    * dominant frequency, the spectral proxy that needs no FFT).
    *
    * Determinism contract (what makes a `media_audio_embedding` oracle
    * possible): both statistics accumulate in EXACT integer arithmetic
    * (Long |sample| sums, flip counts) and each dimension is ONE
    * division of exact integers — correctly rounded, engine-independent
    * — so on closed-form inputs ([[synthesizeWavs]]' square waves) every
    * dimension is bit-reproducible in an external engine. The RIFF walk
    * is pure byte arithmetic (no javax.sound), same discipline as the
    * FLAC/MP4/AVI parsers. */
  def audioEmbedding(payload: Array[Byte]): Option[Array[Float]] =
    try {
      if (!looksLikeWav(payload)) None
      else {
        // chunk walk: [id(4) | size(4 LE) | bytes, even-padded] from 12
        var fmtOk = false
        var dataOff = -1; var dataLen = 0
        var o = 12
        while (o + 8 <= payload.length && (dataOff < 0 || !fmtOk)) {
          val id = new String(payload, o, 4, "ISO-8859-1")
          val sz = le32(payload, o + 4).toInt
          if (id == "fmt " && sz >= 16) {
            val tag = (payload(o + 8) & 0xff) | ((payload(o + 9) & 0xff) << 8)
            val bits = (payload(o + 22) & 0xff) | ((payload(o + 23) & 0xff) << 8)
            fmtOk = tag == 1 && bits == 16
          } else if (id == "data") { dataOff = o + 8; dataLen = sz }
          o += 8 + sz + (sz & 1)
        }
        val n = dataLen / 2
        if (!fmtOk || dataOff < 0 || n < 16 ||
            dataOff + dataLen > payload.length) None
        else {
          val sumAbs = new Array[Long](8); val cnt = new Array[Long](8)
          val flips = new Array[Long](8)
          var prev = 0; var prevBlock = -1
          var i = 0
          while (i < n) {
            val s = ((payload(dataOff + i * 2) & 0xff) |
              (payload(dataOff + i * 2 + 1) << 8)).toShort.toInt
            val b = (i.toLong * 8 / n).toInt
            sumAbs(b) += math.abs(s); cnt(b) += 1
            if (b == prevBlock && (prev < 0) != (s < 0) && prev != 0 && s != 0)
              flips(b) += 1
            prev = s; prevBlock = b
            i += 1
          }
          val out = new Array[Float](16)
          var b = 0
          while (b < 8) {
            out(b) = (sumAbs(b).toDouble / (cnt(b) * 32768.0)).toFloat
            out(8 + b) =
              if (cnt(b) > 1) (flips(b).toDouble / (cnt(b) - 1.0)).toFloat
              else 0.0f
            b += 1
          }
          Some(out)
        }
      }
    } catch { case _: Exception => None }

  /** The stub's body, keyed on an already-computed payload digest — lets
    * [[extractFeatures]] hash each payload exactly once for both the
    * pseudo-decode and the reported sha256. */
  private def decodeFromDigest(kind: String, h: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    def u(i: Int): Int = java.lang.Byte.toUnsignedInt(h(i))
    val width = 64 + (u(0) << 4)    // fake px / sample-rate
    val height = 64 + (u(1) << 2)
    val nFrames = kind match {
      case "image" => 1
      case "audio" => 1 + u(2) % 32
      case _       => 1 + u(3) % 300
    }
    val features = Array.tabulate(8)(i => (u(i * 2) - 128) / 128.0f)
    (width, height, nFrames, features)
  }

  /** Partition-mapped decode/feature-extract. One decoder per partition;
    * rows stream through without collecting. Payloads can be dropped after
    * this (features are ~100 bytes vs MB-scale blobs) — run it early in the
    * pipeline to shed 99% of the bytes before any shuffle. */
  def extractFeatures(files: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts are
      // expensive; never per-row)
      val sha = MessageDigest.getInstance("SHA-256")
      it.map { f =>
        val h = sha.digest(f.payload) // digest() resets the instance
        val (w0, h0, nf, feat) = decodeFromDigest(f.kind, h)
        // image rows with a real decodable payload report REAL pixel
        // dimensions (header-only javax.imageio read) AND a REAL 64-dim
        // content descriptor (block-mean color + low-frequency DCT,
        // [[imageEmbedding]]); audio rows with a real WAV payload report
        // REAL (sample_rate, channels, frames) via javax.sound.sampled
        // AND — for PCM16 WAV — a REAL 16-dim content descriptor
        // (energy envelope + ZCR, [[audioEmbedding]]); video rows with
        // an intra-coded AVI payload (MPNG/MJPEG) get a REAL 64-dim
        // frame-sampled content descriptor ([[videoEmbedding]]).
        // Everything else — codec-compressed video, or payloads whose
        // bytes aren't the claimed format — keeps the deterministic
        // digest stub (a LEARNED embedding needs a model, which remains
        // the swappable part of this contract).
        val (w, hgt, nfr) = f.kind match {
          case "image" =>
            // frame-count walk (getNumImages reads every frame header)
            // only for GIFs — the sole multi-frame format here; PNG/JPEG/
            // BMP take the header-only dims probe and report 1 frame, so
            // per-row cost stays flat on the common formats
            if (looksLikeGif(f.payload)) imageMeta(f.payload).getOrElse((w0, h0, nf))
            else imageDimensions(f.payload).map { case (iw, ih) => (iw, ih, 1) }
              .getOrElse((w0, h0, nf))
          case "audio" =>
            audioMeta(f.payload).getOrElse((w0, h0, nf))
          case "video" =>
            videoMeta(f.payload).getOrElse((w0, h0, nf))
          case _ => (w0, h0, nf)
        }
        val feats =
          if (f.kind == "image" && looksLikeImage(f.payload))
            imageEmbedding(f.payload).getOrElse(feat)
          else if (f.kind == "audio" && looksLikeWav(f.payload))
            // real PCM16 WAV bytes → content descriptor (energy envelope
            // + ZCR, [[audioEmbedding]]); non-PCM16 WAVs keep the stub
            audioEmbedding(f.payload).getOrElse(feat)
          else if (f.kind == "video" && looksLikeAvi(f.payload))
            // intra-coded AVI (MPNG/MJPEG) → real frame extraction +
            // frame-sampled image descriptor average ([[videoEmbedding]]);
            // codec-compressed video (no JDK decoder) keeps the stub
            videoEmbedding(f.payload).getOrElse(feat)
          else feat
        val digest = h.map("%02x".format(_)).mkString
        MediaFeatures(f.media_id, f.kind, f.payload.length, digest, w, hgt, nfr, feats)
      }
    }
  }

  /** Frame-sampling plan for video rows: every `stride`-th frame index —
    * metadata-only (no decode), so it prunes to a cheap projection. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int = 30): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_indices"))

  /** Quarantine route for payloads the pure-JDK content path cannot
    * decode — the OTHER half of the codec boundary: [[extractFeatures]]
    * keeps undecodable rows flowing with the deterministic digest stub
    * so pipelines never stall, and THIS relation names exactly those
    * rows with a reason, so an operator can park them (side table,
    * re-ingest after transcoding) instead of silently training on stub
    * features. The criteria are the SAME probes the embedding path
    * dispatches on — a row is quarantined iff its features would have
    * been the stub: images must sniff as PNG/JPEG/GIF/BMP AND decode;
    * audio must be a WAV container AND PCM16; video must be an AVI
    * container AND intra-coded (MPNG/MJPEG) with every sampled frame
    * decodable (codec-compressed H.264/AAC/MP4 payloads are the
    * permanent pure-JDK boundary — SURVEY §8). Output:
    * `(media_id, kind, reason)`; decodable rows are absent (callers
    * anti-join to keep the clean side). Partition-mapped like every
    * decode pass: one probe per row, no shuffle, payloads shed at the
    * boundary. */
  def quarantineUndecodable(files: Dataset[MediaFile]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        val reason: Option[String] = f.kind match {
          case "image" =>
            if (!looksLikeImage(f.payload))
              Some("image: unrecognized container (not PNG/JPEG/GIF/BMP)")
            else if (imageEmbedding(f.payload).isEmpty)
              Some("image: recognized container but pixels undecodable")
            else None
          case "audio" =>
            if (!looksLikeWav(f.payload))
              Some("audio: no pure-JDK decoder for this container")
            else if (audioEmbedding(f.payload).isEmpty)
              Some("audio: WAV container but not PCM16")
            else None
          case "video" =>
            if (!looksLikeAvi(f.payload))
              Some("video: no pure-JDK decoder for this container " +
                "(codec-compressed)")
            else if (videoEmbedding(f.payload).isEmpty)
              Some("video: AVI container but frames not intra-coded " +
                "stills")
            else None
          case other => Some(s"unknown kind '$other'")
        }
        reason.map(r => (f.media_id, f.kind, r))
      }
    }.toDF("media_id", "kind", "reason")
  }

  /** Resize pass for image rows: decode → scale → re-encode, stubbed like
    * [[decodeStub]] (deterministic pseudo-resize: payload truncated/padded
    * proportionally to the pixel ratio, metadata updated for real). The
    * partition-mapped shape is the contract: payload in, smaller payload
    * out, one codec context per partition. */
  def resize(files: Dataset[MediaFile], maxSide: Int = 256): Dataset[MediaFile] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        if (f.kind != "image") f
        else imageDimensions(f.payload) match {
          case Some((w, h)) =>
            // REAL path: decodable image bytes → JDK decode + bilinear
            // scale + PNG re-encode (resizeImage); metadata records the
            // actual output geometry
            val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
            val out = resizeImage(f.payload, maxSide).getOrElse(f.payload)
            f.copy(payload = out,
              meta_source = f.meta_source +
                s";resized=${math.max(1, math.round(w * scale).toInt)}x${
                  math.max(1, math.round(h * scale).toInt)}")
          case None =>
            // stub path: not an actual image — keep the deterministic
            // pseudo-resize so the pipeline shape is still exercised
            val (w, h, _, _) = decodeStub(f.kind, f.payload)
            val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
            val newLen = math.max(1, (f.payload.length * scale * scale).toInt)
            val out = java.util.Arrays.copyOf(f.payload, newLen)
            f.copy(payload = out,
              meta_source = f.meta_source + s";resized=${(w * scale).toInt}x${(h * scale).toInt}")
        }
      }
    }
  }
}
