package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and batched decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The decode itself is STUBBED (this container carries no
  * image/audio codecs): [[StubCodec]] produces deterministic fake
  * metadata/features from the bytes. Everything around it — the
  * schema contract, the per-partition batched iterator shape (the
  * Scala analogue of a vectorized UDF), partitioning, and null
  * handling — is the real production plumbing and is tested.
  */
object Multimodal {

  /** Canonical decoded-media schema. */
  case class MediaMeta(n_bytes: Long, mime: String, width: Int, height: Int,
      channels: Int)
  case class Decoded(id: Long, meta: MediaMeta, features: Array[Float])

  /** Attach a binary payload column (here: the UTF-8 text bytes, as a
    * stand-in for image/audio payloads) plus byte-level metadata.
    */
  def attachBinary(df: DataFrame, id: Column, payload: Column,
      mime: String = "application/octet-stream"): DataFrame =
    df.select(id.as("id"), encode(payload, "UTF-8").as("bytes"))
      .withColumn("n_bytes", length(col("bytes")).cast(LongType))
      .withColumn("mime", lit(mime))

  /** The deterministic fake decoder: dimensions and features derived
    * from an md5 of the payload. Replace with a real codec binding in
    * production; the call shape (bytes → meta + feature vector) is
    * the contract.
    */
  object StubCodec {
    def decode(id: Long, bytes: Array[Byte], mime: String): Decoded =
      decode(id, bytes, mime, java.security.MessageDigest.getInstance("MD5"))

    /** Reusable-digest variant for the batched per-partition path. */
    def decode(id: Long, bytes: Array[Byte], mime: String,
        digest: java.security.MessageDigest): Decoded = {
      digest.reset()
      val md = digest.digest(bytes)
      def u16(i: Int): Int = ((md(i) & 0xff) << 8) | (md(i + 1) & 0xff)
      val meta = MediaMeta(bytes.length, mime,
        width = 64 + u16(0) % 1024, height = 64 + u16(2) % 1024, channels = 3)
      val features = Array.tabulate(4)(j => u16(4 + 2 * j).toFloat / 65535f)
      Decoded(id, meta, features)
    }
  }

  /** Batched decode over partitions — the mapInPandas/mapPartitions
    * shape: one iterator in, one iterator out, no per-row task
    * overhead, executor-local codec state initialized once per
    * partition (here: the MessageDigest).
    */
  def decodeBatch(df: DataFrame): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast(LongType), col("bytes"), col("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition init (codec contexts, model handles): one
        // digest instance reused across the partition's rows
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes, mime) => StubCodec.decode(id, bytes, mime, digest) }
      }
  }

  /** One parsed media header: real values read from the payload bytes
    * (`valid=false` rows carry zeros and format "unknown").
    */
  case class DecodedHeader(id: Long, format: String, width: Int,
      height: Int, channels: Int, valid: Boolean)

  /** REAL header-parse decode of public image container formats —
    * pure JVM, no codec libraries (none exist in this container):
    *
    *  - PNG: 8-byte signature, then the IHDR chunk — width/height as
    *    32-bit big-endian at offsets 16/20, channels from the color
    *    type byte at 25 (spec: PNG (Portable Network Graphics), W3C).
    *  - JPEG: FF D8 SOI, then a marker scan skipping each segment by
    *    its 16-bit big-endian length until a SOF0–SOF15 frame header
    *    (excluding DHT C4 / JPG C8 / DAC CC): height/width 16-bit BE
    *    at payload offsets 3/5, component count at 7 (ITU-T T.81).
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor —
    *    width/height 16-bit LITTLE-endian at offsets 6/8.
    *
    * PIXEL decode stays out of scope; dimensions, format, and channel
    * count are real parsed values, so the multimodal column is a
    * usable filter/group/report input (e.g. "drop images under
    * 64x64") rather than a shape demo.
    */
  object HeaderCodec {
    private def u16be(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u16le(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def u32be(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def sniff(bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (bytes == null) None
      else if (bytes.length >= 26 && bytes.take(8).sameElements(PngSig) &&
          new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
        val w = u32be(bytes, 16); val h = u32be(bytes, 20)
        val channels = bytes(25) & 0xff match {
          case 0 => 1 // grayscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette index
          case 4 => 2 // gray + alpha
          case 6 => 4 // truecolor + alpha
          case _ => 0
        }
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue &&
            channels > 0)
          Some(("png", w.toInt, h.toInt, channels))
        else None
      } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8) {
        // marker scan: segments are FF <marker> <len16be payload>;
        // standalone markers (RSTn, TEM) carry no length
        var i = 2
        var out: Option[(String, Int, Int, Int)] = None
        while (out.isEmpty && i + 3 < bytes.length) {
          if ((bytes(i) & 0xff) != 0xff) { i = bytes.length } // corrupt
          else {
            val marker = bytes(i + 1) & 0xff
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              // SOF payload: len(2) precision(1) height(2) width(2) nComp(1)
              if (i + 9 < bytes.length) {
                val h = u16be(bytes, i + 5); val w = u16be(bytes, i + 7)
                val comps = bytes(i + 9) & 0xff
                if (w > 0 && h > 0 && comps > 0)
                  out = Some(("jpeg", w, h, comps))
              }
              if (out.isEmpty) i = bytes.length
            } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
              i += 2
            } else i += 2 + u16be(bytes, i + 2)
          }
        }
        out
      } else if (bytes.length >= 10 && (
          new String(bytes.slice(0, 6), "US-ASCII") == "GIF87a" ||
          new String(bytes.slice(0, 6), "US-ASCII") == "GIF89a")) {
        val w = u16le(bytes, 6); val h = u16le(bytes, 8)
        if (w > 0 && h > 0) Some(("gif", w, h, 3)) else None
      } else None
    }
  }

  /** Batched real-header decode — same per-partition iterator shape as
    * [[decodeBatch]] (the production plumbing), with the parse from
    * [[HeaderCodec]]: a projection over binary payloads, zero shuffle.
    */
  def decodeHeaders(df: DataFrame, id: Column, bytes: Column): Dataset[DecodedHeader] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast(LongType), bytes).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, payload) =>
          HeaderCodec.sniff(payload) match {
            case Some((fmt, w, h, c)) => DecodedHeader(rowId, fmt, w, h, c, valid = true)
            case None => DecodedHeader(rowId, "unknown", 0, 0, 0, valid = false)
          }
        }
      }
  }

  /** One parsed audio header: real values read from the payload bytes
    * (`valid=false` rows carry zeros and format "unknown").
    * `n_frames` is the sample-frame count declared by the data chunk
    * (duration in seconds = n_frames / sample_rate — left to the
    * caller so the row carries only exact integers).
    */
  case class AudioHeader(id: Long, format: String, channels: Int,
      sample_rate: Int, bits: Int, n_frames: Long, valid: Boolean)

  /** REAL header-parse decode of RIFF/WAVE audio — pure JVM, public
    * format (Microsoft/IBM WAVE spec, RIFF little-endian):
    * "RIFF" + size + "WAVE" at offset 0/8, then a chunk walk
    * (id 4 bytes, size 32-bit LE, payloads word-aligned): the
    * `fmt ` chunk gives channels/sample rate/bits per sample, the
    * `data` chunk's DECLARED size gives the frame count
    * (size / block align) — the payload itself need not be present,
    * so the parse is header-only like [[HeaderCodec]].
    */
  object AudioCodec {
    private def u16le(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def u32le(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b.slice(i, i + 4), "US-ASCII")

    def sniffWav(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (bytes == null || bytes.length < 12 ||
        tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
      var dataSize: Option[Long] = None
      while ((fmt.isEmpty || dataSize.isEmpty) && i + 8 <= bytes.length) {
        val id = tag(bytes, i)
        val size = u32le(bytes, i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
          val audioFormat = u16le(bytes, i + 8)
          val channels = u16le(bytes, i + 10)
          val rate = u32le(bytes, i + 12)
          val blockAlign = u16le(bytes, i + 20)
          val bits = u16le(bytes, i + 22)
          // PCM (1) or IEEE float (3); anything compressed is out of
          // header-only scope
          if ((audioFormat == 1 || audioFormat == 3) && channels > 0 &&
              rate > 0 && rate <= Int.MaxValue && bits > 0 && blockAlign > 0)
            fmt = Some((channels, rate.toInt, bits, blockAlign))
        } else if (id == "data") {
          dataSize = Some(size)
        }
        // chunk payloads are word-aligned: odd sizes carry a pad byte.
        // Clamp the advance: a huge declared size (or a truncated
        // trailing payload, legitimate for header-only rows) must end
        // the walk, never wrap toInt negative into a loop.
        val adv = 8L + size + (size & 1L)
        i = if (adv > bytes.length.toLong - i) bytes.length else i + adv.toInt
      }
      for ((ch, rate, bits, ba) <- fmt; ds <- dataSize)
        yield (ch, rate, bits, ds / ba)
    }
  }

  /** Batched real WAV-header decode — the audio twin of
    * [[decodeHeaders]]: same per-partition iterator shape, a
    * projection over binary payloads, zero shuffle.
    */
  def decodeAudioHeaders(df: DataFrame, id: Column,
      bytes: Column): Dataset[AudioHeader] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast(LongType), bytes).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, payload) =>
          AudioCodec.sniffWav(payload) match {
            case Some((ch, rate, bits, frames)) =>
              AudioHeader(rowId, "wav", ch, rate, bits, frames, valid = true)
            case None =>
              AudioHeader(rowId, "unknown", 0, 0, 0, 0L, valid = false)
          }
        }
      }
  }

  /** One parsed video header (`valid=false` rows carry zeros and
    * format "unknown"). `duration` is in `timescale` units (seconds =
    * duration / timescale — exact integers only, like the audio
    * header's frame count).
    */
  case class VideoHeader(id: Long, format: String, width: Int, height: Int,
      timescale: Long, duration: Long, valid: Boolean)

  /** REAL header-parse decode of the MP4/ISO-BMFF container — pure
    * JVM, public format (ISO/IEC 14496-12 box structure): big-endian
    * boxes `size(4) type(4)` (size 1 → 64-bit largesize follows,
    * size 0 → to end of buffer), `ftyp` first, then inside `moov`:
    * `mvhd` gives the movie timescale/duration (v0: 32-bit fields at
    * payload offsets 12/16; v1: 64-bit times, timescale at 20,
    * duration at 24) and the first `trak`→`tkhd` with non-zero
    * dimensions gives width/height as 16.16 fixed point at payload
    * offsets 76/80 (v0) or 88/92 (v1) — an audio track's tkhd has
    * zero dimensions and is skipped. Frame data stays out of scope;
    * dimensions and duration are real parsed values.
    */
  object VideoCodec {
    private def u32be(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u64be(b: Array[Byte], i: Int): Long =
      (u32be(b, i) << 32) | u32be(b, i + 4)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b.slice(i, i + 4), "US-ASCII")

    /** Iterate the boxes of `b` in [from, until): (type, payloadStart,
      * payloadEnd) triples, with clamped advances so corrupt sizes end
      * the walk instead of wrapping it.
      */
    private def boxes(b: Array[Byte], from: Int,
        until: Int): Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
      private var i = from
      def hasNext: Boolean = i + 8 <= until
      def next(): (String, Int, Int) = {
        val size0 = u32be(b, i)
        val t = tag(b, i + 4)
        val (hdr, size) =
          if (size0 == 1 && i + 16 <= until) (16L, u64be(b, i + 8))
          else if (size0 == 0) (8L, (until - i).toLong)
          else (8L, size0)
        val end =
          if (size < hdr || size > until.toLong - i) until.toLong
          else i + size
        val start = i + hdr
        i = end.toInt
        (t, math.min(start, end).toInt, end.toInt)
      }
    }

    def sniffMp4(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
      if (bytes == null || bytes.length < 12) return None
      val top = boxes(bytes, 0, bytes.length).toSeq
      if (top.isEmpty || top.head._1 != "ftyp") return None
      top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
        var timescale = 0L; var duration = 0L
        var dims: Option[(Int, Int)] = None
        for ((t, s, e) <- boxes(bytes, ms, me)) t match {
          case "mvhd" if e - s >= 20 =>
            val v = bytes(s) & 0xff
            if (v == 0 && e - s >= 20) {
              timescale = u32be(bytes, s + 12); duration = u32be(bytes, s + 16)
            } else if (v == 1 && e - s >= 32) {
              timescale = u32be(bytes, s + 20); duration = u64be(bytes, s + 24)
            }
          case "trak" if dims.isEmpty =>
            for ((tt, ts, te) <- boxes(bytes, s, e)
                 if tt == "tkhd" && dims.isEmpty) {
              val v = bytes(ts) & 0xff
              val off = if (v == 1) 88 else 76
              if (te - ts >= off + 8) {
                val w = (u32be(bytes, ts + off) >> 16).toInt
                val h = (u32be(bytes, ts + off + 4) >> 16).toInt
                if (w > 0 && h > 0) dims = Some((w, h))
              }
            }
          case _ =>
        }
        dims.collect { case (w, h) if timescale > 0 => (w, h, timescale, duration) }
      }
    }
  }

  /** Batched real MP4-header decode — the video sibling of
    * [[decodeHeaders]]/[[decodeAudioHeaders]]: same per-partition
    * iterator shape, a projection over binary payloads, zero shuffle.
    */
  def decodeVideoHeaders(df: DataFrame, id: Column,
      bytes: Column): Dataset[VideoHeader] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast(LongType), bytes).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, payload) =>
          VideoCodec.sniffMp4(payload) match {
            case Some((w, h, ts, dur)) =>
              VideoHeader(rowId, "mp4", w, h, ts, dur, valid = true)
            case None =>
              VideoHeader(rowId, "unknown", 0, 0, 0L, 0L, valid = false)
          }
        }
      }
  }

  /** One per-image perceptual hash row (`valid=false` rows carry
    * zeros): `dhash` is the 64-bit difference hash, width/height the
    * parsed raster dimensions.
    */
  case class ImageHash(id: Long, dhash: Long, width: Int, height: Int,
      valid: Boolean)

  /** REAL pixel decode of binary PGM (netpbm "P5") grayscale images —
    * pure JVM, public format (netpbm pgm(5) spec): ASCII header
    * `P5 <width> <height> <maxval>` (whitespace-separated, `#`
    * comments legal), one whitespace byte, then the raster as
    * `width*height` bytes (maxval ≤ 255 single-byte samples; 2-byte
    * rasters are out of header-only scope). This is the library's one
    * CONTENT codec: unlike [[HeaderCodec]] the raster itself is
    * parsed, so content signatures (the dHash below) are computed
    * from real pixels, not metadata.
    */
  object GrayCodec {
    def decodePgm(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (bytes == null || bytes.length < 8 ||
        bytes(0) != 'P' || bytes(1) != '5') return None
      // header tokenizer: skip whitespace and '#'-to-EOL comments,
      // read 3 unsigned decimal tokens (w, h, maxval)
      var i = 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3 && i < bytes.length) {
        var c = bytes(i) & 0xff
        while (i < bytes.length &&
            (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '#')) {
          if (c == '#') while (i < bytes.length && (bytes(i) & 0xff) != '\n') i += 1
          else i += 1
          if (i < bytes.length) c = bytes(i) & 0xff
        }
        var x = -1L
        while (i < bytes.length && (bytes(i) & 0xff) >= '0' &&
            (bytes(i) & 0xff) <= '9') {
          x = math.max(x, 0) * 10 + ((bytes(i) & 0xff) - '0')
          i += 1
          if (x > Int.MaxValue) return None
        }
        if (x < 0) return None
        vals(v) = x.toInt; v += 1
      }
      if (v < 3 || i >= bytes.length) return None
      i += 1 // the single whitespace byte after maxval
      val w = vals(0); val h = vals(1); val maxval = vals(2)
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      if (bytes.length - i < w.toLong * h) return None
      val px = new Array[Int](w * h)
      var j = 0
      while (j < px.length) { px(j) = bytes(i + j) & 0xff; j += 1 }
      Some((w, h, px))
    }
  }

  /** Box-average downscale of a grayscale raster to `tw`×`th`: cell
    * (r, c) averages the pixel block rows `[r·h/th, (r+1)·h/th)` ×
    * cols `[c·w/tw, (c+1)·w/tw)` (integer sums, one floor division
    * per cell — deterministic in any engine, no float resampling).
    * Requires w ≥ tw and h ≥ th (a raster smaller than the grid has
    * no content signature at this resolution).
    */
  private[graft] def boxResize(px: Array[Int], w: Int, h: Int,
      tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var r = 0
    while (r < th) {
      val r0 = r * h / th; val r1 = (r + 1) * h / th
      var c = 0
      while (c < tw) {
        val c0 = c * w / tw; val c1 = (c + 1) * w / tw
        var sum = 0L; var n = 0L
        var y = r0
        while (y < r1) {
          var x = c0
          while (x < c1) { sum += px(y * w + x); n += 1; x += 1 }
          y += 1
        }
        out(r * tw + c) = (sum / n).toInt
        c += 1
      }
      r += 1
    }
    out
  }

  /** 64-bit difference hash (dHash; the standard perceptual-hash
    * recipe popularized by Krawetz, "Kind of Like That", 2013): the
    * raster box-resizes to a 9×8 grayscale grid and bit `r·8+c` is
    * set iff `cell(r, c+1) > cell(r, c)` — brightness gradients, so
    * the signature survives uniform brightness shifts and small
    * edits. Integer arithmetic end to end: bit-identical replay.
    */
  private[graft] def dHash64(px: Array[Int], w: Int, h: Int): Long = {
    val g = boxResize(px, w, h, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c + 1) > g(r * 9 + c)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Batched PGM-decode + dHash — same per-partition iterator shape as
    * [[decodeHeaders]] (the justified codec form): a projection over
    * binary payloads, zero shuffle. Rasters smaller than the 9×8 grid
    * decode but report `valid=false` (no signature at hash
    * resolution). Feed the result to
    * [[graft.operators.Dedup.hammingPairs]] for content near-dup
    * pairs — the image twin of the text SimHash pipeline.
    */
  def imageDHash(df: DataFrame, id: Column, bytes: Column): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast(LongType), bytes).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, payload) =>
          GrayCodec.decodePgm(payload) match {
            case Some((w, h, px)) if w >= 9 && h >= 8 =>
              ImageHash(rowId, dHash64(px, w, h), w, h, valid = true)
            case Some((w, h, _)) =>
              ImageHash(rowId, 0L, w, h, valid = false)
            case None => ImageHash(rowId, 0L, 0, 0, valid = false)
          }
        }
      }
  }

  /** Expression-level twin of the stub decode (pure Catalyst, used by
    * the SQL oracle): same md5-derived dimensions.
    */
  def stubWidth(payload: Column): Column =
    lit(64) + (conv(substring(md5(payload), 1, 4), 16, 10).cast(LongType) % 1024)
  def stubHeight(payload: Column): Column =
    lit(64) + (conv(substring(md5(payload), 5, 4), 16, 10).cast(LongType) % 1024)

  /** "Resize": rescale stub dimensions preserving aspect —
    * deterministic integer math on metadata (a real impl would
    * transform pixels; the metadata contract is identical).
    */
  def resizeMeta(width: Column, height: Column, targetWidth: Int): Column =
    struct(lit(targetWidth).as("width"),
      (height * targetWidth / width).cast(IntegerType).as("height"))

  /** Frame-sample offsets for a "video" of `nFrames` frames: k evenly
    * spaced indices — the plan-side shape of frame extraction.
    */
  def frameSampleOffsets(nFrames: Column, k: Int): Column =
    F2.transform(sequence(lit(0), lit(k - 1)),
      i => (i * nFrames / k).cast(IntegerType))

  private object F2 {
    def transform(c: Column, f: Column => Column): Column =
      org.apache.spark.sql.functions.transform(c, f)
  }
}
