package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal pipeline: WAV (RIFF PCM s16le),
  * BMP (BITMAPINFOHEADER, 24bpp), and a length-prefixed frame container for
  * video. No external codec libraries — these are real byte-level decoders
  * (chunk walking, row padding, bottom-up vs top-down rows), so the Spark
  * side exercises genuine binary decode, not a stub. Decode returns
  * `Either[String, T]`: malformed bytes become typed errors, never
  * exceptions, mirroring the engine's decode-time violation policy
  * (reference: pydantic-marc turns malformed input into `string_type`
  * violations rather than crashes, see SURVEY §1.5.7).
  */
object MediaCodec {

  // ---------------------------------------------------------------- WAV ---

  /** Decoded PCM audio: 16-bit signed little-endian samples, interleaved. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  object WavCodec {
    /** RIFF/WAVE with a canonical 16-byte PCM fmt chunk + data chunk. */
    def encode(w: Wav): Array[Byte] = {
      val dataLen = w.samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      buf.put("WAVE".getBytes("ASCII"))
      buf.put("fmt ".getBytes("ASCII")).putInt(16)
      buf.putShort(1) // PCM
      buf.putShort(w.channels.toShort)
      buf.putInt(w.sampleRate)
      buf.putInt(w.sampleRate * w.channels * 2) // byte rate
      buf.putShort((w.channels * 2).toShort)    // block align
      buf.putShort(16)                          // bits per sample
      buf.put("data".getBytes("ASCII")).putInt(dataLen)
      var i = 0
      while (i < w.samples.length) { buf.putShort(w.samples(i)); i += 1 }
      buf.array()
    }

    /** Chunk-walking decode: tolerates extra chunks (LIST, fact, ...) in any
      * order, requires a PCM s16 fmt chunk before data.
      */
    def decode(bytes: Array[Byte]): Either[String, Wav] = {
      if (bytes.length < 12) return Left("wav: shorter than RIFF header")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (tag(buf, 0) != "RIFF") return Left("wav: missing RIFF magic")
      if (tag(buf, 8) != "WAVE") return Left("wav: missing WAVE form type")
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (format, channels, rate)
      var bitsPerSample = 0
      while (pos + 8 <= bytes.length) {
        val id = tag(buf, pos)
        val len = buf.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > bytes.length)
          return Left(s"wav: chunk '$id' overruns buffer")
        id match {
          case "fmt " =>
            if (len < 16) return Left("wav: fmt chunk too short")
            fmt = Some((buf.getShort(pos + 8).toInt, buf.getShort(pos + 10).toInt,
              buf.getInt(pos + 12)))
            bitsPerSample = buf.getShort(pos + 22).toInt
          case "data" =>
            fmt match {
              case None => return Left("wav: data chunk before fmt")
              case Some((format, channels, rate)) =>
                if (format != 1) return Left(s"wav: unsupported format $format (PCM only)")
                if (bitsPerSample != 16) return Left(s"wav: unsupported bits $bitsPerSample")
                if (channels < 1) return Left("wav: zero channels")
                val n = len / 2
                val out = new Array[Short](n)
                var i = 0
                while (i < n) { out(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
                return Right(Wav(rate, channels, out))
            }
          case _ => () // skip unknown chunk
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      Left("wav: no data chunk")
    }

    private def tag(buf: ByteBuffer, pos: Int): String =
      new String(Array(buf.get(pos), buf.get(pos + 1), buf.get(pos + 2),
        buf.get(pos + 3)), "ASCII")
  }

  // ---------------------------------------------------------------- BMP ---

  /** Decoded image: row-major, top-down, packed 0xRRGGBB ints. */
  final case class Bmp(width: Int, height: Int, rgb: Array[Int]) {
    def pixel(x: Int, y: Int): Int = rgb(y * width + x)
    /** Integer luminance (ITU-R 601 weights, floor division). */
    def lum(x: Int, y: Int): Int = {
      val p = pixel(x, y)
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }
  }

  object BmpCodec {
    /** 24bpp BITMAPINFOHEADER BMP, bottom-up rows, 4-byte row padding. */
    def encode(img: Bmp): Array[Byte] = {
      val rowBytes = (img.width * 3 + 3) & ~3
      val dataLen = rowBytes * img.height
      val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      buf.putInt(0).putInt(54) // reserved, pixel-data offset
      buf.putInt(40)           // BITMAPINFOHEADER size
      buf.putInt(img.width).putInt(img.height) // positive height = bottom-up
      buf.putShort(1).putShort(24)             // planes, bpp
      buf.putInt(0).putInt(dataLen)            // BI_RGB, image size
      buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
      var y = img.height - 1
      while (y >= 0) { // bottom-up
        var x = 0
        while (x < img.width) {
          val p = img.pixel(x, y)
          buf.put((p & 0xff).toByte)         // B
          buf.put(((p >> 8) & 0xff).toByte)  // G
          buf.put(((p >> 16) & 0xff).toByte) // R
          x += 1
        }
        var pad = rowBytes - img.width * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
      buf.array()
    }

    /** Decodes 24bpp BI_RGB with BITMAPINFOHEADER; handles bottom-up
      * (positive height) and top-down (negative height) row order and row
      * padding; honors the header's pixel-data offset.
      */
    def decode(bytes: Array[Byte]): Either[String, Bmp] = {
      if (bytes.length < 54) return Left("bmp: shorter than headers")
      if (bytes(0) != 'B' || bytes(1) != 'M') return Left("bmp: missing BM magic")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dataOffset = buf.getInt(10)
      val hdrSize = buf.getInt(14)
      if (hdrSize < 40) return Left(s"bmp: unsupported header size $hdrSize")
      val width = buf.getInt(18)
      val rawHeight = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      val compression = buf.getInt(30)
      if (width <= 0 || rawHeight == 0) return Left("bmp: non-positive dimensions")
      if (bpp != 24) return Left(s"bmp: unsupported bpp $bpp (24 only)")
      if (compression != 0) return Left(s"bmp: unsupported compression $compression")
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      // math.abs(Int.MinValue) is still negative: reject it here or every
      // later guard computes with a negative height
      if (height <= 0) return Left("bmp: implausible height")
      // hostile-header guard: validate dimensions with LONG arithmetic
      // before any allocation — width*3 or width*height overflowing Int
      // would otherwise slip past the overrun check and throw (the
      // decode-error policy is typed Lefts, never exceptions). The payload
      // itself bounds the plausible pixel count: > bytes.length pixels
      // cannot fit at 3 bytes each.
      val rowBytesL = (width.toLong * 3 + 3) & ~3L
      val pixelsL = width.toLong * height.toLong
      if (pixelsL > bytes.length.toLong || rowBytesL > Int.MaxValue)
        return Left(s"bmp: implausible dimensions ${width}x$height for ${bytes.length} bytes")
      val rowBytes = rowBytesL.toInt
      if (dataOffset < 0 || dataOffset.toLong + rowBytesL * height > bytes.length)
        return Left("bmp: pixel data overruns buffer")
      val rgb = new Array[Int](pixelsL.toInt)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val base = dataOffset + srcRow * rowBytes
        var x = 0
        while (x < width) {
          val b = bytes(base + x * 3) & 0xff
          val g = bytes(base + x * 3 + 1) & 0xff
          val r = bytes(base + x * 3 + 2) & 0xff
          rgb(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      Right(Bmp(width, height, rgb))
    }

    /** Nearest-neighbor resize (the "resize" stage of the multimodal
      * pipeline): output pixel (x, y) samples source (x*w/W, y*h/H).
      */
    def resizeNearest(img: Bmp, w: Int, h: Int): Bmp = {
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = y * img.height / h
        var x = 0
        while (x < w) { out(y * w + x) = img.pixel(x * img.width / w, sy); x += 1 }
        y += 1
      }
      Bmp(w, h, out)
    }

    /** 64-bit average hash: resize to 8x8, integer luminance, bit = lum >
      * floor-mean. Standard perceptual near-dup key for images.
      */
    def aHash(img: Bmp): Long = {
      val s = resizeNearest(img, 8, 8)
      var sum = 0L
      var i = 0
      while (i < 64) { sum += s.lum(i % 8, i / 8); i += 1 }
      val mean = sum / 64
      var h = 0L
      i = 0
      while (i < 64) {
        if (s.lum(i % 8, i / 8) > mean) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  // ------------------------------------------------------ video frames ---

  /** Minimal video container: "GVF1" magic, u32 ms-per-frame, u32 frame
    * count, then per frame u32 length + BMP bytes. Length-prefixed framing
    * means frame sampling SEEKS over unwanted frames without decoding them —
    * the property a real container (MP4 stbl / MKV cues) provides, which is
    * what makes frame-sample-then-decode cheap at scale.
    */
  object FrameContainer {
    val Magic = "GVF1"

    def encode(frameMs: Int, frames: Seq[Bmp]): Array[Byte] = {
      val enc = frames.map(BmpCodec.encode)
      val total = 12 + enc.map(_.length + 4).sum
      val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(Magic.getBytes("ASCII")).putInt(frameMs).putInt(frames.length)
      enc.foreach { b => buf.putInt(b.length); buf.put(b) }
      buf.array()
    }

    final case class Header(frameMs: Int, nFrames: Int)

    def header(bytes: Array[Byte]): Either[String, Header] = {
      if (bytes.length < 12) return Left("gvf: shorter than header")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (new String(bytes, 0, 4, "ASCII") != Magic) return Left("gvf: missing GVF1 magic")
      val frameMs = buf.getInt(4)
      val n = buf.getInt(8)
      if (frameMs <= 0 || n < 0) return Left("gvf: invalid header fields")
      Right(Header(frameMs, n))
    }

    /** Decode only the frames at the given indices (ascending), seeking
      * across the others via the length prefixes. Returns (frameIdx, bmp).
      */
    def sampleFrames(bytes: Array[Byte], indices: Seq[Int]): Either[String, Seq[(Int, Bmp)]] =
      header(bytes).flatMap { h =>
        val want = indices.filter(i => i >= 0 && i < h.nFrames).sorted
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        var pos = 12
        var frame = 0
        var wi = 0
        val out = Seq.newBuilder[(Int, Bmp)]
        while (wi < want.length && frame < h.nFrames) {
          if (pos + 4 > bytes.length) return Left(s"gvf: frame $frame length overruns buffer")
          val len = buf.getInt(pos)
          if (len < 0 || pos + 4 + len > bytes.length)
            return Left(s"gvf: frame $frame body overruns buffer")
          if (frame == want(wi)) {
            BmpCodec.decode(java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)) match {
              case Left(e)  => return Left(s"gvf: frame $frame: $e")
              case Right(b) => out += ((frame, b))
            }
            wi += 1
          }
          pos += 4 + len
          frame += 1
        }
        Right(out.result())
      }
  }
}
