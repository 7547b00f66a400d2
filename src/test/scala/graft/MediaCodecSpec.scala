package graft

import scala.util.chaining._

import org.scalatest.funsuite.AnyFunSuite

import graft.io.MediaCodec._

/** Byte-level codec tests: round-trips (including the shapes that bite —
  * BMP row padding, bottom-up vs top-down rows, extra RIFF chunks), malformed
  * input as typed errors, resize and aHash behavior.
  */
class MediaCodecSpec extends AnyFunSuite {

  // Bmp holds an Array[Int]; case-class == is reference equality on arrays
  private def bmpEq(a: Bmp, b: Bmp): Boolean =
    a.width == b.width && a.height == b.height && a.rgb.sameElements(b.rgb)

  private def testImage(w: Int, h: Int, seed: Int = 7): Bmp =
    Bmp(w, h, Array.tabulate(w * h)(i => (seed * 2654435761L + i * 40503L).toInt & 0xffffff))

  test("bmp: round-trip across widths that force 0..3 bytes of row padding") {
    for (w <- 13 to 16; h <- Seq(1, 7)) {
      val img = testImage(w, h)
      val back = BmpCodec.decode(BmpCodec.encode(img))
      assert(back.exists(bmpEq(_, img)), s"w=$w h=$h")
    }
  }

  test("bmp: decodes top-down rows (negative height) identically") {
    val img = testImage(5, 4)
    val bytes = BmpCodec.encode(img)
    // rewrite height to -4 and reorder rows to top-down
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -4)
    val rowBytes = (5 * 3 + 3) & ~3
    val rows = (0 until 4).map(r => bytes.slice(54 + r * rowBytes, 54 + (r + 1) * rowBytes))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, bytes, 54 + r * rowBytes, rowBytes)
    }
    assert(BmpCodec.decode(bytes).exists(bmpEq(_, img)))
  }

  test("bmp: malformed inputs are Left, never exceptions") {
    assert(BmpCodec.decode(Array[Byte]()).isLeft)
    assert(BmpCodec.decode("not a bitmap at all, but long enough to pass the size check....."
      .getBytes("ASCII")).isLeft)
    val ok = BmpCodec.encode(testImage(6, 3))
    assert(BmpCodec.decode(ok.take(ok.length - 5)).isLeft) // truncated pixels
    val badBpp = ok.clone(); badBpp(28) = 8
    assert(BmpCodec.decode(badBpp) == Left("bmp: unsupported bpp 8 (24 only)"))
  }

  test("bmp: hostile header dimensions are Left, never overflow/OOM") {
    // width*3 and width*height chosen to overflow Int if computed in 32-bit:
    // the guard must reject via long arithmetic before any allocation
    def withDims(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.wrap(BmpCodec.encode(testImage(4, 2)).clone())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(18, w); b.putInt(22, h); b.array()
    }
    assert(withDims(0x40000000, 0x40000000).pipe(BmpCodec.decode).isLeft)
    assert(withDims(0x55555557, 3).pipe(BmpCodec.decode).isLeft) // w*3 overflows
    assert(withDims(1 << 20, 1 << 20).pipe(BmpCodec.decode).isLeft) // w*h > payload
    assert(withDims(4, Int.MinValue).pipe(BmpCodec.decode).isLeft) // abs() stays negative
    assert(withDims(4, -2).pipe(BmpCodec.decode).isRight) // sane top-down still fine
  }

  test("wav: round-trip and chunk-walking across an inserted LIST chunk") {
    val wav = Wav(16000, 2, Array.tabulate[Short](777)(i => ((i * 2654435761L) % 65536 - 32768).toShort))
    val bytes = WavCodec.encode(wav)
    val dec = WavCodec.decode(bytes)
    assert(dec.map(_.sampleRate) == Right(16000))
    assert(dec.map(_.channels) == Right(2))
    assert(dec.exists(_.samples.sameElements(wav.samples)))
    // splice an odd-length LIST chunk between fmt and data (word-aligned skip)
    val listBody = "INFOsoftware".getBytes("ASCII").take(9)
    val chunk = java.nio.ByteBuffer.allocate(8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("ASCII")).putInt(listBody.length).put(listBody).put(0.toByte)
    val spliced = bytes.take(36) ++ chunk.array() ++ bytes.drop(36)
    val buf2 = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.putInt(4, spliced.length - 8) // fix RIFF size
    assert(WavCodec.decode(spliced).exists(_.samples.sameElements(wav.samples)))
  }

  test("wav: malformed inputs are Left, never exceptions") {
    assert(WavCodec.decode(Array[Byte](1, 2, 3)).isLeft)
    val ok = WavCodec.encode(Wav(8000, 1, Array[Short](1, 2, 3)))
    val notRiff = ok.clone(); notRiff(0) = 'X'
    assert(WavCodec.decode(notRiff) == Left("wav: missing RIFF magic"))
    assert(WavCodec.decode(ok.take(20)).isLeft) // fmt chunk overruns
    val mulaw = ok.clone(); mulaw(20) = 7 // format tag != PCM
    assert(WavCodec.decode(mulaw).isLeft)
  }

  test("frame container: header, full decode, and seek-sampling agree") {
    val frames = (0 until 5).map(f => testImage(8, 6, seed = f + 1))
    val bytes = FrameContainer.encode(250, frames)
    assert(FrameContainer.header(bytes) == Right(FrameContainer.Header(250, 5)))
    val all = FrameContainer.sampleFrames(bytes, 0 until 5)
    assert(all.exists(fs => fs.length == 5 && fs.forall { case (i, b) => bmpEq(b, frames(i)) }))
    val sampled = FrameContainer.sampleFrames(bytes, Seq(0, 2, 4))
    assert(sampled.map(_.map(_._1)) == Right(Seq(0, 2, 4)))
    assert(sampled.exists(_.forall { case (i, b) => bmpEq(b, frames(i)) }))
    // truncation inside frame 3 still decodes earlier samples or errors — never throws
    assert(FrameContainer.sampleFrames(bytes.take(bytes.length - 10), Seq(4)).isLeft)
    assert(FrameContainer.sampleFrames("BAD!".getBytes ++ bytes.drop(4), Seq(0)).isLeft)
  }

  test("resize + aHash: identical images collide, brightness-structured images differ") {
    val a = testImage(64, 48, seed = 3)
    assert(BmpCodec.aHash(a) == BmpCodec.aHash(a))
    // near-dup: same image re-encoded at a different size via nearest resize
    val shrunk = BmpCodec.resizeNearest(a, 32, 24)
    assert(BmpCodec.resizeNearest(shrunk, 8, 8).width == 8)
    // structured gradient vs its inverse must differ in many hash bits
    def gradient(inv: Boolean): Bmp = Bmp(32, 32, Array.tabulate(32 * 32) { i =>
      val v = if (inv) 255 - (i % 32) * 8 % 256 else (i % 32) * 8 % 256
      (v << 16) | (v << 8) | v
    })
    val h1 = BmpCodec.aHash(gradient(false))
    val h2 = BmpCodec.aHash(gradient(true))
    assert(java.lang.Long.bitCount(h1 ^ h2) > 16)
  }
}
