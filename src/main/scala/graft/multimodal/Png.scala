package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec — closes the S13 "pixel decode" stub boundary for the
  * one raster format whose filter machinery the repo already owns
  * (ingest/Pdf.pngUnpredict decodes the identical scanline predictors for
  * PDF Flate streams; PNG spec §6). Decode supports the non-interlaced
  * 8-bit color types (gray, RGB, palette, gray+alpha, RGBA); encode emits
  * 8-bit RGB — enough for deterministic round-trip fixtures.
  *
  * [[clipPreprocess]] reproduces the reference's CLIP image preprocessing
  * (src/clip.rs:856-891): shortest-edge bilinear resize, center crop,
  * scale to [0, 1] (no mean/std shift), CHW layout — so
  * [[clipPreprocessor]] plugs straight into
  * [[MediaInference.embedImages]] where the fake stand-in used to sit.
  */
object Png {

  /** 8-bit RGB raster, row-major, 3 bytes per pixel */
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = 3 * (y * width + x)
      ((rgb(o) & 0xff, rgb(o + 1) & 0xff, rgb(o + 2) & 0xff))
    }
  }

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Decode a PNG byte stream to 8-bit RGB. Throws IllegalArgumentException
    * on anything malformed or unsupported (16-bit depth, interlace) — the
    * caller-facing pipeline skips such rows, budgeted-extraction style. */
  def decode(bytes: Array[Byte]): Image = {
    def bad(msg: String) = throw new IllegalArgumentException(s"png: $msg")
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(Signature))
      bad("missing signature")
    var pos = 8
    var width, height, bitDepth, colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (pos + 8 <= bytes.length && !sawEnd) {
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12L + len > bytes.length) bad("truncated chunk")
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      ctype match {
        case "IHDR" =>
          if (len < 13) bad("short IHDR")
          width = be32(bytes, dataOff); height = be32(bytes, dataOff + 4)
          bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (width <= 0 || height <= 0) bad("bad dimensions")
          if (width.toLong * height > 64L * 1024 * 1024) bad("image too large")
          if (bitDepth != 8) bad(s"unsupported bit depth $bitDepth")
          if (!Set(0, 2, 3, 4, 6).contains(colorType))
            bad(s"unsupported color type $colorType")
          if (interlace != 0) bad("interlaced")
        case "PLTE" => palette = bytes.slice(dataOff, dataOff + len)
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: skip (CRC not verified by design)
      }
      pos += 12 + len
    }
    if (width < 0) bad("no IHDR")
    if (idat.size() == 0) bad("no IDAT")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // inflate the scanline stream: (1 + width*channels) bytes per row
    val raw = {
      val inf = new Inflater()
      inf.setInput(idat.toByteArray)
      val expect = height.toLong * (1L + width.toLong * channels)
      if (expect > Int.MaxValue) bad("image too large")
      val out = new Array[Byte](expect.toInt)
      var off = 0
      try {
        while (off < out.length && !inf.finished()) {
          val n = inf.inflate(out, off, out.length - off)
          if (n == 0 && inf.needsInput()) bad("truncated IDAT")
          off += n
        }
      } catch {
        case _: java.util.zip.DataFormatException => bad("corrupt deflate")
      } finally inf.end()
      if (off < out.length) bad("short pixel data")
      out
    }
    val unfiltered = graft.ingest.Pdf.pngUnpredict(raw, width, channels, 8)
      .getOrElse(bad("bad scanline filter"))
    // expand to RGB
    val rgb = new Array[Byte](3 * width * height)
    var i = 0
    val n = width * height
    while (i < n) {
      val s = i * channels
      colorType match {
        case 0 | 4 =>
          val v = unfiltered(s)
          rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
        case 2 | 6 =>
          rgb(3 * i) = unfiltered(s)
          rgb(3 * i + 1) = unfiltered(s + 1)
          rgb(3 * i + 2) = unfiltered(s + 2)
        case 3 =>
          if (palette == null) bad("palette image without PLTE")
          val idx = (unfiltered(s) & 0xff) * 3
          if (idx + 2 >= palette.length) bad("palette index out of range")
          rgb(3 * i) = palette(idx)
          rgb(3 * i + 1) = palette(idx + 1)
          rgb(3 * i + 2) = palette(idx + 2)
      }
      i += 1
    }
    Image(width, height, rgb)
  }

  /** Encode 8-bit RGB as a valid PNG (color type 2, filter 0 rows, one
    * IDAT) — deterministic fixtures for the decode path and a sink for
    * extracted rasters. */
  def encode(img: Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v >>> 24).toByte; a(o + 1) = (v >>> 16).toByte
      a(o + 2) = (v >>> 8).toByte; a(o + 3) = v.toByte
    }
    putBe32(ihdr, 0, img.width); putBe32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit RGB; compression/filter/interlace = 0
    chunk("IHDR", ihdr)
    val rowLen = 3 * img.width
    val raw = new Array[Byte](img.height * (rowLen + 1))
    var y = 0
    while (y < img.height) {
      System.arraycopy(img.rgb, y * rowLen, raw, y * (rowLen + 1) + 1, rowLen)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** bilinear sample of channel c at fractional source coords */
  private def sample(img: Image, fx: Double, fy: Double, c: Int): Double = {
    val x0 = math.min(math.max(fx.toInt, 0), img.width - 1)
    val y0 = math.min(math.max(fy.toInt, 0), img.height - 1)
    val x1 = math.min(x0 + 1, img.width - 1)
    val y1 = math.min(y0 + 1, img.height - 1)
    val dx = fx - x0
    val dy = fy - y0
    def px(x: Int, y: Int) = img.rgb(3 * (y * img.width + x) + c) & 0xff
    (px(x0, y0) * (1 - dx) + px(x1, y0) * dx) * (1 - dy) +
      (px(x0, y1) * (1 - dx) + px(x1, y1) * dx) * dy
  }

  /** CLIP pixel preprocessing (clip.rs:856-891): shortest edge → `size`
    * bilinear, center crop to size×size, [0,1] floats, CHW layout
    * (3 × size × size flattened). */
  def clipPreprocess(img: Image, size: Int = 224): Array[Float] = {
    val scale = size.toDouble / math.min(img.width, img.height)
    val newW = math.max(1, math.round(img.width * scale).toInt)
    val newH = math.max(1, math.round(img.height * scale).toInt)
    val startX = math.max(0, (newW - size) / 2)
    val startY = math.max(0, (newH - size) / 2)
    val out = new Array[Float](3 * size * size)
    var c = 0
    while (c < 3) {
      var y = 0
      while (y < size) {
        // map the cropped target pixel back to source coords
        val sy = (startY + y) / scale
        var x = 0
        while (x < size) {
          val sx = (startX + x) / scale
          out(c * size * size + y * size + x) =
            (sample(img, sx, sy, c) / 255.0).toFloat
          x += 1
        }
        y += 1
      }
      c += 1
    }
    out
  }

  /** PNG-decoding CLIP preprocessor — a REAL [[MediaInference.ImagePreprocessor]]
    * for the pipeline; undecodable bytes throw and the row is skipped. */
  def clipPreprocessor(size: Int = 224): MediaInference.ImagePreprocessor =
    bytes => clipPreprocess(decode(bytes), size)

  /** 64-bit difference hash (dHash) over the REAL decoded image: integer
    * luma (Rec.601 weights), bilinear 9×8 grid through the same `sample`
    * kernel the CLIP preprocessor uses, bit (y·8+x) set iff the cell is
    * darker than its right neighbor. The standard perceptual
    * image-dedup fingerprint — stable under resize/re-encode, compared
    * by Hamming distance at scale (band a 64-bit hash exactly like
    * SimHash64). Fully deterministic, so a golden oracle can carry the
    * hash per fixture image. */
  def dHash64(bytes: Array[Byte]): Long = {
    val img = decode(bytes)
    val g = Array.ofDim[Double](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val sx = (x + 0.5) * img.width / 9.0 - 0.5
        val sy = (y + 0.5) * img.height / 8.0 - 0.5
        g(y)(x) = 0.299 * sample(img, sx, sy, 0) +
          0.587 * sample(img, sx, sy, 1) +
          0.114 * sample(img, sx, sy, 2)
        x += 1
      }
      y += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (g(i / 8)(i % 8) < g(i / 8)(i % 8 + 1)) h |= (1L << i)
      i += 1
    }
    h
  }
}
