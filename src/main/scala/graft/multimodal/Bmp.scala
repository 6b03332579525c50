package graft.multimodal

/** From-scratch BMP (Windows bitmap) codec — a REAL public binary format
  * for the multimodal decode path: 14-byte BITMAPFILEHEADER + 40-byte
  * BITMAPINFOHEADER (BI_RGB, 24 bpp), little-endian fields, pixel rows
  * stored bottom-up with the stride padded to 4 bytes.
  *
  * No image library exists in this environment, so the decoder is written
  * directly against the published layout: magic at 0, pixel-data offset at
  * 10, width/height at 18/22, bit depth at 28, compression at 30. The
  * encoder exists to build real on-disk bytes for fixtures; the decoder is
  * the operator under test — it must parse actual headers, honor the
  * declared data offset and row stride, and walk bottom-up rows.
  */
object Bmp {

  final case class Decoded(
      width: Int, height: Int,
      sumB: Long, sumG: Long, sumR: Long) {
    def nPix: Long = width.toLong * height
  }

  private def putLE(b: Array[Byte], off: Int, v: Int, n: Int): Unit = {
    var i = 0
    while (i < n) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def getLE(b: Array[Byte], off: Int, n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v |= (b(off + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a 24-bpp BMP from row-major TOP-DOWN BGR triplets
    * (`bgr(y*w*3 + x*3 + c)`, c: 0=B 1=G 2=R). Rows are written bottom-up
    * per the format.
    */
  def encode(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && bgr.length == width * height * 3,
      s"need ${width * height * 3} BGR bytes, got ${bgr.length}")
    val stride = rowStride(width)
    val dataOff = 54
    val size = dataOff + stride * height
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLE(out, 2, size, 4) // file size
    putLE(out, 10, dataOff, 4) // pixel data offset
    putLE(out, 14, 40, 4) // BITMAPINFOHEADER size
    putLE(out, 18, width, 4)
    putLE(out, 22, height, 4) // positive => bottom-up
    putLE(out, 26, 1, 2) // planes
    putLE(out, 28, 24, 2) // bpp
    putLE(out, 30, 0, 4) // BI_RGB (uncompressed)
    putLE(out, 34, stride * height, 4) // image size
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // file row y holds image row (h-1-y)
      System.arraycopy(bgr, srcRow * width * 3, out, dataOff + y * stride, width * 3)
      y += 1
    }
    out
  }

  /** Decode a 24-bpp uncompressed BMP: validate the header, honor the
    * declared pixel-data offset and stride, walk bottom-up rows, return
    * dimensions plus EXACT integer per-channel sums (means derive from
    * them — integer sums keep the stats order-free and cross-engine
    * verifiable to the last bit).
    */
  def decode(payload: Array[Byte]): Decoded = {
    require(payload != null && payload.length >= 54, "truncated BMP header")
    require(payload(0) == 'B' && payload(1) == 'M', "bad BMP magic")
    val dataOff = getLE(payload, 10, 4)
    val width = getLE(payload, 18, 4)
    val height = getLE(payload, 22, 4)
    val bpp = getLE(payload, 28, 2)
    val compression = getLE(payload, 30, 4)
    require(width > 0 && height > 0, s"unsupported dimensions ${width}x$height")
    require(bpp == 24, s"unsupported bit depth $bpp (24-bpp only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    // header fields are attacker-controlled 32-bit values: a negative
    // dataOff or an overflowing width*3 would wrap the size check below
    // and turn the clean reject contract into an executor-side crash or a
    // wrong-offset read — bound everything in LONG arithmetic first
    require(dataOff >= 54 && dataOff <= payload.length,
      s"pixel-data offset $dataOff out of range")
    require(width <= (1 << 20) && height <= (1 << 20),
      s"implausible dimensions ${width}x$height")
    val stride = rowStride(width)
    require(payload.length.toLong >= dataOff.toLong + stride.toLong * height,
      "truncated pixel data")
    var sb = 0L; var sg = 0L; var sr = 0L
    var y = 0
    while (y < height) {
      val rowOff = dataOff + y * stride
      var x = 0
      while (x < width) {
        val p = rowOff + x * 3
        sb += payload(p) & 0xff
        sg += payload(p + 1) & 0xff
        sr += payload(p + 2) & 0xff
        x += 1
      }
      y += 1
    }
    Decoded(width, height, sb, sg, sr)
  }
}
