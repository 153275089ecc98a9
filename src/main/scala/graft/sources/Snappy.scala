package graft.sources

/** Raw snappy block-format codec (no framing), hand-rolled from the
  * public format description (google/snappy format_description.txt) —
  * the wire compression Prometheus remote-write mandates for
  * `/api/v1/write` bodies (reference consumes it via its HTTP layer;
  * same no-third-party-library discipline as [[OtlpProto]] and the
  * RIFF codecs).
  *
  * Layout: a varint32 uncompressed length, then a sequence of
  * elements. Tag byte low 2 bits select the element kind:
  *   00 literal — length ((tag>>2)+1, or 1/2/3/4 little-endian extra
  *      bytes when tag>>2 is 60/61/62/63), raw bytes follow;
  *   01 copy, 1-byte offset — length 4..11 = ((tag>>2)&7)+4, offset
  *      11 bits = ((tag>>5)<<8 | next);
  *   10 copy, 2-byte LE offset — length (tag>>2)+1;
  *   11 copy, 4-byte LE offset — length (tag>>2)+1.
  * Copies may reach back into bytes produced by the current element
  * (offset < length ⇒ run-length behavior), so the copy loop is
  * byte-at-a-time. All malformed inputs fail loudly.
  */
object Snappy {

  /** Decompresses one raw snappy block. */
  def decode(in: Array[Byte]): Array[Byte] = {
    var ip = 0
    def u8(): Int = {
      require(ip < in.length, s"snappy: truncated at $ip")
      val b = in(ip) & 0xff; ip += 1; b
    }
    // uncompressed-length varint
    var expected = 0L
    var shift = 0
    var more = true
    while (more) {
      val b = u8()
      expected |= (b & 0x7fL) << shift
      shift += 7
      more = (b & 0x80) != 0
      require(shift <= 35, "snappy: uncompressed-length varint overflow")
    }
    require(expected <= Int.MaxValue, s"snappy: block too large ($expected)")
    val out = new Array[Byte](expected.toInt)
    var op = 0
    def le(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= u8() << (8 * i); i += 1 }
      v
    }
    while (ip < in.length) {
      val tag = u8()
      (tag & 3) match {
        case 0 => // literal
          val l6 = tag >>> 2
          val len =
            if (l6 < 60) l6 + 1
            else {
              val v = le(l6 - 59)
              require(v >= 0, "snappy: literal length overflow")
              v + 1
            }
          require(ip + len <= in.length && op + len <= out.length,
            s"snappy: literal of $len overruns at in=$ip out=$op")
          System.arraycopy(in, ip, out, op, len)
          ip += len; op += len
        case kind =>
          val (len, offset) = kind match {
            case 1 => (((tag >>> 2) & 7) + 4, ((tag >>> 5) << 8) | u8())
            case 2 => ((tag >>> 2) + 1, le(2))
            case _ => ((tag >>> 2) + 1, le(4))
          }
          require(offset > 0, "snappy: zero copy offset")
          require(offset <= op, s"snappy: copy offset $offset before start at $op")
          require(op + len <= out.length,
            s"snappy: copy of $len overruns output at $op")
          var i = 0
          while (i < len) { out(op) = out(op - offset); op += 1; i += 1 }
      }
    }
    require(op == out.length,
      s"snappy: decoded $op bytes, header promised ${out.length}")
    out
  }

  /** Compresses as valid snappy using literal elements only (every
    * compliant decoder accepts it; used by specs and local producers —
    * real senders emit copies too, which [[decode]] handles).
    */
  def encodeLiteral(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 8)
    var v = data.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    var pos = 0
    while (pos < data.length) { // zero-length block = header only
      val len = math.min(data.length - pos, 1 << 16)
      if (len <= 60) out.write((len - 1) << 2)
      else if (len <= 256) { out.write(60 << 2); out.write(len - 1) }
      else {
        out.write(61 << 2)
        out.write((len - 1) & 0xff); out.write(((len - 1) >>> 8) & 0xff)
      }
      out.write(data, pos, len)
      pos += len
    }
    out.toByteArray
  }
}
