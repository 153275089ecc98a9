package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snappy

/** Raw snappy block-format codec: literal round-trips across every
  * length encoding, hand-assembled copy elements from the public
  * format description, and loud rejection of malformed frames.
  */
class SnappySpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("literal round-trip across all length encodings") {
    for (n <- Seq(0, 1, 59, 60, 61, 255, 256, 257, 1000, 70000)) {
      val data = Array.tabulate(n)(i => ((i * 31 + 7) & 0xff).toByte)
      val enc = Snappy.encodeLiteral(data)
      assert(Snappy.decode(enc).toSeq == data.toSeq, s"n=$n")
    }
  }

  test("copy with 1-byte offset overlaps forward (run-length)") {
    // "abc" literal then copy len=6 offset=3 → "abcabcabc"
    // tag 0b000010_01: kind 1, len ((len-4)&7)<<2, offset hi bits <<5
    val frame = bytes(9, (3 - 1) << 2, 'a', 'b', 'c', ((6 - 4) << 2) | 1, 3)
    assert(new String(Snappy.decode(frame), "UTF-8") == "abcabcabc")
  }

  test("copy with 2-byte and 4-byte offsets") {
    // "abcd" then copy-2 len=4 offset=4, then copy-4 len=4 offset=8
    val frame = bytes(12, (4 - 1) << 2, 'a', 'b', 'c', 'd',
      ((4 - 1) << 2) | 2, 4, 0,
      ((4 - 1) << 2) | 3, 8, 0, 0, 0)
    assert(new String(Snappy.decode(frame), "UTF-8") == "abcdabcdabcd")
  }

  test("malformed frames fail loudly") {
    // truncated literal body
    intercept[IllegalArgumentException] {
      Snappy.decode(bytes(5, (5 - 1) << 2, 'a', 'b'))
    }
    // zero copy offset
    intercept[IllegalArgumentException] {
      Snappy.decode(bytes(6, (3 - 1) << 2, 'a', 'b', 'c', ((4 - 4) << 2) | 1, 0))
    }
    // copy reaching before the start of output
    intercept[IllegalArgumentException] {
      Snappy.decode(bytes(7, (3 - 1) << 2, 'a', 'b', 'c', ((4 - 4) << 2) | 1, 9))
    }
    // header promises more bytes than the elements produce
    intercept[IllegalArgumentException] {
      Snappy.decode(bytes(9, (3 - 1) << 2, 'a', 'b', 'c'))
    }
  }
}
