package extractous

import org.scalatest.funsuite.AnyFunSuite
import extractous.core.Lzma
import extractous.gen.LzmaWriter

/** Two-implementation round-trip of the LZMA coder: the encoder
  * (gen.LzmaWriter) and decoder (core.Lzma) are written independently from
  * the published spec, so agreement here checks both.
  */
class LzmaSpec extends AnyFunSuite {

  private def roundtrip(data: Array[Byte]): Unit = {
    val (props, packed) = LzmaWriter.encode(data)
    val back = Lzma.decode(props, packed, data.length)
    assert(back.sameElements(data), s"lzma1 roundtrip of ${data.length} bytes")
    val packed2 = LzmaWriter.encodeLzma2(data)
    val back2 = Lzma.decodeLzma2(packed2, data.length)
    assert(back2.sameElements(data), s"lzma2 roundtrip of ${data.length} bytes")
  }

  test("literal-only text round-trips") {
    roundtrip("The quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
  }

  test("empty and single-byte inputs round-trip") {
    roundtrip(Array.emptyByteArray)
    roundtrip(Array[Byte](0))
    roundtrip(Array[Byte](0x7f))
  }

  test("highly repetitive input exercises matches, reps and short-reps") {
    val sb = new StringBuilder
    (0 until 200).foreach { i => sb.append("abcabcabc "); sb.append(i % 7); sb.append("xyzxyzxyz") }
    roundtrip(sb.toString.getBytes("UTF-8"))
    roundtrip(Array.fill[Byte](10000)('A'))
  }

  test("alternating-distance repetitions exercise rep1/rep2/rep3 rotation") {
    val sb = new StringBuilder
    val blocks = Seq("aaaa", "bbbbbb", "cccccccc", "dddd")
    (0 until 100).foreach { i => sb.append(blocks(i % 4)); sb.append(blocks((i + 1) % 4)) }
    roundtrip(sb.toString.getBytes("UTF-8"))
  }

  test("property: 120 random mixed-entropy seeds round-trip byte-identically") {
    val rnd = new scala.util.Random(0x1234abcd)
    (0 until 120).foreach { i =>
      val n = 1 + rnd.nextInt(4000)
      val data = new Array[Byte](n)
      var p = 0
      while (p < n) {
        if (rnd.nextInt(3) == 0 && p > 8) {
          // paste an earlier span (guarantees matches at assorted distances)
          val back = 1 + rnd.nextInt(math.min(p, 2000))
          val len = 1 + rnd.nextInt(math.min(64, n - p))
          var j = 0
          while (j < len) { data(p + j) = data(p - back + j); j += 1 }
          p += len
        } else {
          data(p) = (rnd.nextInt(8) + 'a').toByte
          p += 1
        }
      }
      val (props, packed) = LzmaWriter.encode(data)
      val back = Lzma.decode(props, packed, n)
      assert(back.sameElements(data), s"seed $i (${n} bytes)")
    }
  }

  test("compression actually compresses repetitive text") {
    val data = ("lorem ipsum dolor sit amet " * 400).getBytes("UTF-8")
    val (_, packed) = LzmaWriter.encode(data)
    assert(packed.length < data.length / 4, s"packed ${packed.length} of ${data.length}")
  }

  test("bomb cap: oversize declared output is refused before allocation") {
    val (props, packed) = LzmaWriter.encode("x".getBytes)
    intercept[IllegalArgumentException](Lzma.decode(props, packed, 1L << 40))
    intercept[IllegalArgumentException](Lzma.decodeLzma2(Array[Byte](0), 1L << 40))
  }

  test("truncated and corrupt streams throw IllegalArgumentException, never hang") {
    val data = ("repeat me " * 100).getBytes("UTF-8")
    val (props, packed) = LzmaWriter.encode(data)
    for (cut <- Seq(1, 5, packed.length / 2, packed.length - 1)) {
      intercept[IllegalArgumentException](
        Lzma.decode(props, java.util.Arrays.copyOf(packed, cut), data.length))
    }
    val rnd = new scala.util.Random(777)
    (0 until 300).foreach { _ =>
      val m = packed.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      // any IllegalArgumentException (or a clean wrong-output decode) is
      // acceptable; uncontrolled exceptions and hangs are not
      try {
        val r = Lzma.decode(props, m, data.length)
        assert(r.length == data.length)
      } catch { case _: IllegalArgumentException => () }
    }
  }

  test("lzma2 multi-chunk path: input above one chunk budget splits and reassembles") {
    val rnd = new scala.util.Random(42)
    val data = new Array[Byte]((1 << 20) + 4321) // forces 2 chunks
    rnd.nextBytes(data) // incompressible: exercises the uncompressed-chunk arm too
    val packed = LzmaWriter.encodeLzma2(data)
    assert(Lzma.decodeLzma2(packed, data.length).sameElements(data))
  }
}
