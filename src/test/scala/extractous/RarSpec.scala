package extractous

import extractous.core.{Extract, Rar}
import extractous.gen.{CorpusGen, RarWriter}
import extractous.model.ExtractStatus
import extractous.sniff.MimeSniffer
import org.scalatest.funsuite.AnyFunSuite

/** RAR5 store-mode descent: the from-scratch reader (core.Rar) against the
  * independent from-scratch writer (gen.RarWriter), with libarchive
  * (`bsdtar`) as the third implementation where available — it both
  * extracts the writer's archives byte-identically and rejects the
  * wrong header-CRC coverage, so reader and writer cannot share a
  * misreading. Compressed members, RAR4, and corruption refuse with typed
  * statuses, never garbage.
  */
class RarSpec extends AnyFunSuite {
  private val text = "the quick brown fox jumps over the lazy dog"
  private val members = Seq(
    "a.txt" -> "first member body\n".getBytes("UTF-8"),
    "dir/b.txt" -> "second member body".getBytes("UTF-8"),
    "c.bin" -> Array.tabulate(1000)(i => (i * 7).toByte))

  test("store-mode members round-trip in archive order, byte-identically") {
    val got = Rar.members(RarWriter.rar5(members))
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, g), (_, w)) =>
      assert(java.util.Arrays.equals(g, w))
    }
  }

  test("writer output is real RAR5: bsdtar lists and extracts it byte-identically") {
    val bsdtar = Seq("/root/miniconda/bin/bsdtar", "/usr/bin/bsdtar")
      .find(p => new java.io.File(p).canExecute)
    assume(bsdtar.isDefined, "bsdtar not present on this host")
    val dir = java.nio.file.Files.createTempDirectory("rarspec")
    val arc = dir.resolve("t.rar")
    java.nio.file.Files.write(arc, RarWriter.rar5(members))
    val rc = new ProcessBuilder(bsdtar.get, "-xf", arc.toString, "-C", dir.toString)
      .redirectErrorStream(true).start()
    assert(rc.waitFor() == 0, "bsdtar must accept the writer's archive")
    members.foreach { case (name, data) =>
      val ex = java.nio.file.Files.readAllBytes(dir.resolve(name))
      assert(java.util.Arrays.equals(ex, data), s"member $name differs under bsdtar")
    }
  }

  test("Extract: RAR stratum of the archive corpus extracts the closed-form text") {
    val r = Extract(CorpusGen.archivePayload(300, text, "en")) // (300/100)%4 == 3 → rar
    assert(r.status == ExtractStatus.Ok)
    val stop = CorpusGen.stopLine("en")
    assert(r.text == s"Document 300\n$stop\n$text\n$text\n$text")
    assert(r.contentType == MimeSniffer.Rar)
    assert(r.metadata("rar:member-count") == Seq("3"))
  }

  test("compressed member refuses with a typed status, never garbage") {
    val r = Extract(RarWriter.rar5(members, method = 3))
    assert(r.status == ExtractStatus.UnsupportedFormat)
    assert(r.error.contains("method 3"))
    assert(r.text == "")
  }

  test("RAR4 signature stays a detection-only refusal") {
    val r = Extract("Rar!\u001A\u0007\u0000 some rar4 payload".getBytes("ISO-8859-1"))
    assert(r.status == ExtractStatus.UnsupportedFormat)
    assert(r.text == "")
  }

  test("data CRC corruption fails the row with a status") {
    val good = RarWriter.rar5(members)
    // flip a byte inside the FIRST member's data area (headers stay valid):
    // locate the first member's bytes in the archive
    val needle = "first member".getBytes("UTF-8")
    val at = good.indexOfSlice(needle)
    assert(at > 0)
    val mut = good.clone(); mut(at) = 'X'.toByte
    val r = Extract(mut)
    assert(r.status == ExtractStatus.ExtractionFailed && r.error.contains("CRC"))
  }

  test("truncation and missing end block are structural errors, not silence") {
    val good = RarWriter.rar5(members)
    val r = Extract(java.util.Arrays.copyOf(good, good.length - 8)) // cuts the end block
    assert(r.status == ExtractStatus.ExtractionFailed)
  }

  test("mutation fuzz: 400 single-byte mutants never throw out of Extract") {
    val good = RarWriter.rar5(members)
    val rnd = new scala.util.Random(59)
    (0 until 400).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Extract(m) // must not throw; any status acceptable
    }
  }
}
