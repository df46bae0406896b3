package extractous

import org.scalatest.funsuite.AnyFunSuite
import extractous.core.{Extract, Xz}
import extractous.gen.{CorpusGen, TarWriter, XzWriter}
import extractous.model.ExtractStatus
import extractous.sniff.MimeSniffer

/** XZ container: the from-scratch reader (core.Xz) against the independent
  * writer (gen.XzWriter) — a genuine two-implementation oracle of the
  * container framing on top of the LZMA2 round-trip already proven in
  * LzmaSpec.
  */
class XzSpec extends AnyFunSuite {

  private val sample =
    ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8")

  test("round-trips under every spec check type (None/CRC32/CRC64/SHA-256)") {
    for (ct <- Seq(0, 1, 4, 10)) {
      val packed = XzWriter.xz(sample, checkType = ct)
      assert(java.util.Arrays.equals(Xz.decode(packed), sample), s"check type $ct")
    }
  }

  test("compresses repetitive text and survives empty/1-byte inputs") {
    assert(XzWriter.xz(sample).length < sample.length / 2)
    for (d <- Seq(Array.emptyByteArray, Array[Byte](7))) {
      assert(java.util.Arrays.equals(Xz.decode(XzWriter.xz(d)), d))
    }
  }

  test("property: 60 random mixed-entropy payloads round-trip byte-identically") {
    val rnd = new scala.util.Random(46)
    for (i <- 0 until 60) {
      val n = rnd.nextInt(40000)
      val d = new Array[Byte](n)
      var j = 0
      while (j < n) {
        // mixed entropy: mostly a 4-letter alphabet (compressible runs and
        // matches), every 4th byte fully random (literal/mismatch pressure)
        d(j) = if (rnd.nextInt(4) == 0) rnd.nextInt(256).toByte else ('a' + rnd.nextInt(4)).toByte
        j += 1
      }
      val ct = Seq(0, 1, 4, 10)(i % 4)
      assert(java.util.Arrays.equals(Xz.decode(XzWriter.xz(d, ct)), d), s"seed $i")
    }
  }

  test("concatenated streams (cat a.xz b.xz, spec §2) decode in sequence") {
    // golden: the REAL xz CLI (5.x) — `xz -9 a | xz -1 --check=crc32 b`
    // concatenated, mixed presets AND mixed check types across the boundary
    val cli = java.util.Base64.getDecoder.decode(
      "/Td6WFoAAATm1rRGBMAuKiEBHAAAAAAAAAAAAK6loEwBAClmaXJzdCBzdHJlYW0gcGF5bG9hZCBm" +
      "cm9tIHRoZSByZWFsIHh6IGNsaQoAAAB3XpitIf1gbAABSipy26vxH7bzfQEAAAAABFla/Td6WFoA" +
      "AAFpIt42BMArJyEBEAAAAAAAAAAAADNLE5UBACZzZWNvbmQgc3RyZWFtLCBkaWZmZXJlbnQgY29u" +
      "dGVudCAxMjM0NQoAAIP3ANgAAUMnhhzYXpBCmQ0BAAAAAAFZWg==")
    assert(new String(Xz.decode(cli), "UTF-8") ==
      "first stream payload from the real xz cli\nsecond stream, different content 12345\n")
    // writer-produced three-way concat with stream padding between streams
    val parts = Seq("alpha ".getBytes("UTF-8"), "beta ".getBytes("UTF-8"),
      Array.fill(5000)('q'.toByte))
    val packed = XzWriter.xz(parts(0)) ++ new Array[Byte](8) ++
      XzWriter.xz(parts(1), checkType = 1) ++ XzWriter.xz(parts(2), checkType = 10)
    assert(java.util.Arrays.equals(Xz.decode(packed), parts.reduce(_ ++ _)))
    // trailing garbage after a stream is a loud error, not silent loss
    intercept[IllegalArgumentException](
      Xz.decode(XzWriter.xz(parts(0)) ++ "junk1234".getBytes("UTF-8")))
  }

  test("extract dispatch: .xz text decodes and records the wrapper; .tar.xz recurses") {
    val txt = XzWriter.xz("hello from xz".getBytes("UTF-8"))
    assert(MimeSniffer.sniff(txt) == "application/x-xz")
    val r = Extract(txt)
    assert(r.status == ExtractStatus.Ok, r.error)
    assert(r.text == "hello from xz")
    assert(r.metadata("Content-Encoding") == Seq("xz"))

    val html = CorpusGen.htmlPayload(3, "xz tar body", "en")
    val tarXz = XzWriter.xz(TarWriter.tar(Seq(
      "a.html" -> html, "b.txt" -> "note".getBytes("UTF-8"))), checkType = 4)
    val rt = Extract(tarXz)
    assert(rt.status == ExtractStatus.Ok, rt.error)
    assert(rt.text == "Document 3\nthe and of to in\nxz tar body\nnote")
    assert(rt.metadata("tar:member-count") == Seq("2"))
  }

  test("damage anywhere → typed failure, never garbage text") {
    val packed = XzWriter.xz(sample)
    // every CRC-guarded region: stream flags, block header, data (via block
    // check), index, footer
    for (pos <- Seq(7, 13, packed.length / 2, packed.length - 20, packed.length - 6)) {
      val mut = packed.clone()
      mut(pos) = (mut(pos) ^ 0x40).toByte
      val r = Extract(mut)
      // every flipped region is CRC-guarded, so the row FAILS - it never
      // silently yields altered text
      assert(r.status != ExtractStatus.Ok && r.text == "", s"pos $pos: ${r.status} ${r.error}")
    }
    // truncation inside the compressed body
    val cut = java.util.Arrays.copyOf(packed, packed.length - 30)
    val rc = Extract(cut)
    assert(rc.status == ExtractStatus.ExtractionFailed && rc.text == "")
  }

  test("filter chains and reserved check types refuse with -8, never -4 garbage") {
    // hand-build a header declaring a Delta+LZMA2 chain: flags byte 0x01 (two
    // filters) — the reader must refuse before touching any data
    val packed = XzWriter.xz(sample)
    val mut = packed.clone()
    // block header starts at offset 12: [size][flags]...; set numFilters=2
    mut(13) = 0x01
    // fix the block header CRC so the refusal is about the FILTERS, not CRC
    val bhs = mut(12) & 0xff
    val headerLen = (bhs + 1) * 4
    val c = { val cc = new java.util.zip.CRC32(); cc.update(mut, 12, headerLen - 4); cc.getValue }
    (0 until 4).foreach(i => mut(12 + headerLen - 4 + i) = ((c >>> (8 * i)) & 0xff).toByte)
    val r = Extract(mut)
    assert(r.status == ExtractStatus.UnsupportedFormat, s"${r.status} ${r.error}")
    assert(r.error.contains("filter"))

    val mut2 = packed.clone()
    // declare the reserved check id 0x02 consistently in header AND footer
    // (the multi-stream walk reads the footer first; a header/footer
    // disagreement is a different, structural -4 failure)
    mut2(7) = 0x02
    val cf = { val cc = new java.util.zip.CRC32(); cc.update(mut2, 6, 2); cc.getValue }
    (0 until 4).foreach(i => mut2(8 + i) = ((cf >>> (8 * i)) & 0xff).toByte)
    val e2 = mut2.length
    mut2(e2 - 3) = 0x02
    val ff = { val cc = new java.util.zip.CRC32(); cc.update(mut2, e2 - 8, 6); cc.getValue }
    (0 until 4).foreach(i => mut2(e2 - 12 + i) = ((ff >>> (8 * i)) & 0xff).toByte)
    val r2 = Extract(mut2)
    assert(r2.status == ExtractStatus.UnsupportedFormat, s"${r2.status} ${r2.error}")
    assert(r2.error.contains("check type"))
  }

  test("bomb cap: declared output beyond the cap is refused before allocation") {
    val packed = XzWriter.xz(sample)
    val e = intercept[IllegalStateException](Xz.decode(packed, cap = 16))
    assert(e.getMessage.contains("cap"))
  }
  private val x86Raw = java.util.Base64.getDecoder.decode(
    "ZnUsxC36br9sW60szuiSWQAAKWUablLiWlroV1H+/9bZSQJFZhzizkDzQ03RPFnRaqN3PLklBRjB" +
    "zL1cvsx1c5+gf+Ap14PpPG0CAPSDlFHhrLDpwIACAGJXhXawAWfpn1MCAFXjh9WTCp3oLGr9/72X" +
    "M8pYqELHW2rD9fMm6zr86FOBAQCMo1QYGHWV4On4yP7/O4u66JVrAQC1KTpGLOnfR/7/dlIb31tL" +
    "BjF4KVJVvxcKUQWX/CXo0swBAKsRik0Jk9Z00GyFMA5DXB+C3BLk6MWt///0LlH4M2dYf4MndNcl" +
    "pasxD9/oF1n9/16C6aaE/v86x5xlDUjC6Uvz//9OC+imuf7/gyTe373AhrCLIHA0nXzjhumA7P3/" +
    "kOKkeDbLIo/6KxhCYgnpWrH+/zbpSD7//0WS1F7FJ5tRP+hq9P7/QfecgV5MQXUk3gDMKuizWgAA" +
    "Kui/4f7/OoRYYTlvq+KAskLpqoMCAHbZU1qd6bkr/v8X6U5WAgC5qDOX6VtWAABQ6Dy/AADCwWi0" +
    "hgKgP5SNQkINhtJB3i+w6anG/v8hmhMjQrUU6CW+AgAH6gEWT9xA6goQEMn/kUwQvmaHgijThZtY" +
    "D3YJcaTNh1TpWaoAAPZaSBhO7zzL2KggfsV9dV7oM6P9/8KGA9veVkm/RePo+Znt9+mFff7/+umT" +
    "dv//ZD7bAGBwgei5S/3/E2kDh7usCDUVbcyQvPGa9QeCLg6/Abeto4d2KPboImUCALCkfejuXwEA" +
    "ywOgiVsLT+nlswAARrV+eumoZgAAKlroZXv//7h32+hkdJBv72kTZd/ouU7+/+hW7/3/6KYZ/f+J" +
    "vlkY8O0nn51uFqF4ONU/6dbm/f9dVyeHewnh6IFC7fQ3IiN4QNaVkLga6A/6AgCBT/btr3yONPdA" +
    "g1ib67rpk/kCAItHXWMMNN7M+Sq8pQw9fGr0nuwdLF5L2jYj+SfohwwBAGWppuV27b+z6Jmo/v8K" +
    "2m/i0mB/xnK29egzQAAAROnmPQEAin7ryFAO6LshAQCilBdQwGL1yujq7wAAbvPy50rodBYAAHNF" +
    "CrFlnv8adEEAQwTewr4iVEgTzelpAv//Jxsr35rsRbimhNzp8XsCAIn4PlIisG/EWqzlABiBmS4a" +
    "6SaRAQBc3GvomMECAKbpO4cAAL1yfox3Nhvo1Iz9/xjLLH/Qzp2FcEfWh5achTGXYz7I7HbpJp4B" +
    "AG/o9nn//3Z7qck9aAJusF4Nh2OWYMQsMAA1R90h9qTf9z1PluM86fVG/f/o6ZUBAOmM9v//pz9K" +
    "P20eABMYECFzjj0I6LjQ//8DXDnpYkv+/+uyDX/HHTqgBU6Sv+huewIAjGX4B0+m6Jc8AQDHRNMw" +
    "zTd69dbpU53+/xRd6dUC/f9pYRxdYHy6eUSRgnsLeipmSeEjabYsqOR21eE4IyFIo7AfTnrptsoA" +
    "ANLwYZMbbeSh6ZkOAADpqZkCAOnUnwAA11++zGX26RpyAgDgsV9M6cPc/v+f6TB7/f/plRv+/4mF" +
    "5ZkFGft/6EoVAQCPL+nnd///Vm9YMQ8aSxYvO8boCVj//xn4cWAFc/fxDT2yZN1gvVu/uwIbsDPL" +
    "86qE4IJy3OkQKgAA4egdtAAAd4LPg7Zjwk874x/P4PlZSYF56NavAgB+seJfJc9E6bi//v/pDon+" +
    "/+i8KQEAvTxdOiwsS4aQ1dlKOXfyV/ej6STw/v81UjTrhBLxSGybp+m3kv//T0yKLPk2eZZ70+ja" +
    "CwMAf+ihIP3/59LkIujEdP3/j/mqgtUU6W1vAgAtRAQkcjCosUVKu+nbBAIAkmcVmCRIXAoo/zQx" +
    "xbdmtJjcRhloMelLcP//gXDrLxNeCALp3YkBAOkPNAIA6YlX/v8KA0Xp67QAANRn6PMcmLIiylps" +
    "GeEDJlHnIY9Z4kxmmulpZ/7/GofVpsPnYKfHFe5zulvfY+hT2wEAiTogwgc3qirVoAvlls3ohfb9" +
    "/7/oTEUBAAMf3wSf/tYJn3mlTYhg2Vyj4agBZTno9Ev9/3fOPnRRtK2WnvaiCuTMqiHFs+k+uAEA" +
    "o5XnvDxxy/nrQPpPANA5Z5nYBqNn4Nh7ryU420/BiTetLY/Rzf7RO/2UCeHoPuH//xdZev2UPTcB" +
    "yKA+6BdEAQCqRYvEgejzhwAAmeheBwEANpev6MgFAAATEZRgo0PpClP+//c2a1fAlMhvILss6Ra6" +
    "AgAVD9Lg6ShAAADgvE3jGumPjgAAviR8uuKf0rBwzv0x77LoQDACAPXRbxNz3KyDyhj46PMmAQAZ" +
    "p37pwRoAAIQefTu8Pis8fukIFQAAeibpJx1tKATR6Ia/AADPhYuPIF3luT97h9X3H/vTZkqG/iY6" +
    "d0t0HEWKWouobIcOxunxFwEAv4E2bli88YOhvXLYlITb6TB0AQDZXGTwBLDGRoZI9AoFOrLk4G7i" +
    "PAbF4V/CbOk00P7/2gE9ZJWFVltMB6mbGibILui5PgEASIwAulfCo2rpvdgCAB6qffm5kb5T7PZM" +
    "S9YLwl7u5VgKzU5XhgVM+LKdQcIG6CZNAgCk6YzzAQCZ8jSD/2LpME0BAOi2WP//fBvyMugsgf7/" +
    "urO5n33OE+i9AQIAKb/N8fDJmxTxHl/NNgSCCelVOAIA9MgqQpkdRsjhe+kQEP//C3iUrZP+igmm" +
    "6SteAQB8jV3o5CL+/3MqBEdM7nnmlLhvkSWYmFHN713zdttoURU4kkD0SDht3vX9grnTgtJaP9QV" +
    "EGTp1E8AAHy16WCB//+y6HJe///imemquP3/padMHv6b5K2jQ3nsQJBS6WdqAgCL5y516KEe/v8l" +
    "Ifksxg2W8SLf/eFvXZt3w8gtCHB/ZEEntHNU06mReGfp3Y3pJqT+/6FUwTYthPu9R+OMkEEBTiTd" +
    "3ebBhjFkM/7ovw3+/55IYTyirjpa6PoFAgBmuqvpi9r//+i7ugIAzjpBB6ysoeiKVAEA+2+7m84B" +
    "p+wfkfqTQGTkc1WPDVvM6lZWjGFo5Zuf4+lX1gEAeONqLNZX6Vw0//+MWel+5P3/VOiK8gIA5le+" +
    "Qd3I1YKT6caTAQCKr2O1OLLptOP//zVq6Y+///9l7qrPNAhBgmXCaTv3I2zsG1AQcanozFT9/43F" +
    "r/rm6WiCAgA8zHNUUI5c4+gZqf//5osbnxLTBnpNn5JcjPhHczov7SzLVRFKTLozLHevU10553rS" +
    "oMhb6Mi+AQDpT3IBAAKdN22BDLqH5qvGJYZsuml76QLNAgB16YY3AQBnsFSH0pOvXZ9Z8DR63Fc0" +
    "cdoSk0x0tTq53zKyM2H71n/L6OWWAAAzQmx9LKhk2tCxpIpSvuq66H4LAwB7o5NpM53rIMzeto72" +
    "qxgCjWPpUMYCAElijK3pHf3+/+kqzv//sD5CrunnOwIADujITgIAWLjxhPHdKowUMBya6Him/f9f" +
    "sMOOgazpbPX+/8Aqd5+DJpUOpYKVswfw3dRnSz6sShOPi9bp+tH//xTe7gZPmLvpi2L9/7shSUdt" +
    "PbrxTMRfa7vHJxJJzzVLDoOuYBczHI66me6Xlns2in+kUjhB9FxRDArCpOkWhAIA3+gZDgEASunK" +
    "5v7/128vBOizvwAAu9ntYQokxYX0IOlygP//K9Os+l7OpudN4kcTiM+weYZmhPlpc3cFOOl19f3/" +
    "QJM3yS0fx3nBajsLWLrp/lUBADgf7vLoFj/+/+jgQf//lKXojtT9//h4if/jUEcZ6DoW/v+TFunL" +
    "XP7/IhGMknBqeymyL+nhPf3/jOHv+pwBeJ5DMeN0nkO6eh+vsxHLqf+zr9Tpu93//6nLYXIK6QgU" +
    "AABri3pD6JMr/v/o7NQKg8XrD+imWQEAL8+DpOhQgv//6fv/K7dxSUkGk98LFE4PQd+29fnt0BUz" +
    "av6jNi+MiZhPj8C46pjpWLYCAPMq6v7NcRaw6UwyAQBDJqBj6LnTX4uKjsTf6WQJ/v/cTSGNLSLH" +
    "g+jTmv7/gP61vyXp1c7+//PgYuiXBv//XFd3e2PnOXI5xAh/lEwJOqaXYOjL9QAAoVw26XOLAAAB" +
    "6f13///2Xxt/E/hqSpx0Oh3i0crhjsxZp8ebLt0DLsH9k6Q5tycYZqjc6cLFAADJ9wPoOAYAAI0k" +
    "uQgIekGhksnR1fZMU1Ln4AQvOJBuz71Kl6Gf137Q7Cmz6LDMAAAJBdKkg72vkFpOOXY2I0Ly56B/" +
    "hEIdC7ajiXpqlDyE6crX///1YAUIj+jZLgEATzfKaKgSrek/+QAA6dKIAAC8qOgmzooJUNhXOSML" +
    "K7x+2XJs3t5N7vIwIOm0kgIARZD4cHcDw5h7WBW11+nWPQEAFPTpYBr//+liGwAANKfp7Vv9/yfp" +
    "q5j9/zSegKbBRy2pSJdA/Hl96QWZAgCfkff6x4k0tF0HEgZyVmnOb8xqskzTMrLx6aCX//9o3c+y" +
    "6AP6//+NZZW7i2ZIvizpaif//wcQQrzi4AnayvZtfsLWzz8U6InA/f8/dcVW8fjpjZ7//+VearnC" +
    "YfHp9DUBAAbo91gAAOkSWQIA6INg//9d20YbJnYYb+iO9f3/6N9i/f+selCNcSoEAH4H6Hbe/v+t" +
    "TaJJVk2EOEoXj20J/feiMS82ZAX86JZf//+a7Y6HiQqVHr50uJLoy5YBAPsoFO2gFQw/6HdkAgBg" +
    "YI/5fdbho6L6tfrgCBoUi0/Z6b/o/v+a6BppAABa6MqtAADphi/9/zX+bkLxxCzVWe5Xju8OQB47" +
    "ak9tMUemV1boeOgPLgEAC9XC6NCZ/f8LuM1kTjW5fvtpVkPp67UBAOlcO7wffxYl6aNk/f8wAZYP" +
    "cNzbSvO86L8r2Nu1WUKqL2Ly2+jd3v3/kLRK0E7p06j9/1ZlBbgRszPgQ+lg2AIALnuQazQ9oyPo" +
    "e+4BAOnp4XYBACcL4VBQ+0quWrOf4Nfoev39/x6NFfnDRqehVdboM9UBAE/Y6VXaAQAjKOn21gEA" +
    "GmJ/Z83ofJYAAK0f+9JVLMN/7VPpV/j+/zxr3Ff8cJrFvtlHHvB7QlFxqcMT6Hw4AgCNiqRPICpc" +
    "6eUWAgAl33oXcTa/gPHow6n//8hGiCRCFa7g/FxQWgemShIpgNlYdW9saOmymwAA8f+b+4FRT07H" +
    "oeVv3/W8scgJ0laeHDponmCkPUXm6c8LAQAJn1bpJncBAHHieXg+bZJXfmsuag2/BF6fseiMWWht" +
    "nNp76LmaAADVEkrDbMJ9DotNoRPXl5qg/WspVpkRNVbx6Z2B//8feZXd6YKU///pBXgCAD2rSTpI" +
    "HnV88HLDpbrD15b9cTteNjKh6SVeAgCqCdxLS3TRz+7rQ9rN6Sti///PmSwO3+gNVf//LpW66ah9" +
    "/v9CItgw2G8ONn7EIWP1lKQ86DfY/v/lOHbKa4hnoXrvQf3of8r9/4UB8+xdp+mfSv//eIVSPGy5" +
    "nA==")

  private val x86Xz = java.util.Base64.getDecoder.decode(
    "/Td6WFoAAATm1rRGBMHFHtAfBAAhARYAAAAAAImm+CPgD88PPV0AMx1Bit5nCKt3Qof6L+JMmOoA" +
    "H7abihfNvFYXkiITJlWjS+gj/4KEQV8ejNSaOtlxNKBAJwiO38ZyAsx6tcoFuNU97FyMYUyw3VYN" +
    "PTDKh3rHLwotSc0CfKBjk/S+S1GW8hTaTD0Op+Z3+D/w3mtKlZIevCx031bVY8a8BKqM60paUIqP" +
    "04BHaZBqBOeOdEujRJWVknQuYo7JFYp+zAvL5lo6E6FiSJYMxPwShjWSJthlh9t9vrEb9M94VwlT" +
    "Gbh2H07eVWTNMfQvtZr0siPww03vWzmKjgTyi5bpqPFX3cnlKbfRs1KaIpgAAPyNmHYVruTTcM8+" +
    "eT6VE4GtVuO7dK9uWec2TLtCwrv9SSmsGlTjK8liRR40yx2HGb5F3vFKtoQdgaMe30iISgTruhyc" +
    "Eb3YOci5tU3PF92Zp5WhNsX/cbI/3Kn1v02iPr/WL7TzlVNGgLF/GGelrq35TE8VzPbSvzkeAySx" +
    "EMWue0qXT0GTr2z5/TDx25n+b4k+VBkjpoAzKboJ/bpPRGgQY4gis/SgT8Nn8oBv6z9K18dXk8fs" +
    "L6Kr3v8kn9xSiIWeaA2nTpP0Du3LQG0g4dYR7JWd9iUyr/34tE7/T9a/L/+p6xJ4zMqHz5XvKep3" +
    "B93ZPvInZ7+6qz+BRelJyOPiiI6siyH++oNczquxqJ7gqwm12N7xCm18+jy66OCEEC32acMx2YQu" +
    "otZcm6zSz77UGRWJCrZWuWIxQnGmFzQ9D3v8aPTYYD+YdNkRqupbqVP2AZDehIG0pEGqsghJqA6Q" +
    "epANNXTk7RKdOegSIiR3IslZhbp6G/K0vj6fZFGnhqhAWSnAR55cAb9O98tQVnT/r5+P3p/8RSRp" +
    "PEPfnfVL0Rdjj1XGtiHRTJ61G3XL2ClIXrbBHma3lXLafVvptsrP1dswK3yPDfB1OQrBvpiSFexR" +
    "H1yr3u4xutWJ4vEjwawaLmDhr4+IEBg7oWA6ctfka4ff0vn2O/oXgbk+F59+K4TAbC3CLuPSHyFJ" +
    "ZBjMtq9GPY7wJ+q5lI3CJu/oi+7aRfKUYYEVQK6H5DHlarecfKjVaruKQuyF2OPVQC2T0rB8FleZ" +
    "v0YOOBzGzKpzD4UxALyTHp1E3hme7afbQCn2HHUY1C5XUUONVA8CjhOu+mpNrcArIcnhOifR6lXt" +
    "4OOYvTTH1G/r/kpNvB42G9QjX3EATcW5GPFDJmnHGtaDC2y3j7Al99ca/FjXrOO61vrjPCYypGp6" +
    "wpX5Yiz99diIq8sRWchv7IpbuDo8+lDsiwUnqPrl5cxeTKR6BuH/84G+oztV9L7gqle0qOhgC5iL" +
    "rm9A+PuLsnIdlSrcubCCa6+g0thZht+AKcLcPFisMYlsb0DdB2y4T5U3jn0OQaug3++QJcjO7vmm" +
    "KJ3gruRXWHRAyswUNP6VH0ZzlJSCJAdERJDQbEQMlgC9momZzGtUheuUIxCg5ZS8Uj0B4tn3gzkz" +
    "Yahy9oIup+RUccVCDhN9Em1T5BvE87yDZq+5/bkDE8880zEY5N1cK9mcu5+jiA+T2N9G9uL/MZ+q" +
    "HZqwGweKoH3L2hTxNR96SGBrEEa3yT2bsJ9nLInbeLROuR0NbU9N78/zouXB+MaX2EJgsn+Y0GWb" +
    "GIohx0sqZU690EB2quBq/zOWEQEMuKpu7uWsPBJUkqqKBFyx0DQPH3quOjuU5Zcdaxi4YjDE8RAB" +
    "zF6Ahiigj8vr5akztiNNqePoDy6M/mGbMs636r53sJJ0Dw5FQu1j7qWpnIMWbtAS5j+VKL1s+cha" +
    "BkNm8D2Gnk/R9UcW92pC1gfH2Ns2c3p7slE/LQqec3fHyQSfmL1z9fCg0ApuVqEwMRzCsa/5K5ae" +
    "kHSABa4/TF9aTSfSXjdFzLLSBYP10jGB/CzMvoDXw3amR8RdXi9ccdF6Dj/1otX53AmyOO9ztVHp" +
    "XTzCaC90y4tZwOGLEEsk2gBCR69ptuiFygI/gteUOI9+JiV/VoTbGWGjgYRzADPbtfF1h8/v0RrY" +
    "nJVGhpM2pAhb4yVCcO401bfVyM5+MJdcgOrFSgzvWBeNA9bV24bUVfG/0k3VG+ScDkWjypsSZE49" +
    "GqgxFymXd5nlyxQcDxDH2/rfnjO1cVb+4POnjtWousKdtTIsQRWYBjKH5dQ8WhknpfqMgMk6OiVx" +
    "+QuVllrjPn8OZjLEjShkq5a54tX+CZeZbeV3qpAv7ILOYhZT4rF+5HG2fBNw9vsXnurNBmfx9IXh" +
    "ClmdmGzDPjjmXKJ+fOEa64LeujJNYcJC7++e1VmdQESEXcHdS0NMiMqUBbu2KLXAiJfwYK6in1BR" +
    "bHybaG9j4197n9zpGR5nq0EhqPxdG5fQhmOl999goXkDgmboMqHfiVIim408t5HfT01yqbEYCklW" +
    "nWjoMwvelMTKT+u7Ui67YVQ3cr8CbMqcRpZdSMBZN35CghR5RGXPM5QBP6aa3PfCYGTRtCFno8/j" +
    "gfXn6IliPd6vedzhmoseU8A5esXoaCSAeKgthojOW8nn7UGbayGgIxqhBBoM4Epj6GjwBnYyBe3+" +
    "Ajl7jR+K1zpOQdHNWnvwCzupjbn+GrzlynDyhl/h+mkmIVFz3UIAvYtQjLHL9LxT09B+uPJN6fGX" +
    "H5bmcIxNgH4lDqKUbk19kzdyD5uqM4jnQKDlNZahj8vzxLw7J9dszOfh0oIYNd1ND8BD2dSCyUw7" +
    "7H/KbigMKBzWnKskZhPU8f9vyyCXG1Vv6ch1J9Ehc/r8Eb2MmcoOoHmWWRxInKsPeSXcWcHMk6Hk" +
    "f7XXJZ27rxQIzqFbv0B3b1tI99jL0b3c53W7D8rgK5vZP9GCMD3FdUcKCoYltQmOEm0hPXiK2uMO" +
    "IpXxjBJX9Y7NrWAc1y03nWnBbDrW1QhvSXnbKaAgIAYpNaMTxZLkg1/viiWSqSY1dJLwlxcfnAUp" +
    "qR1QR4fqe2PKmbL0/rmajWbDGU6qzLuc0j8ASwMLYGSPtmMTjB5r6bYkvzTKJ53o1mRWMTBTn5V2" +
    "IpMvEVBxD8moLQCFEjVjEJNh+L2vHCAyMcjCGoK2z5ZgTk/3fVX692+8h+ogMpz1FNpK59RKlVOK" +
    "w9hBwDqwu5j+aVhERHL3uXhMgQwaFwRHRzMr2VGgc1aLEjEsdDapS2lTVqTWI+jZ5LBZj5YURsuH" +
    "neMJJDh8oYlAyUem1qjsi2KbYTW9Xy+32NAdoCOYClSyArtS5ffMngGAH/QUx3B79S0aNW6aUaYT" +
    "3EX71VBrrNeu528xnsv7PFR9d4oXog1QSeyaJH348qapJnesyrKEN37t9IVEiXHLcSxswCnY0M5v" +
    "bswNpoKr3VxXBNOzIy/do3CfkPsEOpRwlwVUqOysQ4Qg6ouEWwAl1JVMcjbHjuLtXiiPy3n7Z0gA" +
    "+mj0bJYm6aVQomutZZx28A87WrorW6IzCh02EyBLOH6mfTZmaDDt6Bm49yVi+GsoSTqUrjbT9Vdw" +
    "FmnyHsdL/uyg2U74sjozqp3Z9fD/5wm969LagFlmA/j5C7Vnh9wG9FF9v0ePUiMJBisaIV7GkH/S" +
    "IdJjP68f9xARXNcsj2suRmpT3qIdTsStb2anFEi277lJT0Fgh81G22fgm8IzUIQr/wY+AyQaQ48K" +
    "TZVlfz6dDaDUegHijJnrWZZPyu+DqrqgFFiDKtXTcfLsBMvAZosGFOipYWINoTcv3PfY+hKH8kwP" +
    "t9LoTSWb6Segpo6BaCaJrgecVwNV1mDyJUlR831i5fAVwYcf3gl/Xm84avYexcoMLqD5Efu9slUb" +
    "sbzINsD4KL8S1Jb3igCp+VSsG3tN4PizdmlGsTC5ceqVOF3yi+m07hrDGx71P/KwLEx+Lx8GiM6J" +
    "xmsvn0/2VyNbmPwFO9JAMYRRjB98o/HEss6YGHHxoqyrVaYOCixadJsHAqX4ymS0GD45yo7UHOxl" +
    "/T8UcmcfwaGok2IkeXIMyWC8VC04kNuc4dXICGKnjLGevt/GipWv+moNH2XUBVlMcJn+krJheyfC" +
    "ZDUTC/U6QVvobU5BbDFIjdYio0R97jUjGOg2pWeuO236k4rF4w/6jpu/3/8/x94i7gKY7BPz74Wq" +
    "Ky8HXscKM4V6uIgZlZbjGB85cwEkm8H9W1H4T6vrBiMrg73/LD7kdistm0uqWdUInIxklEhnWTN4" +
    "qabmjPsjT3whZktJSTunjcECocibPCNX+2nB28el5waEEmMTG0kwkpz6Y2JcIEYEgF+tmyHaIKim" +
    "MmKHsdMDJvsVXXd97VPsh+FZfoR17NVNTQPMEjMN2RA8KG8JLjyaxY437Vmdiv2ff+eH08wgbB+d" +
    "zaxe9NkHCifD/jWME69ArVXzsjSdDXbwJVHIjuzs4DqR3O7u29x+/MHAZCMJVR20YMomfspyf+sJ" +
    "qo8r/dSrl8mcgkEeBl1z2Fv3Ch73ouu28olemJAmJm/5LpWHTtZYAAOqH7NTilhSzA1/CKMTz0Wq" +
    "sJ1R6gQerMJiPV5fd7nIcgNdQncfpv0TJdIqspRdXh96kwJq32n1lDzHlztHuN1sBjNA1Q7Su6Tp" +
    "tIlFewLoX5MHDg2cVIBhD2mG0eh9eJ1hh5iBpCEhIEeVVeBuXL2dDSSWz58V/8NxxNEMuRLByhlF" +
    "War2+LKI+oFg+KEhYbE8Rbli04SK1WcjgZYZ+nslsN71b8JqXLWAA2zU/uY/4+wK+HWyu/jHZGuq" +
    "aWgwrFbHUjvj58WloZFTG5wDpPGYo+mz7bzDISJYP6ST2dh7daHywE9pKBTI6xm9GT6RDEE53VEz" +
    "B0wHvxsfwT1cRBfrx7du2su9u+7N31s9r+OSyKFRa7QSdK79CbE3Qmmo93903JhBb8bD/Ur83zK1" +
    "4vapAbrtM1OilbdZxhkQoFNUMk54zqKEkGKtuPL2uSvaBUMrggAeoMRQqmaLhTqx9apa9ircEQDW" +
    "Qg6jbiUaquaz02KcNZv3n+nOJ3wl8xfcEfgBiCJxktOyKj/0VqmYZbcMisMTVLi2GFfrQ2eOszhA" +
    "4BZGVJqJRtcnY0Yp/UZtcvibwCoeO8hnB4Yv7EpPX1zvmf3GOntTchLJkgNQn1s7s7G9PNdpPjCB" +
    "g+JDwxqyElOqDxnK0xXZHVpI9Z9isv3nUHcPoQqQjF3Lvb9UiTqz4DecUD+VBOaLozCJbloMPKm9" +
    "hq7Hr1zQ4zL3WrSefdgkE2+F6Hiec7TDjSuCSqr/XsdtAD2iu7+ooNO9Dleug51Bfkvx/j5fULhA" +
    "+yBTi8GpPQAAAAAIgQlmgOgdAgAB4R7QHwAAzWiz8LHEZ/sCAAAAAARZWg==")

  private val deltaRaw = java.util.Base64.getDecoder.decode(
    "CDx/xQY9f8YJQHzFBkF/yAlDfsUIRX3EC0R6xQxGfcUMRHrDDUF4xQ4/dsQOPHnFEDl5yA46dssL" +
    "PHTMDj92zgtAdc8LQXbOCEJz0AVAc84GQnLOCEBvzAc/cssFQG/KB0JszAhBa8sJP2nNC0Bnzw0/" +
    "atAPQGjRDz9r1BA9adITP2jQED9l0BI8Ys4QPmXLEkBmzhU/Zc8TQWXOFj5o0Bg7adAWOGzQGDdt" +
    "zxc2cM4ZOW7MGjhxyxs4ccwcN3TMGTlzzRY2dMwVM3bMFTZ0yRc4dsoXN3bLFzp0zBc3dM8VOXTR" +
    "Eztx0hA5dNUQN3LXDjd01w80ddgNMnfbCjJ13Awzc98OMnLfDy9v3Awscd8LK3PfDCpw4A4rct0L" +
    "LnPdDTBx3g8ub+ERLW3fEi1r4Q8waeANLmnjEC9m5RExZOUPMWPnEjRk5BE1ZeIRNWjjDjhl4ww6" +
    "ZOEOPWPkC0Bl4w4+ZOILP2TjDUFl5g0+aOQKP2njCUFp4QZAZuQEPWbmBEBm5wM+Y+gBPWToAjxj" +
    "6v85Ze0BOGXv/jVl7P44Y+r9NmPs/jhi6QE5YOgDOGLlATtf5gE4XekCN1vsAjlY6gQ2W+0EN17t" +
    "BTZb7wI2XfD/OFzy/DZc9PwzX/H7NmDy/Tld9P87XfP/O171/zxc9f8/WvX/QV3y/kRa9ABFV/UC" +
    "SFX3BElV9AZMU/YGTFP5CE9S+QpRU/YLT1T0DE9W8Q9PVfMRTFTwD0xX7QxMV/ANTFTuDk1U8BFO" +
    "Ve8OTFLtD05V7BBLVu8TSVnuEkla7xNKXfESTV30FEpe9hdIX/MURlzxFkle8xlJXvQXSl/xGkth" +
    "8hhIYPAaSGDuF0dd7BhKWu0XR1zwF0Re7RVGW+4XR1jrFUpa6xVLV+oXSlrsFktX6RVIVecURVPq" +
    "FENR7RRETu8VR03yGEpP8RlJTvMXRk3zFkVK8RNCSe8VQUntFkRJ8BZHR/EZRUrwHEdK8xpETfIY" +
    "Q071FkVP9BRGTvUWRE33E0NL+hNGSP0WREf/GEJFARc/R/8VQUf9FkFJ+hlBRvocP0P4HUFF+RpB" +
    "QvkcQUP5HUBF9hpCQvgYQEL4FkFE+BRER/gUR0X6FUpH/RZLRgAZTkP/GFFE/RZPRPwXTUX5FU5C" +
    "+BRQRPYUUUf0FlNI9BlVSPIcVEnzH1ZH9h9XR/QhV0j3IVVF+CFSRfYfU0PzHlFE9R5OR/chTEn2" +
    "I0xG+CRLR/YjS0b5JUhD+iVKQvcmSD/6JkdA/SlHQQArSD/+KEc8/ipKPf0oRz8AJ0RCASRFQAEh" +
    "SEL/IkVE/iREQf8mRT4AKEdAAydEQAYoQUMFKENGBSlCSQMpREsFJkRNAydHTgImR0v/JEhK/SdF" +
    "SP0pRUn/KEdMAiZJTAUjSUsHJktNByNNUAYmTE0FKUpMBytNSgUqTUsHKEtNCilMTAwsTE0MKkxQ" +
    "Dy1NUg8sUFEPLk1PEjFNURAzTVETMk9OEjNNTxA0S1EQMk1UDjNLUxE1SVATMkxNFS9LTBQtTEoU" +
    "L01JEjJKRxMwSkkQLk1LDjFMSxEuTEoTME1IES9KSw4tSUoMLUlJDS5MTA8rSUsMKUdMDSxFSg8s" +
    "R0sRKUVLEiZDTBMoRUkQK0VLDyxISxIrRUgRLUNIECxBRRMqQkMULEVBFCpEQBQoRz4SKUU7DyhD" +
    "Ow4rRD0RKEE/Eyo/PRIqPj8RKT5AFCk9PhQpQD0UJkM8FiZGPRMoSToSJkk8EylIPRIrSj4VKkc+" +
    "FClHQBYmSUMZJkxGFydLRhUpTEMSK0xGFSxNRhMuS0cVLk1GEyxORhErS0gRKkhKFC1FSBEwR0kS" +
    "L0dKEzBJSBEzR0kTNUhKEzZGShA0SEsQM0pMEjNITRQ2SksTM0pOFjNHTRQwSk0VL0dMGDJGTRgx" +
    "RVAXL0VRGixGUx0pSFAeK0pSHC1HURstRk4dMENOHi5AUR8uQlAcLkFTHyxDViIqRVUkLENTJS9E" +
    "VigyRFcmMkNYJzJBWigxPl0mMz9cKTA8XSstPVoqKj5YKy1AWCorQVUsKj9WLC0+VywvQVcqLEBU" +
    "KylDVSkpRlMrKEhSKSpGVCYtRlEkMEVRJTNGUiQ2R1EnM0lOKDRMTiU2Sk4nNkdQKjVGUS04SFIw" +
    "NktRMDZJUi82SU8xOUxOLjtKUTE8TVE0PE5PNjtPTTk6TE05PEtONj5LTzRASUwyPkZNMD1FTTA+" +
    "RkouPEZNLjlHTy03RE8rNUFRLDJETik1QUwsNz5JLTlASSo4QEopO0BILDo+Ryo4PUUsOD9HLDpA" +
    "Rys3Q0QtNEJCLjM/RCswPUMsMj5BLDBARC8wQUYsL0JJKi9BRywtQEctK0JJLio/SjErQUo0LkNL" +
    "My1DSjAuQkgxL0BHMTJBRjIzQUgxMURKLy9HSzAvSkwuL0dJLTBERy0yQ0kuMUZGLi9DSDAsQUcw" +
    "Lj9IMTBARjEyQEMuMz9ELzY9Ri43QEYtNz5ELTo+Qyo5QEMrOUFCKDpDQSc9QkQmOz9DKT1BQyc6" +
    "QkQlPEBFIzk9QiI8PD8hOz08IDtAPCI9Qz4iO0Q8JTxEOSc8RzkoO0U7JjxCOCM/RDgiPkY5IkBH" +
    "OyJDRz4kQURBIkNFQCBARj4dP0NAIEFAPR9DQD4hQkI/HkBDPR5DRT0dQUVAGkBIPhpARjwaP0g5" +
    "GjxHNho7RjMaO0M1GDpBNhc3QDgUNUI4FDZENRI1RDcVMkc1EjBINxQvRToSLEc6Ey1FPRAvQ0AS" +
    "MUBAEC49Pw4vOz4OLDpADi85QxAvOEYNMjlFCjE5SAkyN0YILzZGByw5RgUqOUkEJztKBCU+TQQl" +
    "P0wHJz9LBSY9TggmQEsLKT9OCSc9TAgpO00LJz1MDSVASQwoP0oPJjxMDig8TRErOlATKzxTFCs+" +
    "VhEuPFkOLD9bDixAXBEtQlsOKj9eECg+XhAmPlsRKDxaESs7WA4pPFYQKzpVESs3WBMqNlUSKDdW" +
    "ECk5WA0oOVcPKDdZDSs3WwsuOVgLLDtZCC48VwctP1QHLj5XBi9AVQkwQlIGM0RVBzJCVwYxQVYF" +
    "MEFTAy4+UgQxPlIHMj1QCi88UAcwO08EMTxPBzM5Ugc0O1EFMjxTAjA/UwEvQFABMj1SATI+UgAx" +
    "O1EBLz1SADE6U/8vOFb+MjdYADE0WAIxM1b/LjBV/SszVvopM1f6KzZV+Ss3VfwtOlL7KjtR/Sk7" +
    "UvsrOlL4KDxQ+Ss9T/YqPlH2LT1P+DA+TPgtQU72LENQ9C9ATvctPU33LztL9S4+SfYvQEj0LUFF" +
    "8SxCR+8qREbsJ0NJ7CpBSOkpQUXmJ0NC5ylCQOopRD7nLEY76i1GPecsRz7lLko85S1NPuYuTz3l" +
    "MVE+5y9QPugtUT3qL1Q97TBVP+4tUz7vLlFB7itSQe8oVUDsJlhB7iRZQvAnWkTzKF1H8yhbSPAn" +
    "WEruKVlK6ylaTegrWkvnKVhL5CtVS+IqVUjgK1JI4ShQSeMqU0rkKVNJ5SlVSuYmUkvpJVFO7CdO" +
    "T+spT03sLFBM6S9NTOwwUEvtM09O6jNNUOcyTVDkM0pQ5zVHTeU3Sk/oNkhM6zhISuo4R0znOkVP" +
    "6TpFT+Y3Q1HkN0RU5jZCUeU2QU7oNkJL5zNETeUxQk3nNEVO5jFCTuk0Q1HrNkZU6zRDVe42QlXw" +
    "N0NY7zhGW/I5Rlv0N0ZY9ThEVfI3Q1jyNUFb8TU/W/A4QFvvNUFY8jRCW/MyRFzwMUVf8zBCYPUy" +
    "QF30NUBg8TZBY/EzQmTxNEFl7zQ/aPA3QWjxNEFp8DVBa+80P2vtNkFq6zk+aO48P2XsPTxo7kA7" +
    "aO09PWbqPEBm6z09aew9QGvpQEFu60JCb+pAQHDsQT9y60JCdOhARXLoPkhx6T9Hcuk8RHXoP0d0" +
    "5j5Id+k9SnXnPkh36EFGduo/R3jtQEp170NMdOxGTXfvSEt48UlJevNLSXvyTkh68UtKfPBMR37v" +
    "S0h78UtJefJOSHb0TUZ4809DePBSQXbyUkJz8lFCdfVTQHbzU0B18VRDdPNTQnX2UkN49lNEefhS" +
    "RHv2UkF69U8/evVMQHnzSkF58ExBfPFKRH3uR0N87UhEeu1GRnrsSER57UtBdvBOQ3TwT0N38lBE" +
    "d/JRRHfzUkJ49VBAePhTQ3n7UkN6+E9Ge/pNQ334TkCA9lE+gvhQP4T6TkCC+FA/hflOQof4T0KJ" +
    "+09BivtOQY37UEOP+FBAkfZRQpD1VEWO81FEjvFRQY7yUT+O8FQ/kfFTQJDxUUOP9FRDj/ZVRZL0" +
    "U0WV8lVHlfNTRJL0UEGV808+lPVQP5X0UD6W9VI7lPNSOZbzUjaU8FU5lO5UNpfwVDmV8FM4k/NS" +
    "N5b1VDiY81Q1l/VWNJbzWTKY8Vsylu9cMZXxWTSX81YxmPJWMpj0VTKW9lMyl/VVM5XzVjKV8lUz" +
    "k/VVNpP3VTSQ9FI2kPVVNZL1VzOS81cxkfZVMJL3UjOQ9FM2jfRQN4rxUTWI8VA0hfROMYfzTjKE" +
    "80sygfRKMYP0TDCF90kvgvdLMoP3TTGC+UowgPtLMYL5TjGC9lAzgPZQNoLzUTSD81E0hvRRNIP1" +
    "UzaB9FU3gPdSNIH5VDR/+lI1f/1QMn38UjF8/lAxfwBTLn4AVi5/A1MufwNUL34AVDCAAVIvgQFQ" +
    "Ln4CTS17AE4uff1QLnoAUjF5/lEuegBPL33/UTB8/VQwfABSMn79UTOAAFAzgwJNMIUDTzKFAVI1" +
    "iARPOIcBUTiJBE83hwJPNob/TzmJAE47iv9POYf/TjuJ/0s5i/5LO4v7ST2K+ks6iPlLN4f6SjqF" +
    "+Us9h/ZKOob4TTqH9U05h/JOOYbvUTqF8FE9gvJSPoLzUz2B9FA7fvNRPH7yVDp781E8ePVROXb4" +
    "UTh29VM2ePJQNXbvUzh47lM3e+5SNn7vVTl88FM6f+5SOoDwUjiA7lA1gO1SNn3vUjd/8lI0gfNR" +
    "NYH0VDiD8VE4gvJOOYT1TjyB9ks7g/dIO4L5STiE+Uo6g/xKN4X5TDaE+0k3gvpMNYP7TDKG/koy" +
    "ifxJMYz6RzGN+UQzkPpGMpL4RDKQ9kUvk/hDMZH6RjOR+EcyjvtJMo74SjSL+0kyifpJL4n3Sy+I" +
    "+EowhvZML4PzSyyC8U0qgfFPKIPyUCWE8E8nhPJPJIfzTSOE8Uogg/NIIIL1Sh+B9Uoif/hIIYH3" +
    "RyJ/+Uklf/pGJX/3RCOB+EclfvtJKH3+RyZ//kgmgQFHKH8ERCuBB0QugghHK4EFRSx+A0grgQZK" +
    "LYIDSTCDAUoxhAFMNIcESzKJAU0xigNNLocDTC2FBkoqiAdJKYoGSSqHBUgrhQJJKocESCeFBUsn" +
    "hARMKIIGTCWEA00lhABKJYYCRySDBUokhAhNJIMITSWACkokgQlJJoIJRyOCCUYifwhDJYIJRiSA" +
    "B0YmfgZIJXwERyh7BUYreAZFLXkDRi57AUcseAFGL3UASS50A0sucwBNLnb+Syt0AQ==")

  private val delta4Xz = java.util.Base64.getDecoder.decode(
    "/Td6WFoAAATm1rRGBMHtDoAgAwEDIQEWAAAAAOeAEZ7gD/8HZV0ABBAIp7/a9GIB5NAFHDG8RUUq" +
    "DDkwP3///AEj94Kd87RhU+aFnQHPDhY9VyFu1jqY3xJ9UOLD+yrGFBXsoUBAjyj5pD40CD2GJSp2" +
    "AJP13D4NLUkXF7cj7J0vys66ZtyDunfWmCYXfCcGoCWVJPXJwdgjTua5UIs2nW1VxoSy8oE7BGhc" +
    "WE5QI3a0lG6+3yF0cTUYSjV0WAQq11ofyk/PRZOpiMfC9bgUbxX92nbQcuQK77SVJdy7ENEff4OH" +
    "waHCr12byPS+yO89CRK86Ag/LC+ZnRAdawFomYVr8uL92n6BYs9JzO6taZa6o5cphcZDV3D3oXzd" +
    "NvSE05WX+bwqNw0xuxiFtXcYKzKW0b/Mv9fkMSCOy9gEj6fRNcT3bVBK4SZKj+c6P8ihEKWbcvFp" +
    "0dfyoyjURbZKZ9MsZcaNcxhN+gFEMnk+48+6/ovfUPxXsRb9QiujZUwwu4TdhLUrGXIePSAsyJgH" +
    "wf3vAb3v2SaOxqkVKMvTgCVafMRHgHp3ZnxrOKUpK4w1j3SwW7M52H7P/Vydr9o1CHzysUWfJH47" +
    "2iqBbiGEWuC8AW/RNQAYloqqbTexupUpUlsF7JQRswIjKFvCHvu3aYmLRnvPdsIGq5Kb6Bx9zC+7" +
    "sufWa+T7WMf6UcZK213ebfEXlu3AbJxZx5TXIZ27NdzAeaE4lycbPBB+KmyF89nlF4ONFbly5GYd" +
    "Ox8qsMzYZlTpetnVCKaQoR1uhRflDWUTFZ0qd1DO3mWWb54GvSgjRsvTrzC2oZl9c0wWqbm14z/J" +
    "aBE1FG2SUf2qtcc14jNzvTKXSfScXOyxA+vJ0KrQR7Oi4sHkZC2fiM1qU8uIEbRrSgegukdUU+sr" +
    "C8R5ALmReB3ARrCjFikhRbIen5vG7QsfmskXHAlD32iXQS8wyshr06YgQTGIsRC+Efw+kG08bG37" +
    "Jou2u7xnP+5q/OAv6Mr2n8u3hKsF9T24ZFpP1OjPHioyFqyFxi+5uOai+kfNmf3Usir8AZGvSv74" +
    "jdaxrTZ1pX4DSqZKHRAQhtPEvpxizd0SWLErtD1N00Mu8W3E4c+pgJjWOg5Yia6wXb7L3odDpyVC" +
    "pyq5kJTSoJxv5ITaJTZMZKlSFnkfEHBrNEVWkZRl5S0ggPGbYSWcC4cEXCtmg77+9KXfT4F1Ldhl" +
    "fql127BO03AaF+MB/iBzzr9+DhUPj+xIco9mVIQUEwmJ6wYMasMoUnzQYxFghFZGraFns0GXvsAo" +
    "5NgLv85ARnpv7iMquR4L0iX0YsczeV5qpSlqDYQgpCV0si3Y0gkKZcynbMFzZkiphbPMQjIqtZOV" +
    "ny1QwDjbzbz2Hf3IuIS4XSvxoDpo2UR34XZKqEo0jMrUXoMboqPxYLX4YjggXzff2ougILW0BL3c" +
    "oO3zLMxYGZNjSyHN1B/wVpOcYUs4M+enBVgMcQv8NgDoIF9++58rKk+VCpys9zgAnix+mWjiYQhR" +
    "rE4MgtjR70TIOX1Xd0F0jSdePHMySZrrOwhv0bmMxL9nuRXulPce9j6cO/whrgS7nxNwLe9vtL3U" +
    "oMUinpheW2hO0LVdwegHbuFZHJsz1kw1pi/QR2CBj/OD2XrVYs2OjG4lVE2YwkndmxUpOQp33dbA" +
    "BLY/QYwIYpeCJMRRJ+VQXTPbJe2rvIc3WYEEehuJEtWpkCPJM9NYUuaItEuzz9wRvdRbcG+6piLE" +
    "zFFMXC2ItXUkjwO4H9z1v/xUYMdocneB0JNbc2nY/JmTCuqjVFMzHZnjFOIIGIwQKlx02tn/+DmR" +
    "UPRgW/Vfxx2JFnMmJmXbOwEAy3jBqhCeQHQpkJrvP9QCFG7BwVw+xi8a9G4C8VJ0mDwXzZK33/rE" +
    "fRY8Qepjm/CGuMhRZOxxbPhKRTdhCttEgINIWMQfy7rEVTkyZVJhxpyY3mmWtMONBhMpKyz1Ryet" +
    "MDoC+tsEOiTmlC+3vE3qfv8h8IUyRsldMA32a6eRYbu6/ohP+2q9dz/9jKyEiV5TW81AwNQCT/9h" +
    "YdJ2XDg8Bda0M7sa9SFH5CdXVDhShcvoNd6JluQl/crGGkALMXfFj+r8hWb3KxqknSIZd8KaDzcQ" +
    "H4UOkEZN9OkkgLqLZ9aYboSZxEt5ryeKhqq+1smnBK94c01sdcjJ0fv7TpZw/ueGpcoT9C6Ev5an" +
    "15fQO4w3RPJ2LmCqnDwtJOty8VTSlSY6vX2Oj0Ww67DntIESgw3gFhsi5VhgKwL3gvgrc/zUKtWt" +
    "/pkYpJsjCXjbxqXkSNSg+PquSN4+fedTaDpHsvihbfKf4ETAG6MzZnAj6MkqeEe1GQAdpYl0/O/q" +
    "AOQtaTvYBVEfn3GPMULDQE5cX+5UxetFktlw4J41w3Vk+cKV41xChr49IJYpirz/LnIJybY+oVLH" +
    "oCbcuF2Ff7GJhiyYmp+RzhrM6FS02Rh2ps0IYlpW28rq9fQITlSMiP6gXgCgiaQW0sqCTVgpmZpA" +
    "pA4cGXzD2k8PojLJyzTrhMVeo3di+WUExZVw46KiMw7bXUTsWot/JpyvovZpTOZc7gYQAAAAAIuZ" +
    "+sXon3DUAAGJD4AgAADH9q6tscRn+wIAAAAABFla")

  private val chainXz = java.util.Base64.getDecoder.decode(
    "/Td6WFoAAATm1rRGBcLUH9AfAwEABAAhARQAAAAAAABxFh04AQ/PZg+3mGnNdFGt71J/ohqqx6cA" +
    "KTy1VOSQeACOb/qtAdcDcLlDIbbG7HKzUAqEax14mTnUxX1s4BOpC/GfYg6p/iwB32FJrqxmUzGV" +
    "/vSPEb2QywQ518CC/mL1LvE6UWaCtrSv/lWOpE6+d5NLRD6TAr7anJeOUJqFlA9ZMv4zxU/C7Gsu" +
    "gP+MF7HEAF0gSwkP0DYBPFAvLq3Wlv+1dBEM5r32aLcBd9zJxHzwuytHsSkDaljzR7SSZSnD6vo1" +
    "/6tmecO8ikOeXJwZq941GcNjWjbSBN3oUgD1OiOnOzTxJwSkTWNOgAaG3tAJL0KkAl8kZ73eegE7" +
    "jdXJqDt6J2KoDABPvd2+E0UBhKG6Ad4DxirblVDEad9no2OXbBECkVLC1L6VV21rMe0qIKfgcVdN" +
    "ATezX/bBAEZNQopnYnS27qmCigoBQral5d3u9TSvuiLMXr7Lp6YAKr7XIh0BO0rUCdg2PDeeMpCn" +
    "wdl//nZjegdDTNBy0wEY0mUIrP6574tkUnL7qgBQmFSDQQDC/6dM0nyen1X5tQDLeUxvnVGBOcAd" +
    "OAEieXkQH3Nf1D2ZRP4H4xcVOY1kqiAGALk2krvErqgh+6arsha9t2eTaDMpus2VcFFWAPZk7tA2" +
    "oU2PDdB4Xke4+OmKS3BaAsPEfdgDePN2hp4FEaBUCvKc+IEB+++q44kAZdqdJWAQEWfRkrICFFaa" +
    "hDTxXC3gWF/ELDWpWxJ7rOCxQrb29uTvss7yOkOd/rD02WsGcaL/yzid6dKwRJr8zk0ARm/J/G+/" +
    "vpoAKjCOfRaEALm/ZA18EBzfgHqqUnoJ0ZWwAelumQ4C6b5z5AKKNZu/2P06eP7RqIvXwJ1qqu0Q" +
    "FwJe+tBg9I7YB5nBqwdD6wFVyJa/+yhizifrCP6Bzqf3ws0SpsNJQ9VDUM8vqmYJ/ou8FgapKKru" +
    "LTGS6WcxP+6Kqk4xDzLtj1zt1i7Bn4X1/2VE/T+Rd9L0NbEPVgEL0JVz8I4fR6xEP/NLDcAARKX9" +
    "V8T/ivRt3Yi+2tNm4P+i8oM5cKKT1R4CBREAboX/9WOejKLqAHPSxae0OWEbWs2/Q8Ha5PxkMvTL" +
    "uhyAmf0AKPQQtLtSWXPu3lgNCIqH/olvRhTQjr9VllI5GxhpGJXszz1rcP9cgI99sClB/qZDUkx5" +
    "AL21DA7rv+XN7LhxAhmzYVNR/s/o69ePsQ8G6axmzNuKJIpzPXhj/295DoOGAHcFLiB0K5psQq6v" +
    "etwzymRoBNA1EpZE1a47GEYSR01ZrQxRtwLpwq9s/+lpbgkAqJgL9S6x4hMF+BFSG6/L4NAYLwAE" +
    "Wd2weemzAezHW3JIVh1mZUlELSmGDYf+jNmTD0hXQq+lxf/HfY9dnWpDe+ETakphARVJjOwt+wJq" +
    "+LtBAxw+v8tN8fmQb7A845hCRk12fDySXwxX6/4nWw1vLyxvzRQ2ANIecTKIUne9SLB18gDpwPBp" +
    "/uk+0GEA14hfDpmR8zFYkP7g0a7tndoZIgGgSkdLggLqrIbjAYr8YLRsFOKEaWLL7P+PoLr+kIgA" +
    "Vxnp2d4LMcsZDIsiIU+nABrfee+lboT6HDB1snmDXZ5k/EcZlYOYKLfaXKLwag0nGtYA4Qc1l0wA" +
    "dwtNtDOtX43sqDywERlg8Dj4b+7ZU/5+MzF9xqp1pc8HPwHqJXt1AenActj/vX8h3fIAHzsKRQRx" +
    "7z57ZaCsRjvMDgE2HeK3mY7fVyQvDELO220AUP0+os09Qx3lWBXyMfj9f2m5f90C6OsSPsbcsIkC" +
    "kGqx2FM/1YQCk/4tF8AgTr54CZQFcS7yKf7+ktWug4wkFK4e1zX9lPKvTuREatNPybhiJY8Agu97" +
    "RORLqvrn9Kx4/+kmJc7+6aDOpwEL+UKkAslMANSTgQspfBpwqJASrcgiIyuWOm7KiWoaNE+A/pcB" +
    "G21O0R0keUcgTtmFR6GEhIVriCb/ibHmokUwc4Cry2vasTcbnXEHAsApZPm8/wMcwCWbX9gzltos" +
    "qDvYeYNHPsdZZNSvDFeyAnhXcDbdY/npCFisaNro3nek7jZVekn/o/JS1YA1Wi7yVbpVsdBpLjI/" +
    "Lp3EefijNHYTo3RyyK52gGJC/DHTasKXddgHVqMeABhCIYOXqfrKx9ieqi8tvf+qm0Y5vWcLlHkA" +
    "mU92qfr/NmEYOeA9+wAT/oPMQ6CmIUmrAfg/Nexp1DSnsZtxvS2kSP4V+sMOCT8YwADg3JGWN8+m" +
    "/3IAvmZYPii9M97AXi80vsM2WPDS/vXcnqRgadDXR07g8Asz2/8Zjtdr2FnmAISaX76Bgu0RQmsf" +
    "DesAeqzDPvZQu9zNF545QQDPtgYEkT2I1IY8DE4iKNzYk+Q8eCgUPdQpqClF0DEdxBuHuCMIJur/" +
    "v8K1OOpkNZIeHLVmvPBXDkdEjf/ZgwiMFKwWgEDCrBb7NXgy/I50Wsq/HH5jqn1LnC4B2yc8JzHw" +
    "0QXxu6LyfwyiZrrRhcP/SER0up1r4cd/1Bsq/h6M03zA2C2VmQpW/4s1t5yQ93Oyw4EJL39HrLrr" +
    "pIFE4j4ntf6kRaNnDv+ZWUJPfGOHRx20/+hXqqcAfZ/XQLZEVX0Bu/kG5t5RRdXVRAH+KZYOJP/Z" +
    "0nndLUFuac5+h+Bs48r+9NRiGFeEKYIZmm4nAO8ADG0cGeZrjH+dQ0Izo/98EdCL/D7cAXS32kMF" +
    "oottriS3IpRzALl8Im6Wg2WN6cQjWq60VPA1cRcIhTcar1CI5ZVB+1SF63uxAHw5NHchfgCzNors" +
    "oQDjt1DBDkUCpgKl0uCdScn2oDZzVFDCl34DmP6LXEdHc7l94AEm/NgzmkeJWzG9HuSO7j7cTAVl" +
    "22gP5d3mjb/hf9bo5++C9LBcPX5aAaKzbXX3V3fCipypBLHATda5AAnbxaszz8vq107xAZ+qGdtm" +
    "DIwgjhIL/f5mVPE+ok8lAOnT/0j+zmwHxqUA9Ueiyq3/+3RM4DMzpkUzcmmZrSSAj+I6fk5xHmwA" +
    "NtUHfbYERAZufyv/eGuHwqqBknPYywCNzZCVZhkCVZSiaBD+5nFng5zrDa0RVt3Nbv+KJbRSg3o3" +
    "yy8cADY1f6YwQABmibwlZdQ5QeNdp9K8LEmALzXAYTg/5IipAo446kvsA38agP48kKfh/D7OhwUx" +
    "kFYA56WQhHPBM3TTUvPKMGxPLMf1vj+firw5Am55+Us4pArcrpNYziiTjeD2Q//pzSyP/wKbmjYU" +
    "i67NX8UbX2HmTq8SbhnLNf51dJ2xyv9nSaQzS8EcrkK6l0RGYnvdPWk4gbkoQYV/JlOAgS6a26lM" +
    "Hf2xagAzDyoRr3y8dvbh8+bIbCzQLpaN+P17KPDWympONawS2NhotW3qi9aGZ3Y8/kkZKiE8NOAB" +
    "AepBpDEAsY4EbDv+VMf+DtrghrT+WGA5k23sTWKIHOx+TpAuVwJgURPL8ys9g4kJAcFqTSjko295" +
    "l90THlTp7feT5PNunsl8/EsTEdcuABXKEBhJSSMuotebArxmKP4m0H03W3ibDFAMYOs3hmYWw3Ur" +
    "srcc6XIs31Wp/+W7VPUlruYJs2j1u/644kUtbn7+3wkx9fP/Sp/hHBgB2JjA1eTLDEEAux4UdKka" +
    "ocBvLMmJDn8ALKjZTmRw2EFmlWXMdUfhyQ3gHnVwCgSOM7GMgAgCQVOkkmTyqLJIqdHQTWIvFVes" +
    "/zjnzwT2Lim/AenJbL4AlRFDpkYpAvmAEXbkbffSz1Lc6AGUg9PikaIBI+97Bt76Ea6Jfbr4XMAC" +
    "jVUOC6Jldyal7rKRKqV3wKWQBF663la0/CUV0iIiAKoilhGY3x8M7ABrIO/JpauY0wHpBOg2eUIm" +
    "JNm+s6j/L6C0IURoMn0A6hIELIy62AC9jUwsCTrBMp7XPwT040UeN5Slk/ld/Q+3QDH4Mq5Rb15M" +
    "/vM3wBTPpKWaOWPmz/9D43rDhdEajCz/BDYbCnul9QHdcdRsoPWlvGXrx2QBgX63CmbE7PkwAfTt" +
    "goavb/kAXfsgBOiEUjnHi0R3Fbi9MWzxyYjjKgsAobvas4oYdQAB6OaFiAD3abxklOVy4FLYxuPF" +
    "7/kXrT6NTiDUk68mK5M8lhGVfnDxTkI0DdkDOwDJLgzlUM76AI2XlU8Acsdg8TcIBCFWB/+V+SQr" +
    "CVjeYe6NTQr+OKdSHD2KNcgcNAAJ/M3S3zry4cr06z3A7R+w9bnfBb7b7qvt5vHwKqhIZeENKAD2" +
    "a6UDh1nxVdP/T+iTnkBqmzxWugcA6VTDeAC87EA+qLx/R4h/4uroIJHCW5n6cgBvoQQ+8MnL3nD+" +
    "RUtoeAeMwNXj3b2gIhLtZ8T/FOD1d7rlAOp5ueUANHNCBG6iAijCwu1lAjVq4iYbhuZ8n0+pvH0E" +
    "bByUaf6f8mYDzcKrgKmqC/Rs5BNloV2eSJqHX4A/+Lf3aABpdfLjNhv3BQCO2DAm0Nvidm69gb3Y" +
    "AAgJMnom/inR8Cx3EUQU+XDV1KE3PQJANlCRmwfxpBFhAOZ5DE8Jn5D4C0HM/wbiD2GoAOkpR6n+" +
    "6NXqnwBefmvVC1CiV3mmZwgC6feDmwKtztY95Lna/H6J4Y5oIAGuoFWnDfc3tBLNeN6c9Pqrj/4H" +
    "LqH37K7JoACbU6H5AoGLiaC2RNpW48tr//st7NmzdfczqY/tnv5gAC9qhFkLwv9Yu0XmKBL6d8SK" +
    "ENYpFgGbTjJPlwBajuLjUwDpnanOAjbJcNSv02iphJVpN2EfMt4dL+UexBZfsf+SkHAnH9P/C8rt" +
    "JujJZAIMrRWX6ueExX1u7e2mAspM/+lz34FjYJcPxLrBmQIx0ZV5YWz/b6nJLNdsrQPapOlohTOQ" +
    "6Q31AR8CkSSWhn6b6tVVAlcPoLNZooCtY6Z3eCr+Lk0V28kJZoDFk3MT/+kA+JWL/yfk1m8Aq09k" +
    "rFnsQfcRkoMAAh9viOTKg2H6tIESS6Is/0+JEWyFJ/8jBcEN4Cv/Gkgd6GYblBpqAK1y3NeD15e8" +
    "bmaWbqEGAT0vcXuldCor+Rtu19KLxw8gOBpQ1ZS8yv6N/Rqr0Qoyjfwx7P4lupudWsWJwXH32+ZW" +
    "AMl+Qpwe05kyHGD0Cq2fpMgXV1l/Hfr9/IHJ6WUA8Q6cYIbQ/v952kSKcBbH9RdByYRIfh4uNsJE" +
    "mQihA+Y89v8JlreTPVGK/3Fxl//GLyXFJ+3DPKOyRVpBEjekzQ8FLz6hbdHhZgDVPTh5qVa7kX3C" +
    "VHLEwAMGXW6+LUN4JCGb+LTkfgAgWhxIDJkSawDqHHOK/j1unvEO1lcHdIJR4hUJFL9ndMoj2Pxv" +
    "SDw5pP6qX9NvACld/h/9WJfzHEI3nQDQypPi0QklSKoAL2clL7/VgQFD4LZYqJefKEhGXUKSnxCY" +
    "rE+hJgHmUz5UoR3fOtl1Urzrl0szAoZ88vlxSkK2q7UAeQ3N6jBN4wAIgQlmgOgdAgAB9B/QHwAA" +
    "VdLInrHEZ/sCAAAAAARZWg==")


  test("BCJ x86 filter: real `xz --x86` output decodes byte-identically") {
    assert(java.util.Arrays.equals(Xz.decode(x86Xz), x86Raw))
  }

  test("delta filter: real `xz --delta=dist=4` output decodes byte-identically") {
    assert(java.util.Arrays.equals(Xz.decode(delta4Xz), deltaRaw))
  }

  test("filter chain: real `xz --delta=dist=1 --x86 --lzma2` output decodes byte-identically") {
    assert(java.util.Arrays.equals(Xz.decode(chainXz), x86Raw))
  }

  test("Bra transforms: encode then decode is the identity on adversarial buffers") {
    val rnd = new scala.util.Random(20260818)
    for (trial <- 1 to 50) {
      val b = new Array[Byte](rnd.nextInt(4000) + 5)
      rnd.nextBytes(b)
      // salt with dense E8/E9 opcodes and 00/FF MSBs - the branchy paths
      for (_ <- 1 to b.length / 10) {
        val i = rnd.nextInt(b.length)
        b(i) = (if (rnd.nextBoolean()) 0xE8 else 0xE9).toByte
        if (i + 4 < b.length && rnd.nextBoolean())
          b(i + 4) = (if (rnd.nextBoolean()) 0 else 0xFF).toByte
      }
      val enc = b.clone()
      extractous.core.Bra.x86(enc, encoding = true)
      extractous.core.Bra.x86(enc, encoding = false)
      assert(java.util.Arrays.equals(enc, b), s"x86 trial $trial")
      val dl = b.clone()
      val dist = rnd.nextInt(8) + 1
      extractous.core.Bra.deltaEncode(dl, dist)
      extractous.core.Bra.deltaDecode(dl, dist)
      assert(java.util.Arrays.equals(dl, b), s"delta trial $trial")
    }
  }
}
