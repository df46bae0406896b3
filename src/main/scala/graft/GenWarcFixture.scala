package graft
/** One-shot fixture generator for the spark-submit smoke (not driver contract). */
object GenWarcFixture {
  def main(args: Array[String]): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    Seq(30L, 31L, 32L).foreach { id =>
      extractous.gen.CorpusGen.warcRecords(id, "submit path check text", "en")
        .foreach(r => out.write(extractous.gen.CorpusGen.gzMember(r)))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(args(0)).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)), out.toByteArray)
    println(s"[gen] wrote ${args(0)}")
  }
}
