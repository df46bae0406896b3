package extractous.gen

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Writes the committed golden manifest (FIXTURES.md §3): expected extraction
  * per url computed from the ENGINE-INDEPENDENT generator manifest
  * (CorpusGen.expected*), never from the parsers. Regeneration is a reviewed
  * action:
  *   sbt "runMain extractous.gen.GoldenGen /root/testdata/sf0.001 src/test/resources/golden/corpus_sf0001.tsv"
  * Format: TSV, base64-coded text fields (no escaping ambiguity):
  *   doc_id \t lang \t b64(seed_text) \t b64(expected_text) \t status \t content_type
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val enc = Base64.getEncoder
    def b64(s: String) = enc.encodeToString(s.getBytes("UTF-8"))
    val sb = new StringBuilder
    rows.foreach { case (id, text, lang) =>
      sb.append(id).append('\t').append(lang).append('\t').append(b64(text)).append('\t')
        .append(b64(CorpusGen.expectedText(id, text, lang))).append('\t')
        .append(CorpusGen.expectedStatus(id)).append('\t')
        .append(CorpusGen.expectedContentType(id)).append('\n')
    }
    Files.createDirectories(Paths.get(outFile).getParent)
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[golden] wrote ${rows.length} rows to $outFile")
    spark.stop()
  }
}
