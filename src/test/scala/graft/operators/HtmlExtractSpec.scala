package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, pct: Int = 50) = {
    val df = Seq((1L, html)).toDF("doc_id", "html")
    TextAnalysis.extractHtmlText(df, "doc_id", "html", maxLinkDensityPct = pct)
      .select("title", "html_text", "n_blocks", "n_kept_blocks")
      .as[(String, String, Long, Long)].head()
  }

  test("strips script/style/comments, keeps paragraph text, decodes entities") {
    val (title, text, nb, nk) = extract(
      "<html><head><title>My &amp; Page</title>" +
        "<style>p{color:red}</style><script>if(a<b){c()}</script></head>" +
        "<body><p>Tom &amp; Jerry say &quot;hi&quot;.</p>" +
        "<p>Second&nbsp;paragraph here.</p></body></html>")
    assert(title === "My & Page")
    assert(text === "Tom & Jerry say \"hi\".\nSecond paragraph here.")
    assert(nb === 2L && nk === 2L)
  }

  test("link-dense navigation and footer blocks are dropped") {
    val (_, text, nb, nk) = extract(
      "<body><div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/x\">About</a></div>" +
        "<p>Real content with a single <a href=\"/ref\">link</a> inside a " +
        "much longer sentence of running prose.</p>" +
        "<div class=\"footer\"><a href=\"/tos\">Terms</a></div></body>")
    assert(text.startsWith("Real content"))
    assert(!text.contains("Home") && !text.contains("Terms"))
    assert(nb === 3L && nk === 1L)
  }

  test("block tags segment; inline tags do not") {
    val (_, text, nb, _) = extract(
      "<p>One <b>bold</b> and <i>italic</i> run.</p><p>Two.</p>")
    assert(text === "One bold and italic run.\nTwo.")
    assert(nb === 2L)
  }

  test("maxLinkDensityPct=100 keeps even pure-link blocks") {
    val (_, text, _, nk) = extract(
      "<div><a href=\"/\">Home</a></div><p>Body text.</p>", pct = 100)
    assert(text === "Home\nBody text.")
    assert(nk === 2L)
  }

  test("null and tagless inputs are safe") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "just plain text"))
      .toDF("doc_id", "html")
    val byId = TextAnalysis.extractHtmlText(df, "doc_id", "html")
      .select("doc_id", "html_text").as[(Long, String)].collect().toMap
    assert(byId(1L) === "")
    assert(byId(2L) === "just plain text")
  }

  test("extraction plan is a pure projection: no Exchange, no Join") {
    val df = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    val plan = TextAnalysis.extractHtmlText(df, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
