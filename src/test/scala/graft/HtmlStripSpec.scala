package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** stripHtml edge semantics: block removal, entity decode ORDER
  * (ampersand last), comments, plain-text passthrough. */
class HtmlStripSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.stripHtml(col("t"))).as[String].head()

  test("script/style CONTENT dies, body text survives") {
    assert(strip("<p>keep</p><script>drop < this</script><b>also keep</b>") ===
      "keep also keep")
    assert(strip("<style>h1 { font: x; }</style>text") === "text")
    assert(strip("before<!-- secret -->after") === "before after")
  }

  test("entities decode with ampersand last: &amp;lt; is literal '&lt;'") {
    assert(strip("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s") ===
      "a & b <tag> \"q\" 's")
    assert(strip("&amp;lt;") === "&lt;")
  }

  test("plain text passes through normalized") {
    assert(strip("  no   markup here  ") === "no markup here")
  }
}
