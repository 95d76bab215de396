package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HtmlSpec extends AnyFunSuite with SparkSpec {

  private def extract(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Html.extractText($"t")).head.getString(0)
  }

  test("tags strip, entities decode") {
    assert(extract("<html><body><p class=\"x\">a &amp; b</p></body></html>")
      === "a & b")
    assert(extract("x &lt;tag&gt; &quot;q&quot; &#39;s&#39;")
      === "x <tag> \"q\" 's'")
  }

  test("decoded brackets are NOT re-stripped (decode runs after strip)") {
    // "&lt;b&gt;" is CONTENT that merely looks like a tag
    assert(extract("<p>&lt;b&gt;</p>") === "<b>")
  }

  test("&amp; decodes last: no double decoding") {
    // the HTML-encoded string "&lt;" must survive one decode as "&lt;"
    assert(extract("&amp;lt;") === "&lt;")
  }

  test("self-closing and attribute-bearing tags vanish; text joins") {
    assert(extract("a<br/>b<img src=\"u.png\" alt=\"\">c") === "abc")
  }

  test("bracket spans strip aggressively (documented regular-fragment scope)") {
    // a bare "<" with a later ">" IS treated as a tag — the regular
    // fragment cannot distinguish math from markup; a true unclosed
    // bracket survives
    assert(extract("5 < 6 and 7 > 3") === "5  3")
    assert(extract("5 < 6 forever") === "5 < 6 forever")
  }
}
