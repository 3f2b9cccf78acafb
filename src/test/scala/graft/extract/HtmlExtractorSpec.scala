package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** HTML boilerplate stripping (FIXTURES.md F-HTML; density heuristics per
  * Boilerpipe, Kohlschütter et al. WSDM 2010; title decoration per
  * reference core/processors/document_processor.py:192-196).
  */
class HtmlExtractorSpec extends AnyFunSuite {

  test("article with nav/footer chrome keeps only content") {
    val html =
      """<html><head><title></title><script>if (1<2) track();</script></head>
        |<body>
        |<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
        |<h1>Carbon Report</h1>
        |<p>This is the main article body with enough words to matter.</p>
        |<p>Second paragraph talks about lifecycle emissions in detail.</p>
        |<footer><p>Copyright <a href="/l">Legal</a></p></footer>
        |</body></html>""".stripMargin
    assert(HtmlExtractor.extract(html, markdown = false) ==
      "Carbon Report\n\n" +
        "This is the main article body with enough words to matter.\n\n" +
        "Second paragraph talks about lifecycle emissions in detail.")
  }

  test("markdown mode decorates headings with '# '") {
    val html = "<body><h2>Title Here</h2><p>Body text with several words here.</p></body>"
    assert(HtmlExtractor.extract(html, markdown = true) ==
      "# Title Here\n\nBody text with several words here.")
    assert(HtmlExtractor.extract(html, markdown = false) ==
      "Title Here\n\nBody text with several words here.")
  }

  test("nav-only page extracts to empty (span dropped)") {
    val html = "<body><nav><a href=\"/\">Home</a> <a href=\"/b\">Blog</a></nav></body>"
    assert(HtmlExtractor.extract(html, markdown = false) == "")
  }

  test("inline link below density threshold is kept, link farm dropped") {
    val kept = "<p>A sentence mentioning the <a href=\"/x\">report</a> in passing context.</p>"
    assert(HtmlExtractor.extract(kept, markdown = false) ==
      "A sentence mentioning the report in passing context.")
    val farm = "<p><a href=\"/1\">Home</a> <a href=\"/2\">About</a> <a href=\"/3\">Contact</a> <a href=\"/4\">Login</a></p>"
    assert(HtmlExtractor.extract(farm, markdown = false) == "")
  }

  test("nested boilerplate containers drop their content") {
    val html = "<aside><div><p>Sponsored content block with plenty of words.</p></div></aside><p>Real body text follows here now.</p>"
    assert(HtmlExtractor.extract(html, markdown = false) ==
      "Real body text follows here now.")
  }

  test("scripts, styles, comments stripped; entities decoded") {
    val html = "<style>p { x: 1 }</style><!-- hidden --><p>Fish &amp; Chips &lt;tasty&gt; &#65;&nbsp;ok</p>"
    assert(HtmlExtractor.extract(html, markdown = false) ==
      "Fish & Chips <tasty> A ok")
  }

  test("quoted '>' inside attributes does not break the lexer") {
    val html = "<p data-x=\"a > b\">Attr content survives fine here.</p>"
    assert(HtmlExtractor.extract(html, markdown = false) ==
      "Attr content survives fine here.")
  }

  test("empty / null input") {
    assert(HtmlExtractor.extract("", markdown = false) == "")
    assert(HtmlExtractor.extract(null, markdown = false) == "")
    assert(HtmlExtractor.extract("plain text no tags at all here", markdown = false) ==
      "plain text no tags at all here")
  }
}
