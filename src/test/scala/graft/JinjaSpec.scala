package graft

import graft.meta.Jinja
import org.scalatest.funsuite.AnyFunSuite

/** Jinja-subset engine tests — every template shape here is modeled on REAL
  * usage found in the reference's meta YAMLs (custom `<% %>`/`<< >>`
  * delimiters per /root/reference/lib/catalog/owid/catalog/core/jinja.py:
  * 25-35; construct census over /root/reference/etl/steps measured ~2,800
  * elif, ~450 set, 36 macro, filters capitalize/default only). */
class JinjaSpec extends AnyFunSuite {

  test("legacy {{dim}} substitution; unknown names pass through untouched") {
    assert(Jinja.render("Deaths - {{sex}} - {{age}}",
      Map("sex" -> "male", "age" -> "15-49")) == "Deaths - male - 15-49")
    assert(Jinja.render("keep {{unknown}} text", Map("sex" -> "m"))
      == "keep {{unknown}} text")
    assert(Jinja.render("plain text, no tags", Map.empty) == "plain text, no tags")
  }

  test("reference delimiters: if/elif/else with and/or, parens, !=") {
    val t = "<% if (sex == 'total') and (age == 'total') %>All people" +
      "<% elif sex == 'male' %>Men<% else %>Other<% endif %>"
    assert(Jinja.render(t, Map("sex" -> "total", "age" -> "total")) == "All people")
    assert(Jinja.render(t, Map("sex" -> "male", "age" -> "x")) == "Men")
    assert(Jinja.render(t, Map("sex" -> "female", "age" -> "x")) == "Other")
    assert(Jinja.render("<% if age != \"total\" %>aged << age >><% endif %>",
      Map("age" -> "15-49")) == "aged 15-49")
  }

  test("set + ~ concat + capitalize filter (GBD cause/sex pattern)") {
    val t = "<% set base = \"current cases of \" ~ sex ~ \" with \" ~ cause %>" +
      "<< base | capitalize >>"
    assert(Jinja.render(t, Map("sex" -> "males", "cause" -> "malaria"))
      == "Current cases of males with malaria")
  }

  test("in operator with | default('') guard on a possibly-missing dim") {
    val t = "<% if 'rate' in indicator | default('') %>Rate<% else %>Count<% endif %>"
    assert(Jinja.render(t, Map("indicator" -> "death_rate")) == "Rate")
    assert(Jinja.render(t, Map("indicator" -> "deaths")) == "Count")
    assert(Jinja.render(t, Map.empty) == "Count") // undefined -> default('')
  }

  test("inline conditional expression in set (age_str pattern)") {
    val t = "<% set age_str = '≤12' if age == '12-' else age %><< age_str >>"
    assert(Jinja.render(t, Map("age" -> "12-")) == "≤12")
    assert(Jinja.render(t, Map("age" -> "25-34")) == "25-34")
  }

  test("is defined / is not defined") {
    val t = "<% if (variant is defined) and (variant != 'estimates') %>" +
      "<< variant >> projection<% endif %>"
    assert(Jinja.render(t, Map("variant" -> "high")) == "high projection")
    assert(Jinja.render(t, Map("variant" -> "estimates")) == "")
    assert(Jinja.render(t, Map.empty) == "")
    assert(Jinja.render("<% if x is not defined %>missing<% endif %>",
      Map.empty) == "missing")
  }

  test("macro definition + call with args and default param") {
    val t = "<% macro fmt(cause, unit='people') %>" +
      "<% if cause == 'flu' %>influenza<% else %><< cause >><% endif %>" +
      " (<< unit >>)<% endmacro %><< fmt('flu') >> / << fmt('tb', 'cases') >>"
    assert(Jinja.render(t, Map.empty) == "influenza (people) / tb (cases)")
  }

  test("dotted lookup into nested maps (definitions.* pattern)") {
    val ctx = Map("definitions" ->
      Map("notes" -> Map("historic" -> "Historic estimates are uncertain.")))
    assert(Jinja.render("{{ definitions.notes.historic }}", ctx)
      == "Historic estimates are uncertain.")
    assert(Jinja.render("<< definitions.notes.historic >>", ctx)
      == "Historic estimates are uncertain.")
  }

  test("string method calls: rei.lower() concat (attrText pattern)") {
    // the real YAML guards with a default set + conditional re-set
    val t = "<% set attrText = \"\" %><% if rei is defined %>" +
      "<% set attrText = \" attributed to \" ~ rei.lower() %><% endif %>" +
      "deaths<< attrText >>"
    assert(Jinja.render(t, Map("rei" -> "High Sodium"))
      == "deaths attributed to high sodium")
    assert(Jinja.render(t, Map.empty) == "deaths")
  }

  test("nested if blocks") {
    val t = "<% if a == 'x' %>A<% if b == 'y' %>+B<% endif %><% else %>none<% endif %>"
    assert(Jinja.render(t, Map("a" -> "x", "b" -> "y")) == "A+B")
    assert(Jinja.render(t, Map("a" -> "x", "b" -> "z")) == "A")
    assert(Jinja.render(t, Map("a" -> "q")) == "none")
  }

  test("whitespace control: trim markers and trim_blocks newline swallow") {
    assert(Jinja.render("a <%- if t %>\nb<%- endif %>", Map("t" -> "1")) == "ab")
    // trim_blocks: the newline AFTER a block tag is swallowed (reference env)
    assert(Jinja.render("<% if t %>\nline<% endif %>\n", Map("t" -> "1"))
      == "line")
    // lstrip_blocks: indentation before a block tag on its own line stripped
    assert(Jinja.render("x\n  <% if t %>y<% endif %>", Map("t" -> "1")) == "x\ny")
  }

  test("comments are dropped; filters lower/upper/title/trim") {
    assert(Jinja.render("a<# ignore me #>b", Map.empty) == "ab")
    // legacy jinja2 comment delimiters are dropped too (a legacy-delimiter
    // template's comments must not leak into rendered metadata), including
    // in a template with no other tags (the render fast path)
    assert(Jinja.render("a{# ignore me #}b", Map.empty) == "ab")
    assert(Jinja.render("x{# only a comment #}", Map.empty) == "x")
    assert(Jinja.render("{{ s }}{# c #}", Map("s" -> "v")) == "v")
    assert(Jinja.render("<< s | upper >>", Map("s" -> "abc")) == "ABC")
    assert(Jinja.render("<< s | title >>", Map("s" -> "big bang")) == "Big Bang")
    assert(Jinja.render("<< s | trim >>", Map("s" -> "  x ")) == "x")
  }

  test("malformed templates terminate: render or throw, never hang or corrupt") {
    val ctx = Map("x" -> "1", "a" -> "A")
    def outcome(t: String): String =
      try Jinja.render(t, ctx) catch { case e: Exception => "THREW" }
    // plain text with template-ish noise must pass through untouched
    assert(Jinja.render("text with { brace } and % signs", ctx)
      == "text with { brace } and % signs")
    assert(Jinja.render("'quotes' in \"text\"", ctx) == "'quotes' in \"text\"")
    // malformed tags: any terminating outcome is acceptable, silence is not
    for (t <- Seq("{% if x %}unclosed", "<% endif %>orphan", "<< a ~ >>",
        "<% if x == 'a' and %>bad<% endif %>", "{{}}", "<< >>"))
      outcome(t) // must return (not hang); value unspecified
    // an unclosed if renders its taken branch
    assert(outcome("{% if x %}body") == "body")
  }

  test("MetaLayering.render delegates: old subset still renders identically") {
    import graft.meta.MetaLayering
    val t = "{% if sex == 'male' %}Men{% elif sex == 'female' %}Women" +
      "{% else %}All{% endif %} - {{age}}"
    assert(MetaLayering.render(t, Map("sex" -> "male", "age" -> "30")) == "Men - 30")
    assert(MetaLayering.render(t, Map("sex" -> "female", "age" -> "30")) == "Women - 30")
    assert(MetaLayering.render(t, Map("sex" -> "all", "age" -> "30")) == "All - 30")
  }
}
