package graft

import graft.meta.MetaLayering
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's YAML-metadata layering tests
  * (/root/reference/lib/catalog/tests/test_yaml_metadata.py) and the
  * dimension-render behavior of VariableMeta.render (core/meta.py:526). */
class MetaLayeringSpec extends AnyFunSuite {
  import MetaLayering._

  val yamlCommon: String =
    """definitions:
      |  common:
      |    description_processing: Processed
      |    description_short: Default desc short
      |    display:
      |      numDecimalPlaces: 0
      |      conversionFactor: 2
      |    presentation:
      |      grapher_config:
      |        selectedEntityNames:
      |          - France
      |tables:
      |  test:
      |    title: Test table
      |    variables:
      |      a:
      |        description_short: A desc short
      |        display:
      |          numDecimalPlaces: 1
      |        presentation:
      |          attribution: A presentation attribution
      |          grapher_config:
      |            subtitle: A subtitle
      |""".stripMargin

  test("layering: definitions.common < tables.common < variables.<v>; " +
      "display overwrites, presentation merges (test_yaml_metadata.py)") {
    val annot = parseYaml(yamlCommon)
    val existing = Map(
      "a" -> Map[String, Any]("description_short" -> "Will be overwritten"),
      "b" -> Map[String, Any]("unit" -> "kg"))
    val out = applyLayers(existing, annot, "test", Seq("a", "b"))
    val a = out("a")
    assert(a("description_short") == "A desc short")
    assert(a("description_processing") == "Processed")
    // display REPLACES (conversionFactor gone), presentation MERGES deep
    assert(a("display") == Map("numDecimalPlaces" -> 1))
    assert(a("presentation") == Map(
      "grapher_config" -> Map(
        "selectedEntityNames" -> List("France"),
        "subtitle" -> "A subtitle"),
      "attribution" -> "A presentation attribution"))
    // b gets only the common layer; pre-existing fields survive
    val b = out("b")
    assert(b("unit") == "kg")
    assert(b("description_short") == "Default desc short")
    assert(b("display") == Map("numDecimalPlaces" -> 0, "conversionFactor" -> 2))
  }

  test("extra YAML variables raise unless extra_variables=ignore") {
    val annot = parseYaml(yamlCommon)
    intercept[IllegalArgumentException] {
      applyLayers(Map.empty, annot, "test", Seq("b")) // 'a' not a column
    }
    val ok = applyLayers(Map.empty, annot, "test", Seq("b"),
      extraVariables = "ignore")
    assert(ok.contains("b"))
  }

  test("table-level keys overwrite; variables/common excluded") {
    val annot = parseYaml(yamlCommon)
    val tm = applyTableMeta(Map("title" -> "Old", "short_name" -> "test"),
      annot, "test")
    assert(tm("title") == "Test table")
    assert(tm("short_name") == "test")
    assert(!tm.contains("variables"))
  }

  test("shared.meta.yml definitions fill in with setdefault semantics") {
    val shared = parseYaml(
      """definitions:
        |  common:
        |    unit: people
        |  extra_def: kept
        |""".stripMargin)
    val step = parseYaml(
      """definitions:
        |  common:
        |    unit: tonnes
        |""".stripMargin)
    val merged = mergeShared(shared, step)
    val defs = merged("definitions").asInstanceOf[Map[String, Any]]
    assert(defs("common") == Map("unit" -> "tonnes")) // step wins
    assert(defs("extra_def") == "kept")               // shared fills gap
  }

  test("override yml applied last wins over everything (helpers.py:183)") {
    val annot = parseYaml(yamlCommon)
    val overrideAnnot = parseYaml(
      """tables:
        |  test:
        |    variables:
        |      a:
        |        description_short: Overridden
        |""".stripMargin)
    val first = applyLayers(Map.empty, annot, "test", Seq("a"))
    val out = applyLayers(first, overrideAnnot, "test", Seq("a"))
    assert(out("a")("description_short") == "Overridden")
    assert(out("a")("description_processing") == "Processed") // untouched
  }

  test("render: {{dim}} substitution and if/elif/else conditionals") {
    val dims = Map("sex" -> "female", "age" -> "0-4")
    assert(render("Deaths of {{ sex }} aged {{age}}", dims) ==
      "Deaths of female aged 0-4")
    val cond = "{% if sex == 'male' %}Men{% elif sex == 'female' %}Women{% else %}People{% endif %} aged {{ age }}"
    assert(render(cond, dims) == "Women aged 0-4")
    assert(render(cond, Map("sex" -> "male", "age" -> "5")) == "Men aged 5")
    assert(render(cond, Map("sex" -> "all", "age" -> "5")) == "People aged 5")
    // bare-name truthiness
    assert(render("{% if age %}has age{% endif %}", dims) == "has age")
    assert(render("{% if missing %}x{% else %}y{% endif %}", dims) == "y")
    // unknown {{placeholders}} pass through untouched
    assert(render("{{ unknown }}", dims) == "{{ unknown }}")
  }

  test("renderMeta renders nested dicts and lists; typed projection") {
    val m = Map[String, Any](
      "title" -> "Population ({{ sex }})",
      "unit" -> "people",
      "short_unit" -> "",
      "presentation" -> Map[String, Any](
        "grapher_config" -> Map[String, Any](
          "subtitle" -> "Sex: {{ sex }}")),
      "description_key" -> List("About {{ sex }}", "static"))
    val r = renderMeta(m, Map("sex" -> "female"))
    assert(r("title") == "Population (female)")
    assert(r("presentation").asInstanceOf[Map[String, Any]]("grapher_config")
      .asInstanceOf[Map[String, Any]]("subtitle") == "Sex: female")
    assert(r("description_key") == List("About female", "static"))
    val vm = toVariableMeta(r)
    assert(vm.title.contains("Population (female)"))
    assert(vm.unit.contains("people"))
  }
}
