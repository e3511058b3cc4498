package graft.meta

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.model.VariableMeta

import scala.jdk.CollectionConverters._

/** Step-metadata layering + template render — the other half of the
  * reference's metadata system (MetaTable handles propagation; this handles
  * authoring):
  *
  *  - YAML step-meta files with `definitions.common` /
  *    `tables.<t>.common` / `tables.<t>.variables.<v>` layers, merged in
  *    that order over whatever metadata a column already carries
  *    (/root/reference/lib/catalog/owid/catalog/core/yaml_metadata.py:28-120);
  *  - `shared.meta.yml` definitions combined with setdefault semantics
  *    (yaml_metadata.py:139-175);
  *  - merge rules (yaml_metadata.py:178-210): scalars and lists overwrite,
  *    `presentation`/`grapher_config` dicts merge recursively;
  *  - an `.override.yml` applied last wins over everything
  *    (/root/reference/etl/helpers.py:183-186);
  *  - per-dimension template render of `{{ dim }}` placeholders and simple
  *    conditionals — the subset of Jinja the reference's VariableMeta.render
  *    uses for dimension expansion (core/meta.py:526-545). Full Jinja
  *    filters/loops are out of scope by design.
  *
  * Everything here is driver-side metadata bookkeeping — it never touches
  * the DataFrame, so it costs nothing at any data scale.
  */
object MetaLayering {

  type Meta = Map[String, Any]

  private val yamlMapper = new ObjectMapper(new YAMLFactory())

  /** Parse a YAML document into nested Scala maps/lists. */
  def parseYaml(s: String): Meta = {
    val node = yamlMapper.readValue(s, classOf[java.util.Map[String, Object]])
    toScala(node).asInstanceOf[Meta]
  }

  private def toScala(x: Any): Any = x match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> toScala(v) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other                => other
  }

  @inline private def asMeta(x: Any): Meta = x match {
    case m: Map[_, _] => m.asInstanceOf[Meta]
    case _            => Map.empty
  }

  /** Combine a shared.meta.yml with a step meta: shared definitions fill in
    * only where the step file has none (setdefault — yaml_metadata.py:160). */
  def mergeShared(shared: Meta, meta: Meta): Meta = {
    val sharedDefs = asMeta(shared.getOrElse("definitions", Map.empty))
    val stepDefs = asMeta(meta.getOrElse("definitions", Map.empty))
    meta + ("definitions" -> (sharedDefs ++ stepDefs))
  }

  /** Variable-level merge (yaml_metadata.py:178-210): `overlay` wins on
    * scalars and lists; `presentation`/`grapher_config` merge recursively. */
  def mergeVariable(base: Meta, overlay: Meta): Meta = {
    val mergeFields = Set("presentation", "grapher_config")
    overlay.foldLeft(base) { case (acc, (k, v)) =>
      if (mergeFields(k))
        acc + (k -> mergeVariable(asMeta(acc.getOrElse(k, Map.empty)), asMeta(v)))
      else acc + (k -> v)
    }
  }

  /** Layer a step-meta document over existing per-column metadata dicts:
    * existing ← definitions.common ← tables.<t>.common ←
    * tables.<t>.variables.<col>, per column (yaml_metadata.py:74-120).
    * With `extraVariables = "raise"`, YAML variables that do not exist as
    * columns fail fast (the reference's typo guard). */
  def applyLayers(
      existing: Map[String, Meta],
      annot: Meta,
      tableName: String,
      columns: Seq[String],
      extraVariables: String = "raise"
  ): Map[String, Meta] = {
    val tAnnot = asMeta(asMeta(annot.getOrElse("tables", Map.empty))
      .getOrElse(tableName, Map.empty))
    val commonDict = asMeta(asMeta(annot.getOrElse("definitions", Map.empty))
      .getOrElse("common", Map.empty))
    val tableCommon = asMeta(tAnnot.getOrElse("common", Map.empty))
    val variables = asMeta(tAnnot.getOrElse("variables", Map.empty))
    if (extraVariables == "raise") {
      val extra = variables.keySet -- columns.toSet
      require(extra.isEmpty,
        s"table $tableName has extra variables in step meta: ${extra.toSeq.sorted}")
    }
    columns.map { c =>
      val layered = mergeVariable(
        mergeVariable(
          mergeVariable(existing.getOrElse(c, Map.empty), commonDict),
          tableCommon),
        asMeta(variables.getOrElse(c, Map.empty)))
      c -> layered
    }.toMap
  }

  /** Table-level merge: every non-`variables`/`common` key overwrites
    * (yaml_metadata.py:213-218). */
  def applyTableMeta(existing: Meta, annot: Meta, tableName: String): Meta = {
    val tAnnot = asMeta(asMeta(annot.getOrElse("tables", Map.empty))
      .getOrElse(tableName, Map.empty))
    existing ++ (tAnnot -- Seq("variables", "common"))
  }

  /** Project the behavior-relevant typed subset out of a layered dict. */
  def toVariableMeta(m: Meta): VariableMeta = {
    def s(k: String) = m.get(k).collect { case v: String => v }
    VariableMeta(
      title = s("title"),
      unit = s("unit"),
      shortUnit = s("short_unit"),
      description = s("description").orElse(s("description_short")))
  }

  // ------------------------------------------------------------- render

  /** Render the metadata template for one dimension combination — delegates
    * to the [[Jinja]] subset engine (meta.py:526 dimension render; jinja.py's
    * custom `<% %>`/`<< >>` delimiters AND the legacy `{% %}`/`{{ }}` ones;
    * if/elif/else, set, macros, `~` concat, in/and/or/not, `is defined`,
    * default/capitalize/lower/upper/title/trim filters — the constructs the
    * reference's meta YAMLs measurably use). Unknown variables pass through
    * untouched so un-dimensioned strings survive rendering. */
  def render(template: String, dims: Map[String, String]): String =
    Jinja.render(template, dims)

  /** Render every string value in a layered metadata dict (recursing into
    * nested dicts/lists) for one dimension combination — the reference's
    * `VariableMeta.render(dim_dict)`. */
  def renderMeta(m: Meta, dims: Map[String, String]): Meta =
    m.map { case (k, v) => k -> renderAny(v, dims) }

  private def renderAny(v: Any, dims: Map[String, String]): Any = v match {
    case s: String    => render(s, dims)
    case mm: Map[_, _] => renderMeta(mm.asInstanceOf[Meta], dims)
    case l: List[_]   => l.map(renderAny(_, dims))
    case other        => other
  }
}
