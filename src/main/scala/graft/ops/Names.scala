package graft.ops

import java.text.Normalizer

/** Column-name normalization — Scala re-expression of the reference's
  * `underscore` (/root/reference/lib/catalog/owid/catalog/core/utils.py:137-268)
  * and `Table.underscore` (core/tables.py:1483-1551).
  *
  * Pure driver-side string functions: they feed golden column names, so the
  * rules are ported exactly (unicode de-accent, punctuation mapping,
  * camelCase split, collapse underscores).
  */
object Names {

  /** Slugify a name to a valid snake_case identifier. */
  def underscore(name: String, camelToSnake: Boolean = false): String = {
    var n = name.trim
    if (camelToSnake) n = camelCaseToSnakeCase(n)
    // strip accents (NFKD then drop combining marks)
    n = Normalizer
      .normalize(n, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}", "")
    n = n.toLowerCase
    // common punctuation → underscore or dropped (mirrors utils.py:152-230)
    n = n
      .replace("%", "pct")
      .replace("+", "plus")
      .replaceAll("[''`\"]", "")
      .replaceAll("[\\s\\-\\./,:;!?()\\[\\]{}<>=|@#$^&*~\\\\]+", "_")
    // anything still non [a-z0-9_] → underscore
    n = n.replaceAll("[^a-z0-9_]", "_")
    // collapse runs, trim edges
    n = n.replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")
    // identifiers must not start with a digit (utils.py:299 validation)
    if (n.nonEmpty && n.head.isDigit) "_" + n else n
  }

  private def camelCaseToSnakeCase(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2")

  /** Validation analogue of `validate_underscore` (core/utils.py:299). */
  def isValid(name: String): Boolean =
    name.matches("[a-z_][a-z0-9_]*")

  /** Underscore all column names; `collision` ∈ raise|rename|ignore, per
    * Table.underscore(collision=...) (core/tables.py:1483-1551).
    */
  def underscoreAll(
      names: Seq[String],
      camelToSnake: Boolean = false,
      collision: String = "raise"
  ): Seq[String] = {
    val out = names.map(underscore(_, camelToSnake))
    val dups = out.groupBy(identity).filter(_._2.size > 1).keys.toSet
    if (dups.isEmpty) out
    else
      collision match {
        case "raise" =>
          throw new IllegalArgumentException(
            s"name collision after underscore: ${dups.mkString(", ")}")
        case "rename" =>
          val seen = scala.collection.mutable.Map.empty[String, Int]
          out.map { n =>
            val k = seen.getOrElse(n, 0)
            seen(n) = k + 1
            if (k == 0) n else s"${n}_$k"
          }
        case _ => out
      }
  }
}
