package graft.etl

import scala.util.matching.Regex

/** Templated column-set creation.
  *
  * Reference: gerrydb_etl/bootstrap/templated_columns.py:27-58 renders
  * a Jinja TabularConfig — column names, aliases and descriptions are
  * templated by vintage/dataset — and creates the rendered column set.
  * Here the template language is plain `${var}` substitution (the
  * reference uses only simple variable interpolation too) over the
  * declarative [[ColumnSpec]]s, so one template serves every vintage.
  */
object Templates {

  private val VarPattern: Regex = raw"\$$\{([A-Za-z0-9_]+)\}".r

  /** Substitute `${name}` occurrences; unbound variables are an error
    * (a silently-unrendered column name would corrupt a whole import,
    * so fail fast like the reference's StrictUndefined Jinja env).
    */
  def render(template: String, vars: Map[String, String]): String =
    VarPattern.replaceAllIn(
      template,
      m =>
        Regex.quoteReplacement(
          vars.getOrElse(m.group(1), sys.error(s"unbound template variable: ${m.group(1)}"))
        )
    )

  /** Render every templated field of a column-spec list into a
    * concrete [[TableSpec]] for one vintage/dataset binding.
    */
  def renderSpec(columns: Seq[ColumnSpec], vars: Map[String, String]): TableSpec =
    TableSpec(
      columns.map(c =>
        c.copy(
          source = render(c.source, vars),
          target = render(c.target, vars),
          aliases = c.aliases.map(render(_, vars)),
          description = render(c.description, vars)
        )
      )
    )
}
