package graft.catalog

/** Per-record parameter evaluation — the reference's NiFi Expression
  * Language surface (`HiveSchemaGeneratorProperties.scala:24-42`,
  * evaluated against flowfile attributes at
  * `HiveSchemaGenerator.scala:65-73`) reduced to its data-flow essence:
  * `${attr}` placeholders in a template resolved against a record's
  * attribute map. Unknown attributes resolve to "" (NiFi EL behavior
  * for missing attributes).
  */
object Params {

  private val Placeholder = raw"\$$\{([^}]*)\}".r

  def resolve(template: String, attrs: Map[String, String]): String =
    Placeholder.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(attrs.getOrElse(m.group(1), "")))

  /** Validation mirroring the reference's non-empty property check
    * (`StandardValidators.NON_EMPTY_VALIDATOR`). */
  def requireNonEmpty(name: String, value: String): String = {
    require(value != null && value.nonEmpty, s"property '$name' must be non-empty")
    value
  }
}
