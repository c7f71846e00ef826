package graft.engine

/** Error taxonomy mirroring the reference's `MalformedQueryException`
  * (reference: qcache/qframe/common.py:4-10). API-level tests in the
  * reference assert on message substrings (e.g. "Unknown operator",
  * "Selected columns not in table"), so messages here keep that shape.
  */
final class MalformedQueryException(msg: String) extends RuntimeException(msg)

object Errors {
  /** reference: qcache/qframe/common.py:8-9 */
  def malformed(message: String, q: Any): Nothing =
    throw new MalformedQueryException(s"$message: ${render(q)}")

  def malformed(message: String): Nothing =
    throw new MalformedQueryException(message)

  /** Render a parsed query fragment roughly like Python's repr of the
    * original JSON, for readable error messages. */
  private def render(q: Any): String = q match {
    case s: String     => s
    case l: Seq[_]     => l.map(render).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => s"$k: ${render(v)}" }.mkString("{", ", ", "}")
    case null          => "null"
    case other         => other.toString
  }

  def assertLen(q: Seq[Any], expected: Int,
                message: String = "Invalid number of arguments"): Unit =
    if (q.length != expected) malformed(message, q)
}
