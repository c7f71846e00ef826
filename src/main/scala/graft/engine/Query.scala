package graft.engine

import scala.collection.Map

/** Validated query AST. A query is a JSON object with a fixed clause set
  * (reference: qcache/qframe/query.py:11-21,207-214); presence of `update`
  * switches to update mode (reference: qcache/qframe/__init__.py:74-77).
  */
final case class Query(
    select: Option[List[Any]] = None,
    where: Option[Any] = None,
    groupBy: Option[List[Any]] = None,
    distinct: Option[List[Any]] = None,
    orderBy: Option[List[Any]] = None,
    offset: Option[Any] = None,
    limit: Option[Any] = None,
    from: Option[Query] = None,
    update: Option[List[Any]] = None,
    xop: Option[Any] = None) {
  def isUpdate: Boolean = update.isDefined
}

object Query {
  private val Clauses = Set("select", "where", "group_by", "distinct",
    "order_by", "offset", "limit", "from", "update", "xop")

  def parse(json: String): Query = fromAny(QueryJson.parse(json))

  /** reference: qcache/qframe/query.py:208-214 — non-dict query and unknown
    * clause keys are errors. */
  def fromAny(v: Any): Query = v match {
    case m: Map[_, _] =>
      val q = m.asInstanceOf[Map[String, Any]]
      val unknown = q.keySet.diff(Clauses)
      if (unknown.nonEmpty)
        Errors.malformed(s"Unknown query clauses: ${unknown.mkString(", ")}")
      Query(
        select = listClause(q, "select"),
        where = q.get("where").filter(_ != null),
        groupBy = listClause(q, "group_by"),
        distinct = distinctClause(q),
        orderBy = listClause(q, "order_by"),
        offset = q.get("offset").filter(_ != null),
        limit = q.get("limit").filter(_ != null),
        from = q.get("from").map(fromAny),
        update = q.get("update") match {
          case Some(l: List[Any] @unchecked) => Some(l)
          case Some(other) => Errors.malformed("Invalid update clause", other)
          case None => None
        },
        xop = {
          val x = q.get("xop").filter(_ != null)
          if (x.isDefined && q.contains("update"))
            Errors.malformed("xop cannot be combined with update")
          x
        })
    case other =>
      Errors.malformed(s"""Query must be a dictionary, not "$other"""")
  }

  /** Clauses that must be lists when present; a falsy (empty) list is
    * equivalent to absence everywhere except `distinct`
    * (reference: query.py:196-204 vs :24-26,167-171). */
  private def listClause(q: Map[String, Any], name: String): Option[List[Any]] =
    q.get(name).filter(_ != null).map {
      case l: List[Any] @unchecked => l
      case other => Errors.malformed(s"Invalid format for $name", other)
    }.filter(_.nonEmpty)

  /** `distinct: []` means dedup on ALL columns — empty list is significant
    * (reference: query.py:196-204). */
  private def distinctClause(q: Map[String, Any]): Option[List[Any]] =
    q.get("distinct").filter(_ != null).map {
      case l: List[Any] @unchecked => l
      case other => Errors.malformed("Invalid format for distinct", other)
    }
}
