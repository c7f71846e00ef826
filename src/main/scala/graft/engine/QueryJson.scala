package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** JSON → plain Scala tree (LinkedHashMap / List / String / Long / Double /
  * Boolean / null). The reference's IR *is* the decoded JSON dict
  * (reference: qcache/qframe/query.py:207-226); we keep the same shape and
  * compile it to Catalyst plans instead of interpreting it eagerly.
  */
object QueryJson {
  private val mapper = new ObjectMapper()

  def parse(json: String): Any =
    try fromJava(mapper.readValue(json, classOf[Object]))
    catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        Errors.malformed(s"Invalid query JSON: ${e.getOriginalMessage}")
    }

  def write(v: Any): String = mapper.writeValueAsString(toJava(v))

  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      val lm = mutable.LinkedHashMap.empty[String, Any] // preserve clause order
      m.forEach((k, value) => lm(String.valueOf(k)) = fromJava(value))
      lm
    case l: java.util.List[_]   => l.asScala.map(fromJava).toList
    case i: java.lang.Integer   => i.longValue
    case i: java.math.BigInteger => i.longValue
    case d: java.math.BigDecimal => d.doubleValue
    case f: java.lang.Float     => f.doubleValue
    case other                  => other // String, Long, Double, Boolean, null
  }

  private def toJava(v: Any): Object = v match {
    case m: scala.collection.Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Object]()
      m.foreach { case (k, value) => jm.put(String.valueOf(k), toJava(value)) }
      jm
    case l: Seq[_] => l.map(toJava).asJava
    case other     => other.asInstanceOf[Object]
  }
}
