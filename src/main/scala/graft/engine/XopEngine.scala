package graft.engine

import scala.collection.Map

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Profile, Sampling, TextOps}

/** Extension-operator clause of the JSON dialect (SURVEY §7.5: extensions
  * are "additional operators in the same JSON dialect").
  *
  *   {"xop": {"name": "dedup_exact", "args": {"column": "text"}},
  *    "where": [...], "select": [...], ...}
  *
  * The xop runs first, producing a derived frame; every other clause of
  * the query then applies to that frame exactly as it would to a stored
  * table, so the pipeline operators compose with the reference dialect
  * (filter a dedup's survivors, order a profile, slice a sample…).
  *
  * Errors follow the reference's 400 taxonomy (MalformedQueryException →
  * HTTP 400): unknown operator name, missing/ill-typed args, absent
  * columns. Only the deterministic single-frame operators are exposed
  * here — pair-generation and ANN operators whose output is seed- or
  * index-shaped stay Scala-API (their results are not meaningfully
  * composable with the row-oriented clause set).
  */
object XopEngine {

  import ExprCompiler.RowId

  // ---------------------------------------------------------------- args

  private def argMap(spec: Map[String, Any], key: String): Map[String, Any] =
    spec.get(key) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case Some(other) => Errors.malformed(s"Invalid format for xop $key", other)
      case None => Map.empty[String, Any]
    }

  private def reqStr(args: Map[String, Any], key: String, op: String): String =
    args.get(key) match {
      case Some(s: String) => s
      case Some(other) => Errors.malformed(s"xop '$op': '$key' must be a string", other)
      case None => Errors.malformed(s"xop '$op': missing required argument '$key'")
    }

  private def column(df: DataFrame, args: Map[String, Any], key: String,
                     op: String): String = {
    val name = reqStr(args, key, op)
    if (!ExprCompiler.hasColumn(df, name))
      Errors.malformed(s"xop '$op': unknown column", name)
    name
  }

  private def intArg(args: Map[String, Any], key: String, default: Long,
                     op: String): Long = args.get(key) match {
    case Some(l: Long) => l
    case Some(d: Double) if d.isWhole => d.toLong
    case Some(other) => Errors.malformed(s"xop '$op': '$key' must be an integer", other)
    case None => default
  }

  private def doubleArg(args: Map[String, Any], key: String, op: String): Double =
    args.get(key) match {
      case Some(d: Double) => d
      case Some(l: Long) => l.toDouble
      case Some(other) => Errors.malformed(s"xop '$op': '$key' must be a number", other)
      case None => Errors.malformed(s"xop '$op': missing required argument '$key'")
    }

  private def boolArg(args: Map[String, Any], key: String, default: Boolean,
                      op: String): Boolean = args.get(key) match {
    case Some(b: Boolean) => b
    case Some(other) => Errors.malformed(s"xop '$op': '$key' must be a boolean", other)
    case None => default
  }

  /** Row-order column for keep-first semantics: explicit `order` arg, else
    * the hidden ingest-order column server tables carry. */
  private def orderCol(df: DataFrame, args: Map[String, Any], op: String): String =
    args.get("order") match {
      case Some(s: String) =>
        if (!ExprCompiler.hasColumn(df, s))
          Errors.malformed(s"xop '$op': unknown column", s)
        s
      case Some(other) => Errors.malformed(s"xop '$op': 'order' must be a string", other)
      case None =>
        if (ExprCompiler.hasColumn(df, RowId)) RowId
        else Errors.malformed(
          s"xop '$op': table has no ingest order — pass an 'order' column")
    }

  // ----------------------------------------------------------------- run

  def run(df: DataFrame, spec: Any): DataFrame = {
    val m = spec match {
      case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
      case other => Errors.malformed("Invalid format for xop", other)
    }
    val unknown = m.keySet.diff(Set("name", "args"))
    if (unknown.nonEmpty)
      Errors.malformed(s"Unknown xop keys: ${unknown.mkString(", ")}")
    val name = m.get("name") match {
      case Some(s: String) => s
      case Some(other) => Errors.malformed("xop name must be a string", other)
      case None => Errors.malformed("xop requires a 'name'")
    }
    val args = argMap(m, "args")

    def knownArgs(allowed: String*): Unit = {
      val extra = args.keySet.diff(allowed.toSet)
      if (extra.nonEmpty)
        Errors.malformed(s"xop '$name': unknown arguments: ${extra.mkString(", ")}")
    }

    name match {
      // keep the first row (ingest/order position) per normalized-text
      // fingerprint — one hash shuffle (Dedup.exactByText)
      case "dedup_exact" =>
        knownArgs("column", "order")
        Dedup.exactByText(df, column(df, args, "column", name), orderCol(df, args, name))

      // passage-level dedup: corpus-wide keep-first of token chunks,
      // documents rebuilt from surviving chunks (Dedup.dedupChunks)
      case "chunk_dedup" =>
        knownArgs("id", "column", "chunk_tokens")
        Dedup.dedupChunks(df, column(df, args, "id", name),
          column(df, args, "column", name),
          intArg(args, "chunk_tokens", 16, name).toInt)

      // whitespace + BPE-ish token counts appended per row
      case "text_tokens" =>
        knownArgs("column")
        val c = col(column(df, args, "column", name))
        df.withColumn("n_tokens", TextOps.tokenCount(c))
          .withColumn("n_bpe", TextOps.bpeTokenCount(c))

      // length/punct/stopword quality features + composite score
      case "text_quality" =>
        knownArgs("column")
        TextOps.qualityFeatures(df, column(df, args, "column", name))

      // stopword-argmax language id appended as `lang`
      case "text_langid" =>
        knownArgs("column")
        df.withColumn("lang", TextOps.langId(col(column(df, args, "column", name))))

      // normalized-text md5 fingerprint appended as `fingerprint`
      case "text_fingerprint" =>
        knownArgs("column")
        df.withColumn("fingerprint",
          TextOps.fingerprintMd5(col(column(df, args, "column", name))))

      // corpus vocabulary: top-k tokens by document frequency
      case "text_vocab" =>
        knownArgs("column", "k")
        TextOps.topTokens(df, column(df, args, "column", name),
          intArg(args, "k", 100, name).toInt)

      // deterministic ~fraction sample by id hash — map-only
      case "sample_fraction" =>
        knownArgs("id", "fraction")
        Sampling.fractionByHash(df, column(df, args, "id", name), {
          val f = doubleArg(args, "fraction", name)
          if (f < 0 || f > 1)
            Errors.malformed(s"xop '$name': fraction must be in [0,1]")
          f
        })

      // k hash-smallest rows per stratum (WindowGroupLimit)
      case "sample_stratified" =>
        knownArgs("id", "strata", "k")
        Sampling.stratifiedTopK(df, column(df, args, "strata", name),
          column(df, args, "id", name),
          intArg(args, "k", 100, name).toInt)

      // per-source mixture weights {"source": fraction, ...}
      case "sample_mixture" =>
        knownArgs("id", "source", "weights", "default")
        val weights = args.get("weights") match {
          case Some(w: Map[_, _]) =>
            w.asInstanceOf[Map[String, Any]].map {
              case (k, v: Double) => k -> v
              case (k, v: Long) => k -> v.toDouble
              case (_, other) =>
                Errors.malformed(s"xop '$name': weights must be numbers", other)
            }.toMap
          case Some(other) =>
            Errors.malformed(s"xop '$name': 'weights' must be an object", other)
          case None => Errors.malformed(s"xop '$name': missing required argument 'weights'")
        }
        val defaultW =
          args.get("default").map(_ => doubleArg(args, "default", name)).getOrElse(0.0)
        if ((weights.values ++ Seq(defaultW)).exists(w => w < 0 || w > 1))
          Errors.malformed(s"xop '$name': weights must be in [0,1]")
        Sampling.mixtureByHash(df, column(df, args, "id", name),
          column(df, args, "source", name), weights, defaultW)

      // one-pass per-column audit (counts, nulls, distinct, min/max)
      case "profile" =>
        knownArgs("approx")
        Profile.profile(df.drop(RowId), boolArg(args, "approx", default = false, name))

      case other =>
        Errors.malformed("Unknown xop", other)
    }
  }
}
