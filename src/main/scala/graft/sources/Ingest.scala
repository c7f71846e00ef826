package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Errors, ExprCompiler}

/** CSV / JSON ingest into DataFrames, replicating the reference's parsing
  * rules (reference: qcache/qframe/__init__.py:51-69, app.py:150-171):
  *   - CSV: header row; ONLY the empty string is null ("NA", "null", "NaN"
  *     etc. stay strings; reference: __init__.py:53, test_qframe.py:658-683)
  *   - JSON: a single array of records
  *   - per-column type hints: string | enum (dictionary-ish, equality-only)
  *     | float (reference: app.py:150-168)
  *   - stand-in columns: absent column synthesized from a constant or
  *     another column (reference: __init__.py:26-38)
  *
  * Every ingested frame carries a hidden `__row_id__` ingest-order column:
  * pandas row order is part of the reference's observable semantics
  * (pagination, distinct-keeps-first, serialization order) while Spark has
  * no implicit order — see SURVEY.md §7.4. Bodies are split driver-side
  * (CSV lines / lexed JSON records) and parallelized in contiguous slices,
  * so `monotonically_increasing_id` stays order-isomorphic to ingest order
  * while inference and parsing use every core.
  */
object Ingest {
  import ExprCompiler.RowId

  /** Marker raised inside the NDJSON line split when a line is not a
    * JSON object — surfaces through Spark's task-failure wrapping and is
    * unwrapped by [[badLineOf]] into the client's 400. Message = the
    * offending line's first 80 chars. */
  private[sources] final class BadNdjsonLine(line: String)
    extends RuntimeException(line)

  /** First [[BadNdjsonLine]] in `e`'s cause chain (Spark wraps executor
    * exceptions in SparkException layers), or None. */
  private[sources] def badLineOf(e: Throwable): Option[String] = {
    var cur = e
    var hops = 0
    while (cur != null && hops < 20) {
      cur match {
        case b: BadNdjsonLine => return Some(b.getMessage)
        case _ => cur = cur.getCause; hops += 1
      }
    }
    None
  }

  private def withRowId(df: DataFrame): DataFrame =
    df.withColumn(RowId, monotonically_increasing_id())

  /** Hint name → cast target (reference: app.py:155-166). Unknown hint names
    * are a client error. `timestamp` is a GRAFT EXTENSION (the reference
    * surface is string|float|enum only): without it an uploaded events
    * table can never carry a timestamp ts column, making the event-time
    * xops (retention, sessionize, rate_anomaly, interval_join)
    * unreachable over HTTP. With `extendedTypes = false` (the server's
    * strict-parity mode) the extension name reads the reference's exact
    * "Unrecognized type" 400. */
  private def applyTypeHints(df: DataFrame, types: Map[String, String],
                             extendedTypes: Boolean): DataFrame =
    types.foldLeft(df) { case (acc, (colName, hint)) =>
      if (!acc.columns.contains(colName)) acc
      else hint match {
        case "string" => acc.withColumn(colName, acc(colName).cast(StringType))
        case "float"  => acc.withColumn(colName, acc(colName).cast(DoubleType))
        case "enum" =>
          val meta = new MetadataBuilder().putBoolean("qcache_enum", true).build()
          acc.withColumn(colName, acc(colName).cast(StringType).as(colName, meta))
        case "timestamp" if extendedTypes =>
          acc.withColumn(colName, acc(colName).cast(TimestampType))
        case other => Errors.malformed(s"Unrecognized type: $other", colName)
      }
    }

  /** Stand-in constant dtype inference: int64 → float64 → string
    * (reference: __init__.py:14-23). */
  private def standInValue(df: DataFrame, value: String) =
    if (df.columns.contains(value)) col(value)
    else value.toLongOption.map(lit)
      .orElse(value.toDoubleOption.map(lit))
      .getOrElse(lit(ExprCompiler.unquote(value)))

  /** Applied at store AND query time (reference: test_api.py:530-560);
    * chained references work because application is sequential. */
  def addStandInColumns(df: DataFrame, standIns: Seq[(String, String)]): DataFrame =
    standIns.foldLeft(df) { case (acc, (name, value)) =>
      if (acc.columns.contains(name)) acc
      else acc.withColumn(name, standInValue(acc, value))
    }

  /** Split `body` into at most `parts` CONTIGUOUS chunks on '\n'
    * boundaries. The driver then does P substring copies instead of
    * materializing millions of per-line String objects (and parallelize
    * ships P strings instead of slicing a multi-million-element seq) —
    * the big-body store's driver-side cost drops from O(lines)
    * allocations to O(parts). Line order is preserved: chunk p holds
    * lines [a_p, b_p) and partition order follows chunk order. */
  private def lineChunks(body: String, parts: Int): Seq[String] = {
    val n = body.length
    val out = Seq.newBuilder[String]
    var start = 0
    var p = 1
    while (p <= parts && start < n) {
      var end = if (p == parts) n else math.max(start, (n.toLong * p / parts).toInt)
      if (end < n) {
        val nl = body.indexOf('\n', end)
        end = if (nl < 0) n else nl + 1
      }
      if (end > start) out += body.substring(start, end)
      start = end
      p += 1
    }
    if (start < n) out += body.substring(start)
    out.result()
  }

  def fromCsv(spark: SparkSession, body: String,
              types: Map[String, String] = Map.empty,
              standIns: Seq[(String, String)] = Nil,
              extendedTypes: Boolean = true): DataFrame = {
    // Lines are parallelized in CONTIGUOUS slices — chunk p holds lines
    // [a_p, b_p), and within a partition the per-chunk linesIterator
    // preserves body order — so monotonically_increasing_id
    // (partition << 33 | offset) stays order-isomorphic to ingest order,
    // the only property __row_id__ consumers rely on. This makes schema
    // inference AND the data parse multi-core where a coalesce(1) layout
    // would serialize the body onto one thread, and the chunked split
    // keeps the DRIVER's share at O(parts) substring copies (a 6M-line
    // body previously materialized 6M line objects on the driver and
    // shipped them through parallelize's seq slicing). The reference
    // trims nothing, but its test fixtures carry leading spaces pandas'
    // numeric parser tolerates, so we ignore them around values too.
    val nLines = body.count(_ == '\n') + 1
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      nLines / 20000))
    val chunks = lineChunks(body, parts)
    val lines = spark.createDataset(
      spark.sparkContext.parallelize(chunks, math.max(1, chunks.length))
        .flatMap(_.linesIterator.filter(_.nonEmpty)))(
      org.apache.spark.sql.Encoders.STRING)
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("nullValue", "")
      .option("emptyValue", "")
      // pandas keep_default_na=False: these spellings must NOT become null/NaN
      .option("nanValue", "\u0000never\u0000")
      .option("positiveInf", "\u0000never\u0000")
      .option("negativeInf", "\u0000never\u0000")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
      .csv(lines)
    withRowId(addStandInColumns(applyTypeHints(raw, types, extendedTypes),
      standIns))
  }

  /** Split a top-level JSON array body into its record substrings — a
    * single quote/escape-aware, depth-tracked lexical pass. Purely
    * syntactic: semantic validation stays with QueryJson.parse. Returns
    * None when the body is not a flat array of objects. */
  private[graft] def splitTopLevelRecords(body: String): Option[Seq[String]] = {
    val out = Seq.newBuilder[String]
    var i = 0; val n = body.length
    var depth = 0; var inStr = false; var esc = false
    var start = -1; var sawArray = false
    while (i < n) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' => depth += 1; if (depth == 1) sawArray = true
        case ']' => depth -= 1
        case '{' =>
          depth += 1
          if (depth == 2 && sawArray && start < 0) start = i
        case '}' =>
          depth -= 1
          if (depth == 1 && start >= 0) { out += body.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    if (sawArray && depth == 0) Some(out.result()) else None
  }

  def fromJsonRecords(spark: SparkSession, body: String,
                      types: Map[String, String] = Map.empty,
                      standIns: Seq[(String, String)] = Nil): DataFrame = {
    import graft.engine.QueryJson
    // One driver-side parse validates the body and pins the first record's
    // key order (Spark infers an alphabetical schema; serialization parity
    // with pandas from_records needs insertion order).
    val parsed = QueryJson.parse(body)
    // Parallel parse path: lex the array into record strings and spread
    // them in CONTIGUOUS slices (same order-isomorphism argument as
    // fromCsv) so Spark's schema inference AND data parse run multi-core
    // instead of single-partition on the whole body string.
    // Guard: the lexer only captures OBJECT elements, so a mixed array
    // ([{...}, 5, {...}]) would silently drop rows — require the lexed
    // record count to match the parsed element count, else fall back to
    // the single-string path whose row semantics are unchanged.
    val parsedLen = parsed match { case l: List[_] => l.length; case _ => -1 }
    val ds = splitTopLevelRecords(body) match {
      case Some(records) if records.nonEmpty && records.length == parsedLen =>
        val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
          records.length / 20000))
        spark.createDataset(spark.sparkContext.parallelize(records, parts))(
          org.apache.spark.sql.Encoders.STRING)
      case _ =>
        spark.createDataset(Seq(body))(
          org.apache.spark.sql.Encoders.STRING).coalesce(1)
    }
    val raw = spark.read.json(ds)
    val ordered = parsed match {
      case (first: scala.collection.Map[_, _]) :: _ =>
        val keys = first.keys.map(String.valueOf).toSeq
          .filter(raw.columns.contains)
        val rest = raw.columns.filterNot(keys.contains)
        raw.select((keys ++ rest).map(col): _*)
      case _ => raw
    }
    withRowId(addStandInColumns(applyTypeHints(ordered, types, extendedTypes = true), standIns))
  }

  /** Newline-delimited JSON (NDJSON / JSONL) — the de-facto LLM corpus
    * interchange format; an extension beyond the reference's CSV +
    * JSON-array surface. One JSON object per non-blank line (CRLF
    * tolerated). The line split IS the record lexer, so the parallel
    * parse needs no array scanning: lines spread in contiguous slices
    * (the fromCsv order-isomorphism argument) and Spark's JSON reader
    * infers + parses multi-core. Column order pins to the FIRST line's
    * key order like fromJsonRecords; unparseable lines are a 400, not
    * silent nulls. */
  def fromJsonLines(spark: SparkSession, body: String,
                    types: Map[String, String] = Map.empty,
                    standIns: Seq[(String, String)] = Nil): DataFrame = {
    import graft.engine.QueryJson
    // first non-empty line, driver-side without splitting the whole body
    // (the split is chunked and distributed below, like fromCsv)
    def firstNonEmptyLine(s: String): Option[String] = {
      var i = 0; val n = s.length
      while (i < n) {
        var j = s.indexOf('\n', i); if (j < 0) j = n
        val line = s.substring(i, j).trim
        if (line.nonEmpty) return Some(line)
        i = j + 1
      }
      None
    }
    val firstKeys: Seq[String] = firstNonEmptyLine(body) match {
      case None => Seq.empty
      case Some(l) =>
        val parsed = try QueryJson.parse(l) catch {
          case _: Exception =>
            Errors.malformed("NDJSON lines must be JSON objects", l.take(80))
        }
        parsed match {
          case m: scala.collection.Map[_, _] => m.keys.map(String.valueOf).toSeq
          case _ =>
            Errors.malformed("NDJSON lines must be JSON objects", l.take(80))
        }
    }
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (body.count(_ == '\n') + 1) / 20000))
    val chunks = lineChunks(body, parts)
    // every line must be an OBJECT: a line holding a JSON array is valid
    // JSON (no corrupt-record flag) but spark.read.json would explode it
    // into several rows, silently breaking the one-record-per-line
    // contract (fromJsonRecords guards the same hazard via lexer counts).
    // The guard rides INSIDE the line split — a violation aborts the
    // inference job already scanning every line, so the happy path pays
    // no extra pass and the driver's share stays O(parts). Inference
    // reads the full dataset (default samplingRatio 1.0), so once it
    // succeeds no later pass over the same lineage can trip the guard.
    val ds = spark.createDataset(
      spark.sparkContext.parallelize(chunks, math.max(1, chunks.length))
        .flatMap(_.linesIterator.map(_.trim).filter(_.nonEmpty).map { l =>
          if (!l.startsWith("{")) throw new Ingest.BadNdjsonLine(l.take(80))
          l
        }))(org.apache.spark.sql.Encoders.STRING)
    val raw =
      try spark.read.json(ds)
      catch {
        case e: Throwable if Ingest.badLineOf(e).isDefined =>
          Errors.malformed("NDJSON lines must be JSON objects",
            Ingest.badLineOf(e).get)
      }
    // a failed line surfaces as the corrupt-record column at inference
    // time — reject the whole body (the reference 400s malformed bodies)
    if (raw.columns.contains("_corrupt_record"))
      Errors.malformed("NDJSON body contains unparseable lines")
    val keys = firstKeys.filter(raw.columns.contains)
    val ordered = raw.select(
      (keys ++ raw.columns.filterNot(keys.contains)).map(col): _*)
    withRowId(addStandInColumns(applyTypeHints(ordered, types, extendedTypes = true), standIns))
  }
}
