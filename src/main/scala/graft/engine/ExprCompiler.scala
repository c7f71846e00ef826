package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the reference's expression trees into Catalyst `Column`s.
  *
  * Two grammars share the leaf rules (bare string = column reference,
  * quoted string = string literal, number = literal;
  * reference: qcache/qframe/pandas_filter.py:15-25, common.py:27-41):
  *  - `where` boolean trees (reference: pandas_filter.py:132-163)
  *  - `select` alias/computed-column expressions (reference: query.py:78-116)
  *
  * Everything compiles to built-in Catalyst expressions (whole-stage
  * codegen'd); there are no UDFs anywhere in the engine.
  */
object ExprCompiler {

  /** Hidden ingest-order column carried by server-ingested tables for
    * pandas-parity row order (see SURVEY.md §7.4). Never user-visible. */
  val RowId = "__row_id__"

  /** Marker-column prefix used by the in-subquery join rewrite. */
  val InMarkerOp = "__in_marker__"

  val ComparisonOps = Set("==", "!=", "<", "<=", ">", ">=")

  // --- quoting rules (reference: common.py:27-41) ---
  def isQuoted(s: String): Boolean =
    s.length >= 2 &&
      ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"'))

  def unquote(s: String): String = {
    var r = s
    if (r.startsWith("'") || r.startsWith("\"")) r = r.substring(1)
    if (r.endsWith("'") || r.endsWith("\"")) r = r.substring(0, r.length - 1)
    r
  }

  def hasColumn(df: DataFrame, name: String): Boolean =
    df.schema.fieldNames.contains(name)

  def userColumns(df: DataFrame): Array[String] =
    df.schema.fieldNames.filterNot(n => n == RowId || n.startsWith("__in_"))

  private def fieldOf(df: DataFrame, name: String): Option[StructField] =
    df.schema.fields.find(_.name == name)

  /** Enum columns are StringType carrying this metadata flag (set at ingest
    * from the `enum` type hint; reference: app.py:159-160). */
  def isEnumColumn(df: DataFrame, name: String): Boolean =
    fieldOf(df, name).exists(f =>
      f.metadata.contains("qcache_enum") && f.metadata.getBoolean("qcache_enum"))

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[engine] def isFloating(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case _ => false
  }

  def colRef(df: DataFrame, name: String): Column =
    if (hasColumn(df, name)) df(name)
    else Errors.malformed("Unknown column", name)

  // ---------------------------------------------------------------------
  // static type categories — cross-type guards
  //
  // Under ANSI (the session default) a string↔numeric coercion that
  // survives analysis crashes PER-ROW at runtime (CAST_INVALID_INPUT), so
  // the server would 500 where the reference's pandas either returns a
  // constant mask (Python 2 cross-type comparison) or raises cleanly.
  // Every place the two grammars can mix a statically-string operand with
  // a statically-numeric one is guarded here at compile time.
  // ---------------------------------------------------------------------

  private[engine] sealed trait TCat
  private[engine] object TCat {
    case object Str  extends TCat
    case object Num  extends TCat
    case object Bool extends TCat
  }

  private[engine] def catOf(dt: DataType): Option[TCat] = dt match {
    case StringType     => Some(TCat.Str)
    case _: NumericType => Some(TCat.Num)
    case BooleanType    => Some(TCat.Bool)
    case _              => None
  }

  /** Static category of a grammar leaf: quoted string → Str literal, bare
    * string → column's type (if present), JSON number → Num, bool → Bool.
    * None when the type can't be determined statically (null, unknown
    * column — those error elsewhere). */
  private[engine] def leafCat(df: DataFrame, arg: Any): Option[TCat] = arg match {
    case s: String if isQuoted(s)      => Some(TCat.Str)
    case s: String if hasColumn(df, s) => catOf(df.schema(s).dataType)
    case _: Long | _: Double           => Some(TCat.Num)
    case _: Boolean                    => Some(TCat.Bool)
    case _                             => None
  }

  /** True when exactly one side is a string and the other is numeric or
    * boolean — the combination pandas compares by Python 2 type ordering
    * and Spark/ANSI would instead runtime-crash on. */
  private[engine] def isMixedStrNum(a: Option[TCat], b: Option[TCat]): Boolean =
    (a, b) match {
      case (Some(TCat.Str), Some(TCat.Num)) | (Some(TCat.Str), Some(TCat.Bool)) => true
      case (Some(TCat.Num), Some(TCat.Str)) | (Some(TCat.Bool), Some(TCat.Str)) => true
      case _ => false
    }

  /** Python 2 cross-type comparison result: numbers (and bools, which are
    * ints in Python) sort BEFORE strings, so a string/numeric comparison is
    * a row-independent constant. pandas applies it elementwise over the
    * object column; the reference therefore returns 200 with an all-or-
    * nothing match where a naive Spark plan would throw per-row.
    *
    * Missing cells are the one per-row exception, and only on the STRING
    * side: a missing cell of a pandas object column is NaN — a float — so
    * it compares NUMERICALLY against the numeric operand (NaN < x / > x /
    * == x are all False; only != is True). A missing cell of the numeric
    * side is also NaN — still a number — so it KEEPS the constant (numbers
    * sort before strings) and must not be guarded. Hence the true-side
    * orderings null-guard the string operand only; `==` (false), `!=`
    * (true) and the false-side orderings stay constants for every row.
    * The guard is the compiled operand's own nullability, so nested string
    * expressions (e.g. a concat over a nullable column) are covered too. */
  private[engine] def py2MixedCompare(op: String, stringOnLeft: Boolean,
                                      strOperand: => Column): Column = {
    val matches = op match {
      case "==" => false
      case "!=" => true
      case "<" | "<=" => !stringOnLeft // num < str, never str < num
      case ">" | ">=" => stringOnLeft
      case _ => false
    }
    if (!matches) lit(false)
    else if (op == "!=") lit(true) // NaN != x is True — constant already right
    else strOperand.isNotNull
  }

  /** Membership-list values that can never equal a cell of category
    * `colCat` are dropped (pandas isin compares with Python 2 `==`:
    * numbers never equal strings; True/False equal their 1/0 numerics).
    * Returned values are rewritten where needed (bool ⇄ 0/1). */
  private[engine] def compatibleInValues(colCat: Option[TCat], values: List[Any]): List[Any] =
    colCat match {
      case None => values
      case Some(cat) => values.flatMap { v =>
        (cat, v) match {
          case (TCat.Str, s: String)             => Some(s)
          case (TCat.Str, _)                     => None
          case (TCat.Num, _: Long | _: Double)   => Some(v)
          case (TCat.Num, b: Boolean)            => Some(if (b) 1L else 0L)
          case (TCat.Num, _: String)             => None
          case (TCat.Bool, b: Boolean)           => Some(b)
          case (TCat.Bool, l: Long)              =>
            if (l == 1L) Some(true) else if (l == 0L) Some(false) else None
          case (TCat.Bool, d: Double)            =>
            if (d == 1.0) Some(true) else if (d == 0.0) Some(false) else None
          case (TCat.Bool, _: String)            => None
          case _                                 => Some(v)
        }
      }
    }

  // ---------------------------------------------------------------------
  // where filter trees (reference: pandas_filter.py:132-163)
  // ---------------------------------------------------------------------

  /** Leaf: quoted string → literal, bare string → column, number → literal
    * (reference: pandas_filter.py:15-25). */
  private def leaf(df: DataFrame, q: Any): Column = q match {
    case s: String if isQuoted(s) => lit(unquote(s))
    case s: String                => colRef(df, s)
    case l: Long                  => lit(l)
    case d: Double                => lit(d)
    case b: Boolean               => lit(b)
    case null                     => lit(null)
    case other                    => Errors.malformed("Invalid type in argument", other)
  }

  def compileFilter(df: DataFrame, q: Any): Column = q match {
    case l: List[Any] @unchecked =>
      if (l.isEmpty) Errors.malformed("Empty expression not allowed", q)
      l.head match {
        case op: String => compileOp(df, op, l)
        case _          => Errors.malformed("Unknown operator", q)
      }
    case other => leaf(df, other)
  }

  private def compileOp(df: DataFrame, op: String, q: List[Any]): Column = op match {
    case "all_bits" | "any_bits" => bitwiseFilter(df, op, q)
    case "!" =>
      Errors.assertLen(q, 2, "! is a single arity operator, invalid number of arguments")
      // ~ on a string operand: coalesce would coerce the false branch to
      // string and defer a cast-to-boolean crash to runtime — reject at
      // compile time instead (pandas raises TypeError on ~object).
      if (leafCat(df, q(1)).contains(TCat.Str))
        Errors.malformed("Invalid type in argument", q)
      // pandas negates a null-free boolean mask (~False = True), so rows
      // where the inner predicate is unknown must be INCLUDED by the
      // negation — coalesce to false before negating, or Spark's
      // three-valued NOT null would silently drop them.
      !coalesce(compileFilter(df, q(1)), lit(false))
    case "isnull" => isNullFilter(df, q)
    case op if ComparisonOps.contains(op) => comparison(df, op, q)
    case "&" | "|" => joinFilter(df, op, q)
    case "in" => inFilter(df, q)
    case "like" | "ilike" => likeFilter(df, op, q)
    case InMarkerOp => // in-subquery rewrite; unmatched rows are null ⇒ false
      coalesce(col(q(1).asInstanceOf[String]), lit(false))
    case _ => Errors.malformed("Unknown operator", q)
  }

  /** all_bits: (col & m) == m; any_bits: (col & m) > 0. Integer column and
    * integer literal only (reference: pandas_filter.py:28-40). */
  private def bitwiseFilter(df: DataFrame, op: String, q: List[Any]): Column = {
    Errors.assertLen(q, 3)
    val colName = q(1) match {
      case s: String => s
      case other     => Errors.malformed("Column is not defined", other)
    }
    val mask = q(2) match {
      case l: Long => l
      case _ => Errors.malformed("Invalid argument type, must be an integer", q)
    }
    val field = fieldOf(df, colName).getOrElse(
      Errors.malformed("Column is not defined", q))
    if (!isIntegral(field.dataType))
      Errors.malformed("Invalid column type, must be an integer", q)
    val masked = df(colName).bitwiseAND(lit(mask))
    // null-free mask (pandas int columns can't hold null; a null here can
    // only come from a stand-in column — treat as no-bits-set)
    coalesce(if (op == "any_bits") masked > 0 else masked === lit(mask), lit(false))
  }

  /** Null test; the reference's NaN self-inequality trick means NaN ⇒ true
    * for float columns (reference: pandas_filter.py:48-52). */
  private def isNullFilter(df: DataFrame, q: List[Any]): Column = {
    Errors.assertLen(q, 2, "isnull is a single arity operator, invalid number of arguments")
    val name = q(1) match {
      case s: String if hasColumn(df, s) => s
      case other => Errors.malformed("Column is not defined", other)
    }
    val c = df(name)
    if (isFloating(df.schema(name).dataType)) c.isNull || isnan(c) else c.isNull
  }

  /** LHS must be a bare column name; RHS may be any nested expression
    * (reference: pandas_filter.py:55-58). `<`/`>` on enum columns is a type
    * error, matching pandas unordered categoricals
    * (reference: test_qframe.py:627-629). */
  private def comparison(df: DataFrame, op: String, q: List[Any]): Column = {
    Errors.assertLen(q, 3)
    val colName = q(1) match {
      case s: String => s
      case other     => Errors.malformed("Column is not defined", other)
    }
    if (!hasColumn(df, colName)) Errors.malformed("Column is not defined", q)
    if (isEnumColumn(df, colName) && op != "==" && op != "!=")
      Errors.malformed("Invalid type in argument", q)
    // Cross-type string/numeric comparison: constant by Python 2 type
    // ordering (see py2MixedCompare). A nested RHS expression is a boolean
    // mask by construction, so it counts as the numeric side.
    val lhsCat = catOf(df.schema(colName).dataType)
    val rhsCat = q(2) match {
      case _: List[Any] @unchecked => Some(TCat.Bool)
      case other                   => leafCat(df, other)
    }
    if (isMixedStrNum(lhsCat, rhsCat))
      return py2MixedCompare(op, lhsCat.contains(TCat.Str),
        if (lhsCat.contains(TCat.Str)) df(colName) else compileFilter(df, q(2)))
    val lhs = df(colName)
    val rhs = compileFilter(df, q(2))

    // pandas comparison semantics for null/NaN (the reference filters a
    // pandas boolean mask, which is always null-free):
    //   - NaN compares unequal to EVERYTHING including itself, so `==`,
    //     `<` … are False and `!=` is True on NaN rows. Spark instead
    //     treats NaN as equal-to-NaN and greater-than-everything, so
    //     float-typed sides need an explicit !isnan guard.
    //   - null rows: `!=` must be True (None != x in pandas), the others
    //     False. Spark's null-propagating =!= would DROP them.
    // NaN guards apply only to statically float-typed sides: the lhs
    // column, and a bare-column rhs. Literals parsed from JSON can never
    // be NaN.
    val nanSides: Seq[Column] = {
      val l = if (isFloating(df.schema(colName).dataType)) Seq(isnan(lhs)) else Nil
      val r = q(2) match {
        case s: String if !isQuoted(s) && hasColumn(df, s) &&
          isFloating(df.schema(s).dataType) => Seq(isnan(df(s)))
        case _ => Nil
      }
      l ++ r
    }
    val eitherNan = nanSides.reduceOption(_ || _)
    def guarded(c: Column): Column =
      eitherNan.map(n => c && !n).getOrElse(c)
    op match {
      case "==" => guarded(lhs === rhs)
      case "!=" =>
        val neq = !coalesce(lhs === rhs, lit(false))
        eitherNan.map(n => neq || n).getOrElse(neq)
      case "<"  => guarded(lhs < rhs)
      case "<=" => guarded(lhs <= rhs)
      case ">"  => guarded(lhs > rhs)
      case ">=" => guarded(lhs >= rhs)
    }
  }

  /** Variadic & / |; the single-clause form is legal
    * (reference: pandas_filter.py:61-72). */
  private def joinFilter(df: DataFrame, op: String, q: List[Any]): Column = {
    if (q.length < 2) Errors.malformed("Invalid number of arguments", q)
    val clauses = q.tail.map(compileFilter(df, _))
    if (op == "&") clauses.reduce(_ && _) else clauses.reduce(_ || _)
  }

  /** Literal-list membership. List values are raw literals — no quote
    * processing, matching the reference (reference: pandas_filter.py:75-101;
    * sub-query form is rewritten to a marker column before compilation, see
    * QueryEngine.rewriteInSubqueries). */
  private def inFilter(df: DataFrame, q: List[Any]): Column = {
    Errors.assertLen(q, 3)
    val colName = q(1) match {
      case s: String if hasColumn(df, s) => s
      case other => Errors.malformed("Column is not defined", other)
    }
    q(2) match {
      case values: List[Any] @unchecked =>
        // elements must be scalars — a nested list would otherwise surface
        // as an unsupported-literal runtime error instead of a 400 (the
        // reference crashes on unhashable elements; fuzz-found)
        values.foreach {
          case null | _: String | _: Long | _: Double | _: Boolean => ()
          case other => Errors.malformed("Invalid type in argument", other)
        }
        // pandas isin yields False for null rows — null-free so `!`
        // composes correctly. EXCEPT when the list itself contains null:
        // pandas Series.isin([None]) matches the missing values (None on
        // object columns, and NaN on float columns via None→NaN
        // coercion), where SQL IN (NULL) would never match.
        // values of a category the column can never equal are dropped up
        // front — pandas isin yields False for them, while Spark's IN
        // coercion would runtime-crash casting the column.
        val nonNull = compatibleInValues(catOf(df.schema(colName).dataType),
          values.filterNot(_ == null))
        val base =
          if (nonNull.isEmpty) lit(false)
          else coalesce(df(colName).isin(nonNull: _*), lit(false))
        if (values.contains(null)) {
          val c = df(colName)
          base || (if (isFloating(df.schema(colName).dataType))
            c.isNull || isnan(c) else c.isNull)
        } else base
      case _ => Errors.malformed("Second argument must be a list", q)
    }
  }

  /** SQL-LIKE %-wildcards at the ends plus raw-regex passthrough inside;
    * translation ports reference: pandas_filter.py:104-129 exactly:
    * leading/trailing `%` stripped ⇔ `^`/`$` anchors added; match is a
    * regex *search* (pandas str.contains ≡ Spark rlike); nulls never match.
    */
  private def likeFilter(df: DataFrame, op: String, q: List[Any]): Column = {
    Errors.assertLen(q, 3)
    val colName = q(1) match {
      case s: String if hasColumn(df, s) => s
      case other => Errors.malformed("Column is not defined", other)
    }
    if (df.schema(colName).dataType != StringType)
      Errors.malformed("Invalid column type for (i)like", q)
    val rawExpr = q(2) match {
      case s: String if isQuoted(s) => unquote(s)
      case _ =>
        Errors.malformed("like expects a quoted string as second argument", q)
    }
    var regexp = rawExpr
    regexp = if (regexp.startsWith("%")) regexp.substring(1) else "^" + regexp
    regexp = if (regexp.endsWith("%")) regexp.substring(0, regexp.length - 1)
             else regexp + "$"
    if (op == "ilike") regexp = "(?i)" + regexp
    coalesce(df(colName).rlike(regexp), lit(false)) // na=False
  }

  // ---------------------------------------------------------------------
  // alias / computed-column expressions (reference: query.py:78-116)
  // ---------------------------------------------------------------------

  /** Binary ops accepted by pandas `DataFrame.eval` that we support;
    * `**` → pow, `//` → floor-div (reference: query.py:82-97 compiles to an
    * infix NumExpr string — we build the Column tree directly). */
  private def binaryAliasOp(op: String, a: Column, b: Column): Column = op match {
    case "+"  => a + b
    case "-"  => a - b
    case "*"  => a * b
    // try_* so ÷0 is null rather than an ANSI error regardless of session
    // config; pandas yields inf/NaN which the reference serializes as JSON
    // null anyway (reference: test_api.py:109-116).
    case "/"  => try_divide(a, b)
    case "%"  => try_mod(a, b)
    case "**" => pow(a, b)
    case "//" => floor(try_divide(a, b))
    case "==" => a === b
    case "!=" => a =!= b
    case "<"  => a < b
    case "<=" => a <= b
    case ">"  => a > b
    case ">=" => a >= b
    case "&"  => a && b
    case "|"  => a || b
    case _    => Errors.malformed("Unknown function in alias", op)
  }

  /** Unary functions mirroring the NumExpr set available to the reference's
    * `DataFrame.eval` (reference: query.py:100-105, README.rst:139-157). */
  private def unaryAliasOp(op: String, a: Column): Column = op match {
    case "-"       => negate(a)
    case "~"       => !a
    case "sqrt"    => sqrt(a)
    case "abs"     => abs(a)
    case "sin"     => sin(a)
    case "cos"     => cos(a)
    case "tan"     => tan(a)
    case "arcsin"  => asin(a)
    case "arccos"  => acos(a)
    case "arctan"  => atan(a)
    case "sinh"    => sinh(a)
    case "cosh"    => cosh(a)
    case "tanh"    => tanh(a)
    case "log"     => log(a)
    case "log10"   => log10(a)
    case "log1p"   => log1p(a)
    case "exp"     => exp(a)
    case "expm1"   => expm1(a)
    case "floor"   => floor(a)
    case "ceil"    => ceil(a)
    case _         => Errors.malformed("Unknown function in alias", op)
  }

  private val ArithAliasOps = Set("+", "-", "*", "/", "%", "**", "//")

  /** Static category of an alias expression tree: comparisons and boolean
    * combinators produce Bool, `+` over two strings concatenates (Str),
    * every other operator produces a number. */
  private def aliasCat(df: DataFrame, expr: Any): Option[TCat] = expr match {
    case l: List[Any] @unchecked => l match {
      case (op: String) :: a :: b :: Nil =>
        if (ComparisonOps.contains(op) || op == "&" || op == "|") Some(TCat.Bool)
        else if (op == "+" && aliasCat(df, a).contains(TCat.Str) &&
          aliasCat(df, b).contains(TCat.Str)) Some(TCat.Str)
        else Some(TCat.Num)
      case (op: String) :: a :: Nil =>
        if (op == "~") aliasCat(df, a) else Some(TCat.Num)
      case _ => None
    }
    case other => leafCat(df, other)
  }

  /** Compile an alias source expression. `df` here is the frame the alias is
    * being added to (earlier aliases in the same select are visible, like
    * sequential `eval`; reference: query.py:108-116).
    *
    * Cross-type guards (see the TCat helpers): string operands under
    * arithmetic / numeric unary functions are rejected with a 400 (pandas
    * eval raises TypeError there), `+` over two strings concatenates
    * (pandas eval falls back to the python engine and concatenates), and
    * string/numeric comparisons fold to the Python 2 constant. */
  def compileAliasExpr(df: DataFrame, expr: Any): Column = expr match {
    case l: List[Any] @unchecked =>
      l match {
        case (op: String) :: a :: b :: Nil =>
          val (ca, cb) = (aliasCat(df, a), aliasCat(df, b))
          if (ComparisonOps.contains(op) && isMixedStrNum(ca, cb))
            py2MixedCompare(op, ca.contains(TCat.Str),
              compileAliasExpr(df, if (ca.contains(TCat.Str)) a else b))
          else if (op == "+" && ca.contains(TCat.Str) && cb.contains(TCat.Str))
            concat(compileAliasExpr(df, a), compileAliasExpr(df, b))
          else if (ArithAliasOps.contains(op) &&
            (ca.contains(TCat.Str) || cb.contains(TCat.Str)))
            Errors.malformed("Invalid types in argument", expr)
          else
            binaryAliasOp(op, compileAliasExpr(df, a), compileAliasExpr(df, b))
        case (op: String) :: a :: Nil =>
          val cat = aliasCat(df, a)
          if (cat.contains(TCat.Str))
            Errors.malformed("Invalid types in argument", expr)
          // pandas ~int is bitwise complement; Spark's ! wants a boolean
          else if (op == "~" && cat.contains(TCat.Num))
            bitwise_not(compileAliasExpr(df, a))
          else unaryAliasOp(op, compileAliasExpr(df, a))
        case _ => Errors.malformed("Invalid number of arguments", expr)
      }
    case s: String if isQuoted(s) => lit(unquote(s))
    case s: String                => colRef(df, s)
    case n: Long                  => lit(n)
    case d: Double                => lit(d)
    case b: Boolean               => lit(b)
    case other => Errors.malformed("Invalid expression in select", other)
  }
}
