package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.engine.{MalformedQueryException, QueryEngine}
import graft.sources.Ingest

/** The xop clause: extension operators exposed in the JSON dialect
  * (SURVEY §7.5). Each operator must run through QueryEngine.run exactly
  * like a reference clause, compose with the rest of the query, and fail
  * into the 400 taxonomy. */
class XopSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // server-shaped table: carries the hidden ingest-order column
  lazy val docs: DataFrame = Ingest.fromCsv(spark,
    """id,src,text
      |1,web,the quick brown fox jumps over the lazy dog
      |2,web,pack my box with five dozen liquor jugs
      |3,web,the quick brown fox jumps over the lazy dog
      |4,book,a a a a a a a a
      |5,book,el rapido zorro marron salta sobre el perro perezoso
      |6,web,pack my box with five dozen liquor jugs
      |""".stripMargin)

  def run(json: String): DataFrame = QueryEngine.run(docs, json).df
  def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getAs[Number](0).longValue).toSeq

  test("dedup_exact keeps the first ingest-order row per text") {
    val out = run("""{"xop": {"name": "dedup_exact", "args": {"column": "text"}}}""")
    assert(ids(out) == Seq(1L, 2L, 4L, 5L))
  }

  test("dedup_exact with explicit order column keeps lowest order value") {
    val out = run(
      """{"xop": {"name": "dedup_exact", "args": {"column": "text", "order": "id"}},
          "order_by": ["id"]}""")
    assert(ids(out) == Seq(1L, 2L, 4L, 5L))
  }

  test("xop composes with where / select / order_by / limit") {
    val out = run(
      """{"xop": {"name": "text_tokens", "args": {"column": "text"}},
          "where": [">", "n_tokens", 7],
          "select": ["id", "n_tokens"],
          "order_by": ["-n_tokens", "id"],
          "limit": 2}""")
    assert(out.columns.toSeq == Seq("id", "n_tokens"))
    assert(ids(out) == Seq(1L, 3L))
  }

  test("text_quality appends the feature columns") {
    val out = run("""{"xop": {"name": "text_quality", "args": {"column": "text"}}}""")
    for (c <- Seq("n_tokens", "alpha_ratio", "punct_ratio", "stopword_ratio", "quality_score"))
      assert(out.columns.contains(c))
    assert(out.count() == 6)
  }

  test("text_langid flags the spanish row") {
    val out = run(
      """{"xop": {"name": "text_langid", "args": {"column": "text"}},
          "where": ["==", "lang", "'es'"]}""")
    assert(ids(out) == Seq(5L))
  }

  test("text_fingerprint groups duplicate texts") {
    val out = run(
      """{"xop": {"name": "text_fingerprint", "args": {"column": "text"}},
          "select": ["fingerprint", ["count", "id"]],
          "group_by": ["fingerprint"],
          "order_by": ["fingerprint"]}""")
    assert(out.count() == 4)
    assert(out.select("id").collect().map(_.getLong(0)).sum == 6)
  }

  test("text_vocab returns top-k tokens") {
    val out = run("""{"xop": {"name": "text_vocab", "args": {"column": "text", "k": 3}}}""")
    assert(out.count() == 3)
  }

  test("chunk_dedup rebuilds documents from surviving chunks") {
    val out = run(
      """{"xop": {"name": "chunk_dedup",
                  "args": {"id": "id", "column": "text", "chunk_tokens": 4}},
          "order_by": ["id"]}""")
    assert(out.columns.toSeq == Seq("id", "clean_text", "n_kept", "n_chunks"))
    // row 3 duplicates row 1 exactly → all its chunks were seen first on id=1
    val row3 = out.filter("id = 3").head()
    assert(row3.getAs[Long]("n_kept") == 0L)
    assert(row3.getAs[String]("clean_text") == "")
  }

  test("sample_fraction is deterministic and roughly proportional") {
    val out = run(
      """{"xop": {"name": "sample_fraction", "args": {"id": "id", "fraction": 0.5}}}""")
    val again = run(
      """{"xop": {"name": "sample_fraction", "args": {"id": "id", "fraction": 0.5}}}""")
    assert(ids(out) == ids(again))
    assert(out.count() <= 6)
  }

  test("sample_stratified keeps k per stratum") {
    val out = run(
      """{"xop": {"name": "sample_stratified",
                  "args": {"id": "id", "strata": "src", "k": 1}}}""")
    assert(out.count() == 2)
    assert(out.select("src").distinct().count() == 2)
  }

  test("sample_mixture applies per-source weights") {
    val all = run(
      """{"xop": {"name": "sample_mixture",
                  "args": {"id": "id", "source": "src",
                           "weights": {"web": 1.0}, "default": 0}}}""")
    assert(ids(all).sorted == Seq(1L, 2L, 3L, 6L))
  }

  test("profile audits every column in one pass") {
    val out = run("""{"xop": {"name": "profile"}, "order_by": ["column"]}""")
    assert(out.columns.contains("column") && out.columns.contains("n_distinct"))
    assert(out.count() == 3) // id, src, text — hidden row id excluded
  }

  test("error taxonomy: unknown name, missing arg, bad types, unknown column") {
    intercept[MalformedQueryException] { run("""{"xop": {"name": "nope"}}""") }
    intercept[MalformedQueryException] { run("""{"xop": {"name": "dedup_exact"}}""") }
    intercept[MalformedQueryException] {
      run("""{"xop": {"name": "dedup_exact", "args": {"column": 7}}}""")
    }
    intercept[MalformedQueryException] {
      run("""{"xop": {"name": "dedup_exact", "args": {"column": "zz"}}}""")
    }
    intercept[MalformedQueryException] {
      run("""{"xop": {"name": "sample_fraction", "args": {"id": "id", "fraction": 1.5}}}""")
    }
    intercept[MalformedQueryException] {
      run("""{"xop": {"name": "text_tokens", "args": {"column": "text", "zap": 1}}}""")
    }
    intercept[MalformedQueryException] { run("""{"xop": {"nome": "dedup_exact"}}""") }
    intercept[MalformedQueryException] { run("""{"xop": "dedup_exact"}""") }
  }

  test("xop cannot be combined with update") {
    intercept[MalformedQueryException] {
      graft.engine.Query.parse(
        """{"xop": {"name": "profile"}, "update": [["id", 0]], "where": ["==", "id", 1]}""")
    }
  }
}
