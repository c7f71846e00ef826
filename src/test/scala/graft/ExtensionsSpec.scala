package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SQL-surface registration of the native kernels
  * (spark.sql.extensions=graft.plans.GraftExtensions): every function must
  * resolve in plain SQL and return the same values as the DataFrame path. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: SparkSession = _

  override def beforeAll(): Unit = {
    // getOrCreate silently returns any existing session (ignoring the
    // extensions conf), and spark.sql.extensions is a STATIC conf read
    // from the SparkContext — unusable once a context exists. So: force
    // the shared test session into existence, clear the active/default
    // registration, and build a sibling session over the same context
    // with the extensions applied through the builder API (the same
    // GraftExtensions class the conf would instantiate).
    base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
  }
  override def afterAll(): Unit = {
    // never stop(): the SparkContext is shared with every other suite —
    // just restore the shared session as active/default
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    if (base != null) {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("graft_dot and graft_sorted_intersect resolve and compute in SQL") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
                graft_sorted_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS i""").head()
    assert(r.getDouble(0) == 32.0 && r.getInt(1) == 2)
  }

  test("graft_minhash/simhash/hyperplane_sig/shingle_hashes match the operator path") {
    val r = spark.sql(
      """SELECT graft_minhash(array(17L, 99L, 1234L), 8) AS mh,
                graft_simhash(array(1L, 3L, 3L)) AS sh,
                graft_hyperplane_sig(array(0.5d, -1.0d), 4, 2) AS hp,
                graft_shingle_hashes(array('a', 'b', 'c'), 'a b c', 2) AS sg""").head()
    // cross-check against the DataFrame/Column formulations
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      graft.ops.Dedup.minhashSignature(typedLit(Seq(17L, 99L, 1234L)), 8).as("mh"),
      graft.ops.Dedup.simhashOfHashes(typedLit(Seq(1L, 3L, 3L))).as("sh"),
      graft.ops.Similarity.hyperplaneSignature(typedLit(Seq(0.5, -1.0)), 4, 2).as("hp"),
      graft.ops.Dedup.shingleHashesFused(lit("a b c"), 2).as("sg")).head()
    assert(r.getAs[scala.collection.Seq[Long]]("mh") == df.getAs[scala.collection.Seq[Long]]("mh"))
    assert(r.getAs[Long]("sh") == df.getAs[Long]("sh"))
    assert(r.getAs[scala.collection.Seq[Int]]("hp") == df.getAs[scala.collection.Seq[Int]]("hp"))
    assert(r.getAs[scala.collection.Seq[Long]]("sg").toSet == df.getAs[scala.collection.Seq[Long]]("sg").toSet)
  }

  test("graft_word_ngrams resolves and dedups when asked") {
    val r = spark.sql(
      """SELECT graft_word_ngrams(array('a', 'b', 'a', 'b'), 2, false) AS g,
                graft_word_ngrams(array('a', 'b', 'a', 'b'), 2, true) AS gd""").head()
    assert(r.getAs[scala.collection.Seq[String]]("g") == Seq("a b", "b a", "a b"))
    assert(r.getAs[scala.collection.Seq[String]]("gd") == Seq("a b", "b a"))
  }

  test("graft_term_freqs counts dl and per-term tf in one pass") {
    val r = spark.sql(
      """SELECT graft_term_freqs(array('a', 'b', 'a', 'c'), 'a c zz') AS f,
                graft_term_freqs(array(''), 'a') AS e""").head()
    assert(r.getAs[scala.collection.Seq[Int]]("f") == Seq(4, 2, 1, 0))
    // the [''] empty-split artifact counts as zero tokens
    assert(r.getAs[scala.collection.Seq[Int]]("e") == Seq(0, 0))
  }

  test("graft_token_pairs expands sorted arrays; kernel equals the HOF form") {
    val r = spark.sql(
      """SELECT graft_token_pairs(array('a', 'b', 'c')) AS p,
                graft_token_pairs(array('x')) AS one,
                graft_token_pairs(array(CAST(NULL AS STRING), 'a', 'b')) AS n""").head()
    val p = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p")
      .map(x => (x.getString(0), x.getString(1)))
    assert(p == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(r.getAs[scala.collection.Seq[Any]]("one").isEmpty)
    assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("n")
      .map(x => (x.getString(0), x.getString(1))) == Seq(("a", "b")))
    // bit-identical to the interpreted HOF cross-check on real text
    import org.apache.spark.sql.functions._
    val docs = spark.createDataset(Seq("the quick brown fox the end", "one two", ""))(
      org.apache.spark.sql.Encoders.STRING).toDF("text")
      .select(filter(array_sort(array_distinct(
        graft.ops.TextOps.tokens(col("text")))), t => t =!= "").as("ts"))
    val kernel = docs.select(org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.TokenPairsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(col("ts")))).as("p"))
      .collect().map(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p").toSeq)
    val hof = docs.select(graft.ops.TextOps.tokenPairsHof(col("ts")).as("p"))
      .collect().map(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p").toSeq)
    assert(kernel.toSeq == hof.toSeq)
    // the O(d²) guard fails actionably instead of wrapping Int arithmetic
    val big = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](16385)(i =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s"t$i")))
    val e = intercept[IllegalStateException] {
      graft.functions.TokenPairsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(col("ts"))).pairsRow(big)
    }
    assert(e.getMessage.contains("distinct tokens"))
  }

  test("graft_term_freqs tolerates null array elements (count dl, match nothing)") {
    // user-exposed SQL surface: arbitrary arrays can carry nulls, which
    // must not NPE the executor — they count toward dl (like the HOF
    // cross-check, where null === term filters out) but match no term
    val r = spark.sql(
      """SELECT graft_term_freqs(array(CAST(NULL AS STRING)), 'a') AS n1,
                graft_term_freqs(array('a', CAST(NULL AS STRING), 'a'), 'a') AS n2""").head()
    assert(r.getAs[scala.collection.Seq[Int]]("n1") == Seq(1, 0))
    assert(r.getAs[scala.collection.Seq[Int]]("n2") == Seq(3, 2))
  }
}
