package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.QueryEngine
import graft.ops._
import graft.sources.Ingest

/** End-to-end training-data pipeline: the operators composed the way a
  * real corpus refresh would chain them — ingest → exact dedup → near-dup
  * drop → benchmark decontamination → quality + entropy filter → PII
  * scrub → token counting → sequence packing → sharded export. Every
  * stage is an operator the oracle suite checks individually; this spec
  * pins that they COMPOSE (schemas line up, no stage corrupts another's
  * invariants) and that the same chain is expressible through the JSON
  * dialect's xop clause.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // A small corpus with every pathology the pipeline must handle: exact
  // dups, near dups, eval contamination, degenerate/low-quality text, PII.
  lazy val corpus: DataFrame = Ingest.fromCsv(spark,
    """id,src,text
      |1,web,the quick brown fox jumps over the lazy dog and runs far away home tonight
      |2,web,pack my box with five dozen liquor jugs before the long trip south begins
      |3,web,the quick brown fox jumps over the lazy dog and runs far away home tonight
      |4,web,the quick brown fox jumps over the lazy dog and runs far away home today
      |5,book,a a a a a a a a a a a a
      |6,book,how vexingly quick daft zebras jump over and over in the bright morning sun
      |7,book,email me at sam@example.com about the quartz sphinx and the black jackdaws
      |8,web,judge my vow five quacking zephyrs bolt past the jigsaw maze at dawn light
      |""".stripMargin)

  lazy val evalSet: DataFrame = Ingest.fromCsv(spark,
    """eid,text
      |900,judge my vow five quacking zephyrs bolt past the jigsaw maze at dawn light
      |""".stripMargin)

  test("scala-api pipeline: dedup → decontaminate → filter → redact → pack → shard") {
    // 1. exact dedup (keeps 1, drops 3)
    val exact = Dedup.exactByText(corpus, "text", "id")
    assert(!exact.select("id").collect().map(_.getAs[Number](0).longValue).contains(3L))

    // 2. near-dup drop (4 is a near dup of 1 → dropped)
    val pairs = Dedup.minhashPairs(exact, "id", "text",
      numHashes = 64, bands = 32, threshold = 0.5)
    val deduped = Dedup.dropNearDuplicates(exact, pairs, "id")
    assert(!deduped.select("id").collect().map(_.getAs[Number](0).longValue).contains(4L))

    // 3. benchmark decontamination (8 matches the eval set → dropped)
    val clean = Decontaminate.decontaminate(deduped, evalSet, "id", "text", n = 8)
    assert(!clean.select("id").collect().map(_.getAs[Number](0).longValue).contains(8L))

    // 4. quality + entropy filter (5 is degenerate → lowest entropy)
    val scored = TextOps.qualityFeatures(clean, "text")
      .withColumn("entropy", TextOps.charEntropy(col("text")))
    val kept = scored.filter(col("entropy") > 2.5)
    assert(!kept.select("id").collect().map(_.getAs[Number](0).longValue).contains(5L))

    // 5. PII scrub (7's email redacted, survives)
    val scrubbed = TextOps.redactPii(kept, "text")
    val row7 = scrubbed.filter(col("id") === 7).head()
    assert(row7.getAs[String]("redacted").contains("<EMAIL>"))
    assert(row7.getAs[Number]("n_emails").intValue == 1)

    // 6. token counts → sequence packing into 32-token bins
    val counted = scrubbed.withColumn("n_tok", TextOps.tokenCount(col("redacted")))
    val packed = Packing.packSequences(counted, "id", "n_tok", budget = 32)
    assert(packed.columns.contains("bin"))
    val survivors = packed.select("id").collect().map(_.getAs[Number](0).longValue).toSet
    assert(survivors == Set(1L, 2L, 6L, 7L))

    // 7. sharded train-ready export + manifest
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    val manifest = graft.sources.ShardWriter.writeShards(
      counted.join(packed.select("id", "bin"), Seq("id")), "bin", "n_tok", tmp)
    val m = manifest.collect()
    assert(m.map(_.getAs[Long]("n_rows")).sum == 4L)
    assert(m.map(_.getAs[Long]("n_tokens")).sum ==
      counted.agg(sum("n_tok")).head().getAs[Number](0).longValue)
  }

  test("SemDeDup paper rule composes: keep the LOWEST-cohesion member per dup group") {
    import spark.implicits._
    // SemDeDup (Abbas et al. 2023) keeps the example FARTHEST from the
    // cluster centroid within each duplicate group (edge examples carry
    // more signal than prototypical ones). That rule needs no new
    // operator: clusterAssignWith supplies cohesion, semanticDedupPairs
    // the cluster-scoped pair graph, dropNearDuplicatesClusteredBy the
    // per-group argmax — score = negated cohesion.
    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.0)),    // cohesion 1.0 to centroid (1,0,0)
      (2L, Array(1.0, 0.05, 0.0)),   // near-dup of 1 and 3, slightly off-axis
      (3L, Array(1.0, 0.1, 0.0)),    // farthest from centroid → the keeper
      (4L, Array(0.0, 1.0, 0.0)))    // other cluster, untouched
      .toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val assigned = Similarity.clusterAssignWith(emb, "embedding", cents)
    val pairs = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
      cents, threshold = 0.99)
    val kept = Dedup.dropNearDuplicatesClusteredBy(
        assigned, pairs, "vec_id", -col("cohesion"))
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L, 4L)) // min-id would keep 1; the paper rule keeps 3
  }

  test("the same pipeline runs through the JSON dialect (nested xop clauses)") {
    val resolver: String => Option[DataFrame] =
      n => if (n == "evalset") Some(evalSet) else None
    // innermost → outermost: exact dedup, near-dup drop, decontaminate,
    // entropy gate, PII scrub — one nested-from query
    val out = QueryEngine.run(corpus,
      """{"xop": {"name": "pii_redact", "args": {"column": "text"}},
          "from": {
            "where": [">", "entropy", 2.5],
            "xop": {"name": "char_entropy", "args": {"column": "text"}},
            "from": {
              "xop": {"name": "decontaminate",
                      "args": {"id": "id", "column": "text", "eval": "evalset"}},
              "from": {
                "xop": {"name": "dedup_minhash",
                        "args": {"id": "id", "column": "text",
                                 "bands": 32, "threshold": 0.5,
                                 "action": "drop"}},
                "from": {"xop": {"name": "dedup_exact",
                                 "args": {"column": "text"}}}}}},
          "select": ["id", "redacted"],
          "order_by": ["id"]}""", resolver).df
    val ids = out.select("id").collect().map(_.getAs[Number](0).longValue).toSeq
    assert(ids == Seq(1L, 2L, 6L, 7L))
    assert(out.filter(col("id") === 7).head().getAs[String]("redacted")
      .contains("<EMAIL>"))
  }

  test("retrieval chain: join → search_bm25 → split compose in the dialect") {
    import spark.implicits._
    val dims = Seq(("web", "crawl"), ("book", "curated")).toDF("src", "label")
    val resolver: String => Option[DataFrame] =
      n => if (n == "dims") Some(dims) else None
    // innermost → outermost: enrich with source labels, rank by BM25,
    // assign deterministic splits to the hits
    val out = QueryEngine.run(corpus,
      """{"xop": {"name": "split",
                  "args": {"id": "id", "splits": [["train", 0.5], ["eval", 0.5]]}},
          "from": {
            "xop": {"name": "search_bm25",
                    "args": {"id": "id", "column": "text",
                             "query": "quick fox", "k": 3}},
            "from": {"xop": {"name": "join",
                             "args": {"right": "dims", "on": ["src"],
                                      "how": "left", "columns": ["label"]}}}},
          "order_by": ["id"]}""", resolver).df
    assert(out.columns.toSeq == Seq("id", "score", "split"))
    val rows = out.collect().map(r =>
      (r.getAs[Number]("id").longValue, r.getAs[String]("split"))).toSeq
    // quick+fox docs 1, 3, 4 outrank quick-only doc 6 at k=3
    assert(rows.map(_._1) == Seq(1L, 3L, 4L))
    assert(rows.forall(_._2 != null)) // 0.5+0.5 weights are exhaustive
  }

  test("curation chain: span_scrub → quality_rules gate → tfidf compose in the dialect") {
    // innermost → outermost: excise corpus-duplicated 4-gram spans
    // (guts the exact/near-dup trio 1/3/4), gate on the rewritten text
    // with rule audit, then keyword-extract the survivors — the rewrite
    // feeding downstream stages is the point: schemas and the rewritten
    // column line up across xop boundaries
    val out = QueryEngine.run(corpus,
      """{"xop": {"name": "tfidf_keywords",
                  "args": {"id": "id", "column": "clean_text", "k": 2}},
          "from": {
            "where": ["==", "pass", true],
            "xop": {"name": "quality_rules",
                    "args": {"column": "clean_text",
                             "min_tokens": 5, "min_stopword_ratio": 0.0,
                             "max_dup_word_frac": 0.9, "min_mean_len": 2.0,
                             "max_mean_len": 10.0}},
            "from": {
              "select": ["id", "clean_text"],
              "xop": {"name": "span_scrub",
                      "args": {"id": "id", "column": "text", "n": 4}}}},
          "order_by": ["id", "rank"]}""").df
    assert(out.columns.toSeq == Seq("id", "term", "score", "rank"))
    val byDoc = out.collect().groupBy(_.getAs[Number]("id").longValue)
    // docs 1/3/4 lost their shared spans to the scrub (below min_tokens)
    // and the all-'a' doc 5 scrubs to empty; unique docs 2/6/7/8 survive
    // the gate and produce ranked keywords
    assert(byDoc.keySet == Set(2L, 6L, 7L, 8L))
    assert(byDoc.values.forall(_.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2)))
  }
}
