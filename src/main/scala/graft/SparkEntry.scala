package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.QueryEngine

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every core query here is expressed in the engine's JSON dialect and runs
  * through QueryEngine (parse → Column/DataFrame plan → Catalyst), so the
  * DuckDB oracle gate checks the dialect compiler itself, not hand-written
  * DataFrame code. Extension operators (dedup / similarity / text) come from
  * graft.ops and are plain Spark-first implementations.
  */
object SparkEntry {

  /** Tables resolve through the in-memory registry — the reference's
    * store-once-query-many model (datasets live in the cache, not on disk).
    */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.TableRegistry.table(s, dir, name)

  /** Stable scratch path for the artifact-anchor queries: keyed by the
    * sf dir (scales don't collide) AND the process id (two concurrent
    * runs on the same scale don't race one Overwrite's delete against
    * the other's read), constant within a JVM (repeated bench passes
    * re-use one directory instead of accumulating temp dirs). */
  private def anchorTmpPath(prefix: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL) +
      "_p" + ProcessHandle.current().pid()

  /** Engine-dialect query runner. */
  private def q(table: String, json: String,
      post: DataFrame => DataFrame = identity): (SparkSession, String) => DataFrame =
    (s, dir) => post(QueryEngine.run(t(s, dir, table), json).df)

  /** Round named double columns so hash comparison is insensitive to
    * floating summation order (Spark partial aggregates vs DuckDB serial). */
  private def rounded(cols: (String, Int)*)(df: DataFrame): DataFrame =
    cols.foldLeft(df) { case (d, (c, p)) => d.withColumn(c, round(col(c), p)) }

  /** events.ts physical-layout adapter for the queries that pass literal
    * time bounds/granules into the join machinery (x31b, x47): the driver
    * has regenerated the fixture with different PHYSICAL parquet types
    * across rounds (timestamp_ns — read as LONG nanos under
    * `nanosAsLong` — in rounds ≤9, timestamp_us since round 10).
    * `Joins.timeEmbedding` passes integer columns through in their OWN
    * units and embeds timestamps as epoch micros, so literals authored in
    * micros must scale ×1000 when the layout is LONG nanos — otherwise a
    * silent regen would put x47's window bounds 1000× off while the
    * eventsFrame-based queries kept working. Returns the number of
    * embedded units per microsecond for the frame's ts column. */
  private def eventsTsUnitsPerMicro(ev: DataFrame): Long =
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => 1000L // timestamp_ns layout
      case _                                   => 1L    // timestamp_{us,ltz} → micros
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape of the reference README's showcase query (README.rst:310-318). */
  def entry(spark: SparkSession): DataFrame =
    QueryEngine.run(
      t(spark, "/root/testdata/sf0.001", "lineitem"),
      """{"select": ["l_returnflag", ["sum", "l_quantity"]],
          "where": [">", "l_quantity", 0],
          "group_by": ["l_returnflag"],
          "order_by": ["-l_quantity"],
          "limit": 10}""").df

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- §2.3/§2.4: grouped aggregation + ordering (flagship agg) ---
    "q1_agg" -> q("lineitem",
      """{"select": ["l_returnflag", "l_linestatus",
                     ["sum", "l_quantity"], ["sum", "l_extendedprice"],
                     ["mean", "l_discount"], ["count", "l_orderkey"]],
          "group_by": ["l_returnflag", "l_linestatus"],
          "order_by": ["l_returnflag", "l_linestatus"]}""",
      rounded("l_quantity" -> 2, "l_extendedprice" -> 2, "l_discount" -> 6)),

    // --- §2.2: comparisons + variadic & ---
    "q2_filter_cmp" -> q("lineitem",
      """{"select": ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
          "where": ["&", [">", "l_quantity", 30], ["<", "l_discount", 0.05],
                    ["==", "l_returnflag", "'A'"]],
          "order_by": ["l_orderkey", "l_linenumber"]}"""),

    // --- §2.2: | and ! ---
    "q3_filter_or_not" -> q("orders",
      """{"select": ["o_orderkey", "o_orderstatus", "o_totalprice"],
          "where": ["|", ["==", "o_orderstatus", "'F'"],
                    ["!", [">", "o_totalprice", 100000]]],
          "order_by": ["o_orderkey"]}"""),

    // --- §2.2: in literal list ---
    "q4_filter_in" -> q("nation",
      """{"select": ["n_nationkey", "n_name", "n_regionkey"],
          "where": ["in", "n_regionkey", [0, 2]],
          "order_by": ["n_nationkey"]}"""),

    // --- §2.2: like / ilike (LIKE %-wildcards + regex passthrough) ---
    "q5_filter_like" -> q("part",
      """{"select": ["p_partkey", "p_name", "p_type"],
          "where": ["|", ["like", "p_type", "'ECON%'"],
                    ["ilike", "p_name", "'%WIDGET%'"]],
          "order_by": ["p_partkey"]}"""),

    // --- §2.2: isnull (negated; null-bearing paths are unit-tested) ---
    "q6_filter_notnull" -> q("events",
      """{"select": [["count", "value"]],
          "where": ["!", ["isnull", "value"]]}"""),

    // --- §2.2: all_bits / any_bits ---
    "q7_filter_bits" -> q("events",
      """{"select": ["event_id", "user_id"],
          "where": ["&", ["any_bits", "user_id", 3],
                    ["!", ["all_bits", "user_id", 3]]],
          "order_by": ["event_id"]}"""),

    // --- §2.3: projection subset + reorder ---
    "q8_project" -> q("customer",
      """{"select": ["c_name", "c_acctbal", "c_mktsegment"],
          "order_by": ["c_name"]}""", rounded("c_acctbal" -> 2)),

    // --- §2.3: computed columns (arithmetic, **, sqrt) ---
    "q9_computed" -> q("part",
      """{"select": ["p_partkey",
                     ["=", "value_density", ["/", "p_retailprice", ["+", "p_size", 1]]],
                     ["=", "size_sq", ["**", "p_size", 2]],
                     ["=", "rp_sqrt", ["sqrt", "p_retailprice"]]],
          "order_by": ["p_partkey"]}""",
      rounded("value_density" -> 4, "size_sq" -> 1, "rp_sqrt" -> 4)),

    // --- §2.3: global aggregates, output keeps source column names ---
    "q10_agg_global" -> q("lineitem",
      """{"select": [["sum", "l_extendedprice"], ["mean", "l_quantity"],
                     ["count", "l_orderkey"], ["min", "l_shipdate"]]}""",
      rounded("l_extendedprice" -> 2, "l_quantity" -> 4)),

    // --- §2.3: count(*) special case ---
    "q11_count" -> q("lineitem",
      """{"select": [["count"]], "where": [">", "l_quantity", 25]}"""),

    // --- §2.3: statistical aggregates (median/std/var/nunique) ---
    "q12_agg_stats" -> q("orders",
      """{"select": ["o_orderstatus", ["median", "o_totalprice"],
                     ["nunique", "o_custkey"]],
          "group_by": ["o_orderstatus"],
          "order_by": ["o_orderstatus"]}""", rounded("o_totalprice" -> 2)),
    "q12b_agg_stddev" -> q("orders",
      """{"select": ["o_orderpriority", ["std", "o_totalprice"]],
          "group_by": ["o_orderpriority"],
          "order_by": ["o_orderpriority"]}""", rounded("o_totalprice" -> 2)),
    "q12c_agg_var" -> q("orders",
      """{"select": ["o_orderstatus", ["var", "o_totalprice"]],
          "group_by": ["o_orderstatus"],
          "order_by": ["o_orderstatus"]}""", rounded("o_totalprice" -> 1)),

    // --- §2.3: distinct (via from sub-query so dedup follows projection) ---
    "q13_distinct" -> q("lineitem",
      """{"from": {"select": ["l_returnflag", "l_linestatus"]},
          "distinct": [],
          "order_by": ["l_returnflag", "l_linestatus"]}"""),

    // --- §2.4: multi-key order + offset/limit pagination ---
    "q15_order_slice" -> q("orders",
      """{"select": ["o_orderkey", "o_totalprice"],
          "order_by": ["-o_totalprice", "o_orderkey"],
          "offset": 10, "limit": 20}"""),

    // --- §2.5: from sub-query (aggregate then compute) ---
    "q16_from_pct" -> q("orders",
      """{"select": ["o_custkey", ["=", "spend_k", ["/", "o_totalprice", 1000]]],
          "from": {"select": ["o_custkey", ["sum", "o_totalprice"]],
                   "group_by": ["o_custkey"]},
          "order_by": ["o_custkey"]}""",
      // Snap the underlying sum to exact cents, then divide. No outer
      // rounding: cents/1000 ends in a true trailing 5, which is a
      // round-half tie both engines may break differently; the bare IEEE
      // division of identical inputs is bit-identical instead.
      df => df.withColumn("spend_k", round(col("spend_k") * 1000, 2) / 1000)),

    // --- §2.5/§2.2: in sub-query (semi-join against same dataset) ---
    "q17_in_subquery" -> q("orders",
      """{"select": ["o_orderkey", "o_custkey", "o_totalprice"],
          "where": ["in", "o_custkey",
                    {"select": ["o_custkey"], "where": [">", "o_totalprice", 400000]}],
          "order_by": ["o_orderkey"]}"""),

    // --- §2.6: update statement (self-referring + simple, declaration order) ---
    "q18_update" -> ((s, dir) => {
      import graft.engine.{Query, UpdateEngine}
      val updated = UpdateEngine.update(t(s, dir, "lineitem"), Query.parse(
        """{"update": [["*", "l_quantity", 2], ["l_tax", 0.0]],
            "where": ["<", "l_discount", 0.03]}"""))
      rounded("l_quantity" -> 2)(
        updated.select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
          .orderBy("l_orderkey", "l_linenumber"))
    }),

    // --- §2.6: cross-type update — numeric literal assigned into a string
    // column (stored as its repr, the round-3 fuzz crash), then a string
    // concat self-op layered on the same column in declaration order ---
    "q18b_update_crosstype" -> ((s, dir) => {
      import graft.engine.{Query, UpdateEngine}
      val updated = UpdateEngine.update(t(s, dir, "events"), Query.parse(
        """{"update": [["event_type", 7], ["+", "event_type", "'!'"]],
            "where": [">", "value", 90.0]}"""))
      updated.select("event_id", "event_type").orderBy("event_id")
    }),

    // --- §2.6: update with shift operator + in-list filter ---
    "q19_update_shift" -> ((s, dir) => {
      import graft.engine.{Query, UpdateEngine}
      val updated = UpdateEngine.update(t(s, dir, "events"), Query.parse(
        """{"update": [["<<", "user_id", 2]],
            "where": ["in", "event_type", ["'click'", "'error'"]]}"""))
      updated.select("event_id", "user_id", "event_type").orderBy("event_id")
    }),

    // --- §2.2 × §2.6: mixed-type comparison over MISSING cells (py2: a
    // missing cell is NaN — a float — so string-side nulls compare
    // numerically and drop from true-side orderings, while numeric-side
    // nulls keep the numbers-before-strings constant). The string nulls
    // come from update's create-absent-column path; the float nulls from
    // a ÷0 alias in a from-subquery. ---
    "q23_mixed_null_str" -> ((s, dir) => {
      import graft.engine.{Query, UpdateEngine}
      val updated = UpdateEngine.update(t(s, dir, "events"), Query.parse(
        """{"update": [["tag", "'hi'"]], "where": ["<", "value", 50.0]}"""))
      QueryEngine.run(updated,
        """{"select": ["event_id", "tag"],
            "where": [">", "tag", 1],
            "order_by": ["event_id"]}""").df
    }),
    "q23b_mixed_null_num" -> q("events",
      """{"select": ["event_id"],
          "from": {"select": ["event_id",
                              ["=", "nulled", ["/", "value", ["%", "event_id", 3]]]]},
          "where": ["<", "nulled", "'x'"],
          "order_by": ["event_id"]}"""),

    // --- events table: grouped aggregation over the stream-shaped table ---
    "q20_events_agg" -> q("events",
      """{"select": ["event_type", ["mean", "value"], ["count", "event_id"]],
          "group_by": ["event_type"],
          "order_by": ["event_type"]}""", rounded("value" -> 4)),

    // --- §2.3: first/last aggregates (pandas GroupBy.first/last = first/
    // last NON-NULL value in insertion order). Parquet tables carry no
    // ingest order, so one is pinned: sort by the table's unique key and
    // attach the hidden __row_id__ the engine's min_by/max_by path uses.
    "q21_agg_firstlast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .withColumn(graft.engine.ExprCompiler.RowId, monotonically_increasing_id())
      QueryEngine.run(li,
        """{"select": ["l_returnflag", ["first", "l_linestatus"], ["last", "l_quantity"]],
            "group_by": ["l_returnflag"]}""").df
    }),

    // --- §2.3: prod aggregate (pandas Series.prod; exact on small ints) ---
    "q22_agg_prod" -> q("nation",
      """{"select": ["n_regionkey", ["prod", "n_nationkey"]],
          "group_by": ["n_regionkey"]}"""),

    // ================== pipeline extension operators (graft.ops) ==========

    // exact dedup: corpus ∪ shifted copy (deterministic dup injection) →
    // keep lowest doc_id per normalized-text fingerprint
    "x1_dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val withDups = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
      graft.ops.Dedup.exactByText(withDups, "text", "doc_id")
        .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
    }),

    // MinHash LSH near-dup pairs (full-corpus scale path; rows-only check)
    "x2_dedup_minhash" -> ((s, dir) =>
      graft.ops.Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6, shingleSize = 3)
        .orderBy("id_a", "id_b")),

    // MinHash at recall-forcing parameters (bands = numHashes, band
    // width 1: candidates = docs sharing ANY min-hash value) on the x4
    // id-bounded slice, post-verified by EXACT shingle Jaccard — must
    // equal x4's all-pairs output, so it shares x4's oracle verbatim.
    // The x14b pattern applied to MinHash banding; the approximate
    // banding stays rows-only in x2/x43.
    "x2b_dedup_minhash_exact" -> ((s, dir) =>
      graft.ops.Dedup.minhashPairsBandExhaustive(t(s, dir, "documents"),
        "doc_id", "text", maxId = 300, threshold = 0.5, numHashes = 64,
        shingleSize = 3).orderBy("id_a", "id_b")),

    // SimHash near-dup pairs (rows-only check)
    "x3_dedup_simhash" -> ((s, dir) =>
      graft.ops.Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 10).orderBy("id_a", "id_b")),

    // SimHash banding COMPLETENESS anchor: with 4 bands of 16 bits,
    // pigeonhole guarantees every pair at hamming <= 3 shares a band,
    // so on an id-bounded slice (spiked with exact copies so the pair
    // set is non-empty) the banded pairs must equal the exhaustive
    // all-pairs output EXACTLY. The query emits their symmetric
    // difference — the oracle is the empty result, making the equality
    // itself the oracle-gated claim (signature correctness is pinned
    // separately by kernel-vs-HOF bit-identity tests; xxhash64-based
    // signatures are not DuckDB-replayable, which is why x3 proper
    // stays rows-only).
    "x3b_simhash_complete" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 300)
      val spiked = d.unionByName(d.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
      val banded = graft.ops.Dedup.simhashPairs(spiked, "doc_id", "text",
        maxHamming = 3)
      val exhaustive = graft.ops.Dedup.simhashPairsExhaustive(spiked,
        "doc_id", "text", maxId = Long.MaxValue, maxHamming = 3)
      // multiset symmetric difference by count-netting (both sides are
      // duplicate-free, so any nonzero net is a one-sided pair);
      // exceptAll's generate+sum rewrite trips an internal binding bug
      // under the trailing sort in Spark 4.1, so the diff is a plain
      // tagged-union aggregate instead
      banded.withColumn("__side", lit(1L))
        .unionByName(exhaustive.withColumn("__side", lit(-1L)))
        .groupBy("id_a", "id_b", "hamming")
        .agg(sum(col("__side")).as("__net"))
        .filter(col("__net") =!= 0L)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    }),

    // exact n-gram (3-token shingle) Jaccard within an id-bounded slice —
    // oracle-checkable quadratic variant of the LSH path
    "x4_dedup_jaccard" -> ((s, dir) =>
      graft.ops.Dedup.shingleJaccardPairsExact(t(s, dir, "documents"),
        "doc_id", "text", maxId = 300, threshold = 0.5, shingleSize = 3)
        .orderBy("id_a", "id_b")),

    // dedup threshold sweep over x4's exact id-bounded pair family: the
    // drop curve keep-first dedup would realize at each candidate
    // threshold (per-doc max-score distribution read cumulatively) —
    // the threshold gets picked from this curve, not folklore. The
    // minhash/index-served form is the full-corpus production path
    // (same report code, approximate scores)
    // n_docs is the SLICE count: pairs exist only inside the id bound,
    // so the rate is slice-relative — the same denominator the weighted
    // sweep (x90b) reports, not a full-corpus underestimate
    "x77_dedup_sweep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Dedup.dedupSweep(docs.filter(col("doc_id") < 300),
        graft.ops.Dedup.shingleJaccardPairsExact(docs, "doc_id", "text",
          maxId = 300, threshold = 0.2, shingleSize = 3),
        "jaccard", Seq(0.2, 0.3, 0.5, 0.7, 0.9))
        .orderBy("threshold")
    }),

    // duplication-proof near-dup pairing (x2b's exactness pattern over
    // the WEIGHTED variant): exact classes collapse to representatives
    // with multiplicity first, band-exhaustive candidates run over
    // representatives ONLY, exact shingle-Jaccard verifies — a corpus
    // where every doc has m exact copies emits one row per near-dup
    // RELATION instead of ~m² expanded rows (the sf10 x2 lesson).
    // Duplication injected deterministically: every sliced doc twice,
    // even ids three times
    "x90_dedup_weighted" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val withDups = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text")))
        .unionByName(base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      graft.ops.Dedup.minhashPairsWeightedBandExhaustive(withDups,
        "doc_id", "text", maxId = 3000000, threshold = 0.5, shingleSize = 3)
        .orderBy("id_a", "id_b")
    }),

    // the weighted sweep over the same duplicated slice: collapse +
    // representative pairs + multiplicity fold must reproduce the EXACT
    // keep-first drop curve of the fully-expanded corpus — the oracle
    // computes that expansion brute-force in DuckDB, so every fold term
    // (the Σ(mult−1) intra drops AND the rep-level keep-first) is pinned
    "x90b_weighted_sweep" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val withDups = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text")))
        .unionByName(base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      graft.ops.Dedup.dedupSweepWeighted(
        graft.ops.Dedup.exactByTextWeighted(withDups, "text", "doc_id"),
        graft.ops.Dedup.minhashPairsWeightedBandExhaustive(withDups,
          "doc_id", "text", maxId = 3000000, threshold = 0.5, shingleSize = 3),
        "jaccard", Seq(0.5, 0.7, 0.9, 1.0))
        .orderBy("threshold")
    }),

    // duplication-proof SimHash pairs (x90's collapse applied to the
    // SimHash family): exact classes collapse to representatives with
    // multiplicity, only representatives band and verify — one row per
    // near-dup RELATION on a duplicated corpus instead of the m²
    // expansion. Rows-only like x3 (xxhash64 signatures are not
    // DuckDB-replayable); x92b nets the expansion arithmetic to zero
    // and x92c pins the weighted sweep, both oracle-gated.
    "x92_simhash_weighted" -> ((s, dir) => {
      val base = t(s, dir, "documents").select("doc_id", "text")
      val withDups = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text")))
        .unionByName(base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      graft.ops.Dedup.simhashPairsWeighted(withDups, "doc_id", "text",
        maxHamming = 10).orderBy("id_a", "id_b")
    }),

    // x92's exactness anchor: the weighted relation's EXPANDED
    // arithmetic — mult_a·mult_b per cross-class row, m(m−1)/2
    // hamming-0 rows per class — must net to zero against the plain
    // simhashPairs output on the fully-expanded corpus, pair by pair
    // (ids mapped to class representatives). maxHamming = 3 so both
    // banded forms are pigeonhole-complete (x3b's argument) and the
    // netting is exact, not recall-dependent. The oracle is the empty
    // result — any surviving row is a collapse/multiplicity bug.
    "x92b_simhash_weighted_expand" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val withDups = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text")))
        .unionByName(base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      val weighted = graft.ops.Dedup.simhashPairsWeighted(withDups,
        "doc_id", "text", maxHamming = 3)
      val classes = graft.ops.Dedup.exactByTextWeighted(withDups,
        "text", "doc_id")
      val wExpanded = weighted.select(col("id_a"), col("id_b"), col("hamming"),
          (col("mult_a") * col("mult_b")).as("cnt"))
        .unionByName(classes.filter(col("mult") > 1)
          .select(col("doc_id").as("id_a"), col("doc_id").as("id_b"),
            lit(0).as("hamming"),
            (col("mult") * (col("mult") - 1) / 2).cast("long").as("cnt")))
      val repOf = withDups.select(col("doc_id").as("__d"),
          graft.ops.TextOps.fingerprintMd5(col("text")).as("__fp"))
        .join(classes.select(col("doc_id").as("__rep"),
          graft.ops.TextOps.fingerprintMd5(col("text")).as("__fp")), "__fp")
        .select(col("__d"), col("__rep"))
      val pExpanded = graft.ops.Dedup.simhashPairs(withDups, "doc_id", "text",
          maxHamming = 3)
        .join(repOf.select(col("__d").as("id_a"), col("__rep").as("__ra")), "id_a")
        .join(repOf.select(col("__d").as("id_b"), col("__rep").as("__rb")), "id_b")
        .groupBy(least(col("__ra"), col("__rb")).as("id_a"),
          greatest(col("__ra"), col("__rb")).as("id_b"), col("hamming"))
        .agg(count(lit(1)).as("cnt"))
      wExpanded.withColumn("__side", lit(1L))
        .unionByName(pExpanded.withColumn("__side", lit(-1L)))
        .groupBy("id_a", "id_b", "hamming", "cnt")
        .agg(sum(col("__side")).as("__net"))
        .filter(col("__net") =!= 0L)
        .select("id_a", "id_b", "hamming", "cnt")
        .orderBy("id_a", "id_b")
    }),

    // the weighted SimHash SWEEP pin: collapse + rep pairs + the
    // multiplicity fold must reproduce the drop curve of running the
    // plain sweep over the fully-expanded corpus, term for term (both
    // at pigeonhole-complete maxHamming = 3, scored on sim =
    // (64−hamming)/64 where exact copies sit at exactly 1.0). Emitted
    // as the curves' multiset difference — the oracle is empty.
    "x92c_simhash_weighted_sweep" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val withDups = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text")))
        .unionByName(base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      val ts = Seq(0.9531, 0.9844, 1.0)
      val folded = graft.ops.Dedup.dedupSweepWeighted(
        graft.ops.Dedup.exactByTextWeighted(withDups, "text", "doc_id"),
        graft.ops.Dedup.simhashPairsWeighted(withDups, "doc_id", "text",
          maxHamming = 3)
          .withColumn("sim", graft.ops.Dedup.simhashSim(col("hamming"))),
        "sim", ts)
      val brute = graft.ops.Dedup.dedupSweep(withDups,
        graft.ops.Dedup.simhashPairs(withDups, "doc_id", "text",
          maxHamming = 3)
          .withColumn("sim", graft.ops.Dedup.simhashSim(col("hamming"))),
        "sim", ts)
      folded.withColumn("__side", lit(1L))
        .unionByName(brute.withColumn("__side", lit(-1L)))
        .groupBy("threshold", "docs_dropped", "n_docs", "drop_rate")
        .agg(sum(col("__side")).as("__net"))
        .filter(col("__net") =!= 0L)
        .select("threshold", "docs_dropped", "n_docs", "drop_rate")
        .orderBy("threshold")
    }),

    // duplication-proof embedding-cosine pairs (x90's collapse with the
    // VECTOR fingerprint as the class key): exact-duplicate vectors
    // collapse to representatives with multiplicity, only reps run the
    // hyperplane-LSH banding. Duplication + perturbed copies injected
    // as in x5 — rows-only (LSH recall), anchored by x93b/x93c.
    "x93_embcos_weighted" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val withDups = e
        .unionByName(e.select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding")))
        .unionByName(e.filter(col("vec_id") % 2 === 0)
          .select((col("vec_id") + 2000000).as("vec_id"), col("embedding")))
        .unionByName(e.select((col("vec_id") + 3000000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding")))
      graft.ops.Similarity.cosineNearDupPairsWeighted(withDups, "vec_id",
        "embedding", threshold = 0.95, dim = 64).orderBy("id_a", "id_b")
    }),

    // x93's oracle-exact anchor — and unlike SimHash this family's
    // collapse is fully DuckDB-replayable (GROUP BY the vector itself;
    // equal md5 fingerprints ⟺ equal vectors): quadratic exact cosine
    // over the collapsed representatives of an id-bounded duplicated
    // slice, multiplicities carried — the x90 pattern end to end
    "x93b_embcos_weighted_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 150)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val withDups = e
        .unionByName(e.select((col("vec_id") + 1000).as("vec_id"),
          col("embedding")))
        .unionByName(e.filter(col("vec_id") % 2 === 0)
          .select((col("vec_id") + 2000).as("vec_id"), col("embedding")))
        .unionByName(e.select((col("vec_id") + 3000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding")))
      graft.ops.Similarity.cosineNearDupPairsWeightedExact(withDups,
        "vec_id", "embedding", maxId = 10000000, threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),

    // the weighted embcos SWEEP against the brute-force expansion —
    // x90b's pattern for this family, fully DuckDB-replayable: the
    // fold (Σ(mult−1) intra drops + rep-level keep-first) must equal
    // the curve computed over every expanded pair
    "x93c_embcos_weighted_sweep" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 150)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val withDups = e
        .unionByName(e.select((col("vec_id") + 1000).as("vec_id"),
          col("embedding")))
        .unionByName(e.filter(col("vec_id") % 2 === 0)
          .select((col("vec_id") + 2000).as("vec_id"), col("embedding")))
        .unionByName(e.select((col("vec_id") + 3000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding")))
      graft.ops.Dedup.dedupSweepWeighted(
        graft.ops.Similarity.exactByVecWeighted(withDups, "embedding", "vec_id"),
        graft.ops.Similarity.cosineNearDupPairsWeightedExact(withDups,
          "vec_id", "embedding", maxId = 10000000, threshold = 0.95),
        "cos", Seq(0.95, 0.99, 1.0))
        .orderBy("threshold")
    }),

    // duplication-proof audit queue (x84 over the weighted relation):
    // exact classes collapse first, the borderline-first queue reviews
    // REPRESENTATIVE pairs with both class sizes attached — a
    // mass-duplicated borderline pair costs one queue row and the
    // reviewer sees how many expanded docs the call governs
    "x94_audit_weighted" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val withDups = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text")))
        .unionByName(base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
      graft.ops.Dedup.auditPairsWeighted(
        graft.ops.Dedup.shingleJaccardPairsWeightedExact(withDups,
          "doc_id", "text", maxId = 3000000, threshold = 0.2, shingleSize = 3),
        "jaccard",
        graft.ops.Dedup.exactByTextWeighted(withDups, "text", "doc_id"),
        "doc_id", "text", threshold = 0.9, k = 5)
    }),

    // leakage-free train/val/test split over EXACT-duplicate classes:
    // identical texts always land in one split (test can never hold a
    // verbatim copy of a train doc), the class hashes on its min-id
    // representative, and singletons keep x37's hash_split label exactly
    // — one fingerprint exchange, then a map-side CASE
    "x95_split_leakfree" -> ((s, dir) =>
      graft.ops.Sampling.splitLeakFreeExact(t(s, dir, "documents"),
        "doc_id", "text", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").orderBy("doc_id")),

    // x95's invariant anchor, one row: no multi-doc class straddles
    // splits (n_straddling = 0) and no singleton's label differs from
    // plain hash_split (n_singleton_label_diffs = 0) — the two halves of
    // the leakage-free contract, both replayed exactly by the oracle.
    // Even ids get a whitespace-variant copy (normalizes equal), so
    // multi-doc classes exist at EVERY scale and odd ids stay singletons
    "x95b_split_leakfree_guard" -> ((s, dir) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val base = t(s, dir, "documents").select("doc_id", "text")
      val d = base.unionByName(base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(lit("  "), col("text"), lit(" ")).as("text")))
      val lf = graft.ops.Sampling.splitLeakFreeExact(d, "doc_id", "text", splits)
        .withColumnRenamed("split", "lf_split")
      val both = graft.ops.Sampling.splitByHash(lf, "doc_id", splits)
      val fp = graft.ops.TextOps.fingerprintMd5(col("text"))
      both
        .groupBy(fp.as("__fp"))
        .agg(count(lit(1)).as("m"),
          countDistinct(col("lf_split")).as("nsp"),
          sum(when(col("lf_split") === col("split"), 0L).otherwise(1L)).as("ndiff"))
        .agg(sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_multi_classes"),
          sum(when(col("m") > 1 && col("nsp") > 1, 1L).otherwise(0L)).as("n_straddling"),
          sum(when(col("m") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(when(col("m") === 1, col("ndiff")).otherwise(0L)).as("n_singleton_label_diffs"))
    }),

    // leakage-free split over NEAR-dup classes: x18's shingle-Jaccard
    // connected components drive the split via splitByClass — the whole
    // component hashes on its cluster label (min reachable id), unpaired
    // docs hash their own id (x37's label). The cluster relation holds
    // only paired ids, so the left join broadcasts
    "x95c_split_by_class" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Sampling.splitByClass(docs, "doc_id",
        graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.shingleJaccardPairsExact(docs, "doc_id", "text",
            maxId = 300, threshold = 0.5, shingleSize = 3)),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").orderBy("doc_id")
    }),

    // quality-ranked token-budget selection: the best docs (50-char
    // length bands as the score — coarse on purpose, so the boundary
    // tie group is dozens of docs and the Packing-shaped intra-tie
    // prefix path does real work at every scale) until 5000 tokens.
    // Fully-in bands select map-only off a broadcast of the tiny
    // per-band cumulative relation; only the ONE boundary band pays a
    // prefix sum, and it shards by id
    "x82_budget_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("priority", expr("CAST(n_chars div 50 AS BIGINT) * 50"))
      graft.ops.Sampling.budgetSelect(docs, "doc_id", "priority",
        graft.ops.TextOps.tokenCount(col("text")), budget = 5000L)
        .select(col("doc_id").as("id"), col("priority"), col("tokens"))
        .orderBy("id")
    }),

    // x82's boundary-skew witness: EVERY doc shares one priority, so the
    // fully-in fast path is empty and the whole corpus IS the boundary
    // tie group — the worst case the decomposition exists for. The
    // shard prefix must hold: parallel per-(id div 100) windows + the
    // tiny offset rollup, never a single-task (priority, id) sort.
    // Shares x82's oracle SHAPE (run <= budget in pure id order)
    "x82b_budget_select_skew" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("priority", lit(0L))
      graft.ops.Sampling.budgetSelect(docs, "doc_id", "priority",
        graft.ops.TextOps.tokenCount(col("text")), budget = 5000L,
        shardSize = 100L)
        .select(col("doc_id").as("id"), col("tokens"))
        .orderBy("id")
    }),

    // per-source budget selection — the form a solved mixture ships:
    // each source takes its OWN best docs under its OWN token budget
    // (named budgets + a default for unlisted sources; src2's zero
    // budget proves the exhausted-at-top path). One bounded collect of
    // the per-source crossing rows; fully-in bands map-only
    "x87_budget_by_source" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("priority", expr("CAST(n_chars div 50 AS BIGINT) * 50"))
      graft.ops.Sampling.budgetSelectBySource(docs, "doc_id", "source",
        "priority", graft.ops.TextOps.tokenCount(col("text")),
        Map("src0" -> 400L, "src1" -> 800L, "src2" -> 0L),
        defaultBudget = 300L)
        .select(col("doc_id").as("id"), col("source"), col("priority"),
          col("tokens"))
        .orderBy("id")
    }),

    // embedding-space drift through the PSI lens: both corpus versions
    // assigned to the SAME fixed quantizer (x42b's first-4-vectors
    // argmax), cell-occupancy shares compared — "did the refresh move
    // where the embeddings LIVE", the vector companion to x83's
    // source-mix read. Pure composition: clusterAssignWith ∘ mixDrift
    "x88_emb_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val cents: Seq[Seq[Double]] = e.filter(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      def cells(d: org.apache.spark.sql.DataFrame) =
        graft.ops.Similarity.clusterAssignWith(d, "embedding", cents)
          .select(col("cluster"))
      graft.ops.Profile.mixDrift(
        cells(e.filter(col("vec_id") % 4 =!= 1)), cells(e), "cluster")
    }),

    // source-mix drift (PSI) between the previous crawl (x78's every-
    // fourth-doc-missing convention) and the refreshed corpus — the
    // companion monitoring read to x71's id-level diff: did the MIX
    // move, and which source moved it. Two group-count-sized aggregates
    // joined full-outer; corpus rows never shuffle
    "x83_mix_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Profile.mixDrift(
        docs.filter(col("doc_id") % 4 =!= 1), docs, "source")
    }),

    // numeric drift through the same PSI lens: document LENGTH
    // distribution between versions, binned to 100-char bands first
    // (the classic ingestion regression — a parser change that halves
    // average length shows here before any model does)
    "x83b_len_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val band = expr("CAST(n_chars div 100 AS BIGINT) * 100").as("len_band")
      graft.ops.Profile.mixDrift(
        docs.filter(col("doc_id") % 4 =!= 1).select(band),
        docs.select(band), "len_band")
    }),

    // duplicate-family size spectrum over x18's connected components —
    // the dedup QA report: family-size counts off one map-combining
    // aggregate per level, spectrum provably O(sqrt D) rows
    "x85_cluster_spectrum" -> ((s, dir) =>
      graft.ops.Dedup.clusterSpectrum(
        graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.shingleJaccardPairsExact(t(s, dir, "documents"),
            "doc_id", "text", maxId = 300, threshold = 0.5, shingleSize = 3)))),

    // borderline-first dedup audit queue: the 5 pairs nearest the 0.9
    // operating threshold from x4's exact-jaccard pair relation, texts
    // attached for side-by-side review — TakeOrdered over pairs, then
    // two broadcast joins of the 5-row queue against the corpus (texts
    // never shuffle; no text moves for a pair that missed the queue)
    "x84_audit_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Dedup.auditPairs(
        graft.ops.Dedup.shingleJaccardPairsExact(docs, "doc_id", "text",
          maxId = 300, threshold = 0.2, shingleSize = 3),
        "jaccard", docs, "doc_id", "text", threshold = 0.9, k = 5)
    }),

    // embedding-cosine near-dup pairs via hyperplane LSH (rows-only check).
    // The synthetic corpus has no true near-dups (max pairwise cos ≈ 0.51),
    // so inject perturbed copies — each original must pair with its copy.
    "x5_dedup_embcos" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val perturbed = e.select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
      graft.ops.Similarity.cosineNearDupPairs(
        e.unionByName(perturbed), "vec_id", "embedding",
        threshold = 0.95, dim = 64).orderBy("id_a", "id_b")
    }),

    // exact-threshold embcos variant within an id-bounded slice — the
    // oracle-checkable quadratic anchor of x5 (same role x4 plays for
    // MinHash): each original must pair with its perturbed copy at
    // cos ≈ 0.9999, far from both the 0.95 threshold and the corpus's
    // ~0.51 max natural pair, so float-ulp divergence can't flip a row
    "x5b_embcos_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 150)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val perturbed = e.select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
      graft.ops.Similarity.cosineNearDupPairsExact(
        e.unionByName(perturbed), "vec_id", "embedding",
        maxId = 10000, threshold = 0.95).orderBy("id_a", "id_b")
    }),

    // brute-force cosine top-k ANN (oracle-checked against DuckDB
    // list_cosine_similarity)
    "x6_ann_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      graft.ops.Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN (scale path; rows-only check)
    "x7_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      graft.ops.Similarity.lshTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, dim = 64)
        .orderBy("query_id", "rank")
    }),

    // LSH at recall-forcing parameters (bitsPerBand = 0: a zero-width
    // band hashes every signature into one bucket, so every corpus row
    // is a candidate) — the banded join machinery must then reproduce
    // x6's EXACT ranking, so this row shares x6's DuckDB oracle
    // verbatim; the approximate settings stay in x7's rows-only +
    // recall-gate checks. The x14b pattern applied to hyperplane LSH.
    "x7b_ann_lsh_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      graft.ops.Similarity.lshTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
        bands = 1, bitsPerBand = 0, dim = 64)
        .orderBy("query_id", "rank")
    }),

    // IVF (coarse-quantizer cells + probe) ANN — the other scale path
    // (rows-only; recall < 1 by design vs x6's exact ranking)
    "x14_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      graft.ops.Similarity.ivfTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nCells = 32, nProbe = 8, dim = 64, kmeansIters = 2)
        .orderBy("query_id", "rank")
    }),

    // IVF at recall-forcing parameters (nProbe = nCells: every cell is
    // probed, every corpus row is a candidate exactly once) — the
    // bucketed machinery must then reproduce x6's EXACT ranking, so this
    // row shares x6's DuckDB oracle verbatim; the approximate settings
    // stay in x14's rows-only + recall-gate checks. Shares x14's cached
    // quantizer build (same corpus plan + build params)
    "x14b_ann_ivf_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      graft.ops.Similarity.ivfTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nCells = 32, nProbe = 32, dim = 64, kmeansIters = 2)
        .orderBy("query_id", "rank")
    }),

    // token counting: whitespace + BPE-ish regex
    "x8_text_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).as("n_tokens"),
        graft.ops.TextOps.bpeTokenCount(col("text")).as("n_bpe"),
        col("n_chars")).orderBy("doc_id")),

    // quality features (ratios oracle-checked; composite score is ours)
    "x9_text_quality" -> ((s, dir) =>
      graft.ops.TextOps.qualityFeatures(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "alpha_ratio", "punct_ratio", "stopword_ratio")
        .orderBy("doc_id")),

    // heuristic language ID (stopword argmax — the oracle replays the
    // same scoring + tie-break cascade in SQL)
    "x10_text_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        graft.ops.TextOps.langId(col("text")).as("lang_pred")).orderBy("doc_id")),

    // benchmark decontamination: train docs sharing an 8-word gram with
    // the eval slice (source=src7) — hash-keyed join, eval side broadcast
    // by AQE once its distinct aggregate reveals a small size
    "x21_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.contaminated(
        docs.filter(col("source") =!= "src7"),
        docs.filter(col("source") === "src7"),
        "doc_id", "text", n = 8).orderBy("id")
    }),

    // x21 served from a PERSISTED eval-gram artifact (DecontIndex): the
    // suite's gram derivation is paid at build, the query probes the
    // sketch map-side and rescues false positives through the exact
    // gram join. Shares x21's oracle verbatim — the artifact path must
    // be indistinguishable from the inline derivation
    "x96_decontam_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = anchorTmpPath("graft_dc_anchor", dir)
      val art = graft.ops.DecontIndex.buildAndSave(
        docs.filter(col("source") === "src7"), "text", path, n = 8)
      graft.ops.Decontaminate.contaminatedWith(
        docs.filter(col("source") =!= "src7"), "doc_id", "text", art)
        .orderBy("id")
    }),

    // x96's artifact brought to the current suite INCREMENTALLY (the
    // x72 trick applied to decontamination): build over a synthetic
    // previous suite version (every fifth eval doc missing, a handful
    // of foreign docs wrongly present), then DecontIndex.update adds
    // the missing docs and removes the foreign ones — only the delta
    // documents re-derive grams; ref counts keep shared grams exact.
    // Shares x21's oracle verbatim: updated ≡ built-from-scratch
    "x97_decontam_index_update" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val eval = docs.filter(col("source") === "src7")
      val missing = eval.filter(col("doc_id") % 5 === 1)
      val foreign = docs.filter(
        col("source") === "src6" && col("doc_id") % 11 === 3)
      val v1 = eval.filter(col("doc_id") % 5 =!= 1).unionByName(foreign)
      val path = anchorTmpPath("graft_dc_upd", dir)
      graft.ops.DecontIndex.buildAndSave(v1, "text", path, n = 8)
      val art = graft.ops.DecontIndex.update(s, path, "text",
        added = Some(missing), removed = Some(foreign))
      graft.ops.Decontaminate.contaminatedWith(
        docs.filter(col("source") =!= "src7"), "doc_id", "text", art)
        .orderBy("id")
    }),

    // repetition quality rules (Gopher-style): duplicate-word fraction
    // map-only; top-bigram fraction via explode → count → max/sum
    "x22_text_repetition" -> ((s, dir) =>
      graft.ops.TextOps.repetitionFeatures(
        t(s, dir, "documents"), "doc_id", "text").orderBy("id")),

    // training-mix sampling: per-source keep fractions off one shared id
    // hash (nested, reproducible samples; map-only CASE chain)
    "x23_mixture_sample" -> ((s, dir) =>
      graft.ops.Sampling.mixtureByHash(t(s, dir, "documents"), "doc_id",
        "source", Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        default = 0.1)
        .select("doc_id", "source").orderBy("doc_id")),

    // training-mix EPOCH resampling: weights past 1 replicate (src0 ×2.5
    // → two full copies + a hash-half third epoch), weights below 1
    // downsample through the same shared id hash, default 1.0 passes
    // everything else once. Map-only + a row-local bounded explode
    "x68_mixture_epochs" -> ((s, dir) =>
      graft.ops.Sampling.mixtureEpochsByHash(t(s, dir, "documents"), "doc_id",
        "source", Map("src0" -> 2.5, "src1" -> 0.4), default = 1.0)
        .select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")),

    // mixture-weight SOLVER — the planning stage that produces x68's
    // weights: share·budget/supply epochs per source, with targets the
    // corpus cannot honestly serve surfaced as status (srczz is absent
    // → no_supply; a share needing more than maxWeight epochs → capped)
    "x76_mixture_weights" -> ((s, dir) =>
      graft.ops.Sampling.mixtureWeights(t(s, dir, "documents"),
        "source", "text",
        Map("src1" -> 0.4, "src2" -> 0.1, "srczz" -> 0.05),
        budgetTokens = 1000000L, maxWeight = 2.0)
        .orderBy("source")),

    // document fingerprinting (md5-of-normalized, oracle-checked; the
    // rolling-hash variant is engine-specific and covered by unit tests)
    "x11_text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.ops.TextOps.fingerprintMd5(col("text")).as("fp_md5"))
        .orderBy("doc_id")),

    // tumbling-window aggregation over the event stream shape (batch form
    // of streaming.EventStreams.windowedTypeCounts; oracle = time_bucket)
    "x13_events_window" -> ((s, dir) =>
      graft.streaming.EventStreams.eventsFrame(s, dir)
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type")),

    // event-rate anomaly monitoring: per (hour, type) z-score against
    // the trailing 5 windows, EMPTY windows spine-filled first (a
    // silent window is the loudest anomaly); trailing moments from
    // exact integer sums so both engines evaluate the same doubles
    "x86_rate_anomaly" -> ((s, dir) =>
      graft.streaming.EventStreams.rateAnomaly(
        graft.streaming.EventStreams.eventsFrame(s, dir),
        windowLength = "1 hour", trailing = 5, zThreshold = 3.0)),

    // sequence packing: docs → fixed token-budget bins in doc_id order
    // (two-level distributed prefix sum; shard windows + tiny offset frame)
    "x20_seq_packing" -> ((s, dir) => {
      val withTokens = t(s, dir, "documents").select(col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.ops.Packing.packSequences(withTokens, "doc_id", "n_tokens",
        budget = 4096, shardSize = 100)
        .select("doc_id", "n_tokens", "tokens_before", "bin")
        .orderBy("doc_id")
    }),

    // corpus vocabulary: top-100 token frequencies (explode → partial agg
    // → one token shuffle → TakeOrdered; no full sort anywhere)
    "x19_text_vocab" -> ((s, dir) =>
      graft.ops.TextOps.topTokens(t(s, dir, "documents"), "text", k = 100)),

    // certified-bounds vocabulary sketch (x19's anchor): per-partition
    // exact counting, top-`capacity` + threshold shipped, exchange
    // bounded at capacity+1 rows/partition whatever the vocabulary. At
    // capacity ≥ per-partition vocab every threshold is 0, so n is
    // exact and n_max = n — the whole output replays on x19's oracle
    // with the bound column pinned equal to the count. The anchor
    // condition is partitioning-dependent, so the capacity here is
    // deliberately enormous: it only caps EMISSION, costing nothing
    // while actual per-partition vocabularies stay below it, and 2^20
    // keeps the anchor exact under any plausible fixture regeneration
    // or split-size change (today's fixture vocabulary is 31 tokens)
    "x67_vocab_sketch" -> ((s, dir) =>
      graft.ops.TextOps.topTokensSketch(t(s, dir, "documents"), "text",
        k = 100, capacity = 1 << 20)),

    // per-source top-5 vocabulary: x19 sliced by group — one
    // (source, token) partial-combining exchange, WindowGroupLimit rank
    // over the aggregated (vocabulary-bounded) relation
    "x70_vocab_by_source" -> ((s, dir) =>
      graft.ops.TextOps.topTokensByGroup(t(s, dir, "documents"), "source",
        "text", k = 5).orderBy("source", "rank")),

    // vocabulary growth curve (Heaps'-law observable): new distinct
    // tokens per 100-doc-id slab in crawl order — the running
    // distinct-count rephrased as a pure function of each token's
    // FIRST occurrence (min id), so the plan is one map-side-combined
    // token exchange + a tiny bucket aggregate + a cumulative window
    // over bucket rows only
    "x80_vocab_growth" -> ((s, dir) =>
      graft.ops.TextOps.vocabGrowth(t(s, dir, "documents"), "doc_id",
        "text", granule = 100L)),

    // token-frequency spectrum: count-of-counts + the Zipf rank
    // boundary (tokens occurring >= freq times) — Good–Turing mass and
    // min-frequency-cutoff decisions read straight off this O(sqrt N)
    // relation; the only corpus-sized exchange is the token count
    "x81_token_spectrum" -> ((s, dir) =>
      graft.ops.TextOps.tokenSpectrum(t(s, dir, "documents"), "text")),

    // int8 embedding quantization: map-only, floor-based round-half-up
    // (engine-portable), 4x storage cut for a float corpus
    // passage-level dedup: first corpus-wide occurrence of each 16-token
    // chunk survives; docs reassemble from surviving chunks (C4-style
    // boilerplate strip). One chunk-hash shuffle + one id shuffle.
    "x30_chunk_dedup" -> ((s, dir) =>
      graft.ops.Dedup.dedupChunks(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 16).orderBy("id")),

    // one-pass data audit: per-column nulls/distincts/ranges, single
    // aggregate job + driver unpivot of its one output row
    "x29_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(t(s, dir, "documents")).orderBy("column")),

    // as-of join: each error event picks the latest click at-or-before
    // it by the same user (Joins.asOfJoin — stats-gated carry: one-window
    // at this size, granule-segmented past the row gate / with an
    // explicit granule, see x31b); oracle is DuckDB's native ASOF LEFT JOIN
    "x31_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      graft.ops.Joins.asOfJoin(errors, clicks, "user_id", "ts", Seq("click_value"))
        .select("event_id", "user_id", "value", "click_value")
        .orderBy("event_id")
    }),

    // the one-window carry FORCED (strategy="window" — what the
    // measured-skew auto tier selects on provably-uniform keys, r18)
    // under the SAME DuckDB ASOF oracle as x31: the strategy tiers must
    // trade only wall time, never results, and this row pins that
    // against the external engine at every replay scale
    "x31c_asof_window" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      graft.ops.Joins.asOfJoin(errors, clicks, "user_id", "ts",
          Seq("click_value"), strategy = "window")
        .select("event_id", "user_id", "value", "click_value")
        .orderBy("event_id")
    }),

    // hot-key as-of stress (the AAPL problem): ~80% of all events
    // collapse onto ONE user, then the same as-of join under an EXPLICIT
    // one-hour granule — the bench witness for the segmented-carry
    // machinery (the hot key's timeline spreads over time granules
    // instead of funneling its entire merged history into a single
    // window task; regressions here mean the segmented path got slower
    // or the per-key full-history carry came back). The events fixture
    // stores ts as a timestamp, which the as-of machinery embeds as
    // epoch MICROS (Joins.timeEmbedding) — so the granule is in micros.
    "x31b_asof_hot" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("user_id",
        when(col("user_id") % 5 =!= 0, lit(0L)).otherwise(col("user_id")))
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      graft.ops.Joins.asOfJoin(errors, clicks, "user_id", "ts", Seq("click_value"),
          granule = Some(3600L * 1000 * 1000 * eventsTsUnitsPerMicro(ev)))
        .select("event_id", "user_id", "value", "click_value")
        .orderBy("event_id")
    }),

    // PII scrub: deterministic synthetic PII spiked into the corpus in
    // the query itself (the fixture has none), then the map-only
    // redaction pass; counts + redacted text are exact strings
    "x32_pii" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val spiked = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail.example.com")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" call +1 555-123-4567 from 10.0.0."),
            (col("doc_id") % 200).cast("string")))
        .otherwise(col("text")).as("text"))
      graft.ops.TextOps.redactPii(spiked, "text")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          col("n_ips").cast("long").as("n_ips"), col("redacted"))
        .orderBy("doc_id")
    }),

    // incremental exact dedup vs an existing corpus: the new batch
    // (src1 docs + re-spiked copies of src0 docs) keeps only texts whose
    // fingerprint is NOT already in the src0 corpus — one anti-join,
    // seen side distinct-reduced then broadcast by AQE
    "x36_dedup_against" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("source") === "src0")
      val batch = docs.filter(col("source") === "src1")
        .unionByName(corpus.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      graft.ops.Dedup.dedupAgainst(batch, "text", corpus, "text")
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // deterministic train/val/test assignment by id hash — map-only,
    // consistent with the fraction/stratified samples' hash order
    "x37_hash_split" -> ((s, dir) =>
      graft.ops.Sampling.splitByHash(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").orderBy("doc_id")),

    // BM25 keyword search: top-20 docs for a 3-term query — per-term tf
    // via codegen'd array filters (no explode), one-row stats broadcast,
    // TakeOrderedAndProject top-k; rounded scores + id tie-break keep it
    // engine-portable (oracle replays the identical float op sequence)
    "x38_bm25" -> ((s, dir) =>
      graft.ops.Search.bm25(t(s, dir, "documents"), "doc_id", "text",
        "hash join filter", k = 20)),

    // enrichment equi-join as a first-class dialect operator: orders
    // enriched with customer name/segment — AQE/broadcast decides the
    // physical join (right side is a dimension table)
    "x39_join" -> ((s, dir) =>
      graft.ops.Joins.equiJoin(t(s, dir, "orders"), t(s, dir, "customer"),
        Seq("o_custkey" -> "c_custkey"), "left",
        Seq("c_name", "c_mktsegment"), broadcastRight = true)
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")),

    // duplicated-span statistics (substring-dedup signal, Lee et al.):
    // per-doc fraction of distinct 5-grams appearing in >= 2 documents —
    // kernel-deduped grams, one (hash, gram) window shuffle, one id agg
    "x40_dup_grams" -> ((s, dir) =>
      graft.ops.Dedup.dupGramStats(t(s, dir, "documents"), "doc_id", "text",
        n = 5).orderBy("id")),

    // incremental NEAR-dup admission: batch docs minus MinHash
    // near-duplicates of the existing corpus — one union + one
    // (band, bucket) shuffle, cross-side pairs only; rows-only by design
    // (signature-estimated jaccard), pinned by unit tests
    "x43_minhash_against" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("source") === "src0")
      val batch = docs.filter(col("source") === "src1")
        .unionByName(corpus.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" extra token")).as("text"),
            col("lang"), col("source"), col("n_chars")))
      graft.ops.Dedup.dropNearDuplicatesAgainst(batch, "doc_id", "text",
        corpus, "doc_id", "text", threshold = 0.8)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // incremental-MinHash anchor (the x2b pattern, cross-side form):
    // corpus = the x4 id-bounded slice, batch = the same docs re-id'd;
    // the against-banding at bands=numHashes post-verified by EXACT
    // shingle Jaccard must equal the exact cross-side pair set, which
    // DuckDB replays directly (every batch doc pairs with its original
    // at J=1, plus the slice's true near-dups)
    "x43b_minhash_against_exact" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").filter(col("doc_id") < 300)
      val batch = corpus.withColumn("doc_id", col("doc_id") + 100000)
      graft.ops.Dedup.minhashPairsAgainstBandExhaustive(
        batch, "doc_id", "text", corpus, "doc_id", "text",
        threshold = 0.5, numHashes = 64, shingleSize = 3)
        .orderBy("batch_id", "corpus_id")
    }),

    // x43b's anchor driven through a PERSISTED MinHash signature index
    // (the production form of incremental dedup — one artifact build per
    // corpus version, then batch admissions never re-read corpus text):
    // the artifact is built into a temp dir inside the query, candidates
    // come from index-served banding at bands=numHashes, the exact
    // verification joins corpus text back on the id-bounded candidates,
    // and the output must equal x43b's — sharing its oracle verbatim
    // proves the parquet signature round-trip changes nothing
    "x66_minhash_index" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").filter(col("doc_id") < 300)
      val batch = corpus.withColumn("doc_id", col("doc_id") + 100000)
      // per-sfDir AND per-process path, Overwrite semantics: every
      // invocation still measures the full build+round-trip (the
      // anchor's point), repeated bench passes within one JVM re-use ONE
      // directory, and the pid suffix keeps two concurrent processes on
      // the same scale from racing Overwrite's delete against the other
      // run's read
      val path = anchorTmpPath("graft_mh_anchor", dir)
      val art = graft.ops.MinHashIndex.buildAndSave(corpus, "doc_id", "text",
        numHashes = 64, shingleSize = 3, path = path)
      graft.ops.Dedup.minhashPairsAgainstIndexBandExhaustive(
        batch, "doc_id", "text", corpus, "doc_id", "text", art, threshold = 0.5)
        .orderBy("batch_id", "corpus_id")
    }),

    // x66's anchor driven through an INCREMENTALLY-UPDATED index: build
    // the artifact on a synthetic PREVIOUS corpus version (one fifth of
    // the docs missing, every seventh revised), bring it to the current
    // corpus with MinHashIndex.update — which re-signatures only the
    // drifted rows and delta-updates the manifest fingerprint — then run
    // the exact same probe as x66. Sharing x43b's oracle verbatim proves
    // the updated artifact is indistinguishable from a from-scratch
    // build of the current corpus
    "x72_index_update" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").filter(col("doc_id") < 300)
      val batch = corpus.withColumn("doc_id", col("doc_id") + 100000)
      val v1 = corpus.filter(col("doc_id") % 5 =!= 1)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" stale")))
            .otherwise(col("text")))
      val path = anchorTmpPath("graft_mh_upd", dir)
      graft.ops.MinHashIndex.buildAndSave(v1, "doc_id", "text",
        numHashes = 64, shingleSize = 3, path = path)
      val art = graft.ops.MinHashIndex.update(s, path, corpus, "doc_id", "text")
      graft.ops.Dedup.minhashPairsAgainstIndexBandExhaustive(
        batch, "doc_id", "text", corpus, "doc_id", "text", art, threshold = 0.5)
        .orderBy("batch_id", "corpus_id")
    }),

    // x28's exclusion served through an INCREMENTALLY-UPDATED bloom
    // artifact: the sketch is built over a synthetic PREVIOUS ledger
    // (a third of the src7 ids not yet added; a handful of src3 ids
    // since removed), then brought to the current ledger with
    // BloomIndex.update — arriving ids hashed in at the base sizing,
    // departures delta-subtracted from the manifest only (their bits
    // stay set; the rescue anti-join keeps the operator exact). Shares
    // x28's oracle shape on the same ledger: an updated artifact must
    // exclude exactly what an inline build over the current list does
    "x74_bloom_update" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ledger = docs.filter(col("source") === "src7").select("doc_id")
      val extras = docs.filter(col("source") === "src3" && col("doc_id") % 11 === 0)
        .select("doc_id")
      val v1 = ledger.filter(col("doc_id") % 3 =!= 0).unionByName(extras)
      val added = ledger.filter(col("doc_id") % 3 === 0)
      val path = anchorTmpPath("graft_bl_upd", dir)
      graft.ops.BloomIndex.buildAndSave(v1, "doc_id", fpp = 0.05, path)
      val art = graft.ops.BloomIndex.update(s, path, added, "doc_id",
        removed = Some((extras, "doc_id")))
      graft.ops.Dedup.excludeByBloomWith(docs, "doc_id", art.bytes,
        ledger, "doc_id")
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // corpus version diff — the refresh-ops report that says when the
    // dedup/exclusion artifacts need rebuilding: 16-byte fingerprints
    // per side, one id-keyed full-outer join, no text shuffle. The
    // synthetic v2 drops every doc_id % 5 == 1, revises % 7 == 0, and
    // re-ids three new rows
    "x71_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("doc_id") % 5 =!= 1)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" revised")))
            .otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") < 3)
          .withColumn("doc_id", col("doc_id") + 900000))
      graft.ops.Dedup.corpusDiff(docs, "doc_id", "text", cur, "doc_id", "text")
        .orderBy("id")
    }),

    // spherical k-means clustering: semantic buckets for topic balancing
    // / cluster-scoped dedup — cached quantizer build (shared with IVF),
    // then a map-only fused-kernel assignment pass; rows-only by design
    // (cluster labels are seed-defined), pinned by unit invariants
    "x42_emb_cluster" -> ((s, dir) =>
      graft.ops.Similarity.clusterAssign(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)
        .select("vec_id", "cluster", "cohesion").orderBy("vec_id")),

    // explicit-centroid assignment — x42's oracle anchor (the x5b trick
    // applied to clustering): with the centroid list FIXED (the first 4
    // corpus vectors, a ≤k driver collect), the assignment is a
    // deterministic cosine argmax DuckDB replays as a row_number over
    // list_cosine_similarity; ties (exact-duplicate cosines) take the
    // lowest centroid index on both sides. Integer output only — the
    // argmax is ulp-robust for real-data centroids, float cohesion stays
    // in x42's rows-only row
    "x42b_emb_cluster_fixed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents: Seq[Seq[Double]] = e.filter(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      graft.ops.Similarity.clusterAssignWith(e, "embedding", cents)
        .select(col("vec_id"), col("cluster")).orderBy("vec_id")
    }),

    // warm-start quantizer maintenance — the centroid artifact's
    // incremental loop (the other three artifact kinds merge state;
    // the quantizer RE-CENTERS, because its state is a sample whose
    // placement drifts rather than a ledger that appends): build a
    // sample-only artifact, then IvfIndex.refine runs 2 Lloyd's rounds
    // seeded from the STORED centroids (map-only assignment passes +
    // tiny (cell,pos) mean aggregates — never a fresh sample), and the
    // refreshed artifact serves the same map-only assignment path as
    // x42. Rows-only by design (k-means landings are seed-defined);
    // x79b is the oracle anchor, and IvfIndexSpec pins the warm-start
    // bit-equality and the monotone spherical objective
    "x79_ivf_refine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = anchorTmpPath("graft_ivf_ref", dir)
      graft.ops.IvfIndex.buildAndSave(e, "vec_id", "embedding",
        nCells = 8, kmeansIters = 0, path = path)
      val refined = graft.ops.IvfIndex.refine(s, path, e, "embedding", 2)
      graft.ops.Similarity.clusterAssignWith(e, "embedding", refined)
        .select("vec_id", "cluster", "cohesion").orderBy("vec_id")
    }),

    // x79's oracle anchor (the x66 trick applied to the quantizer):
    // with the stored centroids FIXED (the first 4 corpus vectors) and
    // refine at 0 iters — the documented pure no-op — the
    // artifact-served assignment must equal x42b's DuckDB-replayable
    // argmax exactly, proving the save/load round-trip and the
    // refine(0) identity change nothing
    "x79b_ivf_refine_anchor" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents: Seq[Seq[Double]] = e.filter(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val path = anchorTmpPath("graft_ivf_ref0", dir)
      graft.ops.IvfIndex.save(s, path, cents, nCells = 4, kmeansIters = 0)
      val served = graft.ops.IvfIndex.refine(s, path, e, "embedding", 0)
      graft.ops.Similarity.clusterAssignWith(e, "embedding", served)
        .select(col("vec_id"), col("cluster")).orderBy("vec_id")
    }),

    // batch BM25: one corpus pass answers a query TABLE — broadcast
    // term-set prefilter before the single (term, doc) shuffle, per-query
    // WindowGroupLimit top-k; no per-query scan
    "x41_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "hash join filter"), (2L, "customer order data"),
        (3L, "stream window batch")).toDF("query_id", "query_text")
      graft.ops.Search.bm25Batch(t(s, dir, "documents"), "doc_id", "text",
        qs, "query_id", "query_text", k = 10)
        .orderBy(col("query_id"), col("score").desc, col("doc_id"))
    }),

    // per-source length distribution: exact interpolated quantiles in one
    // aggregate job (value→count map per group, not a sort)
    "x34_len_quantiles" -> ((s, dir) =>
      graft.ops.Profile.groupQuantiles(t(s, dir, "documents"),
        "source", "n_chars", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("source", "quantile")),

    // char-entropy quality signal: native codegen kernel, map-only
    "x35_char_entropy" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.ops.TextOps.charEntropy(col("text")).as("entropy"))
        .orderBy("doc_id")),

    // per-source quality curation: keep the 10 highest-quality docs per
    // source (rounded-score rank + id tie-break, WindowGroupLimit)
    "x33_quality_topk" -> ((s, dir) => {
      val feats = graft.ops.TextOps.qualityFeatures(t(s, dir, "documents"), "text")
      graft.ops.Sampling.topKByScore(feats, "source", "doc_id", "quality_score", 10)
        .select("doc_id", "source", "quality_score")
        .orderBy("source", "doc_id")
    }),

    // exact id exclusion through a Bloom sketch: map-only probe over the
    // corpus; only probe-positive rows pay the verifying anti-join
    "x28_bloom_exclude" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Dedup.excludeByBloom(docs, "doc_id",
        docs.filter(col("source") === "src7").select("doc_id"), "doc_id",
        fpp = 0.05)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // int8 quantization; q serialized to CSV for the compare layer (the
    // row-hash compare handles scalars, not list cells — exactness kept:
    // the string is the full element sequence)
    "x24_emb_quantize" -> ((s, dir) =>
      graft.ops.Embeddings.quantizeInt8(t(s, dir, "embeddings"),
        "vec_id", "embedding")
        .select(col("id"), col("scale"),
          concat_ws(",", col("q").cast("array<string>")).as("q_csv"))
        .orderBy("id")),

    // class-conditional outliers: cosine distance to the label centroid,
    // 5 farthest per label (centroid agg is O(labels x dim) post-combine;
    // centroids broadcast back; WindowGroupLimit per-label top-k)
    "x25_emb_outliers" -> ((s, dir) =>
      graft.ops.Embeddings.labelOutliers(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", k = 5).orderBy("label", "id")),

    // semi-structured props: declared-schema JSON parse + per-type rollup
    "x26_events_props" -> ((s, dir) =>
      graft.streaming.EventStreams.propsRollup(
        graft.streaming.EventStreams.eventsFrame(s, dir))
        .orderBy("event_type")),

    // token-budget curriculum: per-source docs in hash order until the
    // running token total passes the budget (one windowed shuffle)
    "x27_token_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Sampling.tokenBudgetByHash(docs, "doc_id", "source",
        graft.ops.TextOps.tokenCount(col("text")), budget = 2000)
        .select(col("doc_id"), col("source"), col("__cum_tokens").as("cum_tokens"))
        .orderBy("doc_id")
    }),

    // connected-components collapse of the exact-Jaccard pair graph:
    // min reachable id per doc (iterative label propagation)
    "x18_dedup_clusters" -> ((s, dir) =>
      graft.ops.Dedup.duplicateClusters(
        graft.ops.Dedup.shingleJaccardPairsExact(t(s, dir, "documents"),
          "doc_id", "text", maxId = 300, threshold = 0.5, shingleSize = 3))
        .orderBy("id")),

    // deterministic stratified sample: 20 hash-smallest docs per language
    // (WindowGroupLimit keeps map-side top-k before the one shuffle)
    "x16_sample_stratified" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedTopK(t(s, dir, "documents"),
        "lang", "doc_id", k = 20)
        .select("doc_id", "lang", "n_chars").orderBy("lang", "doc_id")),

    // deterministic hash-fraction sample: map-only, no RNG state
    "x17_sample_fraction" -> ((s, dir) =>
      graft.ops.Sampling.fractionByHash(t(s, dir, "documents"), "doc_id", 0.1)
        .select("doc_id", "lang").orderBy("doc_id")),

    // cohort retention triangle: daily cohorts by first activity, cells
    // count re-active users up to 7 days out. Events collapse to
    // distinct (user, day) before anything else shuffles
    "x69_retention" -> ((s, dir) =>
      graft.streaming.EventStreams.retention(
        graft.streaming.EventStreams.eventsFrame(s, dir),
        periodSeconds = 86400L, maxOffset = 7)
        .orderBy("cohort", "offset")),

    // retention past the mask word (maxOffset 70 > 62): the pair-shape
    // fallback (distinct + window cohort, r18 form) under its own
    // DuckDB oracle, so BOTH retention shapes stay externally pinned
    "x69b_retention_wide" -> ((s, dir) =>
      graft.streaming.EventStreams.retention(
        graft.streaming.EventStreams.eventsFrame(s, dir),
        periodSeconds = 86400L, maxOffset = 70)
        .orderBy("cohort", "offset")),

    // gap sessionization, batch form (same semantics as the streaming
    // flatMapGroupsWithState operator; one user_id shuffle + window funcs)
    "x15_events_sessions" -> ((s, dir) =>
      graft.streaming.EventStreams.sessionizeBatch(
        graft.streaming.EventStreams.eventsFrame(s, dir), gapSeconds = 21600)
        .orderBy("user_id", "session_start")),

    // the native session_window strategy under the SAME oracle as x15
    // (verbatim SQL share, the x14b pattern): the layout-dependent fast
    // path must reproduce the segmented carry's sessions exactly
    "x15b_sessions_native" -> ((s, dir) =>
      graft.streaming.EventStreams.sessionizeNative(
        graft.streaming.EventStreams.eventsFrame(s, dir), gapSeconds = 21600)
        .orderBy("user_id", "session_start")),

    // multimodal plumbing: binary assets → stub batch decode → features
    // frame-sample plumbing (x12c): every stride-th chunk's byte count
    // over the text-as-binary assets — pure slicing expressions, one
    // posexplode, no shuffle; the oracle replays the slice arithmetic
    // over DuckDB blobs byte for byte
    "x12c_mm_chunks" -> ((s, dir) => {
      val assets = graft.ops.Multimodal.assetsFromText(
        t(s, dir, "documents"), "doc_id", "text")
      graft.ops.Multimodal.sampleChunks(assets, chunkSize = 64, stride = 4)
        .orderBy("asset_id", "chunk_index")
    }),

    "x12_mm_decode" -> ((s, dir) => {
      val assets = graft.ops.Multimodal.assetsFromText(
        t(s, dir, "documents"), "doc_id", "text")
      graft.ops.Multimodal.decodeFeatures(s, assets, partitions = 8)
        .select(col("asset_id"), col("media_type"),
          element_at(col("features"), 1).cast("long").as("payload_bytes"),
          size(col("features")).as("n_features"))
        .orderBy("asset_id")
    }),

    // real container-header decode: each doc becomes a minimal PNG
    // header (signature + IHDR) whose width/height derive from doc_id,
    // built byte-exact with hex/unhex expressions; decodeMeta must
    // round-trip the big-endian u32 fields back out. The unit suite
    // additionally pins sniffHeader against REAL ImageIO-encoded
    // png/gif/jpeg bytes; this oracle checks the parse arithmetic at
    // corpus scale.
    "x12b_mm_meta" -> ((s, dir) => {
      val w = (col("doc_id") % 1024 + 1).cast("int")
      val h = (col("doc_id") % 768 + 1).cast("int")
      val assets = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("asset_id"),
        lit("image").as("media_type"),
        unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
          lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"))).as("payload"))
      graft.ops.Multimodal.decodeMeta(assets)
        .select("asset_id", "format", "width", "height", "payload_bytes")
        .orderBy("asset_id")
    }),

    // TF-IDF keywords: one (doc, term) shuffle with map-side combine,
    // postings-window document frequency, per-doc WindowGroupLimit top-k
    "x44_tfidf_keywords" -> ((s, dir) =>
      graft.ops.Search.tfidfKeywords(t(s, dir, "documents"),
        "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")),

    // Gopher-style rule filter with an audit trail: map-only; thresholds
    // here are calibrated so the synthetic corpus splits on every rule
    // (operator defaults are the real-world Gopher-ish values)
    "x45_quality_rules" -> ((s, dir) =>
      graft.ops.TextOps.qualityRules(t(s, dir, "documents"), "text",
        minTokens = 20, maxTokens = 80, minMeanLen = 3.0, maxMeanLen = 4.8,
        maxDupWordFrac = 0.6, minStopwordRatio = 0.02, minAlphaRatio = 0.7)
        .select("doc_id", "n_tokens", "pass", "reasons").orderBy("doc_id")),

    // corpus-self unigram LM fluency scoring: one token shuffle to the
    // vocabulary join, per-doc ordered log fold (bit-stable)
    "x46_unigram_nll" -> ((s, dir) =>
      graft.ops.Search.unigramNll(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // granule-bucketed range join: events into literal time windows
    // (w5 overlaps w1/w3, proving many-to-many pairs survive exactly once)
    "x47_range_join" -> ((s, dir) => {
      import s.implicits._
      // window bounds/granule are authored in MICROS and scaled to the
      // fixture's embedded ts units (×1000 if the driver regenerates the
      // events layout back to LONG nanos — see eventsTsUnitsPerMicro)
      val ev = t(s, dir, "events").select("event_id", "ts", "event_type")
      val scale = eventsTsUnitsPerMicro(ev)
      val dayUs = 86400L * 1000000L * scale
      def us(day: Int): Long =
        java.time.LocalDate.of(2024, 1, day)
          .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000L * scale
      val windows = Seq(
        ("w1", us(3), us(7)), ("w2", us(10), us(11)), ("w3", us(15), us(22)),
        ("w4", us(25), us(26)), ("w5", us(5), us(16)))
        .toDF("window_name", "w_start", "w_end")
      graft.ops.Joins.rangeJoin(
        ev, windows, "ts", "w_start", "w_end", Seq("window_name"),
        granule = dayUs)
        .select("event_id", "window_name").orderBy("event_id", "window_name")
    }),

    // exact duplicated-span scrub: excise every token covered by a
    // corpus-duplicated 6-gram occurrence (one gram exchange via the
    // postings window, dup-only rollup, map-side rewrite)
    "x48_span_scrub" -> ((s, dir) =>
      graft.ops.Dedup.scrubDuplicatedSpans(t(s, dir, "documents"),
        "doc_id", "text", n = 6)
        .orderBy("doc_id")),

    // n-gram novelty: fraction of a doc's distinct 5-grams first seen in
    // it (min-id window over the gram lineage — data-valuation signal)
    "x49_gram_novelty" -> ((s, dir) =>
      graft.ops.Dedup.gramNovelty(t(s, dir, "documents"),
        "doc_id", "text", n = 5)
        .orderBy("id")),

    // per-source unigram KL divergence vs the corpus (domain-drift
    // monitor; token-ordered fold, engine-portable)
    "x50_token_divergence" -> ((s, dir) =>
      graft.ops.Profile.tokenDivergence(t(s, dir, "documents"),
        "source", "text")
        .orderBy("source")),

    // PMI collocations: map-side per-doc pair expansion (no token
    // self-join), partial-combine pair counts, TakeOrdered top-k
    "x51_pmi_pairs" -> ((s, dir) =>
      graft.ops.TextOps.pmiCollocations(t(s, dir, "documents"),
        "text", k = 25)),

    // adaptive per-source outlier filter: keep docs inside their OWN
    // source's [p10, p90] length band (tiny bounds relation broadcast
    // back; the corpus never shuffles)
    "x52_len_band" -> ((s, dir) =>
      graft.ops.Sampling.quantileBandFilter(t(s, dir, "documents"),
        "source", "n_chars", 0.1, 0.9)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")),

    // bigram LM fluency: map-side bigram zip, one (prev, cur) shuffle,
    // unigram-context join, position-ordered per-doc fold
    "x53_bigram_nll" -> ((s, dir) =>
      graft.ops.Search.bigramNll(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // skew stress: 80% of the corpus collapsed onto ONE boilerplate
    // text, then gram-duplication stats over the skewed corpus — the
    // bench witness for the window→aggregate lineage rewrite (a hot
    // gram partial-combines per mapper instead of funneling its whole
    // occurrence set into a single task; regressions here mean a skewed
    // single-task stage came back)
    "x54_skew_dupgrams" -> ((s, dir) => {
      val skewed = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 5 =!= 0,
          lit("the same boilerplate page body repeated across the whole crawl"))
          .otherwise(col("text")))
      graft.ops.Dedup.dupGramStats(skewed, "doc_id", "text", n = 5)
        .orderBy("id")
    }),

    // C4-style line dedup over a derived multi-line corpus: the word
    // stream breaks into 10-word lines, every 3rd doc gets a shared
    // header and every doc the same footer — the boilerplate the
    // operator must strip corpus-wide while each doc's own lines stay
    "x55_line_dedup" -> ((s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        concat(
          when(col("doc_id") % 3 === 0,
            lit("subscribe to our newsletter\n")).otherwise(lit("")),
          regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n"),
          lit("\nall rights reserved")))
      graft.ops.Dedup.dedupLines(lined, "doc_id", "text")
        .orderBy("id")
    }),

    // corpus-frequency boilerplate scrub over the same derived
    // multi-line corpus: lines shared by >= 100 distinct docs (the
    // injected banner + footer; any line from a large exact-dup text
    // cluster) vanish from EVERY document — where x55 keeps a frequent
    // line's first occurrence, boilerplate deserves none
    "x75_common_line_scrub" -> ((s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        concat(
          when(col("doc_id") % 3 === 0,
            lit("subscribe to our newsletter\n")).otherwise(lit("")),
          regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n"),
          lit("\nall rights reserved")))
      graft.ops.Dedup.scrubCommonLines(lined, "doc_id", "text", minDocs = 100)
        .orderBy("id")
    }),

    // C4-style line-quality filter over the same derived multi-line
    // corpus: boilerplate javascript banners and too-short lines drop,
    // period-terminated 10-word sentences survive — entirely map-side
    "x56_line_quality" -> ((s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        concat(
          when(col("doc_id") % 2 === 0,
            lit("please enable javascript to continue\n")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("ok\n")).otherwise(lit("")),
          regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1.\n"),
          lit(".")))
      graft.ops.TextOps.filterLines(lined, "text")
        .select("doc_id", "clean_text", "n_kept", "n_lines")
        .orderBy("doc_id")
    }),

    // deterministic weighted sample (Efraimidis-Spirakis keys from the
    // id hash, longer docs proportionally likelier) — TakeOrdered plan,
    // no global sort
    "x57_sample_weighted" -> ((s, dir) =>
      graft.ops.Sampling.weightedByHash(t(s, dir, "documents"),
        "doc_id", "n_chars", k = 100)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")),

    // overlapping token-window chunking: map-side window slices from a
    // once-materialized token array, explode is the only expansion
    "x58_text_chunks" -> ((s, dir) =>
      graft.ops.TextOps.chunkText(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, stride = 16)
        .orderBy("id", "chunk_idx")),

    // per-doc OOV rate vs the corpus's own top-30 vocabulary
    // (k-bounded vocab broadcasts; corpus never shuffles on tokens)
    "x59_oov_rate" -> ((s, dir) =>
      graft.ops.TextOps.oovRate(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 30)
        .orderBy("id")),

    // x59 driven through a PERSISTED vocabulary artifact (the fourth
    // artifact kind): the top-k relation is built+saved once per corpus
    // version, and the oov probe's vocabulary side comes from the
    // artifact's rank<=30 slice instead of a per-query corpus
    // aggregation. Built at a LARGER k than consumed (50 vs 30) to
    // exercise the rank slice; sharing x59's oracle verbatim proves
    // the artifact round-trip changes nothing
    "x73_vocab_artifact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = anchorTmpPath("graft_vocab_anchor", dir)
      val art = graft.ops.VocabIndex.buildAndSave(docs, "text", k = 50,
        path = path)
      graft.ops.TextOps.oovRateAgainst(docs, "doc_id", "text",
        graft.ops.VocabIndex.tokens(art, 30, "vocabulary artifact"))
        .orderBy("id")
    }),

    // x59 served through an INCREMENTALLY-UPDATED vocabulary artifact —
    // the fourth artifact kind gets the maintenance loop the MinHash
    // (x72) and Bloom (x74) ledgers already have: the artifact is built
    // over a synthetic PREVIOUS corpus version (every fourth doc not
    // yet crawled), then brought to the full corpus with
    // VocabIndex.update, which summarizes ONLY the appended batch and
    // merges it into the stored Space-Saving summary (mergeable-
    // summaries algebra; never an old-corpus rescan). Ample capacity
    // makes the merge exact, so sharing x59's oracle verbatim proves
    // the updated artifact is indistinguishable from one built from
    // scratch on the full corpus
    "x78_vocab_update" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 4 =!= 1)
      val added = docs.filter(col("doc_id") % 4 === 1)
      val path = anchorTmpPath("graft_vocab_upd", dir)
      graft.ops.VocabIndex.buildAndSave(v1, "text", k = 50, path = path,
        capacity = Some(4096))
      val art = graft.ops.VocabIndex.update(s, path, added, "text")
      graft.ops.TextOps.oovRateAgainst(docs, "doc_id", "text",
        graft.ops.VocabIndex.tokens(art, 30, "vocabulary artifact"))
        .orderBy("id")
    }),

    // slab-granular vocabulary removal (the refresh-with-deletions path
    // x71 routinely reports): the artifact is built on the previous
    // crawl, brought to the full corpus by x78's update, then the
    // added slab is REMOVED — re-merging only the surviving slabs'
    // stored summaries, never rescanning a corpus. Ample capacity
    // makes every merge exact, so the result must serve the exact
    // vocabulary of the never-added corpus — the oracle computes that
    // truth independently over the surviving docs
    "x89_vocab_remove" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 4 =!= 1)
      val added = docs.filter(col("doc_id") % 4 === 1)
      val path = anchorTmpPath("graft_vocab_rm", dir)
      graft.ops.VocabIndex.buildAndSave(v1, "text", k = 50, path = path,
        capacity = Some(4096))
      val grown = graft.ops.VocabIndex.update(s, path, added, "text")
      val slabId = grown.slabs.get.map(_.id).max
      val art = graft.ops.VocabIndex.removeSlab(s, path, slabId)
      graft.ops.TextOps.oovRateAgainst(v1, "doc_id", "text",
        graft.ops.VocabIndex.tokens(art, 30, "vocabulary artifact"))
        .orderBy("id")
    }),

    // slab compaction end-to-end (x89's recipe with a compaction in the
    // middle): build over %4==0, ingest %4==1 and %4==2 as slabs,
    // compact all but the newest into an epoch, then remove the
    // SURVIVING newest slab — the artifact must serve the exact top-30
    // vocabulary of the %4 ∈ {0,1} corpus, proving the epoch fold
    // perturbed no bound (independent oracle over that corpus)
    "x91_vocab_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = anchorTmpPath("graft_vocab_cp", dir)
      graft.ops.VocabIndex.buildAndSave(docs.filter(col("doc_id") % 4 === 0),
        "text", k = 50, path = path, capacity = Some(4096))
      graft.ops.VocabIndex.update(s, path,
        docs.filter(col("doc_id") % 4 === 1), "text")
      val grown = graft.ops.VocabIndex.update(s, path,
        docs.filter(col("doc_id") % 4 === 2), "text")
      graft.ops.VocabIndex.compactSlabs(s, path, keepLast = 1)
      val art = graft.ops.VocabIndex.removeSlab(s, path,
        grown.slabs.get.map(_.id).max)
      graft.ops.TextOps.oovRateAgainst(docs.filter(col("doc_id") % 4 <= 1),
        "doc_id", "text",
        graft.ops.VocabIndex.tokens(art, 30, "vocabulary artifact"))
        .orderBy("id")
    }),

    // span-level decontamination: excise eval-contaminated 8-gram spans
    // from the train split instead of dropping whole documents (x21's
    // split: src7 plays the eval set)
    "x60_decontam_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.scrubContaminated(
        docs.filter(col("source") =!= "src7"),
        docs.filter(col("source") === "src7"),
        "doc_id", "text", n = 8).orderBy("doc_id")
    }),

    // SemDeDup (cluster-then-dedup, Abbas et al. 2023): fixed centroids
    // (x42b's), LSH candidates within cluster only, greedy keep-min-id
    // survivors. The corpus has no true near-dups (max pairwise cos ≈
    // 0.51), so perturbed copies are spiked in at a collision-proof id
    // offset — rows-only here (LSH recall); x61b is the exact-anchor twin
    // and the unit spec gates recall + precision of this scale path.
    "x61_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents: Seq[Seq[Double]] = e.filter(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val base = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val perturbed = base.filter(col("vec_id") < 150)
        .select((col("vec_id") + (1L << 40)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
      graft.ops.Similarity.semanticDedup(base.unionByName(perturbed),
          "vec_id", "embedding", cents, threshold = 0.95)
        .select(col("vec_id"), col("cluster")).orderBy("vec_id")
    }),

    // exact-anchor twin of x61 (same spike recipe as x5b): complete
    // within-cluster pairs on the id-bounded slice, then the same greedy
    // smaller-id drop — DuckDB replays assignment (x42b's argmax) and
    // the NOT EXISTS drop rule, so this row is a full oracle gate on the
    // SemDeDup semantics
    "x61b_semantic_dedup_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents: Seq[Seq[Double]] = e.filter(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val base = e.filter(col("vec_id") < 150).select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val perturbed = base
        .select((col("vec_id") + 1000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
      graft.ops.Similarity.semanticDedupExact(base.unionByName(perturbed),
          "vec_id", "embedding", cents, maxId = 10000, threshold = 0.95)
        .select(col("vec_id"), col("cluster")).orderBy("vec_id")
    }),

    // quality-priority clustered collapse: connected components over the
    // exact-Jaccard pair relation (x4's), keep the LONGEST member of each
    // component (ties → min id) — the keep-best-representative policy
    // real pipelines use instead of keep-first
    "x62_dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ops.Dedup.shingleJaccardPairsExact(docs,
        "doc_id", "text", maxId = 300, threshold = 0.5, shingleSize = 3)
      graft.ops.Dedup.dropNearDuplicatesClusteredBy(
          docs.filter(col("doc_id") < 300), pairs, "doc_id",
          length(col("text")))
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // batch twin of the watermarked stream-stream interval join: clicks
    // attributed to each error of the same user within the preceding 6 h
    // (granule-bucketed range join — no nested loop), rolled up per error
    "x63_interval_join" -> ((s, dir) => {
      val ev = graft.streaming.EventStreams.eventsFrame(s, dir)
      graft.streaming.EventStreams.intervalJoinBatch(
          ev.filter(col("event_type") === "error"),
          ev.filter(col("event_type") === "click"),
          "user_id", horizonSeconds = 21600)
        .groupBy(col("anchor_id").as("err_id"))
        .agg(count(lit(1)).as("n_clicks"),
          round(sum(col("match_value")), 4).as("click_value"))
        .orderBy("err_id")
    }),

    // ordered funnel: earliest strictly-increasing signup → click →
    // purchase completion per user (greedy-earliest = maximal depth for
    // an unbounded funnel; k-1 key joins + k partial-combining min aggs)
    "x64_funnel" -> ((s, dir) =>
      graft.streaming.EventStreams.funnel(
          graft.streaming.EventStreams.eventsFrame(s, dir),
          "user_id", Seq("signup", "click", "purchase"))
        .orderBy("user_id")),

    // Gopher-style within-doc repetition signals (dup lines / top
    // 2-gram / duplicated 5-gram char coverage): MAP-ONLY, zero
    // exchanges — each doc's gram passes are one array_sort + run folds.
    // The derived multi-line corpus re-uses x55's layout (10-word lines,
    // every 3rd doc a shared header, every doc the same footer) so line
    // repetition actually exists to measure.
    "x65_repetition" -> ((s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        concat(
          when(col("doc_id") % 3 === 0,
            lit("subscribe to our newsletter\n")).otherwise(lit("")),
          regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n"),
          lit("\nall rights reserved")))
      graft.ops.TextOps.repetitionSignals(lined, "doc_id", "text")
        .orderBy("id")
    }),

    // hot-entity funnel stress (the bot-account problem): ~80% of all
    // events collapse onto ONE user, then the same 3-step funnel — the
    // bench witness that the step joins absorb a hot entity's fan-out
    // map-side (each step's min aggregate partial-combines per mapper;
    // the left side stays one row per entity, so no per-entity history
    // ever materializes; regressions here mean a skewed single-task
    // stage appeared in the step chain)
    "x64b_funnel_hot" -> ((s, dir) =>
      graft.streaming.EventStreams.funnel(
          graft.streaming.EventStreams.eventsFrame(s, dir)
            .withColumn("user_id",
              when(col("user_id") % 5 =!= 0, lit(0L)).otherwise(col("user_id"))),
          "user_id", Seq("signup", "click", "purchase"))
        .orderBy("user_id")),

    // left-outer form: EVERY error survives, matchless ones with a zero
    // click count and null sum — count(match_ts) counts non-null matches
    "x63b_interval_join_left" -> ((s, dir) => {
      val ev = graft.streaming.EventStreams.eventsFrame(s, dir)
      graft.streaming.EventStreams.intervalJoinBatch(
          ev.filter(col("event_type") === "error"),
          ev.filter(col("event_type") === "click"),
          "user_id", horizonSeconds = 21600, how = "left")
        .groupBy(col("anchor_id").as("err_id"))
        .agg(count(col("match_ts")).as("n_clicks"),
          round(sum(col("match_value")), 4).as("click_value"))
        .orderBy("err_id")
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      // sums accumulate as exact HUGEINT cents (the columns are
      // cent-structured), divided back once — plain double sum drifts in
      // the last ulp at 60M rows (aggregation-order dependent) where the
      // Spark side is Kahan-compensated; the exact form reads exact at
      // EVERY scale rung (the x86 integer-moments precedent)
      """SELECT l_returnflag, l_linestatus,
                round(CAST(sum(CAST(round(l_quantity * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 2) AS l_quantity,
                round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 2) AS l_extendedprice,
                round(CAST(sum(CAST(round(l_discount * 100) AS HUGEINT))
                      AS DOUBLE) / 100 / count(l_discount), 6) AS l_discount,
                count(l_orderkey) AS l_orderkey
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_cmp" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem
         WHERE l_quantity > 30 AND l_discount < 0.05 AND l_returnflag = 'A'
         ORDER BY l_orderkey, l_linenumber""",
    "q3_filter_or_not" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
         FROM orders
         WHERE o_orderstatus = 'F' OR NOT (o_totalprice > 100000)
         ORDER BY o_orderkey""",
    "q4_filter_in" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation WHERE n_regionkey IN (0, 2) ORDER BY n_nationkey""",
    "q5_filter_like" ->
      """SELECT p_partkey, p_name, p_type
         FROM part
         WHERE p_type LIKE 'ECON%' OR p_name ILIKE '%WIDGET%'
         ORDER BY p_partkey""",
    "q6_filter_notnull" ->
      """SELECT count(value) AS value FROM events WHERE value IS NOT NULL""",
    "q7_filter_bits" ->
      """SELECT event_id, user_id FROM events
         WHERE (user_id & 3) > 0 AND NOT ((user_id & 3) = 3)
         ORDER BY event_id""",
    "q8_project" ->
      """SELECT c_name, round(c_acctbal, 2) AS c_acctbal, c_mktsegment
         FROM customer ORDER BY c_name""",
    "q9_computed" ->
      """SELECT p_partkey,
                round(p_retailprice / (p_size + 1), 4) AS value_density,
                round(power(p_size, 2), 1) AS size_sq,
                round(sqrt(p_retailprice), 4) AS rp_sqrt
         FROM part ORDER BY p_partkey""",
    "q10_agg_global" ->
      // exact HUGEINT-cents accumulation (see q1_agg)
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT))
                      AS DOUBLE) / 100, 2) AS l_extendedprice,
                round(CAST(sum(CAST(round(l_quantity * 100) AS HUGEINT))
                      AS DOUBLE) / 100 / count(l_quantity), 4) AS l_quantity,
                count(l_orderkey) AS l_orderkey,
                min(l_shipdate) AS l_shipdate
         FROM lineitem""",
    "q11_count" ->
      """SELECT count(*) AS count FROM lineitem WHERE l_quantity > 25""",
    "q12_agg_stats" ->
      """SELECT o_orderstatus,
                round(median(o_totalprice), 2) AS o_totalprice,
                count(DISTINCT o_custkey) AS o_custkey
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q12b_agg_stddev" ->
      """SELECT o_orderpriority,
                round(stddev_samp(o_totalprice), 2) AS o_totalprice
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q12c_agg_var" ->
      """SELECT o_orderstatus,
                round(var_samp(o_totalprice), 1) AS o_totalprice
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q13_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
         FROM lineitem ORDER BY l_returnflag, l_linestatus""",
    "q15_order_slice" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""",
    "q16_from_pct" ->
      """SELECT o_custkey, round(o_totalprice, 2) / 1000 AS spend_k
         FROM (SELECT o_custkey, sum(o_totalprice) AS o_totalprice
               FROM orders GROUP BY o_custkey)
         ORDER BY o_custkey""",
    "q17_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
         ORDER BY o_orderkey""",
    "q18_update" ->
      """SELECT l_orderkey, l_linenumber,
                round(CASE WHEN l_discount < 0.03 THEN l_quantity * 2
                           ELSE l_quantity END, 2) AS l_quantity,
                CASE WHEN l_discount < 0.03 THEN 0.0 ELSE l_tax END AS l_tax
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q18b_update_crosstype" ->
      """SELECT event_id,
                CASE WHEN value > 90.0 THEN '7!' ELSE event_type END AS event_type
         FROM events ORDER BY event_id""",
    "q19_update_shift" ->
      """SELECT event_id,
                CASE WHEN event_type IN ('click', 'error') THEN user_id * 4
                     ELSE user_id END AS user_id,
                event_type
         FROM events ORDER BY event_id""",
    "q23_mixed_null_str" ->
      """SELECT event_id, 'hi' AS tag FROM events
         WHERE value < 50.0 ORDER BY event_id""",
    "q23b_mixed_null_num" ->
      """SELECT event_id FROM events ORDER BY event_id""",
    "q20_events_agg" ->
      """SELECT event_type, round(avg(value), 4) AS value,
                count(event_id) AS event_id
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q21_agg_firstlast" ->
      """SELECT l_returnflag,
                first(l_linestatus ORDER BY l_orderkey, l_linenumber) AS l_linestatus,
                last(l_quantity ORDER BY l_orderkey, l_linenumber) AS l_quantity
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q22_agg_prod" ->
      """SELECT n_regionkey, product(n_nationkey) AS n_nationkey
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "x1_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
           SELECT *, row_number() OVER (
               PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
           FROM (SELECT * FROM documents UNION ALL
                 SELECT doc_id + 1000000, text, lang, source, n_chars FROM documents))
         WHERE rn = 1 ORDER BY doc_id""",
    "x3b_simhash_complete" ->
      // the anchor's claim IS the empty result: banded candidates at the
      // pigeonhole-complete threshold (hamming <= 3 over 4x16-bit bands)
      // must equal the exhaustive pairs, so their symmetric difference
      // has zero rows by construction — any row is a completeness bug
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
                CAST(NULL AS INTEGER) AS hamming
         WHERE false""",
    "x4_dedup_jaccard" ->
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                      len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         FROM s a, s b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",
    "x77_dedup_sweep" ->
      // x4's pair machinery at the sweep's floor threshold, then the
      // curve: per-doc max score, counted cumulatively per threshold
      // (LEFT JOIN keeps zero-drop thresholds); thresholds compare on
      // the rounded score on both sides
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS j
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
         m AS (SELECT id_b, max(j) AS ms FROM p GROUP BY id_b),
         th(threshold) AS (VALUES (0.2::DOUBLE), (0.3::DOUBLE),
                                  (0.5::DOUBLE), (0.7::DOUBLE), (0.9::DOUBLE)),
         n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 300)
         SELECT th.threshold,
                CAST(count(m.ms) AS BIGINT) AS docs_dropped,
                n.n_docs,
                -- floor-form half-up: round()'s half-tie behavior on
                -- binary floats is engine-specific (the x24 convention)
                floor((CASE WHEN n.n_docs = 0 THEN 0.0
                            ELSE count(m.ms)::DOUBLE / n.n_docs END)
                      * 1e4 + 0.5) / 1e4 AS drop_rate
         FROM th LEFT JOIN m ON m.ms >= th.threshold CROSS JOIN n
         GROUP BY th.threshold, n.n_docs
         ORDER BY threshold""",
    "x90_dedup_weighted" ->
      // collapse = GROUP BY the normalized-text fingerprint (x1's key);
      // pairs = x4's quadratic exact Jaccard over the REPRESENTATIVES,
      // multiplicities carried through — the weighted op's whole claim
      """WITH src AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT doc_id + 2000000 AS doc_id, text FROM documents
           WHERE doc_id < 300 AND doc_id % 2 = 0),
         reps AS (
           SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
                  CAST(count(*) AS BIGINT) AS mult
           FROM src
           GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
         t AS (
           SELECT doc_id, mult,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM reps),
         s AS (
           SELECT doc_id, mult,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                      len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard,
                a.mult AS mult_a, b.mult AS mult_b
         FROM s a, s b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",
    "x90b_weighted_sweep" ->
      // the BRUTE-FORCE expansion: exact pairs over the full duplicated
      // slice (copies and all), per-doc max, cumulative counts — the
      // weighted fold must reproduce this curve term for term
      """WITH src AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT doc_id + 2000000 AS doc_id, text FROM documents
           WHERE doc_id < 300 AND doc_id % 2 = 0),
         t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM src),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS j
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         m AS (SELECT id_b, max(j) AS ms FROM p GROUP BY id_b),
         th(threshold) AS (VALUES (0.5::DOUBLE), (0.7::DOUBLE),
                                  (0.9::DOUBLE), (1.0::DOUBLE)),
         n AS (SELECT count(*) AS n_docs FROM src)
         SELECT th.threshold,
                CAST(count(m.ms) AS BIGINT) AS docs_dropped,
                n.n_docs,
                floor((CASE WHEN n.n_docs = 0 THEN 0.0
                            ELSE count(m.ms)::DOUBLE / n.n_docs END)
                      * 1e4 + 0.5) / 1e4 AS drop_rate
         FROM th LEFT JOIN m ON m.ms >= th.threshold CROSS JOIN n
         GROUP BY th.threshold, n.n_docs
         ORDER BY threshold""",
    "x92b_simhash_weighted_expand" ->
      // the anchor's claim IS the empty result: the weighted SimHash
      // relation's expanded arithmetic nets to zero against the plain
      // pairs on the expanded corpus — any row is a collapse bug
      """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
                CAST(NULL AS INTEGER) AS hamming, CAST(NULL AS BIGINT) AS cnt
         WHERE false""",
    "x92c_simhash_weighted_sweep" ->
      // empty by the same construction: the weighted fold's curve must
      // equal the expanded brute-force curve term for term
      """SELECT CAST(NULL AS DOUBLE) AS threshold,
                CAST(NULL AS BIGINT) AS docs_dropped,
                CAST(NULL AS BIGINT) AS n_docs,
                CAST(NULL AS DOUBLE) AS drop_rate
         WHERE false""",
    "x93b_embcos_weighted_exact" ->
      // collapse = GROUP BY the vector itself (equal md5 fingerprints on
      // the Spark side ⟺ equal vectors — Spark's double rendering is
      // round-trip); pairs = quadratic exact cosine over representatives
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS embedding
           FROM embeddings WHERE vec_id < 150),
         src AS (
           SELECT vec_id, embedding FROM base
           UNION ALL
           SELECT vec_id + 1000 AS vec_id, embedding FROM base
           UNION ALL
           SELECT vec_id + 2000 AS vec_id, embedding FROM base
           WHERE vec_id % 2 = 0
           UNION ALL
           SELECT vec_id + 3000 AS vec_id,
                  [embedding[i] * (1.0 + ((i - 1) % 7) / 1000.0)
                   for i in range(1, len(embedding) + 1)]::DOUBLE[] AS embedding
           FROM base),
         reps AS (
           SELECT min(vec_id) AS vec_id, CAST(count(*) AS BIGINT) AS mult,
                  embedding
           FROM src GROUP BY embedding)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cos,
                a.mult AS mult_a, b.mult AS mult_b
         FROM reps a, reps b
         WHERE a.vec_id < b.vec_id
           AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95
         ORDER BY id_a, id_b""",
    "x93c_embcos_weighted_sweep" ->
      // the BRUTE-FORCE expansion (x90b's pattern for this family):
      // exact cosine pairs over the full duplicated slice, per-doc max,
      // cumulative counts — the weighted fold must reproduce the curve
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS embedding
           FROM embeddings WHERE vec_id < 150),
         src AS (
           SELECT vec_id, embedding FROM base
           UNION ALL
           SELECT vec_id + 1000 AS vec_id, embedding FROM base
           UNION ALL
           SELECT vec_id + 2000 AS vec_id, embedding FROM base
           WHERE vec_id % 2 = 0
           UNION ALL
           SELECT vec_id + 3000 AS vec_id,
                  [embedding[i] * (1.0 + ((i - 1) % 7) / 1000.0)
                   for i in range(1, len(embedding) + 1)]::DOUBLE[] AS embedding
           FROM base),
         p AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  round(list_cosine_similarity(a.embedding, b.embedding), 6) AS c
           FROM src a, src b
           WHERE a.vec_id < b.vec_id
             AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95),
         m AS (SELECT id_b, max(c) AS ms FROM p GROUP BY id_b),
         th(threshold) AS (VALUES (0.95::DOUBLE), (0.99::DOUBLE),
                                  (1.0::DOUBLE)),
         n AS (SELECT count(*) AS n_docs FROM src)
         SELECT th.threshold,
                CAST(count(m.ms) AS BIGINT) AS docs_dropped,
                n.n_docs,
                floor((CASE WHEN n.n_docs = 0 THEN 0.0
                            ELSE count(m.ms)::DOUBLE / n.n_docs END)
                      * 1e4 + 0.5) / 1e4 AS drop_rate
         FROM th LEFT JOIN m ON m.ms >= th.threshold CROSS JOIN n
         GROUP BY th.threshold, n.n_docs
         ORDER BY threshold""",
    "x94_audit_weighted" ->
      // x84's queue over the COLLAPSED relation: reps with class sizes
      // (x90's collapse CTE), exact jaccard pairs over reps at the
      // sweep floor, |score − 0.9| ascending, k = 5, rep texts joined
      """WITH src AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT doc_id + 2000000 AS doc_id, text FROM documents
           WHERE doc_id < 300 AND doc_id % 2 = 0),
         reps AS (
           SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
                  CAST(count(*) AS BIGINT) AS mult
           FROM src
           GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
         t AS (
           SELECT doc_id, mult, text,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM reps),
         s AS (
           SELECT doc_id, mult, text,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS score,
                  a.mult AS mult_a, b.mult AS mult_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
         q AS (
           SELECT *, floor(abs(score - 0.9::DOUBLE) * 1e9 + 0.5) / 1e9 AS dist
           FROM p ORDER BY dist, id_a, id_b LIMIT 5)
         SELECT q.id_a, q.id_b, q.score, q.dist, q.mult_a, q.mult_b,
                da.text AS text_a, db.text AS text_b
         FROM q JOIN reps da ON da.doc_id = q.id_a
                JOIN reps db ON db.doc_id = q.id_b
         ORDER BY dist, id_a, id_b""",
    "x95_split_leakfree" ->
      // x37's hash CASE over the exact-class REPRESENTATIVE (window min
      // per md5-of-normalized-text fingerprint) instead of the row id
      """SELECT doc_id,
                CASE WHEN h <  800000005 THEN 'train'
                     WHEN h <  900000006 THEN 'val'
                     WHEN h < 1000000007 THEN 'test' END AS split
         FROM (SELECT doc_id,
                      ((rep % 1000000007) * 654435747) % 1000000007 AS h
               FROM (SELECT doc_id,
                            min(doc_id) OVER (PARTITION BY
                              md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS rep
                     FROM documents))
         ORDER BY doc_id""",
    "x95b_split_leakfree_guard" ->
      // per-class rollup of both labelings, then the one-row contract:
      // multi-doc classes never straddle, singletons keep x37's label
      """WITH src AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, '  ' || text || ' ' AS text
           FROM documents WHERE doc_id % 2 = 0),
         lab AS (
           SELECT doc_id,
                  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                  CASE WHEN hr <  800000005 THEN 'train'
                       WHEN hr <  900000006 THEN 'val'
                       WHEN hr < 1000000007 THEN 'test' END AS lf_split,
                  CASE WHEN hi <  800000005 THEN 'train'
                       WHEN hi <  900000006 THEN 'val'
                       WHEN hi < 1000000007 THEN 'test' END AS split
           FROM (SELECT doc_id, text,
                        ((min(doc_id) OVER (PARTITION BY
                            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
                          % 1000000007) * 654435747) % 1000000007 AS hr,
                        ((doc_id % 1000000007) * 654435747) % 1000000007 AS hi
                 FROM src)),
         cls AS (
           SELECT fp, CAST(count(*) AS BIGINT) AS m,
                  CAST(count(DISTINCT lf_split) AS BIGINT) AS nsp,
                  sum(CASE WHEN lf_split = split THEN 0 ELSE 1 END)::BIGINT AS ndiff
           FROM lab GROUP BY fp)
         SELECT sum(CASE WHEN m > 1 THEN 1 ELSE 0 END)::BIGINT AS n_multi_classes,
                sum(CASE WHEN m > 1 AND nsp > 1 THEN 1 ELSE 0 END)::BIGINT AS n_straddling,
                sum(CASE WHEN m = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
                sum(CASE WHEN m = 1 THEN ndiff ELSE 0 END)::BIGINT AS n_singleton_label_diffs
         FROM cls""",
    "x95c_split_by_class" ->
      // x18's component CTEs verbatim, then the x37 CASE over
      // coalesce(cluster, doc_id)
      """WITH RECURSIVE t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, lab) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         clusters AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)
         SELECT d.doc_id,
                CASE WHEN h <  800000005 THEN 'train'
                     WHEN h <  900000006 THEN 'val'
                     WHEN h < 1000000007 THEN 'test' END AS split
         FROM (SELECT doc_id,
                      ((coalesce(c.cluster, doc_id) % 1000000007) * 654435747)
                        % 1000000007 AS h
               FROM documents LEFT JOIN clusters c ON c.id = doc_id) d
         ORDER BY d.doc_id""",
    "x82_budget_select" ->
      // the selection IS the window definition: inclusive running token
      // total in (priority DESC, id) order stays <= budget — the
      // boundary-band decomposition on the Spark side must reproduce
      // this single-window truth exactly
      """WITH t AS (
           SELECT doc_id,
                  (n_chars // 50) * 50 AS priority,
                  CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN 0
                       ELSE len(string_split(
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  END AS tokens
           FROM documents
           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
         r AS (SELECT *, sum(tokens) OVER (ORDER BY priority DESC, doc_id) AS run
               FROM t)
         SELECT doc_id AS id, priority, CAST(tokens AS BIGINT) AS tokens
         FROM r WHERE run <= 5000 ORDER BY id""",
    "x87_budget_by_source" ->
      // per-source single-window truth: run ≤ the source's budget in
      // (priority DESC, id) order within each source; named budgets as
      // a VALUES table, unlisted sources coalesce to the default
      """WITH t AS (
           SELECT doc_id, source,
                  (n_chars // 50) * 50 AS priority,
                  CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN 0
                       ELSE len(string_split(
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  END AS tokens
           FROM documents
           WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
         b(src, budget) AS (VALUES ('src0', 400), ('src1', 800), ('src2', 0)),
         r AS (SELECT t.*, coalesce(b.budget, 300) AS budget,
                      sum(tokens) OVER (PARTITION BY source
                        ORDER BY priority DESC, doc_id) AS run
               FROM t LEFT JOIN b ON t.source = b.src)
         SELECT doc_id AS id, source, priority, CAST(tokens AS BIGINT) AS tokens
         FROM r WHERE run <= budget ORDER BY id""",
    "x88_emb_drift" ->
      // x42b's fixed-centroid argmax on BOTH corpus versions, then
      // x83's PSI arithmetic over the cell-occupancy shares
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < 4),
         a AS (
           SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
             SELECT e.vec_id, c.cid AS cluster,
                    row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv)
                                 DESC, c.cid) AS rn
             FROM embeddings e, c)
           WHERE rn = 1),
         b AS (
           SELECT cluster AS value, count(*)::DOUBLE /
                  (SELECT count(*) FROM a WHERE vec_id % 4 <> 1) AS s
           FROM a WHERE vec_id % 4 <> 1 GROUP BY cluster),
         cu AS (
           SELECT cluster AS value, count(*)::DOUBLE /
                  (SELECT count(*) FROM a) AS s
           FROM a GROUP BY cluster)
         SELECT coalesce(b.value, cu.value) AS value,
                floor(coalesce(b.s, 0) * 1e6 + 0.5) / 1e6 AS share_base,
                floor(coalesce(cu.s, 0) * 1e6 + 0.5) / 1e6 AS share_cur,
                floor((greatest(coalesce(cu.s, 0), 1e-6) - greatest(coalesce(b.s, 0), 1e-6))
                      * ln(greatest(coalesce(cu.s, 0), 1e-6) / greatest(coalesce(b.s, 0), 1e-6))
                      * 1e6 + 0.5) / 1e6 AS psi
         FROM b FULL JOIN cu ON b.value IS NOT DISTINCT FROM cu.value
         ORDER BY value""",
    "x83_mix_drift" ->
      // PSI with the standard 1e-6 floor; shares and contributions
      // round to 6 decimals AFTER the arithmetic on both sides so
      // libm-ln last-ulp differences never reach the hash compare
      """WITH b AS (
           SELECT source AS value, count(*)::DOUBLE /
                  (SELECT count(*) FROM documents WHERE doc_id % 4 <> 1) AS s
           FROM documents WHERE doc_id % 4 <> 1 GROUP BY source),
         c AS (
           SELECT source AS value, count(*)::DOUBLE /
                  (SELECT count(*) FROM documents) AS s
           FROM documents GROUP BY source)
         SELECT coalesce(b.value, c.value) AS value,
                floor(coalesce(b.s, 0) * 1e6 + 0.5) / 1e6 AS share_base,
                floor(coalesce(c.s, 0) * 1e6 + 0.5) / 1e6 AS share_cur,
                floor((greatest(coalesce(c.s, 0), 1e-6) - greatest(coalesce(b.s, 0), 1e-6))
                      * ln(greatest(coalesce(c.s, 0), 1e-6) / greatest(coalesce(b.s, 0), 1e-6))
                      * 1e6 + 0.5) / 1e6 AS psi
         FROM b FULL JOIN c ON b.value IS NOT DISTINCT FROM c.value
         ORDER BY value""",
    "x84_audit_pairs" ->
      // x4's pair machinery at the sweep floor, then the review queue:
      // |score - 0.9| ascending (rounded at 9 on both sides), pair
      // identity breaking ties, k = 5, texts joined in
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS score
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
         q AS (
           SELECT *, floor(abs(score - 0.9::DOUBLE) * 1e9 + 0.5) / 1e9 AS dist
           FROM p ORDER BY dist, id_a, id_b LIMIT 5)
         SELECT q.id_a, q.id_b, q.score, q.dist,
                da.text AS text_a, db.text AS text_b
         FROM q JOIN documents da ON da.doc_id = q.id_a
                JOIN documents db ON db.doc_id = q.id_b
         ORDER BY dist, id_a, id_b""",
    "x82b_budget_select_skew" ->
      // x82's window truth with every doc at ONE priority: pure id
      // order — the all-boundary worst case the shard prefix must match
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN 0
                       ELSE len(string_split(
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  END AS tokens
           FROM documents WHERE doc_id IS NOT NULL),
         r AS (SELECT *, sum(tokens) OVER (ORDER BY doc_id) AS run FROM t)
         SELECT doc_id AS id, CAST(tokens AS BIGINT) AS tokens
         FROM r WHERE run <= 5000 ORDER BY id""",
    "x83b_len_drift" ->
      // x83's PSI arithmetic over 100-char length bands — numeric drift
      // through the same lens
      """WITH b AS (
           SELECT (n_chars // 100) * 100 AS value, count(*)::DOUBLE /
                  (SELECT count(*) FROM documents WHERE doc_id % 4 <> 1) AS s
           FROM documents WHERE doc_id % 4 <> 1 GROUP BY 1),
         c AS (
           SELECT (n_chars // 100) * 100 AS value, count(*)::DOUBLE /
                  (SELECT count(*) FROM documents) AS s
           FROM documents GROUP BY 1)
         SELECT coalesce(b.value, c.value) AS value,
                floor(coalesce(b.s, 0) * 1e6 + 0.5) / 1e6 AS share_base,
                floor(coalesce(c.s, 0) * 1e6 + 0.5) / 1e6 AS share_cur,
                floor((greatest(coalesce(c.s, 0), 1e-6) - greatest(coalesce(b.s, 0), 1e-6))
                      * ln(greatest(coalesce(c.s, 0), 1e-6) / greatest(coalesce(b.s, 0), 1e-6))
                      * 1e6 + 0.5) / 1e6 AS psi
         FROM b FULL JOIN c ON b.value IS NOT DISTINCT FROM c.value
         ORDER BY value""",
    "x85_cluster_spectrum" ->
      // x18's reachability closure, then the family-size spectrum:
      // sizes per component, components + docs per size
      """WITH RECURSIVE t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, lab) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         comp AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
         fam AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
                 FROM comp GROUP BY cluster)
         SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(size * count(*) AS BIGINT) AS n_docs
         FROM fam GROUP BY size ORDER BY size""",
    "x2b_dedup_minhash_exact" ->
      // shares x4's oracle verbatim BY DESIGN: with every band one hash
      // wide, a >= 0.5-Jaccard pair escapes the candidate set with
      // probability ~(1-j)^64 — a mismatch is a hash-family finding
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                      len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         FROM s a, s b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",
    "x43b_minhash_against_exact" ->
      // exact cross-side Jaccard over the slice and its re-id'd copy;
      // the banded candidate generation must surface every >= 0.5 pair
      // (escape probability ~(1-j)^64 per pair)
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t)
         SELECT b.doc_id + 100000 AS batch_id, c.doc_id AS corpus_id,
                round(len(list_intersect(b.sh, c.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
         FROM s b, s c
         WHERE len(list_intersect(b.sh, c.sh))::DOUBLE /
               len(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
         ORDER BY batch_id, corpus_id""",
    "x66_minhash_index" ->
      // shares x43b's oracle verbatim BY DESIGN: the index-served
      // banding must reproduce the inline exhaustive candidate set
      // (signatures round-trip parquet bit-exactly), so the exact
      // cross-side pair set is the specified output
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t)
         SELECT b.doc_id + 100000 AS batch_id, c.doc_id AS corpus_id,
                round(len(list_intersect(b.sh, c.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
         FROM s b, s c
         WHERE len(list_intersect(b.sh, c.sh))::DOUBLE /
               len(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
         ORDER BY batch_id, corpus_id""",
    "x72_index_update" ->
      // shares x43b/x66's oracle verbatim BY DESIGN: an index brought to
      // the current corpus by the incremental update must serve the
      // exact same candidate set as one built from scratch on it
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t)
         SELECT b.doc_id + 100000 AS batch_id, c.doc_id AS corpus_id,
                round(len(list_intersect(b.sh, c.sh))::DOUBLE /
                      len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
         FROM s b, s c
         WHERE len(list_intersect(b.sh, c.sh))::DOUBLE /
               len(list_distinct(list_concat(b.sh, c.sh))) >= 0.5
         ORDER BY batch_id, corpus_id""",
    "x5b_embcos_exact" ->
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS embedding
           FROM embeddings WHERE vec_id < 150),
         pert AS (
           SELECT vec_id + 1000 AS vec_id,
                  [embedding[i] * (1.0 + ((i - 1) % 7) / 1000.0)
                   for i in range(1, len(embedding) + 1)]::DOUBLE[] AS embedding
           FROM base),
         u AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cos
         FROM u a, u b
         WHERE a.vec_id < b.vec_id
           AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95
         ORDER BY id_a, id_b""",
    "x6_ann_brute" ->
      """SELECT query_id, rank, neighbor_id, cos FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]), 6) AS cos,
                  row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                      c.embedding::DOUBLE[]) DESC,
                               c.vec_id) AS rank
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "x8_text_tokens" ->
      """SELECT doc_id,
                CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                     THEN 0
                     ELSE len(string_split(
                            trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                END AS n_tokens,
                len(regexp_extract_all(lower(text),
                    '[a-z]{1,4}|[0-9]|[^a-z0-9\s]')) AS n_bpe,
                n_chars
         FROM documents ORDER BY doc_id""",
    "x9_text_quality" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents)
         SELECT doc_id,
                len(tk)::BIGINT AS n_tokens,
                round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                      / len(text), 4) AS alpha_ratio,
                round(len(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g'))::DOUBLE
                      / len(text), 4) AS punct_ratio,
                round(len(list_filter(tk, x -> x IN
                      ('the','a','of','and','to','in','is','that','it','for',
                       'el','la','de','y','que','en','un','una','es','por',
                       'le','et','une','est','pour',
                       'der','die','das','und','zu','ist','ein','eine','mit')))::DOUBLE
                      / len(tk), 4) AS stopword_ratio
         FROM t ORDER BY doc_id""",
    "x31_asof" ->
      """SELECT e.event_id, e.user_id, e.value, c.click_value
         FROM (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'error') e
         ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS click_value
                         FROM events WHERE event_type = 'click'
                         GROUP BY 1, 2) c
           ON e.user_id = c.user_id AND e.ts >= c.ts
         ORDER BY e.event_id""",
    // the forced one-window strategy shares x31's oracle verbatim (the
    // x15b pattern): strategy choice must never change results
    "x31c_asof_window" ->
      """SELECT e.event_id, e.user_id, e.value, c.click_value
         FROM (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'error') e
         ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS click_value
                         FROM events WHERE event_type = 'click'
                         GROUP BY 1, 2) c
           ON e.user_id = c.user_id AND e.ts >= c.ts
         ORDER BY e.event_id""",
    "x31b_asof_hot" ->
      """WITH ev AS (
           SELECT event_id,
                  CASE WHEN user_id % 5 <> 0 THEN 0 ELSE user_id END AS user_id,
                  ts, event_type, value
           FROM events)
         SELECT e.event_id, e.user_id, e.value, c.click_value
         FROM (SELECT event_id, user_id, ts, value FROM ev
               WHERE event_type = 'error') e
         ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS click_value
                         FROM ev WHERE event_type = 'click'
                         GROUP BY 1, 2) c
           ON e.user_id = c.user_id AND e.ts >= c.ts
         ORDER BY e.event_id""",
    "x32_pii" ->
      """WITH spiked AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0
                         THEN text || ' reach user' || doc_id || '@mail.example.com'
                       WHEN doc_id % 3 = 1
                         THEN text || ' call +1 555-123-4567 from 10.0.0.' || (doc_id % 200)
                       ELSE text END AS text
           FROM documents)
         SELECT doc_id,
                len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
                len(regexp_extract_all(text,
                    '\+\d{1,2} \d{3}-\d{3}-\d{4}'))::BIGINT AS n_phones,
                len(regexp_extract_all(text,
                    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}'))::BIGINT AS n_ips,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\+\d{1,2} \d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
                  '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS redacted
         FROM spiked ORDER BY doc_id""",
    "x36_dedup_against" ->
      """WITH corpus AS (SELECT * FROM documents WHERE source = 'src0'),
         batch AS (
           SELECT doc_id, text, source FROM documents WHERE source = 'src1'
           UNION ALL
           SELECT doc_id + 100000, text, source FROM corpus WHERE doc_id % 5 = 0)
         SELECT doc_id, source FROM batch
         WHERE md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) NOT IN (
           SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           FROM corpus)
         ORDER BY doc_id""",
    "x37_hash_split" ->
      """SELECT doc_id,
                CASE WHEN h <  800000005 THEN 'train'
                     WHEN h <  900000006 THEN 'val'
                     WHEN h < 1000000007 THEN 'test' END AS split
         FROM (SELECT doc_id,
                      ((doc_id % 1000000007) * 654435747) % 1000000007 AS h
               FROM documents)
         ORDER BY doc_id""",
    // BM25 replayed with the identical float op sequence (left-assoc *,/,
    // left-fold +; exact-integer tf/df/N/Σdl so avgdl is the same double);
    // floor(x*1e4+0.5)/1e4 emulates Spark's HALF_UP round, x34 precedent
    "x38_bm25" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         f AS (
           SELECT doc_id,
                  CAST(CASE WHEN tk = [''] THEN 0 ELSE len(tk) END AS DOUBLE) AS dl,
                  CAST(len(list_filter(tk, x -> x = 'hash')) AS DOUBLE) AS tf0,
                  CAST(len(list_filter(tk, x -> x = 'join')) AS DOUBLE) AS tf1,
                  CAST(len(list_filter(tk, x -> x = 'filter')) AS DOUBLE) AS tf2
           FROM d),
         s AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(CAST(sum(CAST(dl AS BIGINT)) AS BIGINT) AS DOUBLE) AS sumdl,
                  CAST(CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) AS df0,
                  CAST(CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) AS df1,
                  CAST(CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) AS df2
           FROM f)
         SELECT doc_id, score FROM (
           SELECT doc_id,
                  floor((
                      ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 * (1.2 + 1)
                        / (tf0 + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))
                    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * (1.2 + 1)
                        / (tf1 + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))
                    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 * (1.2 + 1)
                        / (tf2 + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))
                  ) * 10000.0 + 0.5) / 10000.0 AS score
           FROM f, s)
         WHERE score > 0
         ORDER BY score DESC, doc_id LIMIT 20""",
    "x39_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "x7b_ann_lsh_exact" ->
      // shares x6's oracle verbatim BY DESIGN: at probe-all parameters
      // the LSH candidate set is the full corpus, so the exact brute
      // ranking is the specified output
      """SELECT query_id, rank, neighbor_id, cos FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]), 6) AS cos,
                  row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                      c.embedding::DOUBLE[]) DESC,
                               c.vec_id) AS rank
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "x14b_ann_ivf_exact" ->
      """SELECT query_id, rank, neighbor_id, cos FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]), 6) AS cos,
                  row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                      c.embedding::DOUBLE[]) DESC,
                               c.vec_id) AS rank
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    "x42b_emb_cluster_fixed" ->
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < 4)
         SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
           SELECT e.vec_id, c.cid AS cluster,
                  row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv)
                               DESC, c.cid) AS rn
           FROM embeddings e, c)
         WHERE rn = 1 ORDER BY vec_id""",
    "x79b_ivf_refine_anchor" ->
      // shares x42b's oracle verbatim BY DESIGN: a fixed-centroid
      // quantizer served through save -> refine(0 iters) -> assign must
      // reproduce the inline fixed-centroid argmax exactly (the
      // round-trip is IEEE-exact and refine(0) is a pure no-op)
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < 4)
         SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
           SELECT e.vec_id, c.cid AS cluster,
                  row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv)
                               DESC, c.cid) AS rn
           FROM embeddings e, c)
         WHERE rn = 1 ORDER BY vec_id""",
    "x41_bm25_batch" ->
      """WITH queries(query_id, query_text) AS (
           VALUES (1, 'hash join filter'), (2, 'customer order data'),
                  (3, 'stream window batch')),
         qt AS (
           SELECT query_id,
                  unnest(list_distinct(string_split(
                    trim(regexp_replace(lower(query_text), '\s+', ' ', 'g')), ' '))) AS term
           FROM queries),
         d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         post AS (
           SELECT term, doc_id, max(dl) AS dl, count(*) AS tf
           FROM (SELECT doc_id,
                        CASE WHEN tk = [''] THEN 0 ELSE len(tk) END AS dl,
                        unnest(tk) AS term FROM d)
           WHERE term IN (SELECT term FROM qt)
           GROUP BY term, doc_id),
         s AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(CAST(sum(CASE WHEN tk = [''] THEN 0 ELSE len(tk) END)
                       AS BIGINT) AS DOUBLE) AS sumdl
           FROM d),
         dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc FROM post GROUP BY term),
         sc AS (
           SELECT qt.query_id, post.doc_id,
                  floor(list_aggregate(list(
                      ln((n - dfc + 0.5) / (dfc + 0.5) + 1) * CAST(tf AS DOUBLE) * (1.2 + 1)
                        / (CAST(tf AS DOUBLE)
                           + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sumdl / n)))
                      ORDER BY term), 'sum') * 10000.0 + 0.5) / 10000.0 AS score
           FROM post JOIN dft USING (term) JOIN qt USING (term) CROSS JOIN s
           GROUP BY qt.query_id, post.doc_id, n, sumdl)
         SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM (
           SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rn
           FROM sc WHERE score > 0)
         WHERE rn <= 10
         ORDER BY query_id, score DESC, doc_id""",
    "x40_dup_grams" ->
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         g AS (
           SELECT doc_id,
                  unnest(CASE WHEN len(tk) < 5 THEN CAST([] AS VARCHAR[])
                         ELSE list_distinct([array_to_string(tk[i:i+4], ' ')
                                             for i in range(1, len(tk) - 3)])
                         END) AS gram
           FROM t),
         c AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram),
         p AS (SELECT doc_id, count(*) AS n_grams,
                      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
               FROM g JOIN c USING (gram) GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_grams, 0) AS n_grams,
                coalesce(p.n_dup_grams, 0) AS n_dup_grams,
                CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_dup_grams AS DOUBLE) / p.n_grams
                                * 10000.0 + 0.5) / 10000.0
                END AS dup_frac
         FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    "x54_skew_dupgrams" ->
      """WITH sk AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 <> 0
                       THEN 'the same boilerplate page body repeated across the whole crawl'
                       ELSE text END AS text
           FROM documents),
         t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM sk),
         g AS (
           SELECT doc_id,
                  unnest(CASE WHEN len(tk) < 5 THEN CAST([] AS VARCHAR[])
                         ELSE list_distinct([array_to_string(tk[i:i+4], ' ')
                                             for i in range(1, len(tk) - 3)])
                         END) AS gram
           FROM t),
         c AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram),
         p AS (SELECT doc_id, count(*) AS n_grams,
                      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
               FROM g JOIN c USING (gram) GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_grams, 0) AS n_grams,
                coalesce(p.n_dup_grams, 0) AS n_dup_grams,
                CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_dup_grams AS DOUBLE) / p.n_grams
                                * 10000.0 + 0.5) / 10000.0
                END AS dup_frac
         FROM sk d LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    "x55_line_dedup" ->
      """WITH src AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 3 = 0
                        THEN 'subscribe to our newsletter' || chr(10)
                        ELSE '' END)
                  || regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g')
                  || chr(10) || 'all rights reserved' AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM src),
         l AS (
           SELECT doc_id,
                  unnest(ls) AS ln,
                  unnest(range(1, len(ls) + 1)) AS idx
           FROM t),
         f AS (
           SELECT ln, min({'d': doc_id, 'i': idx}) AS fo
           FROM l WHERE trim(ln) <> '' GROUP BY ln),
         kept AS (
           SELECT fo.d AS doc_id, fo.i AS idx, ln FROM f
           UNION ALL
           SELECT doc_id, idx, ln FROM l WHERE trim(ln) = ''),
         reb AS (
           SELECT doc_id,
                  string_agg(ln, chr(10) ORDER BY idx) AS clean_text,
                  count(*) AS n_kept
           FROM kept GROUP BY doc_id)
         SELECT t.doc_id AS id,
                coalesce(r.clean_text, '') AS clean_text,
                coalesce(r.n_kept, 0) AS n_kept,
                CAST(len(ls) AS BIGINT) AS n_lines
         FROM t LEFT JOIN reb r ON t.doc_id = r.doc_id
         ORDER BY id""",
    "x75_common_line_scrub" ->
      // same line machinery as x55; the frequency head is counted in
      // DISTINCT documents and scrubbed from every position
      """WITH src AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 3 = 0
                        THEN 'subscribe to our newsletter' || chr(10)
                        ELSE '' END)
                  || regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g')
                  || chr(10) || 'all rights reserved' AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM src),
         l AS (
           SELECT doc_id,
                  unnest(ls) AS ln,
                  unnest(range(1, len(ls) + 1)) AS idx
           FROM t),
         f AS (
           SELECT ln FROM (
             SELECT ln, count(DISTINCT doc_id) AS d
             FROM l WHERE trim(ln) <> '' GROUP BY ln)
           WHERE d >= 100),
         kept AS (
           SELECT doc_id, idx, ln FROM l
           WHERE trim(ln) = '' OR ln NOT IN (SELECT ln FROM f)),
         reb AS (
           SELECT doc_id,
                  string_agg(ln, chr(10) ORDER BY idx) AS clean_text,
                  count(*) AS n_kept
           FROM kept GROUP BY doc_id)
         SELECT t.doc_id AS id,
                coalesce(r.clean_text, '') AS clean_text,
                coalesce(r.n_kept, 0) AS n_kept,
                CAST(len(ls) AS BIGINT) AS n_lines
         FROM t LEFT JOIN reb r ON t.doc_id = r.doc_id
         ORDER BY id""",
    "x56_line_quality" ->
      """WITH src AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0
                        THEN 'please enable javascript to continue' || chr(10)
                        ELSE '' END)
                  || (CASE WHEN doc_id % 7 = 0 THEN 'ok' || chr(10) ELSE '' END)
                  || regexp_replace(text, '((\S+ ){9}\S+) ', '\1.' || chr(10), 'g')
                  || '.' AS text
           FROM documents),
         t AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM src),
         k AS (
           SELECT doc_id, ls,
                  [ln for ln in ls if
                     trim(regexp_replace(ln, '\s+', ' ', 'g')) <> ''
                     AND len(string_split(trim(regexp_replace(ln, '\s+', ' ', 'g')), ' ')) >= 3
                     AND regexp_matches(trim(regexp_replace(ln, '\s+', ' ', 'g')), '[.!?"]$')
                     AND NOT contains(lower(ln), 'javascript')
                     AND NOT contains(lower(ln), 'lorem ipsum')
                     AND NOT contains(lower(ln), 'cookie')] AS kept
           FROM t)
         SELECT doc_id,
                coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
                CAST(len(kept) AS BIGINT) AS n_kept,
                CAST(len(ls) AS BIGINT) AS n_lines
         FROM k ORDER BY doc_id""",
    "x57_sample_weighted" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
                  floor(pow((((doc_id % 1000000007) * 654435747) % 1000000007 + 1)
                              / 1000000008.0,
                            1.0 / n_chars) * 1000000000.0 + 0.5)
                    / 1000000000.0 AS wk
           FROM documents WHERE n_chars > 0
           ORDER BY wk DESC, doc_id LIMIT 100)
         ORDER BY doc_id""",
    "x58_text_chunks" ->
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN CAST([] AS VARCHAR[])
                       ELSE string_split(
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                  END AS tk
           FROM documents),
         c AS (
           SELECT doc_id,
                  unnest(CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                         ELSE [array_to_string(tk[(i*16+1):(i*16+32)], ' ')
                               for i in range(0, 1 + greatest(0,
                                 CAST(ceil((len(tk) - 32) / 16.0) AS BIGINT)))]
                         END) AS chunk_text,
                  unnest(CASE WHEN len(tk) = 0 THEN CAST([] AS BIGINT[])
                         ELSE range(0, 1 + greatest(0,
                           CAST(ceil((len(tk) - 32) / 16.0) AS BIGINT)))
                         END) AS chunk_idx
           FROM t)
         SELECT doc_id AS id, chunk_idx, chunk_text,
                CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens
         FROM c ORDER BY id, chunk_idx""",
    "x59_oov_rate" ->
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
           FROM documents),
         tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         v AS (SELECT t AS vt FROM (
                 SELECT t, count(*) AS n FROM tok2 GROUP BY t
                 ORDER BY n DESC, t LIMIT 30)),
         p AS (
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
           FROM tok2 LEFT JOIN v ON tok2.t = v.vt GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_tokens, 0) AS n_tokens,
                coalesce(p.n_oov, 0) AS n_oov,
                CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_oov AS DOUBLE) / p.n_tokens
                                * 10000.0 + 0.5) / 10000.0
                END AS oov_rate
         FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    "x73_vocab_artifact" ->
      // shares x59's oracle verbatim BY DESIGN: the rank<=30 slice of a
      // persisted top-50 vocabulary must reproduce the inline top-30
      // vocabulary exactly (ties rank deterministically by token)
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
           FROM documents),
         tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         v AS (SELECT t AS vt FROM (
                 SELECT t, count(*) AS n FROM tok2 GROUP BY t
                 ORDER BY n DESC, t LIMIT 30)),
         p AS (
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
           FROM tok2 LEFT JOIN v ON tok2.t = v.vt GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_tokens, 0) AS n_tokens,
                coalesce(p.n_oov, 0) AS n_oov,
                CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_oov AS DOUBLE) / p.n_tokens
                                * 10000.0 + 0.5) / 10000.0
                END AS oov_rate
         FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    "x78_vocab_update" ->
      // shares x59's oracle verbatim BY DESIGN: a vocabulary brought to
      // the full corpus by the incremental mergeable-summary update
      // must serve the exact same top-30 slice as one built from
      // scratch on it (ample capacity => the merge is exact)
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
           FROM documents),
         tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         v AS (SELECT t AS vt FROM (
                 SELECT t, count(*) AS n FROM tok2 GROUP BY t
                 ORDER BY n DESC, t LIMIT 30)),
         p AS (
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
           FROM tok2 LEFT JOIN v ON tok2.t = v.vt GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_tokens, 0) AS n_tokens,
                coalesce(p.n_oov, 0) AS n_oov,
                CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_oov AS DOUBLE) / p.n_tokens
                                * 10000.0 + 0.5) / 10000.0
                END AS oov_rate
         FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    "x89_vocab_remove" ->
      // x78's oracle restricted to the SURVIVING corpus (doc_id % 4 <> 1):
      // after removing the added slab, the artifact must serve the exact
      // top-30 vocabulary of the never-added corpus
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
           FROM documents WHERE doc_id % 4 <> 1),
         tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         v AS (SELECT t AS vt FROM (
                 SELECT t, count(*) AS n FROM tok2 GROUP BY t
                 ORDER BY n DESC, t LIMIT 30)),
         p AS (
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
           FROM tok2 LEFT JOIN v ON tok2.t = v.vt GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_tokens, 0) AS n_tokens,
                coalesce(p.n_oov, 0) AS n_oov,
                CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_oov AS DOUBLE) / p.n_tokens
                                * 10000.0 + 0.5) / 10000.0
                END AS oov_rate
         FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <> 1) d
         LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    "x91_vocab_compact" ->
      // x89's oracle shape over the post-compaction surviving corpus
      // (doc_id % 4 <= 1): epoch fold + surviving-slab removal must
      // leave exactly this corpus's top-30 vocabulary
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
           FROM documents WHERE doc_id % 4 <= 1),
         tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         v AS (SELECT t AS vt FROM (
                 SELECT t, count(*) AS n FROM tok2 GROUP BY t
                 ORDER BY n DESC, t LIMIT 30)),
         p AS (
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
           FROM tok2 LEFT JOIN v ON tok2.t = v.vt GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(p.n_tokens, 0) AS n_tokens,
                coalesce(p.n_oov, 0) AS n_oov,
                CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_oov AS DOUBLE) / p.n_tokens
                                * 10000.0 + 0.5) / 10000.0
                END AS oov_rate
         FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <= 1) d
         LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY id""",
    // positions 1-based here, 0-based on the Spark side — the covered-set
    // arithmetic shifts identically (the x48 recipe with eval grams)
    "x60_decontam_scrub" ->
      """WITH tok AS (
           SELECT doc_id, source,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         g AS (
           SELECT doc_id, gram, s FROM (
             SELECT doc_id,
                    unnest(CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
                           ELSE [array_to_string(tk[i:i+7], ' ')
                                 for i in range(1, len(tk) - 6)] END) AS gram,
                    unnest(CASE WHEN len(tk) < 8 THEN CAST([] AS BIGINT[])
                           ELSE range(1, len(tk) - 6) END) AS s
             FROM tok WHERE source <> 'src7')),
         ev AS (
           SELECT DISTINCT gram FROM (
             SELECT unnest(CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
                           ELSE [array_to_string(tk[i:i+7], ' ')
                                 for i in range(1, len(tk) - 6)] END) AS gram
             FROM tok WHERE source = 'src7')),
         st AS (
           SELECT doc_id, list(s) AS starts
           FROM g JOIN ev USING (gram) GROUP BY doc_id),
         tr AS (SELECT doc_id, tk FROM tok WHERE source <> 'src7'),
         k AS (
           SELECT tr.doc_id, tk,
                  [tk[p] for p in range(1, len(tk) + 1)
                   if len(list_filter(coalesce(st.starts, CAST([] AS BIGINT[])),
                          s -> s <= p AND p <= s + 7)) = 0] AS kept
           FROM tr LEFT JOIN st USING (doc_id))
         SELECT doc_id,
                coalesce(array_to_string(kept, ' '), '') AS clean_text,
                coalesce(CAST(len(tk) - len(kept) AS BIGINT), 0) AS n_tokens_removed
         FROM k ORDER BY doc_id""",
    "x34_len_quantiles" ->
      """WITH q AS (
           SELECT source,
                  quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99]) AS vals
           FROM documents GROUP BY source)
         SELECT source,
                unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS quantile,
                unnest(list_transform(vals,
                  v -> floor(v * 10000.0 + 0.5) / 10000.0)) AS value
         FROM q ORDER BY source, quantile""",
    "x35_char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
         cnt AS (
           SELECT doc_id, c, count(*)::DOUBLE AS k FROM ch GROUP BY doc_id, c),
         tot AS (
           SELECT doc_id, sum(k) AS n FROM cnt GROUP BY doc_id)
         SELECT doc_id,
                floor((-sum((k / n) * log2(k / n))) * 10000.0 + 0.5)
                  / 10000.0 AS entropy
         FROM cnt JOIN tot USING (doc_id)
         GROUP BY doc_id, n ORDER BY doc_id""",
    "x33_quality_topk" ->
      """WITH t AS (
           SELECT doc_id, source, text,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         f AS (
           SELECT doc_id, source,
                  len(tk)::DOUBLE AS n_tokens,
                  round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                        / len(text), 4) AS alpha_ratio,
                  round(len(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g'))::DOUBLE
                        / len(text), 4) AS punct_ratio,
                  round(len(list_filter(tk, x -> x IN
                        ('the','a','of','and','to','in','is','that','it','for',
                         'el','la','de','y','que','en','un','una','es','por',
                         'le','et','une','est','pour',
                         'der','die','das','und','zu','ist','ein','eine','mit')))::DOUBLE
                        / len(tk), 4) AS stopword_ratio
           FROM t),
         s AS (
           SELECT doc_id, source,
                  floor(least(1.0, greatest(0.0,
                    0.25 * least(n_tokens / 50.0, 1.0) +
                    0.25 * alpha_ratio +
                    0.25 * least(stopword_ratio * 5.0, 1.0) +
                    0.25 * (1.0 - punct_ratio * 5.0))) * 10000.0 + 0.5)
                    / 10000.0 AS quality_score
           FROM f)
         SELECT doc_id, source, quality_score FROM s
         QUALIFY row_number() OVER (PARTITION BY source
                                    ORDER BY round(quality_score, 6) DESC, doc_id) <= 10
         ORDER BY source, doc_id""",
    "x10_text_langid" ->
      // same stopword lists and argmax tie-break cascade as TextOps.langId
      // (candidate order en, es, fr, de; score <= 0 → 'und')
      """WITH t AS (
           SELECT doc_id, lang,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         s AS (
           SELECT doc_id, lang,
             len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS s_en,
             len(list_filter(tk, x -> x IN ('el','la','de','y','que','en','un','una','es','por'))) AS s_es,
             len(list_filter(tk, x -> x IN ('le','la','de','et','que','en','un','une','est','pour'))) AS s_fr,
             len(list_filter(tk, x -> x IN ('der','die','das','und','zu','in','ist','ein','eine','mit'))) AS s_de
           FROM t)
         SELECT doc_id, lang,
                CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                     WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                     WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                     WHEN s_fr >= s_de THEN 'fr'
                     ELSE 'de' END AS lang_pred
         FROM s ORDER BY doc_id""",
    "x21_decontam" ->
      """WITH tok AS (
           SELECT doc_id, source,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         grams AS (
           SELECT doc_id, source,
                  unnest(list_distinct([list_aggregate(tk[i+1:i+8], 'string_agg', ' ')
                                        for i in range(len(tk) - 7)])) AS gram
           FROM tok WHERE len(tk) >= 8),
         ev AS (SELECT DISTINCT gram FROM grams WHERE source = 'src7')
         SELECT g.doc_id AS id, count(*)::BIGINT AS n_shared_grams
         FROM grams g JOIN ev USING (gram)
         WHERE g.source <> 'src7'
         GROUP BY 1 ORDER BY 1""",
    "x96_decontam_index" ->
      // shares x21's oracle verbatim BY DESIGN: serving the eval grams
      // from the persisted artifact (sketch pre-filter + exact rescue
      // join) must be indistinguishable from the inline derivation
      """WITH tok AS (
           SELECT doc_id, source,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         grams AS (
           SELECT doc_id, source,
                  unnest(list_distinct([list_aggregate(tk[i+1:i+8], 'string_agg', ' ')
                                        for i in range(len(tk) - 7)])) AS gram
           FROM tok WHERE len(tk) >= 8),
         ev AS (SELECT DISTINCT gram FROM grams WHERE source = 'src7')
         SELECT g.doc_id AS id, count(*)::BIGINT AS n_shared_grams
         FROM grams g JOIN ev USING (gram)
         WHERE g.source <> 'src7'
         GROUP BY 1 ORDER BY 1""",
    "x97_decontam_index_update" ->
      // shares x21's oracle verbatim BY DESIGN: an artifact brought to
      // the current eval suite by the incremental update (delta-doc
      // gram derivation + ref-count merge) must serve the exact same
      // gram set as one built from scratch on it
      """WITH tok AS (
           SELECT doc_id, source,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         grams AS (
           SELECT doc_id, source,
                  unnest(list_distinct([list_aggregate(tk[i+1:i+8], 'string_agg', ' ')
                                        for i in range(len(tk) - 7)])) AS gram
           FROM tok WHERE len(tk) >= 8),
         ev AS (SELECT DISTINCT gram FROM grams WHERE source = 'src7')
         SELECT g.doc_id AS id, count(*)::BIGINT AS n_shared_grams
         FROM grams g JOIN ev USING (gram)
         WHERE g.source <> 'src7'
         GROUP BY 1 ORDER BY 1""",
    "x22_text_repetition" ->
      """WITH tok AS (
           SELECT doc_id,
                  CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN []::VARCHAR[]
                       ELSE string_split(
                         trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                  END AS tk
           FROM documents),
         base AS (
           SELECT doc_id AS id, len(tk)::BIGINT AS n_tokens,
                  CASE WHEN len(tk) > 0
                       THEN round((len(tk) - len(list_distinct(tk)))::DOUBLE / len(tk), 4)
                       ELSE 0.0 END AS dup_word_frac,
                  tk
           FROM tok),
         bg AS (
           SELECT id, gram, count(*) AS c FROM (
             SELECT id, unnest([list_aggregate(tk[i+1:i+2], 'string_agg', ' ')
                                for i in range(len(tk) - 1)]) AS gram
             FROM base WHERE len(tk) >= 2)
           GROUP BY 1, 2),
         top AS (
           SELECT id, round(max(c)::DOUBLE / sum(c), 4) AS top_bigram_frac
           FROM bg GROUP BY 1)
         SELECT b.id, b.n_tokens, b.dup_word_frac,
                coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
         FROM base b LEFT JOIN top t USING (id) ORDER BY b.id""",
    "x23_mixture_sample" ->
      // thresholds are floor(1000000007 * w), same literals the Spark
      // side computes driver-side; hash identical to x17's
      """SELECT doc_id, source FROM documents
         WHERE ((doc_id % 1000000007) * 654435747) % 1000000007 <
               CASE source WHEN 'src0' THEN 1000000007
                           WHEN 'src1' THEN 500000003
                           WHEN 'src2' THEN 250000001
                           ELSE 100000000 END
         ORDER BY doc_id""",
    "x68_mixture_epochs" ->
      // ⌊w⌋ full copies + a fractional epoch gated on x17's hash with
      // threshold floor(1000000007 · frac(w)): src0 w=2.5 → 2 copies +
      // hash < 500000003; src1 w=0.4 → hash < 400000002; default w=1 →
      // exactly one epoch-0 copy
      """WITH t AS (
           SELECT doc_id, source,
                  (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END
                   + CASE WHEN ((doc_id % 1000000007) * 654435747) % 1000000007 <
                            CASE source WHEN 'src0' THEN 500000003
                                        WHEN 'src1' THEN 400000002
                                        ELSE 0 END
                          THEN 1 ELSE 0 END) AS n
           FROM documents)
         SELECT doc_id, source,
                unnest(generate_series(0, n - 1))::BIGINT AS epoch
         FROM t WHERE n > 0
         ORDER BY doc_id, epoch""",
    "x76_mixture_weights" ->
      // x8's whitespace token count rolled up per source, full-joined
      // against the target mix; weight arithmetic mirrored exactly
      // (round 6 on the SAME pre-rounded double, cap compared unrounded)
      """WITH tok AS (
           SELECT source,
                  CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN 0
                       ELSE len(string_split(
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  END AS nt
           FROM documents),
         sup AS (
           SELECT source, CAST(sum(nt) AS BIGINT) AS available_tokens
           FROM tok GROUP BY source),
         tgt(source, target_share) AS (
           VALUES ('src1', 0.4::DOUBLE), ('src2', 0.1::DOUBLE),
                  ('srczz', 0.05::DOUBLE)),
         j AS (
           SELECT coalesce(s.source, t.source) AS source,
                  coalesce(s.available_tokens, 0) AS available_tokens,
                  coalesce(t.target_share, 0.0::DOUBLE) AS target_share
           FROM sup s FULL JOIN tgt t ON s.source = t.source)
         SELECT source, available_tokens, target_share,
                -- floor-form half-up (the x24 convention): round()'s
                -- half-tie behavior on binary floats is engine-specific
                CASE WHEN available_tokens > 0
                     THEN floor(target_share * 1000000.0 / available_tokens
                                * 1e6 + 0.5) / 1e6
                END AS weight_needed,
                CASE WHEN available_tokens > 0
                     THEN floor(least(target_share * 1000000.0 / available_tokens,
                                      2.0) * 1e6 + 0.5) / 1e6
                     ELSE 0.0 END AS weight,
                CASE WHEN available_tokens = 0 AND target_share > 0
                       THEN 'no_supply'
                     WHEN available_tokens > 0 AND
                          target_share * 1000000.0 / available_tokens > 2.0
                       THEN 'capped'
                     ELSE 'ok' END AS status
         FROM j ORDER BY source""",
    "x11_text_fingerprint" ->
      """SELECT doc_id,
                md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
         FROM documents ORDER BY doc_id""",
    "x71_corpus_diff" ->
      // same md5-of-normalized fingerprint as x11 on both versions, one
      // FULL JOIN; presence markers (not fingerprint nullness) decide
      // added/removed, null-safe compare decides changed/unchanged
      """WITH cur AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0 THEN text || ' revised'
                       ELSE text END AS text
           FROM documents WHERE doc_id % 5 <> 1
           UNION ALL
           SELECT doc_id + 900000, text FROM documents WHERE doc_id < 3),
         o AS (SELECT doc_id,
                      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                      true AS p
               FROM documents),
         c AS (SELECT doc_id,
                      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                      true AS p
               FROM cur)
         SELECT doc_id AS id,
                CASE WHEN o.p IS NULL THEN 'added'
                     WHEN c.p IS NULL THEN 'removed'
                     WHEN o.fp IS NOT DISTINCT FROM c.fp THEN 'unchanged'
                     ELSE 'changed' END AS status
         FROM o FULL JOIN c USING (doc_id)
         ORDER BY id""",
    "x13_events_window" ->
      """SELECT time_bucket(INTERVAL 1 minute, ts::TIMESTAMP) AS window_start,
                event_type, count(*) AS n_events,
                round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "x86_rate_anomaly" ->
      // trailing moments from exact integer sums (Σn, Σn²) so the mean/
      // variance/z doubles are the SAME IEEE expressions on both
      // engines; the flag reads the ROUNDED z; zero-variance jumps
      // flagged by the exact integer test n·k ≠ Σn
      """WITH c AS (
           SELECT time_bucket(INTERVAL 1 hour, ts::TIMESTAMP) AS ws,
                  event_type, count(*)::BIGINT AS n
           FROM events
           WHERE ts IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
         span AS (SELECT min(ws) AS lo, max(ws) AS hi FROM c),
         types AS (SELECT DISTINCT event_type FROM c),
         spine AS (SELECT t.event_type,
                          unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS ws
                   FROM span, types t),
         f AS (SELECT spine.ws, spine.event_type, coalesce(c.n, 0)::BIGINT AS n
               FROM spine LEFT JOIN c
                 ON c.ws = spine.ws AND c.event_type = spine.event_type),
         t AS (SELECT *, count(*) OVER wtr AS hist,
                      sum(n) OVER wtr AS s, sum(n*n) OVER wtr AS ss
               FROM f WINDOW wtr AS (PARTITION BY event_type ORDER BY ws
                 ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)),
         sc AS (SELECT ws, event_type, n, hist, s,
                       -- exact int128 numerator, one double rounding:
                       -- mirrors the engine's decimal(38,0) form
                       (ss::HUGEINT * 5 - s::HUGEINT * s)::DOUBLE / 20.0 AS var
                FROM t),
         z AS (SELECT *,
                      CASE WHEN hist = 5 AND var > 0
                           THEN floor((n::DOUBLE - s::DOUBLE / 5.0) / sqrt(var)
                                      * 1e4 + 0.5) / 1e4 END AS z
               FROM sc)
         SELECT ws AS window_start, event_type, n AS n_events,
                CASE WHEN hist = 5
                     THEN floor(s::DOUBLE / 5.0 * 1e4 + 0.5) / 1e4
                END AS trail_mean,
                z,
                (z IS NOT NULL AND abs(z) >= 3.0)
                  OR (hist = 5 AND var <= 0 AND n * 5 <> s) AS anomaly
         FROM z ORDER BY window_start, event_type""",
    "x12_mm_decode" ->
      """SELECT doc_id AS asset_id, 'image' AS media_type,
                octet_length(encode(text)) AS payload_bytes,
                8 AS n_features
         FROM documents ORDER BY asset_id""",
    "x12b_mm_meta" ->
      """SELECT doc_id AS asset_id, 'png' AS format,
                CAST(doc_id % 1024 + 1 AS INT) AS width,
                CAST(doc_id % 768 + 1 AS INT) AS height,
                CAST(24 AS BIGINT) AS payload_bytes
         FROM documents ORDER BY asset_id""",
    "x12c_mm_chunks" ->
      // chunkSize=64, stride=4 ⇒ chunk starts every 256 bytes; index
      // count = max(1, floor(bytes/256)) (the operator emits one index
      // even for sub-stride payloads); last chunk may be partial
      """WITH a AS (SELECT doc_id AS asset_id, encode(text) AS payload
                    FROM documents),
         i AS (SELECT asset_id, payload,
                      unnest(range(0, greatest(1, octet_length(payload) // 256)))
                        AS ci
               FROM a)
         SELECT asset_id, CAST(ci AS INT) AS chunk_index,
                -- slice length arithmetically (DuckDB has no blob
                -- substring): clamp [ci*256, ci*256+64) to the payload
                CAST(greatest(0, least(64, octet_length(payload) - ci * 256))
                     AS INT) AS chunk_bytes
         FROM i ORDER BY asset_id, chunk_index""",
    "x30_chunk_dedup" ->
      """WITH tok AS (
           SELECT doc_id,
                  CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN []::VARCHAR[]
                       ELSE string_split(
                         trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                  END AS tk
           FROM documents),
         ch AS (
           SELECT doc_id,
                  [list_aggregate(tk[i*16+1 : (i+1)*16], 'string_agg', ' ')
                   for i in range(CAST(ceil(len(tk) / 16.0) AS INT))] AS chunks
           FROM tok),
         ex AS (
           SELECT doc_id, generate_subscripts(chunks, 1) - 1 AS idx,
                  unnest(chunks) AS chunk
           FROM ch),
         kept AS (
           SELECT doc_id, idx, chunk,
                  row_number() OVER (PARTITION BY chunk
                                     ORDER BY doc_id, idx) AS rn
           FROM ex),
         reb AS (
           SELECT doc_id, count(*)::BIGINT AS n_kept,
                  string_agg(chunk, ' ' ORDER BY idx) AS clean_text
           FROM kept WHERE rn = 1 GROUP BY doc_id)
         SELECT c.doc_id AS id, coalesce(r.clean_text, '') AS clean_text,
                coalesce(r.n_kept, 0)::BIGINT AS n_kept,
                len(c.chunks)::BIGINT AS n_chunks
         FROM ch c LEFT JOIN reb r USING (doc_id) ORDER BY c.doc_id""",
    "x29_profile" ->
      """SELECT * FROM (
           SELECT 'doc_id' AS "column", count(*)::BIGINT AS n_rows,
                  (count(*) - count(doc_id))::BIGINT AS n_null,
                  count(DISTINCT doc_id)::BIGINT AS n_distinct,
                  min(doc_id)::VARCHAR AS min_value, max(doc_id)::VARCHAR AS max_value
           FROM documents
           UNION ALL
           SELECT 'text', count(*)::BIGINT, (count(*) - count(text))::BIGINT,
                  count(DISTINCT text)::BIGINT, min(text), max(text) FROM documents
           UNION ALL
           SELECT 'lang', count(*)::BIGINT, (count(*) - count(lang))::BIGINT,
                  count(DISTINCT lang)::BIGINT, min(lang), max(lang) FROM documents
           UNION ALL
           SELECT 'source', count(*)::BIGINT, (count(*) - count(source))::BIGINT,
                  count(DISTINCT source)::BIGINT, min(source), max(source) FROM documents
           UNION ALL
           SELECT 'n_chars', count(*)::BIGINT, (count(*) - count(n_chars))::BIGINT,
                  count(DISTINCT n_chars)::BIGINT,
                  min(n_chars)::VARCHAR, max(n_chars)::VARCHAR FROM documents)
         ORDER BY "column"""",
    "x28_bloom_exclude" ->
      // the sketch+rescue construction is EXACT, so the oracle is the
      // plain anti-join it replaces at scale
      """SELECT doc_id, source FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src7')
         ORDER BY doc_id""",
    "x74_bloom_update" ->
      // shares x28's oracle BY DESIGN: exclusion through an
      // incrementally-updated sketch must equal the inline build over
      // the current ledger — stale removed-id bits are rescued by the
      // exact anti-join, arriving ids are covered by the merge
      """SELECT doc_id, source FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src7')
         ORDER BY doc_id""",
    "x24_emb_quantize" ->
      // floor(x/s + 0.5) is the round-half-up both engines agree on;
      // round()'s half-tie behavior on binary floats is engine-specific
      """WITH e AS (
           SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                  list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS s
           FROM embeddings)
         SELECT id, round(s, 9) AS scale,
                array_to_string(CASE WHEN s = 0 THEN list_transform(v, x -> 0)
                     ELSE list_transform(v, x ->
                       greatest(-127, least(127, floor(x / s + 0.5)))::INT)
                END, ',') AS q_csv
         FROM e ORDER BY id""",
    "x25_emb_outliers" ->
      // centroid = per-position avg (unrounded on both sides); ranking
      // uses the ROUNDED distance + id tie-break so last-ulp differences
      // can't decide top-k membership
      """WITH e AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         pos AS (
           SELECT label, generate_subscripts(v, 1) AS p, unnest(v) AS x FROM e),
         agg AS (SELECT label, p, avg(x) AS m FROM pos GROUP BY 1, 2),
         cent AS (
           SELECT label, list(m ORDER BY p) AS centroid FROM agg GROUP BY 1),
         scored AS (
           SELECT e.vec_id AS id, e.label,
                  round(1.0 - CASE
                      WHEN sqrt(list_inner_product(e.v, e.v)) *
                           sqrt(list_inner_product(c.centroid, c.centroid)) = 0
                      THEN 0.0
                      ELSE list_inner_product(e.v, c.centroid) /
                           (sqrt(list_inner_product(e.v, e.v)) *
                            sqrt(list_inner_product(c.centroid, c.centroid)))
                  END, 6) AS dist
           FROM e JOIN cent c USING (label)),
         ranked AS (
           SELECT id, label, dist,
                  row_number() OVER (PARTITION BY label
                                     ORDER BY dist DESC, id) AS rn
           FROM scored)
         SELECT id, label, dist FROM ranked WHERE rn <= 5
         ORDER BY label, id""",
    "x26_events_props" ->
      """SELECT event_type, count(*) AS n_events,
                count(try_cast(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
                sum(try_cast(json_extract_string(props, '$.k') AS INTEGER))::BIGINT AS sum_k,
                round(avg(try_cast(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
                -- exact decimal(38,6) accumulation (micro-units, not
                -- integer cents — sub-cent values survive): plain double
                -- sum drifts at 128M rows
                round(CAST(sum(CAST(value AS DECIMAL(38,6)))
                      AS DOUBLE), 4) AS total_value
         FROM events GROUP BY 1 ORDER BY event_type""",
    "x27_token_budget" ->
      // same multiplicative hash as x17/x23; window sum of exact longs
      """WITH d AS (
           SELECT doc_id, source,
                  CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN 0
                       ELSE len(string_split(
                              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  END AS n_tokens,
                  ((doc_id % 1000000007) * 654435747) % 1000000007 AS h
           FROM documents),
         c AS (
           SELECT doc_id, source,
                  sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM d)
         SELECT doc_id, source, cum::BIGINT AS cum_tokens
         FROM c WHERE cum <= 2000 ORDER BY doc_id""",
    "x20_seq_packing" ->
      // the two-level prefix sum collapses to a plain running sum in SQL
      """WITH tok AS (
           SELECT doc_id,
                  CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                       THEN 0
                       ELSE len(string_split(
                         trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  END::BIGINT AS n_tokens
           FROM documents)
         SELECT doc_id, n_tokens,
                -- ::BIGINT: DuckDB sum(BIGINT) yields HUGEINT, which pandas
                -- widens to float64 and the driver then hashes as "123.0"
                -- vs Spark's int64 "123" (CORRECTNESS_r02 x20 hash miss)
                coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tokens_before,
                (coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096)::BIGINT AS bin
         FROM tok ORDER BY doc_id""",
    "x19_text_vocab" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
           FROM documents)
         WHERE token <> ''
         GROUP BY token ORDER BY n DESC, token LIMIT 100""",
    "x70_vocab_by_source" ->
      """WITH t AS (
           SELECT source, unnest(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
           FROM documents),
         g AS (SELECT source, token, count(*) AS n
               FROM t WHERE token <> '' GROUP BY 1, 2)
         SELECT source, token, n, rank FROM (
           SELECT source, token, n,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n DESC, token) AS rank
           FROM g)
         WHERE rank <= 5
         ORDER BY source, rank""",
    "x80_vocab_growth" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
           FROM documents),
         f AS (SELECT token, min(doc_id) AS fid
               FROM tok WHERE token <> '' GROUP BY token),
         b AS (SELECT (floor(fid / 100) * 100)::BIGINT AS bucket_start,
                      CAST(count(*) AS BIGINT) AS new_tokens
               FROM f GROUP BY 1)
         SELECT bucket_start, new_tokens,
                CAST(sum(new_tokens) OVER (
                  ORDER BY bucket_start NULLS FIRST) AS BIGINT) AS vocab_size
         FROM b ORDER BY bucket_start NULLS FIRST""",
    "x81_token_spectrum" ->
      """WITH c AS (
           SELECT token, count(*) AS n FROM (
             SELECT unnest(string_split(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
             FROM documents)
           WHERE token <> '' GROUP BY token),
         s AS (SELECT n AS freq, CAST(count(*) AS BIGINT) AS n_tokens
               FROM c GROUP BY n)
         SELECT freq, n_tokens,
                CAST(sum(n_tokens) OVER (ORDER BY freq DESC) AS BIGINT) AS rank_ge
         FROM s ORDER BY freq""",
    "x67_vocab_sketch" ->
      // x19's oracle with the certified upper bound pinned EQUAL to the
      // exact count: at anchor capacity no partition withholds anything,
      // so every threshold — and every bound gap — is zero
      """SELECT token, count(*) AS n, count(*) AS n_max FROM (
           SELECT unnest(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
           FROM documents)
         WHERE token <> ''
         GROUP BY token ORDER BY n DESC, token LIMIT 100""",
    "x18_dedup_clusters" ->
      // same pair CTEs as x4, then min-reachable-id per vertex via a
      // recursive reachability closure (DuckDB's CC idiom)
      """WITH RECURSIVE t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, lab) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
         SELECT id, min(lab) AS cluster FROM reach GROUP BY id ORDER BY id""",
    // hash arithmetic mirrors Sampling.orderHash exactly: pre-reduced
    // multiplier (no int64 overflow on any id) and a driver-computed
    // integer threshold (engines disagree on double→int cast rounding)
    "x16_sample_stratified" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars, row_number() OVER (
               PARTITION BY lang
               ORDER BY ((doc_id % 1000000007) * 654435747) % 1000000007, doc_id) AS rk
           FROM documents)
         WHERE rk <= 20 ORDER BY lang, doc_id""",
    "x17_sample_fraction" ->
      """SELECT doc_id, lang FROM documents
         WHERE ((doc_id % 1000000007) * 654435747) % 1000000007 < 100000000
         ORDER BY doc_id""",
    "x69_retention" ->
      // same second-truncation boundary as every events oracle; daily
      // periods via integer floor-division of the exact epoch seconds
      """WITH a AS (
           SELECT DISTINCT user_id,
                  epoch(date_trunc('second', ts::TIMESTAMP))::BIGINT // 86400 AS period
           FROM events),
         c AS (SELECT user_id, min(period) AS cohort FROM a GROUP BY 1)
         SELECT cohort, period - cohort AS "offset", count(*) AS n_users
         FROM a JOIN c USING (user_id)
         WHERE period - cohort <= 7
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // maxOffset 70 exceeds the mask word: exercises the pair-shape
    // fallback under the same oracle arithmetic
    "x69b_retention_wide" ->
      """WITH a AS (
           SELECT DISTINCT user_id,
                  epoch(date_trunc('second', ts::TIMESTAMP))::BIGINT // 86400 AS period
           FROM events),
         c AS (SELECT user_id, min(period) AS cohort FROM a GROUP BY 1)
         SELECT cohort, period - cohort AS "offset", count(*) AS n_users
         FROM a JOIN c USING (user_id)
         WHERE period - cohort <= 70
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "x15_events_sessions" ->
      // truncate ts to whole seconds the same way the Spark side does
      // (eventsFrame's read-boundary normalization) before the gap logic;
      // ts::TIMESTAMP also absorbs either fixture layout (ns or us)
      """WITH e AS (
           SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS ts, value
           FROM events),
         m AS (
           SELECT *, CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts)) <= 21600
                     THEN 0 ELSE 1 END AS brk
           FROM e),
         s AS (
           SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "x15b_sessions_native" ->
      // x15's oracle VERBATIM: the native session_window strategy must
      // reproduce the segmented carry's sessions exactly
      """WITH e AS (
           SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS ts, value
           FROM events),
         m AS (
           SELECT *, CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts)) <= 21600
                     THEN 0 ELSE 1 END AS brk
           FROM e),
         s AS (
           SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    // smooth-idf TF-IDF (sklearn formulation); floor(x·1e4+½)/1e4
    // emulates Spark HALF_UP round (x34/x38 precedent)
    "x44_tfidf_keywords" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         post AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(tk) AS term FROM d)
           WHERE term <> '' GROUP BY doc_id, term),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
         dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc FROM post GROUP BY term)
         SELECT doc_id, term, score, rank FROM (
           SELECT post.doc_id, post.term,
                  floor(CAST(tf AS DOUBLE) * (ln((1.0 + n) / (1.0 + dfc)) + 1.0)
                        * 10000.0 + 0.5) / 10000.0 AS score,
                  row_number() OVER (PARTITION BY post.doc_id
                    ORDER BY floor(CAST(tf AS DOUBLE) * (ln((1.0 + n) / (1.0 + dfc)) + 1.0)
                        * 10000.0 + 0.5) / 10000.0 DESC, post.term) AS rank
           FROM post JOIN dft USING (term) CROSS JOIN s)
         WHERE rank <= 5
         ORDER BY doc_id, rank""",
    // every ratio is ONE IEEE division of exact integers compared raw, so
    // the flags agree bit-for-bit with the Spark side with no rounding
    "x45_quality_rules" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk,
                  len(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS nl
           FROM documents),
         f AS (
           -- `text IS NULL` arms mirror the Spark side's null-safe
           -- tokenCount/ratio guards (null text = 0 tokens, 0.0 ratios)
           SELECT doc_id,
                  CASE WHEN text IS NULL OR tk = [''] THEN 0 ELSE len(tk) END AS n,
                  CASE WHEN text IS NULL OR tk = [''] THEN 0.0
                       ELSE (CAST(nl AS DOUBLE) - (CAST(len(tk) AS DOUBLE) - 1))
                            / CAST(len(tk) AS DOUBLE) END AS mwl,
                  CASE WHEN text IS NULL OR tk = [''] THEN 0.0
                       ELSE (CAST(len(tk) AS DOUBLE) - len(list_distinct(tk)))
                            / CAST(len(tk) AS DOUBLE) END AS dupf,
                  CASE WHEN text IS NULL OR tk = [''] THEN 0.0
                       ELSE CAST(len(list_filter(tk, x -> x IN
                      ('the','a','of','and','to','in','is','that','it','for',
                       'el','la','de','y','que','en','un','una','es','por',
                       'le','et','une','est','pour',
                       'der','die','das','und','zu','ist','ein','eine','mit'))) AS DOUBLE)
                            / CAST(len(tk) AS DOUBLE) END AS stopr,
                  CASE WHEN text IS NULL OR len(text) = 0 THEN 0.0
                       ELSE CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                            / len(text) END AS alphar
           FROM t),
         r AS (
           SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                  -- array_to_string of an EMPTY list is NULL in DuckDB
                  -- (Spark array_join gives ''): coalesce
                  coalesce(array_to_string(list_filter([
                    CASE WHEN alphar < 0.7 THEN 'alpha_ratio' END,
                    CASE WHEN dupf > 0.6 THEN 'dup_word_frac' END,
                    CASE WHEN mwl < 3.0 OR mwl > 4.8 THEN 'mean_token_len' END,
                    CASE WHEN stopr < 0.02 THEN 'stopword_ratio' END,
                    CASE WHEN n < 20 OR n > 80 THEN 'word_count' END],
                    x -> x IS NOT NULL), ','), '') AS reasons
           FROM f)
         SELECT doc_id, n_tokens, reasons = '' AS pass, reasons
         FROM r ORDER BY doc_id""",
    // per-token ln folds in POSITION order (list ... ORDER BY pos +
    // list_aggregate = the same left fold as the Spark side's
    // collect/sort/aggregate), mean negated to stay positive
    "x46_unigram_nll" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         tok AS (
           SELECT doc_id, term, pos FROM (
             SELECT doc_id, unnest(tk) AS term,
                    unnest(range(1, len(tk) + 1)) AS pos
             FROM d)
           WHERE term <> ''),
         v AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM tok),
         per AS (
           SELECT doc_id,
                  list(ln(CAST(c AS DOUBLE) / tot) ORDER BY pos) AS lps
           FROM tok JOIN v USING (term) CROSS JOIN s
           GROUP BY doc_id)
         SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_tokens,
                floor(-(list_aggregate(lps, 'sum') / len(lps)) * 10000.0 + 0.5)
                  / 10000.0 AS nll
         FROM per ORDER BY doc_id""",
    // exact point-in-interval semantics; the granule bucketing is a plan
    // detail the oracle need not replay
    "x47_range_join" ->
      """WITH w(window_name, w_start, w_end) AS (
           VALUES ('w1', TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-07 00:00:00'),
                  ('w2', TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-11 00:00:00'),
                  ('w3', TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-22 00:00:00'),
                  ('w4', TIMESTAMP '2024-01-25 00:00:00', TIMESTAMP '2024-01-26 00:00:00'),
                  ('w5', TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-16 00:00:00'))
         SELECT event_id, window_name
         FROM events e JOIN w ON e.ts >= w.w_start AND e.ts <= w.w_end
         ORDER BY event_id, window_name""",
    // duplicated = >= 2 OCCURRENCES corpus-wide (within-doc repeats
    // count); positions are 1-based here, 0-based on the Spark side —
    // the covered-set arithmetic shifts identically
    "x48_span_scrub" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         g AS (
           SELECT doc_id, gram, s FROM (
             SELECT doc_id,
                    unnest(CASE WHEN len(tk) < 6 THEN CAST([] AS VARCHAR[])
                           ELSE [array_to_string(tk[i:i+5], ' ')
                                 for i in range(1, len(tk) - 4)] END) AS gram,
                    unnest(CASE WHEN len(tk) < 6 THEN CAST([] AS BIGINT[])
                           ELSE range(1, len(tk) - 4) END) AS s
             FROM d)),
         c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram),
         st AS (
           SELECT doc_id, list(s) AS starts
           FROM g JOIN c USING (gram) WHERE cnt >= 2 GROUP BY doc_id),
         k AS (
           SELECT d.doc_id, tk,
                  [tk[p] for p in range(1, len(tk) + 1)
                   if len(list_filter(coalesce(st.starts, CAST([] AS BIGINT[])),
                          s -> s <= p AND p <= s + 5)) = 0] AS kept
           FROM d LEFT JOIN st USING (doc_id))
         SELECT doc_id,
                -- empty-list array_to_string is NULL in DuckDB; a fully
                -- scrubbed doc must read '' like Spark's array_join
                coalesce(array_to_string(kept, ' '), '') AS clean_text,
                -- null text: tk is NULL end-to-end; Spark emits ('', 0)
                coalesce(CAST(len(tk) - len(kept) AS BIGINT), 0) AS n_tokens_removed
         FROM k ORDER BY doc_id""",
    "x49_gram_novelty" ->
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         g AS (
           SELECT doc_id,
                  unnest(CASE WHEN len(tk) < 5 THEN CAST([] AS VARCHAR[])
                         ELSE list_distinct([array_to_string(tk[i:i+4], ' ')
                                             for i in range(1, len(tk) - 3)])
                         END) AS gram
           FROM t),
         f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
         p AS (SELECT doc_id, count(*) AS n_grams,
                      CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_novel
               FROM g JOIN f USING (gram) GROUP BY doc_id)
         SELECT t.doc_id AS id,
                coalesce(p.n_grams, 0) AS n_grams,
                coalesce(p.n_novel, 0) AS n_novel,
                CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                     ELSE floor(CAST(p.n_novel AS DOUBLE) / p.n_grams
                                * 10000.0 + 0.5) / 10000.0 END AS novelty
         FROM t LEFT JOIN p USING (doc_id) ORDER BY id""",
    // KL(source || corpus): identical per-token float ops, summed via
    // the token-ordered list fold (the x41/x46 pattern)
    "x50_token_divergence" ->
      """WITH t AS (
           SELECT source,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         tok AS (
           SELECT source, term FROM (SELECT source, unnest(tk) AS term FROM t)
           WHERE term <> ''),
         c AS (SELECT source, term, count(*) AS c FROM tok GROUP BY source, term),
         m AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY term),
         gs AS (SELECT source, CAST(sum(c) AS BIGINT) AS ng FROM c GROUP BY source),
         s AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM c)
         SELECT source, CAST(ng AS BIGINT) AS n_tokens,
                floor(list_aggregate(list(
                    (CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
                      * ln((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
                           / (CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE)))
                    ORDER BY term), 'sum') * 10000.0 + 0.5) / 10000.0 AS kl
         FROM c JOIN m USING (term) JOIN gs USING (source) CROSS JOIN s
         GROUP BY source, ng, tot
         ORDER BY source""",
    // PMI over document-level presence; the oracle may self-join freely
    // (the granule/map-side pair generation is a plan concern only)
    "x51_pmi_pairs" ->
      """WITH d AS (
           SELECT doc_id,
                  list_filter(list_sort(list_distinct(
                    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))),
                    x -> x <> '') AS ts
           FROM documents),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM d),
         tokd AS (SELECT doc_id, unnest(ts) AS term FROM d),
         tc AS (SELECT term, count(*) AS nt FROM tokd GROUP BY term),
         pr AS (
           SELECT x.term AS term_a, y.term AS term_b, count(*) AS n_pair
           FROM tokd x JOIN tokd y
             ON x.doc_id = y.doc_id AND x.term < y.term
           GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT term_a, term_b, n_pair,
                floor(ln(CAST(n_pair AS DOUBLE) * nd
                         / (CAST(ta.nt AS DOUBLE) * CAST(tb.nt AS DOUBLE)))
                      * 10000.0 + 0.5) / 10000.0 AS pmi
         FROM pr JOIN tc ta ON pr.term_a = ta.term
                 JOIN tc tb ON pr.term_b = tb.term
                 CROSS JOIN n
         ORDER BY pmi DESC, term_a, term_b LIMIT 25""",
    // bounds floor-rounded to 4 decimals on BOTH sides before comparing
    // (quantile interpolation can differ by an ulp across engines);
    // null-safe join mirrors the operator's null-group semantics
    "x52_len_band" ->
      """WITH b AS (
           SELECT source,
                  floor(quantile_cont(n_chars, 0.1) * 10000.0 + 0.5) / 10000.0 AS lo,
                  floor(quantile_cont(n_chars, 0.9) * 10000.0 + 0.5) / 10000.0 AS hi
           FROM documents GROUP BY source)
         SELECT doc_id, d.source, n_chars
         FROM documents d JOIN b ON d.source IS NOT DISTINCT FROM b.source
         WHERE n_chars >= lo AND n_chars <= hi
         ORDER BY doc_id""",
    // bigram MLE p(cur|prev) = c2/c1; per-token ln folds in bigram
    // POSITION order (the x46 pattern), mean negated to stay positive
    "x53_bigram_nll" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         bg AS (
           SELECT doc_id, prev, cur, pos FROM (
             SELECT doc_id,
                    unnest(tk[1:len(tk)-1]) AS prev,
                    unnest(tk[2:len(tk)])   AS cur,
                    unnest(range(1, len(tk))) AS pos
             FROM d)
           WHERE prev <> '' AND cur <> ''),
         c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
         c1 AS (
           SELECT term AS prev, count(*) AS c1 FROM (
             SELECT unnest(tk) AS term FROM d)
           WHERE term <> '' GROUP BY term),
         per AS (
           SELECT doc_id,
                  list(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) ORDER BY pos) AS lps
           FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
           GROUP BY doc_id)
         SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_bigrams,
                floor(-(list_aggregate(lps, 'sum') / len(lps)) * 10000.0 + 0.5)
                  / 10000.0 AS nll
         FROM per ORDER BY doc_id""",

    "x61b_semantic_dedup_exact" ->
      // x5b's spike recipe + x42b's fixed-centroid argmax assignment,
      // then the SemDeDup greedy drop as NOT EXISTS: a survivor has no
      // same-cluster smaller-id neighbor at cos >= 0.95
      """WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS embedding
           FROM embeddings WHERE vec_id < 150),
         pert AS (
           SELECT vec_id + 1000 AS vec_id,
                  [embedding[i] * (1.0 + ((i - 1) % 7) / 1000.0)
                   for i in range(1, len(embedding) + 1)]::DOUBLE[] AS embedding
           FROM base),
         u AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id < 4),
         asn AS (
           SELECT vec_id, embedding, cluster FROM (
             SELECT u.vec_id, u.embedding, c.cid AS cluster,
                    row_number() OVER (PARTITION BY u.vec_id
                        ORDER BY list_cosine_similarity(u.embedding, c.cv)
                                 DESC, c.cid) AS rn
             FROM u, c) WHERE rn = 1)
         SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster FROM asn a
         WHERE NOT EXISTS (
           SELECT 1 FROM asn b
           WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
             AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95)
         ORDER BY vec_id""",

    "x62_dedup_keep_best" ->
      // x18's component closure over x4's exact pair CTEs, then keep the
      // longest member per component (ties -> min id); docs outside any
      // pair survive untouched
      """WITH RECURSIVE t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents WHERE doc_id < 300),
         s AS (
           SELECT doc_id,
                  CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                       ELSE list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                           for i in range(1, len(tk) - 1)])
                  END AS sh
           FROM t),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                 len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, lab) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
         comp AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
         scored AS (
           SELECT c.id, c.cluster, length(d.text) AS sc
           FROM comp c JOIN documents d ON d.doc_id = c.id),
         best AS (SELECT cluster, max(sc) AS m FROM scored GROUP BY cluster),
         keep AS (
           -- null-safe match mirrors the operator's <=> rule: an
           -- all-null-score component (m NULL) keeps its min id instead
           -- of dooming every member
           SELECT cluster, min(id) AS id FROM scored JOIN best USING (cluster)
           WHERE sc IS NOT DISTINCT FROM m GROUP BY cluster),
         doomed AS (SELECT id FROM comp
                    WHERE id NOT IN (SELECT id FROM keep))
         SELECT doc_id FROM documents
         WHERE doc_id < 300 AND doc_id NOT IN (SELECT id FROM doomed)
         ORDER BY doc_id""",

    "x63_interval_join" ->
      // whole-second truncation matches eventsFrame's read boundary
      // (x15's convention); inclusive closed interval on both ends
      """WITH ev AS (
           SELECT event_id, user_id, date_trunc('second', ts::TIMESTAMP) AS ts,
                  event_type, value
           FROM events),
         e AS (SELECT event_id AS err_id, user_id, ts FROM ev
               WHERE event_type = 'error'),
         c AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'click')
         SELECT e.err_id, count(*) AS n_clicks,
                round(sum(c.value), 4) AS click_value
         FROM e JOIN c ON c.user_id = e.user_id
           AND c.ts >= e.ts - INTERVAL 21600 SECOND AND c.ts <= e.ts
         GROUP BY e.err_id ORDER BY err_id""",

    "x64_funnel" ->
      // greedy-earliest chained min CTEs mirror the operator's step
      // joins; whole-second truncation matches eventsFrame
      """WITH ev AS (
           SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS ts, event_type
           FROM events),
         s1 AS (SELECT user_id, min(ts) AS ts_1 FROM ev
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT s1.user_id, s1.ts_1, min(e.ts) AS ts_2
                FROM s1 LEFT JOIN ev e ON e.user_id = s1.user_id
                  AND e.event_type = 'click' AND e.ts > s1.ts_1
                GROUP BY s1.user_id, s1.ts_1),
         s3 AS (SELECT s2.user_id, s2.ts_1, s2.ts_2, min(e.ts) AS ts_3
                FROM s2 LEFT JOIN ev e ON e.user_id = s2.user_id
                  AND e.event_type = 'purchase' AND e.ts > s2.ts_2
                GROUP BY s2.user_id, s2.ts_1, s2.ts_2)
         SELECT user_id, ts_1, ts_2, ts_3,
                CAST((ts_1 IS NOT NULL)::INT + (ts_2 IS NOT NULL)::INT
                     + (ts_3 IS NOT NULL)::INT AS INT) AS steps_completed
         FROM s3 ORDER BY user_id""",

    "x65_repetition" ->
      // x55's derived multi-line corpus, then the Gopher repetition
      // signals replayed relationally: line stats by group-by, best
      // 2-gram via ORDER BY cnt DESC, length DESC, gram ASC (the
      // operator's struct-ordering tie-break), duplicated-5-gram chars
      // as sum(cnt·len) over cnt ≥ 2; floor(x·10⁶+½)/10⁶ both sides
      """WITH src AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 3 = 0
                        THEN 'subscribe to our newsletter' || chr(10)
                        ELSE '' END)
                  || regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g')
                  || chr(10) || 'all rights reserved' AS text
           FROM documents),
         d AS (
           SELECT doc_id, text,
                  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
           FROM src),
         lines AS (
           SELECT doc_id, trim(ln) AS line
           FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS ln
                 FROM d)
           WHERE trim(ln) <> ''),
         ls AS (
           SELECT doc_id, count(*) AS n_lines, count(DISTINCT line) AS n_dl,
                  sum(length(line)) AS lc
           FROM lines GROUP BY doc_id),
         dls AS (
           SELECT doc_id, sum(length(line)) AS dlc
           FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY doc_id),
         t AS (SELECT doc_id, norm, string_split(norm, ' ') AS tk FROM d),
         tn AS (SELECT doc_id,
                       CASE WHEN norm = '' OR len(tk) < 2 THEN 0 ELSE len(tk) - 1 END AS n2,
                       CASE WHEN norm = '' OR len(tk) < 5 THEN 0 ELSE len(tk) - 4 END AS n5
                FROM t),
         g2 AS (
           SELECT doc_id, unnest(CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
                                 ELSE [array_to_string(tk[i:i+1], ' ')
                                       for i in range(1, len(tk))] END) AS gram
           FROM t),
         c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
         b2 AS (SELECT doc_id, cnt, gram FROM c2
                QUALIFY row_number() OVER (PARTITION BY doc_id
                  ORDER BY cnt DESC, length(gram) DESC, gram ASC) = 1),
         g5 AS (
           SELECT doc_id, unnest(CASE WHEN len(tk) < 5 THEN CAST([] AS VARCHAR[])
                                 ELSE [array_to_string(tk[i:i+4], ' ')
                                       for i in range(1, len(tk) - 3)] END) AS gram
           FROM t),
         c5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY doc_id, gram),
         d5 AS (SELECT doc_id, sum(cnt * length(gram)) AS dupchars
                FROM c5 WHERE cnt >= 2 GROUP BY doc_id)
         SELECT d.doc_id AS id,
                coalesce(ls.n_lines, 0) AS n_lines,
                CASE WHEN coalesce(ls.n_lines, 0) = 0 THEN 0.0
                     ELSE floor(CAST(ls.n_lines - ls.n_dl AS DOUBLE) / ls.n_lines
                                * 1000000.0 + 0.5) / 1000000.0
                END AS dup_line_frac,
                CASE WHEN coalesce(ls.lc, 0) = 0 THEN 0.0
                     ELSE floor(CAST(ls.lc - dls.dlc AS DOUBLE) / ls.lc
                                * 1000000.0 + 0.5) / 1000000.0
                END AS dup_line_char_frac,
                CASE WHEN tn.n2 = 0 THEN 0.0
                     ELSE floor(CAST(b2.cnt * length(b2.gram) AS DOUBLE)
                                / length(d.norm) * 1000000.0 + 0.5) / 1000000.0
                END AS top_2gram_char_frac,
                CASE WHEN tn.n5 = 0 THEN 0.0
                     ELSE floor(least(1.0, CAST(coalesce(d5.dupchars, 0) AS DOUBLE)
                                / length(d.norm)) * 1000000.0 + 0.5) / 1000000.0
                END AS dup_5gram_char_frac
         FROM d
         LEFT JOIN ls USING (doc_id) LEFT JOIN dls USING (doc_id)
         JOIN tn USING (doc_id)
         LEFT JOIN b2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
         ORDER BY id""",

    "x64b_funnel_hot" ->
      // x64's chained-min oracle with the hot-user collapse applied in
      // the ev CTE — same greedy-earliest step chain over the skewed keys
      """WITH ev AS (
           SELECT CASE WHEN user_id % 5 <> 0 THEN 0 ELSE user_id END AS user_id,
                  date_trunc('second', ts::TIMESTAMP) AS ts, event_type
           FROM events),
         s1 AS (SELECT user_id, min(ts) AS ts_1 FROM ev
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT s1.user_id, s1.ts_1, min(e.ts) AS ts_2
                FROM s1 LEFT JOIN ev e ON e.user_id = s1.user_id
                  AND e.event_type = 'click' AND e.ts > s1.ts_1
                GROUP BY s1.user_id, s1.ts_1),
         s3 AS (SELECT s2.user_id, s2.ts_1, s2.ts_2, min(e.ts) AS ts_3
                FROM s2 LEFT JOIN ev e ON e.user_id = s2.user_id
                  AND e.event_type = 'purchase' AND e.ts > s2.ts_2
                GROUP BY s2.user_id, s2.ts_1, s2.ts_2)
         SELECT user_id, ts_1, ts_2, ts_3,
                CAST((ts_1 IS NOT NULL)::INT + (ts_2 IS NOT NULL)::INT
                     + (ts_3 IS NOT NULL)::INT AS INT) AS steps_completed
         FROM s3 ORDER BY user_id""",

    "x63b_interval_join_left" ->
      // left-outer: every error row, zero count / null sum when matchless
      """WITH ev AS (
           SELECT event_id, user_id, date_trunc('second', ts::TIMESTAMP) AS ts,
                  event_type, value
           FROM events),
         e AS (SELECT event_id AS err_id, user_id, ts FROM ev
               WHERE event_type = 'error'),
         c AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'click')
         SELECT e.err_id, count(c.ts) AS n_clicks,
                round(sum(c.value), 4) AS click_value
         FROM e LEFT JOIN c ON c.user_id = e.user_id
           AND c.ts >= e.ts - INTERVAL 21600 SECOND AND c.ts <= e.ts
         GROUP BY e.err_id ORDER BY err_id""")
}
