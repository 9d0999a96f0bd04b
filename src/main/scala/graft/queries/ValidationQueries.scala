package graft.queries

import graft.core._
import graft.validation.{Rules, Validator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.4 (V1–V21) + §2.5 (P1–P5) exposed as oracle-checked queries
  * over the driver's testdata tables. Each query routes through the
  * engine's [[graft.validation.Validator]]/[[graft.validation.Rules]]
  * library, so the DuckDB compare exercises the real rule engine — the
  * fused single-pass aggregation — not ad-hoc SQL.
  *
  * Scale note: every query here is ONE scan + ONE partial/final aggregate
  * regardless of rule count (constraint/rule/profile expressions are all
  * columns of the same `agg`). At 100 TB, validation cost stays one pass.
  */
object ValidationQueries extends QueryPack {

  /** V9–V13 constraint counts on `orders`: nullability for required
    * columns, unique + PK duplicate counts, type conformance (V10) for
    * the declared types — fused in one aggregation
    * (reference `validators.py:154-216`). */
  def vConstraintsOrders(s: SparkSession, dir: String): DataFrame = {
    val schema = TableSchema(
      table = "orders",
      columns = Seq(
        "o_orderkey" -> GDataType.GInteger,
        "o_custkey" -> GDataType.GInteger,
        "o_orderstatus" -> GDataType.GString,
        "o_totalprice" -> GDataType.GFloat,
        "o_orderdate" -> GDataType.GDateTime,
        "o_orderpriority" -> GDataType.GString),
      requiredColumns = Seq("o_orderkey", "o_custkey", "o_totalprice"),
      uniqueColumns = Seq("o_orderkey"),
      primaryKey = Seq("o_orderkey"))
    Validator.countsFrame(table(s, dir, "orders"), schema, Seq.empty)
  }

  /** V1–V8 rule engine on `events`: not_null, range, allowed_values,
    * business_hours, future_date, pattern, length — plus V10 JSON
    * conformance on `props` — all counted in the same single pass
    * (reference `validators.py:306-349,442-477`). */
  def vRulesEvents(s: SparkSession, dir: String): DataFrame = {
    import Rules._
    val schema = TableSchema(
      table = "events",
      columns = Seq("props" -> GDataType.GJson),
      requiredColumns = Seq("event_id", "ts", "user_id"))
    val rules = Seq(
      Rule("not_null", "value", Severity.Error, notNull(col("value"))),
      Rule("range", "value", Severity.Error,
        range(col("value"), Some(0.0), Some(150.0))),
      Rule("allowed_values", "event_type", Severity.Warning,
        allowedValues(col("event_type"), Seq("view", "click", "purchase", "signup"))),
      Rule("business_hours", "ts", Severity.Warning, businessHours(col("ts"))),
      Rule("future_date", "ts", Severity.Warning,
        futureDate(col("ts"), ts("2024-01-15 00:00:00"))),
      Rule("pattern", "event_type", Severity.Info,
        pattern(col("event_type"), "^[a-z]+$")),
      Rule("length", "event_type", Severity.Info,
        lengthRule(col("event_type"), Some(4), Some(8))))
    Validator.countsFrame(table(s, dir, "events"), schema, rules)
  }

  /** P1–P5 profiling on `lineitem`, decimal-exact where sums are involved
    * (reference `validators.py:356-390`; fused here into ONE pass where
    * the reference runs one pandas pass per stat). */
  def vProfileLineitem(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = $"l_quantity"; val p = $"l_extendedprice"; val f = $"l_returnflag"
    table(s, dir, "lineitem").agg(
      count(lit(1)).as("row_count"),
      (count(lit(1)) - count(q)).as("null_count__l_quantity"),
      countDistinct(q).as("distinct_count__l_quantity"),
      decAvg(q).as("mean__l_quantity"),
      expr("percentile(l_quantity, 0.5)").as("median__l_quantity"),
      min(q).cast(DoubleType).as("min__l_quantity"),
      max(q).cast(DoubleType).as("max__l_quantity"),
      sum(when(q === 0, 1L).otherwise(0L)).as("zero_count__l_quantity"),
      sum(when(q < 0, 1L).otherwise(0L)).as("negative_count__l_quantity"),
      decAvg(p).as("mean__l_extendedprice"),
      min(p).cast(DoubleType).as("min__l_extendedprice"),
      max(p).cast(DoubleType).as("max__l_extendedprice"),
      countDistinct(f).as("distinct_count__l_returnflag"),
      decAvg(length(f)).as("avg_length__l_returnflag"),
      min(length(f)).cast(LongType).as("min_length__l_returnflag"),
      max(length(f)).cast(LongType).as("max_length__l_returnflag"),
      sum(when(f === "", 1L).otherwise(0L)).as("empty_count__l_returnflag"))
  }

  /** Whole-row checks on `events`: V17 all-null rows, V18 fully-duplicated
    * rows, V20 infinite values, V21 null percentage — one fused pass
    * except the exact-duplicate count, which needs its own distinct
    * aggregation (reference `extractors.py:236-277`). */
  def vRowlevelEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = table(s, dir, "events")
    val cols = ev.columns.map(col).toSeq
    val base = ev.agg(
      count(lit(1)).as("row_count"),
      sum(when(Rules.allNullRow(cols), 1L).otherwise(0L)).as("all_null_rows"),
      sum(when(Rules.isInfinite($"value"), 1L).otherwise(0L)).as("infinite_values"),
      // V21 null pct as exact ratio of longs → one IEEE division
      ((count(lit(1)) - count($"value")).cast(DoubleType) / count(lit(1)))
        .as("null_pct__value"))
    val dups = ev.agg(
      (count(lit(1)) - countDistinct(struct(cols: _*))).as("duplicate_rows"))
    base.crossJoin(dups)
  }

  /** Engine-exact statistical profile + 3σ outlier counts per event
    * type. `stddev` is order-dependent floating point, so the moments
    * come from EXACT decimal sums (Σx, Σx² in decimal arithmetic
    * end-to-end, one final cast each) and mean/std derive via an
    * identical double formula in both engines. Per-row z-tests ride a
    * whole-partition window on the same shuffle as the moments — one
    * pass, no join-back. The window is per event type (few groups);
    * the sketch path for wide cardinality is `profileFrame(approx)`. */
  def vStatsEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val w = Window.partitionBy($"event_type")
    table(s, dir, "events")
      .filter($"value".isNotNull)
      .select($"event_type", $"value")
      .withColumn("n", count($"value").over(w))
      .withColumn("s", sum($"value".cast(dec)).over(w).cast("double"))
      // Σx² carries scale 12 from the decimal product; re-scale to 6
      // (exact here — 2dp inputs square to 4dp) BEFORE the double cast:
      // DuckDB's scale-12 decimal→double conversion can differ by 1 ulp
      .withColumn("s2",
        sum($"value".cast(dec) * $"value".cast(dec)).over(w)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))
          .cast("double"))
      .withColumn("mean", $"s" / $"n")
      // n == 1 guard: Spark's x/0 yields NULL but DuckDB's IEEE float
      // division yields inf/NaN — make both engines emit NULL std (and
      // a null z-predicate → zero outliers) for single-value groups
      .withColumn("std",
        when($"n" > 1,
          sqrt(($"s2" - $"s" * $"s" / $"n") / ($"n" - lit(1)))))
      .groupBy($"event_type")
      .agg(max($"n").as("n_values"), max($"mean").as("mean"),
        max($"std").as("std"),
        count(when(abs($"value" - $"mean") > $"std" * 3, lit(1)))
          .as("n_outliers"))
      .orderBy($"event_type")
  }

  /** Functional-dependency discovery (profiling/metadata extension):
    * FD A→B holds iff no A-group sees >1 distinct B — the check behind
    * candidate-key detection, denormalization safety, and schema
    * inference. One shuffle per tested LHS (each check is a groupBy on
    * its determinant then a 1-row aggregate); a 100 TB profiler batches
    * FDs sharing a determinant into one pass, which this spelling
    * composes to. The battery covers held keys and dependencies plus
    * violated candidates — including (l_orderkey, l_linenumber) →
    * l_partkey, which a TPC-H schema would declare a key but the
    * synthetic generator violates (line numbers repeat within an
    * order): exactly the discovery a profiler exists to surface.
    * Both verdict branches carry violation counts, not just booleans. */
  def vFdDiscovery(s: SparkSession, dir: String): DataFrame = {
    // "the group holds ≥2 distinct non-null rhs values" ⟺ min ≠ max
    // (both ignore nulls; a 0-or-1-distinct group has min <=> max, and
    // the null <=> null case means zero non-null values — not a
    // violation, same as countDistinct ≤ 1). The min/max spelling is a
    // plain partial aggregate — one hash-agg pass, map-side combined —
    // where countDistinct planned a two-phase distinct aggregation
    // shuffling every (lhs, rhs) pair (round 15; the retention-cohorts
    // Expand-avoidance argument applied to FD checking)
    def check(df: DataFrame, lhs: Seq[String], rhs: String,
        label: String): DataFrame =
      df.groupBy(lhs.map(col): _*)
        .agg(min(col(rhs)).as("__lo"), max(col(rhs)).as("__hi"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__lo") =!= col("__hi"), 1L).otherwise(0L))
            .as("n_violating"))
        .select(lit(label).as("fd"), col("n_groups"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    val orders = table(s, dir, "orders")
    val lineitem = table(s, dir, "lineitem")
    val customer = table(s, dir, "customer")
    check(orders, Seq("o_orderkey"), "o_custkey",
        "orders: o_orderkey -> o_custkey")
      .unionByName(check(orders, Seq("o_custkey"), "o_orderpriority",
        "orders: o_custkey -> o_orderpriority"))
      .unionByName(check(lineitem, Seq("l_orderkey"), "l_returnflag",
        "lineitem: l_orderkey -> l_returnflag"))
      .unionByName(check(lineitem, Seq("l_orderkey", "l_linenumber"),
        "l_partkey", "lineitem: (l_orderkey, l_linenumber) -> l_partkey"))
      .unionByName(check(customer, Seq("c_custkey"), "c_mktsegment",
        "customer: c_custkey -> c_mktsegment"))
      .unionByName(check(customer, Seq("c_name"), "c_custkey",
        "customer: c_name -> c_custkey"))
      .orderBy(col("fd"))
  }

  /** Pairwise Pearson correlations over the lineitem numeric columns —
    * the multivariate profiling step (feature redundancy, drift
    * detection) done engine-exactly: every moment (Σx, Σx², Σxy) is a
    * DECIMAL sum in ONE pass over the fact, so the inputs to the final
    * double formula are order-free and bit-identical; the closed-form
    * corr = (nΣxy−ΣxΣy)/(√(nΣx²−Σx²)·√(nΣy²−Σy²)) then runs the same
    * IEEE ops in both engines. Never `corr()` builtins — their
    * accumulation order differs by partitioning and engine. */
  def vCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val dec28 = org.apache.spark.sql.types.DecimalType(28, 6)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def d(c: String) = col(c).cast(dec)
    // product sums re-scale 12 → 6 BEFORE the double cast (exact for
    // ≤3dp inputs; the v_stats_events 1-ulp DuckDB conversion note)
    val moments =
      Seq(count(lit(1)).cast("double").as("n")) ++
      cols.map(c => sum(d(c)).cast("double").as(s"s_$c")) ++
      cols.map(c =>
        sum(d(c) * d(c)).cast(dec28).cast("double").as(s"q_$c")) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum(d(a) * d(b)).cast(dec28).cast("double").as(s"x_${a}_$b")
      }.toSeq
    val m = table(s, dir, "lineitem")
      .agg(moments.head, moments.tail: _*)
    val corrCols = cols.combinations(2).map { case Seq(a, b) =>
      ((col("n") * col(s"x_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
        (sqrt(col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a")) *
         sqrt(col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b"))))
        .as(s"corr_${a}_$b")
    }.toSeq
    m.select(col("n").cast("long").as("n") +: corrCols: _*)
  }

  /** Distribution-drift detection: the two-sample chi-square statistic
    * per event type between the first and second half of the month
    * (ref = before Jan 16, cur = after), over fixed value buckets.
    * Chi-square — not PSI/KL — because the statistic is pure
    * count-arithmetic (+,×,÷): `ln` differs across libm
    * implementations by 1 ulp and would make the oracle flaky, while
    * identical double divisions replay exactly. The 2×k contingency
    * grid is built EXPLICITLY (distinct buckets × both windows) so
    * zero cells contribute their (0−e)²/e term — the join-only
    * spelling silently drops exactly the cells that signal drift
    * hardest. Per-type terms fold through the decimal-exact sum
    * (order-free); one scan, one grid-sized shuffle. */
  def vDriftChi2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = table(s, dir, "events").filter($"value".isNotNull)
      .select($"event_type",
        least(floor($"value" / 50.0), lit(7.0)).cast(LongType).as("bucket"),
        when($"ts" < ts("2024-01-16 00:00:00"), "ref").otherwise("cur")
          .as("win"))
    val cells = ev.groupBy($"event_type", $"bucket", $"win")
      .agg(count(lit(1)).as("o"))
    // the 2-element window axis is generated map-side (explode of a
    // literal array) — a crossJoin with a 2-row frame plans a BNLJ
    // and trips the fleet-wide plan audit for no benefit
    val grid = cells.select($"event_type", $"bucket").distinct()
      .withColumn("win", explode(array(lit("ref"), lit("cur"))))
      .join(cells, Seq("event_type", "bucket", "win"), "left")
      .withColumn("o", coalesce($"o", lit(0L)))
    val wType = Window.partitionBy($"event_type")
    val wBucket = Window.partitionBy($"event_type", $"bucket")
    val wWin = Window.partitionBy($"event_type", $"win")
    val terms = grid
      .withColumn("t_all", sum($"o").over(wType))
      .withColumn("t_bucket", sum($"o").over(wBucket))
      .withColumn("t_win", sum($"o").over(wWin))
      .withColumn("e",
        ($"t_bucket" * $"t_win").cast(DoubleType) / $"t_all")
      .withColumn("term", ($"o" - $"e") * ($"o" - $"e") / $"e")
    terms.groupBy($"event_type")
      .agg(
        sum(when($"win" === "ref", $"o").otherwise(0L)).as("n_ref"),
        sum(when($"win" === "cur", $"o").otherwise(0L)).as("n_cur"),
        (countDistinct($"bucket") - 1).as("dof"),
        decSum($"term").as("chi2"))
      .orderBy($"event_type")
  }

  /** NUMERIC drift by the EXACT two-sample Kolmogorov–Smirnov
    * statistic, per event_type over the same ref/cur half-month
    * windows as [[vDriftChi2]] (chi-square covers categorical buckets;
    * KS is the standard numeric-distribution complement). The sup of
    * |F_ref − F_cur| is attained at a data point, so evaluating at
    * every DISTINCT value computes KS exactly — no binning, no
    * approximation. All arithmetic until the final division is
    * integer (cumulative counts cross-multiplied by the opposite
    * sample size), so the statistic is order-free and replays
    * bit-for-bit in DuckDB; the one division produces exact doubles
    * at these magnitudes (< 2⁵³). Plan shape: one (type, value)
    * aggregate, then cumulative windows PARTITIONED by event_type
    * (never an unpartitioned global sort — the q20 median pattern). */
  def vDriftKs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = table(s, dir, "events")
      .select($"event_type", $"value",
        when($"ts" < ts("2024-01-16 00:00:00"), "ref").otherwise("cur")
          .as("win"))
    graft.validation.Drift.ksStatistic(ev, "event_type", "value", "win")
      .orderBy($"event_type")
  }

  /** EXACT per-type quantiles of the continuous `value` column by
    * ITERATIVE RANGE REFINEMENT ([[graft.operators.Quantiles
    * .exactQuantiles]]): ≤ 6 histogram passes over monotone IEEE bit
    * keys, shuffling only interval COUNTS — never rows, never a
    * per-distinct-value window (which on a continuous column is a
    * full sort of the fact table). The returned value is the exact
    * k-th smallest (k = max(1, ⌈q·n⌉)), an actual data value, so the
    * row hash-compares bit-exactly; the oracle derives the same rank
    * by brute-force row_number. */
  def vExactQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.exactQuantiles(
      table(s, dir, "events"), "event_type", "value",
      Seq(0.25, 0.5, 0.9, 0.95), bits = 16)

  /** Per-type quantiles through the MERGEABLE KLL sketch
    * ([[graft.functions.KllSketchAgg]] — map-side partials of
    * O(k·log(n/k)) doubles, one buffer per partition on the shuffle,
    * re-mergeable across micro-batches by
    * [[graft.streaming.Streams.kllMergeBatch]]). EXACT-REGIME PIN
    * (the tx_heavy_tokens discipline): per-type counts at the oracle
    * scale (~2k) sit below k=4096, so nothing ever compacts, the
    * sketch IS the data, and the DuckDB row_number oracle matches
    * value for value; at bench scale (~20k/type) compaction engages
    * and KllSpec's deterministic rank bound takes over. */
  def vKllQuantiles(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.9, 0.95)
    val qArr = array(qs.map(lit): _*)
    table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        graft.functions.NativeAgg.kllQuantiles(
          col("value").cast("double"), 4096, qs).as("__vals"),
        count(when(col("value").isNotNull &&
          !isnan(col("value")), 1)).as("n"))
      .select(col("event_type"), col("n"),
        posexplode(col("__vals")).as(Seq("__qi", "value")))
      .select(col("event_type"),
        element_at(qArr, col("__qi") + 1).as("q"), col("n"), col("value"))
      .orderBy(col("event_type"), col("q"))
  }

  /** Pairwise two-sample KS distance between event-type value
    * distributions through MERGEABLE KLL sketches
    * ([[graft.functions.KllKsExpr]]) — the grid-free drift SCORE: the
    * corpus aggregates once into 5 per-type sketches and every pair
    * compares sketch-to-sketch (a type-count-sized frame, never the
    * data). Exact-regime pin like v_kll_quantiles: at the oracle
    * scale the sketches hold all their data, so the DuckDB window
    * spelling of the exact two-sample KS matches to the double. The
    * pair join is a BNLJ over the 5-row aggregate output — bounded by
    * the TYPE COUNT at any corpus size (PlanAuditSpec allowlists it
    * with that justification). */
  def vKllKs(s: SparkSession, dir: String): DataFrame = {
    val sk = table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(graft.functions.NativeAgg.kllSketch(
        col("value").cast("double"), 4096).as("kll"))
    sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        graft.functions.NativeAgg.kllKs(col("a.kll"), col("b.kll"))
          .as("ks"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** [[vExactQuantiles]]' HIGH-CARDINALITY twin through the DISTRIBUTED
    * search state ([[graft.operators.Quantiles.exactQuantilesDist]]):
    * per-USER p50/p95 of `value` — the group column nobody would hand
    * to a driver-map descent at scale (10⁵–10⁶ users; 150 here, the
    * semantics identical at any cardinality). The per-pass histograms
    * and the cumulative-mass descent run as DataFrame work, the driver
    * holds only the loop counter, and the result is the same exact
    * k-th-smallest contract the oracle derives by row_number. */
  def vQuantilesDist(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.exactQuantilesDist(
      table(s, dir, "events"), "user_id", "value", Seq(0.5, 0.95),
      bits = 16)

  /** WEIGHTED exact quantiles ([[graft.operators.Quantiles
    * .exactQuantiles]] with `weightCol`): per-source TOKEN-weighted
    * document-length percentiles — the q-point of the token MASS, not
    * the document count (a corpus-budget question: "half the tokens
    * live in documents shorter than THIS"). Each doc contributes its
    * whitespace token count as an integer multiplicity
    * (k = max(1, ⌈q·W⌉) over total token weight W); the refinement
    * machinery is unchanged — histograms sum weights. The oracle
    * derives the same rank by cumulative weight over per-value mass
    * (deterministic regardless of intra-value ordering, which a
    * weighted row_number would not be). */
  def vWeightedQuantiles(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("source"), col("n_chars"),
        graft.text.TextFunctions.tokenCount(col("text")).as("__w"))
    graft.operators.Quantiles.exactQuantiles(docs, "source", "n_chars",
      Seq(0.5, 0.9), bits = 16, weightCol = Some("__w"))
  }

  /** PER-KEY EQUI-DEPTH bucketing end to end ([[graft.operators
    * .Quantiles.equiDepthBoundsDist]] sizes the grid through the
    * distributed descent, [[graft.operators.Quantiles.bucketOfKeyed]]
    * lands every row in its key's bucket): per event_type, the b=8
    * bucket histogram of `value`. This is the grid-sizing pipeline a
    * 10⁵-key drift monitor runs — cut points exact per key, every
    * bucket's mass pinned ≈ n/8 by construction — and the oracle
    * replays cuts (rank selection), per-row bucket (comparison count
    * against the key's 7 cuts), and the final histogram. */
  /** WEIGHTED × GROUP-SCALE exact quantiles — the composition of
    * [[vWeightedQuantiles]] (token mass, not row count) and
    * [[vQuantilesDist]] (distributed search state): the same
    * token-weighted document-length percentiles, refined with the
    * per-pass histograms and the descent living in DataFrames — the
    * shape a per-domain corpus-budget report takes when the key
    * cardinality outgrows the driver-map variant's contract. The
    * oracle is the identical cumulative-weight DuckDB derivation
    * (deterministic regardless of intra-value ordering). */
  def vWeightedQuantilesDist(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .select(col("source"), col("n_chars"),
        graft.text.TextFunctions.tokenCount(col("text")).as("__w"))
    graft.operators.Quantiles.exactQuantilesDist(docs, "source", "n_chars",
      Seq(0.5, 0.9), bits = 16, weightCol = Some("__w"))
  }

  def vEquidepthHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = table(s, dir, "events")
      .filter($"value".isNotNull && !isnan($"value"))
      .select($"event_type", $"value")
    // bits = 16 here and in the sibling quantile rows: passes =
    // ⌈64/bits⌉, so 16 cuts the 64-bit key descent from 6 passes to 4,
    // and the per-search histogram rows are bounded by NON-EMPTY
    // buckets (≤ the group's distinct values — far below 2^16 at these
    // cardinalities), so the wider grid costs nothing. The operator
    // default stays 12: at 10⁶ searches × dense groups the 2^bits
    // worst-case bound is the scaling contract.
    val bounds = graft.operators.Quantiles.equiDepthBoundsDist(
      ev, "event_type", "value", b = 8, bits = 16)
    graft.operators.Quantiles.bucketOfKeyed(ev, "event_type", "value", bounds)
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy($"event_type", $"bucket")
  }

  /** GRID quantiles over accumulated bucket counts
    * ([[graft.operators.Quantiles.gridQuantiles]] — the streaming
    * read-side of the drift sink's folded state), pinned end to end:
    * per event_type the bucket holding the q-quantile (first bucket
    * whose cumulative count reaches max(1, ⌈q·n⌉)) over the chi2
    * bucketing of `value`. Together with v_exact_quantiles this
    * grounds the whole quantile story in the oracle gate: exact values
    * from refinement, bucket-resolution answers from folded counts. */
  def vGridQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = table(s, dir, "events")
      .filter($"value".isNotNull)
      .groupBy($"event_type",
        least(floor($"value" / 50.0), lit(7.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
    graft.operators.Quantiles.gridQuantiles(counts, "event_type", "bucket",
      Seq(0.25, 0.5, 0.9, 0.95))
  }

  /** The GRID-KS APPROXIMATION BOUND as an oracle row — the theory the
    * streaming drift monitor rests on, pinned end to end: per
    * event_type, the EXACT KS numerator (every distinct value), the
    * GRID KS numerator (values pooled into the chi2 bucketing), and
    * the bound numerator `max_b min(c_cur_b·n_ref, c_ref_b·n_cur)`,
    * with `bound_ok` asserting
    *   grid_num ≤ exact_num ≤ grid_num + bound_num
    * (CDFs are monotone inside a bucket, so the gap at any interior
    * cut point exceeds a grid-edge gap by at most the smaller of the
    * two bucket masses — the [[graft.streaming.Streams.ksAgainst]]
    * contract). Everything is cross-multiplied integer arithmetic, so
    * the row hash-compares; the oracle re-derives all three numbers
    * independently. */
  def vDriftGridBound(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = table(s, dir, "events")
      .filter($"value".isNotNull)
      .select($"event_type", $"value",
        when($"ts" < ts("2024-01-16 00:00:00"), "ref").otherwise("cur")
          .as("win"))
    val exact = graft.validation.Drift
      .ksStatistic(ev, "event_type", "value", "win")
      .select($"event_type", $"n_ref", $"n_cur", $"ks_num".as("exact_num"))
    val evB = ev.withColumn("value",
      least(floor($"value" / 50.0), lit(7.0)).cast("long"))
    val grid = graft.validation.Drift
      .ksStatistic(evB, "event_type", "value", "win")
      .select($"event_type", $"ks_num".as("grid_num"))
    val totals = ev.groupBy($"event_type").agg(
      sum(when($"win" === "ref", 1L).otherwise(0L)).as("nr"),
      sum(when($"win" =!= "ref", 1L).otherwise(0L)).as("nc"))
    val bound = evB.groupBy($"event_type", $"value")
      .agg(sum(when($"win" === "ref", 1L).otherwise(0L)).as("c_ref"),
        sum(when($"win" =!= "ref", 1L).otherwise(0L)).as("c_cur"))
      .join(totals, Seq("event_type"))
      .groupBy($"event_type")
      .agg(max(least($"c_cur" * $"nr", $"c_ref" * $"nc")).as("bound_num"))
    exact.join(grid, Seq("event_type")).join(bound, Seq("event_type"))
      .select($"event_type", $"n_ref", $"n_cur", $"grid_num",
        $"exact_num", $"bound_num",
        ($"grid_num" <= $"exact_num" &&
          $"exact_num" <= $"grid_num" + $"bound_num").as("bound_ok"))
      .orderBy($"event_type")
  }

  /** THE STREAMING drift monitor as an oracle row
    * ([[graft.streaming.Streams.driftCountsSink]] + `chi2Against`):
    * the reference distribution is the FIRST half-month's bucket
    * proportions; the second half-month's events stream through the
    * checkpointed count-fold sink in three event_id-ordered
    * micro-batches, and the accumulated state is scored one-sample
    * against the reference. The oracle recomputes both windows and
    * the statistic independently in SQL — pinning the fold AND the
    * scorer, the tx_pretrain_stream pattern. Every (type, bucket)
    * exists in both windows at this density, so the monitor's
    * unknown-bucket guard stays quiet (it would THROW loudly, not
    * mis-score, if the fixture thinned). Temp state deleted in
    * `finally` — bench attempts and the oracle gate re-invoke this. */
  def vDriftStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ev = table(s, dir, "events").filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        // 3 pooled buckets (<50, 50-100, >=100): the one-sample monitor
        // requires every CURRENT bucket to exist in the reference
        // window (unknown buckets THROW) — at sf0.001 density finer
        // bucketings leave uncovered tail cells in the ref window
        least(floor(col("value") / 50.0), lit(2.0)).cast(LongType)
          .as("bucket"),
        (col("ts") < ts("2024-01-16 00:00:00")).as("is_ref"))
    val refWin = ev.filter(col("is_ref"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val refP = refWin
      .withColumn("p", col("c").cast(DoubleType) /
        sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
      .select(col("event_type"), col("bucket"), col("p"))
      .localCheckpoint()
    val cur = ev.filter(!col("is_ref"))
      .orderBy(col("event_id"))
      .select(col("event_id"), col("event_type"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val splits = Seq(cur.take(cur.length / 3),
      cur.slice(cur.length / 3, 2 * cur.length / 3),
      cur.drop(2 * cur.length / 3))
    val work = java.nio.file.Files
      .createTempDirectory("graft_drift_stream").toString
    val input = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.Streams.driftCountsSink(
        input.toDF().toDF("event_id", "event_type", "bucket")
          .drop("event_id"),
        s"$work/state", s"$work/cp", "event_type", "bucket",
        trig = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()
    val rows =
      try {
        try splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        finally q.stop()
        graft.streaming.Streams.chi2Against(s, s"$work/state", refP,
            "event_type", "bucket", "p")
          .collect().toSeq
      } finally graft.core.AtomicSwap.deleteRecursively(new java.io.File(work))
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("event_type", StringType, nullable = true),
          StructField("n_obs", LongType, nullable = true),
          StructField("dof", LongType, nullable = true),
          StructField("chi2", DoubleType, nullable = true))))
      .orderBy(col("event_type"))
  }

  /** STREAMING twin of [[vKllQuantiles]] under the oracle gate: the
    * events table replays through [[graft.streaming.Streams.kllMergeSink]]
    * in 3 deterministic micro-batches (event_id order), the per-type
    * KLL states fold across batches via the serialized-sketch merge,
    * and the accumulated state answers the same quantiles. Exact
    * regime at the oracle scale (k=4096 ≥ per-type counts), where the
    * DETERMINISTIC merge makes the streamed fold bit-identical to the
    * one-shot aggregate — so the DuckDB row_number oracle pins the
    * whole batch-boundary/merge/serialize path, not just the agg. */
  def vKllStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val qs = Seq(0.25, 0.5, 0.9, 0.95)
    val cur = table(s, dir, "events")
      .orderBy(col("event_id"))
      .select(col("event_id"), col("event_type"),
        col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2))))
    val splits = Seq(cur.take(cur.length / 3),
      cur.slice(cur.length / 3, 2 * cur.length / 3),
      cur.drop(2 * cur.length / 3))
    val work = java.nio.file.Files
      .createTempDirectory("graft_kll_stream").toString
    val input = MemoryStream[(Long, String, Option[Double])]
    val q = graft.streaming.Streams.kllMergeSink(
        input.toDF().toDF("event_id", "event_type", "value")
          .drop("event_id"),
        s"$work/state", s"$work/cp", Seq("event_type"), "value", 4096,
        trig = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()
    val rows =
      try {
        try splits.foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
        finally q.stop()
        graft.streaming.Streams
          .kllQuantilesState(s, s"$work/state", Seq("event_type"), qs)
          .join(s.read.parquet(s"$work/state")
            .select(col("event_type"), col("n_rows").as("n")), "event_type")
          .collect().toSeq
          .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
            r.getLong(3)))
      } finally graft.core.AtomicSwap.deleteRecursively(new java.io.File(work))
    rows.toDF("event_type", "q", "value", "n")
      .orderBy(col("event_type"), col("q"))
  }

  import graft.validation.Privacy

  /** Privacy: k-anonymity class-size histogram over the customer QI
    * tuple (nation, segment, coarse balance bucket). */
  def vKAnonymity(s: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymityHistogram(table(s, dir, "customer"),
      Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).as("bal_bucket")))
      .orderBy(col("class_size"))

  /** Privacy: single-row k-anonymity gate report at required k=5. */
  def vKAnonReport(s: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymityReport(table(s, dir, "customer"),
      Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).as("bal_bucket")), k = 5)

  /** Privacy: l-diversity of the sensitive segment within
    * (nation, balance-bucket) classes, required l=3. */
  def vLDiversity(s: SparkSession, dir: String): DataFrame =
    Privacy.lDiversityReport(table(s, dir, "customer"),
      Seq(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).as("bal_bucket")),
      col("c_mktsegment"), l = 3)

  val queries: Map[String, QueryFn] = Map(
    "v_k_anonymity" -> (vKAnonymity _),
    "v_k_anon_report" -> (vKAnonReport _),
    "v_l_diversity" -> (vLDiversity _),
    "v_corr_matrix" -> (vCorrMatrix _),
    "v_drift_chi2" -> (vDriftChi2 _),
    "v_drift_ks" -> (vDriftKs _),
    "v_drift_grid_bound" -> (vDriftGridBound _),
    "v_exact_quantiles" -> (vExactQuantiles _),
    "v_kll_quantiles" -> (vKllQuantiles _),
    "v_kll_ks" -> (vKllKs _),
    "v_kll_stream" -> (vKllStream _),
    "v_quantiles_dist" -> (vQuantilesDist _),
    "v_weighted_quantiles" -> (vWeightedQuantiles _),
    "v_weighted_quantiles_dist" -> (vWeightedQuantilesDist _),
    "v_equidepth_hist" -> (vEquidepthHist _),
    "v_grid_quantiles" -> (vGridQuantiles _),
    "v_drift_stream" -> (vDriftStream _),
    "v_stats_events" -> (vStatsEvents _),
    "v_constraints_orders" -> (vConstraintsOrders _),
    "v_rules_events" -> (vRulesEvents _),
    "v_profile_lineitem" -> (vProfileLineitem _),
    "v_fd_discovery" -> (vFdDiscovery _),
    "v_rowlevel_events" -> (vRowlevelEvents _))

  private val custQiSql = """
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
    FROM customer"""

  val oracles: Map[String, String] = Map(
    "v_k_anonymity" -> s"""
      WITH qi AS ($custQiSql),
      classes AS (
        SELECT c_nationkey, c_mktsegment, bal_bucket,
               COUNT(*) AS class_size
        FROM qi GROUP BY 1, 2, 3)
      SELECT class_size, COUNT(*) AS n_classes,
             CAST(COUNT(*) * class_size AS BIGINT) AS n_records
      FROM classes GROUP BY class_size ORDER BY class_size""",
    "v_k_anon_report" -> s"""
      WITH qi AS ($custQiSql),
      classes AS (
        SELECT c_nationkey, c_mktsegment, bal_bucket,
               COUNT(*) AS class_size
        FROM qi GROUP BY 1, 2, 3)
      SELECT COUNT(*) AS n_classes, MIN(class_size) AS dataset_k,
             CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS classes_below_k,
             CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                  AS BIGINT) AS records_below_k,
             5 AS required_k
      FROM classes""",
    "v_l_diversity" -> """
      WITH classes AS (
        SELECT c_nationkey,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               COUNT(*) AS class_size,
               COUNT(DISTINCT c_mktsegment) AS l_distinct
        FROM customer GROUP BY 1, 2)
      SELECT COUNT(*) AS n_classes, MIN(l_distinct) AS dataset_l,
             CAST(SUM(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS classes_below_l,
             CAST(SUM(CASE WHEN l_distinct < 3 THEN class_size ELSE 0 END)
                  AS BIGINT) AS records_below_l,
             3 AS required_l
      FROM classes""",
    // vDriftStream twin: ref-window proportions, cur-window counts,
    // and the one-sample statistic all recomputed independently —
    // pinning both the streaming fold and the scorer
    "v_drift_stream" -> s"""
      WITH ev AS (
        SELECT event_type,
               CAST(LEAST(FLOOR(value / 50.0), 2.0) AS BIGINT) AS bucket,
               ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
        FROM events WHERE value IS NOT NULL),
      refc AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS c
               FROM ev WHERE is_ref GROUP BY 1, 2),
      refp AS (SELECT event_type, bucket,
                      CAST(c AS DOUBLE) /
                        SUM(c) OVER (PARTITION BY event_type) AS p
               FROM refc),
      curc AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS o
               FROM ev WHERE NOT is_ref GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
              FROM curc GROUP BY 1),
      terms AS (
        SELECT r.event_type, COALESCE(c.o, 0) AS o, t.n,
               CAST(t.n AS DOUBLE) * r.p AS e
        FROM refp r
        LEFT JOIN curc c ON c.event_type = r.event_type
          AND c.bucket = r.bucket
        JOIN tot t ON t.event_type = r.event_type)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_obs,
             CAST(COUNT(*) - 1 AS BIGINT) AS dof,
             ${decSumSql("(o - e) * (o - e) / e")} AS chi2
      FROM terms GROUP BY 1 ORDER BY 1""",
    // exact two-sample KS: cumulative counts at every distinct value,
    // cross-multiplied by the opposite sample size — integer until the
    // final division (window SUMs are HUGEINT, CAST per house rule)
    "v_drift_ks" -> s"""
      WITH ev AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'ref' ELSE 'cur' END AS win
        FROM events WHERE value IS NOT NULL),
      bv AS (
        SELECT event_type, value,
               SUM(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS c_ref,
               SUM(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS c_cur
        FROM ev GROUP BY event_type, value),
      cums AS (
        SELECT event_type,
               CAST(SUM(c_ref) OVER (PARTITION BY event_type ORDER BY value
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
               CAST(SUM(c_cur) OVER (PARTITION BY event_type ORDER BY value
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cur,
               CAST(SUM(c_ref) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_ref,
               CAST(SUM(c_cur) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_cur
        FROM bv)
      SELECT event_type,
             CAST(MAX(n_ref) AS BIGINT) AS n_ref,
             CAST(MAX(n_cur) AS BIGINT) AS n_cur,
             CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS BIGINT)
               AS ks_num,
             CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS DOUBLE)
               / CAST(MAX(n_ref) * MAX(n_cur) AS DOUBLE) AS ks
      FROM cums GROUP BY event_type ORDER BY event_type""",
    "v_grid_quantiles" -> """
      WITH gb AS (
        SELECT event_type,
               CAST(LEAST(FLOOR(value / 50.0), 7.0) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      cums AS (
        SELECT event_type, bucket,
               CAST(SUM(n_rows) OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(n_rows) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM gb),
      qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.9), (0.95)) AS t(q))
      SELECT event_type, CAST(qs.q AS DOUBLE) AS q, MAX(n) AS n,
             MIN(bucket) AS bucket
      FROM cums JOIN qs
        ON cum >= GREATEST(1, CAST(CEIL(n * qs.q) AS BIGINT))
      GROUP BY event_type, qs.q
      ORDER BY event_type, qs.q""",
    "v_exact_quantiles" -> """
      WITH ev AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
      r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
      qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.9), (0.95)) AS t(q))
      SELECT r.event_type, CAST(qs.q AS DOUBLE) AS q,
             CAST(r.n AS BIGINT) AS n, r.value
      FROM r JOIN qs
        ON r.rn = GREATEST(1, CAST(CEIL(qs.q * r.n) AS BIGINT))
      ORDER BY r.event_type, qs.q""",
    "v_kll_quantiles" -> """
      WITH ev AS (
        SELECT event_type, CAST(value AS DOUBLE) AS value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
      r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
      qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.9), (0.95)) AS t(q))
      SELECT r.event_type, CAST(qs.q AS DOUBLE) AS q,
             CAST(r.n AS BIGINT) AS n, r.value
      FROM r JOIN qs
        ON r.rn = GREATEST(1, CAST(CEIL(qs.q * r.n) AS BIGINT))
      ORDER BY r.event_type, qs.q""",
    "v_kll_stream" -> """
      WITH ev AS (
        SELECT event_type, CAST(value AS DOUBLE) AS value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
      r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
      qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.9), (0.95)) AS t(q))
      SELECT r.event_type, CAST(qs.q AS DOUBLE) AS q, r.value,
             CAST(r.n AS BIGINT) AS n
      FROM r JOIN qs
        ON r.rn = GREATEST(1, CAST(CEIL(qs.q * r.n) AS BIGINT))
      ORDER BY r.event_type, qs.q""",
    "v_kll_ks" -> """
      WITH ev AS (
        SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
      t AS (SELECT DISTINCT event_type FROM ev),
      pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM t a JOIN t b ON a.event_type < b.event_type),
      u AS (
        SELECT p.ta, p.tb, e.v,
               CASE WHEN e.event_type = p.ta THEN 1 ELSE 0 END AS ia,
               CASE WHEN e.event_type = p.tb THEN 1 ELSE 0 END AS ib
        FROM pairs p JOIN ev e ON e.event_type IN (p.ta, p.tb)),
      c AS (
        SELECT ta, tb,
               SUM(ia) OVER (PARTITION BY ta, tb ORDER BY v) AS ca,
               SUM(ib) OVER (PARTITION BY ta, tb ORDER BY v) AS cb,
               SUM(ia) OVER (PARTITION BY ta, tb) AS na,
               SUM(ib) OVER (PARTITION BY ta, tb) AS nb
        FROM u)
      SELECT ta AS type_a, tb AS type_b,
             MAX(ABS(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) -
                     CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) AS ks
      FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "v_quantiles_dist" -> """
      WITH ev AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
      r AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM ev),
      qs AS (SELECT * FROM (VALUES (0.5), (0.95)) AS t(q))
      SELECT r.user_id, CAST(qs.q AS DOUBLE) AS q,
             CAST(r.n AS BIGINT) AS n, r.value
      FROM r JOIN qs
        ON r.rn = GREATEST(1, CAST(CEIL(qs.q * r.n) AS BIGINT))
      ORDER BY r.user_id, qs.q""",
    "v_weighted_quantiles" -> """
      WITH d AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS v,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS w
        FROM documents WHERE n_chars IS NOT NULL),
      vals AS (
        SELECT source, v, SUM(w) AS vw FROM d WHERE w > 0
        GROUP BY source, v),
      cum AS (
        SELECT source, v,
               SUM(vw) OVER (PARTITION BY source ORDER BY v) AS cw,
               SUM(vw) OVER (PARTITION BY source) AS W
        FROM vals),
      qs AS (SELECT * FROM (VALUES (0.5), (0.9)) AS t(q))
      SELECT source, CAST(qs.q AS DOUBLE) AS q,
             CAST(MAX(cum.W) AS BIGINT) AS n, MIN(cum.v) AS value
      FROM cum JOIN qs
        ON cum.cw >= GREATEST(1, CAST(CEIL(qs.q * cum.W) AS BIGINT))
      GROUP BY source, qs.q
      ORDER BY source, qs.q""",
    "v_weighted_quantiles_dist" -> """
      WITH d AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS v,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS w
        FROM documents WHERE n_chars IS NOT NULL),
      vals AS (
        SELECT source, v, SUM(w) AS vw FROM d WHERE w > 0
        GROUP BY source, v),
      cum AS (
        SELECT source, v,
               SUM(vw) OVER (PARTITION BY source ORDER BY v) AS cw,
               SUM(vw) OVER (PARTITION BY source) AS W
        FROM vals),
      qs AS (SELECT * FROM (VALUES (0.5), (0.9)) AS t(q))
      SELECT source, CAST(qs.q AS DOUBLE) AS q,
             CAST(MAX(cum.W) AS BIGINT) AS n, MIN(cum.v) AS value
      FROM cum JOIN qs
        ON cum.cw >= GREATEST(1, CAST(CEIL(qs.q * cum.W) AS BIGINT))
      GROUP BY source, qs.q
      ORDER BY source, qs.q""",
    "v_equidepth_hist" -> """
      WITH ev AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rid
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
      r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
      qs AS (SELECT CAST(i AS DOUBLE) / 8.0 AS q FROM range(1, 8) t(i)),
      cuts AS (
        SELECT r.event_type, r.value AS cut
        FROM r JOIN qs
          ON r.rn = GREATEST(1, CAST(CEIL(qs.q * r.n) AS BIGINT))),
      b AS (
        SELECT e.event_type, e.rid,
               SUM(CASE WHEN e.value > c.cut THEN 1 ELSE 0 END) AS bucket
        FROM ev e JOIN cuts c USING (event_type)
        GROUP BY e.event_type, e.rid)
      SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM b GROUP BY event_type, bucket
      ORDER BY event_type, bucket""",
    "v_drift_grid_bound" -> s"""
      WITH ev AS (
        SELECT event_type, value,
               CAST(LEAST(FLOOR(value / 50.0), 7.0) AS BIGINT) AS bucket,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'ref' ELSE 'cur' END AS win
        FROM events WHERE value IS NOT NULL),
      bv AS (
        SELECT event_type, value,
               SUM(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS c_ref,
               SUM(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS c_cur
        FROM ev GROUP BY event_type, value),
      vcums AS (
        SELECT event_type,
               CAST(SUM(c_ref) OVER (PARTITION BY event_type ORDER BY value
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
               CAST(SUM(c_cur) OVER (PARTITION BY event_type ORDER BY value
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cur,
               CAST(SUM(c_ref) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_ref,
               CAST(SUM(c_cur) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_cur
        FROM bv),
      ex AS (
        SELECT event_type, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
               CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS BIGINT)
                 AS exact_num
        FROM vcums GROUP BY event_type),
      gb AS (
        SELECT event_type, bucket,
               SUM(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS c_ref,
               SUM(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS c_cur
        FROM ev GROUP BY event_type, bucket),
      gcums AS (
        SELECT event_type,
               CAST(SUM(c_ref) OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
               CAST(SUM(c_cur) OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cur,
               CAST(SUM(c_ref) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_ref,
               CAST(SUM(c_cur) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_cur
        FROM gb),
      gr AS (
        SELECT event_type,
               CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS BIGINT)
                 AS grid_num
        FROM gcums GROUP BY event_type),
      bnd AS (
        SELECT g.event_type,
               CAST(MAX(LEAST(g.c_cur * e.n_ref, g.c_ref * e.n_cur))
                 AS BIGINT) AS bound_num
        FROM gb g JOIN ex e ON e.event_type = g.event_type
        GROUP BY g.event_type)
      SELECT e.event_type, e.n_ref, e.n_cur, gr.grid_num, e.exact_num,
             bnd.bound_num,
             (gr.grid_num <= e.exact_num AND
              e.exact_num <= gr.grid_num + bnd.bound_num) AS bound_ok
      FROM ex e
      JOIN gr ON gr.event_type = e.event_type
      JOIN bnd ON bnd.event_type = e.event_type
      ORDER BY e.event_type""",
    "v_drift_chi2" -> s"""
      WITH ev AS (
        SELECT event_type,
               CAST(LEAST(FLOOR(value / 50.0), 7.0) AS BIGINT) AS bucket,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'ref' ELSE 'cur' END AS win
        FROM events WHERE value IS NOT NULL),
      cells AS (
        SELECT event_type, bucket, win, CAST(COUNT(*) AS BIGINT) AS o
        FROM ev GROUP BY 1, 2, 3),
      grid AS (
        SELECT g.event_type, g.bucket, w.win, COALESCE(c.o, 0) AS o
        FROM (SELECT DISTINCT event_type, bucket FROM cells) g
        CROSS JOIN (VALUES ('ref'), ('cur')) AS w(win)
        LEFT JOIN cells c ON c.event_type = g.event_type
          AND c.bucket = g.bucket AND c.win = w.win),
      terms AS (
        SELECT event_type, bucket, win, o,
          CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS t_all,
          CAST(SUM(o) OVER (PARTITION BY event_type, bucket) AS BIGINT)
            AS t_bucket,
          CAST(SUM(o) OVER (PARTITION BY event_type, win) AS BIGINT) AS t_win
        FROM grid),
      t2 AS (
        SELECT event_type, win, o,
               CAST(t_bucket * t_win AS DOUBLE) / t_all AS e, bucket
        FROM terms)
      SELECT event_type,
             CAST(SUM(CASE WHEN win = 'ref' THEN o ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(SUM(CASE WHEN win = 'cur' THEN o ELSE 0 END) AS BIGINT)
               AS n_cur,
             CAST(COUNT(DISTINCT bucket) - 1 AS BIGINT) AS dof,
             ${decSumSql("(o - e) * (o - e) / e")} AS chi2
      FROM t2
      GROUP BY event_type
      ORDER BY event_type""",
    "v_corr_matrix" -> """
      WITH m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s_q,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s_p,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s_d,
          CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS s_t,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS q_q,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS q_p,
          CAST(CAST(SUM(CAST(l_discount AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS q_d,
          CAST(CAST(SUM(CAST(l_tax AS DECIMAL(19,6)) * CAST(l_tax AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS q_t,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS x_qp,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS x_qd,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_tax AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS x_qt,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS x_pd,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_tax AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS x_pt,
          CAST(CAST(SUM(CAST(l_discount AS DECIMAL(19,6)) * CAST(l_tax AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS x_dt
        FROM lineitem)
      SELECT CAST(n AS BIGINT) AS n,
        (n * x_qp - s_q * s_p) / (SQRT(n * q_q - s_q * s_q) * SQRT(n * q_p - s_p * s_p)) AS corr_l_quantity_l_extendedprice,
        (n * x_qd - s_q * s_d) / (SQRT(n * q_q - s_q * s_q) * SQRT(n * q_d - s_d * s_d)) AS corr_l_quantity_l_discount,
        (n * x_qt - s_q * s_t) / (SQRT(n * q_q - s_q * s_q) * SQRT(n * q_t - s_t * s_t)) AS corr_l_quantity_l_tax,
        (n * x_pd - s_p * s_d) / (SQRT(n * q_p - s_p * s_p) * SQRT(n * q_d - s_d * s_d)) AS corr_l_extendedprice_l_discount,
        (n * x_pt - s_p * s_t) / (SQRT(n * q_p - s_p * s_p) * SQRT(n * q_t - s_t * s_t)) AS corr_l_extendedprice_l_tax,
        (n * x_dt - s_d * s_t) / (SQRT(n * q_d - s_d * s_d) * SQRT(n * q_t - s_t * s_t)) AS corr_l_discount_l_tax
      FROM m""",
    "v_fd_discovery" -> """
      WITH c1 AS (SELECT 'orders: o_orderkey -> o_custkey' AS fd,
                         CAST(COUNT(*) AS BIGINT) AS n_groups,
                         CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_violating
                  FROM (SELECT COUNT(DISTINCT o_custkey) AS d
                        FROM orders GROUP BY o_orderkey)),
      c2 AS (SELECT 'orders: o_custkey -> o_orderpriority' AS fd,
                    CAST(COUNT(*) AS BIGINT),
                    CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             FROM (SELECT COUNT(DISTINCT o_orderpriority) AS d
                   FROM orders GROUP BY o_custkey)),
      c3 AS (SELECT 'lineitem: l_orderkey -> l_returnflag' AS fd,
                    CAST(COUNT(*) AS BIGINT),
                    CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             FROM (SELECT COUNT(DISTINCT l_returnflag) AS d
                   FROM lineitem GROUP BY l_orderkey)),
      c4 AS (SELECT 'lineitem: (l_orderkey, l_linenumber) -> l_partkey' AS fd,
                    CAST(COUNT(*) AS BIGINT),
                    CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             FROM (SELECT COUNT(DISTINCT l_partkey) AS d
                   FROM lineitem GROUP BY l_orderkey, l_linenumber)),
      c5 AS (SELECT 'customer: c_custkey -> c_mktsegment' AS fd,
                    CAST(COUNT(*) AS BIGINT),
                    CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             FROM (SELECT COUNT(DISTINCT c_mktsegment) AS d
                   FROM customer GROUP BY c_custkey)),
      c6 AS (SELECT 'customer: c_name -> c_custkey' AS fd,
                    CAST(COUNT(*) AS BIGINT),
                    CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             FROM (SELECT COUNT(DISTINCT c_custkey) AS d
                   FROM customer GROUP BY c_name)),
      u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
            UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
            UNION ALL SELECT * FROM c5 UNION ALL SELECT * FROM c6)
      SELECT fd, n_groups, n_violating, n_violating = 0 AS holds
      FROM u ORDER BY fd""",
    "v_stats_events" -> """
      WITH st AS (
        SELECT event_type,
               CAST(COUNT(value) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)) *
                             CAST(value AS DECIMAL(18,6)))
                         AS DECIMAL(28,6)) AS DOUBLE) AS s2
        FROM events WHERE value IS NOT NULL GROUP BY event_type),
      p AS (
        SELECT event_type, n, s / n AS mean,
               CASE WHEN n > 1
                    THEN SQRT((s2 - s * s / n) / (n - 1)) END AS std
        FROM st)
      SELECT p.event_type, p.n AS n_values, p.mean, p.std,
             CAST(SUM(CASE WHEN ABS(e.value - p.mean) > p.std * 3
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM events e JOIN p ON e.event_type = p.event_type
      WHERE e.value IS NOT NULL
      GROUP BY p.event_type, p.n, p.mean, p.std
      ORDER BY p.event_type""",
    // NOTE: DuckDB returns SUM over integers as HUGEINT (int128), which the
    // driver's pandas bridge renders as float64 while Spark emits int64 —
    // equal values, different hash. CAST every integer sum/difference to
    // BIGINT so both engines agree on representation.
    "v_constraints_orders" -> """
      SELECT COUNT(*) AS row_count,
        CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND TRY_CAST(o_orderkey AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS type_violations__o_orderkey,
        CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND TRY_CAST(o_custkey AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS type_violations__o_custkey,
        CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND TRY_CAST(o_totalprice AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS type_violations__o_totalprice,
        CAST(SUM(CASE WHEN o_orderdate IS NOT NULL AND TRY_CAST(o_orderdate AS TIMESTAMP) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS type_violations__o_orderdate,
        CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_violations__o_orderkey,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_violations__o_custkey,
        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_violations__o_totalprice,
        CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS duplicate_values__o_orderkey,
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS pk_duplicates
      FROM orders""",
    "v_rules_events" -> """
      SELECT COUNT(*) AS row_count,
        CAST(SUM(CASE WHEN props IS NOT NULL AND NOT json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS type_violations__props,
        CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_violations__event_id,
        CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_violations__ts,
        CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_violations__user_id,
        CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_null__value,
        CAST(SUM(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 150.0) THEN 1 ELSE 0 END) AS BIGINT) AS range__value,
        CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type NOT IN ('view','click','purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS allowed_values__event_type,
        CAST(SUM(CASE WHEN ts IS NOT NULL AND (hour(ts) < 9 OR hour(ts) >= 17) THEN 1 ELSE 0 END) AS BIGINT) AS business_hours__ts,
        CAST(SUM(CASE WHEN ts IS NOT NULL AND ts > TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS future_date__ts,
        CAST(SUM(CASE WHEN event_type IS NOT NULL AND NOT regexp_matches(event_type, '^[a-z]+$') THEN 1 ELSE 0 END) AS BIGINT) AS pattern__event_type,
        CAST(SUM(CASE WHEN event_type IS NOT NULL AND (length(CAST(event_type AS VARCHAR)) < 4 OR length(CAST(event_type AS VARCHAR)) > 8) THEN 1 ELSE 0 END) AS BIGINT) AS length__event_type
      FROM events""",
    "v_profile_lineitem" -> s"""
      SELECT COUNT(*) AS row_count,
        CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS null_count__l_quantity,
        COUNT(DISTINCT l_quantity) AS distinct_count__l_quantity,
        ${decAvgSql("l_quantity")} AS mean__l_quantity,
        quantile_cont(l_quantity, 0.5) AS median__l_quantity,
        CAST(MIN(l_quantity) AS DOUBLE) AS min__l_quantity,
        CAST(MAX(l_quantity) AS DOUBLE) AS max__l_quantity,
        CAST(SUM(CASE WHEN l_quantity = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_count__l_quantity,
        CAST(SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_count__l_quantity,
        ${decAvgSql("l_extendedprice")} AS mean__l_extendedprice,
        CAST(MIN(l_extendedprice) AS DOUBLE) AS min__l_extendedprice,
        CAST(MAX(l_extendedprice) AS DOUBLE) AS max__l_extendedprice,
        COUNT(DISTINCT l_returnflag) AS distinct_count__l_returnflag,
        ${decAvgSql("length(l_returnflag)")} AS avg_length__l_returnflag,
        CAST(MIN(length(l_returnflag)) AS BIGINT) AS min_length__l_returnflag,
        CAST(MAX(length(l_returnflag)) AS BIGINT) AS max_length__l_returnflag,
        CAST(SUM(CASE WHEN l_returnflag = '' THEN 1 ELSE 0 END) AS BIGINT) AS empty_count__l_returnflag
      FROM lineitem""",
    "v_rowlevel_events" -> """
      SELECT COUNT(*) AS row_count,
        CAST(SUM(CASE WHEN event_id IS NULL AND ts IS NULL AND user_id IS NULL
             AND event_type IS NULL AND value IS NULL AND props IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS all_null_rows,
        CAST(SUM(CASE WHEN value = 'infinity'::DOUBLE OR value = '-infinity'::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS infinite_values,
        CAST(COUNT(*) - COUNT(value) AS DOUBLE) / COUNT(*) AS null_pct__value,
        CAST((SELECT COUNT(*) FROM events) - (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM events)) AS BIGINT) AS duplicate_rows
      FROM events""")
}
