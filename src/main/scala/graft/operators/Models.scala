package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's declared transformation models (SURVEY §2.6 T1–T3),
  * implemented as real DataFrame transformations. The dbt project in the
  * reference is empty (`dbt/.gitkeep`); semantics come from the pipeline
  * config (`config/pipelines/sample_pipeline.yaml:55-99`).
  */
object Models {

  /** T1 staging model: cleaned, conformed source table
    * (`sample_pipeline.yaml:56-77`, materialization: table).
    * Cleaning = trim/normalize strings, drop rows violating NOT NULL on
    * the business key (the reference's `data.dropna()` quarantine-lite,
    * `operators.py:94-100`). */
  def stagingOrders(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull)
      .select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        upper(trim(col("o_orderstatus"))).as("order_status"),
        col("o_totalprice").as("total_amount"),
        col("o_orderdate").as("order_date"),
        trim(col("o_orderpriority")).as("order_priority"))

  /** T1 staging model for customers (`sample_pipeline.yaml:56-66`). */
  def stagingCustomers(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey").isNotNull)
      .select(
        col("c_custkey").as("customer_id"),
        trim(col("c_name")).as("customer_name"),
        col("c_nationkey").as("nation_id"),
        col("c_acctbal").as("account_balance"),
        upper(trim(col("c_mktsegment"))).as("market_segment"))

  /** T2 conformed dimension with surrogate key
    * (`sample_pipeline.yaml:79-87`). The surrogate is a deterministic
    * dense rank over the natural key — NOT
    * `monotonically_increasing_id()`, which is partition-dependent and
    * would break reproducibility across cluster sizes. Computed via
    * [[Keys.globalRank]] (bucketed distributed ranking), identical to
    * `row_number() OVER (ORDER BY customer_id)` but without the
    * all-rows-to-one-partition window sort. */
  def dimCustomers(stagingCustomers: DataFrame): DataFrame =
    // smallBytes = 0: a conformed dimension can be 1e9 rows — always
    // take the distributed path so the tested plan IS the at-scale plan
    // (and bench/verify logs stay free of the single-partition-window
    // warning). The adaptive small-input window remains opt-in on
    // Keys.globalRank for genuinely bounded inputs.
    Keys.globalRank(stagingCustomers, "customer_id", "customer_key",
        smallBytes = 0L)
      .select(col("customer_key"), col("customer_id"), col("customer_name"),
        col("nation_id"), col("account_balance"), col("market_segment"))

  /** T3 incremental fact with MERGE on `order_id`
    * (`sample_pipeline.yaml:89-99`): upsert delta into base latest-wins
    * (see [[Merge.latestWins]]), then conform against dim_customers —
    * the declared dependency staging_orders + dim_customers ⇒ join.
    * The dim side broadcasts; the fact never shuffles for the join. */
  def factOrders(baseOrders: DataFrame, deltaOrders: DataFrame,
      dimCustomers: DataFrame): DataFrame = {
    val merged = Merge.latestWins(baseOrders, deltaOrders,
      Seq("order_id"), col("order_date"))
    merged.join(broadcast(dimCustomers.select("customer_key", "customer_id")),
        Seq("customer_id"))
      .select(col("order_id"), col("customer_key"), col("order_status"),
        col("total_amount"), col("order_date"))
  }

  /** Type-2 slowly-changing dimension from a change history: one row
    * per (key, change), `valid_from` = the change timestamp,
    * `valid_to` = the NEXT change's timestamp (null = current row,
    * `is_current` flag). Ties on the timestamp break on `seqCol`
    * (a log offset / id), exactly like
    * [[graft.operators.ChangeDetection.latestState]].
    *
    * Scale shape: ONE shuffle on the key and a per-key window — the
    * history never collects, and the window frame is (ts, seq)-ordered
    * lead(1), so state per key is one row. Point-in-time lookups
    * against the result are a range predicate
    * (`valid_from <= t AND (valid_to IS NULL OR t < valid_to)`), which
    * composes with [[graft.operators.RangeJoin]] for as-of enrichment
    * at scale. */
  def scd2(history: DataFrame, keys: Seq[String], tsCol: String,
      seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    history
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
