package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling: k-anonymity and l-diversity over a set of
  * quasi-identifier (QI) columns.
  *
  * [[graft.text.TextFunctions.redactPii]] removes the DIRECT
  * identifiers a document leaks; this module measures the
  * RE-IDENTIFICATION risk that survives redaction — the Sweeney
  * k-anonymity model: a record is k-anonymous when at least k records
  * share its full QI combination (its "equivalence class"), and a
  * class is l-diverse when its sensitive attribute takes at least l
  * distinct values (Machanavajjhala et al., l-diversity, TKDD 2007 —
  * a k-anonymous class with ONE sensitive value still discloses it).
  *
  * Scale: everything is one groupBy on the QI tuple (a single shuffle
  * whose key count is the number of equivalence classes — bounded by
  * the data's QI cardinality, not its row count) followed by
  * class-size aggregates small enough to re-aggregate in one partial
  * pass. No windows over raw rows, no driver materialization. At
  * 100 TB the QI groupBy is the same shape as any fact-table rollup —
  * AQE-splittable, map-side partial. */
object Privacy {

  /** Equivalence classes: one row per distinct QI combination with its
    * size and (optionally) distinct-sensitive-value count. */
  def equivalenceClasses(df: DataFrame, qi: Seq[Column],
      sensitive: Option[Column] = None): DataFrame = {
    val base = df.groupBy(qi: _*)
    sensitive match {
      case Some(s) => base.agg(count(lit(1)).as("class_size"),
        countDistinct(s).as("l_distinct"))
      case None => base.agg(count(lit(1)).as("class_size"))
    }
  }

  /** k-anonymity histogram: how many equivalence classes (and records)
    * exist at each class size — the curve an anonymization review
    * reads. One extra tiny aggregate over the class frame. */
  def kAnonymityHistogram(df: DataFrame, qi: Seq[Column]): DataFrame =
    equivalenceClasses(df, qi)
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        (count(lit(1)) * col("class_size")).as("n_records"))
      .select(col("class_size"), col("n_classes"),
        col("n_records").cast("long").as("n_records"))

  /** Single-row k-anonymity report: the dataset's k (minimum class
    * size), plus how many classes/records fall below the required k —
    * the pass/fail summary a quality gate consumes. */
  def kAnonymityReport(df: DataFrame, qi: Seq[Column], k: Int): DataFrame =
    equivalenceClasses(df, qi).agg(
      count(lit(1)).as("n_classes"),
      min(col("class_size")).as("dataset_k"),
      sum(when(col("class_size") < k, 1L).otherwise(0L))
        .as("classes_below_k"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("records_below_k"))
      .withColumn("required_k", lit(k))

  /** Single-row l-diversity report over a sensitive column: the
    * dataset's l (minimum distinct sensitive values per class) and the
    * classes below the required l. A class below l discloses its
    * members' sensitive value even when k-anonymous. */
  def lDiversityReport(df: DataFrame, qi: Seq[Column], sensitive: Column,
      l: Int): DataFrame =
    equivalenceClasses(df, qi, Some(sensitive)).agg(
      count(lit(1)).as("n_classes"),
      min(col("l_distinct")).as("dataset_l"),
      sum(when(col("l_distinct") < l, 1L).otherwise(0L))
        .as("classes_below_l"),
      sum(when(col("l_distinct") < l, col("class_size")).otherwise(0L))
        .as("records_below_l"))
      .withColumn("required_l", lit(l))
}
