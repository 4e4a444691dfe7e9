package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SQL-expressible statistics — the oracle-checked face of the reference's
  * correlation surface (Dataset.py:883-885 uses ml.stat.Correlation; the
  * full-matrix form lives in graft.ml as q44). `corr` is a single-pass
  * co-moment aggregate: partial states merge associatively, so it scales
  * like any hash aggregate.
  */
object Stats extends QueryModule {

  /** q33 — Pearson correlation over lineitem numeric pairs, rounded to 4dp
    * (Spark and DuckDB co-moment accumulation differ at ~1e-12).
    */
  val corrPairs: Q = (s, d) =>
    Tables.lineitem(s, d).agg(
      round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
      round(corr("l_extendedprice", "l_discount"), 4).as("corr_price_disc"),
      round(corr("l_quantity", "l_tax"), 4).as("corr_qty_tax"))

  def queries: Map[String, Q] = Map("q33_corr_pairs" -> corrPairs)

  def oracles: Map[String, String] = Map(
    "q33_corr_pairs" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
        | round(corr(l_quantity, l_tax), 4) AS corr_qty_tax
        |FROM lineitem""".stripMargin)
}
