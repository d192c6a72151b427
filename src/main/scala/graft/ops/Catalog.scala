package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Typed access to the ten source tables of one scale-factor directory —
  * the root of the E2 (DataFrame builder) entry point (SURVEY.md §3).
  * Tables are plain DataFrames; the logical plan IS the IR, so every
  * operator module composes Catalyst plans that the optimizer can push
  * into (predicate pushdown, column pruning, join selection).
  */
final class Catalog(val spark: SparkSession, val dir: String) {
  private def t(name: String): DataFrame = Tables.load(spark, dir, name)

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = t("events")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Catalog {
  def apply(spark: SparkSession, dir: String): Catalog = new Catalog(spark, dir)
}
