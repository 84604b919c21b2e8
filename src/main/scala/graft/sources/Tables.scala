package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the ten analytics tables.
  *
  * All reads go through a per-name loader so Catalyst keeps full
  * pushdown/pruning ability: a downstream `.select`/`.filter` reaches the
  * scan as `ReadSchema`/`PushedFilters`. Never cache here — at 100 TB the
  * scan must stream, and column pruning is worth more than a hot cache.
  * The default loader is the driver's parquet layout; `TableFormats`
  * builds Tables over CSV/JSON directories with the same schemas.
  */
final class Tables(load: String => DataFrame) {
  private def t(name: String): DataFrame = load(name)

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables =
    new Tables(name => spark.read.parquet(s"$dir/$name.parquet"))

  def fromLoader(load: String => DataFrame): Tables = new Tables(load)
}
