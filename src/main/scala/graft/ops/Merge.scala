package graft.ops

import org.apache.spark.sql.DataFrame

/** Cross-platform merge + dedup (the reference's PLATFORM-Merge stage).
  *
  * The reference unions positionally (`df.union`, PLATFORM-Merge.py:56),
  * silently depending on column order surviving upstream renames — a latent
  * bug SURVEY.md §1.3 flags. We union by name, allowing missing columns
  * (null-filled), and document the deviation as a correctness fix.
  */
object Merge {

  /** U1 — union by column name across N platform tables. */
  def unionPlatforms(dfs: DataFrame*): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** U3 — dedup by key, the distributed form of the reference's
    * dict-keyed-by-id ingestion (reference: REDDIT-Ingestion.py:102,116,124).
    * At scale this is one shuffle on the key columns.
    */
  def dedupByKey(keys: String*)(df: DataFrame): DataFrame =
    df.dropDuplicates(keys)
}
