package graft.core

import org.apache.spark.sql.DataFrame

/** The honest benchmark action. `df.count()` is NOT one: Catalyst prunes
  * every column a count does not need (so a projection of expensive
  * scalar expressions times as a bare scan) and eliminates left joins
  * whose right side is unique on the join key (so a score-and-reattach
  * plan, or PageRank's per-iteration rank update, times as the LEFT
  * INPUT's count — measured r12: the full 5-iteration PageRank collapsed
  * to a constant ~7 stages under count() regardless of iteration count).
  * A noop-sink write materializes every output row and column through
  * the real plan while writing nothing — what a consumer actually pays.
  */
object Materialize {
  def full(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
