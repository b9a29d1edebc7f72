package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => S}

/** Scale-safe per-group top-k: two-level aggregation instead of a global
  * window. A window `partitionBy(group) orderBy(score)` shuffles EVERY
  * candidate row into one partition per group — with few groups (typical
  * ANN: a handful of query vectors vs the whole corpus) that is a
  * catastrophic skew at 100 TB. Here each input partition first reduces to
  * its local top-k per group (map-side combine via collect_list+slice),
  * then only n_partitions·k tiny rows shuffle.
  */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String], orderCol: String,
            k: Int, payload: Seq[String]): DataFrame = {
    val item = struct((orderCol +: payload).map(col): _*)
    val localTop = df
      .groupBy((groupCols.map(col) :+ spark_partition_id().as("__pid")): _*)
      .agg(slice(reverse(array_sort(collect_list(item))), 1, k).as("top"))
    val merged = localTop
      .groupBy(groupCols.map(col): _*)
      .agg(slice(reverse(array_sort(flatten(collect_list(col("top"))))), 1, k)
        .as("top"))
    val exploded = merged.select(
      (groupCols.map(col) :+ posexplode(col("top"))): _*)
    exploded.select(
      (groupCols.map(col) :+ (col("pos") + 1).cast("long").as("rank")) ++
      (orderCol +: payload).map(f => col(s"col.$f").as(f)): _*)
  }
}

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * - `bruteForce`: exact top-k cosine — broadcast the (small) query set,
  *   one codegen'd pass over the corpus, two-level top-k reduce. This is
  *   the correct-baseline AND a legitimate scale path (100 TB corpus × few
  *   queries = embarrassingly parallel scan).
  * - `lshTopK`: random-hyperplane (sign-LSH) bucketed search — queries
  *   only compare against corpus vectors sharing a bucket; recall trades
  *   against `tables`/`planesPerTable` as usual for sign-LSH.
  */
object SimilaritySearch {

  /** Deterministic pseudo-random hyperplanes: component j of plane p in
    * table t = a hash-derived value in [-1,1). No RNG state, reproducible
    * across runs/cluster sizes (content-addressed, like everything else).
    */
  private def planeComponent(t: Int, p: Int, j: Column): Column =
    (pmod(xxhash64(lit(t), lit(p), j), lit(2000001L)).cast("double") / 1000000.0) - 1.0

  private def signBits(v: Column, table: Int, planes: Int, dim: Int): Column = {
    // bit p = sign of dot(v, plane_p)
    (0 until planes).map { p =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, j) => x * planeComponent(table, p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, 1L << p).otherwise(0L)
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  def bruteForce(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", S.l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", S.l2Norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        (S.dot(col("cv"), col("qv")) / (col("cn") * col("qn"))).as("cosine"))
    TopKPerGroup(scored, Seq("qid"), "cosine", k, Seq("nid"))
  }

  /** Sign-LSH bucketed ANN: corpus hashed once per table; each query only
    * scans matching buckets. Returns top-k per query among candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int,
              tables: Int = 8, planes: Int = 12): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) = {
      val v = df.select(col(id), col(vec).cast("array<double>").as("v"))
      (0 until tables).map { t =>
        v.select(col(id), col("v"), lit(t).as("tbl"),
          signBits(col("v"), t, planes, dim).as("bucket"))
      }.reduce(_ unionByName _)
    }
    val c = bucketed(corpus, idCol, vecCol)
      .select(col(idCol).as("nid"), col("v").as("cv"), col("tbl"), col("bucket"))
    val q = bucketed(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("v").as("qv"), col("tbl"), col("bucket"))
    val cands = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
    val scored = cands.select(col("qid"), col("nid"),
      (S.dot(col("cv"), col("qv")) / (S.l2Norm(col("cv")) * S.l2Norm(col("qv"))))
        .as("cosine"))
    TopKPerGroup(scored, Seq("qid"), "cosine", k, Seq("nid"))
  }
}
