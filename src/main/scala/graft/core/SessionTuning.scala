package graft.core

import org.apache.spark.sql.SparkSession

/** Engine-wide SparkSession tuning shared by every entry point (Bench,
  * Verify, ScaleCheck, Shell, tests). Centralized so a measured fix lands
  * everywhere at once.
  */
object SessionTuning {

  /** HotSpot refuses to JIT-compile any method over 8000 bytecodes
    * (-XX:DontCompileHugeMethods, on by default) — it runs INTERPRETED
    * forever. Spark's whole-stage codegen only abandons a generated
    * method above spark.sql.codegen.hugeMethodLimit, whose default
    * (65535) is far past the JIT cliff: a wide projection of parse/regex
    * expressions (e.g. a 9-column dataset_type pass) lands in the
    * 8k-64k gap and runs 2-3x slower than the non-codegen fallback.
    * Measured on op_type_fuzz at sf0.1 (graft.tools.ProfileFuzz):
    * 40.4s with the default, 9.3s with the limit at 8000 (Spark falls
    * back to per-operator eval, which JITs fine). Aligning the limit
    * with the JIT's is the documented production remedy (SPARK-21871
    * discussion). Note: keeping Filter and Project as separate codegen
    * nodes is part of the win — fusing the parse expressions into one
    * wide Project (to let CSE dedupe the double evaluation) measured
    * 13.6s vs 9.3s under this limit, because the fused method is the
    * thing that breaches the limit.
    */
  val HugeMethodLimit = 8000

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.codegen.hugeMethodLimit", HugeMethodLimit.toString)
      // Prefer shuffled-hash over sort-merge when the planner's size
      // conditions say a per-partition hash table fits (guide §3.1/§9):
      // SMJ sorts BOTH sides; for the repo's id/metadata-sized joins the
      // sort is pure overhead. Scale-safe by construction: the planner
      // only picks SHJ under its canBuildLocalHashMap bound, and AQE's
      // runtime conversion (threshold below) is per-partition-size gated
      // — an over-threshold side falls back to SMJ exactly as before.
      // (Experiment r20: SMJ sites surviving AQE at sf0.1 — dd_inc_lines,
      // dd_line_dedup, pl_nb_*, rt_eval_* — measured at-or-faster under
      // SHJ with identical results; 170/170 oracle green.)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // AQE runtime SMJ→SHJ rewrite: convert when every post-shuffle
      // partition of the build side is under 64 MB (default 0 = off).
      // Local partitions are far smaller; at production partition sizing
      // (guide §2.2, 100 MB-1 GB advisory) this converts only genuinely
      // hashable builds.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        (64L * 1024 * 1024).toString)
}
