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
}
