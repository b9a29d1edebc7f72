package graft.queries

import graft.expr.Log2Fp
import graft.ops.ModelFilter

/** Generated DuckDB oracle SQL for the model-filter family
  * (ops/ModelFilter.scala): Naive Bayes, stupid-backoff LM, DSIR weights.
  *
  * The family was built integer-exact on purpose: every probability is a
  * ratio of counts, every log is [[graft.expr.Log2Fp]]'s shift-and-square
  * fixed-point log2 — replayed here as a `list_reduce` fold over the SAME
  * integer recurrence, so the driver's hash compare is exact. `ln()` on
  * two engines is NOT (libm last-ulp differences), which is why no oracle
  * in this file touches a floating log.
  */
object ModelOracle {

  /** The [[graft.expr.Log2Fp]] recurrence as a DuckDB scalar fragment over
    * expression `x` (inlined textually — keep `x` a simple column/paren
    * expression). bin(x) gives the minimal binary string, so
    * length(bin(x))-1 is floor(log2 x) exactly; the fold runs the
    * identical 20 shift-and-square steps on a 31-bit mantissa.
    *
    * Formulation notes, all load-bearing on DuckDB 1.0:
    *  - the (y, r) state is PACKED into one BIGINT (y<<21 | r; r stays
    *    < 2^20 after 20 emitted bits) instead of a STRUCT accumulator —
    *    struct-accumulator lambdas inside inlined CTEs were observed to
    *    produce corrupt folds (an impossible 2^31.8 mantissa → INT64
    *    overflow in the DSIR oracle; silently WRONG NB scores elsewhere),
    *    while the same fold over a packed BIGINT replays exactly;
    *  - the 20 dummy fold elements are a LITERAL list, not a
    *    `[.. for i in range(20)]` comprehension, for the same reason;
    *  - the `& 2147483647` mantissa mask before each squaring is an
    *    IDENTITY for every reachable state (the recurrence keeps
    *    y < 2^31 by construction, same invariant as the Scala loop) but
    *    makes the fragment total if an engine ever evaluates it
    *    speculatively against garbage.
    * Verified 0 mismatches vs the Scala reference over random 63-bit
    * inputs, standalone AND composed inside all three family oracles.
    */
  def log2fp(x: String): String = {
    val y = "(acc >> 21)"
    val p = s"((($y & 2147483647)*($y & 2147483647)) >> 30)"
    val r = "(acc & 2097151)"
    val zeros = Seq.fill(Log2Fp.F)("0::BIGINT").mkString("[", ", ", "]")
    s"""(CASE WHEN ($x) <= 0 THEN NULL ELSE
       |  ((length(bin($x))-1)::BIGINT << ${Log2Fp.F}) |
       |  (list_reduce(
       |    [(CASE WHEN length(bin($x))-1 >= 30 THEN ($x) >> (length(bin($x))-31)
       |        ELSE ($x) << (31-length(bin($x))) END) << 21]
       |      || $zeros,
       |    (acc, e) -> CASE WHEN $p >= 2147483648
       |      THEN ((($p >> 1) << 21) | (($r << 1) | 1))
       |      ELSE (($p << 21) | ($r << 1)) END
       |  ) & 2097151)
       |END)""".stripMargin
  }

  private val H = "('0x'||substr(md5(%s),1,15))::BIGINT"
  private def h(x: String): String = H.format(x)

  /** documents → (doc_id, lang, ts) with the repo-standard normalization
    * (lower, whitespace-collapse, empty-token removal) — must stay
    * byte-identical to TextFunctions.tokens(normalized(text)).
    */
  private val Toks =
    raw"""n AS (SELECT doc_id, lang,
         [t for t in string_split(lower(trim(regexp_replace(text,'\s+',' '))),' ') if t <> ''] ts
         FROM documents)"""

  /** Multinomial NB on `lang`, train = doc_id % mod = 0, add-one
    * smoothing, exactly ModelFilter.naiveBayes's fixed-point algebra.
    */
  def naiveBayes(mod: Int): String = {
    raw"""WITH $Toks,
         tr AS (SELECT * FROM n WHERE doc_id % $mod = 0),
         sc AS (SELECT * FROM n WHERE doc_id % $mod != 0),
         trtok AS (SELECT lang lbl, ${h("t")} h FROM tr, LATERAL unnest(ts) AS u(t)),
         cnt AS (SELECT lbl, h, count(*) c FROM trtok GROUP BY 1, 2),
         dv AS (SELECT (SELECT count(*) FROM tr) d, (SELECT count(DISTINCT h) FROM trtok) v),
         cls AS (SELECT lang lbl, count(*) p FROM tr GROUP BY 1),
         tot AS (SELECT lbl, count(*) t FROM trtok GROUP BY 1),
         classes AS (SELECT cls.lbl,
             ${log2fp("p")} - ${log2fp("d")} prior_fp,
             ${log2fp("(t + v)")} denom_fp
           FROM cls JOIN tot USING (lbl) CROSS JOIN dv),
         pos AS (SELECT doc_id, ${h("t")} h FROM sc, LATERAL unnest(ts) AS u(t)),
         hits AS (SELECT doc_id, lbl, sum(${log2fp("(c + 1)")}) hit
           FROM pos JOIN cnt USING (h) GROUP BY 1, 2),
         base AS (SELECT s.doc_id, s.lang actual, len(s.ts)::BIGINT np,
             c.lbl, c.prior_fp, c.denom_fp
           FROM sc s CROSS JOIN classes c),
         scored AS (SELECT doc_id, actual, lbl,
             (prior_fp - np*denom_fp + coalesce(hit, 0))::BIGINT score_fp
           FROM base LEFT JOIN hits USING (doc_id, lbl))
         SELECT doc_id, lbl AS pred_lang, score_fp, actual AS lang,
           (lbl = actual) AS correct
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score_fp DESC, lbl ASC) rn FROM scored) z
         WHERE rn = 1"""
  }

  /** Stupid-backoff trigram LM, train = doc_id % mod = 0 — replays
    * ModelFilter.stupidBackoff: same 60-bit space-joined n-gram hashes,
    * same level selection (num AND den both present), same fixed-point
    * alpha = log2fp(4)-log2fp(10).
    */
  def stupidBackoff(mod: Int): String = {
    val alpha = ModelFilter.AlphaFp
    raw"""WITH $Toks,
         tr AS (SELECT ts FROM n WHERE doc_id % $mod = 0),
         sc AS (SELECT doc_id, ts FROM n WHERE doc_id % $mod != 0),
         uni AS (SELECT h, count(*) c FROM (SELECT ${h("t")} h
           FROM tr, LATERAL unnest(ts) AS u(t)) GROUP BY 1),
         bi AS (SELECT h, count(*) c FROM (SELECT ${h("array_to_string(ts[i+1:i+2],' ')")} h
           FROM tr, LATERAL unnest(range(greatest(len(ts)-1, 0))) AS u(i)) GROUP BY 1),
         tri AS (SELECT h, count(*) c FROM (SELECT ${h("array_to_string(ts[i+1:i+3],' ')")} h
           FROM tr, LATERAL unnest(range(greatest(len(ts)-2, 0))) AS u(i)) GROUP BY 1),
         ntok AS (SELECT coalesce(sum(len(ts)), 0)::BIGINT nn FROM tr),
         pos AS (SELECT doc_id, i AS pos,
             ${h("ts[i+1]")} h1,
             CASE WHEN i >= 1 THEN ${h("array_to_string(ts[i:i+1],' ')")} END h2,
             CASE WHEN i >= 2 THEN ${h("array_to_string(ts[i-1:i+1],' ')")} END h3,
             CASE WHEN i >= 1 THEN ${h("ts[i]")} END hc1,
             CASE WHEN i >= 2 THEN ${h("array_to_string(ts[i-1:i],' ')")} END hc2
           FROM sc, LATERAL unnest(range(len(ts))) AS u(i)),
         j AS (SELECT p.doc_id, p.pos, t3.c c3, b2.c c2, bc.c c2ctx,
             u1.c c1, uc.c c1ctx, (SELECT nn FROM ntok) nn,
             least(p.pos + 1, 3) mo
           FROM pos p
           LEFT JOIN tri t3 ON p.h3 = t3.h
           LEFT JOIN bi b2 ON p.h2 = b2.h
           LEFT JOIN bi bc ON p.hc2 = bc.h
           LEFT JOIN uni u1 ON p.h1 = u1.h
           LEFT JOIN uni uc ON p.hc1 = uc.h),
         lv AS (SELECT doc_id, pos, mo,
             CASE WHEN c3 IS NOT NULL AND c2ctx IS NOT NULL THEN 3
                  WHEN c2 IS NOT NULL AND c1ctx IS NOT NULL THEN 2
                  WHEN c1 IS NOT NULL THEN 1 ELSE 0 END lvl,
             CASE WHEN c3 IS NOT NULL AND c2ctx IS NOT NULL THEN c3
                  WHEN c2 IS NOT NULL AND c1ctx IS NOT NULL THEN c2
                  ELSE c1 END num,
             CASE WHEN c3 IS NOT NULL AND c2ctx IS NOT NULL THEN c2ctx
                  WHEN c2 IS NOT NULL AND c1ctx IS NOT NULL THEN c1ctx
                  ELSE nn END den
           FROM j),
         s AS (SELECT doc_id, lvl,
             CASE WHEN lvl > 0 THEN
               ${log2fp("num")} - ${log2fp("den")} + (mo - lvl)*($alpha) END s_fp
           FROM lv),
         agg AS (SELECT doc_id, count(*) nt,
             count(*) FILTER (lvl = 0) oov,
             count(*) FILTER (lvl = 3) l3,
             count(*) FILTER (lvl = 2) l2,
             count(*) FILTER (lvl = 1) l1,
             coalesce(sum(s_fp) FILTER (lvl > 0), 0) ls
           FROM s GROUP BY 1)
         SELECT sc.doc_id,
           coalesce(nt, 0) AS n_tokens, coalesce(oov, 0) AS n_oov,
           coalesce(l3, 0) AS n_tri, coalesce(l2, 0) AS n_bi,
           coalesce(l1, 0) AS n_uni, coalesce(ls, 0)::BIGINT AS logscore_fp
         FROM sc LEFT JOIN agg USING (doc_id)"""
  }

  /** DSIR importance weights + deterministic top-k — replays
    * ModelFilter.dsirSelect with target = lang = '<target>'.
    */
  def dsir(targetLang: String, buckets: Int, k: Int): String = {
    raw"""WITH $Toks,
         f AS (SELECT doc_id, tgt, h % $buckets bkt FROM (
             SELECT doc_id, lang = '$targetLang' tgt, ${h("t")} h
               FROM n, LATERAL unnest(ts) AS u(t)
             UNION ALL
             SELECT doc_id, lang = '$targetLang' tgt,
                 ${h("array_to_string(ts[i+1:i+2],' ')")} h
               FROM n, LATERAL unnest(range(greatest(len(ts)-1, 0))) AS u(i)) z),
         ct AS (SELECT bkt, count(*) ct FROM f WHERE tgt GROUP BY 1),
         cr AS (SELECT bkt, count(*) cr FROM f GROUP BY 1),
         tot AS (SELECT count(*) FILTER (tgt) tt, count(*) tr FROM f),
         model AS (SELECT cr.bkt,
             ${log2fp("(coalesce(ct, 0) + 1)")} - ${log2fp("(cr + 1)")} delta
           FROM cr LEFT JOIN ct USING (bkt)),
         konst AS (SELECT ${log2fp(s"(tr + $buckets)")} - ${log2fp(s"(tt + $buckets)")} kk FROM tot),
         docb AS (SELECT doc_id, bkt, count(*) nb FROM f WHERE NOT tgt GROUP BY 1, 2),
         w AS (SELECT doc_id, sum(nb) n_feats, sum(nb*delta) ds
           FROM docb JOIN model USING (bkt) GROUP BY 1),
         sel AS (SELECT doc_id, n_feats::BIGINT n_feats,
             (ds + n_feats*(SELECT kk FROM konst))::BIGINT weight_fp FROM w)
         SELECT "rank", doc_id, n_feats, weight_fp FROM (
           SELECT *, row_number() OVER (ORDER BY weight_fp DESC, doc_id ASC) "rank"
           FROM sel) z
         WHERE "rank" <= $k"""
  }
}
