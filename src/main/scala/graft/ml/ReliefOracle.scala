package graft.ml

/** DuckDB recomputation oracles for the RELIEF surface.
  *
  * Round 7's verdict flagged the relief oracles as the weakest rows in
  * the correctness matrix: frozen expected VALUES replayed from this
  * implementation's own sf0.01 output — able to catch a regression,
  * unable to catch an always-been-wrong weight. These generators
  * replace them with a full INDEPENDENT reimplementation of the fit in
  * DuckDB SQL: deterministic splitmix64 sampling and batch assignment
  * (64-bit arithmetic emulated with HUGEINT split multiplies), exact
  * per-class kNN, hit/miss relevance accumulation with prior
  * weighting, collision marginals/joints under the hash-derived
  * threshold, the MI-like redundancy matrix, and the 10-step greedy
  * relevance-vs-redundancy selection — every stage recomputed from the
  * raw parquet with no value copied from the Scala fit.
  *
  * Validated against `tools/relief_reference.py`, a second independent
  * (Python) reimplementation: all three implementations agree exactly
  * on both selections and on every weight at 6-decimal precision.
  *
  * This checks the `instanceIdCol = vec_id` fit: with user-supplied
  * ids, the sampling/batch/threshold hashes run over small longs an
  * external engine can reproduce. The content-hash identity path
  * (hashes over IEEE-754 bits of the whole vector) stays pinned by
  * frozen values under `relief_weights_content`.
  *
  * Every CTE is MATERIALIZED: the greedy stages reference their
  * predecessor several times, and without materialization DuckDB's
  * inlining re-plans the whole upstream pipeline per reference —
  * exponential planning blowup (observed: >5 min; materialized: 0.7 s).
  */
object ReliefOracle {
  private val P64 = BigInt("18446744073709551616") // 2^64
  private val P32 = 4294967296L
  private val C1 = BigInt("11400714819323198485") // 0x9e3779b97f4a7c15
  private val C2 = BigInt("13787848793156543929") // 0xbf58476d1ce4e5b9
  private val C3 = BigInt("10723151780598845931") // 0x94d049bb133111eb
  private val Seed = 20260812L
  private val Seed2 = Seed + 0x51ed2701L // seed for the batch-assignment hash
  private val P51 = 1L << 51 // sample gate: (u >> 11) < 2^51 ⇔ u/2^53 < 0.25

  /** (a * c) mod 2^64 for a HUGEINT expr in [0, 2^64), c a 64-bit
    * constant — 32-bit split so every partial fits in HUGEINT.
    */
  private def mulc(a: String, c: BigInt): String = {
    val blo = c % P32; val bhi = c / P32
    s"((($a) % $P32) * $blo + (((($a) // $P32) * $blo + (($a) % $P32) * $bhi) % $P32) * $P32) % $P64"
  }

  /** a XOR (a >> s) for a HUGEINT expr in [0, 2^64). */
  private def xsh(a: String, s: Int): String =
    s"xor(($a)::UBIGINT, ($a)::UBIGINT >> $s)::HUGEINT"

  /** splitmix64 finalizer stages (everything after the initial add). */
  private def mix64Tail(z0: String): String =
    xsh(mulc(xsh(mulc(xsh(z0, 30), C2), 27), C3), 31)

  /** Full mix64 of a small-integer expr. */
  private def mix64(x: String): String =
    mix64Tail(s"(($x)::HUGEINT + $C1) % $P64")

  /** pairRand(seed, qid, rid) ∈ [0,1): the collision-threshold hash.
    * The id·constant products go through the split multiply ([[mulc]])
    * — content-hash ids span the full 64 bits, and a direct HUGEINT
    * multiply of two ~2⁶⁴ operands overflows INT128.
    */
  private def pairRand(qid: String, rid: String): String = {
    val z0 = s"xor(xor($Seed::UBIGINT, (${mulc(s"($qid)::HUGEINT", C1)})::UBIGINT), " +
      s"(${mulc(s"($rid)::HUGEINT", C2)})::UBIGINT)::HUGEINT"
    s"(((${mix64Tail(z0)})::UBIGINT >> 11)::DOUBLE / 9007199254740992)"
  }

  /** IEEE-754 binary64 bit pattern of a DOUBLE expr as UBIGINT —
    * java.lang.Double.doubleToLongBits in SQL, exact for every value
    * the corpus can hold (normals and ±0; floats widened to double
    * have ≥ 2^-126 magnitude, far above the subnormal range). The
    * exponent comes from floor(log2) CORRECTED by one step in each
    * direction (log2 is inexact at powers of two; a/2^e ∈ [1,2) is the
    * exact acceptance test, and power-of-two scaling of a double is
    * exact), and the mantissa (m−1)·2^52 is integral by construction
    * of binary64, so the final CAST truncates nothing.
    */
  private def dbits(x: String): String = {
    val a = s"abs($x)"
    val e0 = s"CAST(floor(log2($a)) AS INTEGER)"
    val ec = s"(CASE WHEN $a / power(2.0, $e0) >= 2.0 THEN ($e0) + 1 " +
      s"WHEN $a / power(2.0, $e0) < 1.0 THEN ($e0) - 1 ELSE $e0 END)"
    s"(CASE WHEN $x = 0 THEN (CASE WHEN signbit($x) " +
      s"THEN 9223372036854775808::UBIGINT ELSE 0::UBIGINT END) ELSE " +
      s"((CASE WHEN $x < 0 THEN 9223372036854775808::HUGEINT ELSE 0::HUGEINT END) " +
      s"+ (($ec + 1023)::HUGEINT * 4503599627370496::HUGEINT) " +
      s"+ CAST(($a / power(2.0, $ec) - 1.0) * 4503599627370496.0 AS HUGEINT))::UBIGINT END)"
  }

  /** ReliefFRSelector.contentHash in SQL: h = mix64(bits(label));
    * for each vector value, h = mix64(h XOR bits(v[i])) — a
    * list_reduce with the splitmix64 emulation as the lambda body.
    */
  private def contentHashSql: String =
    s"""list_reduce(
       |  list_prepend((${mix64(dbits("lbl"))})::UBIGINT,
       |    list_transform(v, x -> ${dbits("x")})),
       |  (h, b) -> (${mix64("xor(h, b)")})::UBIGINT)""".stripMargin

  /** Shared pipeline: sample → per-class kNN → relevance → normalized
    * weights (`nw`), plus the redundancy stages (`red`) and the std
    * ranking (`std`). Ends with a trailing comma so callers append
    * their own final CTEs/SELECT.
    */
  private def coreCtes: String = coreCtesFor(
    "SELECT vec_id AS id, label::DOUBLE AS lbl, embedding::DOUBLE[] AS v FROM embeddings",
    "nid")

  /** [[coreCtes]] with the row-identity source and the kNN tie-break
    * key pluggable: the vec_id path ties on the small positive id
    * directly; the content path's ids are full-range 64-bit hashes the
    * Scala TopK compares as SIGNED longs, so its UBIGINT tie key flips
    * the sign bit (unsigned order of id XOR 2⁶³ = signed order of id).
    */
  private def coreCtesFor(eSelect: String, tieKey: String): String = s"""
WITH e AS MATERIALIZED ($eSelect),
pri AS (SELECT lbl, count(*)::DOUBLE / (SELECT count(*) FROM e) AS prior
        FROM e GROUP BY 1),
ncls AS MATERIALIZED (SELECT count(DISTINCT lbl)::INTEGER AS nc FROM e),
cls AS (SELECT lbl, (row_number() OVER (ORDER BY lbl) - 1)::INTEGER AS cidx
        FROM (SELECT DISTINCT lbl FROM e)),
q AS (SELECT *, (${mix64(s"xor(${Seed2}::UBIGINT, id::UBIGINT)")})::UBIGINT % 2 AS batch
      FROM e
      WHERE ((${mix64(s"xor(${Seed}::UBIGINT, id::UBIGINT)")})::UBIGINT >> 11) < $P51),
dst AS MATERIALIZED (
  -- SLIM pair frame: distance computed once, both 64-double vectors
  -- dropped before anything heavy (expressed inline, the optimizer
  -- carried the vectors into the q×n frame — ~100 GB at 10× data);
  -- vectors join back below for the ≤ |q|·3·|classes| survivors only
  SELECT batch, qid, qlbl, nid, nlbl, dist, $tieKey AS tk
  FROM (SELECT q.batch, q.id AS qid, q.lbl AS qlbl,
               e.id AS nid, e.lbl AS nlbl,
               list_distance(q.v, e.v) AS dist
        FROM q JOIN e ON e.id <> q.id) s),
-- per-(query, class) top-3 via three chained grouped MIN over the
-- lexicographic (dist, tie, id) struct — the Scala TopK heap's SQL
-- equivalent. The round-8 shape (row_number window over the q×n
-- frame) SORTED all ~100M pairs at 10× data: DuckDB's external sort
-- spilled 70 GB+ of temp and died on disk. Grouped aggregates keep
-- one struct per (qid, nlbl) of state; k2/k3 rescan the materialized
-- slim frame instead of re-deriving distances. Groups with < 3
-- neighbors of a class naturally stop early (k2/k3 emit no row).
k1 AS MATERIALIZED (
  SELECT batch, qid, qlbl, nlbl, min({'d': dist, 't': tk, 'n': nid}) AS s
  FROM dst GROUP BY 1, 2, 3, 4),
k2 AS MATERIALIZED (
  SELECT d.batch, d.qid, d.qlbl, d.nlbl, min({'d': d.dist, 't': d.tk, 'n': d.nid}) AS s
  FROM dst d JOIN k1 ON k1.qid = d.qid AND k1.nlbl = d.nlbl
  WHERE (d.dist, d.tk) > ((k1.s).d, (k1.s).t)
  GROUP BY 1, 2, 3, 4),
k3 AS MATERIALIZED (
  SELECT d.batch, d.qid, d.qlbl, d.nlbl, min({'d': d.dist, 't': d.tk, 'n': d.nid}) AS s
  FROM dst d JOIN k2 ON k2.qid = d.qid AND k2.nlbl = d.nlbl
  WHERE (d.dist, d.tk) > ((k2.s).d, (k2.s).t)
  GROUP BY 1, 2, 3, 4),
cand AS (
  SELECT batch, qid, qlbl, (s).n AS nid, nlbl, 1 AS rn FROM k1
  UNION ALL SELECT batch, qid, qlbl, (s).n, nlbl, 2 FROM k2
  UNION ALL SELECT batch, qid, qlbl, (s).n, nlbl, 3 FROM k3),
pairs AS MATERIALIZED (
  SELECT batch, qid, qlbl, eq.v AS qv, nid, nlbl, en.v AS nv,
         c.cidx + CASE WHEN nlbl = qlbl THEN 0 ELSE (SELECT nc FROM ncls) END AS g,
         6.0 * (1.0 - (0.8 + ${pairRand("cand.qid", "cand.nid")} * 0.8)) AS thr
  FROM cand JOIN cls c ON c.lbl = cand.nlbl
       JOIN e eq ON eq.id = cand.qid
       JOIN e en ON en.id = cand.nid
  WHERE rn <= 3),
cc AS (SELECT batch, g, count(*)::DOUBLE AS n FROM pairs GROUP BY 1, 2),
feat AS MATERIALIZED (
  SELECT batch, qid, nid, g, thr, f - 1 AS feature,
         abs(qv[f] - nv[f]) AS diff
  FROM pairs, unnest(range(1, len(qv) + 1)) AS u(f)),
rel AS (SELECT batch, g, feature, sum(diff) AS r
        FROM feat GROUP BY 1, 2, 3),
wbb AS (
  SELECT rel.batch, rel.feature,
         sum(CASE WHEN rel.g < (SELECT nc FROM ncls) THEN -1.0 ELSE 1.0 END
             * p.prior * rel.r / cc.n) AS w
  FROM rel
  JOIN cc ON cc.batch = rel.batch AND cc.g = rel.g
  JOIN cls cg ON cg.cidx = rel.g % (SELECT nc FROM ncls)
  JOIN pri p ON p.lbl = cg.lbl
  GROUP BY 1, 2),
wtot AS (SELECT feature, sum(w) AS w FROM wbb GROUP BY 1),
nw AS MATERIALIZED (SELECT feature, (w - min(w) OVER ()) /
         (CASE WHEN max(w) OVER () > min(w) OVER ()
               THEN max(w) OVER () - min(w) OVER () ELSE 1.0 END) AS w
       FROM wtot),
top1 AS (SELECT feature FROM wbb WHERE batch = 0
         ORDER BY w DESC, feature LIMIT 30),
coll AS MATERIALIZED (
  SELECT batch, qid, nid, feature, 1.0 - least(6.0, diff) / 6.0 AS vote
  FROM feat WHERE diff <= thr),
marg AS (SELECT feature, sum(vote) AS m FROM coll GROUP BY 1),
ti AS (SELECT count(*)::DOUBLE AS n FROM pairs),
joint AS (
  SELECT least(a.feature, b.feature) AS i, greatest(a.feature, b.feature) AS j,
         sum((a.vote + b.vote) / 2.0) AS jm
  FROM coll a JOIN coll b
    ON b.batch = a.batch AND b.qid = a.qid AND b.nid = a.nid
   AND b.feature <> a.feature
  WHERE a.batch = 1 AND a.feature IN (SELECT feature FROM top1)
  GROUP BY 1, 2),
redraw AS (
  SELECT i, j,
    CASE WHEN isfinite(t.r) THEN t.r ELSE 0.0 END AS r
  FROM (
    SELECT i, j,
      (jm / ((SELECT n FROM ti) * 0.875))
        * ln((jm / ((SELECT n FROM ti) * 0.875)) /
             ((ma.m / (SELECT n FROM ti)) * (mb.m / (SELECT n FROM ti)))) / ln(2)
        AS r
    FROM joint JOIN marg ma ON ma.feature = joint.i
               JOIN marg mb ON mb.feature = joint.j) t),
red AS MATERIALIZED (
  SELECT i, j, (r - min(r) OVER ()) /
    (CASE WHEN max(r) OVER () > min(r) OVER ()
          THEN max(r) OVER () - min(r) OVER () ELSE 1.0 END) AS rn
  FROM redraw),
std AS (SELECT (row_number() OVER (ORDER BY w DESC, feature))::INTEGER AS rank,
               feature::INTEGER AS f
        FROM nw QUALIFY rank <= 10),
"""

  /** 10-step greedy relevance-vs-redundancy selection, unrolled: step t
    * accumulates redundancy(prev pick, f) into each survivor and picks
    * argmax of w − racc/(t−1), ties to the smaller feature.
    */
  private def greedyCtes: String = {
    val parts = scala.collection.mutable.ArrayBuffer(
      "p1 AS MATERIALIZED (SELECT feature AS f, w, 0.0 AS racc FROM nw)",
      "g1 AS MATERIALIZED (SELECT f FROM p1 ORDER BY w DESC, f LIMIT 1)")
    for (t <- 2 to 10) {
      val prev = t - 1
      parts += s"p$t AS MATERIALIZED (SELECT p.f, p.w, p.racc + coalesce(r.rn, 0.0) AS racc " +
        s"FROM p$prev p LEFT JOIN red r " +
        s"ON r.i = least(p.f, (SELECT f FROM g$prev)) " +
        s"AND r.j = greatest(p.f, (SELECT f FROM g$prev)) " +
        s"WHERE p.f <> (SELECT f FROM g$prev))"
      parts += s"g$t AS MATERIALIZED (SELECT f FROM p$t " +
        s"ORDER BY (w - racc / $prev.0) DESC, f LIMIT 1)"
    }
    val sel = (1 to 10)
      .map(t => s"SELECT $t AS rank, (SELECT f FROM g$t)::INTEGER AS f")
      .mkString(" UNION ALL ")
    parts += s"redsel AS ($sel)"
    parts.mkString(",\n")
  }

  /** relief_weights: normalized weights, 6-decimal rounded. */
  def weightsSql: String = coreCtes +
    "fin AS (SELECT feature::INTEGER AS feature, round(w, 6) AS weight FROM nw)\n" +
    "SELECT feature, weight FROM fin ORDER BY feature"

  /** relief_weights_content: the SAME fit recomputed under CONTENT
    * identity — id = contentHash(label, vector) over exact IEEE-754
    * bit patterns ([[dbits]]) with the splitmix64 fold, replacing the
    * round-8 frozen-VALUES pin. Everything downstream of the e CTE is
    * the shared pipeline; the only other delta is the kNN tie key
    * (signed order of hash ids).
    */
  def weightsContentSql: String = coreCtesFor(
    s"SELECT ($contentHashSql) AS id, lbl, v FROM " +
      "(SELECT label::DOUBLE AS lbl, embedding::DOUBLE[] AS v FROM embeddings)",
    "xor(nid, 9223372036854775808::UBIGINT)") +
    "fin AS (SELECT feature::INTEGER AS feature, round(w, 6) AS weight FROM nw)\n" +
    "SELECT feature, weight FROM fin ORDER BY feature"

  /** relief_weights on an instance SUBSET — i04's composed pipeline:
    * the SAME shared fit replay over embeddings minus the ids the
    * caller's query flags (i04 passes the complete i01 ENN replay,
    * itself a WITH query — nested-subquery scoping keeps its CTE
    * names out of this pipeline's namespace, so the substrate oracle
    * composes by reference, never by copy). Priors, sampling gate,
    * batching and kNN all rerun on the edited instance set, exactly
    * like the Scala fit on the anti-joined frame.
    */
  def weightsEditedSql(excludeIdsSql: String): String = coreCtesFor(
    "SELECT vec_id AS id, label::DOUBLE AS lbl, embedding::DOUBLE[] AS v " +
      s"FROM embeddings WHERE vec_id NOT IN ($excludeIdsSql)",
    "nid") +
    "fin AS (SELECT feature::INTEGER AS feature, round(w, 6) AS weight FROM nw)\n" +
    "SELECT feature, weight FROM fin ORDER BY feature"

  /** relief_select / relief_persist: both rankings side by side. */
  def selectSql: String = coreCtes + greedyCtes + "\n" +
    "SELECT s.rank, s.f AS std_feature, r.f AS redundancy_feature\n" +
    "FROM std s JOIN redsel r USING (rank) ORDER BY rank"

  /** Shared CTE prefix for the f10/f11 oracles: bit view, exact
    * integer contingency counts (per-dim, per-pair, per-triple — all
    * from two lateral unnests over the bit list), entropies and
    * mutual informations in `ln/ln(2)` (the f07 convention, matching
    * Spark's `log(x)/log(2.0)`). Cells absent from a GROUP BY carry
    * zero probability and contribute exactly 0 — both engines skip
    * them identically.
    */
  private def bitInfoCtes: String = """
WITH e AS MATERIALIZED (
  SELECT label::BIGINT AS lbl,
         list_transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END) AS bits
  FROM embeddings),
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM e),
cy AS MATERIALIZED (SELECT lbl, count(*)::DOUBLE AS c FROM e GROUP BY 1),
c1 AS MATERIALIZED (
  SELECT u.i - 1 AS d, bits[u.i] AS b, lbl, count(*)::DOUBLE AS c
  FROM e, unnest(range(1, len(bits) + 1)) AS u(i)
  GROUP BY 1, 2, 3),
c1m AS MATERIALIZED (SELECT d, b, sum(c) AS c FROM c1 GROUP BY 1, 2),
hx AS MATERIALIZED (
  SELECT d, -sum(c / (SELECT n FROM nn) * ln(c / (SELECT n FROM nn)) / ln(2)) AS h
  FROM c1m GROUP BY 1),
hy AS MATERIALIZED (
  SELECT -sum(c / (SELECT n FROM nn) * ln(c / (SELECT n FROM nn)) / ln(2)) AS h
  FROM cy),
ixy AS MATERIALIZED (
  SELECT c1.d, sum(c1.c / (SELECT n FROM nn)
         * ln(c1.c * (SELECT n FROM nn) / (m.c * cy.c)) / ln(2)) AS mi
  FROM c1 JOIN c1m m ON m.d = c1.d AND m.b = c1.b
       JOIN cy ON cy.lbl = c1.lbl
  GROUP BY 1),
"""

  /** f10_fcbf: SU ranking + 10 unrolled predominance-elimination
    * rounds. Round t removes the round-(t−1) pick and everything it
    * dominates (SU(pick, j) ≥ SU_c(j)); the next pick is the max-SU
    * survivor — inductively identical to the rank-order scan that
    * keeps a dim iff no earlier KEPT dim dominates it.
    */
  def fcbfSql: String = {
    val rounds = new scala.collection.mutable.ArrayBuffer[String]
    rounds += "r1 AS MATERIALIZED (SELECT d, su FROM suc)"
    rounds += "g1 AS MATERIALIZED (SELECT d, su FROM r1 ORDER BY su DESC, d LIMIT 1)"
    for (t <- 2 to 10) {
      val p = t - 1
      rounds += s"""r$t AS MATERIALIZED (
  SELECT r.d, r.su FROM r$p r
  LEFT JOIN sup p ON p.di = least(r.d, (SELECT d FROM g$p))
                 AND p.dj = greatest(r.d, (SELECT d FROM g$p))
  WHERE r.d <> (SELECT d FROM g$p) AND NOT coalesce(p.su >= r.su, FALSE))"""
      rounds += s"g$t AS MATERIALIZED (SELECT d, su FROM r$t ORDER BY su DESC, d LIMIT 1)"
    }
    val out = (1 to 10).map(t =>
      s"SELECT CAST($t AS BIGINT) AS rank, (SELECT d FROM g$t) AS dim, " +
        s"(SELECT su FROM g$t) AS su").mkString("\n  UNION ALL ")
    bitInfoCtes + s"""suc AS MATERIALIZED (
  SELECT hx.d, CASE WHEN hx.h + (SELECT h FROM hy) > 0
    THEN 2 * ixy.mi / (hx.h + (SELECT h FROM hy)) ELSE 0.0 END AS su
  FROM hx JOIN ixy ON ixy.d = hx.d),
c2 AS MATERIALIZED (
  SELECT u.i - 1 AS di, w.j - 1 AS dj, bits[u.i] AS bi, bits[w.j] AS bj,
         count(*)::DOUBLE AS c
  FROM e, unnest(range(1, len(bits) + 1)) AS u(i),
       unnest(range(1, len(bits) + 1)) AS w(j)
  WHERE u.i < w.j
  GROUP BY 1, 2, 3, 4),
iij AS MATERIALIZED (
  SELECT c2.di, c2.dj, sum(c2.c / (SELECT n FROM nn)
         * ln(c2.c * (SELECT n FROM nn) / (ai.c * aj.c)) / ln(2)) AS mi
  FROM c2 JOIN c1m ai ON ai.d = c2.di AND ai.b = c2.bi
       JOIN c1m aj ON aj.d = c2.dj AND aj.b = c2.bj
  GROUP BY 1, 2),
sup AS MATERIALIZED (
  SELECT iij.di, iij.dj, CASE WHEN hi.h + hj.h > 0
    THEN 2 * iij.mi / (hi.h + hj.h) ELSE 0.0 END AS su
  FROM iij JOIN hx hi ON hi.d = iij.di JOIN hx hj ON hj.d = iij.dj),
""" + rounds.mkString(",\n") + s"""
SELECT rank, dim, su FROM (
  $out)
WHERE dim IS NOT NULL ORDER BY rank"""
  }

  /** f11_cmim: the conditional-MI table I(F;Y|S) for every ordered
    * (F, S) pair, then 10 unrolled greedy max-min steps carrying each
    * candidate's running `least(score so far, I(F;Y|latest pick))` —
    * Fleuret's partial-score recurrence verbatim.
    */
  def cmimSql: String = {
    val steps = new scala.collection.mutable.ArrayBuffer[String]
    steps += "q1 AS MATERIALIZED (SELECT d, mi AS score FROM ixy)"
    steps += "gm1 AS MATERIALIZED (SELECT d, score FROM q1 ORDER BY score DESC, d LIMIT 1)"
    for (t <- 2 to 10) {
      val p = t - 1
      steps += s"""q$t AS MATERIALIZED (
  SELECT q.d, least(q.score, c.v) AS score
  FROM q$p q JOIN cmi c ON c.df = q.d AND c.ds = (SELECT d FROM gm$p)
  WHERE q.d <> (SELECT d FROM gm$p))"""
      steps += s"gm$t AS MATERIALIZED (SELECT d, score FROM q$t ORDER BY score DESC, d LIMIT 1)"
    }
    val out = (1 to 10).map(t =>
      s"SELECT CAST($t AS BIGINT) AS step, (SELECT d FROM gm$t) AS dim, " +
        s"(SELECT score FROM gm$t) AS score").mkString("\n  UNION ALL ")
    bitInfoCtes + s"""c3 AS MATERIALIZED (
  SELECT u.i - 1 AS df, w.j - 1 AS ds, bits[u.i] AS bf, bits[w.j] AS bs,
         lbl, count(*)::DOUBLE AS c
  FROM e, unnest(range(1, len(bits) + 1)) AS u(i),
       unnest(range(1, len(bits) + 1)) AS w(j)
  WHERE u.i <> w.j
  GROUP BY 1, 2, 3, 4, 5),
c3fs AS MATERIALIZED (SELECT df, ds, bf, bs, sum(c) AS c FROM c3 GROUP BY 1, 2, 3, 4),
cmi AS MATERIALIZED (
  SELECT c3.df, c3.ds, sum(c3.c / (SELECT n FROM nn)
    * ln(c3.c * sm.c / (fs.c * sy.c)) / ln(2)) AS v
  FROM c3 JOIN c3fs fs ON fs.df = c3.df AND fs.ds = c3.ds
                      AND fs.bf = c3.bf AND fs.bs = c3.bs
       JOIN c1 sy ON sy.d = c3.ds AND sy.b = c3.bs AND sy.lbl = c3.lbl
       JOIN c1m sm ON sm.d = c3.ds AND sm.b = c3.bs
  GROUP BY 1, 2),
""" + steps.mkString(",\n") + s"""
SELECT step, dim, score FROM (
  $out)
WHERE dim IS NOT NULL ORDER BY step"""
  }

  /** f13_jmi: the joint-MI table I(F,S;Y) for every ordered (F, S)
    * pair (triple cells / pair marginal / label marginal), then 10
    * unrolled greedy steps accumulating each candidate's running
    * Σ I(F, pick; Y) — step 1 scored by plain I(F;Y).
    */
  def jmiSql: String = {
    val steps = new scala.collection.mutable.ArrayBuffer[String]
    steps += "s1 AS MATERIALIZED (SELECT d, mi AS score FROM ixy)"
    steps += "gj1 AS MATERIALIZED (SELECT d, score FROM s1 ORDER BY score DESC, d LIMIT 1)"
    for (t <- 2 to 10) {
      val p = t - 1
      val base = if (t == 2) "0.0" else "s.score"
      steps += s"""s$t AS MATERIALIZED (
  SELECT s.d, $base + j.v AS score
  FROM s$p s JOIN jmi j ON j.df = s.d AND j.ds = (SELECT d FROM gj$p)
  WHERE s.d <> (SELECT d FROM gj$p))"""
      steps += s"gj$t AS MATERIALIZED (SELECT d, score FROM s$t ORDER BY score DESC, d LIMIT 1)"
    }
    val out = (1 to 10).map(t =>
      s"SELECT CAST($t AS BIGINT) AS step, (SELECT d FROM gj$t) AS dim, " +
        s"(SELECT score FROM gj$t) AS score").mkString("\n  UNION ALL ")
    bitInfoCtes + s"""c3 AS MATERIALIZED (
  SELECT u.i - 1 AS df, w.j - 1 AS ds, bits[u.i] AS bf, bits[w.j] AS bs,
         lbl, count(*)::DOUBLE AS c
  FROM e, unnest(range(1, len(bits) + 1)) AS u(i),
       unnest(range(1, len(bits) + 1)) AS w(j)
  WHERE u.i <> w.j
  GROUP BY 1, 2, 3, 4, 5),
c3fs AS MATERIALIZED (SELECT df, ds, bf, bs, sum(c) AS c FROM c3 GROUP BY 1, 2, 3, 4),
jmi AS MATERIALIZED (
  SELECT c3.df, c3.ds, sum(c3.c / (SELECT n FROM nn)
    * ln(c3.c * (SELECT n FROM nn) / (fs.c * cy.c)) / ln(2)) AS v
  FROM c3 JOIN c3fs fs ON fs.df = c3.df AND fs.ds = c3.ds
                      AND fs.bf = c3.bf AND fs.bs = c3.bs
       JOIN cy ON cy.lbl = c3.lbl
  GROUP BY 1, 2),
""" + steps.mkString(",\n") + s"""
SELECT step, dim, score FROM (
  $out)
WHERE dim IS NOT NULL ORDER BY step"""
  }

  /** relief_transform: per-row compressed-vector census — the std
    * selection recomputed in-SQL, sorted ascending, then the same
    * left-to-right fold over the selected values as the Spark side's
    * `aggregate(selected, 0D, (a, x) -> a + x)`.
    */
  def transformSql: String = coreCtes +
    """selasc AS (SELECT list(f ORDER BY f) AS sel FROM std)
SELECT e.id AS vec_id, len(s.sel)::INTEGER AS n_selected,
  round(list_reduce(list_prepend(0.0::DOUBLE,
    list_transform(s.sel, f -> e.v[f + 1])), (a, b) -> a + b), 6) AS sum_selected
FROM e, selasc s"""
}
