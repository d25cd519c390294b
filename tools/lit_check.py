#!/usr/bin/env python3
"""Independent re-derivation of the engine-computed `OracleLits` constants.

The correctness gate ships a handful of transcendental-derived constants
(DSIR log-ratios, NB log-likelihoods, BM25 idf, the PCA power-iteration
vector) and engine-specific sketch cuts (length deciles, z-order buckets)
from the engine to the oracle as SQL literals — the round-4/5 answer to
cross-build 1-ulp libm drift. That closed the flakiness but left the
constants themselves guarded only by the engine's own tests.

This tool closes the loop: after a `graft.Verify` run (which dumps the raw
fragments as `oracle_lits.json`), each constant family is RECOMPUTED from
the parquet fixtures here — Python math + DuckDB for the data-sized parts,
implementing the published formulas independently of the Scala code — and
compared:

- ln-derived integers (dsir lrm, nb lpos/lneg/prior micro, bm25 idf9):
  must equal the quantization of the recomputed value or of a 1-ulp
  neighbor (libm may legally differ by 1 ulp; the quantization is exact).
- the PCA vector (no transcendental: IEEE +,*,/,sqrt,floor only): must
  match EXACTLY, element by element.
- sketch cuts (len deciles, z-order ranks): a sketch is engine-specific,
  so equality is not checkable — instead each cut must be a real element
  of the column and its rank window must intersect the approxQuantile
  guarantee [(q-eps)n, (q+eps)n], and cuts must be non-decreasing.

An UNKNOWN key in oracle_lits.json is a FAILURE: a new literal family must
register a checker here before it can ride the gate.

Usage: lit_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math, re
from decimal import Decimal, ROUND_HALF_UP
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

LITS_PATH = os.path.join(OUT, "oracle_lits.json")
if not os.path.exists(LITS_PATH):
    print("lit check: no oracle_lits.json (old Verify output?) — skipped")
    sys.exit(0)
lits = json.load(open(LITS_PATH))
if not lits:
    print("lit check: 0 fragments registered — nothing to check")
    sys.exit(0)

con = duckdb.connect()
for f in os.listdir(SF):
    if f.endswith(".parquet"):
        con.sql(f"CREATE VIEW {f[:-8]} AS SELECT * FROM '{SF}/{f}'")

# whitespace tokenizer — same shape the oracle SQL uses (duckToksAll)
TOKS = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')")


def half_up6_micro(v):
    """Scala's BigDecimal(double).setScale(6, HALF_UP) * 1e6 as int.
    Scala BigDecimal(double) goes through Double.toString (shortest
    round-trip) — mirrored by Decimal(repr(v))."""
    return int(Decimal(repr(v)).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP)
               .scaleb(6))


def ulp_neighbors(v):
    return (v, math.nextafter(v, -math.inf), math.nextafter(v, math.inf))


def check_ln_micro(engine, v, what, errs):
    """engine int must equal half_up6_micro of v or a 1-ulp neighbor."""
    ok = any(half_up6_micro(x) == engine for x in ulp_neighbors(v))
    if not ok:
        errs.append(f"{what}: engine={engine} recomputed="
                    f"{half_up6_micro(v)} (v={v!r})")


def check_dsir(frag, errs):
    pairs = re.findall(r"\((\d+), (-?\d+)\)", frag)
    if len(pairs) != 256:
        errs.append(f"expected 256 buckets, parsed {len(pairs)}")
        return
    rows = con.sql(f"""
        WITH lab AS (SELECT (lang = 'en') AS is_t, {TOKS} AS tk
                     FROM documents),
        tok AS (SELECT is_t, unnest(tk) AS t FROM lab)
        SELECT CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 256 AS b,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
        FROM tok GROUP BY 1""").fetchall()
    ct = [0] * 256
    cr = [0] * 256
    for b, c_t, c_r in rows:
        ct[int(b)] = int(c_t)
        cr[int(b)] = int(c_r)
    nt, nr = float(sum(ct)), float(sum(cr))
    for bs, lrm in pairs:
        b = int(bs)
        v = math.log(((ct[b] + 1.0) / (nt + 256)) /
                     ((cr[b] + 1.0) / (nr + 256)))
        check_ln_micro(int(lrm), v, f"bucket {b}", errs)


def check_nb_model(frag, errs):
    trips = re.findall(r"\('((?:[^']|'')*)', (-?\d+), (-?\d+)\)", frag)
    if not trips:
        errs.append("no (token, lpos, lneg) triples parsed")
        return
    rows = con.sql(f"""
        WITH lab AS (SELECT (source IN ('src0','src1','src2')) AS pos,
                            {TOKS} AS tk FROM documents),
        tok AS (SELECT pos, unnest(tk) AS token FROM lab),
        c AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
                     sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
              FROM tok GROUP BY 1)
        SELECT token, cp, cn FROM c
        ORDER BY (cp + cn) DESC, token LIMIT 512""").fetchall()
    counts = {t: (int(cp), int(cn)) for t, cp, cn in rows}
    np_, nn = sum(c[0] for c in counts.values()), \
        sum(c[1] for c in counts.values())
    if len(trips) != len(counts):
        errs.append(f"vocab size: engine={len(trips)} recomputed="
                    f"{len(counts)}")
        return
    for tok_esc, lp, ln_ in trips:
        tok = tok_esc.replace("''", "'")
        if tok not in counts:
            errs.append(f"token {tok!r} not in recomputed top-512")
            continue
        cp, cn = counts[tok]
        check_ln_micro(int(lp), math.log((cp + 1.0) / (np_ + 512)),
                       f"lpos[{tok!r}]", errs)
        check_ln_micro(int(ln_), math.log((cn + 1.0) / (nn + 512)),
                       f"lneg[{tok!r}]", errs)


def check_nb_prior(frag, errs):
    engine = int(frag.strip())
    np_, nn = con.sql(
        "SELECT sum(CASE WHEN source IN ('src0','src1','src2') THEN 1 "
        "ELSE 0 END), sum(CASE WHEN source IN ('src0','src1','src2') "
        "THEN 0 ELSE 1 END) FROM documents").fetchone()
    check_ln_micro(engine, math.log((np_ + 1.0) / (nn + 1.0)), "prior",
                   errs)


def check_bm25(frag, errs):
    trips = re.findall(
        r"\('((?:[^']|'')*)', CAST\((\d+) AS BIGINT\), "
        r"CAST\((-?\d+) AS BIGINT\)\)", frag)
    if not trips:
        errs.append("no (qt, df, idf9) triples parsed")
        return
    n = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    for tok_esc, df_s, idf9_s in trips:
        tok = tok_esc.replace("''", "'")
        df = con.sql(
            f"SELECT count(*) FROM (SELECT {TOKS} AS tk FROM documents) "
            "WHERE list_contains(tk, ?)", params=[tok]).fetchone()[0]
        if df != int(df_s):
            errs.append(f"df[{tok!r}]: engine={df_s} recomputed={df}")
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        if all(math.floor(x * 1e9) != int(idf9_s)
               for x in ulp_neighbors(idf)):
            errs.append(f"idf9[{tok!r}]: engine={idf9_s} recomputed="
                        f"{math.floor(idf * 1e9)}")


def check_pca(frag, errs):
    micro = [int(x) for x in re.findall(r"-?\d+", frag)]
    vecs = [list(v) for (v,) in con.sql(
        "SELECT embedding FROM embeddings ORDER BY vec_id").fetchall()]
    dims = max(len(v) for v in vecs)
    if len(micro) != dims:
        errs.append(f"dims: engine={len(micro)} recomputed={dims}")
        return
    v = [1.0] + [0.0] * (dims - 1)
    for _ in range(2):  # Scala: `for _ <- 1 until iters`, iters = 3
        s_int = [0] * dims
        for x in vecs:
            dot = 0.0
            for xi, vi in zip(x, v):  # in-order left fold (zip_with)
                dot = dot + float(xi) * vi
            for j, xj in enumerate(x):
                s_int[j] += math.floor((dot * float(xj)) * 1e9)
        s = [float(si) for si in s_int]
        norm_acc = 0.0
        for x in s:  # in-order, matching Array.map(sq).sum
            norm_acc += x * x
        norm = math.sqrt(norm_acc)
        if norm <= 0:
            errs.append("recomputed iteration collapsed to zero")
            return
        v = [float(Decimal(repr(x / norm)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP)) for x in s]
    recomputed = [math.floor(x * 1e6 + 0.5) for x in v]
    for j, (e, r) in enumerate(zip(micro, recomputed)):
        if e != r:
            errs.append(f"v[{j}]: engine={e} recomputed={r}")


def check_cuts(cuts, q_targets, eps, values_sql, what, errs):
    """Sketch-cut validity: non-decreasing; each cut is an element of the
    column; its rank window [#(<c)+1, #(<=c)] intersects the
    approxQuantile guarantee [(q-eps)n, (q+eps)n]."""
    if any(b < a for a, b in zip(cuts, cuts[1:])):
        errs.append(f"{what}: cuts not non-decreasing: {cuts}")
    n = con.sql(f"SELECT count(*) FROM ({values_sql})").fetchone()[0]
    for c, q in zip(cuts, q_targets):
        lt, le = con.sql(
            f"SELECT sum(CASE WHEN v < {c!r} THEN 1 ELSE 0 END), "
            f"sum(CASE WHEN v <= {c!r} THEN 1 ELSE 0 END) "
            f"FROM ({values_sql})").fetchone()
        if le == lt:
            errs.append(f"{what}: cut {c} is not an element of the column")
            continue
        lo, hi = (q - eps) * n, (q + eps) * n
        if le < lo or lt + 1 > hi:
            errs.append(f"{what}: cut {c} rank window [{lt + 1}, {le}] "
                        f"outside guarantee [{lo:.1f}, {hi:.1f}] for "
                        f"q={q}")


def check_len_deciles(frag, errs):
    cuts = [float(x) for x in re.findall(
        r"WHEN n_tokens <= CAST\('([^']+)' AS DOUBLE\)", frag)]
    if len(cuts) != 9:
        errs.append(f"expected 9 decile cuts, parsed {len(cuts)}")
        return
    check_cuts(cuts, [i / 10 for i in range(1, 10)], 1e-4,
               f"SELECT CAST(len({TOKS}) AS DOUBLE) AS v FROM documents",
               "len_decile", errs)


def check_zorder(colname, n_buckets=16, table="lineitem", what="zorder"):
    def chk(frag, errs):
        cuts = [float(x) for x in re.findall(
            r"WHEN \w+ <= CAST\('([^']+)' AS DOUBLE\)", frag)]
        if len(cuts) != n_buckets - 1:
            errs.append(f"expected {n_buckets - 1} cuts, parsed {len(cuts)}")
            return
        check_cuts(cuts, [i / n_buckets for i in range(1, n_buckets)],
                   1.0 / 2000,
                   f"SELECT CAST({colname} AS DOUBLE) AS v FROM {table}",
                   f"{what}[{colname}]", errs)
    return chk


def check_lr_weights(frag, errs):
    """Re-run the engine's 20-round decimal-quantized batch GD from the
    fixtures. All arithmetic is replicated exactly (shortest-repr HALF_UP
    quantization of per-row contributions; integer half-up division for
    the weight step) except libm exp, which may differ by 1 ulp per row —
    each flip moves a gradient sum by 1 nano and a weight step by <= 1
    nano, so the tolerance is iters x a small flip budget, far below any
    real defect (wrong feature, label, eta, or iteration count)."""
    nanos = [int(x) for x in frag.split(",")]
    if len(nanos) != 5:
        errs.append(f"expected 5 weights, parsed {len(nanos)}")
        return
    rows = con.sql(
        r"""WITH f AS (SELECT doc_id, text,
          list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS tk,
          CAST(length(text) AS BIGINT) AS nc FROM documents)
        SELECT CAST(len(tk) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(tk, w -> w IN
            ('the','a','of','and','in','to','is'))) AS BIGINT) AS n_stop,
          nc,
          CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
            AS BIGINT) AS n_alpha
        FROM f""").fetchall()
    feats = []
    for nt, nst, nc, na in rows:
        y = 1.0 if (nt >= 45 and 20 * nst >= nt) else 0.0  # the rubric
        x1 = min(nt, 400) / 50.0
        x2 = ((20.0 * nst) / nt) if nt > 0 else 0.0
        x3 = (((nc - (nt - 1)) / nt) / 10.0) if nt > 0 else 0.0
        x4 = (na / nc) if nc > 0 else 0.0
        feats.append((y, x1, x2, x3, x4))
    n = len(feats)
    if n == 0:
        if any(nanos):
            errs.append("empty corpus but nonzero weights")
        return

    def div_half_up(num, den):  # round(num/den), halves away from zero
        s = -1 if (num < 0) != (den < 0) else 1
        num, den = abs(num), abs(den)
        return s * ((2 * num + den) // (2 * den))

    Q = Decimal("0.000000001")
    w = [0] * 5  # integer nano units
    for _ in range(20):
        wd = [v / 1e9 for v in w]
        G = [0] * 5  # gradient sums in nano units (exact)
        for y, x1, x2, x3, x4 in feats:
            m = wd[0] + wd[1] * x1 + wd[2] * x2 + wd[3] * x3 + wd[4] * x4
            g = 1.0 / (1.0 + math.exp(-m)) - y
            for j, xj in enumerate((1.0, x1, x2, x3, x4)):
                G[j] += int(Decimal(repr(g * xj)).quantize(
                    Q, rounding=ROUND_HALF_UP).scaleb(9))
        # w <- w - eta*G/n with eta=0.5: step_nano = round_half_up(G/(2n))
        w = [w[j] - div_half_up(G[j], 2 * n) for j in range(5)]
    for j, (e, r) in enumerate(zip(nanos, w)):
        if abs(e - r) > 1000:  # 1e-6 — the libm-flip budget
            errs.append(f"w[{j}]: engine={e} recomputed={r}")


def waterfill_replica(avail, weights, budget):
    """Pure-integer water-filling replica of Sampling.waterfillAllocation
    (name-order determinism, saturation rounds, floor targets + remainder
    hand-out) — shared by the static and DoReMi-driven plan checkers."""
    alloc = {g: 0 for g in avail}
    active = sorted(g for g in avail if weights[g] > 0)
    remaining = budget
    progress = True
    while progress and active:
        progress = False
        sum_avail = sum(avail[g] for g in active)
        if sum_avail <= remaining:
            for g in active:
                alloc[g] = avail[g]
            remaining -= sum_avail
            active = []
        else:
            sum_w = sum(weights[g] for g in active)
            sat = [g for g in active
                   if avail[g] <= remaining * weights[g] // sum_w]
            if sat:
                for g in sat:
                    alloc[g] = avail[g]
                    remaining -= avail[g]
                active = [g for g in active if g not in sat]
                progress = True
            else:
                sum_wf = sum(weights[g] for g in active)
                for g in active:
                    alloc[g] = remaining * weights[g] // sum_wf
                r = remaining - sum(alloc[g] for g in active)
                i = 0
                while r > 0:
                    g = active[i % len(active)]
                    if alloc[g] < avail[g]:
                        alloc[g] += 1
                        r -= 1
                    i += 1
                active = []
    return alloc


def check_waterfill(frag, errs):
    """Independent water-filling replica: avail from the fixtures, the
    fixed query constants (src0=2500bp, src1=1500bp, default 300bp,
    budget 20000), pure-integer iteration — must match EXACTLY."""
    got = re.findall(r"\('([^']*)', (\d+), (\d+)\)", frag)
    if not got:
        errs.append("no allocations parsed")
        return
    avail = dict(con.sql(
        f"SELECT source, CAST(sum(len({TOKS})) AS BIGINT) "
        "FROM documents GROUP BY 1").fetchall())
    weights = {g: (2500 if g == "src0" else 1500 if g == "src1" else 300)
               for g in avail}
    alloc = waterfill_replica(avail, weights, 20000)
    for g, w, al in got:
        if g not in avail:
            errs.append(f"unknown group {g}")
        elif int(w) != weights[g] or int(al) != alloc[g]:
            errs.append(f"{g}: engine=({w},{al}) "
                        f"recomputed=({weights[g]},{alloc[g]})")
    if len(got) != len(avail):
        errs.append(f"parsed {len(got)} groups, fixtures have {len(avail)}")


def check_unimax(frag, errs):
    """UniMax (Chung '23) replica: per-language avail from the fixtures,
    supplies capped at avail*2 epochs, EQUAL weights, budget 400000 — the
    same pure-integer water-filling iteration, must match EXACTLY."""
    got = re.findall(r"\('([^']*)', (\d+)\)", frag)
    if not got:
        errs.append("no allocations parsed")
        return
    avail = dict(con.sql(
        f"SELECT lang, CAST(sum(len({TOKS})) AS BIGINT) "
        "FROM documents GROUP BY 1").fetchall())
    capped = {g: a * 2 for g, a in avail.items()}
    alloc = waterfill_replica(capped, {g: 100 for g in capped}, 400000)
    for g, al in got:
        if g not in avail:
            errs.append(f"unknown lang {g}")
        elif int(al) != alloc[g]:
            errs.append(f"{g}: engine={al} recomputed={alloc[g]}")
    if len(got) != len(avail):
        errs.append(f"parsed {len(got)} langs, fixtures have {len(avail)}")


def doremi_per_source():
    """Per-source (Σ neg_logp_sum_micro, Σ n_bigrams) via the same
    bigram-LM SQL the oracles use — the exact-integer base of every
    doremi_* checker."""
    rows = con.sql(f"""
        WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
        v AS (SELECT count(DISTINCT tk) AS v FROM
          (SELECT unnest(l) AS tk FROM t)),
        bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
          i -> l[i] || ' ' || l[i+1])) AS bigram FROM t),
        c12 AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY 1),
        c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c12) AS c1
          FROM c12 GROUP BY 1),
        lm AS (SELECT bigram,
          CAST(ln((c12 + 1.0) / (c1 + v)) / ln(2.0) AS DECIMAL(18,6))
            AS logp
          FROM c12 JOIN c1 ON split_part(c12.bigram, ' ', 1) = c1.w1
          CROSS JOIN v),
        stats AS (SELECT doc_id,
          CAST(-sum(logp) * 1000000 AS BIGINT) AS m, count(*) AS n
          FROM bg JOIN lm USING (bigram) GROUP BY 1)
        SELECT d.source, CAST(sum(m) AS BIGINT), CAST(sum(n) AS BIGINT)
        FROM stats JOIN documents d USING (doc_id) GROUP BY 1""").fetchall()
    return {s: (int(m), int(n)) for s, m, n in rows}


def doremi_w_expected(per, eta_micro):
    """source -> candidate w_nano set (exp is 1-ulp tolerant). eta comes
    from the registered lit rows, not a hardcode; the exponent clamp
    (excess_micro capped where eta*excess = 13, Sampling's
    DoremiMaxExponentPico) mirrors the engine's int64-overflow guard."""
    tn = sum(m for m, n in per.values())
    tb = sum(n for m, n in per.values())
    corpus_ce = tn // tb
    cap = 13_000_000_000_000 // eta_micro
    out = {}
    for s, (m, n) in per.items():
        excess = min(max(m // n - corpus_ce, 0), cap)
        w = math.exp((excess / 1e6) * (eta_micro / 1e6))
        out[s] = {math.floor(x * 1e9) for x in ulp_neighbors(w)}
    return out


def check_doremi(frag, errs):
    """DoReMi-lite re-derivation: per-source cross entropy from the same
    bigram-LM SQL the oracle uses (exact integer micro-bits), excess vs
    the corpus mean by pure integer arithmetic, then ONE exp per source
    (eta read from the registered eta_micro column) floor-quantized to
    nano — 1-ulp tolerant like the other ln/exp families."""
    rows = re.findall(
        r"\('((?:[^']|'')*)', CAST\((\d+) AS BIGINT\), (\d+)\)", frag)
    if not rows:
        errs.append("no (source, w_nano, eta_micro) rows parsed")
        return
    etas = {int(e) for _, _, e in rows}
    if len(etas) != 1:
        errs.append(f"mixed eta_micro across rows: {sorted(etas)}")
        return
    per = doremi_per_source()
    got = {s.replace("''", "'"): int(w) for s, w, _ in rows}
    if set(got) != set(per):
        errs.append(f"source sets differ: lits={sorted(got)} "
                    f"data={sorted(per)}")
        return
    expected = doremi_w_expected(per, etas.pop())
    for s in sorted(per):
        if got[s] not in expected[s]:
            errs.append(f"w_nano[{s}]: engine={got[s]} "
                        f"recomputed={sorted(expected[s])}")


def check_doremi_plan(frag, errs):
    """The closed loop replayed end-to-end: w_nano re-derived from the
    fixtures (ulp-tolerant, the ONLY float step), then weight_bp by exact
    integer division of the REGISTERED nanos and the water-fill replica
    from the registered bps — everything after the exp must match
    EXACTLY."""
    quads = re.findall(
        r"\('((?:[^']|'')*)', CAST\((\d+) AS BIGINT\), (\d+), (\d+), "
        r"(\d+)\)",
        frag)
    if not quads:
        errs.append("no (source, w_nano, weight_bp, alloc, eta) rows parsed")
        return
    etas = {int(e) for _, _, _, _, e in quads}
    if len(etas) != 1:
        errs.append(f"mixed eta_micro across rows: {sorted(etas)}")
        return
    got = {s.replace("''", "'"): (int(w), int(bp), int(al))
           for s, w, bp, al, _ in quads}
    per = doremi_per_source()
    expected = doremi_w_expected(per, etas.pop())
    avail = dict(con.sql(
        f"SELECT source, CAST(sum(len({TOKS})) AS BIGINT) "
        "FROM documents GROUP BY 1").fetchall())
    if set(got) != set(avail):
        errs.append(f"source sets differ: lits={sorted(got)} "
                    f"avail={sorted(avail)}")
        return
    for s, (w, bp, al) in sorted(got.items()):
        exp_w = expected.get(s, {0})  # no scored bigrams → weight 0
        if w not in exp_w:
            errs.append(f"w_nano[{s}]: engine={w} "
                        f"recomputed={sorted(exp_w)}")
    # downstream of the exp: exact integer replay from the REGISTERED ints
    wt = sum(w for w, _, _ in got.values())
    for s, (w, bp, al) in sorted(got.items()):
        exp_bp = (10000 * w) // wt if wt > 0 else 0
        if bp != exp_bp:
            errs.append(f"weight_bp[{s}]: engine={bp} recomputed={exp_bp}")
    weights = {g: got[g][1] for g in avail}
    alloc = waterfill_replica(avail, weights, 20000)
    for s, (w, bp, al) in sorted(got.items()):
        if al != alloc[s]:
            errs.append(f"alloc[{s}]: engine={al} recomputed={alloc[s]}")


CHECKERS = {
    "dsir_ratios": check_dsir,
    # the RRF query's BM25 side registers the same (qt, df, idf9) triple
    # shape as tx_bm25 — the checker re-derives df and idf identically
    "rrf_qd": check_bm25,
    "doremi_w": check_doremi,
    # the incremental path's merged-state weights must equal a full
    # retrain — same re-derivation over the whole fixture corpus
    "doremi_incr_w": check_doremi,
    "doremi_st_w": check_doremi,
    "doremi_plan": check_doremi_plan,
    "nb_model": check_nb_model,
    "nb_prior": check_nb_prior,
    "bm25_qd": check_bm25,
    "pca_vprev": check_pca,
    "len_decile_cuts": check_len_deciles,
    "lr_weights": check_lr_weights,
    "waterfill_alloc": check_waterfill,
    "unimax_alloc": check_unimax,
    "zorder_ra": check_zorder("l_orderkey"),
    "zorder_rb": check_zorder("l_partkey"),
    # hilbert shares the zorder rank-bucketing contract (same cut shape)
    "hilbert_ra": check_zorder("l_orderkey"),
    "hilbert_rb": check_zorder("l_partkey"),
    "range_plan_cuts": check_zorder("l_extendedprice", what="range_plan"),
}

failed = 0
for key in sorted(lits):
    if key not in CHECKERS:
        print(f"FAIL {key}  -> no checker registered for this literal "
              "family (add one to tools/lit_check.py)")
        failed += 1
        continue
    errs = []
    try:
        CHECKERS[key](lits[key], errs)
    except Exception as e:  # a checker crash is a failure, not a skip
        errs.append(f"checker crashed: {type(e).__name__}: {e}")
    if errs:
        failed += 1
        print(f"FAIL {key}  -> " + "; ".join(errs[:5]) +
              (f" (+{len(errs) - 5} more)" if len(errs) > 5 else ""))
    else:
        print(f"PASS {key}")

print(f"\nlit check: {len(lits) - failed}/{len(lits)} constant families "
      "independently re-derived")
sys.exit(1 if failed else 0)
