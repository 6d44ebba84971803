#!/usr/bin/env python3
"""Budget-safe sf0.1 verification of dedup_minhash_full (closes the last
COVERAGE cross-scale sweep exclusion).

The standing oracle replays exact ALL-PAIRS Jaccard, which is fine at the
driver's sf0.01 gate (~17 s) but exceeds any sane budget at 5000 docs
(>11 min measured — 12.5M list_intersect calls). This script verifies the
SAME claim with cost proportional to the OUTPUT, in three exact steps:

1. SOUNDNESS — every claimed pair's Jaccard is recomputed from raw text
   in DuckDB (same shingle definition as the oracle) and must equal the
   claimed rounded value, and clear the 0.6 gate threshold.
2. TOP-100 COMPLETENESS — let J100 = the lowest claimed Jaccard. Prefix
   filtering is LOSSLESS for J >= t: a qualifying pair must share a
   shingle inside each doc's rare-first prefix of length
   n - ceil(t*n) + 1 (if the intersection, of size >= ceil(t*n), avoided
   the prefix entirely it could not fit in the suffix of length
   ceil(t*n) - 1). At t just under J100 (0.98+ on this fixture) prefixes
   are ~1-2% of each doc's shingles, so the exact set {pairs: J >= J100}
   is computable in seconds; the claim must equal its top-100 under the
   oracle's (jaccard DESC, a_id, b_id) order. If J100 < 0.75 the prefix
   stops being selective — the script then degrades to step 3 only and
   says so loudly (absence evidence instead of exact completeness).
3. SEEDED ABSENCE SAMPLE — 200k seeded uniform pairs passing the size
   prefilter: none may have a Jaccard that would outrank a claimed pair
   while being missing from the claim.

Usage: python3 scripts/sweep_minhash_sf01.py <verifyOutDir> [sfDir]
(verifyOutDir = a graft.Verify dump containing dedup_minhash_full/)
"""
import random
import sys

import duckdb

SHINGLE_CTE = """
n AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS t
      FROM documents),
s AS (SELECT doc_id, list_distinct(list_transform(
        generate_series(1, GREATEST(length(t) - 4, 1)),
        i -> substr(t, i, 5))) AS sh
      FROM n),
d AS (SELECT doc_id, sh, len(sh) AS nsh FROM s)
"""


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    claimed = con.sql(
        f"SELECT a_id, b_id, jaccard FROM '{out_dir}/dedup_minhash_full/*.parquet' "
        "ORDER BY jaccard DESC, a_id, b_id").fetchall()
    if not claimed:
        print("FAIL: empty claim")
        sys.exit(1)
    con.execute("CREATE TABLE claim(a_id BIGINT, b_id BIGINT, jaccard DOUBLE)")
    con.executemany("INSERT INTO claim VALUES (?, ?, ?)", claimed)
    ok = True

    # 1. soundness: exact recomputation of every claimed pair
    bad = con.sql(f"""
        WITH {SHINGLE_CTE}
        SELECT c.a_id, c.b_id, c.jaccard,
               ROUND(len(list_intersect(da.sh, db.sh))
                     / (da.nsh + db.nsh - len(list_intersect(da.sh, db.sh))),
                     4) AS true_j
        FROM claim c
        JOIN d da ON da.doc_id = c.a_id
        JOIN d db ON db.doc_id = c.b_id
        WHERE true_j != c.jaccard OR true_j < 0.6""").fetchall()
    if bad:
        print(f"FAIL soundness: {len(bad)} claimed pairs mis-scored, e.g. {bad[:3]}")
        ok = False
    else:
        print(f"PASS soundness: all {len(claimed)} claimed pairs replay exactly")

    # 2. top-100 completeness via lossless prefix filter at J100
    j100 = min(j for _, _, j in claimed)
    # small slack below the rounded J100 so raw scores that round up to
    # it cannot slip past the filter
    t = j100 - 0.001
    if len(claimed) < 100:
        # LIMIT did not bind: completeness must hold all the way down to
        # the gate threshold itself
        t = 0.6 - 0.001
    if t >= 0.75:
        exact = con.sql(f"""
            WITH {SHINGLE_CTE},
            e AS (SELECT doc_id, unnest(sh) AS g FROM s),
            df AS (SELECT g, COUNT(*) AS dfreq FROM e GROUP BY 1),
            ordd AS (SELECT e.doc_id, e.g,
                ROW_NUMBER() OVER (PARTITION BY e.doc_id
                                   ORDER BY df.dfreq, e.g) AS pos
              FROM e JOIN df USING (g)),
            pref AS (SELECT o.doc_id, o.g, d.nsh
              FROM ordd o JOIN d USING (doc_id)
              WHERE o.pos <= d.nsh - CAST(CEIL({t} * d.nsh) AS BIGINT) + 1),
            cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id
              WHERE LEAST(a.nsh, b.nsh) >= {t} * GREATEST(a.nsh, b.nsh)),
            p AS (SELECT c.a_id, c.b_id,
                len(list_intersect(da.sh, db.sh)) AS inter, da.nsh AS na,
                db.nsh AS nb
              FROM cand c JOIN d da ON da.doc_id = c.a_id
                          JOIN d db ON db.doc_id = c.b_id)
            SELECT a_id, b_id, ROUND(inter / (na + nb - inter), 4) AS j
            FROM p WHERE ROUND(inter / (na + nb - inter), 4) >= {j100}
            ORDER BY j DESC, a_id, b_id LIMIT {len(claimed)}""").fetchall()
        if [(a, b, j) for a, b, j in exact] == claimed:
            print(f"PASS completeness: claim == exact top-{len(claimed)} at "
                  f"J100={j100} (prefix filter t={t:.4f})")
        else:
            missing = set((a, b) for a, b, _ in exact) - \
                set((a, b) for a, b, _ in claimed)
            print(f"FAIL completeness: exact top-{len(claimed)} differs; "
                  f"e.g. missing pairs {sorted(missing)[:5]}")
            ok = False
    else:
        print(f"WARN completeness: J100={j100} < 0.75 — prefix filter not "
              "selective at this threshold; relying on the absence sample "
              "only (weaker evidence)")

    # 3. seeded absence sample: no sampled pair may outrank a claimed one
    # while missing from the claim
    ids = [r[0] for r in con.sql(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    rng = random.Random(42)
    sample = set()
    while len(sample) < 200_000:
        a, b = rng.choice(ids), rng.choice(ids)
        if a != b:
            sample.add((min(a, b), max(a, b)))
    con.execute("CREATE TABLE samp(a_id BIGINT, b_id BIGINT)")
    con.executemany("INSERT INTO samp VALUES (?, ?)", sorted(sample))
    last_a, last_b, last_j = claimed[-1]
    offenders = con.sql(f"""
        WITH {SHINGLE_CTE},
        p AS (SELECT sp.a_id, sp.b_id,
            len(list_intersect(da.sh, db.sh)) AS inter, da.nsh AS na,
            db.nsh AS nb
          FROM samp sp JOIN d da ON da.doc_id = sp.a_id
                       JOIN d db ON db.doc_id = sp.b_id
          WHERE LEAST(da.nsh, db.nsh) >= 0.6 * GREATEST(da.nsh, db.nsh)),
        j AS (SELECT a_id, b_id, ROUND(inter / (na + nb - inter), 4) AS j
              FROM p WHERE inter / (na + nb - inter) >= 0.6)
        SELECT j.a_id, j.b_id, j.j FROM j
        LEFT JOIN claim c ON c.a_id = j.a_id AND c.b_id = j.b_id
        WHERE c.a_id IS NULL
          AND (j.j > {last_j} OR (j.j = {last_j}
               AND (j.a_id < {last_a} OR (j.a_id = {last_a}
                    AND j.b_id < {last_b}))))""").fetchall()
    if offenders:
        print(f"FAIL absence sample: {len(offenders)} sampled pairs outrank "
              f"the claim but are missing, e.g. {offenders[:3]}")
        ok = False
    else:
        print("PASS absence sample: 200k seeded pairs contain no missing "
              "pair that outranks the claim")

    print("SWEEP_MINHASH " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
