#!/usr/bin/env python3
"""Scale-correctness replica of tools/check_oracle.py for amplified
(directory-per-table) fixture dirs. Skips the queries whose ORACLE
formulation is intentionally quadratic (exhaustive cross joins that the
engine exists to avoid) — their engine side is still exercised by Bench
at sf1; their correctness is pinned at sf0.01 where the exhaustive
oracle is tractable."""
import sys, json, os
import duckdb
import numpy as np
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout_sf1"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"

# oracle-side quadratic (cross-join / all-pairs SQL), not engine-side:
SKIP = {
    "q_similarity_knn",   # exhaustive n x q scoring in SQL
    "q_embed_neardup",    # exhaustive n^2/2 cross join in SQL
    "q_minhash_dupes",    # oracle verifies against all-pairs jaccard
    "q_ngram_jaccard",    # same
    "q_simhash_dupes",    # all-pairs hamming oracle
    "q_dup_clusters",     # recursive CTE over the all-pairs set
    "q_cross_dedup",      # same inverted-index shingle join as minhash
    "q_decontaminate_embed",  # corpus x benchmark cross join in SQL; the
                              # benchmark side grows with sf so the oracle
                              # (not the engine kernel) is quadratic
    # q_knn_classify left this list in round 13: its query panel became
    # a FIXED 100 vectors (vec_id < 100), so the oracle is 100 x n —
    # linear, tractable at sf1.
    "q_cluster_dedup",    # recursive CTE over the all-pairs set (q_dup_clusters rule)
    "q_edit_dupes",       # all-pairs Levenshtein oracle; the engine side is
                          # PassJoin-blocked (linear emit + equi-join)
    "q_phash_dupes",      # all-pairs hamming oracle; the engine side is
                          # pigeonhole-banded (q_simhash_dupes rule)
    "q_streaming_neardup",  # two-batch admission replay over the same
                            # all-pairs jaccard set as q_minhash_dupes
    "q_streaming_embed_neardup",  # same replay over the all-pairs
                                  # cosine set (q_embed_neardup rule)
}

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else (f"'{p}'" if os.path.exists(p) else None)
    if src is None:
        continue
    if t == "events":
        # amplified events carry ts as whatever the source fixture had:
        # raw nanos INT64 on pre-regeneration fixtures, TIMESTAMP(MICROS)
        # after the 2026-08-13 regeneration. Dispatch on the scanned type,
        # exactly as Tables.events does on the Spark side.
        ts_type = str(con.sql(f"SELECT ts FROM {src} LIMIT 0").types[
            [c.lower() for c in con.sql(f"SELECT ts FROM {src} LIMIT 0").columns].index("ts")])
        if ts_type.upper().startswith("BIGINT"):
            con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    else:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

# Planted-pair evidence for the SKIP queries (PlantedOracleDrive writes
# target/planted_sf1.json): linear-cost constructed oracles at sf1 —
# injected known-dup pairs with globally unique vocabulary / exact-copy
# vectors, exact-set or full-recall assertions on the planted slice.
#
# Staleness gate (ADVICE r17): a planted file left over from a PRIOR
# round would silently vouch for a query after a regression. A planted
# file only counts when it is at least as new as the Verify dump being
# checked (outdir/oracle_sql.json mtime) — run the planted drives AFTER
# Verify. Stale files are reported loudly and their queries fall back
# to the skip accounting. The drives also stamp a "_meta" provenance
# entry (src dir + fixture mtime), echoed here for the audit trail.
planted = {}
_verify_mtime = os.path.getmtime(f"{outdir}/oracle_sql.json")
# the streaming-admission arms' planted evidence lands in its own file
# (graft.drive.StreamingPlantedDrive, round 17): merge it the same way
_seen_main = False
for cand in ("target/planted_sf1.json",
             os.path.join(os.path.dirname(outdir), "planted_sf1.json"),
             "target/planted_stream_sf1.json"):
    if os.path.exists(cand):
        if os.path.getmtime(cand) < _verify_mtime:
            print(f"STALE {cand}: predates {outdir}/oracle_sql.json — "
                  "ignored (re-run the planted drive after Verify)")
            continue
        doc = json.load(open(cand))
        meta = doc.pop("_meta", None)
        if meta:
            print(f"planted {cand}: src={meta.get('src')} "
                  f"src_mtime_ms={meta.get('src_mtime_ms')} "
                  f"written_ms={meta.get('written_ms')}")
        # first hit wins for the MAIN planted file's two locations;
        # the streaming file is additive (disjoint query names)
        if cand.endswith("planted_stream_sf1.json"):
            planted.update(doc)
        elif not _seen_main:
            planted.update(doc)
            _seen_main = True

fails, ok, skipped = [], 0, 0
for name, sql in sorted(oracle.items()):
    if name in SKIP:
        if name in planted:
            p = planted[name]
            if p.get("planted_ok"):
                print(f"OK   {name} [planted-pair oracle] {p.get('detail', '')}")
                ok += 1
            else:
                print(f"FAIL {name} [planted-pair oracle] {p.get('detail', '')}")
                fails.append(name)
        else:
            skipped += 1
        continue
    spath = f"{outdir}/{name}"
    try:
        sdf = norm(con.sql(f"SELECT * FROM '{spath}/*.parquet'").df())
        odf = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails.append(name)
        continue
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(odf.columns)}")
        fails.append(name)
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
        fails.append(name)
        continue
    good, fp_only = True, False
    for c in sdf.columns:
        a, b = sdf[c].values, odf[c].values
        if np.issubdtype(a.dtype, np.floating):
            if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                # multi-split parquet reorders double summation vs the
                # single-file sf0.01 case: classify tiny drift separately
                if np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-6, equal_nan=True):
                    fp_only = True
                else:
                    d = np.nanmax(np.abs(a.astype(float) - b.astype(float)))
                    print(f"FAIL {name}.{c}: max abs diff {d}")
                    good = False
        else:
            if not (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all():
                m = pd.Series(a).astype(str) != pd.Series(b).astype(str)
                i = int(np.argmax(m.values))
                print(f"FAIL {name}.{c}: first diff row {i}: {a[i]!r} vs {b[i]!r}")
                good = False
    if not good:
        fails.append(name)
        continue
    print(f"OK   {name} ({len(sdf)} rows)" + ("  [fp-ordering tolerance]" if fp_only else ""))
    ok += 1

print(f"\n{ok}/{ok + len(fails)} oracle-matched at scale; {skipped} skipped "
      f"(quadratic oracle formulations, correctness pinned at sf0.01); fails: {fails}")
sys.exit(1 if fails else 0)
