#!/usr/bin/env python3
"""Builder-side round snapshot: regenerate the driver-named round artifacts
so the committed tree carries its own evidence chain and judging starts
from a clean `git status` (r10 verdict item 1 — the structural fix for the
artifacts-untracked-at-judging recurrence).

Produces, in the repo root:
  CORRECTNESS_r{N}.json  from a `graft.Verify` dump, in the driver's
                         per-query format (rows/schema/hash match, counts,
                         err; queries without an oracle -> "no_oracle")
  BENCH_r{N}.json        from a `graft.Bench` bench_out.json file record,
                         in the driver's envelope (n/rc/cpus/sf/tail/parsed
                         — with `parsed` populated and `tail` untruncated,
                         which the driver's own stdout scrape can't promise)
  LEAKCHECK.json         re-scanned over tracked files with the round bumped

Usage:
  python3 tools/snapshot.py <round> <sfDir> <verifyOutDir> [bench_out.json]

The driver may later overwrite these with its own runs; the point is that
the snapshot COMMIT is self-consistent — the same commit that claims the
round's results carries the records backing them.
"""
import hashlib
import json
import math
import os
import re
import subprocess
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(v))
            elif isinstance(v, bool):
                vals.append(str(v))
            elif isinstance(v, (list, tuple)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def correctness(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    queries = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    rec = {}
    for name in queries:
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            got_rel = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_names = [d[0].lower() for d in got_rel.description]
            got_cols = sorted(got_names)
            gidx = [got_names.index(c) for c in got_cols]
            got = canon([[r[i] for i in gidx] for r in got_rel.fetchall()])
            entry["spark_rows"] = len(got)
        except Exception as e:
            entry["err"] = f"engine output unreadable: {str(e)[:160]}"
            rec[name] = entry
            continue
        if name not in oracle:
            entry["err"] = "no_oracle"
            rec[name] = entry
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_names = [d[0].lower() for d in exp_rel.description]
            exp_cols = sorted(exp_names)
            idx = [exp_names.index(c) for c in exp_cols]
            exp = canon([[r[i] for i in idx] for r in exp_rel.fetchall()])
        except Exception as e:
            entry["err"] = f"oracle error: {str(e)[:160]}"
            rec[name] = entry
            continue
        entry["oracle_rows"] = len(exp)
        entry["rows_match"] = len(exp) == len(got)
        entry["schema_match"] = exp_cols == got_cols
        entry["hash_match"] = (
            hashlib.md5(repr(exp).encode()).hexdigest()
            == hashlib.md5(repr(got).encode()).hexdigest())
        rec[name] = entry
    return rec


def _sf_of(sf_field, default=0.1):
    """Bench emits "sf" as the data dir (e.g. .../sf0.1); reduce it to the
    numeric scale factor so the envelope isn't mislabelled for non-sf0.1
    runs (and never hardcoded)."""
    m = re.search(r"sf([0-9.]+)", str(sf_field or ""))
    try:
        return float(m.group(1).rstrip(".")) if m else default
    except ValueError:
        return default


CONTENTION_BAR = 1.5


def contention_check(record, rnd):
    """Median per-query ratio of this run vs the newest committed
    quiet-machine record (BENCH_local_r*.json) from a PRIOR round — the
    same round's local record is this very run, and a self-ratio of 1.0
    would mask contention. Twice (r13, r14) a committed driver BENCH
    record was silently distorted by host load and had to be adjudicated
    by hand — above CONTENTION_BAR the envelope is stamped "contended" so
    no future reader mistakes load for a regression. Returns
    (ratio, reference_file) or (None, None)."""
    def round_of(f):
        m = re.fullmatch(r"BENCH_local_r(\d+)\w*\.json", f)
        return int(m.group(1)) if m else None
    records = sorted(
        (f for f in os.listdir(".")
         if round_of(f) is not None and round_of(f) < rnd),
        key=lambda f: (round_of(f), f))
    if not records:
        return None, None
    ref_file = records[-1]
    try:
        refrec = json.load(open(ref_file))
        refsum = refrec.get("summary", {})
        cursum = record.get("summary", {})
        # only same-shape runs are comparable: ratioing an sf1 run
        # against an sf0.1 reference (or across cpu counts) would stamp
        # a quiet machine "contended" — the inverse of the stamp's job
        if (_sf_of(cursum.get("sf")) != _sf_of(refsum.get("sf"))
                or cursum.get("cpus") != refsum.get("cpus")):
            return None, None
        # prefer the full per-query map over the slow-query summary
        # subset: the subset skews disk-heavy and overstates drift
        ref = refrec.get("queries_all") or refsum.get("queries", {})
    except Exception:
        return None, None
    cur = (record.get("queries_all")
           or record.get("summary", {}).get("queries", {}))
    ratios = sorted(cur[q] / ref[q] for q in cur
                    if q in ref and ref[q] and ref[q] > 0)
    if not ratios:
        return None, None
    mid = len(ratios) // 2
    med = (ratios[mid] if len(ratios) % 2
           else (ratios[mid - 1] + ratios[mid]) / 2)
    return round(med, 3), ref_file


def bench_envelope(rnd, bench_out_path):
    b = json.load(open(bench_out_path))
    summary = b.get("summary", {})
    env = {
        "n": rnd,
        "rc": 0 if not summary.get("errors") else 1,
        "cpus": summary.get("cpus"),
        "sf": _sf_of(summary.get("sf")),
        "tail": None,  # filled after any contention stamp
        "parsed": summary,
    }
    ratio, ref_file = contention_check(b, rnd)
    if ratio is not None:
        env["median_ratio_vs_quiet"] = ratio
        env["quiet_reference"] = ref_file
        if ratio > CONTENTION_BAR:
            env["contended"] = True
            print(f"WARNING: median per-query ratio {ratio} vs {ref_file} "
                  f"exceeds {CONTENTION_BAR} — run taken under host "
                  f"contention; envelope stamped contended=true. Re-run on "
                  f"a quiet machine (loadavg < 1) for the committed record.")
    env["tail"] = json.dumps(summary, separators=(",", ":"))
    return env


# Leak scan: each category's pattern is assembled from fragments so this
# file never matches itself; tracked text files only.
LEAK_PATTERNS = {
    "internal-import": r"(?:import|from)\s+(?:" + "anthro" + r"pic\w*|" + "clau" + r"de_internal|" + "ax" + r"on\w*)",
    "internal-url": r"https?://\S*(?:" + "anthro" + r"pic\.com|" + "corp\\." + r"\w+\.internal)",
    "internal-pkg2": r"@" + "anthro" + r"pic-ai/|" + "clau" + r"de-cli-internal",
    "internal-bucket": r"(?:s3|gs)://\S*(?:" + "anthro" + r"pic|" + "clau" + r"de-internal)",
    "slack-link": r"sl" + r"ack\.com/archives/|#" + "clau" + r"de-code-\w+",
    "api-key": r"sk-" + "ant-" + r"[A-Za-z0-9_-]{8,}",
    "axon-env": r"\b" + "AX" + r"ON_[A-Z_]+\b",
}


def leakcheck(rnd):
    files = subprocess.run(["git", "ls-files"], capture_output=True,
                           text=True, check=True).stdout.split()
    hits = {k: [] for k in LEAK_PATTERNS}
    skip = {"LEAKCHECK.json", "tools/snapshot.py"}
    for f in files:
        if f in skip or not os.path.isfile(f):
            continue
        try:
            text = open(f, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        for cat, pat in LEAK_PATTERNS.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}")
    return {"round": rnd, "n_hits": sum(len(v) for v in hits.values()),
            "hits": hits}


def main():
    rnd = int(sys.argv[1])
    sf_dir, out_dir = sys.argv[2], sys.argv[3]
    bench_out = sys.argv[4] if len(sys.argv) > 4 else None

    rec = correctness(sf_dir, out_dir)
    with open(f"CORRECTNESS_r{rnd:02d}.json", "w") as f:
        json.dump(rec, f, indent=1)
    n_pass = sum(1 for e in rec.values() if e["hash_match"])
    n_none = sum(1 for e in rec.values() if e["err"] == "no_oracle")
    n_bad = sum(1 for e in rec.values()
                if e["err"] not in (None, "no_oracle")
                or e["hash_match"] is False)
    print(f"CORRECTNESS_r{rnd:02d}.json: {len(rec)} queries, "
          f"{n_pass} hash-match, {n_none} no_oracle, {n_bad} failing")

    if bench_out:
        env = bench_envelope(rnd, bench_out)
        with open(f"BENCH_r{rnd:02d}.json", "w") as f:
            json.dump(env, f, indent=1)
        print(f"BENCH_r{rnd:02d}.json: total "
              f"{env['parsed'].get('value')} s, errors "
              f"{env['parsed'].get('errors')}")

    lk = leakcheck(rnd)
    with open("LEAKCHECK.json", "w") as f:
        json.dump(lk, f, indent=2)
    print(f"LEAKCHECK.json: round {rnd}, {lk['n_hits']} hits")
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
