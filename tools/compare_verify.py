#!/usr/bin/env python3
"""Round-6 result-identity check: compare two graft.Verify output dirs
query by query (row multisets, order-independent; schema names+types).
Usage: compare_verify.py <baselineDir> <candidateDir>"""
import sys, os, json, hashlib
import pyarrow.parquet as pq

def canon(d, q):
    p = os.path.join(d, q)
    t = pq.read_table(p)
    schema = [(f.name, str(f.type)) for f in t.schema]
    rows = sorted(
        tuple(str(c) for c in row)
        for row in zip(*[t.column(i).to_pylist() for i in range(t.num_columns)])
    ) if t.num_columns else []
    h = hashlib.sha256(json.dumps(rows).encode()).hexdigest()[:16]
    return schema, len(rows), h

def main():
    base, cand = sys.argv[1], sys.argv[2]
    qs = sorted(d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d)))
    bad = 0
    for q in qs:
        if not os.path.isdir(os.path.join(cand, q)):
            print(f"MISSING  {q}"); bad += 1; continue
        bs, bn, bh = canon(base, q)
        cs, cn, ch = canon(cand, q)
        if bs != cs: print(f"SCHEMA   {q}: {bs} != {cs}"); bad += 1
        elif (bn, bh) != (cn, ch): print(f"ROWS     {q}: {bn}/{bh} != {cn}/{ch}"); bad += 1
    # oracle_sql must be byte-identical (frozen)
    with open(os.path.join(base, "oracle_sql.json")) as f: bo = f.read()
    with open(os.path.join(cand, "oracle_sql.json")) as f: co = f.read()
    if bo != co: print("ORACLE_SQL DIFFERS"); bad += 1
    print(f"{'IDENTICAL' if bad == 0 else 'DIFFERENCES: %d' % bad} over {len(qs)} queries")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
