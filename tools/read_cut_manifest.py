#!/usr/bin/env python3
"""Engineless consumer of an exported cut manifest
(graft.api.Engine.exportCutManifest) — the portability proof behind
e16: a reader with plain pyarrow, no Spark, no JVM, no engine,
reproduces a recorded cut exactly from the manifest alone.

The documented contract (Engine.exportCutManifest scaladoc): per
table the manifest lists the cut generation, every concrete data
file (with sizes), and the generation's as-of tombstones. The read
recipe is: read the listed files, apply one kill predicate per
tombstone entry (NOT (subject = s AND __seq <= g)), drop __seq.

Usage:
  read_cut_manifest.py <manifest.json>
      → per-table row counts and per-(table, subject) aggregates
  read_cut_manifest.py <manifest.json> --expect <verify_dump_dir>
      → additionally row-match the (tbl, subject, n, total) aggregate
        against the e16_cut_manifest Verify parquet dump (which the
        in-JVM query REQUIREd equal to openSnapshotAllAt), exiting
        non-zero on any divergence.
"""
import glob
import json
import math
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def local_path(p):
    # the manifest stores Hadoop Path.toString; strip a file: scheme
    if p.startswith("file://"):
        return p[len("file:"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


def read_cut_table(manifest, tbl):
    """The documented recipe: listed files -> kill predicate -> drop
    __seq. Returns None for a generation-0 (never-committed) table."""
    node = manifest["tables"][tbl]
    files = [local_path(f["path"]) for f in node["files"]]
    if not files:
        return None
    tab = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="permissive")
    dead = None
    for subj, gen in node["tombstones"].items():
        d = pc.and_(pc.equal(tab["subject"], subj),
                    pc.less_equal(tab["__seq"], gen))
        dead = d if dead is None else pc.or_(dead, d)
    if dead is not None:
        tab = tab.filter(pc.invert(dead))
    return tab.drop_columns(["__seq"])


def round_half_up(x, nd=2):
    # Spark's round() is HALF_UP; Python's round() is banker's
    m = 10 ** nd
    return math.floor(x * m + 0.5) / m


def aggregates(manifest):
    """(tbl, subject) -> (n, round(sum(value), 2)) — the e16 output
    shape, recomputed with no engine."""
    out = {}
    for tbl in sorted(manifest["tables"]):
        tab = read_cut_table(manifest, tbl)
        if tab is None:
            continue
        g = tab.group_by("subject").aggregate(
            [("value", "sum"), ("subject", "count")])
        for i in range(g.num_rows):
            subj = g["subject"][i].as_py()
            out[(tbl, subj)] = (g["subject_count"][i].as_py(),
                                round_half_up(g["value_sum"][i].as_py()))
    return out


def main():
    manifest_path = sys.argv[1]
    expect = None
    if len(sys.argv) > 3 and sys.argv[2] == "--expect":
        expect = sys.argv[3]
    manifest = json.load(open(manifest_path))
    got = aggregates(manifest)
    for (tbl, subj), (n, total) in sorted(got.items()):
        print(f"  {tbl}.{subj}: n={n} total={total}")
    if expect is None:
        return 0
    exp_files = sorted(glob.glob(f"{expect}/*.parquet"))
    if not exp_files:
        print(f"no expected parquet under {expect}", file=sys.stderr)
        return 2
    exp = pa.concat_tables([pq.read_table(f) for f in exp_files])
    want = {}
    for i in range(exp.num_rows):
        want[(exp["tbl"][i].as_py(), exp["subject"][i].as_py())] = (
            exp["n"][i].as_py(), exp["total"][i].as_py())
    ok = True
    for key in sorted(set(got) | set(want)):
        g, w = got.get(key), want.get(key)
        if g is None or w is None:
            print(f"MISMATCH {key}: pyarrow={g} engine={w}",
                  file=sys.stderr)
            ok = False
        elif g[0] != w[0] or abs(g[1] - w[1]) > 1e-9:
            print(f"MISMATCH {key}: pyarrow={g} engine={w}",
                  file=sys.stderr)
            ok = False
    print("pyarrow manifest read row-matches the engine cut"
          if ok else "pyarrow manifest read DIVERGED", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
