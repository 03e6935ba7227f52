"""Compare two BENCH_detail_r{N}.json files: per-query ratios, new and
removed entries, group subtotals — the cross-round regression check
that previously required re-running the whole fleet.

Usage:
    python scripts/bench_diff.py BENCH_detail_r08.json BENCH_detail_r09.json
    python scripts/bench_diff.py old.json new.json --threshold 1.5

Prints queries whose median changed by more than ``--threshold`` x in
either direction (sub-0.2 s queries are skipped — they sit inside
scheduling noise), the group subtotal drift, and the fleet headline.
Exit code 1 when any regression above threshold exists, so the check
can gate CI.

ANCHOR NORMALIZATION (round 12): raw cross-round ratios conflate code
changes with box state — rounds 10->11 read 1.44x fleet-wide purely
from a loaded box, costing a day of commit-level A/B attribution.
The TPC-H group subtotal is code-frozen across rounds, so its ratio
IS the box drift; every per-query ratio is therefore also reported
DIVIDED by the anchor ratio (``norm`` column), and queries whose
NORMALIZED ratio exceeds ``--ab-threshold`` (default 1.4) are printed
as the A/B WATCH LIST — the entries that genuinely need the
commit-level A/B protocol (unchanged-tree worktree, 4 reps,
clearCache, medians) rather than a shrug at the weather.
"""

from __future__ import annotations

import argparse
import json
import sys


def flat_queries(detail: dict) -> dict[str, float]:
    out: dict[str, float] = {}
    for g in detail["groups"].values():
        out.update(g["queries"])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratios above this (and below 1/this)")
    ap.add_argument("--min-seconds", type=float, default=0.2,
                    help="ignore queries faster than this in BOTH runs")
    ap.add_argument("--ab-threshold", type=float, default=1.4,
                    help="anchor-NORMALIZED ratio above which a query "
                         "joins the A/B watch list")
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    qo, qn = flat_queries(old), flat_queries(new)

    # box-drift anchor.  Prefer the WARM end-of-run anchor (r13+ —
    # the frozen order runs tpch FIRST, so its in-fleet subtotal
    # carries a cold-JVM position penalty and measures position, not
    # box); fall back to the tpch group subtotal when either file
    # predates the field.
    anchor = 1.0
    wo = old.get("headline", {}).get("anchor_warm", {})
    wn = new.get("headline", {}).get("anchor_warm", {})
    common = sorted(set(wo) & set(wn))
    if common:
        # r14: anchors are compared on their INTERSECTION (r13 files
        # carry {q1, q6}; r14+ adds token_stats), and each anchor's
        # own ratio is printed as a cross-check — the TPC-H pair
        # shares one scan/agg shape, so a third-family anchor
        # (text_corpus) separates JVM-warmth from genuine box drift;
        # a large spread between per-anchor ratios means "do not
        # trust the normalization, A/B instead".
        ao = sum(wo[n] for n in common)
        an = sum(wn[n] for n in common)
        anchor = an / ao
        per = ", ".join(
            f"{n} {wn[n] / wo[n]:.2f}x" for n in common if wo[n] > 0)
        print(f"warm anchor ({len(common)} common): {ao:.2f}s -> "
              f"{an:.2f}s (box drift {anchor:.2f}x; 'norm' columns "
              f"divide by it; per-anchor cross-check: {per})")
    else:
        ao = sum(old["groups"].get("tpch", {})
                 .get("queries", {}).values())
        an = sum(new["groups"].get("tpch", {})
                 .get("queries", {}).values())
        if ao > 0 and an > 0:
            anchor = an / ao
            print(f"tpch anchor: {ao:.2f}s -> {an:.2f}s "
                  f"(box drift {anchor:.2f}x; 'norm' columns divide "
                  f"by it) [in-fleet subtotal — cold-position-biased "
                  f"under the r13+ frozen order; prefer files with "
                  f"anchor_warm]")
        else:
            print("anchor missing in one file — norm == raw")

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print(f"new queries ({len(added)}): "
              + ", ".join(f"{n} ({qn[n]:.2f}s)" for n in added))
    if removed:
        print(f"removed queries ({len(removed)}): " + ", ".join(removed))

    rows = []
    watch = []
    for name in sorted(set(qo) & set(qn)):
        a, b = qo[name], qn[name]
        if max(a, b) < args.min_seconds:
            continue
        ratio = b / a if a > 0 else float("inf")
        norm = ratio / anchor
        # Gate on raw OR normalized: a genuine regression masked by a
        # box speedup (anchor 0.8x, raw 1.4x, norm 1.75x) must still
        # enter `rows` or the CI exit code misses it (round-12 ADVICE).
        if (ratio >= args.threshold or ratio <= 1 / args.threshold
                or norm >= args.threshold):
            rows.append((ratio, norm, name, a, b))
        if norm >= args.ab_threshold:
            watch.append((norm, ratio, name, a, b))
    rows.sort(reverse=True)
    regressions = [r for r in rows if r[1] >= args.threshold]
    if rows:
        print(f"\nchanged >= {args.threshold}x raw (or improved "
              f"<= {1 / args.threshold:.2f}x), min {args.min_seconds}s:")
        for ratio, norm, name, a, b in rows:
            mark = ("REGRESSED" if norm >= args.threshold
                    else "box-drift" if ratio >= args.threshold
                    else "improved")
            print(f"  raw {ratio:6.2f}x  norm {norm:6.2f}x  "
                  f"{name}: {a:.3f}s -> {b:.3f}s  [{mark}]")
    else:
        print("\nno per-query change beyond threshold")

    watch.sort(reverse=True)
    if watch:
        print(f"\nA/B WATCH LIST (norm >= {args.ab_threshold}x — run "
              "the commit-level A/B protocol on these):")
        for norm, ratio, name, a, b in watch:
            print(f"  norm {norm:6.2f}x (raw {ratio:.2f}x)  "
                  f"{name}: {a:.3f}s -> {b:.3f}s")
    else:
        print(f"\nA/B watch list empty (no norm >= "
              f"{args.ab_threshold}x)")

    go = old["headline"]["groups"]
    gn = new["headline"]["groups"]
    print("\ngroup subtotals:")
    for g in sorted(set(go) | set(gn)):
        a, b = go.get(g, 0.0), gn.get(g, 0.0)
        r = f"{b / a:.2f}x" if a else "new"
        print(f"  {g:>15}: {a:8.2f}s -> {b:8.2f}s  ({r})")
    ho, hn = old["headline"], new["headline"]
    print(f"\nfleet: {ho['value']:.1f}s ({len(qo)} queries) -> "
          f"{hn['value']:.1f}s ({len(qn)} queries)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
