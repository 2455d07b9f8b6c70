#!/usr/bin/env python
"""Merge a validate_quality.py output JSON into QUALITY.json.

validate_quality.py writes a complete fresh document; the repo's
QUALITY.json accumulates additional sections (benchmark, ablations,
rd_label_parity) produced by other scripts. Pointing validate_quality at
QUALITY.json directly would destroy those, so long runs write to a side
file and this helper merges the chosen keys in.

Usage: python scripts/merge_quality.py /tmp/quality_r5.json \
    [--keys config,pairs,rr,full_chain,wall_s] [--out QUALITY.json]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("--keys", default="config,pairs,rr,full_chain,wall_s")
    ap.add_argument("--as", dest="as_key", default=None,
                    help="nest the selected keys under this single "
                         "top-level key (e.g. ablation_g24) instead of "
                         "merging them at top level")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    args = ap.parse_args()

    with open(args.src) as f:
        src = json.load(f)
    try:
        with open(args.out) as f:
            dst = json.load(f)
    except Exception:
        dst = {}
    picked = {}
    for k in args.keys.split(","):
        if k in src:
            picked[k] = src[k]
        else:
            print(f"warning: key {k!r} not in {args.src}")
    if args.as_key:
        dst[args.as_key] = picked
    else:
        dst.update(picked)
    with open(args.out, "w") as f:
        json.dump(dst, f, indent=2)
    where = f"under {args.as_key!r} in" if args.as_key else "into"
    print(f"merged {args.keys} from {args.src} {where} {args.out}")


if __name__ == "__main__":
    main()
