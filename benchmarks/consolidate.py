"""Idempotent benchmark-result consolidation.

Round 3 lost three authored artifacts because results were consolidated
into ``results_rNN.json`` exactly once, mid-round, and everything run
later missed the file.  This tool closes that failure mode: every
benchmark run is captured to ``benchmarks/out_<anything>.json`` (the
benchmark's ONE stdout JSON line, e.g. ``python benchmarks/foo.py >
benchmarks/out_foo.json``) and ``consolidate.py`` upserts every capture
into the round's results file, keyed by the payload's ``metric`` name —
re-running it is always safe, newest capture wins.

Usage (repo root)::

    python benchmarks/consolidate.py --round 4 [extra1.json ...]

With no explicit files it scans ``benchmarks/out_*.json``.  The round's
``results_rNN.json`` is created from the newest previous round's
hardware/workloads header when absent.
"""
import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def load_capture(path):
    """Last JSON line of a capture file (benchmarks log progress to
    stderr and print exactly one JSON object on stdout)."""
    with open(path) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    if not lines:
        raise ValueError(f"{path}: empty capture")
    payload = json.loads(lines[-1])
    if "metric" not in payload:
        raise ValueError(f"{path}: no 'metric' key in payload")
    return payload


def results_path(round_no):
    return os.path.join(HERE, f"results_r{round_no:02d}.json")


def load_or_seed_results(round_no):
    path = results_path(round_no)
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    prior = sorted(glob.glob(os.path.join(HERE, "results_r*.json")))
    header = {"hardware": "", "workloads": ""}
    if prior:
        with open(prior[-1]) as fh:
            old = json.load(fh)
        header = {k: old.get(k, "") for k in ("hardware", "workloads")}
    return {"round": round_no, **header, "results": []}


def upsert(doc, payload):
    for i, row in enumerate(doc["results"]):
        if row.get("metric") == payload["metric"]:
            doc["results"][i] = payload
            return "updated"
    doc["results"].append(payload)
    return "added"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="round number (default: inferred from the "
                    "newest results_rNN.json, else 1)")
    ap.add_argument("captures", nargs="*",
                    help="capture files (default: benchmarks/out_*.json)")
    args = ap.parse_args(argv)

    round_no = args.round
    if round_no is None:
        prior = sorted(glob.glob(os.path.join(HERE, "results_r*.json")))
        round_no = (int(re.search(r"results_r(\d+)", prior[-1]).group(1))
                    if prior else 1)

    captures = args.captures or sorted(
        glob.glob(os.path.join(HERE, "out_*.json")))
    if not captures:
        print("no captures found", file=sys.stderr)
        return 1

    doc = load_or_seed_results(round_no)
    for path in captures:
        try:
            payload = load_capture(path)
        except (ValueError, json.JSONDecodeError) as exc:
            print(f"skip {path}: {exc}", file=sys.stderr)
            continue
        action = upsert(doc, payload)
        print(f"{action}: {payload['metric']}  <- {os.path.basename(path)}",
              file=sys.stderr)

    with open(results_path(round_no), "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {results_path(round_no)} "
          f"({len(doc['results'])} metrics)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
