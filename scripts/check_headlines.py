"""Headline-number drift gate (VERDICT r4 #5).

Rounds 1-4 duplicated headline numbers by hand into README/ROADMAP/PERF and
one copy repeatedly went stale (r4: README still carried the round-3
capstone). Single source now: `docs/results/HEADLINE.json` maps each
headline to the EXACT string that must appear in README.md, plus the
artifact it was read from. The measurement scripts regenerate the JSON
(scripts/e2e_mlgwsc.py appends its capstone numbers; bench_monthscale.py
its month row); this script only ASSERTS, and runs as a default-on nightly
stage so a stale README fails the nightly.

Usage: python scripts/check_headlines.py            # assert, exit 1 on drift
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADLINE = os.path.join(REPO, "docs", "results", "HEADLINE.json")


def main():
    with open(HEADLINE) as f:
        headlines = json.load(f)
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    failures = []
    for name, spec in headlines.items():
        needle = spec["string"]
        if needle not in readme:
            failures.append(
                f"  {name}: README.md does not contain {needle!r} "
                f"(from {spec.get('source', '?')})")
    if failures:
        print("HEADLINE DRIFT — README.md disagrees with docs/results/HEADLINE.json:")
        print("\n".join(failures))
        print("Update README.md (or regenerate HEADLINE.json from the newest "
              "artifacts) so the two agree.")
        sys.exit(1)
    print(f"headlines OK: {len(headlines)} pinned strings present in README.md")


if __name__ == "__main__":
    main()
