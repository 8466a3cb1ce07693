#!/usr/bin/env python
"""Per-query bench regression diff (VERDICT.md round-1 next-step #6).

Usage: python tools/bench_diff.py OLD.json NEW.json [--update-md]

Prints a per-query delta table (old, new, ratio), flags any query whose
steady-state time regressed >1.5x, and with --update-md rewrites
BENCHDIFF.md. Exit code 1 when regressions are flagged so the round
log can't miss them. Queries present on only one side are listed as
added/removed, not diffed.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.5


def diff(old_path: str, new_path: str) -> tuple[list[str], list[str]]:
    def load(path):
        d = json.load(open(path))
        # Driver-recorded BENCH_r{N}.json wraps the bench line in "parsed".
        return d["parsed"] if "parsed" in d else d

    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]

    # Build-tier membership: from the newer artifact's tier map when
    # present (BENCH_local.json carries it since round 6), else from
    # bench.py's current classification.
    build_tier = set((new.get("tiers") or {}).get("build_queries", []))
    if not build_tier:
        try:
            import os

            sys.path.insert(
                0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            import bench

            build_tier = set(bench.BUILD_TIER)
        except Exception:
            build_tier = set()

    lines = [
        f"# BENCHDIFF — {old_path} → {new_path}",
        "",
        f"Totals: {old['value']:.3f}s ({len(oq)} queries) → "
        f"{new['value']:.3f}s ({len(nq)} queries), sf={new['sf']}",
    ]
    if build_tier:
        o_serve = sum(t for n, t in oq.items() if n not in build_tier)
        n_serve = sum(t for n, t in nq.items() if n not in build_tier)
        o_build = sum(t for n, t in oq.items() if n in build_tier)
        n_build = sum(t for n, t in nq.items() if n in build_tier)
        lines.append(
            f"Serve tier (steady-state): {o_serve:.3f}s → {n_serve:.3f}s; "
            f"build/audit tier (once per corpus refresh): "
            f"{o_build:.3f}s → {n_build:.3f}s"
        )
    lines += ["", "| query | tier | old s | new s | ratio |", "|---|---|---|---|---|"]
    flagged: list[str] = []
    for name in sorted(set(oq) | set(nq)):
        tier = "build" if name in build_tier else "serve"
        if name not in oq:
            lines.append(f"| {name} | {tier} | — | {nq[name]:.3f} | added |")
            continue
        if name not in nq:
            lines.append(f"| {name} | {tier} | {oq[name]:.3f} | — | removed |")
            continue
        ratio = nq[name] / oq[name] if oq[name] else float("inf")
        mark = " **REGRESSED**" if ratio > THRESHOLD else ""
        lines.append(
            f"| {name} | {tier} | {oq[name]:.3f} | {nq[name]:.3f} | {ratio:.2f}x{mark} |"
        )
        if ratio > THRESHOLD:
            flagged.append(name)
    lines.append("")
    lines.append(
        f"Flagged (> {THRESHOLD}x slower): {', '.join(flagged) if flagged else 'none'}"
    )
    return lines, flagged


def main(argv: list[str]) -> int:
    update_md = "--update-md" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if len(paths) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    lines, flagged = diff(paths[0], paths[1])
    print("\n".join(lines))
    if update_md:
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCHDIFF.md"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
