"""Build the SCALING.md ratio table from two bench JSON lines.

Usage: python tools/scaling_report.py <sf0.01.json> <sf0.1.json>
Prints the markdown table rows (sorted by sf0.1 cost desc) plus the
like-for-like comparison against a previous round's BENCH json when
given as a third argument.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)["queries"]
    raise SystemExit(f"no JSON line in {path}")


def main() -> None:
    small = load(sys.argv[1])
    big = load(sys.argv[2])
    rows = [(name, small.get(name), t) for name, t in big.items()]
    rows.sort(key=lambda r: -r[2])
    print("| query | sf0.01 (s) | sf0.1 (s) | ratio on 10x data |")
    print("|---|---|---|---|")
    for name, s, b in rows:
        if b < 0.7 and (s or 0) < 0.7:
            continue  # noise-dominated; summarized below the table
        ratio = f"{b / s:.1f}x" if s else "n/a"
        s_txt = f"{s:.2f}" if s is not None else "elided"
        print(f"| {name} | {s_txt} | {b:.2f} | {ratio} |")
    fast = [(n, s, b) for n, s, b in rows if b < 0.7 and (s or 0) < 0.7]
    tot_s = sum(s for _, s, _ in rows if s is not None)
    tot_b = sum(b for _, _, b in rows)
    print(f"\nfast tail: {len(fast)} queries under 0.7 s at both SFs "
          f"(sum {sum(b for _, _, b in fast):.1f} s at sf0.1)")
    print(f"totals: sf0.01 {tot_s:.1f} s -> sf0.1 {tot_b:.1f} s")

    if len(sys.argv) > 3:
        prev = load(sys.argv[3])
        common = [n for n in big if n in prev and not n.startswith("stage:")]
        ratios = sorted(big[n] / prev[n] for n in common if prev[n] > 0)
        med = statistics.median(ratios)
        worst = sorted(((big[n] / prev[n], n) for n in common if prev[n] > 0),
                       reverse=True)[:5]
        print(f"\nvs previous round: {len(common)} common queries, "
              f"median ratio {med:.2f}x")
        print("worst 5:", ", ".join(f"{n} {r:.2f}x" for r, n in worst))


if __name__ == "__main__":
    main()
