"""Per-complex disagreement (McNemar) comparison of two matrix rows.

Hit-rate deltas on a 48-complex band are dominated by the complexes
both methods get right/wrong; the informative statistic is the
disagreement split b:c (A-only hits vs B-only hits) and its exact
binomial tail — this is what the README's results paragraph cites.

Usage:
    python tools/significance.py MATRIX.json rowA rowB [metric]
    python tools/significance.py MATRIX_A.json:rowA MATRIX_B.json:rowB

A spec may union several disjoint held-out bands with '+' — e.g.
``m48.json:learned_local+m48_band1300.json:learned_local`` pools the
seed-100 and seed-300 bands into one McNemar test (complex names are
``synth<seed>``, so bands never collide; duplicates are an error).

metric defaults to hit_top1 (hit_top10 also valid).
"""
from __future__ import annotations

import json
import math
import sys


def _load_one(spec: str, default_path: str | None):
    if ":" in spec:
        path, row = spec.rsplit(":", 1)
    else:
        path, row = default_path, spec
    with open(path) as f:
        d = json.load(f)
    return {r["name"]: r for r in d[row]["complexes"]}, row


def _split_pooled(spec: str, default_path: str | None) -> list[str]:
    """Split a '+'-pooled spec into components.

    In the ``path:row`` form every pooled component must contain a
    ':', so a '+'-fragment without one is part of a file path that
    itself contains '+' (e.g. ``runs/v9p+fused/m48.json:row``) and is
    rejoined with the next fragment instead of being mis-parsed as a
    separate spec.  In the ``default_path`` form parts are bare row
    names and split as-is.
    """
    if default_path is not None:
        return spec.split("+")
    parts, buf = [], ""
    for frag in spec.split("+"):
        buf = f"{buf}+{frag}" if buf else frag
        if ":" in frag:
            parts.append(buf)
            buf = ""
    if buf:
        raise SystemExit(
            f"malformed pooled spec {spec!r}: trailing fragment "
            f"{buf!r} has no ':row' suffix")
    return parts


def load_row(spec: str, default_path: str | None):
    """'+'-joined specs pool disjoint bands into one per-complex dict."""
    merged: dict = {}
    rows = []
    for part in _split_pooled(spec, default_path):
        one, row = _load_one(part, default_path)
        dup = set(merged) & set(one)
        if dup:
            raise SystemExit(
                f"bands overlap on {sorted(dup)[:4]}... — pooled "
                f"McNemar needs disjoint complex sets")
        merged.update(one)
        rows.append(row)
    return merged, "+".join(dict.fromkeys(rows))


def binom_tail(b: int, n: int) -> float:
    """Two-sided exact binomial P(X >= max(b, n-b)) * 2 at p=1/2."""
    k = max(b, n - b)
    tail = sum(math.comb(n, i) for i in range(k, n + 1)) / 2 ** n
    return min(1.0, 2 * tail)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    if ":" in sys.argv[1]:
        a, row_a = load_row(sys.argv[1], None)
        b, row_b = load_row(sys.argv[2], None)
        metric = sys.argv[3] if len(sys.argv) > 3 else "hit_top1"
    else:
        path = sys.argv[1]
        a, row_a = load_row(sys.argv[2], path)
        b, row_b = load_row(sys.argv[3], path)
        metric = sys.argv[4] if len(sys.argv) > 4 else "hit_top1"
    names = sorted(set(a) & set(b))
    only_a = [n for n in names if a[n][metric] and not b[n][metric]]
    only_b = [n for n in names if b[n][metric] and not a[n][metric]]
    na = sum(bool(a[n][metric]) for n in names)
    nb = sum(bool(b[n][metric]) for n in names)
    n_dis = len(only_a) + len(only_b)
    p = binom_tail(len(only_a), n_dis) if n_dis else 1.0
    print(f"{metric} over {len(names)} shared complexes:")
    print(f"  {row_a}: {na}/{len(names)} ({na / len(names):.3f})")
    print(f"  {row_b}: {nb}/{len(names)} ({nb / len(names):.3f})")
    print(f"  disagreements {len(only_a)}:{len(only_b)} "
          f"({row_a}-only: {only_a or '-'} | {row_b}-only: "
          f"{only_b or '-'})")
    print(f"  exact McNemar two-sided p = {p:.4f}")


if __name__ == "__main__":
    main()
