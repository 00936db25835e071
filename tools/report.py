"""Benchmark report artifact: hit-rate tables + docking funnel figures.

Round-2 VERDICT #9: the reference's results layer ships hit-rate tables
AND figures [U: DeepLocalProteinDocking results scripts, README figures
— mount empty, unverified]; this tool renders both from one or more
evaluation output directories (the per-complex ``<name>.json`` files
written by evaluation.run_benchmark / run_benchmark_batched or the
eval-matrix JSONs from tools/eval_matrix.py).

Usage:
    python tools/report.py OUT_DIR label=eval_dir [label=eval_dir ...]
    python tools/report.py OUT_DIR --matrix eval_matrix.json

Outputs in OUT_DIR: ``report.md`` (summary + per-complex tables),
``hit_rates.png`` (grouped method x top-N bars), ``funnels.png``
(score-vs-LRMSD docking funnels, small multiples per complex).

Colors follow the dataviz reference palette (validated categorical
slots, fixed assignment order; single-hue funnels; recessive grid).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Validated categorical palette (dataviz reference instance, slots 1-3
# in fixed order — identity follows the method, never its rank).
_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
_TEXT = "#0b0b0b"
_TEXT2 = "#52514e"
_GRID = "#e5e4e0"
_SURFACE = "#fcfcfb"


def load_eval_dir(path: str):
    """Per-complex results from an evaluation output directory."""
    out = {}
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".json") or fn in ("summary.json",):
            continue
        with open(os.path.join(path, fn)) as f:
            rec = json.load(f)
        if isinstance(rec, dict) and "hit_top10" in rec:
            out[rec.get("name", fn[:-5])] = rec
    return out


def load_matrix(path: str):
    """Methods from a tools/eval_matrix.py JSON (no pose lists)."""
    with open(path) as f:
        m = json.load(f)
    out = {}
    for k, v in m.items():
        if isinstance(v, dict) and "complexes" in v:
            out[k] = {c["name"]: c for c in v["complexes"]}
    return out


def hit_rates(complexes: dict):
    n = max(len(complexes), 1)
    t1 = sum(bool(c.get("hit_top1")) for c in complexes.values()) / n
    t10 = sum(bool(c.get("hit_top10")) for c in complexes.values()) / n
    return t1, t10


def _style_axes(ax):
    ax.set_facecolor(_SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(_GRID)
    ax.tick_params(colors=_TEXT2, labelsize=8)
    ax.yaxis.grid(True, color=_GRID, linewidth=0.8)
    ax.set_axisbelow(True)


def fig_hit_rates(methods: dict, out_png: str):
    """Grouped bars: method identity = categorical hue (fixed order),
    one shared axis (rates in [0, 1])."""
    names = list(methods)
    t1 = [hit_rates(methods[m])[0] for m in names]
    t10 = [hit_rates(methods[m])[1] for m in names]
    x = np.arange(2)                      # top-1, top-10 groups
    w = min(0.8 / max(len(names), 1), 0.28)
    fig, ax = plt.subplots(figsize=(5.4, 3.2), dpi=160)
    fig.patch.set_facecolor(_SURFACE)
    _style_axes(ax)
    for i, m in enumerate(names):
        vals = [t1[i], t10[i]]
        bars = ax.bar(x + (i - (len(names) - 1) / 2) * (w + 0.02),
                      vals, width=w, color=_COLORS[i % len(_COLORS)],
                      label=m, zorder=3)
        for b, v in zip(bars, vals):
            ax.text(b.get_x() + b.get_width() / 2, v + 0.02,
                    f"{v:.2f}", ha="center", va="bottom", fontsize=7,
                    color=_TEXT)
    ax.set_xticks(x, ["top-1 hit rate", "top-10 hit rate"])
    ax.set_ylim(0, 1.12)
    ax.set_yticks(np.arange(0, 1.01, 0.25))
    if len(names) == 1:
        # Single series: the title names it; no legend box.
        ax.set_title(f"Docking hit rates — {names[0]}", fontsize=10,
                     color=_TEXT, loc="left")
    else:
        ax.set_title("Docking hit rates by method", fontsize=10,
                     color=_TEXT, loc="left")
        ax.legend(frameon=False, fontsize=8, loc="upper left",
                  labelcolor=_TEXT)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=_SURFACE)
    plt.close(fig)


def fig_funnels(complexes: dict, out_png: str, max_panels: int = 16):
    """Docking funnels: pose score vs LRMSD, one panel per complex.

    A funnel shape (scores rising as LRMSD falls) is the signature of a
    well-behaved scoring landscape; a flat cloud means the sweep ranked
    decoys as well as near-natives.  Single series per panel -> single
    hue, no legend; the rank-1 pose is highlighted with a dark ring.
    """
    with_poses = {k: v for k, v in complexes.items()
                  if isinstance(v.get("poses"), list) and v["poses"]}
    names = list(with_poses)[:max_panels]
    if not names:
        return False
    ncol = min(4, len(names))
    nrow = -(-len(names) // ncol)
    fig, axes = plt.subplots(nrow, ncol,
                             figsize=(2.6 * ncol, 2.2 * nrow), dpi=160,
                             squeeze=False)
    fig.patch.set_facecolor(_SURFACE)
    for ax in axes.ravel():
        ax.set_visible(False)
    for i, nm in enumerate(names):
        ax = axes[i // ncol][i % ncol]
        ax.set_visible(True)
        _style_axes(ax)
        poses = with_poses[nm]["poses"]
        l = np.asarray([p["lrmsd"] for p in poses])
        s = np.asarray([p["score"] for p in poses])
        ax.scatter(l, s, s=14, color=_COLORS[0], alpha=0.75,
                   linewidths=0, zorder=3)
        ax.scatter(l[:1], s[:1], s=34, facecolors="none",
                   edgecolors="#104281", linewidths=1.4, zorder=4)
        ax.axvline(10.0, color=_GRID, linewidth=1.0, zorder=2)
        ax.set_title(nm, fontsize=8, color=_TEXT, loc="left")
        if i // ncol == nrow - 1:
            ax.set_xlabel("LRMSD (A)", fontsize=8, color=_TEXT2)
        if i % ncol == 0:
            ax.set_ylabel("score", fontsize=8, color=_TEXT2)
    fig.suptitle("Docking funnels (rank-1 pose ringed; 10 A guide)",
                 fontsize=10, color=_TEXT, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(out_png, facecolor=_SURFACE)
    plt.close(fig)
    return True


def fig_pooled_bands(matrix_dir: str, out_png: str,
                     row_a: str = "learned_local",
                     row_b: str = "shape_local",
                     metric: str = "hit_top1"):
    """Dumbbell plot: per-band top-1 for two methods + the pooled pair.

    Form choice (dataviz method): the job is a paired comparison of two
    identities across ordered bands — dots (no zero-baseline
    requirement) joined by a neutral connector beat bars, whose 0–1
    baseline would compress the 0.75–1.0 range the data lives in.
    Identity = fixed categorical hues (slot 1 learned, slot 2 shape,
    matching fig_hit_rates); direct labels only on the pooled pair.
    """
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "pooled_verdict", os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "pooled_verdict.py"))
    pv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pv)
    files, _proto = pv.discover(matrix_dir)

    def rate(d, row):
        cs = d.get(row, {}).get("complexes")
        if not cs:
            return None
        return sum(bool(c.get(metric)) for c in cs) / len(cs)

    bands, ra, rb = [], [], []
    for path, d in files:
        va, vb = rate(d, row_a), rate(d, row_b)
        if va is None or vb is None:
            continue
        name = os.path.basename(path)
        name = name.replace("eval_matrix_48", "").replace(".json", "")
        bands.append(name.lstrip("_") or "band100")
        ra.append(va)
        rb.append(vb)
    if not bands:
        return False
    # Pool via the verdict tool's own pool(): the figure must inherit
    # its seed-disjointness + fingerprint guards, never diverge from
    # the pooled_verdict.json artifact built from the same directory.
    pooled, _prov = pv.pool(files)
    pooled_a = pooled.get(row_a, {})
    pooled_b = pooled.get(row_b, {})
    m = None
    shared = set(pooled_a) & set(pooled_b)
    if shared:
        m = pv.mcnemar({k: pooled_a[k] for k in shared},
                       {k: pooled_b[k] for k in shared}, metric)
        bands.append(f"pooled\nn={m['n']}")
        ra.append(m["a_hits"] / m["n"])
        rb.append(m["b_hits"] / m["n"])

    x = np.arange(len(bands), dtype=float)
    if m is not None:
        x[-1] += 0.6                       # visual gap before pooled
    fig, ax = plt.subplots(figsize=(6.0, 3.4), dpi=160)
    fig.patch.set_facecolor(_SURFACE)
    _style_axes(ax)
    for xi, a, b in zip(x, ra, rb):
        ax.plot([xi, xi], [b, a], color=_GRID, linewidth=2.0,
                zorder=2, solid_capstyle="round")
    # Ties overlap exactly: a 2px surface ring + concentric sizing
    # keeps both identities visible (bullseye) instead of one dot
    # silently hiding the other.
    tie = np.isclose(np.asarray(ra), np.asarray(rb))
    ax.scatter(x, rb, s=np.where(tie, 110, 46), color=_COLORS[1],
               zorder=3, edgecolors=_SURFACE, linewidths=1.4,
               label=row_b.replace("_local", " (local)"))
    ax.scatter(x, ra, s=46, color=_COLORS[0], zorder=4,
               edgecolors=_SURFACE, linewidths=1.4,
               label=row_a.replace("_local", " (local)"))
    if m is not None:
        ax.text(x[-1] + 0.16, ra[-1], f"{ra[-1]:.3f}", fontsize=8,
                color=_TEXT, va="center")
        ax.text(x[-1] + 0.16, rb[-1], f"{rb[-1]:.3f}", fontsize=8,
                color=_TEXT, va="center")
        da, db = len(m["a_only"]), len(m["b_only"])
        ax.set_title(
            f"Held-out local top-1 by band — pooled {da}:{db}, "
            f"p={m['p_two_sided']:.3f} (two-sided)",
            fontsize=9, color=_TEXT, loc="left")
    else:
        ax.set_title("Held-out local top-1 by band", fontsize=10,
                     color=_TEXT, loc="left")
    ax.set_xticks(x, bands, fontsize=8)
    ax.set_xlim(x[0] - 0.6, x[-1] + 0.9)
    lo = min(min(ra), min(rb))
    ax.set_ylim(max(0.0, lo - 0.06), 1.02)
    ax.set_ylabel("top-1 hit rate", fontsize=8, color=_TEXT2)
    handles, labels = ax.get_legend_handles_labels()
    ax.legend(handles[::-1], labels[::-1], frameon=False, fontsize=8,
              loc="lower left", labelcolor=_TEXT)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=_SURFACE)
    plt.close(fig)
    return True


def write_report(methods: dict, out_dir: str, figures: dict):
    lines = ["# Docking benchmark report", ""]
    lines += ["| method | complexes | top-1 | top-10 |",
              "|---|---|---|---|"]
    for m, cplx in methods.items():
        t1, t10 = hit_rates(cplx)
        lines.append(f"| {m} | {len(cplx)} | {t1:.3f} | {t10:.3f} |")
    lines.append("")
    for name, png in figures.items():
        lines += [f"![{name}]({os.path.basename(png)})", ""]
    first = next(iter(methods))
    lines += [f"## Per-complex ({first})", "",
              "| complex | top-1 | top-10 | best LRMSD (A) |",
              "|---|---|---|---|"]
    for nm, c in sorted(methods[first].items()):
        b = c.get("best_lrmsd")
        lines.append(
            f"| {nm} | {'hit' if c.get('hit_top1') else '-'} "
            f"| {'hit' if c.get('hit_top10') else '-'} "
            f"| {b:.2f} |" if b is not None else
            f"| {nm} | - | - | - |")
    path = os.path.join(out_dir, "report.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print(__doc__)
        return 2
    out_dir = argv[0]
    os.makedirs(out_dir, exist_ok=True)
    methods = {}
    if argv[1] == "--pooled":
        if len(argv) < 3:
            print(__doc__)
            return 2
        png = os.path.join(out_dir, "pooled_bands.png")
        ok = fig_pooled_bands(argv[2], png)
        print(f"wrote {png}" if ok else "no complete band rows")
        return 0 if ok else 2
    if argv[1] == "--matrix":
        methods = load_matrix(argv[2])
    else:
        for spec in argv[1:]:
            label, _, path = spec.partition("=")
            methods[label] = load_eval_dir(path or label)
    figures = {}
    png = os.path.join(out_dir, "hit_rates.png")
    fig_hit_rates(methods, png)
    figures["hit rates"] = png
    first = next(iter(methods))
    fpng = os.path.join(out_dir, "funnels.png")
    if fig_funnels(methods[first], fpng):
        figures["funnels"] = fpng
    path = write_report(methods, out_dir, figures)
    print(f"wrote {path} + {len(figures)} figure(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
