"""Proxy-vs-published ordering analysis for reproduced quality grids.

The reproduce-grid recipe (reference ``README.md:176-193``,
``Perf_evaluation.ipynb`` cell 6) runs in this environment on synthetic data
with the RandomFeatures proxy space, so its absolute FID/KID numbers are NOT
comparable to the published table. What *can* be checked is the ordering:
does the proxy grid rank the 13 configurations the way the published grid
does? This script computes Spearman rank correlations between the proxy and
published FID/KID columns per dataset and prints a RESULTS.md-ready section
with the honest conclusion either way (VERDICT r4 missing #1).

Usage:
    python benchmarks/grid_analysis.py sample_results/reproduced_grid.json \
        [sample_results/reproduced_grid_cifar10.json ...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from aliasfree_diffusion_models_pytorch_tpu.reproduce import PUBLISHED


def spearman(a, b) -> float:
    """Spearman rank correlation via Pearson on ranks (ties: average rank).

    scipy-free so this runs anywhere the package does; cross-checked against
    ``scipy.stats.spearmanr`` in tests/test_reproduce.py.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)

    def _ranks(x):
        order = np.argsort(x, kind="stable")
        ranks = np.empty_like(x)
        ranks[order] = np.arange(1, len(x) + 1, dtype=np.float64)
        # average ranks over ties
        for v in np.unique(x):
            m = x == v
            if m.sum() > 1:
                ranks[m] = ranks[m].mean()
        return ranks

    ra, rb = _ranks(a), _ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom else float("nan")


def analyze(path: str) -> list[str]:
    with open(path) as f:
        grid = json.load(f)
    dataset = grid["dataset"].upper()
    pub = PUBLISHED.get(dataset, {})
    rows = [r for r in grid.get("rows", []) if r["config"] in pub]
    lines = [f"### {dataset} — {path} (feature space: {grid['feature_space']},"
             f" comparable_to_published: {grid['comparable_to_published']})",
             ""]
    if len(rows) < 3:
        lines.append(f"- only {len(rows)} rows overlap the published table; "
                     "no ordering statistics possible")
        return lines

    names = [r["config"] for r in rows]
    # Prefer the full-precision *_raw fields (present since round 5): the
    # 2-decimal display rounding collapses proxy KID (~1e-3 spread across
    # non-C configs) to ties, which biases rank correlations toward 0.
    proxy = {
        "fid": [r.get("fid_raw", r["fid"]) for r in rows],
        "kid_x100": [r.get("kid_x100_raw", r["kid_x100"]) for r in rows],
        "is": [r.get("is_raw", r["is"]) for r in rows],
    }
    published = {
        "is": [pub[n][0] for n in names],
        "fid": [pub[n][1] for n in names],
        "kid_x100": [pub[n][2] for n in names],
    }
    for metric in ("fid", "kid_x100", "is"):
        rho = spearman(proxy[metric], published[metric])
        lines.append(f"- Spearman(proxy {metric}, published {metric}) over "
                     f"{len(rows)} configs: **{rho:+.2f}**")

    # Letter-level ordering: the published story's coarse structure is that
    # C (filtered nonlinearity alone) is the worst family on every dataset.
    by_letter: dict[str, list[float]] = {}
    pub_by_letter: dict[str, list[float]] = {}
    for n, f_proxy, f_pub in zip(names, proxy["fid"], published["fid"]):
        letter = n.split("-")[0]
        by_letter.setdefault(letter, []).append(f_proxy)
        pub_by_letter.setdefault(letter, []).append(f_pub)
    mean_proxy = {k: float(np.mean(v)) for k, v in by_letter.items()}
    mean_pub = {k: float(np.mean(v)) for k, v in pub_by_letter.items()}
    order_proxy = sorted(mean_proxy, key=mean_proxy.get)
    order_pub = sorted(mean_pub, key=mean_pub.get)
    lines.append(
        f"- mean-FID family ordering (best→worst): proxy "
        f"{' < '.join(order_proxy)} "
        f"({', '.join(f'{k}={mean_proxy[k]:.2f}' for k in order_proxy)}); "
        f"published {' < '.join(order_pub)} "
        f"({', '.join(f'{k}={mean_pub[k]:.2f}' for k in order_pub)})")
    worst_match = order_proxy[-1] == order_pub[-1]
    lines.append(
        f"- worst family agrees: **{worst_match}** "
        f"(proxy {order_proxy[-1]}, published {order_pub[-1]})")
    return lines


def main(paths: list[str]) -> None:
    print("## Proxy-vs-published grid ordering (Spearman)\n")
    for p in paths:
        print("\n".join(analyze(p)))
        print()


if __name__ == "__main__":
    main(sys.argv[1:] or ["sample_results/reproduced_grid.json"])
