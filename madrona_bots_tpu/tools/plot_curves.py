"""Learning-curve plots from a metrics JSONL (learn/metrics.py output).

The reference's learning evidence lives in wandb dashboards
(training_loop.py:105-120); this renders the same per-species series
(losses, population, reward, entropy) to a PNG for offline inspection /
learning-curve comparison between runs.

Run: python -m madrona_bots_tpu.tools.plot_curves run.metrics.jsonl out.png
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load_series(path: str):
    series = defaultdict(list)
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if isinstance(v, (int, float)):
                    series[k].append(v)
    return series


PANELS = [
    ("total_loss", "total loss"),
    ("actor_loss", "actor loss"),
    ("critic_loss", "critic loss"),
    ("count", "population"),
    ("reward", "reward sum"),
    ("avg_action_entropy", "action entropy"),
]


def plot(path: str, out: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from madrona_bots_tpu.viz.render import SPECIES_COLORS

    series = load_series(path)
    panels = [(suf, title) for suf, title in PANELS
              if any(f"species_1_{suf}" == k for k in series)]
    fig, axes = plt.subplots(2, 3, figsize=(14, 7))
    for ax, (suf, title) in zip(axes.flat, panels):
        for s in range(1, 5):
            key = f"species_{s}_{suf}"
            if key in series:
                ax.plot(series[key], color=SPECIES_COLORS[s], lw=0.8,
                        label=f"species {s}")
        ax.set_title(title, fontsize=9)
        ax.tick_params(labelsize=7)
    axes.flat[0].legend(fontsize=7)
    for ax in axes.flat[len(panels):]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    plot(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "curves.png")
