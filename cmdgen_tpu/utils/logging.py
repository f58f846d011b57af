"""Metrics logging: JSONL run logs + console, replacing the reference's
wandb spine (DiffPhar/train.py:90-99, lightning_modules.py:241-281) with a
dependency-free backend. One metrics dict per line; nested under run names.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, logdir, run_name: str = "run", also_print: bool = True):
        self.dir = Path(logdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{run_name}.metrics.jsonl"
        self.also_print = also_print
        self._fh = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict, split: Optional[str] = None):
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            key = f"{k}/{split}" if split else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.also_print:
            print(json.dumps(rec), file=sys.stderr)

    def close(self):
        self._fh.close()


def visualize_molecule_png(
    out_path, coords, types=None, type_names=None, title: str = ""
):
    """3-D scatter render of a sampled point cloud
    (analysis/visualization.py:100-427 equivalent, minus wandb)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    coords = np.asarray(coords)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    if types is not None:
        types = np.asarray(types)
        for t in np.unique(types):
            sel = types == t
            label = type_names[int(t)] if type_names else str(t)
            ax.scatter(*coords[sel].T, label=label, s=60)
        ax.legend(loc="upper right", fontsize=8)
    else:
        ax.scatter(*coords.T, s=60)
    ax.set_title(title)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
