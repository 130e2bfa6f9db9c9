"""Vectorised analysis plots (the reference's L6 layer at scale).

The reference plotters remain the compatibility contract (our files feed
them unchanged); these are the scalable equivalents — plot_2d.py is
O(N^2) in Python lists (plot_2d.py:19-23) and cannot render the 40K-body
golden workload, so ``trajectories`` re-implements it vectorised, and
``quadtree`` renders dump files of any size.

CLI:  python -m nbody_tpu plot --positions positions.txt
      python -m nbody_tpu plot --quadtree quadtree_init.txt
"""

from __future__ import annotations

import os

import numpy as np


def trajectories(positions_file: str, out_png: str | None = None,
                 max_bodies: int = 2000):
    """plot_2d.py equivalent: one polyline per body (vectorised).

    For large N only the first ``max_bodies`` bodies are drawn (the
    reference draws every body with a legend entry, which is unusable
    beyond a few dozen)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.textio import read_positions_file

    data = read_positions_file(positions_file)
    bodies = data[:, 1].astype(int)
    n = bodies.max() + 1
    steps = len(data) // n
    xy = data[:, 2:4].reshape(steps, n, 2)  # rows are per-step blocks

    shown = min(n, max_bodies)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.plot(xy[:, :shown, 0], xy[:, :shown, 1], linewidth=0.5, alpha=0.6)
    ax.scatter(xy[-1, :shown, 0], xy[-1, :shown, 1], s=4, color="red")
    ax.set_title("N-Body Problem Visualization")
    ax.set_xlabel("X Coordinate")
    ax.set_ylabel("Y Coordinate")
    ax.axhline(0, color="gray", linestyle="--", linewidth=0.5)
    ax.axvline(0, color="gray", linestyle="--", linewidth=0.5)
    ax.grid(True)
    out = out_png or "plot_2d.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def trajectories_3d(positions_file: str, out_png: str | None = None,
                    max_bodies: int = 500):
    """Working 3D trajectory plot — the reference's plot_3d.py consumes
    the same five-column ``time body x y z`` file but is non-functional
    as committed (expects plotly, calls plt.savefig without importing
    matplotlib, plot_3d.py:1/49); this is the functional equivalent,
    vectorised and matplotlib-only.  Per-body polylines colored by body,
    final positions marked."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.textio import read_positions_file

    data = read_positions_file(positions_file)
    if data.shape[1] < 5:
        raise ValueError(
            f"{positions_file} has {data.shape[1]} columns; 3D plotting "
            "needs the five-column 'time body x y z' schema (run with "
            "--dims 3 --save-positions)"
        )
    bodies = data[:, 1].astype(int)
    n = bodies.max() + 1
    steps = len(data) // n
    xyz = data[:, 2:5].reshape(steps, n, 3)

    shown = min(n, max_bodies)
    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    for b in range(shown):
        ax.plot(
            xyz[:, b, 0], xyz[:, b, 1], xyz[:, b, 2],
            linewidth=0.5, alpha=0.6,
        )
    ax.scatter(
        xyz[-1, :shown, 0], xyz[-1, :shown, 1], xyz[-1, :shown, 2],
        s=4, color="red", depthshade=False,
    )
    ax.set_title("3D N-Body Problem Visualization")
    ax.set_xlabel("X Coordinate")
    ax.set_ylabel("Y Coordinate")
    ax.set_zlabel("Z Coordinate")
    out = out_png or "plot_3d.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def quadtree(dump_file: str, out_png: str | None = None):
    """plot_quadtree.py equivalent using a LineCollection (fast at 350K
    nodes)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    import re

    occ_re = re.compile(
        r"occupantIndex=(-?\d+)\s+occupantPos=\(([-0-9.e+]+),([-0-9.e+]+)\)"
    )
    rects = []
    pts = []
    with open(dump_file) as f:
        for line in f:
            tok = line.split()
            if len(tok) < 6:
                continue
            x0, x1, y0, y1 = map(float, tok[1:5])
            rects.append([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])
            m = occ_re.search(line)
            if m:
                pts.append((float(m.group(2)), float(m.group(3))))
    segs = []
    for r in rects:
        segs.extend([(r[i], r[i + 1]) for i in range(4)])
    fig, ax = plt.subplots()
    ax.add_collection(
        LineCollection(segs, colors="black", alpha=0.3, linewidths=0.4)
    )
    if pts:
        p = np.asarray(pts)
        ax.scatter(p[:, 0], p[:, 1], color="red", s=2, zorder=3)
    ax.autoscale()
    ax.set_aspect("equal", "box")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    out = out_png or dump_file.replace(".txt", "_png.png")
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out
