"""Scatter plot of fitted C(t) parameters (plot-fittedCt-values.py
equivalent): per-residue (tau_i, C_i) components plus S2_slow/S2_fast
bars; out-of-range tau components are shifted into the S2 bars
(plot-fittedCt-values.py:134-150) unless --noshift."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="spinrelax plot-ct",
        description="Plot fitted C(t) parameters as a per-residue scatter.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-f", dest="inFile", required=True)
    p.add_argument("-o", dest="outFile", default=None)
    p.add_argument("--cmap", default="jet")
    p.add_argument("--tmin", type=float, default=None)
    p.add_argument("--tmax", type=float, default=None)
    p.add_argument("--noshift", action="store_true")
    p.add_argument("--tu", default="ps")
    p.add_argument("--figx", type=float, default=5.0)
    p.add_argument("--figy", type=float, default=4.0)
    a = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..io.fittedct import read_fittedct

    cts = read_fittedct(a.inFile)
    S2 = np.asarray(cts.S2)
    C = np.asarray(cts.C)
    tau = np.asarray(cts.tau)
    mask = np.asarray(cts.mask) > 0
    s2fast = np.asarray(cts.s2_fast())
    resids = np.array([float(n) for n in cts.names])

    # S2-only models (no exponential components anywhere) still plot
    # meaningful S2 bars — fall back to a nominal tau range instead of
    # crashing on a zero-size reduction.
    any_comp = bool(np.any(mask))
    tmin = a.tmin if a.tmin is not None else (
        max(tau[mask].min() * 0.5, 1e-3) if any_comp else 1e-3
    )
    tmax = a.tmax if a.tmax is not None else (
        tau[mask].max() * 2.0 if any_comp else 1.0
    )

    s2_slow_plot = S2.copy()
    s2_fast_plot = s2fast.copy()
    xs, ys, sizes = [], [], []
    for i in range(len(resids)):
        for k in range(C.shape[1]):
            if not mask[i, k]:
                continue
            t = tau[i, k]
            if t < tmin:
                if not a.noshift:
                    s2_fast_plot[i] += C[i, k]
                continue
            if t > tmax:
                if not a.noshift:
                    s2_slow_plot[i] += C[i, k]
                continue
            xs.append(resids[i])
            ys.append(t)
            sizes.append((4 + C[i, k] * 40) ** 2)

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(a.figx, a.figy), sharex=True,
        gridspec_kw=dict(height_ratios=[3, 1]),
    )
    ax1.scatter(xs, ys, s=sizes, c=ys, cmap=a.cmap, alpha=0.7, edgecolors="k", linewidths=0.3)
    ax1.set_yscale("log")
    ax1.set_ylim(tmin, tmax)
    ax1.set_ylabel(f"tau [{a.tu}]")
    ax1.set_title("Fitted C(t) components (size ~ amplitude)")

    ax2.bar(resids, s2_slow_plot, width=0.8, label="S2_slow", color="#4477aa")
    ax2.bar(resids, s2_fast_plot, width=0.8, bottom=s2_slow_plot, label="S2_fast", color="#ee6677")
    ax2.set_ylim(0, 1.05)
    ax2.set_xlabel("Residue")
    ax2.set_ylabel("S2")
    ax2.legend(fontsize=7)
    fig.tight_layout()
    if a.outFile:
        fig.savefig(a.outFile, dpi=150)
        print(f"= = Wrote {a.outFile}")
    else:
        fig.savefig("fittedCt.pdf", dpi=150)
        print("= = Wrote fittedCt.pdf")


if __name__ == "__main__":
    main()
