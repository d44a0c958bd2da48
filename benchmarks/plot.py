"""Render benchmark CSV/JSON artifacts to PNG plots.

Analog of the reference's plotting scripts (ref: benchmarks/plot.py,
benchmarks/generatePlot.py): size-sweep and active-sweep curves from the
solvers CSVs, warm-vs-cold bars from warm_start.json, and decomposition
timings. Usage:

    python benchmarks/plot.py [--out benchmarks/out]

Writes <out>/plots/*.png. Requires matplotlib (skips politely if absent).
"""
import argparse
import csv
import json
import os


def _load_csvs(out_dir):
    rows = []
    for fn in os.listdir(out_dir):
        if fn.startswith("solvers_") and fn.endswith(".csv"):
            solver = fn[len("solvers_"):-len(".csv")]
            with open(os.path.join(out_dir, fn), newline="") as fh:
                for r in csv.DictReader(fh):
                    r["solver"] = solver
                    rows.append(r)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/out")
    args = ap.parse_args()
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; skipping plots")
        return

    plot_dir = os.path.join(args.out, "plots")
    os.makedirs(plot_dir, exist_ok=True)
    rows = _load_csvs(args.out)

    def series(prefix, xkey):
        by_solver = {}
        for r in rows:
            if not r["name"].startswith(prefix):
                continue
            x = float(r["name"].split(xkey)[1].split("/")[0].rstrip("%"))
            by_solver.setdefault(r["solver"], []).append(
                (x, float(r["us_per_solve"]), float(r["kkt_pass_rate"])))
        for v in by_solver.values():
            v.sort()
        return by_solver

    for prefix, xkey, xlabel, fname in [
        ("size/", "n=", "variables n (m = 2n)", "size_sweep.png"),
        ("active/", "active/", "% active constraints", "active_sweep.png"),
    ]:
        data = series(prefix, xkey)
        if not data:
            continue
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        for solver, pts in sorted(data.items()):
            xs = [p[0] for p in pts]
            ax1.plot(xs, [p[1] for p in pts], marker="o", label=solver)
            ax2.plot(xs, [p[2] for p in pts], marker="o", label=solver)
        ax1.set_xlabel(xlabel)
        ax1.set_ylabel("µs / solve")
        ax1.set_yscale("log")
        ax1.legend()
        ax2.set_xlabel(xlabel)
        ax2.set_ylabel("KKT ≤ 1e-8 pass rate")
        ax2.set_ylim(0, 1.05)
        fig.tight_layout()
        fig.savefig(os.path.join(plot_dir, fname), dpi=120)
        print(f"wrote {plot_dir}/{fname}")

    ws = os.path.join(args.out, "warm_start.json")
    if os.path.exists(ws):
        with open(ws) as fh:
            w = json.load(fh)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 4))
        ax1.bar(["cold", "warm"], [w["cold_mean_it"], w["warm_mean_it"]])
        ax1.set_ylabel("mean GI iterations / step")
        ax2.bar(["cold", "warm"],
                [w["cold_us_per_solve"], w["warm_us_per_solve"]])
        ax2.set_ylabel("µs / solve")
        fig.suptitle(w["name"])
        fig.tight_layout()
        fig.savefig(os.path.join(plot_dir, "warm_start.png"), dpi=120)
        print(f"wrote {plot_dir}/warm_start.png")

    dc = os.path.join(args.out, "decomposition.json")
    if os.path.exists(dc):
        with open(dc) as fh:
            d = json.load(fh)
        fig, ax = plt.subplots(figsize=(8, 4))
        names = [r["name"].replace("llt/", "") for r in d]
        ax.barh(names, [r["ms"] for r in d])
        ax.set_xlabel("ms / factorization")
        ax.set_xscale("log")
        fig.tight_layout()
        fig.savefig(os.path.join(plot_dir, "decomposition.png"), dpi=120)
        print(f"wrote {plot_dir}/decomposition.png")


if __name__ == "__main__":
    main()
