"""Plot the tpmfp force-accuracy output (utilities/tpmfp.gpt analog).

The reference ships a gnuplot/tikz script for the binned RMS force-error
curves (utilities/tpmfp.gpt); this is the matplotlib equivalent working on
the `# r_mid rms_rel_err count` table that `utilities/tpmfp.py` prints:

    python utilities/tpmfp.py --pmgrid 64 > fe.txt
    python utilities/tpmfp_plot.py fe.txt [-o fe.png]
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("table", help="tpmfp.py output table")
    ap.add_argument("-o", "--out", default=None,
                    help="output image (default: <table>.png)")
    ap.add_argument("--title", default="TreePM force accuracy")
    args = ap.parse_args()

    import numpy as np
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available", file=sys.stderr)
        return 1

    rows = []
    for ln in open(args.table):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split()
        if len(parts) >= 3:
            rows.append([float(x) for x in parts[:3]])
    if not rows:
        print("no data rows found", file=sys.stderr)
        return 1
    r, err, cnt = (list(c) for c in zip(*rows))

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.loglog(r, err, "o-", lw=1.5, ms=4, color="#363b74")
    ax.axhline(0.01, ls="--", lw=1, color="#ef4f91",
               label="1% (Gadget-2 band)")
    ax.axhline(0.001, ls=":", lw=1, color="#673888", label="0.1% target")
    ax.set_xlabel("separation r")
    ax.set_ylabel(r"RMS relative force error $\Delta_\mathrm{RMS}$")
    ax.set_title(args.title)
    ax.legend(frameon=False, fontsize=8)
    ax.grid(alpha=0.25, which="both")
    out = args.out or args.table.rsplit(".", 1)[0] + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
