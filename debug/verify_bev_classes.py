"""BEV label-schema inspection — reference ``debug/verify_bev_classes.py``
rebuilt: per-class pixel statistics over the first samples, renders all 8
channels to a PNG, and reports which channels look like vehicles.

    python debug/verify_bev_classes.py [--dataroot /data/SimBEV] [--samples 5]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.data.simbev import scan_samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--outdir", default="./debug_outputs")
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"))
        print(f"using synthetic fixture at {args.dataroot}")

    samples = scan_samples(args.dataroot, is_train=True)[:args.samples]
    counts = None
    first_bev = None
    for s in samples:
        bev = np.load(Path(s["meta_dir"]) / s["bev"])["bev"]
        if first_bev is None:
            first_bev = bev
        c = (bev > 0).reshape(bev.shape[0], -1).sum(1)
        counts = c if counts is None else counts + c

    if first_bev is None:
        raise SystemExit("no samples found — nothing to inspect")
    total = first_bev.shape[1] * first_bev.shape[2] * len(samples)
    print(f"per-class positive pixel stats over {len(samples)} samples:")
    for ch, c in enumerate(counts):
        pct = 100.0 * c / total
        hint = " <- vehicle classes (merged by the loader)" if ch in (1, 2, 3) else ""
        print(f"  class {ch}: {int(c):8d} px ({pct:5.2f}%){hint}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    Path(args.outdir).mkdir(parents=True, exist_ok=True)
    # panel grid sized to the actual channel count (schema inspection must
    # not assume the 8-channel SimBEV layout it is verifying)
    nch = first_bev.shape[0]
    ncols = min(4, nch)
    nrows = (nch + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 4 * nrows),
                             squeeze=False)
    for ch, ax in enumerate(axes.flat):
        if ch >= nch:
            ax.axis("off")
            continue
        ax.imshow(first_bev[ch], cmap="hot")
        ax.set_title(f"class {ch}")
        ax.axis("off")
    out = Path(args.outdir) / "bev_classes.png"
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
