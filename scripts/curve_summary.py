"""Print the val-IoU curve (and best) from a run's metrics.jsonl.

Usage: python scripts/curve_summary.py <logdir-or-metrics.jsonl> [...]
Emits one line per validation plus a BEST summary — the numbers
docs/ACCURACY.md tables are built from.
"""

import json
import sys
from pathlib import Path


def summarize(path: Path):
    f = path / "metrics.jsonl" if path.is_dir() else path
    best, best_step, rows = -1.0, -1, []
    with open(f) as fh:
        for line in fh:
            rec = json.loads(line)
            if "val/iou" in rec:
                rows.append((rec["step"], rec["val/iou"],
                             rec.get("val/loss")))
                if rec["val/iou"] > best:
                    best, best_step = rec["val/iou"], rec["step"]
    name = str(path)
    for step, iou, loss in rows:
        print(f"{name}  step {step:>6}  val_iou {iou:.4f}"
              + (f"  val_loss {loss:.5f}" if loss is not None else ""))
    print(f"{name}  BEST val_iou {best:.4f} @ step {best_step} "
          f"({len(rows)} validations)")


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        summarize(Path(arg))
