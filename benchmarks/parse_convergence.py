"""Parse a cli.train training.log into the committed convergence artifact
(benchmarks/results/convergence_r4.json) that
tests/test_convergence_curve.py pins.

python benchmarks/parse_convergence.py /path/training.log \
    --out benchmarks/results/convergence_r4.json --cmd "<run command>"
"""

import argparse
import json
import os
import re


def parse_log(path: str) -> dict:
    text = open(path).read()
    ver = [{"step": int(m.group(2)), "acc": float(m.group(3))}
           for m in re.finditer(
               r"\[(\w+)\]\[(\d+)\]Accuracy-Flip: ([0-9.]+)", text)]
    speeds = [float(m.group(1)) for m in re.finditer(
        r"Speed ([0-9.]+) samples/sec", text)]
    losses = [(int(m.group(2)), float(m.group(1))) for m in re.finditer(
        r"Loss ([0-9.]+) Epoch: \d+ Global Step: (\d+)", text)]
    segs = [float(m.group(1)) for m in re.finditer(
        r"seg_loss=([0-9.]+)", text)]
    return {"verification": ver,
            "speeds": speeds,
            "loss_points": losses[:2] + losses[-2:],
            "loss": {"initial": losses[0][1] if losses else None,
                     "final": losses[-1][1] if losses else None},
            "seg_loss": {"initial": segs[0] if segs else None,
                         "final": segs[-1] if segs else None},
            "sustained_img_s": (round(sum(speeds[2:]) / max(
                len(speeds) - 2, 1), 2) if len(speeds) > 3 else None)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cmd", default="")
    ap.add_argument("--window", type=float, default=0.05,
                    help="final-window pin half-width around the last acc")
    a = ap.parse_args()
    data = parse_log(a.log)
    last = data["verification"][-1]["acc"] if data["verification"] else None
    data["final_window"] = ([round(last - a.window, 4),
                             round(min(last + a.window, 0.9999), 4)]
                            if last else None)
    data["command"] = a.cmd
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({"points": len(data["verification"]),
                      "last_acc": last,
                      "sustained_img_s": data["sustained_img_s"]}))
