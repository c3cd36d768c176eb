"""Gate-and-promote a candidate LightGlue checkpoint to production.

Runs the two-domain end-to-end benchmark (bench_deep) on a candidate
weights dir, applies the round-5 acceptance gates, and on pass installs
the checkpoint as weights/lightglue.npz with a per-domain .meta.

Gates (VERDICT r4 #1 done-criteria):
  blob:    median ATE <= 0.06 over --scenes worlds, >= 10 fps,
           >= N-5 registered everywhere
  surface: min registration >= --surface-reg-min (target 100/100;
           anything below the current production weights' 78/0/52 floor
           is a regression and always fails)

    python scripts/promote_deep_weights.py --candidate /tmp/wmix
"""
import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate", required=True,
                    help="dir with lightglue.npz (+ superpoint.npz, .meta)")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--surface-scenes", type=int, default=3)
    ap.add_argument("--blob-ate-max", type=float, default=0.06)
    ap.add_argument("--fps-min", type=float, default=10.0)
    ap.add_argument("--surface-reg-min", type=int, default=95)
    ap.add_argument("--dry-run", action="store_true",
                    help="report the gate verdict without installing")
    args = ap.parse_args()

    cmd = [sys.executable, str(ROOT / "scripts" / "bench_deep.py"),
           "--weights", args.candidate, "--frames", str(args.frames),
           "--scenes", str(args.scenes),
           "--surface-scenes", str(args.surface_scenes), "--no-gate"]
    print("#", " ".join(cmd), flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(f"bench_deep failed rc={out.returncode}")
    row = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])

    fails = []
    if row["ate"] is None or row["ate"] > args.blob_ate_max:
        fails.append(f"blob median ATE {row['ate']} > {args.blob_ate_max}")
    if row["value"] < args.fps_min:
        fails.append(f"fps {row['value']} < {args.fps_min}")
    if min(row["surface_registered"]) < args.surface_reg_min:
        fails.append(f"surface registration {row['surface_registered']} "
                     f"has a world under {args.surface_reg_min}")
    verdict = "PASS" if not fails else "FAIL: " + "; ".join(fails)
    print(f"# gate: {verdict}", flush=True)
    if fails or args.dry_run:
        raise SystemExit(1 if fails else 0)

    src = Path(args.candidate) / "lightglue.npz"
    dst = ROOT / "weights" / "lightglue.npz"
    shutil.copyfile(src, dst)
    meta = ROOT / "weights" / "lightglue.meta"
    meta.write_text(
        "n_layers=3\n"
        "trained=mixed-domain (blob + surface, both flow families; "
        "scripts/train_mix_driver.sh)\n"
        f"e2e_blob_median_ate={row['ate']}\n"
        f"e2e_blob_ates={row['ate_scenes']}\n"
        f"e2e_fps={row['value']}\n"
        f"e2e_surface_registered={row['surface_registered']}\n"
        f"e2e_surface_median_ate={row['surface_ate']}\n"
        "# all rows at the production operating point t=0.15, K=1024,\n"
        "# N=100; surface worlds = robustness-matrix geometry\n")
    print(f"# installed {dst} (+meta)", flush=True)


if __name__ == "__main__":
    main()
