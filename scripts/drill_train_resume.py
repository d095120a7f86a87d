"""On-chip training interrupt/resume drill (the ultralytics resume=True
claim, reference macros/run_train.py:23, proven on real hardware).

Three CLI-level runs on a synthetic on-disk dataset:
  A. uninterrupted  — epochs=2N, checkpoints every epoch
  B. SIGKILLed      — same config, killed around the halfway point
  C. --resume       — resumes B's checkpoint dir, finishes to 2N

Asserts the resumed run replays the uninterrupted trajectory: per-epoch
mean losses after the resume point match run A's, and the final 'last'
checkpoint parameter digests agree (the augmentation stream and shuffle
order are keyed by (seed, epoch), so a resumed epoch draws exactly what
the uninterrupted run drew).  Prints a JSON summary; exit 0 on match.

    python scripts/drill_train_resume.py [workdir] [--epochs 64]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_dataset(root: str, n: int = 512, size: int = 96,
                 seed: int = 9) -> str:
    import numpy as np
    from caesar_yolo_tpu.utils.fits import write_fits
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        img = rng.normal(0.0, 0.08, (size, size)).astype(np.float32)
        rows = []
        for _ in range(int(rng.integers(1, 4))):
            cx, cy = rng.uniform(14, size - 14, 2)
            s = rng.uniform(4.0, 7.0)
            amp = rng.uniform(3.0, 8.0)
            img += amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                / (2 * s * s)).astype(np.float32)
            rows.append(f"1 {cx/size:.5f} {cy/size:.5f} "
                        f"{4*s/size:.5f} {4*s/size:.5f}")
        lo, hi = img.min(), img.max()
        write_fits((img - lo) / (hi - lo),
                   os.path.join(root, "images", f"im{i:04d}.fits"))
        with open(os.path.join(root, "labels", f"im{i:04d}.txt"),
                  "w") as f:
            f.write("\n".join(rows) + "\n")
    yml = os.path.join(root, "ds.yaml")
    with open(yml, "w") as f:
        f.write(f"path: {root}\ntrain: images\n"
                "names:\n  0: spurious\n  1: compact\n  2: extended\n"
                "  3: extended-multisland\n  4: flagged\n")
    return yml


def launch(yml, ckdir, epochs, resume=None, log_path=None, cpu=False,
           imgsz=96):
    if cpu:  # smoke-test backend (sitecustomize overrides JAX_PLATFORMS)
        head = [sys.executable, "-c",
                "import jax, sys; "
                "jax.config.update('jax_platforms', 'cpu'); "
                "from caesar_yolo_tpu.cli.train import main; "
                "sys.exit(main(sys.argv[1:]))"]
    else:
        head = [sys.executable, "-m", "caesar_yolo_tpu.cli.train"]
    cmd = head + [
        f"--data={yml}", "--model=yolov8n", "--num_classes=5",
        f"--epochs={epochs}", "--batch=16", f"--imgsz={imgsz}",
        "--max_gt=8", f"--checkpoint_dir={ckdir}",
        "--checkpoint_every=1", "--val_every=0", "--seed=0"]
    if resume:
        cmd.append(f"--resume={resume}")
    # PYTHONUNBUFFERED: run B dies by SIGKILL, which discards userspace
    # stdio buffers — block-buffered logging made a half-finished B look
    # like "0 epochs" and failed the drill's kill-point guard
    env = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site",
               PYTHONUNBUFFERED="1")
    logf = open(log_path, "wb")
    return subprocess.Popen(cmd, env=env, stdout=logf,
                            stderr=subprocess.STDOUT), logf


def epoch_losses(log_path):
    """[(epoch_line_index, mean_loss)] in log order — trainer.fit logs
    'epoch 0 mean loss X' per one-epoch fit call, so order = CLI epoch."""
    out = []
    for line in open(log_path, errors="replace"):
        m = re.search(r"mean loss ([0-9.]+)", line)
        if m:
            out.append(float(m.group(1)))
    return out


def digest(ckpt):
    import numpy as np
    from caesar_yolo_tpu.train import Trainer
    plain = Trainer.load_checkpoint(ckpt)
    import jax
    leaves = jax.tree_util.tree_leaves(plain["params"])
    return [float(np.abs(np.asarray(x)).sum()) for x in leaves]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("--epochs", type=int, default=64)
    p.add_argument("--kill_frac", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true",
                   help="smoke-test on the CPU backend")
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--imgsz", type=int, default=96,
                   help="train input size (the realistic config is 640: "
                        "132px cutouts letterboxed up, the reference "
                        "recipe)")
    p.add_argument("--native_size", type=int, default=96,
                   help="on-disk cutout size (132 = reference native)")
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    yml = os.path.join(args.workdir, "data", "ds.yaml")
    if not os.path.exists(yml):
        yml = make_dataset(os.path.join(args.workdir, "data"),
                           n=args.images, size=args.native_size)
        print("[drill] dataset ready", flush=True)

    # --- run A: uninterrupted -------------------------------------------
    ck_a = os.path.join(args.workdir, "runsA")
    t0 = time.perf_counter()
    pa, fa = launch(yml, ck_a, args.epochs, cpu=args.cpu,
                    imgsz=args.imgsz,
                    log_path=os.path.join(args.workdir, "A.log"))
    pa.wait()
    fa.close()
    wall_a = time.perf_counter() - t0
    if pa.returncode != 0:
        print(open(os.path.join(args.workdir, "A.log"),
                   errors="replace").read()[-3000:])
        return 1
    loss_a = epoch_losses(os.path.join(args.workdir, "A.log"))
    print(f"[drill] run A: {len(loss_a)} epochs in {wall_a:.0f}s",
          flush=True)

    # --- run B: SIGKILL around the midpoint ------------------------------
    ck_b = os.path.join(args.workdir, "runsB")
    pb, fb = launch(yml, ck_b, args.epochs, cpu=args.cpu,
                    imgsz=args.imgsz,
                    log_path=os.path.join(args.workdir, "B.log"))
    time.sleep(max(20.0, args.kill_frac * wall_a))
    pb.send_signal(signal.SIGKILL)
    pb.wait()
    fb.close()
    n_b = len(epoch_losses(os.path.join(args.workdir, "B.log")))
    print(f"[drill] run B killed after {n_b} epochs", flush=True)
    if n_b < 2 or n_b >= args.epochs - 2:
        print("[drill] kill point unusable; adjust --kill_frac")
        return 1

    # --- run C: resume ----------------------------------------------------
    pc, fc = launch(yml, ck_b, args.epochs, resume=ck_b, cpu=args.cpu,
                    imgsz=args.imgsz,
                    log_path=os.path.join(args.workdir, "C.log"))
    pc.wait()
    fc.close()
    if pc.returncode != 0:
        print(open(os.path.join(args.workdir, "C.log"),
                   errors="replace").read()[-3000:])
        return 1
    loss_c = epoch_losses(os.path.join(args.workdir, "C.log"))
    resume_at = args.epochs - len(loss_c)
    tail_a = loss_a[resume_at:]

    import numpy as np
    la, lc = np.asarray(tail_a), np.asarray(loss_c)
    max_rel = float(np.abs(la - lc).max() / np.abs(la).max())
    dg_a = np.asarray(digest(os.path.join(ck_a, "last")))
    dg_c = np.asarray(digest(os.path.join(ck_b, "last")))
    dg_rel = float(np.abs(dg_a - dg_c).max() / np.abs(dg_a).max())
    # bf16 mixed-precision trajectory tolerance: losses within 2%,
    # final per-layer weight digests within 1%
    ok = max_rel < 0.02 and dg_rel < 0.01
    print("[drill] " + json.dumps({
        "epochs_total": args.epochs,
        "imgsz": args.imgsz,
        "native_size": args.native_size,
        "images": args.images,
        "killed_after_epochs": n_b,
        "resumed_at_epoch": resume_at,
        "trajectory_max_rel_diff": round(max_rel, 6),
        "final_digest_max_rel_diff": round(dg_rel, 6),
        "loss_A_first_last": [loss_a[0], loss_a[-1]],
        "loss_C_last": loss_c[-1] if len(loss_c) else None,
        "wall_A_s": round(wall_a, 1),
        "match_within_bf16_tolerance": ok,
    }), flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
