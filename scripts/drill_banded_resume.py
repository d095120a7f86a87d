"""On-chip production-scale drill: BANDED device tiling + crash-resume.

The path every production SKA field takes (mosaics past the HBM cap,
reference inference.py:578-658 is the windowed-read analog): a 16k x
16k f32 mosaic (1 GiB of pixels; the device cap is forced to 256 MiB so
"auto" device tiling selects the BANDED path), tiled at step 0.5 with
the trained 96px fixture.

Three runs, all as real subprocesses on the real chip:
  A. uninterrupted          -> golden catalog + throughput numbers
  B. SIGKILLed mid-run      -> leaves a torn per-tile spool behind
  C. --resume               -> must skip B's completed tiles and produce
                               a catalog IDENTICAL to A's

Prints a JSON summary (Mpix/s, bands shipped, bytes over the link,
tiles resumed vs recomputed) and exits nonzero on any mismatch.

    python scripts/drill_banded_resume.py [workdir] [--size 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "fixtures", "yolov8n_synth96.npz")


def synthesize(path: str, size: int, seed: int = 7) -> None:
    from caesar_yolo_tpu.utils.synth import write_mosaic_fits
    t0 = time.perf_counter()
    # source density ~1 per 96px tile-area / 8; sigma matched to the
    # fixture's training distribution (4-8 px at 96px tiles)
    n_src = max(200, (size // 96) ** 2 // 8)
    write_mosaic_fits(path, nx=size, ny=size, n_sources=n_src, seed=seed,
                      noise_sigma=0.08, amp_range=(3.0, 8.0),
                      sigma_range=(4.0, 7.0))
    print(f"[drill] synthesized {size}x{size} ({size*size*4/2**30:.2f} "
          f"GiB, {n_src} sources) in {time.perf_counter()-t0:.1f}s",
          flush=True)


def worker(args) -> int:
    """One tiled run (the subprocess target)."""
    import faulthandler
    faulthandler.dump_traceback_later(240, repeat=True, file=open(
        os.path.join(args.workdir, "worker.stack"), "w"))
    if args.cpu:  # smoke-test mode (the sitecustomize hook overrides
        import jax  # JAX_PLATFORMS, so force it before backend init)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401
    from caesar_yolo_tpu.cli.run import enable_compilation_cache
    enable_compilation_cache()
    from caesar_yolo_tpu.models.convert import load_params
    from caesar_yolo_tpu.models.yolo import build_model
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.parallel import SFinder, SFinderConfig

    params, meta = load_params(FIXTURE)
    model = build_model(meta["model"], num_classes=int(meta["num_classes"]))
    os.chdir(args.workdir)
    cfg = SFinderConfig(
        image_path=args.mosaic, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=96, score_thr=0.30,
        split_image_in_tiles=True, tile_xsize=96, tile_ysize=96,
        tile_xstep=0.5, tile_ystep=0.5, batch_size=128,
        max_ntasks_per_worker=10_000_000,
        device_tiling="auto",
        device_tiling_max_bytes=args.cap,  # below mosaic bytes -> BANDED
        resume=args.resume, spool_path=args.spool,
        outfile_json=args.out,
        save_region=False)
    sf = SFinder(model, params, cfg,
                 preprocessor=build_preprocessor(normalize_minmax=True))
    rc = sf.run_tiled()
    rep = sf.report
    with open(args.out + ".report", "w") as f:
        json.dump({"rc": rc, "runtime_s": rep.runtime_s,
                   "n_tiles": rep.n_tiles,
                   "phase_times": rep.phase_times,
                   "n_sources": rep.n_sources,
                   "tile_errors": len(rep.tile_errors)}, f)
    return rc


def launch(workdir, mosaic, out, spool, cap, resume=False, cpu=False):
    cmd = [sys.executable, os.path.abspath(__file__), workdir,
           "--worker", "--mosaic", mosaic, "--out", out, "--spool", spool,
           "--cap", str(cap)]
    if resume:
        cmd.append("--resume")
    if cpu:
        cmd.append("--cpu")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("--size", type=int, default=16384)
    p.add_argument("--cap", type=int, default=256 * 1024 * 1024,
                   help="device-tiling HBM cap; must sit below the "
                        "mosaic bytes so 'auto' picks the BANDED path")
    p.add_argument("--worker", action="store_true")
    p.add_argument("--mosaic", default="")
    p.add_argument("--out", default="")
    p.add_argument("--spool", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="smoke-test on the CPU backend")
    args = p.parse_args()

    if args.worker:
        return worker(args)

    os.makedirs(args.workdir, exist_ok=True)
    mosaic = os.path.join(args.workdir, "prod_mosaic.fits")
    if not os.path.exists(mosaic):
        synthesize(mosaic, args.size)

    size = args.size
    # --- run A: uninterrupted golden run --------------------------------
    t0 = time.perf_counter()
    pa = launch(args.workdir, mosaic, "catA.json",
                os.path.join(args.workdir, "spoolA.jsonl"), args.cap,
                cpu=args.cpu)
    log_a = pa.communicate()[0].decode()
    wall_a = time.perf_counter() - t0
    if pa.returncode != 0:
        print(log_a[-4000:])
        print("[drill] run A FAILED", flush=True)
        return 1
    n_bands = log_a.count("band") or None
    print(f"[drill] run A done in {wall_a:.1f}s", flush=True)

    # --- run B: SIGKILL mid-run -----------------------------------------
    # Kill on SPOOL PROGRESS, not wall time: run B hits warm compile
    # caches and a warm page cache, so a 0.4*wall_A timer can land after
    # B already finished every tile (observed on-chip) — the resume then
    # proves spool replay but not mid-run recovery.  Poll B's spool and
    # kill at ~half the tiles; also record B's steady tile rate (B is
    # the warm run, so its rate is the one free of first-compile stall).
    n_total = json.load(open(os.path.join(args.workdir,
                                          "catA.json.report")))["n_tiles"]
    pb = launch(args.workdir, mosaic, "catB.json",
                os.path.join(args.workdir, "spoolB.jsonl"), args.cap,
                cpu=args.cpu)
    spool_b = os.path.join(args.workdir, "spoolB.jsonl")

    def spool_lines():
        # Clamp PER FILE: an empty/just-created spool file must contribute
        # 0, not -1 (the -1 is its gridSig header) — otherwise it cancels
        # a real completed tile from another rank's file.
        total = 0
        for f in os.listdir(args.workdir):
            if f.startswith("spoolB"):
                with open(os.path.join(args.workdir, f)) as fh:
                    n = sum(1 for line in fh if line.strip())
                total += max(0, n - 1)
        return total

    samples = []  # (t, done)
    t_b0 = time.perf_counter()
    # Bound the poll by wall clock (3x run A) so a hung run B fails the
    # drill instead of polling forever — the exact failure mode the
    # faulthandler hook was added to debug.
    while pb.poll() is None and time.perf_counter() - t_b0 < 3 * wall_a:
        time.sleep(2.0)
        done_now = spool_lines()
        samples.append((time.perf_counter() - t_b0, done_now))
        if done_now >= 0.5 * n_total:
            break
    self_exited = pb.poll() is not None
    if not self_exited:
        pb.send_signal(signal.SIGKILL)
    out_b = pb.communicate()[0]
    if self_exited and pb.returncode != 0:
        # Run B crashed on its own — that is a run failure, not the
        # intended SIGKILL; dump its log and fail loudly.
        print(out_b.decode(errors="replace")[-4000:])
        print("[drill] run B crashed on its own (rc=%d) — NOT the "
              "intended SIGKILL; drill FAILED" % pb.returncode, flush=True)
        return 1
    done_before = spool_lines()
    # steady rate from the last half of B's samples (past compile/setup)
    active = [(t, d) for t, d in samples if d > 0]
    rate_b = None
    if len(active) >= 2:
        (t0s, d0s), (t1s, d1s) = active[len(active) // 2], active[-1]
        if t1s > t0s and d1s > d0s:
            rate_b = (d1s - d0s) / (t1s - t0s)
    print(f"[drill] run B killed mid-run; spool holds {done_before} of "
          f"{n_total} tile results"
          + (f"; warm steady rate {rate_b:.0f} tiles/s" if rate_b else ""),
          flush=True)
    if done_before >= n_total:
        print("[drill] kill landed after B completed — mid-run recovery "
              "NOT exercised; rerun with a bigger mosaic", flush=True)
        return 1
    if done_before <= 0:
        print("[drill] kill happened before any tile completed — "
              "rerun with a bigger mosaic", flush=True)
        return 1

    # --- run C: resume ---------------------------------------------------
    t0 = time.perf_counter()
    pc = launch(args.workdir, mosaic, "catC.json", spool_b,
                args.cap, resume=True, cpu=args.cpu)
    log_c = pc.communicate()[0].decode()
    wall_c = time.perf_counter() - t0
    if pc.returncode != 0:
        print(log_c[-4000:])
        print("[drill] run C (resume) FAILED", flush=True)
        return 1

    cat_a = json.load(open(os.path.join(args.workdir, "catA.json")))
    cat_c = json.load(open(os.path.join(args.workdir, "catC.json")))
    identical = cat_a["sources"] == cat_c["sources"]
    rep_a = json.load(open(os.path.join(args.workdir, "catA.json.report")))
    rep_c = json.load(open(os.path.join(args.workdir, "catC.json.report")))
    n_tiles = rep_a["n_tiles"]
    grid = size // 48 - 1
    band_bytes = size * 96 * 4
    summary = {
        "mosaic": f"{size}x{size} f32 ({size*size*4/2**30:.2f} GiB)",
        "mode": "banded (cap 256 MiB)",
        "n_tiles": n_tiles,
        "grid_rows": grid,
        "bands_shipped_A": grid,
        "link_bytes_A": grid * band_bytes,
        "runtime_A_s": round(rep_a["runtime_s"], 1),
        "mpix_per_s_A": round(size * size / 1e6 / rep_a["runtime_s"], 1),
        "tiles_per_s_A": round(n_tiles / rep_a["runtime_s"], 1),
        "tiles_per_s_warm": round(rate_b, 1) if rate_b else None,
        "resume_spooled_tiles": done_before,
        "resume_recomputed_tiles": n_tiles - done_before,
        "runtime_C_s": round(rep_c["runtime_s"], 1),
        "n_sources": rep_a["n_sources"],
        "catalog_identical_after_resume": identical,
        "wall_A_s": round(wall_a, 1), "wall_C_s": round(wall_c, 1),
    }
    print("[drill] " + json.dumps(summary), flush=True)
    return 0 if identical else 2


if __name__ == "__main__":
    sys.exit(main())
