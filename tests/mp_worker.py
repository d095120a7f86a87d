"""Standalone worker for the 2-process distribution test (NOT a pytest
module — launched via subprocess by test_multiprocess.py).

The TPU analog of the reference's `mpirun -np 4` localhost smoke
(reference test/run_inference_parallel.sh): N jax.distributed CPU
processes on one machine run the SAME tiled mosaic; tile-id striping
splits the work, the fixed-shape payload allgather reassembles the full
tile-result list on every rank, and only the master writes outputs.

Usage: python mp_worker.py PID NPROC PORT WORKDIR MOSAIC FIXTURE
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir, mosaic, fixture = sys.argv[3:7]

    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    from caesar_yolo_tpu.models.convert import load_params
    from caesar_yolo_tpu.models.yolo import build_model
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.parallel import SFinder, SFinderConfig, make_mesh

    params, meta = load_params(fixture)
    model = build_model(meta["model"], num_classes=int(meta["num_classes"]))
    os.chdir(workdir)
    cfg = SFinderConfig(
        image_path=mosaic, image_xmin=-1, image_xmax=-1, image_ymin=-1,
        image_ymax=-1, img_size=96, score_thr=0.30,
        split_image_in_tiles=True, tile_xsize=96, tile_ysize=96,
        tile_xstep=1.0, tile_ystep=1.0, batch_size=4,
        # tiny chunk -> the payload (a few KB of sources per rank)
        # exceeds it, forcing the multi-round chunked allgather path
        # under real jax.distributed (crowded-catalog proof)
        gather_payload_bytes=int(os.environ.get("CY_GATHER_CHUNK",
                                                8 * 1024 * 1024)))
    # pass the GLOBAL mesh: SFinder must substitute this process's
    # local mesh for tiled inference (tiles are striped per process —
    # a global batch axis cannot hold different hosts' pixels); each
    # rank then shards its stripe over its own 2 virtual devices
    sf = SFinder(model, params, cfg,
                 preprocessor=build_preprocessor(normalize_minmax=True),
                 mesh=make_mesh(),
                 engine_kwargs={"compute_dtype": jnp.float32})
    rc = sf.run_tiled()
    out = {"rc": rc, "pid": pid,
           "n_local_tiles": sf.report.n_local_tiles,
           "n_tiles": sf.report.n_tiles,
           "gather_rounds": sf.report.gather_rounds,
           "sources": sf.sources["sources"]}
    with open(f"rank{pid}.json", "w") as f:
        json.dump(out, f, sort_keys=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
