"""Mosaic-scale source finding: tiling, batched mesh-sharded inference,
edge handling, stitching, catalog output.

TPU-native re-design of the reference SFinder (reference
inference.py:280-1287).  What changes and why:

  reference (MPI)                          this (TPU mesh)
  ---------------------------------------  -----------------------------------
  N python processes, each with its own    one process per host; params live
  full model copy (run.py:222-356)         once per chip, replicated via
                                           NamedSharding
  static round-robin tile->rank map        tiles grouped by shape, batched,
  (inference.py:1008-1029)                 batch axis sharded over the mesh
  per-tile torch dispatch + ultralytics    ONE jitted XLA program per tile
  NMS (evaluation.py:181-193)              shape: preproc+forward+decode+NMS
  pickled dict send/recv gather            fixed-shape device arrays; XLA
  (inference.py:954-978)                   moves data over ICI
  blocking disk read per tile              thread-pool prefetch overlapping
  (inference.py:190-195)                   reads with device compute

Host-side stitching (tiny N) reproduces the reference's exact merge
semantics (parallel/stitch.py).  Per-tile failures are captured and
skipped with a log, matching the reference's status-code-and-continue
policy (inference.py:615-618), plus an error ledger for observability.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np

from caesar_yolo_tpu import logger
from caesar_yolo_tpu.detect.analyzer import Analyzer, AnalyzerOutputs
from caesar_yolo_tpu.detect.merge import merge_detections
from caesar_yolo_tpu.detect.predictor import Predictor
from caesar_yolo_tpu.outputs.catalog import (
    CLASS_COLOR_MAP_DS9_MOSAIC,
    CLASS_NAMES,
    make_json_results,
    make_objects,
    write_json,
)
from caesar_yolo_tpu.outputs.ds9 import write_ds9_regions
from caesar_yolo_tpu.parallel.engine import TileEngine, prefetch_to_host
from caesar_yolo_tpu.parallel.mesh import pad_to_multiple
from caesar_yolo_tpu.parallel.stitch import flag_edge_sources, stitch_tile_sources
from caesar_yolo_tpu.utils import fits_native
from caesar_yolo_tpu.utils.fits import (
    beam_area_from_header,
    get_fits_header,
    read_fits_crop,
    read_image,
)
from caesar_yolo_tpu.utils.tiling import (
    TileWindow,
    generate_tiles,
    make_tile_windows,
    neighbor_table,
)


@dataclass(frozen=True)
class SFinderConfig:
    """Frozen run configuration (replaces the reference's mutable global
    CONFIG dict, config.py:4-59 — no live objects, no globals)."""
    image_path: str = ""
    image_xmin: int = 0
    image_xmax: int = 0
    image_ymin: int = 0
    image_ymax: int = 0
    img_size: int = 640
    score_thr: float = 0.7
    iou_thr: float = 0.5
    # static pre-NMS candidate window (ultralytics considers 30000; a
    # fixed-shape TPU program picks a top-k window and REPORTS overflow
    # instead of silently truncating — see detect/nms.py)
    pre_nms: int = 512
    merge_overlap_iou_thr_soft: float = 0.3
    merge_overlap_iou_thr_hard: float = 0.8
    split_image_in_tiles: bool = False
    tile_xsize: int = 256
    tile_ysize: int = 256
    tile_xstep: float = 1.0
    tile_ystep: float = 1.0
    max_ntasks_per_worker: int = 100
    batch_size: int = 8
    save_catalog: bool = True
    save_region: bool = True
    save_tile_catalog: bool = False
    save_tile_region: bool = False
    save_tile_img: bool = False
    save_img: bool = False
    draw_plot: bool = False
    save_plot: bool = False
    draw_class_label_in_caption: bool = True
    outfile_json: str = ""
    outfile_ds9: str = ""
    class_names: tuple = CLASS_NAMES
    # auxiliary subsystems (SURVEY.md §5 rebuild items)
    profile_dir: str = ""      # write a jax.profiler trace of the run
    resume: bool = False       # resume a crashed tiled run from the spool
    spool_path: str = ""       # per-tile result spool (default: auto)
    # multi-host: CHUNK size of the fixed-shape chunked allgather
    # (replaces the reference's pickled MPI send/recv,
    # inference.py:954-978).  Payloads larger than this take more
    # gather rounds — never an error.
    gather_payload_bytes: int = 8 * 1024 * 1024
    # host->device tile transfer dtype: "bfloat16" halves relay bytes
    # (full f32 range, 8-bit mantissa) for link-bound hosts; default
    # stays exact f32 — see TileEngine.relay_dtype
    relay_dtype: str = "float32"
    # Device-resident tiling ("auto"|"on"|"off"): ship the mosaic to HBM
    # ONCE and extract tile windows in-graph (TileEngine.put_mosaic /
    # process_mosaic_async) instead of shipping each window — an
    # overlapping grid (tile step < 1) re-ships every overlap pixel on
    # the per-window path, so device tiling cuts host->device bytes by
    # the overlap factor (4x at step 0.5) and collapses the disk IO to
    # one sequential read.  "auto" = FITS mosaics whose pixels fit the
    # cap below; falls back to the streaming windowed-read path.
    device_tiling: str = "auto"
    device_tiling_max_bytes: int = 2 * 1024 * 1024 * 1024
    # Preprocessing statistics context for tiled runs:
    #   "tile"   — each tile's stretch/normalize statistics come from its
    #              own pixels (REFERENCE PARITY: the reference applies
    #              its numpy pipeline per window, evaluation.py:157-161,
    #              so a bright source shifts only its own tile's zscale)
    #   "global" — statistics from the WHOLE (device-resident) mosaic;
    #              tiles are sliced from the once-preprocessed mosaic, so
    #              every tile sees the pixel values a serial whole-image
    #              run sees.  TPU-native: costs one fused pass over the
    #              HBM-resident mosaic (the reference could never afford
    #              this).  Requires the device-tiling "full" path; the
    #              banded / streaming windowed-read paths fall back to
    #              "tile" with a warning.
    preproc_context: str = "tile"


@dataclass
class SFinderReport:
    """Run observability: timings and per-tile failures."""
    runtime_s: float = 0.0
    n_tiles: int = 0
    n_local_tiles: int = 0  # tiles this process owned (multi-host stripe)
    n_sources: int = 0
    max_inflight_batches: int = 0  # peak read-futures + undrained batches
    h2d_put_s: float = 0.0  # wall spent blocked on H2D puts (worker sum)
    gather_rounds: int = 0  # chunked-allgather rounds (multi-host runs)
    gather_bytes: int = 0   # this rank's gathered payload size
    phase_times: dict = field(default_factory=dict)
    tile_errors: list = field(default_factory=list)


class SFinder:
    """Mosaic source finder over a (possibly multi-chip) TPU mesh."""

    def __init__(self, model, params, config: SFinderConfig, *,
                 preprocessor=None, mesh=None, engine_kwargs=None,
                 predictor=None, engine=None):
        self.model = model
        self.params = params
        self.config = config
        self.preprocessor = preprocessor
        self.mesh = mesh
        self.engine_kwargs = dict(engine_kwargs or {})
        self.sources: dict = {"sources": []}
        self.report = SFinderReport()
        # compiled engine caches; injectable so datalist runs share ONE
        # jit cache across images instead of recompiling per SFinder
        self._engine = engine
        base = os.path.basename(os.path.abspath(config.image_path))
        self.image_id = os.path.splitext(base)[0]
        self.header = None
        self.beam_info = None  # dx/dy/bmaj/bmin/pa/pixel_area/beam_area
        self.nx = self.ny = -1
        self.xmin = self.ymin = 0
        self._predictor = predictor  # compiled serial-path cache
        self._image_cache = None  # PNG/JPEG decode reused by run()

    # -- image metadata ------------------------------------------------------

    def set_img_size_params(self) -> int:
        """Image size / crop range / beam area from the FITS header
        (reference inference.py:354-477; the nx/ny-before-assignment
        quirk at :374-381 is fixed here)."""
        cfg = self.config
        ext = os.path.splitext(cfg.image_path)[1]
        if ext == ".fits":
            self.header = get_fits_header(cfg.image_path)
            if self.header is None:
                logger.error("Header read from image %s is None!",
                             cfg.image_path)
                return -1
        crop = (cfg.image_xmin >= 0 and cfg.image_xmax > 0
                and cfg.image_ymin >= 0 and cfg.image_ymax > 0)
        if crop:
            self.xmin, self.ymin = cfg.image_xmin, cfg.image_ymin
            self.xmax, self.ymax = cfg.image_xmax, cfg.image_ymax
            self.nx = self.xmax - self.xmin + 1
            self.ny = self.ymax - self.ymin + 1
        else:
            if ext == ".fits":
                if "NAXIS1" not in self.header or "NAXIS2" not in self.header:
                    logger.error("NAXIS1/NAXIS2 missing in header!")
                    return -1
                self.nx = int(self.header["NAXIS1"])
                self.ny = int(self.header["NAXIS2"])
            else:
                res = read_image(cfg.image_path)
                if res is None:
                    return -1
                self._image_cache = res  # run() reuses (no double decode)
                self.ny, self.nx = res[0].shape[:2]
            self.xmin, self.ymin = 0, 0
            self.xmax, self.ymax = self.nx - 1, self.ny - 1
        if self.header is not None:
            self.beam_info = beam_area_from_header(self.header)
        return 0

    # -- serial path ---------------------------------------------------------

    def run(self) -> int:
        """Whole-image (or crop) detection on one device batch of 1
        (reference inference.py:485-552)."""
        t0 = time.time()
        if self.set_img_size_params() < 0:
            return -1
        cfg = self.config
        ext = os.path.splitext(cfg.image_path)[1]
        if ext == ".fits":
            # config crop bounds are INCLUSIVE (set_img_size_params:
            # nx = xmax - xmin + 1, and run_tiled tiles [xmin, xmax+1));
            # read_fits_crop takes an EXCLUSIVE window — translate, so
            # serial and tiled runs cover the same pixels
            crop = (cfg.image_xmin >= 0 and cfg.image_xmax > 0
                    and cfg.image_ymin >= 0 and cfg.image_ymax > 0)
            res = read_fits_crop(
                cfg.image_path, cfg.image_xmin,
                cfg.image_xmax + 1 if crop else cfg.image_xmax,
                cfg.image_ymin,
                cfg.image_ymax + 1 if crop else cfg.image_ymax,
                strip_deg_axis=True)
            if res is None:
                logger.error("Failed to read image %s!", cfg.image_path)
                return -1
            image_data, header, _ = res
        elif ext in (".png", ".jpg", ".jpeg"):
            res = (self._image_cache if self._image_cache is not None
                   else read_image(cfg.image_path))
            if res is None:
                return -1
            image_data = res[0]
            crop = (cfg.image_xmin >= 0 and cfg.image_xmax > 0
                    and cfg.image_ymin >= 0 and cfg.image_ymax > 0)
            if crop:
                # the reference silently ignores the crop flags for
                # PNG/JPEG (inference.py:511-519 reads the full image
                # and predicts with xmin=ymin=0); here the crop is
                # honored — Analyzer.predict gets the crop origin as
                # offset, so the SLICE must be taken too or every
                # catalog coordinate would shift by the origin without
                # the pixels moving
                h, w = image_data.shape[:2]
                if cfg.image_xmax >= w or cfg.image_ymax >= h:
                    logger.error(
                        "Crop window [%d:%d, %d:%d] exceeds image size "
                        "%dx%d!", cfg.image_xmin, cfg.image_xmax,
                        cfg.image_ymin, cfg.image_ymax, w, h)
                    return -1
                image_data = image_data[cfg.image_ymin:cfg.image_ymax + 1,
                                        cfg.image_xmin:cfg.image_xmax + 1]
        else:
            logger.error("Unsupported image format (%s) given!", ext)
            return -1

        if self._predictor is None:
            self._predictor = Predictor(
                self.model, self.params, img_size=cfg.img_size,
                score_thr=cfg.score_thr, iou_thr=cfg.iou_thr,
                pre_nms=cfg.pre_nms, **self.engine_kwargs)
        predictor = self._predictor
        outputs = AnalyzerOutputs(
            write_json=cfg.save_catalog, write_ds9=cfg.save_region,
            save_img=cfg.save_img, draw=cfg.draw_plot,
            save_plot=cfg.save_plot,
            draw_class_label_in_caption=cfg.draw_class_label_in_caption,
            outfile_json=cfg.outfile_json or f"out_{self.image_id}.json",
            outfile_ds9=cfg.outfile_ds9 or f"out_{self.image_id}.reg")
        analyzer = Analyzer(
            predictor, preprocessor=self.preprocessor,
            soft_merge_thr=cfg.merge_overlap_iou_thr_soft,
            hard_merge_thr=cfg.merge_overlap_iou_thr_hard,
            outputs=outputs, class_names=cfg.class_names)
        rc = analyzer.predict(image_data, self.image_id,
                              xmin=self.xmin, ymin=self.ymin)
        self.report.runtime_s = time.time() - t0
        if rc < 0:
            logger.error("Failed to run model prediction on image %s!",
                         cfg.image_path)
            return -1
        n = len(analyzer.detections)
        self.report.n_sources = n
        self.sources = {"sources": analyzer.results["objs"]}
        logger.info("#%d objects found in image %s (%.2fs)", n,
                    cfg.image_path, self.report.runtime_s)
        return 0

    # -- tiled path ----------------------------------------------------------

    def run_tiled(self) -> int:
        """Tile the mosaic, run batched sharded inference, stitch, save
        (reference inference.py:578-658 run_parallel).

        Crash resilience: completed tile results are spooled to disk as
        they arrive; a rerun with resume=True skips finished tiles (the
        reference has no such path — a failed run restarts from zero,
        SURVEY.md §5).  With profile_dir set, the whole run is captured
        as a jax.profiler trace."""
        if self.config.profile_dir:
            import jax
            with jax.profiler.trace(self.config.profile_dir):
                return self._run_tiled_impl()
        return self._run_tiled_impl()

    def _run_tiled_impl(self) -> int:
        t0 = time.time()
        cfg = self.config
        if os.path.splitext(cfg.image_path)[1] != ".fits":
            logger.error("Only FITS images are supported in tiled runs!")
            return -1
        if self.set_img_size_params() < 0:
            return -1

        grid = generate_tiles(self.xmin, self.xmax, self.ymin, self.ymax,
                              cfg.tile_xsize, cfg.tile_ysize,
                              cfg.tile_xstep, cfg.tile_ystep)
        if grid is None:
            return -1
        tiles = make_tile_windows(grid)
        emesh = self._inference_mesh()
        n_local = int(np.prod(emesh.devices.shape)) if emesh else 1
        import jax as _jax
        n_dev = n_local * _jax.process_count()
        per_worker = -(-len(tiles) // n_dev)
        if per_worker > cfg.max_ntasks_per_worker:
            # same guard as the reference (inference.py:1150-1160)
            logger.error(
                "Too many tasks per worker (%d > %d): increase tile size, "
                "devices, or max_ntasks_per_worker!", per_worker,
                cfg.max_ntasks_per_worker)
            return -1
        self.report.n_tiles = len(tiles)
        logger.info("Split image %s into %d tiles (%dx%d, step %.2f/%.2f)",
                    self.image_id, len(tiles), cfg.tile_xsize,
                    cfg.tile_ysize, cfg.tile_xstep, cfg.tile_ystep)

        if self._engine is None:
            self._engine = TileEngine(
                self.model, self.params, preprocessor=self.preprocessor,
                mesh=emesh, img_size=cfg.img_size,
                score_thr=cfg.score_thr, iou_thr=cfg.iou_thr,
                pre_nms=cfg.pre_nms, relay_dtype=cfg.relay_dtype,
                **self.engine_kwargs)
        engine = self._engine

        t_detect = time.time()
        tile_results = self._detect_tiles(engine, tiles)
        self.report.phase_times["detect"] = time.time() - t_detect

        # edge flagging (reference inference.py:663-726)
        t_edge = time.time()
        tile_by_id = {t.tid: t for t in tiles}
        for tr in tile_results:
            nb = [tile_by_id[tid] for tid in tr["neighborTileIds"]]
            flag_edge_sources(tr["objs"], tile_by_id[tr["tileId"]], nb)
        self.report.phase_times["edge_flagging"] = time.time() - t_edge

        # stitch (reference inference.py:731-931)
        t_stitch = time.time()
        self.sources = stitch_tile_sources(tile_results)
        self.report.phase_times["stitch"] = time.time() - t_stitch
        # observability: the per-tile result set the stitch consumed
        # (spool-schema dicts) — lets harnesses seed a resume spool from
        # a real run's partial state (__graft_entry__ resume leg) and
        # callers inspect per-tile outcomes without re-parsing outputs
        self.last_tile_results = tile_results

        self.save()
        self.report.runtime_s = time.time() - t0
        self.report.n_sources = len(self.sources["sources"])
        logger.info("Run completed in %.2f seconds (%d tiles, %d sources)",
                    self.report.runtime_s, len(tiles),
                    self.report.n_sources)
        return 0

    def _spool_file(self) -> str:
        """Per-process spool name: multi-host runs on a shared filesystem
        must not collide (the reference writes only from rank 0,
        inference.py:641-648; our spool is per-rank local state).  The
        per-rank suffix applies to an explicit --spool_path too —
        without it, N processes would interleave buffered appends into
        ONE file and a later resume would parse garbage (or load the
        other ranks' tiles and duplicate them after the allgather)."""
        import jax as _jax
        base = (self.config.spool_path
                or f".{self.image_id}.tilespool.jsonl")
        if _jax.process_count() > 1:
            root, ext = os.path.splitext(base)
            base = f"{root}.p{_jax.process_index()}{ext}"
        return base

    def _grid_signature(self) -> dict:
        """Everything that changes what a spooled tile result MEANS:
        resuming with a different grid would stitch stale windows from
        another geometry into the new one (wrong neighbors, stale tids).
        The image path is part of the signature: a spool shared across a
        datalist (or an auto-name collision between a/field.fits and
        b/field.fits) must never stitch another image's tiles in.  The
        tid stripe (process index/count) is too: spools are per-rank
        files holding tid % nproc == rank results, so resuming under a
        DIFFERENT topology would keep tiles the new stripe assigns to
        other ranks — which recompute them, duplicating every source in
        those tiles after the allgather."""
        import jax as _jax
        cfg = self.config
        return {"image": cfg.image_path,
                "stripe": [_jax.process_index(), _jax.process_count()],
                "tile_xsize": cfg.tile_xsize, "tile_ysize": cfg.tile_ysize,
                "tile_xstep": cfg.tile_xstep, "tile_ystep": cfg.tile_ystep,
                "crop": [cfg.image_xmin, cfg.image_xmax,
                         cfg.image_ymin, cfg.image_ymax],
                "img_size": cfg.img_size, "score_thr": cfg.score_thr,
                "iou_thr": cfg.iou_thr, "pre_nms": cfg.pre_nms}

    def _load_spool(self, sig: dict) -> dict:
        """tid -> tile result dict from a previous crashed run.  Empty
        when the spool is missing, unreadable, or was written under a
        DIFFERENT grid signature (including legacy spools without one)."""
        import json
        done = {}
        path = self._spool_file()
        if not os.path.exists(path):
            return done
        try:
            f = open(path)
        except OSError as e:
            logger.warning("Ignoring unreadable spool %s (%s)", path, e)
            return done
        with f:
            try:
                head = json.loads(f.readline() or "null")
            except ValueError:
                head = None
            if not isinstance(head, dict) or head.get("gridSig") != sig:
                logger.warning(
                    "Ignoring spool %s: it was written under a "
                    "different tiling/detection configuration "
                    "(resume requires identical settings)", path)
                return done
            for line in f:
                # a crash mid-write (the exact failure mode the spool
                # exists to survive) leaves one torn trailing line;
                # keep every COMPLETE result and drop only the tail —
                # clearing everything would recompute the whole run
                try:
                    tr = json.loads(line)
                    done[tr["tileId"]] = tr
                except Exception:
                    logger.warning(
                        "Dropping torn trailing record in spool %s "
                        "(crash mid-write); keeping %d complete tile "
                        "results", path, len(done))
                    break
        logger.info("Resuming: %d tile results loaded from %s",
                    len(done), path)
        return done

    def _inference_mesh(self):
        """The mesh tiled inference shards over: the caller's mesh on a
        single host; THIS process's local devices under jax.distributed
        (tiles stripe across processes — each host holds different
        pixels, so a global batch axis is impossible by construction;
        see parallel/mesh.py module docstring)."""
        import jax as _jax
        if self.mesh is not None and _jax.process_count() > 1:
            from caesar_yolo_tpu.parallel.mesh import local_mesh
            return local_mesh()
        return self.mesh

    def _device_tiling_mode(self, engine: TileEngine, groups) -> str | None:
        """"full" (whole mosaic to HBM once), "band" (one full-width
        band per grid row — the overlap win holds for mosaics past the
        HBM cap, only the vertical overlap re-ships), or None (stream
        windowed reads).

        Auto mode compares actual transfer bytes for THIS process's
        REMAINING tiles (after resume-spool skips and multi-host
        striping): the mosaic/band bytes each pixel would cross the
        link once vs the per-window bytes the streaming path ships —
        so a resumed run with 3 tiles left or a heavily-striped
        multi-host run streams windows instead of re-shipping the
        whole mosaic."""
        cfg = self.config
        if cfg.device_tiling == "off" or not groups:
            return None
        if cfg.device_tiling == "on":
            return "full"
        item = engine.relay_np_dtype.itemsize
        window_bytes = sum(len(g) * h * w
                           for (h, w), g in groups.items()) * item
        full_bytes = self.nx * self.ny * item
        if (full_bytes <= cfg.device_tiling_max_bytes
                and full_bytes <= window_bytes):
            return "full"
        rows = {(t.ymin, t.ymax) for g in groups.values() for t in g}
        band_bytes = sum(self.nx * (y1 - y0) for y0, y1 in rows) * item
        max_band = max(self.nx * (y1 - y0) for y0, y1 in rows) * item
        if (max_band <= cfg.device_tiling_max_bytes
                and band_bytes <= window_bytes):
            logger.info(
                "Device tiling: banded (bands %.1f MB <= windows "
                "%.1f MB; full mosaic %.1f MB)", band_bytes / 1e6,
                window_bytes / 1e6, full_bytes / 1e6)
            return "band"
        logger.info(
            "Device tiling skipped: windowed reads ship fewer bytes "
            "(windows %.1f MB vs mosaic %.1f MB / bands %.1f MB, "
            "cap %d)", window_bytes / 1e6, full_bytes / 1e6,
            band_bytes / 1e6, cfg.device_tiling_max_bytes)
        return None

    def _load_device_mosaic(self, engine: TileEngine):
        """The host-side mosaic (crop) array for device-resident tiling,
        or None when it is unreadable (the caller then streams windowed
        reads instead)."""
        cfg = self.config
        nbytes = self.nx * self.ny * engine.relay_np_dtype.itemsize
        res = read_fits_crop(cfg.image_path, self.xmin, self.xmax + 1,
                             self.ymin, self.ymax + 1, strip_deg_axis=True)
        if res is None or np.asarray(res[0]).ndim != 2:
            logger.warning("Device tiling skipped: full mosaic read "
                           "failed; streaming windowed reads instead")
            return None
        logger.info("Device tiling: shipping the %dx%d mosaic to HBM "
                    "once (%.1f MB)", self.ny, self.nx, nbytes / 1e6)
        return np.asarray(res[0], np.float32)

    def _detect_tiles(self, engine: TileEngine, tiles: list[TileWindow]):
        """Shape-grouped, batch-padded, prefetched tile detection."""
        import json
        cfg = self.config
        n_dev = (int(np.prod(engine.mesh.devices.shape))
                 if engine.mesh else 1)
        batch = max(cfg.batch_size, n_dev)
        batch = pad_to_multiple(batch, n_dev)

        sig = self._grid_signature()
        done = self._load_spool(sig) if cfg.resume else {}
        # append only onto a spool we validated (done non-empty implies
        # a matching signature header); otherwise start fresh with the
        # signature as the first record
        spool = open(self._spool_file(), "a" if done else "w")
        if not done:
            spool.write(json.dumps({"gridSig": sig}) + "\n")
            spool.flush()
        arrs_by_tid: dict[int, np.ndarray] = {}  # for save_tile_img

        # multi-host: stripe tiles across processes (each host owns
        # tid % nproc == its index; the reference's round-robin
        # rank assignment, inference.py:1008-1029)
        import jax as _jax
        nproc = _jax.process_count()
        pid = _jax.process_index()

        groups: dict[tuple, list[TileWindow]] = {}
        for t in tiles:
            if t.tid in done:
                continue
            if nproc > 1 and t.tid % nproc != pid:
                continue
            self.report.n_local_tiles += 1
            groups.setdefault((t.height, t.width), []).append(t)

        def read_tile(t: TileWindow):
            res = read_fits_crop(cfg.image_path, t.xmin, t.xmax,
                                 t.ymin, t.ymax, strip_deg_axis=True)
            if res is None:
                return None
            data = res[0]
            return np.asarray(data, np.float32)[:, :, None] \
                if data.ndim == 2 else np.asarray(data, np.float32)

        def read_batch(tile_batch):
            """Native GIL-free batch read when available; else threaded
            python windowed reads."""
            if fits_native.available():
                wins = [(t.xmin, t.xmax, t.ymin, t.ymax)
                        for t in tile_batch]
                tiles_np = fits_native.read_tiles_batch(
                    cfg.image_path, wins)
                if tiles_np is not None:
                    return [t[:, :, None] for t in tiles_np]
            return list(pool.map(read_tile, tile_batch))

        def drain(item):
            kept_tiles, outs = item
            # ONE device_get for all six outputs: the host<->device relay
            # is latency-bound per pull (~22 ms base on the axon backend),
            # so six sequential np.asarray calls cost ~4.4x one batched
            # get (measured 188.8 vs 42.5 ms per batch-128)
            boxes, scores, cls, valid, tile_ok, ndrop = \
                _jax.device_get(outs)
            for k, t in enumerate(kept_tiles):
                # pop unconditionally: stored views pin the whole batch
                # buffer, and tile_ok=False entries would otherwise leak
                tile_img = (arrs_by_tid.pop(t.tid, None)
                            if cfg.save_tile_img else None)
                if ndrop[k]:
                    logger.warning(
                        "Tile %d: NMS pre-filter dropped %d "
                        "above-threshold candidates (raise "
                        "pre_nms=%d for this field)", t.tid,
                        int(ndrop[k]), cfg.pre_nms)
                if not tile_ok[k]:
                    continue
                tr = self._tile_objects(
                    t, boxes[k][valid[k]], scores[k][valid[k]],
                    cls[k][valid[k]], neighbor_ids=None)
                if tile_img is not None:
                    from caesar_yolo_tpu.utils.fits import write_fits
                    write_fits(tile_img,
                               f"timg_{self.image_id}_tid{t.tid}.fits")
                results.append(tr)
                spool.write(json.dumps(tr) + "\n")
            spool.flush()

        results = []
        mode = self._device_tiling_mode(engine, groups)
        if mode == "full":
            mosaic_np = self._load_device_mosaic(engine)
            if mosaic_np is None:
                mode = None  # unreadable -> stream windowed reads
        global_ctx = cfg.preproc_context == "global"
        if global_ctx and mode != "full":
            logger.warning(
                "preproc_context='global' needs the device-resident "
                "mosaic path (device_tiling mode=%s here); falling back "
                "to per-tile statistics context", mode)
            global_ctx = False
        if mode == "full":
            # Device-resident tiling: the mosaic crosses the link ONCE;
            # windows are extracted in-graph (TileEngine.put_mosaic /
            # process_mosaic_async), so an overlapping grid ships no
            # pixel twice and the disk IO is one sequential read.
            from collections import deque
            mosaic_dev = engine.put_mosaic(mosaic_np)
            if global_ctx:
                # global statistics context: preprocess the WHOLE mosaic
                # once on device; tiles sliced below skip the per-tile
                # pipeline (TileEngine.preprocess_mosaic)
                mosaic_dev, g_ok = engine.preprocess_mosaic(mosaic_dev)
                if not g_ok:
                    logger.warning(
                        "Whole-mosaic preprocessing flagged the image "
                        "invalid (degenerate statistics); per-tile "
                        "guards will reject affected tiles")
            if not cfg.save_tile_img:
                del mosaic_np  # host copy not needed past this point
            device_groups, groups = groups, {}
            for (h, w), group in device_groups.items():
                pending = deque()
                for i in range(0, len(group), batch):
                    tile_batch = group[i:i + batch]
                    origins = np.zeros((batch, 2), np.int32)
                    for k, t in enumerate(tile_batch):
                        origins[k] = (t.ymin - self.ymin,
                                      t.xmin - self.xmin)
                    if cfg.save_tile_img:
                        for t in tile_batch:
                            arrs_by_tid[t.tid] = mosaic_np[
                                t.ymin - self.ymin:t.ymax - self.ymin,
                                t.xmin - self.xmin:t.xmax - self.xmin]
                    outs = engine.process_mosaic_async(
                        mosaic_dev, origins, (h, w),
                        preprocessed=global_ctx)
                    prefetch_to_host(outs)
                    pending.append((list(tile_batch), outs))
                    self.report.max_inflight_batches = max(
                        self.report.max_inflight_batches, len(pending))
                    if len(pending) > 2:
                        drain(pending.popleft())
                while pending:
                    drain(pending.popleft())
        elif mode == "band":
            # Banded device tiling for mosaics past the HBM cap: one
            # full-width band per GRID ROW crosses the link (the grid's
            # y windows are per-row constant, so a band covers its row's
            # tiles exactly); horizontal overlap never re-ships, only
            # the vertical tile overlap does.  Band reads prefetch one
            # ahead; memory stays bounded at ~4 bands.
            from collections import deque
            bands: dict = {}
            for (h, w), group in groups.items():
                for t in group:
                    bands.setdefault((t.ymin, t.ymax), {}) \
                         .setdefault((h, w), []).append(t)
            groups = {}
            band_keys = sorted(bands)

            def read_band(bk):
                """Worker-side band read + DEVICE PUT: the next band
                ships over the link while the current band's batches
                compute (H2D double-buffering on the banded path)."""
                res = read_fits_crop(cfg.image_path, self.xmin,
                                     self.xmax + 1, bk[0], bk[1],
                                     strip_deg_axis=True)
                if res is None or np.asarray(res[0]).ndim != 2:
                    return None
                band_np = np.asarray(res[0], np.float32)
                t_put = time.time()
                band_dev = engine.put_mosaic(band_np)
                put_s = time.time() - t_put
                return (band_np if cfg.save_tile_img else None,
                        band_dev, put_s)

            with ThreadPoolExecutor(max_workers=2) as bpool:
                futs: deque = deque()
                nxt = 0

                def submit_band():
                    nonlocal nxt
                    if nxt < len(band_keys):
                        futs.append((band_keys[nxt],
                                     bpool.submit(read_band,
                                                  band_keys[nxt])))
                        nxt += 1

                submit_band()
                submit_band()
                pending = deque()
                while futs:
                    bk, fut = futs.popleft()
                    staged = fut.result()
                    submit_band()
                    if staged is None:
                        # re-queue this row's tiles on the host path
                        for shp, ts in bands[bk].items():
                            groups.setdefault(shp, []).extend(ts)
                        logger.warning(
                            "Band read failed at rows [%d,%d); falling "
                            "back to windowed reads for its tiles", *bk)
                        continue
                    band_np, band_dev, put_s = staged
                    self.report.h2d_put_s += put_s
                    for (h, w), ts in bands[bk].items():
                        for i in range(0, len(ts), batch):
                            tb = ts[i:i + batch]
                            origins = np.zeros((batch, 2), np.int32)
                            for k, t in enumerate(tb):
                                origins[k] = (0, t.xmin - self.xmin)
                            if cfg.save_tile_img and band_np is not None:
                                for t in tb:
                                    arrs_by_tid[t.tid] = band_np[
                                        :, t.xmin - self.xmin:
                                        t.xmax - self.xmin]
                            outs = engine.process_mosaic_async(
                                band_dev, origins, (h, w))
                            prefetch_to_host(outs)
                            pending.append((list(tb), outs))
                            self.report.max_inflight_batches = max(
                                self.report.max_inflight_batches,
                                len(futs) + len(pending))
                            if len(pending) > 2:
                                drain(pending.popleft())
                while pending:
                    drain(pending.popleft())
        # Streaming pipeline with BOUNDED memory: at most 2 read futures
        # in flight and at most 2 device batches undrained, whatever the
        # mosaic size (the reference reads one tile window at a time and
        # never holds the mosaic, inference.py:190-195; a 100k-tile run
        # here holds ~4 batches, not 100k tiles).
        with ThreadPoolExecutor(max_workers=8) as pool:
            for (h, w), group in groups.items():
                batches = [group[i:i + batch]
                           for i in range(0, len(group), batch)]
                from collections import deque

                def read_and_stage(tile_batch, h=h, w=w):
                    """Worker-side read + batch assembly + DEVICE PUT:
                    the H2D put of batch N+1 runs in a feeding thread,
                    overlapping the device computing batch N and the
                    main thread's drain — double-buffered puts, the
                    mirror of the D2H prefetch_to_host work."""
                    datas = read_batch(tile_batch)
                    ok_idx = [i for i, d in enumerate(datas)
                              if d is not None]
                    # staged in the engine's relay dtype: with
                    # relay_dtype=bfloat16 the host->device transfer
                    # ships half the bytes (cast happens on assignment)
                    arr = np.zeros((batch, h, w, 1),
                                   engine.relay_np_dtype)
                    for k, i in enumerate(ok_idx):
                        arr[k] = datas[i]
                    t_put = time.time()
                    dev = engine.put_tiles(arr)
                    put_s = time.time() - t_put
                    keep = datas if cfg.save_tile_img else None
                    return ok_idx, keep, dev, put_s

                futures: deque = deque()
                next_batch = 0

                def submit_read():
                    nonlocal next_batch
                    if next_batch < len(batches):
                        futures.append(
                            (batches[next_batch],
                             pool.submit(read_and_stage,
                                         batches[next_batch])))
                        next_batch += 1

                submit_read()
                submit_read()
                pending = deque()  # (batch_tiles, device outputs)
                while futures:
                    tile_batch, fut = futures.popleft()
                    ok_idx, datas, dev, put_s = fut.result()
                    submit_read()
                    self.report.h2d_put_s += put_s
                    ok_set = set(ok_idx)
                    for i, t in enumerate(tile_batch):
                        if i not in ok_set:
                            self.report.tile_errors.append(
                                (t.tid, "read failed"))
                            logger.error("Failed to read tile %d, skipping",
                                         t.tid)
                    if cfg.save_tile_img and datas is not None:
                        for i in ok_idx:
                            arrs_by_tid[tile_batch[i].tid] = \
                                datas[i][:, :, 0]
                    outs = engine.process_async(dev)
                    prefetch_to_host(outs)
                    pending.append(
                        ([tile_batch[i] for i in ok_idx], outs))
                    self.report.max_inflight_batches = max(
                        self.report.max_inflight_batches,
                        len(futures) + len(pending))
                    if len(pending) > 2:
                        drain(pending.popleft())
                while pending:
                    drain(pending.popleft())
        spool.close()
        results.extend(done.values())
        # canonical tileId order: the stitched catalog (S1..SN naming,
        # component traversal) must be a pure function of the tile-result
        # SET — a crash-resumed run appends spooled results after fresh
        # ones, and without this sort its catalog ordering diverged from
        # the uninterrupted run's (scripts/drill_banded_resume.py)
        results.sort(key=lambda tr: tr["tileId"])
        if nproc > 1:
            results = self._gather_multihost(results)
        # attach neighbor ids
        nb = neighbor_table(tiles)
        for tr in results:
            tr["neighborTileIds"] = nb[tr["tileId"]]
        # run finished: the spool is no longer needed
        try:
            os.remove(self._spool_file())
        except OSError:
            pass
        return results

    def _gather_multihost(self, local_results: list[dict]) -> list[dict]:
        """All-gather per-host tile results as fixed-shape byte payloads
        over the mesh (every host ends up with the full list, so the
        stitch/save below is deterministic everywhere — unlike the
        reference, where only rank 0 holds the catalog)."""
        import json
        import jax as _jax
        from jax.experimental import multihost_utils

        cap = self.config.gather_payload_bytes
        blob = json.dumps(local_results).encode()
        nproc = _jax.process_count()
        # round 0: allgather each host's payload length.  Every host
        # derives the SAME chunk count from the same lengths, so the
        # chunked collective schedule below stays symmetric — a crowded
        # catalog never aborts, it just takes more rounds (the reference
        # pickles unbounded MPI send/recv, inference.py:954-978).
        lens = np.asarray(multihost_utils.process_allgather(
            np.asarray([len(blob)], np.uint64))).reshape(-1)
        maxlen = int(lens.max())
        if maxlen == 0:
            return []
        size = min(cap, maxlen)
        nrounds = -(-maxlen // size)
        self.report.gather_rounds = nrounds
        self.report.gather_bytes = len(blob)
        rows = [np.zeros((int(lens[p]),), np.uint8) for p in range(nproc)]
        for r in range(nrounds):
            chunk = np.zeros((size,), np.uint8)
            seg = blob[r * size:(r + 1) * size]
            chunk[:len(seg)] = np.frombuffer(seg, np.uint8)
            got = np.asarray(multihost_utils.process_allgather(
                chunk)).reshape(nproc, size)
            for p in range(nproc):
                lo = r * size
                hi = min(lo + size, int(lens[p]))
                if hi > lo:
                    rows[p][lo:hi] = got[p, :hi - lo]
        merged: list[dict] = []
        for row in rows:
            if row.size:
                merged.extend(json.loads(row.tobytes().decode()))
        merged.sort(key=lambda tr: tr["tileId"])
        return merged

    def _tile_objects(self, t: TileWindow, boxes, scores, cls, neighbor_ids):
        cfg = self.config
        boxes, scores, cls = merge_detections(
            boxes, scores, cls,
            soft_thr=cfg.merge_overlap_iou_thr_soft,
            hard_thr=cfg.merge_overlap_iou_thr_hard)
        objs = make_objects(boxes, scores, cls,
                            image_shape=(t.height, t.width),
                            xmin=t.xmin, ymin=t.ymin,
                            name_tag=f"t{t.tid}",
                            class_names=cfg.class_names)
        if cfg.save_tile_catalog:
            write_json(make_json_results(self.image_id, objs),
                       f"catalog_{self.image_id}_tid{t.tid}.json")
        if cfg.save_tile_region:
            write_ds9_regions(objs,
                              f"catalog_{self.image_id}_tid{t.tid}.reg")
        import jax as _jax
        return {"objs": objs, "tileId": t.tid,
                "workerId": _jax.process_index(),
                "neighborTileIds": neighbor_ids or [],
                "xmin": t.xmin, "xmax": t.xmax,
                "ymin": t.ymin, "ymax": t.ymax}

    # -- output --------------------------------------------------------------

    def save(self):
        """Write the mosaic catalog + DS9 regions, master process only
        (reference inference.py:641-648, 1167-1287).  Every process
        holds the full stitched catalog (the allgather is symmetric),
        but concurrent writes to one path on a shared filesystem race —
        only process 0 touches disk."""
        import jax as _jax
        if _jax.process_index() != 0:
            return
        cfg = self.config
        if cfg.save_catalog:
            out = cfg.outfile_json or f"catalog_{self.image_id}.json"
            write_json(self.sources, out)
            logger.info("Wrote catalog %s", out)
        if cfg.save_region:
            out = cfg.outfile_ds9 or f"ds9_{self.image_id}.reg"
            # mosaic-level palette differs from the per-tile Analyzer
            # map (reference inference.py:334-342)
            write_ds9_regions(self.sources["sources"], out,
                              color_map=CLASS_COLOR_MAP_DS9_MOSAIC)
            logger.info("Wrote regions %s", out)
