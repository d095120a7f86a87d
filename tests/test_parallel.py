"""Distribution-layer tests: stitch semantics, mesh-sharded tile engine,
tiled SFinder end-to-end on the 8-device virtual CPU mesh."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.parallel import (
    SFinder,
    SFinderConfig,
    TileEngine,
    flag_edge_sources,
    make_mesh,
    stitch_tile_sources,
)
from caesar_yolo_tpu.models.yolo import build_model, init_params
from caesar_yolo_tpu.utils.tiling import TileWindow


def obj(name, x1, y1, x2, y2, cls=1, score=0.5, edge=False):
    return {"name": name, "x1": float(x1), "x2": float(x2),
            "y1": float(y1), "y2": float(y2), "class_id": cls,
            "class_name": ["spurious", "compact", "extended"][cls],
            "score": score, "edge": edge}


def test_flag_edge_at_tile_bounds():
    tile = TileWindow(0, 256, 0, 256, tid=0)
    objs = [obj("a", 0, 10, 20, 30), obj("b", 50, 50, 80, 80),
            obj("c", 100, 200, 120, 256)]
    flag_edge_sources(objs, tile, [])
    assert objs[0]["edge"] and not objs[1]["edge"] and objs[2]["edge"]


def test_flag_edge_in_overlap_region():
    tile = TileWindow(0, 256, 0, 256, tid=0)
    nb = TileWindow(200, 456, 0, 256, tid=1)  # overlaps x in [200, 256)
    objs = [obj("a", 150, 50, 190, 80), obj("b", 210, 50, 240, 80)]
    flag_edge_sources(objs, tile, [nb])
    assert not objs[0]["edge"] and objs[1]["edge"]


def test_stitch_passthrough_and_merge():
    t0 = {"objs": [obj("S1_t0", 10, 10, 40, 40),                  # interior
                   obj("S2_t0", 240, 100, 256, 130, edge=True,
                       score=0.9, cls=2)],                        # edge
          "tileId": 0, "neighborTileIds": [1], "workerId": 0}
    t1 = {"objs": [obj("S1_t1", 250, 105, 280, 128, edge=True,
                       score=0.4, cls=1)],                        # edge, olap
          "tileId": 1, "neighborTileIds": [0], "workerId": 0}
    out = stitch_tile_sources([t0, t1])
    srcs = out["sources"]
    assert [s["name"] for s in srcs] == ["S1", "S2"]
    interior = srcs[0]
    assert interior["merged"] is False and interior["x1"] == 10
    merged = srcs[1]
    assert merged["merged"] and merged["edge"]
    # enclosing bbox of both members
    assert (merged["x1"], merged["y1"], merged["x2"], merged["y2"]) == \
        (240, 100, 280, 130)
    # class/score from LARGEST AREA member (t0's: 16x30=480 vs t1's 30x23=690)
    assert merged["score"] == 0.4 and merged["class_id"] == 1


def test_stitch_singleton_edge_source_passthrough():
    t0 = {"objs": [obj("S1_t0", 240, 100, 255, 130, edge=True, score=0.9)],
          "tileId": 0, "neighborTileIds": [1], "workerId": 0}
    t1 = {"objs": [], "tileId": 1, "neighborTileIds": [0], "workerId": 0}
    out = stitch_tile_sources([t0, t1])
    assert len(out["sources"]) == 1
    assert out["sources"][0]["merged"] is False
    assert out["sources"][0]["edge"] is True


def test_stitch_non_neighbor_tiles_never_merge():
    # same overlapping coords but tiles are not neighbors
    t0 = {"objs": [obj("a", 0, 0, 30, 30, edge=True)],
          "tileId": 0, "neighborTileIds": [], "workerId": 0}
    t1 = {"objs": [obj("b", 10, 10, 40, 40, edge=True)],
          "tileId": 5, "neighborTileIds": [], "workerId": 0}
    out = stitch_tile_sources([t0, t1])
    assert len(out["sources"]) == 2
    assert all(not s["merged"] for s in out["sources"])


def test_stitch_vectorized_matches_naive_pair_loop():
    """The blocked/vectorized pair discovery must produce the exact
    edges of the reference's O(E^2) loop (inference.py:757-805) on a
    crowded random mosaic — including cross-block pairs (E > the 2048
    row block), neighbor gating, and touching-box merges."""
    rng = np.random.default_rng(42)
    ntiles, E = 9, 3000  # 3x3 grid, E spans two row blocks
    nb = {t: [u for u in range(ntiles)
              if u != t and (abs(u % 3 - t % 3) <= 1
                             and abs(u // 3 - t // 3) <= 1)]
          for t in range(ntiles)}
    tile_results = [{"objs": [], "tileId": t, "neighborTileIds": nb[t],
                     "workerId": 0} for t in range(ntiles)]
    for k in range(E):
        t = int(rng.integers(0, ntiles))
        x1, y1 = rng.uniform(0, 300, 2)
        w, h = rng.uniform(1, 25, 2)
        tile_results[t]["objs"].append(obj(
            f"e{k}", x1, y1, x1 + w, y1 + h, edge=True,
            cls=int(rng.integers(0, 3)), score=float(rng.uniform())))
    # a deliberate touching pair (shared edge) in neighbor tiles, placed
    # outside the random crowd's [0, 325] range so its component is
    # exactly the pair
    tile_results[0]["objs"].append(
        obj("touchA", 1000, 1000, 1010, 1010, edge=True))
    tile_results[1]["objs"].append(
        obj("touchB", 1010, 1000, 1020, 1010, edge=True))

    out = stitch_tile_sources(tile_results)

    # naive reimplementation of the reference loop
    refs = [(t, s) for t in range(ntiles)
            for s in range(len(tile_results[t]["objs"]))]
    naive = []
    for i in range(len(refs)):
        t_i, s_i = refs[i]
        a = tile_results[t_i]["objs"][s_i]
        for j in range(i + 1, len(refs)):
            t_j, s_j = refs[j]
            if tile_results[t_j]["tileId"] not in nb[t_i]:
                continue
            b = tile_results[t_j]["objs"][s_j]
            if not (a["x2"] < b["x1"] or a["x1"] > b["x2"]
                    or a["y2"] < b["y1"] or a["y1"] > b["y2"]):
                naive.append((i, j))
    from caesar_yolo_tpu.utils.unionfind import connected_components
    n_comp_naive = len(connected_components(len(refs), naive))
    assert len(out["sources"]) == n_comp_naive
    # the touching pair merged into exactly its enclosing box
    merged = [s for s in out["sources"] if s["merged"]]
    assert any((s["x1"], s["y1"], s["x2"], s["y2"])
               == (1000, 1000, 1020, 1010) for s in merged)


@pytest.fixture(scope="module")
def tiny_model():
    m = build_model("yolov8n", num_classes=5)
    return m, init_params(m, seed=0)


def test_engine_sharded_over_mesh(tiny_model):
    """The tile batch shards over all 8 virtual devices and results match
    the unsharded run."""
    m, p = tiny_model
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    engine = TileEngine(m, p, mesh=mesh, img_size=64, score_thr=1e-4,
                        compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tiles = rng.random((8, 48, 48, 1), dtype=np.float32)
    out_sharded = engine.process(tiles)

    engine1 = TileEngine(m, p, mesh=None, img_size=64, score_thr=1e-4,
                         compute_dtype=jnp.float32)
    out_single = engine1.process(tiles)
    for a, b in zip(out_sharded, out_single):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_engine_invalid_tiles_masked(tiny_model):
    m, p = tiny_model
    engine = TileEngine(m, p, img_size=64, score_thr=1e-4,
                        compute_dtype=jnp.float32)
    tiles = np.random.default_rng(0).random((2, 48, 48, 1), dtype=np.float32)
    tiles[1] = 0.0  # degenerate tile
    boxes, scores, cls, valid, tile_ok, _ = engine.process(tiles)
    assert tile_ok.tolist() == [True, False]
    assert not valid[1].any()


def test_sfinder_tiled_end_to_end(tmp_path, tiny_model, galaxy_fits_path,
                                  monkeypatch):
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    cfg = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=64, score_thr=1e-4,
        split_image_in_tiles=True, tile_xsize=80, tile_ysize=80,
        tile_xstep=0.5, tile_ystep=0.5, batch_size=8,
        save_tile_catalog=True)
    sf = SFinder(m, p, cfg, mesh=make_mesh(),
                 engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run_tiled() == 0
    cat = json.loads((tmp_path / "catalog_galaxy0001.json").read_text())
    assert "sources" in cat
    for s in cat["sources"]:
        assert {"name", "x1", "x2", "y1", "y2", "class_id", "class_name",
                "score", "edge", "merged"} <= set(s)
    assert (tmp_path / "ds9_galaxy0001.reg").exists()
    # overlapping grid on 132x132 with 80px tiles, step 0.5 (=40px):
    # starts 0/40/80/120 per axis -> 4x4 = 16 tiles
    assert sf.report.n_tiles == 16


def test_gather_multihost_roundtrip(tiny_model, tmp_path):
    """Fixed-shape payload gather: single-process allgather returns the
    local results unchanged (the multi-host wire format round-trips)."""
    m, p = tiny_model
    cfg = SFinderConfig(image_path="/tmp/x.fits", gather_payload_bytes=4096)
    sf = SFinder(m, p, cfg)
    local = [{"objs": [], "tileId": 3, "workerId": 0,
              "neighborTileIds": [1], "xmin": 0, "xmax": 2, "ymin": 0,
              "ymax": 2}]
    out = sf._gather_multihost(local)
    assert out == local
    # payloads larger than the chunk size take more gather rounds —
    # a crowded catalog must degrade to extra rounds, never abort
    big = [{"objs": ["x" * 8192], "tileId": 0, "workerId": 0,
            "neighborTileIds": [], "xmin": 0, "xmax": 1, "ymin": 0,
            "ymax": 1},
           {"objs": ["y" * 8192], "tileId": 1, "workerId": 0,
            "neighborTileIds": [], "xmin": 1, "xmax": 2, "ymin": 0,
            "ymax": 2}]
    out = sf._gather_multihost(big)
    assert out == big
    # empty everywhere
    assert sf._gather_multihost([]) == []


def test_streaming_io_bounded(tmp_path, tiny_model, monkeypatch):
    """Many-batch tiled run holds a BOUNDED pipeline: at most 2 read
    futures + 3 undrained device batches in flight, regardless of the
    tile count (the reference never holds the mosaic either — windowed
    per-tile reads, inference.py:190-195)."""
    from caesar_yolo_tpu.utils.synth import write_mosaic_fits
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "big.fits")
    write_mosaic_fits(path, nx=512, ny=512, n_sources=10)
    cfg = SFinderConfig(
        image_path=path, image_xmin=-1, image_xmax=-1, image_ymin=-1,
        image_ymax=-1, img_size=32, score_thr=0.5,
        split_image_in_tiles=True, tile_xsize=32, tile_ysize=32,
        tile_xstep=1.0, tile_ystep=1.0, batch_size=16,
        max_ntasks_per_worker=300)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run_tiled() == 0
    assert sf.report.n_tiles == 256  # 16 batches through the pipeline
    assert 2 <= sf.report.max_inflight_batches <= 5

def test_stitch_is_order_invariant():
    """The stitched catalog must be a pure function of the tile-result
    SET: a crash-resumed run feeds results in a different order
    (spooled tiles after fresh ones), and both the S-naming and the
    largest-area score inheritance (equal-area tie) used to depend on
    it (caught on the banded crash-resume drill,
    scripts/drill_banded_resume.py)."""
    import random
    # two EQUAL-AREA members of one cross-tile component with different
    # scores: the tie must resolve identically in any input order
    t0 = {"objs": [obj("a", 240, 100, 256, 130, edge=True, score=0.9)],
          "tileId": 0, "neighborTileIds": [1], "workerId": 0}
    t1 = {"objs": [obj("b", 250, 100, 266, 130, edge=True, score=0.4)],
          "tileId": 1, "neighborTileIds": [0], "workerId": 0}
    # plus interior sources in several tiles to exercise naming order
    t2 = {"objs": [obj("c", 10, 10, 30, 30), obj("d", 60, 60, 90, 90)],
          "tileId": 2, "neighborTileIds": [], "workerId": 0}
    t3 = {"objs": [obj("e", 400, 400, 420, 430)],
          "tileId": 3, "neighborTileIds": [], "workerId": 0}
    base = [t0, t1, t2, t3]
    ref = stitch_tile_sources(sorted(base, key=lambda t: t["tileId"]))
    assert any(s["merged"] for s in ref["sources"])
    merged = [s for s in ref["sources"] if s["merged"]][0]
    assert merged["score"] == 0.9  # deterministic tie-break: max score
    rng = random.Random(0)
    for _ in range(6):
        perm = base[:]
        rng.shuffle(perm)
        # callers sort by tileId before stitching (sfinder.run_tiled);
        # the stitcher itself must then be order-invariant
        out = stitch_tile_sources(sorted(perm, key=lambda t: t["tileId"]))
        assert out == ref
