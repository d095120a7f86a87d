"""Box math, union-find, and tile-grid tests (vs reference semantics)."""

import numpy as np
import pytest

from caesar_yolo_tpu.utils import boxes, tiling, unionfind


# ---------------- IoU ----------------

def _iou_ref(bb1, bb2):
    """Straight re-derivation of IoU for cross-checking."""
    xl, yt = max(bb1[0], bb2[0]), max(bb1[1], bb2[1])
    xr, yb = min(bb1[2], bb2[2]), min(bb1[3], bb2[3])
    if xr < xl or yb < yt:
        return 0.0
    inter = (xr - xl) * (yb - yt)
    a1 = (bb1[2] - bb1[0]) * (bb1[3] - bb1[1])
    a2 = (bb2[2] - bb2[0]) * (bb2[3] - bb2[1])
    return inter / (a1 + a2 - inter)


def test_get_iou_values(rng):
    for _ in range(200):
        b1 = np.sort(rng.uniform(0, 100, 4)).astype(float)
        b2 = np.sort(rng.uniform(0, 100, 4)).astype(float)
        bb1 = [b1[0], b1[1], b1[2], b1[3]]
        bb2 = [b2[0], b2[1], b2[2], b2[3]]
        # sort gives x1<y1<x2<y2 -> valid boxes with x1<x2, y1<y2
        assert boxes.get_iou(bb1, bb2) == pytest.approx(_iou_ref(bb1, bb2))


def test_iou_matrix_np_vs_scalar(rng):
    bs = []
    for _ in range(20):
        x1, y1 = rng.uniform(0, 50, 2)
        w, h = rng.uniform(1, 30, 2)
        bs.append([x1, y1, x1 + w, y1 + h])
    bs = np.array(bs)
    m = boxes.iou_matrix_np(bs, bs)
    for i in range(20):
        for j in range(20):
            assert m[i, j] == pytest.approx(_iou_ref(bs[i], bs[j]))


def test_iou_matrix_jnp_matches_np(rng):
    bs = rng.uniform(0, 50, (15, 2))
    wh = rng.uniform(1, 30, (15, 2))
    b = np.concatenate([bs, bs + wh], axis=1)
    np.testing.assert_allclose(
        np.asarray(boxes.iou_matrix(b, b)), boxes.iou_matrix_np(b, b),
        rtol=1e-4, atol=1e-6)


def test_merged_bbox():
    bb = [(0, 1, 4, 5), (2, 0, 3, 7), (-1, 2, 2, 3)]
    assert boxes.get_merged_bbox(bb) == (-1, 0, 4, 7)


def test_xywh_roundtrip(rng):
    x = rng.uniform(0, 100, (7, 4))
    out = np.asarray(boxes.xyxy2xywh(boxes.xywh2xyxy(x)))
    np.testing.assert_allclose(out, x, rtol=1e-6)


# ---------------- union-find ----------------

def test_connected_components_basic():
    cc = unionfind.connected_components(6, [(0, 1), (1, 2), (4, 5)])
    assert cc == [[0, 1, 2], [3], [4, 5]]


def test_connected_components_adjacency_matrix():
    adj = np.zeros((5, 5), dtype=bool)
    adj[0, 3] = adj[3, 0] = True
    adj[1, 2] = adj[2, 1] = True
    cc = unionfind.connected_components(5, adj)
    assert cc == [[0, 3], [1, 2], [4]]


def test_connected_components_large_chain():
    # The reference's recursive DFS would hit the recursion limit here
    n = 5000
    edges = [(i, i + 1) for i in range(n - 1)]
    cc = unionfind.connected_components(n, edges)
    assert len(cc) == 1 and len(cc[0]) == n


# ---------------- tile grid ----------------

def test_generate_tiles_no_overlap():
    # 0..255 inclusive (256 px), 128-tiles, step 1 -> 2x2 grid
    tiles = tiling.generate_tiles(0, 255, 0, 255, 128, 128, 1.0, 1.0)
    assert tiles == [
        (0, 128, 0, 128), (128, 256, 0, 128),
        (0, 128, 128, 256), (128, 256, 128, 256),
    ]


def test_generate_tiles_truncated_edges():
    tiles = tiling.generate_tiles(0, 299, 0, 199, 128, 128, 1.0, 1.0)
    xs = {(t[0], t[1]) for t in tiles}
    ys = {(t[2], t[3]) for t in tiles}
    assert (256, 300) in xs  # truncated right edge
    assert (128, 200) in ys  # truncated top edge
    assert len(tiles) == 6


def test_generate_tiles_overlap_step():
    tiles = tiling.generate_tiles(0, 255, 0, 255, 128, 128, 0.5, 0.5)
    # step 64: xmins 0,64,128,192 -> 4x4
    assert len(tiles) == 16
    assert tiles[1][0] - tiles[0][0] == 64


def test_generate_tiles_offset_origin():
    tiles = tiling.generate_tiles(100, 355, 50, 305, 128, 128, 1.0, 1.0)
    assert tiles[0] == (100, 228, 50, 178)


def test_generate_tiles_invalid():
    assert tiling.generate_tiles(10, 5, 0, 10, 4, 4, 1, 1) is None
    assert tiling.generate_tiles(0, 10, 0, 10, 0, 4, 1, 1) is None
    assert tiling.generate_tiles(0, 10, 0, 10, 4, 4, 0, 1) is None
    assert tiling.generate_tiles(0, 10, 0, 10, 4, 4, 1.5, 1) is None
    assert tiling.generate_tiles(0, 10, 0, 10, 64, 64, 1, 1) is None


def test_tile_neighbors():
    tiles = tiling.make_tile_windows(
        tiling.generate_tiles(0, 255, 0, 255, 128, 128, 1.0, 1.0))
    nbrs = tiling.neighbor_table(tiles)
    # 2x2 grid of half-open windows: touching tiles share no pixels
    # (not overlapping) but ARE adjacent, so everyone neighbors everyone
    t00, t10, t01, t11 = tiles
    assert t00.is_adjacent(t10) is True   # xmax == xmin (touching)
    assert t00.is_overlapping(t10) is False  # zero shared pixels
    assert all(sorted(n) == sorted([t.tid for t in tiles if t.tid != i])
               for i, n in enumerate(nbrs))


def test_tile_overlap_predicates():
    a = tiling.TileWindow(0, 100, 0, 100)
    b = tiling.TileWindow(100, 200, 0, 100)   # touching in x -> adjacent
    g = tiling.TileWindow(101, 200, 0, 100)   # 1px gap -> nothing
    c = tiling.TileWindow(150, 250, 150, 250)  # far -> nothing
    assert a.is_adjacent(b)
    assert not a.is_overlapping(b)
    assert a.is_neighbor(b)
    assert not a.is_adjacent(g)
    assert not a.is_neighbor(g)
    assert not a.is_neighbor(c)


def test_tilewindow_halfopen_predicates():
    """Half-open window semantics: touching tiles share NO pixels (not
    overlapping, but adjacent => still neighbors); step<1 tiles overlap."""
    from caesar_yolo_tpu.utils.tiling import TileWindow
    a = TileWindow(0, 256, 0, 256, tid=0)
    b = TileWindow(256, 512, 0, 256, tid=1)       # touching right
    c = TileWindow(192, 448, 0, 256, tid=2)       # 64px x-overlap
    d = TileWindow(512, 768, 0, 256, tid=3)       # 1 tile away
    assert not a.is_overlapping(b)
    assert a.is_adjacent(b)
    assert a.is_neighbor(b)
    assert a.is_overlapping(c) and a.is_neighbor(c)
    assert not a.is_adjacent(d)
    assert not a.is_overlapping(d)
    assert not a.is_neighbor(d)
    diag = TileWindow(256, 512, 256, 512, tid=4)  # corner-touching
    assert a.is_adjacent(diag) and not a.is_overlapping(diag)


def test_flag_edge_sources_halfopen_neighbor_bound():
    """A source starting exactly at a neighbor's (exclusive) xmax lies
    wholly outside it and must NOT be edge-flagged (the reference's
    inclusive-coordinate check translated to half-open windows)."""
    from caesar_yolo_tpu.parallel.stitch import flag_edge_sources
    from caesar_yolo_tpu.utils.tiling import TileWindow
    tile = TileWindow(128, 384, 0, 256, tid=1)
    nb = TileWindow(0, 256, 0, 256, tid=0)
    inside_only = {"x1": 256.0, "x2": 300.0, "y1": 50.0, "y2": 60.0,
                   "edge": False}
    in_overlap = {"x1": 255.0, "x2": 300.0, "y1": 50.0, "y2": 60.0,
                  "edge": False}
    flag_edge_sources([inside_only, in_overlap], tile, [nb])
    assert not inside_only["edge"]
    assert in_overlap["edge"]


def test_neighbor_table_matches_pairwise_predicates():
    """The blocked/vectorized neighbor_table must reproduce the exact
    per-pair TileWindow.is_neighbor loop — random windows (arbitrary
    touch/overlap/containment patterns) and an overlapping grid with
    truncated edges, including list ORDER (ascending tile index)."""
    import numpy as np
    from caesar_yolo_tpu.utils.tiling import (
        TileWindow, generate_tiles, make_tile_windows, neighbor_table)

    def naive(tiles):
        n = len(tiles)
        out = [[] for _ in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                if tiles[i].is_neighbor(tiles[j]):
                    out[i].append(tiles[j].tid)
                    out[j].append(tiles[i].tid)
        return out

    rng = np.random.default_rng(0)
    tiles = []
    for k in range(300):
        x0, y0 = rng.integers(0, 500, 2)
        tiles.append(TileWindow(int(x0), int(x0 + rng.integers(5, 60)),
                                int(y0), int(y0 + rng.integers(5, 60)),
                                tid=k))
    assert neighbor_table(tiles) == naive(tiles)

    grid = generate_tiles(0, 999, 0, 999, 256, 256, 0.5, 0.5)
    tw = make_tile_windows(grid)
    assert neighbor_table(tw) == naive(tw)
