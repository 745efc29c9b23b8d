"""Unit tests for the long-tail parity components."""
import numpy as np
import jax
import jax.numpy as jnp

from garmentnets_tpu.ops.scatter import batch_to_volume
from garmentnets_tpu.ops.marching_cubes import wnf_to_mesh
from garmentnets_tpu.ops import geometry
from garmentnets_tpu.models.unet3d import ResidualUNet3D
from garmentnets_tpu.utils.rendering import (
    render_nocs, render_wnf, get_vis_idxs, render_points_idx)
from garmentnets_tpu.core.checkpoint import (
    TopKCheckpointManager, get_checkpoint_df, load_checkpoint)


def test_batch_to_volume():
    pts = jnp.asarray([[[0.1, 0.1, 0.1], [0.9, 0.9, 0.9],
                        [0.12, 0.1, 0.11]]])
    feats = jnp.asarray([[[1.0], [2.0], [3.0]]])
    vol = np.asarray(batch_to_volume(pts, feats, 4, "mean"))
    assert vol.shape == (1, 4, 4, 4, 1)
    np.testing.assert_allclose(vol[0, 0, 0, 0, 0], 2.0)  # mean(1,3)
    np.testing.assert_allclose(vol[0, 3, 3, 3, 0], 2.0)


def test_wnf_to_mesh_sphere():
    # a WNF-like field: ~1 inside, ~0 outside, sharp at the surface (so the
    # gradient-magnitude on-surface filter keeps the shell, like real WNFs)
    n = 24
    ax = np.linspace(0, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    dist = np.sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2)
    wnf = 1.0 / (1.0 + np.exp((dist - 0.3) * 200)).astype(np.float32)
    verts, faces = wnf_to_mesh(wnf.astype(np.float32))
    assert len(verts) > 100
    d = np.linalg.norm(verts - 0.5, axis=1)
    assert np.abs(d - 0.3).max() < 2 / (n - 1)


def test_geometry_builders():
    verts, edges = geometry.build_line(num_nodes=10)
    assert verts.shape == (10, 3) and edges.shape == (9, 2)
    v, e, f, uv = geometry.build_rectangle(width_num_node=4,
                                           height_num_node=3)
    assert v.shape == (12, 3) and uv.shape == (12, 2)
    assert len(f) == 6  # (4-1)*(3-1) quads
    ee = geometry.faces_to_edges(f)
    assert len(ee) == len(np.unique(ee, axis=0))


def test_winding_number_closed_box():
    """WNF is ~1 inside and ~0 outside a closed surface."""
    # closed cube surface mesh
    v, f4, _, _ = geometry.build_rectangle(1, 1, 3, 3)
    # build a closed unit cube from 12 triangles
    c = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float64)
    quads = np.array([[0, 3, 2, 1], [4, 5, 6, 7], [0, 1, 5, 4],
                      [1, 2, 6, 5], [2, 3, 7, 6], [3, 0, 4, 7]])
    tris = geometry.quads2tris(quads)
    inside = geometry.winding_number(np.array([[0.5, 0.5, 0.5]]), c, tris)
    outside = geometry.winding_number(np.array([[2.0, 2.0, 2.0]]), c, tris)
    assert abs(abs(inside[0]) - 1.0) < 1e-3
    assert abs(outside[0]) < 1e-3


def test_residual_unet3d_shapes():
    net = ResidualUNet3D(in_channels=8, out_channels=4, f_maps=4,
                         num_levels=3, num_groups=4)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8, 8), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(v, x, train=False)
    assert out.shape == (1, 8, 8, 8, 4)


def test_render_zbuffer_front_wins():
    # two points on the same pixel: the nearer (smaller camera z) must win
    pts = np.array([[0.5, 0.5, 0.9], [0.5, 0.5, 0.1]], np.float32)
    idx = render_points_idx(pts, img_size=16, kernel_size=1)
    vals = idx[idx != np.iinfo(np.uint32).max]
    assert (vals == 1).all()


def test_render_apis():
    rng = np.random.RandomState(0)
    pts = rng.rand(100, 3).astype(np.float32)
    img = render_nocs(pts, img_size=32)
    assert img.shape == (32, 32, 4)
    w = render_wnf(rng.rand(8, 8), img_size=32)
    assert w.shape == (32, 32, 4)
    g, s, v = get_vis_idxs(0, batch_size=4, vis_per_items=2,
                           max_vis_per_epoch=10)
    assert s == [0, 2] and v == [0, 1]


def test_checkpoint_topk_and_df(tmp_path):
    mgr = TopKCheckpointManager(tmp_path, k=2)
    for epoch, loss in enumerate([0.5, 0.3, 0.4, 0.2]):
        mgr.save(epoch, loss, {"w": np.ones(3) * epoch}, {"lr": 1e-4})
    ckpts = sorted(p.name for p in tmp_path.glob("epoch=*.ckpt"))
    assert ckpts == ["epoch=1-val_loss=0.3000.ckpt",
                     "epoch=3-val_loss=0.2000.ckpt"]
    assert mgr.best_path.name == "epoch=3-val_loss=0.2000.ckpt"
    state, hp = load_checkpoint(tmp_path / "last.ckpt")
    assert hp == {"lr": 1e-4}
    np.testing.assert_array_equal(state["w"], np.ones(3) * 3)
    df = get_checkpoint_df(tmp_path)
    assert len(df) == 2 and "val_loss" in df


def test_config_overrides(tmp_path):
    from garmentnets_tpu.core import config as cm
    (tmp_path / "t.yaml").write_text("a:\n  b: 1\n  c: [1, 2]\nd: x\n")
    cfg = cm.load_config("t", ["a.b=5", "d=y", "e.f=0.5"],
                         config_dir=tmp_path)
    assert cfg.a.b == 5 and cfg.d == "y" and cfg.e.f == 0.5
    assert cfg["a"]["c"] == [1, 2]
