"""Inference server (harness/serve.py): batching dispatcher + HTTP layer.

Serves a tiny freshly-initialized pipeline (checkpoint written via
core.checkpoint, hparams embedded) and exercises the real wire path:
concurrent clients -> npz over HTTP -> batched engine -> per-garment
responses with the NaN-sentinel ok flag.
"""
import json
import threading
from urllib.request import urlopen

import numpy as np
import pytest

import __graft_entry__ as graft


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax
    from garmentnets_tpu.core.checkpoint import save_checkpoint
    from garmentnets_tpu.core.builders import pipeline_hparams
    from garmentnets_tpu.models.pipeline import ConvImplicitWNFPipeline

    cfg = graft._small_cfg()
    model = ConvImplicitWNFPipeline(cfg)
    batch = graft._make_batch(B=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    path = tmp_path_factory.mktemp("serve") / "tiny.ckpt"
    save_checkpoint(path, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"],
                           "step": 0},
                    hparams=pipeline_hparams(cfg))
    return path


@pytest.fixture(scope="module")
def service(tiny_ckpt):
    from garmentnets_tpu.harness.serve import PredictService
    svc = PredictService(tiny_ckpt, batch_size=4, num_points=512,
                         volume_size=16, batch_window_ms=30.0,
                         engine_kwargs={"warp_bucket": 64})
    yield svc
    svc.close()


def _result_ok(r):
    if int(r["ok"]):
        assert r["verts"].ndim == 2 and r["verts"].shape[1] == 3
        assert r["faces"].dtype == np.int32
        assert r["warp_field"].shape == r["verts"].shape
        assert r["volume_value"].shape == (len(r["verts"]),)
        assert np.isfinite(r["verts"]).all()
    assert r["pred_nocs"].shape == (512, 3)
    assert r["pred_nocs_confidence"].shape == (512, 3)


def test_submit_direct(service):
    batch = graft._make_batch(B=2, N=512)
    results = service.submit(batch["x"], batch["pos"])
    assert len(results) == 2
    for r in results:
        _result_ok(r)


def test_cloud_resampling(service):
    """Clouds with != num_points are normalized server-side."""
    rng = np.random.RandomState(1)
    x = rng.rand(1, 300, 3).astype(np.float32)       # undersized -> pad
    pos = (rng.rand(1, 300, 3) - 0.5).astype(np.float32)
    (r,) = service.submit(x, pos)
    _result_ok(r)
    x = rng.rand(1, 900, 3).astype(np.float32)       # oversized -> subsample
    pos = (rng.rand(1, 900, 3) - 0.5).astype(np.float32)
    (r,) = service.submit(x, pos)
    _result_ok(r)


def test_concurrent_clients_share_batches(service):
    """4 threads x 1 garment inside the batching window should coalesce
    into shared device batches (strictly fewer batches than garments)."""
    batches_before = service.stats["batches"]
    batch = graft._make_batch(B=4, N=512, seed=7)
    results = [None] * 4
    errs = []

    def client(i):
        try:
            results[i] = service.submit(batch["x"][i:i + 1],
                                        batch["pos"][i:i + 1])[0]
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs
    for r in results:
        assert r is not None
        _result_ok(r)
    assert service.stats["batches"] - batches_before < 4


def test_http_roundtrip(service):
    from garmentnets_tpu.harness.serve import (
        make_http_server, predict_remote)
    httpd = make_http_server(service, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        with urlopen(url + "/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["batch_size"] == 4
        batch = graft._make_batch(B=2, N=512, seed=3)
        results = predict_remote(url, batch["x"], batch["pos"])
        assert len(results) == 2
        for r in results:
            _result_ok(r)
        # matches a direct submit of the same garments (deterministic
        # engine, same padded batch shape)
        direct = service.submit(batch["x"], batch["pos"])
        for r, d in zip(results, direct):
            assert int(r["ok"]) == int(d["ok"])
            np.testing.assert_allclose(r["pred_nocs"], d["pred_nocs"],
                                       atol=1e-5)
            if int(r["ok"]):
                np.testing.assert_allclose(r["verts"], d["verts"], atol=1e-5)
    finally:
        httpd.shutdown()


def test_batch_failure_isolated(service, monkeypatch):
    """An exception inside a device batch reports an error result to its
    waiters (no hang) and the dispatcher keeps serving later requests."""
    orig = service.engine.encode

    def boom(x, pos):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(service.engine, "encode", boom)
    batch = graft._make_batch(B=1, N=512, seed=11)
    (r,) = service.submit(batch["x"], batch["pos"], timeout=60)
    assert int(r["ok"]) == 0
    assert b"injected device failure" in bytes(r["error"])
    monkeypatch.setattr(service.engine, "encode", orig)
    (r2,) = service.submit(batch["x"], batch["pos"], timeout=60)
    _result_ok(r2)


def test_checkpoint_hot_reload(tiny_ckpt, service, tmp_path):
    """reload_checkpoint swaps weights between batches without restart:
    outputs change, the service keeps serving, and an architecture
    mismatch is rejected."""
    import jax
    from garmentnets_tpu.core.checkpoint import (
        load_checkpoint, save_checkpoint)
    from garmentnets_tpu.core.builders import pipeline_hparams

    batch = graft._make_batch(B=1, N=512, seed=21)
    (before,) = service.submit(batch["x"], batch["pos"])

    # perturbed-weights checkpoint with identical architecture
    state, hparams = load_checkpoint(tiny_ckpt)
    state2 = jax.tree_util.tree_map(lambda a: a * 1.5, state["params"])
    p2 = tmp_path / "v2.ckpt"
    save_checkpoint(p2, {"params": state2,
                         "batch_stats": state["batch_stats"], "step": 1},
                    hparams=hparams)
    service.reload_checkpoint(p2)
    (after,) = service.submit(batch["x"], batch["pos"])
    assert service.stats["reloads"] == 1
    # scaled weights shift the softmax confidences (argmax-derived NOCS
    # positions may legitimately survive a monotone rescale)
    assert not np.allclose(before["pred_nocs_confidence"],
                           after["pred_nocs_confidence"])

    # architecture mismatch is rejected up front
    cfg2 = graft._small_cfg()
    object.__setattr__(cfg2, "unet_f_maps", 8)
    from garmentnets_tpu.core.builders import pipeline_hparams as ph
    p3 = tmp_path / "bad.ckpt"
    save_checkpoint(p3, {"params": state["params"],
                         "batch_stats": state["batch_stats"], "step": 0},
                    hparams=ph(cfg2))
    with pytest.raises(ValueError, match="architecture-identical"):
        service.reload_checkpoint(p3)
    # restore original weights for any later test using the fixture
    service.reload_checkpoint(tiny_ckpt)
    (restored,) = service.submit(batch["x"], batch["pos"])
    np.testing.assert_allclose(restored["pred_nocs_confidence"],
                               before["pred_nocs_confidence"], atol=1e-6)


def test_service_with_device_mesh(tiny_ckpt):
    """The service composes with a batch-sharded device mesh (engine DP) —
    production serving on a multi-chip host shards each device batch."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from garmentnets_tpu.harness.serve import PredictService
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    svc = PredictService(tiny_ckpt, batch_size=4, num_points=512,
                         volume_size=16, mesh=mesh,
                         engine_kwargs={"warp_bucket": 64})
    try:
        batch = graft._make_batch(B=2, N=512, seed=5)
        results = svc.submit(batch["x"], batch["pos"])
        assert len(results) == 2
        for r in results:
            _result_ok(r)
    finally:
        svc.close()


def test_http_bad_request(service):
    from garmentnets_tpu.harness.serve import make_http_server
    from urllib.request import Request
    from urllib.error import HTTPError
    httpd = make_http_server(service, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = Request(f"http://127.0.0.1:{port}/predict", data=b"garbage",
                      headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(HTTPError) as ei:
            urlopen(req)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
