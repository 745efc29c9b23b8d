"""ResidualUNet3D torch oracle (VERDICT round-1 item 9): shared weights via
the converter, numeric agreement incl. the ConvTranspose output_size
plumbing (reference unet3d.py:241-359,494-509) and the ExtResNetBlock
residual/no-nonlinearity-on-conv3 structure."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, pathlib  # noqa: E402
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import convert_checkpoint as cc  # noqa: E402
import torch_twin as tw  # noqa: E402

from garmentnets_tpu.models.unet3d import ResidualUNet3D  # noqa: E402


@pytest.mark.parametrize("order", ["cge", "gcr"])
def test_residual_unet3d_conversion_numerics(order):
    torch.manual_seed(3)
    tn = tw.TwinResidualUNet3D(in_channels=8, out_channels=6, f_maps=4,
                               num_levels=3, num_groups=2, order=order)
    tn.eval()
    sd = {f"u.{k}": v.detach().numpy() for k, v in tn.state_dict().items()}
    params, stats = cc.convert_residual_unet3d(sd, "u", order=order)

    net = ResidualUNet3D(in_channels=8, out_channels=6, f_maps=4,
                         num_levels=3, num_groups=2, layer_order=order)
    x = np.random.RandomState(1).rand(2, 8, 8, 8, 8).astype(np.float32)
    vref = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert (jax.tree_util.tree_structure(vref["params"])
            == jax.tree_util.tree_structure(params))
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tn(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
