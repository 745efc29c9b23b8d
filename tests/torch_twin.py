"""CPU PyTorch twin of the reference GarmentNets forward pass.

Golden-test oracle (VERDICT round-1 item 3): a dense-batch torch
re-implementation of the reference's stage-1 + stage-2 forward semantics
(networks/pointnet2_nocs.py:134-166, networks/conv_implicit_wnf.py:213-338)
whose ``state_dict()`` uses the reference's exact key layout, so it can be
pushed through tools/convert_checkpoint.py and compared end-to-end against
our JAX pipeline. No PyG/CUDA needed: fps/radius/knn are ~15 lines each in
plain torch, written to the same deterministic conventions as
garmentnets_tpu/ops/pointcloud.py (fps start index 0; ball query = K nearest
within radius) so agreement can be exact up to float tolerance.

This is new code modeling published op semantics, not a copy of the
reference (which is ragged PyG; this is dense [B,N,C]).
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# point-cloud ops (dense batch)
# ---------------------------------------------------------------------------

def fps(pos: torch.Tensor, num_samples: int, start=None) -> torch.Tensor:
    """Furthest point sampling. pos: [B,N,3]. Deterministic start index 0 by
    default; pass `start` ([B] long) to emulate PyG's random_start=True
    (torch_cluster picks a random seed point per batch element —
    reference components/pointnet2.py:26 via torch_geometric.nn.fps)."""
    B, N, _ = pos.shape
    idx = torch.zeros(B, num_samples, dtype=torch.long)
    if start is not None:
        idx[:, 0] = start
    min_d = torch.full((B, N), float("inf"))
    ar = torch.arange(B)
    for i in range(1, num_samples):
        last = pos[ar, idx[:, i - 1]]                       # [B,3]
        d = ((pos - last[:, None]) ** 2).sum(-1)            # [B,N]
        min_d = torch.minimum(min_d, d)
        idx[:, i] = min_d.argmax(-1)
    return idx


def ball_query(pos: torch.Tensor, centers: torch.Tensor, r: float, k: int):
    """K nearest neighbors within radius r. Returns (idx [B,M,K], mask)."""
    d2 = ((centers[:, :, None] - pos[:, None]) ** 2).sum(-1)  # [B,M,N]
    vals, idx = torch.topk(d2, min(k, pos.shape[1]), largest=False)
    mask = vals <= r * r
    return idx, mask


def ball_query_first_k(pos: torch.Tensor, centers: torch.Tensor, r: float,
                       k: int):
    """PyG-semantics ball query: the FIRST k points (in index order) within
    radius r, not the k nearest — torch_cluster's `radius` CUDA kernel stops
    scanning once max_num_neighbors are found (reference
    components/pointnet2.py:28-29 passes max_num_neighbors=64). Same return
    contract as ball_query: (idx [B,M,K], mask)."""
    K = min(k, pos.shape[1])
    d2 = ((centers[:, :, None] - pos[:, None]) ** 2).sum(-1)  # [B,M,N]
    within = d2 <= r * r
    rank = within.long().cumsum(-1) - 1                       # [B,M,N]
    take = within & (rank < K)
    B, M, N = within.shape
    idx = torch.zeros(B, M, K, dtype=torch.long)
    mask = torch.zeros(B, M, K, dtype=torch.bool)
    src = torch.arange(N)
    for b in range(B):
        for m in range(M):
            js = src[take[b, m]]
            idx[b, m, : len(js)] = js
            mask[b, m, : len(js)] = True
    return idx, mask


def knn_interpolate(feat, src_pos, dst_pos, k: int):
    """Inverse-squared-distance interpolation (PyG knn_interpolate)."""
    d2 = ((dst_pos[:, :, None] - src_pos[:, None]) ** 2).sum(-1)  # [B,T,S]
    vals, idx = torch.topk(d2, min(k, src_pos.shape[1]), largest=False)
    w = 1.0 / vals.clamp(min=1e-16)                           # [B,T,k]
    gathered = torch.gather(
        feat[:, None].expand(-1, dst_pos.shape[1], -1, -1), 2,
        idx[..., None].expand(-1, -1, -1, feat.shape[-1]))    # [B,T,k,C]
    return (w[..., None] * gathered).sum(2) / w.sum(2, keepdim=True)


def ref_mlp(channels):
    """Reference components/mlp.py MLP: Seq(Seq(Lin, ReLU, BN1d))."""
    return nn.Sequential(*[
        nn.Sequential(nn.Linear(channels[i - 1], channels[i]), nn.ReLU(),
                      nn.BatchNorm1d(channels[i]))
        for i in range(1, len(channels))])


def apply_mlp(mlp, x):
    """Apply an edge/point MLP to [..., C] by flattening leading dims
    (reference PointBatchNorm1D semantics, components/mlp.py:3-7)."""
    shape = x.shape
    return mlp(x.reshape(-1, shape[-1])).reshape(*shape[:-1], -1)


# ---------------------------------------------------------------------------
# stage-1 twin
# ---------------------------------------------------------------------------

class TwinPointConv(nn.Module):
    """Holds the edge MLP under PyG PointConv's key name (local_nn)."""

    def __init__(self, local_nn):
        super().__init__()
        self.local_nn = local_nn


class TwinSAModule(nn.Module):
    """Set `pyg_mode=True` (+ optional `fps_start` [B] long) to emulate the
    reference's torch_cluster semantics — random-start FPS and
    first-K-within-radius ball query — instead of this repo's deterministic
    conventions (start 0, K-nearest). Used to bound the NOCS sensitivity to
    the neighbor-selection difference (VERDICT r1 missing #1)."""

    def __init__(self, ratio, r, mlp):
        super().__init__()
        self.ratio, self.r = ratio, r
        self.conv = TwinPointConv(mlp)
        self.pyg_mode = False
        self.fps_start = None

    def forward(self, x, pos):
        B, N, _ = pos.shape
        M = int(N * self.ratio)
        idx = fps(pos, M, start=self.fps_start if self.pyg_mode else None)
        centers = torch.gather(pos, 1, idx[..., None].expand(-1, -1, 3))
        bq = ball_query_first_k if self.pyg_mode else ball_query
        nidx, nmask = bq(pos, centers, self.r, 64)
        K = nidx.shape[-1]
        nbr_pos = torch.gather(
            pos[:, None].expand(-1, M, -1, -1), 2,
            nidx[..., None].expand(-1, -1, -1, 3))
        rel = nbr_pos - centers[:, :, None]
        feats = [rel]
        if x is not None:
            nbr_x = torch.gather(
                x[:, None].expand(-1, M, -1, -1), 2,
                nidx[..., None].expand(-1, -1, -1, x.shape[-1]))
            feats = [nbr_x, rel]                       # PointConv msg order
        h = apply_mlp(self.conv.local_nn, torch.cat(feats, -1))
        h = h.masked_fill(~nmask[..., None], float("-inf"))
        return h.max(2).values, centers


class TwinGlobalSAModule(nn.Module):
    def __init__(self, mlp):
        super().__init__()
        self.nn = mlp

    def forward(self, x, pos):
        h = apply_mlp(self.nn, torch.cat([x, pos], -1))
        out = h.max(1).values                          # global max pool
        return out, torch.zeros(pos.shape[0], 1, 3)


class TwinFPModule(nn.Module):
    def __init__(self, k, mlp):
        super().__init__()
        self.k = k
        self.nn = mlp

    def forward(self, x, pos, x_skip, pos_skip):
        h = knn_interpolate(x, pos, pos_skip, self.k)
        if x_skip is not None:
            h = torch.cat([h, x_skip], -1)
        return apply_mlp(self.nn, h), pos_skip


class TwinPointNet2NOCS(nn.Module):
    """Reference networks/pointnet2_nocs.py:79-166, dense-batch."""

    def __init__(self, feature_dim=128, nocs_bins=64,
                 sa1_ratio=0.5, sa1_r=0.05, sa2_ratio=0.25, sa2_r=0.1,
                 fp3_k=1, fp2_k=3, fp1_k=3):
        super().__init__()
        out_dim = nocs_bins * 3
        self.nocs_bins = nocs_bins
        self.sa1_module = TwinSAModule(sa1_ratio, sa1_r,
                                       ref_mlp([6, 64, 64, 128]))
        self.sa2_module = TwinSAModule(sa2_ratio, sa2_r,
                                       ref_mlp([131, 128, 128, 256]))
        self.sa3_module = TwinGlobalSAModule(ref_mlp([259, 256, 512, 1024]))
        self.fp3_module = TwinFPModule(fp3_k, ref_mlp([1280, 256, 256]))
        self.fp2_module = TwinFPModule(fp2_k, ref_mlp([384, 256, 128]))
        self.fp1_module = TwinFPModule(fp1_k, ref_mlp([131, 128, 128, 128]))
        self.lin1 = nn.Linear(128, 128)
        self.lin2 = nn.Linear(128, feature_dim)
        self.lin3 = nn.Linear(feature_dim, out_dim)
        self.global_lin1 = nn.Linear(1024, 1024)
        self.global_lin2 = nn.Linear(1024, out_dim)

    def forward(self, x, pos):
        sa1_x, sa1_pos = self.sa1_module(x, pos)
        sa2_x, sa2_pos = self.sa2_module(sa1_x, sa1_pos)
        sa3_x, sa3_pos = self.sa3_module(sa2_x, sa2_pos)

        fp3_x, _ = self.fp3_module(sa3_x[:, None], sa3_pos, sa2_x, sa2_pos)
        fp2_x, _ = self.fp2_module(fp3_x, sa2_pos, sa1_x, sa1_pos)
        fp1_x, _ = self.fp1_module(fp2_x, sa1_pos, x, pos)

        h = F.relu(self.lin1(fp1_x))
        features = self.lin2(h)                 # dropout = identity (eval)
        logits = self.lin3(features)

        g = F.relu(sa3_x)                       # relu only on input feature
        g = self.global_lin1(g)
        global_logits = self.global_lin2(g)
        return {"per_point_features": features, "per_point_logits": logits,
                "global_logits": global_logits, "global_feature": sa3_x}


# ---------------------------------------------------------------------------
# stage-2 twin
# ---------------------------------------------------------------------------

class TwinVolumeAggregator(nn.Module):
    """Reference VolumeFeatureAggregator (conv_implicit_wnf.py:23-100):
    VirtualGrid binning + feature concat + MLP + scatter-reduce."""

    def __init__(self, nn_channels, grid_shape, reduce_method="max"):
        super().__init__()
        self.local_nn = ref_mlp(nn_channels)
        self.grid_shape = grid_shape
        self.reduce_method = reduce_method

    def forward(self, nocs_data):
        points = nocs_data["pos"]                           # [B,N,3]
        B, N, _ = points.shape
        G = self.grid_shape[0]
        scale = float(G - 1)                                # lc=0, uc=1
        idx_f = points * scale
        idx_i = idx_f.long().clamp(0, G - 1)                # trunc + clamp
        # fp32 idx * (1/(G-1)), matching VirtualGrid.idxs_to_points
        # (gridding.py:255: idx * scales) bit-for-bit
        inv = torch.tensor(1.0, dtype=torch.float32) / scale
        grid_points = idx_i.float() * inv
        feats = torch.cat([nocs_data["x"], points - grid_points,
                           nocs_data["sim_points"],
                           nocs_data["pred_confidence"]], -1)
        feats = apply_mlp(self.local_nn, feats)
        C = feats.shape[-1]
        flat = (idx_i[..., 0] * G + idx_i[..., 1]) * G + idx_i[..., 2]
        out = torch.zeros(B, G ** 3, C)
        if self.reduce_method == "max":
            out.scatter_reduce_(1, flat[..., None].expand(-1, -1, C), feats,
                                reduce="amax", include_self=False)
        elif self.reduce_method == "mean":
            out.scatter_reduce_(1, flat[..., None].expand(-1, -1, C), feats,
                                reduce="mean", include_self=False)
        else:
            raise ValueError(self.reduce_method)
        # [B, C, Gx, Gy, Gz] like the reference reshape/permute (:97-99)
        return out.reshape(B, G, G, G, C).permute(0, 4, 1, 2, 3)


def _single_conv_gcr(c_in, c_out, num_groups):
    m = nn.Sequential()
    m.add_module("groupnorm", nn.GroupNorm(num_groups, c_in))
    m.add_module("conv", nn.Conv3d(c_in, c_out, 3, padding=1, bias=False))
    m.add_module("ReLU", nn.ReLU())
    return m


class _DoubleConv(nn.Module):
    def __init__(self, c_in, c_out, encoder, num_groups):
        super().__init__()
        if encoder:
            c1 = max(c_out // 2, c_in)
            self.SingleConv1 = _single_conv_gcr(c_in, c1, num_groups)
            self.SingleConv2 = _single_conv_gcr(c1, c_out, num_groups)
        else:
            self.SingleConv1 = _single_conv_gcr(c_in, c_out, num_groups)
            self.SingleConv2 = _single_conv_gcr(c_out, c_out, num_groups)

    def forward(self, x):
        return self.SingleConv2(self.SingleConv1(x))


class _Stage(nn.Module):
    def __init__(self, basic_module):
        super().__init__()
        self.basic_module = basic_module


class TwinAbstractUNet3D(nn.Module):
    """Reference components/unet3d.py Abstract3DUNet with DoubleConv/'gcr':
    maxpool-2 encoders, nearest-upsample + concat decoders, 1x1 final conv."""

    def __init__(self, in_channels, out_channels, f_maps, num_levels,
                 num_groups):
        super().__init__()
        fm = [f_maps * 2 ** k for k in range(num_levels)]
        encs = []
        ch = in_channels
        for o in fm:
            encs.append(_Stage(_DoubleConv(ch, o, True, num_groups)))
            ch = o
        self.encoders = nn.ModuleList(encs)
        rev = list(reversed(fm))
        self.decoders = nn.ModuleList([
            _Stage(_DoubleConv(rev[i] + rev[i + 1], rev[i + 1], False,
                               num_groups))
            for i in range(len(rev) - 1)])
        self.final_conv = nn.Conv3d(fm[0], out_channels, 1)

    def forward(self, x):
        feats = []
        h = x
        for i, e in enumerate(self.encoders):
            if i > 0:
                h = F.max_pool3d(h, 2)
            h = e.basic_module(h)
            feats.insert(0, h)
        for d, skip in zip(self.decoders, feats[1:]):
            h = F.interpolate(h, size=skip.shape[2:], mode="nearest")
            h = torch.cat([skip, h], dim=1)
            h = d.basic_module(h)
        return self.final_conv(h)


class TwinUNet3D(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.abstract_3d_unet = TwinAbstractUNet3D(**kw)

    def forward(self, x):
        return self.abstract_3d_unet(x)


def _single_conv_order(c_in, c_out, order, num_groups):
    """Reference create_conv (unet3d.py:19-76): modules named by kind, conv
    bias dropped when a norm is present."""
    m = nn.Sequential()
    bias = not ("g" in order or "b" in order)
    for i, ch in enumerate(order):
        if ch == "c":
            m.add_module("conv", nn.Conv3d(c_in, c_out, 3, padding=1,
                                           bias=bias))
        elif ch == "g":
            nch = c_in if i < order.index("c") else c_out
            g = num_groups if nch >= num_groups else 1
            m.add_module("groupnorm", nn.GroupNorm(g, nch))
        elif ch == "e":
            m.add_module("ELU", nn.ELU())
        elif ch == "r":
            m.add_module("ReLU", nn.ReLU())
    return m


class _TwinExtResNetBlock(nn.Module):
    """Reference ExtResNetBlock (unet3d.py:147-192)."""

    def __init__(self, c_in, c_out, order, num_groups):
        super().__init__()
        n_order = order
        for c in "rel":
            n_order = n_order.replace(c, "")
        self.conv1 = _single_conv_order(c_in, c_out, order, num_groups)
        self.conv2 = _single_conv_order(c_out, c_out, order, num_groups)
        self.conv3 = _single_conv_order(c_out, c_out, n_order, num_groups)
        self._act = F.elu if "e" in order else (
            (lambda t: F.leaky_relu(t, 0.1)) if "l" in order else F.relu)

    def forward(self, x):
        out = self.conv1(x)
        residual = out
        out = self.conv3(self.conv2(out))
        return self._act(out + residual)


class _TwinUpsampling(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.upsample = nn.ConvTranspose3d(c_in, c_out, 3, stride=2,
                                           padding=1)


class _TwinResDecoder(nn.Module):
    def __init__(self, c_in, c_out, order, num_groups):
        super().__init__()
        self.upsampling = _TwinUpsampling(c_in, c_out)
        self.basic_module = _TwinExtResNetBlock(c_out, c_out, order,
                                                num_groups)


class TwinResidualUNet3D(nn.Module):
    """Reference ResidualUNet3D (unet3d.py:494-509): ExtResNetBlock,
    ConvTranspose3d upsampling with output_size plumbing, sum joining."""

    def __init__(self, in_channels, out_channels, f_maps, num_levels,
                 num_groups, order="cge"):
        super().__init__()
        fm = [f_maps * 2 ** k for k in range(num_levels)]
        encs = []
        ch = in_channels
        for o in fm:
            encs.append(_Stage(_TwinExtResNetBlock(ch, o, order,
                                                   num_groups)))
            ch = o
        self.encoders = nn.ModuleList(encs)
        rev = list(reversed(fm))
        self.decoders = nn.ModuleList([
            _TwinResDecoder(rev[i], rev[i + 1], order, num_groups)
            for i in range(len(rev) - 1)])
        self.final_conv = nn.Conv3d(fm[0], out_channels, 1)

    def forward(self, x):
        feats = []
        h = x
        for i, e in enumerate(self.encoders):
            if i > 0:
                h = F.max_pool3d(h, 2)
            h = e.basic_module(h)
            feats.insert(0, h)
        for d, skip in zip(self.decoders, feats[1:]):
            h = d.upsampling.upsample(h, output_size=skip.shape[2:])
            h = skip + h
            h = d.basic_module(h)
        return self.final_conv(h)


class TwinImplicitWNFDecoder(nn.Module):
    """Reference ImplicitWNFDecoder (conv_implicit_wnf.py:121-149): NOTE the
    query points go to grid_sample UNFLIPPED (no zyx flip, unlike
    gridding.py:70) — the axis-order quirk our decoder replicates."""

    def __init__(self, nn_channels):
        super().__init__()
        self.mlp = ref_mlp(nn_channels)

    def forward(self, volume, query):
        """volume: [B,C,Gx,Gy,Gz]; query: [B,M,3] in [0,1]."""
        grid = (2.0 * query - 1.0).view(*query.shape[:2], 1, 1, 3)
        sampled = F.grid_sample(volume, grid, mode="bilinear",
                                padding_mode="border", align_corners=True)
        sampled = sampled.view(*sampled.shape[:3]).permute(0, 2, 1)
        return apply_mlp(self.mlp, sampled)


class TwinPipeline(nn.Module):
    """Reference ConvImplicitWNFPipeline.forward (:314-338), eval mode."""

    def __init__(self, pn2_kwargs, agg_channels, grid_shape, unet_kwargs,
                 volume_decoder_channels, surface_decoder_channels,
                 mc_surface_decoder_channels=None, reduce_method="max"):
        super().__init__()
        self.pointnet2_nocs = TwinPointNet2NOCS(**pn2_kwargs)
        self.volume_agg = TwinVolumeAggregator(agg_channels, grid_shape,
                                               reduce_method)
        self.unet_3d = TwinUNet3D(**unet_kwargs)
        self.volume_decoder = TwinImplicitWNFDecoder(volume_decoder_channels)
        self.surface_decoder = TwinImplicitWNFDecoder(
            surface_decoder_channels)
        if mc_surface_decoder_channels is not None:
            self.mc_surface_decoder = TwinImplicitWNFDecoder(
                mc_surface_decoder_channels)

    def pointnet2_forward(self, x, pos):
        result = self.pointnet2_nocs(x, pos)
        bins = self.pointnet2_nocs.nocs_bins
        logits = result["per_point_logits"]
        lb = logits.view(*logits.shape[:-1], bins, 3)
        bin_idx = lb.argmax(-2)                               # [B,N,3]
        prob = F.softmax(lb, dim=-2)
        confidence = torch.gather(prob, -2, bin_idx[..., None, :])[..., 0, :]
        # VirtualGrid.idxs_to_points in fp32: idx * (1/(bins-1)), not
        # idx/(bins-1) — the two differ by 1 ulp and the offset propagates
        inv = torch.tensor(1.0, dtype=torch.float32) / (bins - 1)
        pred_nocs = bin_idx.float() * inv
        result["nocs_data"] = {
            "x": result["per_point_features"], "pos": pred_nocs,
            "sim_points": pos, "pred_confidence": confidence}
        return result

    def forward(self, x, pos, volume_query_points, surf_query_points,
                mc_surf_query_points=None):
        p2 = self.pointnet2_forward(x, pos)
        vol = self.unet_3d(self.volume_agg(p2["nocs_data"]))
        out = {
            "pointnet2_result": p2,
            "pred_volume_value":
                self.volume_decoder(vol, volume_query_points)[..., 0],
            "pred_sim_points": self.surface_decoder(vol, surf_query_points),
        }
        if mc_surf_query_points is not None:
            out["pred_mc_surface_logits"] = self.mc_surface_decoder(
                vol, mc_surf_query_points)[..., 0]
        return out
