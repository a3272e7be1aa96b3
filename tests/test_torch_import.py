"""Reference-checkpoint import parity: a randomly-initialized torch model in
the reference's exact module layout (AdaMVSNet naming, adamvs.py:316-341)
must produce the SAME forward as the flax model after
train/torch_import.py's mapping — numeric cross-framework proof, usable the
day real published weights appear.

The torch replicas below mirror the reference structure (cited per class)
with randomized weights AND randomized BatchNorm running stats (so a swapped
mean/var mapping cannot cancel out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from adamvs_tpu.models import AdaMVS
from adamvs_tpu.nn.costreg import AdaRedCell, CostRegNet2D
from adamvs_tpu.nn.featurenet import AdaFeatureNet
from adamvs_tpu.train.torch_import import import_adamvs_state_dict
import pytest

pytestmark = pytest.mark.slow  # heavy tier; excluded from the default run

KEY = jax.random.PRNGKey(0)


# --- torch replicas of the reference blocks (module.py:164-301, 5-52) ------

class TConv(tnn.Module):  # reference Conv2d wrapper, module.py:164-198
    def __init__(self, ci, co, k, stride=1, bn=True, relu=True):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, stride=stride, padding=(k - 1) // 2,
                               bias=not bn)
        self.bn = tnn.BatchNorm2d(co) if bn else None
        self.relu = relu

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.relu else x


class TDeconv(tnn.Module):  # reference Deconv2d, module.py:207-245
    def __init__(self, ci, co, k=3):
        super().__init__()
        self.conv = tnn.ConvTranspose2d(ci, co, k, stride=2, padding=1,
                                        output_padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(co)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TDeConv2dFuse(tnn.Module):  # module.py:506-524
    def __init__(self, ci, co, k=3):
        super().__init__()
        self.deconv = TDeconv(ci, co, k)
        self.conv = TConv(2 * co, co, k)

    def forward(self, skip, x):
        x = self.deconv(x)
        return self.conv(torch.cat((x, skip), dim=1))


class TConvBnReLU(tnn.Module):  # module.py:254-262
    def __init__(self, ci, co, k=3, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, stride=stride, padding=(k - 1) // 2,
                               bias=False)
        self.bn = tnn.BatchNorm2d(co)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TConvReLU(tnn.Module):  # module.py:264-271
    def __init__(self, ci, co, k=3, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, stride=stride, padding=(k - 1) // 2,
                               bias=False)

    def forward(self, x):
        return F.relu(self.conv(x))


class TConvGRU(tnn.Module):  # reference ConvGRUCell, module.py:5-52
    def __init__(self, ci, hidden, k=3):
        super().__init__()
        p = (k - 1) // 2
        self.conv_gates = tnn.Sequential(
            tnn.Conv2d(ci + hidden, 2 * hidden, k, padding=p, bias=True))
        self.convc = tnn.Sequential(
            tnn.Conv2d(ci + hidden, hidden, k, padding=p, bias=True))

    def forward(self, x, h):
        gates = self.conv_gates(torch.cat((x, h), dim=1))
        r, u = torch.chunk(gates, 2, dim=1)
        r, u = torch.sigmoid(r), torch.sigmoid(u)
        c = torch.tanh(self.convc(torch.cat((x, r * h), dim=1)))
        out = u * h + (1 - u) * c
        return out, out


class TFeatureNet0(tnn.Module):  # reference FeatureNet0, adamvs.py:49-152
    def __init__(self, b=8):
        super().__init__()
        self.conv0 = tnn.Sequential(TConv(3, b, 3), TConv(b, b, 3))
        self.conv1 = tnn.Sequential(TConv(b, 2 * b, 5, 2), TConv(2 * b, 2 * b, 3),
                                    TConv(2 * b, 2 * b, 3))
        self.conv2 = tnn.Sequential(TConv(2 * b, 4 * b, 5, 2), TConv(4 * b, 4 * b, 3),
                                    TConv(4 * b, 4 * b, 3))
        self.branch1_1 = tnn.Sequential(tnn.AvgPool2d(4, 4), TConv(4 * b, 2 * b, 1))
        self.branch1_2 = tnn.Sequential(tnn.AvgPool2d(8, 8), TConv(4 * b, 2 * b, 1))
        self.out1 = tnn.Conv2d(8 * b, 4 * b, 1, bias=False)
        self.deconv1 = TDeConv2dFuse(4 * b, 2 * b, 3)
        self.deconv2 = TDeConv2dFuse(2 * b, b, 3)
        self.branch2_1 = tnn.Sequential(tnn.AvgPool2d(4, 4), TConv(2 * b, b, 1))
        self.branch2_2 = tnn.Sequential(tnn.AvgPool2d(8, 8), TConv(2 * b, b, 1))
        self.branch3_1 = tnn.Sequential(tnn.AvgPool2d(4, 4), TConv(b, b // 2, 1))
        self.branch3_2 = tnn.Sequential(tnn.AvgPool2d(8, 8), TConv(b, b // 2, 1))
        self.out2 = tnn.Conv2d(4 * b, 2 * b, 1, bias=False)
        self.out3 = tnn.Conv2d(2 * b, b, 1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        out = {}

        def spp(intra, b1m, b2m, outm):
            sz = (intra.shape[2], intra.shape[3])
            b1 = F.interpolate(b1m(intra), sz, mode="bilinear")
            b2 = F.interpolate(b2m(intra), sz, mode="bilinear")
            return outm(torch.cat((b1, b2, intra), 1))

        intra = c2
        out["stage1"] = spp(intra, self.branch1_1, self.branch1_2, self.out1)
        intra = self.deconv1(c1, intra)
        out["stage2"] = spp(intra, self.branch2_1, self.branch2_2, self.out2)
        intra = self.deconv2(c0, intra)
        out["stage3"] = spp(intra, self.branch3_1, self.branch3_2, self.out3)
        return out


class TCostRegNet2D(tnn.Module):  # reference CostRegNet2D, adamvs.py:198-238
    def __init__(self, c):
        super().__init__()
        self.conv0 = TConvBnReLU(c, c)
        self.conv1 = TConvBnReLU(c, c, stride=2)
        self.conv2 = TConvBnReLU(c, c)
        self.conv3 = TConvBnReLU(c, c, stride=2)
        self.conv4 = TConvBnReLU(c, c)
        self.conv5 = TConvBnReLU(c, c, stride=2)
        self.conv6 = TConvBnReLU(c, c)

        def up():
            return tnn.Sequential(
                tnn.ConvTranspose2d(c, c, 3, padding=1, output_padding=1,
                                    stride=2, bias=False),
                tnn.BatchNorm2d(c), tnn.ReLU())

        self.conv7 = up()
        self.conv9 = up()
        self.conv11 = up()
        self.prob = tnn.Conv2d(c, c, 3, stride=1, padding=1)

    def forward(self, x):
        conv0 = self.conv0(x)
        conv2 = self.conv2(self.conv1(conv0))
        conv4 = self.conv4(self.conv3(conv2))
        x = self.conv6(self.conv5(conv4))
        x = conv4 + self.conv7(x)
        x = conv2 + self.conv9(x)
        x = conv0 + self.conv11(x)
        return self.prob(x)


class TCostRegNetRED(tnn.Module):  # reference CostRegNetRED, adamvs.py:157-195
    def __init__(self, ci, up=True, b=8):
        super().__init__()
        self.conv1 = TConvReLU(ci, b)
        self.conv_gru1 = TConvGRU(b, b)
        self.conv2 = TConvReLU(b, 2 * b, stride=2)
        self.conv_gru2 = TConvGRU(2 * b, 2 * b)
        self.upconv1 = tnn.ConvTranspose2d(2 * b, b, 3, stride=2, padding=1,
                                           output_padding=1)
        if up:
            self.upconv2d = tnn.ConvTranspose2d(b, 1, 3, stride=2, padding=1,
                                                output_padding=1)
        else:
            self.upconv2d = tnn.Conv2d(b, 1, 3, stride=1, padding=1)

    def forward_slice(self, cost, s1, s2):
        c1 = self.conv1(cost)
        r1, s1 = self.conv_gru1(c1, s1)
        c2 = self.conv2(r1)
        r2, s2 = self.conv_gru2(c2, s2)
        u1 = F.relu(self.upconv1(r2) + r1)
        return self.upconv2d(u1), s1, s2


class TAdaMVSNet(tnn.Module):
    """Parameter container matching the reference AdaMVSNet state_dict tree
    (adamvs.py:316-341: one CostRegNet2D per DepthNet0, even though only
    stage 1's runs)."""

    def __init__(self, b=8, d0=8, chans=(32, 16, 8)):
        super().__init__()
        self.feature = TFeatureNet0(b)

        class TDepthNet0(tnn.Module):
            def __init__(self, c, up):
                super().__init__()
                self.reg = TCostRegNet2D(d0)
                self.reg_fuse = TCostRegNetRED(c, up, 8)

        self.DepthNet = tnn.ModuleList([
            TDepthNet0(chans[0], True),
            TDepthNet0(chans[1], True),
            TDepthNet0(chans[2], False),
        ])


def _randomized_state_dict(model: tnn.Module, seed=0):
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = rng.randn(*v.shape).astype(np.float32) * 0.3
        if k.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        sd[k] = torch.tensor(arr)
    model.load_state_dict(sd)
    model.eval()
    return sd


def _import_tiny():
    tm = TAdaMVSNet()
    sd = _randomized_state_dict(tm)
    model = AdaMVS(ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0),
                   base=8, cr_base=(8, 8, 8))
    imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    projs = {f"stage{k}": jnp.tile(jnp.eye(4), (1, 2, 1, 1)).astype(jnp.float32)
             for k in (1, 2, 3)}
    dv = jnp.asarray([[300.0, 500.0, 25.0]], jnp.float32)
    variables = model.init(KEY, imgs, projs, dv)
    new_vars, skipped = import_adamvs_state_dict(sd, variables)
    assert all(k.startswith(("DepthNet.1.reg.", "DepthNet.2.reg.")) for k in skipped)
    return tm, new_vars


def test_feature_net_forward_parity():
    tm, variables = _import_tiny()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm.feature(torch.tensor(x.transpose(0, 3, 1, 2)))
    fvars = {"params": variables["params"]["feature"],
             "batch_stats": variables["batch_stats"]["feature"]}
    out = AdaFeatureNet(8).apply(fvars, jnp.asarray(x), False)
    for k in ("stage1", "stage2", "stage3"):
        got = np.asarray(out[k]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref[k].numpy(), rtol=1e-4, atol=1e-4)


def test_reg2d_forward_parity():
    tm, variables = _import_tiny()
    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 40, 8).astype(np.float32)  # D=8 as channels
    with torch.no_grad():
        ref = tm.DepthNet[0].reg(torch.tensor(x.transpose(0, 3, 1, 2)))
    rvars = {"params": variables["params"]["reg2d"],
             "batch_stats": variables["batch_stats"]["reg2d"]}
    out = CostRegNet2D(8).apply(rvars, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), rtol=1e-4, atol=1e-4)


def test_reg_fuse_recurrent_parity():
    """3 depth slices through the recurrent regularizer, GRU states carried —
    torch slice loop vs our scan cell, for an up stage and the final stage."""
    tm, variables = _import_tiny()
    rng = np.random.RandomState(3)
    for idx, (c, up) in enumerate([(32, True), (16, True), (8, False)]):
        cell = AdaRedCell(8, up)
        cvars = {"params": variables["params"][f"reg_fuse{idx+1}"]["cell"]}
        carry = cell.init_carry(1, 16, 24)
        s1 = torch.zeros(1, 8, 16, 24)
        s2 = torch.zeros(1, 16, 8, 12)
        red = tm.DepthNet[idx].reg_fuse
        for d in range(3):
            cost = rng.randn(1, 16, 24, c).astype(np.float32)
            with torch.no_grad():
                ref, s1, s2 = red.forward_slice(
                    torch.tensor(cost.transpose(0, 3, 1, 2)), s1, s2)
            carry, out = cell.apply(cvars, carry, jnp.asarray(cost))
            np.testing.assert_allclose(
                np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(),
                rtol=1e-4, atol=1e-4,
                err_msg=f"stage{idx+1} slice {d}",
            )


def test_adamvs_stage1_whole_stage_torch_parity():
    """Whole-stage cross-framework parity on real (non-identity) cameras:
    torch warp (module.py:527-568) + per-view matching (CostRegNet2D +
    softmax confidence, adamvs.py:268-288) + confidence-weighted fusion +
    recurrent regularization + online-softmax regression vs the flax model's
    stage-1 output. Catches fusion/eps/warp-convention/upsample mismatches
    the submodule tests cannot (VERDICT r3 missing #2)."""
    from tests.test_torch_import_msrednet import _real_cameras, torch_homo_warp

    tm, variables = _import_tiny()
    model = AdaMVS(ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0),
                   base=8, cr_base=(8, 8, 8))
    rng = np.random.RandomState(7)
    B, V, H, W = 1, 3, 64, 64
    h, w, D, C = H // 4, W // 4, 8, 32
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dmin, dmax = 300.0, 500.0
    dv = np.array([[dmin, dmax, 25.0]], np.float32)
    projs = {}
    for k, s in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        p = _real_cameras(B, V, H, W)
        p[:, :, :2, :] /= s
        projs[k] = p

    out = model.apply(variables, jnp.asarray(imgs),
                      {k: jnp.asarray(v) for k, v in projs.items()},
                      jnp.asarray(dv), train=False)
    got_depth = np.asarray(out["stage1"]["depth"])  # [B, 2h, 2w] (up stage)
    got_pconf = np.asarray(out["stage1"]["pair_confidence"])  # [B,h,w,V-1]

    with torch.no_grad():
        feats = [tm.feature(torch.tensor(imgs[:, v].transpose(0, 3, 1, 2)))
                 for v in range(V)]
        ref_f = feats[0]["stage1"]  # [B,C,h,w]
        hyp = torch.tensor(
            dmin + np.arange(D, dtype=np.float32) * (dmax - dmin) / (D - 1)
        ).reshape(1, D, 1, 1).expand(B, D, h, w)

        # per-view matching -> confidences (adamvs.py:268-288)
        warps, confs = [], []
        for v in range(1, V):
            warped = torch_homo_warp(feats[v]["stage1"],
                                     projs["stage1"][:, v], projs["stage1"][:, 0],
                                     hyp)  # [B,C,D,h,w]
            corr = (ref_f.unsqueeze(2) * warped).mean(dim=1)  # [B,D,h,w]
            prob = torch.softmax(tm.DepthNet[0].reg(corr), dim=1)
            confs.append(prob.max(dim=1).values)  # [B,h,w]
            warps.append(warped)
        want_pconf = torch.stack(confs, dim=-1).numpy()

        # confidence-weighted fusion, streamed depth slices (adamvs.py:497-531
        # Infer-form eps placement), recurrent reg, full softmax over d
        wsum = 1e-5 + sum(confs)
        s1 = torch.zeros(B, 8, h, w)
        s2 = torch.zeros(B, 16, h // 2, w // 2)
        costs = []
        for d in range(D):
            fused = 0.0
            for v in range(V - 1):
                fused = fused + confs[v].unsqueeze(1) * (
                    ref_f * warps[v][:, :, d])
            fused = fused / wsum.unsqueeze(1)
            cost, s1, s2 = tm.DepthNet[0].reg_fuse.forward_slice(fused, s1, s2)
            costs.append(cost[:, 0])  # [B,2h,2w]
        cost = torch.stack(costs, dim=1)  # [B,D,2h,2w]
        prob = torch.softmax(cost, dim=1)
        hyp_up = F.interpolate(hyp, scale_factor=2, mode="bilinear",
                               align_corners=False)
        want_depth = torch.sum(prob * hyp_up, dim=1).numpy()

    np.testing.assert_allclose(got_pconf, want_pconf, rtol=1e-3, atol=1e-3)
    scale = dmax - dmin
    err = np.abs(got_depth - want_depth) / scale
    assert err.max() < 2e-3, f"stage depth mismatch: rel max {err.max():.2e}"


def test_adamvs_full_cascade_parity():
    """Complete 3-stage cascade cross-framework parity (VERDICT r4 missing #1):
    the torch replica runs the reference's exact cascade control flow —
    uniform stage-1 hypotheses (module.py:646-659), stage-k>1 per-pixel
    windows around the previous (already 2x-upsampled) depth with the
    D·Δ/(D-1) respacing (module.py:628-643), stage-1 confidences bilinearly
    resized as stage-2/3 visibility weights (adamvs.py:292-302), per-slice
    recurrent regularization with carried GRU states, and depth regression
    with the hypothesis volume bilinearly interpolated to the upsampled prob
    resolution (module.py:617-625). A subtle inter-stage resize/window
    convention mismatch passes every per-stage test but fails here."""
    from tests.test_torch_import_msrednet import _real_cameras, torch_homo_warp

    tm, variables = _import_tiny()
    model = AdaMVS(ndepths=(8, 4, 4), depth_intervals_ratio=(4.0, 2.0, 1.0),
                   base=8, cr_base=(8, 8, 8))
    rng = np.random.RandomState(11)
    B, V, H, W = 1, 3, 64, 64
    imgs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dmin, dmax, dint = 300.0, 500.0, 25.0
    dv = np.array([[dmin, dmax, dint]], np.float32)
    projs = {}
    for k, s in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        p = _real_cameras(B, V, H, W)
        p[:, :, :2, :] /= s
        projs[k] = p

    out = model.apply(variables, jnp.asarray(imgs),
                      {k: jnp.asarray(v) for k, v in projs.items()},
                      jnp.asarray(dv), train=False)

    with torch.no_grad():
        feats = [tm.feature(torch.tensor(imgs[:, v].transpose(0, 3, 1, 2)))
                 for v in range(V)]
        depth = None
        pair_conf = None  # stage-1 per-view confidences [B,1,h1,w1]
        want = {}
        for si, (D, ratio) in enumerate([(8, 4.0), (4, 2.0), (4, 1.0)]):
            key = f"stage{si + 1}"
            scale = (4, 2, 1)[si]
            h, w = H // scale, W // scale
            up = si < 2
            if depth is None:
                base = dmin + np.arange(D, dtype=np.float32) * (dmax - dmin) / (D - 1)
                hyp = torch.tensor(base).reshape(1, D, 1, 1).expand(B, D, h, w)
            else:
                cur = depth  # already at this stage's res (prev stage up=True)
                ik = ratio * dint
                lo = cur - D / 2 * ik
                step = (cur + D / 2 * ik - lo) / (D - 1)
                hyp = lo.unsqueeze(1) + torch.arange(D, dtype=torch.float32
                                                     ).reshape(1, -1, 1, 1) * step.unsqueeze(1)
            ref_f = feats[0][key]
            warps = [torch_homo_warp(feats[v][key], projs[key][:, v],
                                     projs[key][:, 0], hyp)
                     for v in range(1, V)]  # each [B,C,D,h,w]
            fused = torch.tensor(1e-5)
            wsum = torch.tensor(0.0)
            if si == 0:
                pair_conf = []
                for v in range(V - 1):
                    corr = (ref_f.unsqueeze(2) * warps[v]).mean(dim=1)
                    prob = torch.softmax(tm.DepthNet[0].reg(corr), dim=1)
                    conf = prob.max(dim=1).values.unsqueeze(1)  # [B,1,h,w]
                    pair_conf.append(conf)
                    wsum = wsum + conf.unsqueeze(1)
                    fused = fused + (ref_f.unsqueeze(2) * warps[v]) * conf.unsqueeze(1)
            else:
                for v in range(V - 1):
                    weight = F.interpolate(pair_conf[v], [h, w], mode="bilinear",
                                           align_corners=False)
                    wsum = wsum + weight.unsqueeze(1)
                    fused = fused + (ref_f.unsqueeze(2) * warps[v]) * weight.unsqueeze(1)
            fused = fused / wsum

            red = tm.DepthNet[si].reg_fuse
            s1 = torch.zeros(B, 8, h, w)
            s2 = torch.zeros(B, 16, h // 2, w // 2)
            costs = []
            for d in range(D):
                cost, s1, s2 = red.forward_slice(fused[:, :, d], s1, s2)
                costs.append(cost[:, 0])
            cost = torch.stack(costs, dim=1)  # [B,D,oh,ow]
            prob = torch.softmax(cost, dim=1)
            hyp_r = F.interpolate(hyp, [cost.shape[2], cost.shape[3]],
                                  mode="bilinear", align_corners=False) if up else hyp
            depth = torch.sum(prob * hyp_r, dim=1)
            want[key] = depth.numpy()

    scale = dmax - dmin
    for key in ("stage1", "stage2", "stage3"):
        got = np.asarray(out[key]["depth"])
        err = np.abs(got - want[key]) / scale
        assert err.max() < 1e-4, f"{key} depth mismatch: rel max {err.max():.2e}"
