"""PyTorch oracle models mirroring the zoo, for golden-fixture parity.

The reference's entire test strategy is differential testing against torch
(SURVEY §4): `tools/make_step*_fixture.py` run torchvision resnet18 partially
and dump goldens; the CUDA engine must match at max_abs <= 1e-4. We keep the
methodology but invert the weight flow (no torchvision download in this
zero-egress image): OUR randomly-initialized params are exported, loaded into
an independently-written torch model of the same topology, and torch (CPU)
produces the stage goldens.

Layout conversions at the boundary:
  conv  HWIO (ours) <-> OIHW (torch):  transpose (3, 2, 0, 1)
  dense IO   (ours) <-> OI   (torch):  transpose (1, 0)
  acts  NHWC (ours) <-> NCHW (torch):  transpose (0, 3, 1, 2)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# torch is CPU-only in this image; import lazily so TPU-only flows never pay it


def _t(x) -> "Any":
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))


def hwio_to_oihw(w) -> "Any":
    return _t(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def io_to_oi(w) -> "Any":
    return _t(np.transpose(np.asarray(w), (1, 0)))


def nhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 2, 3, 1)))


# ---------------------------------------------------------------------------
# ResNet oracle
# ---------------------------------------------------------------------------

def build_torch_resnet(params: Dict[str, Any], cfg) -> "Any":
    """Standard BasicBlock ResNet in torch.nn, weights copied from our
    param pytree. Returns an eval-mode torch module taking NCHW."""
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride, has_down):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = None
            if has_down:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, 0, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            sc = self.down(x) if self.down is not None else x
            return torch.relu(y + sc)

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride, has_down):
            super().__init__()
            cout = width * 4
            self.conv1 = nn.Conv2d(cin, width, 1, 1, 0, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, 1, 0, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.down = None
            if has_down:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, 0, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            sc = self.down(x) if self.down is not None else x
            return torch.relu(y + sc)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            w0 = cfg.widths[0]
            if cfg.small_input:
                self.conv1 = nn.Conv2d(cfg.in_channels, w0, 3, 1, 1, bias=False)
            else:
                self.conv1 = nn.Conv2d(cfg.in_channels, w0, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(w0)
            self.maxpool = nn.MaxPool2d(3, 2, 1) if not cfg.small_input else nn.Identity()
            layers = []
            cin = w0
            for s, (width, nb) in enumerate(zip(cfg.widths, cfg.blocks_per_stage)):
                blocks = []
                for b in range(nb):
                    stride = 2 if (s > 0 and b == 0) else 1
                    if getattr(cfg, "bottleneck", False):
                        cout = width * 4
                        blocks.append(Bottleneck(cin, width, stride,
                                                 stride != 1 or cin != cout))
                        cin = cout
                    else:
                        blocks.append(Block(cin, width, stride, stride != 1 or cin != width))
                        cin = width
                layers.append(nn.Sequential(*blocks))
            self.layer1, self.layer2, self.layer3, self.layer4 = layers
            self.fc = nn.Linear(cin, cfg.num_classes)

        def forward(self, x, taps=None):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.maxpool(y)
            if taps is not None:
                taps["stem"] = y
            for i in range(1, 5):
                y = getattr(self, f"layer{i}")(y)
                if taps is not None:
                    taps[f"layer{i}"] = y
            g = y.mean(dim=(2, 3))
            logits = self.fc(g)
            if taps is not None:
                taps["gap"], taps["logits"] = g, logits
            return logits

    net = Net().eval()

    def load_bn(mod, bn):
        mod.weight.data = _t(bn["gamma"])
        mod.bias.data = _t(bn["beta"])
        mod.running_mean.data = _t(bn["mean"])
        mod.running_var.data = _t(bn["var"])

    net.conv1.weight.data = hwio_to_oihw(params["stem"]["conv"])
    load_bn(net.bn1, params["stem"]["bn"])
    for s in range(4):
        stage = getattr(net, f"layer{s+1}")
        for b, bp in enumerate(params[f"layer{s+1}"]):
            blk = stage[b]
            blk.conv1.weight.data = hwio_to_oihw(bp["conv1"])
            load_bn(blk.bn1, bp["bn1"])
            blk.conv2.weight.data = hwio_to_oihw(bp["conv2"])
            load_bn(blk.bn2, bp["bn2"])
            if "conv3" in bp:
                blk.conv3.weight.data = hwio_to_oihw(bp["conv3"])
                load_bn(blk.bn3, bp["bn3"])
            if blk.down is not None:
                blk.down[0].weight.data = hwio_to_oihw(bp["down_conv"])
                load_bn(blk.down[1], bp["down_bn"])
    net.fc.weight.data = io_to_oi(params["fc"]["w"])
    net.fc.bias.data = _t(params["fc"]["b"])
    return net


def torch_resnet_taps(params, cfg, x_nhwc: np.ndarray) -> Dict[str, np.ndarray]:
    """Run the oracle; return stage goldens in OUR layout (NHWC / NC)."""
    import torch

    net = build_torch_resnet(params, cfg)
    taps: Dict[str, Any] = {}
    with torch.no_grad():
        net(_t(nhwc_to_nchw(x_nhwc)), taps=taps)
    out = {}
    for k, v in taps.items():
        a = v.numpy()
        out[k] = nchw_to_nhwc(a) if a.ndim == 4 else a
    return out


# ---------------------------------------------------------------------------
# MLP / LeNet oracles
# ---------------------------------------------------------------------------

def torch_mlp_logits(params, x: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        y = _t(x)
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            y = y @ _t(layer["w"]) + _t(layer["b"])
            if i < n - 1:
                y = torch.relu(y)
        return y.numpy()


def torch_mlp_train(X, Y, cfg, epochs: int = None) -> Dict[str, Any]:
    """The ladder's v1 equivalent: same init/hypers in torch (CPU), returns
    loss history + per-phase timing for cross-implementation comparison."""
    import time

    import torch
    import torch.nn as nn

    from dlq_tpu.models.mlp import init_mlp
    import jax

    torch.manual_seed(cfg.seed)
    jparams = init_mlp(jax.random.PRNGKey(cfg.seed), cfg.model)
    dims = (cfg.model.in_dim,) + tuple(cfg.model.hidden) + (cfg.model.num_classes,)
    layers = []
    for i in range(len(dims) - 1):
        lin = nn.Linear(dims[i], dims[i + 1])
        lin.weight.data = io_to_oi(jparams["layers"][i]["w"])
        lin.bias.data = _t(jparams["layers"][i]["b"])
        layers.append(lin)
        if i < len(dims) - 2:
            layers.append(nn.ReLU())
    net = nn.Sequential(*layers)
    opt = torch.optim.SGD(net.parameters(), lr=cfg.lr)
    lossf = nn.CrossEntropyLoss()
    phases = {"data": 0.0, "forward": 0.0, "loss": 0.0, "backward": 0.0, "update": 0.0}
    history = []
    n = len(X)
    steps = n // cfg.batch
    t_all = time.perf_counter()
    for epoch in range(epochs or cfg.epochs):
        ep_loss = 0.0
        for s in range(steps):
            t0 = time.perf_counter()
            xb = torch.from_numpy(X[s * cfg.batch : (s + 1) * cfg.batch])
            yb = torch.from_numpy(Y[s * cfg.batch : (s + 1) * cfg.batch]).long()
            t1 = time.perf_counter(); phases["data"] += t1 - t0
            logits = net(xb)
            t2 = time.perf_counter(); phases["forward"] += t2 - t1
            loss = lossf(logits, yb)
            t3 = time.perf_counter(); phases["loss"] += t3 - t2
            opt.zero_grad(); loss.backward()
            t4 = time.perf_counter(); phases["backward"] += t4 - t3
            opt.step()
            phases["update"] += time.perf_counter() - t4
            ep_loss += float(loss)
        history.append({"epoch": epoch, "loss": ep_loss / steps})
    return {"total_s": time.perf_counter() - t_all,
            "phases_s": phases, "history": history, "final_loss": history[-1]["loss"]}


# ---------------------------------------------------------------------------
# MobileNetV2 oracle
# ---------------------------------------------------------------------------

def build_torch_mobilenetv2(params: Dict[str, Any], cfg) -> "Any":
    """Torch mirror of models.mobilenetv2 (inverted residuals, ReLU6)."""
    import torch
    import torch.nn as nn

    from dlq_tpu.models.mobilenetv2 import block_meta

    meta = block_meta(cfg)

    class InvRes(nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m
            h = m["hidden"]
            if m["expand"]:
                self.expand = nn.Conv2d(m["cin"], h, 1, bias=False)
                self.bn_e = nn.BatchNorm2d(h)
            self.dw = nn.Conv2d(h, h, 3, m["stride"], 1, groups=h, bias=False)
            self.bn_d = nn.BatchNorm2d(h)
            self.project = nn.Conv2d(h, m["cout"], 1, bias=False)
            self.bn_p = nn.BatchNorm2d(m["cout"])

        def forward(self, x):
            y = x
            if self.m["expand"]:
                y = torch.clamp(self.bn_e(self.expand(y)), 0, 6)
            y = torch.clamp(self.bn_d(self.dw(y)), 0, 6)
            y = self.bn_p(self.project(y))
            return x + y if self.m["has_res"] else y

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            c0 = cfg.ch(32)
            self.stem = nn.Conv2d(cfg.in_channels, c0, 3,
                                  1 if cfg.small_input else 2, 1, bias=False)
            self.bn_s = nn.BatchNorm2d(c0)
            self.blocks = nn.ModuleList([InvRes(m) for m in meta])
            ch = cfg.ch(1280)
            self.head = nn.Conv2d(meta[-1]["cout"], ch, 1, bias=False)
            self.bn_h = nn.BatchNorm2d(ch)
            self.fc = nn.Linear(ch, cfg.num_classes)

        def forward(self, x, taps=None):
            y = torch.clamp(self.bn_s(self.stem(x)), 0, 6)
            for i, b in enumerate(self.blocks):
                y = b(y)
                if taps is not None:
                    taps[f"block{i}"] = y
            y = torch.clamp(self.bn_h(self.head(y)), 0, 6)
            g = y.mean(dim=(2, 3))
            logits = self.fc(g)
            if taps is not None:
                taps["gap"], taps["logits"] = g, logits
            return logits

    net = Net().eval()

    def load_bn(mod, bn):
        mod.weight.data = _t(bn["gamma"]); mod.bias.data = _t(bn["beta"])
        mod.running_mean.data = _t(bn["mean"]); mod.running_var.data = _t(bn["var"])

    net.stem.weight.data = hwio_to_oihw(params["stem"]["w"])
    load_bn(net.bn_s, params["stem"]["bn"])
    for i, (bp, blk) in enumerate(zip(params["blocks"], net.blocks)):
        if "expand" in bp:
            blk.expand.weight.data = hwio_to_oihw(bp["expand"]["w"])
            load_bn(blk.bn_e, bp["expand"]["bn"])
        # depthwise: ours HWIO [3,3,1,H] -> torch [H,1,3,3]
        blk.dw.weight.data = hwio_to_oihw(bp["dw"]["w"])
        load_bn(blk.bn_d, bp["dw"]["bn"])
        blk.project.weight.data = hwio_to_oihw(bp["project"]["w"])
        load_bn(blk.bn_p, bp["project"]["bn"])
    net.head.weight.data = hwio_to_oihw(params["head"]["w"])
    load_bn(net.bn_h, params["head"]["bn"])
    net.fc.weight.data = io_to_oi(params["fc"]["w"])
    net.fc.bias.data = _t(params["fc"]["b"])
    return net


def torch_mobilenetv2_taps(params, cfg, x_nhwc: np.ndarray) -> Dict[str, np.ndarray]:
    import torch

    net = build_torch_mobilenetv2(params, cfg)
    taps: Dict[str, Any] = {}
    with torch.no_grad():
        net(_t(nhwc_to_nchw(x_nhwc)), taps=taps)
    return {k: (nchw_to_nhwc(v.numpy()) if v.ndim == 4 else v.numpy())
            for k, v in taps.items()}


# ---------------------------------------------------------------------------
# ViT (DeiT-Ti) oracle
# ---------------------------------------------------------------------------

def torch_vit_logits(params, cfg, x_nhwc: np.ndarray) -> np.ndarray:
    """Torch mirror of models.vit (patch-dense, pre-LN blocks, GELU)."""
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        x = _t(x_nhwc)
        B, H, W, C = x.shape
        p = cfg.patch
        gh, gw = H // p, W // p
        xp = x.reshape(B, gh, p, gw, p, C).permute(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        y = xp @ _t(params["patch"]["w"]) + _t(params["patch"]["b"])
        cls = _t(params["cls"]).expand(B, 1, cfg.dim)
        y = torch.cat([cls, y], dim=1) + _t(params["pos"])

        def ln(t, lp):
            return F.layer_norm(t, (cfg.dim,), _t(lp["g"]), _t(lp["b"]), eps=1e-6)

        hd = cfg.dim // cfg.heads
        for lp in params["layers"]:
            h = ln(y, lp["ln1"])
            qkv = h @ _t(lp["qkv"]["w"]) + _t(lp["qkv"]["b"])
            q, k, v = qkv.chunk(3, dim=-1)

            def split(t):
                return t.reshape(B, -1, cfg.heads, hd).permute(0, 2, 1, 3)

            q, k, v = split(q), split(k), split(v)
            attn = torch.softmax(q @ k.transpose(-1, -2) / (hd ** 0.5), dim=-1)
            a = (attn @ v).permute(0, 2, 1, 3).reshape(B, -1, cfg.dim)
            y = y + a @ _t(lp["proj"]["w"]) + _t(lp["proj"]["b"])
            h = ln(y, lp["ln2"])
            h = h @ _t(lp["fc1"]["w"]) + _t(lp["fc1"]["b"])
            h = F.gelu(h, approximate="none")
            y = y + h @ _t(lp["fc2"]["w"]) + _t(lp["fc2"]["b"])
        y = F.layer_norm(y, (cfg.dim,), _t(params["norm"]["g"]), _t(params["norm"]["b"]), eps=1e-6)
        logits = y[:, 0] @ _t(params["head"]["w"]) + _t(params["head"]["b"])
        return logits.numpy()
