"""Executed-torch numerical parity of models/lpips.py.

Builds the `lpips.LPIPS(net='vgg')` math in plain torch with RANDOM
weights (torchvision/lpips are not installed here): VGG16 features with
torchvision's `features.N` layer indexing, ScalingLayer constants,
`normalize_tensor` (eps OUTSIDE the sqrt), squared diff, 1x1 `lin`
convs, spatial average, sum over the 5 taps — the loss stage 1 uses
(`train/latent_wm_pretrain.py:111,182`).  The torch state dict carries
the exact published key layout (`features.N.weight` +
`lin{i}.model.1.weight`), so `tools.torch_import.lpips_from_torch` is
exercised end to end, same pattern as tests/test_inception_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aqualora_tpu.models.lpips import LPIPS  # noqa: E402
from aqualora_tpu.tools.torch_import import lpips_from_torch  # noqa: E402

# torchvision vgg16.features module indices of the 13 convs (pools and
# ReLUs occupy the gaps) — mirrors torch_import._VGG16_TORCH_CONV_IDX
_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def _build_torch_vgg(seed: int):
    """13 random Conv2d's keyed like torchvision vgg16 `features.N`."""
    torch.manual_seed(seed)
    convs, cin = [], 3
    for ch, n in _STAGES:
        for _ in range(n):
            convs.append(nn.Conv2d(cin, ch, 3, padding=1))
            cin = ch
    state = {}
    for i, c in enumerate(convs):
        state[f"features.{_CONV_IDX[i]}.weight"] = c.weight.detach().clone()
        state[f"features.{_CONV_IDX[i]}.bias"] = c.bias.detach().clone()
    lins = []
    for i, (ch, _) in enumerate(_STAGES):
        w = torch.rand(1, ch, 1, 1) * 0.1  # non-negative, like the
        lins.append(w)                     # published lin weights
        state[f"lin{i}.model.1.weight"] = w.clone()
    return convs, lins, state


def _torch_lpips(convs, lins, x0, x1):
    """Verbatim lpips package math (lpips/lpips.py forward):
    ScalingLayer -> vgg taps -> normalize_tensor(eps=1e-10 outside the
    sqrt) -> (f0-f1)^2 -> 1x1 lin conv -> spatial mean -> sum."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        x = (x - shift) / scale
        out, i = [], 0
        for si, (ch, n) in enumerate(_STAGES):
            for _ in range(n):
                x = F.relu(convs[i](x))
                i += 1
            out.append(x)
            if si < len(_STAGES) - 1:
                x = F.max_pool2d(x, 2, 2)
        return out

    t0, t1 = taps(x0), taps(x1)
    total = torch.zeros(x0.shape[0])
    for a, b, w in zip(t0, t1, lins):
        a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = F.conv2d((a - b) ** 2, w)
        total = total + d.mean(dim=(1, 2, 3))
    return total


def test_lpips_matches_executed_torch():
    convs, lins, state = _build_torch_vgg(0)
    rng = np.random.default_rng(1)
    x0 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    x1 = np.clip(x0 + rng.normal(0, 0.12, x0.shape), -1, 1).astype(
        np.float32)

    with torch.no_grad():
        golden = _torch_lpips(convs, lins,
                              torch.from_numpy(x0).permute(0, 3, 1, 2),
                              torch.from_numpy(x1).permute(0, 3, 1, 2))

    params = lpips_from_torch({k: v.numpy() for k, v in state.items()})
    ours = jax.jit(lambda a, b: LPIPS().apply({"params": params}, a, b))(
        jnp.asarray(x0), jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(),
                               rtol=2e-4, atol=1e-5)


def test_lpips_zero_distance_and_symmetry():
    convs, lins, state = _build_torch_vgg(2)
    params = lpips_from_torch({k: v.numpy() for k, v in state.items()})
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    x1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    apply = lambda a, b: LPIPS().apply({"params": params}, a, b)
    assert float(apply(x0, x0)[0]) == pytest.approx(0.0, abs=1e-9)
    np.testing.assert_allclose(np.asarray(apply(x0, x1)),
                               np.asarray(apply(x1, x0)), rtol=1e-5)


def test_lpips_from_torch_accepts_lpips_slice_layout():
    """The published lpips checkpoint keys its convs `net.sliceK.N`;
    the importer must map them to the same params as `features.N`."""
    _, _, state = _build_torch_vgg(4)
    bounds = [(1, 0), (2, 4), (3, 9), (4, 16), (5, 23)]

    def slice_key(n):
        for s, start in reversed(bounds):
            if n >= start:
                return f"net.slice{s}.{n}"

    alt = {}
    for k, v in state.items():
        if k.startswith("features."):
            n = int(k.split(".")[1])
            alt[f"{slice_key(n)}.{k.split('.')[2]}"] = v
        else:
            alt[f"lins.{k.split('.')[0][3:]}.model.1.weight"] = v
    a = lpips_from_torch({k: v.numpy() for k, v in state.items()})
    b = lpips_from_torch({k: v.numpy() for k, v in alt.items()})
    ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert all(np.array_equal(x, y) for x, y in zip(ja, jb))
