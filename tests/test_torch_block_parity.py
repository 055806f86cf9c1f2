"""Block-level numerical parity vs hand-built torch references.

diffusers isn't installed, but the U-Net's building blocks are small
enough to mirror in a few lines of torch each — this pins GroupNorm/conv
/attention semantics (NHWC vs NCHW, eps, padding) against PyTorch on
shared weights (SURVEY.md §4(b))."""

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.core import io
from aqualora_tpu.models.layers import (Attention, ResnetBlock2D,
                                        Transformer2DModel)

KEY = jax.random.PRNGKey(0)


def _to_torch(x_nhwc):
    import torch
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _from_torch(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_resnet_block_parity():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    cin, cout, groups = 16, 24, 8
    blk = ResnetBlock2D(cout, groups)
    x = jax.random.normal(KEY, (2, 8, 8, cin))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 12))
    params = blk.init(KEY, x, temb)["params"]

    class TorchResnet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-5)
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.time_emb_proj = tnn.Linear(12, cout)
            self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-5)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

        def forward(self, x, temb):
            h = self.conv1(F.silu(self.norm1(x)))
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
            h = self.conv2(F.silu(self.norm2(h)))
            return self.conv_shortcut(x) + h

    ref = TorchResnet().eval()
    state = {k: torch.from_numpy(v) for k, v in
             io.flax_params_to_torch_state(params).items()}
    ref.load_state_dict(state)
    with torch.no_grad():
        out_ref = _from_torch(ref(_to_torch(x), torch.from_numpy(
            np.asarray(temb))))
    out = blk.apply({"params": params}, x, temb)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


def test_attention_parity():
    import torch
    import torch.nn as tnn

    dim, heads, ctx_dim = 32, 4, 24
    attn = Attention(dim, heads, ctx_dim)
    x = jax.random.normal(KEY, (2, 10, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, ctx_dim))
    params = attn.init(KEY, x, ctx)["params"]

    class TorchAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = tnn.Linear(dim, dim, bias=False)
            self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
            self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
            self.to_out = tnn.Linear(dim, dim)

        def forward(self, x, ctx):
            b, t, _ = x.shape
            hd = dim // heads
            shape = lambda u: u.view(b, -1, heads, hd).transpose(1, 2)
            q, k, v = (shape(self.to_q(x)), shape(self.to_k(ctx)),
                       shape(self.to_v(ctx)))
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            return self.to_out(o.transpose(1, 2).reshape(b, t, dim))

    ref = TorchAttn().eval()
    tstate = io.flax_params_to_torch_state(params)
    tstate = {k.replace("to_out.0", "to_out"): torch.from_numpy(v)
              for k, v in tstate.items()}
    ref.load_state_dict(tstate)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(np.asarray(x)),
                      torch.from_numpy(np.asarray(ctx))).numpy()
    out = attn.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


def test_transformer2d_groupnorm_eps():
    """Transformer2DModel's GroupNorm uses eps 1e-6 (diffusers spatial
    norm), ResnetBlock2D uses 1e-5 — pin both."""
    t2d = Transformer2DModel(16, 2, 8, groups=4)
    x = jnp.ones((1, 4, 4, 16))
    ctx = jnp.ones((1, 3, 8))
    params = t2d.init(KEY, x, ctx)["params"]
    assert "norm" in params and "proj_in" in params
    out = t2d.apply({"params": params}, x, ctx)
    assert out.shape == x.shape
