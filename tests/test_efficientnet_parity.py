"""EfficientNet building-block numerical parity vs torch (depthwise conv,
BatchNorm eval semantics, squeeze-excitation) — the ops msgdecoder.pt
import depends on."""

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.models.efficientnet import ConvBNAct, MBConv, SqueezeExcite

KEY = jax.random.PRNGKey(0)


def test_depthwise_conv_bn_parity():
    import torch
    import torch.nn as tnn

    c = 8
    mod = ConvBNAct(c, kernel=3, stride=2, groups=c)
    x = np.random.RandomState(0).randn(2, 16, 16, c).astype(np.float32)
    variables = mod.init(KEY, jnp.asarray(x), False)

    tconv = tnn.Conv2d(c, c, 3, stride=2, padding=1, groups=c, bias=False)
    tbn = tnn.BatchNorm2d(c, eps=1e-5)
    # copy weights: flax depthwise kernel [kh, kw, 1, c] <- torch [c,1,kh,kw]
    k = np.asarray(variables["params"]["conv"]["kernel"])
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(k, (3, 2, 0, 1))))
        tbn.weight.copy_(torch.from_numpy(
            np.asarray(variables["params"]["bn"]["scale"])))
        tbn.bias.copy_(torch.from_numpy(
            np.asarray(variables["params"]["bn"]["bias"])))
        rm = np.random.RandomState(1).randn(c).astype(np.float32)
        rv = np.random.RandomState(2).rand(c).astype(np.float32) + 0.5
        tbn.running_mean.copy_(torch.from_numpy(rm))
        tbn.running_var.copy_(torch.from_numpy(rv))
    variables = {"params": variables["params"],
                 "batch_stats": {"bn": {"mean": jnp.asarray(rm),
                                        "var": jnp.asarray(rv)}}}
    tref = tnn.Sequential(tconv, tbn, tnn.SiLU()).eval()
    with torch.no_grad():
        ref = tref(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    out = mod.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_squeeze_excite_parity():
    import torch
    import torch.nn as tnn

    c, sq = 8, 2
    mod = SqueezeExcite(sq)
    x = np.random.RandomState(0).randn(2, 6, 6, c).astype(np.float32)
    variables = mod.init(KEY, jnp.asarray(x))

    fc1 = tnn.Conv2d(c, sq, 1)
    fc2 = tnn.Conv2d(sq, c, 1)
    p = variables["params"]
    with torch.no_grad():
        fc1.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p["fc1"]["kernel"]), (3, 2, 0, 1))))
        fc1.bias.copy_(torch.from_numpy(np.asarray(p["fc1"]["bias"])))
        fc2.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(p["fc2"]["kernel"]), (3, 2, 0, 1))))
        fc2.bias.copy_(torch.from_numpy(np.asarray(p["fc2"]["bias"])))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        s = xt.mean((2, 3), keepdim=True)
        ref = (xt * torch.sigmoid(fc2(torch.nn.functional.silu(fc1(s))))) \
            .permute(0, 2, 3, 1).numpy()
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
