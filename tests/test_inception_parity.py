"""Numerical parity of models/inception.py against a torch build of the
FID InceptionV3 (torchvision inception_v3 topology with the pytorch_fid
pool patches: avg branch-pools with count_include_pad=False and a max
branch-pool in the last block — `evaluation/pytorch_fid/inception.py:224-338`).

torchvision is not installed here, so the golden is assembled from plain
torch.nn with torchvision-compatible attribute names; the exported state
dict therefore has the exact key layout of the published FID weights,
which also exercises `tools.torch_import.inception_from_torch` end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402


class CBA(nn.Module):
    """conv+bn+relu with torchvision's `.conv`/`.bn` child names."""

    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class BlockA(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = CBA(cin, 64, 1)
        self.branch5x5_1 = CBA(cin, 48, 1)
        self.branch5x5_2 = CBA(48, 64, 5, p=2)
        self.branch3x3dbl_1 = CBA(cin, 64, 1)
        self.branch3x3dbl_2 = CBA(64, 96, 3, p=1)
        self.branch3x3dbl_3 = CBA(96, 96, 3, p=1)
        self.branch_pool = CBA(cin, pool, 1)

    def forward(self, x):
        d = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x),
                          self.branch5x5_2(self.branch5x5_1(x)), d,
                          self.branch_pool(_avg3(x))], 1)


class BlockB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = CBA(cin, 384, 3, s=2)
        self.branch3x3dbl_1 = CBA(cin, 64, 1)
        self.branch3x3dbl_2 = CBA(64, 96, 3, p=1)
        self.branch3x3dbl_3 = CBA(96, 96, 3, s=2)

    def forward(self, x):
        d = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), d, F.max_pool2d(x, 3, 2)], 1)


class BlockC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = CBA(cin, 192, 1)
        self.branch7x7_1 = CBA(cin, c7, 1)
        self.branch7x7_2 = CBA(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7_3 = CBA(c7, 192, (7, 1), p=(3, 0))
        self.branch7x7dbl_1 = CBA(cin, c7, 1)
        self.branch7x7dbl_2 = CBA(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_3 = CBA(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7dbl_4 = CBA(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_5 = CBA(c7, 192, (1, 7), p=(0, 3))
        self.branch_pool = CBA(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        d = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, d,
                          self.branch_pool(_avg3(x))], 1)


class BlockD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = CBA(cin, 192, 1)
        self.branch3x3_2 = CBA(192, 320, 3, s=2)
        self.branch7x7x3_1 = CBA(cin, 192, 1)
        self.branch7x7x3_2 = CBA(192, 192, (1, 7), p=(0, 3))
        self.branch7x7x3_3 = CBA(192, 192, (7, 1), p=(3, 0))
        self.branch7x7x3_4 = CBA(192, 192, 3, s=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class BlockE(nn.Module):
    def __init__(self, cin, max_pool=False):
        super().__init__()
        self.max_pool = max_pool
        self.branch1x1 = CBA(cin, 320, 1)
        self.branch3x3_1 = CBA(cin, 384, 1)
        self.branch3x3_2a = CBA(384, 384, (1, 3), p=(0, 1))
        self.branch3x3_2b = CBA(384, 384, (3, 1), p=(1, 0))
        self.branch3x3dbl_1 = CBA(cin, 448, 1)
        self.branch3x3dbl_2 = CBA(448, 384, 3, p=1)
        self.branch3x3dbl_3a = CBA(384, 384, (1, 3), p=(0, 1))
        self.branch3x3dbl_3b = CBA(384, 384, (3, 1), p=(1, 0))
        self.branch_pool = CBA(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        d = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        d = torch.cat([self.branch3x3dbl_3a(d), self.branch3x3dbl_3b(d)], 1)
        pool = (F.max_pool2d(x, 3, 1, 1) if self.max_pool else _avg3(x))
        return torch.cat([self.branch1x1(x), b3, d,
                          self.branch_pool(pool)], 1)


class TorchFIDInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = CBA(3, 32, 3, s=2)
        self.Conv2d_2a_3x3 = CBA(32, 32, 3)
        self.Conv2d_2b_3x3 = CBA(32, 64, 3, p=1)
        self.Conv2d_3b_1x1 = CBA(64, 80, 1)
        self.Conv2d_4a_3x3 = CBA(80, 192, 3)
        self.Mixed_5b = BlockA(192, 32)
        self.Mixed_5c = BlockA(256, 64)
        self.Mixed_5d = BlockA(288, 64)
        self.Mixed_6a = BlockB(288)
        self.Mixed_6b = BlockC(768, 128)
        self.Mixed_6c = BlockC(768, 160)
        self.Mixed_6d = BlockC(768, 160)
        self.Mixed_6e = BlockC(768, 192)
        self.Mixed_7a = BlockD(768)
        self.Mixed_7b = BlockE(1280)
        self.Mixed_7c = BlockE(2048, max_pool=True)
        self.fc = nn.Linear(2048, 1008)   # unused head, key-layout parity

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))   # pool3 features


def test_inception_pool3_parity():
    from aqualora_tpu.models.inception import InceptionV3Features
    from aqualora_tpu.tools.torch_import import inception_from_torch

    torch.manual_seed(0)
    m = TorchFIDInception().eval()
    # non-trivial BN statistics
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.add_(0.05 * torch.randn_like(
                    mod.running_mean))
                mod.running_var.mul_(torch.rand_like(
                    mod.running_var) * 0.5 + 0.75)
                mod.weight.add_(0.1 * torch.randn_like(mod.weight))
                mod.bias.add_(0.1 * torch.randn_like(mod.bias))

    x = (np.random.RandomState(0).rand(1, 299, 299, 3)
         .astype(np.float32) * 2 - 1)           # FID input range [-1, 1]
    with torch.no_grad():
        ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    variables = inception_from_torch(state)
    out = InceptionV3Features().apply(variables, jnp.asarray(x),
                                      mutable=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4,
                               err_msg="FID pool3 features diverge")
