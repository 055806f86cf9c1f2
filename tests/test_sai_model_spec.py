"""SAI modelspec parity: our torch-free builder vs the reference's
`scripts/lib/sai_model_spec.py` executed directly (pure stdlib +
safetensors/torch, both installed)."""

import importlib.util
import os

import numpy as np
import pytest

from aqualora_tpu.tools import sai_model_spec as ours

_REF = "/root/reference/scripts/lib/sai_model_spec.py"

needs_ref = pytest.mark.skipif(not os.path.exists(_REF),
                               reason="reference checkout not available")


def _ref_mod():
    spec = importlib.util.spec_from_file_location("ref_sai", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_ref
@pytest.mark.parametrize("case", [
    # the merge CLI call (scripts/merge_lora.py:158-169)
    dict(v2=False, v_parameterization=False, sdxl=False, lora=False,
         textual_inversion=False, title="merged", merged_from="a, b",
         is_stable_diffusion_ckpt=True),
    dict(v2=True, v_parameterization=True, sdxl=False, lora=False,
         textual_inversion=False, title="merged-v2", merged_from="x",
         is_stable_diffusion_ckpt=True),
    # a v1 LoRA save with optional fields
    dict(v2=False, v_parameterization=False, sdxl=False, lora=True,
         textual_inversion=False, title="wm-lora", reso="512,512",
         author="someone", description="d", license="L", tags="t",
         timesteps=(0, 1000), clip_skip=2),
    # defaulted title + TI arch
    dict(v2=False, v_parameterization=False, sdxl=False, lora=False,
         textual_inversion=True),
])
def test_build_metadata_matches_reference(case):
    ref = _ref_mod()
    ts = 1700000000.5
    kwargs = dict(case)
    args = [kwargs.pop(k) for k in
            ("v2", "v_parameterization", "sdxl", "lora",
             "textual_inversion")]
    got = ours.build_metadata(None, *args, ts, **kwargs)
    want = ref.build_metadata(None, *args, ts, **kwargs)
    assert got == want


@needs_ref
def test_tensor_hash_matches_reference():
    import torch
    import safetensors.torch  # noqa: F401  (ref module assumes it is loaded)
    ref = _ref_mod()
    rng = np.random.RandomState(0)
    arrs = {"a": rng.randn(4, 5).astype(np.float32),
            "b": rng.randn(7).astype(np.float16)}
    want = ref.precalculate_safetensors_hashes(
        {k: torch.from_numpy(v) for k, v in arrs.items()})
    assert ours.precalculate_safetensors_hashes(arrs) == want


def test_merged_from_uses_embedded_titles(tmp_path):
    from aqualora_tpu.core.io import save_safetensors
    p1 = tmp_path / "base.safetensors"
    save_safetensors({"w": np.zeros(2, np.float32)}, str(p1),
                     metadata={"modelspec.title": "Base Model 1.0"})
    p2 = tmp_path / "lora_file.safetensors"
    save_safetensors({"w": np.zeros(2, np.float32)}, str(p2))
    assert (ours.build_merged_from([str(p1), str(p2)])
            == "Base Model 1.0, lora_file")
