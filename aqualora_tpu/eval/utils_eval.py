"""Evaluation/serving utilities: simple_sample, simple_decode, FPR math.

TPU-native equivalents of `evaluation/utils_eval.py`:
  - `simple_sample` (`:37-127`): batched text->image with any of the
    11 samplers by name, optional watermark LoRA fused into the params,
    per-prompt seeds, PNG save.  Here the whole generation is one jitted
    program (CLIP + denoise loop + VAE decode).
  - `simple_decode` (`:156-213`): batch bit extraction; detection
    threshold tau from the binomial tail at a target FPR (`:131-140`),
    per-image argmax bits, bit accuracy + TPR.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.core import io
from aqualora_tpu.core.checkpoint import load_pytree
from aqualora_tpu.core.config import EfficientNetConfig, PipelineConfig
from aqualora_tpu.core.tokenizer import load_tokenizer
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.diffusion.samplers import key_stack
from aqualora_tpu.models.watermark import SecretDecoder
from aqualora_tpu.train.ppft_train import _load_sd_checkpoint

SAMPLER_NAMES = ("ddim", "euler", "heun", "lms", "pndm", "dpms_s",
                 "dpms_sde", "dpms_m", "kdpm2", "kdpm2a", "unipc")


# ---------------------------------------------------------------------------
# detection math (utils_eval.py:131-140)
# ---------------------------------------------------------------------------

def calculate_fpr(tau: int, k: int) -> float:
    """P[#matching bits > tau] for a random message: binomial tail / 2^k."""
    total = sum(math.comb(k, i) for i in range(tau + 1, k + 1))
    return total / (2 ** k)


def get_threshold(k: int, fpr: float) -> int:
    tau = 0
    while calculate_fpr(tau, k) > fpr:
        tau += 1
    return tau


# ---------------------------------------------------------------------------
# generation (utils_eval.py:37-127)
# ---------------------------------------------------------------------------

def resolve_watermark_lora(train_folder: Optional[str],
                           lora_path: Optional[str],
                           lora_scale: float,
                           msg_gt: Optional[str], msg_bits: int,
                           hidinfo: Optional[str] = None,
                           rng=None) -> Tuple[Optional[str], Dict]:
    """The two reference entries for watermarked eval generation:

    - `train_folder`: fold a message internally via create_wm_lora (our
      one-command runners).
    - `lora_path`: a PRE-folded LoRA safetensors file — the reference's
      two-step flow (`scripts/create_wm_lora.py` then
      `evaluation/run_eval_base.py --lora ... --msg_gt ...`); `msg_gt`
      carries the bits that file embeds.  `lora_scale` multiplies the
      LoRA delta exactly (the delta is linear in the `up` weights —
      fuse_lora(scale) equivalent, `evaluation/utils_eval.py:80-82`).

    Returns (bitstring_or_None, folded lora dict)."""
    if (train_folder is None) == (lora_path is None):
        raise SystemExit("pass exactly one of --train_folder (fold a "
                         "message internally) or --lora (pre-folded "
                         "safetensors from create_wm_lora)")
    if train_folder and (lora_scale != 1.0 or msg_gt is not None):
        # --lora_scale/--msg_gt only make sense with a pre-folded file;
        # the train_folder path folds its own message at the reference
        # strength (1.03) — silently ignoring them would let a
        # --lora_scale sweep return bit-identical results
        raise SystemExit("--lora_scale/--msg_gt apply to the pre-folded "
                         "--lora flow only; with --train_folder use "
                         "--hidinfo to choose the embedded message")
    if lora_path:
        if hidinfo is not None:
            # symmetric guard: the message is already baked into a
            # pre-folded file — accepting --hidinfo here would silently
            # score against bits that were never embedded
            raise SystemExit("--hidinfo selects the message the "
                             "--train_folder flow folds; with a "
                             "pre-folded --lora file pass the embedded "
                             "bits as --msg_gt instead")
        state = dict(io.load_safetensors(lora_path))
        if lora_scale != 1.0:
            if not any("up.weight" in k for k in state):
                raise SystemExit(
                    f"--lora_scale {lora_scale} matched no '*up.weight' "
                    f"tensors in {lora_path} — unrecognized LoRA key "
                    "layout; convert to the diffusers layout "
                    "(tools/lora_layouts.py) first")
            state = {k: (np.asarray(v) * lora_scale
                         if "up.weight" in k else v)
                     for k, v in state.items()}
        return msg_gt, state
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora
    return create_watermark_lora(
        train_folder, scale=1.03, msg_bits=msg_bits, hidinfo=hidinfo,
        save=False, rng=rng if rng is not None
        else np.random.default_rng(0))


def square_resolution(args) -> None:
    """Map the reference's --height/--width onto our --resolution (the
    protocol is square; reject non-square rather than silently crop)."""
    h = getattr(args, "height", None)
    w = getattr(args, "width", None)
    if h or w:
        h, w = h or w, w or h
        if h != w:
            raise SystemExit(f"--height {h} != --width {w}: non-square "
                             "generation is not part of the eval "
                             "protocol (512x512)")
        args.resolution = h


def _to_uint8_device(x):
    # ROUND like the reference's saved-image path (diffusers numpy_to_pil
    # `(images*255).round()` — what run_eval/FID PNGs go through); the
    # reference's own torch_to_pil truncates, but eval-image parity
    # follows the pipeline output
    return jnp.clip(jnp.round((x.astype(jnp.float32) + 1.0) * 127.5),
                    0, 255).astype(jnp.uint8)


_to_uint8_jit = None


def images_to_pil(images):
    """[-1,1] NHWC -> list of PIL images (utils/misc.py:8-21).

    Device arrays are quantized to uint8 ON DEVICE before the host fetch
    — 2x (bf16) / 4x (f32) less device->host traffic per image batch."""
    from PIL import Image
    if isinstance(images, jax.Array):
        global _to_uint8_jit
        if _to_uint8_jit is None:
            _to_uint8_jit = jax.jit(_to_uint8_device)
        arr = np.asarray(jax.device_get(_to_uint8_jit(images)))
    else:
        arr = (((np.asarray(images) + 1) * 127.5).round()
               .clip(0, 255).astype(np.uint8))
    return [Image.fromarray(a) for a in arr]


def simple_sample(model_path: Optional[str], sampler: str,
                  prompts: Sequence[str],
                  lora: Optional[Dict[str, np.ndarray]] = None,
                  seeds: Optional[Sequence[int]] = None,
                  output_dir: Optional[str] = None,
                  num_inference_steps: int = 25,
                  guidance_scale: float = 7.5,
                  batch_size: int = 4, resolution: int = 512,
                  negative_prompt: str = "",
                  config: Optional[PipelineConfig] = None,
                  params: Optional[Dict] = None,
                  tokenizer_vocab: Optional[str] = None,
                  dtype=None, int8=False,
                  messages: Optional[Sequence[str]] = None,
                  train_folder: Optional[str] = None,
                  message_scale: float = 1.03):
    """Generate len(prompts) x len(seeds) images; returns PIL list.

    `lora`: a *folded* (message-carrying) LoRA state dict from
    create_wm_lora — imported into the U-Net params and activated at
    float scale 1.0, the fuse_lora equivalent (`utils_eval.py:80-82`).
    `int8`: EXPERIMENTAL w8a8 serving (ops/quant.py).  False/True or a
    mode string: "conv" (int8 resnet/resample convs only — the measured
    sweet spot, +9.4% on v5e; True maps here), "dense" (LoRA-site
    matmuls only, measured -2.4%), "all" (both, +6.5%).  Keep off until
    bit accuracy is validated on real released weights
    (scripts/golden_gate.py --int8 measures bf16<->int8 decode
    agreement).
    `messages` + `train_folder`: per-image watermarks in ONE batch.
    Loads the UNfolded trained LoRA + mapper from `train_folder`
    (README.md:46-51 layout) and threads `mapper(msg_i) * message_scale`
    as the per-sample [B, rank] diagonal scale — prompt i carries
    message i.  Numerically identical to folding each message with
    create_wm_lora (`scripts/create_wm_lora.py:26-37`: the diag commutes
    from the down weights to the activations), but one program serves N
    distinct watermarks per batch where the reference builds N folded
    LoRAs and N pipelines (`run_gradio_demo.py:10-29`).  Mutually
    exclusive with `lora`.
    """
    if sampler not in SAMPLER_NAMES:
        raise ValueError(f"unknown sampler {sampler}; have {SAMPLER_NAMES}")
    lora_unfolded = mapper_emb = None
    if messages is not None:
        if lora is not None:
            raise ValueError("pass either a folded `lora` or per-image "
                             "`messages` + `train_folder`, not both")
        if train_folder is None:
            raise ValueError("`messages` needs `train_folder` (unfolded "
                             "LoRA + mapper, README.md:46-51 layout)")
        if len(messages) != len(prompts):
            raise ValueError(f"{len(messages)} messages for "
                             f"{len(prompts)} prompts")
        from aqualora_tpu.tools.create_wm_lora import load_mapper_state
        lora_unfolded = io.load_safetensors(os.path.join(
            train_folder, "pytorch_lora_weights.safetensors"))
        mapper_state = load_mapper_state(train_folder)
        mapper_emb = np.asarray(mapper_state["bit_embeddings.weight"],
                                np.float32)
    if config is None:
        config = PipelineConfig.sd15(
            lora_rank=_infer_rank(lora if lora is not None
                                  else lora_unfolded))
    cfg = config
    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    pipe = StableDiffusionPipeline(cfg, dtype=dtype)
    if params is None:
        params = pipe.init_params(jax.random.PRNGKey(0), height=resolution,
                                  width=resolution)
        if model_path:
            params = _load_sd_checkpoint(model_path, params)
    diag_all = None
    if lora is not None:
        params = dict(params)
        params["unet"] = io.import_lora_safetensors(params["unet"], cfg.unet,
                                                    lora)
        # single-message serving: fold the (already message-folded) LoRA
        # into the base kernels at unit diag and run the plain U-Net —
        # the reference fuses too (pipe.fuse_lora, utils_eval.py:81-82)
        # and folding measures ~15% faster than per-step LoRA
        # (docs/PERFORMANCE.md); fold == runtime tested (tests/test_fold)
        from aqualora_tpu.models.lora import fold_lora_tree, strip_lora_params
        params["unet"] = strip_lora_params(fold_lora_tree(
            params["unet"], jnp.ones((cfg.unet.lora.rank,), jnp.float32),
            alpha_scale=cfg.unet.lora.alpha_scale))
        lora_scale = None
    elif lora_unfolded is not None:
        params = dict(params)
        params["unet"] = io.import_lora_safetensors(params["unet"], cfg.unet,
                                                    lora_unfolded)
        bad = [m for m in messages
               if len(m) != mapper_emb.shape[0] or set(m) - {"0", "1"}]
        if bad:
            raise ValueError(f"messages must be {mapper_emb.shape[0]}-char "
                             f"bitstrings; got {bad[:3]}")
        from aqualora_tpu.tools.create_wm_lora import mapper_diag_from_state
        bits = np.array([[int(c) for c in m] for m in messages], np.float32)
        # the fold path's mapper forward x inference scale -> [N, rank]
        diag_all = mapper_diag_from_state(mapper_state, bits) * message_scale
        lora_scale = None
    else:
        lora_scale = None
    if int8:
        from functools import partial

        from aqualora_tpu.ops.quant import (quantize_unet_params_int8,
                                            quantize_vae_decoder_params_int8)
        tokens = {"conv"} if int8 is True else set(str(int8).split("+"))
        if not tokens <= {"conv", "dense", "all", "vae"}:
            raise ValueError(f"int8 mode {int8!r}; want "
                             "conv|dense|all[+vae]|vae")
        params = dict(params)
        if tokens & {"conv", "dense", "all"}:
            params["unet"] = jax.jit(partial(
                quantize_unet_params_int8,
                include_convs=tokens & {"conv", "all"} != set(),
                include_dense=tokens & {"dense", "all"} != set()))(
                    params["unet"])
        if "vae" in tokens:
            params["vae"] = jax.jit(quantize_vae_decoder_params_int8)(
                params["vae"])

    tok = load_tokenizer(tokenizer_vocab, vocab_size=cfg.clip.vocab_size)
    gen = pipe.make_generate(num_inference_steps, sampler, resolution,
                             resolution)
    seeds = list(seeds) if seeds is not None else [0]

    # mesh-aware: on a multi-chip host shard the generation batch over a
    # data mesh (same pattern as bench.py; GSPMD does the rest).  On one
    # device this is a no-op.  The reference's eval is single-GPU
    # (evaluation/run_eval_base.py has no accelerate/DDP).
    from aqualora_tpu.core import sharding as sh
    mesh = sh.data_mesh_or_none(batch_size)
    if mesh is not None:
        params = sh.replicate(mesh, params)
    else:
        # put the weight tree on device ONCE: host-numpy leaves (checkpoint
        # /LoRA imports) passed as jit args re-upload per call — the
        # measured 50x serving regression (CLAUDE.md environment rules)
        params = jax.device_put(params)

    out_images = []
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    for seed in seeds:
        base = jax.random.PRNGKey(seed)
        for i in range(0, len(prompts), batch_size):
            chunk = list(prompts[i:i + batch_size])
            pad = batch_size - len(chunk)
            ids = jnp.asarray(tok(chunk + [""] * pad))
            neg = jnp.asarray(tok([negative_prompt] * batch_size))
            if diag_all is not None:
                rows = diag_all[i:i + batch_size]
                if pad:
                    rows = np.concatenate(
                        [rows, np.repeat(rows[-1:], pad, 0)], 0)
                scale = jnp.asarray(rows)
            elif lora_scale is not None:
                scale = jnp.asarray(np.repeat(lora_scale, batch_size, 0))
            else:
                scale = None
            # per-image key stack: image j always samples from
            # fold_in(PRNGKey(seed), j) regardless of batch_size, so the
            # eval protocol is invariant to chunking (matches diffusers'
            # per-image generator list, `evaluation/utils_eval.py:118-121`)
            keys = key_stack(base, i, batch_size)
            if mesh is not None:
                ids, neg, keys = sh.shard_batch(mesh, (ids, neg, keys))
                if scale is not None:
                    scale = sh.shard_batch(mesh, scale)
            imgs = gen(params, ids, neg, keys, guidance_scale, scale)
            pils = images_to_pil(imgs)[: len(chunk)]
            out_images.extend(pils)
            if output_dir:
                for j, img in enumerate(pils):
                    img.save(os.path.join(output_dir, f"{seed}_{i + j}.png"))
    return out_images


def _infer_rank(lora: Optional[Dict[str, np.ndarray]]) -> int:
    if not lora:
        return 320
    for k, v in lora.items():
        if "down.weight" in k:
            return int(np.asarray(v).shape[0])
    return 320


# ---------------------------------------------------------------------------
# decoding (utils_eval.py:156-213)
# ---------------------------------------------------------------------------

def load_msgdecoder(msgdecoder_path: str, bitnum: int,
                    backbone: Optional[EfficientNetConfig] = None):
    """Load our orbax msgdecoder artifact. Returns (module, variables)."""
    dec = SecretDecoder(bitnum, backbone or EfficientNetConfig.b1())
    dummy = jnp.zeros((1, 64, 64, 3))
    tmpl_vars = dec.init(jax.random.PRNGKey(0), dummy)
    tmpl = {"params": tmpl_vars["params"],
            "batch_stats": tmpl_vars.get("batch_stats", {})}
    variables = load_pytree(msgdecoder_path, tmpl)
    return dec, variables


def simple_decode(bitnum: int, msgdecoder_path: str, images,
                  msg_gt: Optional[str] = None, resolution: int = 512,
                  tpr_threshold: float = 1e-3,
                  backbone: Optional[EfficientNetConfig] = None,
                  batch_size: int = 16, return_margins: bool = False):
    """images: list of PIL images or file paths. Returns
    (bit accuracy, TPR at tau(fpr), decoded bitstrings).

    `return_margins=True` appends a 4th element: float32 [N, bitnum]
    per-bit logit margins (logit_1 - logit_0; the bit is margin > 0).
    The golden gate (scripts/golden_gate.py) uses these to report the
    int8 path's *logit-space* perturbation against the decoder's
    decision margins and cross-image spread — bit agreement alone is
    vacuous for a decoder whose margins never approach zero (e.g. the
    synthetic random-weight release decoder decodes every image to the
    same string).  The reference's decode surface
    (evaluation/utils_eval.py:172-205) is bits-only; margins are a
    gate-evidence extension."""
    from PIL import Image

    if msg_gt is not None and len(msg_gt) != bitnum:
        # the reference asserts the same (utils_eval.py:200); a length
        # mismatch would silently zip-truncate the accuracy to a prefix
        raise ValueError(f"msg_gt has {len(msg_gt)} bits, decoder "
                         f"extracts {bitnum}")
    dec, variables = load_msgdecoder(msgdecoder_path, bitnum, backbone)
    tau = get_threshold(bitnum, tpr_threshold) / bitnum

    # mesh-aware decode: shard the image batch over a data mesh on
    # multi-chip hosts (no-op on one device)
    from aqualora_tpu.core import sharding as sh
    mesh = sh.data_mesh_or_none(batch_size)
    if mesh is not None:
        variables = sh.replicate(mesh, variables)
    else:
        variables = jax.device_put(variables)  # upload the B1 weights once

    @jax.jit
    def decode(variables, batch):
        logits = dec.apply({"params": variables["params"],
                            "batch_stats": variables["batch_stats"]},
                           batch, False)
        # margin > 0 <=> argmax picks bit 1: one program serves both
        # the bits and (optionally) the logit-sensitivity evidence
        margin = (logits[..., 1] - logits[..., 0]).astype(jnp.float32)
        return jnp.argmax(logits, axis=-1), margin

    def process(img):
        if not isinstance(img, Image.Image):
            img = Image.open(img)
        if img.mode != "RGB":
            img = img.convert("RGB")
        img = img.resize((resolution, resolution),
                         resample=Image.Resampling.BICUBIC)
        return np.asarray(img, np.uint8).astype(np.float32) / 127.5 - 1.0

    results: List[str] = []
    accuracy: List[float] = []
    margins: List[np.ndarray] = []
    tp = fn = 0
    # the decode preprocess is PROTOCOL: always PIL bicubic
    # (evaluation/utils_eval.py:172-196).  The native C++ loader's fused
    # decode+resize is close but NOT bit-identical to PIL (different
    # bicubic boundary handling, tests/test_native_loader.py), so using
    # it here would make reported bit-accuracy/TPR depend on whether the
    # native library built on a given machine; it stays on the training
    # loader where bit-exactness is irrelevant.  (Preprocess is a trivial
    # cost next to the generation pass that produced the images.)
    arr = [process(im) for im in images]
    for i in range(0, len(arr), batch_size):
        chunk = np.stack(arr[i:i + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            # full-shape zero pad (zeros_like(chunk[:pad]) under-pads when
            # pad > len(chunk)): keeps decode on ONE static shape (no
            # per-tail retrace) and keeps the batch divisible by the mesh
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        batch = jnp.asarray(chunk)
        if mesh is not None:
            batch = sh.shard_batch(mesh, batch)
        n_real = len(arr[i:i + batch_size])
        bits_dev, marg_dev = decode(variables, batch)
        bits = np.asarray(bits_dev)[:n_real]
        if return_margins:
            margins.append(np.asarray(marg_dev)[:n_real])
        for row in bits:
            msg = "".join(map(str, row.tolist()))
            results.append(msg)
            if msg_gt is not None:
                acc = np.mean([a == b for a, b in zip(msg, msg_gt)])
                accuracy.append(acc)
                # reference-faithful decision rule (utils_eval.py:203):
                # acc >= tau/k with tau calibrated on P[X > tau] <= fpr —
                # i.e. the realized FPR is P[X >= tau], one bit looser
                # than the target.  Protocol-defining; kept as-is.
                if acc >= tau:
                    tp += 1
                else:
                    fn += 1
    bitacc = float(np.mean(accuracy)) if accuracy else float("nan")
    tpr = tp / max(1, tp + fn) if msg_gt is not None else float("nan")
    if msg_gt is not None:
        print(f"bit accuracy: {bitacc}")
        print(f"TPR: {tpr}")
    if return_margins:
        marg = (np.concatenate(margins, axis=0) if margins
                else np.zeros((0, bitnum), np.float32))
        return bitacc, tpr, results, marg
    return bitacc, tpr, results
