"""Stage 1 — latent watermark pretrain (secret encoder/decoder around a
frozen VAE).

TPU-native re-implementation of `train/latent_wm_pretrain.py` with the
same CLI flags and the same training semantics:
  - per step: VAE-encode -> random msg -> SecretEncoder -> combine with
    1/4-prob cornerfy augmentation (`:133-149`) -> VAE-decode clean+wm ->
    LPIPS + PRVL + message-BCE after a random distortion (`:180-195`)
  - warmup curriculum on zero images (`fixinit`, `:158,165-167`) at
    watermark scale 0.03, msg-loss only; exits when mean msgloss < 0.1
    over 10 batches (`:197-204`)
  - loss schedule by epoch: msg -> +LPIPS (epoch>6) ->
    5*lpips + msg + 1.5*prvl (epoch>10) (`:206-214`); distortion probs
    staged at epoch 12 (`:185-188`)
  - AdamW(lr 1e-3, wd 1e-4), StepLR(2 epochs, gamma 0.8) (`:125-129`)

All staged quantities (scale, loss weights, distortion probs, fixinit)
are *traced* arguments of one jitted train step — the curriculum never
triggers a retrace.  Data parallelism: batch sharded over the mesh's data
axis, params replicated; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqualora_tpu.core.checkpoint import CheckpointManager, save_pytree
from aqualora_tpu.core.config import (EfficientNetConfig, VAEConfig,
                                      WatermarkConfig)
from aqualora_tpu.core import sharding as sh
from aqualora_tpu.distort.noiser import Noiser
from aqualora_tpu.models.lpips import LPIPS
from aqualora_tpu.models.vae import AutoencoderKL
from aqualora_tpu.models.watermark import SecretDecoder, SecretEncoder
from aqualora_tpu.train import data as data_lib
from aqualora_tpu.train.augment import base_augment, maybe_cornerfy
from aqualora_tpu.train.losses import bit_accuracy, message_bce, prvl_loss


@dataclasses.dataclass
class Stage1Models:
    vae: AutoencoderKL
    sec_encoder: SecretEncoder
    sec_decoder: SecretDecoder
    lpips: LPIPS
    noiser: Noiser


def build_models(vae_cfg: VAEConfig, wm_cfg: WatermarkConfig,
                 backbone: EfficientNetConfig | None = None,
                 dtype=jnp.float32) -> Stage1Models:
    """dtype: compute dtype; bf16 halves the activation memory of the two
    VAE decodes in the backward (the stage-1 memory binder — the reference
    assumes a 40 GB GPU, train/README.md:3)."""
    latent_res = 512 // vae_cfg.downscale
    return Stage1Models(
        vae=AutoencoderKL(vae_cfg, dtype=dtype),
        sec_encoder=SecretEncoder(wm_cfg.msg_bits, wm_cfg.secret_grid,
                                  latent_res, vae_cfg.latent_channels,
                                  dtype=dtype),
        sec_decoder=SecretDecoder(wm_cfg.msg_bits, backbone, dtype=dtype),
        lpips=LPIPS(dtype=dtype),
        noiser=Noiser(),
    )


def make_train_step(models: Stage1Models, optimizer, msg_bits: int,
                    remat_vae_decode: bool = False,
                    remat_lpips: bool = False):
    """One jitted step. Trainable: sec_encoder + sec_decoder
    (latent_wm_pretrain.py:125-128); VAE and LPIPS frozen.

    remat_vae_decode: jax.checkpoint ONLY the watermarked VAE decode — the
    single biggest activation block in the backward (decoder upsampling at
    512²) — instead of whole-step remat (the measured 6x pathology,
    docs/PERFORMANCE.md).  Enables larger stage-1 batches."""

    def loss_fn(params, batch_stats, frozen, images, key, ctl):
        kvae, kmsg, kcorner, kdist, kdrop = jax.random.split(key, 5)
        latents = jax.lax.stop_gradient(
            models.vae.apply({"params": frozen["vae"]}, images, kvae,
                             method="sample"))
        msg = jax.random.bernoulli(kmsg, 0.5,
                                   (images.shape[0], msg_bits)).astype(jnp.float32)
        _, wm_latent = models.sec_encoder.apply(
            {"params": params["sec_encoder"]}, latents, msg)
        wm_latent = maybe_cornerfy(kcorner, wm_latent)
        wm_latents = latents + wm_latent * ctl["wm_scale"]

        decode = lambda z: models.vae.apply({"params": frozen["vae"]}, z,
                                            method="decode")
        clean = jax.lax.stop_gradient(decode(latents))
        wm_decode = jax.checkpoint(decode) if remat_vae_decode else decode
        wm_img = wm_decode(wm_latents)

        lpips_fn = lambda a, b: models.lpips.apply(
            {"params": frozen["lpips"]}, a, b).mean()
        if remat_lpips:   # VGG activations are ~0.3 GB/image at 512^2
            lpips_fn = jax.checkpoint(lpips_fn)
        lp = lpips_fn(clean, wm_img)
        pr = prvl_loss(clean, wm_img)
        noised = models.noiser(kdist, wm_img, ctl["distort_probs"])
        logits, updates = models.sec_decoder.apply(
            {"params": params["sec_decoder"], "batch_stats": batch_stats},
            noised, True, mutable=["batch_stats"], rngs={"dropout": kdrop})
        msgloss = message_bce(logits, msg)
        w = ctl["loss_weights"]      # [w_lpips, w_msg, w_prvl]
        loss = w[0] * lp + w[1] * msgloss + w[2] * pr
        metrics = {"loss": loss, "lpips_loss": lp, "msgloss": msgloss,
                   "prvl_loss": pr, "acc": bit_accuracy(logits, msg)}
        return loss, (updates["batch_stats"], metrics)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, frozen, images, key, ctl):
        images = jnp.where(ctl["fixinit"], jnp.zeros_like(images), images)
        kaug, key = jax.random.split(key)
        # --random_aug gate (latent_wm_pretrain.py:74-75)
        images = jnp.where(ctl["random_aug"], base_augment(kaug, images),
                           images)
        (_, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, frozen, images,
                                   key, ctl)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, metrics

    return train_step


def make_eval_step(models: Stage1Models, msg_bits: int):
    @jax.jit
    def eval_step(params, batch_stats, frozen, images, key):
        kvae, kmsg = jax.random.split(key)
        latents = models.vae.apply({"params": frozen["vae"]}, images, kvae,
                                   method="sample")
        msg = jax.random.bernoulli(kmsg, 0.5,
                                   (images.shape[0], msg_bits)).astype(jnp.float32)
        wm_latents, _ = models.sec_encoder.apply(
            {"params": params["sec_encoder"]}, latents, msg)
        wm_img = models.vae.apply({"params": frozen["vae"]}, wm_latents,
                                  method="decode")
        logits = models.sec_decoder.apply(
            {"params": params["sec_decoder"], "batch_stats": batch_stats},
            wm_img, False)
        return bit_accuracy(logits, msg)

    return eval_step


def run(args: argparse.Namespace) -> Dict[str, Any]:
    tiny = getattr(args, "tiny", False)
    vae_cfg = VAEConfig.tiny() if tiny else VAEConfig.sd15()
    wm_cfg = (WatermarkConfig.tiny() if tiny
              else WatermarkConfig(msg_bits=args.bit_num))
    backbone = EfficientNetConfig.tiny() if tiny else EfficientNetConfig.b1()
    resolution = 64 if tiny else 512
    dtype = (jnp.bfloat16 if getattr(args, "mixed_precision", "no") == "bf16"
             else jnp.float32)
    models = build_models(vae_cfg, wm_cfg, backbone, dtype=dtype)

    key = jax.random.PRNGKey(args.seed)
    kv, ke, kd, kl, key = jax.random.split(key, 5)
    dummy_img = jnp.zeros((1, resolution, resolution, 3))
    dummy_lat = jnp.zeros((1, resolution // vae_cfg.downscale,
                           resolution // vae_cfg.downscale,
                           vae_cfg.latent_channels))
    dummy_msg = jnp.zeros((1, wm_cfg.msg_bits))

    frozen = {
        "vae": models.vae.init(kv, dummy_img, kv)["params"],
        "lpips": models.lpips.init(kl, dummy_img, dummy_img)["params"],
    }
    if args.pretrained_model_name_or_path:
        frozen["vae"] = _load_vae_params(args.pretrained_model_name_or_path,
                                         frozen["vae"])
    dec_vars = models.sec_decoder.init(kd, dummy_img)
    params = {
        "sec_encoder": models.sec_encoder.init(ke, dummy_lat,
                                               dummy_msg)["params"],
        "sec_decoder": dec_vars["params"],
    }
    batch_stats = dec_vars.get("batch_stats", {})

    dataset = data_lib.make_dataset(args.dataset, resolution)
    # batches() shards each epoch per host, so the StepLR epoch counter
    # must count per-host steps (ppft/rob divide by process_count too)
    steps_per_epoch = max(1, len(dataset) //
                          (args.batch_size * jax.process_count()))

    # StepLR(step_size=2 epochs, gamma=0.8) on AdamW(lr, wd=1e-4)
    def lr_fn(step):
        epoch = step // steps_per_epoch
        return args.lr * (0.8 ** (epoch // 2))

    optimizer = optax.adamw(lr_fn, weight_decay=1e-4)
    opt_state = optimizer.init(params)

    train_step = make_train_step(
        models, optimizer, wm_cfg.msg_bits,
        remat_vae_decode=getattr(args, "remat_vae_decode", False),
        remat_lpips=getattr(args, "remat_lpips", False))
    eval_step = make_eval_step(models, wm_cfg.msg_bits)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"))
    start_epoch = 0
    if args.resume_from_ckpt is not None:
        state = ckpt.restore({"params": params, "batch_stats": batch_stats,
                              "opt_state": opt_state, "epoch": 0})
        params, batch_stats = state["params"], state["batch_stats"]
        opt_state, start_epoch = state["opt_state"], int(state["epoch"]) + 1

    # replicate/shard over the mesh (DP over ICI).  device_put up front:
    # host-numpy leaves (checkpoint loads) would otherwise be re-uploaded
    # through the tunnel on EVERY step (measured 47x in bench_stage3).
    mesh = sh.make_data_mesh(args.batch_size)
    params = sh.replicate(mesh, params)
    batch_stats = sh.replicate(mesh, batch_stats)
    if getattr(args, "fsdp", False) and mesh.shape[sh.DATA_AXIS] > 1:
        # ZeRO-1/weight-FSDP over the data axis (same policy as PPFT's
        # --fsdp): optimizer moments + the frozen VAE/LPIPS towers live
        # sharded; GSPMD all-gathers each layer at its use point.  The
        # trainable encoder/decoder stay replicated (small, and the
        # checkpoint path reads them whole).
        opt_state = sh.shard_fsdp(mesh, opt_state)
        frozen = sh.shard_fsdp(mesh, frozen)
    else:
        opt_state = sh.replicate(mesh, opt_state)
        frozen = sh.replicate(mesh, frozen)

    from aqualora_tpu.utils.logging import Tracker
    tracker = Tracker(args.output_dir, getattr(args, "report_to",
                                               "tensorboard"))

    warmup = bool(args.warmup) and args.resume_from_ckpt is None
    fixinit = bool(args.fixinit) and warmup
    msgloss_buf: list = []
    history = []
    step = 0
    max_steps = getattr(args, "max_train_steps", None)
    t0 = time.time()
    acc = float("nan")          # stays NaN if no epoch completes
    images = None               # last trained batch (epoch-end eval/dump)

    for epoch in range(start_epoch, start_epoch + args.epochs):
        it = data_lib.prefetch(dataset.batches(
            args.batch_size, seed=args.seed + epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(), epochs=1))
        for images, _ in it:
            # staged loss weights (latent_wm_pretrain.py:206-214)
            rel = epoch - start_epoch
            resumed = args.resume_from_ckpt is not None
            if warmup:
                weights = (0.0, 1.0, 0.0)
            elif rel > 10 or resumed:
                weights = (5.0, 1.0, 1.5)
            elif rel > 6:
                weights = (1.0, 1.0, 0.0)
            else:
                weights = (0.0, 1.0, 0.0)
            probs = ((0.4, 0.1, 0.2, 0.05, 0.1, 0.15)
                     if (rel > 12 or resumed) else
                     (0.6, 0.0, 0.4, 0.0, 0.0, 0.0))
            ctl = {"wm_scale": jnp.float32(0.03 if warmup else 1.0),
                   "loss_weights": jnp.asarray(weights),
                   "distort_probs": jnp.asarray(probs),
                   "fixinit": jnp.asarray(fixinit),
                   "random_aug": jnp.asarray(bool(args.random_aug))}
            key, sub = jax.random.split(key)
            images = sh.shard_batch(mesh, jnp.asarray(images))
            params, batch_stats, opt_state, metrics = train_step(
                params, batch_stats, opt_state, frozen, images, sub, ctl)

            ml = float(metrics["msgloss"])
            msgloss_buf.append(ml)
            if len(msgloss_buf) > 10:
                msgloss_buf.pop(0)
            if warmup and len(msgloss_buf) == 10 and np.mean(msgloss_buf) < 0.1:
                warmup = False
                fixinit = False
            step += 1
            if step % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                history.append(m)
                # scalar names mirror latent_wm_pretrain.py:222-225
                tracker.log({"Loss/train": m["loss"],
                             "Loss/lpips_loss": m["lpips_loss"],
                             "Loss/prvl_loss": m["prvl_loss"],
                             "Loss/msgloss": m["msgloss"]}, step)
                print(f"epoch {epoch} step {step}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
                      f"({(time.time()-t0)/step:.2f}s/step)", flush=True)
            if max_steps and step >= max_steps:
                break
        # per-epoch eval + sample image + checkpoint
        # (latent_wm_pretrain.py:227-249)
        if images is None:
            raise RuntimeError(
                f"epoch {epoch} yielded no batches: host shard of "
                f"{len(dataset)} samples is smaller than batch_size "
                f"{args.batch_size}")
        key, sub = jax.random.split(key)
        if sh.is_main_process():
            try:
                from aqualora_tpu.eval.utils_eval import images_to_pil
                img_dir = os.path.join(args.output_dir, "log_images")
                os.makedirs(img_dir, exist_ok=True)
                wm_img = _render_sample(models, params, frozen,
                                        jnp.asarray(images)[:1], sub,
                                        wm_cfg.msg_bits)
                images_to_pil(np.asarray(wm_img))[0].save(
                    os.path.join(img_dir, f"watermarked_{epoch}.png"))
            except Exception as e:          # logging must never kill training
                print(f"sample image dump failed: {e}")
        acc = float(eval_step(params, batch_stats, frozen,
                              jnp.asarray(images), sub))
        tracker.log({"Accuracy/train": acc}, epoch)
        print(f"epoch {epoch}: eval bit acc {acc:.4f}", flush=True)
        # orbax save is a cross-process collective (see ppft_train)
        ckpt.save(epoch, {"params": params, "batch_stats": batch_stats,
                          "opt_state": opt_state, "epoch": epoch})
        if max_steps and step >= max_steps:
            break

    # artifact handoff for stages 2/3 (== pretrained_latentwm.pth)
    if sh.is_main_process():
        save_pytree(os.path.join(args.output_dir, "pretrained_latentwm"),
                    {"sec_encoder": params["sec_encoder"],
                     "sec_decoder": {"params": params["sec_decoder"],
                                     "batch_stats": batch_stats}})
    ckpt.close()
    tracker.close()
    return {"params": params, "batch_stats": batch_stats,
            "history": history, "final_acc": acc}


def _render_sample(models, params, frozen, image, key, msg_bits):
    """One watermarked image for the per-epoch dump."""
    kv, km = jax.random.split(key)
    latents = models.vae.apply({"params": frozen["vae"]}, image, kv,
                               method="sample")
    msg = jax.random.bernoulli(km, 0.5, (1, msg_bits)).astype(jnp.float32)
    wm_latents, _ = models.sec_encoder.apply(
        {"params": params["sec_encoder"]}, latents, msg)
    return models.vae.apply({"params": frozen["vae"]}, wm_latents,
                            method="decode")


def _load_vae_params(path: str, template):
    """Load VAE params from a diffusers safetensors checkpoint dir."""
    from aqualora_tpu.core import io
    for sub in ("vae/diffusion_pytorch_model.safetensors",
                "diffusion_pytorch_model.safetensors", ""):
        p = os.path.join(path, sub) if sub else path
        if os.path.isfile(p):
            state = io.load_safetensors(p)
            return io.assign_into(template,
                                  io.torch_state_to_flax_params(state))
    raise FileNotFoundError(f"no VAE safetensors under {path}")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flags (latent_wm_pretrain.py:254-267)
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=5)
    p.add_argument("--bit_num", type=int, default=48)
    p.add_argument("--resume_from_ckpt", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--output_dir", default="checkpoints")
    p.add_argument("--warmup", type=lambda s: s not in ("0", "False"),
                   default=True)
    p.add_argument("--fixinit", type=lambda s: s not in ("0", "False"),
                   default=True)
    p.add_argument("--random_aug", type=lambda s: s not in ("0", "False"),
                   default=True)
    p.add_argument("--lr", type=float, default=1e-3)
    # TPU-build extras
    p.add_argument("--tiny", action="store_true", help="tiny test config")
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=1)
    p.add_argument("--report_to", type=str, default="tensorboard",
                   choices=["tensorboard", "wandb", "all", "none"])
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN)")
    p.add_argument("--remat_lpips", action="store_true",
                   help="checkpoint the LPIPS-VGG tower (with "
                        "--remat_vae_decode frees the two largest "
                        "activation blocks of the stage-1 backward)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-1/weight-FSDP: shard optimizer moments and "
                        "the frozen VAE/LPIPS towers over the data axis "
                        "(GSPMD all-gather at use). No-op on one device")
    p.add_argument("--remat_vae_decode", action="store_true",
                   help="checkpoint only the watermarked VAE decode "
                        "(frees the largest activation block; enables "
                        "larger batches)")
    p.add_argument("--mixed_precision", type=str, default="no",
                   choices=["no", "bf16"],
                   help="bf16 compute halves VAE-decode activation memory")
    return p


def main():
    args = build_argparser().parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)
    run(args)


if __name__ == "__main__":
    main()
