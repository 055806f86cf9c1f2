"""Trainer smoke coverage (tiny configs, 2 steps each): all three stages
run end-to-end, write artifacts, and honor their curriculum/config paths."""

import os

import numpy as np
import pytest


def test_stage1_curriculum_and_artifacts(tmp_path):
    from aqualora_tpu.train import latent_wm_pretrain as s1
    out = str(tmp_path / "s1")
    os.makedirs(out, exist_ok=True)
    args = s1.build_argparser().parse_args(
        ["--tiny", "--epochs", "1", "--batch_size", "2",
         "--max_train_steps", "2", "--output_dir", out, "--log_every", "1"])
    res = s1.run(args)
    assert len(res["history"]) == 2
    # warmup regime: msg-only loss => lpips weight 0
    assert res["history"][0]["lpips_loss"] == 0.0
    assert os.path.isdir(os.path.join(out, "pretrained_latentwm"))
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    assert os.path.exists(os.path.join(out, "log_images", "watermarked_0.png"))


def test_stage3_decoder_only_updates(tmp_path):
    from aqualora_tpu.train import rob_enhance_finetune as s3
    out = str(tmp_path / "s3")
    os.makedirs(out, exist_ok=True)
    args = s3.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", out, "--checkpointing_steps", "99"])
    res = s3.run(args)
    assert len(res["history"]) == 2
    assert all(np.isfinite(m["loss"]) for m in res["history"])
    assert os.path.isdir(os.path.join(out, "msgdecoder"))


def test_stage1_fsdp_smoke(tmp_path):
    """--fsdp on stage 1: frozen VAE/LPIPS + optimizer moments sharded over
    the 2-device data mesh (batch 2 on the 8-CPU conftest); the step still
    runs and losses stay finite."""
    from aqualora_tpu.train import latent_wm_pretrain as s1
    out = str(tmp_path / "s1_fsdp")
    os.makedirs(out, exist_ok=True)
    args = s1.build_argparser().parse_args(
        ["--tiny", "--epochs", "1", "--batch_size", "2", "--fsdp",
         "--max_train_steps", "2", "--output_dir", out, "--log_every", "1"])
    res = s1.run(args)
    assert len(res["history"]) == 2
    assert all(np.isfinite(m["loss"]) for m in res["history"])


def test_stage3_fsdp_smoke(tmp_path):
    """--fsdp on stage 3: the ENTIRE frozen SD stack sharded over the data
    axis; the bucketed generators all-gather layers at use and the decoder
    update still runs."""
    from aqualora_tpu.train import rob_enhance_finetune as s3
    out = str(tmp_path / "s3_fsdp")
    os.makedirs(out, exist_ok=True)
    args = s3.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--fsdp", "--output_dir", out, "--checkpointing_steps", "99"])
    res = s3.run(args)
    assert len(res["history"]) == 2
    assert all(np.isfinite(m["loss"]) for m in res["history"])


def test_ppft_fsdp_validation_smoke(tmp_path):
    """--fsdp + in-training validation: the generate+decode validation
    program must compile and run against the SHARDED frozen towers
    (GSPMD all-gathers at use) — the FSDP interaction most likely to
    silently break."""
    from aqualora_tpu.train import ppft_train
    out = str(tmp_path / "ppft_fsdp_val")
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "1", "--train_batch_size", "2",
         "--fsdp", "--output_dir", out, "--checkpointing_steps", "99",
         "--validation_steps", "1"])
    res = ppft_train.run(args)
    # validation ran if we got here without a sharding error; history
    # holds the training metrics (validation_accuracy goes to the
    # tracker/stdout only, ppft_train.py:476-478)
    assert res["history"] and np.isfinite(res["history"][0]["ppft_loss"])


def test_teacher_lora_skip_is_exact(tmp_path):
    """PPFT teacher with scale=None (LoRA skipped) computes the same loss
    as the reference-style scale=0 teacher — same step, same key."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.traverse_util as tu

    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
    from aqualora_tpu.models.watermark import SecretEncoder
    from aqualora_tpu.train.ppft_train import make_loss_fn, split_lora

    cfg = PipelineConfig.tiny()
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), height=32, width=32)
    latent_res = 32 // cfg.vae.downscale
    sec = SecretEncoder(cfg.watermark.msg_bits, cfg.watermark.secret_grid,
                        latent_res, cfg.vae.latent_channels)
    sec_params = sec.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, latent_res, latent_res, 4)),
                          jnp.zeros((1, cfg.watermark.msg_bits)))["params"]
    base_flat, lora_flat = split_lora(params["unet"])
    # non-zero LoRA up kernels so a wrong teacher would actually differ
    lora_flat = {k: v + 0.01 for k, v in lora_flat.items()}
    trainable = {"lora": tu.unflatten_dict(lora_flat),
                 "mapper": params["mapper"]}
    frozen = {"vae": params["vae"], "text_encoder": params["text_encoder"],
              "sec_encoder": sec_params}
    pixels = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, 32, 32, 3)).astype(np.float32))
    ids = jnp.ones((2, 77), jnp.int32)
    key = jax.random.PRNGKey(42)

    args = (trainable, base_flat, frozen, pixels, ids, key)
    loss_skip, _ = make_loss_fn(pipe, sec, cfg.watermark.msg_bits,
                                teacher_skip_lora=True)(*args)
    loss_zero, _ = make_loss_fn(pipe, sec, cfg.watermark.msg_bits,
                                teacher_skip_lora=False)(*args)
    np.testing.assert_allclose(float(loss_skip), float(loss_zero),
                               rtol=1e-5, atol=1e-7)


def test_cache_latents_loss_is_exact():
    """make_loss_fn(cache_latents=True) on pre-encoded moments computes
    the SAME loss as the pixel path with the same key — the VAE encoder
    is deterministic and the posterior sampling stays in-step
    (kohya-style --cache_latents; reference encodes per step,
    ppft_train.py:993)."""
    import jax
    import jax.numpy as jnp
    import flax.traverse_util as tu

    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
    from aqualora_tpu.models.watermark import SecretEncoder
    from aqualora_tpu.train.ppft_train import make_loss_fn, split_lora

    cfg = PipelineConfig.tiny()
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), height=32, width=32)
    latent_res = 32 // cfg.vae.downscale
    sec = SecretEncoder(cfg.watermark.msg_bits, cfg.watermark.secret_grid,
                        latent_res, cfg.vae.latent_channels)
    sec_params = sec.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, latent_res, latent_res, 4)),
                          jnp.zeros((1, cfg.watermark.msg_bits)))["params"]
    base_flat, lora_flat = split_lora(params["unet"])
    lora_flat = {k: v + 0.01 for k, v in lora_flat.items()}
    trainable = {"lora": tu.unflatten_dict(lora_flat),
                 "mapper": params["mapper"]}
    frozen = {"vae": params["vae"], "text_encoder": params["text_encoder"],
              "sec_encoder": sec_params}
    pixels = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, 32, 32, 3)).astype(np.float32))
    moments = jnp.concatenate(pipe.vae.apply(
        {"params": frozen["vae"]}, pixels, method="encode_moments"), axis=-1)
    ids = jnp.ones((2, 77), jnp.int32)
    key = jax.random.PRNGKey(42)

    loss_pix, _ = make_loss_fn(pipe, sec, cfg.watermark.msg_bits)(
        trainable, base_flat, frozen, pixels, ids, key)
    loss_mom, _ = make_loss_fn(pipe, sec, cfg.watermark.msg_bits,
                               cache_latents=True)(
        trainable, base_flat, frozen, moments, ids, key)
    assert float(loss_pix) > 0.0
    np.testing.assert_allclose(float(loss_mom), float(loss_pix),
                               rtol=1e-6, atol=0)


def test_ppft_cache_latents_trainer_smoke(tmp_path):
    """--cache_latents end-to-end: pre-encode pass runs, the step consumes
    moments, artifacts save; --random_flip is rejected like kohya."""
    from aqualora_tpu.train import ppft_train

    out = str(tmp_path / "ppft_cached")
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", out, "--checkpointing_steps", "99",
         "--cache_latents", "--validation_epochs", "0"])
    res = ppft_train.run(args)
    assert len(res["history"]) >= 1
    assert all(np.isfinite(m["ppft_loss"]) for m in res["history"])
    assert os.path.exists(
        os.path.join(out, "pytorch_lora_weights.safetensors"))

    import pytest as _pytest
    bad = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "1", "--train_batch_size", "2",
         "--output_dir", out, "--cache_latents", "--random_flip"])
    with _pytest.raises(ValueError, match="random_flip"):
        ppft_train.run(bad)


def test_cached_moments_dataset_shuffles_and_keeps_captions():
    from aqualora_tpu.train.data import CachedMomentsDataset, SyntheticDataset

    base = SyntheticDataset(resolution=16, size=8)
    calls = []

    def fake_encode(x):
        calls.append(x.shape)
        return np.asarray(x, np.float32)[:, ::2, ::2, :1].repeat(8, axis=-1)

    ds = CachedMomentsDataset.build(base, fake_encode, batch_size=2)
    assert len(ds) == 8 and len(calls) == 4
    b0 = list(ds.batches(2, seed=0, epochs=1))
    b1 = list(ds.batches(2, seed=0, epochs=1))
    # deterministic given the seed...
    assert all((x[0] == y[0]).all() for x, y in zip(b0, b1))
    # ...but reshuffled across epochs
    two = list(ds.batches(2, seed=0, epochs=2))
    assert not all((x[0] == y[0]).all() for x, y in zip(two[:4], two[4:]))
    assert all(len(c) == 2 for _, c in b0 if c is not None)


def test_cached_moments_dataset_covers_tail_and_small_shards():
    """build() must cache EVERY shard sample: the training iterator's
    drop-last would otherwise permanently exclude the tail (kohya caches
    all latents), and a shard smaller than batch_size cached nothing."""
    from aqualora_tpu.train.data import CachedMomentsDataset, SyntheticDataset

    calls = []

    def fake_encode(x):
        calls.append(x.shape)
        return np.asarray(x, np.float32)[:, ::2, ::2, :1].repeat(8, axis=-1)

    # 7 samples, batch 4: tail of 3 must still be cached (padded encode)
    ds = CachedMomentsDataset.build(SyntheticDataset(resolution=16, size=7),
                                    fake_encode, batch_size=4)
    assert len(ds) == 7
    assert all(s[0] == 4 for s in calls)      # one static encode shape
    # shard smaller than the batch: still cached, not an opaque crash
    ds2 = CachedMomentsDataset.build(SyntheticDataset(resolution=16, size=2),
                                     fake_encode, batch_size=4)
    assert len(ds2) == 2


def test_make_dataset_forwards_columns_and_rejects_bad_path(tmp_path):
    """--caption_column reaches the imagefolder dataset (it used to be
    stripped -> empty-prompt training), and a typo'd data dir raises
    instead of silently training on synthetic noise."""
    import json

    from PIL import Image

    from aqualora_tpu.train.data import SyntheticDataset, make_dataset

    root = tmp_path / "imgs"
    root.mkdir()
    Image.new("RGB", (8, 8)).save(root / "a.png")
    with open(root / "metadata.jsonl", "w") as f:
        f.write(json.dumps({"file_name": "a.png", "caption": "a cat"}) + "\n")
    ds = make_dataset(str(root), 8, caption_column="caption")
    assert ds.captions == ["a cat"]

    with pytest.raises(FileNotFoundError, match="not a directory"):
        make_dataset(str(tmp_path / "typo"), 8)
    # no path at all still falls back to the synthetic set (tests/benches)
    assert isinstance(make_dataset(None, 8), SyntheticDataset)


def test_prefetch_iterator():
    """data.prefetch: order-preserving, exhausts, surfaces exceptions."""
    import pytest as _pytest

    from aqualora_tpu.train.data import prefetch

    assert list(prefetch(iter(range(7)), depth=2)) == list(range(7))
    assert list(prefetch(iter([]), depth=2)) == []

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch(boom())
    assert next(it) == 1
    with _pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_prefetch_abandoned_consumer_releases_worker():
    """Closing the consumer early (break/exception in the train loop) must
    stop the worker thread and close the underlying iterator instead of
    leaking a thread blocked on q.put."""
    import time

    from aqualora_tpu.train.data import prefetch

    closed = []

    def gen():
        try:
            for i in range(10_000):
                yield i
        finally:
            closed.append(True)

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()                       # GeneratorExit in the consumer
    deadline = time.time() + 5
    while time.time() < deadline and not closed:
        time.sleep(0.05)
    assert closed, "worker thread did not exit / iterator not closed"


def test_stage3_int8_gen_smoke(tmp_path):
    """--int8_gen: the frozen U-Net's conv kernels are quantized once and
    the bucketed generators run the int8-conv serving config; the decoder
    update still produces finite losses and artifacts."""
    from flax import traverse_util as tu

    from aqualora_tpu.train import rob_enhance_finetune as s3
    out = str(tmp_path / "s3_int8")
    os.makedirs(out, exist_ok=True)
    args = s3.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--int8_gen", "--output_dir", out, "--checkpointing_steps", "99"])
    res = s3.run(args)
    assert len(res["history"]) == 2
    assert all(np.isfinite(m["loss"]) for m in res["history"])
    assert os.path.isdir(os.path.join(out, "msgdecoder"))


def test_ppft_teacher_int8_smoke(tmp_path):
    """--teacher_int8: the no-grad teacher pass runs with in-graph int8
    convs; the step stays finite and the LoRA/mapper grads flow (the
    student pass is untouched bf16)."""
    from aqualora_tpu.train import ppft_train as s2
    out = str(tmp_path / "s2_tint8")
    os.makedirs(out, exist_ok=True)
    args = s2.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--teacher_int8", "--output_dir", out,
         "--checkpointing_steps", "99", "--lr_warmup_steps", "0"])
    res = s2.run(args)
    assert all(np.isfinite(m["ppft_loss"]) for m in res["history"])
    assert all(m["grad_norm"] > 0 for m in res["history"])


def test_dataset_small_shard_fails_loudly(tmp_path):
    """A host shard smaller than batch_size with drop-last would yield NO
    batches and the epochs=None training loop would silently hang on the
    prefetch queue forever; the loaders must raise instead."""
    from PIL import Image

    from aqualora_tpu.train.data import (CachedMomentsDataset,
                                         ImageFolderDataset,
                                         SyntheticDataset)

    root = tmp_path / "imgs"
    root.mkdir()
    for i in range(2):
        Image.new("RGB", (8, 8)).save(root / f"{i}.png")
    ds = ImageFolderDataset(str(root), resolution=8)
    with pytest.raises(ValueError, match="batch_size"):
        next(ds.batches(4))
    # drop_last=False on the same tiny shard yields the tail instead
    tail = list(ds.batches(4, epochs=1, drop_last=False))
    assert len(tail) == 1 and tail[0][0].shape[0] == 2

    cached = CachedMomentsDataset.build(
        SyntheticDataset(resolution=8, size=2),
        lambda x: np.asarray(x, np.float32)[:, ::2, ::2, :1], batch_size=4)
    with pytest.raises(ValueError, match="batch_size"):
        next(cached.batches(4))


def test_imagefolder_case_insensitive_extensions(tmp_path):
    """Camera exports (.JPG/.JPEG/.PNG) are found without metadata.jsonl."""
    from PIL import Image

    from aqualora_tpu.train.data import ImageFolderDataset
    root = tmp_path / "imgs"
    root.mkdir()
    for name in ("a.png", "B.JPG", "c.jpeg", "D.PNG", "skip.txt"):
        if name.endswith(".txt"):
            (root / name).write_text("not an image")
        else:
            Image.new("RGB", (8, 8)).save(root / name)
    ds = ImageFolderDataset(str(root), resolution=8)
    assert len(ds) == 4


def test_hf_dataset_center_crop_and_flip_forwarded(tmp_path):
    """--center_crop/--random_flip reach the HF-datasets path (the
    reference applies CenterCrop/RandomFlip there, ppft_train.py:836-846;
    they used to be silently dropped by the factory's field filter)."""
    from PIL import Image

    from aqualora_tpu.train.data import _transform_pil, make_dataset

    root = tmp_path / "hf_imgs"
    root.mkdir()
    # non-square image: center-crop changes the pixels
    arr = (np.arange(16 * 8 * 3) % 251).astype(np.uint8).reshape(8, 16, 3)
    Image.fromarray(arr).save(root / "a.png")
    (root / "metadata.jsonl").write_text(
        '{"file_name": "a.png", "text": "a cat"}\n')

    ds = make_dataset(str(root), 8, dataset_name="imagefolder",
                      center_crop=True)
    assert ds.center_crop is True and ds.random_flip is False
    imgs, caps = next(ds.batches(1, epochs=1))
    ref = _transform_pil(Image.fromarray(arr), 8, center_crop=True)
    np.testing.assert_allclose(imgs[0], ref)
    assert caps == ["a cat"]
    # without the crop the squashed resize differs
    ds2 = make_dataset(str(root), 8, dataset_name="imagefolder")
    imgs2, _ = next(ds2.batches(1, epochs=1))
    assert np.abs(imgs2[0] - ref).max() > 1e-3


def test_run_demo_blank_secret_is_seeded(monkeypatch):
    """A blank single --secret draws its random watermark from --seed
    (it used to use an unseeded generator: irreproducible runs)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_demo", os.path.join(os.path.dirname(__file__), "..",
                                 "run_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    def fake_fold(folder, scale, msg_bits, hidinfo, save, rng=None):
        assert hidinfo is None and rng is not None
        return "".join(map(str, rng.integers(0, 2, msg_bits))), {}

    monkeypatch.setattr(demo, "create_watermark_lora", fake_fold)
    monkeypatch.setattr(demo, "simple_sample",
                        lambda *a, **k: ["img"])
    run = lambda seed: demo.process(None, "/nonexistent", "", "a cat",
                                    msg_bits=8, seed=seed)[1]
    assert run(5) == run(5)
    assert run(5) != run(6)
