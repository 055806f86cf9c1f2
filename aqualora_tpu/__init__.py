"""AquaLoRA-TPU: TPU-native white-box watermarking framework for Stable Diffusion.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
Georgefwt/AquaLoRA (ICML 2024, arXiv 2405.11135): a watermark LoRA whose
rank-R bottleneck is modulated by a per-message diagonal scaling matrix, a
CNN decoder that extracts the bits from generated images, three training
stages, a LoRA artifact toolchain, and an evaluation suite.

Layout:
  core/       configs, PRNG, sharding/mesh, safetensors I/O
  models/     Flax SD-1.5 stack (CLIP, VAE, U-Net w/ first-class LoRA),
              watermark modules (SecretEncoder/SecretDecoder/MapperNet)
  ops/        Pallas TPU kernels (flash attention, block-DCT) + fallbacks
  diffusion/  noise schedules + samplers + jitted text->image pipeline
  distort/    jittable train-time distortions + eval-time distortions
  train/      the three stage drivers (latent_wm_pretrain, ppft_train,
              rob_enhance_finetune)
  tools/      create_wm_lora, merge_lora, key-layout converters
  eval/       simple_sample/simple_decode, FPR math, benchmark runners
"""

__version__ = "0.1.0"
