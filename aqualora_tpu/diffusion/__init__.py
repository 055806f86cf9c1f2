from aqualora_tpu.diffusion.schedule import NoiseSchedule  # noqa: F401
