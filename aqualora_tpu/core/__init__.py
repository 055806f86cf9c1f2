from aqualora_tpu.core import config, sharding  # noqa: F401
