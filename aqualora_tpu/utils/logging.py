"""Experiment tracking (SURVEY.md §5 observability).

The reference writes TensorBoard scalars + sample images in stage 1
(`latent_wm_pretrain.py:131,222-228`) and uses accelerate's tracker
abstraction (`--report_to` tensorboard/wandb, `ppft_train.py:366-373,
921-926`) in stages 2/3.  Here one small tracker: TensorBoard via torch's
SummaryWriter when available, wandb when requested and installed, always
falling back to stdout-only without error.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class Tracker:
    def __init__(self, output_dir: str, report_to: str = "tensorboard",
                 config: Optional[Dict] = None):
        self.writers = []
        if report_to in ("tensorboard", "all"):
            try:
                from torch.utils.tensorboard import SummaryWriter
                os.makedirs(os.path.join(output_dir, "logs"), exist_ok=True)
                self.writers.append(
                    ("tb", SummaryWriter(os.path.join(output_dir, "logs"))))
            except ImportError:
                pass
        if report_to in ("wandb", "all"):
            # catch ANY init failure, not just ImportError: wandb.init
            # raises CommError/UsageError on missing auth or no network
            # (this machine has no egress), and the promised contract is
            # "always fall back to stdout-only" — a crash here could land
            # AFTER a 15-minute TPU compile
            try:
                import wandb
                wandb.init(project="aqualora-tpu", dir=output_dir,
                           config=config or {})
                self.writers.append(("wandb", wandb))
            except Exception as e:
                print(f"wandb tracking disabled ({type(e).__name__}: {e}); "
                      "continuing with remaining trackers")

    def log(self, metrics: Dict[str, float], step: int) -> None:
        for kind, w in self.writers:
            if kind == "tb":
                for k, v in metrics.items():
                    w.add_scalar(k, float(v), step)
            else:
                w.log(dict(metrics), step=step)

    def log_images(self, tag: str, images: np.ndarray, step: int) -> None:
        """images: [N, H, W, 3] in [-1, 1]."""
        arr = ((np.asarray(images) + 1) * 127.5).clip(0, 255).astype(np.uint8)
        for kind, w in self.writers:
            if kind == "tb":
                w.add_images(tag, arr, step, dataformats="NHWC")
            else:
                w.log({tag: [w.Image(a) for a in arr]}, step=step)

    def close(self) -> None:
        for kind, w in self.writers:
            if kind == "tb":
                w.close()
            else:
                try:
                    w.finish()   # flush buffered metrics; atexit is not
                except Exception:  # guaranteed on abnormal exits
                    pass
