"""Experiment metrics logging — the reference's three observability
channels (reference train_neurons.py:527-543,683 + train_neurons.sh tee):

  1. wandb        — forwarded when the package is importable AND the
                    caller passes wandb_project (off by default, like the
                    reference README.md:126-128).
  2. rank-0 print — `log()` prints only on process 0
                    (`jax.process_index() == 0`), the GSPMD equivalent of
                    `print = accelerator.print`.
  3. file log     — one JSONL line per `log_metrics` call next to the
                    checkpoints, replacing the reference's tee'd stdout
                    with something machine-readable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _is_main() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 wandb_project: Optional[str] = None,
                 run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None):
        self._fh = None
        self._wandb = None
        if not _is_main():
            return
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if wandb_project:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project, name=run_name,
                           config=config or {})
            except Exception:
                self._wandb = None

    def log(self, msg: str) -> None:
        if _is_main():
            print(msg, flush=True)

    def log_metrics(self, metrics: Dict[str, Any],
                    step: Optional[int] = None) -> None:
        if not _is_main():
            return
        row = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()}
        row["_time"] = time.time()
        if step is not None:
            row["_step"] = int(step)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        if self._wandb:
            self._wandb.log(row, step=step)

    def log_images(self, images: Dict[str, Any],
                   step: Optional[int] = None,
                   caption: Optional[str] = None) -> None:
        """Periodic image panels (the reference's wandb seg-mask
        visualizations, train_neurons.py:464-477). `images` maps panel
        name -> [H, W], [H, W, C] or [N, H, W(, C)] arrays in [0, 1] (a
        leading batch is tiled side by side). Forwarded to wandb when
        live; always also written as PNGs under <log_dir>/images/ so
        offline runs keep the panels."""
        if not _is_main():
            return
        import numpy as np

        panels = {}
        for name, img in images.items():
            a = np.asarray(img, np.float32)
            if a.ndim == 4 or (a.ndim == 3 and a.shape[-1] not in (1, 3)):
                a = np.concatenate(list(a), axis=1)  # tile batch on width
            if a.ndim == 3 and a.shape[-1] == 1:
                a = a[..., 0]
            panels[name] = np.clip(a, 0.0, 1.0)
        if self._fh:
            img_dir = os.path.join(os.path.dirname(self._fh.name), "images")
            os.makedirs(img_dir, exist_ok=True)
            for name, a in panels.items():
                tag = f"step{step}_" if step is not None else ""
                self._write_png(a, os.path.join(img_dir,
                                                f"{tag}{name}.png"))
        if self._wandb:
            self._wandb.log(
                {name: self._wandb.Image(a, caption=caption)
                 for name, a in panels.items()}, step=step)

    @staticmethod
    def _write_png(a, path: str) -> None:
        import numpy as np

        u8 = (np.asarray(a) * 255).astype(np.uint8)
        try:
            import imageio
            imageio.imwrite(path, u8)
        except Exception:
            np.save(path + ".npy", u8)  # last-resort raw dump

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._wandb:
            self._wandb.finish()
            self._wandb = None
