"""Quality metrics: L2 / LPIPS / ID similarity (+ mirrored variants).

Spec: spi/utils/metric_utils.py:6-17 and the metric bookkeeping in
base_coach.py:141-198.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.criteria.id_loss import IDLoss
from spi_tpu.criteria.l2_loss import l2_loss
from spi_tpu.criteria.lpips import LPIPS


@dataclasses.dataclass(frozen=True)
class Metric:
    lpips: LPIPS = LPIPS()
    id_loss: IDLoss = IDLoss()

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"lpips": self.lpips.init(k1), "id": self.id_loss.init(k2)}

    def run(self, params, gt, fake) -> dict[str, Any]:
        """gt, fake: (1, 3, R, R) in [-1, 1]. Returns python floats."""
        l2, lp, id_sim = _metric_fn(self)(params, gt, fake)
        return {"l2": float(l2), "lpips": float(lp), "id": float(id_sim)}


@functools.lru_cache(maxsize=4)
def _metric_fn(metric: Metric):
    # Cached per Metric config: a fresh jit closure per run() call would
    # recompile the VGG+ArcFace stacks for every image.
    @jax.jit
    def _run(params, gt, fake):
        l2 = l2_loss(gt, fake)
        lp = metric.lpips(params["lpips"], gt, fake)
        # ID loss crops assume 256^2 inputs (id_loss.py:17-21)
        gt256 = _to256(gt)
        fake256 = _to256(fake)
        id_sim = metric.id_loss.similarity(params["id"], gt256, fake256)[0]
        return l2, lp, id_sim

    return _run


def _to256(x):
    if x.shape[-1] == 256:
        return x
    n, c, h, w = x.shape
    if h < 256:
        # scaled-down smoke configs: nearest upsample to the ArcFace crop
        f = 256 // h
        assert h * f == 256, (h, "must divide 256")
        return jnp.repeat(jnp.repeat(x, f, axis=2), f, axis=3)
    f = h // 256
    return x.reshape(n, c, 256, f, 256, f).mean(axis=(3, 5))


class MetricLog:
    """Accumulates per-image metrics and writes metric_log.txt in the
    reference's format (base_coach.py:156-198)."""

    def __init__(self):
        self.data: dict[str, list[dict]] = {}

    def add(self, mode: str, values: dict, mirrored: dict | None = None):
        entry = dict(values)
        if mirrored is not None:
            entry.update({f"{k}_m": v for k, v in mirrored.items()})
        self.data.setdefault(mode, []).append(entry)

    def render(self, header: str = "") -> str:
        lines = [header] if header else []
        for mode, entries in self.data.items():
            lines.append(f"Mode: {mode}")
            keys = ["l2", "lpips", "id", "l2_m", "lpips_m", "id_m"]
            sums = dict.fromkeys(keys, 0.0)
            for i, e in enumerate(entries):
                parts = []
                for k in keys:
                    v = e.get(k, 0.0)
                    sums[k] += v
                    parts.append(f"{k}: {v:.6f}")
                lines.append(f"ID: {i} " + "; ".join(parts) + ";")
            n = max(len(entries), 1)
            lines.append(f"Mode: {mode} AVG")
            lines.append(
                "; ".join(f"{k}: {sums[k] / n:.6f}" for k in keys) + ";"
            )
        return "\n".join(lines) + "\n"

    def write(self, path: str, header: str = ""):
        with open(path, "a") as f:
            f.write(self.render(header))
