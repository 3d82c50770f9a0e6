"""Per-image inversion pipeline: stage-1 projection -> stage-2 tuning ->
artifacts. The JAX equivalent of the reference coaches' train() loops
(base_coach.py + pti_coach.py/rot_bbox_cx_coach.py/inference_coach.py),
with the output directory layout of run_inversion.py:60-79.
"""

from __future__ import annotations

import dataclasses
import os
import time
import zlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spi_tpu.criteria.bbox_cx import BoxCXLoss
from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.data.dataset import (
    InversionSample,
    face_mask_from_parsing,
    foreground_mask_from_parsing,
)
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.training import coaches, projectors
from spi_tpu.utils import camera as cam
from spi_tpu.utils import checkpoint as ckpt
from spi_tpu.utils.image import save_image
from spi_tpu.utils.metrics import Metric, MetricLog
from spi_tpu.utils.params import replace_noise


@dataclasses.dataclass
class PipelineConfig:
    """CLI-level knobs (names follow spi/run_inversion.py:18-42 +
    spi/configs/hyperparameters.py)."""

    output_root: str = "test/output/"
    first_inv_type: str = "sg"  # 'sg' | 'sgw+' | 'mir'
    first_inv_steps: int = 500
    G_1_type: str = "RotBbox"  # 'pti' | 'RotBbox' | 'Inference'
    G_1_step: int = 1000
    pt_rot_lambda: float = 0.1
    pt_mirror_rot_lambda: float = 0.05
    pt_depth_lambda: float = 1.0
    pt_tv_lambda: float = 0.0
    # Early-stop threshold (hyperparameters.py:13 LPIPS_value_threshold);
    # negative disables early stopping.
    lpips_threshold: float = 0.05
    use_adapt_yaw_range: bool = False
    max_images_to_invert: int = 3000
    load_embedding_coach_name: str | None = None
    description: str | None = None
    seed: int = 0
    save_video: bool = False
    # SPMD multi-image inversion: invert N images in ONE sharded program,
    # image axis split across the device mesh (the TPU-native replacement
    # for the reference's dataset_block + one-process-per-GPU fan-out,
    # images_dataset.py:149-158). 1 = serial.
    parallel_images: int = 1
    # Save the in-progress reconstruction every N tuning steps
    # (global_config.py:7 log_snapshot + rot_bbox_cx_coach.py:153-154).
    # 0 = off (serial path only; snapshots are per-image host IO).
    log_snapshot: int = 0
    # compute dtype for the LPIPS VGG stack (the generator's own
    # compute_dtype lives on TriPlaneGenerator); 'bfloat16' halves the
    # perceptual-loss cost on TPU
    lpips_compute_dtype: str = "float32"

    @property
    def coach_name(self) -> str:
        """Run-identity string (base_coach.py:240-269)."""
        name = "RotBboxCoach" if self.G_1_type == "RotBbox" else (
            "SingleIDCoach" if self.G_1_type == "pti" else "InferenceCoach"
        )
        name += f"_{self.first_inv_type}_{self.first_inv_steps}"
        name += f"_{self.G_1_type}_{self.G_1_step}"
        name += f"_rot_{self.pt_rot_lambda}"
        name += f"_mirrorrot_{self.pt_mirror_rot_lambda}"
        name += f"_depth_{self.pt_depth_lambda}"
        name += f"_tv_{self.pt_tv_lambda}"
        if self.use_adapt_yaw_range:
            name += "_wadyaw"
        if self.description:
            name += f"_{self.description}"
        return name

    def dirs(self) -> dict[str, str]:
        root = self.output_root
        return {
            "checkpoints": os.path.join(root, "checkpoints", self.coach_name),
            "embedding": os.path.join(root, "embedding", self.coach_name),
            "experiments": os.path.join(root, "experiments"),
            "image": os.path.join(root, "image", self.coach_name),
            "image_m": os.path.join(root, "image_m", self.coach_name),
            "video": os.path.join(root, "video", self.coach_name),
        }


class InversionPipeline:
    def __init__(
        self,
        generator: TriPlaneGenerator,
        g_params,  # pretrained (or random) generator params
        config: PipelineConfig,
        perception_params: dict | None = None,  # {'lpips':…, 'boxcx':…, 'metric':…}
    ):
        self.generator = generator
        self.g_params0 = g_params
        self.config = config
        self.lpips = LPIPS(compute_dtype=config.lpips_compute_dtype)
        self.box_cx = BoxCXLoss()
        self.metric = Metric()

        key = jax.random.PRNGKey(config.seed)
        kl, kb, km = jax.random.split(key, 3)
        perception_params = perception_params or {}
        self.lpips_params = perception_params.get("lpips") or self.lpips.init(kl)
        self.box_cx_params = perception_params.get("boxcx") or self.box_cx.init(kb)
        self.metric_params = perception_params.get("metric") or {
            "lpips": self.lpips_params,
            "id": self.metric.id_loss.init(km),
        }

        self.metric_log = MetricLog()
        self.dirs = config.dirs()
        for d in self.dirs.values():
            os.makedirs(d, exist_ok=True)

    # ------------------------------------------------------------------
    def projector_settings(self) -> projectors.ProjectorSettings:
        return projectors.ProjectorSettings(
            mode=self.config.first_inv_type,
            num_steps=self.config.first_inv_steps,
        )

    def coach_settings(self, adapt_yaw_range: float) -> coaches.CoachSettings:
        c = self.config
        if c.G_1_type == "pti":
            return dataclasses.replace(
                coaches.pti_settings(c.G_1_step),
                lpips_threshold=c.lpips_threshold,
            )
        return coaches.CoachSettings(
            num_steps=c.G_1_step,
            lpips_threshold=c.lpips_threshold,
            rot_lambda=c.pt_rot_lambda,
            mirror_rot_lambda=c.pt_mirror_rot_lambda,
            depth_lambda=c.pt_depth_lambda,
            tv_lambda=c.pt_tv_lambda,
            yaw_range=adapt_yaw_range,
            log_snapshot=c.log_snapshot,
        )

    # ------------------------------------------------------------------
    def _snapshot_cb(self, step, img):
        """Mid-tuning snapshot sink (stable bound method: part of the
        tune-fn compile cache key). Writes
        image/<coach>/<name>_step<k>.jpg like rot_bbox_cx_coach.py:154."""
        name = getattr(self, "_snapshot_name", None)
        if name is None:
            return
        save_image(
            np.asarray(img),
            os.path.join(self.dirs["image"], f"{name}_step{int(step)}.jpg"),
        )

    # ------------------------------------------------------------------
    def get_inversion(self, sample: InversionSample, rng, fg_mask=None):
        """Stage-1 w pivot with the embedding cache semantics of
        base_coach.py:62-99."""
        emb_dir = self.dirs["embedding"]
        if self.config.load_embedding_coach_name is not None:
            load_dir = os.path.join(
                self.config.output_root, "embedding", self.config.load_embedding_coach_name
            )
            path = os.path.join(load_dir, f"{sample.name}.npz")
            if os.path.exists(path):
                data = np.load(path)
                w = jnp.asarray(data["w"])
                noise = {k[6:]: jnp.asarray(v) for k, v in data.items() if k.startswith("noise/")}
                return w, (noise or None)

        w, noise, _ = projectors.project(
            self.generator,
            self.g_params0,
            self.lpips,
            self.lpips_params,
            jnp.asarray(sample.image),
            jnp.asarray(sample.camera),
            rng,
            self.projector_settings(),
            fg_mask=fg_mask,
        )
        # One device_get for the whole tree: per-leaf np.asarray costs a
        # full tunnel round trip (~90 ms) per noise buffer on axon.
        w_host, noise_host = jax.device_get((w, noise))
        payload = {"w": w_host}
        payload.update({f"noise/{k}": v for k, v in noise_host.items()})
        np.savez(os.path.join(emb_dir, f"{sample.name}.npz"), **payload)
        return w, noise

    # ------------------------------------------------------------------
    def _image_keys(self, name: str):
        """Per-image (k_proj, k_tune). Stable digest: Python's hash() is
        salted per process (PYTHONHASHSEED), which would make per-image
        randomness — and thus inversions — irreproducible across runs at
        a fixed seed."""
        rng = jax.random.PRNGKey(self.config.seed)
        name_digest = zlib.crc32(name.encode()) & 0x7FFFFFFF
        return jax.random.split(jax.random.fold_in(rng, name_digest))

    def invert_image(self, sample: InversionSample) -> dict[str, Any]:
        cfg = self.config
        self._snapshot_name = sample.name
        k_proj, k_tune = self._image_keys(sample.name)

        image = jnp.asarray(sample.image)
        camera = jnp.asarray(sample.camera)

        fg_mask = face_mask = None
        if sample.mask is not None:
            fg_mask = jnp.asarray(foreground_mask_from_parsing(sample.mask))
            face_mask = jnp.asarray(face_mask_from_parsing(sample.mask))

        t0 = time.time()
        w_pivot, noise = self.get_inversion(sample, k_proj, fg_mask=fg_mask)
        # Block before reading the clock: jax dispatch is async, so
        # without this the stage "time" is submission latency and the
        # device compute silently drains into whatever is timed next.
        jax.block_until_ready((w_pivot, noise))
        t_stage1 = time.time() - t0

        # Stage 2: fresh G with the stage-1 noise buffers substituted
        # (the reference mutates G's buffers in place during stage 1).
        g_params = self.g_params0
        if noise:
            g_params = replace_noise(g_params, noise)

        t0 = time.time()
        steps_run = 0
        if cfg.G_1_type in ("pti", "RotBbox") and cfg.G_1_step > 0:
            adapt_yaw = 0.2
            if cfg.use_adapt_yaw_range:
                adapt_yaw = float(cam.cal_camera_gauss_weight(camera)[0])
            tuned, (steps_run, last_lp) = coaches.tune_generator(
                self.generator,
                g_params,
                self.g_params0,
                self.lpips,
                self.lpips_params,
                coaches.CoachInputs(
                    target=image,
                    camera=camera,
                    w_pivot=w_pivot,
                    face_mask=face_mask,
                    landmarks=(
                        jnp.asarray(sample.landmarks)
                        if sample.landmarks is not None else None
                    ),
                ),
                k_tune,
                self.coach_settings(adapt_yaw),
                box_cx=self.box_cx,
                box_cx_params=self.box_cx_params,
                snapshot_cb=(
                    self._snapshot_cb if cfg.log_snapshot > 0 else None
                ),
            )
            g_params = tuned
            jax.block_until_ready(g_params)  # same async-dispatch caveat
        t_stage2 = time.time() - t0

        return self._finalize_image(
            sample.name, w_pivot, camera, image, g_params,
            t_stage1, t_stage2, steps_run,
        )

    def _finalize_image(self, name, w_pivot, camera, image, g_params,
                        t_stage1, t_stage2, steps_run) -> dict[str, Any]:
        """Shared per-image tail: artifacts + metrics (+ mirrored) like
        base_coach.cal_metric / post_process."""
        result = self.post_process(name, w_pivot, camera, g_params)
        result.update(
            name=name, stage1_s=t_stage1, stage2_s=t_stage2,
            steps_run=int(steps_run),
        )
        m = self.metric.run(self.metric_params, image, result["final_image"])
        camera_m = cam.mirror_camera(camera)
        fake_m = self.render(g_params, w_pivot, camera_m)
        m_m = self.metric.run(
            self.metric_params, jnp.flip(image, axis=3), fake_m
        )
        self.metric_log.add("G1_inv", m, m_m)
        result["metrics"] = {**m, **{f"{k}_m": v for k, v in m_m.items()}}
        # Artifacts are on disk (post_process); don't accumulate full-res
        # image arrays in the returned list — a 3000-image run would hold
        # tens of GB of host memory otherwise.
        result.pop("final_image")
        result.pop("final_image_m")
        return result

    # ------------------------------------------------------------------
    def invert_batch(self, samples: list[InversionSample]) -> list[dict]:
        """Invert B images in ONE SPMD program (config.parallel_images).

        The image axis is sharded across the device mesh; per-image
        randomness uses the same keys as the serial path, so results
        match invert_image up to fp reassociation. The embedding cache
        is written (not read) on this path.
        """
        from spi_tpu.parallel import mesh as pmesh
        from spi_tpu.utils.params import init_noise_like

        cfg = self.config
        b = len(samples)
        ndev = len(jax.devices())
        d = max(k for k in range(1, min(ndev, b) + 1) if b % k == 0)
        mesh = pmesh.data_mesh(d)

        proj_settings = self.projector_settings()
        coach_settings = self.coach_settings(0.2)
        have_mask = all(s.mask is not None for s in samples)
        have_lm = all(s.landmarks is not None for s in samples)
        use_boxcx = (
            have_mask and have_lm and cfg.G_1_type == "RotBbox"
            and cfg.pt_mirror_rot_lambda > 0
        )

        targets, cameras, w0s, noise0s = [], [], [], []
        w_stds, rng_projs, rng_tunes, fmasks, lms = [], [], [], [], []
        for s in samples:
            image = jnp.asarray(s.image)
            camera = jnp.asarray(s.camera)
            k_proj, k_tune = self._image_keys(s.name)
            # identical key split to projectors.project
            k_noise, k_steps = jax.random.split(k_proj)
            noise0s.append(init_noise_like(k_noise, self.g_params0))
            w_avg, w_std = projectors.compute_w_stats(
                self.generator, self.g_params0, camera, proj_settings.w_avg_samples
            )
            w0 = (
                w_avg if proj_settings.mode == "sg"
                else jnp.tile(w_avg, (1, self.generator.num_ws, 1))
            )
            targets.append(image)
            cameras.append(camera)
            w0s.append(w0)
            w_stds.append(jnp.float32(w_std))
            rng_projs.append(k_steps)
            rng_tunes.append(k_tune)
            if have_mask:
                fmasks.append(jnp.asarray(face_mask_from_parsing(s.mask)))
            if have_lm:
                lms.append(jnp.asarray(s.landmarks))

        run = pmesh.spmd_invert(
            self.generator, self.lpips, mesh, proj_settings, coach_settings,
            box_cx=self.box_cx if use_boxcx else None,
        )
        t0 = time.time()
        w_b, noise_b, g_b, steps_b, lp_b, _dists = run(
            self.g_params0, self.lpips_params,
            self.box_cx_params if use_boxcx else None,
            jnp.stack(targets), jnp.stack(cameras), jnp.stack(w0s),
            pmesh.stack_trees(noise0s), jnp.stack(w_stds),
            jnp.stack(rng_projs), jnp.stack(rng_tunes),
            jnp.stack(fmasks) if have_mask else None,
            jnp.stack(lms) if have_lm else None,
        )
        jax.block_until_ready(w_b)
        per_image_s = (time.time() - t0) / b

        results = []
        for i, s in enumerate(samples):
            w = w_b[i]
            noise = pmesh.index_tree(noise_b, i)
            g_params = pmesh.index_tree(g_b, i)
            payload = {"w": np.asarray(w)}
            payload.update({f"noise/{k}": np.asarray(v) for k, v in noise.items()})
            np.savez(
                os.path.join(self.dirs["embedding"], f"{s.name}.npz"), **payload
            )
            results.append(
                self._finalize_image(
                    s.name, w, jnp.asarray(s.camera), jnp.asarray(s.image),
                    g_params, per_image_s, 0.0, int(steps_b[i]),
                )
            )
        return results

    # ------------------------------------------------------------------
    def render(self, g_params, w, c):
        fn = getattr(self, "_render_jit", None)
        if fn is None:
            # cached on the instance: a fresh jit closure per call would
            # recompile the full synthesis for every render.
            def _render(g_params, w, c):
                return self.generator.synthesis(
                    g_params, jax.random.PRNGKey(0), w, c, noise_mode="const"
                )["image"]

            fn = self._render_jit = jax.jit(_render)
        return fn(g_params, w, c)

    def post_process(self, name: str, w, c, g_params) -> dict[str, Any]:
        """Save {w, c, G} + image + mirrored image (base_coach.py:219-226)."""
        ckpt.save_pytree(
            os.path.join(self.dirs["checkpoints"], f"{name}.npz"),
            {"w": w, "c": c, "G": g_params},
        )
        img = self.render(g_params, w, c)
        save_image(img, os.path.join(self.dirs["image"], f"{name}.jpg"))
        img_m = self.render(g_params, w, cam.mirror_camera(c))
        save_image(img_m, os.path.join(self.dirs["image_m"], f"{name}.jpg"))
        if self.config.save_video:
            from spi_tpu.utils.video import render_orbit_video

            render_orbit_video(
                self.generator, g_params, w,
                os.path.join(self.dirs["video"], f"{name}.mp4"),
            )
        return {"final_image": img, "final_image_m": img_m, "w": w}

    # ------------------------------------------------------------------
    def run(self, dataset) -> list[dict]:
        results = []
        if self.config.parallel_images > 1:
            batch: list[InversionSample] = []
            n_total = 0
            for sample in dataset:
                if n_total >= self.config.max_images_to_invert:
                    break
                batch.append(sample)
                n_total += 1
                if len(batch) == self.config.parallel_images:
                    results.extend(self.invert_batch(batch))
                    batch = []
            if batch:
                results.extend(self.invert_batch(batch))
        else:
            for i, sample in enumerate(dataset):
                if i >= self.config.max_images_to_invert:
                    break
                results.append(self.invert_image(sample))
        header = (
            f"Coach name: {self.config.coach_name}\n"
            f"first_inv_type: {self.config.first_inv_type}\n"
            f"first_inv_steps: {self.config.first_inv_steps}\n"
            f"G_1_step: {self.config.G_1_step}\n"
        )
        self.metric_log.write(
            os.path.join(self.dirs["experiments"], "metric_log.txt"), header
        )
        return results
