"""SiamFC tracker inference loop.

Parity with reference ``siamfc_pytorch/tracker.py`` (TrackerSiamFC): init crops
the exemplar with context margin and computes kernel features (:42-77); update
crops a 3-scale search pyramid, batch-forwards it, cross-correlates, bicubic-
upsamples ×16, applies the scale penalty and hann-window smoothing, and reads
the displacement off the argmax (:113-205).

TPU mapping (SURVEY.md §7 "hard parts"): crops stay on host (cv2 single-warp),
the per-frame forward (normalize → backbone → projections → xcorr → bicubic
upsample → scale penalty) is ONE jitted function with fixed shapes — no
recompilation across frames or sequences; argmax/box update is host numpy.
"""

import numpy as np

from vince_tpu.data.got10k_dataset import TRACKER_CFG
from vince_tpu.tracking.ops import get_cropped_input, read_image


class TrackerSiamFC:
    def __init__(self, name, cfg, encoder_cfg, state, share_jitted_from=None):
        """state: EndTaskState (encoder + tracking-head params);
        encoder_cfg: EndTaskConfig for the backbone.
        ``share_jitted_from``: reuse another tracker's jitted forwards (one
        compile serves every slot of the batched tracker)."""
        self.name = name
        self.cfg = dict(TRACKER_CFG)
        if cfg:
            self.cfg.update(cfg)
        self.encoder_cfg = encoder_cfg
        self.state = state
        self.upscale_sz = self.cfg["response_up"] * self.cfg["response_sz"]
        self.hann_window = np.outer(np.hanning(self.upscale_sz), np.hanning(self.upscale_sz))
        self.hann_window /= self.hann_window.sum()
        self.scale_factors = self.cfg["scale_step"] ** np.linspace(
            -(self.cfg["scale_num"] // 2),
            self.cfg["scale_num"] // 2,
            self.cfg["scale_num"],
        )
        if share_jitted_from is not None:
            self._kernel_fn = share_jitted_from._kernel_fn
            self._responses_fn = share_jitted_from._responses_fn
        else:
            self._build_jitted()

    def _build_jitted(self):
        import jax
        import jax.numpy as jnp

        from vince_tpu.models.vince_model import VinceEncoder
        from vince_tpu.ops.augment import AugmentConfig, _finalize
        from vince_tpu.ops.xcorr import multi_scale_xcorr
        from vince_tpu.solvers.end_task_step import build_models

        encoder, decoder = build_models(self.encoder_cfg)
        ecfg = self.encoder_cfg

        def normalize(img_u8):
            return _finalize(img_u8.astype(jnp.float32) / 255.0, AugmentConfig()).astype(
                ecfg.compute_dtype
            )

        def features(params, stats, imgs_u8):
            out = encoder.apply(
                {"params": params, "batch_stats": stats},
                normalize(imgs_u8), train=False,
                method=VinceEncoder.extract_features,
            )
            return out["spatial_features"]

        @jax.jit
        def kernel_fn(state, z_img):  # z_img [1, ez, ez, 3] uint8
            return features(state.encoder_params, state.encoder_batch_stats, z_img)

        @jax.jit
        def responses_fn(state, kernel, x_imgs):  # x_imgs [S, iz, iz, 3] uint8
            xf = features(state.encoder_params, state.encoder_batch_stats, x_imgs)
            proj_z = decoder.apply(
                {"params": state.decoder_params}, exemplar_features=kernel,
                method=type(decoder).project,
            )["z"]
            proj_x = decoder.apply(
                {"params": state.decoder_params}, search_features=xf,
                method=type(decoder).project,
            )["x"]
            resp = multi_scale_xcorr(proj_z[0], proj_x, out_scale=self.cfg["out_scale"])
            # bicubic ×response_up upsample (reference tracker.py:139-141)
            up = jax.image.resize(
                resp, (resp.shape[0], self.upscale_sz, self.upscale_sz), method="bicubic"
            )
            # scale penalty off-center scales (:147-148)
            s = self.cfg["scale_num"]
            penalty = jnp.full((s,), self.cfg["scale_penalty"]).at[s // 2].set(1.0)
            return up * penalty[:, None, None]

        self._kernel_fn = kernel_fn
        self._responses_fn = responses_fn

    # -- host-side crop helper (reference ops.crop_and_resize) ---------------
    def _crop(self, img, center, size, out_size):
        cy, cx = center
        xyxy = [cx - size / 2, cy - size / 2, cx + size / 2, cy + size / 2]
        crop, _ = get_cropped_input(img, xyxy, 1.0, out_size, pad_color=self.avg_color)
        return crop

    def init(self, img: np.ndarray, box):
        """box: 1-indexed [x, y, w, h] (reference :43-77)."""
        box = np.array(
            [box[1] - 1 + (box[3] - 1) / 2, box[0] - 1 + (box[2] - 1) / 2, box[3], box[2]],
            dtype=np.float32,
        )
        self.center, self.target_sz = box[:2], box[2:]
        context = self.cfg["context"] * np.sum(self.target_sz)
        self.z_sz = float(np.sqrt(np.prod(self.target_sz + context)))
        self.x_sz = self.z_sz * self.cfg["instance_sz"] / self.cfg["exemplar_sz"]
        self.avg_color = np.mean(img, axis=(0, 1))
        z = self._crop(img, self.center, self.z_sz, self.cfg["exemplar_sz"])
        self.kernel = self._kernel_fn(self.state, z[None].astype(np.uint8))

    def _apply_response(self, responses: np.ndarray):
        """Host post-process of one frame's 3-scale responses: hann smoothing,
        argmax → displacement → box/scale state update (reference
        tracker.py:143-205). Mutates center/target_sz/z_sz/x_sz; returns the
        1-indexed [x, y, w, h] box."""
        scale_id = int(np.argmax(np.amax(responses, axis=(1, 2))))
        response = responses[scale_id].copy()  # device buffers are read-only
        response -= response.min()
        response /= response.sum() + 1e-16
        response = (
            (1 - self.cfg["window_influence"]) * response
            + self.cfg["window_influence"] * self.hann_window
        )
        loc = np.unravel_index(response.argmax(), response.shape)

        disp_in_response = np.array(loc) - (self.upscale_sz - 1) / 2
        disp_in_instance = disp_in_response * self.cfg["total_stride"] / self.cfg["response_up"]
        disp_in_image = (
            disp_in_instance * self.x_sz * self.scale_factors[scale_id] / self.cfg["instance_sz"]
        )
        self.center += disp_in_image

        scale = (1 - self.cfg["scale_lr"]) + self.cfg["scale_lr"] * self.scale_factors[scale_id]
        self.target_sz *= scale
        self.z_sz *= scale
        self.x_sz *= scale

        return np.array(
            [
                self.center[1] + 1 - (self.target_sz[1] - 1) / 2,
                self.center[0] + 1 - (self.target_sz[0] - 1) / 2,
                self.target_sz[1],
                self.target_sz[0],
            ]
        )

    def _scale_crops(self, img: np.ndarray) -> np.ndarray:
        return np.stack(
            [
                self._crop(img, self.center, self.x_sz * f, self.cfg["instance_sz"])
                for f in self.scale_factors
            ]
        ).astype(np.uint8)

    def update(self, img: np.ndarray):
        x = self._scale_crops(img)
        responses = np.array(self._responses_fn(self.state, self.kernel, x), np.float32)
        return self._apply_response(responses)

    def track(self, img_files, box):
        """Per-sequence loop (reference :207-228)."""
        import time

        boxes = np.zeros((len(img_files), 4))
        boxes[0] = box
        times = np.zeros(len(img_files))
        for f, img_file in enumerate(img_files):
            img = read_image(img_file)
            t0 = time.time()
            if f == 0:
                self.init(img, box)
            else:
                boxes[f] = self.update(img)
            times[f] = time.time() - t0
        return boxes, times


class BatchedTrackerSiamFC:
    """Tracks N sequences in LOCKSTEP through one jitted [N·scales] forward.

    The reference evaluation loop is strictly serial — one sequence at a
    time, one 3-scale forward per frame (``siamfc_pytorch/tracker.py:207-228``
    via got10k's per-sequence ExperimentOTB loop). The per-frame forward is
    fixed-shape, so N sequences batch into a single [N·S, iz, iz, 3] call:
    per-frame dispatch/transfer overhead (the dominant cost through the axon
    tunnel at ~8-14 fps/seq) amortizes N ways, turning an hours-long
    OTB-2015 eval into minutes. Host-side crops and the box/scale update
    stay per-sequence (exactly ``TrackerSiamFC``'s code — slots ARE serial
    trackers sharing one compiled forward), so results match the serial
    tracker to float-fusion noise.

    Slot scheduling: when a sequence finishes, its slot is refilled with the
    next pending sequence; trailing steps run with idle slots fed zeros.
    """

    def __init__(self, name, cfg, encoder_cfg, state, n_slots: int = 8):
        self.name = name
        self.n_slots = n_slots
        self.encoder_cfg = encoder_cfg
        self.state = state
        self._cfg_overrides = cfg
        self._proto = TrackerSiamFC(name, cfg, encoder_cfg, state)
        self.cfg = self._proto.cfg
        self.upscale_sz = self._proto.upscale_sz
        self._build_batched()

    def _build_batched(self):
        import jax
        import jax.numpy as jnp

        from vince_tpu.models.vince_model import VinceEncoder
        from vince_tpu.ops.augment import AugmentConfig, _finalize
        from vince_tpu.ops.xcorr import multi_scale_xcorr
        from vince_tpu.solvers.end_task_step import build_models

        encoder, decoder = build_models(self.encoder_cfg)
        ecfg = self.encoder_cfg
        upscale_sz = self.upscale_sz
        s_num = self.cfg["scale_num"]
        penalty = np.full((s_num,), self.cfg["scale_penalty"], np.float32)
        penalty[s_num // 2] = 1.0
        out_scale = self.cfg["out_scale"]

        def features(params, stats, imgs_u8):
            imgs = _finalize(imgs_u8.astype(jnp.float32) / 255.0, AugmentConfig())
            out = encoder.apply(
                {"params": params, "batch_stats": stats},
                imgs.astype(ecfg.compute_dtype), train=False,
                method=VinceEncoder.extract_features,
            )
            return out["spatial_features"]

        @jax.jit
        def batched_responses_fn(state, kernels, x_imgs):
            # kernels [N, hz, wz, C]; x_imgs [N, S, iz, iz, 3] uint8
            n, s = x_imgs.shape[:2]
            flat = x_imgs.reshape((n * s,) + x_imgs.shape[2:])
            xf = features(state.encoder_params, state.encoder_batch_stats, flat)
            proj_x = decoder.apply(
                {"params": state.decoder_params}, search_features=xf,
                method=type(decoder).project,
            )["x"]
            proj_z = decoder.apply(
                {"params": state.decoder_params}, exemplar_features=kernels,
                method=type(decoder).project,
            )["z"]
            pj = proj_x.reshape((n, s) + proj_x.shape[1:])
            resp = jax.vmap(
                lambda z, xs: multi_scale_xcorr(z, xs, out_scale=out_scale)
            )(proj_z, pj)  # [N, S, hy, wy]
            flat_r = resp.reshape((n * s,) + resp.shape[2:])
            up = jax.image.resize(
                flat_r, (n * s, upscale_sz, upscale_sz), method="bicubic"
            ).reshape(n, s, upscale_sz, upscale_sz)
            return up * jnp.asarray(penalty)[None, :, None, None]

        self._batched_responses_fn = batched_responses_fn

    def track_all(self, sequences):
        """sequences: list of (img_files, init_box). Returns the aligned list
        of (boxes [T,4], times [T]) — the same contract as N ``track`` calls."""
        import time

        n_seq = len(sequences)
        results = [None] * n_seq
        slots = [None] * self.n_slots  # each: dict(tracker, seq_id, frame, boxes, times)
        next_seq = 0
        iz = self.cfg["instance_sz"]
        s_num = self.cfg["scale_num"]
        kern_shape = None
        x_batch = None

        while True:
            # refill idle slots (exemplar init — single-image jitted call)
            for si in range(self.n_slots):
                if slots[si] is None and next_seq < n_seq:
                    img_files, box = sequences[next_seq]
                    t0 = time.time()
                    trk = TrackerSiamFC(
                        self.name, self._cfg_overrides, self.encoder_cfg,
                        self.state, share_jitted_from=self._proto,
                    )
                    img = read_image(img_files[0])
                    trk.init(img, box)
                    boxes = np.zeros((len(img_files), 4))
                    boxes[0] = box
                    times = np.zeros(len(img_files))
                    times[0] = time.time() - t0
                    slots[si] = {
                        "trk": trk, "seq_id": next_seq, "frame": 1,
                        "files": img_files, "boxes": boxes, "times": times,
                    }
                    next_seq += 1
            active = [si for si in range(self.n_slots) if slots[si] is not None]
            if not active:
                break

            t0 = time.time()
            if kern_shape is None:
                k0 = np.asarray(slots[active[0]]["trk"].kernel)
                kern_shape, kern_dtype = k0.shape[1:], k0.dtype
                x_batch = np.zeros((self.n_slots, s_num, iz, iz, 3), np.uint8)
            kernels = np.zeros((self.n_slots,) + kern_shape, kern_dtype)
            for si in active:
                sl = slots[si]
                kernels[si] = np.asarray(sl["trk"].kernel)[0]
                img = read_image(sl["files"][sl["frame"]])
                x_batch[si] = sl["trk"]._scale_crops(img)
            responses = np.asarray(
                self._batched_responses_fn(self.state, kernels, x_batch), np.float32
            )
            dt = (time.time() - t0) / len(active)

            for si in active:
                sl = slots[si]
                sl["boxes"][sl["frame"]] = sl["trk"]._apply_response(responses[si])
                sl["times"][sl["frame"]] = dt
                sl["frame"] += 1
                if sl["frame"] >= len(sl["files"]):
                    results[sl["seq_id"]] = (sl["boxes"], sl["times"])
                    slots[si] = None
        return results
