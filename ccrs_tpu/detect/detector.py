"""TagDetector: the public detection API.

Mirrors the reference's detector surface (``TagDetector::new(&family, None)``
+ ``detect(&image) -> {tag_id: [4 corners]}``, call sites
``src/bin/camera_calibration.rs:74`` / ``src/data_loader.rs:43``) but is
batch-first: ``detect_batch`` processes a whole frame sequence through the
three-stage pipeline

  device: adaptive threshold  ->  host/native: quad extraction (C++)
      ->  device: homography decode + code match + subpixel refine

``detect`` on a single image is a convenience wrapper over the batch path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.profiling import stage
from .decode import decode_quads_compact, unsharp
from .families import TagFamily, get_family
from .quads import MAX_QUADS, extract_quads_batch, refine_corners_native
from .refine import refine_corners
from .threshold import adaptive_threshold, adaptive_threshold_packed2, pad_to_tile


_PATCH_BUCKET = [2048]  # grow-only corner-count bucket for extract_patches
# (same rationale as TagDetector._bucket: a corner count hovering at a
# power-of-two boundary must not flap the compiled gather shape)


def _refine_via_patches(dev_f32, quads, qframe, total):
    """Patch-based subpixel refinement for a compact (Q,4,2) quad list.

    Device-resident variant of assist._refine_compact: PxP neighborhoods
    are gathered on device (detect/patches.py) and only those uint8
    patches cross the link (~0.3 KB/corner) instead of whole frames.
    """
    from .patches import extract_patches
    from .quads import refine_corners_patches_native

    if total == 0:
        return quads
    n = total * 4
    while _PATCH_BUCKET[0] < n:
        _PATCH_BUCKET[0] *= 2
    bucket = _PATCH_BUCKET[0]
    corners = np.zeros((bucket, 2), np.float32)
    corners[:n] = quads[:total].reshape(-1, 2)
    qf = np.zeros(bucket, np.int32)
    qf[:n] = np.repeat(np.asarray(qframe[:total]), 4)
    patches, local, offset = extract_patches(
        dev_f32, jnp.asarray(corners), jnp.asarray(qf), as_u8=True
    )
    # download the full (static-shape) bucket and slice on host — a [:n]
    # device slice would compile a fresh kernel per distinct n
    refined_local = refine_corners_patches_native(
        np.asarray(patches)[:n].astype(np.float32), np.asarray(local)[:n]
    )
    out = quads.copy()
    out[:total] = (refined_local + np.asarray(offset)[:n]).reshape(-1, 4, 2)
    return out


def _refine_quads_via_patches(dev_f32, quads, counts):
    """Patch-based refinement over a padded (C, K, 4, 2) quad buffer."""
    C, K = quads.shape[:2]
    n_real = np.minimum(np.asarray(counts), K)
    sel_b = np.repeat(np.arange(C), n_real)
    sel_k = np.concatenate(
        [np.arange(n) for n in n_real] or [np.zeros(0, np.int64)]
    ).astype(np.int64)
    total = sel_b.shape[0]
    if total == 0:
        return quads
    compact = np.ascontiguousarray(quads[sel_b, sel_k], np.float32)
    refined = _refine_via_patches(dev_f32, compact, sel_b.astype(np.int32), total)
    out = quads.copy()
    out[sel_b, sel_k] = refined
    return out


def _to_gray_f32(img: np.ndarray) -> np.ndarray:
    """Any common image format -> float32 grayscale on a 0..255 scale."""
    img = np.asarray(img)
    if img.ndim == 3:
        if img.shape[2] == 4:
            img = img[..., :3]
        # ITU-R BT.601 luma
        img = img @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    if img.dtype == np.uint16:
        img = img.astype(np.float32) / 257.0
    else:
        img = img.astype(np.float32)
        if img.size and img.max() <= 1.5:  # 0..1 floats
            img = img * 255.0
    return img


class TagDetector:
    """AprilGrid tag detector.

    Args:
      family: family name ("t36h11", "t16h5", ...) or a TagFamily.
      refine: run subpixel corner refinement (default True).
    """

    def __init__(
        self,
        family="t36h11",
        refine: bool = True,
        max_quads: int = MAX_QUADS,
        native_refine: bool = True,
    ):
        self.family: TagFamily = (
            family if isinstance(family, TagFamily) else get_family(family)
        )
        self.refine = refine
        self.native_refine = native_refine
        self.max_quads = max_quads
        self.chunk = 64  # pipeline chunk (see detect_batch)
        self._bucket = 256  # sticky decode bucket (grows, never shrinks —
        # a count hovering at a power-of-two boundary must not flap the
        # compiled decode shape)

    # ------------------------------------------------------------- batched
    def detect_batch(
        self, images, board=None, dev_images=None
    ) -> List[Dict[int, np.ndarray]]:
        """Detect tags in a batch of images.

        Args:
          images: (B, H, W) or (B, H, W, C) uint8/float array-like.
          board: optional Board — enables the board-assisted recovery pass
            (predict missed tags from the geometry of decoded neighbors).
          dev_images: optional (B, H, W) jax array already on device
            (uint8/f32); skips the host->device upload when the producer
            (e.g. the on-device renderer) kept the batch resident.

        Returns:
          list of {tag_id: (4, 2) float32 corners} per image, corner order
          TL, TR, BR, BL in the tag's canonical orientation (board corner
          ids tag*4 + {0,1,2,3}).
        """
        if images is None:
            # fully device-resident batch (e.g. on-device rendering): host
            # never sees whole images — subpixel refinement runs on small
            # per-corner patches gathered on device (detect/patches.py)
            if dev_images is None:
                raise ValueError("need images or dev_images")
            device_resident = True
            imgs = None
            dev_all = dev_images
        else:
            device_resident = False
            raw = np.asarray(images)
            if raw.ndim == 3 and raw.dtype == np.uint8:
                # fast path: uint8 grayscale batch — one vectorized
                # conversion for the native-refine input, raw uint8 upload
                # (4x cheaper over the link); threshold/decode cast on device
                imgs = raw.astype(np.float32)
                dev_all = jnp.asarray(raw) if dev_images is None else dev_images
            else:
                imgs = np.stack([_to_gray_f32(im) for im in raw])
                dev_all = jnp.asarray(imgs) if dev_images is None else dev_images
        B, H, W = dev_all.shape

        # Software pipeline over fixed-size chunks: every chunk's upload +
        # threshold is enqueued on the device up front (dispatch is async),
        # so the single-core host stages (quad extraction, native subpixel
        # refine) of chunk i overlap the device work of chunks i+1...
        C = min(self.chunk, B)
        n_chunks = (B + C - 1) // C
        dev_chunks, packed_chunks = [], []
        for ci in range(n_chunks):
            lo = ci * C
            part = dev_all[lo : lo + C]
            if part.shape[0] < C:  # pad final chunk to keep shapes static
                reps = jnp.repeat(part[-1:], C - part.shape[0], axis=0)
                part = jnp.concatenate([part, reps], axis=0)
            padded, _, _ = pad_to_tile(part)
            dev_chunks.append(part.astype(jnp.float32))
            packed_chunks.append(adaptive_threshold_packed2(padded))
        pw = int(pad_to_tile(dev_all[:1])[0].shape[-1])

        results: List[Dict[int, np.ndarray]] = []
        for ci in range(n_chunks):
            lo = ci * C
            nb = min(C, B - lo)
            with stage("detect/threshold"):
                packed = np.asarray(packed_chunks[ci])  # (C, 2, Hp, Wp/8)
                binary = np.unpackbits(packed, axis=-1, count=pw)[:, :, :H, :W]
            with stage("detect/quadproc"):
                # both erosion levels (scale-dependent corner-square
                # bridges survive a single erosion); level-2 quads whose
                # center falls inside an existing level-1 quad's radius are
                # duplicates and dropped before the decode bucket.
                half = self.max_quads // 2
                q1, c1 = extract_quads_batch(binary[:, 0], max_quads=half)
                q2, c2 = extract_quads_batch(binary[:, 1], max_quads=half)
                quads = np.zeros((C, self.max_quads, 4, 2), np.float32)
                counts = np.zeros(C, np.int32)
                for b in range(C):
                    n1 = int(c1[b])
                    quads[b, :n1] = q1[b, :n1]
                    n = n1
                    if c2[b]:
                        cen1 = q1[b, :n1].mean(axis=1)  # (n1,2)
                        cen2 = q2[b, : c2[b]].mean(axis=1)
                        rad1 = (
                            np.linalg.norm(
                                q1[b, :n1] - cen1[:, None, :], axis=-1
                            ).mean(axis=1)
                            if n1
                            else np.zeros(0)
                        )
                        for j in range(int(c2[b])):
                            if n >= self.max_quads:
                                break
                            if n1 and (
                                np.linalg.norm(cen1 - cen2[j], axis=1) < 0.7 * rad1
                            ).any():
                                continue
                            quads[b, n] = q2[b, j]
                            n += 1
                    counts[b] = n
            dev_f32 = dev_chunks[ci]
            dev_sharp = unsharp(dev_f32)  # decode sampling only (see decode.unsharp)
            if device_resident:
                imgs_c = None

                def refine_fn(qds, qframe, total):
                    return _refine_via_patches(dev_f32, qds, qframe, total)

            else:
                imgs_c = imgs[lo : lo + nb]
                if imgs_c.shape[0] < C:
                    imgs_c = np.concatenate(
                        [imgs_c, np.repeat(imgs_c[-1:], C - imgs_c.shape[0], axis=0)]
                    )

                def refine_fn(qds, qframe, total, _imgs=imgs_c):
                    from .assist import _refine_compact

                    return _refine_compact(_imgs, qds, qframe, total)

            if self.refine:
                # subpixel-refine ALL candidate corners BEFORE decoding:
                # sharper homographies make bit sampling markedly more
                # reliable on small/strongly-distorted tags.
                with stage("detect/refine"):
                    if self.native_refine and device_resident:
                        quads = _refine_quads_via_patches(dev_f32, quads, counts)
                        quads_j = jnp.asarray(quads)
                    elif self.native_refine:
                        quads = refine_corners_native(
                            imgs_c, quads.reshape(C, -1, 2), counts=counts, group=4
                        ).reshape(quads.shape)
                        quads_j = jnp.asarray(quads)
                    else:
                        quads_j = refine_corners(
                            dev_f32, jnp.asarray(quads).reshape(C, -1, 2)
                        ).reshape(quads.shape)
            else:
                quads_j = jnp.asarray(quads)

            with stage("detect/decode"):
                # compact the (C, K) quad buffer (mostly padding) to a
                # static bucket of real quads — ~3x fewer sampling gathers
                quads_np = np.asarray(quads_j)
                n_real = np.minimum(counts, quads_np.shape[1])
                qframe = np.repeat(np.arange(C, dtype=np.int32), n_real)
                sel_k = np.concatenate(
                    [np.arange(n) for n in n_real] or [np.zeros(0, np.int64)]
                ).astype(np.int64)
                total = qframe.shape[0]
                while self._bucket < total:
                    self._bucket *= 2
                bucket = self._bucket
                qq = np.zeros((bucket, 4, 2), np.float32)
                qq[:total] = quads_np[qframe, sel_k]
                qf = np.zeros(bucket, np.int32)
                qf[:total] = qframe
                qv = np.zeros(bucket, bool)
                qv[:total] = True
                out = decode_quads_compact(
                    self.family, dev_sharp, jnp.asarray(qq), jnp.asarray(qf),
                    jnp.asarray(qv),
                )
            tag_id = np.asarray(out["tag_id"])
            hamming = np.asarray(out["hamming"])
            valid = np.asarray(out["valid"])
            corners = np.asarray(out["corners"])  # (bucket,4,2)

            best_all: List[Dict[int, Tuple[int, int]]] = [dict() for _ in range(nb)]
            for q in np.flatnonzero(valid[:total]):
                b = int(qf[q])
                if b >= nb:
                    continue
                tid = int(tag_id[q])
                cur = best_all[b]
                if tid not in cur or hamming[q] < cur[tid][1]:
                    cur[tid] = (int(q), int(hamming[q]))
            chunk_results: List[Dict[int, np.ndarray]] = [
                {tid: corners[q].copy() for tid, (q, _) in best.items()}
                for best in best_all
            ]

            if board is not None:
                from .assist import recover_missing_tags

                with stage("detect/assist"):
                    # pass the full (padded) chunk so decode shapes stay
                    # static; only the nb real frames appear in the results
                    recover_missing_tags(
                        self.family, board, refine_fn, dev_sharp, chunk_results
                    )
            results.extend(chunk_results)
        return results

    # -------------------------------------------------------------- single
    def detect(self, image) -> Dict[int, np.ndarray]:
        """Single-image detection (reference-compatible convenience)."""
        return self.detect_batch(np.asarray(image)[None])[0]
