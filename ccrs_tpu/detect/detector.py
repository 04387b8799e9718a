"""TagDetector: the public detection API.

Mirrors the reference's detector surface (``TagDetector::new(&family, None)``
+ ``detect(&image) -> {tag_id: [4 corners]}``, call sites
``src/bin/camera_calibration.rs:74`` / ``src/data_loader.rs:43``) but is
batch-first: ``detect_batch`` processes a whole frame sequence through the
three-stage pipeline

  device: adaptive threshold  ->  host/native: quad extraction (C++)
      ->  device: ONE fused graph (patch refine + unsharp + decode)

``detect`` on a single image is a convenience wrapper over the batch path.

Latency architecture: the remote-TPU link costs ~30 ms per synchronous
round trip, so the batch path is phased to keep at most three syncs per
chunk and to overlap host work with device work:

  phase 1 (per chunk): download the packed threshold bitmaps (device work
    for ALL chunks was enqueued up front), run the native C++ quad
    extraction, and ENQUEUE the fused refine+decode graph — its result is
    not fetched yet, so the device decodes chunk i while the host extracts
    quads of chunk i+1;
  phase 2 (per chunk): fetch decode outputs (already computed in the
    background), build per-frame results, and enqueue the board-assisted
    recovery decode the same way;
  phase 3 (per chunk): fetch + merge assist results.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.profiling import stage
from .decode import refine_decode_fused
from .families import TagFamily, get_family
from .quads import MAX_QUADS, extract_quads_batch
from .threshold import adaptive_threshold_packed, pad_to_tile, threshold_front


import jax as _jax


@_jax.jit
def _pool2(images):
    """2x2 mean pyramid level (device side); odd trailing rows/cols drop."""
    B, H, W = images.shape
    x = images[:, : H // 2 * 2, : W // 2 * 2].astype(jnp.float32)
    return x.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))


def _dilate_white_host(binary: np.ndarray) -> np.ndarray:
    """3x3 white dilation (= one more black erosion) of a (B, H, W) {0,1}
    uint8 batch on the host — exactly reduce_window(OR, 3x3, SAME) with
    False padding, but computed from the already-downloaded level-1 bitmap
    so the second erosion level never crosses the link (the packed-bitmap
    download is bandwidth-bound at ~20 MB/s measured)."""
    out = binary.copy()
    out[:, 1:, :] |= binary[:, :-1, :]
    out[:, :-1, :] |= binary[:, 1:, :]
    col = out.copy()
    out[:, :, 1:] |= col[:, :, :-1]
    out[:, :, :-1] |= col[:, :, 1:]
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


def _expand_quads(quads, px):
    """Push each corner of (B, K, 4, 2) quads away from its quad center
    by ``px`` (erosion-bias pre-compensation; see the scale-2 path)."""
    cen = quads.mean(axis=2, keepdims=True)
    d = quads - cen
    n = np.linalg.norm(d, axis=-1, keepdims=True)
    return quads + d / np.maximum(n, 1e-6) * px


def _dedup_levels(q1, c1, q2, c2, max_quads):
    """Merge the two erosion levels' quads, dropping level-2 quads whose
    center falls within 0.7x an existing level-1 quad's mean radius
    (duplicates of the same tag blob).  Fully vectorized over the batch —
    no per-frame/per-quad Python on the 1-core host (r02 verdict #8)."""
    C, half = q1.shape[0], q1.shape[1]
    k = np.arange(half)[None, :]
    m1 = k < c1[:, None]  # (C, half) level-1 validity
    m2 = k < c2[:, None]
    cen1 = q1.mean(axis=2)  # (C, half, 2)
    rad1 = np.linalg.norm(q1 - cen1[:, :, None, :], axis=-1).mean(axis=2)
    cen2 = q2.mean(axis=2)
    d = np.linalg.norm(
        cen1[:, None, :, :] - cen2[:, :, None, :], axis=-1
    )  # (C, half2, half1)
    dup = (d < 0.7 * rad1[:, None, :]) & m1[:, None, :]
    keep2 = m2 & ~dup.any(axis=2)
    # level-1 rows first, then surviving level-2 rows: a stable argsort on
    # ~valid compacts each frame's winners to the front in one shot
    quads_all = np.concatenate([q1, q2], axis=1)  # (C, 2*half, 4, 2)
    valid_all = np.concatenate([m1, keep2], axis=1)
    order = np.argsort(~valid_all, axis=1, kind="stable")
    quads_sorted = np.take_along_axis(quads_all, order[:, :, None, None], axis=1)
    counts = np.minimum(valid_all.sum(axis=1), max_quads).astype(np.int32)
    quads = np.zeros((C, max_quads, 4, 2), np.float32)
    m = min(max_quads, 2 * half)
    quads[:, :m] = quads_sorted[:, :m]
    return quads, counts


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
        native_refine: bool = True,  # kept for API compat; refinement now
        # always runs inside the fused device graph
        track: bool | None = None,
    ):
        self.family: TagFamily = (
            family if isinstance(family, TagFamily) else get_family(family)
        )
        self.refine = refine
        self.max_quads = max_quads
        import os

        # pipeline chunk (see detect_batch); CCRS_DETECT_CHUNK overrides
        # for experiments — larger chunks mean fewer link syncs but less
        # host/device overlap and bigger compiled graphs
        self.chunk = int(os.environ.get("CCRS_DETECT_CHUNK", "64"))
        # images at least this wide/tall run candidate extraction on a
        # half-res pyramid level (see detect_batch); tags below ~35 px
        # full-res would degrade at half res, so the default only engages
        # where tags are large by construction
        self.pyramid_min_side = int(os.environ.get("CCRS_PYRAMID_MIN_SIDE", "768"))
        self._bucket = 256  # sticky decode bucket (grows in 256-quad steps,
        # never shrinks — a count hovering at a boundary must not flap the
        # compiled decode shape, and power-of-two doubling wasted up to
        # ~70% of the refine/decode compute as padding)
        # --- steady-state tracking (video fast path; see track.py) ---
        # on by default when a board is supplied; CCRS_TRACK=0 disables
        if track is None:
            track = os.environ.get("CCRS_TRACK", "1") != "0"
        self.track = track
        # force a cold (full-pipeline) frame at least this often, bounding
        # the staleness of the tracking fallback policy's occlusion memory
        self.cold_every = int(os.environ.get("CCRS_TRACK_COLD_EVERY", "16"))
        # cold-fallback group size: a small dedicated graph shape so
        # correcting a few frames never pays a full-chunk threshold/CCL
        self.cold_chunk = int(os.environ.get("CCRS_TRACK_COLD_CHUNK", "8"))
        self._tstate = None

    def reset_tracking(self) -> None:
        """Drop the frame-to-frame tracking carry (call between cameras /
        unrelated sequences; a stale carry only costs cold fallbacks, not
        correctness)."""
        self._tstate = None

    def prewarm(self, height: int, width: int, board=None) -> None:
        """Execute every device graph of the detect path on dummy inputs.

        On the remote backend each graph pays a load (cached-compile) or
        compile on first execution; calling this on a background thread
        while the host renders/decodes images overlaps those loads with
        useful work (the thread blocks on RPCs, releasing the GIL).
        Safe to skip — first detection simply pays the loads itself.
        """
        import jax.numpy as jnp

        C = self.chunk
        scale = 2 if max(height, width) >= self.pyramid_min_side else 1
        imgs = jnp.zeros((C, height, width), jnp.uint8)
        threshold_front(imgs, scale).block_until_ready()
        sub = jnp.zeros((self.cold_chunk, height, width), jnp.uint8)
        threshold_front(sub, scale).block_until_ready()
        bucket = self._bucket
        qq = jnp.zeros((bucket, 4, 2), jnp.float32)
        qf = jnp.zeros(bucket, jnp.int32)
        qv = jnp.zeros(bucket, bool)
        for b in (imgs, sub):
            out = refine_decode_fused(
                self.family, b, qq, qf, qv, do_refine=self.refine
            )
            out["valid"].block_until_ready()
        if board is not None and self.track and self.refine:
            from .track import track_chunk

            n = board.n_tags
            bxy = jnp.zeros((n, 4, 2), jnp.float32)
            z = jnp.zeros(n, bool)
            c = jnp.zeros((n, 4, 2), jnp.float32)
            outs = track_chunk(
                self.family, imgs, bxy, jnp.asarray(np.int32(0)),
                c, z, c, z, c, z,
            )
            outs[1].block_until_ready()

    # ----------------------------------------------------- shared helpers
    def _extract_quads(self, b1, board, scale):
        """Native quad extraction over a (C, sH, sW) binary batch: both
        erosion levels, level-2 need heuristics, scale compensation and
        dedup.  Returns (quads (C, max_quads, 4, 2) full-res px, counts)."""
        half = self.max_quads // 2
        q1, c1 = extract_quads_batch(b1, max_quads=half)
        # Level 2 exists to split tags that the first erosion left
        # bridged into crosses — a LARGE-tag phenomenon (the
        # corner-square bridges grow with tag scale; measured to
        # appear around ~140 px tags, commit "dual-erosion").  A
        # frame may skip the second native pass (the single host
        # core pays ~2.3 ms/frame/level) only when BOTH hold:
        # level-1 already yielded >= n_tags candidates AND every
        # candidate is small-tag-regime sized — real imagery has
        # background clutter that inflates the count alone
        # (measured: euroc.png 99 / tum_vi 86 candidates for 36
        # tags), so the count by itself must never gate the pass.
        q2 = np.zeros_like(q1)
        c2 = np.zeros_like(c1)
        if board is None:
            need = np.arange(b1.shape[0])
        else:
            big_area = (100.0 / scale) ** 2  # ~100 px tag side
            need_l = []
            for b in range(b1.shape[0]):
                n1 = int(c1[b])
                if n1 < board.n_tags:
                    need_l.append(b)
                    continue
                x = q1[b, :n1, :, 0]
                y = q1[b, :n1, :, 1]
                a2 = np.einsum(
                    "qn,qn->q", x, np.roll(y, -1, 1)
                ) - np.einsum("qn,qn->q", np.roll(x, -1, 1), y)
                if 0.5 * np.abs(a2).max() >= big_area:
                    need_l.append(b)
            need = np.asarray(need_l, np.int64)
        if need.size:
            b2 = _dilate_white_host(b1[need])
            q2n, c2n = extract_quads_batch(b2, max_quads=half)
            q2[need] = q2n
            c2[need] = c2n
        if scale == 2:
            # Erosion shrinks black blobs ~1 px per edge per
            # dilation at the PYRAMID resolution (2 full px) and
            # the pooling blur adds ~1 more: measured ~4.5 px
            # inward corner bias for level 1 (vs ~1.4 px on the
            # full-res path) and ~2 px more for the
            # doubly-eroded level 2.  Pre-expand along the
            # outward diagonal (in pyramid units, before the
            # center-based dedup) so the subpixel refinement
            # (total shift clamped to its 4 px window) starts
            # inside its capture radius.
            q1 = _expand_quads(q1, 1.5)
            q2 = _expand_quads(q2, 2.75)
        quads, counts = _dedup_levels(q1, c1, q2, c2, self.max_quads)
        if scale == 2:
            # pyramid pixel (r, c) covers full-res [2r, 2r+1] x
            # [2c, 2c+1]; its center sits at 2x + 0.5
            quads = quads * 2.0 + 0.5
        return quads, counts

    def _dispatch_decode(self, dev_chunk, quads, counts):
        """Compact the (C, K) quad buffer (mostly padding) to a static
        bucket of real quads — ~3x fewer sampling gathers — and enqueue the
        fused refine+decode graph.  Returns (out, qframe, total)."""
        C = dev_chunk.shape[0]
        n_real = np.minimum(counts, quads.shape[1])
        qframe = np.repeat(np.arange(C, dtype=np.int32), n_real)
        sel_k = np.concatenate(
            [np.arange(n) for n in n_real] or [np.zeros(0, np.int64)]
        ).astype(np.int64)
        total = qframe.shape[0]
        self._bucket = max(self._bucket, -(-total // 256) * 256)
        bucket = self._bucket
        qq = np.zeros((bucket, 4, 2), np.float32)
        qq[:total] = quads[qframe, sel_k]
        qf = np.zeros(bucket, np.int32)
        qf[:total] = qframe
        qv = np.zeros(bucket, bool)
        qv[:total] = True
        out = refine_decode_fused(
            self.family, dev_chunk, jnp.asarray(qq),
            jnp.asarray(qf), jnp.asarray(qv), do_refine=self.refine,
        )
        return out, qf, total

    def _collect_results(self, out, qf, total, nb) -> List[Dict[int, np.ndarray]]:
        """Fetch decode outputs and build per-frame {tag_id: corners},
        keeping the lowest-hamming quad per (frame, tag).  Winner selection
        is a vectorized lexsort group-by; Python touches only the final
        detections (r02 verdict #8)."""
        tag_id = np.asarray(out["tag_id"])
        hamming = np.asarray(out["hamming"])
        valid = np.asarray(out["valid"])
        corners = np.asarray(out["corners"])  # (bucket,4,2)

        results: List[Dict[int, np.ndarray]] = [dict() for _ in range(nb)]
        idx = np.flatnonzero(valid[:total])
        if idx.size:
            fr = qf[idx]
            tid = tag_id[idx]
            ham = hamming[idx]
            order = np.lexsort((ham, tid, fr))
            fr, tid, qi = fr[order], tid[order], idx[order]
            first = np.ones(order.size, bool)
            first[1:] = (fr[1:] != fr[:-1]) | (tid[1:] != tid[:-1])
            for b, t, q in zip(fr[first], tid[first], qi[first]):
                if b < nb:
                    results[b][int(t)] = corners[q].copy()
        return results

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
            if dev_images is None:
                raise ValueError("need images or dev_images")
            dev_all = dev_images
        elif dev_images is not None:
            dev_all = dev_images
        else:
            raw = np.asarray(images)
            if raw.ndim == 3 and raw.dtype == np.uint8:
                # raw uint8 upload (4x cheaper over the link); threshold,
                # refine and decode cast on device
                dev_all = jnp.asarray(raw)
            else:
                dev_all = jnp.asarray(np.stack([_to_gray_f32(im) for im in raw]))
        B, H, W = dev_all.shape

        # Video fast path: board-informed frame-to-frame tracking (see
        # track.py).  Falls back to the cold pipeline below per frame via
        # its trigger policy; whole-batch cold is kept for board-less use.
        if board is not None and self.track and self.refine and B > 0:
            return self._detect_batch_tracked(dev_all, board)

        # Enqueue every chunk's threshold up front (dispatch is async), so
        # the packed-bitmap downloads of chunk i overlap the device work of
        # chunks i+1...
        #
        # On accelerators the chunk shape is FIXED at self.chunk even for
        # small batches (padding with repeated frames): every distinct
        # shape costs a 30-90 s remote compile, so a 24-image dataset must
        # reuse the same graphs as a 600-image one.  On CPU (tests,
        # notebooks) compiles are cheap and small batches keep their
        # natural size.
        import jax

        if jax.default_backend() == "cpu":
            C = min(self.chunk, B)
        else:
            C = self.chunk
        n_chunks = (B + C - 1) // C

        # Large-image fast path: the pixel-proportional candidate stages
        # (adaptive threshold, bitmap download, native CCL/contour quad
        # extraction) run at HALF resolution when the image is >=
        # pyramid_min_side px a side — tags in that regime are big enough
        # that a 2x2-mean pyramid level loses no candidates, while the
        # download shrinks 4x and the single-core C++ stage sees 4x fewer
        # pixels.  Subpixel refinement and decode bit-sampling always use
        # the FULL-resolution frames (the extracted quads are scaled back
        # below), so accuracy is unchanged.
        scale = 2 if max(H, W) >= self.pyramid_min_side else 1
        sH, sW = H // scale, W // scale
        dev_chunks, packed_chunks = [], []
        for ci in range(n_chunks):
            lo = ci * C
            part = dev_all[lo : lo + C]
            if part.shape[0] < C:  # pad final chunk to keep shapes static
                reps = jnp.repeat(part[-1:], C - part.shape[0], axis=0)
                part = jnp.concatenate([part, reps], axis=0)
            dev_chunks.append(part)
            small = _pool2(part) if scale == 2 else part
            padded, _, _ = pad_to_tile(small)
            packed_chunks.append(adaptive_threshold_packed(padded))
        pw = int(pad_to_tile(dev_all[:1, :sH, :sW])[0].shape[-1])

        # Prefetch the packed bitmaps on a background thread: the link
        # download of chunk i+1 overlaps the host quad extraction of
        # chunk i (both are serial bottlenecks otherwise).
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        fetches = [pool.submit(np.asarray, p) for p in packed_chunks]

        # Phase 1: host quad extraction per chunk; enqueue fused
        # refine+decode (result fetched in phase 2 — device runs ahead).
        pending = []
        for ci in range(n_chunks):
            with stage("detect/threshold"):
                packed = fetches[ci].result()  # (C, sHp, sWp/8)
                b1 = np.unpackbits(packed, axis=-1, count=pw)[:, :sH, :sW]
            with stage("detect/quadproc"):
                quads, counts = self._extract_quads(b1, board, scale)
            with stage("detect/dispatch"):
                out, qf, total = self._dispatch_decode(dev_chunks[ci], quads, counts)
            pending.append((out, qf, total))
        pool.shutdown(wait=False)

        # Phase 2: fetch decode outputs; enqueue the assist decode.
        all_chunk_results: List[List[Dict[int, np.ndarray]]] = []
        assist_pending = []
        for ci in range(n_chunks):
            out, qf, total = pending[ci]
            nb = min(C, B - ci * C)
            with stage("detect/decode"):
                chunk_results = self._collect_results(out, qf, total, nb)
            all_chunk_results.append(chunk_results)

            if board is not None:
                from .assist import assist_candidates

                with stage("detect/assist"):
                    cand, aq, af, av = assist_candidates(board, chunk_results, W, H)
                    if cand is not None:
                        aout = refine_decode_fused(
                            self.family, dev_chunks[ci], jnp.asarray(aq),
                            jnp.asarray(af), jnp.asarray(av),
                            do_refine=self.refine,
                            # reuse the primary pass's device-resident
                            # sharpened frames (skips a second unsharp
                            # over the whole chunk)
                            sharp=out["sharp"],
                        )
                        assist_pending.append((ci, cand, aout))

        # Phase 3: fetch + merge assist results.
        if assist_pending:
            from .assist import assist_merge

            with stage("detect/assist"):
                for ci, cand, aout in assist_pending:
                    assist_merge(self.family, cand, aout, all_chunk_results[ci])

        return [r for chunk in all_chunk_results for r in chunk]

    # --------------------------------------------------- tracking fast path
    def _detect_frames_cold(
        self, dev_sub, board, do_assist: bool = True, packed_pre=None
    ) -> List[Dict[int, np.ndarray]]:
        """Synchronous cold pipeline (threshold -> CCL -> decode -> assist)
        on a small device batch — the tracking mode's fallback unit.

        ``do_assist=False`` skips the board-assist decode: when healthy
        tracked detections are merged over this result the assist pass is
        redundant (tracking already ran an assist-equivalent
        predict+decode on every tag).  ``packed_pre`` accepts a
        pre-dispatched threshold output so cadence audits can overlap the
        device threshold with the chunk's tracking scan."""
        C, H, W = dev_sub.shape
        scale = 2 if max(H, W) >= self.pyramid_min_side else 1
        sH, sW = H // scale, W // scale
        with stage("detect/threshold"):
            if packed_pre is None:
                packed_pre = threshold_front(dev_sub, scale)
            packed = np.asarray(packed_pre)
            pw = int(packed.shape[-1]) * 8
            b1 = np.unpackbits(packed, axis=-1, count=pw)[:, :sH, :sW]
        with stage("detect/quadproc"):
            quads, counts = self._extract_quads(b1, board, scale)
        with stage("detect/dispatch"):
            out, qf, total = self._dispatch_decode(dev_sub, quads, counts)
        with stage("detect/decode"):
            res = self._collect_results(out, qf, total, C)
        if board is not None and do_assist:
            from .assist import assist_candidates, assist_merge

            with stage("detect/assist"):
                cand, aq, af, av = assist_candidates(board, res, W, H)
                if cand is not None:
                    aout = refine_decode_fused(
                        self.family, dev_sub, jnp.asarray(aq),
                        jnp.asarray(af), jnp.asarray(av),
                        do_refine=self.refine, sharp=out["sharp"],
                    )
                    assist_merge(self.family, cand, aout, res)
        return res

    def _threshold_packed_for(self, dev_sub):
        """Dispatch (async) the fused threshold front-end for a cold group."""
        H, W = dev_sub.shape[-2:]
        scale = 2 if max(H, W) >= self.pyramid_min_side else 1
        return threshold_front(dev_sub, scale)

    def _detect_batch_tracked(self, dev_all, board) -> List[Dict[int, np.ndarray]]:
        """Tracking-mode orchestration (see track.py for the device graph).

        Two audit tiers keep recall anchored to the cold pipeline:

        * INLINE trigger repair — a frame is suspect when a tag with a
          valid in-bounds prediction hard-failed (not benign, not
          known-bad) or too few tags were accepted.  The leading suspect
          group is cold-verified immediately; when cold recovers tags
          tracking lost, the carry is re-seeded there and the rest of the
          chunk RE-SCANNED (one bad frame must not poison the chunk).
        * POST-HOC cadence audit — every ``cold_every``-th frame is
          cold-verified in one batched phased sweep after the main loop;
          improvements re-scan the following window.  This bounds how long
          a predictor blind spot (a tag cold finds but prediction+decode
          cannot re-acquire) can persist: at most one cadence interval.

        known_bad = tags whose hard failure a cold audit CONFIRMED
        (genuinely undetectable then: occlusion, rim clipping); their
        later failures don't re-trigger.  Entries are never removed —
        recovery happens through per-frame re-attempts or audits.

        Cold results take precedence; tracked tags the cold pass missed
        are merged in.  The carry persists across detect_batch calls so
        streaming loaders keep tracking; reset_tracking() between
        unrelated sequences.
        """
        import jax

        from .track import (
            MIN_TRACK_TAGS,
            detections_to_arrays,
            track_chunk,
        )

        B, H, W = dev_all.shape
        C = min(self.chunk, B) if jax.default_backend() == "cpu" else self.chunk
        C += C % 2  # the tracking scan processes frame PAIRS per step
        n_tags = board.n_tags
        first = board.config.first_id
        board_xy = jnp.asarray(
            board.p3d.reshape(n_tags, 4, 3)[:, :, :2].astype(np.float32)
        )
        first_dev = jnp.asarray(np.int32(first))

        st = self._tstate
        if (
            st is None
            or st["wh"] != (W, H)
            or st["board"] is not board
        ):
            st = self._tstate = {
                "wh": (W, H), "board": board,
                "c1": None, "v1": None, "c2": None, "v2": None,
                "c3": None, "v3": None,
                # tag -> global frame index of the last cold CONFIRMATION
                # that the tag is undetectable; entries expire after
                # cold_every//2 frames so a tag that becomes findable
                # again is re-audited promptly (bounded-staleness recall)
                "known_bad": {}, "frame_idx": 0,
            }

        self.stats = {"frames": B, "cold_frames": 0, "cold_groups": 0,
                      "trigger_frames": 0}

        def run_cold(frames: List[int], do_assist=True, packed_pre=None):
            """Cold-detect absolute frame indices in fixed-size groups."""
            outres: Dict[int, Dict[int, np.ndarray]] = {}
            G = self.cold_chunk
            for g in range(0, len(frames), G):
                grp = frames[g : g + G]
                idx = np.asarray(grp + [grp[-1]] * (G - len(grp)), np.int32)
                dev_sub = jnp.take(dev_all, jnp.asarray(idx), axis=0)
                res = self._detect_frames_cold(
                    dev_sub, board, do_assist=do_assist,
                    packed_pre=packed_pre if g == 0 else None,
                )
                self.stats["cold_groups"] += 1
                self.stats["cold_frames"] += len(grp)
                for k, f in enumerate(grp):
                    outres[f] = res[k]
            return outres

        results: List[Dict[int, np.ndarray]] = [dict() for _ in range(B)]
        # whole-batch tracked outputs (bool masks + corners; ~0.6 MB at
        # 534 frames) — global arrays keep the audit logic chunk-agnostic
        g_cor = np.zeros((B, n_tags, 4, 2), np.float32)
        g_acc = np.zeros((B, n_tags), bool)
        g_att = np.zeros((B, n_tags), bool)
        g_ben = np.zeros((B, n_tags), bool)
        coldres: Dict[int, Dict[int, np.ndarray]] = {}

        def scan_dispatch(f0: int, carry6):
            """Enqueue the tracking scan over frames [f0, f0+C) (clamped,
            repeat-last padded) with the given (c3,v3,c2,v2,c1,v1) carry;
            returns device arrays (fetch with scan_fetch)."""
            idx = np.minimum(np.arange(f0, f0 + C), B - 1).astype(np.int32)
            partx = jnp.take(dev_all, jnp.asarray(idx), axis=0)
            return track_chunk(
                self.family, partx, board_xy, first_dev,
                *(jnp.asarray(a) for a in carry6),
            )

        def scan_fetch(outs) -> tuple:
            return tuple(np.asarray(o) for o in outs)

        def scan_from(f0: int, carry6) -> tuple:
            return scan_fetch(scan_dispatch(f0, carry6))

        def carry_at(f: int) -> tuple:
            """(c3,v3,c2,v2,c1,v1) carry from merged results ending at f."""
            c1, v1 = detections_to_arrays(results[f], board)
            if f - 1 >= 0 and results[f - 1]:
                c2, v2 = detections_to_arrays(results[f - 1], board)
            else:
                c2, v2 = c1.copy(), np.zeros(n_tags, bool)
            if f - 2 >= 0 and results[f - 2]:
                c3, v3 = detections_to_arrays(results[f - 2], board)
            else:
                c3, v3 = c1.copy(), np.zeros(n_tags, bool)
            return (c3, v3, c2, v2, c1, v1)

        def write_result(f: int) -> None:
            """Rebuild results[f] from the tracked arrays, folding in any
            cold detections (cold wins on conflicts)."""
            tracked = {
                int(t) + first: g_cor[f, t].copy()
                for t in np.flatnonzero(g_acc[f])
            }
            if f in coldres:
                merged = dict(coldres[f])
                for t, cc in tracked.items():
                    if t not in merged:
                        merged[t] = cc
                results[f] = merged
            else:
                results[f] = tracked

        def apply_scan(f0: int, arrs, upto: int) -> None:
            """Write scan outputs into the global arrays for frames
            [f0, upto) and rebuild their results."""
            n = min(C, upto - f0, B - f0)
            g_cor[f0 : f0 + n] = arrs[0][:n]
            g_acc[f0 : f0 + n] = arrs[1][:n]
            g_att[f0 : f0 + n] = arrs[2][:n]
            g_ben[f0 : f0 + n] = arrs[3][:n]
            for f in range(f0, f0 + n):
                write_result(f)

        def fails_at(f: int) -> set:
            return set(
                int(t)
                for t in np.flatnonzero(g_att[f] & ~g_acc[f] & ~g_ben[f])
            )

        def audit_trigger(f: int) -> bool:
            return (
                not fails_at(f) <= st["known_bad"].keys()
                or int(g_acc[f].sum()) < MIN_TRACK_TAGS
            )

        def merge_frame(f: int) -> bool:
            """Fold a cold result into frame f; extend the known-bad
            memory with COLD-CONFIRMED failures; return True when cold
            contributed tags tracking lacked (carry past f improvable).

            Entries are never removed when a tag reappears: removal
            re-armed the audit on every detect->fail flip of marginal rim
            tags (both pipelines flicker on them, weakly correlated).  A
            known-bad tag that becomes findable again is recovered by the
            per-frame predict+decode or, at the latest, by the next
            audited frame's merge + forward re-scan — the cadence bounds
            the staleness."""
            added = any(t not in results[f] for t in coldres[f])
            # ALL audited hard-failures enter the memory — including tags
            # cold could find (a predictor blind spot): their recall is
            # carried by this frame's merge + forward re-scan and by the
            # cadence audits, while re-triggering on every recurrence cost
            # a cold group + re-scan per event (measured: the same tag
            # fired twice 8 frames apart).
            for t in fails_at(f):
                st["known_bad"][t] = start_gidx + f
            write_result(f)
            return added

        start_gidx = st["frame_idx"]
        # absolute indices of the cadence audit frames (known a priori)
        cadence_all = (
            [f for f in range(B) if (start_gidx + f) % self.cold_every == 0]
            if self.cold_every > 0
            else []
        )

        pos = 0
        prefetch = None  # (start_frame, carry, device outs) of the next scan
        deferred: set = set()  # single-tag suspects left to the post-hoc audit
        while pos < B:
            nb = min(C, B - pos)

            seed_res = None
            if st["c1"] is None:
                # first frame ever: cold-detect it to seed the carry
                with stage("detect/track-cold"):
                    seed_res = run_cold([pos])[pos]
                coldres[pos] = seed_res
                c1, v1 = detections_to_arrays(seed_res, board)
                st["c1"], st["v1"] = c1, v1
                st["c2"], st["v2"] = c1.copy(), np.zeros(n_tags, bool)
                st["c3"], st["v3"] = c1.copy(), np.zeros(n_tags, bool)

            with stage("detect/track"):
                carry_now = (
                    st["c3"], st["v3"], st["c2"], st["v2"], st["c1"], st["v1"],
                )
                if (
                    prefetch is not None
                    and prefetch[0] == pos
                    and all(
                        np.array_equal(a, b)
                        for a, b in zip(prefetch[1], carry_now)
                    )
                ):
                    arrs = scan_fetch(prefetch[2])
                else:
                    arrs = scan_from(pos, carry_now)
                prefetch = None
            apply_scan(pos, arrs, pos + nb)
            if seed_res is not None:
                # bootstrap the known-bad memory from the seed frame: its
                # full-cold result confirms which of the scan's frame-0
                # hard failures are genuinely undetectable, sparing the
                # first chunk a repair round per marginal tag
                merge_frame(pos)
            if pos + nb < B:
                # software pipeline: enqueue the NEXT chunk's scan on the
                # tracked-only carry so the device runs it while the host
                # audits this chunk; if the audits end up correcting the
                # carry (rare), the prefetch is dropped at the next
                # iteration's equality check and re-dispatched
                with stage("detect/track"):
                    pre_carry = carry_at(pos + nb - 1)
                    prefetch = (
                        pos + nb, pre_carry, scan_dispatch(pos + nb, pre_carry)
                    )

            with stage("detect/track-cold"):
                # Audit-repair loop: cold-verify the FIRST suspect frame;
                # when cold recovers tags tracking lost, re-seed the carry
                # there and RE-SCAN the rest of the chunk — without this a
                # single bad frame poisons the in-scan carry and every
                # later frame of the chunk becomes a fallback (measured:
                # a coasting-velocity runaway turned 1 failed frame into
                # 27 cold frames).
                #
                # Novel failures on HEALTHY frames (at least half the
                # board still accepted) do NOT repair inline: a few blind
                # tags cannot poison the carry, and each inline event costs
                # a cold group + re-scan (~1 s of link latency; the
                # 534-frame bench measured 10 such events).  They are
                # marked for the batched post-hoc audit instead, which
                # merges cold detections and re-scans on improvement — the
                # same cadence-bounded recall at a fraction of the cost.
                # Inline repair stays for genuine degradation (collapsed
                # carry, heavy occlusion).
                for _repair in range(4):
                    trig = []
                    for k in range(nb):
                        f = pos + k
                        if f in coldres or f in deferred or not audit_trigger(f):
                            continue
                        novel = fails_at(f) - st["known_bad"].keys()
                        if int(g_acc[f].sum()) >= max(
                            2 * MIN_TRACK_TAGS, n_tags // 2
                        ):
                            deferred.add(f)
                            for t in novel:
                                # tolerate until the audit re-judges it
                                st["known_bad"][t] = start_gidx + f
                            continue
                        trig.append(f)
                    if not trig:
                        break
                    # audit the whole leading suspect group in ONE cold
                    # batch (a carry cascade makes consecutive frames
                    # suspect; one frame per iteration paid the ~2 link
                    # round trips per frame).  Assist is skipped: the cold
                    # result only re-seeds the carry / audits localization,
                    # and tracked detections merge on top anyway.
                    grp = trig[: self.cold_chunk]
                    self.stats["trigger_frames"] += len(grp)
                    self.stats.setdefault("trigger_log", []).append(
                        (grp[0], sorted(fails_at(grp[0]) - st["known_bad"].keys()))
                    )
                    # assist is skippable only while tracking still carries
                    # the frame's recall (the cold result then just re-seeds
                    # / audits); when tracking collapsed, the cold result IS
                    # the frame's content and needs full quality
                    ok_skip = all(
                        int(g_acc[f].sum()) >= 2 * MIN_TRACK_TAGS for f in grp
                    )
                    coldres.update(run_cold(grp, do_assist=not ok_skip))
                    improved_at = None
                    for f in grp:
                        if merge_frame(f) and improved_at is None:
                            improved_at = f
                    if improved_at is not None and improved_at < pos + nb - 1:
                        with stage("detect/track"):
                            arrs2 = scan_from(
                                improved_at + 1, carry_at(improved_at)
                            )
                        apply_scan(improved_at + 1, arrs2, pos + nb)
                # safety sweep: anything still suspect goes cold outright
                trig = [
                    pos + k
                    for k in range(nb)
                    if pos + k not in coldres
                    and pos + k not in deferred
                    and audit_trigger(pos + k)
                ]
                if trig:
                    self.stats["trigger_frames"] += len(trig)
                    ok_skip = all(
                        int(g_acc[f].sum()) >= 2 * MIN_TRACK_TAGS for f in trig
                    )
                    coldres.update(run_cold(trig, do_assist=not ok_skip))
                    for f in trig:
                        merge_frame(f)

            last = pos + nb - 1
            (
                st["c3"], st["v3"], st["c2"], st["v2"], st["c1"], st["v1"],
            ) = carry_at(last)
            st["frame_idx"] += nb
            pos += nb

        # ---- post-hoc cadence audit (recall insurance) ----------------
        # One BATCHED phased sweep instead of per-chunk synchronous cold
        # groups: at 534 frames the inline version cost ~0.45 s per group
        # of mostly link latency; batching overlaps the downloads, the
        # native quadproc and the decode fetches across groups.  Audited
        # frames merge cold detections; when cold recovered tags tracking
        # lost, the window after the frame is re-scanned from the
        # corrected carry, so a predictor blind spot never persists past
        # one cadence interval.
        audit = sorted(
            set(f for f in cadence_all if f not in coldres) | deferred
        )
        if audit:
            with stage("detect/track-audit"):
                G = self.cold_chunk
                groups, packeds, subs = [], [], []
                for g in range(0, len(audit), G):
                    grp = audit[g : g + G]
                    idx = np.asarray(
                        grp + [grp[-1]] * (G - len(grp)), np.int32
                    )
                    sub = jnp.take(dev_all, jnp.asarray(idx), axis=0)
                    groups.append(grp)
                    subs.append(sub)
                    packeds.append(self._threshold_packed_for(sub))
                # phase 1: bitmaps -> quadproc -> enqueue decode, with the
                # per-group downloads prefetched on a thread so the link
                # transfer of group i+1 overlaps the host CCL of group i
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(max_workers=2)
                fetches = [pool.submit(np.asarray, p) for p in packeds]
                pend = []
                for grp, sub, fut in zip(groups, subs, fetches):
                    scale = 2 if max(H, W) >= self.pyramid_min_side else 1
                    sH, sW = H // scale, W // scale
                    pk = fut.result()
                    b1 = np.unpackbits(pk, axis=-1, count=pk.shape[-1] * 8)[
                        :, :sH, :sW
                    ]
                    quads, counts = self._extract_quads(b1, board, scale)
                    out, qf, total = self._dispatch_decode(sub, quads, counts)
                    pend.append((grp, out, qf, total))
                    self.stats["cold_groups"] += 1
                    self.stats["cold_frames"] += len(grp)
                # phase 2: fetch (prefetched) + merge + forward re-scan
                outs_np = [
                    pool.submit(
                        lambda o: {k: np.asarray(v) for k, v in o.items()
                                   if k != "sharp"},
                        out,
                    )
                    for _, out, _, _ in pend
                ]
                pool.shutdown(wait=False)
                rescan_until = -1
                for (grp, out, qf, total), fut in zip(pend, outs_np):
                    res = self._collect_results(fut.result(), qf, total, len(grp))
                    for k, f in enumerate(grp):
                        coldres[f] = res[k]
                for f in audit:
                    improved = merge_frame(f)
                    if improved and f >= rescan_until and f + 1 < B:
                        with stage("detect/track"):
                            arrs = scan_from(f + 1, carry_at(f))
                        apply_scan(f + 1, arrs, min(f + 1 + C, B))
                        # audited frames inside the window keep their cold
                        # detections (write_result folds coldres back in)
                        rescan_until = f + 1 + C
            (
                st["c3"], st["v3"], st["c2"], st["v2"], st["c1"], st["v1"],
            ) = carry_at(B - 1)
        return results

    # -------------------------------------------------------------- single
    def detect(self, image) -> Dict[int, np.ndarray]:
        """Single-image detection (reference-compatible convenience)."""
        return self.detect_batch(np.asarray(image)[None])[0]
