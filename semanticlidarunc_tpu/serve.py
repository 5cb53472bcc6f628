"""Batched, pipelined scan inference for production serving.

The reference serves scans strictly one at a time (bs=1 tester loop,
/root/reference/src/models/tester.py:383-516; live sensor loop
inference_ouster.py:58-101). On TPU, batching amortizes the fixed per-scan
costs (projection scatter, dispatch, small-tensor tails) and widens every
matmul for the MXU, so a batched server beats B independent single-scan
calls.

Two layers:

- `make_batched_mc_segmenter` / `make_batched_segmenter` (defined in
  `inference.py`, re-exported here): ONE jitted computation taking a
  [B, N, 4+] padded point batch straight to per-point labels (+ H/MI maps
  for MC); the single-scan segmenters are the same traced program at B=1,
  so batched and single-scan serving are bit-identical by construction.
- `ScanServer`: a host-side driver that groups an incoming scan stream into
  batches and keeps ONE batch in flight: batch i+1 is dispatched before
  batch i's results are fetched, so host I/O (reading scans, consuming
  results) overlaps device compute via JAX async dispatch — the TPU
  equivalent of the reference's DataLoader prefetching
  (train_semantics.py:111-127).
"""
from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

import jax
import jax.numpy as jnp

from .inference import (make_batched_mc_segmenter,  # noqa: F401 (re-export)
                        make_batched_segmenter)


class ScanServer:
    """Batched pipelined inference over a stream of scans.

    `stream(scans)` consumes an iterable of (points [N',>=4], valid [N'])
    numpy pairs (ragged N' allowed — padded/truncated to `n_points`) and
    yields per-scan dicts in order. Up to `max_in_flight` batches stay
    dispatched at once: results for the oldest batch are fetched only when
    the in-flight window is full (or the stream ends), so host I/O
    (reading scans, consuming results) overlaps device compute via JAX
    async dispatch across a deeper window than plain double-buffering.

    `serve(scans, on_result)` is the callback form: each scan's result dict
    is delivered to `on_result(result)` as soon as its batch is fetched,
    independent of any consumer pacing — the push analog of `stream`.

    After a stream completes, `last_report()` returns the per-stream
    latency/throughput self-report: scans/s over the whole stream, per-scan
    latency percentiles (enqueue -> result delivery), batch count, and the
    configured window (`tools/bench_serving.py --knee` sweeps
    max_in_flight to locate where added depth stops paying).
    """

    def __init__(self, model, variables, cfg: dict, height: int, width: int,
                 n_samples: int = 20, batch_size: int = 4,
                 n_points: int = 1 << 17, theta_range=None,
                 use_mc: bool = True, rng=None, max_in_flight: int = 2):
        self.batch_size = int(batch_size)
        self.n_points = int(n_points)
        self.use_mc = bool(use_mc)
        self.max_in_flight = max(1, int(max_in_flight))
        self._report = None
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        if use_mc:
            self._run = make_batched_mc_segmenter(
                model, variables, cfg, height, width, n_samples, theta_range)
        else:
            self._run = make_batched_segmenter(model, variables, cfg, height,
                                               width, theta_range)

    def _pad_scan(self, points, valid):
        n = self.n_points
        pts = np.zeros((n, points.shape[1]), np.float32)
        vld = np.zeros((n,), bool)
        m = min(len(points), n)
        pts[:m] = points[:m]
        vld[:m] = np.asarray(valid[:m], bool)
        return pts, vld, m

    def _dispatch(self, group):
        b = self.batch_size
        pts = np.zeros((b, self.n_points, group[0][0].shape[1]), np.float32)
        vld = np.zeros((b, self.n_points), bool)
        counts = []
        for i, (p, v) in enumerate(group):
            pts[i], vld[i], m = self._pad_scan(p, v)
            counts.append(m)
        if self.use_mc:
            self._rng, sub = jax.random.split(self._rng)
            out = self._run(jnp.asarray(pts), jnp.asarray(vld), sub)
        else:
            out = self._run(jnp.asarray(pts), jnp.asarray(vld))
        return out, counts

    def _emit(self, out, counts) -> Iterator[dict]:
        out = jax.device_get(out)
        for i, m in enumerate(counts):
            d = {"point_labels": out[0][i][:m], "segmentation": out[1][i]}
            if self.use_mc:
                d["h_norm"] = out[2][i]
                d["mi_norm"] = out[3][i]
            yield d

    def stream(self, scans: Iterable) -> Iterator[dict]:
        """Ordered generator over per-scan result dicts (see class doc)."""
        import collections
        import time

        t_start = time.perf_counter()
        window = collections.deque()   # (out, counts, [enqueue_times])
        latencies: list[float] = []
        n_scans = n_batches = 0

        def drain_oldest():
            nonlocal n_scans
            out, counts, enq = window.popleft()
            results = list(self._emit(out, counts))   # device_get syncs here
            t_done = time.perf_counter()
            for t0 in enq:
                latencies.append((t_done - t0) * 1e3)
            n_scans += len(results)
            yield from results

        group, enq_times = [], []
        for scan in scans:
            group.append(scan)
            enq_times.append(time.perf_counter())
            if len(group) == self.batch_size:
                window.append(self._dispatch(group) + (enq_times,))
                n_batches += 1
                group, enq_times = [], []
                if len(window) > self.max_in_flight:
                    yield from drain_oldest()
        if group:                       # ragged final batch
            window.append(self._dispatch(group) + (enq_times,))
            n_batches += 1
        while window:
            yield from drain_oldest()

        wall = time.perf_counter() - t_start
        lat = np.asarray(latencies) if latencies else np.zeros((1,))
        self._report = {
            "n_scans": n_scans,
            "n_batches": n_batches,
            "batch_size": self.batch_size,
            "max_in_flight": self.max_in_flight,
            "wall_s": wall,
            "scans_per_sec": n_scans / wall if wall > 0 else 0.0,
            "latency_ms_p50": float(np.percentile(lat, 50)),
            "latency_ms_p95": float(np.percentile(lat, 95)),
            "latency_ms_mean": float(lat.mean()),
        }

    def serve(self, scans: Iterable, on_result) -> dict:
        """Push form: deliver each result to `on_result(dict)` as soon as
        its batch is fetched, regardless of consumer pacing. Returns the
        stream self-report."""
        for result in self.stream(scans):
            on_result(result)
        return self.last_report()

    def last_report(self) -> dict | None:
        """Latency/throughput self-report of the most recent stream."""
        return self._report
