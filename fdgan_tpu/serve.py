"""Streaming batched-inference engine — the production serving path.

The reference's serving story is ``demo.py:89-151``: a synchronous
one-image-at-a-time loop (load → pad → forward → block → save). This module
is its TPU-native upgrade, built around how XLA actually executes:

* **Shape buckets** — every distinct input shape is a separate XLA program.
  Arbitrary H×W inputs are reflect-padded up to the next multiple of
  ``bucket`` (which also satisfies FDGAN's ÷8 constraint), so a whole
  workload of ragged images compiles a handful of programs, not hundreds.
* **Batch ladder** — request groups are padded up to a fixed set of batch
  sizes (1, 2, 4, 8 by default) for the same reason. Batched dispatch is
  what fills the MXU: the dense blocks' 32-channel convs are
  batch-starved at batch 1 (PERFORMANCE.md).
* **Async pipeline** — JAX dispatch is asynchronous; ``stream()`` keeps a
  bounded window of in-flight batches so the host stages + pads + uploads
  the next batches while the device computes the current one. The only
  sync per batch is the result fetch.
* **Running-stats BN by default** — serving must be per-image deterministic;
  batch-stats mode (the reference's ``netG.train()`` inference quirk,
  README.md:38) couples images within a batch and is available but opt-in.

No framework-level daemon is pretended here: this is a library engine
(compiled-program cache + pipelined executor) that a server wraps.
"""

from __future__ import annotations

import collections
import threading
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fdgan_tpu.models import fdgan_fast
from fdgan_tpu.nn.tree import cast_tree

__all__ = ["InferenceEngine"]


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class InferenceEngine:
    """Compiled-program cache + batched executor for FDGAN dehazing.

    Parameters
    ----------
    params : FDGAN parameter pytree (fp32; cast internally per ``precision``).
    precision : 'bf16' (serving default) or 'fp32' (sets HIGHEST matmul
        precision like cli/demo.py — XLA TPU otherwise routes fp32 convs
        through bf16 passes).
    bn_mode : 'running' (default, per-image deterministic) or 'batch'
        (reference-parity; couples images in a batch — padded slots are
        filled by repeating real images so statistics stay in-distribution).
    bucket : spatial bucket size; inputs are reflect-padded up to multiples
        of this (must itself be a multiple of 8). Default 64 — except in
        batch-BN mode, where it defaults to 8 (demo.py parity): spatial
        padding enters the batch statistics, so batch mode trades program
        reuse for stats fidelity unless you override it.
    batch_sizes : ascending ladder of compiled batch sizes.
    tile, halo : when ``tile`` > 0, images larger than ``tile`` on either
        axis are routed through halo-tiled inference (dist/tiling.py)
        instead of being padded to a monolithic bucket.
    mesh : optional ``jax.sharding.Mesh`` (dist/mesh.py) — batches are
        sharded on its 'data' axis and parameters replicated, scaling
        serving throughput across chips over ICI (the TPU-native analog of
        the reference's ``nn.DataParallel``, demo.py:89). Every batch-ladder
        rung must be divisible by the data-axis size; with the default
        ladder it is scaled by that size automatically.
    spatial : with a mesh whose 'spatial' axis is > 1, also shard the image
        H dimension across it — GSPMD inserts the conv halo exchanges
        (parity-tested in tests/test_dist.py). This is the latency lever for
        few large images, complementing the batch ('data') throughput lever.
    output : 'float32' (default — results in [-1, 1]) or 'uint8' (results
        quantised on device to ``round((y+1)*127.5)`` in [0, 255]): a 4×
        smaller device→host fetch for PNG-oriented serving, lossy by
        ≤1/255 per pixel (see ``_forward``).
    input : 'float32' (default) or 'uint8' — the STAGING dtype: what
        crosses host→device. 'uint8' uploads 1 byte/pixel and fuses the
        ``x/255`` normalisation into the compiled forward, which is
        bit-identical to the float path whenever the source really is
        8-bit (PNG/JPEG decoders hand you uint8; dividing by 255 on host
        vs device is the same fp32 op). Either mode ACCEPTS both uint8
        [0, 255] and float [0, 1] images; a float image given to a
        'uint8' engine is round-quantised on host first (lossy ≤1/510 —
        the one combination that costs precision).
    """

    def __init__(
        self,
        params: dict,
        *,
        precision: str = "bf16",
        bn_mode: str = "running",
        bucket: Optional[int] = None,
        batch_sizes: Optional[Sequence[int]] = None,
        tile: int = 0,
        halo: int = 128,
        mesh=None,
        spatial: bool = False,
        output: str = "float32",
        input: str = "float32",
        auto_warm: bool = False,
    ):
        if output not in ("float32", "uint8"):
            raise ValueError(f"output must be 'float32' or 'uint8', got {output!r}")
        if input not in ("float32", "uint8"):
            raise ValueError(f"input must be 'float32' or 'uint8', got {input!r}")
        if bucket is None:
            bucket = 8 if bn_mode == "batch" else 64
        if bucket % 8:
            raise ValueError("bucket must be a multiple of 8 (three ÷2 stages)")
        n_data = int(mesh.shape["data"]) if mesh is not None else 1
        if batch_sizes is None:
            batch_sizes = tuple(b * n_data for b in (1, 2, 4, 8))
        if list(batch_sizes) != sorted(set(batch_sizes)) or not batch_sizes:
            raise ValueError("batch_sizes must be ascending and non-empty")
        if any(b < 1 for b in batch_sizes):
            raise ValueError(f"batch_sizes must be positive, got {tuple(batch_sizes)}")
        if any(b % n_data for b in batch_sizes):
            raise ValueError(
                f"batch_sizes {tuple(batch_sizes)} must be divisible by the "
                f"mesh data-axis size {n_data}"
            )
        self.bn_mode = bn_mode
        self.bucket = int(bucket)
        self.batch_sizes = tuple(int(b) for b in batch_sizes)
        self.tile = int(tile)
        self.halo = int(halo)
        self.mesh = mesh
        self.output = output
        self.input = input
        self._stage_dtype = np.uint8 if input == "uint8" else np.float32
        self._dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        cast = cast_tree(params, self._dtype) if precision == "bf16" else params
        if mesh is not None:
            from fdgan_tpu.dist.mesh import batch_sharding, shard_params

            n_spatial = int(mesh.shape.get("spatial", 1))
            if spatial and self.bucket % n_spatial:
                # device_put rejects uneven shardings, so every bucketed H
                # (a multiple of bucket) must divide by the spatial axis
                raise ValueError(
                    f"bucket {self.bucket} must be divisible by the mesh "
                    f"'spatial' axis size {n_spatial} for H sharding"
                )
            self._params = shard_params(cast, mesh)
            self._batch_sharding = batch_sharding(mesh, 1 if spatial else None)
        else:
            self._params = jax.device_put(cast)
            self._batch_sharding = None
        if precision == "fp32":
            # checkpoint-parity fp32: scoped (not global-config) so an engine
            # never changes numerics for unrelated code in the process
            def forward(p, x):
                with jax.default_matmul_precision("highest"):
                    return self._forward(p, x)

            self._fwd = jax.jit(forward)
        else:
            self._fwd = jax.jit(self._forward)
        self._lock = threading.Lock()
        self.weights_version = 0  # bumped by reload(); 0 = the __init__ weights
        self.stats = {
            "images": 0,
            "batches": 0,
            "compiles": 0,
            "reloads": 0,
            "padded_frac": 0.0,
        }
        self._pix_real = 0
        self._pix_padded = 0
        self._auto_warm = bool(auto_warm)
        self._warming: set = set()  # (H, W) buckets with a warm thread live
        self._warmed: set = set()   # (H, W) buckets ever auto-warmed (dedup)

    # --- compiled kernel ---------------------------------------------------

    def _forward(self, p, x):
        if x.dtype == jnp.uint8:
            # input='uint8' staging: normalise ON DEVICE, in fp32, exactly
            # as the host path would (np fp32 x/255 then cast) — so the
            # uint8-staged forward is bit-identical to the float-staged
            # one for 8-bit sources, while the upload moves 1 byte/pixel.
            x = x.astype(jnp.float32) / 255.0
        y = fdgan_fast.apply(p, x.astype(self._dtype), bn_mode=self.bn_mode)
        if self.output == "uint8":
            # Quantise the tanh output ON DEVICE: the fetch then moves 1
            # byte/pixel instead of 4 — PNG writers need uint8 anyway, and
            # device→host bandwidth is the serving ceiling on constrained
            # links (~4 MB/s tunnel here; PERFORMANCE.md). The affine runs
            # in fp32 (bf16's 8-bit mantissa would itself cost ~1 level),
            # XLA fuses it into the last layer. Lossy by ≤1/255 vs the
            # fp32 path — opt-in, never the library default.
            y32 = y.astype(jnp.float32)
            return jnp.clip(jnp.round((y32 + 1.0) * 127.5), 0.0, 255.0).astype(
                jnp.uint8
            )
        return y.astype(jnp.float32)

    # --- shape management ----------------------------------------------------

    def _bucket_hw(self, h: int, w: int) -> Tuple[int, int]:
        return _round_up(max(h, 8), self.bucket), _round_up(max(w, 8), self.bucket)

    def _batch_bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def _ingest(self, img) -> np.ndarray:
        """Bring one caller image to the engine's staging dtype.

        uint8 arrays always mean [0, 255], floats always mean [0, 1];
        only the float→uint8 direction quantises (round, lossy ≤1/510)."""
        a = np.asarray(img)
        if a.dtype == np.uint8:
            return a if self.input == "uint8" else a.astype(np.float32) / 255.0
        if self.input == "uint8":
            a = np.asarray(a, np.float32)
            return np.clip(np.round(a * 255.0), 0.0, 255.0).astype(np.uint8)
        return np.asarray(a, np.float32)

    @staticmethod
    def _pad_hw(img: np.ndarray, H: int, W: int) -> np.ndarray:
        ph, pw = H - img.shape[0], W - img.shape[1]
        if ph or pw:
            # reflect needs pad < dim; fall back to edge for tiny images
            mode = "reflect" if ph < img.shape[0] and pw < img.shape[1] else "edge"
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
        return img

    # --- public API ------------------------------------------------------------

    def warmup(
        self,
        shapes: Iterable[Tuple[int, int]],
        batch: Optional[int] = None,
    ) -> None:
        """Pre-compile the programs for the given (H, W) input shapes.

        ``batch=None`` (default) warms EVERY rung of the batch ladder —
        under concurrent load the engine dispatches whichever rung fits
        the coalesced group, so a partial warmup leaves the remaining
        programs to compile on the request path (minutes on a
        remote-compile link). Pass an int to warm just that rung.

        Calls the compiled forward directly (not ``_dispatch``) so warmup
        does not inflate the batch/image/padding statistics — only the
        compile counter moves."""
        rungs = self.batch_sizes if batch is None else (batch,)
        for h, w in shapes:
            H, W = self._bucket_hw(h, w)
            for rung in rungs:
                b = self._batch_bucket(rung)
                x = np.zeros((b, H, W, 3), self._stage_dtype)
                if self._batch_sharding is not None:
                    x = jax.device_put(x, self._batch_sharding)
                else:
                    x = jnp.asarray(x)
                with self._lock:
                    n_before = self._cache_size()
                    y = self._fwd(self._params, x)
                    if n_before is not None:
                        n_after = self._cache_size()
                        if n_after is not None:
                            self.stats["compiles"] += n_after - n_before
                y.block_until_ready()

    def _cache_size(self):
        try:
            return self._fwd._cache_size()
        except Exception:
            return None

    def _dispatch(self, x: jax.Array) -> jax.Array:
        fresh = False
        with self._lock:
            n_before = self._cache_size()
            y = self._fwd(self._params, x)
            if n_before is not None:
                n_after = self._cache_size()
                if n_after is not None:
                    delta = n_after - n_before
                    self.stats["compiles"] += delta
                    fresh = delta > 0
            self.stats["batches"] += 1
        if fresh and self._auto_warm:
            # a shape bucket just compiled its FIRST rung on the request
            # path; warm the remaining rungs in the background so a later
            # concurrency climb doesn't hit a minutes-long compile mid-run
            self._spawn_auto_warm(int(x.shape[1]), int(x.shape[2]), int(x.shape[0]))
        return y

    def _spawn_auto_warm(self, H: int, W: int, done_rung: int) -> None:
        with self._lock:
            if (H, W) in self._warmed:
                # dedup is PERMANENT: a concurrent request-path compile of a
                # different bucket can land inside another dispatch's cache-
                # size window and mark it "fresh" — without this, that
                # misattribution would re-spawn warm threads forever
                return
            self._warmed.add((H, W))
            self._warming.add((H, W))

        def _warm():
            try:
                for rung in self.batch_sizes:
                    b = self._batch_bucket(rung)
                    if b == done_rung:
                        continue
                    x = np.zeros((b, H, W, 3), self._stage_dtype)
                    if self._batch_sharding is not None:
                        x = jax.device_put(x, self._batch_sharding)
                    else:
                        x = jnp.asarray(x)
                    # compile OUTSIDE the engine lock (jit dispatch is
                    # thread-safe): live traffic keeps flowing while this
                    # rung compiles. Deliberately NOT counted in
                    # stats["compiles"]: cache-size bracketing from a second
                    # thread races the request path and double-counts.
                    jax.block_until_ready(self._fwd(self._params, x))
            except Exception:  # warm failures must never kill serving
                pass
            finally:
                with self._lock:
                    self._warming.discard((H, W))

        threading.Thread(target=_warm, name=f"fdgan-warm-{H}x{W}", daemon=True).start()

    def reload(self, params: dict) -> int:
        """Hot-swap the generator weights with zero downtime.

        The compiled programs take parameters as an ARGUMENT (never baked
        in), so a same-structure swap reuses every cached XLA program: no
        recompile, no dropped requests. Batches already dispatched finish
        on the old weights; every dispatch after the swap uses the new
        ones — the swap happens under the same lock that serialises
        dispatches, so one batch is never split across versions. This is
        the checkpoint-promotion path: train with ``--keepBest``, then
        ``POST /reload`` on the HTTP server (serve_http.py) pointing at
        the new ``netG_best``.

        The new tree is cast/sharded/uploaded and synced BEFORE the swap,
        so serving never stalls on the (potentially slow) host→device
        transfer. Raises ``ValueError`` naming the first mismatching leaf
        when the tree structure, a shape, or a dtype differs from the
        loaded weights — a silent mismatch would recompile at best and
        crash mid-request at worst. Returns the new ``weights_version``.
        """
        cast = cast_tree(params, self._dtype) if self._dtype == jnp.bfloat16 else params
        import jax.tree_util as jtu

        new_flat, new_def = jtu.tree_flatten_with_path(cast)
        cur_flat, cur_def = jtu.tree_flatten_with_path(self._params)
        if new_def != cur_def:
            raise ValueError(
                f"reload: checkpoint tree structure differs from the loaded "
                f"weights ({new_def.num_leaves} vs {cur_def.num_leaves} leaves) "
                f"— wrong model family or config?"
            )
        for (kp, leaf_n), (_, leaf_c) in zip(new_flat, cur_flat):
            if tuple(leaf_n.shape) != tuple(leaf_c.shape):
                raise ValueError(
                    f"reload: leaf {jtu.keystr(kp)} has shape "
                    f"{tuple(leaf_n.shape)}, loaded weights have "
                    f"{tuple(leaf_c.shape)} — wrong model family or config?"
                )
            if np.dtype(leaf_n.dtype) != np.dtype(leaf_c.dtype):
                raise ValueError(
                    f"reload: leaf {jtu.keystr(kp)} has dtype {leaf_n.dtype}, "
                    f"loaded weights have {leaf_c.dtype}"
                )
        if self.mesh is not None:
            from fdgan_tpu.dist.mesh import shard_params

            new = shard_params(cast, self.mesh)
        else:
            new = jax.device_put(cast)
        jax.block_until_ready(new)  # upload off the serving path
        with self._lock:
            self._params = new
            self.weights_version += 1
            self.stats["reloads"] += 1
            return self.weights_version

    def predict(self, image: np.ndarray) -> np.ndarray:
        """Dehaze one HWC image — float in [0, 1] or uint8 in [0, 255];
        returns HWC fp32 in [-1, 1] (or uint8 in [0, 255] for an
        ``output='uint8'`` engine)."""
        return self.predict_batch([image])[0]

    def predict_batch(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Dehaze a list of HWC images (arbitrary, possibly ragged shapes).

        Images are grouped by shape bucket, each group is chunked onto the
        batch ladder, and results come back in input order.
        """
        out: List[Optional[np.ndarray]] = [None] * len(images)
        for y_async, metas in self._stage(enumerate(images)):
            self._collect(np.asarray(y_async), metas, out)
        return out  # type: ignore[return-value]

    def stream(
        self, images: Iterable[np.ndarray], depth: int = 2, max_wait: float = 0.0
    ) -> Iterator[np.ndarray]:
        """Pipelined streaming inference, yielding results in input order.

        Up to ``depth`` dispatched batches stay in flight; host staging of
        later batches overlaps device compute of earlier ones. ``max_wait``
        (seconds, 0 = off) bounds per-image staging latency: a group whose
        oldest image has waited longer is flushed below its ladder rung —
        including when the input iterator goes idle (a producer thread feeds
        a polled queue, so deadlines fire without new arrivals; the bound
        still requires the consumer to keep iterating this generator)."""
        inflight: collections.deque = collections.deque()
        ready: dict = {}
        next_idx = 0

        def drain_one():
            y_async, metas = inflight.popleft()
            y = np.asarray(y_async)  # the per-batch sync point
            for slot, (idx, h, w) in enumerate(metas):
                # copy: a view would pin the whole padded batch buffer
                ready[idx] = y[slot, :h, :w].copy()

        def emit():
            nonlocal next_idx
            while next_idx in ready:
                yield ready.pop(next_idx)
                next_idx += 1

        for staged in self._stage(enumerate(images), max_wait=max_wait):
            if staged is None:
                # idle tick from _stage: the producer is quiet, so nothing
                # gains from pipelining depth — drain one in-flight batch so
                # finished results reach the caller within the latency bound
                if inflight:
                    drain_one()
                    yield from emit()
                continue
            inflight.append(staged)
            while len(inflight) > depth:
                drain_one()
            yield from emit()
        while inflight:
            drain_one()
            yield from emit()

    # --- staging ---------------------------------------------------------------

    def _timed_events(self, indexed_images, max_wait: float):
        """Wrap an (idx, img) iterator so ``None`` ticks are emitted while
        the producer is idle or blocking: a daemon thread pulls items into a
        small bounded queue; the consumer polls with a sub-``max_wait``
        timeout. This is what lets staging deadlines fire without new
        arrivals. The queue is deliberately shallow (backpressure: the
        producer must not race ahead of the depth-bounded consumer and
        buffer unbounded image memory), and the producer exits promptly if
        the consumer abandons the generator (timeout-put + stop flag)."""
        import queue as _queue

        q: _queue.Queue = _queue.Queue(maxsize=4)
        sentinel = object()
        err: list = []
        stop = threading.Event()

        def produce():
            try:
                for item in indexed_images:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except _queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # re-raised on the consumer side
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.2)
                        break
                    except _queue.Full:
                        continue

        threading.Thread(target=produce, daemon=True).start()
        tick = max(max_wait / 4.0, 0.005)
        try:
            while True:
                try:
                    item = q.get(timeout=tick)
                except _queue.Empty:
                    yield None
                    continue
                if item is sentinel:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()  # unblock the producer if we exit early

    def _stage(self, indexed_images, max_wait: float = 0.0):
        """Group (index, image) pairs into dispatched device batches.

        Yields (async_result, metas) with metas[slot] = (orig_index, h, w);
        the result is NOT synced — callers decide when to fetch. Groups
        flush per shape bucket at the top of the batch ladder; to bound
        head-of-line blocking (and the caller's reorder buffer) the
        oldest group is force-flushed whenever more than 2×top images sit
        staged across groups, or (``max_wait`` > 0) when its oldest image
        has waited longer than that many seconds — checked on every arrival
        AND on idle ticks from ``_timed_events``; remaining stragglers flush
        at end of input."""
        import time as _time

        groups: dict = collections.defaultdict(list)  # (H,W) -> [(idx, img)]
        born: dict = {}  # (H,W) -> arrival time of the group's oldest image
        top = self.batch_sizes[-1]
        max_pending = 2 * top

        def flush(key):
            H, W = key
            items = groups.pop(key)
            n = len(items)
            b = self._batch_bucket(n)
            padded = [self._pad_hw(img, H, W) for _, img in items]
            # pad the batch dimension by cycling real images: in batch-BN
            # mode this keeps the coupled statistics in-distribution
            while len(padded) < b:
                padded.append(padded[len(padded) % n])
            stacked = np.stack(padded)
            if self._batch_sharding is not None:
                batch = jax.device_put(stacked, self._batch_sharding)
            else:
                batch = jnp.asarray(stacked)
            metas = [(idx, img.shape[0], img.shape[1]) for idx, img in items]
            real_pix = sum(im.shape[0] * im.shape[1] for _, im in items)
            with self._lock:  # counters shared with concurrent predict() calls
                self._pix_real += real_pix
                self._pix_padded += b * H * W - real_pix
                self.stats["images"] += n
                self.stats["padded_frac"] = self._pix_padded / max(
                    1, self._pix_real + self._pix_padded
                )
            return self._dispatch(batch), metas

        def flush_aged():
            now = _time.monotonic()
            for k in [k for k, t0 in born.items() if now - t0 > max_wait]:
                if k in groups:
                    born.pop(k, None)
                    yield flush(k)

        if max_wait > 0:
            indexed_images = self._timed_events(indexed_images, max_wait)
        idle_ticks = 0
        for item in indexed_images:
            if item is None:  # idle tick — deadline check first
                idle_ticks += 1
                yield from flush_aged()
                # Signal stream() to drain in-flight work only once the
                # producer has been quiet for ~max_wait (4 sub-ticks): a
                # drain blocks this generator on a result fetch, so doing
                # it on every short burst gap would collapse the pipeline
                # window while images queue unstaged.
                if idle_ticks >= 4:
                    yield None
                continue
            idle_ticks = 0
            idx, img = item
            img = self._ingest(img)
            if img.ndim != 3 or img.shape[-1] != 3:
                raise ValueError(f"expected HWC RGB image, got shape {img.shape}")
            if self.tile and max(img.shape[0], img.shape[1]) > self.tile:
                yield self._stage_tiled(idx, img)
                continue
            key = self._bucket_hw(img.shape[0], img.shape[1])
            if key not in groups:
                born[key] = _time.monotonic()
            groups[key].append((idx, img))
            if len(groups[key]) == top:
                born.pop(key, None)
                yield flush(key)
            elif sum(len(v) for v in groups.values()) > max_pending:
                oldest = min(groups, key=lambda k: groups[k][0][0])
                born.pop(oldest, None)
                yield flush(oldest)
            if max_wait > 0:
                yield from flush_aged()
        for key in list(groups):
            yield flush(key)

    def _stage_tiled(self, idx: int, img: np.ndarray):
        """High-res path: one image through halo-tiled inference (already an
        async device array — same contract as a staged batch).

        With a mesh, each batch-1 tile is device_put REPLICATED (the 'data'
        axis cannot shard a single tile; params are replicated anyway), so
        tiled inference composes with a mesh engine at single-device speed
        per tile — the ladder's data-divisibility rule applies only to the
        bucketed route."""
        from fdgan_tpu.dist.tiling import tiled_apply

        h, w = img.shape[:2]
        H, W = _round_up(h, 8), _round_up(w, 8)
        x = self._pad_hw(img, H, W)[None]
        if self.mesh is not None:
            from fdgan_tpu.dist.mesh import replicate_sharding

            x = jax.device_put(x, replicate_sharding(self.mesh))
        else:
            x = jnp.asarray(x)
        with self._lock:
            n_before = self._cache_size()
            y = tiled_apply(
                lambda t: self._fwd(self._params, t), x, tile=self.tile, halo=self.halo
            )
            if n_before is not None:
                n_after = self._cache_size()
                if n_after is not None:
                    self.stats["compiles"] += n_after - n_before
            self.stats["images"] += 1
            self.stats["batches"] += 1
            self._pix_real += h * w
            self._pix_padded += H * W - h * w
            self.stats["padded_frac"] = self._pix_padded / max(
                1, self._pix_real + self._pix_padded
            )
        return y, [(idx, h, w)]

    @staticmethod
    def _collect(y: np.ndarray, metas, out: List[Optional[np.ndarray]]):
        for slot, (idx, h, w) in enumerate(metas):
            # copy: a view would pin the whole padded batch buffer
            out[idx] = y[slot, :h, :w].copy()
