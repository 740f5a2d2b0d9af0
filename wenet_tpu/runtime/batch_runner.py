"""Server-side dynamic batching of concurrent streaming sessions.

The reference serves one decode thread per connection, each running its
own forward (ref: runtime/core/websocket/websocket_server.cc) — fine on
CPU, wasteful on a TPU where a chunk step at B=1 leaves the MXU idle.
Because this framework's streaming state is fixed-shape (same cache and
chunk geometry for every session with the same DecodeOptions), chunks
from many live sessions can be stacked on the batch axis and advanced
in ONE jitted step.

`BatchedChunkRunner` owns a worker thread: sessions `submit()` their
(chunk, caches, offset, valid) and get a Future; the worker coalesces
up to `max_batch` pending requests (waiting at most `flush_ms` for
stragglers), runs the shared batched step, and scatters results back.
Per-session offsets are supported by the batched offset vector; masks
are built per row from each session's cache validity.

Coalesced batches are padded up to the next POWER-OF-TWO bucket
(repeating the final row; pad outputs are discarded), so the server
compiles at most log2(max_batch)+1 chunk-step programs instead of one
per exact arrival count — under real-time traffic the coalesced size
is effectively random in [1, max_batch], and each fresh flagship
compile stalls a single-core serving host for minutes.  `precompile()`
builds every bucket's program up front so no live session ever waits
on a compile.
"""

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from wenet_tpu.models.transformer.streaming import (StreamingConfig,
                                                    streaming_att_mask)


@dataclass
class _Request:
    chunk: np.ndarray          # (decoding_window, mel) padded
    cache: Any                 # (att_cache, cnn_cache) pytree, B=1
    offset: int
    valid_cache: int
    real_out: int
    future: Future


class BatchedChunkRunner:

    def __init__(self, model, variables, cfg: StreamingConfig,
                 max_batch: int = 8, flush_ms: float = 5.0,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — the
        batched chunk step then runs data-parallel across the mesh
        (params replicated, session rows sharded on the batch axis;
        the serving analog of AsrRunner's sharded offline decode).
        Coalesced batches are padded to a multiple of the axis size by
        repeating the final row — identical math for real rows, pad
        rows discarded (hypothesis identity vs single-device is pinned
        in tests/test_sharded_streaming.py)."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            import jax.sharding as jsh
            self._repl = jsh.NamedSharding(mesh, jsh.PartitionSpec())
            self._row0 = jsh.NamedSharding(mesh,
                                           jsh.PartitionSpec('data'))
            self._row1 = jsh.NamedSharding(
                mesh, jsh.PartitionSpec(None, 'data'))
            self.variables = jax.device_put(variables, self._repl)
        else:
            self.variables = jax.device_put(variables)
        self.cfg = cfg
        self.max_batch = max_batch
        self.flush_ms = flush_ms
        self.chunk_out = (cfg.decoding_window - cfg.right_context - 1) \
            // cfg.subsampling_rate + 1
        self._q: 'queue.Queue[Optional[_Request]]' = queue.Queue()
        self._jitted = {}
        self._thread = threading.Thread(target=self._worker,
                                        daemon=True)
        self._thread.start()

    # -- session API ----------------------------------------------------
    def zero_cache(self):
        return self.model.encoder.zero_cache(
            1, self.cfg.required_cache_size)

    def submit(self, chunk: np.ndarray, cache, offset: int,
               valid_cache: int, real_out: int) -> Future:
        fut: Future = Future()
        self._q.put(_Request(chunk, cache, offset, valid_cache,
                             real_out, fut))
        return fut

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)

    def _bucket(self, n: int) -> int:
        """Batch size the n-request coalesced batch is padded to."""
        b = 1
        while b < n:
            b *= 2
        if self.mesh is not None:
            axis = self.mesh.shape['data']
            b = -(-b // axis) * axis  # round up to a multiple of axis
        return b

    def precompile(self, idim: int = 80):
        """Compile (and once-execute) the chunk-step program for every
        batch bucket in [1, max_batch] before serving traffic.  Must be
        called before the first `submit()` races it (server startup).
        With the persistent compilation cache enabled this costs
        seconds on a restart; cold it moves the multi-minute flagship
        compiles out of live sessions' latency path."""
        buckets = sorted({self._bucket(n)
                          for n in range(1, self.max_batch + 1)})
        cache = self.zero_cache()
        for b in buckets:
            reqs = [_Request(
                np.zeros((self.cfg.decoding_window, idim), np.float32),
                cache, 0, 0, self.chunk_out, Future())
                for _ in range(b)]
            self._run(reqs)
        return buckets

    # -- worker ---------------------------------------------------------
    def _step_fn(self, B: int):
        """One jitted program per batch bucket.  The per-session cache
        GATHER (B row-pytrees -> batched pytree) and SCATTER (batched
        new cache -> B row-pytrees) live INSIDE the program: done
        eagerly they cost one dispatch per leaf per row — ~200 tiny ops
        per step at B=8 on a 12-layer model, each a full RTT on
        remote-TPU links (measured: 0.5-0.7 s/chunk-step through the
        tunnel, 10x the device compute).  In-program, the whole step is
        ONE dispatch and the returned row caches stay device-resident
        for the next step."""
        if B not in self._jitted:
            model = self.model

            def gather(rows):
                if B == 1:
                    return rows[0]
                return jax.tree_util.tree_map(
                    lambda *leaves: jnp.concatenate(leaves, axis=1)
                    if leaves[0].ndim >= 2 else jnp.stack(leaves),
                    *rows)

            def row(tree, i):
                return jax.tree_util.tree_map(
                    lambda x: x[:, i:i + 1] if x.ndim >= 2
                    else x[i:i + 1], tree)

            @jax.jit
            def fn(variables, xs, offsets, caches, att_mask):
                att_cache = gather([c[0] for c in caches])
                cnn_cache = gather([c[1] for c in caches])
                ys, att, cnn = model.apply(
                    variables, xs, offsets, att_cache, cnn_cache,
                    att_mask, method=model.forward_encoder_chunk)
                logp = model.apply(variables, ys,
                                   method=model.ctc_activation)
                if B == 1:
                    return ys, logp, ((att, cnn),)
                return ys, logp, tuple(
                    (row(att, i), row(cnn, i)) for i in range(B))

            self._jitted[B] = fn
        return self._jitted[B]

    def _step_fn_mesh(self, B: int):
        """Mesh variant: takes the caches already STACKED and sharded
        on the batch axis (device_put with NamedShardings happens in
        _run, so the gather cannot live inside the program)."""
        key = ('mesh', B)
        if key not in self._jitted:
            model = self.model

            @jax.jit
            def fn(variables, xs, offsets, att_cache, cnn_cache,
                   att_mask):
                ys, att, cnn = model.apply(
                    variables, xs, offsets, att_cache, cnn_cache,
                    att_mask, method=model.forward_encoder_chunk)
                logp = model.apply(variables, ys,
                                   method=model.ctc_activation)
                return ys, logp, att, cnn

            self._jitted[key] = fn
        return self._jitted[key]

    def _worker(self):
        while True:
            req = self._q.get()
            if req is None:
                return
            batch: List[_Request] = [req]
            # coalesce whatever arrives within the flush window
            import time
            deadline = time.perf_counter() + self.flush_ms / 1000.0
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)
                    break
                batch.append(nxt)
            try:
                self._run(batch)
            except Exception as e:  # noqa: BLE001 — deliver to callers
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _run(self, batch: List[_Request]):
        n_real = len(batch)
        # pad to the power-of-two bucket (and, when sharded, to a
        # multiple of the data-axis size) by repeating the last row:
        # pad outputs are dropped below (only the first n_real rows
        # are scattered back)
        bucket = self._bucket(n_real)
        if bucket > n_real:
            batch = batch + [batch[-1]] * (bucket - n_real)
        B = len(batch)
        xs = np.stack([r.chunk for r in batch])
        offsets = np.asarray([r.offset for r in batch], np.int32)
        masks = np.concatenate([
            np.asarray(streaming_att_mask(
                1, self.cfg.required_cache_size, self.chunk_out,
                r.valid_cache, valid_chunk=r.real_out))
            for r in batch], axis=0)
        if self.mesh is not None:
            xs = jax.device_put(jnp.asarray(xs), self._row0)
            offsets = jax.device_put(jnp.asarray(offsets), self._row0)
            masks = jax.device_put(jnp.asarray(masks), self._row0)
            att_cache = jax.tree_util.tree_map(
                lambda *leaves: jnp.concatenate(leaves, axis=1)
                if leaves[0].ndim >= 2 else jnp.stack(leaves),
                *[r.cache[0] for r in batch]) if B > 1 else \
                batch[0].cache[0]
            cnn_cache = jax.tree_util.tree_map(
                lambda *leaves: jnp.concatenate(leaves, axis=1)
                if leaves[0].ndim >= 2 else jnp.stack(leaves),
                *[r.cache[1] for r in batch]) if B > 1 else \
                batch[0].cache[1]
            shard_cache = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, self._row1 if x.ndim >= 2 else self._row0),
                (att_cache, cnn_cache))
            att_cache, cnn_cache = shard_cache
            ys, logp, att, cnn = self._step_fn_mesh(B)(
                self.variables, xs, offsets, att_cache, cnn_cache,
                masks)
            ys_np, logp_np = jax.device_get((ys, logp))
            for i, r in enumerate(batch[:n_real]):
                new_att = jax.tree_util.tree_map(
                    lambda x: x[:, i:i + 1] if x.ndim >= 2
                    else x[i:i + 1], att) if B > 1 else att
                new_cnn = jax.tree_util.tree_map(
                    lambda x: x[:, i:i + 1] if x.ndim >= 2
                    else x[i:i + 1], cnn) if B > 1 else cnn
                r.future.set_result(
                    (ys_np[i:i + 1], logp_np[i:i + 1],
                     (new_att, new_cnn)))
            return
        caches = tuple(r.cache for r in batch)
        ys, logp, new_caches = self._step_fn(B)(
            self.variables, xs, offsets, caches, masks)
        # ONE batched host fetch; row caches stay on device
        ys_np, logp_np = jax.device_get((ys, logp))
        for i, r in enumerate(batch[:n_real]):
            r.future.set_result(
                (ys_np[i:i + 1], logp_np[i:i + 1], new_caches[i]))
