"""Native (C++) windowed-trajectory batch loader.

`NativeSlicedLoader` is the host-side, out-of-HBM counterpart of
`beso_tpu.data.slicer.SlicedDataset`: a thread-pooled C++ gather over
(memory-mappable) float32 trajectory buffers with a background prefetch
ring, replacing the reference's torch DataLoader + 4 worker processes
(`kitchen_workspace_manager.py:149-163`). Use it when the dataset exceeds
device HBM; for BESO's shipped datasets the device-resident SlicedDataset
is faster (one fused gather, no host at all).

The shared library builds lazily from slicer.cc with g++ on first use
(cached next to the source, keyed on a source hash) and binds via ctypes —
no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_SRC = Path(__file__).with_name("slicer.cc")
_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _SRC.with_name(f"_libslicer_{tag}.so")
    if not out.exists():
        # compile to a unique temp file and os.rename (atomic on the same
        # filesystem) so concurrent builders (parallel pytest workers) never
        # dlopen a partially written library (ADVICE r2)
        tmp = _SRC.with_name(f"_libslicer_{tag}.{os.getpid()}.tmp.so")
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(_SRC),
               "-o", str(tmp), "-lpthread"]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native loader build failed:\n{proc.stderr[-2000:]}")
        try:
            os.rename(tmp, out)
        except FileNotFoundError:
            # a peer's stale-build sweep may race us; fine as long as some
            # builder produced the target (ADVICE r3)
            if not out.exists():
                raise
        # drop stale builds — but never in-flight ".tmp." files of concurrent
        # builders, whose rename would otherwise FileNotFoundError (ADVICE r3)
        for old in _SRC.parent.glob("_libslicer_*.so"):
            if old != out and ".tmp." not in old.name:
                try:
                    old.unlink()
                except OSError:
                    pass
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_lib()))
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.loader_num_slices.restype = ctypes.c_int64
        lib.loader_num_slices.argtypes = [ctypes.c_void_p]
        lib.loader_slices.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.loader_sample_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.loader_start_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
        lib.loader_wait_next.restype = ctypes.c_int
        lib.loader_wait_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p)]
        lib.loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _as_c_f32(x: np.ndarray) -> np.ndarray:
    """Ensure C-contiguous float32 (mmap'd arrays pass through unchanged
    when already in that layout)."""
    return np.ascontiguousarray(x, dtype=np.float32)


class NativeSlicedLoader:
    """Thread-pooled windowed batch sampler over host trajectory arrays.

    Same window/goal semantics as SlicedDataset; batches are a pure function
    of (seed, batch_id) via a counter-based RNG, so streams are reproducible
    regardless of thread scheduling (unlike the reference's np.random-in-
    worker draw, trajectory_loader.py:180).
    """

    def __init__(self, observations: np.ndarray, actions: np.ndarray,
                 lengths: np.ndarray, window: int,
                 future_conditional: bool = True, min_future_sep: int = 0,
                 future_seq_len: Optional[int] = None,
                 only_sample_tail: bool = False,
                 only_sample_seq_end: bool = False, n_threads: int = 4):
        if future_conditional:
            assert future_seq_len is not None, "must specify a future_seq_len"
        self.obs = _as_c_f32(observations)
        self.act = _as_c_f32(actions)
        self.lengths = np.ascontiguousarray(lengths, dtype=np.int32)
        if not np.any(self.lengths >= window):
            # the C++ slice table would be empty and fill_item's modulo a
            # divide-by-zero (SIGFPE) — fail at the Python level (ADVICE r2)
            raise ValueError(
                f"no trajectory is at least window={window} steps long "
                f"(max length {int(self.lengths.max(initial=0))}); "
                "no slices can be formed")
        n_traj, t_max, obs_dim = self.obs.shape
        act_dim = self.act.shape[-1]
        self.window = window
        self.future_seq_len = future_seq_len or 1
        self.future_conditional = future_conditional
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self._lib = _lib()
        self._ptr = self._lib.loader_create(
            self.obs.ctypes.data, self.act.ctypes.data,
            self.lengths.ctypes.data, n_traj, t_max, obs_dim, act_dim,
            window, int(future_conditional), self.future_seq_len,
            min_future_sep, int(only_sample_tail), int(only_sample_seq_end),
            n_threads)
        self._prefetching = False

    def __len__(self) -> int:
        return int(self._lib.loader_num_slices(self._ptr))

    @property
    def slices(self) -> np.ndarray:
        """The (traj, start) table — for parity tests vs make_slices."""
        out = np.empty((len(self), 2), dtype=np.int32)
        self._lib.loader_slices(self._ptr, out.ctypes.data)
        return out

    def sample_batch_host(self, seed: int, batch_id: int,
                          batch_size: int) -> dict:
        """One deterministic batch as numpy arrays (host memory)."""
        W, G = self.window, self.future_seq_len
        obs = np.empty((batch_size, W, self.obs_dim), np.float32)
        act = np.empty((batch_size, W, self.act_dim), np.float32)
        goal = np.empty((batch_size, G, self.obs_dim), np.float32)
        self._lib.loader_sample_batch(
            self._ptr, ctypes.c_uint64(seed), ctypes.c_uint64(batch_id),
            batch_size, obs.ctypes.data, act.ctypes.data, goal.ctypes.data)
        batch = {"observation": obs, "action": act}
        if self.future_conditional:
            batch["goal_observation"] = goal
        return batch

    def batches(self, seed: int, batch_size: int, n_batches: int,
                n_buffers: int = 3, device_put: bool = True) -> Iterator[dict]:
        """Prefetching stream: the C++ producer fills batch k+1 while batch k
        transfers/computes. Yields device arrays when device_put=True."""
        import jax

        W, G = self.window, self.future_seq_len
        self._lib.loader_start_prefetch(
            self._ptr, ctypes.c_uint64(seed), batch_size, n_buffers)
        self._prefetching = True
        o_p = ctypes.c_void_p()
        a_p = ctypes.c_void_p()
        g_p = ctypes.c_void_p()
        try:
            for _ in range(n_batches):
                buf = self._lib.loader_wait_next(
                    self._ptr, ctypes.byref(o_p), ctypes.byref(a_p),
                    ctypes.byref(g_p))
                def arr(ptr, shape):
                    n = int(np.prod(shape))
                    view = np.ctypeslib.as_array(
                        ctypes.cast(ptr, ctypes.POINTER(ctypes.c_float)),
                        (n,)).reshape(shape)
                    return view
                batch = {
                    "observation": arr(o_p, (batch_size, W, self.obs_dim)),
                    "action": arr(a_p, (batch_size, W, self.act_dim)),
                }
                if self.future_conditional:
                    batch["goal_observation"] = arr(
                        g_p, (batch_size, G, self.obs_dim))
                if device_put:
                    # copies to device; the host buffer can then be reused
                    batch = jax.device_put(batch)
                    jax.block_until_ready(batch)
                else:
                    batch = {k: v.copy() for k, v in batch.items()}
                self._lib.loader_release(self._ptr, buf)
                yield batch
        finally:
            self._prefetching = False

    def __del__(self):
        try:
            self._lib.loader_destroy(self._ptr)
        except Exception:
            pass
