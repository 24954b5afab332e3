"""Multi-client realtime serving core: N streaming voice-conversion
sessions advanced by ONE batched device dispatch per tick.

The reference's realtime engine is strictly single-user — one
`gui.py`/rtrvc process per person (infer/lib/rtrvc.py:19).  On TPU the
per-block graph is small enough that a chip serves many concurrent
streams when they are batched into one vmapped dispatch
(benchmarks/streaming_capacity.py: 16 concurrent 160 ms sessions within
deadline on one chip).  This module turns that measurement into a
serving surface:

  SlotScheduler — owns a FusedStreamGraph(n_streams=N) plus per-slot
    host state (rolling input window, SOLA seam buffer, queues).  Clients
    attach() to a slot, submit() arbitrary-sized PCM, and collect()
    converted PCM; tick() pops one block per slot (silence + an underrun
    count for starved slots), runs the single batched dispatch, and
    SOLA-merges each slot's seam independently (gui.py:1058-1090 math
    via pipeline.rt.sola_merge).

The TCP front end lives in apps/serve.py.  Everything here is
hardware-free testable (tests/test_serve.py drives it on CPU).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import numpy as np

from tpu_rvc.pipeline.rt import FusedStreamGraph, RealtimeVC, sola_merge


class SlotScheduler:
    """Fixed-capacity batched streaming server core.

    All slots share one engine (weights, retrieval index, conversion
    settings — the BatchedRealtimeVC contract); pitch caches, rolling
    windows, and SOLA seams are per-slot.  Thread-safe: socket threads
    call submit/collect/attach/detach while one scheduler thread calls
    tick().
    """

    def __init__(self, engine: RealtimeVC, n_slots: int,
                 samplerate: int = 48000, block_time: float = 0.25,
                 crossfade_time: float = 0.05, extra_time: float = 2.5,
                 f0method: str = "rmvpe", protect: float = 1.0):
        self.engine = engine
        self.n_slots = int(n_slots)
        self.sr = samplerate
        zc = samplerate // 100
        self.zc = zc
        self.block_frame = int(round(block_time * samplerate / zc)) * zc
        self.crossfade_frame = int(
            round(crossfade_time * samplerate / zc)) * zc
        self.sola_buffer_frame = min(self.crossfade_frame, 4 * zc)
        self.sola_search_frame = zc
        self.extra_frame = int(round(extra_time * samplerate / zc)) * zc
        total = (self.extra_frame + self.crossfade_frame +
                 self.sola_search_frame + self.block_frame)
        self.total = total
        skip_head = self.extra_frame // zc
        return_length = (self.block_frame + self.sola_buffer_frame +
                         self.sola_search_frame) // zc
        self.fused = FusedStreamGraph(
            engine, stream_sr=samplerate, block_frame=self.block_frame,
            ctx_frame=2 * zc, total_len=total, skip_head=skip_head,
            return_length=return_length, f0method=f0method,
            protect=protect, n_streams=self.n_slots)
        self.state = self.fused.init_state()
        fade = np.sin(0.5 * np.pi * np.linspace(
            0.0, 1.0, self.sola_buffer_frame)) ** 2
        self.fade_in = fade.astype(np.float32)
        self.fade_out = (1.0 - fade).astype(np.float32)

        self._lock = threading.Lock()
        self.active = [False] * self.n_slots
        # a slot only joins the underrun accounting after its first
        # submit(); attach->first-block gaps are not starvation
        self.started = [False] * self.n_slots
        self.input_wav = np.zeros((self.n_slots, total), np.float32)
        self.sola_buffers = np.zeros(
            (self.n_slots, self.sola_buffer_frame), np.float32)
        self._in_buf: List[np.ndarray] = [
            np.zeros(0, np.float32) for _ in range(self.n_slots)]
        self._out_buf: List[np.ndarray] = [
            np.zeros(0, np.float32) for _ in range(self.n_slots)]
        self.underruns = [0] * self.n_slots
        self.blocks = [0] * self.n_slots
        self.ticks = 0

    # ---- client-thread side ------------------------------------------
    def attach(self) -> int:
        """Claim a free slot; resets its device and host state.
        Raises RuntimeError when the server is full."""
        with self._lock:
            for s in range(self.n_slots):
                if not self.active[s]:
                    self.active[s] = True
                    self.started[s] = False
                    self._in_buf[s] = np.zeros(0, np.float32)
                    self._out_buf[s] = np.zeros(0, np.float32)
                    self.input_wav[s] = 0.0
                    self.sola_buffers[s] = 0.0
                    self.underruns[s] = 0
                    self.blocks[s] = 0
                    if self.n_slots > 1:
                        self.state = jax.tree.map(
                            lambda x: x.at[s].set(0), self.state)
                    else:
                        self.state = jax.tree.map(
                            lambda x: x * 0, self.state)
                    return s
        raise RuntimeError(f"server full ({self.n_slots} slots)")

    def detach(self, slot: int) -> None:
        with self._lock:
            self.active[slot] = False

    def submit(self, slot: int, pcm: np.ndarray) -> None:
        """Queue input PCM (float32 mono at `samplerate`, any length)."""
        pcm = np.asarray(pcm, np.float32).reshape(-1)
        with self._lock:
            self._in_buf[slot] = np.concatenate([self._in_buf[slot], pcm])
            self.started[slot] = True

    def collect(self, slot: int, max_samples: Optional[int] = None
                ) -> np.ndarray:
        """Pop converted PCM queued for this slot (possibly empty)."""
        with self._lock:
            out = self._out_buf[slot]
            if max_samples is not None and len(out) > max_samples:
                self._out_buf[slot] = out[max_samples:]
                return out[:max_samples]
            self._out_buf[slot] = np.zeros(0, np.float32)
            return out

    def pending(self, slot: int) -> int:
        with self._lock:
            return len(self._in_buf[slot])

    def ready(self) -> bool:
        """True when at least one active slot has a full block queued."""
        with self._lock:
            return any(self.active[s] and
                       len(self._in_buf[s]) >= self.block_frame
                       for s in range(self.n_slots))

    # ---- scheduler-thread side ---------------------------------------
    def tick(self) -> Dict[str, object]:
        """Advance every session by one block with a single dispatch.

        Active slots with a queued block consume it; starved active
        slots get silence and an underrun count (the stream must keep
        realtime cadence — reference gui.py:1099-1126 underrun
        behavior).  Idle slots ride along as zeros (the batch shape is
        static)."""
        bf = self.block_frame
        with self._lock:
            fed = []
            for s in range(self.n_slots):
                if self.active[s] and len(self._in_buf[s]) >= bf:
                    block = self._in_buf[s][:bf]
                    self._in_buf[s] = self._in_buf[s][bf:]
                    fed.append(True)
                elif self.active[s] and self.started[s]:
                    block = np.zeros(bf, np.float32)
                    self.underruns[s] += 1
                    fed.append(True)
                else:
                    block = np.zeros(bf, np.float32)
                    fed.append(False)
                self.input_wav[s, :-bf] = self.input_wav[s, bf:]
                self.input_wav[s, -bf:] = block
            seg = self.input_wav[:, -bf - 2 * self.zc:]

        if self.n_slots == 1:
            out, self.state = self.fused(self.state, seg[0])
            out = out[None]
        else:
            out, self.state = self.fused(self.state, seg)

        with self._lock:
            for s in range(self.n_slots):
                if not (self.active[s] and fed[s]):
                    continue
                merged, self.sola_buffers[s] = sola_merge(
                    out[s], self.sola_buffers[s], self.fade_in,
                    self.fade_out, bf, self.sola_buffer_frame,
                    self.sola_search_frame)
                self._out_buf[s] = np.concatenate(
                    [self._out_buf[s], merged])
                self.blocks[s] += 1
            self.ticks += 1
            return self.stats_locked()

    # ---- introspection -----------------------------------------------
    def stats_locked(self) -> Dict[str, object]:
        return {
            "ticks": self.ticks,
            "active": int(sum(self.active)),
            "slots": self.n_slots,
            "blocks": list(self.blocks),
            "underruns": list(self.underruns),
            "block_frame": self.block_frame,
            "samplerate": self.sr,
        }

    def stats(self) -> Dict[str, object]:
        with self._lock:
            return self.stats_locked()
