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
    converted PCM; tick() pops one block per slot that is ready (or
    overdue — silence + an underrun count), runs the single batched
    dispatch, and SOLA-merges each slot's seam independently
    (gui.py:1058-1090 math via pipeline.rt.sola_merge).

Threading contract: socket threads call submit/collect/attach/detach
under the scheduler lock; ONE scheduler thread calls tick().  The device
state is owned exclusively by the tick thread — attach() only marks a
slot for reset, and tick() applies it before the next dispatch (the
dispatch donates the state buffers, so no other thread may touch them).

The TCP front end lives in apps/serve.py.  Everything here is
hardware-free testable (tests/test_serve.py drives it on CPU).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Deque, Dict, List, Optional

import jax
import numpy as np

from tpu_rvc.pipeline.rt import (BlockGeometry, FusedStreamGraph,
                                 RealtimeVC, sola_merge)


class _ChunkQueue:
    """Queue of PCM chunks with O(1) append/popleft and O(popped)
    assembly — avoids the O(n^2) full-buffer reallocation a
    np.concatenate per small submit would cost under the shared
    scheduler lock."""

    def __init__(self):
        self._chunks: Deque[np.ndarray] = deque()
        self._len = 0

    def __len__(self) -> int:
        return self._len

    def push(self, pcm: np.ndarray) -> None:
        if len(pcm):
            self._chunks.append(pcm)
            self._len += len(pcm)

    def pop(self, n: Optional[int] = None) -> np.ndarray:
        """Pop up to n samples (all queued when n is None)."""
        if n is not None and n <= 0:
            return np.zeros(0, np.float32)
        if n is None or n >= self._len:
            out = (np.concatenate(self._chunks) if self._chunks
                   else np.zeros(0, np.float32))
            self._chunks, self._len = deque(), 0
            return out
        taken, got = [], 0
        while got < n:
            c = self._chunks[0]
            need = n - got
            if len(c) <= need:
                taken.append(self._chunks.popleft())
                got += len(c)
            else:
                taken.append(c[:need])
                self._chunks[0] = c[need:]
                got = n
        self._len -= n
        return np.concatenate(taken)

    def clear(self) -> None:
        self._chunks, self._len = deque(), 0


class SlotScheduler:
    """Fixed-capacity batched streaming server core.

    All slots share one engine (weights, retrieval index, conversion
    settings — the BatchedRealtimeVC contract); pitch caches, rolling
    windows, and SOLA seams are per-slot.
    """

    def __init__(self, engine: RealtimeVC, n_slots: int,
                 samplerate: int = 48000, block_time: float = 0.25,
                 crossfade_time: float = 0.05, extra_time: float = 2.5,
                 f0method: str = "rmvpe", protect: float = 1.0,
                 clock=time.monotonic, pipelined: bool = False):
        # clock: injectable monotonic time source — the underrun cadence
        # ("a started slot is silence-fed once a full block_time past its
        # last feed") compares clock() readings; tests substitute a
        # hand-advanced clock so slow CPU ticks can't fake starvation
        self._clock = clock
        self.engine = engine
        self.n_slots = int(n_slots)
        # frame geometry shared with StreamSession (ONE definition of
        # the gui.py window math — see rt.BlockGeometry)
        geo = BlockGeometry(samplerate, block_time, crossfade_time,
                            extra_time)
        self.geometry = geo
        self.sr = samplerate
        self.block_time = float(block_time)
        zc = geo.zc
        self.zc = zc
        self.block_frame = geo.block_frame
        self.crossfade_frame = geo.crossfade_frame
        self.sola_buffer_frame = geo.sola_buffer_frame
        self.sola_search_frame = geo.sola_search_frame
        self.extra_frame = geo.extra_frame
        total = geo.total
        self.total = total
        self.fused = FusedStreamGraph(
            engine, stream_sr=samplerate, block_frame=self.block_frame,
            ctx_frame=2 * zc, total_len=total, skip_head=geo.skip_head,
            return_length=geo.return_length, f0method=f0method,
            protect=protect, n_streams=self.n_slots)
        self.state = self.fused.init_state()
        self.fade_in = geo.fade_in
        self.fade_out = geo.fade_out

        self._lock = threading.Lock()
        self.active = [False] * self.n_slots
        # a slot only joins the underrun accounting after its first
        # submit(); attach->first-block gaps are not starvation
        self.started = [False] * self.n_slots
        # device-state resets requested by attach(), applied by tick()
        # (the tick thread owns self.state — the dispatch donates it)
        self._pending_reset: set = set()
        # bumped by attach(): a dispatch's output is delivered only to
        # the generation that was attached when its input was consumed,
        # so a detach+attach during the (unlocked) dispatch can never
        # hand the previous client's audio to the new one
        self._gen = [0] * self.n_slots
        self.input_wav = np.zeros((self.n_slots, total), np.float32)
        self.sola_buffers = np.zeros(
            (self.n_slots, self.sola_buffer_frame), np.float32)
        self._in_buf = [_ChunkQueue() for _ in range(self.n_slots)]
        self._out_buf = [_ChunkQueue() for _ in range(self.n_slots)]
        # per-slot block cadence: a started slot is only silence-fed
        # (underrun) once it is a full block_time past its last feed, so
        # phase-offset clients don't starve each other when another
        # slot's readiness triggers a tick (a lockstep harness that
        # always submits before tick never hits this path)
        self._last_fed = [0.0] * self.n_slots
        self.underruns = [0] * self.n_slots
        self.blocks = [0] * self.n_slots
        self.ticks = 0
        # pipelined=True: tick k's device->host fetch overlaps tick k+1's
        # host prep + dispatch (a depth-1 double buffer on a fetch
        # thread).  Trades one extra block of delivery latency for a
        # tick critical path of max(dispatch, fetch) instead of their
        # sum — on remote-attached chips the fetch share of the tick is
        # tunnel RTT, which this hides entirely.  Delivery ORDER is
        # unchanged (in-order drain), so SOLA seams stay consistent.
        self.pipelined = bool(pipelined)
        self._fetch_pool = None
        self._inflight = None  # (np-out future, fed list, gen snapshot)
        if self.pipelined:
            import concurrent.futures as cf
            self._fetch_pool = cf.ThreadPoolExecutor(
                1, thread_name_prefix="tick-fetch")

    # ---- client-thread side ------------------------------------------
    def attach(self) -> int:
        """Claim a free slot; resets its host state and schedules the
        device-state reset for the next tick.  Raises RuntimeError when
        the server is full."""
        with self._lock:
            for s in range(self.n_slots):
                if not self.active[s]:
                    self.active[s] = True
                    self.started[s] = False
                    self._gen[s] += 1
                    self._in_buf[s].clear()
                    self._out_buf[s].clear()
                    self.input_wav[s] = 0.0
                    self.sola_buffers[s] = 0.0
                    self.underruns[s] = 0
                    self.blocks[s] = 0
                    self._pending_reset.add(s)
                    return s
        raise RuntimeError(f"server full ({self.n_slots} slots)")

    def detach(self, slot: int) -> None:
        with self._lock:
            self.active[slot] = False

    def submit(self, slot: int, pcm: np.ndarray) -> None:
        """Queue input PCM (float32 mono at `samplerate`, any length)."""
        pcm = np.asarray(pcm, np.float32).reshape(-1)
        with self._lock:
            self._in_buf[slot].push(pcm)
            if not self.started[slot]:
                self.started[slot] = True
                self._last_fed[slot] = self._clock()

    def collect(self, slot: int, max_samples: Optional[int] = None
                ) -> np.ndarray:
        """Pop converted PCM queued for this slot (possibly empty)."""
        with self._lock:
            return self._out_buf[slot].pop(max_samples)

    def pending(self, slot: int) -> int:
        with self._lock:
            return len(self._in_buf[slot])

    def ready(self) -> bool:
        """True when at least one active slot has a full block queued or
        is overdue for its silence block."""
        now = self._clock()
        with self._lock:
            return any(
                self.active[s] and
                (len(self._in_buf[s]) >= self.block_frame
                 or (self.started[s]
                     and now - self._last_fed[s] >= self.block_time))
                for s in range(self.n_slots))

    # ---- scheduler-thread side ---------------------------------------
    def tick(self) -> Dict[str, object]:
        """Advance every due session by one block with a single dispatch.

        A slot consumes a queued block when it has one; a started slot
        that is a full block_time past its last feed gets silence and an
        underrun count (the stream must keep realtime cadence —
        reference gui.py:1099-1126 underrun behavior).  Slots that are
        idle or simply not due yet ride along as zeros with their device
        state frozen (the batch shape is static)."""
        bf = self.block_frame
        now = self._clock()
        with self._lock:
            resets = sorted(self._pending_reset)
            self._pending_reset.clear()
            fed = []
            for s in range(self.n_slots):
                if self.active[s] and len(self._in_buf[s]) >= bf:
                    block = self._in_buf[s].pop(bf)
                    self._last_fed[s] = now
                    fed.append(True)
                elif (self.active[s] and self.started[s]
                      and now - self._last_fed[s] >= self.block_time):
                    block = np.zeros(bf, np.float32)
                    self.underruns[s] += 1
                    self._last_fed[s] = now
                    fed.append(True)
                else:
                    fed.append(False)
                    continue
                self.input_wav[s, :-bf] = self.input_wav[s, bf:]
                self.input_wav[s, -bf:] = block
            # copy: the dispatch below runs unlocked and must not see
            # a concurrent attach() zeroing a row
            seg = self.input_wav[:, -bf - 2 * self.zc:].copy()
            gen = list(self._gen)

        # device state is touched ONLY here, on the tick thread
        if resets:
            if self.n_slots == 1:
                self.state = jax.tree.map(lambda x: x * 0, self.state)
            else:
                idx = np.asarray(resets)
                self.state = jax.tree.map(
                    lambda x: x.at[idx].set(0), self.state)
        if not any(fed):  # nothing due — no dispatch
            self._drain_inflight()  # deliver a pending pipelined block
            with self._lock:
                self.ticks += 1
                return self.stats_locked()
        if self.n_slots == 1:
            out, self.state = self.fused(self.state, seg[0], fed=fed[0],
                                         fetch=not self.pipelined)
            if not self.pipelined:
                out = out[None]
        else:
            out, self.state = self.fused(self.state, seg,
                                         fed=np.asarray(fed),
                                         fetch=not self.pipelined)

        if self.pipelined:
            # hand the fetch to the pool NOW (it overlaps whatever the
            # tick thread does next), deliver LAST tick's block
            fut = self._fetch_pool.submit(np.asarray, out)
            self._inflight, prev = (fut, fed, gen), self._inflight
            if prev is not None:
                pout = prev[0].result()
                if self.n_slots == 1:
                    pout = pout[None]
                self._deliver(pout, prev[1], prev[2])
            with self._lock:
                self.ticks += 1
                return self.stats_locked()

        self._deliver(out, fed, gen)
        with self._lock:
            self.ticks += 1
            return self.stats_locked()

    def flush(self) -> None:
        """Deliver the pipelined in-flight block, if any (call at
        shutdown or when pausing the tick thread)."""
        self._drain_inflight()

    def _drain_inflight(self) -> None:
        if self._inflight is None:
            return
        fut, fed, gen = self._inflight
        self._inflight = None
        out = fut.result()
        if self.n_slots == 1:
            out = out[None]
        self._deliver(out, fed, gen)

    def _deliver(self, out, fed, gen) -> None:
        """SOLA-merge + queue one dispatch's output (tick thread only)."""
        bf = self.block_frame
        with self._lock:
            for s in range(self.n_slots):
                # gen check: a slot re-attached during the dispatch must
                # not receive the previous occupant's audio
                if not (self.active[s] and fed[s]
                        and self._gen[s] == gen[s]):
                    continue
                merged, self.sola_buffers[s] = sola_merge(
                    out[s], self.sola_buffers[s], self.fade_in,
                    self.fade_out, bf, self.sola_buffer_frame,
                    self.sola_search_frame)
                self._out_buf[s].push(merged)
                self.blocks[s] += 1

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
