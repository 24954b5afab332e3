#!/usr/bin/env python
"""Realtime voice-conversion serving daemon (beyond-reference surface).

Serves N concurrent streaming sessions from one chip by batching every
active stream into a single device dispatch per block
(tpu_rvc.pipeline.serve.SlotScheduler over FusedStreamGraph; measured
capacity: 16 concurrent 160 ms streams per chip,
benchmarks/streaming_capacity.py).  The reference has no serving story —
its realtime path is one gui.py process per user (infer/lib/rtrvc.py:19).

Wire protocol (TCP, mono float32 PCM at the server sample rate):

    frame := tag(1 byte) + length(u32 big-endian) + payload
    tag "J": UTF-8 JSON control message
    tag "A": float32 little-endian PCM samples

  server -> client on connect: J {"ok": true, "slot": n, "samplerate": sr,
                                  "block_frame": bf}
           (or J {"ok": false, "error": "server full"} and close)
  client -> server: A frames of input audio (any size; the server
           re-blocks), J {"cmd": "stats"} -> J stats reply,
           J {"cmd": "set_key"|"set_index_rate", "value": v} (engine-wide,
           shared by all slots — the batched graph shares settings),
           J {"cmd": "bye"} -> detach + close.
  server -> client: A frames of converted audio (block_frame samples per
           processed block, SOLA-merged).

Usage:
  python apps/serve.py --model voice.pth [--index idx.npz] [--slots 8]
                       [--port 7866] [--block-time 0.25] ...
Client demo (also the test harness):
  python apps/serve.py --client in.wav out.wav --port 7866
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import socketserver
import struct
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# ---------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------

def send_frame(sock: socket.socket, tag: bytes, payload: bytes) -> None:
    sock.sendall(tag + struct.pack(">I", len(payload)) + payload)


def send_json(sock: socket.socket, obj) -> None:
    send_frame(sock, b"J", json.dumps(obj).encode())


def send_audio(sock: socket.socket, pcm: np.ndarray) -> None:
    send_frame(sock, b"A", np.asarray(pcm, "<f4").tobytes())


def recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def recv_frame(sock: socket.socket):
    head = recv_exact(sock, 5)
    tag, n = head[:1], struct.unpack(">I", head[1:])[0]
    return tag, recv_exact(sock, n)


# ---------------------------------------------------------------------
# server
# ---------------------------------------------------------------------

class VCServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, scheduler, poll: float = 0.002):
        self.scheduler = scheduler
        self.poll = poll
        self._stop = threading.Event()
        self._sched_thread = threading.Thread(target=self._run_scheduler,
                                              daemon=True)
        super().__init__(addr, _Handler)
        self._sched_thread.start()

    def _run_scheduler(self) -> None:
        """One thread advances every session: tick whenever any active
        slot has a full block queued (runs faster than realtime when
        clients stream faster, e.g. file conversion)."""
        while not self._stop.is_set():
            if self.scheduler.ready():
                self.scheduler.tick()
            else:
                # idle: deliver a pipelined in-flight block before napping
                self.scheduler.flush()
                time.sleep(self.poll)

    def shutdown(self):
        self._stop.set()
        super().shutdown()


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):  # one thread per client
        sched = self.server.scheduler
        sock = self.request
        # the handler thread (JSON replies) and the writer thread (audio
        # frames) share the socket: serialize sends or the length-prefixed
        # framing interleaves and the client desyncs
        wlock = threading.Lock()

        def reply(obj):
            with wlock:
                send_json(sock, obj)

        try:
            slot = sched.attach()
        except RuntimeError as e:
            reply({"ok": False, "error": str(e)})
            return
        reply({"ok": True, "slot": slot,
               "samplerate": sched.sr,
               "block_frame": sched.block_frame})
        stop = threading.Event()
        writer = threading.Thread(target=self._writer,
                                  args=(sock, sched, slot, stop, wlock),
                                  daemon=True)
        writer.start()
        try:
            while True:
                tag, payload = recv_frame(sock)
                if tag == b"A":
                    sched.submit(slot, np.frombuffer(payload, "<f4"))
                elif tag == b"J":
                    msg = json.loads(payload)
                    cmd = msg.get("cmd")
                    if cmd == "stats":
                        reply(sched.stats())
                    elif cmd == "set_key":
                        sched.engine.set_key(float(msg["value"]))
                    elif cmd == "set_index_rate":
                        sched.engine.set_index_rate(float(msg["value"]))
                    elif cmd == "bye":
                        break
                    else:
                        reply({"ok": False,
                               "error": f"unknown cmd {cmd}"})
        except (ConnectionError, OSError):
            pass
        finally:
            stop.set()
            sched.detach(slot)

    @staticmethod
    def _writer(sock, sched, slot, stop, wlock):
        while not stop.is_set():
            out = sched.collect(slot)
            if len(out):
                try:
                    with wlock:
                        send_audio(sock, out)
                except OSError:
                    return
            else:
                time.sleep(0.002)


# ---------------------------------------------------------------------
# client (demo + test harness)
# ---------------------------------------------------------------------

def stream_file(host: str, port: int, in_path: str, out_path: str,
                timeout: float = 300.0) -> dict:
    """Stream a wav through the server block by block and write the
    converted result; returns the server's final stats."""
    from tpu_rvc.audio.io import load_audio, save_wav

    sock = socket.create_connection((host, port), timeout=timeout)
    sock.settimeout(timeout)  # whole-operation guard; frames stay intact
    tag, payload = recv_frame(sock)
    hello = json.loads(payload)
    if not hello.get("ok"):
        raise RuntimeError(hello.get("error"))
    sr, bf = hello["samplerate"], hello["block_frame"]
    audio = load_audio(in_path, sr)
    n_blocks = len(audio) // bf
    want = n_blocks * bf
    out = np.zeros(0, np.float32)
    for i in range(n_blocks):
        send_audio(sock, audio[i * bf:(i + 1) * bf])
    while len(out) < want:
        tag, payload = recv_frame(sock)
        if tag == b"A":
            out = np.concatenate([out, np.frombuffer(payload, "<f4")])
    send_json(sock, {"cmd": "stats"})
    stats = None
    while stats is None:
        tag, payload = recv_frame(sock)
        if tag == b"J":
            stats = json.loads(payload)
    send_json(sock, {"cmd": "bye"})
    sock.close()
    save_wav(out_path, out[:want], sr)
    return stats


# ---------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------

def build_engine(args):
    from tpu_rvc.models.loader import load_synthesizer
    from tpu_rvc.pipeline.rt import RealtimeVC
    from tpu_rvc.retrieval.index import FeatureIndex

    synth, synth_vars, meta = load_synthesizer(args.model)
    if args.hubert == "random":
        import jax
        import jax.numpy as jnp
        from tpu_rvc.models.hubert import hubert_for_version
        hub = hubert_for_version(meta.get("version", "v2"))
        hub_vars = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    else:
        from tpu_rvc.ckpt.hubert_loader import load_hubert_base
        hub, hub_vars = load_hubert_base(args.hubert,
                                         meta.get("version", "v2"))
    index = FeatureIndex.load(args.index) if args.index else None
    aot_cache = None
    if getattr(args, "aot_cache", None):
        from tpu_rvc.utils.aot import (AOTGraphCache,
                                       enable_persistent_compilation_cache)
        enable_persistent_compilation_cache(args.aot_cache)
        aot_cache = AOTGraphCache(args.aot_cache)
    return RealtimeVC(
        hubert=hub, hubert_vars=hub_vars, synth=synth,
        synth_vars=synth_vars, version=meta.get("version", "v2"),
        if_f0=int(meta.get("f0", 1)), index=index,
        index_rate=args.index_rate, f0_up_key=args.f0_up_key,
        rmvpe_root=args.rmvpe_root, aot_cache=aot_cache)


def main(argv=None):
    p = argparse.ArgumentParser(description="tpu_rvc streaming server")
    p.add_argument("--model")
    p.add_argument("--index", default="")
    p.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    p.add_argument("--rmvpe-root", default="assets/rmvpe")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7866)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--samplerate", type=int, default=48000)
    p.add_argument("--block-time", type=float, default=0.25)
    p.add_argument("--crossfade-time", type=float, default=0.05)
    p.add_argument("--extra-time", type=float, default=2.5)
    p.add_argument("--f0-method", default="rmvpe")
    p.add_argument("--f0-up-key", type=float, default=0.0)
    p.add_argument("--index-rate", type=float, default=0.0)
    p.add_argument("--pipelined", action="store_true",
                   help="overlap each tick's device->host fetch with the "
                        "next tick's dispatch (+1 block delivery latency, "
                        "tick critical path = max(dispatch, fetch) instead "
                        "of their sum — raises stream capacity on "
                        "remote-attached chips)")
    p.add_argument("--aot-cache", default=".jax_cache", metavar="DIR",
                   help="warm-start cache dir for compiled block graphs "
                        "(persistent XLA cache + StableHLO exports); "
                        "pass '' to disable")
    p.add_argument("--client", nargs=2, metavar=("IN", "OUT"),
                   help="run as a demo client instead: stream IN -> OUT")
    args = p.parse_args(argv)

    if args.client:
        stats = stream_file(args.host, args.port, *args.client)
        print(json.dumps(stats))
        return

    if not args.model:
        p.error("--model is required to serve")
    from tpu_rvc.pipeline.serve import SlotScheduler
    engine = build_engine(args)
    sched = SlotScheduler(engine, args.slots, samplerate=args.samplerate,
                          block_time=args.block_time,
                          crossfade_time=args.crossfade_time,
                          extra_time=args.extra_time,
                          f0method=args.f0_method,
                          pipelined=args.pipelined)
    srv = VCServer((args.host, args.port), sched)
    print(f"tpu_rvc streaming server on {args.host}:{args.port} "
          f"({args.slots} slots, {sched.block_frame} samples/block "
          f"@ {args.samplerate} Hz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
