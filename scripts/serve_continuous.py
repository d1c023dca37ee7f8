"""Continuous-batching HTTP serving for the stage-2 GPT prior.

Unlike scripts/serve.py (one exported fixed-batch program; requests padded
to the export batch and answered in lockstep), this server admits requests
into a pool of KV-cache SLOTS as they arrive (GPT and RQ priors): every decode step advances
all in-flight requests — each at its own sequence position — through one
jitted ragged step (models/stage2/batcher.py). A request's latency is its
own sequence length, not the batch's; the chip never idles while any
request is pending. The reference has no serving story at all (generation
happens only inside validation loops: reference
enhancing/modules/stage2/transformer.py:78-95).

    GET  /healthz            -> {"ok": true, "slots": N, "active": k}
    POST /generate {"class": 3}            -> {"codes": [...]}
    POST /generate {"class": 3, "decode": true} -> PNG (needs stage-1)

Usage:
    python scripts/serve_continuous.py -c fake_gpt_tiny --slots 8 -p 8788
"""
import argparse
import io
import json
import queue
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class BatcherLoop(threading.Thread):
    """Single thread owning the batcher: admits queued requests whenever a
    slot frees, steps while anything is active, parks when idle."""

    def __init__(self, batcher, steps_per_dispatch: int = 1):
        super().__init__(daemon=True)
        self.batcher = batcher
        self.steps_per_dispatch = steps_per_dispatch
        self._queue: "queue.Queue" = queue.Queue()
        self._wake = threading.Event()
        self._stop = False

    def generate(self, cond: np.ndarray, timeout: float = 600.0) -> np.ndarray:
        """Blocking: admit one request, return its codes when it completes."""
        done = threading.Event()
        box = {}
        self._queue.put((cond, done, box))
        self._wake.set()
        if not done.wait(timeout):
            raise TimeoutError("generation timed out")
        if "error" in box:
            raise RuntimeError(box["error"])
        return box["codes"]

    def stop(self):
        self._stop = True
        self._wake.set()

    def run(self):
        pending = {}  # rid -> (done, box)
        while not self._stop:
            try:
                # admit as many queued requests as there are free slots
                while self.batcher.free_slots():
                    try:
                        cond, done, box = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    rid = self.batcher.submit(cond)
                    pending[rid] = (done, box)
                if not self.batcher.num_active():
                    # pipelined batcher: drain the in-flight dispatch
                    # before parking (its completions are someone's codes)
                    for rid, codes in self.batcher.flush():
                        done, box = pending.pop(rid)
                        box["codes"] = codes
                        done.set()
                    if not self.batcher.num_active():
                        self._wake.wait(timeout=0.1)
                        self._wake.clear()
                        continue
                for rid, codes in self.batcher.step(self.steps_per_dispatch):
                    done, box = pending.pop(rid)
                    box["codes"] = codes
                    done.set()
            except Exception as e:  # noqa: BLE001 — keep the loop alive
                # fail every request currently in flight (their device
                # state is suspect) but keep serving new ones: a transient
                # relay/device error must not silently hang the server
                print(f"[serve_continuous] step error: "
                      f"{type(e).__name__}: {e}", flush=True)
                for done, box in pending.values():
                    box["error"] = f"{type(e).__name__}: {e}"
                    done.set()
                pending.clear()


def make_handler(loop: BatcherLoop, batcher, decode_fn=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "slots": batcher.num_slots,
                                 "active": batcher.num_active()})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                cond = np.asarray([int(req.get("class", 0))], np.int32)
                codes = loop.generate(cond)
            except Exception as e:  # surface errors as JSON, keep serving
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                png = (decode_fn(codes)
                       if req.get("decode") and decode_fn is not None
                       else None)
            except Exception as e:  # decode failures also stay JSON
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            if png is not None:
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            else:
                self._json(200, {"codes": codes.tolist()})

    return Handler


def build_decode_fn(model):
    """codes (T,) -> PNG bytes through the frozen stage-1 tokenizer."""
    if getattr(model, "stage1_model", None) is None:
        return None
    import jax.numpy as jnp
    from PIL import Image

    def decode(codes: np.ndarray) -> bytes:
        pix = model.stage1_model.decode_codes(jnp.asarray(codes)[None])
        arr = np.asarray(jnp.clip(pix[0], 0.0, 1.0) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return buf.getvalue()

    return decode


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", default=None,
                   help="stage-2 checkpoint to restore (init_from_ckpt)")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("-p", "--port", type=int, default=8788)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="decode tokens per device dispatch (one jitted "
                        "scan); >1 amortizes dispatch latency on "
                        "network-attached chips at n-token completion "
                        "granularity")
    p.add_argument("--int8", action="store_true",
                   help="weights-only int8 + int8 KV serving: halves the "
                        "param + cache HBM reads of the bandwidth-bound "
                        "decode (GPT also drops the bf16 kernel copies; "
                        "the RQ depth stack still recomputes through them)")
    p.add_argument("--pipeline", type=int, default=0, metavar="DEPTH",
                   help="overlap host bookkeeping with device compute: "
                        "keep up to DEPTH dispatches in flight before "
                        "fetching the oldest (completions surface up to "
                        "DEPTH dispatches later; 0 = fetch every dispatch)")
    p.add_argument("--fetch_thread", action="store_true",
                   help="materialize dispatch results on a background "
                        "thread (overlaps the serialized device->host "
                        "fetch with dispatch issue; needs --pipeline >= 1)")
    args = p.parse_args(argv)

    import jax

    from enhancing_tpu.models.stage2.batcher import (ContinuousGPTBatcher,
                                                     ContinuousRQBatcher)
    from enhancing_tpu.utils.config import (initialize_from_config,
                                            load_config)

    cfg_path = Path(args.config)
    if not cfg_path.exists():
        cfg_path = Path(__file__).resolve().parents[1] / "configs" \
            / f"{args.config}.yaml"
    cfg = load_config(cfg_path)
    model = initialize_from_config(cfg.model)
    if args.ckpt:
        model.init_from_ckpt(args.ckpt)
    is_rq = getattr(model, "is_rq", False)
    cls = ContinuousRQBatcher if is_rq else ContinuousGPTBatcher
    tfm = model.transformer
    variables = {"params": model.params}
    if args.int8:
        from enhancing_tpu.models.stage2.quantize import (
            drop_quantized_kernels, quantize_decode_params)
        variables = quantize_decode_params(variables)
        if not is_rq:
            variables = drop_quantized_kernels(variables)
        tfm = tfm.clone(kv_int8=True)
    batcher = cls(
        tfm, variables, args.slots,
        jax.random.PRNGKey(args.seed), temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, pipeline=args.pipeline,
        fetch_thread=args.fetch_thread)
    loop = BatcherLoop(batcher, args.steps_per_dispatch)
    loop.start()
    handler = make_handler(loop, batcher, build_decode_fn(model))
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), handler)
    print(f"[serve_continuous] {args.slots} slots on :{args.port}",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        loop.stop()


if __name__ == "__main__":
    main()
