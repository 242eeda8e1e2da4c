"""Batched compression service: HTTP daemon around MCMCodec.

Production-serving surface the reference lacks (its eval loop is batch-1
offline, /root/reference/testing.py:128-165). Design points, TPU-shaped:

  * dynamic batching — concurrent requests are coalesced into one device
    batch (up to --max-batch, waiting --batch-window-ms for stragglers), so
    the MXU sees full batches instead of per-request singles;
  * static shapes — device batches are PADDED to exactly --max-batch, so XLA
    compiles each direction once (a varying batch dim would recompile per
    distinct size);
  * the wire format is the self-describing container (eval/container.py):
    POST /compress    image file (PNG/JPEG/...) -> container blob
    POST /decompress  container blob            -> PNG reconstruction
    POST /pipeline    image file -> JSON {caption, bpp, stages,
                      refined_png_b64} — the full caption -> codec round
                      trip -> SDXL-refine workload (--pipeline)
    GET  /healthz     liveness + backend
    GET  /stats       request counters, batch-size histogram, latencies.

Run: python -m textmae_tpu.cli.serve --port 8080 [-p checkpoint]
"""
from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve MCM compression over HTTP.")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("-p", "--path", type=str, default=None, help="checkpoint to serve")
    p.add_argument("--artifact", type=str, default=None,
                   help="serve a kind='stream' .mcmx export artifact instead "
                        "of a checkpoint: the two fixed-shape programs carry "
                        "weights AND entropy tables, so the serving fleet "
                        "needs no model code (eval/export.py). Batch size "
                        "comes from the artifact; --pipeline/--replicas/"
                        "--device-codec do not apply")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-keep-patches", type=int, default=None,
                   help="kept patches (default: the checkpoint's __meta__ "
                        "provenance when -p is an npz, else 144)")
    p.add_argument("--reference-order", action="store_true",
                   help="canonical_keep_order=False: the reference's token "
                        "ordering. Required for reference-trained / rd_sweep "
                        "checkpoints (auto-set from npz __meta__)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="MoE encoder topology of the served checkpoint "
                        "(default: meta, else param-tree inference, else dense)")
    p.add_argument("--moe-top-k", type=int, default=None)
    p.add_argument("--moe-every", type=int, default=None)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--half", action="store_true", help="bfloat16 transformer compute")
    p.add_argument("--normalize", action="store_true",
                   help="ImageNet-normalize inputs and de-normalize "
                        "reconstructions; use for checkpoints trained on the "
                        "normalized train/val distribution (the reference's "
                        "test path skips this — a train/test mismatch)")
    p.add_argument("--device-codec", action="store_true",
                   help="run the rANS encoder AND decode chain inside jit "
                        "(coding/device_rans.py): no host symbol wire, no "
                        "per-slice host alternations — frees the serving "
                        "host's CPU for request handling (streams stay "
                        "byte-identical to the host coders)")
    p.add_argument("--pipeline", action="store_true",
                   help="also serve POST /pipeline: caption -> codec round "
                        "trip -> caption-conditioned SDXL refine, one padded "
                        "device batch per stage (stage 1/3 weights from "
                        "$TEXTMAE_BLIP2_PATH / $TEXTMAE_SDXL_PATH; absent "
                        "stages degrade gracefully)")
    p.add_argument("--refine-steps", type=int, default=None,
                   help="denoise steps for the --pipeline refiner")
    p.add_argument("--replicas", type=int, default=1,
                   help="codec replicas, one per local device (multi-chip "
                        "serving: request batches are dispatched to whichever "
                        "replica is free; containers are byte-identical "
                        "regardless of which replica served them)")
    p.add_argument("--refine-random-init", action="store_true",
                   help="with --pipeline but no $TEXTMAE_SDXL_PATH, serve the "
                        "reduced-dim RANDOM-WEIGHT refiner anyway (demo/"
                        "plumbing only — its output is worse than the plain "
                        "reconstruction; without this flag the refine stage "
                        "is skipped instead)")
    return p


class _Request:
    __slots__ = ("data", "event", "result", "error")

    def __init__(self, data: bytes):
        self.data = data
        self.event = threading.Event()
        self.result: Optional[bytes] = None
        self.error: Optional[Exception] = None


class CodecService:
    """Dynamic-batching wrapper around MCMCodec (one worker per direction)."""

    def __init__(
        self,
        model,
        variables,
        max_batch: int = 8,
        batch_window_ms: float = 5.0,
        warmup: bool = True,
        normalize: bool = False,
        device_codec: bool = False,
        captioner=None,
        refiner=None,
        pipeline: bool = False,
        replicas: int = 1,
        exported=None,
        config=None,
    ):
        """exported: an eval.export.ExportedCodec — serve a kind="stream"
        .mcmx artifact instead of a checkpoint (no model code at the serving
        fleet; weights + entropy tables live inside the artifact). Requires
        `config` (an MCMConfig matching the artifact manifest) and implies
        replicas=1 / no pipeline stages; max_batch must equal the artifact's
        exported batch (its programs are fixed-shape)."""
        import jax

        from textmae_tpu.eval import MCMCodec

        if exported is not None:
            if config is None:
                raise ValueError("exported serving needs the manifest config")
            if replicas != 1:
                raise ValueError("exported artifacts serve one replica")
            if captioner is not None or refiner is not None or pipeline:
                raise ValueError(
                    "pipeline stages need live models; serve them from a "
                    "checkpoint"
                )
            if max_batch != exported.batch:
                raise ValueError(
                    f"artifact programs are fixed at batch {exported.batch}; "
                    f"pass --max-batch {exported.batch}"
                )
        self.model = model
        self.cfg = config if exported is not None else model.config
        self.normalize = normalize
        # Multi-chip serving is codec REPLICATION, not batch sharding: one
        # full codec per local device, request batches dispatched to whichever
        # replica is free. Every replica runs the same compiled program, so
        # containers are byte-identical regardless of which replica served
        # them — sharding one batch over a mesh would instead run
        # differently-partitioned encoder/decoder programs whose last-bit
        # float differences can desynchronize the rANS stream (see
        # eval/codec.py module docstring).
        devices = jax.local_devices()
        if not 1 <= replicas <= len(devices):
            raise ValueError(
                f"replicas={replicas} but {len(devices)} local device(s)"
            )
        self.devices = devices[:replicas]
        if exported is not None:
            self.codecs = [exported]
        else:
            host_vars = jax.device_get(variables) if replicas > 1 else variables
            self.codecs = []
            for dev in self.devices:
                with jax.default_device(dev):
                    c = MCMCodec(
                        model, host_vars,
                        device_chain=True if device_codec else None,
                        device_encode=True if device_codec else None,
                    )
                    c.update(force=True)
                self.codecs.append(c)
        self.codec = self.codecs[0]  # warmup + pipeline stage-2 use replica 0
        # optional 3-stage pipeline endpoint: caption -> codec round trip ->
        # refine (the north-star workload, served). Either stage may be None
        # (zero-egress deployments without $TEXTMAE_BLIP2_PATH /
        # $TEXTMAE_SDXL_PATH): the endpoint degrades to the stages present —
        # down to the bare codec round trip when BOTH are absent but the
        # endpoint was requested (pipeline=True).
        self.captioner = captioner
        self.refiner = refiner
        self.pipeline_enabled = (
            pipeline or captioner is not None or refiner is not None
        )
        self.max_batch = max_batch
        self.window = batch_window_ms / 1000.0
        self.stats = {
            "compress_requests": 0,
            "decompress_requests": 0,
            "pipeline_requests": 0,
            "errors": 0,
            "batch_sizes": Counter(),
            "compress_s": 0.0,
            "decompress_s": 0.0,
            "pipeline_s": 0.0,
            "pipeline_stages": {
                "caption": captioner is not None,
                "refine": refiner is not None,
            },
            "replicas": replicas,
            "replica_batches": Counter(),
        }
        self._lock = threading.Lock()
        if warmup:
            self._warmup()
        kinds = ("c", "d", "p") if self.pipeline_enabled else ("c", "d")
        self._queues = {k: queue.Queue() for k in kinds}
        for kind in kinds:
            # compress/decompress scale across replicas; the pipeline worker
            # stays on replica 0 (the captioner/refiner params live on the
            # default device)
            for ridx in range(replicas if kind in ("c", "d") else 1):
                threading.Thread(
                    target=self._worker, args=(kind, ridx), daemon=True
                ).start()

    def _warmup(self) -> None:
        """Compile both directions before accepting traffic: the first real
        request must not stall on the slice-chain XLA compiles. Every replica
        is warmed (the executable compiles once, but each replica still
        uploads its params/tables on first use)."""
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (self.cfg.img_size, self.cfg.img_size)).save(
            buf, format="PNG"
        )
        for ridx in range(len(self.codecs)):
            (blob,) = self._run_compress([buf.getvalue()], replica=ridx)
            if isinstance(blob, Exception):  # pragma: no cover - must work
                raise blob
            (out,) = self._run_decompress([blob], replica=ridx)
            if isinstance(out, Exception):  # pragma: no cover
                raise out
        if self.pipeline_enabled:
            (pout,) = self._run_pipeline([buf.getvalue()])
            if isinstance(pout, Exception):  # pragma: no cover
                raise pout

    # -- request side ------------------------------------------------------
    def compress(self, image_bytes: bytes) -> bytes:
        return self._submit("c", image_bytes)

    def decompress(self, container_bytes: bytes) -> bytes:
        return self._submit("d", container_bytes)

    def pipeline(self, image_bytes: bytes) -> bytes:
        if not self.pipeline_enabled:
            raise ValueError(
                "pipeline endpoint disabled (start serve with --pipeline)"
            )
        return self._submit("p", image_bytes)

    def _submit(self, kind: str, data: bytes) -> bytes:
        req = _Request(data)
        self._queues[kind].put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        assert req.result is not None
        return req.result

    # -- batching worker ----------------------------------------------------
    def _worker(self, kind: str, ridx: int = 0) -> None:
        q = self._queues[kind]
        while True:
            batch = [q.get()]
            deadline = time.time() + self.window
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(q.get(timeout=remaining))
                except queue.Empty:
                    break
            t0 = time.time()
            try:
                run = {
                    "c": self._run_compress,
                    "d": self._run_decompress,
                    "p": self._run_pipeline,
                }[kind]
                results = run([r.data for r in batch], replica=ridx)
                # per-item outcomes: one malformed request must not fail the
                # innocent requests coalesced into the same device batch
                n_err = 0
                for r, out in zip(batch, results):
                    if isinstance(out, Exception):
                        r.error = out
                        n_err += 1
                    else:
                        r.result = out
                if n_err:
                    with self._lock:
                        self.stats["errors"] += n_err
            except Exception as e:  # unexpected: fail the batch, keep serving
                for r in batch:
                    r.error = e
                with self._lock:
                    self.stats["errors"] += len(batch)
            finally:
                name = {"c": "compress", "d": "decompress", "p": "pipeline"}[kind]
                with self._lock:
                    self.stats["batch_sizes"][len(batch)] += 1
                    self.stats["replica_batches"][ridx] += 1
                    self.stats[f"{name}_s"] += time.time() - t0
                    self.stats[f"{name}_requests"] += len(batch)
                for r in batch:
                    r.event.set()

    # -- device work (padded to max_batch for a single compiled shape) ------
    def _prep_images(self, blobs: List[bytes]):
        """Decode + score a request batch into padded model inputs.

        Returns (imgs, scores, rgbs, orig_sizes, outs, valid): imgs/scores
        padded to max_batch; rgbs holds the resized RGB uint8 arrays (for
        the captioner); failed items carry their Exception in outs."""
        from PIL import Image

        from textmae_tpu.data.score_maps import total_score_for_image

        n = len(blobs)
        size = self.cfg.img_size
        imgs = np.zeros((self.max_batch, 3, size, size), np.float32)
        scores = np.zeros((self.max_batch, self.cfg.num_patches), np.float32)
        rgbs = np.zeros((self.max_batch, size, size, 3), np.uint8)
        outs: List = [None] * n
        orig_sizes = [None] * n
        valid = []
        for i, blob in enumerate(blobs):
            try:
                with Image.open(io.BytesIO(blob)) as im:
                    orig_sizes[i] = im.size
                    gray = np.asarray(im.convert("L"))
                    rgb = im.convert("RGB").resize((size, size), Image.BICUBIC)
                rgbs[i] = np.asarray(rgb, np.uint8)
                x = rgbs[i].astype(np.float32) / 255.0
                if self.normalize:
                    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

                    x = (x - IMAGENET_MEAN) / IMAGENET_STD
                imgs[i] = x.transpose(2, 0, 1)
                scores[i] = total_score_for_image(gray, (size, size))
                valid.append(i)
            except Exception as e:
                outs[i] = e
        return imgs, scores, rgbs, orig_sizes, outs, valid

    def _replica_ctx(self, ridx: int):
        """Pin every uncommitted H2D upload in the block to the replica's
        device (params were committed there at construction; jit follows)."""
        import jax

        return jax.default_device(self.devices[ridx])

    def _run_compress(self, blobs: List[bytes], replica: int = 0) -> List:
        """Per item: container bytes, or the Exception that item raised."""
        from textmae_tpu.eval import container
        from textmae_tpu.eval.harness import encode_side_info

        n = len(blobs)
        imgs, scores, _, orig_sizes, outs, valid = self._prep_images(blobs)
        if not valid:
            return outs
        with self._replica_ctx(replica):
            streams, ids_restore = self.codecs[replica].compress(imgs, scores)
        payloads = encode_side_info(
            ids_restore[:n], self.cfg.num_keep_patches, self.cfg.canonical_keep_order
        )
        for i in valid:
            try:
                outs[i] = container.pack_image(
                    streams[i], payloads[i], self.cfg, orig_sizes[i],
                    normalize=self.normalize,
                )
            except Exception as e:  # e.g. orig dims beyond the header's u16
                outs[i] = e
        return outs

    def _run_decompress(self, blobs: List[bytes], replica: int = 0) -> List:
        """Per item: PNG bytes, or the Exception that item raised."""
        from PIL import Image

        from textmae_tpu.eval import container
        from textmae_tpu.eval.harness import decode_side_info

        n = len(blobs)
        outs: List = [None] * n
        streams, ids, orig_sizes, valid = [], [], [], []
        for i, blob in enumerate(blobs):
            try:
                stream, side, meta = container.unpack_image(blob)
                container.check_compatible(meta, self.cfg, normalize=self.normalize)
                ids.append(
                    decode_side_info(
                        side,
                        self.cfg.num_patches,
                        self.cfg.num_keep_patches,
                        self.cfg.canonical_keep_order,
                    )
                )
                streams.append(stream)
                orig_sizes.append(meta["orig_size"])
                valid.append(i)
            except Exception as e:
                outs[i] = e
        if not valid:
            return outs
        while len(streams) < self.max_batch:  # pad to the compiled shape
            streams.append(streams[-1])
            ids.append(ids[-1])
        with self._replica_ctx(replica):
            x_hat = np.asarray(
                self.codecs[replica].decompress(streams, np.stack(ids))
            )
        if self.normalize:
            from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

            x_hat = x_hat * IMAGENET_STD.reshape(1, 3, 1, 1) + IMAGENET_MEAN.reshape(
                1, 3, 1, 1
            )
        for j, i in enumerate(valid):
            arr = np.clip(x_hat[j].transpose(1, 2, 0) * 255.0 + 0.5, 0, 255).astype(
                np.uint8
            )
            img = Image.fromarray(arr).resize(orig_sizes[j], Image.BICUBIC)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            outs[i] = buf.getvalue()
        return outs

    def _run_pipeline(self, blobs: List[bytes], replica: int = 0) -> List:
        """Per item: JSON bytes {caption, bpp, stages, refined_png_b64}, or
        the Exception that item raised. Always runs on replica 0 (the
        captioner/refiner params live on the default device).

        The served north-star workload: BLIP-2 caption -> MCM compress ->
        real-bitstream decompress -> caption-conditioned SDXL refine, one
        padded device batch per stage. Stages whose models are absent (or
        that fail at runtime) degrade per batch — the JSON's `stages` field
        records what actually ran."""
        import base64

        import jax.numpy as jnp
        from PIL import Image

        from textmae_tpu.eval.harness import encode_side_info

        n = len(blobs)
        imgs, scores, rgbs, orig_sizes, outs, valid = self._prep_images(blobs)
        if not valid:
            return outs

        # stage 1: caption (padded batch -> one compiled shape)
        captions = ["a photo"] * self.max_batch
        ran_caption = False
        if self.captioner is not None:
            try:
                captions = list(self.captioner.caption(rgbs))
                ran_caption = True
            except Exception:  # degrade, keep serving
                pass

        # stage 2: the real codec round trip (bpp from actual stream bits)
        streams, ids_restore = self.codec.compress(
            jnp.asarray(imgs), jnp.asarray(scores)
        )
        payloads = encode_side_info(
            ids_restore[:n], self.cfg.num_keep_patches,
            self.cfg.canonical_keep_order,
        )
        x_hat = np.asarray(self.codec.decompress(streams, ids_restore))
        if self.normalize:
            from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

            x_hat = x_hat * IMAGENET_STD.reshape(1, 3, 1, 1) + IMAGENET_MEAN.reshape(
                1, 3, 1, 1
            )
        pix = np.clip(x_hat.transpose(0, 2, 3, 1), 0.0, 1.0).astype(np.float32)

        # stage 3: refine the decoded batch, conditioned on the captions
        ran_refine = False
        if self.refiner is not None:
            try:
                pix = np.asarray(
                    self.refiner.refine_batch(jnp.asarray(pix), captions)
                )
                ran_refine = True
            except Exception:  # degrade to the reconstruction
                pass

        num_pixels = self.cfg.img_size * self.cfg.img_size
        stages = (
            (["caption"] if ran_caption else [])
            + ["compress", "decompress"]
            + (["refine"] if ran_refine else [])
        )
        for i in valid:
            arr = np.clip(pix[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            img = Image.fromarray(arr).resize(orig_sizes[i], Image.BICUBIC)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            bits = streams[i].num_bits() + len(payloads[i]) * 8
            outs[i] = json.dumps(
                {
                    "caption": captions[i] if ran_caption else None,
                    "bpp": round(bits / num_pixels, 5),
                    "stages": stages,
                    "refined_png_b64": base64.b64encode(buf.getvalue()).decode(),
                }
            ).encode()
        return outs

    def snapshot_stats(self) -> dict:
        with self._lock:
            s = dict(self.stats)
            s["batch_sizes"] = dict(self.stats["batch_sizes"])
            s["replica_batches"] = dict(self.stats["replica_batches"])
        return s


def make_handler(service: CodecService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            import jax

            if self.path == "/healthz":
                body = json.dumps(
                    {"status": "ok", "backend": jax.default_backend()}
                ).encode()
                self._reply(200, body, "application/json")
            elif self.path == "/stats":
                self._reply(
                    200,
                    json.dumps(service.snapshot_stats()).encode(),
                    "application/json",
                )
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            import struct

            from PIL import UnidentifiedImageError

            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                if self.path == "/compress":
                    out = service.compress(data)
                    self._reply(200, out, "application/octet-stream")
                elif self.path == "/decompress":
                    out = service.decompress(data)
                    self._reply(200, out, "image/png")
                elif self.path == "/pipeline":
                    out = service.pipeline(data)
                    self._reply(200, out, "application/json")
                else:
                    self._reply(404, b"not found", "text/plain")
            except (ValueError, OSError, UnidentifiedImageError, struct.error) as e:
                # malformed input (bad image / bad container / oversize dims)
                self._reply(400, str(e).encode(), "text/plain")
            except Exception as e:  # internal fault: codec bug, OOM, ...
                self._reply(500, str(e).encode(), "text/plain")

    return Handler


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.train.checkpoint import (
        apply_npz_meta_to_args,
        restore_params_any,
    )
    from textmae_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if args.artifact:
        # deployment-loop serving: the .mcmx stream artifact IS the model —
        # weights + entropy tables baked into two fixed-shape programs, no
        # model code / checkpoint / table build at the serving fleet
        from textmae_tpu.eval.export import ExportedCodec

        exc = ExportedCodec(args.artifact)
        m = exc.ex.manifest
        cfg = MCMConfig(
            img_size=int(m["img_size"]),
            num_keep_patches=int(m["num_keep_patches"]),
            canonical_keep_order=bool(m["canonical_keep_order"]),
        )
        if cfg.num_patches != int(m["num_patches"]):
            raise SystemExit(
                f"artifact num_patches {m['num_patches']} does not match a "
                f"patch-16 grid at img_size {m['img_size']}"
            )
        # normalize provenance: a normalize-trained artifact served raw
        # silently degrades every response (the checkpoint path
        # self-configures via npz meta for exactly this reason); the
        # manifest meta carries the flag when the exporter recorded it
        art_norm = m.get("meta", {}).get("normalize")
        if art_norm is not None and bool(art_norm) != args.normalize:
            args.normalize = bool(art_norm)
            print(f"--normalize={args.normalize} from artifact meta", flush=True)
        elif art_norm is None:
            print(
                "[warn] artifact meta records no 'normalize' provenance; "
                f"serving with --normalize={args.normalize} as given "
                "(export with meta={'normalize': ...} to self-configure)",
                flush=True,
            )
        service = CodecService(
            None, None, max_batch=exc.batch,
            batch_window_ms=args.batch_window_ms, normalize=args.normalize,
            exported=exc, config=cfg,
        )
        server = ThreadingHTTPServer(
            (args.host, args.port), make_handler(service)
        )
        print(
            f"serving exported artifact {args.artifact} on "
            f"http://{args.host}:{args.port} (max_batch={exc.batch})",
            flush=True,
        )
        server.serve_forever()
        return
    # a served checkpoint trained with --normalize / non-default keep count /
    # reference ordering must not silently serve garbage: self-configure
    # still-default flags from the npz provenance, exactly like test_model
    apply_npz_meta_to_args(args, args.path)
    if args.num_keep_patches is None:
        args.num_keep_patches = 144
    cfg = MCMConfig(
        img_size=args.input_size,
        num_keep_patches=args.num_keep_patches,
        canonical_keep_order=not args.reference_order,
        dtype=jnp.bfloat16 if args.half else jnp.float32,
        moe_experts=args.moe_experts or 0,
        moe_top_k=args.moe_top_k or 1,
        moe_every=args.moe_every or 2,
    )
    model = MCM(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 3, cfg.img_size, cfg.img_size), jnp.float32)
    sscore = jnp.zeros((1, cfg.num_patches), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "noise": r}, sample, sscore,
            training=False, compute_loss=False,
        )
    )(rng)
    if args.path:
        variables = {"params": restore_params_any(args.path, variables["params"])}

    captioner = refiner = None
    if args.pipeline:
        import os

        try:
            from textmae_tpu.captioning.convert import load_blip2_weights

            captioner = load_blip2_weights()
        except Exception as e:
            print(f"[pipeline: caption stage disabled] {e}", flush=True)
        # a production daemon must not silently serve the random-weight
        # zero-egress fallback refiner (its output is worse than the plain
        # reconstruction); without real weights the refine stage is skipped
        # unless --refine-random-init explicitly opts in
        if os.environ.get("TEXTMAE_SDXL_PATH") or args.refine_random_init:
            try:
                from textmae_tpu.models.diffusion import Diffuser

                refiner = Diffuser.prepare_model(
                    backend="native", num_inference_steps=args.refine_steps
                ).refiner
            except Exception as e:
                print(f"[pipeline: refine stage disabled] {e}", flush=True)
        else:
            print(
                "[pipeline: refine stage disabled] TEXTMAE_SDXL_PATH unset "
                "(pass --refine-random-init to serve the reduced-dim "
                "random-weight refiner for demos)",
                flush=True,
            )

    service = CodecService(
        model, variables, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms, normalize=args.normalize,
        device_codec=args.device_codec, captioner=captioner, refiner=refiner,
        pipeline=args.pipeline, replicas=args.replicas,
    )
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving MCM codec on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
