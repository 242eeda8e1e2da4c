"""MCMCodec: real-bitstream compress / decompress around the MCM model.

Pipeline parity with MCM.compress/decompress
(/root/reference/models/Compression/MCM.py:805-968) with a TPU-first split:

  compress   — an analysis jit (encoder + g_a + h_a) produces y and the hyper
               symbols; the 12-slice conditional chain then runs through the
               SAME jitted per-slice programs the decoder uses, chained
               device-side with no host sync (dispatch is async), and the host
               C++ rANS coder encodes each image's stream afterwards, in
               parallel across a thread pool (ctypes releases the GIL). The
               reference instead interleaves device math and host coding per
               slice with `.tolist()` transfers (MCM.py:852-880).
  decompress — the format's data dependency is real: slice i's mu/sigma
               depend on decoded slices < i. A tiny per-slice jit
               (mu/sigma/indexes) alternates with host stream decoding —
               exactly the dependency chain, nothing more.

Sharing the per-slice programs between the two directions guarantees encoder
and decoder compute bit-identical mu/sigma (and therefore identical rANS
indexes): XLA programs are deterministic, but *different* fusions of the same
math need not agree in the last float bit, which would desynchronize the
stream. (`MCM.encode_device` remains the single-jit fast path for
entropy-estimation-style use.)

`update()` builds the quantized CDF tables host-side (testing.py:223's
model.update(force=True)).

Multi-chip serving: run ONE codec instance per chip and split the image
stream across them (embarrassingly parallel). Do NOT shard a single codec's
batch over a mesh: encoder and decoder would then run differently-partitioned
programs whose float results may differ in the last bit, desynchronizing the
rANS stream (the same hazard the shared-program design eliminates).
"""
from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from textmae_tpu.coding import RansDecoder, RansEncoder
from textmae_tpu.entropy.entropy_bottleneck import build_eb_tables
from textmae_tpu.entropy.gaussian import build_gaussian_tables, get_scale_table
from textmae_tpu.entropy.tables import CdfTable
from textmae_tpu.models.mcm import MCM


def _esc_capacity(n_payload: int) -> int:
    """Escape-sidecar slots for an n_payload-symbol int8 wire transfer."""
    return min(4096, int(n_payload))


def _pack6_device(idx: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 scale indexes (< 64) into 6-bit fields: 4 indexes -> 3 bytes.

    Integer-exact repack of the per-slice programs' index OUTPUT (applied as a
    separate jit so the shared encode/decode programs themselves are
    untouched); the host unpacks with _unpack6_host. Pads to a multiple of 4.
    """
    flat = idx.reshape(-1)
    pad = (-flat.size) % 4
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    q = flat.reshape(-1, 4)
    a, b, c, d = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            a | ((b & 3) << 6),
            (b >> 2) | ((c & 15) << 4),
            (c >> 4) | (d << 2),
        ],
        axis=1,
    ).reshape(-1)


def _packed6_len(n: int) -> int:
    return 3 * ((n + 3) // 4)


def _unpack6_host(buf: np.ndarray, n: int) -> np.ndarray:
    """Inverse of _pack6_device: (3*ceil(n/4),) uint8 bytes -> (n,) indexes."""
    t = buf.reshape(-1, 3)
    b0, b1, b2 = t[:, 0], t[:, 1], t[:, 2]
    return np.stack(
        [
            b0 & 63,
            (b0 >> 6) | ((b1 & 15) << 2),
            (b1 >> 4) | ((b2 & 3) << 4),
            b2 >> 2,
        ],
        axis=1,
    ).reshape(-1)[:n]


@dataclasses.dataclass
class CompressedImage:
    """One image's bitstream: y (slices) string, z (hyper) string, z grid shape."""

    y_string: bytes
    z_string: bytes
    z_shape: Tuple[int, int]

    def num_bits(self) -> int:
        return 8 * (len(self.y_string) + len(self.z_string))


class MCMCodec:
    def __init__(
        self,
        model: MCM,
        variables: Dict,
        num_threads: int = 8,
        device_chain: Optional[bool] = None,
        device_encode: Optional[bool] = None,
    ):
        """device_chain: decode the y bitstreams INSIDE jit (coding.device_rans)
        so the whole slice chain is one async dispatch chain with a single
        blocking fetch — no per-slice host alternation (VERDICT r2 Next #6).
        Host coding stays the default (None/False): on locally-attached chips
        the C++ decoder + cheap round trips win; on remote-attached chips the
        device chain wins (each alternation costs a full tunnel RTT). Env
        override: TEXTMAE_DEVICE_CHAIN=1.

        device_encode: the compress-side counterpart — run the rANS ENCODER
        state machine inside jit too, so symbols/indexes never visit the host
        and the int8 escape-sidecar wire is skipped entirely; the only D2H is
        the finished stream words + ids_restore. Streams are byte-identical
        to the host path (device_rans fuzz contract). Mainly useful when the
        host CPU is the scarce resource (serving boxes) or the symbol wire
        dominates the link. Env override: TEXTMAE_DEVICE_ENCODE=1."""
        import os as _os

        if device_chain is None:
            device_chain = _os.environ.get("TEXTMAE_DEVICE_CHAIN", "0") == "1"
        self.device_chain = bool(device_chain)
        if device_encode is None:
            device_encode = _os.environ.get("TEXTMAE_DEVICE_ENCODE", "0") == "1"
        self.device_encode = bool(device_encode)
        self.model = model
        # Commit params to device ONCE. Checkpoint restores hand back host
        # numpy arrays; leaving them host-side makes every jitted program in
        # this codec re-upload the full parameter tree on every call — on a
        # remote-attached chip that turns one eval into minutes of H2D.
        self.variables = jax.device_put(variables)
        self.cfg = model.config
        self.scale_table = get_scale_table()
        self.gauss_tables: Optional[CdfTable] = None
        self.eb_tables: Optional[CdfTable] = None
        self.num_threads = num_threads
        self._medians = np.asarray(
            variables["params"]["entropy_bottleneck"]["quantiles"]
        )[:, 0, 1].astype(np.float32)

        st = jnp.asarray(self.scale_table)
        med = jnp.asarray(self._medians)
        # 64-entry scale table -> 6-bit indexes: 4 indexes per 3 wire bytes
        self._idx6 = len(self.scale_table) <= 64
        self._pack6 = jax.jit(_pack6_device)

        self._front = jax.jit(
            lambda v, imgs, scores: model.apply(v, imgs, scores, method=MCM.encode_front)
        )
        self._hyper = jax.jit(
            lambda v, z_sym: model.apply(
                v, z_sym.astype(jnp.float32) + med, method=MCM.decode_hyper
            )
        )
        def _sp(v, buf, m, s, i):
            mu, index, ms = model.apply(v, buf, m, s, i, st, method=MCM.decode_slice_params)
            # 64 table scales -> uint8 indexes: 4x less host<->device traffic
            return mu, index.astype(jnp.uint8), ms

        self._slice_params = jax.jit(_sp)

        def _qs(v, y, mu, i):
            # int16 symbols halve the transfer; the overflow count guards the
            # cast (|round(y-mu)| >= 2^15 would silently wrap and corrupt the
            # stream -- possible only for a numerically diverged model)
            sym = model.apply(v, y, mu, i, method=MCM.quantize_slice)
            overflow = jnp.sum((sym > 32767) | (sym < -32768)).astype(jnp.int32)
            return sym.astype(jnp.int16), overflow

        self._quantize_slice = jax.jit(_qs)
        # both compress and decompress feed int16 symbols -> one compiled
        # program, keeping buf bit-identical across the two directions
        self._slice_update = jax.jit(
            lambda v, buf, ms, mu, sym, i: model.apply(
                v, buf, ms, mu, sym, i, method=MCM.decode_slice_update
            )
        )

        def _step(v, buf, ms, mu, sym, lm, ls, pi, ni):
            buf, y_hat_prev, mu2, index2, ms2 = model.apply(
                v, buf, ms, mu, sym, lm, ls, pi, ni, st,
                method=MCM.decode_slice_step,
            )
            return buf, y_hat_prev, mu2, index2.astype(jnp.uint8), ms2

        self._slice_step = jax.jit(_step)

        def _tail_params(v, buf, lm, ls):
            mu, index, ms = model.apply(
                v, buf, lm, ls, st, method=MCM.decode_tail_params
            )
            return mu, index.astype(jnp.uint8), ms

        self._tail_params = jax.jit(_tail_params)
        self._tail_update = jax.jit(
            lambda v, ms, mu, sym: model.apply(
                v, ms, mu, sym, method=MCM.decode_tail_update
            )
        )
        def _qt(v, y, mu):
            sym = model.apply(v, y, mu, method=MCM.quantize_tail)
            overflow = jnp.sum((sym > 32767) | (sym < -32768)).astype(jnp.int32)
            return sym.astype(jnp.int16), overflow

        self._quantize_tail = jax.jit(_qt)
        self._finish = jax.jit(
            lambda v, y_hat, ids: model.apply(v, y_hat, ids, method=MCM.decode_finish)
        )
        from textmae_tpu.coding.device_rans import decode_symbols, encode_symbols

        self._dev_decode = jax.jit(decode_symbols)
        self._dev_encode = jax.jit(encode_symbols, static_argnames=("max_words",))
        self._gauss_packed = None  # lazy pallas_rans.pack_tables output

        def _pack(syms, idxs, z_sym, ids_restore, overflow):
            # single D2H buffer with an int8 symbol payload — quantized
            # residuals are overwhelmingly in [-127, 127], so shipping them
            # as int8 halves the dominant transfer; the rare out-of-range
            # values ride in a fixed-size (pos, val) escape sidecar. Layout:
            #   [int16: flag, esc_count, esc_val[K], ids_restore]
            #   [int32 bytes: esc_pos[K]] [int8 bytes: sym|z payload]
            #   [uint8: indexes]
            # flag != 0 => sidecar overflowed or symbols exceeded int16; the
            # host then falls back to the wide (int16) packing.
            k = _esc_capacity(syms.size + z_sym.size)
            pay = jnp.concatenate(
                [syms.reshape(-1).astype(jnp.int32), z_sym.reshape(-1).astype(jnp.int32)]
            )
            pay8 = jnp.clip(pay, -127, 127).astype(jnp.int8)
            esc_mask = pay != pay8.astype(jnp.int32)
            esc_count = jnp.sum(esc_mask).astype(jnp.int32)
            (esc_pos,) = jnp.nonzero(esc_mask, size=k, fill_value=0)
            esc_pos = esc_pos.astype(jnp.int32)
            esc_val = pay[esc_pos].astype(jnp.int16)
            wide = jnp.sum((pay > 32767) | (pay < -32768)).astype(jnp.int32)
            flag = ((overflow + wide > 0) | (esc_count > k)).astype(jnp.int16)
            i16 = jnp.concatenate(
                [
                    flag.reshape(1),
                    jnp.minimum(esc_count, k).astype(jnp.int16).reshape(1),
                    esc_val,
                    ids_restore.astype(jnp.int16).reshape(-1),
                ]
            )
            idx_wire = _pack6_device(idxs) if self._idx6 else idxs.reshape(-1)
            return jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(i16, jnp.uint8).reshape(-1),
                    jax.lax.bitcast_convert_type(esc_pos, jnp.uint8).reshape(-1),
                    jax.lax.bitcast_convert_type(pay8, jnp.uint8).reshape(-1),
                    idx_wire,
                ]
            )

        self._pack = jax.jit(_pack)

        def _pack_wide(syms, idxs, z_sym, ids_restore, overflow):
            # fallback: full int16 payload (first int16 = exceeded-int16
            # flag); used only when the escape sidecar overflows. The flag
            # must ALSO cover z hyper-symbols: `overflow` only counts the
            # slice quantizers, and a z value outside int16 would otherwise
            # wrap silently into a desynchronized stream
            z_wide = jnp.sum((z_sym > 32767) | (z_sym < -32768)).astype(jnp.int32)
            i16 = jnp.concatenate(
                [
                    jnp.clip(overflow + z_wide, 0, 1).astype(jnp.int16).reshape(1),
                    syms.reshape(-1),
                    z_sym.astype(jnp.int16).reshape(-1),
                    ids_restore.astype(jnp.int16).reshape(-1),
                ]
            )
            b = jax.lax.bitcast_convert_type(i16, jnp.uint8).reshape(-1)
            return jnp.concatenate([b, idxs.reshape(-1)])

        self._pack_wide = jax.jit(_pack_wide)
        # canonical int16 cast, used both to widen the int8 H2D wire and to
        # narrow device-rANS int32 output: the downstream per-slice programs
        # must see the SAME input dtypes in compress and decompress
        # (bit-identity), so everything converges on this one jitted cast
        self._as_int16 = jax.jit(lambda a: a.astype(jnp.int16))
        self._widen32 = jax.jit(lambda a: a.astype(jnp.int32))
        # device-resident CDF tables for the in-jit rANS paths, uploaded once
        # lazily (serving calls compress/decompress per request; re-uploading
        # the static tables each call is exactly the per-call host<->device
        # traffic the device codec exists to remove)
        self._dev_gauss = None
        self._dev_eb = None

    # ------------------------------------------------------------------
    def update(self, force: bool = False) -> None:
        """Build quantized CDF tables (compressai model.update analog)."""
        if self.gauss_tables is not None and not force:
            return
        self.gauss_tables = build_gaussian_tables(self.scale_table)
        self.eb_tables = build_eb_tables(
            self.variables["params"]["entropy_bottleneck"]
        )
        self._dev_gauss = None  # re-upload lazily if the tables changed
        self._dev_eb = None
        self._gauss_packed = None  # Pallas-packed tables track the same build

    def _device_tables(self):
        """Device copies of the quantized CDF tables, uploaded once."""
        if self._dev_gauss is None:
            gt, et = self.gauss_tables, self.eb_tables
            self._dev_gauss = (
                jnp.asarray(gt.quantized_cdf),
                jnp.asarray(gt.cdf_length),
                jnp.asarray(gt.offset),
            )
            self._dev_eb = (
                jnp.asarray(et.quantized_cdf),
                jnp.asarray(et.cdf_length),
                jnp.asarray(et.offset),
            )
        return self._dev_gauss, self._dev_eb

    def _packed_gauss_tables(self):
        """Pallas-packed Gaussian tables, built once per update()."""
        if self._gauss_packed is None:
            from textmae_tpu.coding.pallas_rans import pack_tables

            gt = self.gauss_tables
            self._gauss_packed = pack_tables(
                gt.quantized_cdf, gt.cdf_length, gt.offset
            )
        return self._gauss_packed

    def _gauss_decode(self, words, count, hi, lo, pos, indexes):
        """Decode Gaussian-table symbols in-jit: Pallas kernel on TPU (the
        rans64 state machine as one Mosaic program, ~1.9x the lax.scan
        per-symbol rate and no per-step HBM round trips), lax.scan elsewhere
        or when the job exceeds the kernel's VMEM budget. Both paths are
        byte-exact by the device_rans/pallas_rans fuzz contracts."""
        (gtc, gtl, gto), _ = self._device_tables()
        use_pallas = False
        if jax.default_backend() == "tpu":
            from textmae_tpu.coding.pallas_rans import fits_pallas

            use_pallas = fits_pallas(
                indexes.shape[0], indexes.shape[1], gtc.shape[0],
                gtc.shape[1], words.shape[1],
            )
        if use_pallas:
            from textmae_tpu.coding.pallas_rans import (
                decode_symbols_pallas_packed,
            )

            tab, l = self._packed_gauss_tables()
            return decode_symbols_pallas_packed(
                words, count, hi, lo, pos, indexes, tab, l
            )
        return self._dev_decode(words, count, hi, lo, pos, indexes, gtc, gtl, gto)

    def _gauss_encode(self, syms, idxs, max_words):
        """Encode Gaussian-table symbols in-jit: Pallas kernel on TPU with a
        rate-sized word buffer (pallas_rans.ENC_CAP_DEFAULT; the masked
        word-merge cost scales with the buffer, so the worst-case capacity
        would erase the kernel's win), lax.scan elsewhere. wcount counts
        past the buffer on overflow, so the caller's finalize_streams
        raises rather than truncating; compress() retries via the scan path
        at full capacity in that case."""
        (gtc, gtl, gto), _ = self._device_tables()
        use_pallas = False
        cap = max_words
        if jax.default_backend() == "tpu":
            from textmae_tpu.coding.pallas_rans import (
                ENC_CAP_DEFAULT,
                fits_pallas_enc,
            )

            cap = min(max_words, ENC_CAP_DEFAULT)
            use_pallas = fits_pallas_enc(
                syms.shape[0], syms.shape[1], gtc.shape[0], gtc.shape[1], cap
            )
        if use_pallas:
            from textmae_tpu.coding.pallas_rans import (
                encode_symbols_pallas_packed,
            )

            tab, l = self._packed_gauss_tables()
            return encode_symbols_pallas_packed(
                syms, idxs, tab, l, max_words=cap
            )
        return self._dev_encode(syms, idxs, gtc, gtl, gto, max_words=max_words)

    def _idx_to_host(self, index: jnp.ndarray) -> np.ndarray:
        """Device scale indexes -> host uint8 array over the 6-bit wire."""
        if not self._idx6:
            return np.asarray(index)
        n = int(np.prod(index.shape))
        return _unpack6_host(np.asarray(self._pack6(index)), n).reshape(index.shape)

    def _h2d_sym(self, sym_np: np.ndarray, widen) -> jnp.ndarray:
        """Host->device symbols over an int8 wire when values allow.

        `widen` restores the canonical dtype on device so the downstream
        per-slice programs are the same compiled programs compress uses
        (bit-identity across directions); the wire is just narrower.
        """
        small = np.clip(sym_np, -127, 127)
        if np.array_equal(small, sym_np):
            return widen(jnp.asarray(small.astype(np.int8)))
        return jnp.asarray(sym_np)

    def _require_tables(self):
        if self.gauss_tables is None or self.eb_tables is None:
            raise RuntimeError("call codec.update() before compress/decompress")

    def _z_shape(self) -> Tuple[int, int]:
        g = self.cfg.hyper_grid
        return (g, g)

    # ------------------------------------------------------------------
    def _run_slice_chain(self, y, latent_means, latent_scales, v=None):
        """Device-side conditional chain via the shared per-slice programs.

        Returns stacked (symbols (S,N,h,w,g) int16, indexes (...) uint8).
        All dispatches are async; the only host sync is the caller's transfer.
        v: variables override (stream_programs' weights-external mode threads
        params as a runtime argument); default = this codec's own weights.
        """
        cfg = self.cfg
        n, h, w, _ = y.shape
        if v is None:
            v = self.variables
        head = cfg.max_support
        buf = jnp.zeros((n, h, w, cfg.group_ch * head), jnp.float32)
        syms, idxs = [], []
        # head: sequential context chain (slices 0..max_support-1)
        mu, index, ms = self._slice_params(
            v, buf, latent_means, latent_scales, jnp.int32(0)
        )
        sym, overflow = self._quantize_slice(v, y, mu, jnp.int32(0))
        syms.append(sym)
        idxs.append(index)
        for si in range(1, head):
            buf, _, mu, index, ms = self._slice_step(
                v, buf, ms, mu, sym, latent_means, latent_scales,
                jnp.int32(si - 1), jnp.int32(si),
            )
            sym, ov = self._quantize_slice(v, y, mu, jnp.int32(si))
            overflow = overflow + ov
            syms.append(sym)
            idxs.append(index)
        buf, _ = self._slice_update(v, buf, ms, mu, sym, jnp.int32(head - 1))
        # tail: all remaining slices in one dispatch (buf is frozen now)
        mu_t, index_t, _ = self._tail_params(v, buf, latent_means, latent_scales)
        sym_t, ov = self._quantize_tail(v, y, mu_t)
        overflow = overflow + ov
        symbols = jnp.concatenate([jnp.stack(syms), sym_t])
        indexes = jnp.concatenate([jnp.stack(idxs), index_t])
        return symbols, indexes, overflow

    def compress(
        self,
        imgs: jnp.ndarray,
        total_scores: jnp.ndarray,
        device_encode: Optional[bool] = None,
    ) -> Tuple[List[CompressedImage], np.ndarray]:
        """(N,C,H,W) images -> (per-image bitstreams, ids_restore (N, L))."""
        self._require_tables()
        if self.device_encode if device_encode is None else device_encode:
            return self._compress_device(imgs, total_scores)
        cfg = self.cfg
        front = self._front(self.variables, imgs, total_scores)
        z_sym_d = front["z_sym"]
        latent_means, latent_scales = self._hyper(self.variables, z_sym_d)
        syms_d, idxs_d, overflow_d = self._run_slice_chain(
            front["y"], latent_means, latent_scales
        )

        n = imgs.shape[0]
        grid = cfg.keep_grid
        hz, wz = self._z_shape()
        sym_shape = (cfg.num_slices, n, grid, grid, cfg.group_ch)
        z_shape_full = (n, hz, wz, cfg.hyperprior_depth)
        n_sym = int(np.prod(sym_shape))
        n_z = int(np.prod(z_shape_full))
        n_ids = n * cfg.num_patches
        n_pay = n_sym + n_z
        k = _esc_capacity(n_pay)

        packed = np.asarray(
            self._pack(syms_d, idxs_d, z_sym_d, front["ids_restore"], overflow_d)
        )
        len16 = 2 + k + n_ids
        i16 = packed[: 2 * len16].view(np.int16)
        if i16[0]:
            # sidecar overflow or int16 overflow: re-transfer wide (rare)
            n_i16 = 1 + n_sym + n_z + n_ids
            packed = np.asarray(
                self._pack_wide(
                    syms_d, idxs_d, z_sym_d, front["ids_restore"], overflow_d
                )
            )
            w16 = packed[: 2 * n_i16].view(np.int16)
            if w16[0]:
                raise OverflowError(
                    "quantized symbols exceeded int16 range — the model has "
                    "numerically diverged; refusing to emit a corrupt stream"
                )
            symbols = w16[1 : 1 + n_sym].reshape(sym_shape)
            z_sym = (
                w16[1 + n_sym : 1 + n_sym + n_z].reshape(z_shape_full).astype(np.int32)
            )
            ids_restore = (
                w16[1 + n_sym + n_z :].reshape(n, cfg.num_patches).astype(np.int64)
            )
            indexes = packed[2 * n_i16 :].reshape(sym_shape)
        else:
            count = int(i16[1])
            esc_val = i16[2 : 2 + k]
            ids_restore = (
                i16[2 + k :].reshape(n, cfg.num_patches).astype(np.int64)
            )
            o = 2 * len16
            esc_pos = packed[o : o + 4 * k].view(np.int32)
            o += 4 * k
            pay = packed[o : o + n_pay].view(np.int8).astype(np.int32)
            o += n_pay
            pay[esc_pos[:count]] = esc_val[:count]
            symbols = pay[:n_sym].reshape(sym_shape)
            z_sym = pay[n_sym:].reshape(z_shape_full)
            if self._idx6:
                indexes = _unpack6_host(packed[o:], n_sym).reshape(sym_shape)
            else:
                indexes = packed[o:].reshape(sym_shape)

        gt, et = self.gauss_tables, self.eb_tables
        cz = z_sym.shape[-1]
        z_indexes = np.tile(np.arange(cz, dtype=np.int32), z_sym[0].size // cz)
        z_shape = z_sym.shape[1:3]

        def code_one(i: int) -> CompressedImage:
            enc = RansEncoder()
            # all 12 slices buffered into one stream (MCM.py:845-887)
            enc.encode_with_indexes(
                symbols[:, i], indexes[:, i],
                gt.quantized_cdf, gt.cdf_length, gt.offset,
            )
            y_string = enc.flush()
            enc_z = RansEncoder()
            enc_z.encode_with_indexes(
                z_sym[i], z_indexes, et.quantized_cdf, et.cdf_length, et.offset
            )
            return CompressedImage(
                y_string=y_string, z_string=enc_z.flush(), z_shape=z_shape
            )

        if n > 1:
            with ThreadPoolExecutor(self.num_threads) as pool:
                streams = list(pool.map(code_one, range(n)))
        else:
            streams = [code_one(0)]
        return streams, ids_restore

    def _compress_device(
        self, imgs: jnp.ndarray, total_scores: jnp.ndarray
    ) -> Tuple[List[CompressedImage], np.ndarray]:
        """Compress with the rANS encoder inside jit (coding.device_rans).

        The slice chain's symbols/indexes feed encode_symbols directly on
        device, so no symbol wire (int8 payload + escape sidecar + packed
        indexes) ever crosses the link — only the finished stream words,
        counts, final states, ids_restore, and the divergence flag, fetched
        in one device_get. Streams are byte-identical to the host encoder's
        by the device_rans fuzz contract, so either path's output decodes on
        either decoder.

        Word capacity is sized at ~16 bits/symbol mean (plus slack), far
        above any sane operating rate; a hypothetical overflow raises (via
        finalize_streams) rather than emitting a truncated stream.
        """
        cfg = self.cfg
        front = self._front(self.variables, imgs, total_scores)
        z_sym_d = front["z_sym"]
        latent_means, latent_scales = self._hyper(self.variables, z_sym_d)
        syms_d, idxs_d, overflow_d = self._run_slice_chain(
            front["y"], latent_means, latent_scales
        )

        n = imgs.shape[0]
        hz, wz = self._z_shape()
        cz = cfg.hyperprior_depth
        t_y = cfg.num_slices * cfg.keep_grid * cfg.keep_grid * cfg.group_ch
        t_z = hz * wz * cz

        # per-image stream order is slice-major: (S, N, h, w, g) -> (N, S*h*w*g)
        y_sym = jnp.transpose(syms_d, (1, 0, 2, 3, 4)).reshape(n, t_y)
        y_idx = jnp.transpose(idxs_d, (1, 0, 2, 3, 4)).reshape(n, t_y)
        (gtc, gtl, gto), (etc, etl, eto) = self._device_tables()
        y_out = self._gauss_encode(
            y_sym.astype(jnp.int32), y_idx.astype(jnp.int32),
            max_words=t_y // 2 + 64,
        )
        z_idx = jnp.tile(jnp.arange(cz, dtype=jnp.int32), hz * wz)[None].repeat(n, 0)
        z_out = self._dev_encode(
            z_sym_d.reshape(n, t_z).astype(jnp.int32), z_idx,
            etc, etl, eto, max_words=t_z // 2 + 64,
        )
        y_out, z_out, ids_restore, overflow = jax.device_get(
            (y_out, z_out, front["ids_restore"], overflow_d)
        )
        if int(overflow) > 0:
            raise OverflowError(
                "quantized symbols exceeded int16 range — the model has "
                "numerically diverged; refusing to emit a corrupt stream"
            )
        from textmae_tpu.coding.device_rans import finalize_streams

        try:
            y_strings = finalize_streams(*y_out)
        except ValueError:
            # the rate-sized word buffer overflowed (only reachable at absurd
            # operating rates) — re-encode losslessly via the scan path at the
            # TRUE worst-case capacity (12 words/symbol: up to 11 escape-chunk
            # ops + the main 16-bit op, one renorm word each; see
            # device_rans.encode_symbols)
            y_out = jax.device_get(self._dev_encode(
                y_sym.astype(jnp.int32), y_idx.astype(jnp.int32),
                gtc, gtl, gto, max_words=12 * t_y + 2,
            ))
            y_strings = finalize_streams(*y_out)
        try:
            z_strings = finalize_streams(*z_out)
        except ValueError:
            z_out = jax.device_get(self._dev_encode(
                z_sym_d.reshape(n, t_z).astype(jnp.int32), z_idx,
                etc, etl, eto, max_words=12 * t_z + 2,
            ))
            z_strings = finalize_streams(*z_out)
        streams = [
            CompressedImage(y_string=y, z_string=z, z_shape=(hz, wz))
            for y, z in zip(y_strings, z_strings)
        ]
        return streams, ids_restore.astype(np.int64)

    # ------------------------------------------------------------------
    def decompress(
        self,
        streams: Sequence[CompressedImage],
        ids_restore: np.ndarray,
        device_chain: Optional[bool] = None,
    ) -> jnp.ndarray:
        """Per-image bitstreams -> (N, C, H, W) reconstruction."""
        self._require_tables()
        if self.device_chain if device_chain is None else device_chain:
            return self._decompress_device(streams, ids_restore)
        cfg = self.cfg
        gt, et = self.gauss_tables, self.eb_tables
        n = len(streams)
        hz, wz = streams[0].z_shape
        cz = cfg.hyperprior_depth

        # hyperlatent decode (host) -> z_hat -> means/scales (device)
        z_indexes = np.tile(np.arange(cz, dtype=np.int32), hz * wz)
        z_sym = np.empty((n, hz, wz, cz), np.int32)
        for i, s in enumerate(streams):
            dec = RansDecoder()
            dec.set_stream(s.z_string)
            z_sym[i] = dec.decode_stream(
                z_indexes, et.quantized_cdf, et.cdf_length, et.offset
            ).reshape(hz, wz, cz)
        latent_means, latent_scales = self._hyper(
            self.variables, self._h2d_sym(z_sym, self._widen32)
        )

        g = cfg.group_ch
        grid = cfg.keep_grid
        decs = []
        for s in streams:
            d = RansDecoder()
            d.set_stream(s.y_string)
            decs.append(d)

        v = self.variables
        buf = jnp.zeros((n, grid, grid, g * cfg.max_support), jnp.float32)
        y_slices = []

        def host_decode(index) -> jnp.ndarray:
            index_np = self._idx_to_host(index)
            sym = np.empty((n, grid, grid, g), np.int16)
            for j, d in enumerate(decs):
                sym[j] = d.decode_stream(
                    index_np[j], gt.quantized_cdf, gt.cdf_length, gt.offset
                ).reshape(grid, grid, g)
            return self._h2d_sym(sym, self._as_int16)

        head = cfg.max_support
        # head: sequential context chain with host decode between slices
        mu, index, ms = self._slice_params(
            v, buf, latent_means, latent_scales, jnp.int32(0)
        )
        sym = host_decode(index)
        for si in range(1, head):
            buf, y_hat_prev, mu, index, ms = self._slice_step(
                v, buf, ms, mu, sym, latent_means, latent_scales,
                jnp.int32(si - 1), jnp.int32(si),
            )
            y_slices.append(y_hat_prev)
            sym = host_decode(index)
        buf, y_hat_last = self._slice_update(
            v, buf, ms, mu, sym, jnp.int32(head - 1)
        )
        y_slices.append(y_hat_last)

        # tail: one dispatch + one host round trip for all remaining slices
        tail = cfg.num_slices - head
        mu_t, index_t, ms_t = self._tail_params(v, buf, latent_means, latent_scales)
        index_np = self._idx_to_host(index_t)  # (T, N, h, w, g)
        sym_t = np.empty((tail, n, grid, grid, g), np.int16)
        for j, d in enumerate(decs):  # stream order: slice-major within image
            for t in range(tail):
                sym_t[t, j] = d.decode_stream(
                    index_np[t, j], gt.quantized_cdf, gt.cdf_length, gt.offset
                ).reshape(grid, grid, g)
        y_tail = self._tail_update(v, ms_t, mu_t, self._h2d_sym(sym_t, self._as_int16))
        y_slices.extend(y_tail[t] for t in range(tail))

        y_hat = jnp.concatenate(y_slices, axis=-1)
        return self._finish(v, y_hat, jnp.asarray(ids_restore))

    def _decompress_device(
        self, streams: Sequence[CompressedImage], ids_restore: np.ndarray
    ) -> jnp.ndarray:
        """Decode with the rANS state machine inside jit (coding.device_rans).

        The stream words upload once; every step of the slice chain — params,
        symbol decode, buffer update — is an async dispatch, so the only
        blocking device<->host transfer in the whole decompress is the
        caller's fetch of the final image. The per-slice mu/index programs
        are the SAME compiled executables the host path (and compress) runs,
        so encoder/decoder bit-identity is untouched; the decoded symbols are
        bit-equal to the host decoder's by the device_rans fuzz contract.
        """
        cfg = self.cfg
        gt, et = self.gauss_tables, self.eb_tables
        n = len(streams)
        hz, wz = streams[0].z_shape
        cz = cfg.hyperprior_depth

        # hyperlatent decode stays host-side: the z bytes are already on the
        # host and nothing downstream blocks on the device for it
        z_indexes = np.tile(np.arange(cz, dtype=np.int32), hz * wz)
        z_sym = np.empty((n, hz, wz, cz), np.int32)
        for i, s in enumerate(streams):
            dec = RansDecoder()
            dec.set_stream(s.z_string)
            z_sym[i] = dec.decode_stream(
                z_indexes, et.quantized_cdf, et.cdf_length, et.offset
            ).reshape(hz, wz, cz)
        latent_means, latent_scales = self._hyper(
            self.variables, self._h2d_sym(z_sym, self._widen32)
        )

        from textmae_tpu.coding.device_rans import init_states

        words, count, hi, lo, pos = (
            jnp.asarray(a) for a in init_states([s.y_string for s in streams])
        )
        (gtc, gtl, gto), _ = self._device_tables()
        g = cfg.group_ch
        grid = cfg.keep_grid
        v = self.variables
        buf = jnp.zeros((n, grid, grid, g * cfg.max_support), jnp.float32)
        y_slices = []

        def dev_decode(index):
            nonlocal hi, lo, pos
            out, hi, lo, pos = self._gauss_decode(
                words, count, hi, lo, pos, index.reshape(n, -1)
            )
            return self._as_int16(out).reshape(n, grid, grid, g)

        head = cfg.max_support
        mu, index, ms = self._slice_params(
            v, buf, latent_means, latent_scales, jnp.int32(0)
        )
        sym = dev_decode(index)
        for si in range(1, head):
            buf, y_hat_prev, mu, index, ms = self._slice_step(
                v, buf, ms, mu, sym, latent_means, latent_scales,
                jnp.int32(si - 1), jnp.int32(si),
            )
            y_slices.append(y_hat_prev)
            sym = dev_decode(index)
        buf, y_hat_last = self._slice_update(
            v, buf, ms, mu, sym, jnp.int32(head - 1)
        )
        y_slices.append(y_hat_last)

        # tail: one in-jit decode for all remaining slices (stream order is
        # slice-major within each image, hence the (N, T*h*w*g) transpose)
        tail = cfg.num_slices - head
        mu_t, index_t, ms_t = self._tail_params(v, buf, latent_means, latent_scales)
        idx_flat = jnp.transpose(index_t, (1, 0, 2, 3, 4)).reshape(n, -1)
        out, hi, lo, pos = self._gauss_decode(
            words, count, hi, lo, pos, idx_flat
        )
        sym_t = jnp.transpose(
            self._as_int16(out).reshape(n, tail, grid, grid, g), (1, 0, 2, 3, 4)
        )
        y_tail = self._tail_update(v, ms_t, mu_t, sym_t)
        y_slices.extend(y_tail[t] for t in range(tail))

        y_hat = jnp.concatenate(y_slices, axis=-1)
        return self._finish(v, y_hat, jnp.asarray(ids_restore))

    # ------------------------------------------------------------------
    def stream_programs(self, batch: int, weights_external: bool = False):
        """Monolithic single-jit bitstream codec programs, for AOT export.

        The interactive codec splits compress/decompress into many small
        jitted programs so host coding and device math overlap (throughput).
        For DEPLOYMENT the opposite shape wins: ONE traced program per
        direction, rANS state machine included (coding/device_rans), with
        weights AND quantized CDF tables baked in as constants — so a
        ``jax.export`` artifact of these two functions is a complete codec
        that needs no model code, no flax, and no table build at the
        destination (eval/export.py kind="stream"; ExportedCodec wraps the
        thin host glue: byte assembly + the subset side-info coder).

        Returns (encode_fn, encode_args, decode_fn, decode_args, info):
        plain traceable functions (callers jit/export them), example args at
        ``batch``, and the static wire geometry for the manifest. Pure-XLA
        lax.scan coding paths only (no Pallas) — Mosaic custom calls would
        pin exported artifacts to one TPU generation.

        Batch is FIXED per program: the stacked tail/slice scans mix
        batch-leading and slice-leading carries, which rejects a symbolic
        batch dim (see export.py manifest fallback reasons).

        weights_external=True threads the param pytree as the FIRST runtime
        argument of both programs instead of baking it into the module as
        constants. The compiled module shrinks from weights-size to
        program-size — measured necessity: the flagship baked artifact's
        683 MB module exceeded the remote-compile tunnel's HTTP body limit
        (HTTP 413; VERIFICATION.md round 4) — and the artifact ships the
        weights as a separate npz entry instead. Entropy tables stay baked
        (small, and they are DERIVED from the weights — swapping the npz
        without rebuilding tables would desynchronize streams, so the
        manifest pins them together).
        """
        self._require_tables()
        cfg = self.cfg
        from textmae_tpu.coding.device_rans import decode_symbols, encode_symbols

        (gtc, gtl, gto), (ebc, ebl, ebo) = self._device_tables()
        grid, g = cfg.keep_grid, cfg.group_ch
        hz, wz = self._z_shape()
        cz = cfg.hyperprior_depth
        t_y = cfg.num_slices * grid * grid * g
        t_z = hz * wz * cz
        y_cap = t_y // 2 + 64
        z_cap = t_z // 2 + 64
        head = cfg.max_support
        tail = cfg.num_slices - head
        z_idx_row = jnp.tile(jnp.arange(cz, dtype=jnp.int32), hz * wz)

        def _enc(v, imgs, scores):
            front = self._front(v, imgs, scores)
            lm, ls = self._hyper(v, front["z_sym"])
            syms, idxs, overflow = self._run_slice_chain(
                front["y"], lm, ls, v=v
            )
            n = imgs.shape[0]
            y_sym = jnp.transpose(syms, (1, 0, 2, 3, 4)).reshape(n, t_y)
            y_idx = jnp.transpose(idxs, (1, 0, 2, 3, 4)).reshape(n, t_y)
            yw, yc, yhi, ylo = encode_symbols(
                y_sym.astype(jnp.int32), y_idx.astype(jnp.int32),
                gtc, gtl, gto, max_words=y_cap,
            )
            z_idx = jnp.broadcast_to(z_idx_row, (n, t_z))
            zw, zc, zhi, zlo = encode_symbols(
                front["z_sym"].reshape(n, t_z).astype(jnp.int32), z_idx,
                ebc, ebl, ebo, max_words=z_cap,
            )
            return {
                "y_words": yw, "y_count": yc, "y_hi": yhi, "y_lo": ylo,
                "z_words": zw, "z_count": zc, "z_hi": zhi, "z_lo": zlo,
                "ids_restore": front["ids_restore"].astype(jnp.int32),
                "overflow": overflow,
            }

        def _dec(
            v,
            y_words, y_count, y_hi, y_lo, y_pos,
            z_words, z_count, z_hi, z_lo, z_pos,
            ids_restore,
        ):
            n = y_words.shape[0]
            z_idx = jnp.broadcast_to(z_idx_row, (n, t_z))
            z_out, _, _, _ = decode_symbols(
                z_words, z_count, z_hi, z_lo, z_pos, z_idx, ebc, ebl, ebo
            )
            z_sym = z_out.reshape(n, hz, wz, cz)
            lm, ls = self._hyper(v, z_sym)
            buf = jnp.zeros((n, grid, grid, g * head), jnp.float32)
            state = [y_hi, y_lo, y_pos]

            def dec(index):
                out, h2, l2, p2 = decode_symbols(
                    y_words, y_count, state[0], state[1], state[2],
                    index.reshape(n, -1).astype(jnp.int32), gtc, gtl, gto,
                )
                state[0], state[1], state[2] = h2, l2, p2
                return out.astype(jnp.int16).reshape(n, grid, grid, g)

            y_slices = []
            mu, index, ms = self._slice_params(v, buf, lm, ls, jnp.int32(0))
            sym = dec(index)
            for si in range(1, head):
                buf, y_prev, mu, index, ms = self._slice_step(
                    v, buf, ms, mu, sym, lm, ls,
                    jnp.int32(si - 1), jnp.int32(si),
                )
                y_slices.append(y_prev)
                sym = dec(index)
            buf, y_last = self._slice_update(v, buf, ms, mu, sym, jnp.int32(head - 1))
            y_slices.append(y_last)
            mu_t, index_t, ms_t = self._tail_params(v, buf, lm, ls)
            idx_flat = jnp.transpose(index_t, (1, 0, 2, 3, 4)).reshape(n, -1)
            out, _, _, _ = decode_symbols(
                y_words, y_count, state[0], state[1], state[2],
                idx_flat.astype(jnp.int32), gtc, gtl, gto,
            )
            sym_t = jnp.transpose(
                out.astype(jnp.int16).reshape(n, tail, grid, grid, g),
                (1, 0, 2, 3, 4),
            )
            y_tail = self._tail_update(v, ms_t, mu_t, sym_t)
            y_slices.extend(y_tail[t] for t in range(tail))
            y_hat = jnp.concatenate(y_slices, axis=-1)
            # ids arrive int32 (int64 would downcast anyway without jax x64)
            return self._finish(v, y_hat, ids_restore)

        b = batch
        enc_args = (
            jnp.zeros((b, 3, cfg.img_size, cfg.img_size), jnp.float32),
            jnp.zeros((b, cfg.num_patches), jnp.float32),
        )
        u32, i32 = jnp.uint32, jnp.int32
        dec_args = (
            jnp.zeros((b, y_cap + 2), u32), jnp.zeros((b,), i32),
            jnp.zeros((b,), u32), jnp.zeros((b,), u32), jnp.zeros((b,), i32),
            jnp.zeros((b, z_cap + 2), u32), jnp.zeros((b,), i32),
            jnp.zeros((b,), u32), jnp.zeros((b,), u32), jnp.zeros((b,), i32),
            jnp.zeros((b, cfg.num_patches), i32),
        )
        info = {
            "y_words_width": y_cap + 2,
            "z_words_width": z_cap + 2,
            "z_shape": [hz, wz],
            "batch": b,
            "weights": "external" if weights_external else "baked",
        }
        if weights_external:
            # params ride as the first runtime argument of both programs
            p_example = self.variables["params"]

            def encode_stream(params, imgs, scores):
                return _enc({"params": params}, imgs, scores)

            def decode_stream(params, *args):
                return _dec({"params": params}, *args)

            return (
                encode_stream, (p_example,) + enc_args,
                decode_stream, (p_example,) + dec_args,
                info,
            )

        v_const = self.variables  # closure constant: baked into the module

        def encode_stream(imgs, scores):
            return _enc(v_const, imgs, scores)

        def decode_stream(*args):
            return _dec(v_const, *args)

        return encode_stream, enc_args, decode_stream, dec_args, info
