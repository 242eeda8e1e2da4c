"""Self-describing single-image bitstream container.

The reference keeps compressed representations as in-memory Python lists
(strings + ids_restore tensors, /root/reference/testing.py:69-80) — nothing
can be written to disk or sent over a wire. This container is the missing
archive format: one blob per image carrying the y/z rANS streams, the
entropy-coded ids_restore side info, and enough header to decode without
out-of-band metadata (beyond the model weights themselves).

Layout (little-endian):

    magic   4s   b"TMC1"
    version B    1
    img_size     H   model input resolution (square)
    num_patches  H
    num_keep     H
    canonical    B   1 = canonical keep order (subset-coded side info)
    normalize    B   1 = pixels were ImageNet-normalized before compression
                     (decoder must de-normalize the reconstruction)
    z_h, z_w     B,B hyperlatent grid
    orig_w       H   original image width  (recon is resized back to this)
    orig_h       H   original image height
    y_len        I
    z_len        I
    side_len     H
    y_string, z_string, side_payload bytes
"""
from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

from textmae_tpu.eval.codec import CompressedImage

MAGIC = b"TMC1"
VERSION = 2  # v2 adds the normalize flag byte (ADVICE r1)
_HEADER = struct.Struct("<4sBHHHBBBBHHIIH")
# v1 (no normalize byte) stays readable: old blobs decode as normalize=False,
# which was the only v1 behavior
_HEADER_V1 = struct.Struct("<4sBHHHBBBHHIIH")


def pack_image(
    stream: CompressedImage,
    side_payload: bytes,
    config,
    orig_size: Optional[Tuple[int, int]] = None,
    normalize: bool = False,
) -> bytes:
    """Serialize one image's compressed representation to bytes."""
    hz, wz = stream.z_shape
    orig_w, orig_h = orig_size or (config.img_size, config.img_size)
    if len(side_payload) > 0xFFFF:
        raise ValueError("side payload too large")
    header = _HEADER.pack(
        MAGIC,
        VERSION,
        config.img_size,
        config.num_patches,
        config.num_keep_patches,
        int(config.canonical_keep_order),
        int(normalize),
        hz,
        wz,
        orig_w,
        orig_h,
        len(stream.y_string),
        len(stream.z_string),
        len(side_payload),
    )
    return header + stream.y_string + stream.z_string + side_payload


def unpack_image(data: bytes) -> Tuple[CompressedImage, bytes, Dict]:
    """Parse a container blob -> (streams, side_payload, header meta)."""
    if len(data) < _HEADER_V1.size:
        raise ValueError("container truncated (no header)")
    magic, version = struct.unpack_from("<4sB", data)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    if version == VERSION:
        # the v1 guard above is one byte shorter than the v2 header; without
        # this check a truncated v2 blob leaks struct.error instead of the
        # documented ValueError (ADVICE r2)
        if len(data) < _HEADER.size:
            raise ValueError("container truncated (v2 header)")
        (
            _,
            _,
            img_size,
            num_patches,
            num_keep,
            canonical,
            normalize,
            hz,
            wz,
            orig_w,
            orig_h,
            y_len,
            z_len,
            side_len,
        ) = _HEADER.unpack_from(data)
        header_size = _HEADER.size
    elif version == 1:
        (
            _,
            _,
            img_size,
            num_patches,
            num_keep,
            canonical,
            hz,
            wz,
            orig_w,
            orig_h,
            y_len,
            z_len,
            side_len,
        ) = _HEADER_V1.unpack_from(data)
        normalize = 0
        header_size = _HEADER_V1.size
    else:
        raise ValueError(f"unsupported container version {version}")
    if len(data) != header_size + y_len + z_len + side_len:
        raise ValueError("container length mismatch")
    o = header_size
    y_string = data[o : o + y_len]
    z_string = data[o + y_len : o + y_len + z_len]
    side = data[o + y_len + z_len :]
    meta = {
        "img_size": img_size,
        "num_patches": num_patches,
        "num_keep_patches": num_keep,
        "canonical_keep_order": bool(canonical),
        "normalize": bool(normalize),
        "orig_size": (orig_w, orig_h),
        "z_shape": (hz, wz),
    }
    return CompressedImage(y_string, z_string, (hz, wz)), bytes(side), meta


def check_compatible(meta: Dict, config, normalize: Optional[bool] = None) -> None:
    """Raise if a container was produced under an incompatible model config.

    normalize: the decoding service's pixel-space mode; when given, a
    mismatch with the container's recorded mode is an error (a normalized
    blob decoded by an unnormalized server would silently yield wrong
    pixel values, and vice versa)."""
    for key in ("img_size", "num_patches", "num_keep_patches"):
        if meta[key] != getattr(config, key):
            raise ValueError(
                f"container {key}={meta[key]} != model config "
                f"{getattr(config, key)}"
            )
    if meta["canonical_keep_order"] != config.canonical_keep_order:
        raise ValueError("container keep-order mode differs from model config")
    if normalize is not None and meta["normalize"] != normalize:
        raise ValueError(
            f"container normalize={meta['normalize']} != decoder "
            f"normalize={normalize}"
        )
    g = config.hyper_grid
    if meta["z_shape"] != (g, g):
        # the z grid sizes device buffers and the host rANS decode loop; a
        # tampered header must not drive either
        raise ValueError(
            f"container z grid {meta['z_shape']} != model hyper grid {(g, g)}"
        )
