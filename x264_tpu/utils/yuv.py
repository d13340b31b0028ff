"""YUV / y4m frame I/O (analog of reference input/{raw,y4m}.c) and padding
helpers (analog of common/frame.c plane expansion, PADH/PADV=32 per
common/frame.h:31-35)."""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

PAD = 32  # reference frame border padding, mirrors x264 PADH/PADV


@dataclass
class Frame420:
    y: np.ndarray   # (H, W) uint8
    u: np.ndarray   # (H/2, W/2)
    v: np.ndarray

    @property
    def shape(self):
        return self.y.shape


def read_y4m(path: str, max_frames: int | None = None):
    """Returns (frames, (width, height), (fps_num, fps_den))."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"\n"):
            header += f.read(1)
        h = header.decode()
        w = int(re.search(r"W(\d+)", h).group(1))
        ht = int(re.search(r"H(\d+)", h).group(1))
        m = re.search(r"F(\d+):(\d+)", h)
        fps = (int(m.group(1)), int(m.group(2))) if m else (25, 1)
        cm = re.search(r"C(\S+)", h)
        if cm and not cm.group(1).startswith("420"):
            raise NotImplementedError(f"y4m colorspace {cm.group(1)}")
        frames = []
        fsize = w * ht * 3 // 2
        while max_frames is None or len(frames) < max_frames:
            tag = f.readline()
            if not tag.startswith(b"FRAME"):
                break
            data = f.read(fsize)
            if len(data) < fsize:
                break
            buf = np.frombuffer(data, dtype=np.uint8)
            y = buf[:w * ht].reshape(ht, w)
            u = buf[w * ht:w * ht + w * ht // 4].reshape(ht // 2, w // 2)
            v = buf[w * ht + w * ht // 4:].reshape(ht // 2, w // 2)
            frames.append(Frame420(y, u, v))
    return frames, (w, ht), fps


def write_y4m(path: str, frames, fps=(25, 1)):
    h, w = frames[0].y.shape
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420mpeg2\n".encode())
        for fr in frames:
            f.write(b"FRAME\n")
            f.write(fr.y.astype(np.uint8).tobytes())
            f.write(fr.u.astype(np.uint8).tobytes())
            f.write(fr.v.astype(np.uint8).tobytes())


def pad_to_mb(plane: np.ndarray, mb_size: int = 16) -> np.ndarray:
    """Pad plane to a multiple of mb_size by edge replication (matches the
    reference's frame_expand_border_mod16, common/frame.c)."""
    h, w = plane.shape
    ph = (-h) % mb_size
    pw = (-w) % mb_size
    if ph == 0 and pw == 0:
        return plane
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def expand_border(plane: np.ndarray, pad: int = PAD) -> np.ndarray:
    """Edge-replicate padding on all sides (for unclipped ME windows)."""
    return np.pad(plane, pad, mode="edge")


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val * max_val / mse)
